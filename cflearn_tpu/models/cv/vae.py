"""VAE / VQ-VAE / auto-regressor training semantics.

Parity: reference `cflearn/models/cv/vae.py:16/34` (`VAEModel`/`VQVAEModel`
wiring `modules/cv/vae/losses.py`) and `models/cv/ar.py:16`
(`AutoRegressorModel`).
"""

from typing import Any

import jax
import jax.numpy as jnp

from ...constants import INPUT_KEY, LABEL_KEY, LOSS_KEY, PREDICTIONS_KEY
from ...schema.config import DLConfig
from ...schema.losses_schema import ILoss, loss_dict_type
from ...schema.model import IDLModel
from ...toolkit.misc import tensor_dict_type
from ..common import CommonDLModel


@ILoss.register("vae")
class VAELoss(ILoss):
    """recon (mse) + kl (reference `modules/cv/vae/losses.py`)."""

    def __init__(self, reduction: str = "mean", *, kl_weight: float = 1.0e-3) -> None:
        super().__init__(reduction)
        self.kl_weight = kl_weight

    def run(self, forward_results: tensor_dict_type, batch: tensor_dict_type, **kwargs: Any) -> loss_dict_type:
        recon = jnp.mean(jnp.square(forward_results[PREDICTIONS_KEY] - batch[INPUT_KEY]))
        kl = jnp.mean(forward_results["kl"])
        return {LOSS_KEY: recon + self.kl_weight * kl, "recon": recon, "kl": kl}


@ILoss.register("vq_vae")
class VQVAELoss(ILoss):
    """recon + codebook + beta*commitment (reference `vae/losses.py`)."""

    def __init__(self, reduction: str = "mean", *, lb_vq: float = 1.0, lb_commit: float = 0.25, lb_recon: float = 1.0) -> None:
        super().__init__(reduction)
        self.lb_vq = lb_vq
        self.lb_commit = lb_commit
        self.lb_recon = lb_recon

    def run(self, forward_results: tensor_dict_type, batch: tensor_dict_type, **kwargs: Any) -> loss_dict_type:
        recon = jnp.mean(jnp.square(forward_results[PREDICTIONS_KEY] - batch[INPUT_KEY]))
        codebook = forward_results["codebook_loss"]
        commit = forward_results["commitment_loss"]
        total = self.lb_recon * recon + self.lb_vq * codebook + self.lb_commit * commit
        return {LOSS_KEY: total, "recon": recon, "codebook": codebook, "commit": commit}


def _with_labels(batch: tensor_dict_type) -> Any:
    """Conditional generators consume the label column when present
    (reference `models/cv/vae.py:23-42` `get_forward_args`)."""
    return batch[INPUT_KEY], batch.get(LABEL_KEY)


@IDLModel.register("vae")
class VAEModel(CommonDLModel):
    def build(self, config: DLConfig) -> None:
        if config.loss_name is None:
            config.loss_name = "vae"
        super().build(config)

    def get_forward_args(self, batch: tensor_dict_type, **kwargs: Any) -> Any:
        return _with_labels(batch)


@IDLModel.register("vq_vae")
class VQVAEModel(CommonDLModel):
    def build(self, config: DLConfig) -> None:
        if config.loss_name is None:
            config.loss_name = "vq_vae"
        super().build(config)

    def get_forward_args(self, batch: tensor_dict_type, **kwargs: Any) -> Any:
        return _with_labels(batch)


@ILoss.register("ar")
class AutoRegressorLoss(ILoss):
    """Cross entropy over per-pixel code logits."""

    def run(self, forward_results: tensor_dict_type, batch: tensor_dict_type, **kwargs: Any) -> loss_dict_type:
        logits = forward_results[PREDICTIONS_KEY]
        target = batch[INPUT_KEY].astype(jnp.int32)
        if target.ndim == logits.ndim:
            target = target[..., 0]
        log_probs = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(log_probs, target[..., None], axis=-1)
        loss = jnp.mean(nll)
        return {LOSS_KEY: loss}


@IDLModel.register("ar")
class AutoRegressorModel(CommonDLModel):
    def build(self, config: DLConfig) -> None:
        if config.loss_name is None:
            config.loss_name = "ar"
        super().build(config)

    def get_forward_args(self, batch: tensor_dict_type, **kwargs: Any) -> Any:
        return _with_labels(batch)
