"""GAN training semantics — the canonical multi-optimizer example.

Parity: reference `cflearn/models/cv/gan.py` — `GANLoss`/`GradientNormLoss`
(:35-82), `GANModel` (:83-187): `VanillaGeneratorStep` (scope "core") +
`VanillaDiscriminatorStep` (scope "discriminator", `requires_new_forward`).

TPU-native: the two steps compile into ONE jitted program; the discriminator
step sees generated samples through `lax.stop_gradient` instead of optimizer
toggling.
"""

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
from flax import nnx

from ...constants import INPUT_KEY, LABEL_KEY, LOSS_KEY, PREDICTIONS_KEY
from ...modules.common import build_module
from ...modules.cv.common import discriminators
from ...schema.config import DLConfig
from ...schema.losses_schema import loss_dict_type
from ...schema.model import IDLModel, TrainStep
from ...toolkit.misc import tensor_dict_type


def gan_loss(logits: Any, target_real: bool, *, mode: str = "vanilla") -> jax.Array:
    """reference `GANLoss` (`models/cv/gan.py:35`)."""
    if isinstance(logits, list):
        return sum(gan_loss(l, target_real, mode=mode) for l in logits) / len(logits)
    if mode == "hinge":
        if target_real:
            return jnp.mean(jax.nn.relu(1.0 - logits))
        return jnp.mean(jax.nn.relu(1.0 + logits))
    target = jnp.ones_like(logits) if target_real else jnp.zeros_like(logits)
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    return -jnp.mean(target * log_p + (1.0 - target) * log_not_p)


class GeneratorStep(TrainStep):
    def __init__(self, *, loss_mode: str = "vanilla") -> None:
        super().__init__("core")
        self.loss_mode = loss_mode

    def loss_fn(
        self,
        m: "GANModel",
        batch: tensor_dict_type,
        forward_results: tensor_dict_type,
        **kwargs: Any,
    ) -> loss_dict_type:
        sampled = forward_results[PREDICTIONS_KEY]
        logits = m.discriminator(sampled)
        g_loss = gan_loss(logits, True, mode=self.loss_mode)
        return {LOSS_KEY: g_loss, "g": g_loss}


class DiscriminatorStep(TrainStep):
    def __init__(self, *, loss_mode: str = "vanilla") -> None:
        super().__init__("discriminator", requires_new_forward=True, requires_grad_in_forward=False)
        self.loss_mode = loss_mode

    def loss_fn(
        self,
        m: "GANModel",
        batch: tensor_dict_type,
        forward_results: tensor_dict_type,
        **kwargs: Any,
    ) -> loss_dict_type:
        real = batch[INPUT_KEY]
        fake = jax.lax.stop_gradient(forward_results[PREDICTIONS_KEY])
        d_real = gan_loss(m.discriminator(real), True, mode=self.loss_mode)
        d_fake = gan_loss(m.discriminator(fake), False, mode=self.loss_mode)
        d_loss = 0.5 * (d_real + d_fake)
        return {LOSS_KEY: d_loss, "d": d_loss, "d_real": d_real, "d_fake": d_fake}


@IDLModel.register("gan")
class GANModel(IDLModel):
    """generator ("core") + discriminator scopes (reference `gan.py:83-187`)."""

    def build(self, config: DLConfig) -> None:
        rngs = self.make_rngs()
        module_config = dict(config.module_config or {})
        discriminator = module_config.pop("discriminator", "basic")
        discriminator_config = module_config.pop("discriminator_config", {})
        self.loss_mode = module_config.pop("gan_loss", "vanilla")
        self.m = build_module(config.module_name or "gan", config=module_config, rngs=rngs)
        d_config = dict(discriminator_config)
        d_config.setdefault("in_channels", module_config.get("out_channels", 3))
        self.discriminator = discriminators.build(discriminator, rngs=rngs, **d_config)
        self.loss = nnx.data(None)

    @property
    def train_steps(self) -> List[TrainStep]:
        return [GeneratorStep(loss_mode=self.loss_mode), DiscriminatorStep(loss_mode=self.loss_mode)]

    def params_filter(self, scope: str) -> Any:
        if scope == "discriminator":
            return nnx.All(nnx.Param, nnx.PathContains("discriminator"))
        return nnx.All(nnx.Param, nnx.Not(nnx.PathContains("discriminator")))

    def forward(self, batch: tensor_dict_type, **kwargs: Any) -> Any:
        num = batch[INPUT_KEY].shape[0]
        labels = batch.get(LABEL_KEY) if self.m.is_conditional else None
        sampled = self.m.sample(num, labels=labels)
        return sampled

    def run(self, batch: tensor_dict_type, *, training: bool = False, **kwargs: Any) -> tensor_dict_type:
        self.set_mode(training)
        return {PREDICTIONS_KEY: self.forward(batch, **kwargs)}

    @property
    def all_modules(self) -> List[nnx.Module]:
        return [self.m, self.discriminator]
