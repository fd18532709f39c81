"""GAN training semantics — the canonical multi-optimizer example.

Parity: reference `cflearn/models/cv/gan.py` — `GANLoss`/`GradientNormLoss`
(:35-82), `GANModel` (:83-187): `VanillaGeneratorStep` (scope "core") +
`VanillaDiscriminatorStep` (scope "discriminator", `requires_new_forward`).

TPU-native: the two steps compile into ONE jitted program; the discriminator
step sees generated samples through `lax.stop_gradient` instead of optimizer
toggling.
"""

from typing import Any, List, NamedTuple, Optional

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


class GANTarget(NamedTuple):
    """reference `models/cv/gan.py:30`."""

    target_is_real: bool
    labels: Optional[jax.Array] = None


class DiscriminatorOutput(NamedTuple):
    """(patch logits, optional class logits) — reference
    `modules/cv/gan/discriminators.py` DiscriminatorOutput."""

    output: Any
    cond_logits: Optional[jax.Array] = None


def gan_loss(logits: Any, target_real: bool, *, mode: str = "vanilla") -> jax.Array:
    """reference `GANLoss` (`models/cv/gan.py:47-82`): vanilla (BCE), lsgan
    (MSE), wgangp (±mean; gradient penalty handled by the discriminator
    step), plus hinge (used by the AE adversarial losses)."""
    if isinstance(logits, list):
        return sum(gan_loss(l, target_real, mode=mode) for l in logits) / len(logits)
    if mode == "hinge":
        if target_real:
            return jnp.mean(jax.nn.relu(1.0 - logits))
        return jnp.mean(jax.nn.relu(1.0 + logits))
    if mode == "lsgan":
        target = 1.0 if target_real else 0.0
        return jnp.mean((logits - target) ** 2)
    if mode == "wgangp":
        return -jnp.mean(logits) if target_real else jnp.mean(logits)
    target = jnp.ones_like(logits) if target_real else jnp.zeros_like(logits)
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    return -jnp.mean(target * log_p + (1.0 - target) * log_not_p)


def gradient_norm_penalty(disc: Any, x: jax.Array, *, k: float = 1.0) -> jax.Array:
    """`mean((||∂D(x)/∂x||_2 - k)^2)` per sample (reference
    `GradientNormLoss`, `models/cv/gan.py:35-44`)."""
    grads = jax.grad(lambda net: jnp.sum(disc(net)))(x)
    norms = jnp.linalg.norm(grads.reshape(x.shape[0], -1), axis=1)
    return jnp.mean((norms - k) ** 2)


def _cond_ce(cond_logits: Optional[jax.Array], labels: Optional[jax.Array]) -> Optional[jax.Array]:
    if cond_logits is None or labels is None:
        return None
    one_hot = jax.nn.one_hot(labels.ravel(), cond_logits.shape[-1])
    return -jnp.mean(jnp.sum(one_hot * jax.nn.log_softmax(cond_logits), axis=-1))


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
        logits, cond_logits = m.discriminate(sampled)
        g_loss = gan_loss(logits, True, mode=self.loss_mode)
        losses = {"g": g_loss}
        # class-conditional CE on "real" targets (reference `GANLoss.forward`,
        # `models/cv/gan.py:76-79`)
        ce = _cond_ce(cond_logits, batch.get(LABEL_KEY))
        if ce is not None:
            losses["g_cond"] = ce
            g_loss = g_loss + ce
        losses[LOSS_KEY] = g_loss
        return losses


class DiscriminatorStep(TrainStep):
    def __init__(self, *, loss_mode: str = "vanilla", lambda_gp: float = 10.0) -> None:
        super().__init__("discriminator", requires_new_forward=True, requires_grad_in_forward=False)
        self.loss_mode = loss_mode
        self.lambda_gp = lambda_gp

    def loss_fn(
        self,
        m: "GANModel",
        batch: tensor_dict_type,
        forward_results: tensor_dict_type,
        **kwargs: Any,
    ) -> loss_dict_type:
        real = batch[INPUT_KEY]
        fake = jax.lax.stop_gradient(forward_results[PREDICTIONS_KEY])
        real_logits, real_cond = m.discriminate(real)
        d_real = gan_loss(real_logits, True, mode=self.loss_mode)
        d_fake = gan_loss(m.discriminator(fake), False, mode=self.loss_mode)
        losses = {"d_real": d_real, "d_fake": d_fake}
        ce = _cond_ce(real_cond, batch.get(LABEL_KEY))
        if ce is not None:
            losses["d_cond"] = ce
            d_real = d_real + ce
        d_loss = 0.5 * (d_real + d_fake)
        if self.loss_mode == "wgangp":
            # gradient penalty on real/fake interpolates (reference
            # `models/cv/gan.py:123-130`; eps is a per-step scalar there too)
            eps = jax.random.uniform(m.m.rngs.gp(), ())
            merged = eps * real + (1.0 - eps) * fake
            m.discriminator.eval()
            gp = gradient_norm_penalty(m.discriminator, merged)
            m.discriminator.train()
            losses["d_gp"] = gp
            d_loss = d_loss + self.lambda_gp * gp
        losses["d"] = d_loss
        losses[LOSS_KEY] = d_loss
        return losses


@IDLModel.register("gan")
class GANModel(IDLModel):
    """generator ("core") + discriminator scopes (reference `gan.py:83-187`)."""

    def build(self, config: DLConfig) -> None:
        rngs = self.make_rngs()
        module_config = dict(config.module_config or {})
        discriminator = module_config.pop("discriminator", "basic")
        discriminator_config = module_config.pop("discriminator_config", {})
        # reference reads `gan_mode`/`lambda_gp` from loss_config
        # (`models/cv/gan.py:158-161`); `gan_loss` in module_config is kept as
        # the historical alias
        loss_config = dict(config.loss_config or {})
        self.loss_mode = loss_config.get("gan_mode", module_config.pop("gan_loss", "vanilla"))
        self.lambda_gp = float(loss_config.get("lambda_gp", module_config.pop("lambda_gp", 10.0)))
        self.m = build_module(config.module_name or "gan", config=module_config, rngs=rngs)
        d_config = dict(discriminator_config)
        d_config.setdefault("in_channels", module_config.get("out_channels", 3))
        if self.m.is_conditional and discriminator == "basic":
            # class-conditional logits head (reference conditional PatchGAN)
            d_config.setdefault("num_classes", self.m.num_classes)
        self.discriminator = discriminators.build(discriminator, rngs=rngs, **d_config)
        self.loss = nnx.data(None)

    @property
    def train_steps(self) -> List[TrainStep]:
        return [
            GeneratorStep(loss_mode=self.loss_mode),
            DiscriminatorStep(loss_mode=self.loss_mode, lambda_gp=self.lambda_gp),
        ]

    def discriminate(self, x: jax.Array) -> DiscriminatorOutput:
        """(patch logits, optional class logits) — reference
        `DiscriminatorOutput` (`modules/cv/gan/discriminators.py`)."""
        fwd = getattr(self.discriminator, "forward_with_cond", None)
        if fwd is None:
            return DiscriminatorOutput(self.discriminator(x), None)
        return DiscriminatorOutput(*fwd(x))

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
