"""Adversarial autoencoder training (AE-KL / AE-VQ).

Parity: reference `cflearn/models/cv/ae.py` — `AutoEncoderKLLoss` /
`AutoEncoderVQLoss` (:154/:228, recon + LPIPS perceptual + KL/VQ latent term
with an **adaptive discriminator weight**) and `AEModel`/`AEVQModel`
(:304-419, `GeneratorStep` + `DiscriminatorStep`).

TPU-native note: the reference's adaptive weight uses the ratio of gradient
norms w.r.t. the decoder's last layer (`calculate_adaptive_weight`); that
double-backward is expensive under XLA, so the default here is a fixed
discriminator weight with the adaptive path available via
`use_adaptive_weight` (grad norms taken at the reconstruction — same balance
ratio up to the shared last-layer Jacobian).
"""

import math
from typing import Any, List

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


def _g_loss(logits: Any) -> jax.Array:
    """Generator adversarial term: `-mean(fake)` (reference
    `models/cv/ae.py:104` — taming-style, independent of the d_loss mode)."""
    if isinstance(logits, list):
        return sum(_g_loss(l) for l in logits) / len(logits)
    return -jnp.mean(logits)


class AEGeneratorStep(TrainStep):
    def __init__(
        self,
        *,
        kl_weight: float = 1.0e-6,
        perceptual_weight: float = 1.0,
        d_weight: float = 0.5,
        d_factor: float = 1.0,
        d_loss: str = "hinge",
        use_adaptive_weight: bool = False,
    ) -> None:
        super().__init__("core")
        self.kl_weight = kl_weight
        self.perceptual_weight = perceptual_weight
        self.d_weight = d_weight
        self.d_factor = d_factor
        self.d_loss = d_loss
        self.use_adaptive_weight = use_adaptive_weight

    def loss_fn(
        self,
        m: "AEModel",
        batch: tensor_dict_type,
        forward_results: tensor_dict_type,
        **kwargs: Any,
    ) -> loss_dict_type:
        inputs = batch[INPUT_KEY]
        recon = forward_results[PREDICTIONS_KEY]

        def nll_of(r: jax.Array) -> jax.Array:
            net = jnp.mean(jnp.abs(inputs - r))
            if m.perceptual is not None and self.perceptual_weight > 0:
                net = net + self.perceptual_weight * jnp.mean(m.perceptual(r, inputs))
            if m.log_var is not None:
                # learned reconstruction variance (reference
                # `models/cv/ae.py:183,211`: nll = recon/exp(log_var)+log_var)
                net = net / jnp.exp(m.log_var[...]) + m.log_var[...]
            return net

        l1 = jnp.mean(jnp.abs(inputs - recon))
        losses = {"l1": l1}
        if m.perceptual is not None and self.perceptual_weight > 0:
            losses["perceptual"] = jnp.mean(m.perceptual(recon, inputs))
        nll_loss = nll_of(recon)
        total = nll_loss
        if "distribution" in forward_results:
            kl = jnp.mean(forward_results["distribution"].kl())
            losses["kl"] = kl
            total = total + self.kl_weight * kl
        if "codebook_loss" in forward_results:
            cb = forward_results["codebook_loss"] + 0.25 * forward_results["commitment_loss"]
            losses["vq"] = cb
            total = total + cb
        # adversarial term only once the discriminator step is live
        # (reference gates on `step < d_loss_start_step`,
        # `models/cv/ae.py:220-225`); `step_actives` is static per compiled
        # program so no traced branch is needed
        d_on = m.discriminator is not None and self.step_actives.get("discriminator", True)
        if d_on and self.d_factor > 0:
            g_loss = _g_loss(m.discriminator(recon))
            losses["g"] = g_loss
            if self.use_adaptive_weight:
                d_weight = self._adaptive_weight(m, nll_of, recon)
            else:
                d_weight = self.d_weight
            total = total + d_weight * self.d_factor * g_loss
        losses[LOSS_KEY] = total
        return losses

    def _adaptive_weight(self, m: "AEModel", nll_of: Any, recon: jax.Array) -> jax.Array:
        """`||∂nll/∂recon|| / (||∂g/∂recon|| + 1e-4)`, clipped to [0, 1e4],
        detached, × d_weight — reference `get_d_weight`
        (`models/cv/ae.py:79-91`) takes the grads at the LAST DECODER KERNEL;
        taking them at the reconstruction gives the same balance ratio up to
        the shared last-layer Jacobian and avoids re-plumbing pre-head
        activations through every decoder."""
        m.discriminator.eval()
        if m.perceptual is not None:
            m.perceptual.eval()

        def g_of(r: jax.Array) -> jax.Array:
            return _g_loss(m.discriminator(r))

        nll_grads = jax.grad(nll_of)(recon)
        g_grads = jax.grad(g_of)(recon)
        m.discriminator.train()
        d_weight = jnp.linalg.norm(nll_grads.ravel()) / (jnp.linalg.norm(g_grads.ravel()) + 1.0e-4)
        d_weight = jnp.clip(d_weight, 0.0, 1.0e4)
        return jax.lax.stop_gradient(d_weight) * self.d_weight


class AEDiscriminatorStep(TrainStep):
    def __init__(self, *, d_factor: float = 1.0, d_loss: str = "hinge") -> None:
        super().__init__("discriminator", requires_new_forward=True, requires_grad_in_forward=False)
        self.d_factor = d_factor
        self.d_loss = d_loss

    def should_skip(self, m: "AEModel", state: Any) -> bool:
        # reference `DiscriminatorStep.should_skip` (`models/cv/ae.py:339`):
        # the adversarial game starts at `d_loss_start_step`
        return state is not None and state.step < m.d_loss_start_step

    def loss_fn(
        self,
        m: "AEModel",
        batch: tensor_dict_type,
        forward_results: tensor_dict_type,
        **kwargs: Any,
    ) -> loss_dict_type:
        inputs = batch[INPUT_KEY]
        recon = jax.lax.stop_gradient(forward_results[PREDICTIONS_KEY])
        d_real = gan_loss(m.discriminator(inputs), True, mode=self.d_loss)
        d_fake = gan_loss(m.discriminator(recon), False, mode=self.d_loss)
        d_loss = self.d_factor * 0.5 * (d_real + d_fake)
        return {LOSS_KEY: d_loss, "d": d_loss}


@IDLModel.register("ae_kl")
class AEModel(IDLModel):
    def build(self, config: DLConfig) -> None:
        rngs = self.make_rngs()
        module_config = dict(config.module_config or {})
        use_discriminator = module_config.pop("use_discriminator", True)
        use_perceptual = module_config.pop("use_perceptual", True)
        self.kl_weight = module_config.pop("kl_weight", 1.0e-6)
        # adversarial-phase start (reference default 50001,
        # `models/cv/ae.py:55` — here 0 so small runs exercise the GAN path
        # unless configured otherwise)
        self.d_loss_start_step = module_config.pop("d_loss_start_step", 0)
        self.d_weight = module_config.pop("d_weight", 0.5)
        self.d_factor = module_config.pop("d_factor", 1.0)
        self.d_loss_mode = module_config.pop("d_loss", "hinge")
        self.perceptual_weight = module_config.pop("perceptual_weight", 1.0)
        self.use_adaptive_weight = module_config.pop("use_adaptive_weight", False)
        log_var_init = module_config.pop("log_var_init", None)
        # learned reconstruction log-variance (reference `log_var` Param,
        # `models/cv/ae.py:183`); opt-in via log_var_init
        self.log_var = (
            nnx.data(None) if log_var_init is None else nnx.Param(jnp.asarray(float(log_var_init)))
        )
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
        steps: List[TrainStep] = [
            AEGeneratorStep(
                kl_weight=self.kl_weight,
                perceptual_weight=self.perceptual_weight,
                d_weight=self.d_weight,
                d_factor=self.d_factor,
                d_loss=self.d_loss_mode,
                use_adaptive_weight=self.use_adaptive_weight,
            )
        ]
        if self.discriminator is not None:
            steps.append(AEDiscriminatorStep(d_factor=self.d_factor, d_loss=self.d_loss_mode))
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
