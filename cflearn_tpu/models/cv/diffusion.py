"""DDPM training semantics.

Parity: reference `cflearn/models/cv/diffusion.py` — `DDPMStep` (:33 —
p-losses: MSE against the eps/x0/v target; EMA update in the step callback)
and `DDPMModel` (:115, registered "ddpm").

TPU-native: the random timestep/noise draws use the model's nnx Rngs (carried
in state through the jitted step); EMA runs inside `post_step_update` so the
whole optimization remains one XLA program.
"""

from typing import Any, List

import jax
import jax.numpy as jnp
from flax import nnx

from ...constants import INPUT_KEY, LOSS_KEY, PREDICTIONS_KEY
from ...modules.common import EMA, build_module
from ...modules.multimodal.diffusion.ddpm import DDPM
from ...schema.config import DLConfig
from ...schema.losses_schema import loss_dict_type
from ...schema.model import IDLModel, TrainStep
from ...toolkit.misc import tensor_dict_type


def _to_diffusion_space(ddpm: DDPM, x0: jax.Array) -> jax.Array:
    """LDMs diffuse in the (frozen) first-stage latent space (reference
    `modules/multimodal/diffusion/ldm.py:40` encodes inputs before
    q-sampling); plain DDPMs diffuse in pixel space."""
    from ...modules.multimodal.diffusion.ldm import LDM

    if isinstance(ddpm, LDM) and ddpm.first_stage is not None:
        return jax.lax.stop_gradient(ddpm.encode_first_stage(x0))
    return x0


class DDPMStep(TrainStep):
    """p-losses (reference `models/cv/diffusion.py:33-94`): per-sample simple
    loss reweighted by the (optionally learned) per-timestep log-variance,
    plus an optional VLB term (`original_elbo_weight`)."""

    l_simple_weight: float = 1.0
    original_elbo_weight: float = 0.0

    def loss_fn(
        self,
        m: "DDPMModel",
        batch: tensor_dict_type,
        forward_results: tensor_dict_type,
        **kwargs: Any,
    ) -> loss_dict_type:
        ddpm: DDPM = m.m
        x0 = _to_diffusion_space(ddpm, batch[INPUT_KEY])
        b = x0.shape[0]
        t = jax.random.randint(ddpm.rngs.default(), (b,), 0, ddpm.num_timesteps)
        noise = jax.random.normal(ddpm.rngs.default(), x0.shape, x0.dtype)
        x_t = ddpm.q_sample(x0, t, noise)
        cond = batch.get("cond")
        if cond is not None:
            cond = ddpm.get_cond(cond)
        model_out = ddpm.denoise(x_t, t, cond)
        if ddpm.parameterization == "eps":
            target = noise
        elif ddpm.parameterization == "x0":
            target = x0
        else:  # v
            target = ddpm.get_v(x0, noise, t)
        per_sample = jnp.mean(jnp.square(model_out - target), axis=tuple(range(1, x0.ndim)))
        losses: loss_dict_type = {"simple": jnp.mean(per_sample)}
        log_var_t = ddpm.log_var[...][t]
        loss_simple = per_sample / jnp.exp(log_var_t) + log_var_t
        if ddpm.learn_log_var:
            losses["gamma"] = jnp.mean(loss_simple)
            losses["log_var"] = jnp.mean(ddpm.log_var[...])
        loss = self.l_simple_weight * jnp.mean(loss_simple)
        if self.original_elbo_weight > 0:
            loss_vlb = jnp.mean(ddpm.lvlb_weights[...][t] * per_sample)
            losses["vlb"] = loss_vlb
            loss = loss + self.original_elbo_weight * loss_vlb
        losses[LOSS_KEY] = loss
        return losses


@IDLModel.register("ddpm")
class DDPMModel(IDLModel):
    """DDPM wrapper with optional EMA (reference `models/cv/diffusion.py:115`)."""

    def build(self, config: DLConfig) -> None:
        rngs = self.make_rngs()
        module_config = dict(config.module_config or {})
        ema_decay = module_config.pop("ema_decay", None)
        self.m = build_module(config.module_name or "ddpm", config=module_config, rngs=rngs)
        self.loss = nnx.data(None)
        # reference DDPMStep weights, configurable via loss_config
        loss_config = dict(config.loss_config or {})
        self._l_simple_weight = float(loss_config.get("l_simple_weight", 1.0))
        self._original_elbo_weight = float(loss_config.get("original_elbo_weight", 0.0))
        if ema_decay is not None:
            self.ema = EMA(ema_decay, self.m)
        else:
            self.ema = nnx.data(None)

    @property
    def train_steps(self) -> List[TrainStep]:
        step = DDPMStep("all")
        step.l_simple_weight = getattr(self, "_l_simple_weight", 1.0)
        step.original_elbo_weight = getattr(self, "_original_elbo_weight", 0.0)
        return [step]

    def params_filter(self, scope: str) -> Any:
        # train the UNet but not EMA shadows; keep the LDM first stage frozen
        # (reference trains latent diffusion against a pretrained autoencoder —
        # `examples/cv/diffusion/mnist_ldm.py`) and the condition model frozen
        # unless `condition_learnable` (reference `ddpm.py:341-356`)
        filters = [
            nnx.Param,
            nnx.Not(nnx.PathContains("ema")),
            nnx.Not(nnx.PathContains("first_stage")),
        ]
        if not getattr(self.m, "condition_learnable", True):
            filters.append(nnx.Not(nnx.PathContains("condition_model")))
        return nnx.All(*filters)

    def post_step_update(self) -> None:
        if self.ema is not None:
            self.ema.update(self.m)

    def run(self, batch: tensor_dict_type, *, training: bool = False, **kwargs: Any) -> tensor_dict_type:
        self.set_mode(training)
        # forward for monitoring: one-step denoise error on a fixed timestep
        ddpm: DDPM = self.m
        x0 = _to_diffusion_space(ddpm, batch[INPUT_KEY])
        b = x0.shape[0]
        t = jnp.full((b,), ddpm.num_timesteps // 2, dtype=jnp.int32)
        noise = jax.random.normal(ddpm.rngs.default(), x0.shape, x0.dtype)
        x_t = ddpm.q_sample(x0, t, noise)
        cond = batch.get("cond")
        if cond is not None:
            cond = ddpm.get_cond(cond)
        out = ddpm.denoise(x_t, t, cond)
        return {PREDICTIONS_KEY: out, "noise": noise, "timesteps": t}

    @property
    def all_modules(self) -> List[nnx.Module]:
        mods: List[nnx.Module] = [self.m]
        if self.ema is not None:
            mods.append(self.ema)
        return mods
