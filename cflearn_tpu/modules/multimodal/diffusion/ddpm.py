"""DDPM generator: noise schedules, parameterizations, condition dispatch.

Parity: reference `cflearn/modules/multimodal/diffusion/ddpm.py:96-685` —
`make_beta_schedule` (linear/cosine, :51), noise-schedule buffers
(betas/alphas_cumprod/posterior coefs, `_register_noise_schedule`),
parameterizations eps/x0/v, `q_sample`, `sample` (:278), `reconstruct`
(:303 — img2img), `get_cond` (:326), `denoise` (:358 — condition-type
dispatch concat/cross_attn/hybrid/adm + ControlNet residual injection).

TPU-native: schedule buffers are nnx.Variables (serialized with the model);
the whole sampling loop lives in the sampler's `lax.scan` (one XLA program).
"""

import math
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ...common import register_module
from .unet import ControlNet, UNetDiffuser
from .utils import ADM_TYPE, CONCAT_TYPE, CROSS_ATTN_TYPE, HYBRID_TYPE


def make_condition_model(
    key: str, config: Optional[Dict[str, Any]] = None, *, rngs: Optional[nnx.Rngs] = None
) -> nnx.Module:
    """Build a condition model from its registered name (reference
    `ddpm.py:87` — specialized models like "rescaler" win over generic
    encoders like "clip_text")."""
    from .cond_models import condition_models, specialized_condition_models

    cfg = dict(config or {})
    registry = (
        specialized_condition_models
        if specialized_condition_models.has(key)
        else condition_models
    )
    return registry.build(key, rngs=rngs or nnx.Rngs(0), **cfg)


def make_beta_schedule(
    schedule: str,
    num_timesteps: int,
    *,
    linear_start: float = 1e-4,
    linear_end: float = 2e-2,
    cosine_s: float = 8e-3,
) -> np.ndarray:
    """Reference `ddpm.py:51`."""
    if schedule == "linear":
        betas = (
            np.linspace(linear_start**0.5, linear_end**0.5, num_timesteps, dtype=np.float64) ** 2
        )
    elif schedule == "cosine":
        timesteps = np.arange(num_timesteps + 1, dtype=np.float64) / num_timesteps + cosine_s
        alphas = timesteps / (1 + cosine_s) * math.pi / 2
        alphas = np.cos(alphas) ** 2
        alphas = alphas / alphas[0]
        betas = 1 - alphas[1:] / alphas[:-1]
        betas = np.clip(betas, 0.0, 0.999)
    elif schedule in ("sqrt_linear", "sqrt"):
        betas = np.linspace(linear_start, linear_end, num_timesteps, dtype=np.float64)
        if schedule == "sqrt":
            betas = betas**0.5
    else:
        raise ValueError(f"unrecognized schedule '{schedule}'")
    return betas.astype(np.float64)


@register_module("ddpm")
class DDPM(nnx.Module):
    """Core diffusion generator (UNet + schedule + condition model)."""

    def __init__(
        self,
        *,
        img_size: int = 64,
        in_channels: int = 4,
        out_channels: int = 4,
        num_timesteps: int = 1000,
        beta_schedule: str = "linear",
        linear_start: float = 1e-4,
        linear_end: float = 2e-2,
        cosine_s: float = 8e-3,
        given_betas: Optional[Any] = None,
        learn_log_var: bool = False,
        log_var_init: float = 0.0,
        parameterization: str = "eps",
        condition_type: str = CROSS_ATTN_TYPE,
        condition_model: Optional[Any] = None,
        condition_config: Optional[Dict[str, Any]] = None,
        condition_learnable: bool = False,
        unet_config: Optional[Dict[str, Any]] = None,
        v_posterior: float = 0.0,
        rngs: nnx.Rngs,
    ) -> None:
        self.img_size = img_size
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.num_timesteps = num_timesteps
        self.parameterization = parameterization
        self.condition_type = condition_type
        self.condition_learnable = condition_learnable
        if isinstance(condition_model, str):
            condition_model = make_condition_model(
                condition_model, condition_config, rngs=rngs
            )
        self.condition_model = nnx.data(condition_model)
        # DeepCache (Ma et al. 2023) — trace-time static config; samplers
        # alternate full/shallow UNet passes when `deepcache_interval` is set
        # (see `DiffusionAPI.set_deepcache`). The cut is clamped to the
        # architecture at use time (`_effective_cache_cut`).
        self.deepcache_interval: Optional[int] = None
        self.deepcache_cut: int = 3
        # None = uniform 1:N refreshes; a fraction in [0,1] switches to the
        # paper's non-uniform placement centered there (same cost)
        self.deepcache_center: Optional[float] = None
        unet_config = dict(unet_config or {})
        unet_config.setdefault("in_channels", in_channels)
        unet_config.setdefault("out_channels", out_channels)
        self.unet = UNetDiffuser(rngs=rngs, **unet_config)
        self.v_posterior = v_posterior
        self._register_noise_schedule(
            beta_schedule, num_timesteps, linear_start=linear_start, linear_end=linear_end,
            cosine_s=cosine_s, given_betas=given_betas,
        )
        # reference `ddpm.py:236-241`: per-timestep log-variance of the simple
        # loss — a learnable Param when `learn_log_var` (the "gamma" objective)
        self.learn_log_var = learn_log_var
        # sized from the REGISTERED schedule (given_betas may override the
        # `num_timesteps` argument — reference sizes it after registration,
        # `ddpm.py:237`)
        log_var = jnp.full((self.num_timesteps,), float(log_var_init), jnp.float32)
        self.log_var = nnx.Param(log_var) if learn_log_var else nnx.Variable(log_var)
        self.rngs = rngs

    # ------------------------------------------------------------- schedule

    def _register_noise_schedule(
        self,
        schedule: str,
        num_timesteps: int,
        *,
        linear_start: float,
        linear_end: float,
        cosine_s: float = 8e-3,
        given_betas: Optional[Any] = None,
    ) -> None:
        if given_betas is not None:
            betas = np.asarray(given_betas, np.float64)
            num_timesteps = len(betas)
            self.num_timesteps = num_timesteps
        else:
            betas = make_beta_schedule(
                schedule, num_timesteps, linear_start=linear_start, linear_end=linear_end,
                cosine_s=cosine_s,
            )
        # static (host-side) schedule spec: samplers precompute their per-step
        # schedules from this on the host, so sampling works when the module
        # state is a traced jit argument
        self.schedule_info = {
            "schedule": schedule,
            "num_timesteps": num_timesteps,
            "linear_start": linear_start,
            "linear_end": linear_end,
        }
        alphas = 1.0 - betas
        alphas_cumprod = np.cumprod(alphas)
        alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])
        posterior_variance = (1 - self.v_posterior) * betas * (
            1.0 - alphas_cumprod_prev
        ) / (1.0 - alphas_cumprod) + self.v_posterior * betas

        def buf(x: np.ndarray) -> nnx.Variable:
            return nnx.Variable(jnp.asarray(x, dtype=jnp.float32))

        self.betas = buf(betas)
        self.alphas_cumprod = buf(alphas_cumprod)
        self.alphas_cumprod_prev = buf(alphas_cumprod_prev)
        self.sqrt_alphas_cumprod = buf(np.sqrt(alphas_cumprod))
        self.sqrt_one_minus_alphas_cumprod = buf(np.sqrt(1.0 - alphas_cumprod))
        self.sqrt_recip_alphas_cumprod = buf(np.sqrt(1.0 / alphas_cumprod))
        self.sqrt_recipm1_alphas_cumprod = buf(np.sqrt(1.0 / alphas_cumprod - 1.0))
        self.posterior_variance = buf(posterior_variance)
        self.posterior_log_variance_clipped = buf(np.log(np.maximum(posterior_variance, 1e-20)))
        self.posterior_mean_coef1 = buf(
            betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)
        )
        self.posterior_mean_coef2 = buf(
            (1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)
        )
        # VLB per-timestep weights (reference `ddpm.py:652-668`)
        if self.parameterization == "eps":
            with np.errstate(divide="ignore"):
                lvlb = 0.5 * betas**2 / (posterior_variance * alphas * (1.0 - alphas_cumprod))
        elif self.parameterization == "x0":
            lvlb = 0.25 * np.sqrt(alphas_cumprod) / (1.0 - alphas_cumprod)
        else:  # v
            lvlb = np.ones_like(betas)
        lvlb[0] = lvlb[1]
        self.lvlb_weights = buf(lvlb)

    # ----------------------------------------------------------------- core

    def q_sample(self, x0: jax.Array, t: jax.Array, noise: jax.Array) -> jax.Array:
        sa = self.sqrt_alphas_cumprod[t].reshape(-1, 1, 1, 1)
        so = self.sqrt_one_minus_alphas_cumprod[t].reshape(-1, 1, 1, 1)
        return sa * x0 + so * noise

    def predict_eps_from(self, x_t: jax.Array, t: jax.Array, model_out: jax.Array) -> jax.Array:
        """model output → eps under the configured parameterization."""
        if self.parameterization == "eps":
            return model_out
        sa = self.sqrt_alphas_cumprod[t].reshape(-1, 1, 1, 1)
        so = self.sqrt_one_minus_alphas_cumprod[t].reshape(-1, 1, 1, 1)
        if self.parameterization == "v":
            return sa * model_out + so * x_t
        # x0 parameterization
        ra = self.sqrt_recip_alphas_cumprod[t].reshape(-1, 1, 1, 1)
        rm = self.sqrt_recipm1_alphas_cumprod[t].reshape(-1, 1, 1, 1)
        return (ra * x_t - model_out) / rm

    def predict_x0_from_eps(self, x_t: jax.Array, t: jax.Array, eps: jax.Array) -> jax.Array:
        ra = self.sqrt_recip_alphas_cumprod[t].reshape(-1, 1, 1, 1)
        rm = self.sqrt_recipm1_alphas_cumprod[t].reshape(-1, 1, 1, 1)
        return ra * x_t - rm * eps

    def get_v(self, x0: jax.Array, noise: jax.Array, t: jax.Array) -> jax.Array:
        sa = self.sqrt_alphas_cumprod[t].reshape(-1, 1, 1, 1)
        so = self.sqrt_one_minus_alphas_cumprod[t].reshape(-1, 1, 1, 1)
        return sa * noise - so * x0

    def _effective_cache_cut(self) -> int:
        """DeepCache cut clamped to the UNet: the shallow pass runs
        `input_blocks[:cut]` + `output_blocks[-(cut+1):]`, so cut must be
        <= len(input_blocks) and <= len(output_blocks)-1 (small UNets would
        otherwise capture a negative output index and crash at trace time)."""
        n_in = len(self.unet.input_blocks)
        n_out = len(self.unet.output_blocks)
        return max(1, min(self.deepcache_cut, n_in, n_out - 1))

    # ----------------------------------------------------------- conditions

    def get_cond(self, cond: Any) -> Any:
        """Encode raw condition via the condition model (reference :326)."""
        if self.condition_model is None:
            return cond
        return self.condition_model(cond)

    def denoise(
        self,
        net: jax.Array,
        timesteps: jax.Array,
        cond: Optional[Any] = None,
        *,
        control_net: Optional[Any] = None,
        control_hint: Optional[Any] = None,
        control_scales: Optional[List[Any]] = None,
        control_gates: Optional[Any] = None,
        hooks: Optional[Any] = None,
        deep_cache: Optional[jax.Array] = None,
        return_cache: bool = False,
    ) -> Any:
        """Condition dispatch + ControlNet injection (reference :358-475).

        Multi-control: `control_net`/`control_hint` may be lists — residuals
        are summed with per-control `control_scales` (list of per-level lists)
        as in the reference's multi-control path (`ddpm.py:430-456`).
        `control_gates` are optional per-control 0/1 scalars (traced) that
        implement the reference's start/end step gating inside one XLA
        program (multiplicative instead of Python `continue`)."""
        context = None
        labels = None
        if cond is not None:
            if self.condition_type == CONCAT_TYPE:
                net = jnp.concatenate([net, cond], axis=-1)
            elif self.condition_type == CROSS_ATTN_TYPE:
                context = cond
            elif self.condition_type == HYBRID_TYPE:
                assert isinstance(cond, dict)
                net = jnp.concatenate([net, cond[CONCAT_TYPE]], axis=-1)
                context = cond[CROSS_ATTN_TYPE]
            elif self.condition_type == ADM_TYPE:
                labels = cond
            else:
                raise ValueError(f"unrecognized condition type '{self.condition_type}'")
        control = None
        if control_net is not None and control_hint is not None:
            multi = isinstance(control_net, (list, tuple))
            nets = list(control_net) if multi else [control_net]
            hints = list(control_hint) if multi else [control_hint]
            if control_scales is None:
                scales_per: List[Optional[List[float]]] = [None] * len(nets)
            elif isinstance(control_scales[0], (list, tuple)):
                scales_per = list(control_scales)
            else:
                scales_per = [list(control_scales)] * len(nets)
            for i, (cn, hint) in enumerate(zip(nets, hints)):
                cn_in = getattr(cn, "in_channels", None) or cn.unet.in_channels
                # inpainting workaround (reference `ddpm.py:441-445`): a
                # 4-channel control branch driving a 9-channel inpainting UNet
                cnet_in = net if cn_in == net.shape[-1] else net[..., :cn_in]
                # shallow DeepCache passes consume only the first cut+1
                # residuals — skip computing the deep ControlNet levels
                cn_levels = None if deep_cache is None else self._effective_cache_cut() + 1
                ci = cn(cnet_in, hint, timesteps, context, max_levels=cn_levels)
                sc = scales_per[i] if i < len(scales_per) else None
                if sc is not None:
                    ci = [c * s for c, s in zip(ci, sc)]
                if control_gates is not None:
                    ci = [c * control_gates[i] for c in ci]
                control = ci if control is None else [a + b for a, b in zip(control, ci)]
        if (
            hooks is not None
            and getattr(hooks, "style", None) is not None
            and getattr(hooks, "ref_latent", None) is not None
        ):
            # style reference (reference `before_unet_forward` :724-760):
            # WRITE pass over the q-sampled reference latent banks the gated
            # blocks' activations; the real pass below READs them. Both
            # passes trace into the same XLA program.
            ref = hooks.ref_latent.astype(net.dtype)
            ref = jnp.broadcast_to(ref, (net.shape[0],) + ref.shape[1:])
            ts = timesteps.astype(jnp.int32)
            k = jax.random.fold_in(hooks.key, ts[0])
            noise = jax.random.normal(k, ref.shape, ref.dtype)
            ref_noisy = self.q_sample(ref, ts, noise)
            hooks.begin("write")
            self.unet(ref_noisy, timesteps, context, labels, hooks=hooks)
            hooks.begin("read")
            out = self.unet(
                net, timesteps, context, labels, control=control, hooks=hooks,
                deep_cache=deep_cache, cache_cut=self._effective_cache_cut() if (deep_cache is not None or return_cache) else None,
                return_cache=return_cache,
            )
            hooks.begin(None)
            return out
        return self.unet(
            net, timesteps, context, labels, control=control, hooks=hooks,
            deep_cache=deep_cache, cache_cut=self._effective_cache_cut() if (deep_cache is not None or return_cache) else None,
            return_cache=return_cache,
        )

    # ------------------------------------------------------------- sampling

    def sample(
        self,
        num_samples: int,
        *,
        sampler: Optional[Any] = None,
        cond: Optional[Any] = None,
        size: Optional[Any] = None,
        num_steps: int = 20,
        key: Optional[jax.Array] = None,
        **kwargs: Any,
    ) -> jax.Array:
        from .samplers import ISampler

        if sampler is None:
            sampler = ISampler.make("ddim", {"model": self})
        if size is None:
            size = (self.img_size, self.img_size)
        if key is None:
            key = self.rngs.default()
        # sample in the *output* latent space — with concat/hybrid conditioning
        # the UNet's in_channels exceeds the latent dim (e.g. SD inpainting 9ch)
        k1, k2 = jax.random.split(key)
        z = jax.random.normal(k1, (num_samples, size[0], size[1], self.out_channels))
        return sampler.sample(z, cond=cond, num_steps=num_steps, key=k2, **kwargs)

    def reconstruct(
        self,
        x0: jax.Array,
        *,
        sampler: Optional[Any] = None,
        cond: Optional[Any] = None,
        fidelity: float = 0.2,
        num_steps: int = 20,
        key: Optional[jax.Array] = None,
        **kwargs: Any,
    ) -> jax.Array:
        """img2img: q_sample to an intermediate t then denoise (reference :303)."""
        from .samplers import ISampler

        if sampler is None:
            sampler = ISampler.make("ddim", {"model": self})
        if key is None:
            key = self.rngs.default()
        # fidelity 1 keeps the input (skip ~all steps), 0 regenerates —
        # reference `_q_sample` semantics (start_step = fidelity * n)
        start_step = max(0, min(num_steps - 1, int(round(fidelity * num_steps))))
        return sampler.sample_from(
            x0, cond=cond, num_steps=num_steps, start_step=start_step, key=key, **kwargs
        )

    def __call__(self, net: jax.Array, timesteps: jax.Array, cond: Optional[Any] = None, **kwargs: Any) -> jax.Array:
        return self.denoise(net, timesteps, cond, **kwargs)
