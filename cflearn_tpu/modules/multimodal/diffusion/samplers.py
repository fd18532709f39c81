"""Samplers — `lax.scan`-compiled denoising loops.

Parity: reference `cflearn/modules/multimodal/diffusion/samplers/` —
`ISampler` registry + `sample()` driving `sample_step` (`schema.py:115-196`),
`DDPMQSampler` q-sampling (:72-114), `UncondSamplerMixin` CFG (:197+);
implementations: `ddim` (`ddim.py:272`), `basic` (ancestral DDPM), k-samplers
`k_euler`/`k_euler_a`/`klms`/`k_heun`/`k_dpmpp_2m` (`k_samplers.py:287-444`,
Karras sigmas), `solver` (DPM-Solver, `solver.py:23`), `plms`, `lcm`.

TPU-native: the reference drives the step loop from Python
(`samplers/schema.py:153-196` — host-level hot loop); here every sampler
precomputes its per-step schedule as static arrays and runs ONE `lax.scan`,
so the whole denoise loop is a single XLA program. CFG batches cond+uncond
into one UNet call.
"""

import math
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ....toolkit.registry import WithRegister


def deepcache_refresh_mask(
    n: int,
    interval: int,
    center: Optional[float] = None,
    power: float = 2.0,
) -> np.ndarray:
    """Host-static boolean mask over `n` sampler steps: True = run the FULL
    UNet (refresh the DeepCache feature), False = shallow pass.

    `center=None` → the paper's uniform 1:N schedule (`step % interval == 0`).
    A float in [0, 1] → the paper's NON-UNIFORM schedule (DeepCache §4.2,
    Ma et al. 2023, arXiv:2312.00858): the SAME number of full steps —
    identical compute cost — placed by a power-law map concentrated around
    `center * n`, where the deep features change fastest, instead of evenly.
    Step 0 is always full (it seeds the cache)."""
    if n <= 0:
        return np.zeros((0,), dtype=bool)
    uniform = (np.arange(n) % interval) == 0
    if center is None:
        return uniform
    k = int(uniform.sum())  # cost parity with the uniform schedule
    c = float(np.clip(center, 0.0, 1.0)) * (n - 1)
    u = np.linspace(-1.0, 1.0, k) if k > 1 else np.zeros((1,))
    # quadratic spacing with per-side reach: endpoints land on 0 and n-1
    # (no long unrefreshed tail) while interior points cluster around c
    reach = np.where(u < 0.0, c, (n - 1) - c)
    raw = c + np.sign(u) * (np.abs(u) ** power) * reach
    chosen = {int(round(v)) for v in np.clip(raw, 0, n - 1)}
    chosen.add(0)
    # keep exactly k refreshes: top up with (or drop) the steps nearest to
    # (farthest from) the center; never drop step 0
    spare = sorted(set(range(n)) - chosen, key=lambda i: abs(i - c))
    while len(chosen) < k and spare:
        chosen.add(spare.pop(0))
    while len(chosen) > k:
        chosen.remove(max((i for i in chosen if i != 0), key=lambda i: abs(i - c)))
    mask = np.zeros((n,), dtype=bool)
    mask[sorted(chosen)] = True
    return mask


def map_center_to_segment(center: float, n: int, seg: np.ndarray) -> float:
    """Map a refresh-center fraction of the WHOLE `n`-step loop into the
    local coordinates of segment `seg` (global step indices), so
    guidance-interval segmentation doesn't reinterpret `deepcache_center`
    as per-segment (see `DiffusionAPI.set_deepcache`)."""
    global_center = float(np.clip(center, 0.0, 1.0)) * (n - 1)
    return float(np.clip((global_center - seg[0]) / max(1, len(seg) - 1), 0.0, 1.0))


class ISampler(WithRegister):
    d: Dict[str, type] = {}

    # CFG only inside a fraction band of the step loop (Kynkäänniemi et al.
    # 2024); honored by samplers whose update carries no cross-step history
    # (ddim/basic + euler-family k-samplers)
    supports_guidance_interval = False

    def __init__(self, model: Any, **kwargs: Any) -> None:
        self.model = model
        self.default_steps = kwargs.get("default_steps", 20)
        self.guidance_interval: Optional[Tuple[float, float]] = kwargs.get(
            "guidance_interval"
        )

    # ------------------------------------------------------------------ api

    def sample(
        self,
        z: jax.Array,
        *,
        cond: Optional[Any] = None,
        uncond: Optional[Any] = None,
        guidance_scale: float = 1.0,
        num_steps: Optional[int] = None,
        key: Optional[jax.Array] = None,
        **kwargs: Any,
    ) -> jax.Array:
        raise NotImplementedError

    def sample_from(
        self,
        x0: jax.Array,
        *,
        cond: Optional[Any] = None,
        num_steps: int = 20,
        start_step: int = 0,
        key: Optional[jax.Array] = None,
        **kwargs: Any,
    ) -> jax.Array:
        """img2img entry: q-sample `x0` to the start step then denoise."""
        raise NotImplementedError

    # -------------------------------------------------------------- helpers

    def _denoise(
        self,
        x: jax.Array,
        t: jax.Array,
        cond: Optional[Any],
        uncond: Optional[Any],
        guidance_scale: float,
        deep_cache: Optional[jax.Array] = None,
        return_cache: bool = False,
        **kwargs: Any,
    ) -> Any:
        """CFG denoise → eps. Batches cond & uncond into one UNet call.
        `deep_cache`/`return_cache` thread the DeepCache feature (the cache
        lives at the CFG-batched size in CFG segments)."""
        m = self.model
        dc_kw = {}
        if deep_cache is not None or return_cache:
            dc_kw = {"deep_cache": deep_cache, "return_cache": True}
        if uncond is None or guidance_scale == 1.0:
            out = m.denoise(x, t, cond, **kwargs, **dc_kw)
            cache = None
            if dc_kw:
                out, cache = out
            eps = m.predict_eps_from(x, t.astype(jnp.int32), out)
            return (eps, cache) if return_cache or deep_cache is not None else eps
        x2 = jnp.concatenate([x, x], axis=0)
        t2 = jnp.concatenate([t, t], axis=0)
        # cond may be a pytree (hybrid concat+cross_attn conditioning)
        c2 = jax.tree_util.tree_map(
            lambda a, b: jnp.concatenate([a, b], axis=0), cond, uncond
        )
        if kwargs.get("control_hint") is not None:
            kwargs = dict(kwargs)
            # CFG-safe hint batching: single hint array or list of hints
            kwargs["control_hint"] = jax.tree_util.tree_map(
                lambda h: jnp.concatenate([h, h], axis=0), kwargs["control_hint"]
            )
        out = m.denoise(x2, t2, c2, **kwargs, **dc_kw)
        cache = None
        if dc_kw:
            out, cache = out
        eps = m.predict_eps_from(x2, t2.astype(jnp.int32), out)
        eps_cond, eps_uncond = jnp.split(eps, 2, axis=0)
        eps = eps_uncond + guidance_scale * (eps_cond - eps_uncond)
        return (eps, cache) if return_cache or deep_cache is not None else eps

    def _pop_control_gate_schedule(
        self, kwargs: Dict[str, Any], num_exec_steps: int
    ) -> Tuple[Dict[str, Any], Optional[np.ndarray]]:
        """Consume `control_hint_start`/`control_hint_end` kwargs and build a
        static per-executed-step gate matrix (S, n_controls) — the TPU-native
        form of the reference's per-step Python gating
        (`ddpm.py:398-401`: start*total <= step <= end*total)."""
        start = kwargs.pop("control_hint_start", None)
        end = kwargs.pop("control_hint_end", None)
        if start is None and end is None:
            return kwargs, None
        ch = kwargs.get("control_hint")
        n = len(ch) if isinstance(ch, (list, tuple)) else 1
        starts = list(start) if isinstance(start, (list, tuple)) else [start] * n
        ends = list(end) if isinstance(end, (list, tuple)) else [end] * n
        gates = np.ones((num_exec_steps, n), dtype=np.float32)
        for i in range(n):
            for s_idx in range(num_exec_steps):
                if starts[i] is not None and starts[i] * num_exec_steps > s_idx:
                    gates[s_idx, i] = 0.0
                if ends[i] is not None and ends[i] * num_exec_steps < s_idx:
                    gates[s_idx, i] = 0.0
        return kwargs, gates

    def _start_timestep(self, num_steps: int, start_step: int) -> int:
        """The model timestep of the `start_step`-th executed step — MUST
        match this sampler's own schedule grid so `sample_from` q-samples to
        the exact noise level the sampler will assume (the default is the
        uniform grid used by ddim/plms)."""
        acp = self._np_acp()
        ts = _uniform_timesteps(len(acp), num_steps)
        order = np.arange(num_steps)[::-1]
        return int(ts[order[start_step]]) if start_step < num_steps else 0

    def _np_acp(self) -> np.ndarray:
        """Host-side alphas_cumprod — recomputed from the model's static
        schedule spec (the buffer itself may be a tracer under jit)."""
        info = getattr(self.model, "schedule_info", None)
        if info is None:
            return np.asarray(self.model.alphas_cumprod[...])
        from .ddpm import make_beta_schedule

        betas = make_beta_schedule(
            info["schedule"],
            info["num_timesteps"],
            linear_start=info["linear_start"],
            linear_end=info["linear_end"],
        )
        return np.cumprod(1.0 - betas).astype(np.float64)


def _uniform_timesteps(num_train: int, num_steps: int) -> np.ndarray:
    c = num_train // num_steps
    ts = np.asarray(list(range(0, num_train, c))) + 1
    return np.clip(ts, 0, num_train - 1)


@ISampler.register("ddim")
class DDIMSampler(ISampler):
    """Deterministic DDIM (eta-configurable; reference `ddim.py`)."""

    supports_guidance_interval = True

    def __init__(self, model: Any, *, eta: float = 0.0, **kwargs: Any) -> None:
        super().__init__(model, **kwargs)
        self.eta = eta

    def _schedule(self, num_steps: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        acp = self._np_acp()
        ts = _uniform_timesteps(len(acp), num_steps)
        alphas = acp[ts]
        alphas_prev = np.concatenate([[acp[0]], acp[ts[:-1]]])
        sigmas = self.eta * np.sqrt(
            (1 - alphas_prev) / (1 - alphas) * (1 - alphas / alphas_prev)
        )
        return ts, alphas, alphas_prev, sigmas

    def sample(
        self,
        z: jax.Array,
        *,
        cond: Optional[Any] = None,
        uncond: Optional[Any] = None,
        guidance_scale: float = 1.0,
        num_steps: Optional[int] = None,
        key: Optional[jax.Array] = None,
        start_step: int = 0,
        **kwargs: Any,
    ) -> jax.Array:
        num_steps = num_steps or self.default_steps
        ts, alphas, alphas_prev, sigmas = self._schedule(num_steps)
        # reversed order (T → 0)
        order = np.arange(num_steps)[::-1][start_step:]
        if key is None:
            key = jax.random.PRNGKey(0)
        keys = jax.random.split(key, len(order))
        b = z.shape[0]
        kwargs, gates = self._pop_control_gate_schedule(dict(kwargs), len(order))
        n = len(order)

        def run_segment(x: jax.Array, seg: np.ndarray, use_cfg: bool) -> jax.Array:
            if seg.size == 0:
                return x
            idx = order[seg]
            ts_r = jnp.asarray(ts[idx])
            a_r = jnp.asarray(alphas[idx], dtype=z.dtype)
            ap_r = jnp.asarray(alphas_prev[idx], dtype=z.dtype)
            s_r = jnp.asarray(sigmas[idx], dtype=z.dtype)
            seg_keys = keys[seg]
            gates_r = None if gates is None else jnp.asarray(gates[seg])
            seg_uncond = uncond if use_cfg else None
            seg_scale = guidance_scale if use_cfg else 1.0

            def update(x: jax.Array, eps: jax.Array, a_t: Any, a_prev: Any, sigma_t: Any, k: Any) -> jax.Array:
                x0 = (x - jnp.sqrt(1.0 - a_t) * eps) / jnp.sqrt(a_t)
                dir_xt = jnp.sqrt(jnp.maximum(1.0 - a_prev - sigma_t**2, 0.0)) * eps
                noise = sigma_t * jax.random.normal(k, x.shape, x.dtype)
                return jnp.sqrt(a_prev) * x0 + dir_xt + noise

            def unpack(inputs: Any) -> Any:
                if gates_r is None:
                    t, a_t, a_prev, sigma_t, k = inputs
                    return t, a_t, a_prev, sigma_t, k, kwargs
                t, a_t, a_prev, sigma_t, k, g = inputs
                return t, a_t, a_prev, sigma_t, k, dict(kwargs, control_gates=g)

            xs = (
                (ts_r, a_r, ap_r, s_r, seg_keys)
                if gates_r is None
                else (ts_r, a_r, ap_r, s_r, seg_keys, gates_r)
            )
            interval = getattr(self.model, "deepcache_interval", None)
            if interval is None or interval <= 1 or len(idx) < 2:

                def step(x: jax.Array, inputs: Any) -> Tuple[jax.Array, None]:
                    t, a_t, a_prev, sigma_t, k, kw = unpack(inputs)
                    tb = jnp.full((b,), t)
                    eps = self._denoise(x, tb, cond, seg_uncond, seg_scale, **kw)
                    return update(x, eps, a_t, a_prev, sigma_t, k), None

                out, _ = jax.lax.scan(step, x, xs)
                return out

            # DeepCache (Ma et al. 2023): the segment's first step runs FULL
            # (unrolled, seeding the cache); subsequent steps alternate by
            # parity — a shallow pass reuses the deep feature from the last
            # full pass. The parity restarts per segment, so the cache never
            # crosses a CFG-batch-size boundary.
            first = jax.tree_util.tree_map(lambda a: a[0], xs)
            rest = jax.tree_util.tree_map(lambda a: a[1:], xs)
            t, a_t, a_prev, sigma_t, k, kw = unpack(first)
            eps, cache = self._denoise(
                x, jnp.full((b,), t), cond, seg_uncond, seg_scale, return_cache=True, **kw
            )
            x = update(x, eps, a_t, a_prev, sigma_t, k)
            # refresh schedule is host-static; `deepcache_center` switches to
            # the paper's non-uniform placement at identical cost (same
            # number of full passes). The center is a fraction of the WHOLE
            # step loop — when guidance_interval splits the loop into CFG
            # segments, map it into this segment's coordinates so refresh
            # placement matches the unsegmented schedule's intent.
            center = getattr(self.model, "deepcache_center", None)
            if center is not None and n > 1:
                center = map_center_to_segment(center, n, seg)
            is_full = jnp.asarray(
                deepcache_refresh_mask(len(idx), interval, center)[1:],
                dtype=bool,
            )

            def dc_step(carry: Any, inputs: Any) -> Tuple[Any, None]:
                x, cache = carry
                step_inputs, full_flag = inputs
                t, a_t, a_prev, sigma_t, k, kw = unpack(step_inputs)
                tb = jnp.full((b,), t)

                def run_full(_: Any) -> Any:
                    return self._denoise(
                        x, tb, cond, seg_uncond, seg_scale, return_cache=True, **kw
                    )

                def run_shallow(_: Any) -> Any:
                    return self._denoise(
                        x, tb, cond, seg_uncond, seg_scale, deep_cache=cache, **kw
                    )

                eps, new_cache = jax.lax.cond(full_flag, run_full, run_shallow, None)
                return (update(x, eps, a_t, a_prev, sigma_t, k), new_cache), None

            (out, _), _ = jax.lax.scan(dc_step, (x, cache), (rest, is_full))
            return out

        if self.guidance_interval is None or uncond is None:
            return run_segment(z, np.arange(n), True)
        lo, hi = self.guidance_interval
        s0 = max(0, min(n, int(round(lo * n))))
        s1 = max(s0, min(n, int(round(hi * n))))
        x = run_segment(z, np.arange(0, s0), False)
        x = run_segment(x, np.arange(s0, s1), True)
        return run_segment(x, np.arange(s1, n), False)

    def sample_from(self, x0: jax.Array, **kwargs: Any) -> jax.Array:
        return _generic_sample_from(self, x0, **kwargs)


@ISampler.register("basic")
class DDPMSampler(DDIMSampler):
    """Ancestral DDPM sampling = DDIM with eta=1 over all trained steps
    (reference `basic` sampler)."""

    def __init__(self, model: Any, **kwargs: Any) -> None:
        kwargs.setdefault("default_steps", 50)
        super().__init__(model, eta=1.0, **kwargs)


@ISampler.register("plms")
class PLMSSampler(ISampler):
    """Pseudo linear multistep (PLMS/PNDM; reference `plms.py`)."""

    supports_guidance_interval = True  # eps history threads via the carry

    def sample(
        self,
        z: jax.Array,
        *,
        cond: Optional[Any] = None,
        uncond: Optional[Any] = None,
        guidance_scale: float = 1.0,
        num_steps: Optional[int] = None,
        key: Optional[jax.Array] = None,
        start_step: int = 0,
        **kwargs: Any,
    ) -> jax.Array:
        num_steps = num_steps or self.default_steps
        acp = self._np_acp()
        ts = _uniform_timesteps(len(acp), num_steps)
        alphas = acp[ts]
        alphas_prev = np.concatenate([[acp[0]], acp[ts[:-1]]])
        order = np.arange(num_steps)[::-1][start_step:]
        b = z.shape[0]
        n = len(order)

        def x_prev_fn(x: jax.Array, eps: jax.Array, a_t: jax.Array, a_prev: jax.Array) -> jax.Array:
            x0 = (x - jnp.sqrt(1.0 - a_t) * eps) / jnp.sqrt(a_t)
            dir_xt = jnp.sqrt(jnp.maximum(1.0 - a_prev, 0.0)) * eps
            return jnp.sqrt(a_prev) * x0 + dir_xt

        kwargs, gates = self._pop_control_gate_schedule(dict(kwargs), n)

        def run_segment(carry_in: Any, seg: np.ndarray, use_cfg: bool) -> Any:
            if seg.size == 0:
                return carry_in
            idx = order[seg]
            ts_r = jnp.asarray(ts[idx])
            a_r = jnp.asarray(alphas[idx], dtype=z.dtype)
            ap_r = jnp.asarray(alphas_prev[idx], dtype=z.dtype)
            seg_uncond = uncond if use_cfg else None
            seg_scale = guidance_scale if use_cfg else 1.0
            seg_kwargs = dict(kwargs)
            if gates is not None:
                # gates are constant within a segment (boundaries split below)
                seg_kwargs["control_gates"] = [float(g) for g in gates[int(seg[0])]]

            def step(carry: Any, inputs: Any) -> Tuple[Any, None]:
                x, old_eps, count = carry
                t, a_t, a_prev = inputs
                tb = jnp.full((b,), t)
                eps = self._denoise(x, tb, cond, seg_uncond, seg_scale, **seg_kwargs)
                e1, e2, e3 = old_eps[0], old_eps[1], old_eps[2]
                eps1 = eps
                eps2 = (3 * eps - e1) / 2
                eps3 = (23 * eps - 16 * e1 + 5 * e2) / 12
                eps4 = (55 * eps - 59 * e1 + 37 * e2 - 9 * e3) / 24
                eps_prime = jnp.where(
                    count == 0, eps1, jnp.where(count == 1, eps2, jnp.where(count == 2, eps3, eps4))
                )
                x_new = x_prev_fn(x, eps_prime, a_t, a_prev)
                new_old = (eps, old_eps[0], old_eps[1])
                return (x_new, new_old, count + 1), None

            carry_out, _ = jax.lax.scan(step, carry_in, (ts_r, a_r, ap_r))
            return carry_out

        gi = self.guidance_interval
        use_gi = gi is not None and uncond is not None
        s0, s1 = (0, n)
        if use_gi:
            s0 = max(0, min(n, int(round(gi[0] * n))))
            s1 = max(s0, min(n, int(round(gi[1] * n))))

        # first step: the reference's improved-Euler prime (`plms.py`
        # p_sample_plms — a second eval at t_next, averaged) instead of a
        # plain first-order step
        first_cfg = (not use_gi) or (s0 <= 0 < s1)
        f_uncond = uncond if first_cfg else None
        f_scale = guidance_scale if first_cfg else 1.0
        f_kwargs = dict(kwargs)
        if gates is not None:
            f_kwargs["control_gates"] = [float(g) for g in gates[0]]
        i0 = order[0]
        t0_, a0, ap0 = ts[i0], alphas[i0], alphas_prev[i0]
        tb0 = jnp.full((b,), int(t0_))
        eps0 = self._denoise(z, tb0, cond, f_uncond, f_scale, **f_kwargs)
        a0j = jnp.asarray(a0, dtype=z.dtype)
        ap0j = jnp.asarray(ap0, dtype=z.dtype)
        x_trial = x_prev_fn(z, eps0, a0j, ap0j)
        t_next = int(ts[order[1]]) if n > 1 else 0
        tb_next = jnp.full((b,), t_next)
        eps_next = self._denoise(x_trial, tb_next, cond, f_uncond, f_scale, **f_kwargs)
        eps_prime0 = 0.5 * (eps0 + eps_next)
        x1 = x_prev_fn(z, eps_prime0, a0j, ap0j)

        zeros = jnp.zeros_like(z)
        carry = (x1, (eps0, zeros, zeros), 1)
        bounds = {1, n, max(s0, 1), max(s1, 1)}
        if gates is not None:
            for i in range(2, n):
                if not np.array_equal(gates[i], gates[i - 1]):
                    bounds.add(i)
        edges = sorted(bounds)
        for a, b_edge in zip(edges[:-1], edges[1:]):
            use_cfg = (not use_gi) or (s0 <= a < s1)
            carry = run_segment(carry, np.arange(a, b_edge), use_cfg)
        return carry[0]

    def sample_from(self, x0: jax.Array, **kwargs: Any) -> jax.Array:
        return _generic_sample_from(self, x0, **kwargs)


def _generic_sample_from(
    sampler: ISampler,
    x0: jax.Array,
    *,
    cond: Optional[Any] = None,
    num_steps: int = 20,
    start_step: int = 0,
    key: Optional[jax.Array] = None,
    **kwargs: Any,
) -> jax.Array:
    t_start = sampler._start_timestep(num_steps, start_step)
    if key is None:
        key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    noise = jax.random.normal(k1, x0.shape, x0.dtype)
    tb = jnp.full((x0.shape[0],), t_start, dtype=jnp.int32)
    z = sampler.model.q_sample(x0, tb, noise)
    return sampler.sample(z, cond=cond, num_steps=num_steps, start_step=start_step, key=k2, **kwargs)


class IKSampler(ISampler):
    """Shared k-diffusion machinery (reference `k_samplers.py:73`):
    sigma-space integration with optional Karras ramp."""

    use_karras: bool = True

    def __init__(self, model: Any, *, use_karras: Optional[bool] = None, **kwargs: Any) -> None:
        super().__init__(model, **kwargs)
        if use_karras is not None:
            self.use_karras = use_karras

    def _sigmas(self, num_steps: int, start_step: int = 0) -> Tuple[np.ndarray, np.ndarray]:
        acp = self._np_acp()
        full_sigmas = np.sqrt((1.0 - acp) / acp)
        log_sigmas = np.log(full_sigmas)
        if self.use_karras:
            rho = 7.0
            sigma_min, sigma_max = full_sigmas[0], full_sigmas[-1]
            ramp = np.linspace(0, 1, num_steps)
            min_inv, max_inv = sigma_min ** (1 / rho), sigma_max ** (1 / rho)
            sigmas = (max_inv + ramp * (min_inv - max_inv)) ** rho
        else:
            idx = np.linspace(len(acp) - 1, 0, num_steps)
            sigmas = np.interp(idx, np.arange(len(acp)), full_sigmas)
        sigmas = np.append(sigmas, 0.0)
        # sigma → (fractional) timestep via log-sigma interpolation
        t_of = np.interp(np.log(np.maximum(sigmas[:-1], full_sigmas[0])), log_sigmas, np.arange(len(acp)))
        return sigmas[start_step:], t_of[start_step:]

    def _t_at(self, sigmas: np.ndarray) -> np.ndarray:
        """Host sigma→timestep map — the same log-sigma interpolation
        `_sigmas` applies, usable on any (e.g. segment-sliced) sigma array."""
        acp = self._np_acp()
        full_sigmas = np.sqrt((1.0 - acp) / acp)
        log_sigmas = np.log(full_sigmas)
        return np.interp(
            np.log(np.maximum(sigmas, full_sigmas[0])), log_sigmas, np.arange(len(acp))
        )

    def _eps_denoised(
        self,
        x: jax.Array,
        sigma: jax.Array,
        t: jax.Array,
        cond: Any,
        uncond: Any,
        guidance_scale: float,
        **kwargs: Any,
    ) -> jax.Array:
        """k-space x → denoised x0 prediction."""
        b = x.shape[0]
        c_in = 1.0 / jnp.sqrt(sigma**2 + 1.0)
        tb = jnp.full((b,), t)
        eps = self._denoise(x * c_in, tb, cond, uncond, guidance_scale, **kwargs)
        return x - sigma * eps

    def sample(
        self,
        z: jax.Array,
        *,
        cond: Optional[Any] = None,
        uncond: Optional[Any] = None,
        guidance_scale: float = 1.0,
        num_steps: Optional[int] = None,
        key: Optional[jax.Array] = None,
        start_step: int = 0,
        initial_sigma_scaled: bool = False,
        **kwargs: Any,
    ) -> jax.Array:
        num_steps = num_steps or self.default_steps
        sigmas, t_of = self._sigmas(num_steps, start_step)
        if not initial_sigma_scaled:
            z = z * sigmas[0]
        if key is None:
            key = jax.random.PRNGKey(0)
        n = len(t_of)
        # ControlNet start/end gating: gates are piecewise-constant over step
        # ranges, so they segment the integrator exactly like the guidance
        # interval does (static `control_gates` per segment)
        kwargs, gates = self._pop_control_gate_schedule(dict(kwargs), n)
        gi = self.guidance_interval
        use_gi = gi is not None and uncond is not None and self.supports_guidance_interval
        if not use_gi and gates is None:
            return self._integrate(z, sigmas, t_of, cond, uncond, guidance_scale, key, **kwargs)
        if gates is not None and not self.supports_guidance_interval:
            # every in-repo IKSampler is segment-safe; guard for subclasses
            raise NotImplementedError(
                "control hint start/end gating needs segment-safe integration"
            )
        s0, s1 = (0, n)
        if use_gi:
            s0 = max(0, min(n, int(round(gi[0] * n))))
            s1 = max(s0, min(n, int(round(gi[1] * n))))
        bounds = {0, n, s0, s1}
        if gates is not None:
            for i in range(1, n):
                if not np.array_equal(gates[i], gates[i - 1]):
                    bounds.add(i)
        edges = sorted(bounds)
        x = z
        carry: Any = None
        for a, b in zip(edges[:-1], edges[1:]):
            if a == b:
                continue
            use_cfg = (not use_gi) or (s0 <= a < s1)
            seg_kwargs = dict(kwargs)
            if gates is not None:
                seg_kwargs["control_gates"] = [float(g) for g in gates[a]]
            x, carry = self._integrate_carry(
                x,
                carry,
                sigmas[a : b + 1],
                t_of[a:b],
                cond,
                uncond if use_cfg else None,
                guidance_scale if use_cfg else 1.0,
                key if a == 0 else jax.random.fold_in(key, a),
                **seg_kwargs,
            )
        return x

    def sample_from(
        self,
        x0: jax.Array,
        *,
        cond: Optional[Any] = None,
        num_steps: int = 20,
        start_step: int = 0,
        key: Optional[jax.Array] = None,
        **kwargs: Any,
    ) -> jax.Array:
        sigmas, _ = self._sigmas(num_steps, start_step)
        if key is None:
            key = jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(key)
        z = x0 + jax.random.normal(k1, x0.shape, x0.dtype) * sigmas[0]
        return self.sample(
            z, cond=cond, num_steps=num_steps, start_step=start_step, key=k2,
            initial_sigma_scaled=True, **kwargs
        )

    def _integrate(self, x, sigmas, t_of, cond, uncond, scale, key, **kwargs) -> jax.Array:
        raise NotImplementedError

    def _integrate_carry(
        self, x, carry, sigmas, t_of, cond, uncond, scale, key, **kwargs
    ) -> Tuple[jax.Array, Any]:
        """Segment-resumable integration. Default: stateless — delegate to
        `_integrate` and carry nothing. Multistep samplers override this to
        thread their history across guidance-interval segments."""
        return self._integrate(x, sigmas, t_of, cond, uncond, scale, key, **kwargs), None


@ISampler.register("k_euler")
class KEulerSampler(IKSampler):
    supports_guidance_interval = True  # stateless update
    def _integrate(self, x, sigmas, t_of, cond, uncond, scale, key, **kwargs) -> jax.Array:
        sig = jnp.asarray(sigmas, dtype=x.dtype)
        ts = jnp.asarray(t_of, dtype=jnp.float32)

        def step(x: jax.Array, inputs: Any) -> Tuple[jax.Array, None]:
            sigma, sigma_next, t = inputs
            denoised = self._eps_denoised(x, sigma, t, cond, uncond, scale, **kwargs)
            d = (x - denoised) / sigma
            return x + d * (sigma_next - sigma), None

        out, _ = jax.lax.scan(step, x, (sig[:-1], sig[1:], ts))
        return out


@ISampler.register("k_euler_a")
class KEulerAncestralSampler(IKSampler):
    supports_guidance_interval = True  # stateless update
    use_karras = False

    def _integrate(self, x, sigmas, t_of, cond, uncond, scale, key, **kwargs) -> jax.Array:
        sig = jnp.asarray(sigmas, dtype=x.dtype)
        ts = jnp.asarray(t_of, dtype=jnp.float32)
        keys = jax.random.split(key, len(t_of))

        def step(x: jax.Array, inputs: Any) -> Tuple[jax.Array, None]:
            sigma, sigma_next, t, k = inputs
            denoised = self._eps_denoised(x, sigma, t, cond, uncond, scale, **kwargs)
            sigma_up = jnp.minimum(
                sigma_next,
                jnp.sqrt(jnp.maximum(sigma_next**2 * (sigma**2 - sigma_next**2) / jnp.maximum(sigma**2, 1e-20), 0.0)),
            )
            sigma_down = jnp.sqrt(jnp.maximum(sigma_next**2 - sigma_up**2, 0.0))
            d = (x - denoised) / sigma
            x = x + d * (sigma_down - sigma)
            x = x + jax.random.normal(k, x.shape, x.dtype) * sigma_up
            return x, None

        out, _ = jax.lax.scan(step, x, (sig[:-1], sig[1:], ts, keys))
        return out


@ISampler.register("k_heun")
class KHeunSampler(IKSampler):
    supports_guidance_interval = True  # per-step self-contained: the
    # corrector's lookahead timestep is derived from sigma_next on host, so
    # segment slicing is exact

    def _integrate(self, x, sigmas, t_of, cond, uncond, scale, key, **kwargs) -> jax.Array:
        sig = jnp.asarray(sigmas, dtype=x.dtype)
        ts = jnp.asarray(t_of, dtype=jnp.float32)
        # timestep at sigma_{i+1} for the corrector eval; unused on the final
        # step (sigma_next == 0 takes the plain Euler branch)
        ts_next = jnp.asarray(self._t_at(np.asarray(sigmas)[1:]), dtype=jnp.float32)

        def step(x: jax.Array, inputs: Any) -> Tuple[jax.Array, None]:
            sigma, sigma_next, t, t_next = inputs
            denoised = self._eps_denoised(x, sigma, t, cond, uncond, scale, **kwargs)
            d = (x - denoised) / sigma
            x_euler = x + d * (sigma_next - sigma)

            def heun_correct(_: Any) -> jax.Array:
                denoised2 = self._eps_denoised(x_euler, sigma_next, t_next, cond, uncond, scale, **kwargs)
                d2 = (x_euler - denoised2) / jnp.maximum(sigma_next, 1e-20)
                return x + 0.5 * (d + d2) * (sigma_next - sigma)

            x_new = jax.lax.cond(sigma_next > 0, heun_correct, lambda _: x_euler, None)
            return x_new, None

        out, _ = jax.lax.scan(step, x, (sig[:-1], sig[1:], ts, ts_next))
        return out


@ISampler.register("klms")
class KLMSSampler(IKSampler):
    """Linear multistep over sigma space (order ≤ 4). Segment-safe: the
    derivative history (device) plus the trailing sigma window and global
    step offset (host) thread across guidance-interval/control-gate
    segments, so segmented runs match the unsegmented integral exactly."""

    use_karras = False
    order = 4
    supports_guidance_interval = True

    def _run(self, x, carry_in, sigmas, t_of, cond, uncond, scale, **kwargs):
        n = len(t_of)
        if carry_in is None:
            prev_sig: List[float] = []
            ds_in = None
            g0 = 0
        else:
            ds_in, prev_sig, g0 = carry_in
        # global sigma window: hist[base + i] == S[g0 + i] for the full-run
        # schedule S; Lagrange nodes for step g reach back ≤3 entries
        hist = list(prev_sig) + [float(v) for v in np.asarray(sigmas)]
        base = len(prev_sig)
        import scipy.integrate as integrate  # lazy

        coeffs = np.zeros((n, self.order), dtype=np.float32)
        for i in range(n):
            cur_order = min(g0 + i + 1, self.order)
            for j in range(cur_order):
                # integral of lagrange basis over [sigma_i, sigma_{i+1}]
                def fn(tau: float, j=j, i=i, cur_order=cur_order) -> float:
                    prod = 1.0
                    for kk in range(cur_order):
                        if kk == j:
                            continue
                        prod *= (tau - hist[base + i - kk]) / (
                            hist[base + i - j] - hist[base + i - kk]
                        )
                    return prod

                coeffs[i, j] = integrate.quad(
                    fn, hist[base + i], hist[base + i + 1], epsrel=1e-4
                )[0]
        sig = jnp.asarray(sigmas, dtype=x.dtype)
        ts = jnp.asarray(t_of, dtype=jnp.float32)
        cfs = jnp.asarray(coeffs, dtype=x.dtype)

        def step(carry: Any, inputs: Any) -> Tuple[Any, None]:
            x, ds = carry
            sigma, t, cf = inputs
            denoised = self._eps_denoised(x, sigma, t, cond, uncond, scale, **kwargs)
            d = (x - denoised) / sigma
            x_new = x + cf[0] * d + cf[1] * ds[0] + cf[2] * ds[1] + cf[3] * ds[2]
            return (x_new, (d, ds[0], ds[1])), None

        zeros = jnp.zeros_like(x)
        ds0 = (zeros, zeros, zeros) if ds_in is None else ds_in
        (out, ds_out), _ = jax.lax.scan(step, (x, ds0), (sig[:-1], ts, cfs))
        tail = (list(prev_sig) + [float(v) for v in np.asarray(sigmas)[:-1]])[-(self.order - 1):]
        return out, (ds_out, tail, g0 + n)

    def _integrate(self, x, sigmas, t_of, cond, uncond, scale, key, **kwargs) -> jax.Array:
        out, _ = self._run(x, None, sigmas, t_of, cond, uncond, scale, **kwargs)
        return out

    def _integrate_carry(self, x, carry, sigmas, t_of, cond, uncond, scale, key, **kwargs):
        return self._run(x, carry, sigmas, t_of, cond, uncond, scale, **kwargs)


@ISampler.register("k_dpmpp_2m")
class KDPMpp2MSampler(IKSampler):
    """DPM-Solver++(2M) (reference `k_samplers.py:444`). Supports guidance-
    interval CFG exactly: the multistep history (old_denoised, sigma_last)
    threads across the segmented scans."""

    supports_guidance_interval = True

    def _run_scan(self, x, carry_in, sigmas, t_of, cond, uncond, scale, **kwargs):
        sig = jnp.asarray(np.maximum(sigmas, 0.0), dtype=x.dtype)
        ts = jnp.asarray(t_of, dtype=jnp.float32)

        def t_fn(sigma: jax.Array) -> jax.Array:
            return -jnp.log(jnp.maximum(sigma, 1e-20))

        def step(carry: Any, inputs: Any) -> Tuple[Any, None]:
            x, old_denoised, sigma_last, is_first = carry
            sigma, sigma_next, t = inputs
            denoised = self._eps_denoised(x, sigma, t, cond, uncond, scale, **kwargs)
            tt = t_fn(sigma)
            tt_next = t_fn(jnp.maximum(sigma_next, 1e-20))
            h = tt_next - tt
            ratio = jnp.where(sigma_next == 0, 0.0, sigma_next / sigma)
            first = ratio * x - jnp.expm1(-h) * denoised
            h_last = tt - t_fn(jnp.maximum(sigma_last, 1e-20))
            r = h_last / jnp.maximum(h, 1e-20)
            denoised_d = (1 + 1 / (2 * jnp.maximum(r, 1e-20))) * denoised - (
                1 / (2 * jnp.maximum(r, 1e-20))
            ) * old_denoised
            second = ratio * x - jnp.expm1(-h) * denoised_d
            x_new = jnp.where(jnp.logical_or(is_first, sigma_next == 0), first, second)
            return (x_new, denoised, sigma, jnp.asarray(False)), None

        if carry_in is None:
            carry0 = (x, jnp.zeros_like(x), sig[0], jnp.asarray(True))
        else:
            old_denoised, sigma_last = carry_in
            carry0 = (x, old_denoised, sigma_last.astype(x.dtype), jnp.asarray(False))
        (out, od, sl, _), _ = jax.lax.scan(step, carry0, (sig[:-1], sig[1:], ts))
        return out, (od, sl)

    def _integrate(self, x, sigmas, t_of, cond, uncond, scale, key, **kwargs) -> jax.Array:
        out, _ = self._run_scan(x, None, sigmas, t_of, cond, uncond, scale, **kwargs)
        return out

    def _integrate_carry(self, x, carry, sigmas, t_of, cond, uncond, scale, key, **kwargs):
        return self._run_scan(x, carry, sigmas, t_of, cond, uncond, scale, **kwargs)


@ISampler.register("lcm")
class LCMSampler(ISampler):
    """Latent consistency sampling (reference `lcm.py`)."""

    def sample(
        self,
        z: jax.Array,
        *,
        cond: Optional[Any] = None,
        uncond: Optional[Any] = None,
        guidance_scale: float = 1.0,
        num_steps: Optional[int] = None,
        key: Optional[jax.Array] = None,
        start_step: int = 0,
        **kwargs: Any,
    ) -> jax.Array:
        num_steps = num_steps or 4
        acp = self._np_acp()
        n_train = len(acp)
        ts = np.linspace(n_train - 1, 0, num_steps).round().astype(np.int64)
        # img2img entry (`sample_from`): skip the first (highest-noise) steps
        ts = ts[start_step:]
        n_exec = len(ts)
        ts_next = np.concatenate([ts[1:], ts[-1:]])  # next (smaller) timestep
        a_r = jnp.asarray(acp[ts], dtype=z.dtype)
        a_next_r = jnp.asarray(acp[ts_next], dtype=z.dtype)
        is_last = jnp.arange(n_exec) == n_exec - 1
        ts_r = jnp.asarray(ts)
        if key is None:
            key = jax.random.PRNGKey(0)
        keys = jax.random.split(key, n_exec)
        b = z.shape[0]
        kwargs, gates = self._pop_control_gate_schedule(dict(kwargs), n_exec)
        gates_r = None if gates is None else jnp.asarray(gates)
        # consistency-model boundary scaling (reference `lcm.py:66-71`):
        # c_skip/c_out with sigma_data=0.5, t scaled by 1/0.1
        sigma_data = 0.5
        t_div = jnp.asarray(ts, dtype=jnp.float32) / 0.1
        c_skip_r = sigma_data**2 / (t_div**2 + sigma_data**2)
        c_out_r = t_div / jnp.sqrt(t_div**2 + sigma_data**2)

        def step(carry: Any, inputs: Any) -> Tuple[Any, None]:
            x, _ = carry
            if gates_r is None:
                t, a_t, a_next, c_skip, c_out, last, k = inputs
                kw = kwargs
            else:
                t, a_t, a_next, c_skip, c_out, last, k, g = inputs
                kw = dict(kwargs, control_gates=g)
            tb = jnp.full((b,), t)
            eps = self._denoise(x, tb, cond, uncond, guidance_scale, **kw)
            x0 = (x - jnp.sqrt(1.0 - a_t) * eps) / jnp.sqrt(a_t)
            denoised = c_out.astype(x.dtype) * x0 + c_skip.astype(x.dtype) * x
            # re-noise at the NEXT timestep's noise level (reference
            # `lcm.py:50-54` q_samples at `_t_index_prev`); skip on last step
            noise = jax.random.normal(k, x.shape, x.dtype)
            renoised = jnp.sqrt(a_next) * denoised + jnp.sqrt(1.0 - a_next) * noise
            x_new = jnp.where(last, denoised, renoised)
            return (x_new, denoised), None

        xs = (ts_r, a_r, a_next_r, c_skip_r, c_out_r, is_last, keys)
        if gates_r is not None:
            xs = xs + (gates_r,)
        (final_x, _), _ = jax.lax.scan(step, (z, z), xs)
        return final_x

    def _start_timestep(self, num_steps: int, start_step: int) -> int:
        # LCM's own grid is a plain linspace, not the uniform-stride grid
        acp = self._np_acp()
        ts = np.linspace(len(acp) - 1, 0, num_steps or 4).round().astype(np.int64)
        return int(ts[start_step]) if start_step < len(ts) else 0

    def sample_from(self, x0: jax.Array, **kwargs: Any) -> jax.Array:
        return _generic_sample_from(self, x0, **kwargs)


@ISampler.register("solver")
class DPMSolverSampler(ISampler):
    """Multistep DPM-Solver, orders 1-3 (reference `solver.py:23`).

    Implements the discrete-schedule noise conversion (log-alpha
    interpolation over the model's alphas_cumprod), `time_uniform` /
    `logSNR` / `time_quadratic` skip types, and both data-prediction
    (`predict_x0=True`, i.e. DPM-Solver++) and noise-prediction updates
    with optional Imagen-style dynamic thresholding.

    TPU-native structure: all timesteps are host-static, so every
    multistep coefficient (lambda_t, alpha_t, sigma ratios, expm1 terms)
    is precomputed as numpy scalars; the warmup steps (growing order) are
    Python-unrolled and the steady-state runs as one `lax.scan` whose xs
    are the per-step coefficient vectors — only `x` and the model
    outputs are traced."""

    def __init__(
        self,
        model: Any,
        *,
        schedule: str = "discrete",
        order: int = 2,
        skip_type: str = "time_uniform",
        predict_x0: bool = True,
        thresholding: bool = False,
        threshold_max_val: float = 1.0,
        t0: Optional[float] = None,
        tT: Optional[float] = None,
        continuous_beta_0: float = 0.1,
        continuous_beta_1: float = 20.0,
        default_steps: int = 25,
        **kwargs: Any,
    ) -> None:
        super().__init__(model, default_steps=default_steps, **kwargs)
        if order not in (1, 2, 3):
            raise ValueError("solver order must be 1, 2 or 3")
        if schedule not in ("discrete", "linear", "cosine"):
            raise ValueError(
                "only (`discrete` | `linear` | `cosine`) can be used as `schedule`"
            )
        self.order = order
        self.schedule = schedule
        self.skip_type = skip_type
        self.predict_x0 = predict_x0
        self.thresholding = thresholding
        self.threshold_max_val = threshold_max_val
        acp = self._np_acp().astype(np.float64)
        # the model's own grid size — timestep conversion in `_model_fn`
        # always uses this, whatever the solver's noise schedule
        self.model_N = len(acp)
        if schedule == "discrete":
            default_tT = 1.0
            self.total_N = len(acp)
            # discrete schedule (reference `solver.py:50-54`)
            self._t_array = np.linspace(0.0, 1.0, self.total_N + 1)[1:]
            self._log_alpha_array = 0.5 * np.log(acp)
        else:
            # continuous VP schedules (DPM-Solver paper appendix; reference
            # `solver.py:55-71,376-384,409-427`): closed-form log-alpha(t)
            default_tT = 0.9946 if schedule == "cosine" else 1.0
            self.total_N = 1000
            self.beta_0 = continuous_beta_0
            self.beta_1 = continuous_beta_1
            self.cosine_s = 0.008
            self.cosine_log_alpha_0 = math.log(
                math.cos(self.cosine_s / (1.0 + self.cosine_s) * math.pi / 2.0)
            )
        self.t0 = (1.0 / self.total_N) if t0 is None else t0
        self.tT = default_tT if tT is None else tT

    # ---------------------------------------------------- marginal functions

    def _log_mean_coef(self, t: np.ndarray) -> np.ndarray:
        if self.schedule == "linear":
            return -0.25 * t**2 * (self.beta_1 - self.beta_0) - 0.5 * t * self.beta_0
        if self.schedule == "cosine":
            log_alpha = np.log(
                np.cos((t + self.cosine_s) / (1.0 + self.cosine_s) * math.pi / 2.0)
            )
            return log_alpha - self.cosine_log_alpha_0
        return np.interp(t, self._t_array, self._log_alpha_array)

    def _alpha(self, t: np.ndarray) -> np.ndarray:
        return np.exp(self._log_mean_coef(t))

    def _sigma(self, t: np.ndarray) -> np.ndarray:
        return np.sqrt(1.0 - np.exp(2.0 * self._log_mean_coef(t)))

    def _lambda(self, t: np.ndarray) -> np.ndarray:
        lmc = self._log_mean_coef(t)
        return lmc - 0.5 * np.log(1.0 - np.exp(2.0 * lmc))

    def _inverse_lambda(self, lam: np.ndarray) -> np.ndarray:
        if self.schedule == "linear":
            tmp = 2.0 * (self.beta_1 - self.beta_0) * np.logaddexp(-2.0 * lam, 0.0)
            delta = self.beta_0**2 + tmp
            return tmp / (np.sqrt(delta) + self.beta_0) / (self.beta_1 - self.beta_0)
        if self.schedule == "cosine":
            log_alpha = -0.5 * np.logaddexp(-2.0 * lam, 0.0)
            return (
                np.arccos(np.exp(log_alpha + self.cosine_log_alpha_0))
                * 2.0
                * (1.0 + self.cosine_s)
                / math.pi
                - self.cosine_s
            )
        log_alpha = -0.5 * np.logaddexp(0.0, -2.0 * lam)
        # log_alpha_array decreases with t → flip for np.interp
        return np.interp(log_alpha, self._log_alpha_array[::-1], self._t_array[::-1])

    def _get_time_steps(self, num_steps: int) -> np.ndarray:
        """num_steps+1 time points from tT down to t0 → num_steps updates
        (reference `get_time_steps(t_T, t_0, N)` returns N+1 points,
        `solver.py:345` — matching ddim/k-samplers' evals-per-num_steps)."""
        t0, tT, n = self.t0, self.tT, num_steps
        if self.skip_type == "logSNR":
            lams = np.linspace(self._lambda(np.float64(tT)), self._lambda(np.float64(t0)), n + 1)
            return self._inverse_lambda(lams)
        if self.skip_type == "time_uniform":
            return np.linspace(tT, t0, n + 1)
        if self.skip_type == "time_quadratic":
            return np.linspace(math.sqrt(tT), math.sqrt(t0), n + 1) ** 2
        raise ValueError(f"unrecognized skip_type '{self.skip_type}' occurred")

    # ------------------------------------------------------------- model fn

    def _model_fn(
        self,
        x: jax.Array,
        t: float,
        cond: Optional[Any],
        uncond: Optional[Any],
        guidance_scale: float,
        **kwargs: Any,
    ) -> jax.Array:
        """eps or x0 prediction at continuous time t (reference
        `solver.py:157-200`): model timestep = N * max(t - 1/N, 0), with N
        the MODEL's grid size (continuous schedules still drive a
        discrete-time-trained model, reference `solver.py:177`)."""
        ts_model = self.model_N * max(t - 1.0 / self.model_N, 0.0)
        tb = jnp.full((x.shape[0],), ts_model, dtype=jnp.float32)
        eps = self._denoise(x, tb, cond, uncond, guidance_scale, **kwargs)
        if not self.predict_x0:
            return eps
        alpha_t = float(self._alpha(np.float64(t)))
        sigma_t = float(self._sigma(np.float64(t)))
        x0 = (x - sigma_t * eps) / alpha_t
        if self.thresholding:
            p = 0.995
            s = jnp.quantile(jnp.abs(x0).reshape(x0.shape[0], -1), p, axis=1)
            s = jnp.maximum(s, self.threshold_max_val)
            s = s.reshape((-1,) + (1,) * (x0.ndim - 1))
            x0 = jnp.clip(x0, -s, s) / s
        return x0

    # --------------------------------------------------------------- updates

    def _update_coefs(self, t_prevs: List[float], t: float) -> Dict[str, float]:
        """Static per-step coefficients for an update from t_prevs[-1] to t.
        len(t_prevs) == effective order."""
        lam_t = self._lambda(np.float64(t))
        lam_p0 = self._lambda(np.float64(t_prevs[-1]))
        h = float(lam_t - lam_p0)
        out: Dict[str, float] = {"h": h}
        if self.predict_x0:
            out["x_coef"] = float(self._sigma(np.float64(t)) / self._sigma(np.float64(t_prevs[-1])))
            out["m_coef"] = float(self._alpha(np.float64(t)) * np.expm1(-h))
        else:
            out["x_coef"] = float(
                np.exp(self._log_mean_coef(np.float64(t)) - self._log_mean_coef(np.float64(t_prevs[-1])))
            )
            out["m_coef"] = float(self._sigma(np.float64(t)) * np.expm1(h))
        if len(t_prevs) >= 2:
            h_0 = float(self._lambda(np.float64(t_prevs[-1])) - self._lambda(np.float64(t_prevs[-2])))
            out["inv_r0"] = h / h_0
        if len(t_prevs) >= 3:
            h_1 = float(self._lambda(np.float64(t_prevs[-2])) - self._lambda(np.float64(t_prevs[-3])))
            r0, r1 = h_0 / h, h_1 / h
            out["r0"] = r0
            out["r1"] = r1
            alpha_t = float(self._alpha(np.float64(t)))
            sigma_t = float(self._sigma(np.float64(t)))
            if self.predict_x0:
                em = np.expm1(-h)
                out["d1_coef"] = float(alpha_t * (em / h + 1.0))
                out["d2_coef"] = float(-alpha_t * ((em + h) / h**2 - 0.5))
            else:
                ep = np.expm1(h)
                out["d1_coef"] = float(-sigma_t * (ep / h - 1.0))
                out["d2_coef"] = float(-sigma_t * ((ep - h) / h**2 - 0.5))
        return out

    @staticmethod
    def _apply_update(x: jax.Array, models: List[jax.Array], c: Dict[str, Any]) -> jax.Array:
        """Order-k update (k = len(models)); reference `solver.py:222-328`.
        Coefficients may be floats (unrolled) or traced scalars (scan xs)."""
        m0 = models[-1]
        x_t = c["x_coef"] * x - c["m_coef"] * m0
        if len(models) == 1:
            return x_t
        d1_0 = c["inv_r0"] * (m0 - models[-2])
        if len(models) == 2:
            return x_t - 0.5 * c["m_coef"] * d1_0
        m1, m2 = models[-2], models[-3]
        d1_0 = (1.0 / c["r0"]) * (m0 - m1)
        d1_1 = (1.0 / c["r1"]) * (m1 - m2)
        d1 = d1_0 + (c["r0"] / (c["r0"] + c["r1"])) * (d1_0 - d1_1)
        d2 = (1.0 / (c["r0"] + c["r1"])) * (d1_0 - d1_1)
        return x_t + c["d1_coef"] * d1 + c["d2_coef"] * d2

    # ----------------------------------------------------------------- sample

    def sample(
        self,
        z: jax.Array,
        *,
        cond: Optional[Any] = None,
        uncond: Optional[Any] = None,
        guidance_scale: float = 1.0,
        num_steps: Optional[int] = None,
        key: Optional[jax.Array] = None,
        start_step: int = 0,
        **kwargs: Any,
    ) -> jax.Array:
        num_steps = num_steps or self.default_steps
        ts = self._get_time_steps(num_steps)  # tT → t0, len == num_steps + 1
        if start_step:
            ts = ts[start_step:]
        total = len(ts)
        order = min(self.order, max(total - 1, 1))
        x = z
        # model evals happen at indices 0..total-2
        kwargs, gates = self._pop_control_gate_schedule(dict(kwargs), max(total - 1, 1))

        def mf(x_: jax.Array, t_: float, idx: int = 0) -> jax.Array:
            kw = kwargs
            if gates is not None:
                kw = dict(kwargs, control_gates=[float(g) for g in gates[idx]])
            return self._model_fn(x_, t_, cond, uncond, guidance_scale, **kw)

        # warmup: step 0 records; steps 1..order-1 run with growing order
        # (reference `solver.py:126-139`)
        t_prevs: List[float] = [float(ts[0])]
        models: List[jax.Array] = [mf(x, float(ts[0]), 0)]
        for i in range(1, order):
            t = float(ts[i])
            coefs = self._update_coefs(t_prevs[-len(models):], t)
            x = self._apply_update(x, models, coefs)
            t_prevs.append(t)
            models.append(mf(x, t, i))
            if len(models) > order:
                t_prevs.pop(0)
                models.pop(0)

        # steady state: scan steps order..total-2 at full order, then the
        # final update without the trailing (unused) model evaluation
        steady = list(range(order, total - 1))
        if steady:
            coef_rows = []
            keys_order = None
            win = list(t_prevs)
            for i in steady:
                t = float(ts[i])
                c = self._update_coefs(win[-order:], t)
                if keys_order is None:
                    keys_order = sorted(c)
                coef_rows.append([c[k] for k in keys_order])
                win.append(t)
                win = win[-order:]
            coef_arr = jnp.asarray(np.asarray(coef_rows, dtype=np.float32))
            ts_model = np.asarray(
                [self.total_N * max(float(ts[i]) - 1.0 / self.total_N, 0.0) for i in steady],
                dtype=np.float32,
            )
            alpha_arr = np.asarray([float(self._alpha(np.float64(ts[i]))) for i in steady], dtype=np.float32)
            sigma_arr = np.asarray([float(self._sigma(np.float64(ts[i]))) for i in steady], dtype=np.float32)
            gate_rows = None if gates is None else jnp.asarray(gates[np.asarray(steady)])
            b = x.shape[0]

            def scan_step(carry: Any, inputs: Any) -> Tuple[Any, None]:
                x_, ms = carry
                if gate_rows is None:
                    crow, tm, a_t, s_t = inputs
                    kw = kwargs
                else:
                    crow, tm, a_t, s_t, g = inputs
                    kw = dict(kwargs, control_gates=g)
                c = dict(zip(keys_order, list(crow)))
                x_new = self._apply_update(x_, list(ms), c)
                tb = jnp.full((b,), tm, dtype=jnp.float32)
                eps = self._denoise(x_new, tb, cond, uncond, guidance_scale, **kw)
                if self.predict_x0:
                    m_new = (x_new - s_t * eps) / a_t
                    if self.thresholding:
                        p = 0.995
                        s = jnp.quantile(jnp.abs(m_new).reshape(b, -1), p, axis=1)
                        s = jnp.maximum(s, self.threshold_max_val)
                        s = s.reshape((-1,) + (1,) * (m_new.ndim - 1))
                        m_new = jnp.clip(m_new, -s, s) / s
                else:
                    m_new = eps
                ms = tuple(list(ms)[1:] + [m_new])
                return (x_new, ms), None

            xs = (coef_arr, jnp.asarray(ts_model), jnp.asarray(alpha_arr), jnp.asarray(sigma_arr))
            if gate_rows is not None:
                xs = xs + (gate_rows,)
            (x, models_t), _ = jax.lax.scan(scan_step, (x, tuple(models)), xs)
            models = list(models_t)
            win_t = win
        else:
            win_t = list(t_prevs)

        if total > 1:
            t_final = float(ts[-1])
            coefs = self._update_coefs(win_t[-order:], t_final)
            x = self._apply_update(x, models, coefs)
        return x

    def _start_timestep(self, num_steps: int, start_step: int) -> int:
        # the solver integrates its own continuous grid — q-sample to the
        # model timestep of the start point, not the uniform-stride grid
        ts = self._get_time_steps(num_steps or self.default_steps)
        t = float(ts[min(start_step, len(ts) - 1)])
        return int(round(self.total_N * max(t - 1.0 / self.total_N, 0.0)))

    def sample_from(self, x0: jax.Array, **kwargs: Any) -> jax.Array:
        return _generic_sample_from(self, x0, **kwargs)


def is_misc_key(key: str) -> bool:
    """Condition-dict keys that are not cross-attention context (reference
    `samplers/schema.py:30`)."""
    from .utils import CONCAT_KEY, CONTROL_HINT_END_KEY, CONTROL_HINT_KEY, CONTROL_HINT_START_KEY

    return key in (CONCAT_KEY, CONTROL_HINT_KEY, CONTROL_HINT_START_KEY, CONTROL_HINT_END_KEY)


class IQSampler:
    """Forward-noising interface (reference `samplers/schema.py:72`)."""

    def __init__(self, model: Any) -> None:
        self.model = model

    def q_sample(self, net: "jax.Array", timesteps: "jax.Array", noise: Optional["jax.Array"] = None) -> "jax.Array":
        raise NotImplementedError


class DDPMQSampler(IQSampler):
    """q(x_t | x_0) with the model's cumulative-alpha schedule (reference
    `samplers/schema.py:90`)."""

    def q_sample(self, net: "jax.Array", timesteps: "jax.Array", noise: Optional["jax.Array"] = None) -> "jax.Array":
        if noise is None:
            noise = jax.random.normal(self.model.rngs.default(), net.shape, net.dtype)
        return self.model.q_sample(net, timesteps, noise)


# reference mixin name for the DDIM family (`samplers/ddim.py:56`)
DDIMMixin = DDIMSampler
