"""Training-step performance budget for the SD-1.5 UNet finetune workload
(VERDICT r2 item 2 — do for training what docs/performance.md does for
inference).

Measures, on the real chip:
- per-stage wall time: forward loss only / forward+backward / full step
  (optimizer cost = full - fwd+bwd; backward cost = fwd+bwd - fwd),
- XLA cost-analysis FLOPs per program -> MFU against the measured
  126 TF/s bf16 matmul envelope (docs/performance.md),
- remat cost: `use_checkpoint` True vs False at each batch size,
- batch-size scaling (B=4/8/16): conv im2col M grows with B·H·W, so
  larger B should lift MXU utilization until HBM runs out.

Workload matches `scripts/bench_secondary.py`'s training bench: full 860M
UNet, latents 64x64x4, precomputed 77x768 text cond, f32 master params,
bf16 compute, AdamW (bf16 first moment), donated params+opt state.
Reference hot loop being budgeted: `/root/reference/cflearn/schema.py:1174-1294`.

Run on the real chip: python scripts/profile_training.py
"""

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/cflearn_tpu/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import jax.numpy as jnp
import numpy as np
import optax
from flax import nnx

MATMUL_ENVELOPE_TFS = 126.0  # measured bf16 matmul peak on this chip
T = 1000


def build_unet(use_checkpoint: bool):
    from cflearn_tpu.modules.multimodal.diffusion.unet import UNetDiffuser

    unet = UNetDiffuser(use_checkpoint=use_checkpoint, rngs=nnx.Rngs(0))
    zp = nnx.state(unet, nnx.Param)
    leaves, tdef = jax.tree_util.tree_flatten(zp)
    zkeys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    leaves = [
        jax.random.normal(k, x.shape, x.dtype) * 0.02
        if hasattr(x, "shape") and x.ndim > 0 and float(jnp.max(jnp.abs(x))) == 0.0
        else x
        for k, x in zip(zkeys, leaves)
    ]
    nnx.update(unet, jax.tree_util.tree_unflatten(tdef, leaves))
    return unet


def _bf16(tree):
    return jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        tree,
    )


def time_fn(fn, args, iters=8, donate=False):
    """Compile, then time; returns (sec/iter, flops_from_cost_analysis).

    cost_analysis runs on `lower(*args)` BEFORE any execution: a donated fn
    invalidates its argument buffers on the first call, and lowering against
    dead buffers raises a TPU InvalidArgument."""
    try:
        flops = fn.lower(*args).compile().cost_analysis()["flops"]
    except Exception:
        flops = float("nan")
    if donate:
        # donated buffers: thread the state through the loop
        p, o, loss = fn(*args)
        float(loss)  # compile+sync (scalar pull defeats the tunnel)
        t0 = time.time()
        for _ in range(iters):
            p, o, loss = fn(p, o, *args[2:])
        float(loss)
        dt = (time.time() - t0) / iters
        del p, o
    else:
        out = fn(*args)
        leaf = [l for l in jax.tree_util.tree_leaves(out) if hasattr(l, "dtype")][0]
        float(jnp.sum(leaf.astype(jnp.float32)))
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        leaf = [l for l in jax.tree_util.tree_leaves(out) if hasattr(l, "dtype")][0]
        float(jnp.sum(leaf.astype(jnp.float32)))
        dt = (time.time() - t0) / iters
    return dt, flops


def profile(batch: int, use_checkpoint: bool):
    unet = build_unet(use_checkpoint)
    gd, params, rest = nnx.split(unet, nnx.Param, ...)
    tx = optax.adamw(1e-5, mu_dtype=jnp.bfloat16)
    opt_state = tx.init(params)

    betas = np.linspace(1e-4, 2e-2, T, dtype=np.float64)
    acp = jnp.asarray(np.cumprod(1.0 - betas), jnp.float32)
    latents = jax.random.normal(jax.random.PRNGKey(1), (batch, 64, 64, 4), jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (batch, 77, 768), jnp.float32)
    key = jax.random.PRNGKey(3)

    def make_batch(key):
        t_key, n_key = jax.random.split(key)
        t = jax.random.randint(t_key, (batch,), 0, T)
        eps = jax.random.normal(n_key, latents.shape, jnp.float32)
        a = acp[t][:, None, None, None]
        return jnp.sqrt(a) * latents + jnp.sqrt(1.0 - a) * eps, t, eps

    def loss_fn(p, x_t, t, eps):
        m = nnx.merge(gd, _bf16(p), rest)
        pred = m(x_t.astype(jnp.bfloat16), t, ctx.astype(jnp.bfloat16))
        return jnp.mean((pred.astype(jnp.float32) - eps) ** 2)

    @jax.jit
    def fwd_only(p, key):
        x_t, t, eps = make_batch(key)
        return loss_fn(p, x_t, t, eps)

    @jax.jit
    def fwd_bwd(p, key):
        x_t, t, eps = make_batch(key)
        loss, grads = jax.value_and_grad(loss_fn)(p, x_t, t, eps)
        return loss, jax.tree_util.tree_reduce(
            lambda a, b: a + jnp.sum(b.astype(jnp.float32) ** 2), grads, 0.0
        )

    @partial(jax.jit, donate_argnums=(0, 1))
    def full_step(p, o, key):
        x_t, t, eps = make_batch(key)
        loss, grads = jax.value_and_grad(loss_fn)(p, x_t, t, eps)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    row = {"batch": batch, "remat": use_checkpoint}
    try:
        dt, fl = time_fn(fwd_only, (params, key))
        row["fwd_ms"] = round(dt * 1e3, 1)
        row["fwd_tflops"] = round(fl / 1e12, 2) if np.isfinite(fl) else None
        dt_fb, fl_fb = time_fn(fwd_bwd, (params, key))
        row["fwd_bwd_ms"] = round(dt_fb * 1e3, 1)
        row["fwd_bwd_tflops"] = round(fl_fb / 1e12, 2) if np.isfinite(fl_fb) else None
        dt_full, fl_full = time_fn(full_step, (params, opt_state, key), donate=True)
        row["step_ms"] = round(dt_full * 1e3, 1)
        row["step_tflops"] = round(fl_full / 1e12, 2) if np.isfinite(fl_full) else None
        row["img_per_sec"] = round(batch / dt_full, 2)
        if np.isfinite(fl_full):
            row["mfu_vs_envelope"] = round(
                (fl_full / dt_full) / (MATMUL_ENVELOPE_TFS * 1e12), 3
            )
    except Exception as exc:  # OOM etc — record and continue the sweep
        row["error"] = f"{type(exc).__name__}: {str(exc)[:200]}"
    print(json.dumps(row), flush=True)
    return row


def main() -> None:
    import gc

    rows = []
    for batch, remat in [(4, True), (4, False), (8, True), (8, False), (16, True)]:
        if os.environ.get("CFLEARN_PT_ONLY") and f"{batch}:{int(remat)}" not in os.environ[
            "CFLEARN_PT_ONLY"
        ].split(","):
            continue
        rows.append(profile(batch, remat))
        gc.collect()  # free the previous 860M-param model + opt state on HBM
    out = {"workload": "sd15_unet_finetune_512px_latents", "rows": rows}
    path = os.path.join(os.path.dirname(__file__), "..", "docs", "training_profile.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
