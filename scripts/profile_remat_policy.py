"""Selective-remat policy sweep for the SD-1.5 UNet finetune step.

docs/performance.md's round-4 training restatement identifies the remaining
finetune headroom as "schedule/memory between the matmul islands": full
remat (use_checkpoint=True) recomputes *everything* in backward while
no-remat keeps the *whole* activation set resident — both extremes pay HBM.
jax.checkpoint policies split the difference: save the expensive matmul /
attention outputs, recompute only the cheap norm/elementwise chains.

Sweeps B x {no-remat, full remat, dots_saveable,
dots_with_no_batch_dims_saveable} with the round-4 scan protocol (all steps
inside ONE jitted lax.scan so the axon tunnel's ~24 ms per-dispatch cost is
paid once) and writes docs/remat_policy_sweep.json.

Workload matches scripts/bench_secondary.py's training bench: full 860M
UNet, latents 64x64x4 (512px), precomputed 77x768 text cond, f32 master
params, bf16 compute, AdamW (bf16 first moment), donated params+opt state.
Reference hot loop being budgeted: /root/reference/cflearn/schema.py:1174-1294.

Run on the real chip: python scripts/profile_remat_policy.py
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

T = 1000


def _bf16(tree):
    return jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        tree,
    )


def build_unet(use_checkpoint):
    from cflearn_tpu.modules.multimodal.diffusion.unet import UNetDiffuser

    unet = UNetDiffuser(use_checkpoint=use_checkpoint, rngs=nnx.Rngs(0))
    # de-zero the SD-parity zero-init convs so gradients flow everywhere
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


def measure(batch: int, use_checkpoint, iters: int = 10) -> float:
    unet = build_unet(use_checkpoint)
    gd_u, uparams, urest = nnx.split(unet, nnx.Param, ...)
    tx = optax.adamw(1e-5, mu_dtype=jnp.bfloat16)
    opt_state = tx.init(uparams)
    betas = np.linspace(1e-4, 2e-2, T, dtype=np.float64)
    acp = jnp.asarray(np.cumprod(1.0 - betas), jnp.float32)
    latents = jax.random.normal(jax.random.PRNGKey(1), (batch, 64, 64, 4), jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (batch, 77, 768), jnp.float32)

    @partial(jax.jit, donate_argnums=(0, 1), static_argnames=("n",))
    def train_steps(uparams, opt_state, latents, ctx, key, n):
        def step(carry, key):
            uparams, opt_state = carry
            t_key, n_key = jax.random.split(key)
            t = jax.random.randint(t_key, (batch,), 0, T)
            eps = jax.random.normal(n_key, latents.shape, jnp.float32)
            a = acp[t][:, None, None, None]
            x_t = jnp.sqrt(a) * latents + jnp.sqrt(1.0 - a) * eps

            def loss_fn(p):
                m = nnx.merge(gd_u, _bf16(p), urest)
                pred = m(x_t.astype(jnp.bfloat16), t, ctx.astype(jnp.bfloat16))
                return jnp.mean((pred.astype(jnp.float32) - eps) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(uparams)
            updates, opt_state = tx.update(grads, opt_state, uparams)
            return (optax.apply_updates(uparams, updates), opt_state), loss

        (uparams, opt_state), losses = jax.lax.scan(
            step, (uparams, opt_state), jax.random.split(key, n)
        )
        return uparams, opt_state, losses[-1]

    uparams, opt_state, loss = train_steps(
        uparams, opt_state, latents, ctx, jax.random.PRNGKey(3), iters
    )
    float(loss)  # compile + sync
    t0 = time.time()
    uparams, opt_state, loss = train_steps(
        uparams, opt_state, latents, ctx, jax.random.PRNGKey(4), iters
    )
    float(loss)
    return round(batch * iters / (time.time() - t0), 2)


def main() -> None:
    configs = []
    for batch in (8, 16):
        for policy in (False, True, "dots_saveable", "dots_with_no_batch_dims_saveable"):
            configs.append((batch, policy))
    rows = []
    for batch, policy in configs:
        try:
            img_s = measure(batch, policy)
        except Exception as e:  # OOM at big batch/no-remat is a data point
            rows.append({"batch": batch, "remat": policy, "error": str(e)[:200]})
            print(f"# B={batch} remat={policy}: FAILED {e}", file=sys.stderr, flush=True)
            continue
        rows.append({"batch": batch, "remat": policy, "img_per_sec": img_s})
        print(f"# B={batch} remat={policy}: {img_s} img/s", file=sys.stderr, flush=True)
    out = {"workload": "sd15_unet_finetune_512px_latents", "protocol": "scan x10 in one jit", "rows": rows}
    path = os.path.join(os.path.dirname(__file__), "..", "docs", "remat_policy_sweep.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
