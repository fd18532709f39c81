"""Component-level SD-1.5 profiling on the real chip.

Times each pipeline stage in isolation (UNet CFG step, VAE decode, CLIP text
encode, full DDIM loop) so perf work targets the real bottleneck. Run:
    python scripts/profile_sd.py [--tome R]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/cflearn_tpu/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import jax.numpy as jnp
import numpy as np
from flax import nnx

BATCH = 4  # overridden by --batch


def _sync(out):
    # through the axon tunnel, block_until_ready can return before execution
    # completes; pulling a scalar that depends on the output is reliable
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def timed(fn, *args, iters=8, warmup=2):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.time() - t0) / iters


def main() -> None:
    global BATCH
    p = argparse.ArgumentParser()
    p.add_argument("--tome", type=float, default=0.0)
    p.add_argument("--batch", type=int, default=4)
    args = p.parse_args()
    BATCH = args.batch

    from cflearn_tpu.modules.multimodal.diffusion.ldm import StableDiffusion

    model = StableDiffusion(version="v1", rngs=nnx.Rngs(0))
    params = nnx.state(model, nnx.Param)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        params,
    )
    nnx.update(model, params)
    if args.tome > 0:
        for _, module in model.iter_modules() if hasattr(model, "iter_modules") else []:
            pass
        # walk modules for SpatialTransformer
        from cflearn_tpu.modules.core.mixed_stacks import SpatialTransformer

        count = 0
        for path, module in nnx.iter_graph(model):
            if isinstance(module, SpatialTransformer):
                module.set_tome_ratio(args.tome)
                count += 1
        print(f"tome ratio {args.tome} on {count} SpatialTransformers")

    graphdef, state = nnx.split(model)

    key = jax.random.PRNGKey(0)
    z = jax.random.normal(key, (BATCH, 64, 64, 4), dtype=jnp.float32)
    z2 = jnp.concatenate([z, z])  # CFG batch
    t = jnp.full((2 * BATCH,), 500, dtype=jnp.int32)
    ctx = jax.random.normal(key, (2 * BATCH, 77, 768), dtype=jnp.bfloat16)
    tokens = jnp.asarray(np.random.randint(0, 49000, (BATCH, 77)), dtype=jnp.int32)

    @jax.jit
    def unet_step(st, z2, t, ctx):
        m = nnx.merge(graphdef, st)
        return m.unet(z2.astype(jnp.bfloat16), t, context=ctx)

    @jax.jit
    def vae_decode(st, z):
        m = nnx.merge(graphdef, st)
        return m.decode(z)

    @jax.jit
    def text_encode(st, tokens):
        m = nnx.merge(graphdef, st)
        return m.get_cond(tokens)

    dt_unet = timed(unet_step, state, z2, t, ctx)
    print(f"UNet CFG step (B={2*BATCH}): {dt_unet*1e3:.1f} ms  -> 20 steps = {dt_unet*20*1e3:.0f} ms")
    dt_vae = timed(vae_decode, state, z, iters=4)
    print(f"VAE decode (B={BATCH}):      {dt_vae*1e3:.1f} ms")
    dt_txt = timed(text_encode, state, tokens)
    print(f"CLIP text encode:            {dt_txt*1e3:.1f} ms")
    total = dt_unet * 20 + dt_vae + 2 * dt_txt
    print(f"sum estimate: {total*1e3:.0f} ms -> {BATCH/total:.3f} img/s")


if __name__ == "__main__":
    main()
