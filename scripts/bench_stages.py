"""Stage-level profile of the SD-1.5 bench pipeline on the real chip:
CLIP encode / UNet step (CFG-batched) / VAE decode, each timed as a jitted
scan with scalar output (tunnel-safe protocol)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/cflearn_tpu/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np
from flax import nnx

BATCH = 4


def main() -> None:
    sys.path.insert(0, "/root/repo")
    from bench import build_sd

    model = build_sd()
    graphdef, state = nnx.split(model)
    tokens = jnp.asarray(np.random.randint(0, 49000, (BATCH, 77)), dtype=jnp.int32)

    def timed(label, fn, *args, iters=12, flops=None):
        def body(carry, _):
            out = fn(*args)
            return carry + jnp.sum(out.astype(jnp.float32)) * 1e-9, ()

        @jax.jit
        def run(z):
            out, _ = jax.lax.scan(body, z, None, length=iters)
            return out

        float(run(jnp.float32(0)))
        t0 = time.time()
        float(run(jnp.float32(0)))
        dt = (time.time() - t0) / iters
        extra = f"  ({flops/dt/1e12:.1f} TFLOP/s)" if flops else ""
        print(f"{label}: {dt*1e3:.2f} ms{extra}")
        return dt

    m = nnx.merge(graphdef, state)

    # CLIP text encode
    timed("clip encode (B=4)", lambda: m.get_cond(tokens))

    # UNet single step, CFG batch 2B
    cond = m.get_cond(tokens)
    ctx = jnp.concatenate([cond, cond], axis=0)
    z2 = jax.random.normal(jax.random.PRNGKey(0), (2 * BATCH, 64, 64, 4), jnp.bfloat16)
    t2 = jnp.full((2 * BATCH,), 500)
    timed("unet step (B=8 CFG)", lambda: m.denoise(z2, t2, ctx))

    # VAE decode
    lat = jax.random.normal(jax.random.PRNGKey(1), (BATCH, 64, 64, 4), jnp.bfloat16)
    timed("vae decode (B=4)", lambda: m.decode(lat), iters=6)

    # full sampler loop for reference
    from cflearn_tpu.modules.multimodal.diffusion.samplers import ISampler

    @jax.jit
    def full(st, key):
        mm = nnx.merge(graphdef, st)
        c = mm.get_cond(tokens)
        u = mm.get_cond(jnp.zeros_like(tokens))
        sampler = ISampler.make("ddim", {"model": mm})
        z = jax.random.normal(key, (BATCH, 64, 64, 4), jnp.float32)
        latents = sampler.sample(z, cond=c, uncond=u, guidance_scale=7.5, num_steps=20, key=key)
        img = mm.decode(latents)
        return jnp.sum(img.astype(jnp.float32))

    float(full(state, jax.random.PRNGKey(0)))
    t0 = time.time()
    n = 4
    for i in range(n):
        out = full(state, jax.random.PRNGKey(i + 1))
    float(out)
    dt = (time.time() - t0) / n
    print(f"full pipeline (B=4, 20 steps): {dt*1e3:.1f} ms -> {BATCH/dt:.2f} img/s")


if __name__ == "__main__":
    main()
