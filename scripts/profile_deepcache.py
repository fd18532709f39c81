"""DeepCache cost split on the real chip: full UNet CFG step vs shallow
(cached) step at cut 1/2/3, with ToMe at the bench ratio. Guides the
interval/cut choice for bench.py (scan-timed, tunnel-safe protocol)."""

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

    def timed(label, fn, *args, iters=12):
        def body(carry, _):
            out = fn(*args)
            leaves = jax.tree_util.tree_leaves(out)
            acc = sum(jnp.sum(leaf.astype(jnp.float32)) * 1e-9 for leaf in leaves)
            return carry + acc, ()

        @jax.jit
        def run(z):
            out, _ = jax.lax.scan(body, z, None, length=iters)
            return out

        float(run(jnp.float32(0)))
        t0 = time.time()
        float(run(jnp.float32(0)))
        dt = (time.time() - t0) / iters
        print(f"{label}: {dt*1e3:.2f} ms", flush=True)
        return dt

    m = nnx.merge(graphdef, state)
    cond = m.get_cond(tokens)
    ctx = jnp.concatenate([cond, cond], axis=0)
    z2 = jax.random.normal(jax.random.PRNGKey(0), (2 * BATCH, 64, 64, 4), jnp.bfloat16)
    t2 = jnp.full((2 * BATCH,), 500)

    full_dt = timed("full unet step (B=8 CFG)", lambda: m.denoise(z2, t2, ctx))
    for cut in (1, 2, 3):
        m.deepcache_cut = cut
        _, cache = m.denoise(z2, t2, ctx, return_cache=True)
        dt = timed(
            f"shallow step cut={cut} (B=8)",
            lambda c=cache: m.denoise(z2, t2, ctx, deep_cache=c),
        )
        print(f"  -> shallow/full = {dt/full_dt:.3f}", flush=True)

    # B=4 (outside the guidance interval)
    z1 = z2[:BATCH]
    t1 = t2[:BATCH]
    full1 = timed("full unet step (B=4)", lambda: m.denoise(z1, t1, cond))
    for cut in (1, 2, 3):
        m.deepcache_cut = cut
        _, cache = m.denoise(z1, t1, cond, return_cache=True)
        dt = timed(
            f"shallow step cut={cut} (B=4)",
            lambda c=cache: m.denoise(z1, t1, cond, deep_cache=c),
        )
        print(f"  -> shallow/full = {dt/full1:.3f}", flush=True)


if __name__ == "__main__":
    main()
