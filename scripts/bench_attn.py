"""Microbench: flash attention at SD-1.5 shapes on the real TPU chip.

Axon-tunnel protocol: chain iterations inside one jitted lax.scan (per-call
dispatch ~5ms), force materialization with np.asarray.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/cflearn_tpu/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np

from cflearn_tpu.ops.attention import flash_attention, xla_attention

ITERS = 30


def bench(fn, q, k, v, label, flops):
    def body(carry, _):
        out = fn(carry, k, v)
        return out.astype(carry.dtype), ()

    @jax.jit
    def run(q):
        out, _ = jax.lax.scan(body, q, None, length=ITERS)
        # scalar output: device→host transfers through the axon tunnel are
        # slow enough to dominate the timing otherwise
        return jnp.sum(out.astype(jnp.float32))

    float(run(q))  # compile + warm
    t0 = time.time()
    float(run(q))
    dt = (time.time() - t0) / ITERS
    print(f"{label}: {dt*1e3:.3f} ms  ({flops/dt/1e12:.1f} TFLOP/s useful)")
    return dt


def main():
    print("devices:", jax.devices())
    for (bh, l, d, kv) in [(64, 4096, 40, 4096), (64, 1024, 80, 1024), (64, 256, 160, 256), (64, 4096, 40, 77)]:
        b, h = 8, bh // 8
        shape_q = (b, h, l, d)
        shape_kv = (b, h, kv, d)
        q = jax.random.normal(jax.random.PRNGKey(0), shape_q, jnp.bfloat16)
        k = jax.random.normal(jax.random.PRNGKey(1), shape_kv, jnp.bfloat16)
        v = jax.random.normal(jax.random.PRNGKey(2), shape_kv, jnp.bfloat16)
        flops = 4.0 * bh * l * kv * d
        print(f"== bh={bh} L={l} d={d} kv={kv}")
        bench(lambda q, k, v: flash_attention(q, k, v), q, k, v, "  pallas", flops)
        bench(lambda q, k, v: xla_attention(q, k, v), q, k, v, "  xla   ", flops)


if __name__ == "__main__":
    main()
