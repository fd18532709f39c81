"""Amortized microbenches: measure per-call overhead and true op throughput
by scanning the op N times inside one jit."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/cflearn_tpu/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import jax.numpy as jnp


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def timed(fn, *args, iters=4, warmup=2):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.time() - t0) / iters


N = 10


def main() -> None:
    key = jax.random.PRNGKey(0)
    B = 4

    # (0) dispatch overhead: trivial op
    xs = jnp.zeros((8, 128), jnp.float32)

    @jax.jit
    def trivial(x):
        return x + 1.0

    dt = timed(trivial, xs, iters=16)
    print(f"trivial jit call: {dt*1e3:.2f} ms")

    # (1) HBM copy bandwidth: big elementwise
    big = jax.random.normal(key, (B, 512, 512, 128), jnp.bfloat16)  # 268MB

    @jax.jit
    def mul2(x):
        def body(c, _):
            return c * 1.0001, None
        out, _ = jax.lax.scan(body, x, None, length=N)
        return out

    dt = timed(mul2, big)
    gb = big.size * 2 * 2 * N / 1e9
    print(f"elementwise x{N} (268MB tensor): {dt*1e3:.2f} ms -> {gb/dt:.0f} GB/s")

    # (2) conv scanned: 512x512x128->128 bf16
    w = jax.random.normal(key, (3, 3, 128, 128), jnp.bfloat16)

    @jax.jit
    def convN(x, w):
        def body(c, _):
            y = jax.lax.conv_general_dilated(
                c, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
            )
            return y, None
        out, _ = jax.lax.scan(body, x, None, length=N)
        return out

    dt = timed(convN, big, w)
    tf = 0.309 * N
    print(f"conv 512x512 c128 x{N}: {dt*1e3:.2f} ms -> {tf/dt:.0f} TF/s")

    # (3) conv at 64x64x512->512 (low-res, matmul-like)
    small = jax.random.normal(key, (B, 64, 64, 512), jnp.bfloat16)
    w2 = jax.random.normal(key, (3, 3, 512, 512), jnp.bfloat16)

    @jax.jit
    def convN2(x, w):
        def body(c, _):
            y = jax.lax.conv_general_dilated(
                c, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
            )
            return y, None
        out, _ = jax.lax.scan(body, x, None, length=N)
        return out

    dt = timed(convN2, small, w2)
    tf = 2 * B * 64 * 64 * 512 * 512 * 9 * N / 1e12
    print(f"conv 64x64 c512 x{N}: {dt*1e3:.2f} ms -> {tf/dt:.0f} TF/s")

    # (4) matmul sanity: (8192, 4096) @ (4096, 4096)
    a = jax.random.normal(key, (8192, 4096), jnp.bfloat16)
    bmat = jax.random.normal(key, (4096, 4096), jnp.bfloat16)

    @jax.jit
    def mmN(a, b):
        def body(c, _):
            return jnp.dot(c, b, preferred_element_type=jnp.bfloat16), None
        out, _ = jax.lax.scan(body, a, None, length=N)
        return out

    dt = timed(mmN, a, bmat)
    tf = 2 * 8192 * 4096 * 4096 * N / 1e12
    print(f"matmul 8192x4096x4096 x{N}: {dt*1e3:.2f} ms -> {tf/dt:.0f} TF/s")


if __name__ == "__main__":
    main()
