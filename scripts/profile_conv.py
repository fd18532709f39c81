"""Correctness + perf test for the Pallas conv3x3 kernel vs XLA conv."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/cflearn_tpu/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import jax.numpy as jnp

from cflearn_tpu.ops.conv import conv3x3_pallas


def _sync(out):
    return float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))


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

SHAPES = [
    # (B, H, W, C, Co) — SD decoder + UNet conv shapes
    (4, 512, 512, 128, 128),
    (4, 256, 256, 256, 256),
    (4, 128, 128, 512, 512),
    (4, 64, 64, 512, 512),
    (8, 64, 64, 320, 320),
    (8, 32, 32, 640, 640),
    (8, 16, 16, 1280, 1280),
    (8, 8, 8, 1280, 1280),
    (4, 256, 256, 512, 512),
]


def main() -> None:
    key = jax.random.PRNGKey(0)
    for (b, h, w_len, c, co) in SHAPES:
        x = jax.random.normal(key, (b, h, w_len, c), jnp.bfloat16)
        w = jax.random.normal(key, (3, 3, c, co), jnp.bfloat16) * 0.05

        # correctness vs XLA (f32 compare at bf16 tolerance)
        ref = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        got = conv3x3_pallas(x, w)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32))))
        scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) + 1e-6

        @jax.jit
        def xlaN(x, w):
            def body(cx, _):
                y = jax.lax.conv_general_dilated(
                    cx, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
                )
                return y.astype(cx.dtype), None

            out, _ = jax.lax.scan(body, x, None, length=N)
            return out

        def make_pal(fold):
            @jax.jit
            def palN(x, w):
                def body(cx, _):
                    return conv3x3_pallas(cx, w, fold=fold), None

                out, _ = jax.lax.scan(body, x, None, length=N)
                return out

            return palN

        tf = 2 * b * h * w_len * c * co * 9 * N / 1e12
        dt_x = timed(xlaN, x, w)
        dt_p = timed(make_pal(None), x, w)
        print(
            f"B{b} {h}x{w_len} {c}->{co}: rel_err {err/scale:.2e} | "
            f"XLA {tf/dt_x:6.0f} | Pallas {tf/dt_p:6.0f} TF/s | {dt_x/dt_p:.2f}x"
        )


if __name__ == "__main__":
    main()
