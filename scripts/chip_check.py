"""On-chip kernel parity checks.

The pytest suite validates the Pallas kernels on CPU (interpret mode /
virtual mesh); this script runs the SAME parity assertions on the real TPU
chip, where Mosaic lowering differs from the interpreter. Run standalone:

    python scripts/chip_check.py

Prints one PASS/FAIL line per check. Keep it quick (<2 min warm) — it is a
deployment smoke check, not a benchmark.
"""

import sys

import numpy as np

import jax
import jax.numpy as jnp


def _maxdiff(a, b) -> float:
    return float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))


def check(name: str, ok: bool, detail: str = "") -> bool:
    print(f"{'PASS' if ok else 'FAIL'}  {name}  {detail}")
    return ok


def main() -> int:
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/cflearn_tpu/jax_cache")
    print("backend:", jax.default_backend(), jax.devices())
    from cflearn_tpu.ops.attention import flash_attention, flash_attention_trainable, xla_attention
    from cflearn_tpu.ops.conv import conv3x3_pallas

    rng = np.random.RandomState(0)
    ok = True

    # flash attention fwd — SD-1.5 self-attention shape (L=4096, d=40)
    for L, d, dtype, tol in ((4096, 40, jnp.bfloat16, 2e-2), (1024, 80, jnp.bfloat16, 2e-2), (256, 64, jnp.float32, 2e-3)):
        q = jnp.asarray(rng.randn(2, 8, L, d), dtype)
        k = jnp.asarray(rng.randn(2, 8, L, d), dtype)
        v = jnp.asarray(rng.randn(2, 8, L, d), dtype)
        got = jax.jit(flash_attention)(q, k, v)
        want = jax.jit(xla_attention)(q, k, v)
        diff = _maxdiff(got, want)
        ok &= check(f"flash fwd L={L} d={d} {dtype.__name__}", diff < tol, f"maxdiff={diff:.2e}")

    # flash attention bwd (custom VJP) vs XLA grads
    q = jnp.asarray(rng.randn(1, 4, 512, 64), jnp.float32)
    k = jnp.asarray(rng.randn(1, 4, 512, 64), jnp.float32)
    v = jnp.asarray(rng.randn(1, 4, 512, 64), jnp.float32)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention_trainable(q, k, v) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(xla_attention(q, k, v) ** 2)

    gf = jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2)))(q, k, v)
    gx = jax.jit(jax.grad(loss_xla, argnums=(0, 1, 2)))(q, k, v)
    for name, a, b in zip("qkv", gf, gx):
        diff = _maxdiff(a, b)
        scale = float(jnp.max(jnp.abs(b))) + 1e-6
        ok &= check(f"flash bwd d{name}", diff / scale < 1e-2, f"reldiff={diff / scale:.2e}")

    # pallas conv3x3 — VAE-decode shape
    x = jnp.asarray(rng.randn(1, 128, 128, 128), jnp.bfloat16)
    w = jnp.asarray(rng.randn(3, 3, 128, 128) * 0.05, jnp.bfloat16)
    b = jnp.asarray(rng.randn(128) * 0.1, jnp.bfloat16)
    got = jax.jit(conv3x3_pallas)(x, w, b)
    want = jax.jit(
        lambda x, w, b: jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype) + b
    )(x, w, b)
    diff = _maxdiff(got, want)
    scale = float(jnp.max(jnp.abs(want))) + 1e-6
    ok &= check("pallas conv3x3 128x128x128 bf16", diff / scale < 2e-2, f"reldiff={diff / scale:.2e}")

    print("ALL PASS" if ok else "FAILURES PRESENT")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
