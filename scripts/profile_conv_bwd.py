"""Measure Pallas vs XLA conv3x3 BACKWARD at the SD hot shapes (VERDICT r3
item 4): input-grad (the forward kernel with rot180-transposed weights) and
weight-grad (`conv3x3_wgrad_pallas`) against XLA's transpose convs.

Microbench protocol per docs/performance.md: each variant runs inside a
`lax.scan` x ITERS in ONE jit (the axon tunnel costs ~2.1 ms per dispatch),
timed over two windows, best wins; a scalar pull forces completion.

Run on the real chip: python scripts/profile_conv_bwd.py
Appends rows to docs/conv_bwd_profile.json.
"""

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/cflearn_tpu/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import jax.numpy as jnp

from cflearn_tpu.ops import conv as C

ITERS = int(os.environ.get("CFLEARN_PROFILE_ITERS", "100"))
OUT = REPO / "docs" / "conv_bwd_profile.json"

# (B, H, W, C, Co): SD-1.5 UNet + VAE training hot shapes (B=8 finetune)
SHAPES = [
    (8, 64, 64, 320, 320),
    (8, 32, 32, 640, 640),
    (8, 16, 16, 1280, 1280),
    (8, 8, 8, 1280, 1280),
    (4, 64, 64, 512, 512),  # VAE mid/decoder
    (4, 128, 128, 512, 512),
    (4, 256, 256, 256, 256),
    (4, 512, 512, 128, 128),
]


def timed(fn, *args) -> float:
    """scan x ITERS in one jit; operands are ARGUMENTS (closure constants
    bloat the remote-compile payload), and the first operand depends on the
    carry so XLA cannot hoist the loop-invariant body."""

    @jax.jit
    def scanned(*ops):
        def body(c, _):
            first = ops[0] + c.astype(ops[0].dtype) * 0
            out = fn(first, *ops[1:])
            return c + jnp.sum(out[0] if isinstance(out, tuple) else out).astype(jnp.float32), None

        return jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=ITERS)[0]

    float(scanned(*args))  # compile + warm
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        float(scanned(*args))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    return best


def main() -> None:
    dt = jnp.bfloat16
    rows = []
    for b, h, w, c, co in SHAPES:
        kx = jax.random.PRNGKey(0)
        x = jax.random.normal(kx, (b, h, w, c), dt)
        wt = jax.random.normal(jax.random.PRNGKey(1), (3, 3, c, co), dt) * 0.05
        dy = jax.random.normal(jax.random.PRNGKey(2), (b, h, w, co), dt)
        flops = 2 * b * h * w * c * co * 9 / 1e12

        wf = C._flip_weights(wt)
        t_dx_xla = timed(lambda d, w_: C._xla_conv3x3(d, w_, None), dy, wf)
        cfg = C._pick_config(b, h, w, co, c, dy.dtype.itemsize)
        t_dx_pal = timed(C.conv3x3_pallas, dy, wf) if cfg else None

        t_dw_xla = timed(C._xla_conv3x3_wgrad, x, dy)
        wcfg = C._pick_wgrad_config(b, h, w, c, co, x.dtype.itemsize)
        t_dw_pal = timed(C.conv3x3_wgrad_pallas, x, dy) if wcfg else None

        row = {
            "shape": [b, h, w, c, co],
            "tflop": round(flops, 4),
            "dx_xla_ms": round(t_dx_xla * 1e3, 3),
            "dx_pallas_ms": round(t_dx_pal * 1e3, 3) if t_dx_pal else None,
            "dx_xla_tfs": round(flops / t_dx_xla, 1),
            "dx_pallas_tfs": round(flops / t_dx_pal, 1) if t_dx_pal else None,
            "dw_xla_ms": round(t_dw_xla * 1e3, 3),
            "dw_pallas_ms": round(t_dw_pal * 1e3, 3) if t_dw_pal else None,
            "dw_xla_tfs": round(flops / t_dw_xla, 1),
            "dw_pallas_tfs": round(flops / t_dw_pal, 1) if t_dw_pal else None,
            "dw_cfg": list(wcfg) if wcfg else None,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
    OUT.write_text(json.dumps({"iters": ITERS, "dtype": "bf16", "rows": rows}, indent=2) + "\n")
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
