"""GPipe pipeline bubble math, measured on the virtual CPU mesh
(VERDICT r2 item 3 — "measure PP throughput vs sequential on the virtual
mesh to show the bubble math").

The GPipe schedule runs `T = M + S - 1` ticks of `L/S` blocks each; the
fill/drain bubble is COMPUTED (uniform work, garbage masked) rather than
skipped, so total work inflates by `(M+S-1)/M` over sequential and the ideal
per-device speedup on S real devices is `S·M/(M+S-1)`.

On the 8-virtual-device CPU mesh every "device" timeshares one core, so
wall-clock is proportional to TOTAL work — i.e. the measured
pipeline/sequential time ratio should approach `(M+S-1)/M` (1.75 for M=S=4,
1.375 for M=8/S=4). That's exactly what this script checks; real-hardware
speedup is the formula divided by S. Output lands in docs (performance.md
PP section).

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python scripts/profile_pp.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
    jax.config.update("jax_platforms", "cpu")

from flax import nnx


def main() -> None:
    from cflearn_tpu.modules.core.mixed_stacks import MixingBlock
    from cflearn_tpu.parallel.mesh import make_mesh
    from cflearn_tpu.parallel.pp import pipeline_apply, stack_module_states
    from cflearn_tpu.schema.config import MeshConfig

    L, B, T, C, H = 8, 32, 64, 256, 1024
    rngs = nnx.Rngs(0)
    blocks = [
        MixingBlock(C, T, H, token_mixing_type="attention", rngs=rngs)
        for _ in range(L)
    ]
    graphdef, stacked = stack_module_states(blocks)

    def block_fn(state, h):
        return nnx.merge(graphdef, state)(h)

    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, C))
    mc = MeshConfig()
    mc.from_info({"data": 1, "pipe": 4})
    mesh = make_mesh(mc)
    s = mesh.shape["pipe"]

    def timed(fn, iters=8):
        out = fn()
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(iters):
            out = fn()
        jax.block_until_ready(out)
        return (time.time() - t0) / iters

    seq = jax.jit(lambda p, x: pipeline_apply(block_fn, p, x, mesh=None))
    t_seq = timed(lambda: seq(stacked, x))
    rows = {"sequential_ms": round(t_seq * 1e3, 1)}
    for m in (s, 2 * s, 4 * s):
        pp = jax.jit(
            lambda p, x, m=m: pipeline_apply(
                block_fn, p, x, mesh=mesh, num_microbatches=m
            )
        )
        t_pp = timed(lambda: pp(stacked, x))
        expected = (m + s - 1) / m
        rows[f"pipe4_m{m}"] = {
            "ms": round(t_pp * 1e3, 1),
            "work_ratio_measured": round(t_pp / t_seq, 3),
            "work_ratio_formula": round(expected, 3),
            "ideal_speedup_on_4_real_devices": round(s * m / (m + s - 1), 2),
        }
    print(json.dumps(rows, indent=2))


if __name__ == "__main__":
    main()
