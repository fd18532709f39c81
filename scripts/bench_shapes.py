"""Shape-bucket throughput sweep (VERDICT r3 item 8): the headline perf
story is 512px-only, but the reference's DiffusionAPI serves arbitrary sizes
(`/root/reference/cflearn/api/multimodal/diffusion.py` accepts any
size; our API buckets to /64 — `api/multimodal/diffusion.py` shape-bucket
cache). This measures the lossless + faithful configs at 256/512/768px on
SD-1.5 and 768px on the SD-2.1 arch (v-parameterization, 1024-dim context),
so non-default sizes have pinned numbers instead of surprise cliffs.

Reuses bench.py's measurement machinery verbatim (same jitted one-program
pipeline, same two-window best-of protocol). Run on the real chip:
    python scripts/bench_shapes.py
Writes docs/shape_sweep.json and prints one row per (arch, px, config).
"""

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import bench  # noqa: E402  (repo root)

OUT = REPO / "docs" / "shape_sweep.json"


def main() -> None:
    rows = []
    # SD-1.5 at the three bucket sizes; SD-2.1 at its native 768
    plan = [("v1", 256), ("v1", 512), ("v1", 768), ("v2_v", 768)]
    for version, px in plan:
        from flax import nnx
        import jax.numpy as jnp
        import jax

        from cflearn_tpu.modules.multimodal.diffusion.ldm import StableDiffusion

        model = StableDiffusion(version=version, rngs=nnx.Rngs(0))
        params = nnx.state(model, nnx.Param)
        params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            params,
        )
        nnx.update(model, params)
        for config in ("lossless", "faithful"):
            ips = bench.measure(model, config, latent_hw=px // 8)
            row = {
                "arch": version,
                "px": px,
                "config": config,
                "batch": bench.BATCH,
                "steps": bench.NUM_STEPS,
                "img_per_sec": round(ips, 3),
                # per-image pixel-throughput normalization: 512px = 1.0
                "px_normalized_img_per_sec": round(ips * (px / 512) ** 2, 3),
            }
            rows.append(row)
            print(json.dumps(row), flush=True)
        del model

    OUT.write_text(json.dumps({"rows": rows}, indent=2) + "\n")
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
