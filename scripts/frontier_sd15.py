"""Speed/quality frontier around the faithful serving config.

The published faithful config (ToMe r=0.5 + DeepCache N=3/cut=1, full CFG)
is one point; this sweeps its local neighborhood — ToMe ratio x DeepCache
interval — measuring every variant's throughput AND deviation vs the same
lossless ground truth, so the choice is shown to sit on the Pareto frontier
rather than asserted. Reuses the quality harness machinery verbatim
(`scripts/quality_harness.py`: same fixed-seed de-zeroed weights, same
prompts/latents, same compare_outputs metrics).

Run on the real chip: python scripts/frontier_sd15.py
Writes docs/frontier_sd15.json (tabulated in docs/performance.md).
"""

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

import quality_harness as qh  # noqa: E402

OUT = REPO / "docs" / "frontier_sd15.json"

# the neighborhood: vary one lever at a time around (tome=0.5, DC N=3)
GRID = {
    "lossless": dict(),                            # ground truth (cache hit)
    "tome0.5_dc3": dict(tome=0.5, deepcache=(3, 1)),  # published faithful
    "tome0.3_dc3": dict(tome=0.3, deepcache=(3, 1)),
    "tome0.6_dc3": dict(tome=0.6, deepcache=(3, 1)),
    "tome0.5_dc2": dict(tome=0.5, deepcache=(2, 1)),
    "tome0.5_dc5": dict(tome=0.5, deepcache=(5, 1)),
    # non-uniform refresh placement (same cost as the matching uniform N):
    # refreshes concentrated where the trajectory bends fastest
    "tome0.5_dc5_c0.3": dict(tome=0.5, deepcache=(5, 1, 0.3)),
    "tome0.5_dc5_c0.5": dict(tome=0.5, deepcache=(5, 1, 0.5)),
    "tome0.5_dc3_c0.3": dict(tome=0.5, deepcache=(3, 1, 0.3)),
}


def main() -> None:
    import os

    import numpy as np

    from cflearn_tpu.toolkit.quality import compare_outputs

    # variance protocol (VERDICT r4 weak #8): default 3 seeds × 2 prompt
    # sets — adoption decisions must clear the measured spread, not a
    # single sample. Context 0 reproduces the historical protocol exactly.
    num_seeds = int(os.environ.get("CFLEARN_QH_SEEDS", "3"))
    num_prompt_sets = int(os.environ.get("CFLEARN_QH_PROMPT_SETS", "2"))
    contexts = qh.make_contexts(num_seeds, num_prompt_sets)

    model = qh.build_sd()
    results = {}
    for name, kw in GRID.items():
        results[name] = qh.run_variant(model, name, contexts=contexts, **kw)

    ref = results["lossless"]
    rows = {}
    for name, res in results.items():
        q = compare_outputs(ref["latents"], ref["images"], res["latents"], res["images"])
        row = {"img_per_sec": res["img_per_sec"], **q.to_dict()}
        if len(contexts) > 1:
            row["variance"] = qh.variance_columns(ref["runs"], res["runs"])
        row = {
            k: ("inf" if isinstance(v, float) and np.isinf(v) else v)
            for k, v in row.items()
        }
        rows[name] = row
        print(name, json.dumps(row), flush=True)

    OUT.write_text(
        json.dumps(
            {
                "workload": "sd15_512px_txt2img_b4_ddim20_cfg7.5",
                "weights": "fixed-seed random, zero-init params de-zeroed "
                "(same protocol as quality_sd15.json)",
                "variance_protocol": (
                    f"{num_seeds} seeds x {num_prompt_sets} prompt sets; "
                    "per-context metrics vs same-context lossless; primary "
                    "columns = seed0_p0 (historical protocol)"
                )
                if len(contexts) > 1
                else None,
                "variants": rows,
            },
            indent=2,
        )
        + "\n"
    )
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
