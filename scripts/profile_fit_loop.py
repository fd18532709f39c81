"""REAL fit-loop throughput vs `steps_per_dispatch` (VERDICT r4 #3's chip
re-measure, done on the loop that actually ships).

`profile_training_multi.py` times the raw jitted step fn back-to-back —
there the ~24 ms tunnel dispatch OVERLAPS via async dispatch pipelining and
k-fusion is worth only ~3% on the GAN row. The production `Trainer._loop`
additionally pays host-side Python per step (should_skip probes, lr-scale
dict, loss-window appends, cadence checks) which does NOT overlap; fusing k
steps per dispatch divides that cost by k. This script times
`Trainer._loop` itself (monitors/logging active, bit-identical cadence
semantics) on the GAN 64px adversarial workload for k ∈ {1, 8, 32}.

Run on the real chip: python scripts/profile_fit_loop.py
Writes docs/fit_loop_profile.json.
"""

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax

SMOKE = bool(int(os.environ.get("CFLEARN_PFL_SMOKE", "0")))
if SMOKE:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/.cache/cflearn_tpu/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import numpy as np

OUT = REPO / "docs" / "fit_loop_profile.json"
STEPS = 40 if SMOKE else 1200


def measure(k: int) -> dict:
    from cflearn_tpu.data import ArrayData
    from cflearn_tpu.monitors import LazyMonitor
    from cflearn_tpu.schema import DLConfig
    from cflearn_tpu.schema.data import DataConfig
    from cflearn_tpu.schema.model import IDLModel
    from cflearn_tpu.schema.train_schema import TrainerState
    from cflearn_tpu.trainer import Trainer

    B = 8 if SMOKE else 64
    rng = np.random.default_rng(0)
    imgs = rng.normal(size=(4 * B, 64, 64, 3)).astype(np.float32).clip(-1, 1)
    dc = DataConfig()
    dc.batch_size = B
    data = ArrayData.init(dc).fit(imgs)
    config = DLConfig(
        model="gan",
        module_name="gan",
        module_config={
            "img_size": 64,
            "latent_dim": 128,
            "latent_resolution": 8,
            "discriminator_config": {"num_layers": 3, "start_channels": 64},
        },
        workspace=f"/tmp/cflearn_profile_fitloop_k{k}",
        mixed_precision="bf16",
        fixed_steps=8,  # warmup fit: compiles the k-fused program too
        callback_names=[],
        steps_per_dispatch=k,
    )
    model = IDLModel.from_config(config)
    trainer = Trainer(config, monitors=[LazyMonitor()])
    trainer.fit(data, model, skip_final_evaluation=True)

    # time the PRODUCTION loop on a fresh TrainerState (warm programs):
    # same cadence/monitor semantics as fit
    from cflearn_tpu.data.utils import DeviceBatcher

    state = TrainerState.from_config(
        config, num_step_per_epoch=len(trainer.train_loader), batch_size=B
    )
    state.fixed_steps = STEPS
    batcher = DeviceBatcher(trainer.train_loader)
    t0 = time.perf_counter()
    trainer._loop(state, batcher, model, False, True)
    # drain: pull one loss scalar to force the tail of the async queue
    for v in trainer._loss_window.values():
        float(np.asarray(v[-1]))
        break
    dt = time.perf_counter() - t0
    row = {
        "steps_per_dispatch": k,
        "steps": state.step,
        "wall_s": round(dt, 3),
        "step_ms": round(dt / max(1, state.step) * 1e3, 3),
        "img_per_sec": round(B * state.step / dt, 1),
    }
    print(json.dumps(row), flush=True)
    return row


def main() -> None:
    rows = [measure(k) for k in (1, 8, 32)]
    OUT.write_text(
        json.dumps(
            {
                "workload": "gan_64px_adversarial_B64, production Trainer._loop "
                "(monitors + cadence active), chip",
                "note": "raw step-fn pipelining already hides dispatch latency "
                "(profile_training_multi k=8: +3%); this measures the loop's "
                "host-side per-step cost that k-fusion actually divides",
                "rows": rows,
            },
            indent=2,
        )
        + "\n"
    )
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
