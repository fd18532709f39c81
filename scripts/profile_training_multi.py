"""Training-step budget beyond the UNet finetune (VERDICT r3 item 4):
the GAN/AE adversarial two-step and DDPM-from-scratch, measured through the
PRODUCTION trainer step (`Trainer._build_step_fn`'s one-program jit — the
same compiled program `fit` runs), not a hand-rolled replica.

Per workload:
- one `fit` step builds the trainer state + step-fn cache;
- the jitted step is then timed directly (donated state threaded through,
  scalar loss pull per window — the scan-x100 protocol is impossible here
  because the step donates, so N sequential calls amortize the ~24 ms
  tunnel dispatch instead);
- algorithmic FLOPs come from `jax.make_jaxpr` over the same step fn
  (ceiling_trace's convention: conv=2*out*red, dot=2MNK).

All workloads run the production AMP path (`mixed_precision="bf16"` — same
protocol as the UNet-finetune budget): f32 master params, bf16 compute.
The all-f32 variant of the ae_kl program sat >70 min in the remote compiler
without returning (and its Pallas input-grad previously compile-OOM'd scoped
VMEM — now gated, see ops/conv.py `_shape_wins`); bf16 compute is both the
realistic configuration and the compilable one.

Workloads (realistic geometries):
- ae_kl 256px B=8, adversarial from step 0 (generator + discriminator
  steps in one program — the reference's `d_loss_start_step` path)
- gan 64px B=64 (two-scope adversarial step)
- ddpm-from-scratch 64px B=32 (pixel-space UNet + EMA)

Run on the real chip: python scripts/profile_training_multi.py
Writes docs/training_profile_multi.json.
"""

import ast
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax

SMOKE = bool(int(os.environ.get("CFLEARN_PTM_SMOKE", "0")))
if SMOKE:  # CPU correctness pass: tiny geometry, no chip contention
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/.cache/cflearn_tpu/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import jax.numpy as jnp
import numpy as np

OUT = REPO / "docs" / "training_profile_multi.json"
ENVELOPE_TFS = 172.0
STEPS = 3 if SMOKE else 20


def _load_jaxpr_flops():
    """Reuse ceiling_trace's jaxpr FLOP counter without executing its main."""
    src = (REPO / "scripts" / "ceiling_trace.py").read_text()
    tree = ast.parse(src)
    keep = [
        n
        for n in tree.body
        if (isinstance(n, ast.FunctionDef) and n.name in ("jaxpr_flops", "_dims"))
        or isinstance(n, (ast.Import, ast.ImportFrom))
    ]
    ns: dict = {}
    exec(compile(ast.fix_missing_locations(ast.Module(body=keep, type_ignores=[])), "ct", "exec"), ns)
    return ns["jaxpr_flops"]


def profile_workload(name: str, config, data, n_images_per_step: int) -> dict:
    from cflearn_tpu.monitors import LazyMonitor
    from cflearn_tpu.schema.model import IDLModel
    from cflearn_tpu.trainer import Trainer

    model = IDLModel.from_config(config)
    trainer = Trainer(config, monitors=[LazyMonitor()])
    trainer.fit(data, model, skip_final_evaluation=True)

    # the REAL compiled step with every train-step scope active
    actives = (True,) * len(model.train_steps)
    fn = trainer.get_step_fn(actives)
    lr_scales = {s: jnp.asarray(1.0, jnp.float32) for s in trainer.lr_scales}
    # one real loader batch, device-put exactly like the fit loop's batcher
    batch = {
        k: jnp.asarray(v)
        for k, v in dict(next(iter(trainer.train_loader))).items()
        if v is not None
    }
    s, o = trainer._full_state, trainer._opt_states

    flops = None
    try:
        jaxpr_flops = _load_jaxpr_flops()
        fl = jaxpr_flops(jax.make_jaxpr(fn)(s, o, lr_scales, batch))
        flops = fl.get("conv", 0) + fl.get("matmul", 0) + fl.get("attention", 0)
    except Exception as exc:  # donation-vs-trace quirks: record, keep timing
        print(f"[{name}] flop count failed: {exc}", flush=True)

    s, o, li = fn(s, o, lr_scales, batch)  # warm for these actives
    float(list(li.values())[0])
    t0 = time.perf_counter()
    for _ in range(STEPS):
        s, o, li = fn(s, o, lr_scales, batch)
    float(list(li.values())[0])
    dt = (time.perf_counter() - t0) / STEPS
    row = {
        "workload": name,
        "step_ms": round(dt * 1e3, 1),
        "img_per_sec": round(n_images_per_step / dt, 1),
        "algorithmic_tf": round(flops / 1e12, 3) if flops else None,
        "sustained_tfs": round(flops / 1e12 / dt, 1) if flops else None,
        "mfu_vs_envelope": round(flops / 1e12 / dt / ENVELOPE_TFS, 3) if flops else None,
        "scopes": [ts.scope for ts in model.train_steps],
    }

    # steps_per_dispatch (r5): the SAME step scan-fused k-per-dispatch — the
    # trainer's lever for dispatch-latency-bound workloads (the GAN row pays
    # ~24 ms tunnel dispatch against ~4 ms compute). Parity with k=1 is
    # test-asserted (tests/test_trainer.py::test_steps_per_dispatch_parity).
    K = int(os.environ.get("CFLEARN_PTM_K", "8"))
    if K > 1:
        fnk = trainer.get_step_fn(actives, K)
        stacked = {k2: jnp.stack([v] * K) for k2, v in batch.items()}
        s, o, li = fnk(s, o, lr_scales, stacked)  # compile + warm
        float(np.asarray(list(li.values())[0])[-1])
        dispatches = max(2, STEPS // K + 1)
        t0 = time.perf_counter()
        for _ in range(dispatches):
            s, o, li = fnk(s, o, lr_scales, stacked)
        float(np.asarray(list(li.values())[0])[-1])
        dtk = (time.perf_counter() - t0) / (dispatches * K)
        row["steps_per_dispatch"] = {
            "k": K,
            "step_ms": round(dtk * 1e3, 2),
            "img_per_sec": round(n_images_per_step / dtk, 1),
            "sustained_tfs": round(flops / 1e12 / dtk, 1) if flops else None,
            "mfu_vs_envelope": round(flops / 1e12 / dtk / ENVELOPE_TFS, 3)
            if flops
            else None,
        }
    print(json.dumps(row), flush=True)
    return row


def main() -> None:
    from cflearn_tpu.data import ArrayData
    from cflearn_tpu.schema import DLConfig
    from cflearn_tpu.schema.data import DataConfig

    def make_data(imgs, batch_size):
        dc = DataConfig()
        dc.batch_size = batch_size
        return ArrayData.init(dc).fit(imgs)

    rows = []
    rng = np.random.default_rng(0)

    # --- ae_kl adversarial (generator + discriminator in one program)
    B, S = (2, 64) if SMOKE else (8, 256)
    imgs = rng.normal(size=(4 * B, S, S, 3)).astype(np.float32).clip(-1, 1)
    config = DLConfig(
        model="ae_kl",
        module_name="ae_kl",
        module_config={
            "img_size": S,
            "in_channels": 3,
            "inner_channels": 32 if SMOKE else 128,
            "z_channels": 4,
            "embedding_channels": 4,
            "channel_multipliers": [1, 2] if SMOKE else [1, 2, 4, 4],
            "num_res_blocks": 1 if SMOKE else 2,
            "use_perceptual": False,  # LPIPS weights need egress
            "d_loss_start_step": 0,
        },
        workspace="/tmp/cflearn_profile_ae",
        mixed_precision="bf16",
        fixed_steps=1,
        callback_names=[],
    )
    rows.append(profile_workload(f"ae_kl_{S}px_adversarial_B{B}", config, make_data(imgs, B), B))

    # --- DCGAN-style adversarial at 64px
    B = 4 if SMOKE else 64
    imgs = rng.normal(size=(2 * B, 64, 64, 3)).astype(np.float32).clip(-1, 1)
    config = DLConfig(
        model="gan",
        module_name="gan",
        module_config={
            "img_size": 64,
            "latent_dim": 128,
            "latent_resolution": 8,
            "discriminator_config": {"num_layers": 3, "start_channels": 64},
        },
        workspace="/tmp/cflearn_profile_gan",
        mixed_precision="bf16",
        fixed_steps=1,
        callback_names=[],
    )
    rows.append(profile_workload(f"gan_64px_B{B}", config, make_data(imgs, B), B))

    # --- DDPM from scratch, pixel space 64px
    B = 4 if SMOKE else 32
    imgs = rng.normal(size=(2 * B, 64, 64, 3)).astype(np.float32).clip(-1, 1)
    config = DLConfig(
        model="ddpm",
        module_name="ddpm",
        module_config={
            "img_size": 64,
            "in_channels": 3,
            "out_channels": 3,
            "num_timesteps": 1000,
            "ema_decay": 0.999,
            "unet_config": {
                "start_channels": 32 if SMOKE else 128,
                "num_res_blocks": 1 if SMOKE else 2,
                "channel_multipliers": (1, 2) if SMOKE else (1, 2, 2, 2),
                "attention_downsample_rates": (4,),
                "num_heads": 4,
                "use_spatial_transformer": False,
            },
        },
        workspace="/tmp/cflearn_profile_ddpm",
        mixed_precision="bf16",
        fixed_steps=1,
        callback_names=[],
    )
    rows.append(profile_workload(f"ddpm_from_scratch_64px_B{B}", config, make_data(imgs, B), B))

    out = Path("/tmp/training_profile_multi_smoke.json") if SMOKE else OUT
    out.write_text(json.dumps({"steps_timed": STEPS, "envelope_tfs": ENVELOPE_TFS, "rows": rows}, indent=2) + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
