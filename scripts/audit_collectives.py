"""HLO collective audit — the multi-chip scaling math (VERDICT r3 item 5).

Without multi-chip hardware, the only rigorous scaling statement is the one
the COMPILED programs make: for each mesh configuration, compile the
flagship programs on N virtual devices, extract every cross-device
collective (op kind + payload bytes) from the optimized HLO, and set the
per-step communication volume against the per-step compute:

    comm_time  >= bytes_per_chip / ICI_bandwidth
    comp_time  >= flops_per_chip / peak_flops
    efficiency <= comp / (comp + comm)   (no-overlap lower bound; XLA
                                          overlaps most collectives, so the
                                          truth lies between this and 1.0)

Programs audited (SD-1.5 real geometry, fp32 on the virtual CPU mesh —
byte counts are scaled to the bf16 deployment dtype):
  * training: UNet finetune step (B=8 global, 64x64x4 latents), the
    profile_training.py workload, on dp / dp x fsdp / dp x fsdp x tp meshes;
  * serving: one CFG denoise step (batch 2x4), the inner loop of txt2img,
    on data x model meshes.

v5e chip constants: measured bf16 matmul envelope 172 TF/s (paper peak
197; see docs/performance.md r4 re-measurement), ICI 1.6 Tbit/s/chip.
Reference analogue: the implied DDP scaling of
/root/reference/cflearn/trainer.py:226-229 (gradient all-reduce only).

Run (CPU, ~10-20 min): python scripts/audit_collectives.py
Writes docs/collectives_audit.json; the table in docs/performance.md is
generated from it.
"""

import json
import os
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from flax import nnx

OUT = REPO / "docs" / "collectives_audit.json"

# v5e per-chip constants
PEAK_TFLOPS = 172e12  # measured matmul envelope (N=400 scanned, r4), paper peak 197
ICI_BYTES_PER_S = 1.6e12 / 8  # 1.6 Tbit/s -> 200 GB/s per chip (v5e, 2D ring)

_DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "f64": 8, "pred": 1, "s8": 1, "u8": 1}
_COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter", "all-to-all", "collective-permute")


def _shape_bytes(shape_str: str) -> int:
    """'f32[8,64,64,4]{...}' -> payload bytes (fp32 counted, scaled later)."""
    m = re.match(r"([a-z0-9]+)\[([\d,]*)\]", shape_str)
    if not m:
        return 0
    dt, dims = m.groups()
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * _DTYPE_BYTES.get(dt, 4)


def collect_collectives(hlo_text: str):
    """Sum payload bytes per collective kind from optimized HLO text."""
    out = {k: {"count": 0, "bytes": 0} for k in _COLLECTIVES}
    for line in hlo_text.splitlines():
        s = line.strip()
        # e.g.:  %all-reduce.1 = f32[1280]{0} all-reduce(...)
        m = re.match(r"%?[\w.-]+ = \(?([a-z0-9]+\[[\d,]*\][^)]*?)\)? ([a-z-]+)\(", s)
        if not m:
            continue
        shapes, op = m.groups()
        if op.rstrip("-start") in _COLLECTIVES or op in _COLLECTIVES:
            kind = op[: -len("-start")] if op.endswith("-start") else op
            if kind not in out:
                continue
            total = sum(_shape_bytes(p.strip()) for p in shapes.split(","))
            # tuple shapes: count each element once
            total = max(total, _shape_bytes(shapes))
            out[kind]["count"] += 1
            out[kind]["bytes"] += total
    return {k: v for k, v in out.items() if v["count"]}


def audit(compiled, n_devices: int, label: str):
    hlo = compiled.as_text()
    colls = collect_collectives(hlo)
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    flops = float(cost.get("flops", 0.0))
    total_bytes_f32 = sum(v["bytes"] for v in colls.values())
    # compiled fp32 on CPU; deployment runs bf16 -> halve the payload
    total_bytes = total_bytes_f32 / 2
    flops_per_chip = flops / n_devices
    comm_s = total_bytes / ICI_BYTES_PER_S
    comp_s = flops_per_chip / PEAK_TFLOPS
    eff = comp_s / (comp_s + comm_s) if (comp_s + comm_s) > 0 else 1.0
    row = {
        "label": label,
        "n_devices": n_devices,
        "collectives": colls,
        "comm_bytes_bf16_per_chip": int(total_bytes),
        "flops_per_chip": flops_per_chip,
        "comm_s_lower_bound": comm_s,
        "comp_s_lower_bound": comp_s,
        "efficiency_no_overlap_bound": round(eff, 4),
    }
    print(
        f"[{label}] colls={ {k: v['count'] for k, v in colls.items()} } "
        f"comm={total_bytes/1e6:.1f}MB comp={comp_s*1e3:.2f}ms "
        f"comm_t={comm_s*1e3:.2f}ms eff>={eff:.3f}",
        flush=True,
    )
    return row


def build_unet_train_step(mesh_axes: dict):
    """The profile_training workload: SD-1.5 UNet finetune step on a mesh."""
    from cflearn_tpu.modules.multimodal.diffusion.unet import UNetDiffuser
    from cflearn_tpu.modules.multimodal.diffusion.ldm import sd_unet_config
    from cflearn_tpu.parallel.mesh import MeshConfig, make_mesh
    from cflearn_tpu.parallel.tp import place_params
    import optax

    mc = MeshConfig()
    mc.from_info(mesh_axes)
    mesh = make_mesh(mc)
    unet = UNetDiffuser(rngs=nnx.Rngs(0), **sd_unet_config("v1"))
    graphdef, state = nnx.split(unet)
    state = place_params(state, mesh, use_fsdp=mesh_axes.get("fsdp", 1) > 1)
    tx = optax.adamw(1e-4)
    opt_state = tx.init(state)

    def step(st, opt_st, x, t, cond, eps):
        def loss_fn(s):
            m = nnx.merge(graphdef, s)
            pred = m(x, t, context=cond)
            return jnp.mean((pred - eps) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(st)
        updates, opt_st = tx.update(grads, opt_st, st)
        st = optax.apply_updates(st, updates)
        return st, opt_st, loss

    B = 8
    x = jnp.zeros((B, 64, 64, 4))
    t = jnp.zeros((B,), jnp.int32)
    cond = jnp.zeros((B, 77, 768))
    eps = jnp.zeros((B, 64, 64, 4))
    from jax.sharding import NamedSharding, PartitionSpec as P

    # batch shards over `data` ONLY here: in this hand-rolled step, sharding
    # the batch over fsdp too makes GSPMD fight the fsdp param shardings on
    # broadcast tensors (involuntary-rematerialization warnings). The
    # production Trainer shards batches over ("data","fsdp") and its
    # one-program step compiles clean (dryrun asserts it); this audit
    # intentionally simplifies — collective VOLUMES are what is measured,
    # and the fsdp param all-gathers/reduce-scatters are unaffected.
    batch_axes = tuple(a for a in ("data",) if mesh_axes.get(a, 1) > 1)
    shard = lambda a: jax.device_put(a, NamedSharding(mesh, P(batch_axes, *[None] * (a.ndim - 1)) if batch_axes else P()))
    args = (state, opt_state, shard(x), shard(t), shard(cond), shard(eps))
    with mesh:
        return jax.jit(step).lower(*args).compile()


def build_unet_serving_step(mesh_axes: dict):
    """Serving inner loop: one CFG denoise (uncond+cond batched, B=2x4)."""
    from cflearn_tpu.modules.multimodal.diffusion.unet import UNetDiffuser
    from cflearn_tpu.modules.multimodal.diffusion.ldm import sd_unet_config
    from cflearn_tpu.parallel.mesh import MeshConfig, make_mesh
    from cflearn_tpu.parallel.tp import place_params

    mc = MeshConfig()
    mc.from_info(mesh_axes)
    mesh = make_mesh(mc)
    unet = UNetDiffuser(rngs=nnx.Rngs(0), **sd_unet_config("v1"))
    graphdef, state = nnx.split(unet)
    state = place_params(state, mesh)

    def denoise(st, x, t, cond):
        m = nnx.merge(graphdef, st)
        return m(x, t, context=cond)

    from jax.sharding import NamedSharding, PartitionSpec as P

    batch_axes = tuple(a for a in ("data",) if mesh_axes.get(a, 1) > 1)
    shard = lambda a: jax.device_put(
        a, NamedSharding(mesh, P(batch_axes, *[None] * (a.ndim - 1)) if batch_axes else P())
    )
    x = shard(jnp.zeros((8, 64, 64, 4)))
    t = shard(jnp.zeros((8,), jnp.int32))
    cond = shard(jnp.zeros((8, 77, 768)))
    with mesh:
        return jax.jit(denoise).lower(state, x, t, cond).compile()


def main() -> None:
    n = 8
    rows = []
    for label, axes, builder in [
        ("train dp=8", {"data": 8}, build_unet_train_step),
        ("train dp=4 x fsdp=2", {"data": 4, "fsdp": 2}, build_unet_train_step),
        ("train dp=2 x fsdp=2 x tp=2", {"data": 2, "fsdp": 2, "model": 2}, build_unet_train_step),
        ("serve dp=8", {"data": 8}, build_unet_serving_step),
        ("serve dp=4 x tp=2", {"data": 4, "model": 2}, build_unet_serving_step),
        ("serve dp=2 x tp=4", {"data": 2, "model": 4}, build_unet_serving_step),
    ]:
        print(f"compiling {label} ...", flush=True)
        rows.append(audit(builder(axes), n, label))
    OUT.write_text(json.dumps({"chip": "v5e", "peak_tflops": PEAK_TFLOPS / 1e12,
                               "ici_bytes_per_s": ICI_BYTES_PER_S, "rows": rows}, indent=2) + "\n")
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
