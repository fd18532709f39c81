"""Trace-grounded lossless ceiling accounting (VERDICT r3 item 2).

Replaces the r3 ceiling proof's XLA `cost_analysis()` FLOP convention (which
double-counts fused convolution work and produced an impossible ">100% of
envelope" sustained number) with TWO independently-derived quantities:

1. ALGORITHMIC FLOPs, counted from the jaxpr: every `conv_general_dilated`
   as 2*B*Ho*Wo*Cin*Cout*kh*kw, every `dot_general` as 2*M*N*K(*batch),
   flash-attention pallas calls as 4*B*h*Lq*Lk*d. One convention, no fusion
   ambiguity, reproducible offline.
2. PER-OP-CLASS DEVICE TIME, from a jax.profiler trace of the exact bench
   programs (UNet CFG step B=2x4 + VAE decode B=4, bf16), aggregated by op
   class (conv / attention kernel / other matmul / elementwise+copies).

Their quotient is the honest sustained TF/s and MFU per class; the per-class
gap vs the 126 TF/s matmul envelope is then attributed using the per-shape
probe table in docs/performance.md (MXU pad waste vs memory-bound tails).

Run on the real chip: python scripts/ceiling_trace.py
Writes docs/ceiling_trace.json.
"""

import json
import os
import sys
from collections import defaultdict
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/cflearn_tpu/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import jax.numpy as jnp
import numpy as np
from flax import nnx

LOGDIR = "/tmp/sd_ceiling_trace"
OUT = REPO / "docs" / "ceiling_trace.json"
TRACE_REPS = 5


# ---------------------------------------------------------------- FLOP count

def _dims(aval):
    return tuple(int(d) for d in aval.shape)


def jaxpr_flops(jaxpr) -> dict:
    """Algorithmic FLOPs per class from a closed jaxpr (recursing into
    pjit/scan/cond calls; scan bodies multiply by length)."""
    out = defaultdict(float)

    def visit(jx, mult=1.0, in_attn=False):
        for eqn in jx.eqns:
            prim = eqn.primitive.name
            attn_here = False
            # flash attention: count ALGORITHMIC flops at the outermost
            # custom-vjp/jit boundary where q/k/v are still UNPADDED 4-D
            # (b,h,L,d) — inside, the kernel pads d 40/80 -> 128, and its
            # cost estimate counts that padded MXU occupancy (recursion
            # records it separately as attention_padded_occupancy, the
            # pad-waste diagnostic)
            if not in_attn and prim in ("pjit", "custom_vjp_call", "custom_jvp_call"):
                ins = [_dims(v.aval) for v in eqn.invars if hasattr(v.aval, "shape")]
                four_d = [s for s in ins if len(s) == 4]
                if (
                    len(four_d) >= 3
                    and four_d[0] == four_d[1] == four_d[2]
                    and not any(s[0] == 3 and s[1] == 3 for s in four_d)
                ):
                    b_, h_, l_, d_ = four_d[0]
                    out["attention"] += mult * 4.0 * b_ * h_ * l_ * l_ * d_
                    attn_here = True
            if prim == "conv_general_dilated":
                o = _dims(eqn.outvars[0].aval)  # (B, ...spatial..., Co) or torch order
                w = _dims(eqn.invars[1].aval)
                # flops = 2 * out_elements * (reduction size) ; reduction =
                # prod(kernel spatial) * Cin = w.size / Cout
                cout = eqn.params["dimension_numbers"].rhs_spec
                # rhs_spec: (out_c_dim, in_c_dim, *spatial) indices into w
                co = w[cout[0]]
                red = int(np.prod(w)) // co
                out["conv"] += mult * 2 * float(np.prod(o)) * red
            elif prim == "dot_general":
                a = _dims(eqn.invars[0].aval)
                o = _dims(eqn.outvars[0].aval)
                (lc, _), _ = eqn.params["dimension_numbers"]
                k = float(np.prod([a[i] for i in lc]))
                out["matmul"] += mult * 2 * float(np.prod(o)) * k
            elif prim == "pallas_call":
                # our kernels all pass pl.CostEstimate with the analytic
                # algorithmic flops — use it directly; classify by operand
                # shapes (conv has a (3,3,C,Co) weight; flash has 3 same-
                # shape 4-D q/k/v)
                ce = eqn.params.get("cost_estimate")
                fl = float(getattr(ce, "flops", 0) or 0)
                shapes = [_dims(v.aval) for v in eqn.invars if hasattr(v.aval, "shape")]
                four_d = [s for s in shapes if len(s) == 4]
                three_d = [s for s in shapes if len(s) == 3]
                if any(s[0] == 3 and s[1] == 3 for s in four_d):
                    out["conv"] += mult * fl  # conv kernels' estimate is algorithmic
                elif len(three_d) >= 3 and three_d[0] == three_d[1] == three_d[2]:
                    # flash kernels: operands are (b*h, L, d_pad) — the cost
                    # estimate counts PADDED occupancy flops (d 40/80 -> 128)
                    out["attention_padded_occupancy"] += mult * fl
                else:
                    out["pallas_other"] += mult * fl
            for p in ("jaxpr", "call_jaxpr", "branches", "cond_jaxpr", "body_jaxpr"):
                sub = eqn.params.get(p) if eqn.params else None
                if sub is None:
                    continue
                subs = sub if isinstance(sub, (list, tuple)) else [sub]
                m = mult * (eqn.params.get("length", 1) if prim == "scan" else 1)
                for s in subs:
                    visit(s.jaxpr if hasattr(s, "jaxpr") else s, m, in_attn or attn_here)

    visit(jaxpr.jaxpr if hasattr(jaxpr, "jaxpr") else jaxpr)
    return dict(out)


# ---------------------------------------------------------------- trace side

def classify(op_name: str) -> str:
    """Classify by the HLO op's NAME HEAD (the `%name` before ` = `) only.

    The full event text lists operand names — matching substrings over it
    mis-attributes wholesale (a `%copy-start(... %conv3x3_pallas ...)`
    "mentions" conv; a `%multiply_subtract_fusion(... %copy.7149 ...)`
    "mentions" copy). TPU HLO heads encode the kind (or a descriptive
    fusion prefix), which is what we want. Known custom-call heads:
    `conv3x3_pallas`/`conv3x3_wgrad` (Pallas convs), `flash_attention`
    (fwd), `jvp__`/`transpose_jvp___` (the flash kernel re-run inside the
    VJP and its transpose rule — the only custom-vjp kernels besides the
    name-preserving conv ones). Caveat: XLA may fuse conv work into
    generically-named fusions; per-class splits are attribution, wall time
    is truth."""
    n = op_name.lower()
    head = n.split(" = ", 1)[0].lstrip("%")
    if head.startswith(("while", "conditional", "call")):
        # wrapper spans cover every child op (a scan's %while = the whole
        # program) — report separately, never sum into the serial budget
        return "control-flow(wrapper-span)"
    if head.startswith(("copy-start", "copy-done")) or "cross_program_prefetch" in head:
        # ASYNC copies (weight streaming / cross-program prefetch) overlap
        # compute; summing their spans alongside sync op time double-counts
        return "async-copy(overlapped)"
    if "conv" in head:
        return "conv"
    if "flash" in head or "jvp" in head or "attn" in head:
        return "attention"
    if "dot" in head or "einsum" in head or "matmul" in head:
        return "matmul"
    if any(k in head for k in ("copy", "transpose", "reshape", "bitcast", "slice", "concatenate", "pad")):
        return "data-movement"
    if "fusion" in head:
        return "fusion(elementwise+epilogues)"
    if "all-reduce" in head or "collective" in head or "reduce-scatter" in head:
        return "collective"
    return "other"


def parse_trace(logdir: str) -> dict:
    import glob

    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    try:
        from tensorflow.core.profiler.protobuf import xplane_pb2
    except ModuleNotFoundError:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xplanes = sorted(
        glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    space = xplane_pb2.XSpace()
    with open(xplanes[-1], "rb") as f:
        space.ParseFromString(f.read())
    per_op = defaultdict(float)
    for plane in space.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        ev_meta = {m.id: plane.event_metadata[m.id].name for m in plane.event_metadata.values()}
        for line in plane.lines:
            # the serial budget comes from the sync "XLA Ops" line ONLY;
            # "Async XLA Ops" (copy-start/done spans, which overlap compute)
            # is folded into the async class wholesale — matching it with
            # `"XLA Ops" in name` used to double-count every async span
            # under its operand's class
            if line.name == "XLA Ops":
                for ev in line.events:
                    per_op[ev_meta.get(ev.metadata_id, "?")] += ev.duration_ps / 1e12
            elif line.name == "Async XLA Ops":
                for ev in line.events:
                    per_op["%copy-start(async line)"] += ev.duration_ps / 1e12
    by_class = defaultdict(float)
    top = sorted(per_op.items(), key=lambda kv: -kv[1])
    for name, s in per_op.items():
        by_class[classify(name)] += s
    return {"by_class_s": dict(by_class), "top_ops": [(n, round(s * 1e3, 3)) for n, s in top[:25]]}


# -------------------------------------------------------------------- driver

def main() -> None:
    from cflearn_tpu.modules.multimodal.diffusion.ldm import StableDiffusion

    model = StableDiffusion(version="v1", rngs=nnx.Rngs(0))
    params = nnx.state(model, nnx.Param)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        params,
    )
    nnx.update(model, params)
    graphdef, state = nnx.split(model)
    B = 4
    z2 = jax.random.normal(jax.random.PRNGKey(0), (2 * B, 64, 64, 4), jnp.bfloat16)
    t = jnp.full((2 * B,), 500, jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2 * B, 77, 768), jnp.bfloat16)
    z = jax.random.normal(jax.random.PRNGKey(2), (B, 64, 64, 4), jnp.float32)

    def unet_step(st, z2, t, ctx):
        m = nnx.merge(graphdef, st)
        return m.unet(z2, t, context=ctx)

    def vae_decode(st, z):
        m = nnx.merge(graphdef, st)
        return m.decode(z)

    print("counting algorithmic FLOPs from the jaxprs...", flush=True)
    fl_unet = jaxpr_flops(jax.make_jaxpr(unet_step)(state, z2, t, ctx))
    fl_vae = jaxpr_flops(jax.make_jaxpr(vae_decode)(state, z))
    print("unet CFG step:", {k: f"{v/1e12:.3f} TF" for k, v in fl_unet.items()}, flush=True)
    print("vae decode  :", {k: f"{v/1e12:.3f} TF" for k, v in fl_vae.items()}, flush=True)

    ju = jax.jit(unet_step)
    jv = jax.jit(vae_decode)
    float(jnp.sum(ju(state, z2, t, ctx).astype(jnp.float32)))
    float(jnp.sum(jv(state, z).astype(jnp.float32)))

    import time

    t0 = time.perf_counter()
    for _ in range(TRACE_REPS):
        o = ju(state, z2, t, ctx)
    float(jnp.sum(o.astype(jnp.float32)))
    unet_wall = (time.perf_counter() - t0) / TRACE_REPS
    t0 = time.perf_counter()
    for _ in range(TRACE_REPS):
        o2 = jv(state, z)
    float(jnp.sum(o2.astype(jnp.float32)))
    vae_wall = (time.perf_counter() - t0) / TRACE_REPS

    print("capturing traces (unet / vae separately)...", flush=True)
    with jax.profiler.trace(LOGDIR + "/unet"):
        for _ in range(TRACE_REPS):
            o = ju(state, z2, t, ctx)
        float(jnp.sum(o.astype(jnp.float32)))
    with jax.profiler.trace(LOGDIR + "/vae"):
        for _ in range(TRACE_REPS):
            o2 = jv(state, z)
        float(jnp.sum(o2.astype(jnp.float32)))
    tr_unet = parse_trace(LOGDIR + "/unet")
    tr_vae = parse_trace(LOGDIR + "/vae")

    def summarize(fl, tr, wall):
        per_rep = {k: v / TRACE_REPS for k, v in tr["by_class_s"].items()}
        alg = fl.get("conv", 0) + fl.get("matmul", 0) + fl.get("attention", 0)
        # compute-class device time (async copy-starts overlap compute —
        # their summed duration includes wait, so they are reported but NOT
        # added to the denominator; the honest denominator is wall time)
        return {
            "flops_algorithmic": {k: round(v / 1e12, 4) for k, v in fl.items()},
            "algorithmic_total_tf": round(alg / 1e12, 3),
            "wall_s_per_rep": round(wall, 5),
            "device_time_per_rep_s": {k: round(v, 5) for k, v in per_rep.items()},
            "sustained_tfs_vs_wall": round(alg / 1e12 / wall, 1),
            "mfu_vs_172tfs_envelope": round(alg / 1e12 / wall / 172, 3),
        }

    # per-call tunnel overhead (~24 ms measured r4) rides on each wall rep
    OVERHEAD_S = 0.024
    su = summarize(fl_unet, tr_unet, unet_wall - OVERHEAD_S / TRACE_REPS)
    sv = summarize(fl_vae, tr_vae, vae_wall - OVERHEAD_S / TRACE_REPS)
    alg_img = (su["algorithmic_total_tf"] * 20 + sv["algorithmic_total_tf"]) / 4
    result = {
        "workload": "unet CFG step (B=2x4, bf16) x20 + vae decode (B=4) — the bench lossless pipeline",
        "convention": "jaxpr ops: conv=2*out*red, dot=2*M*N*K, attention=4*b*h*L^2*d (unpadded)",
        "envelope_tfs_measured": 172.0,
        "per_call_overhead_s": OVERHEAD_S,
        "unet_cfg_step": su,
        "vae_decode": sv,
        "algorithmic_tf_per_image": round(alg_img, 2),
        "top_ops_unet_ms_total": tr_unet["top_ops"][:15],
        "top_ops_vae_ms_total": tr_vae["top_ops"][:15],
    }
    print(json.dumps({k: v for k, v in result.items() if not k.startswith("top_ops")}, indent=1, default=str))
    for sec in ("top_ops_unet_ms_total", "top_ops_vae_ms_total"):
        print(f"-- {sec}")
        for n, ms in result[sec]:
            print(f"{ms:9.3f} ms  {n[:110]}")
    OUT.write_text(json.dumps(result, indent=1, default=str) + "\n")
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
