"""Trace-grounded TRAINING budget for the SD-1.5 UNet finetune (VERDICT r4 #4).

Does for the train step what scripts/ceiling_trace.py did for inference:
three programs traced separately on the chip —

  fwd   : the finetune loss forward alone
  fwdbwd: value_and_grad (fwd + backward)
  step  : the full train step (grad + AdamW update)  — bench_secondary's
          exact finetune workload (B=8, f32 masters, bf16 compute,
          bf16-mu AdamW, no remat)

— each with per-op-class device time (jax.profiler trace) AND algorithmic
FLOPs from the jaxpr (one convention, scripts/ceiling_trace.py's counter).
Their quotient is the honest sustained TF/s per class per phase; backward ≈
fwdbwd - fwd, optimizer ≈ step - fwdbwd. This replaces the r4 asserted-but-
unmeasured "normalization/elementwise chains and HBM traffic" attribution
with measured per-class numbers.

Reference hot path being budgeted: /root/reference/cflearn/schema.py:1174-1294.

Run on the real chip: python scripts/training_trace.py
Writes docs/training_trace.json.
"""

import json
import os
import sys
from functools import partial
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/cflearn_tpu/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import jax.numpy as jnp
import numpy as np
import optax
from flax import nnx

from ceiling_trace import jaxpr_flops, parse_trace  # noqa: E402

OUT = REPO / "docs" / "training_trace.json"
TB = 8
T = 1000
SCAN_N = int(os.environ.get("CFLEARN_TT_SCAN", "10"))  # steps per traced dispatch
MATMUL_ENVELOPE_TFS = 172.0  # re-measured r4 bf16 envelope (docs/performance.md)


def _bf16(tree):
    return jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        tree,
    )


def build():
    from cflearn_tpu.modules.multimodal.diffusion.unet import UNetDiffuser

    kw = {}
    if os.environ.get("CFLEARN_TT_TINY", "0") == "1":
        # CPU smoke mode: validate the script end-to-end without the chip
        kw = dict(start_channels=32, channel_multipliers=(1, 2), num_res_blocks=1)
    unet = UNetDiffuser(use_checkpoint=False, rngs=nnx.Rngs(0), **kw)
    zp = nnx.state(unet, nnx.Param)
    leaves, tdef = jax.tree_util.tree_flatten(zp)
    zkeys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    leaves = [
        jax.random.normal(k, x.shape, x.dtype) * 0.02
        if hasattr(x, "shape") and x.ndim > 0 and float(jnp.max(jnp.abs(x))) == 0.0
        else x
        for k, x in zip(zkeys, leaves)
    ]
    nnx.update(unet, jax.tree_util.tree_unflatten(tdef, leaves))
    return nnx.split(unet, nnx.Param, ...)


def main() -> None:
    gd_u, uparams, urest = build()
    tx = optax.adamw(1e-5, mu_dtype=jnp.bfloat16)
    opt_state = tx.init(uparams)
    betas = np.linspace(1e-4, 2e-2, T, dtype=np.float64)
    acp = jnp.asarray(np.cumprod(1.0 - betas), jnp.float32)
    latents = jax.random.normal(jax.random.PRNGKey(1), (TB, 64, 64, 4), jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (TB, 77, 768), jnp.float32)

    def make_batch(key):
        t_key, n_key = jax.random.split(key)
        t = jax.random.randint(t_key, (TB,), 0, T)
        eps = jax.random.normal(n_key, latents.shape, jnp.float32)
        a = acp[t][:, None, None, None]
        x_t = jnp.sqrt(a) * latents + jnp.sqrt(1.0 - a) * eps
        return x_t, t, eps

    def loss_fn(p, x_t, t, eps):
        m = nnx.merge(gd_u, _bf16(p), urest)
        pred = m(x_t.astype(jnp.bfloat16), t, ctx.astype(jnp.bfloat16))
        return jnp.mean((pred.astype(jnp.float32) - eps) ** 2)

    # three programs, same scan protocol (one dispatch pays the ~24 ms
    # tunnel cost once; carry threads so XLA can't hoist the body)
    @jax.jit
    def fwd(p, key):
        def body(carry, k):
            x_t, t, eps = make_batch(k)
            return carry + loss_fn(p, x_t, t, eps), None

        out, _ = jax.lax.scan(body, jnp.float32(0.0), jax.random.split(key, SCAN_N))
        return out

    # fwd+bwd isolated as a ZERO-SCALED sgd step: identical buffer-lifetime
    # pattern to the (proven-to-fit) full step program — p threads through
    # the scan carry, grads are consumed leaf-wise into p - 0*g — minus the
    # optimizer state/update. The keep-grads-and-reduce formulation OOMs a
    # 16 GB chip even donated; this fits by construction. It adds one
    # elementwise pass over the 3.4 GB f32 params (~11 ms HBM) that the
    # phase math notes as part of the optimizer residual.
    @partial(jax.jit, donate_argnums=(0,))
    def fwdbwd(p, key):
        def body(carry, k):
            p = carry
            x_t, t, eps = make_batch(k)
            loss, grads = jax.value_and_grad(loss_fn)(p, x_t, t, eps)
            p = jax.tree_util.tree_map(lambda w, g: w - 0.0 * g, p, grads)
            return p, loss

        p, losses = jax.lax.scan(body, p, jax.random.split(key, SCAN_N))
        return losses[-1], p

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(p, opt_state, key):
        def body(carry, k):
            p, opt_state = carry
            x_t, t, eps = make_batch(k)
            loss, grads = jax.value_and_grad(loss_fn)(p, x_t, t, eps)
            updates, opt_state = tx.update(grads, opt_state, p)
            return (optax.apply_updates(p, updates), opt_state), loss

        (p, opt_state), losses = jax.lax.scan(
            body, (p, opt_state), jax.random.split(key, SCAN_N)
        )
        return p, opt_state, losses[-1]

    import time

    report = {
        "workload": f"sd15_unet_finetune B={TB} 64x64x4 latents, bf16 compute, "
        f"f32 masters, adamw(mu=bf16), no remat, scan x{SCAN_N}",
        "protocol": "per-op-class device time from jax.profiler trace / "
        "algorithmic FLOPs from jaxpr (ceiling_trace.py convention); "
        "bwd = fwdbwd - fwd, optimizer = step - fwdbwd. NOTE: trace event "
        "spans include async/overlapped execution, so by_class sums can "
        "exceed wall — wall_ms_per_step is authoritative, classes are "
        "relative shares",
        "programs": {},
    }

    key = jax.random.PRNGKey(3)
    programs = {}
    # fwdbwd LAST: it donates the param buffer each call (OOM otherwise)
    # and threads it back via its second output
    for name in ("fwd", "step", "fwdbwd"):
        logdir = f"/tmp/train_trace_{name}"

        if name == "fwd":
            run = lambda: float(fwd(uparams, key))  # noqa: E731  (scalar pull: block_until_ready can return early through the axon tunnel)
            flops = jaxpr_flops(jax.make_jaxpr(fwd)(uparams, key))
        elif name == "fwdbwd":
            flops = jaxpr_flops(jax.make_jaxpr(fwdbwd)(uparams, key))

            def run():
                nonlocal uparams
                loss, uparams = fwdbwd(uparams, key)
                float(loss)  # scalar pull forces completion
        else:
            flops = jaxpr_flops(jax.make_jaxpr(step)(uparams, opt_state, key))

            def run():
                nonlocal uparams, opt_state
                uparams, opt_state, loss = step(uparams, opt_state, key)
                float(loss)  # scalar pull forces completion

        t0 = time.time()
        run()  # compile + warm
        compile_s = time.time() - t0
        t0 = time.time()
        run()
        wall_s = time.time() - t0
        jax.profiler.start_trace(logdir)
        run()
        jax.profiler.stop_trace()
        trace = parse_trace(logdir)
        total_dev = sum(trace["by_class_s"].values())
        flops_total = sum(
            v for k, v in flops.items() if k != "attention_padded_occupancy"
        )
        programs[name] = {
            "compile_or_first_s": round(compile_s, 2),
            "wall_s_per_dispatch": round(wall_s, 4),
            "wall_ms_per_step": round(wall_s / SCAN_N * 1e3, 3),
            "device_s_total_in_trace": round(total_dev, 4),
            "by_class_ms_per_step": {
                k: round(v / SCAN_N * 1e3, 3) for k, v in trace["by_class_s"].items()
            },
            "algorithmic_flops_per_step": {
                k: round(v / SCAN_N) for k, v in flops.items()
            },
            "algorithmic_tfs_sustained": round(
                flops_total / SCAN_N / (wall_s / SCAN_N) / 1e12, 2
            ),
            "mfu_vs_envelope": round(
                flops_total / SCAN_N / (wall_s / SCAN_N) / 1e12 / MATMUL_ENVELOPE_TFS, 4
            ),
            "top_ops_ms": trace["top_ops"][:12],
            "img_per_sec": round(TB * SCAN_N / wall_s, 2) if name == "step" else None,
        }
        print(name, json.dumps(programs[name])[:400], flush=True)

    # phase deltas (host wall, scan-amortized — the honest per-step cost)
    fwd_ms = programs["fwd"]["wall_ms_per_step"]
    bwd_ms = programs["fwdbwd"]["wall_ms_per_step"] - fwd_ms
    opt_ms = programs["step"]["wall_ms_per_step"] - programs["fwdbwd"]["wall_ms_per_step"]
    report["programs"] = programs
    report["phase_ms_per_step"] = {
        "forward": round(fwd_ms, 3),
        "backward": round(bwd_ms, 3),
        "optimizer_minus_zero_sgd_pass": round(opt_ms, 3),
        "note": "fwdbwd applies p-0*g (one ~11 ms elementwise pass over the "
        "3.4 GB f32 params) so 'backward' is ≤11 ms high and the optimizer "
        "line correspondingly low",
    }
    OUT.write_text(json.dumps(report, indent=2) + "\n")
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
