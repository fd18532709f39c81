"""Benchmark: SD-1.5 512px txt2img throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline",
"value_faithful", "vs_baseline_faithful",
"value_lossless", "vs_baseline_lossless"}.

Workload (BASELINE.md north star): full Stable-Diffusion-1.5 architecture —
CLIP ViT-L/14 text encode → 20-step DDIM with CFG (2x batched UNet) → VAE
decode — compiled as ONE jitted XLA program (the reference drives this loop
from Python per step, `samplers/schema.py:153-196`). Weights are random
(zero-egress environment); throughput is architecture+runtime bound, not
weight bound. bf16 params/compute on the MXU; Pallas flash attention on the
UNet/VAE attention blocks.

THREE configurations are measured and reported (deviation vs the lossless
pipeline is measured per lever by scripts/quality_harness.py →
docs/quality_sd15.json + the config-neighborhood sweep
scripts/frontier_sd15.py → docs/frontier_sd15.json, bounds asserted by
tests/test_quality.py). ALL THREE keep the exact CFG guidance trajectory —
every lever in the published stack has an in-repo-measurable deviation:
- `value` — the accelerated serving stack: ToMe r=0.5 + DeepCache
  N=5/cut=1, full CFG every step. The speed/quality frontier sweep
  (docs/frontier_sd15.json) picked this point: it is FASTER than the old
  GI-CFG stack (7.34 vs 7.25 img/s) at far better fidelity (PSNR 17.8 vs
  13.7 dB). GI-CFG (guidance only inside a step interval — a
  distributional technique whose FID benefit is paper-cited and cannot be
  verified with random weights) is demoted to opt-in: CFLEARN_BENCH_GI_CFG=1.
- `value_faithful` — the conservative accelerated config: ToMe r=0.5 +
  DeepCache N=3/cut=1 (measured PSNR ~20 dB / SSIM 0.89); the recommended
  serving default when output fidelity to the exact pipeline matters most.
- `value_lossless` — NO approximation: full CFG every step, no ToMe, no
  DeepCache. This is the apples-to-apples number against the A100 anchor,
  which also runs the exact pipeline.

Skipped configs (CFLEARN_BENCH_SKIP_*) are reported as null, never 0.0.

vs_baseline anchor: PyTorch SD-1.5 fp16+xformers on A100 at 512px/20-step
DDIM sustains ~3.0 images/sec batched (diffusers-reported ~1s/image at
batch 1, ~3x with batching). vs_baseline = ours / 3.0; the north star is
vs_baseline ≥ 2.0 (with quality parity — hence the lossless number and the
quality artifact).
"""

import json
import os
import time

import jax

# persistent compilation cache: the full-pipeline program takes minutes to
# compile through the remote compiler; cache hits make reruns start in seconds
jax.config.update("jax_compilation_cache_dir", "/root/.cache/cflearn_tpu/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import jax.numpy as jnp
import numpy as np
from flax import nnx

A100_ANCHOR_IMAGES_PER_SEC = 3.0
BATCH = 4
NUM_STEPS = 20
GUIDANCE = 7.5


TOME_RATIO = 0.5  # ToMe-SD's standard ratio (Bolya & Hoffman 2023, tomesd);
# merges run on the 64x64 self-attention only. Measured deviation vs the
# lossless pipeline: docs/quality_sd15.json.

# CFG only in the middle band of the step loop ("Applying Guidance in a
# Limited Interval Improves Sample and Distribution Quality in Diffusion
# Models", Kynkäänniemi et al. 2024 — guidance at the highest/lowest noise
# levels hurts rather than helps FID). Outside the band the uncond UNet pass
# is skipped entirely (batch 4 instead of 8). OPT-IN (changes the guidance
# trajectory; its benefit is distributional and not verifiable in-repo):
USE_GI_CFG = os.environ.get("CFLEARN_BENCH_GI_CFG", "0") == "1"
GUIDANCE_INTERVAL = (0.25, 0.70)

# DeepCache (Ma et al. 2023, arXiv:2312.00858): every Nth step runs the full
# UNet and caches the deep-branch feature; in-between steps compute only the
# shallowest input/output blocks and splice the cache in. The cache sits at
# the shallowest branch (cut=1, the paper's standard SD configuration).
# faithful uses the paper-default N=3 (PSNR 20.2 dB stacked with ToMe);
# accelerated uses N=5, picked from the measured speed/quality frontier
# (docs/frontier_sd15.json: 7.34 img/s at PSNR 17.8 dB — dominates the old
# GI-CFG stack on both axes). Overridable for sweeps (interval 1 = off):
FAITHFUL_DC = (
    int(os.environ.get("CFLEARN_BENCH_DC_INTERVAL", "3")),
    int(os.environ.get("CFLEARN_BENCH_DC_CUT", "1")),
)
ACCEL_DC = (
    int(os.environ.get("CFLEARN_BENCH_ACCEL_DC_INTERVAL", "5")),
    int(os.environ.get("CFLEARN_BENCH_ACCEL_DC_CUT", "1")),
)
# non-uniform refresh placement (DeepCache §4.2; same cost): a fraction in
# [0,1] centers the refreshes there; empty = uniform. Applied to the
# accelerated config only (the faithful config stays paper-default uniform).
_ACCEL_DC_CENTER = os.environ.get("CFLEARN_BENCH_ACCEL_DC_CENTER", "")
ACCEL_DC_CENTER = float(_ACCEL_DC_CENTER) if _ACCEL_DC_CENTER else None

# skip configs (for sweeps / quick reruns) — skipped metrics emit null
SKIP_LOSSLESS = os.environ.get("CFLEARN_BENCH_SKIP_LOSSLESS", "0") == "1"
SKIP_FAITHFUL = os.environ.get("CFLEARN_BENCH_SKIP_FAITHFUL", "0") == "1"
SKIP_ACCELERATED = os.environ.get("CFLEARN_BENCH_SKIP_ACCELERATED", "0") == "1"


def build_sd():
    from cflearn_tpu.modules.multimodal.diffusion.ldm import StableDiffusion

    model = StableDiffusion(version="v1", rngs=nnx.Rngs(0))
    # bf16 params (schedule buffers stay f32)
    params = nnx.state(model, nnx.Param)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        params,
    )
    nnx.update(model, params)
    return model


def configure(model, config: str) -> dict:
    """Set the lever state on `model` for `config` in
    {"lossless", "faithful", "accelerated"}; returns the sampler config."""
    from cflearn_tpu.modules.core.mixed_stacks import SpatialTransformer

    lossless = config == "lossless"
    tome = 0.0 if lossless else TOME_RATIO
    for _, module in nnx.iter_graph(model):
        if isinstance(module, SpatialTransformer):
            module.set_tome_ratio(tome)
    dc_interval, dc_cut = ACCEL_DC if config == "accelerated" else FAITHFUL_DC
    if lossless or dc_interval <= 1:
        model.deepcache_interval = None
        model.deepcache_center = None
    else:
        model.deepcache_interval = dc_interval
        model.deepcache_cut = dc_cut
        model.deepcache_center = ACCEL_DC_CENTER if config == "accelerated" else None
    # every published config keeps the exact guidance trajectory (full CFG
    # every step); GI-CFG is opt-in via CFLEARN_BENCH_GI_CFG=1
    if config == "accelerated" and USE_GI_CFG:
        return {"guidance_interval": GUIDANCE_INTERVAL}
    return {}


def measure(model, config: str, latent_hw: int = 64) -> float:
    """Throughput of one serving config; `latent_hw` = image_px / 8
    (64 → the 512px headline; scripts/bench_shapes.py sweeps 32/96)."""
    from cflearn_tpu.modules.multimodal.diffusion.samplers import ISampler

    sampler_config = configure(model, config)
    graphdef, state = nnx.split(model)

    tokens = jnp.asarray(np.random.randint(0, 49000, (BATCH, 77)), dtype=jnp.int32)
    uncond_tokens = jnp.zeros((BATCH, 77), dtype=jnp.int32)

    def txt2img(st, tokens, uncond_tokens, key):
        m = nnx.merge(graphdef, st)
        # one batched text-encoder call for cond + uncond
        both = m.get_cond(jnp.concatenate([tokens, uncond_tokens], axis=0))
        cond, uncond = jnp.split(both, 2, axis=0)
        sampler = ISampler.make("ddim", {"model": m, **sampler_config})
        z = jax.random.normal(key, (BATCH, latent_hw, latent_hw, 4), dtype=jnp.float32)
        latents = sampler.sample(
            z, cond=cond, uncond=uncond, guidance_scale=GUIDANCE,
            num_steps=NUM_STEPS, key=key,
        )
        images = m.decode(latents)
        # uint8 on device: the host pull through the axon tunnel (~20MB/s)
        # must move 1 byte/px, not 4 — the conversion is part of the real
        # pipeline anyway (the API returns uint8 images)
        return ((jnp.clip(images, -1.0, 1.0) + 1.0) * 127.5).astype(jnp.uint8)

    fn = jax.jit(txt2img)

    key = jax.random.PRNGKey(0)
    t0 = time.time()
    # np.asarray forces full materialization — through the axon tunnel,
    # block_until_ready alone can return before execution completes
    np.asarray(fn(state, tokens, uncond_tokens, key))
    compile_time = time.time() - t0

    # timed runs: two measurement windows, best wins (the shared tunnel adds
    # ±7% run-to-run noise; throughput = sustained best). Protocol (r5):
    # EVERY window output is materialized on host — real serving semantics,
    # stronger than the old last-output-only pull — with the device→host
    # copies started async so they overlap the next iterations' compute the
    # way a serving loop double-buffers; only the final image's copy is a
    # tail. 10-iteration windows amortize that tail the way any sustained-
    # throughput estimate must (measured r5: copies overlap all but the
    # last ~0.16 s; scalar-pull device throughput and this protocol agree
    # to ~2%, see docs/performance.md "Measurement gotchas").
    num_iters = 10
    images_per_sec = 0.0
    for window in range(2):
        t0 = time.time()
        outs = []
        for i in range(num_iters):
            out = fn(state, tokens, uncond_tokens, jax.random.PRNGKey(window * 100 + i + 1))
            try:
                out.copy_to_host_async()
            except AttributeError:  # non-jax array types: np.asarray below syncs
                pass
            outs.append(out)
        for out in outs:
            np.asarray(out)
        elapsed = time.time() - t0
        images_per_sec = max(images_per_sec, BATCH * num_iters / elapsed)
    return images_per_sec


def main() -> None:
    model = build_sd()
    accelerated = None if SKIP_ACCELERATED else measure(model, "accelerated")
    faithful = None if SKIP_FAITHFUL else measure(model, "faithful")
    lossless = None if SKIP_LOSSLESS else measure(model, "lossless")

    def _r(x):
        return None if x is None else round(x, 4)

    def _vs(x):
        return None if x is None else round(x / A100_ANCHOR_IMAGES_PER_SEC, 4)

    result = {
        "metric": "sd15_512px_txt2img_images_per_sec_per_chip",
        "value": _r(accelerated),
        "unit": "images/sec",
        "vs_baseline": _vs(accelerated),
        "value_faithful": _r(faithful),
        "vs_baseline_faithful": _vs(faithful),
        "value_lossless": _r(lossless),
        "vs_baseline_lossless": _vs(lossless),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
