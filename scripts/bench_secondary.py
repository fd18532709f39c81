"""Secondary BASELINE.md metrics: CLIP image-embeds/sec, ESRGAN upscaling,
p50 txt2img latency, and SD-1.5 UNet finetune throughput. Run on the real
chip: `python scripts/bench_secondary.py`.

(The driver's contract metric stays bench.py's single JSON line; these are
the additional metrics BASELINE.json names.)

Each metric runs inside its own function so the section's model params and
activations are freed before the next section builds — the 860M-param UNet
finetune (B=8, no remat) needs nearly the whole 16GB chip and OOMs if the
CLIP/SD/ESRGAN buffers from earlier sections are still resident.
"""

from functools import partial

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/cflearn_tpu/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import jax.numpy as jnp
import numpy as np
from flax import nnx


def _sync(out):
    return float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))


def _bf16(tree):
    return jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        tree,
    )


def clip_embeds_per_sec() -> float:
    """CLIP ViT-B/32 image embeds/sec (bf16, batch 256)."""
    from cflearn_tpu.modules.common import build_module

    clip = build_module("clip", config={}, rngs=nnx.Rngs(0))
    nnx.update(clip, _bf16(nnx.state(clip, nnx.Param)))
    gd, st = nnx.split(clip)
    B = 256
    images = jax.random.normal(jax.random.PRNGKey(0), (B, 224, 224, 3), jnp.bfloat16)

    # scan the iterations inside ONE jit: the axon tunnel adds ~24 ms per
    # dispatch (r4 measured), which at ~7 ms/batch would dominate — scan
    # x100 per the round-4 protocol (docs/performance.md "Measurement
    # gotchas") so the single dispatch amortizes to <4%
    iters = 100

    @jax.jit
    def embed_scan(st, images):
        m = nnx.merge(gd, st)

        def body(carry, _):
            e = m.encode_image(images + carry.astype(images.dtype))
            return e.mean().astype(jnp.float32), e

        last, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return last

    _sync(embed_scan(st, images))
    t0 = time.time()
    _sync(embed_scan(st, images))
    return round(B * iters / (time.time() - t0), 1)


def esrgan_images_per_sec() -> float:
    """ESRGAN (RRDBNet) 4x super-resolution, 128px -> 512px, bf16."""
    from cflearn_tpu.modules.common import build_module

    rrdb = build_module("rrdb", config={}, rngs=nnx.Rngs(0))
    nnx.update(rrdb, _bf16(nnx.state(rrdb, nnx.Param)))
    gd_r, st_r = nnx.split(rrdb)
    B = 4
    lr = jax.random.normal(jax.random.PRNGKey(0), (B, 128, 128, 3), jnp.bfloat16)
    iters = 32

    @jax.jit
    def upscale_scan(st, lr):
        m = nnx.merge(gd_r, st)

        def body(carry, _):
            out = m(lr + carry.astype(lr.dtype))
            return out.mean().astype(jnp.float32), None

        last, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return last

    _sync(upscale_scan(st_r, lr))
    t0 = time.time()
    _sync(upscale_scan(st_r, lr))
    return round(B * iters / (time.time() - t0), 2)


def txt2img_p50_latency_ms() -> float:
    """p50 end-to-end txt2img latency, single prompt (B=1), bench.py's
    default accelerated serving config (ToMe 0.5 + DeepCache N=5/cut=1,
    full CFG — see bench.py / docs/frontier_sd15.json)."""
    from cflearn_tpu.modules.core.mixed_stacks import SpatialTransformer
    from cflearn_tpu.modules.multimodal.diffusion.ldm import StableDiffusion
    from cflearn_tpu.modules.multimodal.diffusion.samplers import ISampler

    sd = StableDiffusion(version="v1", rngs=nnx.Rngs(0))
    nnx.update(sd, _bf16(nnx.state(sd, nnx.Param)))
    for _, module in nnx.iter_graph(sd):
        if isinstance(module, SpatialTransformer):
            module.set_tome_ratio(0.5)
    dc = int(os.environ.get("CFLEARN_BENCH_ACCEL_DC_INTERVAL", "5"))
    if dc > 1:
        sd.deepcache_interval = dc
        sd.deepcache_cut = int(os.environ.get("CFLEARN_BENCH_ACCEL_DC_CUT", "1"))
        # mirror bench.py's configure() exactly — incl. the non-uniform
        # refresh placement, else a center sweep would silently measure
        # latency with the uniform schedule
        center = os.environ.get("CFLEARN_BENCH_ACCEL_DC_CENTER", "")
        sd.deepcache_center = float(center) if center else None
    gd2, st2 = nnx.split(sd)
    tokens = jnp.asarray(np.random.randint(0, 49000, (1, 77)), jnp.int32)
    uncond = jnp.zeros((1, 77), jnp.int32)

    @jax.jit
    def txt2img(st, tokens, uncond, key):
        m = nnx.merge(gd2, st)
        both = m.get_cond(jnp.concatenate([tokens, uncond], axis=0))
        cond, unc = jnp.split(both, 2, axis=0)
        sampler = ISampler.make("ddim", {"model": m})
        z = jax.random.normal(key, (1, 64, 64, 4), jnp.float32)
        latents = sampler.sample(
            z, cond=cond, uncond=unc, guidance_scale=7.5, num_steps=20, key=key
        )
        images = m.decode(latents)
        return ((jnp.clip(images, -1, 1) + 1) * 127.5).astype(jnp.uint8)

    np.asarray(txt2img(st2, tokens, uncond, jax.random.PRNGKey(0)))  # compile
    lats = []
    for i in range(9):
        t0 = time.time()
        np.asarray(txt2img(st2, tokens, uncond, jax.random.PRNGKey(i + 1)))
        lats.append(time.time() - t0)
    return round(sorted(lats)[len(lats) // 2] * 1e3, 1)


def unet_finetune_images_per_sec() -> float:
    """SD-1.5 UNet finetune training throughput (the training story:
    flash-attention fwd+bwd Pallas kernels; f32 master params, bf16
    compute, AdamW). Latents 64x64x4 (512px images), precomputed text
    cond — the standard SD finetune workload shape."""
    import optax

    from cflearn_tpu.modules.multimodal.diffusion.unet import UNetDiffuser

    # tuned finetune config per docs/performance.md's training budget table:
    # B=8 with remat OFF (remat only pays at B>=16 on this chip; B=4+remat
    # measures ~19.6 img/s vs 25.3 here — same program, just the knobs)
    unet = UNetDiffuser(use_checkpoint=False, rngs=nnx.Rngs(0))
    # de-zero the SD-parity zero-init convs (conv_out etc.) so gradients
    # flow through the whole net from step 1 (see CLAUDE.md gotcha)
    zkey = jax.random.PRNGKey(7)
    zp = nnx.state(unet, nnx.Param)
    leaves, tdef = jax.tree_util.tree_flatten(zp)
    zkeys = jax.random.split(zkey, len(leaves))
    leaves = [
        jax.random.normal(k, x.shape, x.dtype) * 0.02
        if hasattr(x, "shape") and x.ndim > 0 and float(jnp.max(jnp.abs(x))) == 0.0
        else x
        for k, x in zip(zkeys, leaves)
    ]
    nnx.update(unet, jax.tree_util.tree_unflatten(tdef, leaves))
    gd_u, uparams, urest = nnx.split(unet, nnx.Param, ...)
    # bf16 first moment: the 860M-param UNet's f32 AdamW state does not fit
    # a 16GB chip alongside grads + activations (m in bf16 is the standard
    # memory-reduced Adam; v stays f32 for scale stability)
    tx = optax.adamw(1e-5, mu_dtype=jnp.bfloat16)
    opt_state = tx.init(uparams)
    TB = 8
    T = 1000
    betas = np.linspace(1e-4, 2e-2, T, dtype=np.float64)
    acp = jnp.asarray(np.cumprod(1.0 - betas), jnp.float32)
    latents = jax.random.normal(jax.random.PRNGKey(1), (TB, 64, 64, 4), jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (TB, 77, 768), jnp.float32)

    # ALL `iters` steps inside one jitted lax.scan so the tunnel's ~24 ms
    # per-dispatch overhead (r4) is paid once, not per step; params +
    # optimizer state donate at the outer jit and thread through the carry
    # (the r3 number, 25.3, was measured call-per-step under the then-2.1 ms
    # tunnel — scan is the honest device-time protocol now)
    iters = 10

    @partial(jax.jit, donate_argnums=(0, 1), static_argnames=("n",))
    def train_steps(uparams, opt_state, latents, ctx, key, n):
        def step(carry, key):
            uparams, opt_state = carry
            t_key, n_key = jax.random.split(key)
            t = jax.random.randint(t_key, (TB,), 0, T)
            eps = jax.random.normal(n_key, latents.shape, jnp.float32)
            a = acp[t][:, None, None, None]
            x_t = jnp.sqrt(a) * latents + jnp.sqrt(1.0 - a) * eps

            def loss_fn(p):
                m = nnx.merge(gd_u, _bf16(p), urest)
                pred = m(x_t.astype(jnp.bfloat16), t, ctx.astype(jnp.bfloat16))
                return jnp.mean((pred.astype(jnp.float32) - eps) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(uparams)
            updates, opt_state = tx.update(grads, opt_state, uparams)
            return (optax.apply_updates(uparams, updates), opt_state), loss

        (uparams, opt_state), losses = jax.lax.scan(
            step, (uparams, opt_state), jax.random.split(key, n)
        )
        return uparams, opt_state, losses[-1]

    uparams, opt_state, loss = train_steps(
        uparams, opt_state, latents, ctx, jax.random.PRNGKey(3), iters
    )
    float(loss)  # compile + sync
    t0 = time.time()
    uparams, opt_state, loss = train_steps(
        uparams, opt_state, latents, ctx, jax.random.PRNGKey(4), iters
    )
    float(loss)
    return round(TB * iters / (time.time() - t0), 2)


def main() -> None:
    sections = [
        ("clip_vit_b32_image_embeds_per_sec", clip_embeds_per_sec),
        ("esrgan_4x_128to512_images_per_sec", esrgan_images_per_sec),
        ("txt2img_p50_latency_ms", txt2img_p50_latency_ms),
        ("sd15_unet_train_images_per_sec", unet_finetune_images_per_sec),
    ]
    results = {}
    for name, fn in sections:
        results[name] = fn()
        print(f"# {name} = {results[name]}", file=sys.stderr, flush=True)
        # drop the section's device buffers before the next section builds
        gc.collect()
    print(json.dumps(results))


if __name__ == "__main__":
    main()
