"""Secondary BASELINE.md metrics: CLIP image-embeds/sec and p50 txt2img
latency. Run on the real chip: `python scripts/bench_secondary.py`.

(The driver's contract metric stays bench.py's single JSON line; these are
the additional metrics BASELINE.json names.)
"""

from functools import partial

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


def main() -> None:
    results = {}

    # ---- CLIP ViT-B/32 image embeds/sec (bf16, batch 64)
    from cflearn_tpu.modules.common import build_module

    clip = build_module("clip", config={}, rngs=nnx.Rngs(0))
    params = nnx.state(clip, nnx.Param)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        params,
    )
    nnx.update(clip, params)
    gd, st = nnx.split(clip)
    B = 256
    images = jax.random.normal(jax.random.PRNGKey(0), (B, 224, 224, 3), jnp.bfloat16)

    # scan the iterations inside ONE jit: the axon tunnel adds ~2.1 ms per
    # dispatch, which at ~7 ms/batch would tax the measurement ~30%
    iters = 10

    @jax.jit
    def embed_scan(st, images):
        m = nnx.merge(gd, st)

        def body(carry, _):
            e = m.encode_image(images + carry.astype(images.dtype))
            return e.mean(), e

        last, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return last

    _sync(embed_scan(st, images))
    t0 = time.time()
    _sync(embed_scan(st, images))
    dt = time.time() - t0
    results["clip_vit_b32_image_embeds_per_sec"] = round(B * iters / dt, 1)

    # ---- ESRGAN (RRDBNet) 4x super-resolution, 128px -> 512px, bf16
    from cflearn_tpu.modules.common import build_module as _bm

    rrdb = _bm("rrdb", config={}, rngs=nnx.Rngs(0))
    rparams = nnx.state(rrdb, nnx.Param)
    rparams = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        rparams,
    )
    nnx.update(rrdb, rparams)
    gd_r, st_r = nnx.split(rrdb)
    lr = jax.random.normal(jax.random.PRNGKey(0), (4, 128, 128, 3), jnp.bfloat16)

    @jax.jit
    def upscale(st, lr):
        m = nnx.merge(gd_r, st)
        return m(lr)

    _sync(upscale(st_r, lr))
    t0 = time.time()
    out = None
    for _ in range(8):
        out = upscale(st_r, lr)
    _sync(out)
    results["esrgan_4x_128to512_images_per_sec"] = round(4 * 8 / (time.time() - t0), 2)

    # ---- p50 txt2img end-to-end latency (single prompt, B=1)
    from cflearn_tpu.modules.core.mixed_stacks import SpatialTransformer
    from cflearn_tpu.modules.multimodal.diffusion.ldm import StableDiffusion
    from cflearn_tpu.modules.multimodal.diffusion.samplers import ISampler

    sd = StableDiffusion(version="v1", rngs=nnx.Rngs(0))
    params = nnx.state(sd, nnx.Param)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        params,
    )
    nnx.update(sd, params)
    for _, module in nnx.iter_graph(sd):
        if isinstance(module, SpatialTransformer):
            module.set_tome_ratio(0.5)
    # same serving config as bench.py (DeepCache N=3 at the shallowest branch)
    if int(os.environ.get("CFLEARN_BENCH_DC_INTERVAL", "3")) > 1:
        sd.deepcache_interval = int(os.environ.get("CFLEARN_BENCH_DC_INTERVAL", "3"))
        sd.deepcache_cut = int(os.environ.get("CFLEARN_BENCH_DC_CUT", "1"))
    gd2, st2 = nnx.split(sd)
    tokens = jnp.asarray(np.random.randint(0, 49000, (1, 77)), jnp.int32)
    uncond = jnp.zeros((1, 77), jnp.int32)

    @jax.jit
    def txt2img(st, tokens, uncond, key):
        m = nnx.merge(gd2, st)
        both = m.get_cond(jnp.concatenate([tokens, uncond], axis=0))
        cond, unc = jnp.split(both, 2, axis=0)
        # same serving config as bench.py (ToMe 0.5 + guidance-interval CFG)
        sampler = ISampler.make(
            "ddim", {"model": m, "guidance_interval": (0.25, 0.70)}
        )
        z = jax.random.normal(key, (1, 64, 64, 4), jnp.float32)
        latents = sampler.sample(z, cond=cond, uncond=unc, guidance_scale=7.5, num_steps=20, key=key)
        images = m.decode(latents)
        return ((jnp.clip(images, -1, 1) + 1) * 127.5).astype(jnp.uint8)

    np.asarray(txt2img(st2, tokens, uncond, jax.random.PRNGKey(0)))  # compile
    lats = []
    for i in range(9):
        t0 = time.time()
        np.asarray(txt2img(st2, tokens, uncond, jax.random.PRNGKey(i + 1)))
        lats.append(time.time() - t0)
    results["txt2img_p50_latency_ms"] = round(sorted(lats)[len(lats) // 2] * 1e3, 1)

    # ---- SD-1.5 UNet finetune training throughput (the training story:
    # flash-attention fwd+bwd Pallas kernels + remat; f32 master params,
    # bf16 compute, AdamW). Latents 64x64x4 (512px images), precomputed
    # text cond — the standard SD finetune workload shape.
    import optax

    from cflearn_tpu.modules.multimodal.diffusion.unet import UNetDiffuser

    unet = UNetDiffuser(use_checkpoint=True, rngs=nnx.Rngs(0))
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
    TB = 4
    T = 1000
    betas = np.linspace(1e-4, 2e-2, T, dtype=np.float64)
    acp = jnp.asarray(np.cumprod(1.0 - betas), jnp.float32)
    latents = jax.random.normal(jax.random.PRNGKey(1), (TB, 64, 64, 4), jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (TB, 77, 768), jnp.float32)

    def _bf16(tree):
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if jnp.issubdtype(x.dtype, jnp.floating) else x,
            tree,
        )

    # donate params + optimizer state so XLA updates them in place
    @partial(jax.jit, donate_argnums=(0, 1))
    def train_step(uparams, opt_state, latents, ctx, key):
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
        return optax.apply_updates(uparams, updates), opt_state, loss

    uparams, opt_state, loss = train_step(uparams, opt_state, latents, ctx, jax.random.PRNGKey(3))
    float(loss)  # compile + sync
    t0 = time.time()
    iters = 10
    for i in range(iters):
        uparams, opt_state, loss = train_step(
            uparams, opt_state, latents, ctx, jax.random.PRNGKey(i + 4)
        )
    float(loss)
    results["sd15_unet_train_images_per_sec"] = round(TB * iters / (time.time() - t0), 2)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
