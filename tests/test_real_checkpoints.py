"""Network-gated REAL-checkpoint conversion parity (VERDICT r2 item 5).

BASELINE.md's quality clause requires fp32-tolerance output parity for
CONVERTED checkpoints (SD, CLIP, ESRGAN) — something the synthetic
round-trips in tests/test_convert.py cannot prove for real published
weights. These tests run the actual `pretrained=True` zoo path end-to-end
and compare against an independent implementation (HF `transformers`)
loading the SAME weights, so no golden activation files are needed.

Gating: this environment is zero-egress, so each test SKIPS unless its
checkpoint already sits in the download cache, or `CFLEARN_ALLOW_DOWNLOADS=1`
is set (the first network-enabled run executes everything here; reference
conversion semantics being validated: `/root/reference/cflearn/scripts/sd.py:272-332`).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

_ALLOW = os.environ.get("CFLEARN_ALLOW_DOWNLOADS", "0") == "1"


def _require_checkpoint(entry: str) -> None:
    """Skip unless `entry` is cached or downloads are explicitly allowed."""
    from cflearn_tpu.toolkit.misc import get_download_cache_dir
    from cflearn_tpu.zoo.common import resolve_download

    info = resolve_download(entry)
    fname = info.get("name") or info["url"].split("/")[-1]
    cached = (get_download_cache_dir() / fname).is_file()
    if not cached and not _ALLOW:
        pytest.skip(
            f"checkpoint '{entry}' not cached and CFLEARN_ALLOW_DOWNLOADS!=1 "
            "(zero-egress environment)"
        )


def test_clip_vit_b32_real_weights_parity() -> None:
    """zoo `clip(pretrained=True)` vs HF transformers on the same published
    ViT-B/32 weights: image and text embeddings match to fp32 tolerance."""
    _require_checkpoint("clip_vit_b32")
    transformers = pytest.importorskip("transformers")
    import torch

    import cflearn_tpu.zoo as zoo

    ours = zoo.clip(pretrained=True)
    hf = transformers.CLIPModel.from_pretrained("openai/clip-vit-base-patch32").eval()

    rng = np.random.default_rng(0)
    # pre-normalized pixel tensor (bypasses PIL preprocessing on both sides)
    pixels = rng.normal(size=(2, 3, 224, 224)).astype(np.float32).clip(-2, 2)
    tokens = rng.integers(0, 49000, (2, 77)).astype(np.int64)
    tokens[:, 0] = 49406  # BOS
    tokens[:, -1] = 49407  # EOS
    with torch.no_grad():
        hf_img = hf.get_image_features(pixel_values=torch.from_numpy(pixels)).numpy()
        hf_txt = hf.get_text_features(input_ids=torch.from_numpy(tokens)).numpy()

    our_img = np.asarray(
        ours.encode_image(jnp.asarray(pixels.transpose(0, 2, 3, 1)), normalize=False)
    )
    our_txt = np.asarray(ours.encode_text(jnp.asarray(tokens), normalize=False))
    np.testing.assert_allclose(our_img, hf_img, atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(our_txt, hf_txt, atol=1e-3, rtol=1e-3)


def test_sd_v15_real_weights() -> None:
    """Convert the published SD-1.5 checkpoint through the zoo path:
    - every checkpoint tensor must be consumed (strict conversion),
    - our text encoder (from the SD checkpoint) must match HF transformers'
      clip-vit-large-patch14 text tower — SD v1.5 ships that exact model,
      so this is real cross-framework parity on real weights,
    - the VAE must reconstruct (encode→decode) a smooth image to high PSNR,
    - a UNet eps prediction must be finite and deterministic."""
    _require_checkpoint("sd_v1.5")
    import cflearn_tpu.zoo as zoo

    sd = zoo.load_sd("v1", pretrained=True)

    # text-encoder parity vs an independent implementation of the same weights
    try:
        import torch
        from transformers import CLIPTextModel

        hf_text = CLIPTextModel.from_pretrained("openai/clip-vit-large-patch14").eval()
    except Exception:  # noqa: BLE001 — HF hub unreachable: skip just this leg
        hf_text = None
    rng = np.random.default_rng(1)
    tokens = rng.integers(0, 49000, (2, 77)).astype(np.int64)
    tokens[:, 0] = 49406
    tokens[:, -1] = 49407
    if hf_text is not None:
        with torch.no_grad():
            hf_out = hf_text(torch.from_numpy(tokens)).last_hidden_state.numpy()
        ours = np.asarray(sd.condition_model(jnp.asarray(tokens)))
        np.testing.assert_allclose(ours, hf_out, atol=1e-3, rtol=1e-3)

    # VAE: encode->decode of a smooth image reconstructs well on real weights
    yy, xx = np.mgrid[0:256, 0:256] / 255.0
    img = np.stack([yy, xx, (yy + xx) / 2], -1)[None].astype(np.float32) * 2 - 1
    z = sd.encode_first_stage(jnp.asarray(img))
    rec = np.asarray(sd.decode_first_stage(z))
    mse = float(np.mean((rec - img) ** 2))
    psnr = 10 * np.log10(4.0 / mse)
    assert psnr > 20.0, psnr

    # UNet: eps on fixed inputs is finite + deterministic
    lat = jnp.asarray(rng.normal(size=(1, 32, 32, 4)).astype(np.float32))
    t = jnp.full((1,), 500)
    cond = sd.get_cond(jnp.asarray(tokens[:1]))
    eps1 = np.asarray(sd.denoise(lat, t, cond))
    eps2 = np.asarray(sd.denoise(lat, t, cond))
    assert np.isfinite(eps1).all()
    np.testing.assert_array_equal(eps1, eps2)


def test_esrgan_real_weights() -> None:
    """RealESRGAN x4: real weights upscale a natural-statistics image with
    finite, in-range output and 4x spatial growth."""
    _require_checkpoint("esr")
    import cflearn_tpu.zoo as zoo

    m = zoo.esr(pretrained=True)
    rng = np.random.default_rng(2)
    x = rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32)
    y = np.asarray(m(jnp.asarray(x)))
    assert y.shape == (1, 128, 128, 3)
    assert np.isfinite(y).all()
    # a real SR net keeps outputs in the displayable range for in-range input
    assert y.min() > -0.5 and y.max() < 1.5


def test_clip_score_north_star_on_real_weights() -> None:
    """BASELINE.md's quality clause, measured: CLIP-score (Hessel et al.
    2021 / torchmetrics convention, `toolkit.quality.clip_score`) of real
    SD-1.5 samples against their prompts with a pretrained ViT-B/32 scorer.

    Checks, on the first egress-enabled run:
    - matched (image, prompt) pairs outscore deliberately shuffled pairs —
      the scorer actually measures image-text alignment, and the generated
      images actually follow their prompts;
    - the absolute matched score clears 22, a loose floor ~ the published
      SD-1.5 ballpark (diffusers reports ~0.26-0.31 cosine => 26-31 in the
      x100 convention) that a broken conversion cannot pass."""
    _require_checkpoint("sd_v1.5")
    _require_checkpoint("clip_vit_b32")
    import cflearn_tpu.zoo as zoo
    from cflearn_tpu.api.multimodal.clip import CLIPExtractor
    from cflearn_tpu.modules.multimodal.diffusion.samplers import ISampler
    from cflearn_tpu.modules.nlp.tokenizers import CLIPTokenizer
    from cflearn_tpu.toolkit.quality import clip_score
    from flax import nnx

    sd = zoo.load_sd("v1", pretrained=True)
    prompts = [
        "a photograph of an astronaut riding a horse",
        "a red sports car driving through the desert",
    ]
    tokenizer = CLIPTokenizer()
    tokens = jnp.asarray(tokenizer.tokenize(prompts), jnp.int32)
    uncond = jnp.asarray(tokenizer.tokenize([""] * len(prompts)), jnp.int32)

    graphdef, state = nnx.split(sd)

    def txt2img(st, tokens, uncond, key):
        m = nnx.merge(graphdef, st)
        both = m.get_cond(jnp.concatenate([tokens, uncond], axis=0))
        cond, uc = jnp.split(both, 2, axis=0)
        sampler = ISampler.make("ddim", {"model": m})
        z = jax.random.normal(key, (len(prompts), 64, 64, 4), jnp.float32)
        latents = sampler.sample(
            z, cond=cond, uncond=uc, guidance_scale=7.5, num_steps=20, key=key
        )
        images = m.decode(latents)
        return ((jnp.clip(images, -1.0, 1.0) + 1.0) * 127.5).astype(jnp.uint8)

    images = np.asarray(jax.jit(txt2img)(state, tokens, uncond, jax.random.PRNGKey(0)))

    ex = CLIPExtractor.from_zoo(pretrained=True)
    matched = clip_score(images, prompts, extractor=ex)
    shuffled = clip_score(images, prompts[::-1], extractor=ex)
    assert matched > shuffled, (matched, shuffled)
    assert matched > 22.0, matched
