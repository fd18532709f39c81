"""DiffusionAPI end-to-end flows on a tiny LDM (reference analogue: the
examples-driven diffusion tests)."""

import numpy as np
import pytest
from flax import nnx

from cflearn_tpu.api.multimodal.diffusion import ControlledDiffusionAPI, DiffusionAPI
from cflearn_tpu.modules.multimodal.diffusion.cond_models import CLIPTextConditionModel
from cflearn_tpu.modules.multimodal.diffusion.ldm import LDM
from cflearn_tpu.modules.multimodal.diffusion.unet import ControlNet


pytestmark = pytest.mark.slow  # e2e DiffusionAPI flows compile many XLA programs


@pytest.fixture(scope="module")
def tiny_api() -> DiffusionAPI:
    rngs = nnx.Rngs(0)
    ldm = LDM(
        img_size=8,
        in_channels=4,
        out_channels=4,
        num_timesteps=50,
        condition_model=CLIPTextConditionModel(latent_dim=32, num_layers=1, num_heads=2, rngs=rngs),
        unet_config=dict(
            start_channels=32,
            num_res_blocks=1,
            channel_multipliers=(1, 2),
            attention_downsample_rates=(1,),
            num_heads=4,
            context_dim=32,
        ),
        first_stage_config=dict(
            img_size=64,
            inner_channels=32,
            z_channels=4,
            embedding_channels=4,
            channel_multipliers=[1, 2, 2, 2],
            num_res_blocks=1,
        ),
        rngs=rngs,
    )
    return DiffusionAPI(ldm)


def test_txt2img_deterministic(tiny_api) -> None:
    a = tiny_api.txt2img("a cat", size=(64, 64), num_steps=2, seed=7)
    b = tiny_api.txt2img("a cat", size=(64, 64), num_steps=2, seed=7)
    assert a.shape == (1, 64, 64, 3) and a.dtype == np.uint8
    np.testing.assert_array_equal(a, b)
    c = tiny_api.txt2img("a cat", size=(64, 64), num_steps=2, seed=8)
    assert not np.array_equal(a, c)


def test_img2img_and_inpainting(tiny_api) -> None:
    base = tiny_api.txt2img("x", size=(64, 64), num_steps=2, seed=0)
    i2i = tiny_api.img2img(base, cond="y", fidelity=0.5, num_steps=3, seed=1)
    assert i2i.shape == base.shape
    mask = np.zeros((64, 64))
    mask[16:48, 16:48] = 1
    inp = tiny_api.inpainting(base, mask, cond="z", num_steps=2, seed=2)
    assert inp.shape == base.shape


def test_txt2img_inpainting_options(tiny_api) -> None:
    """reference :768 — txt2img_inpainting front + keep_original paste,
    use_raw_inpainting (forced repaint), background guidance start."""
    rng = np.random.default_rng(2)
    canvas = rng.integers(0, 255, (1, 64, 64, 3), dtype=np.uint8)
    mask = np.zeros((64, 64), np.float32)
    mask[24:40, 24:40] = 1.0
    out = tiny_api.txt2img_inpainting("p", canvas, mask, num_steps=2, seed=1)
    assert out.shape == canvas.shape
    # keep_original without fade: unmasked pixels bit-identical
    kept = tiny_api.txt2img_inpainting(
        "p", canvas, mask, num_steps=2, seed=1, keep_original=True, keep_original_fade=0
    )
    np.testing.assert_array_equal(kept[0, :24], canvas[0, :24])
    np.testing.assert_array_equal(kept[0, 40:], canvas[0, 40:])
    assert not np.array_equal(kept[0, 24:40, 24:40], canvas[0, 24:40, 24:40])
    # keep_original with fade: far field still identical, band blends
    faded = tiny_api.txt2img_inpainting(
        "p", canvas, mask, num_steps=2, seed=1, keep_original=True, keep_original_fade=8
    )
    np.testing.assert_array_equal(faded[0, :16], canvas[0, :16])
    # raw inpainting and background guidance run (distinct jit variants)
    raw = tiny_api.txt2img_inpainting(
        "p", canvas, mask, num_steps=2, seed=1, use_raw_inpainting=True
    )
    bg = tiny_api.txt2img_inpainting(
        "p", canvas, mask, num_steps=3, seed=1,
        use_background_guidance=True, reference_fidelity=0.5,
    )
    assert raw.shape == canvas.shape and bg.shape == canvas.shape
    assert not np.array_equal(bg, out)


def test_masked_mode_inpainting(tiny_api) -> None:
    """MASKED mode (reference InpaintingSettings :392): crop to the padded
    mask bbox, diffuse at target resolution, feather-paste back — pixels
    outside the crop box must be untouched."""
    from cflearn_tpu.api.multimodal.diffusion import (
        InpaintingMode,
        InpaintingSettings,
        crop_masked_area,
    )

    rng = np.random.default_rng(0)
    canvas = rng.integers(0, 255, (1, 128, 128, 3), dtype=np.uint8)
    mask = np.zeros((128, 128), np.float32)
    mask[48:80, 48:80] = 1.0
    settings = InpaintingSettings(
        mode=InpaintingMode.MASKED,
        mask_padding=8,
        mask_blur=3,
        target_wh=64,
    )
    out = tiny_api.inpainting(
        canvas, mask, cond="m", num_steps=2, seed=3, inpainting_settings=settings
    )
    assert out.shape == canvas.shape and out.dtype == np.uint8
    # the crop box is [40, 88): everything outside must be bit-identical
    outside = np.ones((128, 128), bool)
    outside[40:88, 40:88] = False
    np.testing.assert_array_equal(out[0][outside], canvas[0][outside])
    # inside the mask core, content must have changed
    assert not np.array_equal(out[0, 56:72, 56:72], canvas[0, 56:72, 56:72])

    # crop geometry: box padded + aspect-corrected, target rounded to 64
    image_f = canvas.astype(np.float32) / 127.5 - 1.0
    crop = crop_masked_area(image_f, mask[None, :, :, None], settings)
    assert tuple(crop.box) == (40, 40, 88, 88)
    assert crop.wh == (64, 64)
    assert crop.image.shape == (1, 64, 64, 3)
    assert crop.mask.shape == (1, 64, 64, 1)


def test_style_reference_hooks(tiny_api) -> None:
    """setup_hooks style reference (reference :1341 + mixed_stacks :645):
    the WRITE/READ two-pass must steer txt2img, stay deterministic, and
    clear cleanly. The fixture's SD-parity zero-init conv_out makes eps
    conditioning-blind, so we de-zero it for this test."""
    import jax
    import jax.numpy as jnp

    conv_out = tiny_api.m.unet.conv_out
    backup = conv_out.kernel[...]
    conv_out.kernel[...] = 0.1 * jax.random.normal(jax.random.PRNGKey(42), backup.shape)
    try:
        base = tiny_api.txt2img("a cat", size=(64, 64), num_steps=2, seed=7)
        ref = np.random.default_rng(3).integers(0, 255, (64, 64, 3), dtype=np.uint8)
        tiny_api.setup_hooks(
            style_reference_image=ref,
            style_reference_states=dict(style_fidelity=0.3, reference_weight=1.0),
        )
        styled = tiny_api.txt2img("a cat", size=(64, 64), num_steps=2, seed=7)
        assert styled.shape == base.shape
        assert not np.array_equal(styled, base)
        styled2 = tiny_api.txt2img("a cat", size=(64, 64), num_steps=2, seed=7)
        np.testing.assert_array_equal(styled, styled2)
        # different reference image → different steer
        ref2 = np.random.default_rng(5).integers(0, 255, (64, 64, 3), dtype=np.uint8)
        tiny_api.setup_hooks(style_reference_image=ref2)
        assert not np.array_equal(
            tiny_api.txt2img("a cat", size=(64, 64), num_steps=2, seed=7), styled
        )
        # clearing restores the plain path
        tiny_api.setup_hooks()
        cleared = tiny_api.txt2img("a cat", size=(64, 64), num_steps=2, seed=7)
        np.testing.assert_array_equal(cleared, base)
    finally:
        tiny_api.setup_hooks()
        conv_out.kernel[...] = backup


def test_style_reference_write_gates() -> None:
    """Gate layout: widest blocks enable first (reference
    `before_unet_forward` sorts by channel width descending)."""
    from cflearn_tpu.modules.multimodal.diffusion.unet import (
        UNetDiffuser,
        style_reference_write_gates,
        walk_transformer_blocks,
    )
    from flax import nnx as _nnx

    unet = UNetDiffuser(
        start_channels=32,
        num_res_blocks=1,
        channel_multipliers=(1, 2),
        attention_downsample_rates=(1, 2),
        num_heads=4,
        context_dim=32,
        rngs=_nnx.Rngs(0),
    )
    blocks = walk_transformer_blocks(unet)
    widths = [int(b.norm1.num_features) for b in blocks]
    gates_half = style_reference_write_gates(unet, 0.5)
    assert len(gates_half) == len(blocks)
    # every enabled block is at least as wide as every disabled block
    on = [w for w, g in zip(widths, gates_half) if g]
    off = [w for w, g in zip(widths, gates_half) if not g]
    assert on and off and min(on) >= max(off)
    assert all(style_reference_write_gates(unet, 1.0))
    assert not any(style_reference_write_gates(unet, 0.0))


def test_sampler_switch_and_variations(tiny_api) -> None:
    tiny_api.switch_sampler("k_euler_a")
    out = tiny_api.txt2img("s", size=(64, 64), num_steps=2, seed=3)
    assert out.shape == (1, 64, 64, 3)
    tiny_api.switch_sampler("ddim")
    var = tiny_api.sample(1, cond="v", size=(64, 64), num_steps=2, seed=4, variations=[(9, 0.4)])
    assert var.shape == (1, 64, 64, 3)
    with pytest.raises(ValueError):
        tiny_api.switch_sampler("not_a_sampler")


def test_sample_kwargs_parity(tiny_api) -> None:
    """reference :455 — z injection, variation_seed/strength, batch_size
    chunking, callback, clip_skip, num_samples validation."""
    base = tiny_api.sample(2, cond="k", size=(64, 64), num_steps=2, seed=11)
    # batch_size chunking returns the full batch
    chunked = tiny_api.sample(2, cond="k", size=(64, 64), num_steps=2, seed=11, batch_size=1)
    assert chunked.shape == base.shape
    # direct z injection is deterministic regardless of seed-derived noise
    z = np.asarray(
        __import__("jax").random.normal(__import__("jax").random.PRNGKey(5), (1, 8, 8, 4))
    )
    a = tiny_api.sample(1, cond="k", size=(64, 64), num_steps=2, seed=1, z=z)
    b = tiny_api.sample(1, cond="k", size=(64, 64), num_steps=2, seed=1, z=z)
    np.testing.assert_array_equal(a, b)
    # variation pair mixes the noise → different image
    v = tiny_api.sample(1, cond="k", size=(64, 64), num_steps=2, seed=11,
                        variation_seed=4, variation_strength=0.5)
    assert not np.array_equal(v, base[:1])
    # callback sees float images pre-uint8
    seen = {}

    def cb(imgs: np.ndarray) -> np.ndarray:
        seen["dtype"] = imgs.dtype
        return imgs * 0.0

    black = tiny_api.sample(1, cond="k", size=(64, 64), num_steps=2, seed=11, callback=cb)
    assert seen["dtype"] == np.float32 and int(black.max()) == 127  # 0.0 → mid-gray
    with pytest.raises(ValueError):
        tiny_api.sample(3, cond=["a", "b"], size=(64, 64), num_steps=2)


def test_compile_prewarm_and_size_rounding(tiny_api) -> None:
    """reference `compile` (:1204) analogue + anchor-64 size rounding."""
    tiny_api.compile(num_samples=1, size=(64, 64), num_steps=2)
    out = tiny_api.txt2img("x", size=(60, 70), num_steps=2, seed=1)
    assert out.shape == (1, 64, 64, 3)


def test_fidelity_start_step_semantics() -> None:
    """Regression (code review): the formula was inverted. Reference
    `_q_sample` (:1568): fidelity 1 = keep the input (skip ~all steps),
    fidelity 0 = full regeneration (skip none)."""
    from cflearn_tpu.api.multimodal.diffusion import fidelity_start_step

    assert fidelity_start_step(0.0, 20) == 0  # regenerate: all 20 steps
    assert fidelity_start_step(1.0, 20) == 19  # keep: one step at most
    assert fidelity_start_step(0.2, 20) == 4  # default: 16 denoise steps
    assert fidelity_start_step(0.5, 20) == 10


def test_style_reference_with_guidance_interval(tiny_api) -> None:
    """Regression (code review): style-reference mixing used to crash at
    trace time inside guidance-interval segments (uncond_mask batch 2b vs
    segment batch b)."""
    ref = np.random.default_rng(3).integers(0, 255, (64, 64, 3), dtype=np.uint8)
    tiny_api.switch_sampler("ddim", guidance_interval=(0.25, 0.75))
    try:
        tiny_api.setup_hooks(
            style_reference_image=ref,
            style_reference_states=dict(style_fidelity=0.5),
        )
        out = tiny_api.txt2img("gi+style", size=(64, 64), num_steps=4, seed=0)
        assert out.shape == (1, 64, 64, 3)
    finally:
        tiny_api.setup_hooks()
        tiny_api.switch_sampler("ddim")


def test_lora_load_context_rebases_on_new_weights(tiny_api) -> None:
    """Regression (code review): re-applying LoRA after a weight load inside
    load_context used to fuse deltas onto the STALE base."""
    import jax
    import jax.numpy as jnp
    from cflearn_tpu.modules.core.lora import LoRAPack

    # find a kernel path LoRA can target: use to_q of the first block
    from cflearn_tpu.modules.multimodal.diffusion.unet import walk_transformer_blocks

    blk = walk_transformer_blocks(tiny_api.m.unet)[0]
    kernel = blk.attn1.to_q.kernel
    base0 = np.asarray(kernel[...])
    d_in, d_out = base0.shape
    from cflearn_tpu.toolkit.tree import tree_to_npd
    from flax import nnx as _nnx

    npd = tree_to_npd(_nnx.state(tiny_api.m, _nnx.Param))
    path = next(k for k, v in npd.items() if v.shape == base0.shape and np.allclose(v, base0))
    down = np.ones((d_in, 2), np.float32) * 0.1
    up = np.ones((2, d_out), np.float32) * 0.1
    pack = LoRAPack(deltas={path: (down, up)}, alpha=2.0, rank=2)
    tiny_api.load_sd_lora("t", pack=pack)
    tiny_api.inject_sd_lora("t")
    delta = pack.scale * (down @ up)
    np.testing.assert_allclose(np.asarray(kernel[...]), base0 + delta, rtol=1e-5)
    with tiny_api.load_context() as m:
        # replace the base weights wholesale inside the context
        kernel[...] = jnp.ones_like(kernel[...])
    # on exit the delta must sit on the NEW base, not the old one
    np.testing.assert_allclose(
        np.asarray(kernel[...]), np.ones_like(base0) + delta, rtol=1e-5
    )
    tiny_api.cleanup_sd_lora()
    np.testing.assert_allclose(np.asarray(kernel[...]), np.ones_like(base0), rtol=1e-5)


def test_tome(tiny_api) -> None:
    base = tiny_api.txt2img("t", size=(64, 64), num_steps=2, seed=5)
    tiny_api.set_tome_ratio(0.5)
    merged = tiny_api.txt2img("t", size=(64, 64), num_steps=2, seed=5)
    tiny_api.set_tome_ratio(0.0)
    assert merged.shape == base.shape
    # below compute_merge's min_tokens the merge is gated OFF → identical
    np.testing.assert_array_equal(base, merged)
    # at real token counts the merge is active and lossy
    import jax
    import jax.numpy as jnp

    from cflearn_tpu.modules.core.mixed_stacks import SpatialTransformer

    sp = SpatialTransformer(32, 4, 8, context_dim=32, rngs=nnx.Rngs(0))
    # 64x64 = 4096 tokens >= compute_merge's min_tokens (2048, the tomesd
    # max_downsample=1 gate) so the merge is active and lossy
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 32))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 32))
    a = sp(x, ctx)
    sp.set_tome_ratio(0.5)
    b = sp(x, ctx)
    assert not bool(jnp.allclose(a, b, atol=1e-5))
    # merge_mlp (tomesd option): FF also runs on merged tokens — differs
    # from attn-only merging and stays finite
    sp.set_tome_ratio(0.5, merge_mlp=True)
    c = sp(x, ctx)
    assert not bool(jnp.allclose(b, c, atol=1e-5))
    assert bool(jnp.isfinite(c).all())


def test_controlled_api(tiny_api) -> None:
    control = ControlNet(
        hint_channels=3,
        in_channels=4,
        start_channels=32,
        num_res_blocks=1,
        channel_multipliers=(1, 2),
        attention_downsample_rates=(1,),
        num_heads=4,
        context_dim=32,
        rngs=nnx.Rngs(1),
    )
    api = ControlledDiffusionAPI(tiny_api.m)
    api.prepare_control("canny", control)
    hint = (np.random.rand(64, 64, 3) * 255).astype(np.uint8)
    edges = api.get_hint_of("canny", hint)
    out = api.sample_with_control(1, {"canny": edges}, cond="c", size=(64, 64), num_steps=2, seed=0)
    assert out.shape == (1, 64, 64, 3)
    api.switch_control()  # drop all
    with pytest.raises(ValueError):
        api.sample_with_control(1, {"canny": edges}, size=(64, 64), num_steps=2)


def test_mesh_sharded_serving(tiny_api) -> None:
    """Multi-chip serving: `use_mesh` shards batches over the data axis and
    places params (TP over `model` where divisible). Sharded txt2img must
    run on the 8-virtual-device mesh and match the single-device output
    (replicated params, deterministic sampler)."""
    import jax
    from jax.sharding import Mesh

    base = tiny_api.txt2img(["a", "b", "c", "d"], size=(64, 64), num_steps=2, seed=5)
    devices = np.asarray(jax.devices()[:4]).reshape(4, 1)
    mesh = Mesh(devices, ("data", "model"))
    try:
        tiny_api.use_mesh(mesh)
        sharded = tiny_api.txt2img(["a", "b", "c", "d"], size=(64, 64), num_steps=2, seed=5)
        np.testing.assert_allclose(
            sharded.astype(np.int16), base.astype(np.int16), atol=1
        )
        # data x model mesh with TP params also runs end to end
        mesh2 = Mesh(np.asarray(jax.devices()[:4]).reshape(2, 2), ("data", "model"))
        tiny_api.use_mesh(mesh2)
        tp_out = tiny_api.txt2img(["a", "b"], size=(64, 64), num_steps=2, seed=5)
        assert tp_out.shape == (2, 64, 64, 3)
    finally:
        tiny_api.use_mesh(None)
    single = tiny_api.txt2img(["a", "b", "c", "d"], size=(64, 64), num_steps=2, seed=5)
    np.testing.assert_array_equal(single, base)


def test_control_gating_non_ddim_samplers(tiny_api) -> None:
    """Regression (code review): control hint start/end gating used to crash
    every non-ddim sampler with a TypeError on `control_gates`. Now every
    registered sampler threads gates (klms/k_heun via segment-safe
    integration with threaded multistep history)."""
    import jax

    def make_cn(seed):
        cn = ControlNet(
            hint_channels=3,
            in_channels=4,
            start_channels=32,
            num_res_blocks=1,
            channel_multipliers=(1, 2),
            attention_downsample_rates=(1,),
            num_heads=4,
            context_dim=32,
            rngs=nnx.Rngs(seed),
        )
        for i, conv in enumerate(list(cn.zero_convs) + [cn.mid_zero]):
            k = conv.kernel[...]
            conv.kernel[...] = 0.02 * jax.random.normal(jax.random.PRNGKey(seed * 100 + i), k.shape, k.dtype)
        return cn

    api = ControlledDiffusionAPI(tiny_api.m)
    api.prepare_control("canny", make_cn(1))
    conv_out = tiny_api.m.unet.conv_out
    backup = conv_out.kernel[...]
    try:
        conv_out.kernel[...] = 0.05 * jax.random.normal(jax.random.PRNGKey(9), backup.shape, backup.dtype)
        hint = (np.random.rand(64, 64, 3) * 255).astype(np.uint8)
        for sampler in ("k_euler", "plms", "lcm", "klms", "k_heun"):
            api.switch_sampler(sampler)
            full = api.sample_with_control(
                1, {"canny": hint}, cond="c", size=(64, 64), num_steps=4, seed=0
            )
            late = api.sample_with_control(
                1, {"canny": hint}, cond="c", size=(64, 64), num_steps=4, seed=0,
                hint_starts={"canny": 0.5},
            )
            assert full.shape == late.shape == (1, 64, 64, 3), sampler
            assert not np.array_equal(full, late), sampler
    finally:
        conv_out.kernel[...] = backup
        api.switch_sampler("ddim")


def test_lcm_img2img_respects_fidelity(tiny_api) -> None:
    """Regression (code review): LCM ignored `start_step`, so img2img with
    the lcm sampler regenerated from pure noise regardless of fidelity."""
    base = tiny_api.txt2img("x", size=(64, 64), num_steps=2, seed=0)
    tiny_api.switch_sampler("lcm")
    try:
        hi = tiny_api.img2img(base, cond="y", fidelity=0.9, num_steps=4, seed=1)
        lo = tiny_api.img2img(base, cond="y", fidelity=0.1, num_steps=4, seed=1)
        assert hi.shape == lo.shape == base.shape
        # high fidelity must stay closer to the input than low fidelity
        d_hi = float(np.mean(np.abs(hi.astype(np.int16) - base.astype(np.int16))))
        d_lo = float(np.mean(np.abs(lo.astype(np.int16) - base.astype(np.int16))))
        assert d_hi < d_lo
    finally:
        tiny_api.switch_sampler("ddim")


def test_control_toggles_and_annotator_cache(tiny_api) -> None:
    """reference :1849-1895 — prepare_annotator caching, enable/disable
    control, and load_context LoRA unwinding."""
    control = ControlNet(
        hint_channels=3,
        in_channels=4,
        start_channels=32,
        num_res_blocks=1,
        channel_multipliers=(1, 2),
        attention_downsample_rates=(1,),
        num_heads=4,
        context_dim=32,
        rngs=nnx.Rngs(1),
    )
    api = ControlledDiffusionAPI(tiny_api.m)
    api.prepare_control("canny", control)
    api.prepare_annotators()
    assert "canny" in api.annotators
    first = api.annotators["canny"]
    hint = (np.random.rand(64, 64, 3) * 255).astype(np.uint8)
    api.get_hint_of("canny", hint)
    assert api.annotators["canny"] is first  # cached, not rebuilt
    # disabled control falls back to plain sampling
    api.disable_control()
    plain = api.sample(1, cond="c", size=(64, 64), num_steps=2, seed=0)
    controlled = api.sample_with_control(
        1, {"canny": hint}, cond="c", size=(64, 64), num_steps=2, seed=0
    )
    np.testing.assert_array_equal(plain, controlled)
    api.enable_control()
    # load_context yields the model and survives no-lora state
    with api.load_context() as m:
        assert m is api.m


def test_multi_controlnet(tiny_api) -> None:
    """Two simultaneous ControlNets with per-hint scales and start/end
    gating (reference `diffusion.py:1760-1866`, `ddpm.py:430-456`)."""
    def make_cn(seed):
        cn = ControlNet(
            hint_channels=3,
            in_channels=4,
            start_channels=32,
            num_res_blocks=1,
            channel_multipliers=(1, 2),
            attention_downsample_rates=(1,),
            num_heads=4,
            context_dim=32,
            rngs=nnx.Rngs(seed),
        )
        # fresh ControlNets output exactly zero (zero convs) — nudge them so
        # each control actually contributes to the test
        import jax

        for i, conv in enumerate(list(cn.zero_convs) + [cn.mid_zero]):
            k = conv.kernel[...]
            conv.kernel[...] = 0.02 * jax.random.normal(jax.random.PRNGKey(seed * 100 + i), k.shape, k.dtype)
        return cn

    api = ControlledDiffusionAPI(tiny_api.m)
    api.prepare_control("canny", make_cn(1))
    api.prepare_control("depth", make_cn(2))
    api.control_scales["depth"] = 0.5
    # a fresh UNet ends in a zero conv → eps is identically 0 and every
    # comparison would trivially pass; perturb it (and restore afterwards)
    import jax

    conv_out = tiny_api.m.unet.conv_out
    orig_kernel = conv_out.kernel[...]
    try:
        conv_out.kernel[...] = 0.05 * jax.random.normal(
            jax.random.PRNGKey(9), orig_kernel.shape, orig_kernel.dtype
        )
        h1 = (np.random.rand(64, 64, 3) * 255).astype(np.uint8)
        h2 = (np.random.rand(64, 64, 3) * 255).astype(np.uint8)
        both = api.sample_with_control(
            1, {"canny": h1, "depth": h2}, cond="c", size=(64, 64), num_steps=3, seed=0
        )
        assert both.shape == (1, 64, 64, 3)
        single = api.sample_with_control(1, {"canny": h1}, cond="c", size=(64, 64), num_steps=3, seed=0)
        assert not np.array_equal(both, single)  # the second control contributes
        # gating a control off for ALL steps must equal not passing it at all
        gated_off = api.sample_with_control(
            1, {"canny": h1, "depth": h2}, cond="c", size=(64, 64), num_steps=3, seed=0,
            hint_starts={"depth": 2.0},
        )
        np.testing.assert_array_equal(gated_off, single)
    finally:
        conv_out.kernel[...] = orig_kernel


def test_deepcache(tiny_api) -> None:
    """DeepCache feature reuse: interval<=1 must be exactly the baseline
    program; interval=2 runs full/shallow alternation and produces a valid,
    close-to-baseline image (the tiny 3-in-block UNet uses cut=1)."""
    baseline = tiny_api.txt2img("a cat", size=(64, 64), num_steps=4, seed=7)
    try:
        tiny_api.set_deepcache(1)
        same = tiny_api.txt2img("a cat", size=(64, 64), num_steps=4, seed=7)
        np.testing.assert_array_equal(baseline, same)
        tiny_api.set_deepcache(2, cut=1)
        cached = tiny_api.txt2img("a cat", size=(64, 64), num_steps=4, seed=7)
        assert cached.shape == baseline.shape
        # the approximation must stay in the same neighborhood (tiny net,
        # 4 steps: identical full steps 0/2 anchor it)
        diff = np.abs(cached.astype(np.float32) - baseline.astype(np.float32)).mean()
        assert diff < 48.0, diff
        # deterministic under the same seed
        cached2 = tiny_api.txt2img("a cat", size=(64, 64), num_steps=4, seed=7)
        np.testing.assert_array_equal(cached, cached2)
        # non-uniform refresh placement (`center`, Ma et al. 2023 §4.2):
        # same number of full passes, different placement — valid,
        # deterministic, and still in the baseline's neighborhood
        tiny_api.set_deepcache(2, cut=1, center=0.5)
        centered = tiny_api.txt2img("a cat", size=(64, 64), num_steps=4, seed=7)
        assert centered.shape == baseline.shape
        diff_c = np.abs(centered.astype(np.float32) - baseline.astype(np.float32)).mean()
        assert diff_c < 48.0, diff_c
        centered2 = tiny_api.txt2img("a cat", size=(64, 64), num_steps=4, seed=7)
        np.testing.assert_array_equal(centered, centered2)
    finally:
        tiny_api.set_deepcache(None)


def test_deepcache_with_control(tiny_api) -> None:
    """DeepCache under ControlNet: shallow passes truncate the control
    residual computation to the consumed levels (`max_levels=cut+1`);
    interval<=1 must be exactly the uncached controlled program."""
    import jax

    cn = ControlNet(
        hint_channels=3,
        in_channels=4,
        start_channels=32,
        num_res_blocks=1,
        channel_multipliers=(1, 2),
        attention_downsample_rates=(1,),
        num_heads=4,
        context_dim=32,
        rngs=nnx.Rngs(5),
    )
    for i, conv in enumerate(list(cn.zero_convs) + [cn.mid_zero]):
        k = conv.kernel[...]
        conv.kernel[...] = 0.02 * jax.random.normal(jax.random.PRNGKey(500 + i), k.shape, k.dtype)
    api = ControlledDiffusionAPI(tiny_api.m)
    api.prepare_control("canny", cn)
    conv_out = tiny_api.m.unet.conv_out
    orig_kernel = conv_out.kernel[...]
    try:
        conv_out.kernel[...] = 0.05 * jax.random.normal(
            jax.random.PRNGKey(9), orig_kernel.shape, orig_kernel.dtype
        )
        hint = (np.random.rand(64, 64, 3) * 255).astype(np.uint8)
        base = api.sample_with_control(1, {"canny": hint}, cond="c", size=(64, 64), num_steps=4, seed=3)
        api.set_deepcache(1)
        same = api.sample_with_control(1, {"canny": hint}, cond="c", size=(64, 64), num_steps=4, seed=3)
        np.testing.assert_array_equal(base, same)
        api.set_deepcache(2, cut=1)
        cached = api.sample_with_control(1, {"canny": hint}, cond="c", size=(64, 64), num_steps=4, seed=3)
        assert cached.shape == base.shape
        assert np.isfinite(cached.astype(np.float32)).all()
        cached2 = api.sample_with_control(1, {"canny": hint}, cond="c", size=(64, 64), num_steps=4, seed=3)
        np.testing.assert_array_equal(cached, cached2)
    finally:
        api.set_deepcache(None)
        conv_out.kernel[...] = orig_kernel


def test_deepcache_with_guidance_interval(tiny_api) -> None:
    """The bench configuration: DeepCache parity restarts inside each
    guidance-interval segment (the cache never crosses a CFG-batch-size
    boundary). interval<=1 with a gi band must equal the plain gi program."""
    tiny_api.switch_sampler("ddim", guidance_interval=(0.25, 0.75))
    try:
        base = tiny_api.txt2img("a cat", size=(64, 64), num_steps=6, seed=11)
        tiny_api.set_deepcache(1)
        same = tiny_api.txt2img("a cat", size=(64, 64), num_steps=6, seed=11)
        np.testing.assert_array_equal(base, same)
        tiny_api.set_deepcache(2, cut=1)
        cached = tiny_api.txt2img("a cat", size=(64, 64), num_steps=6, seed=11)
        assert cached.shape == base.shape
        assert np.isfinite(cached.astype(np.float32)).all()
        diff = np.abs(cached.astype(np.float32) - base.astype(np.float32)).mean()
        assert diff < 48.0, diff
        cached2 = tiny_api.txt2img("a cat", size=(64, 64), num_steps=6, seed=11)
        np.testing.assert_array_equal(cached, cached2)
    finally:
        tiny_api.set_deepcache(None)
        tiny_api.switch_sampler("ddim")


def test_img2img_accepts_pil_and_path(tiny_api, tmp_path) -> None:
    """Paths / PIL images load through `read_image` (reference feeds
    everything through `cftool.cv.read_image`); output matches the
    equivalent ndarray call exactly."""
    from PIL import Image

    rng = np.random.RandomState(0)
    arr = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
    pil = Image.fromarray(arr)
    path = str(tmp_path / "img.png")
    pil.save(path)
    base = tiny_api.img2img(arr, num_steps=2, seed=3)
    from_pil = tiny_api.img2img(pil, num_steps=2, seed=3)
    from_path = tiny_api.img2img(path, num_steps=2, seed=3)
    np.testing.assert_array_equal(base, from_pil)
    np.testing.assert_array_equal(base, from_path)


def test_concat_ldm_inpainting() -> None:
    """`from_inpainting` (reference :1419): concat-conditioned LDM — cond is
    cat([masked latents, mask]) fed straight to the UNet input, no text/CFG."""
    api = DiffusionAPI.from_inpainting(
        use_bf16=False,
        ldm_kwargs=dict(
            latent_size=16,
            first_stage_config=dict(img_size=64, inner_channels=32, num_res_blocks=1),
            unet_config=dict(
                start_channels=32,
                num_res_blocks=1,
                channel_multipliers=[1, 2],
                attention_downsample_rates=[2],
                num_heads=4,
                use_spatial_transformer=False,
                resample_with_resblock=True,
            ),
        ),
    )
    assert api.m.condition_type == "concat"
    assert api.m.unet.in_channels == 7 and api.m.out_channels == 3
    rng = np.random.RandomState(0)
    image = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
    mask = np.zeros((64, 64))
    mask[16:48, 16:48] = 1
    out = api.inpainting(image, mask, num_steps=2, seed=1)
    assert out.shape == (1, 64, 64, 3) and out.dtype == np.uint8
    again = api.inpainting(image, mask, num_steps=2, seed=1)
    np.testing.assert_array_equal(out, again)
    # pixel paste-back (reference `callback` :1066): unmasked pixels come
    # from the input image (uint8 round-trip tolerance)
    untouched = out[0][mask == 0]
    np.testing.assert_allclose(
        untouched.astype(np.int32), image[mask == 0].astype(np.int32), atol=1
    )
    # ...and the masked region was actually generated, not copied
    assert np.abs(
        out[0][mask == 1].astype(np.int32) - image[mask == 1].astype(np.int32)
    ).mean() > 2


def test_semantic_ldm() -> None:
    """`from_semantic` (reference :1436): one-hot semantic maps through a
    SpatialRescaler condition model (which owns the map→latent scaling)."""
    api = DiffusionAPI.from_semantic(
        use_bf16=False,
        ldm_kwargs=dict(
            latent_size=16,
            latent_in_channels=6,
            condition_config=dict(num_stages=2, in_channels=8, out_channels=3),
            first_stage_config=dict(img_size=64, inner_channels=32, num_res_blocks=1),
            unet_config=dict(
                start_channels=32,
                num_res_blocks=1,
                channel_multipliers=[1, 2],
                attention_downsample_rates=[2],
                num_heads=4,
                use_spatial_transformer=False,
            ),
        ),
    )
    assert api.m.condition_type == "concat"
    assert api.m.condition_model is not None
    rng = np.random.RandomState(1)
    labels = rng.randint(0, 8, size=(64, 64))
    semantic = np.eye(8, dtype=np.float32)[labels][None]
    out = api.semantic2img(semantic, num_steps=2, seed=0)
    assert out.shape == (1, 64, 64, 3) and out.dtype == np.uint8
    # class-index input (the reference's semantic2img signature) one-hots to
    # the condition model's in_channels and matches the explicit one-hot call
    from_indices = api.semantic2img(labels, num_steps=2, seed=0)
    np.testing.assert_array_equal(out, from_indices)


def test_img2img_odd_size_rounds_and_restores(tiny_api) -> None:
    """Inputs off the 64px grid are sampled at the rounded size and the
    output is restored to the input's dims (reference anchor rounding +
    `original_size` restore)."""
    rng = np.random.RandomState(0)
    arr = (rng.rand(72, 72, 3) * 255).astype(np.uint8)
    out = tiny_api.img2img(arr, num_steps=2, seed=3)
    assert out.shape == (1, 72, 72, 3) and out.dtype == np.uint8


def test_inpainting_accepts_paths_and_pil(tiny_api, tmp_path) -> None:
    """Path/PIL image + mask inputs to `inpainting` match the ndarray call
    (review regression: strings used to hit np.asarray and crash)."""
    from PIL import Image

    rng = np.random.RandomState(0)
    arr = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
    mask = np.zeros((64, 64), np.uint8)
    mask[16:48, 16:48] = 255
    img_path = str(tmp_path / "img.png")
    mask_path = str(tmp_path / "mask.png")
    Image.fromarray(arr).save(img_path)
    Image.fromarray(mask, mode="L").save(mask_path)
    base = tiny_api.inpainting(arr, (mask > 127).astype(np.float32), cond="z", num_steps=2, seed=2)
    from_path = tiny_api.inpainting(img_path, mask_path, cond="z", num_steps=2, seed=2)
    from_pil = tiny_api.inpainting(Image.fromarray(arr), Image.fromarray(mask, mode="L"), cond="z", num_steps=2, seed=2)
    np.testing.assert_array_equal(base, from_path)
    np.testing.assert_array_equal(base, from_pil)


def test_semantic_uint8_one_hot_not_misdetected() -> None:
    """An integer-dtype (B, H, W, C) one-hot map must be treated as one-hot,
    not class indices (review regression: dtype-only detection 5-D crash)."""
    from cflearn_tpu.api.multimodal.diffusion import DiffusionAPI as _API

    api = _API.from_semantic(
        use_bf16=False,
        ldm_kwargs=dict(
            latent_size=16,
            latent_in_channels=6,
            condition_config=dict(num_stages=2, in_channels=8, out_channels=3),
            first_stage_config=dict(img_size=64, inner_channels=32, num_res_blocks=1),
            unet_config=dict(
                start_channels=32,
                num_res_blocks=1,
                channel_multipliers=[1, 2],
                attention_downsample_rates=[2],
                num_heads=4,
                use_spatial_transformer=False,
            ),
        ),
    )
    labels = np.random.RandomState(1).randint(0, 8, size=(64, 64))
    float_oh = np.eye(8, dtype=np.float32)[labels][None]
    uint8_oh = float_oh.astype(np.uint8)
    a = api.semantic2img(float_oh, num_steps=2, seed=0)
    b = api.semantic2img(uint8_oh, num_steps=2, seed=0)
    np.testing.assert_array_equal(a, b)


def test_img2img_pil_odd_size_restores(tiny_api) -> None:
    """PIL/path inputs off the 64px grid restore to the PIL's original size
    (review regression: read_image's snap used to hide the original dims)."""
    from PIL import Image

    rng = np.random.RandomState(0)
    pil = Image.fromarray((rng.rand(72, 72, 3) * 255).astype(np.uint8))
    out = tiny_api.img2img(pil, num_steps=2, seed=3)
    assert out.shape == (1, 72, 72, 3) and out.dtype == np.uint8


def test_outpainting_rgba_reference_signature(tiny_api) -> None:
    """reference :956 — `outpainting(txt, rgba)`: the alpha channel is the
    mask (transparent = generate); opaque pixels survive via keep_original."""
    from PIL import Image

    rng = np.random.RandomState(0)
    rgba = (rng.rand(64, 64, 4) * 255).astype(np.uint8)
    rgba[..., 3] = 255
    rgba[:, 40:, 3] = 0  # transparent right band -> outpaint
    out = tiny_api.outpainting(
        "scenery", Image.fromarray(rgba, mode="RGBA"),
        num_steps=2, seed=4, keep_original=True, keep_original_fade=0,
    )
    assert out.shape == (1, 64, 64, 3) and out.dtype == np.uint8
    np.testing.assert_array_equal(out[0, :, :40], rgba[:, :40, :3])
    assert not np.array_equal(out[0, :, 40:], rgba[:, 40:, :3])
