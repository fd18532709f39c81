"""Checkpoint-conversion mapping tests.

Strategy (no downloads needed): build the real module, take its npd, invert
the mapping into a synthetic torch-layout state dict, convert forward again,
and require EXACT equality + full coverage of the module's params. This
pins both directions of every (key, transform) pair.
"""

import numpy as np
import pytest
from flax import nnx

from cflearn_tpu.toolkit.tree import tree_to_npd
from cflearn_tpu.zoo import convert as C


def _roundtrip(mapping, npd, *, prefix=""):
    torch_sd = C.invert_mapping(mapping, npd)
    back = C.apply_mapping(mapping, torch_sd, strict=True)
    return torch_sd, back


def test_unet_mapping_roundtrip() -> None:
    from cflearn_tpu.modules.multimodal.diffusion.unet import UNetDiffuser

    unet = UNetDiffuser(
        in_channels=4,
        out_channels=4,
        start_channels=32,
        num_res_blocks=2,
        channel_multipliers=(1, 2),
        attention_downsample_rates=(1, 2),
        num_heads=4,
        context_dim=64,
        rngs=nnx.Rngs(0),
    )
    npd = {f"unet/{k}": v for k, v in tree_to_npd(nnx.state(unet, nnx.Param)).items()}
    mapping = C.build_unet_mapping(
        start_channels=32,
        num_res_blocks=2,
        channel_multipliers=(1, 2),
        attention_downsample_rates=(1, 2),
    )
    mapped_keys = {our for _, our, _ in mapping}
    missing = set(npd) - mapped_keys
    assert not missing, f"mapping does not cover params: {sorted(missing)[:8]}"
    torch_sd, back = _roundtrip(mapping, npd)
    assert set(back) == set(npd)
    for k in npd:
        np.testing.assert_array_equal(back[k], npd[k])
    # torch layouts: conv OIHW
    w = torch_sd["model.diffusion_model.input_blocks.0.0.weight"]
    assert w.shape == (32, 4, 3, 3)


def test_vae_mapping_roundtrip() -> None:
    from cflearn_tpu.modules.cv.ae import AutoEncoderKL

    vae = AutoEncoderKL(
        img_size=64,
        inner_channels=32,
        z_channels=4,
        embedding_channels=4,
        channel_multipliers=[1, 2],
        num_res_blocks=2,
        rngs=nnx.Rngs(0),
    )
    npd = {f"first_stage/{k}": v for k, v in tree_to_npd(nnx.state(vae, nnx.Param)).items()}
    mapping = C.build_vae_mapping(
        inner_channels=32,
        z_channels=4,
        embedding_channels=4,
        channel_multipliers=(1, 2),
        num_res_blocks=2,
        img_size=64,
    )
    mapped_keys = {our for _, our, _ in mapping}
    missing = set(npd) - mapped_keys
    assert not missing, f"mapping does not cover params: {sorted(missing)[:8]}"
    torch_sd, back = _roundtrip(mapping, npd)
    assert set(back) == set(npd)
    for k in npd:
        np.testing.assert_array_equal(back[k], npd[k])
    # VAE attention q is a 1x1 conv in torch layout
    q = torch_sd["first_stage_model.encoder.mid.attn_1.q.weight"]
    assert q.ndim == 4 and q.shape[2:] == (1, 1)


def test_clip_text_mapping_roundtrip() -> None:
    from cflearn_tpu.modules.multimodal.diffusion.cond_models import CLIPTextConditionModel

    cond = CLIPTextConditionModel(latent_dim=32, num_layers=2, num_heads=2, vocab_size=100, rngs=nnx.Rngs(0))
    npd = {f"condition_model/{k}": v for k, v in tree_to_npd(nnx.state(cond, nnx.Param)).items()}
    mapping = C.build_clip_text_mapping(num_layers=2)
    mapped_keys = {our for _, our, _ in mapping}
    missing = set(npd) - mapped_keys
    assert not missing, f"mapping does not cover params: {sorted(missing)[:8]}"
    _, back = _roundtrip(mapping, npd)
    assert set(back) == set(npd)
    for k in npd:
        np.testing.assert_array_equal(back[k], npd[k])


def test_esrgan_mapping_roundtrip() -> None:
    from cflearn_tpu.modules.cv.classifier import RRDBNet

    net = RRDBNet(latent_channels=16, growth_channels=8, num_blocks=2, rngs=nnx.Rngs(0))
    npd = tree_to_npd(nnx.state(net, nnx.Param))
    mapping = C.build_esrgan_mapping(num_blocks=2)
    mapped_keys = {our for _, our, _ in mapping}
    missing = set(npd) - mapped_keys
    assert not missing, f"mapping does not cover params: {sorted(missing)[:8]}"
    _, back = _roundtrip(mapping, npd)
    assert set(back) == set(npd)
    for k in npd:
        np.testing.assert_array_equal(back[k], npd[k])


def test_full_sd_mapping_builds() -> None:
    mapping = C.build_sd_mapping("v1")
    torch_keys = [t for t, _, _ in mapping]
    assert len(torch_keys) == len(set(torch_keys)), "duplicate torch keys"
    our_keys = [o for _, o, _ in mapping]
    assert len(our_keys) == len(set(our_keys)), "duplicate our keys"
    assert any(k.startswith("model.diffusion_model") for k in torch_keys)
    assert any(k.startswith("first_stage_model") for k in torch_keys)
    assert any(k.startswith("cond_stage_model") for k in torch_keys)


def test_sd_cflearn_mapping_artifact_consistent() -> None:
    """The committed cflearn->original rename table (audited against the
    reference model by scripts/gen_sd_cflearn_mapping.py) matches the
    structural derivation in code, and its reference-shape inventory is
    fully accounted for (rename | fused-qkv special | pos-encoding |
    non-checkpoint buffer)."""
    import json
    from pathlib import Path

    path = Path(C.__file__).parent / "sd_cflearn_mapping.json"
    artifact = json.loads(path.read_text())
    renames = C.build_sd_cflearn_renames("v1")
    assert artifact["renames"] == renames
    ref_shapes = artifact["reference_shapes"]
    assert set(renames) <= set(ref_shapes)
    n_layers = artifact["special_fused_qkv_layers"]
    blocks = "condition_model.m.text_transformer.encoder.mixing_blocks"
    special = {"condition_model.m.text_transformer.encoder.pos_encoding.pos_encoding"}
    for i in range(n_layers):
        special |= {f"{blocks}.{i}.token_mixing.net.in_w", f"{blocks}.{i}.token_mixing.net.qkv_bias"}
    uncovered = set(ref_shapes) - set(renames) - special - set(artifact["non_checkpoint_keys"])
    assert not uncovered, sorted(uncovered)[:8]
    with pytest.raises(ValueError):
        C.build_sd_cflearn_renames("v2")


@pytest.mark.slow
def test_sd_cflearn_conversion_roundtrip() -> None:
    """Full numeric loop: a synthetic cflearn-layout checkpoint (built by the
    inverse direction: renames + qkv fusing + pos broadcast dim) converts
    through `convert_sd_cflearn` to EXACTLY the npd `convert_sd` produces
    from the original layout. Shapes come from the committed artifact's
    reference inventory, so this pins the loader against the actual
    reference model geometry without any download."""
    import json
    from pathlib import Path

    path = Path(C.__file__).parent / "sd_cflearn_mapping.json"
    artifact = json.loads(path.read_text())
    renames = artifact["renames"]
    ref_shapes = artifact["reference_shapes"]
    rng = np.random.default_rng(0)
    cf_sd = {}
    for ck in renames:
        cf_sd[ck] = rng.normal(size=ref_shapes[ck]).astype(np.float32)
    pos_key = "condition_model.m.text_transformer.encoder.pos_encoding.pos_encoding"
    cf_sd[pos_key] = rng.normal(size=ref_shapes[pos_key]).astype(np.float32)
    blocks = "condition_model.m.text_transformer.encoder.mixing_blocks"
    for i in range(artifact["special_fused_qkv_layers"]):
        for name in ("in_w", "qkv_bias"):
            k = f"{blocks}.{i}.token_mixing.net.{name}"
            cf_sd[k] = rng.normal(size=ref_shapes[k]).astype(np.float32)

    orig = C.cflearn_sd_to_original(cf_sd)
    # every original-SD key of the full mapping is produced
    expected = {t for t, _, _ in C.build_sd_mapping("v1")}
    assert set(orig) == expected, (len(expected - set(orig)), sorted(expected - set(orig))[:5])
    via = C.convert_sd_cflearn(cf_sd, strict=True)
    direct = C.convert_sd(orig, strict=True)
    assert set(via) == set(direct)
    for k in direct:
        np.testing.assert_array_equal(via[k], direct[k], err_msg=k)
