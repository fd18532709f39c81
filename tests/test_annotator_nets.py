"""Vendored annotator-net ports: MiDaS DPT (+ later MLSD/PiDi) —
conversion round-trips, torch-op parity, annotator wiring."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import nnx

from cflearn_tpu.toolkit.tree import tree_to_npd



pytestmark = pytest.mark.slow  # third-party net conversion + torch parity

def _invert_midas_npd(npd):
    """Build a synthetic torch-layout state dict from our npd by inverting
    every rule in `convert_midas` (conv HWIO→OIHW, linear T, convT
    flip+transpose)."""
    sd = {}

    def conv(prefix, ours, bias=True):
        sd[f"{prefix}.weight"] = np.transpose(npd[f"{ours}/kernel/value"], (3, 2, 0, 1))
        if bias:
            sd[f"{prefix}.bias"] = npd[f"{ours}/bias/value"]

    def convT(prefix, ours):
        w = npd[f"{ours}/kernel/value"][::-1, ::-1]
        sd[f"{prefix}.weight"] = np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1)))
        sd[f"{prefix}.bias"] = npd[f"{ours}/bias/value"]

    def linear(prefix, ours):
        sd[f"{prefix}.weight"] = npd[f"{ours}/kernel/value"].T
        sd[f"{prefix}.bias"] = npd[f"{ours}/bias/value"]

    p = "pretrained.model"
    sd[f"{p}.cls_token"] = npd["cls_token/value"]
    sd[f"{p}.pos_embed"] = npd["pos_embed/value"]
    conv(f"{p}.patch_embed.proj", "patch_embed")
    n_blocks = len({k.split("/")[1] for k in npd if k.startswith("blocks/")})
    for i in range(n_blocks):
        bp, bo = f"{p}.blocks.{i}", f"blocks/{i}"
        for norm in ("norm1", "norm2"):
            sd[f"{bp}.{norm}.weight"] = npd[f"{bo}/{norm}/scale/value"]
            sd[f"{bp}.{norm}.bias"] = npd[f"{bo}/{norm}/bias/value"]
        linear(f"{bp}.attn.qkv", f"{bo}/qkv")
        linear(f"{bp}.attn.proj", f"{bo}/proj")
        linear(f"{bp}.mlp.fc1", f"{bo}/fc1")
        linear(f"{bp}.mlp.fc2", f"{bo}/fc2")
    for i in range(1, 5):
        linear(f"pretrained.act_postprocess{i}.0.project.0", f"readouts/{i - 1}/project")
        conv(f"pretrained.act_postprocess{i}.3", f"projects/{i - 1}")
    convT("pretrained.act_postprocess1.4", "resample1")
    convT("pretrained.act_postprocess2.4", "resample2")
    conv("pretrained.act_postprocess4.4", "resample4")
    for i in range(1, 5):
        conv(f"scratch.layer{i}_rn", f"layer_rn/{i - 1}", bias=False)
        rp, ro = f"scratch.refinenet{i}", f"refine/{i - 1}"
        conv(f"{rp}.out_conv", f"{ro}/out_conv")
        for unit in ("res1", "res2"):
            tname = {"res1": "resConfUnit1", "res2": "resConfUnit2"}[unit]
            conv(f"{rp}.{tname}.conv1", f"{ro}/{unit}/conv1")
            conv(f"{rp}.{tname}.conv2", f"{ro}/{unit}/conv2")
    conv("scratch.output_conv.0", "head_conv1")
    conv("scratch.output_conv.2", "head_conv2")
    conv("scratch.output_conv.4", "head_conv3")
    return sd


def test_midas_conversion_roundtrip_full_coverage() -> None:
    from cflearn_tpu.api.cv.third_party.midas import DPTDepth, convert_midas

    net = DPTDepth("dpt_tiny", features=16, rngs=nnx.Rngs(0))
    npd = tree_to_npd(nnx.state(net, nnx.Param))
    torch_sd = _invert_midas_npd(npd)
    back = convert_midas(torch_sd)
    missing = set(npd) - set(back)
    assert not missing, f"conversion does not cover: {sorted(missing)[:8]}"
    for k in npd:
        np.testing.assert_array_equal(back[k], npd[k], err_msg=k)


def test_midas_forward_and_pos_embed_resize() -> None:
    from cflearn_tpu.api.cv.third_party.midas import DPTDepth

    net = DPTDepth("dpt_tiny", features=16, rngs=nnx.Rngs(0))
    # perturb pos embed so the resize path is observable
    net.pos_embed[...] = jax.random.normal(jax.random.PRNGKey(1), net.pos_embed[...].shape)
    for size in (64, 96):  # 64 → 4x4 grid (resized pos embed); 96 → 6x6
        x = jax.random.normal(jax.random.PRNGKey(0), (1, size, size, 3))
        out = net(x)
        assert out.shape == (1, size, size)
        assert bool(jnp.isfinite(out).all())
        assert bool((out >= 0).all())  # non_negative head


def test_midas_residual_unit_torch_parity() -> None:
    """Pin the fusion-block math (pre-activation residual conv unit) against
    a direct torch replica (reference `blocks.py:269-338`)."""
    import torch

    from cflearn_tpu.api.cv.third_party.midas import _ResidualConvUnit

    unit = _ResidualConvUnit(8, rngs=nnx.Rngs(0))
    rng = np.random.RandomState(0)
    w1 = rng.randn(8, 8, 3, 3).astype(np.float32) * 0.1
    b1 = rng.randn(8).astype(np.float32)
    w2 = rng.randn(8, 8, 3, 3).astype(np.float32) * 0.1
    b2 = rng.randn(8).astype(np.float32)
    unit.conv1.kernel[...] = jnp.asarray(w1.transpose(2, 3, 1, 0))
    unit.conv1.bias[...] = jnp.asarray(b1)
    unit.conv2.kernel[...] = jnp.asarray(w2.transpose(2, 3, 1, 0))
    unit.conv2.bias[...] = jnp.asarray(b2)
    x = rng.randn(1, 8, 6, 6).astype(np.float32)

    tx = torch.from_numpy(x)
    out_t = torch.nn.functional.relu(tx)
    out_t = torch.nn.functional.conv2d(out_t, torch.from_numpy(w1), torch.from_numpy(b1), padding=1)
    out_t = torch.nn.functional.relu(out_t)
    out_t = torch.nn.functional.conv2d(out_t, torch.from_numpy(w2), torch.from_numpy(b2), padding=1)
    ref = (out_t + tx).numpy()

    out = np.asarray(unit(jnp.asarray(x.transpose(0, 2, 3, 1)))).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_depth_annotator_uses_net(tmp_path) -> None:
    """With a checkpoint the depth annotator must run the DPT net (not the
    blur proxy) and reproduce the reference's min-max-normalized output."""
    import torch

    from cflearn_tpu.api.cv.annotator import Annotator
    from cflearn_tpu.api.cv.third_party.midas import DPTDepth

    net = DPTDepth("dpt_tiny", features=16, rngs=nnx.Rngs(3))
    npd = tree_to_npd(nnx.state(net, nnx.Param))
    sd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in _invert_midas_npd(npd).items()}
    ckpt = str(tmp_path / "dpt_tiny.pt")
    torch.save(sd, ckpt)

    ann = Annotator.make("depth", {"ckpt": ckpt, "model_type": "dpt_tiny"})
    img = (np.random.RandomState(0).rand(40, 56, 3) * 255).astype(np.uint8)  # non-multiple-of-32
    out = ann.annotate(img)
    assert out.shape == (40, 56, 3) and out.dtype == np.uint8
    # exact expected output from the net itself
    x = img.astype(np.float32) / 127.5 - 1.0
    x = np.pad(x, ((0, 24), (0, 8), (0, 0)), mode="edge")[None]
    depth = np.asarray(net(jnp.asarray(x)))[:, :40, :56]
    lo, hi = depth.min(), depth.max()
    expected = np.repeat(
        (((depth - lo) / max(hi - lo, 1e-6)) * 255.0).clip(0, 255).astype(np.uint8)[..., None], 3, axis=-1
    )
    np.testing.assert_array_equal(out, expected[0])


def _invert_mlsd_npd(npd):
    """our npd → synthetic torch `mlsd_large_512_fp32`-layout state dict."""
    from cflearn_tpu.api.cv.third_party.mlsd import _IR_SETTING

    sd = {}

    def conv(prefix, ours, bias=True):
        sd[f"{prefix}.weight"] = np.transpose(npd[f"{ours}/kernel/value"], (3, 2, 0, 1))
        if bias:
            sd[f"{prefix}.bias"] = npd[f"{ours}/bias/value"]

    def bn(prefix, ours):
        sd[f"{prefix}.weight"] = npd[f"{ours}/scale/value"]
        sd[f"{prefix}.bias"] = npd[f"{ours}/bias/value"]
        sd[f"{prefix}.running_mean"] = npd[f"{ours}/mean/value"]
        sd[f"{prefix}.running_var"] = npd[f"{ours}/var/value"]

    def cbr(prefix, ours):
        conv(f"{prefix}.0", f"{ours}/conv", bias=False)
        bn(f"{prefix}.1", f"{ours}/bn")

    cbr("backbone.features.0", "features/0")
    fi = 1
    for t, c, n, s in _IR_SETTING:
        for _ in range(n):
            p, o = f"backbone.features.{fi}.conv", f"features/{fi}"
            li = 0
            if t != 1:
                cbr(f"{p}.0", f"{o}/layers/0")
                li = 1
            cbr(f"{p}.{li}", f"{o}/layers/{li}")
            conv(f"{p}.{li + 1}", f"{o}/project", bias=False)
            bn(f"{p}.{li + 2}", f"{o}/project_bn")
            fi += 1
    for i in (15, 16, 17, 18, 19, 20, 21, 22):
        conv(f"block{i}.conv1.0", f"block{i}/conv1")
        bn(f"block{i}.conv1.1", f"block{i}/bn1")
        conv(f"block{i}.conv2.0", f"block{i}/conv2")
        bn(f"block{i}.conv2.1", f"block{i}/bn2")
    conv("block23.conv1.0", "block23/conv1")
    bn("block23.conv1.1", "block23/bn1")
    conv("block23.conv2.0", "block23/conv2")
    bn("block23.conv2.1", "block23/bn2")
    conv("block23.conv3", "block23/conv3")
    return sd


def test_mlsd_conversion_roundtrip_full_coverage() -> None:
    from cflearn_tpu.api.cv.third_party.mlsd import MLSD, convert_mlsd

    net = MLSD(rngs=nnx.Rngs(0))
    params = tree_to_npd(nnx.state(net, nnx.Param))
    stats = tree_to_npd(nnx.state(net, nnx.BatchStat))
    npd = {**params, **stats}
    back = convert_mlsd(_invert_mlsd_npd(npd))
    missing = set(npd) - set(back)
    assert not missing, f"conversion does not cover: {sorted(missing)[:8]}"
    for k in npd:
        np.testing.assert_array_equal(back[k], npd[k], err_msg=k)


def test_mlsd_forward_and_annotator(tmp_path) -> None:
    import torch

    from cflearn_tpu.api.cv.annotator import Annotator
    from cflearn_tpu.api.cv.third_party.mlsd import MLSD, decode_lines

    net = MLSD(rngs=nnx.Rngs(1))
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 128, 128, 4))
    out = net(x)
    assert out.shape == (1, 64, 64, 9)
    assert bool(jnp.isfinite(out).all())
    # decode on a synthetic tpMap with one strong centered segment
    tp = np.zeros((256, 256, 9), np.float32)
    tp[..., 0] = -10.0
    tp[100, 100, 0] = 10.0
    tp[100, 100, 1:5] = [-20.0, 0.0, 20.0, 0.0]  # 40px horizontal line
    lines = decode_lines(tp, score_thr=0.1, dist_thr=20.0)
    assert lines.shape == (1, 4)
    np.testing.assert_allclose(lines[0], [2 * 80, 200, 2 * 120, 200])

    # annotator end-to-end through a saved checkpoint
    params = tree_to_npd(nnx.state(net, nnx.Param))
    stats = tree_to_npd(nnx.state(net, nnx.BatchStat))
    sd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in _invert_mlsd_npd({**params, **stats}).items()}
    ckpt = str(tmp_path / "mlsd.pt")
    torch.save(sd, ckpt)
    ann = Annotator.make("mlsd", {"ckpt": ckpt})
    img = (np.random.RandomState(0).rand(64, 64, 3) * 255).astype(np.uint8)
    hint = ann.annotate(img)
    assert hint.shape == (64, 64, 3) and hint.dtype == np.uint8
    with pytest.raises(ValueError):
        Annotator.make("mlsd", {}).annotate(img)


def test_pidi_pdc_folding_torch_parity() -> None:
    """The PDC→vanilla kernel folding must reproduce the reference's runtime
    difference convolutions (`pidi.py:41-128`) exactly."""
    import torch
    import torch.nn.functional as F

    from cflearn_tpu.api.cv.third_party.pidi import _pdc_to_vanilla

    rng = np.random.RandomState(0)
    x = torch.from_numpy(rng.randn(1, 6, 10, 10).astype(np.float32))
    w = rng.randn(4, 6, 3, 3).astype(np.float32)
    tw = torch.from_numpy(w)

    # cd: conv(x, w) - conv(x, sum(w))
    ref_cd = F.conv2d(x, tw, padding=1) - F.conv2d(x, tw.sum(dim=[2, 3], keepdim=True))
    out_cd = F.conv2d(x, torch.from_numpy(_pdc_to_vanilla("cd", w)), padding=1)
    np.testing.assert_allclose(out_cd.numpy(), ref_cd.numpy(), atol=1e-5)

    # ad: conv(x, w - w[clockwise])
    flat = tw.reshape(4, 6, 9)
    ref_w = (flat - flat[:, :, [3, 0, 1, 6, 4, 2, 7, 8, 5]]).reshape(4, 6, 3, 3)
    ref_ad = F.conv2d(x, ref_w, padding=1)
    out_ad = F.conv2d(x, torch.from_numpy(_pdc_to_vanilla("ad", w)), padding=1)
    np.testing.assert_allclose(out_ad.numpy(), ref_ad.numpy(), atol=1e-5)

    # rd: 5x5 buffer layout
    buf = torch.zeros(4, 6, 25)
    buf[:, :, [0, 2, 4, 10, 14, 20, 22, 24]] = flat[:, :, 1:]
    buf[:, :, [6, 7, 8, 11, 13, 16, 17, 18]] = -flat[:, :, 1:]
    ref_rd = F.conv2d(x, buf.reshape(4, 6, 5, 5), padding=2)
    out_rd = F.conv2d(x, torch.from_numpy(_pdc_to_vanilla("rd", w)), padding=2)
    np.testing.assert_allclose(out_rd.numpy(), ref_rd.numpy(), atol=1e-5)


def test_pidi_conversion_coverage_and_annotator(tmp_path) -> None:
    import torch

    from cflearn_tpu.api.cv.annotator import Annotator
    from cflearn_tpu.api.cv.third_party.pidi import PiDiNet, convert_pidi
    from cflearn_tpu.toolkit.tree import npd_to_tree

    net = PiDiNet(inplane=12, dil=8, rngs=nnx.Rngs(0))
    npd = tree_to_npd(nnx.state(net, nnx.Param))

    # synthetic RAW torch checkpoint: shapes derived from the module, except
    # rd convs whose raw kernels are 3x3 (the conversion folds them to 5x5)
    rng = np.random.RandomState(0)
    names = (
        [("block1_1", 1), ("block1_2", 2), ("block1_3", 3)]
        + [(f"block2_{j}", 3 + j) for j in range(1, 5)]
        + [(f"block3_{j}", 7 + j) for j in range(1, 5)]
        + [(f"block4_{j}", 11 + j) for j in range(1, 5)]
    )
    sd = {}

    def put(prefix, ours, bias=True, raw_k=None):
        kh, kw, i, o = npd[f"{ours}/kernel/value"].shape
        if raw_k is not None:
            kh = kw = raw_k
        sd[f"{prefix}.weight"] = rng.randn(o, i, kh, kw).astype(np.float32) * 0.1
        if bias and f"{ours}/bias/value" in npd:
            sd[f"{prefix}.bias"] = rng.randn(o).astype(np.float32) * 0.1

    put("init_block", "init_block", bias=False, raw_k=3)
    for bi, (tname, pi) in enumerate(names):
        put(f"{tname}.conv1", f"blocks/{bi}/conv1", bias=False, raw_k=3)
        put(f"{tname}.conv2", f"blocks/{bi}/conv2", bias=False)
        if f"blocks/{bi}/shortcut/kernel/value" in npd:
            put(f"{tname}.shortcut", f"blocks/{bi}/shortcut")
    for i in range(4):
        put(f"dilations.{i}.conv1", f"dilations/{i}/conv1")
        for j in range(4):
            put(f"dilations.{i}.conv2_{j + 1}", f"dilations/{i}/dilated/{j}", bias=False)
        put(f"attentions.{i}.conv1", f"attentions/{i}/conv1")
        put(f"attentions.{i}.conv2", f"attentions/{i}/conv2", bias=False)
        put(f"conv_reduces.{i}.conv", f"conv_reduces/{i}")
    put("classifier", "classifier")

    back = convert_pidi(sd)
    missing = set(npd) - set(back)
    assert not missing, f"conversion does not cover: {sorted(missing)[:8]}"
    for k in npd:
        assert back[k].shape == npd[k].shape, (k, back[k].shape, npd[k].shape)
    # strict load must succeed + forward must run
    nnx.update(net, npd_to_tree(back, nnx.state(net, nnx.Param), strict=True))
    out = net(jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32)))
    assert out.shape == (1, 32, 32) and bool(jnp.isfinite(out).all())

    ckpt = str(tmp_path / "pidi.pth")
    torch.save({"state_dict": {f"module.{k}": torch.from_numpy(v) for k, v in sd.items()}}, ckpt)
    ann = Annotator.make("pidi", {"ckpt": ckpt, "inplane": 12, "dil": 8})
    img = (np.random.RandomState(0).rand(32, 32, 3) * 255).astype(np.uint8)
    hint = ann.annotate(img)
    assert hint.shape == (32, 32, 3) and hint.dtype == np.uint8
    with pytest.raises(ValueError):
        Annotator.make("pidi", {}).annotate(img)


def test_lama_conversion_and_inpaint(tmp_path) -> None:
    """big-lama generator: full-coverage conversion from the official
    `generator.model.{i}` layout, strict load, composite invariant
    (unmasked pixels pass through exactly)."""
    import torch

    from cflearn_tpu.api.cv.third_party.lama import LaMaAPI, LaMaGenerator, convert_lama
    from cflearn_tpu.toolkit.tree import npd_to_tree

    net = LaMaGenerator(ngf=8, n_blocks=2, rngs=nnx.Rngs(0))
    params = tree_to_npd(nnx.state(net, nnx.Param))
    stats = tree_to_npd(nnx.state(net, nnx.BatchStat))
    npd = {**params, **stats}
    rng = np.random.RandomState(0)

    # synthetic torch sd with the official naming, shapes derived from ours
    sd = {}

    def put_conv(prefix, ours, bias=False):
        kh, kw, i, o = npd[f"{ours}/kernel/value"].shape
        sd[f"{prefix}.weight"] = rng.randn(o, i, kh, kw).astype(np.float32) * 0.1
        if bias:
            sd[f"{prefix}.bias"] = rng.randn(o).astype(np.float32) * 0.1

    def put_convT(prefix, ours):
        kh, kw, i, o = npd[f"{ours}/kernel/value"].shape
        sd[f"{prefix}.weight"] = rng.randn(i, o, kh, kw).astype(np.float32) * 0.1
        sd[f"{prefix}.bias"] = rng.randn(o).astype(np.float32) * 0.1

    def put_bn(prefix, ours):
        c = npd[f"{ours}/scale/value"].shape[0]
        sd[f"{prefix}.weight"] = rng.rand(c).astype(np.float32) + 0.5
        sd[f"{prefix}.bias"] = rng.randn(c).astype(np.float32) * 0.1
        sd[f"{prefix}.running_mean"] = rng.randn(c).astype(np.float32) * 0.1
        sd[f"{prefix}.running_var"] = rng.rand(c).astype(np.float32) + 0.5

    def put_ffc(prefix, ours):
        for name in ("convl2l", "convl2g", "convg2l"):
            if f"{ours}/ffc/{name}/kernel/value" in npd:
                put_conv(f"{prefix}.ffc.{name}", f"{ours}/ffc/{name}")
        if f"{ours}/ffc/convg2g/conv1/kernel/value" in npd:
            put_conv(f"{prefix}.ffc.convg2g.conv1.0", f"{ours}/ffc/convg2g/conv1")
            put_bn(f"{prefix}.ffc.convg2g.conv1.1", f"{ours}/ffc/convg2g/bn1")
            put_conv(f"{prefix}.ffc.convg2g.fu.conv_layer", f"{ours}/ffc/convg2g/fu/conv")
            put_bn(f"{prefix}.ffc.convg2g.fu.bn", f"{ours}/ffc/convg2g/fu/bn")
            put_conv(f"{prefix}.ffc.convg2g.conv2", f"{ours}/ffc/convg2g/conv2")
        if f"{ours}/bn_l/scale/value" in npd:
            put_bn(f"{prefix}.bn_l", f"{ours}/bn_l")
        if f"{ours}/bn_g/scale/value" in npd:
            put_bn(f"{prefix}.bn_g", f"{ours}/bn_g")

    put_ffc("model.1", "stem")
    for i in range(3):
        put_ffc(f"model.{2 + i}", f"downs/{i}")
    for bi in range(2):
        put_ffc(f"model.{5 + bi}.conv1", f"blocks/{bi}/conv1")
        put_ffc(f"model.{5 + bi}.conv2", f"blocks/{bi}/conv2")
    base = 5 + 2 + 1
    for i in range(3):
        put_convT(f"model.{base + i * 3}", f"ups/{i}/conv")
        put_bn(f"model.{base + i * 3 + 1}", f"ups/{i}/bn")
    put_conv(f"model.{base + 10}", "head", bias=True)

    back = convert_lama({f"generator.{k}": v for k, v in sd.items()})
    missing = set(npd) - set(back)
    assert not missing, f"conversion does not cover: {sorted(missing)[:8]}"
    nnx.update(net, npd_to_tree(back, nnx.state(net), strict=False))

    # torch convT parity is pinned by the MiDaS test transform; here check
    # the whole generator end-to-end + API composite invariant
    ckpt = str(tmp_path / "lama.ckpt")
    torch.save({"state_dict": {f"generator.{k}": torch.from_numpy(v) for k, v in sd.items()}}, ckpt)
    api = LaMaAPI(ckpt, ngf=8, n_blocks=2)
    img = rng.rand(40, 48, 3).astype(np.float32)
    mask = np.zeros((40, 48), np.float32)
    mask[10:20, 12:30] = 1.0
    out = api.inpaint(img, mask)
    assert out.shape == (40, 48, 3)
    assert np.isfinite(out).all()
    np.testing.assert_array_equal(out[mask == 0], img[mask == 0])  # composite
    assert not np.allclose(out[mask == 1], img[mask == 1])  # inpainted region


def test_isnet_conversion_and_segment(tmp_path) -> None:
    """ISNet: mechanical conversion coverage (identical attribute scheme) +
    segment API contract (min-max normalized map at input resolution)."""
    import torch

    from cflearn_tpu.api.cv.third_party.isnet import ISNetAPI, ISNetDIS, convert_isnet
    from cflearn_tpu.toolkit.tree import npd_to_tree

    net = ISNetDIS(scale=16, rngs=nnx.Rngs(0))
    params = tree_to_npd(nnx.state(net, nnx.Param))
    stats = tree_to_npd(nnx.state(net, nnx.BatchStat))
    npd = {**params, **stats}
    rng = np.random.RandomState(0)
    sd = {}
    for k, v in npd.items():
        path = k.rsplit("/", 2)[0].replace("/", ".")
        leaf = k.split("/")[-2]
        if leaf == "kernel":
            kh, kw, i, o = v.shape
            sd[f"{path}.weight"] = rng.randn(o, i, kh, kw).astype(np.float32) * 0.1
        elif leaf == "scale":
            sd[f"{path}.weight"] = rng.rand(*v.shape).astype(np.float32) + 0.5
        elif leaf == "bias":
            sd[f"{path}.bias"] = rng.randn(*v.shape).astype(np.float32) * 0.1
        elif leaf == "mean":
            sd[f"{path}.running_mean"] = rng.randn(*v.shape).astype(np.float32) * 0.1
        elif leaf == "var":
            sd[f"{path}.running_var"] = rng.rand(*v.shape).astype(np.float32) + 0.5
    back = convert_isnet(sd)
    missing = set(npd) - set(back)
    assert not missing, f"conversion does not cover: {sorted(missing)[:8]}"
    nnx.update(net, npd_to_tree(back, nnx.state(net), strict=False))

    ckpt = str(tmp_path / "isnet.pth")
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, ckpt)
    api = ISNetAPI(ckpt, scale=16)
    img = (rng.rand(50, 70, 3) * 255).astype(np.uint8)
    mask = api.segment(img, infer_size=128)
    assert mask.shape == (50, 70)
    assert mask.min() >= 0.0 and mask.max() <= 1.0
    assert np.isfinite(mask).all()


def test_iharm_conversion_and_run(tmp_path) -> None:
    """iDIH-HRNet image harmonization: mechanical conversion coverage (the
    module tree mirrors the torch names) + Predictor contract (pad to
    divisor, normalize, blend, uint8 out, background preserved-ish by the
    image-fusion attention)."""
    import torch

    from cflearn_tpu.api.cv.third_party.iharm import (
        HRNetIHModel,
        ImageHarmonizationAPI,
        convert_iharm,
    )
    from cflearn_tpu.toolkit.tree import npd_to_tree

    kwargs = dict(width=4, ocr_width=8, ch=8, depth=7)
    net = HRNetIHModel(rngs=nnx.Rngs(0), **kwargs)
    params = tree_to_npd(nnx.state(net, nnx.Param))
    stats = tree_to_npd(nnx.state(net, nnx.BatchStat))
    npd = {**params, **stats}
    rng = np.random.RandomState(0)
    sd = {}
    for k, v in npd.items():
        path = k.rsplit("/", 2)[0].replace("/", ".")
        leaf = k.split("/")[-2]
        if leaf == "kernel" and "deconv_blocks" in k:
            kh, kw, i, o = v.shape  # stored pre-flipped (kh, kw, in, out)
            sd[f"{path}.weight"] = rng.randn(i, o, kh, kw).astype(np.float32) * 0.1
        elif leaf == "kernel":
            kh, kw, i, o = v.shape
            sd[f"{path}.weight"] = rng.randn(o, i, kh, kw).astype(np.float32) * 0.1
        elif leaf == "scale" and path.endswith("mask_conv.1"):
            sd[f"{path}.scale"] = rng.rand(*v.shape).astype(np.float32)
        elif leaf == "scale":
            sd[f"{path}.weight"] = rng.rand(*v.shape).astype(np.float32) + 0.5
        elif leaf == "bias":
            sd[f"{path}.bias"] = rng.randn(*v.shape).astype(np.float32) * 0.1
        elif leaf == "mean":
            sd[f"{path}.running_mean"] = rng.randn(*v.shape).astype(np.float32) * 0.1
        elif leaf == "var":
            sd[f"{path}.running_var"] = rng.rand(*v.shape).astype(np.float32) + 0.5
    back = convert_iharm(sd)
    missing = set(npd) - set(back)
    assert not missing, f"conversion does not cover: {sorted(missing)[:8]}"
    extra = set(back) - set(npd)
    assert not extra, f"conversion produces unknown keys: {sorted(extra)[:8]}"

    ckpt = str(tmp_path / "iharm.pth")
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, ckpt)
    api = ImageHarmonizationAPI(ckpt, **kwargs)
    img = (rng.rand(140, 200, 3) * 255).astype(np.uint8)
    mask = np.zeros((140, 200), np.float32)
    mask[40:90, 60:150] = 1.0
    out = api.run(img, mask)
    assert out.shape == (140, 200, 3)
    assert out.dtype == np.uint8
    assert np.isfinite(out.astype(np.float32)).all()


def test_iharm_conv_transpose_matches_torch() -> None:
    """TorchConvTranspose (input-dilated conv with pre-flipped kernel) must
    match torch ConvTranspose2d(k=4, s=2, p in {0, 1}) exactly."""
    import torch

    from cflearn_tpu.api.cv.third_party.iharm import TorchConvTranspose

    rng = np.random.RandomState(1)
    for p in (0, 1):
        x = rng.randn(2, 5, 7, 3).astype(np.float32)
        w = rng.randn(3, 6, 4, 4).astype(np.float32) * 0.2  # (in, out, kh, kw)
        b = rng.randn(6).astype(np.float32) * 0.1
        tref = torch.nn.functional.conv_transpose2d(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            torch.from_numpy(w),
            torch.from_numpy(b),
            stride=2,
            padding=p,
        ).permute(0, 2, 3, 1).numpy()
        mod = TorchConvTranspose(3, 6, 4, 2, p, rngs=nnx.Rngs(0))
        mod.kernel[...] = jnp.asarray(np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1))[::-1, ::-1]))
        mod.bias[...] = jnp.asarray(b)
        got = np.asarray(mod(jnp.asarray(x)))
        np.testing.assert_allclose(got, tref, atol=1e-4)


def test_reference_wrapper_apis() -> None:
    """Reference-named wrapper surfaces (`HedAPI`/`PiDiAPI`/`MLSDDetector`,
    reference `api/cv/third_party/hed.py:91`, `pidi.py:509`,
    `mlsd/api.py:15`) — delegate to the annotators with the reference call
    signatures and output conventions."""
    import numpy as np

    from cflearn_tpu.api.cv.third_party import HedAPI, MLSDDetector, PiDiAPI

    img = (np.random.RandomState(0).rand(32, 32, 3) * 255).astype(np.uint8)
    edge = HedAPI()(img)
    assert edge.shape == (32, 32) and edge.dtype == np.uint8
    pidi = PiDiAPI()
    soft = pidi(img)
    hard = pidi(img, threshold=0.5)
    assert soft.shape == hard.shape == (32, 32)
    assert set(np.unique(hard)) <= {0, 255}
    lines = MLSDDetector()(img, 0.1, 0.1)
    assert lines.shape == (32, 32, 3) and lines.dtype == np.uint8


def test_openpose_hand_and_flat_caffe_keys() -> None:
    """The hosted OpenPose checkpoints use FLAT caffe layer names (the
    reference strips module prefixes via `util.transfer`); conversion must
    cover them, and the hand branch (reference `openpose/hand.py` +
    `handpose_model`) must be fully convertible too."""
    import jax.numpy as jnp

    from cflearn_tpu.api.cv.third_party.openpose import (
        OpenPoseBody,
        OpenPoseHand,
        convert_hand,
        convert_openpose,
        detect_hand_peaks,
        hand_boxes_from_keypoints,
    )
    from cflearn_tpu.toolkit.tree import tree_to_npd

    rng = np.random.RandomState(0)

    def flat_sd_for(npd, name_of):
        sd = {}
        for key in npd:
            nm = name_of(key)
            k = npd[key.replace("/bias/", "/kernel/")]
            kh, kw, ci, co = k.shape
            if key.endswith("kernel/value"):
                sd[f"{nm}.weight"] = rng.randn(co, ci, kh, kw).astype(np.float32)
            else:
                sd[f"{nm}.bias"] = rng.randn(co).astype(np.float32)
        return sd

    body = OpenPoseBody(rngs=nnx.Rngs(0))
    body_npd = tree_to_npd(nnx.state(body, nnx.Param))
    stem_names = ["conv1_1", "conv1_2", "conv2_1", "conv2_2", "conv3_1", "conv3_2",
                  "conv3_3", "conv3_4", "conv4_1", "conv4_2", "conv4_3_CPM", "conv4_4_CPM"]

    def body_name(key):
        parts = key.split("/")
        if parts[0] == "stem":
            return stem_names[int(parts[1])]
        s = int(parts[1]) + 1
        b = 1 if parts[0] == "stages_l1" else 2
        j = int(parts[3]) + 1
        return f"conv5_{j}_CPM_L{b}" if s == 1 else f"Mconv{j}_stage{s}_L{b}"

    back = convert_openpose(flat_sd_for(body_npd, body_name))
    assert set(back) == set(body_npd), (sorted(set(body_npd) - set(back))[:5],
                                        sorted(set(back) - set(body_npd))[:5])

    hand = OpenPoseHand(rngs=nnx.Rngs(0))
    hand_npd = tree_to_npd(nnx.state(hand, nnx.Param))
    hand_stem = ["conv1_1", "conv1_2", "conv2_1", "conv2_2", "conv3_1", "conv3_2",
                 "conv3_3", "conv3_4", "conv4_1", "conv4_2", "conv4_3", "conv4_4",
                 "conv5_1", "conv5_2", "conv5_3_CPM"]

    def hand_name(key):
        parts = key.split("/")
        if parts[0] == "stem":
            return hand_stem[int(parts[1])]
        if parts[0] == "head":
            return ["conv6_1_CPM", "conv6_2_CPM"][int(parts[2])]
        s = int(parts[1]) + 2
        j = int(parts[3]) + 1
        return f"Mconv{j}_stage{s}"

    back = convert_hand(flat_sd_for(hand_npd, hand_name))
    assert set(back) == set(hand_npd)

    # hand forward + peak extraction + box geometry
    out = hand(jnp.zeros((1, 64, 64, 3)))
    assert out.shape == (1, 8, 8, 22)
    peaks = detect_hand_peaks(hand, (rng.rand(48, 48, 3) * 255).astype(np.uint8), boxsize=64)
    assert peaks.shape == (21, 2)
    kp = {2: (40, 30), 3: (50, 60), 4: (60, 90), 5: (80, 30), 6: (82, 60), 7: (85, 95)}
    boxes = hand_boxes_from_keypoints(kp, (128, 128))
    assert len(boxes) == 2 and all(b[2] >= 20 for b in boxes)


def test_openpose_detector_hand_requires_ckpt() -> None:
    """`hand=True` without a hand checkpoint must raise instead of silently
    drawing random-weight hand skeletons; plain construction must not pay
    for the hand net (review regression)."""
    import pytest as _pytest

    from cflearn_tpu.api.cv.third_party import OpenposeDetector

    det = OpenposeDetector()
    assert det._hand_estimation is None
    with _pytest.raises(ValueError, match="hand_ckpt"):
        _ = det.hand_estimation
