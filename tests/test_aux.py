"""Aux subsystem tests: LoRA, export, image folder, annotators, dist,
finetune/freeze, TP placement."""

import os

import numpy as np

import jax
import jax.numpy as jnp
from flax import nnx


def test_lora_roundtrip() -> None:
    from cflearn_tpu.modules.core.lora import LoRAManager, LoRAPack
    from cflearn_tpu.modules.core.mixed_stacks import BasicTransformerBlock

    blk = BasicTransformerBlock(32, 4, 8, context_dim=16, rngs=nnx.Rngs(0))
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 32))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 16))
    base = blk(x, ctx)
    pack = LoRAPack.create(blk, rank=2)
    assert len(pack.deltas) == 8  # 2 attns x (q,k,v,out)
    mgr = LoRAManager()
    mgr.load_pack_with("style", pack)
    mgr.apply_lora(blk, "style")
    np.testing.assert_allclose(np.asarray(base), np.asarray(blk(x, ctx)), atol=1e-6)
    for k in pack.deltas:
        d, u = pack.deltas[k]
        pack.deltas[k] = (d, np.ones_like(u) * 0.1)
    mgr.apply_lora(blk, "style")
    assert not np.allclose(np.asarray(base), np.asarray(blk(x, ctx)), atol=1e-5)
    mgr.deactivate(blk)
    np.testing.assert_allclose(np.asarray(base), np.asarray(blk(x, ctx)), atol=1e-6)


def test_stablehlo_export_roundtrip(tmp_path) -> None:
    from cflearn_tpu.pipeline.export import export_model, load_exported
    from cflearn_tpu.schema import DLConfig
    from cflearn_tpu.schema.model import IDLModel

    config = DLConfig(
        module_name="fcnn",
        module_config={"input_dim": 4, "output_dim": 2, "hidden_units": [8]},
        loss_name="cross_entropy",
    )
    model = IDLModel.from_config(config)
    batch = {"input": np.random.randn(4, 4).astype(np.float32)}
    folder = export_model(model, batch, str(tmp_path))
    fn = load_exported(folder)
    direct = model.run({"input": batch["input"]}, training=False)
    np.testing.assert_allclose(
        np.asarray(fn(batch)["predictions"]), np.asarray(direct["predictions"]), atol=1e-5
    )


def test_image_folder(tmp_path) -> None:
    from PIL import Image

    from cflearn_tpu.data.cv import ImageFolderData, ResizedPreparation, prepare_image_folder

    src = tmp_path / "src"
    for cls in ["a", "b"]:
        os.makedirs(src / cls, exist_ok=True)
        for i in range(6):
            Image.fromarray((np.random.rand(10, 12, 3) * 255).astype(np.uint8)).save(src / cls / f"{i}.png")
    dst = prepare_image_folder(str(src), str(tmp_path / "packed"), preparation=ResizedPreparation(8), valid_split=0.25, shard_size=4, force=True)
    data = ImageFolderData.from_folder(dst)
    assert data.num_train + data.num_valid == 12
    train, valid = data.get_loaders()
    batch = train.get_one_batch()
    assert batch["input"].shape[1:] == (8, 8, 3)
    assert set(np.unique(batch["labels"])) <= {0, 1}


def test_annotators() -> None:
    from cflearn_tpu.api.cv.annotator import Annotator

    img = (np.random.rand(32, 32, 3) * 255).astype(np.uint8)
    for name in ["canny", "softedge", "depth"]:
        out = Annotator.make(name, {}).annotate(img)
        assert out.shape == (32, 32, 3) and out.dtype == np.uint8


def test_finetune_freeze(tmp_path) -> None:
    from cflearn_tpu.data import ArrayData
    from cflearn_tpu.monitors import LazyMonitor
    from cflearn_tpu.schema import DLConfig, TrainerConfig
    from cflearn_tpu.schema.model import IDLModel
    from cflearn_tpu.trainer import Trainer

    x = np.random.randn(32, 4).astype(np.float32)
    y = (x.sum(1, keepdims=True) > 0).astype(np.int64)
    config = DLConfig(module_name="fcnn", module_config={"input_dim": 4, "output_dim": 2, "hidden_units": [8]}, loss_name="cross_entropy")
    model = IDLModel.from_config(config)
    ckpt = str(tmp_path / "pre.npz")
    model.save(ckpt)
    pretrained = {k: np.asarray(v) for k, v in model.state_dict().items()}
    model2 = IDLModel.from_config(config)
    trainer = Trainer(
        TrainerConfig(
            workspace=str(tmp_path),
            fixed_steps=4,
            callback_names=[],
            finetune_config={"pretrained_ckpt": ckpt, "freeze": "head"},
        ),
        monitors=[LazyMonitor()],
    )
    trainer.fit(ArrayData.init().fit(x, y), model2, skip_final_evaluation=True)
    frozen = trainer._frozen_paths
    assert any("head" in p for p in frozen)
    assert any(p not in frozen for p in pretrained)
    # frozen params must be bit-identical to the pretrained checkpoint after
    # real optimization steps; trainable params must have moved
    after = model2.state_dict()
    moved = 0
    for k, before in pretrained.items():
        now = np.asarray(after[k])
        if k in frozen:
            np.testing.assert_array_equal(now, before, err_msg=f"frozen {k} moved")
        elif not np.array_equal(now, before):
            moved += 1
    assert moved > 0, "no trainable params moved"


def test_tp_placement_rules() -> None:
    from cflearn_tpu.modules.core.mixed_stacks import SpatialTransformer
    from cflearn_tpu.parallel.mesh import make_mesh
    from cflearn_tpu.parallel.tp import describe_placement
    from cflearn_tpu.schema.config import MeshConfig

    mc = MeshConfig()
    mc.from_info({"data": 2, "fsdp": 2, "model": 2})
    mesh = make_mesh(mc)
    sp = SpatialTransformer(32, 4, 8, context_dim=32, rngs=nnx.Rngs(0))
    placements = describe_placement(nnx.state(sp, nnx.Param), mesh)
    kinds = {spec for _, spec in placements}
    assert "PartitionSpec(None, 'model')" in kinds  # column parallel
    assert "PartitionSpec('model', None)" in kinds  # row parallel


def test_ddr_training(tmp_path) -> None:
    from cflearn_tpu.data import ArrayData
    from cflearn_tpu.monitors import LazyMonitor
    from cflearn_tpu.schema import DLConfig, TrainerConfig
    from cflearn_tpu.schema.model import IDLModel
    from cflearn_tpu.trainer import Trainer

    x = np.random.randn(32, 4).astype(np.float32)
    y = x.sum(1, keepdims=True).astype(np.float32)
    config = DLConfig(model="ml.ddr", module_name="ddr", module_config={"input_dim": 4, "output_dim": 1})
    model = IDLModel.from_config(config)
    trainer = Trainer(TrainerConfig(workspace=str(tmp_path), fixed_steps=2, callback_names=[]), monitors=[LazyMonitor()])
    trainer.fit(ArrayData.init().fit(x, y), model)
    out = model.run({"input": jnp.asarray(x[:4])}, training=False)
    q = np.asarray(out["quantiles"])
    # quantiles should be monotone along the anchor axis (softplus increments)
    assert (np.diff(q, axis=1) >= -1e-4).all()


def test_experiment_scheduler(tmp_path) -> None:
    from cflearn_tpu.api.api import repeat_ml
    from cflearn_tpu.schema.config import MLConfig

    os.environ["CFLEARN_TPU_FORCE_CPU"] = "1"
    x = np.random.randn(32, 4).astype(np.float32)
    y = (x.sum(1, keepdims=True) > 0).astype(np.int64)
    cfg = MLConfig(module_name="fcnn", fixed_steps=1, callback_names=[])
    results = repeat_ml(x, y, config=cfg, workspace=str(tmp_path), num_repeat=2, num_jobs=1)
    pipes = results.load_pipelines()
    assert len(pipes) == 2
    for p in pipes.values():
        preds = p.predict(x[:4], return_classes=True)["predictions"]
        assert preds.shape == (4, 1)


def test_run_multiple_is_fix_repairs_in_place(tmp_path) -> None:
    """Regression (code review): repair runs claimed fresh indices and
    clobbered healthy task folders. `is_fix` must retrain INTO the buggy
    slot and leave healthy slots untouched."""
    from cflearn_tpu.api.api import run_multiple
    from cflearn_tpu.data.ml.api import MLData
    from cflearn_tpu.dist.ml.experiment import Experiment
    from cflearn_tpu.schema.config import MLConfig

    os.environ["CFLEARN_TPU_FORCE_CPU"] = "1"
    x = np.random.randn(32, 4).astype(np.float32)
    y = (x.sum(1, keepdims=True) > 0).astype(np.int64)
    data = MLData.init().fit(x, y)
    cfg = MLConfig(module_name="fcnn", fixed_steps=1, callback_names=[])
    ws = str(tmp_path)
    run_multiple(cfg, data, workspace=ws, num_multiple=2, num_jobs=1)
    t0 = os.path.join(ws, "fcnn", "0")
    t1 = os.path.join(ws, "fcnn", "1")
    assert not Experiment.is_buggy(t0) and not Experiment.is_buggy(t1)
    # corrupt slot 1, remember slot 0's artifacts
    import shutil

    shutil.rmtree(t1)
    os.makedirs(t1)
    mtime0 = os.path.getmtime(os.path.join(t0, "pipeline"))
    run_multiple(cfg, data, workspace=ws, num_multiple=2, num_jobs=1, is_fix=True)
    assert not Experiment.is_buggy(t1), "the buggy slot must be repaired"
    assert os.path.getmtime(os.path.join(t0, "pipeline")) == mtime0, "healthy slot untouched"


def test_fit_ml_does_not_mutate_config() -> None:
    """Regression (code review): fit_ml rewrote the caller's config in
    place (model resolution + to_debug)."""
    import cflearn_tpu as cf

    x = np.random.randn(32, 4).astype(np.float32)
    y = (x.sum(1, keepdims=True) > 0).astype(np.int64)
    cfg = cf.MLConfig(module_name="fcnn", callback_names=[])
    assert cfg.model == "common"
    cf.fit_ml(x, y, config=cfg, debug=True)
    assert cfg.model == "common"
    assert cfg.fixed_steps is None


def test_torch_lora_key_mapping_and_fusion(tmp_path) -> None:
    """Regression (code review): kohya-style torch LoRA checkpoints were
    stored under raw torch keys and never fused. Keys must map to real UNet
    param paths, per-layer alpha must scale the delta, and the fused weight
    must equal base + (alpha/rank) * down @ up."""
    import torch
    from flax import nnx

    from cflearn_tpu.modules.core.lora import LoRAManager
    from cflearn_tpu.modules.multimodal.diffusion.unet import UNetDiffuser
    from cflearn_tpu.toolkit.tree import tree_to_npd

    class Holder(nnx.Module):
        def __init__(self) -> None:
            self.unet = UNetDiffuser(
                start_channels=32,
                num_res_blocks=2,
                channel_multipliers=(1, 2),
                attention_downsample_rates=(1, 2),
                num_heads=4,
                context_dim=32,
                rngs=nnx.Rngs(0),
            )

    holder = Holder()
    npd = tree_to_npd(nnx.state(holder, nnx.Param))

    # the full surface of mappable kohya names must resolve to real paths
    cases = {
        "lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn1_to_q":
            "unet/input_blocks/0/mods/1/blocks/0/attn1/to_q/kernel/value",
        "lora_unet_down_blocks_1_attentions_1_transformer_blocks_0_attn2_to_out_0":
            "unet/input_blocks/4/mods/1/blocks/0/attn2/to_out/kernel/value",
        "lora_unet_mid_block_attentions_0_transformer_blocks_0_attn2_to_k":
            "unet/mid/mods/1/blocks/0/attn2/to_k/kernel/value",
        # CompVis naming: input_blocks.4 == ours input_blocks/3 (conv_in off)
        "lora_unet_input_blocks_4_1_transformer_blocks_0_attn1_to_v":
            "unet/input_blocks/3/mods/1/blocks/0/attn1/to_v/kernel/value",
        "lora_unet_up_blocks_0_attentions_0_transformer_blocks_0_ff_net_0_proj":
            "unet/output_blocks/0/mods/1/blocks/0/ff/net1/net/kernel/value",
        "lora_unet_up_blocks_1_attentions_2_transformer_blocks_0_ff_net_2":
            "unet/output_blocks/5/mods/1/blocks/0/ff/linear2/kernel/value",
    }
    for key, expected in cases.items():
        assert LoRAManager.torch_lora_key_to_path(key) == expected, key
        assert expected in npd, expected
    assert LoRAManager.torch_lora_key_to_path("lora_te_text_model_encoder_layers_0_self_attn_q_proj") is None

    # fabricate a kohya checkpoint targeting to_q of input block 1
    target = "unet/input_blocks/0/mods/1/blocks/0/attn1/to_q/kernel/value"
    d_in, d_out = npd[target].shape
    rank, alpha = 4, 2.0
    rng = np.random.RandomState(0)
    down = rng.randn(rank, d_in).astype(np.float32) * 0.1  # torch (rank, in)
    up = rng.randn(d_out, rank).astype(np.float32) * 0.1  # torch (out, rank)
    mod = "lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn1_to_q"
    sd = {
        f"{mod}.lora_down.weight": torch.from_numpy(down),
        f"{mod}.lora_up.weight": torch.from_numpy(up),
        f"{mod}.alpha": torch.tensor(alpha),
    }
    ckpt = str(tmp_path / "lora.pt")
    torch.save(sd, ckpt)

    mgr = LoRAManager()
    pack = LoRAManager.load_torch_lora(ckpt)
    assert target in pack.deltas
    base = npd[target].copy()
    mgr.load_pack_with("style", pack)
    mgr.apply_lora(holder, "style")
    fused = tree_to_npd(nnx.state(holder, nnx.Param))[target]
    expected_w = base + (alpha / rank) * (down.T @ up.T)
    np.testing.assert_allclose(fused, expected_w, rtol=1e-5)
    mgr.deactivate(holder)
    np.testing.assert_allclose(tree_to_npd(nnx.state(holder, nnx.Param))[target], base, rtol=1e-6)


def test_lora_incremental_pack_loading() -> None:
    """Regression (code review): packs loaded after the first apply_lora
    whose deltas touch NEW paths were silently never fused."""
    from flax import nnx

    from cflearn_tpu.modules.core.lora import LoRAManager, LoRAPack
    from cflearn_tpu.toolkit.tree import tree_to_npd

    class M(nnx.Module):
        def __init__(self) -> None:
            self.a = nnx.Linear(4, 4, rngs=nnx.Rngs(0))
            self.b = nnx.Linear(4, 4, rngs=nnx.Rngs(1))

    m = M()
    npd0 = tree_to_npd(nnx.state(m, nnx.Param))
    d = np.ones((4, 2), np.float32) * 0.1
    u = np.ones((2, 4), np.float32) * 0.1
    mgr = LoRAManager()
    mgr.load_pack_with("pa", LoRAPack({"a/kernel/value": (d, u)}, rank=2))
    mgr.apply_lora(m, "pa")
    mgr.load_pack_with("pb", LoRAPack({"b/kernel/value": (d, u)}, rank=2))
    mgr.apply_lora(m, "pa", "pb")
    npd = tree_to_npd(nnx.state(m, nnx.Param))
    np.testing.assert_allclose(npd["a/kernel/value"], npd0["a/kernel/value"] + d @ u, rtol=1e-5)
    np.testing.assert_allclose(npd["b/kernel/value"], npd0["b/kernel/value"] + d @ u, rtol=1e-5)
    mgr.deactivate(m)
    npd = tree_to_npd(nnx.state(m, nnx.Param))
    np.testing.assert_allclose(npd["b/kernel/value"], npd0["b/kernel/value"], rtol=1e-6)


def test_clip_extractor_latent_helpers(tmp_path) -> None:
    """Reference `CLIPExtractor` surface (`api/multimodal/clip.py:72-131`):
    PIL inputs, `get_texts_latent`, `get_paths_latent`, `get_folder_latent`
    all resolve to the same embeddings as the ndarray path."""
    import os

    import numpy as np
    from flax import nnx
    from PIL import Image

    import cflearn_tpu as cf
    from cflearn_tpu.modules.multimodal import CLIP

    m = CLIP(img_size=32, latent_dim=16, vision_latent_dim=32, vision_patch_size=8,
             vision_num_layers=1, vision_num_heads=2, text_latent_dim=32,
             text_num_layers=1, text_num_heads=2, rngs=nnx.Rngs(0))
    ex = cf.CLIPExtractor(m)
    rng = np.random.RandomState(0)
    arrs = (rng.rand(2, 32, 32, 3) * 255).astype(np.uint8)
    base = ex.get_image_latent(arrs)
    assert base.shape[0] == 2
    pils = [Image.fromarray(a) for a in arrs]
    np.testing.assert_allclose(ex.get_image_latent(pils), base, atol=1e-5)
    paths = []
    for i, p in enumerate(pils):
        path = str(tmp_path / f"img_{i}.png")
        p.save(path)
        paths.append(path)
    np.testing.assert_allclose(ex.get_paths_latent(paths), base, atol=1e-5)
    np.testing.assert_allclose(ex.get_folder_latent(str(tmp_path)), base, atol=1e-5)
    np.testing.assert_allclose(ex.get_texts_latent("a cat"), ex.get_text_latent("a cat"))


def test_translator_api_paths_and_export(tmp_path) -> None:
    """TranslatorAPI.sr with path/PIL/ndarray inputs + export_path + RGBA
    alpha passthrough (reference `translator.py:20-52`)."""
    import os

    import numpy as np
    from PIL import Image

    from cflearn_tpu.api.cv.translator import TranslatorAPI
    from cflearn_tpu.modules.common import build_module
    from flax import nnx

    m = build_module("rrdb", config={"latent_channels": 8, "growth_channels": 4, "num_blocks": 1}, rngs=nnx.Rngs(0))
    api = TranslatorAPI(m)
    rng = np.random.RandomState(0)
    arr = (rng.rand(16, 16, 3) * 255).astype(np.uint8)
    base = api.sr(arr)
    assert base.shape == (64, 64, 3) and base.dtype == np.uint8
    pil = Image.fromarray(arr)
    path = str(tmp_path / "in.png")
    pil.save(path)
    np.testing.assert_array_equal(api.sr(pil), base)
    np.testing.assert_array_equal(api.sr(path), base)
    # RGBA: alpha upscaled and appended
    rgba = np.concatenate([arr, np.full((16, 16, 1), 128, np.uint8)], axis=-1)
    out_rgba = api.sr(rgba)
    assert out_rgba.shape == (64, 64, 4)
    export = str(tmp_path / "out.png")
    api.sr(arr, export)
    assert os.path.isfile(export)
