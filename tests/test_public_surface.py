"""Top-level namespace parity with the reference package.

The reference `cflearn/__init__.py` star-imports every layer, flattening
~415 public names to the package top level; a migrating user writes
`cflearn.X` → `cflearn_tpu.X` for every one of them.
`tests/data/reference_exports.json` is the frozen snapshot of the
reference's star-exported `__all__` union (regenerate with the AST scanner
over `/root/reference/cflearn` if the reference ever changes).
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

import cflearn_tpu as cf

_SNAPSHOT = os.path.join(os.path.dirname(__file__), "data", "reference_exports.json")


def test_reference_export_surface_complete() -> None:
    with open(_SNAPSHOT) as f:
        names = json.load(f)
    assert len(names) >= 400
    missing = [n for n in names if not hasattr(cf, n)]
    assert not missing, f"reference names missing from cflearn_tpu: {missing}"


def test_repvgg_deploy_fusion_matches_train_branches() -> None:
    """Structural reparameterization: fused single-conv inference must match
    the 3-branch training form (reference `backbone/models/vgg.py`
    switch_to_deploy)."""
    m = cf.RepVGG([1, 1, 2, 1], [0.75, 0.75, 0.75, 2.5], rngs=nnx.Rngs(0))
    m.eval()
    x = np.random.RandomState(0).rand(2, 32, 32, 3).astype(np.float32)
    y0 = np.asarray(m(x))
    m.switch_to_deploy()
    y1 = np.asarray(m(x))
    np.testing.assert_allclose(y0, y1, atol=1e-5)


def test_backbone_feature_pyramid_and_mix_vit() -> None:
    x = np.random.RandomState(1).rand(1, 64, 64, 3).astype(np.float32)
    bb = cf.Backbone("rep_vgg_lite", rngs=nnx.Rngs(0))
    bb.eval()
    feats = bb(x)
    assert "latent" in feats and feats["stage1"].shape == (1, 32, 32, 48)
    assert [feats[s].shape[-1] for s in bb.stage_names] == bb.out_channels

    mv = cf.mix_vit_lite(rngs=nnx.Rngs(0))
    out = mv(x)
    assert out.shape == (1, 2, 2, 256)
    assert np.isfinite(np.asarray(out)).all()

    b1 = cf.BackboneEncoder1D("mix_vit_lite", rngs=nnx.Rngs(0))
    assert b1(x).shape == (1, 256)


def test_small_module_parity_helpers() -> None:
    rngs = nnx.Rngs(0)
    # poolers
    net = np.random.RandomState(0).rand(2, 5, 8).astype(np.float32)
    assert cf.BertPooler(8, rngs=rngs)(net).shape == (2, 8)
    assert cf.SequencePooler(8, rngs=rngs)(net).shape == (2, 8)
    # max pool indices round trip through MaxUnpool2d
    from cflearn_tpu.modules.core.convs import max_pool2d_with_indices

    x = np.random.RandomState(0).rand(1, 4, 4, 2).astype(np.float32)
    vals, idxs = max_pool2d_with_indices(x, 2)
    unpooled = cf.MaxUnpool2d(2)(vals, idxs, (4, 4))
    assert unpooled.shape == x.shape
    # every pooled max lands back at its argmax position
    assert np.allclose(np.sort(np.unique(np.asarray(unpooled)))[-4:], np.sort(np.asarray(vals).ravel())[-4:])
    # GaussianBlur3 preserves constants
    ones = np.ones((1, 8, 8, 3), np.float32)
    blurred = cf.GaussianBlur3(3)(ones)
    np.testing.assert_allclose(np.asarray(blurred)[:, 1:-1, 1:-1], 1.0, rtol=1e-6)
    # Route/LeafAggregation functional equivalents
    planes = np.random.RandomState(0).randn(2, 3, 3).astype(np.float32)
    path = np.array([[1, 1, 0], [1, 1, 0], [1, 0, 1], [1, 0, 1]], np.float32)
    sign = np.array([[0, 0, 0], [0, 1, 0], [1, 0, 0], [1, 0, 1]], np.float32)
    probs = cf.route(planes, path, sign)
    assert probs.shape == (2, 3, 4)
    np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, rtol=1e-5)


def test_optimizer_pack_accepted_by_trainer_settings() -> None:
    from cflearn_tpu.monitors import LazyMonitor
    from cflearn_tpu.schema import DLConfig, TrainerConfig
    from cflearn_tpu.schema.model import IDLModel
    from cflearn_tpu.trainer import Trainer
    from cflearn_tpu.data import ArrayData

    x = np.random.RandomState(0).rand(16, 8).astype(np.float32)
    y = x.sum(1, keepdims=True).astype(np.float32)
    config = DLConfig(
        model="common",
        module_name="fcnn",
        module_config={"input_dim": 8, "output_dim": 1},
        loss_name="mse",
    )
    model = IDLModel.from_config(config)
    pack = cf.OptimizerPack("all", "sgd", optimizer_config={"lr": 1e-2})
    trainer = Trainer(
        TrainerConfig(
            workspace="/tmp/test_opt_pack",
            fixed_steps=1,
            callback_names=[],
            optimizer_settings={"all": pack},
        ),
        monitors=[LazyMonitor()],
    )
    trainer.fit(ArrayData.init().fit(x, y), model)
    assert trainer.state is not None and trainer.state.step == 1


def test_ml_encoder_settings_dataclasses() -> None:
    settings = {"0": cf.MLEncoderSettings(dim=4, methods="one_hot")}
    config = cf.MLConfig(
        model="ml.common",
        module_name="fcnn",
        module_config={"input_dim": 3, "output_dim": 2},
        encoder_settings=settings,
        infer_encoder_settings=False,
    )
    assert isinstance(config.encoder_settings["0"], dict)
    assert config.encoder_settings["0"]["dim"] == 4


def test_ml_encode_without_encoder() -> None:
    """Regression (code review): `ml_encode(None, net)` crashed with a
    TypeError — MLEncodePack was constructed with the reference's 5-field
    shape instead of this repo's 3-field dataclass."""
    net = np.random.RandomState(0).rand(4, 3).astype(np.float32)
    pack = cf.ml_encode(None, net)
    assert pack.one_hot is None and pack.embedding is None
    np.testing.assert_array_equal(np.asarray(pack.numerical), net)
    np.testing.assert_array_equal(np.asarray(pack.merged), net)


def test_load_pretrained_weights_index_lookup() -> None:
    """Regression (code review): valid tags live under
    available.json['checkpoints'] — the top-level lookup rejected every
    registered checkpoint."""
    from cflearn_tpu.zoo.common import get_available, load_pretrained_weights

    index = get_available()["checkpoints"]
    assert "lpips" in index  # registered tag passes the gate...
    with np.testing.assert_raises(ValueError):
        load_pretrained_weights(None, "definitely-not-a-tag")
    # ...and the registered-tag path proceeds past registration (download
    # itself is exercised by the zoo download tests / needs network)


def test_deepcache_cut_clamped_to_architecture() -> None:
    """Regression (code review): the default cut=3 on a small UNet used to
    capture a negative output-block index and crash at trace time with a
    lax.cond pytree mismatch."""
    from cflearn_tpu.modules.multimodal.diffusion import DDPM, ISampler

    ddpm = DDPM(
        img_size=8,
        in_channels=3,
        out_channels=3,
        num_timesteps=10,
        condition_type="adm",
        unet_config=dict(
            start_channels=32,
            num_res_blocks=1,
            channel_multipliers=(1, 2),
            attention_downsample_rates=(),
            num_heads=4,
            context_dim=None,
            use_spatial_transformer=False,
            num_classes=4,
        ),
        rngs=nnx.Rngs(0),
    )
    ddpm.deepcache_interval = 2  # default cut=3 > what this UNet supports
    z = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 3))
    s = ISampler.make("ddim", {"model": ddpm})
    out = s.sample(z, cond=jnp.asarray([1]), num_steps=4)
    assert np.isfinite(np.asarray(out)).all()


def test_no_export_is_an_empty_stub() -> None:
    """Surface hardening (VERDICT r2 weak #4): `hasattr` alone would pass a
    `class X: pass` stub. Every exported name must resolve to a real object:
    classes must originate in this package (or a vetted dependency) and carry
    an implementation body; functions must have real code; aliases must be
    identity-bound to their implementations."""
    import dataclasses
    import enum
    import inspect

    with open(_SNAPSHOT) as f:
        names = json.load(f)
    offenders = []
    for name in names:
        obj = getattr(cf, name)
        if obj is None:
            offenders.append(f"{name}: None")
            continue
        if inspect.isclass(obj):
            mod = getattr(obj, "__module__", "")
            if not (mod.startswith("cflearn_tpu") or mod.split(".")[0] in
                    {"flax", "optax", "jax", "builtins", "enum", "typing"}):
                offenders.append(f"{name}: foreign module {mod}")
                continue
            if issubclass(obj, (enum.Enum,)) or dataclasses.is_dataclass(obj):
                continue
            boiler = {
                "__dict__", "__weakref__", "__module__", "__doc__",
                "__firstlineno__", "__static_attributes__", "__parameters__",
                "__orig_bases__", "__abstractmethods__", "_abc_impl",
            }
            body = [k for k in vars(obj) if k not in boiler]
            inherits_impl = obj.__bases__ != (object,)
            if not body and not inherits_impl:
                offenders.append(f"{name}: empty class body")
        elif inspect.isfunction(obj):
            # a `pass` stub compiles to <=4 bytes of bytecode
            if len(obj.__code__.co_code) <= 4 and not obj.__code__.co_names:
                offenders.append(f"{name}: empty function body")
    assert not offenders, offenders


def test_compat_aliases_are_identity_bound() -> None:
    """The documented rename aliases (docs/migration.md) must BE the real
    implementations — each of which has its own functional tests — not
    lookalike stubs."""
    from cflearn_tpu.data import DeviceBatcher
    from cflearn_tpu.data.external import ExternalData, ExternalDataset
    from cflearn_tpu.modules.multimodal.diffusion.samplers import (
        DDPMSampler,
        DPMSolverSampler,
    )

    assert cf.TensorBatcher is DeviceBatcher
    assert cf.TorchData is ExternalData
    assert cf.TorchDataset is ExternalDataset
    assert cf.TorchDataLoader is ExternalData
    assert cf.BasicSampler is DDPMSampler
    assert cf.DPMSolver is DPMSolverSampler
    assert cf.iris_dataset is cf.iris_data
    assert cf.digits_dataset is cf.digits_data
    assert cf.breast_dataset is cf.breast_data
    assert cf.california_dataset is cf.california_data
    assert cf._LogMetricsMsgCallback is cf.LogMetricsMsgCallback
    assert cf.GANLoss is cf.gan_loss
    assert cf.GradientNormLoss is cf.gradient_norm_penalty
