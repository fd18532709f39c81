"""Trainer end-to-end tests: train → predict → save → load equivalence
(reference analogue: `tests/test_pipeline.py:54-126`)."""

import os

import numpy as np

from cflearn_tpu.data import ArrayData
from cflearn_tpu.inference import DLInference
from cflearn_tpu.monitors import BasicMonitor
from cflearn_tpu.schema import DLConfig, TrainerConfig
from cflearn_tpu.schema.metrics_schema import IMetric
from cflearn_tpu.schema.model import IDLModel
from cflearn_tpu.trainer import Trainer, get_scores


def _toy_cls_data(n: int = 256, dim: int = 8):
    x = np.random.randn(n, dim).astype(np.float32)
    w = np.random.randn(dim, 1).astype(np.float32)
    y = (x @ w > 0).astype(np.int64)
    return x, y


def test_fit_improves_and_checkpoints(tmp_path) -> None:
    x, y = _toy_cls_data()
    config = DLConfig(
        module_name="fcnn",
        module_config={"input_dim": 8, "output_dim": 2, "hidden_units": [32]},
        loss_name="cross_entropy",
    )
    model = IDLModel.from_config(config)
    data = ArrayData.init().fit(x, y, x_valid=x[:64], y_valid=y[:64])
    trainer = Trainer(
        TrainerConfig(workspace=str(tmp_path), num_epoch=20, lr=3.0e-3),
        metrics=IMetric.fuse("acc"),
        monitors=[BasicMonitor()],
    )
    trainer.fit(data, model)
    assert trainer.final_results is not None
    assert trainer.final_results.metric_values["acc"] > 0.8
    scores = get_scores(trainer.checkpoint_folder)
    assert scores, "checkpoints should be written"
    for file in scores:
        assert os.path.isfile(os.path.join(trainer.checkpoint_folder, file))


def test_save_load_equivalence(tmp_path) -> None:
    x, y = _toy_cls_data(128)
    config = DLConfig(
        module_name="fcnn",
        module_config={"input_dim": 8, "output_dim": 2, "hidden_units": [16]},
        loss_name="cross_entropy",
    )
    model = IDLModel.from_config(config)
    data = ArrayData.init().fit(x, y)
    trainer = Trainer(
        TrainerConfig(workspace=str(tmp_path), num_epoch=2),
        monitors=[BasicMonitor()],
    )
    trainer.fit(data, model)
    path = str(tmp_path / "model.npz")
    model.save(path)
    loaded = IDLModel.load(path)
    loader = data.build_loader(x[:32])
    p1 = DLInference(model=model).get_outputs(loader).forward_results["predictions"]
    p2 = DLInference(model=loaded).get_outputs(loader).forward_results["predictions"]
    np.testing.assert_allclose(p1, p2, atol=1e-6)


def test_fixed_steps_debug_mode(tmp_path) -> None:
    x, y = _toy_cls_data(64)
    config = DLConfig(
        module_name="linear",
        module_config={"input_dim": 8, "output_dim": 2},
        loss_name="cross_entropy",
    )
    model = IDLModel.from_config(config)
    data = ArrayData.init().fit(x, y)
    trainer = Trainer(
        TrainerConfig(workspace=str(tmp_path), fixed_steps=1),
        monitors=[BasicMonitor()],
    )
    trainer.fit(data, model)
    assert trainer.state is not None and trainer.state.step == 1


def test_losses_as_metrics(tmp_path) -> None:
    x = np.random.randn(64, 4).astype(np.float32)
    y = np.random.randn(64, 1).astype(np.float32)
    config = DLConfig(
        module_name="linear",
        module_config={"input_dim": 4, "output_dim": 1},
        loss_name="mse",
    )
    model = IDLModel.from_config(config)
    data = ArrayData.init().fit(x, y)
    trainer = Trainer(
        TrainerConfig(workspace=str(tmp_path), num_epoch=2),
        monitors=[BasicMonitor()],
    )
    trainer.fit(data, model)
    assert trainer.final_results is not None
    assert "loss" in trainer.final_results.metric_values


def test_grad_accumulate_and_clip(tmp_path) -> None:
    x, y = _toy_cls_data(64)
    config = DLConfig(
        module_name="linear",
        module_config={"input_dim": 8, "output_dim": 2},
        loss_name="cross_entropy",
    )
    model = IDLModel.from_config(config)
    data = ArrayData.init().fit(x, y)
    trainer = Trainer(
        TrainerConfig(
            workspace=str(tmp_path),
            num_epoch=2,
            grad_accumulate=2,
            clip_norm=1.0,
        ),
        monitors=[BasicMonitor()],
    )
    trainer.fit(data, model)
    assert trainer.state is not None and trainer.state.step > 0


def test_scheduler_warmup(tmp_path) -> None:
    x, y = _toy_cls_data(64)
    config = DLConfig(
        module_name="linear",
        module_config={"input_dim": 8, "output_dim": 2},
        loss_name="cross_entropy",
    )
    model = IDLModel.from_config(config)
    data = ArrayData.init().fit(x, y)
    trainer = Trainer(
        TrainerConfig(
            workspace=str(tmp_path),
            num_epoch=2,
            scheduler_name="warmup",
            scheduler_config={"warmup_step": 4},
        ),
        monitors=[BasicMonitor()],
    )
    trainer.fit(data, model)
    assert trainer.state is not None and trainer.state.step > 0


def test_sharded_checkpoint_roundtrip(tmp_path) -> None:
    """Orbax sharded save/load (SURVEY §5.4): config+states round-trip."""
    import numpy as np

    from cflearn_tpu.schema.config import DLConfig
    from cflearn_tpu.schema.model import IDLModel

    config = DLConfig(module_name="fcnn", module_config={"input_dim": 4, "output_dim": 2})
    model = IDLModel.get("common")(config)
    model.build(config)
    d = str(tmp_path / "sharded_ckpt")
    model.save_sharded(d)
    loaded = IDLModel.load_sharded(d)
    a = model.state_dict()
    b = loaded.state_dict()
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k])


def test_async_checkpoint_retention_paths(tmp_path) -> None:
    """Regression (code review): the async checkpoint writer closed over
    `path`, which the top-k retention loop rebinding clobbered — checkpoints
    were written under stale filenames and scores.json pointed at missing
    files. Every retained file must exist and restore must succeed."""
    x, y = _toy_cls_data()
    config = DLConfig(
        module_name="fcnn",
        module_config={"input_dim": 8, "output_dim": 2, "hidden_units": [16]},
        loss_name="cross_entropy",
    )
    model = IDLModel.from_config(config)
    data = ArrayData.init().fit(x, y, x_valid=x[:64], y_valid=y[:64])
    trainer = Trainer(
        TrainerConfig(
            workspace=str(tmp_path),
            num_epoch=12,
            lr=3.0e-3,
            max_snapshot_file=1,  # force retention on every later save
            async_checkpointing=True,
        ),
        metrics=IMetric.fuse("acc"),
        monitors=[BasicMonitor()],
    )
    trainer.fit(data, model)
    scores = get_scores(trainer.checkpoint_folder)
    assert scores and len(scores) <= 1
    for file in scores:
        assert os.path.isfile(os.path.join(trainer.checkpoint_folder, file)), file
    assert trainer.restore_checkpoint()


def test_async_checkpoint_survives_donated_buffers(tmp_path) -> None:
    """Regression: with `donate_buffers` on, the async checkpoint snapshot
    held the exact device buffers the NEXT train step donates, so the
    deferred host pull raised "Buffer has been deleted or donated" (surfaced
    on drain at fit end / restore). The snapshot must own device-side copies."""
    x, y = _toy_cls_data()
    config = DLConfig(
        module_name="fcnn",
        module_config={"input_dim": 8, "output_dim": 2, "hidden_units": [16]},
        loss_name="cross_entropy",
    )
    model = IDLModel.from_config(config)
    data = ArrayData.init().fit(x, y, x_valid=x[:64], y_valid=y[:64])
    trainer = Trainer(
        TrainerConfig(
            workspace=str(tmp_path),
            num_epoch=8,
            lr=3.0e-3,
            async_checkpointing=True,
            donate_buffers=True,
        ),
        metrics=IMetric.fuse("acc"),
        monitors=[BasicMonitor()],
    )
    trainer.fit(data, model)  # drains async writes at the end — used to raise
    assert trainer.restore_checkpoint()


def test_artifact_callbacks_write_images(tmp_path) -> None:
    """Regression (code review): the trainer never invoked `log_artifacts`,
    so artifact callbacks were dead code. A VAE fit with the generator
    callback must write image grids under the workspace."""
    import glob

    np.random.seed(0)
    x = (np.random.rand(32, 16, 16, 3).astype(np.float32) * 2 - 1)
    from cflearn_tpu.data import ArrayData
    from cflearn_tpu.monitors import LazyMonitor

    data = ArrayData.init().fit(x)
    config = DLConfig(
        model="vae",
        module_name="vae",
        module_config={"img_size": 16, "latent_dim": 8, "num_downsample": 2},
    )
    model = IDLModel.from_config(config)
    trainer = Trainer(
        TrainerConfig(workspace=str(tmp_path), fixed_steps=2, callback_names=["generator"]),
        monitors=[LazyMonitor()],
    )
    trainer.fit(data, model)
    arts = glob.glob(os.path.join(str(tmp_path), "**", "original.png*"), recursive=True)
    assert arts, "generator callback must dump original.png at artifact steps"
    # reference-style per-model callback names resolve too
    from cflearn_tpu.schema.train_schema import TrainerCallback

    for name in ("ldm", "ddpm", "ae_kl", "ae_vq", "vae", "gan", "vq_vae"):
        assert name in TrainerCallback.d, name


def test_preemption_dump_and_resume(tmp_path) -> None:
    """SIGTERM mid-training writes a resumable dump (model + optimizer states
    + counters) to the workspace root; a later fit against the same root
    resumes from it and removes it on normal completion (SURVEY §5.3 —
    preemption-safe checkpointing)."""
    import json as _json
    import signal

    from cflearn_tpu.monitors import LazyMonitor

    x, y = _toy_cls_data(64)
    config = DLConfig(
        module_name="fcnn",
        module_config={"input_dim": 8, "output_dim": 2, "hidden_units": [16]},
        loss_name="cross_entropy",
    )
    model = IDLModel.from_config(config)
    data = ArrayData.init().fit(x, y)
    trainer = Trainer(
        TrainerConfig(workspace=str(tmp_path), fixed_steps=6, lr=3.0e-3),
        monitors=[LazyMonitor()],
    )
    orig_get = trainer.get_step_fn
    calls = {"n": 0}

    def counting_get(actives):
        fn = orig_get(actives)

        def inner(*args):
            calls["n"] += 1
            if calls["n"] == 2:
                signal.raise_signal(signal.SIGTERM)
            return fn(*args)

        return inner

    trainer.get_step_fn = counting_get
    trainer.fit(data, model, skip_final_evaluation=True)
    pre = trainer.preemption_folder
    assert os.path.isfile(os.path.join(pre, "model.npz"))
    assert os.path.isfile(os.path.join(pre, "optimizers.npz"))
    with open(os.path.join(pre, "meta.json")) as f:
        meta = _json.load(f)
    assert meta["step"] == 2
    assert calls["n"] == 2, "training must stop after the in-flight step"

    # resume: same workspace root → only the remaining 4 steps run
    model2 = IDLModel.from_config(config)
    trainer2 = Trainer(
        TrainerConfig(workspace=str(tmp_path), fixed_steps=6, lr=3.0e-3),
        monitors=[LazyMonitor()],
    )
    orig_get2 = trainer2.get_step_fn
    calls2 = {"n": 0}

    def counting_get2(actives):
        fn = orig_get2(actives)

        def inner(*args):
            calls2["n"] += 1
            return fn(*args)

        return inner

    trainer2.get_step_fn = counting_get2
    trainer2.fit(data, model2, skip_final_evaluation=True)
    assert trainer2.state is not None and trainer2.state.step == 6
    assert calls2["n"] == 4, "resume must skip the already-run steps"
    # normal completion invalidates the dump
    assert not os.path.isdir(pre)


def test_amp_bf16_compute_f32_masters(tmp_path) -> None:
    """`mixed_precision="bf16"` (SURVEY §2.10 AMP; reference forwards
    accelerate's mixed_precision, `trainer.py:226-229`): the compiled step
    must run its matmuls in bf16 while master params, optimizer updates and
    the stored state stay f32 — and the model must still learn."""
    import jax
    import jax.numpy as jnp

    x, y = _toy_cls_data()
    config = DLConfig(
        module_name="fcnn",
        module_config={"input_dim": 8, "output_dim": 2, "hidden_units": [32]},
        loss_name="cross_entropy",
    )
    model = IDLModel.from_config(config)
    data = ArrayData.init().fit(x, y, x_valid=x[:64], y_valid=y[:64])
    trainer = Trainer(
        TrainerConfig(
            workspace=str(tmp_path), num_epoch=20, lr=3.0e-3, mixed_precision="bf16"
        ),
        metrics=IMetric.fuse("acc"),
        monitors=[BasicMonitor()],
    )
    trainer.fit(data, model)
    assert trainer.final_results is not None
    assert trainer.final_results.metric_values["acc"] > 0.8

    # master params stayed f32 end-to-end
    leaves = jax.tree_util.tree_leaves(trainer._full_state)
    assert all(
        leaf.dtype == jnp.float32
        for leaf in leaves
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating)
    )

    # the compiled program really computes in bf16: every dot in the jaxpr
    # takes bf16 operands (the cast happens inside the loss)
    fn = trainer.get_step_fn((True,))
    batch = {k: jnp.asarray(v) for k, v in dict(next(iter(trainer.train_loader))).items() if v is not None}
    jaxpr = str(jax.make_jaxpr(fn)(trainer._full_state, trainer._opt_states, {}, batch))
    assert "bf16" in jaxpr, "AMP step must contain bf16 compute"


def test_update_scheduler_per_epoch(tmp_path) -> None:
    """`update_scheduler_per_epoch=True` advances the schedule once per EPOCH
    (reference `Trainer.scheduler_step`, `trainer.py:178-198`): the optax
    schedule sees the epoch index, not the raw step count."""
    import numpy as np_

    x, y = _toy_cls_data(n=64)
    config = DLConfig(
        module_name="fcnn",
        module_config={"input_dim": 8, "output_dim": 2, "hidden_units": [16]},
        loss_name="cross_entropy",
        scheduler_name="exponential",
        scheduler_config={"gamma": 0.5},
        update_scheduler_per_epoch=True,
        num_epoch=2,
    )
    from cflearn_tpu.schema.data import DataConfig

    model = IDLModel.from_config(config)
    dc = DataConfig()
    dc.batch_size = 16
    data = ArrayData.init(dc).fit(x, y)
    trainer = Trainer(config, monitors=[BasicMonitor()])
    trainer.fit(data, model, skip_final_evaluation=True)
    sched = trainer.schedules["all"]
    steps_per_epoch = trainer._num_step_per_epoch
    assert steps_per_epoch == 4  # 64 / 16
    lr0 = float(sched(0))
    # constant within the first epoch...
    assert float(sched(steps_per_epoch - 1)) == lr0
    # ...and halved exactly at each epoch boundary
    assert np_.isclose(float(sched(steps_per_epoch)), lr0 * 0.5)
    assert np_.isclose(float(sched(3 * steps_per_epoch)), lr0 * 0.125)


def test_remat_training_step(tmp_path) -> None:
    """`TrainerConfig.remat=True` wraps the loss in `jax.checkpoint`
    (activation checkpointing, SURVEY §2.10; reference relies on torch's
    per-module `use_checkpoint` flags instead): the compiled step carries a
    remat region and still trains to the same accuracy."""
    import jax
    import jax.numpy as jnp

    x, y = _toy_cls_data()
    config = DLConfig(
        module_name="fcnn",
        module_config={"input_dim": 8, "output_dim": 2, "hidden_units": [32]},
        loss_name="cross_entropy",
    )
    model = IDLModel.from_config(config)
    data = ArrayData.init().fit(x, y, x_valid=x[:64], y_valid=y[:64])
    trainer = Trainer(
        TrainerConfig(workspace=str(tmp_path), num_epoch=20, lr=3.0e-3, remat=True),
        metrics=IMetric.fuse("acc"),
        monitors=[BasicMonitor()],
    )
    trainer.fit(data, model)
    assert trainer.final_results is not None
    assert trainer.final_results.metric_values["acc"] > 0.8
    fn = trainer.get_step_fn((True,))
    batch = {
        k: jnp.asarray(v)
        for k, v in dict(next(iter(trainer.train_loader))).items()
        if v is not None
    }
    jaxpr = str(jax.make_jaxpr(fn)(trainer._full_state, trainer._opt_states, {}, batch))
    assert "remat" in jaxpr, "remat step must contain a checkpoint region"

    # selective remat: a jax.checkpoint_policies NAME is accepted too — the
    # step still carries a checkpoint region (with a saveable-filter policy)
    # and trains; values are policy-independent (guarded exhaustively at the
    # module level by tests/test_models.py::test_unet_remat_variants_match)
    trainer2 = Trainer(
        TrainerConfig(
            workspace=str(tmp_path / "sel"),
            num_epoch=2,
            lr=3.0e-3,
            remat="dots_saveable",
        ),
        metrics=IMetric.fuse("acc"),
        monitors=[BasicMonitor()],
    )
    trainer2.fit(data, IDLModel.from_config(config), skip_final_evaluation=True)
    fn2 = trainer2.get_step_fn((True,))
    jaxpr2 = str(
        jax.make_jaxpr(fn2)(trainer2._full_state, trainer2._opt_states, {}, batch)
    )
    assert "remat" in jaxpr2, "policy remat step must contain a checkpoint region"


def test_optimizer_packs(tmp_path) -> None:
    """List-form `optimizer_packs` (reference `OptimizerPack`,
    `pipeline/blocks/basic.py:414-437`) merge into the per-scope settings:
    dicts and NamedTuple packs both work, later packs win for their scope,
    and `scheduler_name="none"` disables the default warmup."""
    from cflearn_tpu.optimizers import OptimizerPack

    config = TrainerConfig(
        workspace=str(tmp_path),
        optimizer_packs=[
            {"scope": "all", "optimizer_name": "sgd", "lr": 0.05, "scheduler_name": "none"},
            OptimizerPack("d", "adamw", optimizer_config={"lr": 1.0e-4}),
        ],
    )
    trainer = Trainer(config, monitors=[BasicMonitor()])
    settings = trainer._default_optimizer_settings()
    assert settings["all"]["optimizer"] == "sgd"
    assert settings["all"]["optimizer_config"]["lr"] == 0.05
    assert settings["all"]["scheduler"] is None
    assert settings["d"]["optimizer"] == "adamw"
    assert settings["d"]["optimizer_config"]["lr"] == 1.0e-4

    # end-to-end: the pack-configured trainer still fits
    x, y = _toy_cls_data(128)
    dl = DLConfig(
        module_name="fcnn",
        module_config={"input_dim": 8, "output_dim": 2, "hidden_units": [16]},
        loss_name="cross_entropy",
        workspace=str(tmp_path),
        num_epoch=2,
        optimizer_packs=[{"scope": "all", "optimizer_name": "sgd", "lr": 0.05}],
    )
    model = IDLModel.from_config(dl)
    data = ArrayData.init().fit(x, y)
    t2 = Trainer(dl, monitors=[BasicMonitor()])
    t2.fit(data, model, skip_final_evaluation=True)
    assert t2._default_optimizer_settings()["all"]["optimizer"] == "sgd"


def test_validation_split(tmp_path) -> None:
    """`TrainerConfig.validation_split` carves a seeded validation set out of
    the train arrays when the caller provided none."""
    x, y = _toy_cls_data(n=256)
    config = DLConfig(
        module_name="fcnn",
        module_config={"input_dim": 8, "output_dim": 2, "hidden_units": [16]},
        loss_name="cross_entropy",
        workspace=str(tmp_path),
        num_epoch=2,
        validation_split=0.25,
        metric_names="acc",
    )
    model = IDLModel.from_config(config)
    data = ArrayData.init().fit(x, y)
    trainer = Trainer(config, metrics=IMetric.fuse("acc"), monitors=[BasicMonitor()])
    trainer.fit(data, model)
    assert trainer.valid_loader is not None
    assert data.num_valid == 64
    assert data.num_train == 192
    # rows are partitioned, not duplicated
    all_rows = np.concatenate([data.bundle.x_train, data.bundle.x_valid], axis=0)
    assert all_rows.shape == x.shape
    assert np.allclose(np.sort(all_rows, axis=0), np.sort(x, axis=0))
    # providing a valid set explicitly bypasses the split
    data2 = ArrayData.init().fit(x, y, x_valid=x[:10], y_valid=y[:10])
    data2.split_validation(0.5)
    assert data2.num_valid == 10


def test_steps_per_dispatch_parity(tmp_path) -> None:
    """k-step fused dispatch (`steps_per_dispatch`, VERDICT r4 #3) is
    numerically identical to k single steps: same final params, same
    optimizer state, same step count — chunk boundaries land on the
    monitor/log cadence so callback/monitor semantics match too."""
    import jax

    from cflearn_tpu.toolkit.misc import seed_everything

    def run(k: int):
        seed_everything(777)
        x, y = _toy_cls_data(64)
        config = DLConfig(
            module_name="fcnn",
            module_config={"input_dim": 8, "output_dim": 2, "hidden_units": [16]},
            loss_name="cross_entropy",
        )
        model = IDLModel.from_config(config)
        data = ArrayData.init().fit(x, y)
        trainer = Trainer(
            TrainerConfig(
                workspace=str(tmp_path / f"k{k}"),
                num_epoch=2,
                lr=1.0e-2,
                steps_per_dispatch=k,
            ),
            monitors=[BasicMonitor()],
        )
        trainer.fit(data, model)
        return trainer

    t1 = run(1)
    t3 = run(3)  # 4 steps/epoch, snapshot cadence 2 → chunks must cut at 2
    assert t1.state is not None and t3.state is not None
    assert t1.state.step == t3.state.step
    for a, b in zip(
        jax.tree_util.tree_leaves(t1._full_state),
        jax.tree_util.tree_leaves(t3._full_state),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=0)
    for a, b in zip(
        jax.tree_util.tree_leaves(t1._opt_states),
        jax.tree_util.tree_leaves(t3._opt_states),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=0)


def test_steps_per_dispatch_actives_cut(tmp_path) -> None:
    """_fusable_len cuts chunks where the active train-step set changes and
    at cadence boundaries (bit-identical monitor semantics)."""
    x, y = _toy_cls_data(64)
    config = DLConfig(
        module_name="linear",
        module_config={"input_dim": 8, "output_dim": 2},
        loss_name="cross_entropy",
    )
    model = IDLModel.from_config(config)
    data = ArrayData.init().fit(x, y)
    trainer = Trainer(
        TrainerConfig(workspace=str(tmp_path), fixed_steps=7, steps_per_dispatch=8),
        monitors=[BasicMonitor()],
    )
    trainer.fit(data, model)
    assert trainer.state is not None and trainer.state.step == 7

    # cadence alignment: from step s, a chunk never crosses the snapshot or
    # log boundary
    state = trainer.state
    state.step = state.num_step_per_snapshot - 1
    assert trainer._fusable_len(state, 100, trainer.model) == 1
    state.step = state.num_step_per_snapshot
    assert trainer._fusable_len(state, 100, trainer.model) == min(
        100, state.num_step_per_snapshot, state.num_step_per_log
    )
