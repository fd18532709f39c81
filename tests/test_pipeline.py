"""Pipeline-level integration tests: fit_ml → predict → save → load →
equivalence; ensemble fusion math (reference analogue:
`tests/test_pipeline.py:54-126`)."""

import os

import numpy as np
import pytest

import cflearn_tpu as cf
from cflearn_tpu.data.ml.api import MLData
from cflearn_tpu.pipeline.api import DLPipelineSerializer


def _toy(n: int = 120, dim: int = 6):
    x = np.random.randn(n, dim).astype(np.float32)
    w = np.random.randn(dim, 1).astype(np.float32)
    y = (x @ w > 0).astype(np.int64)
    return x, y


def _debug_config(**kwargs) -> cf.MLConfig:
    config = cf.MLConfig(module_name="fcnn", **kwargs)
    config.num_epoch = 2
    return config


def test_fit_ml_predict_save_load(tmp_path) -> None:
    x, y = _toy()
    config = _debug_config(workspace=str(tmp_path))
    p = cf.fit_ml(x, y, config=config)
    preds = p.predict(x[:16], return_classes=True)["predictions"]
    assert preds.shape == (16, 1)
    probs = p.predict(x[:16], return_probabilities=True)["predictions"]
    np.testing.assert_allclose(probs.sum(axis=-1), 1.0, atol=1e-5)

    pipeline_folder = os.path.join(p._workspace, "pipeline")
    loaded = cf.load_inference(pipeline_folder)
    p2 = loaded.predict(x[:16], return_classes=True)["predictions"]
    np.testing.assert_array_equal(preds, p2)

    # raw predictions should match across the round trip exactly
    raw1 = p.predict(x[:16])["predictions"]
    raw2 = loaded.predict(x[:16])["predictions"]
    np.testing.assert_allclose(raw1, raw2, atol=1e-6)


def test_ml_defaults_from_data(tmp_path) -> None:
    x, y = _toy()
    config = _debug_config(workspace=str(tmp_path))
    p = cf.fit_ml(x, y, config=config)
    # classification inferred → cross_entropy loss + acc metric
    assert p.config.loss_name == "cross_entropy"
    assert p.config.metric_names == ["acc"]
    assert p.config.module_config["input_dim"] == 6
    assert p.config.module_config["output_dim"] == 2


def test_regression_label_recovery(tmp_path) -> None:
    x = np.random.randn(100, 4).astype(np.float32)
    y = (x.sum(axis=1, keepdims=True) * 10.0 + 100.0).astype(np.float32)
    config = _debug_config(workspace=str(tmp_path))
    config.num_epoch = 5
    p = cf.fit_ml(x, y, config=config)
    preds = p.predict(x[:8])["predictions"]
    # labels were normalized internally; recovery should bring them back to
    # the original scale (roughly around 100)
    assert abs(float(np.mean(preds)) - 100.0) < 50.0


def test_evaluate_report(tmp_path) -> None:
    x, y = _toy()
    config = _debug_config(workspace=str(tmp_path))
    p = cf.fit_ml(x, y, config=config)
    results = cf.evaluate(p, x, y, metrics="acc", verbose=False)
    assert "pipeline" in results
    assert "acc" in results["pipeline"].metric_values


def test_fuse_inference(tmp_path) -> None:
    x, y = _toy()
    folders = []
    for i in range(2):
        config = _debug_config(workspace=str(tmp_path / str(i)))
        p = cf.fit_ml(x, y, config=config)
        folders.append(os.path.join(p._workspace, "pipeline"))
    fused = DLPipelineSerializer.fuse_inference(folders)
    individual = [cf.load_inference(f).predict(x[:8])["predictions"] for f in folders]
    fused_preds = fused.predict(x[:8])["predictions"]
    np.testing.assert_allclose(fused_preds, np.mean(individual, axis=0), atol=1e-5)


def test_pack(tmp_path) -> None:
    x, y = _toy()
    config = _debug_config(workspace=str(tmp_path / "ws"))
    p = cf.fit_ml(x, y, config=config)
    export = cf.pack(p._workspace, str(tmp_path / "packed"))
    loaded = cf.load_inference(export)
    preds = loaded.predict(x[:4], return_classes=True)["predictions"]
    assert preds.shape == (4, 1)


def test_load_training_resume(tmp_path) -> None:
    x, y = _toy()
    config = _debug_config(workspace=str(tmp_path))
    p = cf.fit_ml(x, y, config=config)
    folder = os.path.join(p._workspace, "pipeline")
    resumed = cf.load_training(folder)
    data = MLData.init().fit(x, y)
    resumed.config.num_epoch = 1
    resumed.config.workspace = str(tmp_path / "resume")
    # regression (code review): optimizer-state resume used to be dead code
    # (TrainingBlock could not see SerializeOptimizerBlock, built after it)
    from cflearn_tpu.pipeline.blocks import BuildTrainerBlock, SerializeOptimizerBlock

    opt_block = resumed.try_get_block(SerializeOptimizerBlock)
    assert opt_block is not None and opt_block.opt_npd, "optimizer states must be loaded"
    resumed.fit(data)
    assert resumed.is_fitted
    trainer = resumed.try_get_block(BuildTrainerBlock).trainer
    assert trainer._preloaded_opt_npd, "resume must hand opt states to the trainer"


def test_ml_data_with_strings() -> None:
    # categorical string column + nan handling
    n = 60
    x = np.empty((n, 3), dtype=object)
    x[:, 0] = np.random.randn(n)
    x[:, 1] = np.random.choice(["a", "b", "c"], n)
    x[:, 2] = np.random.randn(n)
    x[5, 2] = float("nan")
    y = np.random.randint(0, 2, (n, 1))
    data = MLData.init().fit(x, y)
    assert data.num_features == 3
    assert data.is_classification is True
    train_loader, valid_loader = data.get_loaders()
    batch = train_loader.get_one_batch()
    assert np.isfinite(batch["input"]).all()
    assert valid_loader is not None


def test_fuse_evaluation(tmp_path) -> None:
    """`fuse_evaluation` (reference `api/api.py:435-447`): fused ensemble
    scored with the framework metrics; `num_picked` keeps the best folders."""
    x, y = _toy()
    folders = []
    for i in range(3):
        config = _debug_config(workspace=str(tmp_path / str(i)), metric_names=["acc"])
        p = cf.fit_ml(x, y, config=config)
        folders.append(os.path.join(p._workspace, "pipeline"))
    fused = cf.fuse_evaluation(folders)
    out = fused.evaluate(x, y)
    assert "acc" in out.metric_values and 0.0 <= out.metric_values["acc"] <= 1.0
    # prediction fusion semantics match fuse_inference
    individual = [cf.load_inference(f).predict(x[:8])["predictions"] for f in folders]
    np.testing.assert_allclose(
        fused.predict(x[:8])["predictions"], np.mean(individual, axis=0), atol=1e-5
    )
    picked = cf.fuse_evaluation(folders, num_picked=2)
    assert len(picked.pipelines) == 2
    picked_f = cf.fuse_evaluation(folders, num_picked=0.34)
    assert len(picked_f.pipelines) == 1


def test_sklearn_evaluation_bridge() -> None:
    """`GeneralEvaluationPipeline` + `SKLearnClassifier` (reference
    `pipeline/third_party.py:17-44`): sklearn models evaluated with our
    metric system."""
    from sklearn.linear_model import LogisticRegression

    from cflearn_tpu.data import ArrayData
    from cflearn_tpu.pipeline.third_party import GeneralEvaluationPipeline, SKLearnClassifier
    from cflearn_tpu.schema.config import DLConfig

    x, y = _toy()
    skm = LogisticRegression().fit(x, y.ravel())
    bridge = GeneralEvaluationPipeline(
        DLConfig(module_name="fcnn", metric_names=["acc", "auc"]),
        SKLearnClassifier(skm),
    )
    loader, _ = ArrayData.init().fit(x, y).get_loaders()
    out = bridge.evaluate(loader)
    sk_acc = skm.score(x, y.ravel())
    assert out.metric_values["acc"] == pytest.approx(sk_acc, abs=1e-6)
    assert 0.5 <= out.metric_values["auc"] <= 1.0
    with pytest.raises(ValueError):
        GeneralEvaluationPipeline(DLConfig(module_name="fcnn"), SKLearnClassifier(skm))


def test_fused_evaluation_scores_the_ensemble(tmp_path) -> None:
    """Regression (code review): FusedInference used to return member 0's
    metrics — the fused predictions were never scored. The fused score must
    equal the metric computed on the AVERAGED predictions."""

    x, y = _toy()
    folders = []
    for i in range(2):
        config = _debug_config(workspace=str(tmp_path / str(i)), metric_names=["acc"])
        p = cf.fit_ml(x, y, config=config)
        folders.append(os.path.join(p._workspace, "pipeline"))
    fused = cf.fuse_evaluation(folders)
    out = fused.evaluate(x, y)
    # expected: average the members' raw outputs over the SAME loader
    # (loader-level fusion semantics), then score the averaged predictions
    loader = fused.pipelines[0]._as_loader(x, y, 128)
    member_preds = [
        p.inference.get_outputs(loader.copy(), return_outputs=True).forward_results[
            "predictions"
        ]
        for p in fused.pipelines
    ]
    fused_preds = np.mean(member_preds, axis=0)
    expected_acc = float((np.argmax(fused_preds, -1)[..., None] == np.asarray(y)).mean())
    assert abs(out.metric_values["acc"] - expected_acc) < 1e-6


def test_fused_predict_classes_are_valid(tmp_path) -> None:
    """Regression (code review): fused predict used to average class
    indices; classes must now come from the averaged logits."""
    x, y = _toy()
    folders = []
    for i in range(2):
        config = _debug_config(workspace=str(tmp_path / str(i)))
        p = cf.fit_ml(x, y, config=config)
        folders.append(os.path.join(p._workspace, "pipeline"))
    fused = DLPipelineSerializer.fuse_inference(folders)
    classes = fused.predict(x[:16], return_classes=True)["predictions"]
    assert classes.dtype == np.int64
    individual = [cf.load_inference(f).predict(x[:16])["predictions"] for f in folders]
    expected = np.argmax(np.mean(individual, axis=0), -1)[..., None]
    np.testing.assert_array_equal(classes, expected)


def test_binary_threshold_applies_to_probabilities(tmp_path) -> None:
    """Regression (code review): binary `return_classes` thresholded raw
    logits; a logit of 0.3 (probability 0.574) must classify as 1."""
    from cflearn_tpu.pipeline.api import _postprocess_predictions

    logits = np.array([[0.3], [-0.3], [3.0]], np.float32)
    out = _postprocess_predictions(
        {"predictions": logits.copy()},
        return_classes=True,
        binary_threshold=0.5,
        return_probabilities=False,
        recover_labels=False,
        data=None,
    )
    np.testing.assert_array_equal(out["predictions"].ravel(), [1, 0, 1])
