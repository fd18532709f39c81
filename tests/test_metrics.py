"""Metric math vs sklearn (reference analogue: `tests/test_metrics.py`)."""

import numpy as np
import pytest

from cflearn_tpu.constants import LABEL_KEY, PREDICTIONS_KEY
from cflearn_tpu.schema.metrics_schema import IMetric
import cflearn_tpu.metrics  # noqa: F401 — register


def _ev(name: str, predictions: np.ndarray, labels: np.ndarray, **kwargs) -> float:
    metric = IMetric.make(name, kwargs)
    out = metric.evaluate({LABEL_KEY: labels}, {PREDICTIONS_KEY: predictions})
    return out.metric_values[name]


def test_acc() -> None:
    logits = np.array([[0.1, 0.9], [0.8, 0.2], [0.3, 0.7], [0.6, 0.4]])
    labels = np.array([[1], [0], [0], [0]])
    assert _ev("acc", logits, labels) == 0.75


def test_mae_mse() -> None:
    p = np.array([1.0, 2.0, 3.0])
    y = np.array([2.0, 2.0, 2.0])
    assert _ev("mae", p, y) == pytest.approx(2.0 / 3.0)
    assert _ev("mse", p, y) == pytest.approx(2.0 / 3.0)


def test_r2_corr_vs_sklearn() -> None:
    sklearn = pytest.importorskip("sklearn.metrics")
    rng = np.random.RandomState(0)
    y = rng.randn(100)
    p = y + 0.5 * rng.randn(100)
    assert _ev("r2", p, y) == pytest.approx(sklearn.r2_score(y, p), abs=1e-6)
    expected_corr = np.corrcoef(p, y)[0, 1]
    assert _ev("corr", p, y) == pytest.approx(expected_corr, abs=1e-6)


def test_auc_vs_sklearn() -> None:
    sklearn = pytest.importorskip("sklearn.metrics")
    rng = np.random.RandomState(1)
    labels = rng.randint(0, 2, 200)
    scores = rng.rand(200) + 0.3 * labels
    ours = _ev("auc", scores, labels)
    theirs = sklearn.roc_auc_score(labels, scores)
    assert ours == pytest.approx(theirs, abs=1e-6)
    assert IMetric.make("auc").requires_all


def test_f1_vs_sklearn() -> None:
    sklearn = pytest.importorskip("sklearn.metrics")
    rng = np.random.RandomState(2)
    labels = rng.randint(0, 3, 120)
    logits = rng.randn(120, 3)
    logits[np.arange(120), labels] += 1.0
    classes = np.argmax(logits, axis=-1)
    ours = _ev("f1", logits, labels)
    theirs = sklearn.f1_score(labels, classes, average="macro")
    assert ours == pytest.approx(theirs, abs=1e-6)


def test_fuse_weighted() -> None:
    metric = IMetric.fuse(["mae", "mse"], metric_weights={"mae": 2.0, "mse": 1.0})
    p = np.array([1.0, 3.0])
    y = np.array([2.0, 2.0])
    out = metric.evaluate({LABEL_KEY: y}, {PREDICTIONS_KEY: p})
    assert set(out.metric_values) == {"mae", "mse"}
    # mae=1, mse=1; both negative direction → score = (2*-1 + 1*-1)/3
    assert out.final_score == pytest.approx(-1.0)


def test_binary_f1_and_auc_match_sklearn_defaults() -> None:
    """Regression (code review): binary F1 must be the positive-class F1
    (sklearn default), and AUC must rank probabilities, not raw logits."""
    import sklearn.metrics as skm

    from cflearn_tpu.metrics import AUC, F1Score

    labels = np.array([1, 1, 1, 0])[:, None]
    classes = np.array([1, 1, 0, 0])[:, None]
    ours = F1Score().forward(classes, labels)
    assert abs(ours - skm.f1_score(labels.ravel(), classes.ravel())) < 1e-9

    # logits where raw-l1 ranking disagrees with softmax-p1 ranking
    logits = np.array([[5.0, 4.0], [0.0, 1.0]], np.float32)
    y = np.array([0, 1])[:, None]
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    expected = skm.roc_auc_score(y.ravel(), probs[:, 1])
    assert abs(AUC().forward(logits, y) - expected) < 1e-9


def test_quantile_metric_multi_column() -> None:
    """Regression (code review): (B, k) quantile predictions vs (B, 1)
    labels used to crash; value is per-quantile mean summed over columns."""
    from cflearn_tpu.metrics import Quantile

    preds = np.array([[0.0, 1.0, 2.0], [1.0, 2.0, 3.0]], np.float64)
    labels = np.array([[1.0], [2.0]], np.float64)
    q = [0.1, 0.5, 0.9]
    m = Quantile(q=q).forward(preds, labels)
    diff = labels - preds
    expected = float(
        np.maximum(np.asarray(q) * diff, (np.asarray(q) - 1.0) * diff).mean(0).sum()
    )
    assert abs(m - expected) < 1e-12
