"""api/ml extras: DDR predictor/visualizer, Interpreter (integrated
gradients), sanitizer flags (reference `api/ml/ddr.py`, `api/ml/interpreter.py`,
SURVEY §5.2)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import nnx

import cflearn_tpu as cf


def test_ddr_predictor_and_visualizer(tmp_path) -> None:
    from cflearn_tpu.api.ml import DDRPredictor, DDRVisualizer
    from cflearn_tpu.modules.ml.ddr import DDR

    ddr = DDR(input_dim=1, output_dim=1, rngs=nnx.Rngs(0))
    rng = np.random.RandomState(0)
    x = rng.randn(64, 1).astype(np.float32)
    y = (x + 0.1 * rng.randn(64, 1)).astype(np.float32)

    pred = DDRPredictor(ddr)
    med = pred.median(x)
    assert med.shape == (64, 1)
    q = pred.quantile(x, [0.25, 0.75])
    assert q.shape == (64, 2, 1)
    # monotone: q25 <= q75 (softplus increments guarantee it)
    assert (q[:, 0] <= q[:, 1] + 1e-5).all()
    cdf, pdf = pred.cdf_pdf(x, 0.0)
    assert cdf.shape == (64, 1) and pdf.shape == (64, 1)
    assert ((cdf >= 0) & (cdf <= 1)).all()
    assert (pdf >= -1e-5).all()  # sigmoid cdf is monotone in y

    viz = DDRVisualizer(ddr)
    p1 = viz.visualize_quantiles(x, y, str(tmp_path / "q.png"))
    p2 = viz.visualize_cdf(x, y, 0.0, str(tmp_path / "cdf.png"))
    assert os.path.isfile(p1) and os.path.isfile(p2)


def test_interpreter_integrated_gradients(tmp_path) -> None:
    """IG on a pipeline whose label depends ONLY on feature 0 — its mean
    attribution must dominate the noise features."""
    from cflearn_tpu.api.ml import Interpreter

    rng = np.random.RandomState(0)
    x = rng.randn(200, 4).astype(np.float32)
    y = (x[:, :1] > 0).astype(np.int64)
    config = cf.MLConfig(module_name="fcnn", num_epoch=8, lr=3e-3, workspace=str(tmp_path), callback_names=[])
    p = cf.fit_ml(x, y, config=config)
    interp = Interpreter(p.data, p.model)
    imp = interp.importances(x[:64])
    assert imp.shape == (4,)
    assert abs(imp[0]) > max(abs(imp[1]), abs(imp[2]), abs(imp[3]))
    out = interp.interpret(x[:64], export_path=str(tmp_path / "imp.png"))
    assert os.path.isfile(tmp_path / "imp.png")
    np.testing.assert_allclose(out, imp)


def test_integrated_gradients_completeness() -> None:
    """IG axiom: attributions sum to f(x) - f(baseline) for smooth f."""
    from cflearn_tpu.api.ml.interpreter import integrated_gradients

    w = jnp.asarray([[1.0], [2.0], [-0.5]])

    def f(x):
        return (x @ w) ** 2

    x = jnp.asarray(np.random.RandomState(0).randn(8, 3).astype(np.float32))
    attr = integrated_gradients(f, x, steps=256)
    np.testing.assert_allclose(
        np.asarray(attr.sum(axis=1, keepdims=True)),
        np.asarray(f(x) - f(jnp.zeros_like(x))),
        rtol=1e-2, atol=1e-3,
    )


def test_debug_nans_flag(tmp_path) -> None:
    """SURVEY §5.2 sanitizer analogue: `debug_nans` raises at the NaN source
    during fit and is reset afterwards."""
    from cflearn_tpu.data import ArrayData
    from cflearn_tpu.monitors import LazyMonitor
    from cflearn_tpu.schema import DLConfig, TrainerConfig
    from cflearn_tpu.schema.model import IDLModel
    from cflearn_tpu.trainer import Trainer

    x = np.random.randn(16, 4).astype(np.float32)
    y_bad = np.full((16, 1), np.nan, dtype=np.float32)
    config = DLConfig(module_name="fcnn", module_config={"input_dim": 4, "output_dim": 1}, loss_name="mae")
    model = IDLModel.from_config(config)
    trainer = Trainer(
        TrainerConfig(workspace=str(tmp_path), fixed_steps=1, callback_names=[], debug_nans=True),
        monitors=[LazyMonitor()],
    )
    with pytest.raises(FloatingPointError):
        trainer.fit(ArrayData.init().fit(x, y_bad), model, skip_final_evaluation=True)
    jax.config.update("jax_debug_nans", False)  # hygiene for later tests

    # clean data trains fine with the flag on, and the flag is restored
    model2 = IDLModel.from_config(config)
    y_good = x.sum(1, keepdims=True)
    trainer2 = Trainer(
        TrainerConfig(workspace=str(tmp_path / "b"), fixed_steps=1, callback_names=[], debug_nans=True),
        monitors=[LazyMonitor()],
    )
    trainer2.fit(ArrayData.init().fit(x, y_good), model2, skip_final_evaluation=True)
    assert jax.config.jax_debug_nans is False
