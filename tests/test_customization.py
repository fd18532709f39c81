"""User-customization flows (reference `tests/test_customization.py`,
`test_register.py`, `test_protocol.py`): registering a custom module +
custom ML model and training it through the public API, custom
initializers, the loss protocol, and trainer-state logging toggles."""

from typing import Any, Dict

import numpy as np

import jax
import jax.numpy as jnp
from flax import nnx

import cflearn_tpu as cf


def test_customize_model(tmp_path) -> None:
    """Mirror of reference `tests/test_customization.py:10` — a custom
    module registered under a new name, wrapped by a custom ML model,
    fitted and predicted through the public pipeline."""

    @cf.register_module("custom_const")
    class _ConstModule(nnx.Module):
        def __init__(self, input_dim: int, output_dim: int, *, rngs: nnx.Rngs) -> None:
            self.dummy = nnx.Param(jnp.ones((1,)))
            self.output_dim = output_dim

        def __call__(self, net: jax.Array) -> jax.Array:
            return jnp.ones((net.shape[0], self.output_dim), net.dtype)

    @cf.register_ml_model("custom_const")
    class _ConstModel(cf.CommonMLModel):
        def mutate_module_config(self, module_config: Dict[str, Any]) -> None:
            pass

    x = np.random.random([100, 10]).astype(np.float32)
    y = np.random.random([100, 1]).astype(np.float32)
    config = cf.MLConfig(
        module_name="custom_const",
        loss_name="mae",
        fixed_steps=1,
        workspace=str(tmp_path),
        callback_names=[],
    )
    from cflearn_tpu.data.ml.api import MLProcessorConfig

    # gather-only processor: no label standardization, so raw predictions
    # surface unchanged (the reference test predicts through a raw loader)
    m = cf.fit_ml(x, y, config=config, processor_config=MLProcessorConfig())
    predictions = m.predict(x)[cf.PREDICTIONS_KEY]
    assert np.allclose(predictions, np.ones_like(y), atol=1e-5)
    # the custom model class (not ml.common) was resolved from module_name
    model = m.get_block("build_model").model
    assert isinstance(model, _ConstModel)
    assert isinstance(model.m, _ConstModule)


def test_custom_initializer() -> None:
    """Mirror of reference `tests/test_register.py:12` — `Initializer.register`
    plugs a user init function into the named-initializer registry."""
    from cflearn_tpu.toolkit import Initializer

    @Initializer.register("all_one")
    def _(initializer: Initializer, key: jax.Array, leaf: jax.Array) -> jax.Array:
        return jnp.ones_like(leaf)

    lin = nnx.Linear(4, 3, rngs=nnx.Rngs(0))
    Initializer().initialize(lin, "all_one")
    assert np.allclose(np.asarray(lin.kernel[...]), 1.0)
    assert np.allclose(np.asarray(lin.bias[...]), 1.0)


def test_loss_protocol() -> None:
    """Mirror of reference `tests/test_protocol.py:29` — build_loss +
    reduction semantics + multi_task composition."""
    from cflearn_tpu.schema.losses_schema import build_loss

    predictions = jnp.full((10, 1), 2.0)
    labels = jnp.zeros((10, 1))
    forward_results = {cf.PREDICTIONS_KEY: predictions}
    batch = {cf.LABEL_KEY: labels}

    def _get(loss) -> float:
        return float(loss.run(forward_results, batch)[cf.LOSS_KEY])

    assert _get(build_loss("mae")) == 2.0
    assert _get(build_loss("mae", reduction="sum")) == 20.0
    mae = cf.MAELoss()
    assert float(jnp.mean(mae.forward(predictions, labels))) == 2.0
    assert float(jnp.sum(mae.forward(predictions, labels))) == 20.0
    # multi task: mae (2.0) + mse (4.0)
    multi = build_loss("multi_task", loss_names=["mae", "mse"])
    losses = multi.run(forward_results, batch)
    assert float(losses[cf.LOSS_KEY]) == 6.0
    assert float(losses["mae"]) == 2.0
    assert float(losses["mse"]) == 4.0


def test_disable_logging(tmp_path) -> None:
    """Mirror of reference `tests/test_protocol.py:21` — the state-level
    logging toggle restores itself on context exit."""
    config = cf.MLConfig(
        module_name="fcnn",
        fixed_steps=1,
        workspace=str(tmp_path),
        callback_names=[],
    )
    m = cf.api.make_toy_ml_model(config)
    state = m.get_block("build_trainer").trainer.state
    assert state.enable_logging
    with state.disable_logging:
        assert not state.enable_logging
    assert state.enable_logging


def test_mlflow_callback(tmp_path) -> None:
    """Mirror of reference `tests/test_protocol.py:16` — callback_names
    routes the mlflow callback into the trainer."""
    config = cf.MLConfig(
        module_name="fcnn",
        fixed_steps=1,
        workspace=str(tmp_path),
        callback_names=["mlflow"],
    )
    m = cf.api.make_toy_ml_model(config)
    callbacks = m.get_block("build_trainer").trainer.callbacks
    names = [getattr(c, "__identifier__", type(c).__name__) for c in callbacks]
    assert "mlflow" in names
