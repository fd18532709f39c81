"""ML feature-importance interpreter.

Parity: reference `cflearn/api/ml/interpreter.py` — `Interpreter` plots
average feature importances. The reference delegates attribution to captum's
`IntegratedGradients`; here integrated gradients are implemented natively
with `jax.grad` over the straight-line path (no extra dependency, and the
path integral vmaps into one XLA program).
"""

import os
from typing import Any, Optional

import numpy as np

import jax
import jax.numpy as jnp
from flax import nnx

from ...constants import INPUT_KEY, PREDICTIONS_KEY


def integrated_gradients(
    model_fn: Any,
    x: jax.Array,
    *,
    baseline: Optional[jax.Array] = None,
    steps: int = 32,
    target: Optional[int] = None,
) -> jax.Array:
    """IG attribution: (x - x0) * mean_a grad f(x0 + a (x - x0)).

    `model_fn(x) -> (B, D_out)`; `target` selects an output column (defaults
    to the predicted class / single output summed)."""
    if baseline is None:
        baseline = jnp.zeros_like(x)

    def scalar_out(xi: jax.Array) -> jax.Array:
        out = model_fn(xi)
        if target is not None:
            return jnp.sum(out[:, target])
        if out.ndim >= 2 and out.shape[-1] > 1:
            # attribute the predicted class per row
            cls = jnp.argmax(model_fn(x), axis=-1)
            return jnp.sum(jnp.take_along_axis(out, cls[:, None], axis=-1))
        return jnp.sum(out)

    # midpoint rule: exact for gradients linear in alpha (quadratic f)
    alphas = (jnp.arange(steps, dtype=jnp.float32) + 0.5) / steps

    def grad_at(alpha: jax.Array) -> jax.Array:
        # gradient AT the interpolated point (differentiating through the
        # interpolation would pick up a spurious alpha factor)
        return jax.grad(scalar_out)(baseline + alpha * (x - baseline))

    grads = jax.vmap(grad_at)(alphas)  # (steps, B, D)
    return (x - baseline) * jnp.mean(grads, axis=0)


class IntegratedGradients:
    """captum-shaped attribution surface (the reference `Interpreter`
    delegates to `captum.attr.IntegratedGradients`; this is the in-repo
    equivalent over `integrated_gradients`)."""

    def __init__(self, model_fn: Any) -> None:
        self.model_fn = model_fn

    def attribute(
        self,
        x: Any,
        *,
        baselines: Optional[Any] = None,
        n_steps: int = 32,
        target: Optional[int] = None,
    ) -> jax.Array:
        return integrated_gradients(
            self.model_fn,
            jnp.asarray(x),
            baseline=None if baselines is None else jnp.asarray(baselines),
            steps=n_steps,
            target=target,
        )


class Interpreter:
    """Average feature importances of a fitted ML pipeline (reference
    `interpreter.py:24-55`)."""

    def __init__(self, data: Any, model: Any) -> None:
        self.data = data
        self.model = model

    def importances(self, x: Any, *, steps: int = 32) -> np.ndarray:
        loader = self.data.build_loader(x)
        batch = loader.get_full_batch()
        feats = jnp.asarray(batch[INPUT_KEY], jnp.float32)
        graphdef, state = nnx.split(self.model)

        def model_fn(xi: jax.Array) -> jax.Array:
            m = nnx.merge(graphdef, state)
            out = m.run({INPUT_KEY: xi}, training=False)
            return out[PREDICTIONS_KEY]

        attr = integrated_gradients(model_fn, feats, steps=steps)
        return np.asarray(jnp.mean(attr, axis=0))

    def interpret(
        self,
        x: Any,
        *,
        title: str = "Average Feature Importances",
        axis_title: str = "Features",
        export_path: Optional[str] = None,
        steps: int = 32,
    ) -> np.ndarray:
        importances = self.importances(x, steps=steps)
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except ImportError as e:  # pragma: no cover
            raise RuntimeError("`matplotlib` is needed for `Interpreter.interpret`") from e
        names = getattr(self.data, "feature_header", None) or [
            f"f{i}" for i in range(len(importances))
        ]
        pos = np.arange(len(names))
        plt.figure(figsize=(12, 6))
        plt.title(title)
        plt.bar(pos, importances, align="center")
        plt.xticks(pos, names, wrap=True)
        plt.xlabel(axis_title)
        if export_path is not None:
            os.makedirs(os.path.dirname(os.path.abspath(export_path)), exist_ok=True)
            plt.savefig(export_path)
        plt.close()
        return importances
