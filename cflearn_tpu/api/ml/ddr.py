"""DDR prediction / visualization API.

Parity: reference `cflearn/api/ml/ddr.py` — `DDRPredictor` (median /
quantile / cdf_pdf queries against a trained DDR net) and `DDRVisualizer`
(matplotlib figures of fitted quantile bands and cdf/pdf curves).

TPU-native notes: the pdf is computed with `jax.grad` of the cdf head w.r.t.
the anchor y (the reference uses torch autograd through an eval context).
"""

import os
from typing import Any, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ...constants import PREDICTIONS_KEY
from ...modules.ml.ddr import DDR


class DDRPredictor:
    def __init__(self, ddr: DDR) -> None:
        self.m = ddr

    def median(self, x: np.ndarray) -> np.ndarray:
        return np.asarray(self.m(jnp.asarray(x, jnp.float32))[PREDICTIONS_KEY])

    def quantile(self, x: np.ndarray, tau: Any) -> np.ndarray:
        """Quantile estimates at the anchor grid nearest to each tau."""
        out = self.m(jnp.asarray(x, jnp.float32))
        quantiles = np.asarray(out["quantiles"])  # (B, A+1, D)
        taus = np.atleast_1d(np.asarray(tau, np.float32))
        anchors = np.linspace(0.05, 0.95, quantiles.shape[1])
        idx = np.abs(anchors[None, :] - taus[:, None]).argmin(axis=1)
        return quantiles[:, idx]  # (B, len(tau), D)

    def cdf_pdf(self, x: np.ndarray, y: Any) -> Tuple[np.ndarray, np.ndarray]:
        xj = jnp.asarray(x, jnp.float32)
        b = xj.shape[0]
        y_arr = jnp.broadcast_to(jnp.asarray(y, jnp.float32), (b, 1))

        def cdf_sum(y_in: jax.Array) -> jax.Array:
            return jnp.sum(self.m.cdf(xj, y_in))

        cdf = self.m.cdf(xj, y_arr)
        pdf = jax.grad(cdf_sum)(y_arr)  # ∂F/∂y per row (sum trick)
        return np.asarray(cdf), np.asarray(pdf)

    @classmethod
    def from_pipeline(cls, m: Any) -> "DDRPredictor":
        core = m.model.m
        ddr = getattr(core, "module", core)
        return cls(ddr)


class DDRVisualizer:
    """Quantile-band / cdf-pdf figures (reference `DDRVisualizer`)."""

    def __init__(self, ddr: DDR, dpi: int = 200, figsize: Tuple[int, int] = (8, 6)) -> None:
        try:
            import matplotlib  # noqa: F401
        except ImportError as e:  # pragma: no cover
            raise RuntimeError("`matplotlib` is needed for `DDRVisualizer`") from e
        self.m = ddr
        self.dpi = dpi
        self.figsize = figsize
        self.predictor = DDRPredictor(ddr)

    def _new_figure(self, x: np.ndarray, y: np.ndarray, title: str) -> Any:
        import matplotlib.pyplot as plt

        fig = plt.figure(figsize=self.figsize, dpi=self.dpi)
        plt.title(title)
        plt.scatter(x[:, 0], y[:, 0], color="gray", s=15)
        return fig

    def visualize_quantiles(
        self,
        x: np.ndarray,
        y: np.ndarray,
        export_path: Optional[str] = None,
        *,
        title: str = "DDR quantiles",
    ) -> Optional[str]:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        order = np.argsort(x[:, 0])
        out = self.m(jnp.asarray(x, jnp.float32))
        quantiles = np.asarray(out["quantiles"])[order]  # (B, A+1, D)
        self._new_figure(x, y, title)
        xs = x[order, 0]
        for a in range(quantiles.shape[1]):
            plt.plot(xs, quantiles[:, a, 0], alpha=0.6)
        plt.plot(xs, np.asarray(out[PREDICTIONS_KEY])[order, 0], color="red", label="median")
        plt.legend()
        return self._export(export_path)

    def visualize_cdf(
        self,
        x: np.ndarray,
        y: np.ndarray,
        y_anchor: float,
        export_path: Optional[str] = None,
        *,
        title: str = "DDR cdf / pdf",
    ) -> Optional[str]:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        order = np.argsort(x[:, 0])
        cdf, pdf = self.predictor.cdf_pdf(x, y_anchor)
        self._new_figure(x, y, title)
        plt.plot(x[order, 0], cdf[order, 0], label=f"cdf @ y={y_anchor:.2f}")
        plt.plot(x[order, 0], pdf[order, 0], label=f"pdf @ y={y_anchor:.2f}")
        plt.legend()
        return self._export(export_path)

    @staticmethod
    def _export(export_path: Optional[str]) -> Optional[str]:
        import matplotlib.pyplot as plt

        if export_path is None:
            plt.show()
            plt.close()
            return None
        os.makedirs(os.path.dirname(os.path.abspath(export_path)), exist_ok=True)
        plt.savefig(export_path)
        plt.close()
        return export_path
