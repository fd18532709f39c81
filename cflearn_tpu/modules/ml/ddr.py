"""DDR — distribution regression (quantile/CDF heads).

Parity: reference `cflearn/modules/ml/ddr.py:69/321` (`DDR` module + its own
loss) and `cflearn/models/ml/ddr.py:20` (`DDRModel`). Predicts the median
plus monotone quantile offsets; the dual (CDF) head is trained consistently
with the quantile head.
"""

from typing import Any, List, Optional

import jax
import jax.numpy as jnp
from flax import nnx

from ...constants import LABEL_KEY, LOSS_KEY, PREDICTIONS_KEY
from ..common import register_module
from ..core.mappings import MappingBlock
from ...schema.losses_schema import ILoss, loss_dict_type
from ...toolkit.misc import tensor_dict_type


@register_module("ddr")
class DDR(nnx.Module):
    def __init__(
        self,
        input_dim: int,
        output_dim: int = 1,
        hidden_units: Optional[List[int]] = None,
        *,
        num_anchors: int = 16,
        rngs: nnx.Rngs,
    ) -> None:
        hidden_units = hidden_units or [64, 64]
        self.num_anchors = num_anchors
        blocks = []
        in_dim = input_dim
        for h in hidden_units:
            blocks.append(MappingBlock(in_dim, h, norm_type=None, activation="mish", rngs=rngs))
            in_dim = h
        self.backbone = nnx.List(blocks)
        self.median_head = nnx.Linear(in_dim, output_dim, rngs=rngs)
        # quantile head: predicts positive increments over anchors
        self.q_head = nnx.Linear(in_dim, num_anchors * output_dim, rngs=rngs)
        # cdf head: logit of F(y|x) at given y anchors
        self.cdf_head = nnx.Linear(in_dim + 1, output_dim, rngs=rngs)

    def features(self, x: jax.Array) -> jax.Array:
        for block in self.backbone:
            x = block(x)
        return x

    def __call__(self, x: jax.Array, *, tau: Optional[jax.Array] = None) -> Any:
        feats = self.features(x)
        median = self.median_head(feats)
        b = x.shape[0]
        increments = jax.nn.softplus(self.q_head(feats)).reshape(b, self.num_anchors, -1)
        # symmetric monotone quantiles around the median
        half = self.num_anchors // 2
        lower = median[:, None] - jnp.cumsum(increments[:, :half][:, ::-1], axis=1)[:, ::-1]
        upper = median[:, None] + jnp.cumsum(increments[:, half:], axis=1)
        quantiles = jnp.concatenate([lower, median[:, None], upper], axis=1)
        return {
            PREDICTIONS_KEY: median,
            "quantiles": quantiles,
            "features": feats,
        }

    def cdf(self, x: jax.Array, y: jax.Array) -> jax.Array:
        feats = self.features(x)
        return jax.nn.sigmoid(self.cdf_head(jnp.concatenate([feats, y], axis=-1)))


@ILoss.register("ddr")
class DDRLoss(ILoss):
    """median MAE + pinball loss over the anchor quantiles + monotonicity."""

    def __init__(self, reduction: str = "mean", *, lb_monotonous: float = 1.0) -> None:
        super().__init__(reduction)
        self.lb_monotonous = lb_monotonous

    def run(self, forward_results: tensor_dict_type, batch: tensor_dict_type, **kwargs: Any) -> loss_dict_type:
        labels = batch[LABEL_KEY].astype(jnp.float32)
        median = forward_results[PREDICTIONS_KEY]
        quantiles = forward_results["quantiles"]  # (B, A+1, D)
        num_anchors = quantiles.shape[1]
        taus = jnp.linspace(0.05, 0.95, num_anchors).reshape(1, num_anchors, 1)
        diff = labels[:, None] - quantiles
        pinball = jnp.mean(jnp.maximum(taus * diff, (taus - 1.0) * diff))
        median_loss = jnp.mean(jnp.abs(labels - median))
        mono = jnp.mean(jax.nn.relu(quantiles[:, :-1] - quantiles[:, 1:]))
        total = median_loss + pinball + self.lb_monotonous * mono
        return {LOSS_KEY: total, "median": median_loss, "pinball": pinball, "mono": mono}
