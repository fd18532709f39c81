"""Basic losses.

Parity: reference `cflearn/losses/basic.py:28-171` — iou, bce, mae,
sigmoid_mae, mse, recon, quantile, corr, cross_entropy,
label_smooth_cross_entropy, focal. All pure-jnp, traced inside the jitted
train step.
"""

from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..schema.losses_schema import ILoss


@ILoss.register("mae")
class MAELoss(ILoss):
    def forward(self, predictions: jax.Array, labels: jax.Array) -> jax.Array:
        return jnp.abs(predictions - labels.astype(predictions.dtype))


@ILoss.register("sigmoid_mae")
class SigmoidMAELoss(ILoss):
    def forward(self, predictions: jax.Array, labels: jax.Array) -> jax.Array:
        return jnp.abs(jax.nn.sigmoid(predictions) - labels.astype(predictions.dtype))


@ILoss.register("mse")
class MSELoss(ILoss):
    def forward(self, predictions: jax.Array, labels: jax.Array) -> jax.Array:
        return jnp.square(predictions - labels.astype(predictions.dtype))


@ILoss.register("recon")
class ReconstructionLoss(ILoss):
    """Distance to the input, configurable base loss (reference
    `losses/basic.py:64-76` — defaults to MAE)."""

    def __init__(self, reduction: str = "mean", *, base_loss: str = "mae") -> None:
        super().__init__(reduction)
        if base_loss not in ("mae", "mse"):
            raise ValueError(f"unsupported recon base_loss '{base_loss}'")
        self.base_loss = base_loss

    def get_forward_args(self, forward_results: Any, batch: Any) -> Any:
        from ..constants import INPUT_KEY, PREDICTIONS_KEY

        return forward_results[PREDICTIONS_KEY], batch[INPUT_KEY]

    def forward(self, predictions: jax.Array, net: jax.Array) -> jax.Array:
        diff = predictions - net
        return jnp.abs(diff) if self.base_loss == "mae" else jnp.square(diff)


@ILoss.register("bce")
class BCELoss(ILoss):
    def forward(self, predictions: jax.Array, labels: jax.Array) -> jax.Array:
        labels = labels.astype(predictions.dtype)
        log_p = jax.nn.log_sigmoid(predictions)
        log_not_p = jax.nn.log_sigmoid(-predictions)
        return -(labels * log_p + (1.0 - labels) * log_not_p)


def _prepare_ce(logits: jax.Array, labels: jax.Array) -> Any:
    if labels.ndim == logits.ndim and labels.shape[-1] == 1:
        labels = labels[..., 0]
    return logits, labels.astype(jnp.int32)


@ILoss.register("cross_entropy")
class CrossEntropyLoss(ILoss):
    def forward(self, predictions: jax.Array, labels: jax.Array) -> jax.Array:
        logits, labels = _prepare_ce(predictions, labels)
        log_probs = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(log_probs, labels[..., None], axis=-1)[..., 0]
        return nll


@ILoss.register("label_smooth_cross_entropy")
class LabelSmoothCrossEntropyLoss(ILoss):
    def __init__(self, reduction: str = "mean", *, eps: float = 0.1) -> None:
        super().__init__(reduction)
        self.eps = eps

    def forward(self, predictions: jax.Array, labels: jax.Array) -> jax.Array:
        logits, labels = _prepare_ce(predictions, labels)
        num_classes = logits.shape[-1]
        log_probs = jax.nn.log_softmax(logits, axis=-1)
        one_hot = jax.nn.one_hot(labels, num_classes, dtype=log_probs.dtype)
        smoothed = one_hot * (1.0 - self.eps) + self.eps / num_classes
        return -jnp.sum(smoothed * log_probs, axis=-1)


@ILoss.register("focal")
class FocalLoss(ILoss):
    def __init__(
        self,
        reduction: str = "mean",
        *,
        input_logits: bool = True,
        eps: float = 1e-6,
        gamma: float = 2.0,
        alpha: Optional[Any] = None,
    ) -> None:
        super().__init__(reduction)
        self.input_logits = input_logits
        self.eps = eps
        self.gamma = gamma
        self.alpha = alpha

    def forward(self, predictions: jax.Array, labels: jax.Array) -> jax.Array:
        logits, labels = _prepare_ce(predictions, labels)
        if self.input_logits:
            probs = jax.nn.softmax(logits, axis=-1)
        else:
            probs = logits
        probs = jnp.clip(probs, self.eps, 1.0)
        pt = jnp.take_along_axis(probs, labels[..., None], axis=-1)[..., 0]
        loss = -jnp.power(1.0 - pt, self.gamma) * jnp.log(pt)
        if self.alpha is not None:
            # a scalar alpha means binary class weights [alpha, 1 - alpha]
            # (reference `losses/basic.py` FocalLoss)
            a = self.alpha
            if isinstance(a, (int, float)):
                a = [float(a), 1.0 - float(a)]
            alpha = jnp.asarray(a, dtype=loss.dtype)
            loss = alpha[labels] * loss
        return loss


@ILoss.register("quantile")
class QuantileLoss(ILoss):
    def __init__(self, reduction: str = "mean", *, q: Any = 0.5) -> None:
        super().__init__(reduction)
        self.q = q

    def forward(self, predictions: jax.Array, labels: jax.Array) -> jax.Array:
        q = jnp.asarray(self.q, dtype=predictions.dtype)
        error = labels.astype(predictions.dtype) - predictions
        return jnp.maximum(q * error, (q - 1.0) * error)


@ILoss.register("corr")
class CorrelationLoss(ILoss):
    def forward(self, predictions: jax.Array, labels: jax.Array) -> jax.Array:
        labels = labels.astype(predictions.dtype)
        p = predictions - jnp.mean(predictions)
        t = labels - jnp.mean(labels)
        cov = jnp.sum(p * t)
        denom = jnp.sqrt(jnp.sum(p * p) * jnp.sum(t * t)) + 1e-12
        return -cov / denom


@ILoss.register("iou")
class IOULoss(ILoss):
    def forward(self, logits: jax.Array, labels: jax.Array) -> jax.Array:
        probs = jax.nn.sigmoid(logits)
        labels = labels.astype(probs.dtype)
        axes = tuple(range(1, probs.ndim))
        intersect = jnp.sum(probs * labels, axis=axes)
        union = jnp.sum(probs + labels - probs * labels, axis=axes)
        return 1.0 - intersect / (union + 1e-12)
