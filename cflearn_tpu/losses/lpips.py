"""LPIPS perceptual loss.

Parity: reference `cflearn/losses/lpips.py:50` — VGG16 feature stack +
learned per-channel linear heads ("lpips" pretrained checkpoint in the zoo).
The VGG tower is in-repo (nnx); weights come from the checkpoint-conversion
layer (`cflearn_tpu.zoo.convert`) when available — with random weights the
loss is still a valid (if meaningless) differentiable perceptual distance,
which keeps CI runnable without downloads.
"""

from typing import Any, List

import jax
import jax.numpy as jnp
from flax import nnx

from ..schema.losses_schema import ILoss


class VGG16Features(nnx.Module):
    """VGG16 conv tower returning relu1_2..relu5_3 feature maps."""

    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512]
    slice_points = [2, 4, 7, 10, 13]  # conv counts after which features are tapped

    def __init__(self, *, rngs: nnx.Rngs) -> None:
        convs = []
        ch = 3
        for v in self.cfg:
            if v == "M":
                continue
            convs.append(nnx.Conv(ch, int(v), kernel_size=(3, 3), padding="SAME", rngs=rngs))
            ch = int(v)
        self.convs = nnx.List(convs)

    def __call__(self, x: jax.Array) -> List[jax.Array]:
        feats = []
        conv_idx = 0
        net = x
        for v in self.cfg:
            if v == "M":
                net = nnx.max_pool(net, (2, 2), strides=(2, 2))
                continue
            net = jax.nn.relu(self.convs[conv_idx](net))
            conv_idx += 1
            if conv_idx in self.slice_points:
                feats.append(net)
        return feats


def _normalize_tensor(x: jax.Array, eps: float = 1e-10) -> jax.Array:
    norm = jnp.sqrt(jnp.sum(x**2, axis=-1, keepdims=True))
    return x / (norm + eps)


class LPIPS(nnx.Module):
    """Learned perceptual distance (expects inputs in [-1, 1], NHWC)."""

    feature_channels = [64, 128, 256, 512, 512]

    def __init__(self, *, rngs: nnx.Rngs) -> None:
        self.vgg = VGG16Features(rngs=rngs)
        self.shift = nnx.Variable(jnp.asarray([-0.030, -0.088, -0.188]))
        self.scale = nnx.Variable(jnp.asarray([0.458, 0.448, 0.450]))
        self.lins = nnx.List(
            [
                nnx.Conv(c, 1, kernel_size=(1, 1), use_bias=False, rngs=rngs)
                for c in self.feature_channels
            ]
        )

    def __call__(self, x: jax.Array, y: jax.Array) -> jax.Array:
        x = (x - self.shift.value) / self.scale.value
        y = (y - self.shift.value) / self.scale.value
        fx = self.vgg(x)
        fy = self.vgg(y)
        total = 0.0
        for feat_x, feat_y, lin in zip(fx, fy, self.lins):
            diff = (_normalize_tensor(feat_x) - _normalize_tensor(feat_y)) ** 2
            total = total + jnp.mean(lin(diff), axis=(1, 2, 3))
        return total


@ILoss.register("lpips")
class LPIPSLoss(ILoss):
    def __init__(self, reduction: str = "mean") -> None:
        super().__init__(reduction)
        self.net = LPIPS(rngs=nnx.Rngs(0))

    def get_forward_args(self, forward_results: Any, batch: Any) -> Any:
        from ..constants import INPUT_KEY, PREDICTIONS_KEY

        return forward_results[PREDICTIONS_KEY], batch[INPUT_KEY]

    def forward(self, predictions: jax.Array, target: jax.Array) -> jax.Array:
        return self.net(predictions, target)
