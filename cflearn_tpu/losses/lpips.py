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
        # VGG16's five pooling stages need >=32px input — a smaller map
        # pools down to zero size and the tap means turn NaN. LPIPS is
        # scale-robust, so upsample tiny inputs instead of crashing.
        b, h, w, c = x.shape
        if h < 32 or w < 32:
            x = jax.image.resize(x, (b, max(h, 32), max(w, 32), c), "bilinear")
            y = jax.image.resize(y, (b, max(h, 32), max(w, 32), c), "bilinear")
        x = (x - self.shift[...]) / self.scale[...]
        y = (y - self.shift[...]) / self.scale[...]
        fx = self.vgg(x)
        fy = self.vgg(y)
        total = 0.0
        for feat_x, feat_y, lin in zip(fx, fy, self.lins):
            diff = (_normalize_tensor(feat_x) - _normalize_tensor(feat_y)) ** 2
            total = total + jnp.mean(lin(diff), axis=(1, 2, 3))
        return total


@ILoss.register("lpips")
class LPIPSLoss(ILoss):
    """`pretrained` policy: "auto" (default) loads the torchvision-VGG16 +
    lpips lin-head checkpoints when they are reachable/cached and falls back
    to random weights with a warning otherwise (keeps zero-egress CI
    runnable); True requires them; False skips."""

    def __init__(self, reduction: str = "mean", pretrained: Any = "auto") -> None:
        super().__init__(reduction)
        if pretrained in (False, None):
            self.net = LPIPS(rngs=nnx.Rngs(0))
        else:
            try:
                self.net = load_lpips(pretrained=True)
            except Exception as e:  # noqa: BLE001 — auto policy degrades
                if pretrained is True:
                    raise
                import warnings

                warnings.warn(
                    f"LPIPS pretrained weights unavailable ({e}); using random "
                    "weights — perceptual distances are NOT meaningful"
                )
                self.net = LPIPS(rngs=nnx.Rngs(0))

    def get_forward_args(self, forward_results: Any, batch: Any) -> Any:
        from ..constants import INPUT_KEY, PREDICTIONS_KEY

        return forward_results[PREDICTIONS_KEY], batch[INPUT_KEY]

    def forward(self, predictions: jax.Array, target: jax.Array) -> jax.Array:
        return self.net(predictions, target)


# -----------------------------------------------------------------------------
# pretrained weights (reference `losses/lpips.py:50-64`: torchvision VGG16
# backbone + the 7.6KB "lpips" lin-head checkpoint from the zoo index)
# -----------------------------------------------------------------------------

_VGG16_TORCH_CONV_IDS = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]


def convert_vgg16(torch_sd: Any) -> Any:
    """torchvision `vgg16-397923af.pth` features.* → our VGG16Features npd."""
    import numpy as np

    out = {}
    for i, ti in enumerate(_VGG16_TORCH_CONV_IDS):
        w = np.asarray(torch_sd[f"features.{ti}.weight"])
        out[f"convs/{i}/kernel/value"] = np.transpose(w, (2, 3, 1, 0))
        out[f"convs/{i}/bias/value"] = np.asarray(torch_sd[f"features.{ti}.bias"])
    return out


def convert_lpips(torch_sd: Any) -> Any:
    """The reference-hosted `lpips.pt` lin heads (`mappings.{i}.net.1.weight`,
    torch (1, C, 1, 1)) → our `lins/{i}` 1x1 convs ((1, 1, C, 1) HWIO)."""
    import numpy as np

    out = {}
    for k, v in torch_sd.items():
        parts = k.split(".")
        # accept both `mappings.{i}.net.{j}.weight` (reference) and the
        # original lpips repo's `lin{i}.model.{j}.weight`
        if parts[0] == "mappings":
            i = int(parts[1])
        elif parts[0].startswith("lin") and parts[0][3:].isdigit():
            i = int(parts[0][3:])
        else:
            continue
        w = np.asarray(v)  # (1, C, 1, 1)
        out[f"lins/{i}/kernel/value"] = np.transpose(w, (2, 3, 1, 0))
    return out


def load_lpips(
    lpips_ckpt: Any = None,
    vgg_ckpt: Any = None,
    *,
    pretrained: bool = False,
    rngs: Any = None,
) -> LPIPS:
    """Build LPIPS; when `pretrained` (or explicit paths), load the VGG16
    backbone + lin heads. Downloads resolve through the zoo index entries
    `vgg16_torchvision` / `lpips` (sha-verified where recorded)."""
    net = LPIPS(rngs=rngs or nnx.Rngs(0))
    if not (pretrained or lpips_ckpt or vgg_ckpt):
        return net
    from ..toolkit.misc import download
    from ..toolkit.tree import npd_to_tree
    from ..zoo.common import get_available
    from ..zoo.convert import load_torch_state_dict

    index = get_available().get("checkpoints", {})
    if vgg_ckpt is None:
        entry = index.get("vgg16_torchvision", {})
        vgg_ckpt = str(download(entry["url"], sha=entry.get("sha")))
    if lpips_ckpt is None:
        entry = index.get("lpips", {})
        lpips_ckpt = str(download(entry["url"], sha=entry.get("sha")))
    vgg_npd = convert_vgg16(load_torch_state_dict(vgg_ckpt))
    nnx.update(net.vgg, npd_to_tree(vgg_npd, nnx.state(net.vgg), strict=True))
    lin_npd = {
        k[len("lins/"):]: v for k, v in convert_lpips(load_torch_state_dict(lpips_ckpt)).items()
    }
    lins_state = nnx.state(net.lins)
    nnx.update(net.lins, npd_to_tree(lin_npd, lins_state, strict=True))
    return net
