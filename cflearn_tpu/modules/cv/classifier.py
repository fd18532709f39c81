"""Image classifier + ESRGAN translator + PixelCNN + SIREN.

Parity: reference `cflearn/modules/cv/classifier/` (encoder + linear head),
`cflearn/modules/cv/translator/rrdb.py:59` (`RRDBNet`, registered "rrdb" —
the ESRGAN super-resolution net), `cflearn/modules/cv/ar/pixel_cnn.py`
(auto-regressor "pixel_cnn"), `cflearn/modules/implicit/siren.py:36-190`
(`Siren`/`ImgSiren`).
"""

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ..common import register_module
from .common import auto_regressors, encoders


@register_module("clf")
@register_module("classifier", allow_duplicate=True)
class ImageClassifier(nnx.Module):
    """encoder (by name) + linear head."""

    def __init__(
        self,
        *,
        img_size: int = 28,
        in_channels: int = 1,
        num_classes: int = 10,
        encoder: str = "vanilla_1d",
        encoder_config: Optional[dict] = None,
        latent_dim: int = 128,
        rngs: nnx.Rngs,
    ) -> None:
        config = dict(encoder_config or {})
        config.setdefault("img_size", img_size)
        config.setdefault("in_channels", in_channels)
        if encoder in ("vanilla_1d",):
            config.setdefault("latent_dim", latent_dim)
        elif encoder == "vit":
            config.setdefault("latent_dim", latent_dim)
        self.encoder = encoders.build(encoder, rngs=rngs, **config)
        self.head = nnx.Linear(latent_dim, num_classes, rngs=rngs)

    def __call__(self, x: jax.Array) -> jax.Array:
        return self.head(self.encoder(x))


class RRDB(nnx.Module):
    """Residual-in-residual dense block."""

    def __init__(self, channels: int, growth: int, *, rngs: nnx.Rngs) -> None:
        self.dense_blocks = nnx.List(
            [_DenseBlock(channels, growth, rngs=rngs) for _ in range(3)]
        )

    def __call__(self, x: jax.Array) -> jax.Array:
        net = x
        for block in self.dense_blocks:
            net = block(net)
        return x + 0.2 * (net - x)


class _DenseBlock(nnx.Module):
    def __init__(self, channels: int, growth: int, *, rngs: nnx.Rngs) -> None:
        convs = []
        ch = channels
        for i in range(4):
            convs.append(nnx.Conv(ch, growth, kernel_size=(3, 3), padding="SAME", rngs=rngs))
            ch += growth
        self.convs = nnx.List(convs)
        self.conv_out = nnx.Conv(ch, channels, kernel_size=(3, 3), padding="SAME", rngs=rngs)

    def __call__(self, x: jax.Array) -> jax.Array:
        feats = [x]
        for conv in self.convs:
            out = jax.nn.leaky_relu(conv(jnp.concatenate(feats, axis=-1)), 0.2)
            feats.append(out)
        return x + 0.2 * self.conv_out(jnp.concatenate(feats, axis=-1))


@register_module("rrdb")
class RRDBNet(nnx.Module):
    """ESRGAN 4x super-resolution (reference `translator/rrdb.py:59`)."""

    def __init__(
        self,
        *,
        in_channels: int = 3,
        out_channels: int = 3,
        latent_channels: int = 64,
        growth_channels: int = 32,
        num_blocks: int = 23,
        upscale: int = 4,
        rngs: nnx.Rngs,
    ) -> None:
        self.upscale = upscale
        self.conv_first = nnx.Conv(in_channels, latent_channels, kernel_size=(3, 3), padding="SAME", rngs=rngs)
        self.body = nnx.List(
            [RRDB(latent_channels, growth_channels, rngs=rngs) for _ in range(num_blocks)]
        )
        self.conv_body = nnx.Conv(latent_channels, latent_channels, kernel_size=(3, 3), padding="SAME", rngs=rngs)
        self.conv_up1 = nnx.Conv(latent_channels, latent_channels, kernel_size=(3, 3), padding="SAME", rngs=rngs)
        self.conv_up2 = nnx.Conv(latent_channels, latent_channels, kernel_size=(3, 3), padding="SAME", rngs=rngs)
        self.conv_hr = nnx.Conv(latent_channels, latent_channels, kernel_size=(3, 3), padding="SAME", rngs=rngs)
        self.conv_last = nnx.Conv(latent_channels, out_channels, kernel_size=(3, 3), padding="SAME", rngs=rngs)

    def __call__(self, x: jax.Array) -> jax.Array:
        feat = self.conv_first(x)
        net = feat
        for block in self.body:
            net = block(net)
        feat = feat + self.conv_body(net)
        for conv in (self.conv_up1, self.conv_up2):
            b, h, w, c = feat.shape
            feat = jax.image.resize(feat, (b, h * 2, w * 2, c), "nearest")
            feat = jax.nn.leaky_relu(conv(feat), 0.2)
        feat = jax.nn.leaky_relu(self.conv_hr(feat), 0.2)
        return self.conv_last(feat)


@register_module("pixel_cnn")
@auto_regressors.register("pixel_cnn")
class PixelCNN(nnx.Module):
    """Masked-conv autoregressive model over discrete codes (reference
    `ar/pixel_cnn.py`)."""

    def __init__(
        self,
        *,
        num_codes: int = 256,
        img_size: int = 28,
        in_channels: int = 1,
        latent_channels: int = 128,
        num_layers: int = 6,
        channel_padding: Optional[int] = 16,
        num_classes: Optional[int] = None,
        rngs: nnx.Rngs,
    ) -> None:
        self.num_codes = num_codes
        self.img_size = img_size
        self.num_classes = num_classes
        convs = []
        norms = []
        ch = num_codes * in_channels
        # reference `ar/pixel_cnn.py:118-128` — conditional modeling rides a
        # (global) ChannelPadding over the input planes
        if channel_padding is not None:
            from ..core.high_level import ChannelPadding

            self.channel_padding = ChannelPadding(
                ch, channel_padding, num_classes=num_classes, rngs=rngs
            )
        elif num_classes is not None:
            raise ValueError(
                "`channel_padding` should be provided when `num_classes` is provided"
            )
        else:
            self.channel_padding = None
        for i in range(num_layers):
            mask_type = "A" if i == 0 else "B"
            convs.append(_MaskedConv(ch if i == 0 else latent_channels, latent_channels, mask_type, rngs=rngs))
            norms.append(nnx.BatchNorm(latent_channels, rngs=rngs))
        self.convs = nnx.List(convs)
        self.norms = nnx.List(norms)
        self.conv_out = nnx.Conv(latent_channels, num_codes * in_channels, kernel_size=(1, 1), rngs=rngs)
        self.in_channels = in_channels
        self.rngs = rngs

    @property
    def is_conditional(self) -> bool:
        return self.num_classes is not None

    def get_sample_labels(self, num_samples: int, class_idx: Optional[int] = None) -> Optional[jax.Array]:
        if self.num_classes is None:
            return None
        if class_idx is not None:
            return jnp.full((num_samples,), class_idx, dtype=jnp.int32)
        return jax.random.randint(self.rngs.default(), (num_samples,), 0, self.num_classes)

    def __call__(self, x: jax.Array, labels: Optional[jax.Array] = None) -> jax.Array:
        """x: integer codes (B, H, W[, C]) → logits (B, H, W, num_codes)."""
        if x.ndim == 3:
            x = x[..., None]
        onehot = jax.nn.one_hot(x.astype(jnp.int32), self.num_codes, dtype=jnp.float32)
        b, h, w, c, k = onehot.shape
        net = onehot.reshape(b, h, w, c * k)
        if self.channel_padding is not None:
            if self.num_classes is None:
                labels = None
            # conditional + missing labels raises inside ChannelPadding
            # (reference `high_level.py:90` — no silent random fallback)
            net = self.channel_padding(net, labels)
        for conv, norm in zip(self.convs, self.norms):
            net = jax.nn.relu(norm(conv(net)))
        return self.conv_out(net)

    def sample(
        self,
        num_samples: int,
        *,
        img_size: Optional[int] = None,
        labels: Optional[jax.Array] = None,
        class_idx: Optional[int] = None,
        key: Optional[jax.Array] = None,
    ) -> jax.Array:
        if key is None:
            key = self.rngs.default()
        h = w = img_size or self.img_size
        if not self.is_conditional:
            labels = None
        elif labels is None:
            labels = self.get_sample_labels(num_samples, class_idx)
        x = jnp.zeros((num_samples, h, w, self.in_channels), dtype=jnp.int32)
        # sequential ancestral sampling (host loop — sampling quality tool,
        # not a hot path)
        for i in range(h):
            for j in range(w):
                logits = self(x, labels)
                key, sub = jax.random.split(key)
                sampled = jax.random.categorical(sub, logits[:, i, j])
                x = x.at[:, i, j, 0].set(sampled)
        return x


class _MaskedConv(nnx.Module):
    def __init__(self, in_ch: int, out_ch: int, mask_type: str, *, kernel_size: int = 7, rngs: nnx.Rngs) -> None:
        self.conv = nnx.Conv(in_ch, out_ch, kernel_size=(kernel_size, kernel_size), padding="SAME", rngs=rngs)
        k = kernel_size
        mask = np.zeros((k, k, 1, 1), dtype=np.float32)
        mask[: k // 2] = 1.0
        mask[k // 2, : k // 2] = 1.0
        if mask_type == "B":
            mask[k // 2, k // 2] = 1.0
        self.mask = nnx.Variable(jnp.asarray(mask))

    def __call__(self, x: jax.Array) -> jax.Array:
        self.conv.kernel[...] = self.conv.kernel[...] * self.mask[...]
        return self.conv(x)


@register_module("siren")
class ImgSiren(nnx.Module):
    """SIREN implicit image (reference `implicit/siren.py:36-190`)."""

    def __init__(
        self,
        *,
        img_size: int = 64,
        in_dim: int = 2,
        out_channels: int = 3,
        latent_dim: int = 256,
        num_layers: int = 5,
        w_sin: float = 30.0,
        rngs: nnx.Rngs,
    ) -> None:
        self.img_size = img_size
        layers = []
        ch = in_dim
        for i in range(num_layers):
            layers.append(nnx.Linear(ch, latent_dim, rngs=rngs))
            ch = latent_dim
        self.layers = nnx.List(layers)
        self.head = nnx.Linear(ch, out_channels, rngs=rngs)
        self.w_sin = w_sin

    def __call__(self, coords: Optional[jax.Array] = None) -> jax.Array:
        if coords is None:
            grid = jnp.stack(
                jnp.meshgrid(
                    jnp.linspace(-1.0, 1.0, self.img_size),
                    jnp.linspace(-1.0, 1.0, self.img_size),
                    indexing="ij",
                ),
                axis=-1,
            )
            coords = grid.reshape(-1, 2)[None]
        net = coords
        for i, layer in enumerate(self.layers):
            w = self.w_sin if i == 0 else 1.0
            net = jnp.sin(w * layer(net))
        return self.head(net)

    def to_image(self, out: jax.Array) -> jax.Array:
        b = out.shape[0]
        return jnp.tanh(out.reshape(b, self.img_size, self.img_size, -1))


def make_grid(size: int, in_dim: int = 2) -> jax.Array:
    """[-1, 1] coordinate grid, flattened to (1, size^in_dim, in_dim)
    (reference `implicit/siren.py:21`)."""
    axes = [jnp.linspace(-1.0, 1.0, size) for _ in range(in_dim)]
    grid = jnp.stack(jnp.meshgrid(*axes, indexing="ij"), axis=-1)
    return grid.reshape(1, -1, in_dim)


def img_siren_head(size: int, out_channels: int) -> Any:
    """Reshape flat SIREN outputs to an NHWC image (reference
    `implicit/siren.py:27`)."""

    def head(net: jax.Array) -> jax.Array:
        return net.reshape(net.shape[0], size, size, out_channels)

    return head


class Siren(nnx.Module):
    """Bare sinusoidal coordinate MLP (reference `implicit/siren.py:97` —
    `ImgSiren` composes this with `make_grid` + `img_siren_head`)."""

    def __init__(
        self,
        *,
        in_dim: int = 2,
        out_dim: int = 3,
        latent_dim: int = 256,
        num_layers: int = 5,
        w_sin: float = 30.0,
        rngs: nnx.Rngs,
    ) -> None:
        layers = []
        ch = in_dim
        for _ in range(num_layers):
            layers.append(nnx.Linear(ch, latent_dim, rngs=rngs))
            ch = latent_dim
        self.layers = nnx.List(layers)
        self.head = nnx.Linear(ch, out_dim, rngs=rngs)
        self.w_sin = w_sin

    def __call__(self, coords: jax.Array) -> jax.Array:
        net = coords
        for i, layer in enumerate(self.layers):
            w = self.w_sin if i == 0 else 1.0
            net = jnp.sin(w * layer(net))
        return self.head(net)


# reference class name (`cv/classifier/vanilla.py` VanillaClassifier)
VanillaClassifier = ImageClassifier
