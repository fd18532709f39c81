"""GAN generators & discriminators.

Parity: reference `cflearn/modules/cv/gan/` — `gan` generator
(`vanilla.py` — 1d-latent decoder generator, class-conditional optional) and
discriminators `basic`/`multi_scale` (`discriminators.py:30+` — NLayer
PatchGAN discriminators used both standalone and inside the AE adversarial
losses).
"""

from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import nnx

from ..common import register_module
from .common import discriminators, generators
from .decoder import VanillaDecoder1D


@register_module("gan")
@generators.register("gan")
class VanillaGenerator(nnx.Module):
    """Latent-noise generator (reference `gan/vanilla.py`)."""

    def __init__(
        self,
        *,
        img_size: int = 64,
        out_channels: int = 3,
        latent_dim: int = 128,
        latent_resolution: int = 8,
        num_classes: Optional[int] = None,
        norm_type: Optional[str] = "batch_norm",
        rngs: nnx.Rngs,
    ) -> None:
        self.latent_dim = latent_dim
        self.num_classes = num_classes
        in_dim = latent_dim
        if num_classes is not None:
            self.label_embed = nnx.Embed(num_classes, latent_dim, rngs=rngs)
            in_dim = latent_dim * 2
        else:
            self.label_embed = None
        self.decoder = VanillaDecoder1D(
            img_size=img_size,
            out_channels=out_channels,
            latent_dim=in_dim,
            latent_resolution=latent_resolution,
            norm_type=norm_type,
            rngs=rngs,
        )
        self.rngs = rngs

    @property
    def is_conditional(self) -> bool:
        return self.num_classes is not None

    def decode(self, z: jax.Array, *, labels: Optional[jax.Array] = None) -> jax.Array:
        if self.label_embed is not None:
            assert labels is not None
            z = jnp.concatenate([z, self.label_embed(labels.ravel())], axis=-1)
        return jnp.tanh(self.decoder(z))

    def sample(self, num_samples: int, *, labels: Optional[jax.Array] = None, key: Optional[jax.Array] = None) -> jax.Array:
        if key is None:
            key = self.rngs.default()
        z = jax.random.normal(key, (num_samples, self.latent_dim))
        return self.decode(z, labels=labels)

    def __call__(self, num_samples_or_z: Any, *, labels: Optional[jax.Array] = None) -> jax.Array:
        if isinstance(num_samples_or_z, int):
            return self.sample(num_samples_or_z, labels=labels)
        return self.decode(num_samples_or_z, labels=labels)


class NLayerDiscriminator(nnx.Module):
    """PatchGAN discriminator (reference `gan/discriminators.py`)."""

    def __init__(
        self,
        *,
        in_channels: int = 3,
        num_layers: int = 3,
        start_channels: int = 64,
        num_classes: Optional[int] = None,
        rngs: nnx.Rngs,
    ) -> None:
        blocks: List[Any] = []
        norms: List[Any] = []
        ch = in_channels
        out = start_channels
        for i in range(num_layers):
            stride = 2 if i < num_layers - 1 else 1
            blocks.append(
                nnx.Conv(ch, out, kernel_size=(4, 4), strides=(stride, stride), padding=[(1, 1), (1, 1)], rngs=rngs)
            )
            norms.append(nnx.BatchNorm(out, rngs=rngs) if i > 0 else None)
            ch = out
            out = min(start_channels * 8, out * 2)
        self.blocks = nnx.List(blocks)
        self.norms = nnx.List(norms)
        self.conv_out = nnx.Conv(ch, 1, kernel_size=(4, 4), padding=[(1, 1), (1, 1)], rngs=rngs)
        self.num_classes = num_classes
        # class-conditional logits head on the final feature map (reference
        # `gan/discriminators.py:89-93`: 4x4 conv -> spatial mean)
        if num_classes is not None:
            self.cond = nnx.Conv(ch, num_classes, kernel_size=(4, 4), padding=[(1, 1), (1, 1)], rngs=rngs)
        else:
            self.cond = nnx.data(None)

    def features(self, x: jax.Array) -> jax.Array:
        net = x
        for conv, norm in zip(self.blocks, self.norms):
            net = conv(net)
            if norm is not None:
                net = norm(net)
            net = jax.nn.leaky_relu(net, 0.2)
        return net

    def __call__(self, x: jax.Array) -> jax.Array:
        return self.conv_out(self.features(x))

    def forward_with_cond(self, x: jax.Array) -> Tuple[jax.Array, Optional[jax.Array]]:
        feature_map = self.features(x)
        logits = self.conv_out(feature_map)
        cond_logits = None
        if self.cond is not None:
            cond_logits = jnp.mean(self.cond(feature_map), axis=(1, 2))
        return logits, cond_logits


@discriminators.register("basic")
class BasicDiscriminator(NLayerDiscriminator):
    pass


@discriminators.register("multi_scale")
class MultiScaleDiscriminator(nnx.Module):
    """N discriminators at halved scales (reference `discriminators.py`)."""

    def __init__(
        self,
        *,
        in_channels: int = 3,
        num_scales: int = 3,
        num_layers: int = 3,
        start_channels: int = 64,
        rngs: nnx.Rngs,
    ) -> None:
        self.nets = nnx.List(
            [
                NLayerDiscriminator(
                    in_channels=in_channels,
                    num_layers=num_layers,
                    start_channels=start_channels,
                    rngs=rngs,
                )
                for _ in range(num_scales)
            ]
        )

    def __call__(self, x: jax.Array) -> List[jax.Array]:
        outs = []
        net = x
        for i, d in enumerate(self.nets):
            outs.append(d(net))
            if i != len(self.nets) - 1:
                b, h, w, c = net.shape
                net = jax.image.resize(net, (b, h // 2, w // 2, c), "bilinear")
        return outs


# reference class name (`modules/cv/gan/vanilla.py` GAN — the generator module)
GAN = VanillaGenerator
