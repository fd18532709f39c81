"""CV decoders (reference `cflearn/modules/cv/decoder/` — `vanilla`
(`vanilla.py:23`), `vanilla_1d`, `attention` → `AttnDecoder` in `ae.py`).

Conditional decoding follows the reference `IDecoder.generate_cond/
inject_cond` recipe (`modules/cv/common.py:122-142`): when `num_classes` is
given, a conditional `ChannelPadding` mixes a per-class learned map into the
latent feature map before upsampling. `apply_tanh` matches the reference
decoder contract (`vanilla.py:153+` — off by default, overridable per call
via `DecoderInputs.apply_tanh`).
"""

from typing import Any, List, Optional

import jax
import jax.numpy as jnp
from flax import nnx

from ..core.convs import UpsampleConv2d
from ..core.high_level import ChannelPadding
from ..core.norms import NormFactory
from .common import DecoderInputs, decoders


def _resolve_tanh(default: bool, inputs: Any) -> bool:
    if isinstance(inputs, DecoderInputs) and inputs.apply_tanh is not None:
        return inputs.apply_tanh
    return default


@decoders.register("vanilla")
class VanillaDecoder(nnx.Module):
    def __init__(
        self,
        *,
        img_size: int = 64,
        out_channels: int = 3,
        latent_channels: int = 128,
        num_upsample: int = 2,
        norm_type: Optional[str] = "batch_norm",
        num_classes: Optional[int] = None,
        latent_resolution: Optional[int] = None,
        cond_channels: int = 16,
        apply_tanh: bool = False,
        rngs: nnx.Rngs,
    ) -> None:
        self.num_classes = num_classes
        self.latent_channels = latent_channels
        self.latent_resolution = latent_resolution
        self.apply_tanh = apply_tanh
        # reference `IDecoder.generate_cond` (`cv/common.py:122`)
        if num_classes is None:
            self.cond = None
        else:
            self.cond = ChannelPadding(
                latent_channels,
                cond_channels,
                latent_resolution,
                num_classes=num_classes,
                rngs=rngs,
            )
        blocks: List[Any] = []
        ch = latent_channels
        for i in range(num_upsample):
            out_ch = max(16, ch // 2)
            blocks.append(UpsampleConv2d(ch, out_ch, factor=2.0, rngs=rngs))
            blocks.append(NormFactory(norm_type).make(out_ch, rngs=rngs))
            ch = out_ch
        self.blocks = nnx.List(blocks)
        self.conv_out = nnx.Conv(ch, out_channels, kernel_size=(3, 3), padding="SAME", rngs=rngs)

    def inject_cond(self, net: jax.Array, labels: Optional[jax.Array]) -> jax.Array:
        if self.cond is None:
            return net
        return self.cond(net, labels)

    def __call__(self, inputs: Any) -> jax.Array:
        if isinstance(inputs, DecoderInputs):
            net = self.inject_cond(inputs.z, inputs.labels)
        else:
            net = self.inject_cond(inputs, None)
        for i in range(0, len(self.blocks), 2):
            net = self.blocks[i](net)
            net = jax.nn.relu(self.blocks[i + 1](net))
        net = self.conv_out(net)
        if _resolve_tanh(self.apply_tanh, inputs):
            net = jnp.tanh(net)
        return net

    def decode(self, inputs: DecoderInputs) -> jax.Array:
        return self(inputs)


@decoders.register("vanilla_1d")
class VanillaDecoder1D(nnx.Module):
    """1d latent → feature map → image."""

    def __init__(
        self,
        *,
        img_size: int = 64,
        out_channels: int = 3,
        latent_dim: int = 128,
        latent_resolution: int = 8,
        num_upsample: Optional[int] = None,
        norm_type: Optional[str] = "batch_norm",
        num_classes: Optional[int] = None,
        cond_channels: int = 16,
        apply_tanh: bool = False,
        rngs: nnx.Rngs,
    ) -> None:
        import math

        self.latent_resolution = latent_resolution
        self.latent_dim = latent_dim
        self.num_classes = num_classes
        self.apply_tanh = apply_tanh
        if num_upsample is None:
            num_upsample = int(math.log2(img_size // latent_resolution))
        self.from_latent = nnx.Linear(latent_dim, latent_dim * latent_resolution**2, rngs=rngs)
        self.decoder = VanillaDecoder(
            img_size=img_size,
            out_channels=out_channels,
            latent_channels=latent_dim,
            num_upsample=num_upsample,
            norm_type=norm_type,
            num_classes=num_classes,
            latent_resolution=latent_resolution,
            cond_channels=cond_channels,
            apply_tanh=False,
            rngs=rngs,
        )

    def __call__(self, inputs: Any) -> jax.Array:
        if isinstance(inputs, DecoderInputs):
            z, labels = inputs.z, inputs.labels
        else:
            z, labels = inputs, None
        net = self.from_latent(z)
        r = self.latent_resolution
        net = net.reshape(z.shape[0], r, r, self.latent_dim)
        net = self.decoder(DecoderInputs(z=net, labels=labels))
        if _resolve_tanh(self.apply_tanh, inputs):
            net = jnp.tanh(net)
        return net

    def decode(self, inputs: DecoderInputs) -> jax.Array:
        return self(inputs)
