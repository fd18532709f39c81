"""CV decoders (reference `cflearn/modules/cv/decoder/` — `vanilla`
(`vanilla.py:23`), `vanilla_1d`, `attention` → `AttnDecoder` in `ae.py`)."""

from typing import Any, List, Optional

import jax
import jax.numpy as jnp
from flax import nnx

from ..core.convs import UpsampleConv2d
from ..core.norms import NormFactory
from .common import DecoderInputs, decoders


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
        rngs: nnx.Rngs,
    ) -> None:
        blocks: List[Any] = []
        ch = latent_channels
        for i in range(num_upsample):
            out_ch = max(16, ch // 2)
            blocks.append(UpsampleConv2d(ch, out_ch, factor=2.0, rngs=rngs))
            blocks.append(NormFactory(norm_type).make(out_ch, rngs=rngs))
            ch = out_ch
        self.blocks = nnx.List(blocks)
        self.conv_out = nnx.Conv(ch, out_channels, kernel_size=(3, 3), padding="SAME", rngs=rngs)

    def __call__(self, inputs: Any) -> jax.Array:
        net = inputs.z if isinstance(inputs, DecoderInputs) else inputs
        for i in range(0, len(self.blocks), 2):
            net = self.blocks[i](net)
            net = jax.nn.relu(self.blocks[i + 1](net))
        return self.conv_out(net)


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
        rngs: nnx.Rngs,
    ) -> None:
        import math

        self.latent_resolution = latent_resolution
        self.latent_dim = latent_dim
        if num_upsample is None:
            num_upsample = int(math.log2(img_size // latent_resolution))
        self.from_latent = nnx.Linear(latent_dim, latent_dim * latent_resolution**2, rngs=rngs)
        self.decoder = VanillaDecoder(
            img_size=img_size,
            out_channels=out_channels,
            latent_channels=latent_dim,
            num_upsample=num_upsample,
            norm_type=norm_type,
            rngs=rngs,
        )

    def __call__(self, inputs: Any) -> jax.Array:
        z = inputs.z if isinstance(inputs, DecoderInputs) else inputs
        net = self.from_latent(z)
        r = self.latent_resolution
        net = net.reshape(z.shape[0], r, r, self.latent_dim)
        return self.decoder(net)
