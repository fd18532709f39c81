"""CV encoders.

Parity: reference `cflearn/modules/cv/encoder/` — `vanilla`/`vanilla_1d`
(`vanilla.py`), `attention` (`attn.py` → `AttnEncoder` in `ae.py` here),
`vit` (`transformer.py`), `backbone` (`backbone/api.py:33`).
"""

from typing import Any, List, Optional

import jax
import jax.numpy as jnp
from flax import nnx

from ..common import register_module
from ..core.high_level import VanillaPatchEmbed
from ..core.mixed_stacks import MixedStackedEncoder
from ..core.norms import NormFactory
from .common import encoders


@encoders.register("vanilla")
class VanillaEncoder(nnx.Module):
    """Conv stack downsampling to a feature map."""

    def __init__(
        self,
        *,
        img_size: int = 64,
        in_channels: int = 3,
        latent_channels: int = 128,
        num_downsample: int = 2,
        norm_type: Optional[str] = "batch_norm",
        rngs: nnx.Rngs,
    ) -> None:
        self.num_downsample = num_downsample
        blocks: List[Any] = []
        ch = in_channels
        out_ch = latent_channels // (2 ** max(0, num_downsample - 1))
        out_ch = max(16, out_ch)
        for i in range(num_downsample):
            blocks.append(
                nnx.Conv(ch, out_ch, kernel_size=(4, 4), strides=(2, 2), padding="SAME", rngs=rngs)
            )
            norm = NormFactory(norm_type).make(out_ch, rngs=rngs)
            blocks.append(norm)
            ch = out_ch
            out_ch = min(latent_channels, out_ch * 2)
        self.blocks = nnx.List(blocks)
        self.conv_out = nnx.Conv(ch, latent_channels, kernel_size=(3, 3), padding="SAME", rngs=rngs)
        self.latent_channels = latent_channels

    def __call__(self, x: jax.Array) -> jax.Array:
        net = x
        for i in range(0, len(self.blocks), 2):
            net = self.blocks[i](net)
            net = jax.nn.leaky_relu(self.blocks[i + 1](net), 0.2)
        return self.conv_out(net)


@encoders.register("vanilla_1d")
class VanillaEncoder1D(nnx.Module):
    """Conv encoder pooled to a 1d latent."""

    def __init__(
        self,
        *,
        img_size: int = 64,
        in_channels: int = 3,
        latent_dim: int = 128,
        num_downsample: int = 3,
        norm_type: Optional[str] = "batch_norm",
        rngs: nnx.Rngs,
    ) -> None:
        self.encoder = VanillaEncoder(
            img_size=img_size,
            in_channels=in_channels,
            latent_channels=latent_dim,
            num_downsample=num_downsample,
            norm_type=norm_type,
            rngs=rngs,
        )
        self.latent_dim = latent_dim

    def __call__(self, x: jax.Array) -> jax.Array:
        net = self.encoder(x)
        return jnp.mean(net, axis=(1, 2))


@register_module("vit")
@encoders.register("vit")
class ViTEncoder(nnx.Module):
    """ViT encoder (reference `encoder/transformer.py`)."""

    def __init__(
        self,
        *,
        img_size: int = 224,
        patch_size: int = 16,
        in_channels: int = 3,
        latent_dim: int = 384,
        num_layers: int = 12,
        num_heads: int = 6,
        dropout: float = 0.0,
        rngs: nnx.Rngs,
    ) -> None:
        self.patch_embed = VanillaPatchEmbed(img_size, patch_size, in_channels, latent_dim, rngs=rngs)
        self.encoder = MixedStackedEncoder(
            latent_dim,
            self.patch_embed.num_patches,
            token_mixing_type="attention",
            token_mixing_config={"num_heads": num_heads},
            num_layers=num_layers,
            dropout=dropout,
            use_head_token=True,
            use_positional_encoding=True,
            rngs=rngs,
        )
        self.latent_dim = latent_dim

    def __call__(self, x: jax.Array, *, return_tokens: bool = False) -> jax.Array:
        tokens = self.patch_embed(x)
        return self.encoder(tokens, return_tokens=return_tokens)


class _VGGStage(nnx.Module):
    def __init__(self, in_ch: int, out_ch: int, num_convs: int, *, rngs: nnx.Rngs) -> None:
        convs = []
        ch = in_ch
        for _ in range(num_convs):
            convs.append(nnx.Conv(ch, out_ch, kernel_size=(3, 3), padding="SAME", rngs=rngs))
            ch = out_ch
        self.convs = nnx.List(convs)

    def __call__(self, x: jax.Array) -> jax.Array:
        for conv in self.convs:
            x = jax.nn.relu(conv(x))
        return nnx.max_pool(x, (2, 2), strides=(2, 2))


class _MBConvStage(nnx.Module):
    """MobileNet-style: depthwise stride-2 + pointwise."""

    def __init__(self, in_ch: int, out_ch: int, *, rngs: nnx.Rngs) -> None:
        self.dw = nnx.Conv(in_ch, in_ch, kernel_size=(3, 3), strides=(2, 2), padding="SAME",
                           feature_group_count=in_ch, rngs=rngs)
        self.pw = nnx.Conv(in_ch, out_ch, kernel_size=(1, 1), rngs=rngs)
        self.bn = nnx.BatchNorm(out_ch, rngs=rngs)

    def __call__(self, x: jax.Array) -> jax.Array:
        return jax.nn.relu6(self.bn(self.pw(self.dw(x))))


@register_module("backbone")
@encoders.register("backbone")
class BackboneEncoder(nnx.Module):
    """Named-backbone wrapper (reference `encoder/backbone/api.py:33` +
    presets under `backbone/models/` for vgg/mobilenet/vit).

    The reference wraps torchvision backbones through
    `IntermediateLayerGetter`; here backbones are in-repo conv stacks
    registered by preset name — feature pyramid output via `return_stages`.
    """

    presets = ("simple", "vgg16", "mobilenet")

    def __init__(
        self,
        name: str = "simple",
        *,
        in_channels: int = 3,
        latent_channels: int = 256,
        num_stages: int = 4,
        rngs: nnx.Rngs,
    ) -> None:
        self.name = name
        stages: List[Any] = []
        if name == "vgg16":
            cfg = [(in_channels, 64, 2), (64, 128, 2), (128, 256, 3), (256, 512, 3)][:num_stages]
            for i, o, n in cfg:
                stages.append(_VGGStage(i, o, n, rngs=rngs))
            ch = cfg[-1][1]
        elif name == "mobilenet":
            ch = in_channels
            out = max(32, latent_channels // (2 ** (num_stages - 1)))
            for _ in range(num_stages):
                stages.append(_MBConvStage(ch, out, rngs=rngs))
                ch = out
                out = min(latent_channels, out * 2)
        else:
            ch = in_channels
            out = max(32, latent_channels // (2 ** (num_stages - 1)))
            for _ in range(num_stages):
                stages.append(
                    nnx.Conv(ch, out, kernel_size=(3, 3), strides=(2, 2), padding="SAME", rngs=rngs)
                )
                ch = out
                out = min(latent_channels, out * 2)
        self.stages = nnx.List(stages)
        self.latent_channels = ch

    def __call__(self, x: jax.Array, *, return_stages: bool = False) -> Any:
        feats = []
        net = x
        for stage in self.stages:
            if isinstance(stage, nnx.Conv):
                net = jax.nn.relu(stage(net))
            else:
                net = stage(net)
            feats.append(net)
        if return_stages:
            return feats
        return net
