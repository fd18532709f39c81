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
        pipeline_parallel: bool = False,
        pp_microbatches: Optional[int] = None,
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
            pipeline_parallel=pipeline_parallel,
            pp_microbatches=pp_microbatches,
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


# ---------------------------------------------------------------------------
# backbone registry (reference `encoder/backbone/register.py` +
# `backbone/core.py:78` Backbone): named feature-pyramid extractors with
# per-stage channel specs
# ---------------------------------------------------------------------------

class BackboneInfo:
    def __init__(self, fn: Any, out_channels: List[int], stage_names: List[str]) -> None:
        self.fn = fn
        self.out_channels = out_channels
        self.stage_names = stage_names


backbone_info_dict: dict = {}


def register_backbone(name: str, out_channels: List[int], stage_names: List[str]) -> Any:
    def _register(fn: Any) -> Any:
        backbone_info_dict[name] = BackboneInfo(fn, out_channels, stage_names)
        return fn

    return _register


class RepVGGBlock(nnx.Module):
    """Structural-reparameterization block (reference
    `backbone/models/vgg.py:140-283`): train-time dense3x3+side1x1+identity
    BN branches; `switch_to_deploy` fuses them into ONE 3x3 conv — the form
    the MXU actually runs at inference."""

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        *,
        stride: int = 1,
        use_post_se: bool = True,
        rngs: nnx.Rngs,
    ) -> None:
        from ..core.convs import SEBlock

        self.in_channels = in_channels
        self.out_channels = out_channels
        self.stride = stride
        self.deploy = False
        self.dense = nnx.Conv(in_channels, out_channels, kernel_size=(3, 3), strides=(stride, stride), padding=[(1, 1), (1, 1)], use_bias=False, rngs=rngs)
        self.dense_bn = nnx.BatchNorm(out_channels, rngs=rngs)
        self.side = nnx.Conv(in_channels, out_channels, kernel_size=(1, 1), strides=(stride, stride), use_bias=False, rngs=rngs)
        self.side_bn = nnx.BatchNorm(out_channels, rngs=rngs)
        if out_channels == in_channels and stride == 1:
            self.identity = nnx.BatchNorm(out_channels, rngs=rngs)
        else:
            self.identity = nnx.data(None)
        self.post_se = SEBlock(out_channels, max(1, out_channels // 4), rngs=rngs) if use_post_se else nnx.data(None)
        self.conv_fused = nnx.data(None)

    def __call__(self, x: jax.Array) -> jax.Array:
        if self.conv_fused is not None:
            net = jax.nn.relu(self.conv_fused(x))
        else:
            out = self.dense_bn(self.dense(x)) + self.side_bn(self.side(x))
            if self.identity is not None:
                out = out + self.identity(x)
            net = jax.nn.relu(out)
        if self.post_se is not None:
            net = self.post_se(net)
        return net

    def _fuse_bn(self, kernel: jax.Array, bn: nnx.BatchNorm) -> Any:
        std = jnp.sqrt(bn.var[...] + bn.epsilon)
        t = (bn.scale[...] / std).reshape(1, 1, 1, -1)  # HWIO out dim last
        return kernel * t, bn.bias[...] - bn.mean[...] * bn.scale[...] / std

    def switch_to_deploy(self) -> None:
        if self.conv_fused is not None:
            return
        k3, b3 = self._fuse_bn(self.dense.kernel[...], self.dense_bn)
        k1, b1 = self._fuse_bn(
            jnp.pad(self.side.kernel[...], ((1, 1), (1, 1), (0, 0), (0, 0))), self.side_bn
        )
        kernel, bias = k3 + k1, b3 + b1
        if self.identity is not None:
            kid = jnp.zeros((3, 3, self.in_channels, self.out_channels))
            kid = kid.at[1, 1, jnp.arange(self.in_channels), jnp.arange(self.in_channels)].set(1.0)
            kf, bf = self._fuse_bn(kid, self.identity)
            kernel, bias = kernel + kf, bias + bf
        fused = nnx.Conv(
            self.in_channels,
            self.out_channels,
            kernel_size=(3, 3),
            strides=(self.stride, self.stride),
            padding=[(1, 1), (1, 1)],
            rngs=nnx.Rngs(0),
        )
        fused.kernel[...] = kernel
        fused.bias[...] = bias
        self.conv_fused = fused
        # drop the train-time branches (reference `vgg.py` __delattr__ after
        # fusion) so deploy-time state carries only the fused conv
        self.dense = nnx.data(None)
        self.dense_bn = nnx.data(None)
        self.side = nnx.data(None)
        self.side_bn = nnx.data(None)
        self.identity = nnx.data(None)
        self.deploy = True


class RepVGGStage(nnx.Module):
    def __init__(self, in_channels: int, latent_channels: int, num_blocks: int, *, stride: int = 1, use_post_se: bool = True, rngs: nnx.Rngs) -> None:
        strides = [stride] + [1] * (num_blocks - 1)
        blocks = []
        ch = in_channels
        for s in strides:
            blocks.append(RepVGGBlock(ch, latent_channels, stride=s, use_post_se=use_post_se, rngs=rngs))
            ch = latent_channels
        self.net = nnx.List(blocks)

    def __call__(self, x: jax.Array) -> jax.Array:
        for block in self.net:
            x = block(x)
        return x

    def switch_to_deploy(self) -> None:
        for block in self.net:
            block.switch_to_deploy()


class RepVGG(nnx.Module):
    """reference `backbone/models/vgg.py:326` (RepVGG-B/Lite widths)."""

    def __init__(self, num_blocks: List[int], width_multiplier: List[float], *, in_channels: int = 3, use_post_se: bool = True, rngs: nnx.Rngs) -> None:
        w = width_multiplier
        c0 = min(64, int(64 * w[0]))
        self.stage1 = RepVGGBlock(in_channels, c0, stride=2, use_post_se=use_post_se, rngs=rngs)
        self.stage2 = RepVGGStage(c0, int(64 * w[0]), num_blocks[0], stride=2, use_post_se=use_post_se, rngs=rngs)
        self.stage3 = RepVGGStage(int(64 * w[0]), int(128 * w[1]), num_blocks[1], stride=2, use_post_se=use_post_se, rngs=rngs)
        self.stage4_first = RepVGGStage(int(128 * w[1]), int(256 * w[2]), num_blocks[2] // 2, stride=2, use_post_se=use_post_se, rngs=rngs)
        self.stage4_second = RepVGGStage(int(256 * w[2]), int(256 * w[2]), num_blocks[2] // 2, stride=1, use_post_se=use_post_se, rngs=rngs)
        self.stage5 = RepVGGStage(int(256 * w[2]), int(512 * w[3]), num_blocks[3], stride=2, use_post_se=use_post_se, rngs=rngs)

    def __call__(self, x: jax.Array) -> jax.Array:
        for name in ("stage1", "stage2", "stage3", "stage4_first", "stage4_second", "stage5"):
            x = getattr(self, name)(x)
        return x

    def switch_to_deploy(self) -> None:
        for name in ("stage1", "stage2", "stage3", "stage4_first", "stage4_second", "stage5"):
            getattr(self, name).switch_to_deploy()


@register_backbone("rep_vgg", [64, 128, 256, 512, 512, 2048], ["stage1", "stage2", "stage3", "stage4_first", "stage4_second", "stage5"])
def rep_vgg(pretrained: bool = False, *, rngs: Optional[nnx.Rngs] = None, **kwargs: Any) -> RepVGG:
    if pretrained:
        raise ValueError("`RepVGG` does not support `pretrained`")
    return RepVGG([4, 6, 16, 1], [2.0, 2.0, 2.0, 4.0], rngs=rngs or nnx.Rngs(0), **kwargs)


@register_backbone("rep_vgg_lite", [48, 48, 96, 192, 192, 1280], ["stage1", "stage2", "stage3", "stage4_first", "stage4_second", "stage5"])
def rep_vgg_lite(pretrained: bool = False, *, rngs: Optional[nnx.Rngs] = None, **kwargs: Any) -> RepVGG:
    if pretrained:
        raise ValueError("`RepVGG` does not support `pretrained`")
    return RepVGG([2, 4, 14, 1], [0.75, 0.75, 0.75, 2.5], rngs=rngs or nnx.Rngs(0), **kwargs)


@register_backbone("rep_vgg_large", [160, 160, 320, 640, 640, 2560], ["stage1", "stage2", "stage3", "stage4_first", "stage4_second", "stage5"])
def rep_vgg_large(pretrained: bool = False, *, rngs: Optional[nnx.Rngs] = None, **kwargs: Any) -> RepVGG:
    if pretrained:
        raise ValueError("`RepVGG` does not support `pretrained`")
    return RepVGG([8, 14, 24, 1], [2.5, 2.5, 2.5, 5.0], rngs=rngs or nnx.Rngs(0), **kwargs)


class OverlapPatchEmbed(nnx.Module):
    """Overlapping conv patch embed (reference `high_level.py` ImgToPatches
    "overlap" variant): stride < kernel, LayerNorm on tokens."""

    def __init__(self, in_channels: int, latent_dim: int, *, patch_size: int, stride: int, rngs: nnx.Rngs) -> None:
        pad = patch_size // 2
        self.proj = nnx.Conv(in_channels, latent_dim, kernel_size=(patch_size, patch_size), strides=(stride, stride), padding=[(pad, pad), (pad, pad)], rngs=rngs)
        self.norm = nnx.LayerNorm(latent_dim, rngs=rngs)

    def __call__(self, x: jax.Array) -> Any:
        net = self.proj(x)
        b, h, w, c = net.shape
        return self.norm(net.reshape(b, h * w, c)), (h, w)


class SRAttention(nnx.Module):
    """Spatial-reduction attention (SegFormer/MixViT: K/V come from a
    stride-R conv over the feature map — reference
    `encoder/backbone/models/transformer.py` attention kwargs
    `reduction_ratio`)."""

    def __init__(self, dim: int, num_heads: int, *, reduction_ratio: int = 1, rngs: nnx.Rngs) -> None:
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.q = nnx.Linear(dim, dim, rngs=rngs)
        self.kv = nnx.Linear(dim, dim * 2, rngs=rngs)
        self.proj = nnx.Linear(dim, dim, rngs=rngs)
        self.reduction_ratio = reduction_ratio
        if reduction_ratio > 1:
            self.sr = nnx.Conv(dim, dim, kernel_size=(reduction_ratio, reduction_ratio), strides=(reduction_ratio, reduction_ratio), rngs=rngs)
            self.sr_norm = nnx.LayerNorm(dim, rngs=rngs)
        else:
            self.sr = nnx.data(None)
            self.sr_norm = nnx.data(None)

    def __call__(self, x: jax.Array, hw: Any) -> jax.Array:
        b, n, c = x.shape
        h, w = hw
        q = self.q(x).reshape(b, n, self.num_heads, self.head_dim)
        kv_in = x
        if self.sr is not None:
            kv_in = self.sr(x.reshape(b, h, w, c))
            kv_in = self.sr_norm(kv_in.reshape(b, -1, c))
        kv = self.kv(kv_in).reshape(b, -1, 2, self.num_heads, self.head_dim)
        k, v = kv[:, :, 0], kv[:, :, 1]
        attn = jax.nn.softmax(
            jnp.einsum("bnhd,bmhd->bhnm", q, k) / jnp.sqrt(self.head_dim).astype(x.dtype), axis=-1
        )
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, n, c)
        return self.proj(out)


class MixViTBlock(nnx.Module):
    def __init__(self, dim: int, num_heads: int, *, reduction_ratio: int, ff_ratio: float, rngs: nnx.Rngs) -> None:
        from ..core.mixed_stacks import MixFeedForward

        self.norm1 = nnx.LayerNorm(dim, rngs=rngs)
        self.attn = SRAttention(dim, num_heads, reduction_ratio=reduction_ratio, rngs=rngs)
        self.norm2 = nnx.LayerNorm(dim, rngs=rngs)
        self.ff = MixFeedForward(dim, int(dim * ff_ratio), rngs=rngs)

    def __call__(self, x: jax.Array, hw: Any) -> jax.Array:
        x = x + self.attn(self.norm1(x), hw)
        return x + self.ff(self.norm2(x))


class MixViTStage(nnx.Module):
    def __init__(self, in_channels: int, dim: int, *, patch_size: int, stride: int, num_heads: int, num_layers: int, reduction_ratio: int, ff_ratio: float, rngs: nnx.Rngs) -> None:
        self.embed = OverlapPatchEmbed(in_channels, dim, patch_size=patch_size, stride=stride, rngs=rngs)
        self.blocks = nnx.List(
            [MixViTBlock(dim, num_heads, reduction_ratio=reduction_ratio, ff_ratio=ff_ratio, rngs=rngs) for _ in range(num_layers)]
        )
        self.norm = nnx.LayerNorm(dim, rngs=rngs)

    def __call__(self, x: jax.Array) -> jax.Array:
        net, hw = self.embed(x)
        for block in self.blocks:
            net = block(net, hw)
        net = self.norm(net)
        return net.reshape(net.shape[0], hw[0], hw[1], -1)


class MixViT(nnx.Module):
    """Hierarchical mix transformer (SegFormer-family; reference
    `encoder/backbone/models/transformer.py:26`)."""

    def __init__(
        self,
        in_channels: int,
        latent_dims: List[int],
        *,
        num_heads_list: List[int],
        feedforward_dim_ratios: List[float],
        num_layers_list: List[int],
        reduction_ratios: List[int],
        rngs: nnx.Rngs,
    ) -> None:
        ch = in_channels
        for i, dim in enumerate(latent_dims):
            patch_size, stride = (7, 4) if i == 0 else (3, 2)
            setattr(
                self,
                f"stage{i + 1}",
                MixViTStage(
                    ch,
                    dim,
                    patch_size=patch_size,
                    stride=stride,
                    num_heads=num_heads_list[i],
                    num_layers=num_layers_list[i],
                    reduction_ratio=reduction_ratios[i],
                    ff_ratio=feedforward_dim_ratios[i],
                    rngs=rngs,
                ),
            )
            ch = dim
        self.num_stages = len(latent_dims)

    def __call__(self, x: jax.Array) -> jax.Array:
        for i in range(self.num_stages):
            x = getattr(self, f"stage{i + 1}")(x)
        return x


def _mix_vit_ctor(latent_dims, num_heads_list, num_layers_list):
    def ctor(pretrained: bool = False, *, in_channels: int = 3, rngs: Optional[nnx.Rngs] = None, **kwargs: Any) -> MixViT:
        if pretrained:
            raise ValueError("`MixViT` does not support `pretrained`")
        return MixViT(
            in_channels,
            latent_dims,
            num_heads_list=num_heads_list,
            feedforward_dim_ratios=[4.0] * len(latent_dims),
            num_layers_list=num_layers_list,
            reduction_ratios=[8, 4, 2, 1],
            rngs=rngs or nnx.Rngs(0),
        )

    return ctor


mix_vit = register_backbone("mix_vit", [64, 128, 320, 512], ["stage1", "stage2", "stage3", "stage4"])(
    _mix_vit_ctor([64, 128, 320, 512], [1, 2, 5, 8], [3, 4, 18, 3])
)
mix_vit_lite = register_backbone("mix_vit_lite", [32, 64, 160, 256], ["stage1", "stage2", "stage3", "stage4"])(
    _mix_vit_ctor([32, 64, 160, 256], [1, 2, 5, 8], [2, 2, 2, 2])
)
mix_vit_large = register_backbone("mix_vit_large", [64, 128, 320, 512], ["stage1", "stage2", "stage3", "stage4"])(
    _mix_vit_ctor([64, 128, 320, 512], [1, 2, 5, 8], [3, 6, 40, 3])
)


class Backbone(nnx.Module):
    """Named backbone with per-stage feature-pyramid outputs (reference
    `backbone/core.py:78`; the torchvision `IntermediateLayerGetter` role is
    played by calling registered stages directly)."""

    def __init__(self, name: str = "rep_vgg", *, pretrained: bool = False, rngs: Optional[nnx.Rngs] = None, **kwargs: Any) -> None:
        info = backbone_info_dict.get(name)
        if info is None:
            raise ValueError(f"backbone '{name}' is not recognized (available: {sorted(backbone_info_dict)})")
        self.name = name
        self.out_channels = list(info.out_channels)
        self.latent_channels = self.out_channels[-1]
        self.stage_names = list(info.stage_names)
        self.core = info.fn(pretrained, rngs=rngs or nnx.Rngs(0), **kwargs)
        self.num_downsample = len(self.stage_names)

    def __call__(self, x: jax.Array) -> Any:
        from ...constants import LATENT_KEY

        out = {}
        net = x
        for stage_name in self.stage_names:
            net = getattr(self.core, stage_name)(net)
            out[stage_name] = net
        out[LATENT_KEY] = net
        return out


@encoders.register("backbone_1d")
class BackboneEncoder1D(nnx.Module):
    """Backbone pooled to a 1d latent (reference
    `encoder/backbone/api.py` BackboneEncoder1D)."""

    def __init__(self, name: str = "rep_vgg", *, rngs: Optional[nnx.Rngs] = None, **kwargs: Any) -> None:
        from ...constants import LATENT_KEY

        self.net = Backbone(name, rngs=rngs, **kwargs)
        # derived, never configurable (reference `backbone/api.py:90` sets
        # latent_dim = encoder.latent_channels)
        self.latent_dim = self.net.latent_channels
        self._latent_key = LATENT_KEY

    def __call__(self, x: jax.Array) -> jax.Array:
        latent = self.net(x)[self._latent_key]
        return jnp.mean(latent, axis=(1, 2))
