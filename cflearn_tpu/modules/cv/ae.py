"""Autoencoders: the SD first-stage family (KL & VQ) + generic enc/dec.

Parity: reference `cflearn/modules/cv/ae/` — `ae_kl` (`ae/kl.py`,
GaussianDistribution latents; the SD VAE with f4/f8/f16 presets in
`zoo/configs/ae/kl`) and `ae_vq` (`ae/vq.py`); underlying conv encoder/
decoder match `cflearn/modules/cv/encoder/attn.py` / `decoder/attn.py`
(ResBlock stacks + mid attention). Channel-last NHWC throughout.
"""

from typing import Any, List, Optional

import jax
import jax.numpy as jnp
from flax import nnx

from ..common import register_module
from ..core.attentions import SpatialAttention
from ..core.convs import Downsample, ResidualBlock, UpsampleConv2d
from .common import GaussianDistribution, VQCodebook, generators


class AttnEncoder(nnx.Module):
    """Conv encoder: down blocks + mid attention (SD VAE encoder)."""

    def __init__(
        self,
        *,
        img_size: int = 256,
        in_channels: int = 3,
        inner_channels: int = 128,
        z_channels: int = 4,
        channel_multipliers: Optional[List[int]] = None,
        num_res_blocks: int = 2,
        attention_resolutions: Optional[List[int]] = None,
        dropout: float = 0.0,
        double_z: bool = True,
        attention_type: str = "spatial",
        resample_with_conv: bool = True,
        rngs: nnx.Rngs,
    ) -> None:
        channel_multipliers = channel_multipliers or [1, 2, 4, 4]
        attention_resolutions = attention_resolutions or []
        if attention_type == "none":
            # reference `ae/common.py` attention_type="none" (vq.f4_no_attn /
            # the LDM-inpainting first stage): attention-free mid block
            attention_resolutions = []
        self.conv_in = nnx.Conv(in_channels, inner_channels, kernel_size=(3, 3), padding="SAME", rngs=rngs)
        blocks: List[Any] = []
        ch = inner_channels
        resolution = img_size
        for i, mult in enumerate(channel_multipliers):
            out_ch = inner_channels * mult
            for _ in range(num_res_blocks):
                blocks.append(ResidualBlock(ch, out_ch, dropout=dropout, rngs=rngs))
                ch = out_ch
                if resolution in attention_resolutions:
                    blocks.append(SpatialAttention(ch, rngs=rngs))
            if i != len(channel_multipliers) - 1:
                blocks.append(Downsample(ch, use_conv=resample_with_conv, rngs=rngs))
                resolution //= 2
        self.blocks = nnx.List(blocks)
        self.mid_res1 = ResidualBlock(ch, ch, dropout=dropout, rngs=rngs)
        self.mid_attn = SpatialAttention(ch, rngs=rngs) if attention_type != "none" else None
        self.mid_res2 = ResidualBlock(ch, ch, dropout=dropout, rngs=rngs)
        self.norm_out = nnx.GroupNorm(ch, num_groups=32, epsilon=1e-6, rngs=rngs)
        out_z = 2 * z_channels if double_z else z_channels
        self.conv_out = nnx.Conv(ch, out_z, kernel_size=(3, 3), padding="SAME", rngs=rngs)

    def __call__(self, x: jax.Array) -> jax.Array:
        net = self.conv_in(x.astype(self.conv_in.kernel[...].dtype))
        for block in self.blocks:
            net = block(net)
        net = self.mid_res1(net)
        if self.mid_attn is not None:
            net = self.mid_attn(net)
        net = self.mid_res2(net)
        net = jax.nn.silu(self.norm_out(net))
        return self.conv_out(net)


class AttnDecoder(nnx.Module):
    """Conv decoder: mid attention + up blocks (SD VAE decoder)."""

    def __init__(
        self,
        *,
        img_size: int = 256,
        out_channels: int = 3,
        inner_channels: int = 128,
        z_channels: int = 4,
        channel_multipliers: Optional[List[int]] = None,
        num_res_blocks: int = 2,
        attention_resolutions: Optional[List[int]] = None,
        dropout: float = 0.0,
        attention_type: str = "spatial",
        resample_with_conv: bool = True,
        rngs: nnx.Rngs,
    ) -> None:
        channel_multipliers = channel_multipliers or [1, 2, 4, 4]
        attention_resolutions = attention_resolutions or []
        if attention_type == "none":
            attention_resolutions = []
        ch = inner_channels * channel_multipliers[-1]
        self.conv_in = nnx.Conv(z_channels, ch, kernel_size=(3, 3), padding="SAME", rngs=rngs)
        self.mid_res1 = ResidualBlock(ch, ch, dropout=dropout, rngs=rngs)
        self.mid_attn = SpatialAttention(ch, rngs=rngs) if attention_type != "none" else None
        self.mid_res2 = ResidualBlock(ch, ch, dropout=dropout, rngs=rngs)
        blocks: List[Any] = []
        resolution = img_size // (2 ** (len(channel_multipliers) - 1))
        for i, mult in reversed(list(enumerate(channel_multipliers))):
            out_ch = inner_channels * mult
            for _ in range(num_res_blocks + 1):
                blocks.append(ResidualBlock(ch, out_ch, dropout=dropout, rngs=rngs))
                ch = out_ch
                if resolution in attention_resolutions:
                    blocks.append(SpatialAttention(ch, rngs=rngs))
            if i != 0:
                if resample_with_conv:
                    blocks.append(UpsampleConv2d(ch, ch, factor=2.0, rngs=rngs))
                else:
                    blocks.append(Upsample2x())
                resolution *= 2
        self.blocks = nnx.List(blocks)
        self.norm_out = nnx.GroupNorm(ch, num_groups=32, epsilon=1e-6, rngs=rngs)
        self.conv_out = nnx.Conv(ch, out_channels, kernel_size=(3, 3), padding="SAME", rngs=rngs)

    def __call__(self, z: jax.Array) -> jax.Array:
        net = self.conv_in(z.astype(self.conv_in.kernel[...].dtype))
        net = self.mid_res1(net)
        if self.mid_attn is not None:
            net = self.mid_attn(net)
        net = self.mid_res2(net)
        for block in self.blocks:
            net = block(net)
        net = jax.nn.silu(self.norm_out(net))
        return self.conv_out(net)


@register_module("ae_kl")
@generators.register("ae_kl")
class AutoEncoderKL(nnx.Module):
    """SD first-stage KL autoencoder (reference `ae/kl.py`; registered
    "ae_kl" / `generators.ae_kl`)."""

    def __init__(
        self,
        *,
        img_size: int = 256,
        in_channels: int = 3,
        out_channels: int = 3,
        inner_channels: int = 128,
        z_channels: int = 4,
        embedding_channels: int = 4,
        channel_multipliers: Optional[List[int]] = None,
        num_res_blocks: int = 2,
        attention_resolutions: Optional[List[int]] = None,
        dropout: float = 0.0,
        attention_type: str = "spatial",
        apply_tanh: bool = False,
        resample_with_conv: bool = True,
        rngs: nnx.Rngs,
    ) -> None:
        self.apply_tanh = apply_tanh
        self.z_channels = z_channels
        self.embedding_channels = embedding_channels
        self.encoder = AttnEncoder(
            img_size=img_size,
            in_channels=in_channels,
            inner_channels=inner_channels,
            z_channels=z_channels,
            channel_multipliers=channel_multipliers,
            num_res_blocks=num_res_blocks,
            attention_resolutions=attention_resolutions,
            dropout=dropout,
            double_z=True,
            attention_type=attention_type,
            resample_with_conv=resample_with_conv,
            rngs=rngs,
        )
        self.decoder = AttnDecoder(
            img_size=img_size,
            out_channels=out_channels,
            inner_channels=inner_channels,
            z_channels=z_channels,
            channel_multipliers=channel_multipliers,
            num_res_blocks=num_res_blocks,
            attention_resolutions=attention_resolutions,
            dropout=dropout,
            attention_type=attention_type,
            resample_with_conv=resample_with_conv,
            rngs=rngs,
        )
        self.to_embedding = nnx.Conv(2 * z_channels, 2 * embedding_channels, kernel_size=(1, 1), rngs=rngs)
        self.from_embedding = nnx.Conv(embedding_channels, z_channels, kernel_size=(1, 1), rngs=rngs)
        self.rngs = rngs

    def encode(self, x: jax.Array, *, deterministic: bool = False) -> GaussianDistribution:
        params = self.to_embedding(self.encoder(x))
        return GaussianDistribution(params, deterministic=deterministic)

    def decode(self, z: jax.Array, *, apply_tanh: Optional[bool] = None) -> jax.Array:
        net = self.decoder(self.from_embedding(z))
        if apply_tanh if apply_tanh is not None else self.apply_tanh:
            net = jnp.tanh(net)
        return net

    def __call__(self, x: jax.Array, *, sample: bool = True) -> Any:
        dist = self.encode(x)
        z = dist.sample(self.rngs.default()) if sample else dist.mode()
        return {"predictions": self.decode(z), "distribution": dist, "z": z}


@register_module("ae_vq")
@generators.register("ae_vq")
class AutoEncoderVQ(nnx.Module):
    """VQ first-stage autoencoder (reference `ae/vq.py`)."""

    def __init__(
        self,
        *,
        img_size: int = 256,
        in_channels: int = 3,
        out_channels: int = 3,
        inner_channels: int = 128,
        z_channels: int = 4,
        embedding_channels: int = 4,
        num_code: int = 16384,
        channel_multipliers: Optional[List[int]] = None,
        num_res_blocks: int = 2,
        attention_resolutions: Optional[List[int]] = None,
        dropout: float = 0.0,
        attention_type: str = "spatial",
        apply_tanh: bool = False,
        resample_with_conv: bool = True,
        rngs: nnx.Rngs,
    ) -> None:
        self.apply_tanh = apply_tanh
        self.encoder = AttnEncoder(
            img_size=img_size,
            in_channels=in_channels,
            inner_channels=inner_channels,
            z_channels=z_channels,
            channel_multipliers=channel_multipliers,
            num_res_blocks=num_res_blocks,
            attention_resolutions=attention_resolutions,
            dropout=dropout,
            double_z=False,
            attention_type=attention_type,
            resample_with_conv=resample_with_conv,
            rngs=rngs,
        )
        self.decoder = AttnDecoder(
            img_size=img_size,
            out_channels=out_channels,
            inner_channels=inner_channels,
            z_channels=z_channels,
            channel_multipliers=channel_multipliers,
            num_res_blocks=num_res_blocks,
            attention_resolutions=attention_resolutions,
            dropout=dropout,
            attention_type=attention_type,
            resample_with_conv=resample_with_conv,
            rngs=rngs,
        )
        self.to_embedding = nnx.Conv(z_channels, embedding_channels, kernel_size=(1, 1), rngs=rngs)
        self.from_embedding = nnx.Conv(embedding_channels, z_channels, kernel_size=(1, 1), rngs=rngs)
        self.codebook = VQCodebook(num_code, embedding_channels, rngs=rngs)

    def encode(self, x: jax.Array) -> Any:
        z = self.to_embedding(self.encoder(x))
        return self.codebook(z)

    def decode(self, z_q: jax.Array, *, apply_tanh: Optional[bool] = None) -> jax.Array:
        net = self.decoder(self.from_embedding(z_q))
        if apply_tanh if apply_tanh is not None else self.apply_tanh:
            net = jnp.tanh(net)
        return net

    def __call__(self, x: jax.Array) -> Any:
        out = self.encode(x)
        return {
            "predictions": self.decode(out.z_q),
            "codebook_loss": out.codebook_loss,
            "commitment_loss": out.commitment_loss,
            "indices": out.indices,
        }


class Upsample2x(nnx.Module):
    """Conv-free nearest 2x upsample (reference `resample_with_conv=False`)."""

    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        return jax.image.resize(x, (b, h * 2, w * 2, c), "nearest")


# reference class names (`modules/cv/encoder/attn.py:32`,
# `decoder/attn.py:34`, `ae/kl.py:70`, `ae/vq.py:17`, `ae/common.py:12`)
AttentionEncoder = AttnEncoder
AttentionDecoder = AttnDecoder
AttentionAutoEncoderKL = AutoEncoderKL
AttentionAutoEncoderVQ = AutoEncoderVQ


class IAttentionAutoEncoder(nnx.Module):
    """Interface of the SD first-stage AEs: `encode`/`decode` with an
    attention mid-block (reference `ae/common.py:12`)."""
