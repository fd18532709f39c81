"""High-level building blocks.

Parity: reference `cflearn/modules/core/high_level.py` — `PreNorm` (:26),
`ChannelPadding` (:59, conditional latent injection), patch embeddings
`VanillaPatchEmbed`/`OverlapPatchEmbed`/`ConvPatchEmbed` (:153-226).
"""

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import nnx


class PreNorm(nnx.Module):
    def __init__(self, dim: int, module: nnx.Module, *, norm_type: str = "layer_norm", rngs: nnx.Rngs) -> None:
        from .norms import NormFactory

        self.norm = NormFactory(norm_type).make(dim, rngs=rngs)
        self.module = module

    def __call__(self, x: jax.Array, *args: Any, **kwargs: Any) -> jax.Array:
        return self.module(self.norm(x), *args, **kwargs)


class ChannelPadding(nnx.Module):
    """Concat a learned (optionally condition-selected) channel map, then
    project back to `in_channels` with a bias-free 1x1 mapping (reference
    `high_level.py:59` — output width equals input width). NHWC here."""

    def __init__(
        self,
        in_channels: int,
        latent_channels: int,
        map_dim: Optional[int] = None,
        *,
        is_1d: bool = False,
        num_classes: Optional[int] = None,
        rngs: nnx.Rngs,
    ) -> None:
        self.in_channels = in_channels
        self.latent_channels = latent_channels
        # backward-compat alias (pre-round-2 name)
        self.latent_dim = latent_channels
        self.map_dim = map_dim
        self.is_global = map_dim is None
        self.is_1d = is_1d
        self.num_classes = num_classes
        token_shape = (num_classes or 1, map_dim or 1, map_dim or 1, latent_channels)
        key = rngs.params()
        self.latent_map = nnx.Param(jax.random.normal(key, token_shape))
        in_nc = in_channels + latent_channels
        if is_1d:
            self.mapping = nnx.Linear(in_nc, in_channels, use_bias=False, rngs=rngs)
        else:
            self.mapping = nnx.Conv(in_nc, in_channels, kernel_size=(1, 1), use_bias=False, rngs=rngs)

    @property
    def is_conditional(self) -> bool:
        return self.num_classes is not None

    def __call__(self, x: jax.Array, labels: Optional[jax.Array] = None) -> jax.Array:
        if self.num_classes is None:
            latent = self.latent_map[0]
            latent = jnp.broadcast_to(latent, (x.shape[0],) + latent.shape)
        else:
            if labels is None:
                raise ValueError("`labels` should be provided in conditional `ChannelPadding`")
            latent = self.latent_map[labels.ravel().astype(jnp.int32)]
        if x.ndim == 2:
            # 1d case: x is (B, D)
            latent_flat = latent.reshape(x.shape[0], -1)
            net = jnp.concatenate([x, latent_flat], axis=-1)
        else:
            if self.is_global:
                latent = jnp.broadcast_to(
                    latent.reshape(x.shape[0], 1, 1, self.latent_channels),
                    (x.shape[0], x.shape[1], x.shape[2], self.latent_channels),
                )
            elif latent.shape[1] != x.shape[1]:
                latent = jax.image.resize(
                    latent, (x.shape[0], x.shape[1], x.shape[2], self.latent_channels), "nearest"
                )
            net = jnp.concatenate([x, latent], axis=-1)
        return self.mapping(net)


class VanillaPatchEmbed(nnx.Module):
    """ViT patchify (reference `high_level.py:153`)."""

    def __init__(self, img_size: int, patch_size: int, in_channels: int = 3, latent_dim: int = 128, *, bias: bool = True, rngs: nnx.Rngs) -> None:
        assert img_size % patch_size == 0
        self.img_size = img_size
        self.patch_size = patch_size
        self.num_patches = (img_size // patch_size) ** 2
        self.projection = nnx.Conv(
            in_channels,
            latent_dim,
            kernel_size=(patch_size, patch_size),
            strides=(patch_size, patch_size),
            use_bias=bias,
            rngs=rngs,
        )

    def __call__(self, x: jax.Array) -> jax.Array:
        net = self.projection(x)  # (B, H/p, W/p, D)
        b, h, w, d = net.shape
        return net.reshape(b, h * w, d)


class OverlapPatchEmbed(nnx.Module):
    def __init__(self, img_size: int, patch_size: int = 7, stride: int = 4, in_channels: int = 3, latent_dim: int = 64, *, rngs: nnx.Rngs) -> None:
        self.projection = nnx.Conv(
            in_channels,
            latent_dim,
            kernel_size=(patch_size, patch_size),
            strides=(stride, stride),
            padding="SAME",
            rngs=rngs,
        )
        self.norm = nnx.LayerNorm(latent_dim, rngs=rngs)

    def __call__(self, x: jax.Array) -> jax.Array:
        net = self.projection(x)
        b, h, w, d = net.shape
        return self.norm(net.reshape(b, h * w, d))


# reference base name (`core/high_level.py` ImgToPatches family)
ImgToPatches = VanillaPatchEmbed
