"""Vanilla VAE + VQ-VAE modules.

Parity: reference `cflearn/modules/cv/vae/vanilla.py` (generator "vae") and
`vae/vector_quantized.py:188` (`VQVAE`, registered module "vq_vae").
"""

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import nnx

from ...constants import PREDICTIONS_KEY
from ..common import register_module
from .common import GaussianDistribution, VQCodebook, generators
from .decoder import VanillaDecoder1D
from .encoder import VanillaEncoder, VanillaEncoder1D


@register_module("vae")
@generators.register("vae")
class VanillaVAE(nnx.Module):
    def __init__(
        self,
        *,
        img_size: int = 64,
        in_channels: int = 3,
        out_channels: Optional[int] = None,
        latent_dim: int = 128,
        num_downsample: int = 3,
        rngs: nnx.Rngs,
    ) -> None:
        self.latent_dim = latent_dim
        self.encoder = VanillaEncoder1D(
            img_size=img_size,
            in_channels=in_channels,
            latent_dim=latent_dim * 2,
            num_downsample=num_downsample,
            rngs=rngs,
        )
        self.decoder = VanillaDecoder1D(
            img_size=img_size,
            out_channels=out_channels or in_channels,
            latent_dim=latent_dim,
            rngs=rngs,
        )
        self.rngs = rngs

    def encode(self, x: jax.Array) -> GaussianDistribution:
        return GaussianDistribution(self.encoder(x))

    def decode(self, z: jax.Array) -> jax.Array:
        return jnp.tanh(self.decoder(z))

    def sample(self, num_samples: int, *, key: Optional[jax.Array] = None) -> jax.Array:
        if key is None:
            key = self.rngs.default()
        z = jax.random.normal(key, (num_samples, self.latent_dim))
        return self.decode(z)

    def __call__(self, x: jax.Array) -> Any:
        dist = self.encode(x)
        z = dist.sample(self.rngs.default())
        return {
            PREDICTIONS_KEY: self.decode(z),
            "mu": dist.mean,
            "log_var": dist.logvar,
            "kl": dist.kl(),
            "z": z,
        }


@register_module("vq_vae")
@generators.register("vq_vae")
class VQVAE(nnx.Module):
    """VQ-VAE (reference `vae/vector_quantized.py:188`)."""

    def __init__(
        self,
        *,
        img_size: int = 64,
        in_channels: int = 3,
        out_channels: Optional[int] = None,
        latent_channels: int = 128,
        num_code: int = 512,
        num_downsample: int = 2,
        rngs: nnx.Rngs,
    ) -> None:
        from .decoder import VanillaDecoder

        self.encoder = VanillaEncoder(
            img_size=img_size,
            in_channels=in_channels,
            latent_channels=latent_channels,
            num_downsample=num_downsample,
            rngs=rngs,
        )
        self.codebook = VQCodebook(num_code, latent_channels, rngs=rngs)
        self.decoder = VanillaDecoder(
            img_size=img_size,
            out_channels=out_channels or in_channels,
            latent_channels=latent_channels,
            num_upsample=num_downsample,
            rngs=rngs,
        )
        self.num_code = num_code
        self.latent_resolution = img_size // (2**num_downsample)

    def encode(self, x: jax.Array) -> Any:
        return self.codebook(self.encoder(x))

    def decode(self, z_q: jax.Array) -> jax.Array:
        return jnp.tanh(self.decoder(z_q))

    def decode_indices(self, indices: jax.Array) -> jax.Array:
        return self.decode(self.codebook.lookup(indices))

    def __call__(self, x: jax.Array) -> Any:
        out = self.encode(x)
        return {
            PREDICTIONS_KEY: self.decode(out.z_q),
            "codebook_loss": out.codebook_loss,
            "commitment_loss": out.commitment_loss,
            "indices": out.indices,
        }


def reparameterize(mu: jax.Array, log_var: jax.Array, key: jax.Array) -> jax.Array:
    """`mu + exp(0.5*log_var) * eps` (reference `vae/vanilla.py` reparameterize)."""
    return mu + jnp.exp(0.5 * log_var) * jax.random.normal(key, mu.shape, mu.dtype)


# reference class name (`modules/cv/vae/vanilla.py` VAE)
VAE = VanillaVAE
