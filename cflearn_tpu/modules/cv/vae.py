"""Vanilla VAE + VQ-VAE modules.

Parity: reference `cflearn/modules/cv/vae/vanilla.py` (generator "vae" —
class-conditional decoding via `num_classes` + `apply_tanh`) and
`vae/vector_quantized.py:23` (`VQVAE`, registered module "vq_vae" —
conditional decoding, `get_code(_indices)`, `reconstruct_from`,
`sample_codebook`).
"""

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import nnx

from ...constants import PREDICTIONS_KEY
from ...toolkit.contexts import auto_num_layers
from ..common import register_module
from ..core.high_level import ChannelPadding
from .common import DecoderInputs, GaussianDistribution, IConditional, VQCodebook, generators
from .decoder import VanillaDecoder, VanillaDecoder1D
from .encoder import VanillaEncoder, VanillaEncoder1D


@register_module("vae")
@generators.register("vae")
class VanillaVAE(IConditional):
    def __init__(
        self,
        *,
        img_size: int = 64,
        in_channels: int = 3,
        out_channels: Optional[int] = None,
        latent_dim: int = 128,
        num_downsample: int = 3,
        num_classes: Optional[int] = None,
        apply_tanh: bool = False,
        cond_channels: int = 16,
        rngs: nnx.Rngs,
    ) -> None:
        self.latent_dim = latent_dim
        self.num_classes = num_classes
        self.apply_tanh = apply_tanh
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
            num_classes=num_classes,
            cond_channels=cond_channels,
            apply_tanh=apply_tanh,
            rngs=rngs,
        )
        self.rngs = rngs

    def encode(self, x: jax.Array) -> GaussianDistribution:
        return GaussianDistribution(self.encoder(x))

    def decode(
        self,
        z: jax.Array,
        *,
        labels: Optional[jax.Array] = None,
        apply_tanh: Optional[bool] = None,
    ) -> jax.Array:
        # reference `vae/vanilla.py:68-73` — conditional decoding samples
        # random labels when none are given
        if labels is None and self.num_classes is not None:
            labels = jax.random.randint(
                self.rngs.default(), (z.shape[0],), 0, self.num_classes
            )
        return self.decoder(DecoderInputs(z=z, labels=labels, apply_tanh=apply_tanh))

    def sample(
        self,
        num_samples: int,
        *,
        labels: Optional[jax.Array] = None,
        class_idx: Optional[int] = None,
        key: Optional[jax.Array] = None,
    ) -> jax.Array:
        if key is None:
            key = self.rngs.default()
        z = jax.random.normal(key, (num_samples, self.latent_dim))
        if labels is None and class_idx is not None:
            labels = self.get_sample_labels(num_samples, class_idx)
        return self.decode(z, labels=labels)

    def reconstruct(self, x: jax.Array, *, labels: Optional[jax.Array] = None) -> jax.Array:
        return self(x, labels)[PREDICTIONS_KEY]

    def __call__(self, x: jax.Array, labels: Optional[jax.Array] = None) -> Any:
        dist = self.encode(x)
        z = dist.sample(self.rngs.default())
        if self.num_classes is None:
            labels = None
        return {
            PREDICTIONS_KEY: self.decode(z, labels=labels),
            "mu": dist.mean,
            "log_var": dist.logvar,
            "kl": dist.kl(),
            "z": z,
        }


@register_module("vq_vae")
@generators.register("vq_vae")
class VQVAE(IConditional):
    """VQ-VAE (reference `vae/vector_quantized.py:23`)."""

    def __init__(
        self,
        *,
        img_size: int = 64,
        in_channels: int = 3,
        out_channels: Optional[int] = None,
        num_codes: Optional[int] = None,
        num_code: Optional[int] = None,  # pre-round-2 alias
        code_dimension: Optional[int] = None,
        latent_channels: Optional[int] = None,  # pre-round-2 alias
        num_downsample: Optional[int] = None,
        min_size: int = 8,
        num_classes: Optional[int] = None,
        latent_padding_channels: Optional[int] = None,
        apply_tanh: bool = False,
        cond_channels: int = 16,
        rngs: nnx.Rngs,
    ) -> None:
        num_codes = num_codes if num_codes is not None else (num_code or 512)
        code_dimension = (
            code_dimension if code_dimension is not None else (latent_channels or 128)
        )
        if num_downsample is None:
            num_downsample = auto_num_layers(img_size, min_size=min_size)
        self.num_classes = num_classes
        self.apply_tanh = apply_tanh
        self.code_dimension = code_dimension
        self.encoder = VanillaEncoder(
            img_size=img_size,
            in_channels=in_channels,
            latent_channels=code_dimension,
            num_downsample=num_downsample,
            rngs=rngs,
        )
        self.codebook = VQCodebook(num_codes, code_dimension, rngs=rngs)
        self.latent_resolution = img_size // (2**num_downsample)
        self.decoder = VanillaDecoder(
            img_size=img_size,
            out_channels=out_channels or in_channels,
            latent_channels=code_dimension,
            num_upsample=num_downsample,
            num_classes=num_classes,
            latent_resolution=self.latent_resolution,
            cond_channels=cond_channels,
            apply_tanh=apply_tanh,
            rngs=rngs,
        )
        # reference `vector_quantized.py:78-86`
        if latent_padding_channels is None:
            self.latent_padding = None
        else:
            self.latent_padding = ChannelPadding(
                code_dimension,
                latent_padding_channels,
                self.latent_resolution,
                rngs=rngs,
            )
        self.num_codes = num_codes
        self.rngs = rngs

    # pre-round-2 aliases ------------------------------------------------------

    @property
    def num_code(self) -> int:
        return self.num_codes

    @property
    def latent_channels(self) -> int:
        return self.code_dimension

    # codebook ----------------------------------------------------------------

    def encode(self, x: jax.Array) -> Any:
        return self.codebook(self.encoder(x))

    def get_code_indices(self, net: jax.Array) -> jax.Array:
        return self.codebook(self.encoder(net)).indices

    def get_code(self, code_indices: jax.Array) -> jax.Array:
        """Indices (B, H, W), (B, H, W, 1) or (B, 1, H, W) → z_q (B, H, W, C)
        (reference `vector_quantized.py:139` squeezes the torch channel dim;
        NHWC puts the singleton last — both layouts accepted)."""
        if code_indices.ndim == 4:
            if code_indices.shape[-1] == 1:
                code_indices = code_indices[..., 0]
            elif code_indices.shape[1] == 1:
                code_indices = code_indices[:, 0]
            else:
                raise ValueError(
                    f"4-D code indices need a singleton channel axis, got {code_indices.shape}"
                )
        return self.codebook.lookup(code_indices.astype(jnp.int32))

    # decoding ----------------------------------------------------------------

    def decode(
        self,
        z_q: jax.Array,
        *,
        labels: Optional[jax.Array] = None,
        apply_tanh: Optional[bool] = None,
    ) -> jax.Array:
        if labels is None and self.num_classes is not None:
            labels = jax.random.randint(
                self.rngs.default(), (z_q.shape[0],), 0, self.num_classes
            )
        if self.latent_padding is not None:
            z_q = self.latent_padding(z_q)
        return self.decoder(DecoderInputs(z=z_q, labels=labels, apply_tanh=apply_tanh))

    def decode_indices(self, indices: jax.Array, **kwargs: Any) -> jax.Array:
        return self.decode(self.get_code(indices), **kwargs)

    def reconstruct_from(
        self,
        code_indices: jax.Array,
        *,
        labels: Optional[jax.Array] = None,
        class_idx: Optional[int] = None,
        use_one_hot: bool = False,
        **kwargs: Any,
    ) -> jax.Array:
        """Decode code indices; `use_one_hot` keeps only the central code
        (reference `vector_quantized.py:146-162`)."""
        z_q = self.get_code(code_indices)
        if use_one_hot:
            i = int(round(0.5 * z_q.shape[1]))
            j = int(round(0.5 * z_q.shape[2]))
            one_hot = jnp.zeros_like(z_q)
            one_hot = one_hot.at[:, i, j].set(z_q[:, i, j])
            z_q = one_hot
        if labels is None:
            labels = self.get_sample_labels(len(z_q), class_idx)
        return self.decode(z_q, labels=labels, **kwargs)

    def sample_codebook(
        self,
        *,
        code_indices: Optional[jax.Array] = None,
        num_samples: Optional[int] = None,
        class_idx: Optional[int] = None,
        **kwargs: Any,
    ) -> Tuple[jax.Array, jax.Array]:
        """Visualize codebook entries (reference `vector_quantized.py:164-183`)."""
        if code_indices is None:
            if num_samples is None:
                raise ValueError("either `code_indices` or `num_samples` should be provided")
            code_indices = jax.random.randint(
                self.rngs.default(), (num_samples,), 0, self.num_codes
            )
        code_indices = jnp.asarray(code_indices).reshape(-1)
        resolution = self.latent_resolution
        tiled = jnp.tile(code_indices[:, None, None], (1, resolution, resolution))
        if class_idx is not None:
            kwargs["labels"] = self.get_sample_labels(len(code_indices), class_idx)
        kwargs.setdefault("use_one_hot", True)
        net = self.reconstruct_from(tiled, **kwargs)
        return net, code_indices

    def __call__(self, x: jax.Array, labels: Optional[jax.Array] = None) -> Any:
        out = self.encode(x)
        if self.num_classes is None:
            labels = None
        return {
            PREDICTIONS_KEY: self.decode(out.z_q, labels=labels),
            "codebook_loss": out.codebook_loss,
            "commitment_loss": out.commitment_loss,
            "indices": out.indices,
        }


def reparameterize(mu: jax.Array, log_var: jax.Array, key: jax.Array) -> jax.Array:
    """`mu + exp(0.5*log_var) * eps` (reference `vae/vanilla.py` reparameterize)."""
    return mu + jnp.exp(0.5 * log_var) * jax.random.normal(key, mu.shape, mu.dtype)


# reference class name (`modules/cv/vae/vanilla.py` VAE)
VAE = VanillaVAE
