"""CV interfaces + shared generative machinery.

Parity: reference `cflearn/modules/cv/common.py:42-430` — `IEncoder` /
`DecoderInputs` / `IDecoder` / `IGenerator` / `IGaussianGenerator` /
`IDiscriminator` / `IAutoRegressor` / `EncoderDecoder`, `VQCodebook` (:362 —
codebook lookup with straight-through estimator), plus the prefix registries
`encoders`/`decoders`/`generators`/`discriminators` (`cv/common.py:35-39`)
and `GaussianDistribution` (diagonal gaussian latents of `ae/kl.py`).
"""

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import nnx

from ..common import PrefixModules

encoders = PrefixModules("encoders")
decoders = PrefixModules("decoders")
generators = PrefixModules("generators")
discriminators = PrefixModules("discriminators")
auto_regressors = PrefixModules("auto_regressors")


def _make_build(registry: PrefixModules) -> Any:
    def build(name: str, *, config: Optional[Dict[str, Any]] = None, **kwargs: Any) -> nnx.Module:
        return registry.build(name, **{**(config or {}), **kwargs})

    return build


# reference-named functional surface (`cflearn/modules/cv/common.py:35-39`
# exposes build_encoder/..., register_encoder/...)
build_encoder = _make_build(encoders)
build_decoder = _make_build(decoders)
build_generator = _make_build(generators)
build_discriminator = _make_build(discriminators)
build_auto_regressor = _make_build(auto_regressors)
register_encoder = encoders.register
register_decoder = decoders.register
register_generator = generators.register
register_discriminator = discriminators.register
register_auto_regressor = auto_regressors.register


@dataclasses.dataclass
class DecoderInputs:
    z: jax.Array
    labels: Optional[jax.Array] = None
    deterministic: bool = False
    apply_tanh: Optional[bool] = None
    kwargs: Optional[Dict[str, Any]] = None


class GaussianDistribution:
    """Diagonal gaussian over latents (reference `ae/kl.py`)."""

    def __init__(self, params: jax.Array, *, deterministic: bool = False) -> None:
        mean, logvar = jnp.split(params, 2, axis=-1)
        self.mean = mean
        self.logvar = jnp.clip(logvar, -30.0, 20.0)
        self.deterministic = deterministic
        self.std = jnp.exp(0.5 * self.logvar)
        self.var = jnp.exp(self.logvar)

    def sample(self, key: jax.Array) -> jax.Array:
        if self.deterministic:
            return self.mean
        return self.mean + self.std * jax.random.normal(key, self.mean.shape, self.mean.dtype)

    def mode(self) -> jax.Array:
        return self.mean

    def kl(self, other: Optional["GaussianDistribution"] = None) -> jax.Array:
        if self.deterministic:
            return jnp.zeros(())
        axes = tuple(range(1, self.mean.ndim))
        if other is None:
            return 0.5 * jnp.sum(self.mean**2 + self.var - 1.0 - self.logvar, axis=axes)
        return 0.5 * jnp.sum(
            (self.mean - other.mean) ** 2 / other.var
            + self.var / other.var
            - 1.0
            - self.logvar
            + other.logvar,
            axis=axes,
        )

    def nll(self, sample: jax.Array) -> jax.Array:
        axes = tuple(range(1, self.mean.ndim))
        log2pi = 1.8378770664093453
        return 0.5 * jnp.sum(log2pi + self.logvar + (sample - self.mean) ** 2 / self.var, axis=axes)


def _gaussian_flatten(d: "GaussianDistribution") -> Any:
    return (d.mean, d.logvar), d.deterministic


def _gaussian_unflatten(deterministic: bool, children: Any) -> "GaussianDistribution":
    mean, logvar = children
    obj = object.__new__(GaussianDistribution)
    obj.mean = mean
    obj.logvar = logvar
    obj.deterministic = deterministic
    obj.std = jnp.exp(0.5 * logvar)
    obj.var = jnp.exp(logvar)
    return obj


# pytree registration lets distributions flow through jit boundaries
jax.tree_util.register_pytree_node(
    GaussianDistribution, _gaussian_flatten, _gaussian_unflatten
)


@dataclasses.dataclass
class VQCodebookOutput:
    z_q: jax.Array
    indices: jax.Array
    codebook_loss: jax.Array
    commitment_loss: jax.Array


# reference name (`cv/common.py` VQCodebookOut)
VQCodebookOut = VQCodebookOutput


class VQCodebook(nnx.Module):
    """Codebook lookup + straight-through VQ (reference `cv/common.py:362`)."""

    def __init__(self, num_codes: int, code_dim: int, *, beta: float = 0.25, rngs: nnx.Rngs) -> None:
        self.num_codes = num_codes
        self.code_dim = code_dim
        self.beta = beta
        key = rngs.params()
        scale = 1.0 / num_codes
        self.embedding = nnx.Param(
            jax.random.uniform(key, (num_codes, code_dim), minval=-scale, maxval=scale)
        )

    def __call__(self, z: jax.Array) -> VQCodebookOutput:
        codes = self.embedding[...]
        flat = z.reshape(-1, self.code_dim)
        d = (
            jnp.sum(flat**2, axis=1, keepdims=True)
            - 2.0 * flat @ codes.T
            + jnp.sum(codes**2, axis=1)[None]
        )
        indices = jnp.argmin(d, axis=1)
        z_q = codes[indices].reshape(z.shape)
        codebook_loss = jnp.mean((jax.lax.stop_gradient(z) - z_q) ** 2)
        commitment_loss = jnp.mean((z - jax.lax.stop_gradient(z_q)) ** 2)
        # straight-through
        z_q = z + jax.lax.stop_gradient(z_q - z)
        indices = indices.reshape(z.shape[:-1])
        return VQCodebookOutput(z_q, indices, codebook_loss, commitment_loss)

    def lookup(self, indices: jax.Array) -> jax.Array:
        return self.embedding[...][indices]


# ---------------------------------------------------------------------------
# interface bases (reference `modules/cv/common.py:42-330` — duck-typed here,
# provided for subclassing/isinstance parity)
# ---------------------------------------------------------------------------

class IEncoder(nnx.Module):
    """Image → latent (reference `cv/common.py:42`)."""

    in_channels: int = 3

    def encode(self, net: jax.Array) -> jax.Array:
        return self(net)


class IConditional(nnx.Module):
    """Optional class conditioning (reference `cv/common.py:77`)."""

    num_classes: Optional[int] = None

    @property
    def is_conditional(self) -> bool:
        return self.num_classes is not None

    def get_sample_labels(
        self,
        num_samples: int,
        class_idx: Optional[int] = None,
        *,
        key: Optional[jax.Array] = None,
    ) -> Optional[jax.Array]:
        if self.num_classes is None:
            return None
        if class_idx is not None:
            return jnp.full((num_samples,), class_idx, dtype=jnp.int32)
        if key is None:
            key = jax.random.PRNGKey(0)
        return jax.random.randint(key, (num_samples,), 0, self.num_classes)


class IDecoder(IConditional):
    """Latent → image (reference `cv/common.py:96`)."""

    img_size: Optional[int] = None
    latent_channels: Optional[int] = None
    latent_resolution: Optional[int] = None

    def decode(self, inputs: "DecoderInputs") -> jax.Array:
        return self(inputs)


class IGenerator(IConditional):
    """Sampling interface: `sample(num, labels=...)` (reference
    `cv/common.py:150+`)."""


class IGaussianGenerator(IGenerator):
    """Generators sampling from a gaussian latent (reference VAE family)."""


class IDiscriminator(nnx.Module):
    """Image → realness logits (reference `cv/common.py`)."""


class IAutoRegressor(nnx.Module):
    """Autoregressive pixel models (reference `cv/common.py`)."""


class EncoderDecoder(nnx.Module):
    """Registry-built encoder/decoder pair (reference `cv/common.py:338`)."""

    def __init__(
        self,
        *,
        encoder: str = "vanilla",
        decoder: str = "vanilla",
        encoder_config: Optional[Dict[str, Any]] = None,
        decoder_config: Optional[Dict[str, Any]] = None,
        rngs: nnx.Rngs,
    ) -> None:
        self.encoder = build_encoder(encoder, config=encoder_config, rngs=rngs)
        self.decoder = build_decoder(decoder, config=decoder_config, rngs=rngs)


def get_latent_resolution(encoder: Any, img_size: int) -> int:
    """Trace the encoder on a zero image and report the latent spatial size
    (reference `cv/common.py:331`; NHWC here)."""
    in_channels = getattr(encoder, "in_channels", 3)
    shape = (1, img_size, img_size, in_channels)
    net = jax.eval_shape(lambda x: encoder.encode(x), jax.ShapeDtypeStruct(shape, jnp.float32))
    return net.shape[1]
