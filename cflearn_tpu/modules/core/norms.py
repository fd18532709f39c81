"""Norm layers + `NormFactory`.

Parity: reference `cflearn/modules/core/norms.py:20-70` — `BN`/`LN`/
`PixelNorm`/`AdaptiveInstanceNorm2d`/`NormFactory`. Channel-last (NHWC)
layouts throughout — the TPU-native data layout.
"""

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import nnx


class PixelNorm(nnx.Module):
    def __init__(self, *, rngs: Optional[nnx.Rngs] = None) -> None:
        pass

    def __call__(self, x: jax.Array) -> jax.Array:
        return x / jnp.sqrt(jnp.mean(jnp.square(x), axis=-1, keepdims=True) + 1e-8)


class AdaptiveInstanceNorm2d(nnx.Module):
    """AdaIN whose affine params are injected at call time (style transfer)."""

    def __init__(self, dim: int, *, eps: float = 1e-5, rngs: Optional[nnx.Rngs] = None) -> None:
        self.dim = dim
        self.eps = eps

    def __call__(self, x: jax.Array, scale: jax.Array, bias: jax.Array) -> jax.Array:
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        normed = (x - mean) * jax.lax.rsqrt(var + self.eps)
        return normed * scale[:, None, None, :] + bias[:, None, None, :]


class NormFactory:
    """Build norms by type string (reference `norms.py:NormFactory`)."""

    def __init__(self, norm_type: Optional[str]) -> None:
        self.norm_type = norm_type

    def make(self, dim: int, *, rngs: nnx.Rngs, **kwargs: Any) -> nnx.Module:
        nt = self.norm_type
        if nt is None or nt == "none":
            from ..common import Lambda

            return Lambda(lambda x: x, "identity")
        if nt in ("batch_norm", "batch"):
            return nnx.BatchNorm(dim, momentum=kwargs.pop("momentum", 0.99), rngs=rngs, **kwargs)
        if nt in ("layer_norm", "layer"):
            return nnx.LayerNorm(dim, rngs=rngs, **kwargs)
        if nt == "rms_norm":
            return nnx.RMSNorm(dim, rngs=rngs, **kwargs)
        if nt == "group_norm":
            num_groups = kwargs.pop("num_groups", 32)
            return nnx.GroupNorm(dim, num_groups=num_groups, rngs=rngs, **kwargs)
        if nt == "pixel_norm":
            return PixelNorm(rngs=rngs)
        if nt == "instance_norm":
            return nnx.GroupNorm(dim, num_groups=dim, rngs=rngs, **kwargs)
        raise ValueError(f"unrecognized norm type '{nt}'")


# reference aliases (`core/norms.py` BN/LN): NHWC BatchNorm / LayerNorm
BN = nnx.BatchNorm
LN = nnx.LayerNorm
