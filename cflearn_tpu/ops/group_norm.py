"""Fused GroupNorm(+SiLU) — Pallas kernel for the diffusion-UNet hot path.

The reference leans on cuDNN GroupNorm + separate SiLU; the BASELINE north
star calls for fusing attention+GroupNorm+SiLU on TPU. This kernel does
stats + normalize + affine + SiLU in ONE VMEM pass per batch element when the
activation fits VMEM (all SD-UNet resolutions at 512px); larger activations
(VAE decoder tail) fall back to an XLA implementation that still fuses well.

Layout: channel-last (B, ..., C); groups partition C.
"""

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = bool(int(os.environ.get("CFLEARN_TPU_PALLAS_INTERPRET", "0")))


def _gn_silu_kernel(x_ref, w_ref, b_ref, o_ref, *, num_groups: int, eps: float, apply_silu: bool):
    x = x_ref[0].astype(jnp.float32)  # (S, C)
    s, c = x.shape
    cg = c // num_groups
    grouped = x.reshape(s, num_groups, cg)
    mean = jnp.mean(grouped, axis=(0, 2), keepdims=True)
    var = jnp.mean(jnp.square(grouped - mean), axis=(0, 2), keepdims=True)
    normed = (grouped - mean) * jax.lax.rsqrt(var + eps)
    normed = normed.reshape(s, c)
    out = normed * w_ref[0].astype(jnp.float32) + b_ref[0].astype(jnp.float32)
    if apply_silu:
        out = out * jax.nn.sigmoid(out)
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_groups", "eps", "apply_silu"))
def _group_norm_pallas(
    x: jax.Array,  # (B, S, C)
    weight: jax.Array,
    bias: jax.Array,
    *,
    num_groups: int,
    eps: float,
    apply_silu: bool,
) -> jax.Array:
    b, s, c = x.shape
    kernel = functools.partial(
        _gn_silu_kernel, num_groups=num_groups, eps=eps, apply_silu=apply_silu
    )
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, s, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, s, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s, c), x.dtype),
        interpret=_INTERPRET,
    )(x, weight[None], bias[None])


def _group_norm_xla(
    x: jax.Array,
    weight: Optional[jax.Array],
    bias: Optional[jax.Array],
    *,
    num_groups: int,
    eps: float,
    apply_silu: bool,
) -> jax.Array:
    shape = x.shape
    c = shape[-1]
    grouped = x.reshape(shape[0], -1, num_groups, c // num_groups)
    mean = jnp.mean(grouped, axis=(1, 3), keepdims=True)
    var = jnp.var(grouped, axis=(1, 3), keepdims=True)
    normed = ((grouped - mean) * jax.lax.rsqrt(var + eps)).reshape(shape)
    if weight is not None:
        normed = normed * weight
    if bias is not None:
        normed = normed + bias
    if apply_silu:
        normed = jax.nn.silu(normed)
    return normed


def group_norm(
    x: jax.Array,
    weight: Optional[jax.Array] = None,
    bias: Optional[jax.Array] = None,
    *,
    num_groups: int = 32,
    eps: float = 1e-6,
    apply_silu: bool = False,
    training: bool = False,
) -> jax.Array:
    """GroupNorm over channel-last input of any spatial rank, optionally fused
    with SiLU. Uses the Pallas kernel when on TPU, inference, affine params
    are present and the per-sample activation fits VMEM."""
    c = x.shape[-1]
    spatial = 1
    for dim in x.shape[1:-1]:
        spatial *= dim
    fits_vmem = spatial * c * 4 <= 8 * 1024 * 1024
    use_pallas = (
        (jax.default_backend() == "tpu" or _INTERPRET)
        and not training
        and weight is not None
        and bias is not None
        and fits_vmem
        and c % num_groups == 0
        and c % 128 == 0
        and spatial % 8 == 0
    )
    if use_pallas:
        flat = x.reshape(x.shape[0], spatial, c)
        out = _group_norm_pallas(
            flat, weight, bias, num_groups=num_groups, eps=eps, apply_silu=apply_silu
        )
        return out.reshape(x.shape)
    return _group_norm_xla(
        x, weight, bias, num_groups=num_groups, eps=eps, apply_silu=apply_silu
    )
