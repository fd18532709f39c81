"""Attention ops: Pallas flash-attention TPU kernel + XLA fallback.

Replaces the reference's memory-efficient-attention chain
(`cflearn/toolkit.py:842-976` — xformers → PT2 SDPA → naive math) with a
TPU-native design:

* `flash_attention` — blockwise online-softmax Pallas kernel (f32 accumulate
  on the MXU, VMEM-resident tiles, optional causal mask). Forward-optimized:
  the txt2img north-star path (samplers run under `lax.scan` with no grad)
  goes through this kernel.
* `sdp_attn` — dispatcher: Pallas kernel when shapes are TPU-friendly &
  grads are not required, otherwise `jax.nn.dot_product_attention` (XLA's
  fused attention, differentiable).

Layouts are (B, H, L, D) to match the MXU's (8/16, 128) tiling on (L, D).
"""

import functools
import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 128
DEFAULT_BLOCK_K = 128
_NEG_INF = -1.0e30
# test escape hatch: run Pallas kernels in interpreter mode on CPU
_INTERPRET = bool(int(os.environ.get("CFLEARN_TPU_PALLAS_INTERPRET", "0")))


def _flash_kernel(
    q_ref,
    k_ref,
    v_ref,
    o_ref,
    *,
    sm_scale: float,
    causal: bool,
    block_k: int,
    kv_len: int,
):
    """One (batch*head, q-block) program: stream K/V blocks, online softmax."""
    q = q_ref[0].astype(jnp.float32) * sm_scale  # (block_q, d)
    block_q = q.shape[0]
    q_idx = pl.program_id(1)

    num_k_blocks = pl.cdiv(kv_len, block_k)

    def body(i, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (block_q, block_k)
        # mask out-of-range keys (kv_len may not divide block_k)
        k_pos = i * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        mask = k_pos < kv_len
        if causal:
            q_pos = q_idx * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
            mask = jnp.logical_and(mask, k_pos <= q_pos)
        s = jnp.where(mask, s, _NEG_INF)
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return acc, m_new, l_new

    d = q_ref.shape[-1]
    acc0 = jnp.zeros((block_q, d), jnp.float32)
    m0 = jnp.full((block_q, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    if causal:
        # only iterate k blocks that can be visible to this q block
        upper = jnp.minimum(num_k_blocks, (q_idx + 1) * block_q // block_k + 1)
    else:
        upper = num_k_blocks
    acc, m, l = jax.lax.fori_loop(0, upper, body, (acc0, m0, l0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("causal", "sm_scale", "block_q", "block_k"))
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
) -> jax.Array:
    """Blockwise flash attention. q/k/v: (B, H, L, D) → (B, H, Lq, D)."""
    b, h, q_len, d = q.shape
    kv_len = k.shape[2]
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)

    # pad head dim to the 128-lane tile and lengths to block multiples
    d_pad = _round_up(d, 128)
    q_len_pad = _round_up(q_len, block_q)
    kv_len_pad = _round_up(kv_len, block_k)
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, q_len_pad - q_len), (0, d_pad - d)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, kv_len_pad - kv_len), (0, d_pad - d)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, kv_len_pad - kv_len), (0, d_pad - d)))

    bh = b * h
    qp = qp.reshape(bh, q_len_pad, d_pad)
    kp = kp.reshape(bh, kv_len_pad, d_pad)
    vp = vp.reshape(bh, kv_len_pad, d_pad)

    grid = (bh, q_len_pad // block_q)
    kernel = functools.partial(
        _flash_kernel,
        sm_scale=sm_scale,
        causal=causal,
        block_k=block_k,
        kv_len=kv_len,
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d_pad), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kv_len_pad, d_pad), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kv_len_pad, d_pad), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d_pad), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, q_len_pad, d_pad), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * q_len_pad * kv_len_pad * d_pad,
            bytes_accessed=(qp.size + kp.size + vp.size) * qp.dtype.itemsize,
            transcendentals=bh * q_len_pad * kv_len_pad,
        ),
        interpret=_INTERPRET,
    )(qp, kp, vp)
    out = out.reshape(b, h, q_len_pad, d_pad)[:, :, :q_len, :d]
    return out


def xla_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """XLA fused attention (differentiable fallback). (B,H,L,D) layout."""
    # jax.nn.dot_product_attention expects (B, L, H, D)
    out = jax.nn.dot_product_attention(
        q.transpose(0, 2, 1, 3),
        k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3),
        scale=sm_scale,
        is_causal=causal and mask is None,
        mask=mask,
    )
    return out.transpose(0, 2, 1, 3)


def _use_pallas(q: jax.Array, k: jax.Array) -> bool:
    if jax.default_backend() != "tpu" and not _INTERPRET:
        return False
    q_len, kv_len = q.shape[2], k.shape[2]
    # kernel keeps full K/V in VMEM per program — cap kv length
    d_pad = _round_up(q.shape[3], 128)
    kv_bytes = 2 * kv_len * d_pad * 4
    return q_len >= 128 and kv_bytes <= 8 * 1024 * 1024


def sdp_attn(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    mask: Optional[jax.Array] = None,
    training: bool = False,
    force_xla: bool = False,
) -> jax.Array:
    """Scaled-dot-product attention dispatcher (reference `sdp_attn`,
    `toolkit.py:911`). (B, H, L, D) in/out."""
    if mask is None and not training and not force_xla and _use_pallas(q, k):
        return flash_attention(q, k, v, causal=causal, sm_scale=sm_scale)
    return xla_attention(q, k, v, causal=causal, sm_scale=sm_scale, mask=mask)
