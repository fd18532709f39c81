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
    acc_ref,
    m_ref,
    l_ref,
    *,
    sm_scale: float,
    causal: bool,
    block_q: int,
    block_k: int,
    kv_len: int,
):
    """Grid (bh, q_blocks, k_blocks): the k dimension iterates sequentially
    (TPU grids are minor-to-major sequential), carrying the online-softmax
    state in VMEM scratch; K/V stream block-by-block so any kv length fits."""
    q_idx = pl.program_id(1)
    k_idx = pl.program_id(2)
    num_k_blocks = pl.num_programs(2)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    def compute() -> None:
        # keep q/k/v in their input dtype on the MXU (bf16 runs several x
        # faster than f32 passes); accumulate f32 via preferred_element_type
        q = q_ref[0]  # (block_q, d)
        k = k_ref[0]  # (block_k, d)
        v = v_ref[0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (block_q, block_k), f32
        s = s * sm_scale
        k_pos = k_idx * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        mask = k_pos < kv_len
        if causal:
            q_pos = q_idx * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
            mask = jnp.logical_and(mask, k_pos <= q_pos)
        s = jnp.where(mask, s, _NEG_INF)
        m_prev = m_ref[...]
        l_prev = l_ref[...]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        # PV in the value dtype (bf16 p is the standard flash trade: exp
        # outputs are in [0,1] where bf16 relative error is ~2^-8)
        acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        m_ref[...] = m_new
        l_ref[...] = l_new

    if causal:
        # skip k blocks fully above the causal diagonal
        @pl.when(k_idx * block_k <= (q_idx + 1) * block_q - 1)
        def _():
            compute()
    else:
        compute()

    @pl.when(k_idx == num_k_blocks - 1)
    def _():
        o_ref[0] = (acc_ref[...] / jnp.maximum(l_ref[...], 1e-30)).astype(o_ref.dtype)


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
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
) -> jax.Array:
    """Blockwise flash attention. q/k/v: (B, H, L, D) → (B, H, Lq, D)."""
    b, h, q_len, d = q.shape
    kv_len = k.shape[2]
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)

    # Mosaic pads sub-128 lane dims inside the kernel, so the head dim stays
    # unpadded (no materialized pad/slice ops in XLA around every call).
    # Large blocks amortize per-program overhead (measured 5x on v5e at
    # 4096-seq SD shapes); shrink when the padded head dim eats VMEM.
    d_pad = _round_up(d, 128)
    if block_q is None or block_k is None:
        if d_pad <= 128:
            auto = 1024
        elif d_pad <= 256:
            auto = 512
        else:
            auto = 256
        block_q = block_q or min(auto, _round_up(q_len, 128))
        block_k = block_k or min(auto, _round_up(kv_len, 128))
    q_len_pad = _round_up(q_len, block_q)
    kv_len_pad = _round_up(kv_len, block_k)
    qp = q if q_len_pad == q_len else jnp.pad(q, ((0, 0), (0, 0), (0, q_len_pad - q_len), (0, 0)))
    kp = k if kv_len_pad == kv_len else jnp.pad(k, ((0, 0), (0, 0), (0, kv_len_pad - kv_len), (0, 0)))
    vp = v if kv_len_pad == kv_len else jnp.pad(v, ((0, 0), (0, 0), (0, kv_len_pad - kv_len), (0, 0)))

    bh = b * h
    qp = qp.reshape(bh, q_len_pad, d)
    kp = kp.reshape(bh, kv_len_pad, d)
    vp = vp.reshape(bh, kv_len_pad, d)

    grid = (bh, q_len_pad // block_q, kv_len_pad // block_k)
    kernel = functools.partial(
        _flash_kernel,
        sm_scale=sm_scale,
        causal=causal,
        block_q=block_q,
        block_k=block_k,
        kv_len=kv_len,
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j, k: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda i, j, k: (i, k, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda i, j, k: (i, k, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j, k: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, q_len_pad, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * q_len_pad * kv_len_pad * d_pad,
            bytes_accessed=(qp.size + kp.size + vp.size) * qp.dtype.itemsize,
            transcendentals=bh * q_len_pad * kv_len_pad,
        ),
        interpret=_INTERPRET,
    )(qp, kp, vp)
    out = out.reshape(b, h, q_len_pad, d)
    if q_len_pad != q_len:
        out = out[:, :, :q_len]
    return out


def xla_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    mask: Optional[jax.Array] = None,
    bias: Optional[jax.Array] = None,
) -> jax.Array:
    """XLA fused attention (differentiable fallback). (B,H,L,D) layout.

    `mask` is boolean (True = keep), broadcastable to (B, H, Lq, Lk);
    `bias` is an additive float logits bias of the same broadcast shape."""
    # jax.nn.dot_product_attention expects (B, L, H, D)
    out = jax.nn.dot_product_attention(
        q.transpose(0, 2, 1, 3),
        k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3),
        bias=bias,
        scale=sm_scale,
        is_causal=causal and mask is None,
        mask=mask,
    )
    return out.transpose(0, 2, 1, 3)


def _use_pallas(q: jax.Array, k: jax.Array) -> bool:
    if jax.default_backend() != "tpu" and not _INTERPRET:
        return False
    # K/V stream block-by-block, so only the q block + head dim must fit VMEM.
    # Short-KV shapes (e.g. SD cross-attention, kv=77) are overhead-bound in
    # the kernel and measured ~2x faster on XLA's fused attention.
    q_len = q.shape[2]
    kv_len = k.shape[2]
    d_pad = _round_up(q.shape[3], 128)
    return q_len >= 128 and kv_len >= 256 and d_pad <= 1024


def sdp_attn(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    mask: Optional[jax.Array] = None,
    bias: Optional[jax.Array] = None,
    training: bool = False,
    force_xla: bool = False,
) -> jax.Array:
    """Scaled-dot-product attention dispatcher (reference `sdp_attn`,
    `toolkit.py:911`). (B, H, L, D) in/out. `mask`: True = keep;
    `bias`: additive logits bias."""
    if mask is None and bias is None and not training and not force_xla and _use_pallas(q, k):
        return flash_attention(q, k, v, causal=causal, sm_scale=sm_scale)
    return xla_attention(q, k, v, causal=causal, sm_scale=sm_scale, mask=mask, bias=bias)
