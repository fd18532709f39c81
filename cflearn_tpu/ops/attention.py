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


# -----------------------------------------------------------------------------
# trainable flash attention: custom-VJP forward (saves logsumexp) + Pallas
# backward kernels (recompute P blockwise; dQ scans KV, dK/dV scan Q)
# -----------------------------------------------------------------------------


def _flash_fwd_kernel(
    q_ref, k_ref, v_ref, o_ref, lse_ref, acc_ref, m_ref, l_ref,
    *, sm_scale, causal, block_q, block_k, kv_len,
):
    q_idx = pl.program_id(1)
    k_idx = pl.program_id(2)
    num_k_blocks = pl.num_programs(2)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    def compute() -> None:
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        s = s * sm_scale
        k_pos = k_idx * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        mask = k_pos < kv_len
        if causal:
            q_pos = q_idx * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
            mask = jnp.logical_and(mask, k_pos <= q_pos)
        s = jnp.where(mask, s, _NEG_INF)
        m_prev = m_ref[...]
        l_prev = l_ref[...]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_ref[...] = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        m_ref[...] = m_new

    if causal:
        @pl.when(k_idx * block_k <= (q_idx + 1) * block_q - 1)
        def _():
            compute()
    else:
        compute()

    @pl.when(k_idx == num_k_blocks - 1)
    def _():
        l_safe = jnp.maximum(l_ref[...], 1e-30)
        o_ref[0] = (acc_ref[...] / l_safe).astype(o_ref.dtype)
        lse_ref[0] = m_ref[...] + jnp.log(l_safe)


def _flash_bwd_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, dq_acc,
    *, sm_scale, causal, block_q, block_k, kv_len,
):
    q_idx = pl.program_id(1)
    k_idx = pl.program_id(2)
    num_k_blocks = pl.num_programs(2)

    @pl.when(k_idx == 0)
    def _():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    def compute() -> None:
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        do = do_ref[0]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        s = s * sm_scale
        k_pos = k_idx * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        mask = k_pos < kv_len
        if causal:
            q_pos = q_idx * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
            mask = jnp.logical_and(mask, k_pos <= q_pos)
        p = jnp.where(mask, jnp.exp(s - lse_ref[0]), 0.0)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        ds = p * (dp - delta_ref[0])
        dq_acc[...] += sm_scale * jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    if causal:
        @pl.when(k_idx * block_k <= (q_idx + 1) * block_q - 1)
        def _():
            compute()
    else:
        compute()

    @pl.when(k_idx == num_k_blocks - 1)
    def _():
        dq_ref[0] = dq_acc[...].astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref, dk_acc, dv_acc,
    *, sm_scale, causal, block_q, block_k, kv_len,
):
    k_idx = pl.program_id(1)
    q_idx = pl.program_id(2)
    num_q_blocks = pl.num_programs(2)

    @pl.when(q_idx == 0)
    def _():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    def compute() -> None:
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        do = do_ref[0]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        s = s * sm_scale
        k_pos = k_idx * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        mask = k_pos < kv_len
        if causal:
            q_pos = q_idx * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
            mask = jnp.logical_and(mask, k_pos <= q_pos)
        p = jnp.where(mask, jnp.exp(s - lse_ref[0]), 0.0)
        pw = p.astype(do.dtype)
        dv_acc[...] += jax.lax.dot_general(
            pw, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        ds = p * (dp - delta_ref[0])
        dk_acc[...] += sm_scale * jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    if causal:
        # this kv block only sees q blocks at or below the diagonal
        @pl.when((q_idx + 1) * block_q - 1 >= k_idx * block_k)
        def _():
            compute()
    else:
        compute()

    @pl.when(q_idx == num_q_blocks - 1)
    def _():
        dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


def _flash_bwd_fused_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref, dq_ref,
    dk_acc, dv_acc, dq_acc,
    *, sm_scale, causal, block_q, block_k, kv_len,
):
    """dq + dk + dv in ONE grid pass (kv blocks outer, q blocks inner).

    The split dq/dkv kernels each recompute s = qkᵀ and p (and the dq one
    also dp) — 7 block matmuls total per (q, k) tile pair. Fusing shares
    s/p/dp across all three grads: 5 matmuls, a ~29% cut in the backward's
    MXU volume (which runs at the padded-d structural ceiling, so volume is
    the only lever — measured in docs/training_trace.json, where the flash
    VJP is the single largest sync class of the finetune backward).

    dk/dv accumulate per kv-block as before; dq needs accumulation ACROSS
    the outer kv axis, so it lives in a full-length (q_len_pad, d) f32 VMEM
    scratch that persists over each bh member's grid sweep (reset at the
    first tile, flushed to the output — whose block index is constant, so
    it stays VMEM-resident — at the last). The wrapper gates this kernel on
    the scratch fitting VMEM and falls back to the split kernels otherwise.
    """
    k_idx = pl.program_id(1)
    q_idx = pl.program_id(2)
    num_k_blocks = pl.num_programs(1)
    num_q_blocks = pl.num_programs(2)

    @pl.when(jnp.logical_and(k_idx == 0, q_idx == 0))
    def _():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    @pl.when(q_idx == 0)
    def _():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    def compute() -> None:
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        do = do_ref[0]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        s = s * sm_scale
        k_pos = k_idx * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        mask = k_pos < kv_len
        if causal:
            q_pos = q_idx * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
            mask = jnp.logical_and(mask, k_pos <= q_pos)
        p = jnp.where(mask, jnp.exp(s - lse_ref[0]), 0.0)
        pw = p.astype(do.dtype)
        dv_acc[...] += jax.lax.dot_general(
            pw, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        ds = p * (dp - delta_ref[0])
        dsw = ds.astype(q.dtype)
        dk_acc[...] += sm_scale * jax.lax.dot_general(
            dsw, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        rows = pl.ds(q_idx * block_q, block_q)
        dq_acc[rows, :] += sm_scale * jax.lax.dot_general(
            dsw, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    if causal:
        # this kv block only sees q blocks at or below the diagonal
        @pl.when((q_idx + 1) * block_q - 1 >= k_idx * block_k)
        def _():
            compute()
    else:
        compute()

    @pl.when(q_idx == num_q_blocks - 1)
    def _():
        dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)

    @pl.when(jnp.logical_and(k_idx == num_k_blocks - 1, q_idx == num_q_blocks - 1))
    def _():
        dq_ref[0] = dq_acc[...].astype(dq_ref.dtype)


# dq's full-length f32 VMEM accumulator must fit comfortably alongside the
# tile buffers; above this the wrapper falls back to the split kernels
_FUSED_BWD_DQ_VMEM_BUDGET = 6 * 1024 * 1024
_FUSED_BWD = bool(int(os.environ.get("CFLEARN_TPU_FLASH_BWD_FUSED", "1")))


def _bwd_blocks(q_len: int, kv_len: int, d: int):
    # match the inference kernel's 1024 auto-blocks (r5 chip sweep at the
    # SD shapes: 1024/1024 beats the old 512/512 by 28% on the fused
    # fwd+bwd at L=4096/d=40, −20% at L=1024/d=80, −28% at L=9216;
    # 2048 fails to compile). Shrink when the padded head dim eats VMEM.
    d_pad = _round_up(d, 128)
    auto = 1024 if d_pad <= 128 else 256
    return min(auto, _round_up(q_len, 128)), min(auto, _round_up(kv_len, 128))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_attention_trainable(q, k, v, causal: bool = False, sm_scale: Optional[float] = None):
    """Differentiable flash attention: Pallas forward + Pallas backward
    (custom VJP). Positional `causal`/`sm_scale` (non-diff args).

    The PRIMAL (used when not differentiating) is the tuned inference
    kernel; the custom-VJP fwd rule (used under jax.grad) computes the lse
    residuals. This makes the kernel safe to use unconditionally — callers
    no longer need a (fragile) training flag to avoid routing gradients
    into a VJP-less kernel."""
    return flash_attention(q, k, v, causal=causal, sm_scale=sm_scale)


def _flash_fwd_with_lse(q, k, v, causal, sm_scale):
    b, h, q_len, d = q.shape
    kv_len = k.shape[2]
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)
    block_q, block_k = _bwd_blocks(q_len, kv_len, d)
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
        _flash_fwd_kernel, sm_scale=sm_scale, causal=causal,
        block_q=block_q, block_k=block_k, kv_len=kv_len,
    )
    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j, k: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda i, j, k: (i, k, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda i, j, k: (i, k, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j, k: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda i, j, k: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, q_len_pad, d), q.dtype),
            jax.ShapeDtypeStruct((bh, q_len_pad, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
        ],
        interpret=_INTERPRET,
    )(qp, kp, vp)
    out = out.reshape(b, h, q_len_pad, d)[:, :, :q_len]
    return out, lse


def _flash_train_fwd(q, k, v, causal, sm_scale):
    out, lse = _flash_fwd_with_lse(q, k, v, causal, sm_scale)
    return out, (q, k, v, out, lse)


def _flash_train_bwd(causal, sm_scale, residuals, do):
    q, k, v, out, lse = residuals
    b, h, q_len, d = q.shape
    kv_len = k.shape[2]
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)
    block_q, block_k = _bwd_blocks(q_len, kv_len, d)
    q_len_pad = _round_up(q_len, block_q)
    kv_len_pad = _round_up(kv_len, block_k)
    # delta_i = rowsum(dO_i * O_i) — cheap bandwidth pass in XLA
    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    delta = delta.reshape(b * h, q_len, 1)
    if q_len_pad != q_len:
        pad = ((0, 0), (0, 0), (0, q_len_pad - q_len), (0, 0))
        q = jnp.pad(q, pad)
        do = jnp.pad(do, pad)
        delta = jnp.pad(delta, ((0, 0), (0, q_len_pad - q_len), (0, 0)))
    if kv_len_pad != kv_len:
        pad = ((0, 0), (0, 0), (0, kv_len_pad - kv_len), (0, 0))
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
    bh = b * h
    qp = q.reshape(bh, q_len_pad, d)
    kp = k.reshape(bh, kv_len_pad, d)
    vp = v.reshape(bh, kv_len_pad, d)
    dop = do.reshape(bh, q_len_pad, d)
    # lse already padded to q_len_pad by the forward
    lse_p = lse

    if _FUSED_BWD and q_len_pad * d * 4 <= _FUSED_BWD_DQ_VMEM_BUDGET:
        # fused dq+dk+dv kernel: kv blocks outer, q blocks inner (see the
        # kernel docstring); ~29% less MXU volume than the split pair
        q_spec2 = pl.BlockSpec((1, block_q, d), lambda i, k, j: (i, j, 0), memory_space=pltpu.VMEM)
        kv_spec2 = pl.BlockSpec((1, block_k, d), lambda i, k, j: (i, k, 0), memory_space=pltpu.VMEM)
        row_spec2 = pl.BlockSpec((1, block_q, 1), lambda i, k, j: (i, j, 0), memory_space=pltpu.VMEM)
        dk, dv, dq = pl.pallas_call(
            functools.partial(
                _flash_bwd_fused_kernel, sm_scale=sm_scale, causal=causal,
                block_q=block_q, block_k=block_k, kv_len=kv_len,
            ),
            grid=(bh, kv_len_pad // block_k, q_len_pad // block_q),
            in_specs=[q_spec2, kv_spec2, kv_spec2, q_spec2, row_spec2, row_spec2],
            out_specs=[
                kv_spec2,
                kv_spec2,
                pl.BlockSpec((1, q_len_pad, d), lambda i, k, j: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((bh, kv_len_pad, d), k.dtype),
                jax.ShapeDtypeStruct((bh, kv_len_pad, d), v.dtype),
                jax.ShapeDtypeStruct((bh, q_len_pad, d), q.dtype),
            ],
            scratch_shapes=[
                pltpu.VMEM((block_k, d), jnp.float32),
                pltpu.VMEM((block_k, d), jnp.float32),
                pltpu.VMEM((q_len_pad, d), jnp.float32),
            ],
            interpret=_INTERPRET,
        )(qp, kp, vp, dop, lse_p, delta)
        dq = dq.reshape(b, h, q_len_pad, d)[:, :, :q_len]
        dk = dk.reshape(b, h, kv_len_pad, d)[:, :, :kv_len]
        dv = dv.reshape(b, h, kv_len_pad, d)[:, :, :kv_len]
        return dq, dk, dv

    q_spec = pl.BlockSpec((1, block_q, d), lambda i, j, k: (i, j, 0), memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, block_k, d), lambda i, j, k: (i, k, 0), memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, block_q, 1), lambda i, j, k: (i, j, 0), memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(
            _flash_bwd_dq_kernel, sm_scale=sm_scale, causal=causal,
            block_q=block_q, block_k=block_k, kv_len=kv_len,
        ),
        grid=(bh, q_len_pad // block_q, kv_len_pad // block_k),
        in_specs=[q_spec, kv_spec, kv_spec, q_spec, row_spec, row_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((bh, q_len_pad, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        interpret=_INTERPRET,
    )(qp, kp, vp, dop, lse_p, delta)

    # dK/dV: kv blocks outer, q blocks inner sequential
    q_spec2 = pl.BlockSpec((1, block_q, d), lambda i, k, j: (i, j, 0), memory_space=pltpu.VMEM)
    kv_spec2 = pl.BlockSpec((1, block_k, d), lambda i, k, j: (i, k, 0), memory_space=pltpu.VMEM)
    row_spec2 = pl.BlockSpec((1, block_q, 1), lambda i, k, j: (i, j, 0), memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(
            _flash_bwd_dkv_kernel, sm_scale=sm_scale, causal=causal,
            block_q=block_q, block_k=block_k, kv_len=kv_len,
        ),
        grid=(bh, kv_len_pad // block_k, q_len_pad // block_q),
        in_specs=[q_spec2, kv_spec2, kv_spec2, q_spec2, row_spec2, row_spec2],
        out_specs=[kv_spec2, kv_spec2],
        out_shape=[
            jax.ShapeDtypeStruct((bh, kv_len_pad, d), k.dtype),
            jax.ShapeDtypeStruct((bh, kv_len_pad, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        interpret=_INTERPRET,
    )(qp, kp, vp, dop, lse_p, delta)

    dq = dq.reshape(b, h, q_len_pad, d)[:, :, :q_len]
    dk = dk.reshape(b, h, kv_len_pad, d)[:, :, :kv_len]
    dv = dv.reshape(b, h, kv_len_pad, d)[:, :, :kv_len]
    return dq, dk, dv


flash_attention_trainable.defvjp(_flash_train_fwd, _flash_train_bwd)


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
        is_causal=causal,
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
    `bias`: additive logits bias.

    Context parallelism (SURVEY §5.7): when the ambient mesh has a
    `context` axis > 1 and this is a self-attention-shaped call (q_len ==
    kv_len, divisible by the axis size, no explicit mask/bias), the call
    routes through ring attention — KV blocks rotate over ICI via
    ppermute inside shard_map. This is THE switch that makes every
    Attention/CrossAttention module context-parallel by mesh config."""
    if mask is None and bias is None and not force_xla:
        try:
            from ..parallel.mesh import get_active_context_mesh

            mesh = get_active_context_mesh()
        except Exception:  # noqa: BLE001 — mesh plumbing must never break attention
            mesh = None
        if mesh is not None:
            cp = mesh.shape.get("context", 1)
            if cp > 1 and q.shape[2] == k.shape[2] and q.shape[2] % cp == 0:
                from .ring_attention import context_parallel_attention

                return context_parallel_attention(q, k, v, mesh, causal=causal, sm_scale=sm_scale)
    if mask is None and bias is None and not force_xla and _use_pallas(q, k):
        # always the custom-VJP entry: its primal IS the tuned inference
        # kernel, and under jax.grad the Pallas backward engages — modules
        # built with dropout=0.0 (which report training=False) stay
        # differentiable (code-review regression)
        return flash_attention_trainable(q, k, v, causal, sm_scale)
    return xla_attention(q, k, v, causal=causal, sm_scale=sm_scale, mask=mask, bias=bias)
