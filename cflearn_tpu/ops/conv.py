"""Pallas NHWC 3x3 convolution kernel for TPU.

Why: XLA:TPU's conv at SD VAE/UNet shapes (large spatial, 128-1280
channels) measures ~49-68 TF/s on v5e while plain matmuls at the same
contraction sizes reach ~126 TF/s. The decoder/UNet resblock convs are the
single largest time sink of the SD pipeline (VAE decode ~9 TFLOPs; UNet
~2.4 TFLOPs/CFG-step of conv). This kernel reformulates the 3x3 SAME conv
as 9 accumulated matmuls over halo'd row tiles resident in VMEM:

    y[i, j, co] = sum_{di, dj} x[i+di-1, j+dj-1, :] @ w[di, dj, :, co]

Layout: NHWC with C on lanes — the MXU contraction runs over C (>=128 on
every SD shape), so utilization is set by the channel count, not the 3x3
taps. Halo'd input rows are expressed with `pl.Element` block dims over a
(H+2, W+2) pre-padded input, which keeps Pallas's automatic double-buffered
pipelining (no manual DMA).

The reference counterpart is torch/cuDNN conv (used by every conv module,
`cflearn/modules/core/convs/basic.py:41`); here the hot path is first-party.

Forward-optimized: `conv3x3` dispatches to the kernel for inference-shaped
calls and to `lax.conv_general_dilated` otherwise (training grad, stride!=1,
non-SAME, tiny channels).
"""

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = bool(int(os.environ.get("CFLEARN_TPU_PALLAS_INTERPRET", "0")))
# kill switch for A/B measurement (e.g. XLA-vs-Pallas net of pad staging)
_PALLAS_CONV_ENABLED = bool(int(os.environ.get("CFLEARN_TPU_CONV_PALLAS", "1")))

# VMEM budget for picking the row-tile height (v5e has ~16MB more or less;
# leave headroom for Mosaic's own buffers)
_VMEM_BUDGET = int(10.5 * 1024 * 1024)

# configs that compiled and measured best on v5e but sit above the
# conservative budget (Mosaic's true allocation varies non-linearly with
# shape; everything outside the budget or this table falls back to XLA)
_PINNED_CONFIGS = {
    # (h, w, c, co) -> (nb, th, co_blk)
    (64, 64, 512, 512): (1, 8, 512),  # VAE decoder 64x64 level: 76 TF/s
}


def _conv3x3_kernel(x_ref, w_ref, o_ref, *, nb: int, th: int, w_len: int):
    """x_ref: (nb, th+2, W+2, C) halo rows for nb batch images; w_ref:
    (3, 3, C, co_blk); o_ref: (nb, th, W, co_blk). Folding nb images into
    one (nb*th*W, C) matmul keeps the MXU M-dimension large at small
    spatial sizes. Accumulate 9 matmuls in f32."""
    x = x_ref[...]
    c = x.shape[-1]
    acc = None
    for di in range(3):
        for dj in range(3):
            xs = x[:, di : di + th, dj : dj + w_len, :]
            xs2 = xs.reshape(nb * th * w_len, c)
            part = jax.lax.dot_general(
                xs2,
                w_ref[di, dj],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = part if acc is None else acc + part
    o_ref[...] = acc.reshape(nb, th, w_len, -1).astype(o_ref.dtype)


def _conv3x3_kernel_q(x_ref, w_ref, s_ref, o_ref, *, nb: int, th: int, w_len: int):
    """W8A8 variant: int8 x/w, int32 MXU accumulate (measured 144 TOPS at
    512^2x128 on v5e vs 96 TF/s bf16), dequantized in-kernel so the output
    leaves VMEM at its final dtype. s_ref: (1, co_blk) combined scale
    (s_x * s_w[co])."""
    x = x_ref[...]
    c = x.shape[-1]
    acc = None
    for di in range(3):
        for dj in range(3):
            xs2 = x[:, di : di + th, dj : dj + w_len, :].reshape(nb * th * w_len, c)
            part = jax.lax.dot_general(
                xs2,
                w_ref[di, dj],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            acc = part if acc is None else acc + part
    out = acc.astype(jnp.float32) * s_ref[0][None, :]
    o_ref[...] = out.reshape(nb, th, w_len, -1).astype(o_ref.dtype)


def _conv3x3_kernel_fold(x_ref, w_ref, o_ref, xc_ref, *, th: int, w_len: int):
    """dj-folded variant: the 3 horizontal taps are concatenated on lanes so
    the contraction is 3C deep (3 matmuls instead of 9 — better MXU
    utilization at narrow channel counts). w_ref: (3, 3C, co_blk). The
    shifted slices are staged through `xc_ref` (VMEM scratch) because Mosaic
    cannot lane-concat vectors at different sublane offsets directly."""
    x = x_ref[0]
    c = x.shape[-1]
    for dj in range(3):
        xc_ref[:, :, dj * c : (dj + 1) * c] = x[:, dj : dj + w_len, :]
    acc = None
    for di in range(3):
        xs2 = xc_ref[di : di + th].reshape(th * w_len, 3 * c)
        part = jax.lax.dot_general(
            xs2,
            w_ref[di],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = part if acc is None else acc + part
    o_ref[0] = acc.reshape(th, w_len, -1).astype(o_ref.dtype)


def _vmem_estimate(nb: int, th: int, w: int, c: int, co_blk: int, co: int, x_bytes: int) -> int:
    """Calibrated against Mosaic's reported scoped-vmem allocations on v5e:
    x and out are double-buffered; the f32 accumulator effectively costs two
    copies (the value plus its reshape on the store); the weight tile is
    double-buffered when its block index varies over the grid (Co blocking)
    and single-buffered when constant."""
    w_bufs = 2 if co_blk < co else 1
    return (
        2 * nb * (th + 2) * (w + 2) * c * x_bytes  # x halo tile (double buffered)
        + 2 * nb * th * w * co_blk * x_bytes  # out tile (double buffered)
        + 2 * nb * th * w * co_blk * 4  # f32 accumulator (+ reshape temp)
        + w_bufs * 9 * c * co_blk * x_bytes  # weight tile
    )


def _pick_config(bsz: int, h: int, w: int, c: int, co: int, x_bytes: int):
    """Choose (batch-fold nb, row-tile th, out-channel block co_blk) under
    the VMEM budget, or None when no configuration fits (dispatcher falls
    back to XLA). Small spatial sizes fold several batch images into one
    program so the matmul M-dim stays large; large spatial tiles rows.
    Mosaic needs the minor block dim to be a multiple of 128 or the full
    dim, so Co blocking candidates are multiple-of-128 divisors of Co."""
    pinned = _PINNED_CONFIGS.get((h, w, c, co))
    if pinned is not None:
        nb, th, co_blk = pinned
        # pinned configs sit above the conservative budget and were measured
        # at bf16; at f32 their true Mosaic allocation exceeds the 16M scoped
        # VMEM limit (seen as a compile-time OOM in the AE-256px input-grad),
        # so only honor them for <=2-byte dtypes
        if bsz % nb == 0 and x_bytes <= 2:
            return pinned
    co_cands = [co] + [d for d in range(co - 128, 0, -128) if co % d == 0 and d % 128 == 0]
    nb_cands = [n for n in range(min(bsz, 16), 0, -1) if bsz % n == 0]
    best = None  # (m, th, co_blk, nb)
    for co_blk in co_cands:
        th = h
        while th >= 1:
            if h % th == 0:
                for nb in nb_cands:
                    m = nb * th * w
                    if m > 8192:
                        continue
                    if _vmem_estimate(nb, th, w, c, co_blk, co, x_bytes) > _VMEM_BUDGET:
                        continue
                    # prefer the largest matmul M; tie-break on larger th
                    # (fewer duplicated halo rows) then larger co_blk
                    # (fewer HBM re-reads of x)
                    if best is None or (m, th, co_blk) > (best[0], best[1], best[2]):
                        best = (m, th, co_blk, nb)
                    break  # nb_cands is descending: first fit has max nb for this th
            th -= 1 if th <= 8 else th // 2
    if best is not None:
        return best[3], best[1], best[2]
    return None


@functools.partial(jax.jit, static_argnames=("out_dtype", "fold"))
def conv3x3_pallas(
    x: jax.Array,
    w: jax.Array,
    b: Optional[jax.Array] = None,
    *,
    out_dtype=None,
    fold: Optional[bool] = None,
) -> jax.Array:
    """3x3 stride-1 SAME NHWC conv. x: (B,H,W,C), w: (3,3,C,Co), b: (Co,)."""
    bsz, h, w_len, c = x.shape
    co = w.shape[-1]
    out_dtype = out_dtype or x.dtype

    cfg = _pick_config(bsz, h, w_len, c, co, x.dtype.itemsize)
    if cfg is None:
        return _xla_conv3x3(x, w, b)
    nb, th, co_blk = cfg
    n_co = co // co_blk
    n_h = h // th
    if fold is None:
        # measured on v5e: the dj-fold's VMEM staging copy costs more than
        # the deeper contraction saves at every SD hot shape
        fold = False
    if fold and cfg is not None:
        # the fold staging scratch is extra VMEM the shared model ignores
        nb0, th0, co_blk0 = cfg
        extra = (th0 + 2) * w_len * 3 * c * x.dtype.itemsize
        if nb0 != 1 or _vmem_estimate(1, th0, w_len, c, co_blk0, co, x.dtype.itemsize) + extra > _VMEM_BUDGET:
            fold = False

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))

    grid = (bsz // nb, n_h, n_co)
    scratch = []
    if fold:
        nb = 1
        grid = (bsz, n_h, n_co)
        w_in = w.reshape(3, 3 * c, co)
        w_spec = pl.BlockSpec((3, 3 * c, co_blk), lambda bi, hi, ci: (0, 0, ci))
        kernel = functools.partial(_conv3x3_kernel_fold, th=th, w_len=w_len)
        scratch = [pltpu.VMEM((th + 2, w_len, 3 * c), x.dtype)]
    else:
        w_in = w
        w_spec = pl.BlockSpec((3, 3, c, co_blk), lambda bi, hi, ci: (0, 0, 0, ci))
        kernel = functools.partial(_conv3x3_kernel, nb=nb, th=th, w_len=w_len)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (pl.Element(nb), pl.Element(th + 2), pl.Element(w_len + 2), pl.Element(c)),
                lambda bi, hi, ci, _nb=nb, _th=th: (bi * _nb, hi * _th, 0, 0),
            ),
            w_spec,
        ],
        out_specs=pl.BlockSpec((nb, th, w_len, co_blk), lambda bi, hi, ci: (bi, hi, 0, ci)),
        out_shape=jax.ShapeDtypeStruct((bsz, h, w_len, co), out_dtype),
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * h * w_len * c * co * 9,
            bytes_accessed=(xp.size + w.size) * x.dtype.itemsize
            + bsz * h * w_len * co * jnp.dtype(out_dtype).itemsize,
            transcendentals=0,
        ),
        interpret=_INTERPRET,
    )(xp, w_in)
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


@jax.jit
def conv3x3_w8a8(x: jax.Array, w: jax.Array, b: Optional[jax.Array] = None) -> jax.Array:
    """Dynamically-quantized W8A8 3x3 conv: per-tensor activation scale,
    per-out-channel weight scale, int8 MXU matmuls, in-kernel dequant.
    Opt-in serving mode (set `CFLEARN_TPU_CONV_W8A8=1` or pass
    `quantized=True` to `conv_call`) — ~1.5x the bf16 kernel at the VAE
    decoder shapes on v5e at the usual W8A8 quality cost."""
    bsz, h, w_len, c = x.shape
    co = w.shape[-1]
    out_dtype = x.dtype

    cfg = _pick_config(bsz, h, w_len, c, co, 2)  # conservative bf16-byte model
    if cfg is None:
        return _xla_conv3x3(x, w, b)
    nb, th, co_blk = cfg

    s_x = jnp.max(jnp.abs(x.astype(jnp.float32))) / 127.0 + 1e-12
    x8 = jnp.clip(jnp.round(x.astype(jnp.float32) / s_x), -127, 127).astype(jnp.int8)
    s_w = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=(0, 1, 2)) / 127.0 + 1e-12  # (co,)
    w8 = jnp.clip(jnp.round(w.astype(jnp.float32) / s_w), -127, 127).astype(jnp.int8)
    scale = (s_x * s_w).astype(jnp.float32)[None]  # (1, co)

    xp = jnp.pad(x8, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_conv3x3_kernel_q, nb=nb, th=th, w_len=w_len),
        grid=(bsz // nb, h // th, co // co_blk),
        in_specs=[
            pl.BlockSpec(
                (pl.Element(nb), pl.Element(th + 2), pl.Element(w_len + 2), pl.Element(c)),
                lambda bi, hi, ci, _nb=nb, _th=th: (bi * _nb, hi * _th, 0, 0),
            ),
            pl.BlockSpec((3, 3, c, co_blk), lambda bi, hi, ci: (0, 0, 0, ci)),
            pl.BlockSpec((1, co_blk), lambda bi, hi, ci: (0, ci)),
        ],
        out_specs=pl.BlockSpec((nb, th, w_len, co_blk), lambda bi, hi, ci: (bi, hi, 0, ci)),
        out_shape=jax.ShapeDtypeStruct((bsz, h, w_len, co), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * h * w_len * c * co * 9,
            bytes_accessed=xp.size + w8.size + bsz * h * w_len * co * jnp.dtype(out_dtype).itemsize,
            transcendentals=0,
        ),
        interpret=_INTERPRET,
    )(xp, w8, scale)
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def _xla_conv3x3(x, w, b):
    out = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def _conv3x3_wgrad_kernel(x_ref, dy_ref, o_ref, acc_ref, *, nb: int, th: int, w_len: int, c: int, n_tiles: int):
    """Weight-grad tile: dw[di*3+dj, c, co] += x_halo[n, di+h, dj+w, c] *
    dy[n, h, w, co], accumulated over the (batch x row-tile) grid axis in a
    f32 VMEM scratch and flushed on the last tile. Forward-kernel style:
    per-tap shifted slices + reshape (the pattern `_conv3x3_kernel` already
    runs fast), with `nb` batch images folded into the contraction so the
    dot's K dim is nb*th*W — the first design (lane-staged taps, K=th*W)
    measured 4-20x slower than XLA from tiny contractions."""
    t = pl.program_id(1)
    x = x_ref[...]
    dy2 = dy_ref[...].reshape(nb * th * w_len, -1)
    for di in range(3):
        for dj in range(3):
            xs = x[:, di : di + th, dj : dj + w_len, :].reshape(nb * th * w_len, c)
            part = jax.lax.dot_general(
                xs, dy2, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            idx = di * 3 + dj

            @pl.when(t == 0)
            def _():
                acc_ref[idx] = part

            @pl.when(t > 0)
            def _():
                acc_ref[idx] += part

    @pl.when(t == n_tiles - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _pick_wgrad_config(bsz: int, h: int, w: int, c: int, co: int, x_bytes: int):
    """(nb, th, co_blk) for the weight-grad kernel under the VMEM budget, or
    None (fallback to XLA). The f32 accumulator (9, C, co_blk) is the big
    resident; x/dy tiles are double-buffered. Maximize the contraction size
    K = nb*th*W (the v1 lesson), tie-break on fewer co blocks."""
    co_cands = [d for d in (co, 512, 384, 256, 128) if d <= co and co % d == 0 and (d % 128 == 0 or d == co)]
    best = None  # (K, co_blk, nb, th)
    for co_blk in co_cands:
        acc = 9 * c * co_blk * 4 + 9 * c * co_blk * x_bytes  # accumulator + out tile
        if acc > _VMEM_BUDGET:
            continue
        for nb in [n for n in range(min(bsz, 8), 0, -1) if bsz % n == 0]:
            th = min(h, 32)
            while th >= 1:
                if h % th == 0:
                    k = nb * th * w
                    vmem = (
                        acc
                        + 2 * nb * (th + 2) * (w + 2) * c * x_bytes  # x halo tile (dbuf)
                        + nb * (th + 2) * (w + 2) * c * x_bytes  # x value copy
                        + 2 * nb * th * w * co_blk * x_bytes  # dy tile (dbuf)
                        + k * c * x_bytes  # xs reshape stack temp
                        + k * co_blk * x_bytes  # dy2 reshape stack temp
                        + c * co_blk * 4  # per-tap f32 partial
                    )
                    if vmem <= _VMEM_BUDGET and k <= 8192:
                        if best is None or (k, co_blk) > (best[0], best[1]):
                            best = (k, co_blk, nb, th)
                        break
                th -= 1 if th <= 8 else th // 2
    if best is not None:
        return best[2], best[3], best[1]
    return None


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def conv3x3_wgrad_pallas(x: jax.Array, dy: jax.Array, *, out_dtype=None) -> jax.Array:
    """dL/dw of a 3x3 stride-1 SAME NHWC conv: x (B,H,W,C), dy (B,H,W,Co)
    -> (3,3,C,Co). Falls back to XLA's transpose conv when no VMEM config
    fits."""
    bsz, h, w_len, c = x.shape
    co = dy.shape[-1]
    out_dtype = out_dtype or x.dtype
    cfg = _pick_wgrad_config(bsz, h, w_len, c, co, x.dtype.itemsize)
    if cfg is None:
        return _xla_conv3x3_wgrad(x, dy).astype(out_dtype)
    nb, th, co_blk = cfg
    tiles_per_img = h // th
    n_tiles = (bsz // nb) * tiles_per_img
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = pl.pallas_call(
        functools.partial(
            _conv3x3_wgrad_kernel, nb=nb, th=th, w_len=w_len, c=c, n_tiles=n_tiles
        ),
        grid=(co // co_blk, n_tiles),
        in_specs=[
            pl.BlockSpec(
                (pl.Element(nb), pl.Element(th + 2), pl.Element(w_len + 2), pl.Element(c)),
                lambda ci, t, _nb=nb, _th=th, _tpi=tiles_per_img: (
                    (t // _tpi) * _nb,
                    (t % _tpi) * _th,
                    0,
                    0,
                ),
            ),
            pl.BlockSpec(
                (nb, th, w_len, co_blk),
                lambda ci, t, _tpi=tiles_per_img: (t // _tpi, t % _tpi, 0, ci),
            ),
        ],
        out_specs=pl.BlockSpec((9, c, co_blk), lambda ci, t: (0, 0, ci)),
        out_shape=jax.ShapeDtypeStruct((9, c, co), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((9, c, co_blk), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * h * w_len * c * co * 9,
            bytes_accessed=(xp.size + dy.size) * x.dtype.itemsize + 9 * c * co * 4,
            transcendentals=0,
        ),
        interpret=_INTERPRET,
    )(xp, dy)
    # leading axis is (di, dj) row-major: out[di*3+dj, c, co] == dw[di, dj, c, co]
    return out.reshape(3, 3, c, co)


def _xla_conv3x3_wgrad(x: jax.Array, dy: jax.Array) -> jax.Array:
    _, vjp = jax.vjp(
        lambda w_: jax.lax.conv_general_dilated(
            x, w_, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        ),
        jnp.zeros((3, 3, x.shape[-1], dy.shape[-1]), x.dtype),
    )
    return vjp(dy)[0]


def _flip_weights(w: jax.Array) -> jax.Array:
    """Input-grad weights: rot180 + in/out transpose — dx = conv(dy, w')."""
    return jnp.transpose(w[::-1, ::-1], (0, 1, 3, 2))


@jax.custom_vjp
def conv3x3(x: jax.Array, w: jax.Array, b: Optional[jax.Array] = None) -> jax.Array:
    """3x3 stride-1 SAME NHWC conv: Pallas forward; the backward of a
    stride-1 SAME conv is itself a 3x3 conv (input grad, with rot180
    transposed weights — REUSES the forward kernel) plus a 9-tap
    batched-contraction (weight grad, `conv3x3_wgrad_pallas`), each
    dispatched to Pallas at the shapes where it wins and to XLA elsewhere."""
    return conv3x3_pallas(x, w, b)


def _conv3x3_fwd(x, w, b):
    return conv3x3_pallas(x, w, b), (x, w, b)


def _conv3x3_bwd(res, dy):
    x, w, b = res
    wf = _flip_weights(w)
    # input grad: the same conv with flipped weights — same dispatcher
    if _shape_wins(dy, wf):
        dx = conv3x3_pallas(dy, wf)
    else:
        dx = _xla_conv3x3(dy, wf, None)
    dx = dx.astype(x.dtype)
    if _wgrad_shape_wins(x, dy):
        dw = conv3x3_wgrad_pallas(x, dy, out_dtype=w.dtype)
    else:
        dw = _xla_conv3x3_wgrad(x, dy).astype(w.dtype)
    db = jnp.sum(dy, axis=(0, 1, 2)).astype(b.dtype) if b is not None else None
    return dx, dw, db


conv3x3.defvjp(_conv3x3_fwd, _conv3x3_bwd)


_WGRAD_PALLAS = bool(int(os.environ.get("CFLEARN_TPU_WGRAD_PALLAS", "0")))


def _wgrad_shape_wins(x: jax.Array, dy: jax.Array) -> bool:
    """Measured on v5e with the clean N=100 protocol
    (scripts/profile_conv_bwd.py -> docs/conv_bwd_profile.json): XLA's
    weight-grad runs 91-149 TF/s across every SD hot shape and beats the
    Pallas kernel everywhere (best Pallas: 109 TF/s at 128^2x512 vs XLA
    144). The kernel stays available behind CFLEARN_TPU_WGRAD_PALLAS=1 for
    future shapes; the default dispatch is XLA. (The r3 claim that conv
    backward sat at ~45 TF/s was contaminated by per-call tunnel overhead —
    see docs/performance.md 'measurement protocol'.)"""
    if not _WGRAD_PALLAS:
        return False
    return (
        _pick_wgrad_config(
            x.shape[0], x.shape[1], x.shape[2], x.shape[-1], dy.shape[-1], x.dtype.itemsize
        )
        is not None
    )


def _shape_wins(x: jax.Array, w: jax.Array) -> bool:
    """Measured on v5e: the kernel beats XLA at >=128^2 spatial for any SD
    channel count, plus the pinned 64^2x512 VAE shape. Elsewhere XLA's conv
    is at least as good (or the config is unvalidated — see _PINNED_CONFIGS).
    Every win was measured at bf16; f32 (training-dtype) convs stay on XLA —
    the kernel's VMEM model is calibrated for 2-byte operands."""
    if x.dtype.itemsize > 2:
        return False
    hw = x.shape[1] * x.shape[2]
    shape_key = (x.shape[1], x.shape[2], x.shape[-1], w.shape[-1])
    return hw >= 128 * 128 or shape_key in _PINNED_CONFIGS


def use_pallas_conv(x: jax.Array, w: jax.Array, strides, padding) -> bool:
    if not _PALLAS_CONV_ENABLED:
        return False
    if jax.default_backend() != "tpu" and not _INTERPRET:
        return False
    if w.ndim != 4 or w.shape[0] != 3 or w.shape[1] != 3:
        return False
    if x.ndim != 4:
        return False
    if tuple(strides) not in ((1, 1),):
        return False
    if isinstance(padding, str):
        if padding.upper() != "SAME":
            return False
    else:
        try:
            if tuple(map(tuple, padding)) != ((1, 1), (1, 1)):
                return False
        except TypeError:
            return False
    if w.dtype.itemsize > 2:  # conv_call casts x to the kernel dtype
        return False
    return x.shape[-1] >= 64 and w.shape[-1] >= 64 and _shape_wins(x, w)


_W8A8_DEFAULT = bool(int(os.environ.get("CFLEARN_TPU_CONV_W8A8", "0")))


def conv_call(conv_mod, x: jax.Array, *, quantized: Optional[bool] = None) -> jax.Array:
    """Run an `nnx.Conv` through the Pallas kernel when the shape wins on
    TPU, else through the module itself (XLA conv). Drop-in for
    `conv_mod(x)` on 3x3 convs. `quantized=True` (or the
    `CFLEARN_TPU_CONV_W8A8=1` env default) routes through the dynamic W8A8
    kernel — an inference-serving trade of some output fidelity for ~1.5x
    conv throughput on v5e."""
    kernel = conv_mod.kernel[...]
    strides = getattr(conv_mod, "strides", (1, 1)) or (1, 1)
    if isinstance(strides, int):
        strides = (strides, strides)
    padding = getattr(conv_mod, "padding", "SAME")
    # the Pallas kernel implements a dense dilation-1 conv only — dilated or
    # grouped convs must stay on XLA (silently wrong / block-shape crash)
    dilation = getattr(conv_mod, "kernel_dilation", None) or (1, 1)
    if isinstance(dilation, int):
        dilation = (dilation, dilation)
    groups = getattr(conv_mod, "feature_group_count", 1) or 1
    plain = tuple(dilation) == (1, 1) and groups == 1
    if plain and use_pallas_conv(x, kernel, strides, padding):
        bias = conv_mod.bias[...] if getattr(conv_mod, "bias", None) is not None else None
        if quantized is None:
            quantized = _W8A8_DEFAULT
        if quantized:
            return conv3x3_w8a8(x.astype(kernel.dtype), kernel, bias)
        return conv3x3(x.astype(kernel.dtype), kernel, bias)
    return conv_mod(x)
