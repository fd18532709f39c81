"""ToMe — token merging for SD transformer blocks.

Parity: reference `cflearn/modules/core/mixed_stacks/api.py:461-618`
(`bipartite_soft_matching_random2d`, `compute_merge`) — merge similar tokens
before self-attention and unmerge after, cutting attention cost roughly by
(1-ratio)² at the highest resolutions.

TPU-native deviations (static shapes for jit): the dst stride-2 anchor is
deterministic (reference uses a random cell offset per call — `use_rand`
off), and the number of merged tokens r is a static function of N and
`ratio`; top-r selection uses `jax.lax.top_k`.
"""

import math
from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def bipartite_soft_matching_random2d(
    metric: jax.Array,  # (B, N, C) similarity metric (tokens themselves or keys)
    h: int,
    w: int,
    *,
    ratio: float = 0.5,
    sx: int = 2,
    sy: int = 2,
) -> Tuple[Callable[[jax.Array], jax.Array], Callable[[jax.Array], jax.Array], int]:
    """Build (merge, unmerge) for (B, N, C) token tensors. Returns
    (merge_fn, unmerge_fn, num_remaining)."""
    b, n, c = metric.shape
    assert n == h * w
    # dst = top-left of each sy×sx cell; src = the rest
    row = jnp.arange(h)
    col = jnp.arange(w)
    is_dst = ((row[:, None] % sy) == 0) & ((col[None, :] % sx) == 0)
    is_dst = is_dst.reshape(-1)
    # ceil, not floor: when h % sy or w % sx != 0 the partial cells still
    # contain a dst anchor — undercounting truncated real dst tokens and
    # zero-padded src_idx, silently dropping/duplicating tokens
    num_dst = math.ceil(h / sy) * math.ceil(w / sx)
    dst_idx = jnp.nonzero(is_dst, size=num_dst)[0]
    num_src = n - num_dst
    src_idx = jnp.nonzero(~is_dst, size=num_src)[0]
    r = min(num_src, int(n * ratio))

    metric_n = metric / (jnp.linalg.norm(metric, axis=-1, keepdims=True) + 1e-6)
    src = jnp.take(metric_n, src_idx, axis=1)  # (B, num_src, C)
    dst = jnp.take(metric_n, dst_idx, axis=1)  # (B, num_dst, C)
    scores = jnp.einsum("bsc,bdc->bsd", src, dst)  # (B, num_src, num_dst)
    best_score = jnp.max(scores, axis=-1)  # (B, num_src)
    best_dst = jnp.argmax(scores, axis=-1)  # (B, num_src)
    # top-r src tokens to merge
    _, merge_order = jax.lax.top_k(best_score, num_src)
    merged_src_pos = merge_order[:, :r]  # positions INTO src_idx
    kept_src_pos = merge_order[:, r:]

    merged_tgt = jnp.take_along_axis(best_dst, merged_src_pos, axis=1)  # (B, r)
    # one-hot of the merge targets — feature scatters become MXU matmuls
    # (TPU scatter on (B, r, C) tensors measured ~3x the cost of the whole
    # attention saving; the one-hot einsum runs at matmul speed)
    tgt_onehot = (
        merged_tgt[..., None] == jnp.arange(num_dst)[None, None, :]
    )  # (B, r, num_dst) bool

    def merge(x: jax.Array) -> jax.Array:
        x_src = jnp.take(x, src_idx, axis=1)  # (B, num_src, C)
        x_dst = jnp.take(x, dst_idx, axis=1)  # (B, num_dst, C)
        merged_vals = jnp.take_along_axis(x_src, merged_src_pos[..., None], axis=1)  # (B, r, C)
        oh = tgt_onehot.astype(x.dtype)
        sums = x_dst + jnp.einsum("brd,brc->bdc", oh, merged_vals)
        counts = 1.0 + jnp.sum(oh, axis=1)[..., None]  # (B, num_dst, 1)
        x_kept = jnp.take_along_axis(x_src, kept_src_pos[..., None], axis=1)  # (B, num_src - r, C)
        return jnp.concatenate([sums / counts, x_kept], axis=1)

    def unmerge(x: jax.Array) -> jax.Array:
        bsz = x.shape[0]
        # every output token reads one row of the merged tensor: build the
        # int32 source map (index-width scatters — measured cheaper than the
        # argsort inverse and ~300x less data than feature-width scatters),
        # then do a single feature-width gather
        kept_global = jnp.take(src_idx, kept_src_pos)  # (B, num_src - r)
        merged_global = jnp.take(src_idx, merged_src_pos)  # (B, r)
        inv = jnp.zeros((bsz, n), jnp.int32)
        inv = inv.at[:, dst_idx].set(jnp.arange(num_dst, dtype=jnp.int32)[None])
        inv = jax.vmap(lambda o, idx: o.at[idx].set(num_dst + jnp.arange(kept_src_pos.shape[1], dtype=jnp.int32)))(inv, kept_global)
        inv = jax.vmap(lambda o, idx, v: o.at[idx].set(v))(inv, merged_global, merged_tgt.astype(jnp.int32))
        return jnp.take_along_axis(x, inv[..., None], axis=1)

    return merge, unmerge, n - r


def compute_merge(
    x: jax.Array, h: int, w: int, *, ratio: float = 0.5, min_tokens: int = 2048
) -> Tuple[Callable, Callable, bool]:
    """Reference `compute_merge` (`mixed_stacks/api.py:592`): only merge when
    the token count is large enough to pay off. min_tokens=2048 matches
    tomesd's max_downsample=1 default (only the highest-resolution level
    merges — at 1024 tokens the merge/unmerge overhead exceeds the
    attention saving on v5e)."""
    n = x.shape[1]
    if n < min_tokens or ratio <= 0.0:
        identity = lambda t: t
        return identity, identity, False
    merge, unmerge, _ = bipartite_soft_matching_random2d(x, h, w, ratio=ratio)
    return merge, unmerge, True
