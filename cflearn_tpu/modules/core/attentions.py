"""Attention modules.

Parity: reference `cflearn/modules/core/attentions.py` — `Attention`
(registered "basic", qkv projections + sdp_attn, :58), `SpatialAttention`
(:330), `MultiHeadSpatialAttention` (:373), `LinearDepthWiseAttention`
(:463), `CrossAttention` (:498 — SD-style, context kv), `make_attention`
(:572). All channel-last; the score path routes through
`cflearn_tpu.ops.sdp_attn` (Pallas flash kernel on TPU inference).
"""

import math
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import nnx

from ...ops.attention import sdp_attn
from ..common import PrefixModules

attentions = PrefixModules("attention")


def register_attention(name: str, **kwargs: Any) -> Callable[[type], type]:
    return attentions.register(name, **kwargs)


def make_attention(name: str, *args: Any, **kwargs: Any) -> nnx.Module:
    return attentions.build(name, *args, **kwargs)


def _split_heads(x: jax.Array, num_heads: int) -> jax.Array:
    b, l, d = x.shape
    return x.reshape(b, l, num_heads, d // num_heads).transpose(0, 2, 1, 3)


def _merge_heads(x: jax.Array) -> jax.Array:
    b, h, l, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, l, h * dh)


@register_attention("basic")
class Attention(nnx.Module):
    """Multi-head attention with separate q/k/v projections."""

    def __init__(
        self,
        input_dim: int,
        num_heads: int = 1,
        *,
        bias: bool = True,
        dropout: float = 0.0,
        qk_scale: Optional[float] = None,
        embed_dim: Optional[int] = None,
        kv_dim: Optional[int] = None,
        out_dim: Optional[int] = None,
        is_self_attention: bool = False,
        rngs: nnx.Rngs,
    ) -> None:
        self.input_dim = input_dim
        self.num_heads = num_heads
        embed_dim = embed_dim or input_dim
        kv_dim = kv_dim or input_dim
        self.embed_dim = embed_dim
        if embed_dim % num_heads != 0:
            raise ValueError("`embed_dim` should be divisible by `num_heads`")
        self.head_dim = embed_dim // num_heads
        self.scale = qk_scale or 1.0 / math.sqrt(self.head_dim)
        self.is_self_attention = is_self_attention
        if is_self_attention:
            self.in_proj = nnx.Linear(input_dim, 3 * embed_dim, use_bias=bias, rngs=rngs)
        else:
            self.q_proj = nnx.Linear(input_dim, embed_dim, use_bias=bias, rngs=rngs)
            self.k_proj = nnx.Linear(kv_dim, embed_dim, use_bias=bias, rngs=rngs)
            self.v_proj = nnx.Linear(kv_dim, embed_dim, use_bias=bias, rngs=rngs)
        self.out_proj = nnx.Linear(embed_dim, out_dim or input_dim, use_bias=bias, rngs=rngs)
        self.dropout = nnx.Dropout(dropout, rngs=rngs) if dropout > 0 else None
        self.training = False

    def __call__(
        self,
        q: jax.Array,
        k: Optional[jax.Array] = None,
        v: Optional[jax.Array] = None,
        *,
        mask: Optional[jax.Array] = None,
        bias: Optional[jax.Array] = None,
        causal: bool = False,
    ) -> jax.Array:
        """`mask` follows the reference convention (`attentions.py:212`):
        True marks slots to be zeroed/masked OUT (inverted before SDPA, which
        wants True = keep). `bias` is an additive logits bias."""
        if self.is_self_attention:
            qkv = self.in_proj(q)
            q_, k_, v_ = jnp.split(qkv, 3, axis=-1)
        else:
            k = q if k is None else k
            v = q if v is None else v
            q_, k_, v_ = self.q_proj(q), self.k_proj(k), self.v_proj(v)
        qh = _split_heads(q_, self.num_heads)
        kh = _split_heads(k_, self.num_heads)
        vh = _split_heads(v_, self.num_heads)
        training = self.dropout is not None and not self.dropout.deterministic
        keep = None if mask is None else jnp.logical_not(mask)
        out = sdp_attn(
            qh, kh, vh, sm_scale=self.scale, mask=keep, bias=bias, causal=causal, training=training
        )
        out = _merge_heads(out)
        if self.dropout is not None:
            out = self.dropout(out)
        return self.out_proj(out)


@register_attention("cross")
class CrossAttention(nnx.Module):
    """SD-style cross attention (reference `attentions.py:498`): no bias on
    qkv, context supplies k/v; hookable for LoRA / style-reference."""

    def __init__(
        self,
        *,
        query_dim: int,
        context_dim: Optional[int] = None,
        heads: int = 8,
        dim_head: int = 64,
        dropout: float = 0.0,
        rngs: nnx.Rngs,
    ) -> None:
        inner_dim = dim_head * heads
        context_dim = context_dim or query_dim
        self.heads = heads
        self.dim_head = dim_head
        self.scale = 1.0 / math.sqrt(dim_head)
        self.to_q = nnx.Linear(query_dim, inner_dim, use_bias=False, rngs=rngs)
        self.to_k = nnx.Linear(context_dim, inner_dim, use_bias=False, rngs=rngs)
        self.to_v = nnx.Linear(context_dim, inner_dim, use_bias=False, rngs=rngs)
        self.to_out = nnx.Linear(inner_dim, query_dim, use_bias=True, rngs=rngs)
        self.dropout = nnx.Dropout(dropout, rngs=rngs) if dropout > 0 else None

    def __call__(
        self,
        x: jax.Array,
        context: Optional[jax.Array] = None,
        *,
        mask: Optional[jax.Array] = None,
        hooks: Optional[Any] = None,
    ) -> jax.Array:
        context = x if context is None else context
        q = self.to_q(x)
        k = self.to_k(context)
        v = self.to_v(context)
        if hooks is not None:
            q, k, v = hooks.process_qkv(self, q, k, v)
        qh = _split_heads(q, self.heads)
        kh = _split_heads(k, self.heads)
        vh = _split_heads(v, self.heads)
        training = self.dropout is not None and not self.dropout.deterministic
        # reference convention: mask marks slots to be zeroed (`attentions.py:559`)
        keep = None if mask is None else jnp.logical_not(mask)
        out = sdp_attn(qh, kh, vh, sm_scale=self.scale, mask=keep, training=training)
        out = _merge_heads(out)
        out = self.to_out(out)
        if self.dropout is not None:
            out = self.dropout(out)
        return out


class SpatialAttention(nnx.Module):
    """Single-head attention over NHWC feature maps with GroupNorm + qkv 1x1
    convs (the VAE mid-block attention; reference `attentions.py:330`)."""

    def __init__(self, in_channels: int, *, num_groups: int = 32, eps: float = 1e-6, rngs: nnx.Rngs) -> None:
        self.in_channels = in_channels
        self.norm = nnx.GroupNorm(in_channels, num_groups=num_groups, epsilon=eps, rngs=rngs)
        self.to_q = nnx.Linear(in_channels, in_channels, rngs=rngs)
        self.to_k = nnx.Linear(in_channels, in_channels, rngs=rngs)
        self.to_v = nnx.Linear(in_channels, in_channels, rngs=rngs)
        self.to_out = nnx.Linear(in_channels, in_channels, rngs=rngs)

    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        net = self.norm(x).reshape(b, h * w, c)
        q, k, v = self.to_q(net), self.to_k(net), self.to_v(net)
        out = sdp_attn(q[:, None], k[:, None], v[:, None], sm_scale=1.0 / math.sqrt(c))[:, 0]
        return x + self.to_out(out).reshape(b, h, w, c)


class MultiHeadSpatialAttention(nnx.Module):
    """Multi-head spatial attention (UNet attention blocks at low res;
    reference `attentions.py:373`)."""

    def __init__(
        self,
        in_channels: int,
        *,
        num_heads: Optional[int] = 1,
        num_head_channels: Optional[int] = None,
        num_groups: int = 32,
        rngs: nnx.Rngs,
    ) -> None:
        if num_head_channels is not None:
            num_heads = in_channels // num_head_channels
        assert num_heads is not None and in_channels % num_heads == 0
        self.num_heads = num_heads
        self.norm = nnx.GroupNorm(in_channels, num_groups=num_groups, epsilon=1e-5, rngs=rngs)
        self.to_qkv = nnx.Linear(in_channels, 3 * in_channels, rngs=rngs)
        # zero-initialized output projection (reference zero_module on the
        # attention proj_out): the block starts as identity
        from ..common import zero_module

        self.to_out = zero_module(nnx.Linear(in_channels, in_channels, rngs=rngs))

    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        net = self.norm(x).reshape(b, h * w, c)
        qkv = self.to_qkv(net)
        # per-head-interleaved layout (reference QKVAttentionLegacy,
        # `attentions.py:373/461`): channels are [h0:(q,k,v), h1:(q,k,v), …],
        # NOT [Q_all | K_all | V_all] — checkpoints trained under the legacy
        # reshape slice wrongly otherwise for num_heads > 1
        dh = c // self.num_heads
        qkv = qkv.reshape(b, h * w, self.num_heads, 3 * dh)
        q, k, v = jnp.split(qkv, 3, axis=-1)  # each (b, n, heads, dh)
        q = q.transpose(0, 2, 1, 3)
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)
        out = sdp_attn(q, k, v)
        out = _merge_heads(out)
        return x + self.to_out(out).reshape(b, h, w, c)


class LinearDepthWiseAttention(nnx.Module):
    """Linear attention variant (reference `attentions.py:463`)."""

    def __init__(self, in_channels: int, *, num_heads: int = 4, head_dim: int = 32, rngs: nnx.Rngs) -> None:
        self.num_heads = num_heads
        self.head_dim = head_dim
        inner = num_heads * head_dim
        self.to_qkv = nnx.Linear(in_channels, 3 * inner, use_bias=False, rngs=rngs)
        self.to_out = nnx.Linear(inner, in_channels, rngs=rngs)

    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        qkv = self.to_qkv(x.reshape(b, h * w, c))
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = _split_heads(q, self.num_heads)
        k = _split_heads(k, self.num_heads)
        v = _split_heads(v, self.num_heads)
        # reference (`attentions.py:490`): softmax on K over the TOKEN axis
        # only — no q softmax
        k = jax.nn.softmax(k, axis=-2)
        ctx = jnp.einsum("bhnd,bhne->bhde", k, v)
        out = jnp.einsum("bhnd,bhde->bhne", q, ctx)
        out = _merge_heads(out)
        return self.to_out(out).reshape(b, h, w, c)


@register_attention("decayed")
class DecayedAttention(Attention):
    """Attention with a fixed per-position decay (reference
    `attentions.py:283-327`). The reference multiplies post-softmax weights
    by `exp(-(0.1**(h+3)) * (i-j)^2)` (lower triangle; 1 above the diagonal)
    and renormalizes — exactly equivalent to adding the log of that decay to
    the logits, which is how it is applied here (additive `bias`, SDPA-fusable)."""

    def __init__(self, input_dim: int, num_heads: int = 1, *, seq_len: int, dropout: float = 0.0, rngs: nnx.Rngs, **kwargs: Any) -> None:
        super().__init__(input_dim, num_heads, dropout=dropout, rngs=rngs, **kwargs)
        self.decay_bias = nnx.Variable(jnp.asarray(np_decay_log_bias(seq_len, num_heads)))

    def __call__(self, q: jax.Array, k: Optional[jax.Array] = None, v: Optional[jax.Array] = None, **kwargs: Any) -> jax.Array:
        kwargs["bias"] = self.decay_bias[None]
        return super().__call__(q, k, v, **kwargs)


def np_decay_log_bias(seq_len: int, num_heads: int) -> Any:
    """Additive log-domain equivalent of the reference's multiplicative decay
    (`attentions.py:313-327`): bias[h, i, j] = -(0.1**(h+3)) * (i-j)^2 for
    j <= i, 0 above the diagonal."""
    import numpy as np

    i = np.arange(seq_len)[:, None]
    j = np.arange(seq_len)[None, :]
    sq = np.where(j <= i, (i - j).astype(np.float32) ** 2, 0.0)
    rates = np.asarray([0.1 ** (h + 3) for h in range(num_heads)], dtype=np.float32)
    return -rates[:, None, None] * sq[None]
