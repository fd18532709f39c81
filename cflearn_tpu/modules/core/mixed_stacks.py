"""Mixed-stack transformer machinery + the SD SpatialTransformer.

Parity: reference `cflearn/modules/core/mixed_stacks/` —
`PositionalEncoding` (:188), `MixingBlock` (:41), `MixedStackedEncoder`
(:270 — generic token/channel-mixer transformer behind ViT/Mixer/FNet/
PoolFormer), token mixers (attention/fourier/mlp/pool — `token_mixers.py`),
channel mixers (ff/mix_ff — `channel_mixers.py`), `SpatialTransformer(+Block)`
(:766/:830 — the SD cross-attention transformer with hook points),
`SpatialTransformerHooks` (:645). ToMe token merging (:473-618) is a listed
phase-2 item (SURVEY.md §5.7).
"""

import math
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
from flax import nnx

from ..common import PrefixModules
from .activations import GEGLU, build_activation
from .attentions import Attention, CrossAttention

token_mixers = PrefixModules("token_mixer")
channel_mixers = PrefixModules("channel_mixer")


def build_token_mixer(name: str, **kwargs: Any) -> Any:
    """reference `build_token_mixer` (`mixed_stacks/token_mixers.py`)."""
    return token_mixers.build(name, **kwargs)


def build_channel_mixer(name: str, **kwargs: Any) -> Any:
    """reference `build_channel_mixer` (`mixed_stacks/channel_mixers.py`)."""
    return channel_mixers.build(name, **kwargs)


register_token_mixer = token_mixers.register
register_channel_mixer = channel_mixers.register


# ----------------------------------------------------------------------------
# token mixers
# ----------------------------------------------------------------------------

@token_mixers.register("attention")
class AttentionTokenMixer(nnx.Module):
    def __init__(self, in_dim: int, num_tokens: int, latent_dim: int, *, num_heads: int = 8, dropout: float = 0.0, rngs: nnx.Rngs) -> None:
        self.net = Attention(
            in_dim,
            num_heads,
            embed_dim=latent_dim,
            out_dim=in_dim,
            dropout=dropout,
            is_self_attention=True,
            rngs=rngs,
        )

    def __call__(self, x: jax.Array, **kwargs: Any) -> jax.Array:
        return self.net(x, **kwargs)


@token_mixers.register("fourier")
class FourierTokenMixer(nnx.Module):
    """FNet mixer: real part of 2D FFT."""

    def __init__(self, in_dim: int, num_tokens: int, latent_dim: int, *, rngs: nnx.Rngs, **kwargs: Any) -> None:
        pass

    def __call__(self, x: jax.Array, **kwargs: Any) -> jax.Array:
        return jnp.fft.fft(jnp.fft.fft(x, axis=-1), axis=-2).real.astype(x.dtype)


@token_mixers.register("mlp")
class MLPTokenMixer(nnx.Module):
    def __init__(self, in_dim: int, num_tokens: int, latent_dim: int, *, dropout: float = 0.0, rngs: nnx.Rngs) -> None:
        self.fc1 = nnx.Linear(num_tokens, num_tokens, rngs=rngs)
        self.fc2 = nnx.Linear(num_tokens, num_tokens, rngs=rngs)
        self.dropout = nnx.Dropout(dropout, rngs=rngs) if dropout > 0 else None

    def __call__(self, x: jax.Array, **kwargs: Any) -> jax.Array:
        net = x.swapaxes(-1, -2)
        net = jax.nn.gelu(self.fc1(net))
        if self.dropout is not None:
            net = self.dropout(net)
        net = self.fc2(net)
        return net.swapaxes(-1, -2)


@token_mixers.register("pool")
class PoolTokenMixer(nnx.Module):
    """PoolFormer mixer (pool - identity)."""

    def __init__(self, in_dim: int, num_tokens: int, latent_dim: int, *, pool_size: int = 3, rngs: nnx.Rngs, **kwargs: Any) -> None:
        self.pool_size = pool_size

    def __call__(self, x: jax.Array, **kwargs: Any) -> jax.Array:
        # x: (B, N, D); 1d avg pool with same padding
        k = self.pool_size
        pad = k // 2
        padded = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="edge")
        pooled = jax.lax.reduce_window(
            padded, 0.0, jax.lax.add, (1, k, 1), (1, 1, 1), "VALID"
        ) / float(k)
        return pooled - x


@token_mixers.register("rwkv")
class RWKVTokenMixer(nnx.Module):
    """RWKV-style linear-time token mixing (reference `token_mixers.py` rwkv
    — time-mix with learned decay, computed as a `lax.scan` recurrence)."""

    def __init__(self, in_dim: int, num_tokens: int, latent_dim: int, *, rngs: nnx.Rngs, **kwargs: Any) -> None:
        key = rngs.params()
        self.time_decay = nnx.Param(jax.random.normal(key, (in_dim,)) * 0.1 - 1.0)
        self.time_first = nnx.Param(jax.random.normal(rngs.params(), (in_dim,)) * 0.1)
        self.to_k = nnx.Linear(in_dim, in_dim, use_bias=False, rngs=rngs)
        self.to_v = nnx.Linear(in_dim, in_dim, use_bias=False, rngs=rngs)
        self.to_r = nnx.Linear(in_dim, in_dim, use_bias=False, rngs=rngs)
        self.to_out = nnx.Linear(in_dim, in_dim, use_bias=False, rngs=rngs)

    def __call__(self, x: jax.Array, **kwargs: Any) -> jax.Array:
        k = self.to_k(x)
        v = self.to_v(x)
        r = jax.nn.sigmoid(self.to_r(x))
        w = -jnp.exp(self.time_decay[...])  # negative decay rate
        u = self.time_first[...]

        def step(carry, kv):
            num, den = carry
            kt, vt = kv
            ek = jnp.exp(kt)
            out_num = num + jnp.exp(u + kt) * vt
            out_den = den + jnp.exp(u + kt)
            new_num = jnp.exp(w) * num + ek * vt
            new_den = jnp.exp(w) * den + ek
            return (new_num, new_den), out_num / jnp.maximum(out_den, 1e-8)

        b, t, d = x.shape
        init = (jnp.zeros((b, d)), jnp.zeros((b, d)))
        _, wkv = jax.lax.scan(step, init, (k.swapaxes(0, 1), v.swapaxes(0, 1)))
        return self.to_out(r * wkv.swapaxes(0, 1))


# ----------------------------------------------------------------------------
# channel mixers
# ----------------------------------------------------------------------------

@channel_mixers.register("ff")
class FeedForward(nnx.Module):
    def __init__(self, in_dim: int, latent_dim: int, dropout: float = 0.0, *, activation: str = "gelu", add_last_dropout: bool = True, rngs: nnx.Rngs) -> None:
        if activation == "geglu":
            self.net1: nnx.Module = GEGLU(in_dim=in_dim, out_dim=latent_dim, rngs=rngs)
        else:
            self.linear1 = nnx.Linear(in_dim, latent_dim, rngs=rngs)
            act = build_activation(activation, rngs=rngs)
            self.net1 = _Seq(self.linear1, act)
        self.dropout1 = nnx.Dropout(dropout, rngs=rngs) if dropout > 0 else None
        self.linear2 = nnx.Linear(latent_dim, in_dim, rngs=rngs)
        self.dropout2 = nnx.Dropout(dropout, rngs=rngs) if (dropout > 0 and add_last_dropout) else None

    def __call__(self, x: jax.Array) -> jax.Array:
        net = self.net1(x)
        if self.dropout1 is not None:
            net = self.dropout1(net)
        net = self.linear2(net)
        if self.dropout2 is not None:
            net = self.dropout2(net)
        return net


@channel_mixers.register("mix_ff")
class MixFeedForward(nnx.Module):
    """FF with a depthwise token-local conv in the middle (reference
    `channel_mixers.py` mix_ff)."""

    def __init__(self, in_dim: int, latent_dim: int, dropout: float = 0.0, *, rngs: nnx.Rngs, **kwargs: Any) -> None:
        self.fc1 = nnx.Linear(in_dim, latent_dim, rngs=rngs)
        self.conv = nnx.Conv(latent_dim, latent_dim, kernel_size=(3,), padding="SAME", feature_group_count=latent_dim, rngs=rngs)
        self.fc2 = nnx.Linear(latent_dim, in_dim, rngs=rngs)
        self.dropout = nnx.Dropout(dropout, rngs=rngs) if dropout > 0 else None

    def __call__(self, x: jax.Array) -> jax.Array:
        net = jax.nn.gelu(self.conv(self.fc1(x)))
        if self.dropout is not None:
            net = self.dropout(net)
        return self.fc2(net)


@channel_mixers.register("rwkv")
class RWKVChannelMixer(nnx.Module):
    """RWKV channel mixing (reference `channel_mixers.py` rwkv)."""

    def __init__(self, in_dim: int, latent_dim: int, dropout: float = 0.0, *, rngs: nnx.Rngs, **kwargs: Any) -> None:
        self.to_k = nnx.Linear(in_dim, latent_dim, use_bias=False, rngs=rngs)
        self.to_r = nnx.Linear(in_dim, in_dim, use_bias=False, rngs=rngs)
        self.to_v = nnx.Linear(latent_dim, in_dim, use_bias=False, rngs=rngs)

    def __call__(self, x: jax.Array) -> jax.Array:
        k = jnp.square(jax.nn.relu(self.to_k(x)))
        return jax.nn.sigmoid(self.to_r(x)) * self.to_v(k)


@channel_mixers.register("moe")
class MoEChannelMixer(nnx.Module):
    """Mixture-of-Experts FF channel mixer — new capability beyond the
    reference, and the carrier of expert parallelism (SURVEY §2.10 EP row).

    Switch/GShard-style top-k routing with capacity-bounded DENSE dispatch:
    the token→slot assignment is expressed as one-hot einsums (no scatters —
    everything lands on the MXU), tokens overflowing an expert's capacity
    contribute zero and fall through to the surrounding residual. Expert
    tensors carry a leading `num_experts` axis; `parallel.tp`'s placement
    rules shard that axis over the mesh's `model` axis (EP = leading-axis
    sharding — GSPMD inserts the dispatch/combine all-to-alls over ICI).

    The Switch load-balancing loss `E · Σ_e f_e · P_e` (f = dispatch
    fraction, P = mean router probability; Fedus et al. 2021 eq. 4) is sown
    into an `AuxLossVariable` each forward — `IDLModel.run(training=True)`
    collects it into `forward_results[AUX_LOSS_KEY]` and train steps add
    `aux_loss_weight ×` it to the objective."""

    def __init__(
        self,
        in_dim: int,
        latent_dim: int,
        dropout: float = 0.0,
        *,
        num_experts: int = 4,
        top_k: int = 2,
        capacity_factor: float = 1.5,
        aux_loss_weight: float = 0.01,
        rngs: nnx.Rngs,
    ) -> None:
        if not 1 <= top_k <= num_experts:
            raise ValueError(f"top_k={top_k} must be in [1, num_experts={num_experts}]")
        self.router = nnx.Linear(in_dim, num_experts, use_bias=False, rngs=rngs)
        k1, k2 = jax.random.split(rngs.params(), 2)
        self.experts_w1 = nnx.Param(
            jax.random.normal(k1, (num_experts, in_dim, latent_dim)) / math.sqrt(in_dim)
        )
        self.experts_b1 = nnx.Param(jnp.zeros((num_experts, latent_dim)))
        self.experts_w2 = nnx.Param(
            jax.random.normal(k2, (num_experts, latent_dim, in_dim)) / math.sqrt(latent_dim)
        )
        self.experts_b2 = nnx.Param(jnp.zeros((num_experts, in_dim)))
        self.num_experts = num_experts
        self.top_k = top_k
        self.capacity_factor = capacity_factor
        self.aux_loss_weight = aux_loss_weight
        self.dropout = nnx.Dropout(dropout, rngs=rngs) if dropout > 0 else None
        from ...schema.model import AuxLossVariable

        self.aux_loss = AuxLossVariable(jnp.zeros((), jnp.float32))

    def __call__(self, x: jax.Array) -> jax.Array:
        b, t, c = x.shape
        n = b * t
        xf = x.reshape(n, c)
        e = self.num_experts
        cap = min(n, max(1, int(math.ceil(n * self.capacity_factor * self.top_k / e))))
        probs = jax.nn.softmax(self.router(xf).astype(jnp.float32), axis=-1)

        # Switch load-balancing loss (Fedus et al. 2021 eq. 4): E · Σ f_e P_e
        # over the top-1 assignment — minimized (=1) by a uniform router
        top1 = jax.nn.one_hot(jnp.argmax(probs, axis=-1), e, dtype=jnp.float32)
        lb = e * jnp.sum(jnp.mean(top1, axis=0) * jnp.mean(probs, axis=0))
        self.aux_loss[...] = self.aux_loss_weight * lb

        dispatch = jnp.zeros((n, e, cap), jnp.float32)
        combine = jnp.zeros((n, e, cap), jnp.float32)
        used = jnp.zeros((e,), jnp.int32)  # capacity slots taken so far
        remaining = probs
        gate_total = jnp.zeros((n,), jnp.float32)
        for _ in range(self.top_k):
            idx = jnp.argmax(remaining, axis=-1)  # (N,)
            onehot = jax.nn.one_hot(idx, e, dtype=jnp.int32)
            gate = jnp.sum(remaining * onehot, axis=-1)  # (N,)
            pos = jnp.sum((jnp.cumsum(onehot, axis=0) - 1 + used[None]) * onehot, axis=-1)
            keep = (pos < cap).astype(jnp.float32)
            slot = jax.nn.one_hot(jnp.clip(pos, 0, cap - 1), cap, dtype=jnp.float32)
            assign = onehot.astype(jnp.float32)[:, :, None] * slot[:, None, :] * keep[:, None, None]
            dispatch = dispatch + assign
            combine = combine + gate[:, None, None] * assign
            gate_total = gate_total + gate * keep
            used = used + jnp.sum(onehot * keep[:, None].astype(jnp.int32), axis=0)
            remaining = remaining * (1 - onehot.astype(jnp.float32))
        # normalize the selected gates to sum to 1 (GShard convention)
        combine = combine / jnp.maximum(gate_total, 1e-9)[:, None, None]

        ex_in = jnp.einsum("nec,nd->ecd", dispatch, xf.astype(jnp.float32))
        h = jax.nn.gelu(
            jnp.einsum("ecd,edh->ech", ex_in, self.experts_w1[...]) + self.experts_b1[...][:, None]
        )
        if self.dropout is not None:
            h = self.dropout(h)
        out_e = jnp.einsum("ech,ehd->ecd", h, self.experts_w2[...]) + self.experts_b2[...][:, None]
        y = jnp.einsum("nec,ecd->nd", combine, out_e)
        return y.astype(x.dtype).reshape(b, t, c)


class _Seq(nnx.Module):
    def __init__(self, *mods: nnx.Module) -> None:
        self.mods = nnx.List(list(mods))

    def __call__(self, x: jax.Array) -> jax.Array:
        for m in self.mods:
            x = m(x)
        return x


# ----------------------------------------------------------------------------
# positional encoding + mixing stack
# ----------------------------------------------------------------------------

class PositionalEncoding(nnx.Module):
    """Learnable positional embedding (+cls handling) — reference
    `mixed_stacks/api.py:188`."""

    def __init__(self, dim: int, num_tokens: int, *, num_head_tokens: int = 0, is_trainable: bool = True, dropout: float = 0.0, rngs: nnx.Rngs) -> None:
        key = rngs.params()
        table = jax.random.normal(key, (1, num_tokens + num_head_tokens, dim)) * 0.02
        if is_trainable:
            self.pos_encoding = nnx.Param(table)
        else:
            self.pos_encoding = nnx.Variable(table)
        self.dropout = nnx.Dropout(dropout, rngs=rngs) if dropout > 0 else None

    def __call__(self, x: jax.Array) -> jax.Array:
        table = self.pos_encoding[...]
        x = x + table[:, : x.shape[1]]
        if self.dropout is not None:
            x = self.dropout(x)
        return x


class MixingBlock(nnx.Module):
    """PreNorm(token mixer) + PreNorm(channel mixer), residual
    (reference `mixed_stacks/api.py:41`)."""

    def __init__(
        self,
        in_dim: int,
        num_tokens: int,
        latent_dim: int,
        *,
        token_mixing_type: str,
        token_mixing_config: Optional[dict] = None,
        channel_mixing_type: str = "ff",
        channel_mixing_config: Optional[dict] = None,
        dropout: float = 0.0,
        drop_path: float = 0.0,
        norm_type: str = "layer_norm",
        rngs: nnx.Rngs,
    ) -> None:
        from .norms import NormFactory

        self.token_norm = NormFactory(norm_type).make(in_dim, rngs=rngs)
        self.token_mixer = token_mixers.build(
            token_mixing_type,
            in_dim,
            num_tokens,
            latent_dim,
            rngs=rngs,
            **(token_mixing_config or {}),
        )
        self.channel_norm = NormFactory(norm_type).make(in_dim, rngs=rngs)
        cm_config = dict(channel_mixing_config or {})
        cm_config.setdefault("dropout", dropout)
        self.channel_mixer = channel_mixers.build(
            channel_mixing_type, in_dim, latent_dim, rngs=rngs, **cm_config
        )

    def __call__(self, x: jax.Array, **kwargs: Any) -> jax.Array:
        x = x + self.token_mixer(self.token_norm(x), **kwargs)
        x = x + self.channel_mixer(self.channel_norm(x))
        return x


class MixedStackedEncoder(nnx.Module):
    """Generic token/channel-mixer stack behind ViT / MLP-Mixer / FNet /
    PoolFormer (reference `mixed_stacks/api.py:270`)."""

    def __init__(
        self,
        in_dim: int,
        num_tokens: int,
        *,
        token_mixing_type: str,
        token_mixing_config: Optional[dict] = None,
        channel_mixing_type: str = "ff",
        channel_mixing_config: Optional[dict] = None,
        num_layers: int = 4,
        dropout: float = 0.0,
        norm_type: str = "layer_norm",
        latent_ratio: float = 4.0,
        use_head_token: bool = False,
        use_positional_encoding: bool = False,
        head_pooler: Optional[str] = "mean",
        pipeline_parallel: bool = False,
        pp_microbatches: Optional[int] = None,
        rngs: nnx.Rngs,
    ) -> None:
        latent_dim = int(round(in_dim * latent_ratio))
        self.use_head_token = use_head_token
        if use_head_token:
            key = rngs.params()
            self.head_token = nnx.Param(jax.random.normal(key, (1, 1, in_dim)) * 0.02)
        else:
            self.head_token = None
        self.pos_encoding = (
            PositionalEncoding(
                in_dim,
                num_tokens,
                num_head_tokens=int(use_head_token),
                dropout=dropout,
                rngs=rngs,
            )
            if use_positional_encoding
            else None
        )
        blocks = [
            MixingBlock(
                in_dim,
                num_tokens + int(use_head_token),
                latent_dim,
                token_mixing_type=token_mixing_type,
                token_mixing_config=token_mixing_config,
                channel_mixing_type=channel_mixing_type,
                channel_mixing_config=channel_mixing_config,
                dropout=dropout,
                norm_type=norm_type,
                rngs=rngs,
            )
            for _ in range(num_layers)
        ]
        # opt-in pipeline parallelism (SURVEY §2.10 PP row): with an ambient
        # mesh whose `pipe` axis > 1, the block stack runs as a GPipe
        # microbatch pipeline (`parallel.pp.pipeline_apply`) — stages rotate
        # activations over ICI via ppermute. Use dropout=0 with PP: the
        # stacked functional re-merge replays per-block RNG state.
        # The L block states are stacked ONCE here at init into a single
        # template module whose every param carries a leading `L` axis
        # (`parallel.tp.place_params` shards that axis over `pipe`); an
        # in-call stack of already-placed params would force SPMD
        # "involuntary full rematerialization" on every leaf.
        self.pipeline_parallel = pipeline_parallel
        self.pp_microbatches = pp_microbatches
        if pipeline_parallel:
            from ...parallel.pp import stack_module_states
            from ...schema.model import AuxLossVariable

            _, stacked = stack_module_states(blocks)
            template = blocks[0]
            nnx.update(template, stacked)
            self.pp_block = template
            self.blocks = None
            # sown per-block objectives (MoE load balancing) cannot flow back
            # through the functional re-merge inside the pipeline scan — the
            # pipeline returns them explicitly and they surface through this
            # encoder-level variable instead (the stacked per-block aux vars
            # inside pp_block stay zero)
            self.pp_aux = AuxLossVariable(jnp.zeros((), jnp.float32))
        else:
            self.pp_block = None
            self.blocks = nnx.List(blocks)
        from .norms import NormFactory

        self.head_norm = NormFactory(norm_type).make(in_dim, rngs=rngs)
        self.head_pooler = head_pooler

    def __call__(self, x: jax.Array, *, return_tokens: bool = False, **kwargs: Any) -> jax.Array:
        b = x.shape[0]
        if self.head_token is not None:
            head = jnp.broadcast_to(self.head_token[...], (b, 1, x.shape[-1]))
            x = jnp.concatenate([head, x], axis=1)
        if self.pos_encoding is not None:
            x = self.pos_encoding(x)
        if self.pipeline_parallel:
            from ...parallel.mesh import get_active_pipe_mesh
            from ...parallel.pp import pipeline_apply
            from ...schema.model import AuxLossVariable

            # params were stacked at init — split here just reads the
            # already-stacked leaves (no in-trace concatenate)
            graphdef, stacked = nnx.split(self.pp_block)

            def block_fn(state: Any, h: jax.Array) -> Any:
                block = nnx.merge(graphdef, state)
                h = block(h, **kwargs)
                aux = jnp.zeros((), jnp.float32)
                for leaf in jax.tree_util.tree_leaves(nnx.state(block, AuxLossVariable)):
                    aux = aux + jnp.sum(leaf.astype(jnp.float32))
                return h, aux

            x, aux = pipeline_apply(
                block_fn,
                stacked,
                x,
                mesh=get_active_pipe_mesh(),
                num_microbatches=self.pp_microbatches,
                with_aux=True,
            )
            self.pp_aux[...] = aux
        else:
            for block in self.blocks:
                x = block(x, **kwargs)
        x = self.head_norm(x)
        if return_tokens:
            return x
        if self.head_token is not None:
            return x[:, 0]
        if self.head_pooler == "mean":
            return jnp.mean(x, axis=1)
        return x


# ----------------------------------------------------------------------------
# SD SpatialTransformer
# ----------------------------------------------------------------------------

class StyleReferenceStates:
    """Style-reference ("reference-only") config (reference
    `mixed_stacks/api.py:608-643` StyleReferenceStates). `reference_weight`
    gates how many transformer blocks (widest-first) bank/read reference
    activations; `style_fidelity` mixes plain self-attention back in on the
    CFG uncond rows."""

    def __init__(
        self,
        *,
        style_fidelity: float = 0.5,
        reference_weight: float = 1.0,
    ) -> None:
        self.style_fidelity = float(style_fidelity)
        self.reference_weight = float(reference_weight)


class SpatialTransformerHooks:
    """Hook surface for LoRA / style-reference injection (reference
    `mixed_stacks/api.py:645`). Functional: qkv hooks transform (q, k, v);
    style reference runs as a two-pass trace — a WRITE pass over the noised
    reference latent banks each gated block's pre-attn activations, then the
    real READ pass lets self-attention attend over [self, reference] keys.
    Both passes live inside the same jitted program (the reference's mutable
    bank + double forward, re-expressed trace-functionally)."""

    def __init__(
        self,
        qkv_fn: Optional[Callable] = None,
        *,
        style: Optional[StyleReferenceStates] = None,
        write_gates: Optional[List[bool]] = None,
        uncond_mask: Optional[jax.Array] = None,
        ref_latent: Optional[jax.Array] = None,
        key: Optional[jax.Array] = None,
    ) -> None:
        self.qkv_fn = qkv_fn
        self.style = style
        self.write_gates = write_gates or []
        self.uncond_mask = uncond_mask
        self.ref_latent = ref_latent
        self.key = key
        self.mode: Optional[str] = None
        self.bank: Dict[int, jax.Array] = {}
        self._idx = 0

    def process_qkv(self, module: Any, q: jax.Array, k: jax.Array, v: jax.Array) -> Any:
        if self.qkv_fn is None:
            return q, k, v
        return self.qkv_fn(module, q, k, v)

    # --------------------------------------------------- style-ref plumbing

    def begin(self, mode: Optional[str]) -> None:
        """Start a WRITE ('write') or READ ('read') traversal; block indices
        are assigned by call order, which is identical across the two UNet
        passes of one denoise step."""
        self.mode = mode
        self._idx = 0
        if mode == "write":
            self.bank = {}

    def next_index(self) -> int:
        i = self._idx
        self._idx += 1
        return i

    def gate_of(self, idx: int) -> bool:
        if not self.write_gates:
            return True
        return bool(self.write_gates[idx]) if idx < len(self.write_gates) else False


class BasicTransformerBlock(nnx.Module):
    """self-attn → cross-attn → GEGLU FF, all pre-norm residual."""

    def __init__(
        self,
        query_dim: int,
        num_heads: int,
        head_dim: int,
        *,
        context_dim: Optional[int] = None,
        dropout: float = 0.0,
        rngs: nnx.Rngs,
    ) -> None:
        self.norm1 = nnx.LayerNorm(query_dim, rngs=rngs)
        self.attn1 = CrossAttention(
            query_dim=query_dim, heads=num_heads, dim_head=head_dim, dropout=dropout, rngs=rngs
        )
        self.norm2 = nnx.LayerNorm(query_dim, rngs=rngs)
        self.attn2 = CrossAttention(
            query_dim=query_dim,
            context_dim=context_dim,
            heads=num_heads,
            dim_head=head_dim,
            dropout=dropout,
            rngs=rngs,
        )
        self.norm3 = nnx.LayerNorm(query_dim, rngs=rngs)
        self.ff = FeedForward(query_dim, query_dim * 4, dropout, activation="geglu", rngs=rngs)

    def __call__(
        self,
        x: jax.Array,
        context: Optional[jax.Array] = None,
        *,
        hooks: Optional[SpatialTransformerHooks] = None,
        tome_info: Optional[Any] = None,
    ) -> jax.Array:
        style_mode = getattr(hooks, "mode", None) if hooks is not None else None
        if tome_info is not None:
            # ToMe (tomesd-style): merge tokens for the self-attention, and
            # optionally for the FF (tomesd `merge_mlp`) reusing the SAME
            # bipartite matching
            from .tome import compute_merge

            h, w, ratio, merge_mlp = tome_info
            merge, unmerge, _ = compute_merge(x, h, w, ratio=ratio)
            x = x + unmerge(self.attn1(merge(self.norm1(x)), hooks=hooks))
            x = x + self.attn2(self.norm2(x), context=context, hooks=hooks)
            if merge_mlp:
                x = x + unmerge(self.ff(merge(self.norm3(x))))
            else:
                x = x + self.ff(self.norm3(x))
            return x
        elif style_mode in ("write", "read"):
            # style reference (reference hooks.forward :680-716)
            idx = hooks.next_index()
            xn = self.norm1(x)
            if style_mode == "write":
                if hooks.gate_of(idx):
                    hooks.bank[idx] = xn
                x = x + self.attn1(xn, hooks=hooks)
            else:
                bank = hooks.bank.get(idx)
                if bank is None:
                    x = x + self.attn1(xn, hooks=hooks)
                else:
                    ref_ctx = jnp.concatenate([xn, bank.astype(xn.dtype)], axis=1)
                    refd = self.attn1(xn, context=ref_ctx, hooks=hooks)
                    fidelity = hooks.style.style_fidelity
                    # the mask only applies to CFG-batched (2b) calls; a
                    # guidance-interval segment outside the band runs at
                    # batch b with no uncond rows to mix
                    if (
                        fidelity > 1e-5
                        and hooks.uncond_mask is not None
                        and hooks.uncond_mask.shape[0] == xn.shape[0]
                    ):
                        plain = self.attn1(xn, hooks=hooks)
                        mixed = fidelity * plain + (1.0 - fidelity) * refd
                        refd = jnp.where(hooks.uncond_mask, mixed, refd)
                    x = x + refd
        else:
            x = x + self.attn1(self.norm1(x), hooks=hooks)
        x = x + self.attn2(self.norm2(x), context=context, hooks=hooks)
        x = x + self.ff(self.norm3(x))
        return x


class SpatialTransformer(nnx.Module):
    """The SD UNet attention block: GroupNorm → 1x1 proj-in → N transformer
    blocks → proj-out + skip (reference `mixed_stacks/api.py:766`)."""

    def __init__(
        self,
        in_channels: int,
        num_heads: int,
        head_dim: int,
        *,
        num_layers: int = 1,
        context_dim: Optional[int] = None,
        dropout: float = 0.0,
        use_linear: bool = False,
        rngs: nnx.Rngs,
    ) -> None:
        inner_dim = num_heads * head_dim
        self.norm = nnx.GroupNorm(in_channels, num_groups=32, epsilon=1e-6, rngs=rngs)
        self.use_linear = use_linear
        if use_linear:
            self.proj_in = nnx.Linear(in_channels, inner_dim, rngs=rngs)
            self.proj_out = nnx.Linear(inner_dim, in_channels, rngs=rngs)
        else:
            self.proj_in = nnx.Conv(in_channels, inner_dim, kernel_size=(1, 1), rngs=rngs)
            self.proj_out = nnx.Conv(inner_dim, in_channels, kernel_size=(1, 1), rngs=rngs)
        self.blocks = nnx.List(
            [
                BasicTransformerBlock(
                    inner_dim,
                    num_heads,
                    head_dim,
                    context_dim=context_dim,
                    dropout=dropout,
                    rngs=rngs,
                )
                for _ in range(num_layers)
            ]
        )
        # ToMe ratio (0 = off); set via `set_tome_ratio` / DiffusionAPI
        self.tome_ratio = 0.0
        self.tome_merge_mlp = False

    def set_tome_ratio(self, ratio: float, *, merge_mlp: bool = False) -> None:
        self.tome_ratio = float(ratio)
        self.tome_merge_mlp = bool(merge_mlp)

    def __call__(self, x: jax.Array, context: Optional[jax.Array] = None, *, hooks: Optional[SpatialTransformerHooks] = None) -> jax.Array:
        b, h, w, c = x.shape
        residual = x
        from ...ops.group_norm import gn_call

        net = gn_call(self.norm, x)
        if self.use_linear:
            net = net.reshape(b, h * w, c)
            net = self.proj_in(net)
        else:
            net = self.proj_in(net).reshape(b, h * w, -1)
        tome_info = (
            (h, w, self.tome_ratio, self.tome_merge_mlp) if self.tome_ratio > 0 else None
        )
        for block in self.blocks:
            net = block(net, context=context, hooks=hooks, tome_info=tome_info)
        if self.use_linear:
            net = self.proj_out(net).reshape(b, h, w, c)
        else:
            net = self.proj_out(net.reshape(b, h, w, -1))
        return residual + net


# reference inner-block name (`mixed_stacks/spatial.py` SpatialTransformerBlock)
SpatialTransformerBlock = BasicTransformerBlock

# interface names for custom mixers (reference ITokenMixer/IChannelMixer —
# register concrete mixers with `register_token_mixer`/`register_channel_mixer`)
class ITokenMixer(nnx.Module):
    """Token-mixing interface: `__call__(net, *, deterministic) -> net`."""


class IChannelMixer(nnx.Module):
    """Channel-mixing interface: `__call__(net) -> net`."""


class BertPooler(nnx.Module):
    """CLS-token pooler: first token → linear → tanh (reference
    `mixed_stacks/poolers.py:14`)."""

    def __init__(self, dim: int, *, rngs: nnx.Rngs) -> None:
        self.linear = nnx.Linear(dim, dim, rngs=rngs)

    def __call__(self, net: jax.Array) -> jax.Array:
        return jnp.tanh(self.linear(net[:, 0]))


class SequencePooler(nnx.Module):
    """Learned softmax-weighted sequence pooling with optional aux heads
    (reference `mixed_stacks/poolers.py:27`)."""

    def __init__(
        self,
        dim: int,
        aux_heads: Optional[List[str]] = None,
        bias: bool = True,
        *,
        rngs: nnx.Rngs,
    ) -> None:
        self.out_dim = 1 + (0 if aux_heads is None else len(aux_heads))
        self.projection = nnx.Linear(dim, self.out_dim, use_bias=bias, rngs=rngs)

    def __call__(self, net: jax.Array) -> jax.Array:
        weights = jax.nn.softmax(self.projection(net), axis=1)
        net = jnp.swapaxes(weights, -1, -2) @ net
        if self.out_dim > 1:
            return net
        return net.squeeze(-2)


def walk_spatial_transformer_blocks(m: nnx.Module, fn: Any) -> None:
    """Apply `fn` to every `SpatialTransformerBlock` under `m` (reference
    `mixed_stacks/api.py:905`)."""
    seen = set()
    for _, child in nnx.iter_graph(m):
        if isinstance(child, BasicTransformerBlock) and id(child) not in seen:
            seen.add(id(child))
            fn(child)


def walk_spatial_transformer_hooks(m: nnx.Module, fn: Any = None) -> List[Any]:
    """Collect (and optionally visit) every block's hooks object (reference
    `mixed_stacks/api.py:914`)."""
    all_hooks: List[Any] = []
    walk_spatial_transformer_blocks(
        m, lambda block: all_hooks.append(getattr(block, "hooks", None))
    )
    all_hooks = [h for h in all_hooks if h is not None]
    if fn is not None:
        for hooks in all_hooks:
            fn(hooks, all_hooks)
    return all_hooks
