"""Remaining tabular nets.

Parity: reference `cflearn/modules/ml/` — `WideAndDeep` (`wnd.py:11`), `RNN`
(`rnn.py:21`), `MixedStackedModule` family FNet/Mixer/Transformer/PoolFormer
(`mixed_stacked.py:63-154`), `NBM` (`nbm.py:124`), `NDT` (`ndt.py:41` —
neural decision tree optionally initialized from a fitted sklearn tree),
`DNDF`-backed heads.
"""

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ..common import register_module
from ..core.customs import DNDF
from ..core.mixed_stacks import MixedStackedEncoder
from .fcnn import FCNN


@register_module("wnd")
class WideAndDeep(nnx.Module):
    """wide (linear) + deep (fcnn) split (reference `ml/wnd.py:11`).

    `wide_dim` selects how many leading features go to the wide part; by
    default the full input feeds both towers.
    """

    def __init__(
        self,
        input_dim: int,
        output_dim: int,
        hidden_units: Optional[List[int]] = None,
        *,
        wide_dim: Optional[int] = None,
        rngs: nnx.Rngs,
        **fcnn_kwargs: Any,
    ) -> None:
        self.wide_dim = wide_dim or input_dim
        self.wide = nnx.Linear(self.wide_dim, output_dim, rngs=rngs)
        self.deep = FCNN(input_dim, output_dim, hidden_units, rngs=rngs, **fcnn_kwargs)

    def __call__(self, x: jax.Array) -> jax.Array:
        wide_in = x[..., : self.wide_dim]
        return self.wide(wide_in) + self.deep(x)


@register_module("rnn")
class RNN(nnx.Module):
    """GRU/LSTM stack over (B, T, d) inputs (reference `ml/rnn.py:21`).

    TPU-native: the recurrence runs as an `nnx.RNN` (lax.scan under jit)."""

    def __init__(
        self,
        input_dim: int,
        output_dim: int,
        *,
        cell_type: str = "gru",
        hidden_dim: int = 256,
        num_layers: int = 1,
        bidirectional: bool = False,
        rngs: nnx.Rngs,
    ) -> None:
        def make_cell(in_dim: int) -> Any:
            if cell_type.lower() == "lstm":
                return nnx.OptimizedLSTMCell(in_dim, hidden_dim, rngs=rngs)
            return nnx.GRUCell(in_dim, hidden_dim, rngs=rngs)

        self.bidirectional = bidirectional
        cells = []
        bwd_cells = []
        in_dim = input_dim
        for _ in range(num_layers):
            cells.append(nnx.RNN(make_cell(in_dim)))
            if bidirectional:
                bwd_cells.append(nnx.RNN(make_cell(in_dim)))
            in_dim = hidden_dim * (2 if bidirectional else 1)
        self.layers = nnx.List(cells)
        self.bwd_layers = nnx.List(bwd_cells) if bidirectional else nnx.data(None)
        self.head = nnx.Linear(in_dim, output_dim, rngs=rngs)

    def __call__(self, x: jax.Array) -> jax.Array:
        if x.ndim == 2:
            x = x[:, None, :]
        if not self.bidirectional:
            for layer in self.layers:
                x = layer(x)
            return self.head(x[:, -1])
        # reference `ml/rnn.py:29,67`: forward + reversed passes, features
        # concatenated (head input dim doubles)
        for fwd, bwd in zip(self.layers, self.bwd_layers):
            f = fwd(x)
            b = bwd(x[:, ::-1])[:, ::-1]
            x = jnp.concatenate([f, b], axis=-1)
        return self.head(x[:, -1])


class MixedStackedModule(nnx.Module):
    """Tabular mixed-stack: embed features as tokens then run the mixer
    stack (reference `ml/mixed_stacked.py:20-62`)."""

    def __init__(
        self,
        input_dim: int,
        output_dim: int,
        *,
        token_mixing_type: str,
        num_layers: int = 4,
        latent_dim: int = 32,
        dropout: float = 0.0,
        norm_type: str = "layer_norm",
        use_head_token: bool = True,
        token_mixing_config: Optional[Dict[str, Any]] = None,
        channel_mixing_type: str = "ff",
        channel_mixing_config: Optional[Dict[str, Any]] = None,
        pipeline_parallel: bool = False,
        pp_microbatches: Optional[int] = None,
        rngs: nnx.Rngs,
    ) -> None:
        self.to_token = nnx.Linear(1, latent_dim, rngs=rngs)
        self.encoder = MixedStackedEncoder(
            latent_dim,
            input_dim,
            token_mixing_type=token_mixing_type,
            token_mixing_config=token_mixing_config,
            channel_mixing_type=channel_mixing_type,
            channel_mixing_config=channel_mixing_config,
            num_layers=num_layers,
            dropout=dropout,
            norm_type=norm_type,
            use_head_token=use_head_token,
            pipeline_parallel=pipeline_parallel,
            pp_microbatches=pp_microbatches,
            rngs=rngs,
        )
        self.head = nnx.Linear(latent_dim, output_dim, rngs=rngs)

    def __call__(self, x: jax.Array) -> jax.Array:
        if x.ndim == 2:
            tokens = self.to_token(x[..., None])  # (B, d, latent)
        else:
            tokens = self.to_token(x.reshape(x.shape[0], -1)[..., None])
        return self.head(self.encoder(tokens))


@register_module("fnet")
class FNet(MixedStackedModule):
    def __init__(self, input_dim: int, output_dim: int, *, rngs: nnx.Rngs, **kwargs: Any) -> None:
        kwargs.setdefault("token_mixing_type", "fourier")
        super().__init__(input_dim, output_dim, rngs=rngs, **kwargs)


@register_module("mixer")
class Mixer(MixedStackedModule):
    def __init__(self, input_dim: int, output_dim: int, *, rngs: nnx.Rngs, **kwargs: Any) -> None:
        kwargs.setdefault("token_mixing_type", "mlp")
        kwargs.setdefault("use_head_token", False)
        super().__init__(input_dim, output_dim, rngs=rngs, **kwargs)


@register_module("transformer")
class TabTransformer(MixedStackedModule):
    def __init__(self, input_dim: int, output_dim: int, *, rngs: nnx.Rngs, **kwargs: Any) -> None:
        kwargs.setdefault("token_mixing_type", "attention")
        super().__init__(input_dim, output_dim, rngs=rngs, **kwargs)


@register_module("pool_former")
class PoolFormer(MixedStackedModule):
    def __init__(self, input_dim: int, output_dim: int, *, rngs: nnx.Rngs, **kwargs: Any) -> None:
        kwargs.setdefault("token_mixing_type", "pool")
        kwargs.setdefault("use_head_token", False)
        super().__init__(input_dim, output_dim, rngs=rngs, **kwargs)


@register_module("dndf")
class DNDFModule(nnx.Module):
    def __init__(self, input_dim: int, output_dim: int, *, rngs: nnx.Rngs, **kwargs: Any) -> None:
        self.dndf = DNDF(input_dim, output_dim, rngs=rngs, **kwargs)

    def __call__(self, x: jax.Array) -> jax.Array:
        return self.dndf(x)


@register_module("nbm")
class NBM(nnx.Module):
    """Neural Basis Model (reference `ml/nbm.py:124`): shared basis MLP over
    single features (+optional pairs), per-feature linear combination."""

    def __init__(
        self,
        input_dim: int,
        output_dim: int,
        *,
        num_bases: int = 64,
        hidden_units: Optional[List[int]] = None,
        use_pairwise: bool = False,
        dropout: float = 0.0,
        rngs: nnx.Rngs,
    ) -> None:
        hidden_units = hidden_units or [64, 64]
        self.use_pairwise = use_pairwise
        self.input_dim = input_dim
        pairs = []
        if use_pairwise:
            for i in range(input_dim):
                for j in range(i + 1, input_dim):
                    pairs.append((i, j))
        self.pairs = pairs
        in_feat = 2 if use_pairwise else 1
        self.basis = FCNN(
            2 if use_pairwise else 1,
            num_bases,
            hidden_units,
            norm_type=None,
            dropout=dropout,
            rngs=rngs,
        )
        self.single_basis = FCNN(1, num_bases, hidden_units, norm_type=None, dropout=dropout, rngs=rngs)
        num_units = input_dim + len(pairs)
        key = rngs.params()
        self.weights = nnx.Param(jax.random.normal(key, (num_units, num_bases, output_dim)) * 0.02)
        self.bias = nnx.Param(jnp.zeros((output_dim,)))

    def __call__(self, x: jax.Array) -> jax.Array:
        b, d = x.shape
        single = self.single_basis(x.reshape(b * d, 1)).reshape(b, d, -1)
        feats = [single]
        if self.pairs:
            idx = jnp.asarray(self.pairs)
            pair_in = x[:, idx].reshape(b * len(self.pairs), 2)
            pair_feats = self.basis(pair_in).reshape(b, len(self.pairs), -1)
            feats.append(pair_feats)
        all_feats = jnp.concatenate(feats, axis=1)  # (B, U, num_bases)
        out = jnp.einsum("bun,uno->bo", all_feats, self.weights[...])
        return out + self.bias[...]


@register_module("ndt")
class NDT(nnx.Module):
    """Neural Decision Tree (reference `ml/ndt.py:41`): two-layer net shaped
    like a soft decision tree; can be initialized from a fitted sklearn tree
    via `from_sklearn_tree`."""

    def __init__(
        self,
        input_dim: int,
        output_dim: int,
        *,
        num_internals: Optional[int] = None,
        num_leaves: Optional[int] = None,
        rngs: nnx.Rngs,
    ) -> None:
        num_internals = num_internals or max(4, 2 * input_dim)
        num_leaves = num_leaves or num_internals + 1
        self.to_planes = nnx.Linear(input_dim, num_internals, rngs=rngs)
        self.to_routes = nnx.Linear(num_internals, num_leaves, rngs=rngs)
        self.to_leaves = nnx.Linear(num_leaves, output_dim, rngs=rngs)

    def __call__(self, x: jax.Array) -> jax.Array:
        planes = jnp.tanh(self.to_planes(x))
        routes = jax.nn.softmax(self.to_routes(planes), axis=-1)
        return self.to_leaves(routes)

    @classmethod
    def from_sklearn_tree(cls, tree: Any, input_dim: int, output_dim: int, *, rngs: nnx.Rngs, scale: float = 10.0) -> "NDT":
        """Initialize plane/route/leaf weights from a fitted
        sklearn.tree.DecisionTreeClassifier (reference `ndt.py:41-120`)."""
        t = tree.tree_
        internals = [i for i in range(t.node_count) if t.children_left[i] != -1]
        leaves = [i for i in range(t.node_count) if t.children_left[i] == -1]
        ndt = cls(input_dim, output_dim, num_internals=max(1, len(internals)), num_leaves=max(1, len(leaves)), rngs=rngs)
        if not internals:
            return ndt
        internal_idx = {n: i for i, n in enumerate(internals)}
        leaf_idx = {n: i for i, n in enumerate(leaves)}
        w = np.zeros((input_dim, len(internals)), dtype=np.float32)
        b = np.zeros((len(internals),), dtype=np.float32)
        for n, i in internal_idx.items():
            w[t.feature[n], i] = scale
            b[i] = -scale * t.threshold[n]
        route_w = np.zeros((len(internals), len(leaves)), dtype=np.float32)
        route_b = np.zeros((len(leaves),), dtype=np.float32)

        def walk(node: int, path: List[Any]) -> None:
            if t.children_left[node] == -1:
                li = leaf_idx[node]
                # reference `ndt.py:75-78`: weights sign/len(path), NO bias —
                # a depth-proportional bias let deep partially-matched leaves
                # outscore shallow fully-matched ones
                for (i, sgn) in path:
                    route_w[i, li] = sgn * scale / max(len(path), 1)
                return
            i = internal_idx[node]
            walk(t.children_left[node], path + [(i, -1.0)])
            walk(t.children_right[node], path + [(i, 1.0)])

        walk(0, [])
        leaf_w = np.zeros((len(leaves), output_dim), dtype=np.float32)
        for n, li in leaf_idx.items():
            value = t.value[n].ravel()
            if len(value) == output_dim:
                leaf_w[li] = value / max(value.sum(), 1e-8)
        ndt.to_planes.kernel[...] = jnp.asarray(w)
        ndt.to_planes.bias[...] = jnp.asarray(b)
        ndt.to_routes.kernel[...] = jnp.asarray(route_w)
        ndt.to_routes.bias[...] = jnp.asarray(route_b)
        ndt.to_leaves.kernel[...] = jnp.asarray(leaf_w)
        return ndt


# reference class name for the tabular transformer (`ml/mixed_stacked.py:119`)
Transformer = TabTransformer
