"""Custom blocks: Linear (init control), DNDF, Pruner, DropPath.

Parity: reference `cflearn/modules/core/customs.py` — `Linear` (:23), DNDF
(differentiable neural decision forest, :117-316 — the reference uses custom
autograd Functions `LeafAggregation`/`Route` as a CUDA-memory optimization;
on TPU the straightforward jnp expression fuses under XLA so no custom VJP is
needed), `Pruner` (:317), `DropPath` (:429).
"""

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import nnx


class Linear(nnx.Module):
    """Linear with optional init scale & pruner (reference `customs.py:23`)."""

    def __init__(
        self,
        in_dim: int,
        out_dim: int,
        *,
        bias: bool = True,
        pruner_config: Optional[dict] = None,
        init_method: Optional[str] = None,
        rngs: nnx.Rngs,
    ) -> None:
        self.linear = nnx.Linear(in_dim, out_dim, use_bias=bias, rngs=rngs)
        self.pruner = Pruner(pruner_config, rngs=rngs) if pruner_config is not None else None

    def __call__(self, x: jax.Array) -> jax.Array:
        if self.pruner is not None:
            w = self.pruner(self.linear.kernel[...])
            out = x @ w
            if self.linear.bias is not None:
                out = out + self.linear.bias[...]
            return out
        return self.linear(x)


class Pruner(nnx.Module):
    """Soft weight pruning (reference `customs.py:317`)."""

    def __init__(self, config: Optional[dict] = None, *, rngs: Optional[nnx.Rngs] = None) -> None:
        config = config or {}
        self.eps = config.get("eps", 1e-12)
        self.beta = config.get("beta", 1.0)
        self.gamma = config.get("gamma", 1.0)
        self.alpha = nnx.Param(jnp.asarray(config.get("alpha", 1e-4), jnp.float32))

    def __call__(self, w: jax.Array) -> jax.Array:
        abs_w = jnp.abs(w)
        mean = jnp.mean(abs_w)
        gate = jax.nn.sigmoid(self.beta * (abs_w / (mean + self.eps) - self.gamma * jax.nn.softplus(self.alpha[...])))
        return w * gate


class DNDF(nnx.Module):
    """Differentiable Neural Decision Forest (reference `customs.py:117-316`).

    num_tree trees of given depth; input logits route through internal nodes
    (sigmoid gates), leaves aggregate class probabilities.
    """

    def __init__(
        self,
        in_dim: int,
        out_dim: Optional[int] = None,
        *,
        num_tree: int = 10,
        tree_depth: int = 4,
        is_regression: Optional[bool] = None,
        output_probabilities: bool = True,
        rngs: nnx.Rngs,
    ) -> None:
        self.num_tree = num_tree
        self.tree_depth = tree_depth
        self.num_internals = 2**tree_depth - 1
        self.num_leaves = 2**tree_depth
        self.out_dim = out_dim
        self.output_probabilities = output_probabilities
        self.is_regression = is_regression if is_regression is not None else (out_dim == 1)
        self.to_planes = nnx.Linear(in_dim, num_tree * self.num_internals, rngs=rngs)
        key = rngs.params()
        if out_dim is not None:
            self.leaves = nnx.Param(
                jax.random.uniform(key, (num_tree, self.num_leaves, out_dim))
            )
        else:
            self.leaves = None
        # static routing masks: for each leaf, which internals are on its path
        # and which direction was taken
        import numpy as np

        path = np.zeros((self.num_leaves, self.num_internals), dtype=np.float32)
        sign = np.zeros((self.num_leaves, self.num_internals), dtype=np.float32)
        for leaf in range(self.num_leaves):
            node = 0
            for depth in range(tree_depth):
                bit = (leaf >> (tree_depth - 1 - depth)) & 1
                path[leaf, node] = 1.0
                sign[leaf, node] = float(bit)
                node = 2 * node + 1 + bit
        self._path = nnx.Variable(jnp.asarray(path))
        self._sign = nnx.Variable(jnp.asarray(sign))

    def __call__(self, x: jax.Array) -> jax.Array:
        b = x.shape[0]
        planes = jax.nn.sigmoid(self.to_planes(x)).reshape(b, self.num_tree, self.num_internals)
        # probability of going right at each internal; leaf prob = prod over path
        sign = self._sign[...]  # (L, I)
        path = self._path[...]
        # p(leaf) = prod_i [ sign? p : (1-p) ]^path
        log_p = jnp.log(jnp.clip(planes, 1e-8, 1.0))
        log_not = jnp.log(jnp.clip(1.0 - planes, 1e-8, 1.0))
        # (B, T, L)
        leaf_log = jnp.einsum("bti,li->btl", log_p, path * sign) + jnp.einsum(
            "bti,li->btl", log_not, path * (1.0 - sign)
        )
        routes = jnp.exp(leaf_log)
        if self.leaves is None:
            return routes.reshape(b, -1)
        leaves = self.leaves[...]
        if not self.is_regression and self.output_probabilities:
            leaves = jax.nn.softmax(leaves, axis=-1)
        out = jnp.einsum("btl,tlo->bo", routes, leaves) / self.num_tree
        return out


class DropPath(nnx.Module):
    """Stochastic depth (reference `customs.py:429`)."""

    def __init__(self, rate: float = 0.0, *, rngs: nnx.Rngs) -> None:
        self.rate = rate
        self.rngs = rngs
        self.deterministic = True

    def train(self, **kwargs: Any) -> None:  # type: ignore[override]
        self.deterministic = False

    def eval(self, **kwargs: Any) -> None:  # type: ignore[override]
        self.deterministic = True

    def __call__(self, x: jax.Array) -> jax.Array:
        if self.deterministic or self.rate <= 0.0:
            return x
        keep = 1.0 - self.rate
        key = self.rngs.dropout()
        mask_shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(key, keep, mask_shape)
        return jnp.where(mask, x / keep, 0.0)


def leaf_aggregation(net: jax.Array, leaves: jax.Array) -> jax.Array:
    """`net @ softmax(leaves, axis=1)` (reference `customs.py:117`
    LeafAggregation — a torch custom-autograd memory optimization; JAX AD
    differentiates the expression natively)."""
    return net @ jax.nn.softmax(leaves, axis=1)


def route(planes: jax.Array, path_mask: jax.Array, sign_mask: jax.Array) -> jax.Array:
    """Per-leaf routing probabilities from internal-node plane logits
    (reference `customs.py:138` Route). `planes`: (B, T, I) logits;
    `path_mask`/`sign_mask`: (L, I) static tree-path masks. Returns
    (B, T, L)."""
    p_left = jax.nn.sigmoid(planes)[:, :, None, :]  # (B, T, 1, I)
    p = jnp.where(sign_mask[None, None] > 0.5, 1.0 - p_left, p_left)
    log_p = jnp.where(path_mask[None, None] > 0.5, jnp.log(jnp.clip(p, 1e-12)), 0.0)
    return jnp.exp(jnp.sum(log_p, axis=-1))


# reference custom-autograd names
LeafAggregation = leaf_aggregation
Route = route
