"""Weight initializers + model summary.

Parity: reference `cflearn/toolkit.py` — `Initializer` (:2239, registry of
xavier/normal/truncated-normal/orthogonal inits applied to modules) and
`summary` (:1623, keras-style parameter table written to `summary.txt`).
"""

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
from flax import nnx


class Initializer:
    """Apply a named init to a module's params (reference `toolkit.py:2239`)."""

    defined_initialization = {"xavier_uniform", "xavier_normal", "normal", "truncated_normal", "orthogonal", "zeros"}
    custom_initializer: Dict[str, Callable] = {}

    def __init__(self, config: Optional[Dict[str, Any]] = None) -> None:
        self.config = config or {}

    @classmethod
    def register(cls, name: str) -> Callable:
        def _core(fn: Callable) -> Callable:
            cls.defined_initialization.add(name)
            cls.custom_initializer[name] = fn
            return fn

        return _core

    def initialize(self, module: nnx.Module, method: str, *, key: Optional[jax.Array] = None) -> None:
        if key is None:
            key = jax.random.PRNGKey(self.config.get("seed", 0))
        custom = self.custom_initializer.get(method)
        params = nnx.state(module, nnx.Param)
        flat, treedef = jax.tree_util.tree_flatten(params)
        keys = jax.random.split(key, len(flat))
        new_flat = []
        for k, leaf in zip(keys, flat):
            if custom is not None:
                new_flat.append(custom(self, k, leaf))
            else:
                new_flat.append(self._apply(method, k, leaf))
        nnx.update(module, jax.tree_util.tree_unflatten(treedef, new_flat))

    def _apply(self, method: str, key: jax.Array, leaf: jax.Array) -> jax.Array:
        if not hasattr(leaf, "shape") or leaf.ndim == 0:
            return leaf
        if method == "zeros":
            return jnp.zeros_like(leaf)
        if leaf.ndim == 1:
            return jnp.zeros_like(leaf)  # biases
        if method == "xavier_uniform":
            return nnx.initializers.xavier_uniform()(key, leaf.shape, leaf.dtype)
        if method == "xavier_normal":
            return nnx.initializers.xavier_normal()(key, leaf.shape, leaf.dtype)
        if method == "normal":
            std = self.config.get("std", 0.02)
            mean = self.config.get("mean", 0.0)
            return mean + std * jax.random.normal(key, leaf.shape, leaf.dtype)
        if method == "truncated_normal":
            std = self.config.get("std", 0.02)
            return std * jax.random.truncated_normal(key, -2.0, 2.0, leaf.shape, leaf.dtype)
        if method == "orthogonal":
            gain = self.config.get("gain", 1.0)
            return nnx.initializers.orthogonal(gain)(key, leaf.shape, leaf.dtype)
        raise ValueError(f"unrecognized init method '{method}'")


def summary(model: Any, *, return_only: bool = False) -> str:
    """Parameter-count table per top-level submodule (reference
    `toolkit.py:1623` — hook-based in torch; introspective here)."""
    from .tree import tree_byte_size, tree_num_params

    lines = [
        "=" * 70,
        f"{'Layer':<40}{'# params':>15}{'size':>14}",
        "-" * 70,
    ]
    modules = model.all_modules if hasattr(model, "all_modules") else [model]
    total_params = 0
    total_bytes = 0
    for mod in modules:
        for name, sub in vars(mod).items():
            if isinstance(sub, nnx.Module):
                try:
                    p = tree_num_params(nnx.state(sub, nnx.Param))
                    b = tree_byte_size(nnx.state(sub, nnx.Param))
                except Exception:  # noqa: BLE001
                    continue
                if p:
                    lines.append(f"{name:<40}{p:>15,}{b/1e6:>12.2f}MB")
        p_all = tree_num_params(nnx.state(mod, nnx.Param))
        b_all = tree_byte_size(nnx.state(mod, nnx.Param))
        total_params += p_all
        total_bytes += b_all
    lines += [
        "-" * 70,
        f"{'TOTAL':<40}{total_params:>15,}{total_bytes/1e6:>12.2f}MB",
        "=" * 70,
    ]
    out = "\n".join(lines)
    if not return_only:
        print(out)
    return out
