"""API wrappers + pools.

Parity: reference `cflearn/api/common.py` — `IAPI` (:24, device/precision
management with lazy load/unload for pooling), `Weights` (:121) and `APIPool`
(:137, LRU-ish pools bounded by `OPT.sd_weights_pool_limit` for VRAM/HBM
management).
"""

import collections
from typing import Any, Callable, Dict, Generic, Optional, TypeVar

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ..parameters import OPT
from ..toolkit.tree import tree_cast

T = TypeVar("T")


class IAPI:
    """Inference-model wrapper with dtype/device management."""

    def __init__(
        self,
        module: nnx.Module,
        *,
        use_bf16: bool = False,
        lazy: bool = False,
    ) -> None:
        self.m = module
        self.use_bf16 = use_bf16
        self.lazy = lazy
        self._offloaded: Optional[Dict[str, np.ndarray]] = None
        if use_bf16:
            self.to_bf16()

    @property
    def dtype(self) -> Any:
        return jnp.bfloat16 if self.use_bf16 else jnp.float32

    def to_bf16(self) -> None:
        params = nnx.state(self.m, nnx.Param)
        nnx.update(self.m, tree_cast(params, jnp.bfloat16))
        self.use_bf16 = True

    def to_f32(self) -> None:
        params = nnx.state(self.m, nnx.Param)
        nnx.update(self.m, tree_cast(params, jnp.float32))
        self.use_bf16 = False

    # host offloading (the TPU analogue of the reference's CPU↔GPU moves)

    def offload(self) -> None:
        from ..toolkit.tree import tree_to_npd

        self._offloaded = tree_to_npd(nnx.state(self.m))
        # free device buffers
        state = nnx.state(self.m)
        for leaf in jax.tree_util.tree_leaves(state):
            if isinstance(leaf, jax.Array):
                leaf.delete()

    def restore(self) -> None:
        if self._offloaded is None:
            return
        from ..toolkit.tree import npd_to_tree

        state = nnx.state(self.m)
        nnx.update(self.m, npd_to_tree(self._offloaded, state, strict=False))
        self._offloaded = None


class Weights:
    """Named state-dict pool with a size bound (reference `api/common.py:121`)."""

    def __init__(self, limit: int = -1) -> None:
        self.limit = limit
        self._pool: "collections.OrderedDict[str, Dict[str, np.ndarray]]" = collections.OrderedDict()

    def __contains__(self, key: str) -> bool:
        return key in self._pool

    def register(self, key: str, states: Dict[str, np.ndarray]) -> None:
        # re-registering REPLACES the stored states (silently keeping a
        # stale copy would ignore a user's refreshed checkpoint)
        self._pool[key] = states
        self._pool.move_to_end(key)
        if 0 < self.limit < len(self._pool):
            self._pool.popitem(last=False)

    def get(self, key: str) -> Optional[Dict[str, np.ndarray]]:
        states = self._pool.get(key)
        if states is not None:
            self._pool.move_to_end(key)
        return states

    def keys(self) -> Any:
        return self._pool.keys()


class APIPool(Generic[T]):
    """Pool of lazily-built APIs (reference `api/common.py:137`)."""

    def __init__(self, limit: Optional[int] = None) -> None:
        if limit is None:
            limit = OPT.sd_weights_pool_limit
        self.limit = limit
        self._pool: "collections.OrderedDict[str, T]" = collections.OrderedDict()

    def __contains__(self, key: str) -> bool:
        return key in self._pool

    def get(self, key: str, init_fn: Optional[Callable[[], T]] = None) -> Optional[T]:
        api = self._pool.get(key)
        if api is None and init_fn is not None:
            api = init_fn()
            self.register(key, api)
        elif api is not None:
            self._pool.move_to_end(key)
        return api

    def register(self, key: str, api: T) -> None:
        self._pool[key] = api
        if 0 < self.limit < len(self._pool):
            old_key, old = self._pool.popitem(last=False)
            if isinstance(old, IAPI):
                old.offload()
