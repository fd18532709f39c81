"""Module registry machinery + common primitives.

Parity: reference `cflearn/modules/common.py` — flat `module_dict` +
`register_module`/`build_module` (:30-53), namespaced `PrefixModules`
(:56-83), `Lambda` (:89), `EMA` (:102), `Residual` (:168), `zero_module`
(:177), `avg_pool_nd` (:183).

TPU-native: modules are `flax.nnx.Module`s; construction threads an
`nnx.Rngs`. `EMA` keeps shadow parameters as nnx variables updated
functionally inside the jitted step (no train/eval buffer swap mutation).
"""

from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
from flax import nnx

from ..toolkit.registry import Registry

module_registry: Registry[nnx.Module] = Registry("modules")


def register_module(name: str, *, allow_duplicate: bool = False) -> Callable[[type], type]:
    return module_registry.register(name, allow_duplicate=allow_duplicate)


def build_module(
    name: str,
    *,
    config: Optional[Dict[str, Any]] = None,
    rngs: Optional[nnx.Rngs] = None,
    **kwargs: Any,
) -> nnx.Module:
    kw = dict(config or {})
    kw.update(kwargs)
    if rngs is None:
        rngs = nnx.Rngs(0)
    return module_registry.build(name, rngs=rngs, **kw)


class PrefixModules:
    """Namespaced registry view (reference `modules/common.py:56-83`)."""

    def __init__(self, prefix: str) -> None:
        self._prefix = prefix

    @property
    def all(self) -> List[str]:
        prefix = f"{self._prefix}."
        return [k[len(prefix):] for k in module_registry.keys() if k.startswith(prefix)]

    def has(self, name: str) -> bool:
        return f"{self._prefix}.{name}" in module_registry

    def register(self, name: str, **kwargs: Any) -> Callable[[type], type]:
        return register_module(f"{self._prefix}.{name}", **kwargs)

    def build(self, name: str, *args: Any, **kwargs: Any) -> nnx.Module:
        rngs = kwargs.pop("rngs", None) or nnx.Rngs(0)
        cls = module_registry.get(f"{self._prefix}.{name}")
        if cls is None:
            raise ValueError(
                f"'{name}' is not registered under prefix '{self._prefix}' (available: {self.all})"
            )
        return cls(*args, rngs=rngs, **kwargs)

    def get(self, name: str) -> Optional[type]:
        return module_registry.get(f"{self._prefix}.{name}")


# ----------------------------------------------------------------------------
# common primitives
# ----------------------------------------------------------------------------

class Lambda(nnx.Module):
    """Wrap a pure function as a module (reference `modules/common.py:89`)."""

    def __init__(self, fn: Callable, name: str = "lambda") -> None:
        self.fn = fn
        self.fn_name = name

    def __call__(self, *args: Any, **kwargs: Any) -> Any:
        return self.fn(*args, **kwargs)


class Residual(nnx.Module):
    """y = x + f(x) (reference `modules/common.py:168`)."""

    def __init__(self, module: nnx.Module) -> None:
        self.module = module

    def __call__(self, x: jax.Array, **kwargs: Any) -> jax.Array:
        return x + self.module(x, **kwargs)  # type: ignore[operator]


def zero_module(module: nnx.Module) -> nnx.Module:
    """Zero all params of a module (reference `modules/common.py:177`) —
    used by ControlNet zero-convs and diffusion output layers."""
    state = nnx.state(module, nnx.Param)
    zeroed = jax.tree_util.tree_map(jnp.zeros_like, state)
    nnx.update(module, zeroed)
    return module


def avg_pool_nd(dims: int, x: jax.Array, *, kernel: int, stride: Optional[int] = None) -> jax.Array:
    """N-d average pooling over channel-last arrays (reference `modules/common.py:183`)."""
    stride = stride or kernel
    window = (1,) + (kernel,) * dims + (1,)
    strides = (1,) + (stride,) * dims + (1,)
    summed = jax.lax.reduce_window(x, 0.0, jax.lax.add, window, strides, "VALID")
    return summed / float(kernel**dims)


class EMA(nnx.Module):
    """Exponential moving average of a module's params (reference
    `modules/common.py:102`). Shadow params live as `nnx.Variable`s;
    `update()` is functional and traceable inside the jitted train step;
    `swap()` copies shadow → live for EMA evaluation."""

    def __init__(self, decay: float, module: nnx.Module) -> None:
        self.decay = decay
        self.num_updates = nnx.Variable(jnp.zeros((), dtype=jnp.int32))
        params = nnx.state(module, nnx.Param)
        # shadow is a plain array pytree (stable structure across jit/save
        # round-trips); update() re-assigns the whole data attribute.
        # jnp.array COPIES — sharing buffers with the params would make the
        # trainer donate the same buffer twice.
        self.shadow = nnx.data(jax.tree_util.tree_map(lambda p: jnp.array(p), params))

    def update(self, module: nnx.Module) -> None:
        params = nnx.state(module, nnx.Param)
        self.num_updates[...] = self.num_updates[...] + 1
        n = self.num_updates[...].astype(jnp.float32)
        decay = jnp.minimum(self.decay, (1.0 + n) / (10.0 + n))
        self.shadow = nnx.data(
            jax.tree_util.tree_map(
                lambda s, p: decay * s + (1.0 - decay) * jnp.asarray(p), self.shadow, params
            )
        )

    def copy_to(self, module: nnx.Module) -> None:
        nnx.update(module, self.shadow)

    def store(self, module: nnx.Module) -> Any:
        return jax.tree_util.tree_map(jnp.array, nnx.state(module, nnx.Param))

    def restore(self, module: nnx.Module, stored: Any) -> None:
        nnx.update(module, stored)


# reference registry-dict name (`modules/__init__.py` module_dict)
module_dict = module_registry
