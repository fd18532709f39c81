"""Activation registry.

Parity: reference `cflearn/modules/core/activations.py` — 11 registered
activations (atanh, geglu, h_swish, mish, quick_gelu, sine, ...) buildable by
name. Implemented as pure jnp functions wrapped in nnx modules where they need
parameters (GEGLU has a projection).
"""

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import nnx

from ..common import PrefixModules

activations = PrefixModules("activation")


def register_activation(name: str, **kwargs: Any) -> Callable[[type], type]:
    return activations.register(name, **kwargs)


def build_activation(name: Optional[str], *, rngs: Optional[nnx.Rngs] = None, **kwargs: Any) -> nnx.Module:
    if name is None:
        name = "identity"
    return activations.build(name, rngs=rngs or nnx.Rngs(0), **kwargs)


class _Fn(nnx.Module):
    fn: Callable[[jax.Array], jax.Array]

    def __init__(self, *, rngs: Optional[nnx.Rngs] = None, **kwargs: Any) -> None:
        pass

    def __call__(self, x: jax.Array) -> jax.Array:
        return self.__class__.fn(x)  # type: ignore[arg-type]


def _simple(name: str, fn: Callable[[jax.Array], jax.Array]) -> type:
    cls = type(name.capitalize(), (_Fn,), {"fn": staticmethod(fn)})
    return activations.register(name)(cls)


_simple("identity", lambda x: x)
_simple("relu", jax.nn.relu)
_simple("relu6", jax.nn.relu6)
_simple("leaky_relu", lambda x: jax.nn.leaky_relu(x, 0.01))
_simple("leaky_relu_0.2", lambda x: jax.nn.leaky_relu(x, 0.2))
_simple("gelu", jax.nn.gelu)
_simple("quick_gelu", lambda x: x * jax.nn.sigmoid(1.702 * x))
_simple("silu", jax.nn.silu)
_simple("swish", jax.nn.silu)
_simple("sigmoid", jax.nn.sigmoid)
_simple("tanh", jnp.tanh)
_simple("softmax", lambda x: jax.nn.softmax(x, axis=-1))
_simple("mish", lambda x: x * jnp.tanh(jax.nn.softplus(x)))
_simple("h_swish", lambda x: x * (jax.nn.relu6(x + 3.0) / 6.0))
_simple("glu", lambda x: jax.nn.glu(x, axis=-1))
_simple("atanh", lambda x: jnp.arctanh(jnp.clip(x, -1.0 + 1e-6, 1.0 - 1e-6)))
_simple("isoftplus", lambda x: jnp.log(jnp.clip(jnp.expm1(x), a_min=1e-12)))


@register_activation("sine")
class Sine(nnx.Module):
    """SIREN activation (reference `modules/implicit/siren.py`)."""

    def __init__(self, *, w: float = 1.0, rngs: Optional[nnx.Rngs] = None) -> None:
        self.w = w

    def __call__(self, x: jax.Array) -> jax.Array:
        return jnp.sin(self.w * x)


@register_activation("geglu")
class GEGLU(nnx.Module):
    """GEGLU with its projection (reference `activations.py` geglu)."""

    def __init__(self, *, in_dim: int, out_dim: int, rngs: Optional[nnx.Rngs] = None) -> None:
        self.net = nnx.Linear(in_dim, out_dim * 2, rngs=rngs or nnx.Rngs(0))

    def __call__(self, x: jax.Array) -> jax.Array:
        x, gate = jnp.split(self.net(x), 2, axis=-1)
        return x * jax.nn.gelu(gate)


@register_activation("diff_relu")
class DiffReLU(nnx.Module):
    def __init__(self, *, rngs: Optional[nnx.Rngs] = None) -> None:
        pass

    def __call__(self, x: jax.Array) -> jax.Array:
        return jax.nn.relu(x) - jax.nn.relu(x - 1.0)
