"""Mapping blocks (Linear → norm → activation → dropout stacks).

Parity: reference `cflearn/modules/core/mappings.py` — `mapping` prefix
registry with `basic`/`highway`/`res` blocks, used by FCNN & friends.
"""

from typing import Any, Optional

import jax
from flax import nnx

from ..common import PrefixModules
from .activations import build_activation

mappings = PrefixModules("mapping")


@mappings.register("basic")
class MappingBlock(nnx.Module):
    def __init__(
        self,
        in_dim: int,
        out_dim: int,
        *,
        bias: bool = True,
        norm_type: Optional[str] = "batch_norm",
        activation: Optional[str] = "relu",
        dropout: float = 0.0,
        rngs: nnx.Rngs,
    ) -> None:
        from .norms import NormFactory

        self.linear = nnx.Linear(in_dim, out_dim, use_bias=bias, rngs=rngs)
        self.norm = NormFactory(norm_type).make(out_dim, rngs=rngs)
        self.activation = build_activation(activation, rngs=rngs)
        self.dropout = nnx.Dropout(dropout, rngs=rngs) if dropout > 0.0 else None

    def __call__(self, x: jax.Array) -> jax.Array:
        x = self.linear(x)
        x = self.norm(x)
        x = self.activation(x)
        if self.dropout is not None:
            x = self.dropout(x)
        return x


@mappings.register("highway")
class HighwayBlock(nnx.Module):
    def __init__(
        self,
        in_dim: int,
        out_dim: int,
        *,
        bias: bool = True,
        norm_type: Optional[str] = "batch_norm",
        activation: Optional[str] = "relu",
        dropout: float = 0.0,
        rngs: nnx.Rngs,
    ) -> None:
        self.linear_mapping = MappingBlock(
            in_dim, out_dim, bias=bias, norm_type=norm_type, activation=None, dropout=0.0, rngs=rngs
        )
        self.nonlinear_mapping = MappingBlock(
            in_dim, out_dim, bias=bias, norm_type=norm_type, activation=activation, dropout=dropout, rngs=rngs
        )
        self.gate_linear = nnx.Linear(in_dim, out_dim, use_bias=True, rngs=rngs)

    def __call__(self, x: jax.Array) -> jax.Array:
        linear = self.linear_mapping(x)
        nonlinear = self.nonlinear_mapping(x)
        gate = jax.nn.sigmoid(self.gate_linear(x))
        return gate * nonlinear + (1.0 - gate) * linear


@mappings.register("res")
class ResBlock(nnx.Module):
    def __init__(
        self,
        in_dim: int,
        out_dim: int,
        *,
        bias: bool = True,
        norm_type: Optional[str] = "batch_norm",
        activation: Optional[str] = "relu",
        dropout: float = 0.0,
        rngs: nnx.Rngs,
    ) -> None:
        self.to_out = None
        if in_dim != out_dim:
            self.to_out = nnx.Linear(in_dim, out_dim, use_bias=bias, rngs=rngs)
        self.block1 = MappingBlock(
            out_dim, out_dim, bias=bias, norm_type=norm_type, activation=activation, dropout=dropout, rngs=rngs
        )
        self.block2 = MappingBlock(
            out_dim, out_dim, bias=bias, norm_type=norm_type, activation=None, dropout=0.0, rngs=rngs
        )
        self.activation = build_activation(activation, rngs=rngs)

    def __call__(self, x: jax.Array) -> jax.Array:
        if self.to_out is not None:
            x = self.to_out(x)
        net = self.block1(x)
        net = self.block2(net)
        return self.activation(x + net)


def build_mapping(name: str, *args: Any, **kwargs: Any) -> nnx.Module:
    return mappings.build(name, *args, **kwargs)


# reference `register_mapping` (`core/mappings.py` registry surface)
register_mapping = mappings.register
