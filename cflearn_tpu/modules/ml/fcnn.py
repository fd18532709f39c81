"""FCNN — fully-connected net (reference `cflearn/modules/ml/fcnn.py:13`)."""

from typing import List, Optional

import jax
from flax import nnx

from ..common import register_module
from ..core.mappings import build_mapping


@register_module("fcnn")
class FCNN(nnx.Module):
    def __init__(
        self,
        input_dim: int,
        output_dim: int,
        hidden_units: Optional[List[int]] = None,
        *,
        mapping_type: str = "basic",
        bias: bool = True,
        norm_type: Optional[str] = "batch_norm",
        activation: Optional[str] = "relu",
        dropout: float = 0.0,
        rngs: nnx.Rngs,
    ) -> None:
        if hidden_units is None:
            hidden_units = [64, 64]
        self.input_dim = input_dim
        self.output_dim = output_dim
        self.hidden_units = hidden_units
        blocks = []
        in_dim = input_dim
        for hidden in hidden_units:
            blocks.append(
                build_mapping(
                    mapping_type,
                    in_dim,
                    hidden,
                    bias=bias,
                    norm_type=norm_type,
                    activation=activation,
                    dropout=dropout,
                    rngs=rngs,
                )
            )
            in_dim = hidden
        self.blocks = nnx.List(blocks)
        self.head = nnx.Linear(in_dim, output_dim, use_bias=True, rngs=rngs)

    def __call__(self, x: jax.Array) -> jax.Array:
        for block in self.blocks:
            x = block(x)
        return self.head(x)
