"""Linear model (reference `cflearn/modules/ml/linear.py:8`)."""

import jax
from flax import nnx

from ..common import register_module


@register_module("linear")
class LinearModule(nnx.Module):
    def __init__(
        self,
        input_dim: int,
        output_dim: int,
        *,
        bias: bool = True,
        rngs: nnx.Rngs,
    ) -> None:
        self.input_dim = input_dim
        self.output_dim = output_dim
        self.net = nnx.Linear(input_dim, output_dim, use_bias=bias, rngs=rngs)

    def __call__(self, x: jax.Array) -> jax.Array:
        return self.net(x)
