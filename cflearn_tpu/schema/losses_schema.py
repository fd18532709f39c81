"""`ILoss` — the loss interface.

Parity: reference `cflearn/schema.py:760-807` — a module with
`get_forward_args`, a `run` that returns a **loss dict** containing
`LOSS_KEY`, and reduction postprocessing. Losses are `nnx.Module`s so
learned losses (LPIPS) fit the same contract; they are traced inside the
jitted train step.
"""

from typing import Any, Dict, Tuple, Union

import jax
import jax.numpy as jnp
from flax import nnx

from ..constants import LABEL_KEY, LOSS_KEY, PREDICTIONS_KEY
from ..toolkit.misc import tensor_dict_type

loss_dict_type = Dict[str, jax.Array]


class ILoss(nnx.Module):
    """Loss modules return a dict with at least `LOSS_KEY`."""

    d: Dict[str, type] = {}
    __identifier__: str

    placeholder_key = "[PLACEHOLDER]"

    def __init__(self, reduction: str = "mean", **kwargs: Any) -> None:
        self.reduction = reduction

    # registry (mirrors WithRegister but for nnx modules) ---------------------

    @classmethod
    def register(cls, name: str, *, allow_duplicate: bool = False) -> Any:
        def _core(sub: type) -> type:
            if not allow_duplicate and name in ILoss.d and ILoss.d[name] is not sub:
                raise ValueError(f"loss '{name}' already registered")
            ILoss.d[name] = sub
            sub.__identifier__ = name
            return sub

        return _core

    @classmethod
    def has(cls, name: str) -> bool:
        return name in ILoss.d

    # contract ----------------------------------------------------------------

    def get_forward_args(
        self,
        forward_results: tensor_dict_type,
        batch: tensor_dict_type,
    ) -> Tuple[Any, ...]:
        return forward_results[PREDICTIONS_KEY], batch[LABEL_KEY]

    def forward(self, *args: Any, **kwargs: Any) -> Union[jax.Array, loss_dict_type]:
        raise NotImplementedError

    def postprocess(self, losses: Union[jax.Array, loss_dict_type]) -> loss_dict_type:
        if not isinstance(losses, dict):
            losses = {LOSS_KEY: losses}
        return {k: self._reduce(v) for k, v in losses.items()}

    def _reduce(self, v: jax.Array) -> jax.Array:
        if v.ndim == 0:
            return v
        if self.reduction == "mean":
            return jnp.mean(v)
        if self.reduction == "sum":
            return jnp.sum(v)
        if self.reduction in ("none", None):
            return v
        raise ValueError(f"unrecognized reduction '{self.reduction}'")

    def run(
        self,
        forward_results: tensor_dict_type,
        batch: tensor_dict_type,
        **kwargs: Any,
    ) -> loss_dict_type:
        args = self.get_forward_args(forward_results, batch)
        losses = self.forward(*args, **kwargs)
        return self.postprocess(losses)

    def __call__(self, forward_results: tensor_dict_type, batch: tensor_dict_type, **kwargs: Any) -> loss_dict_type:
        return self.run(forward_results, batch, **kwargs)


def build_loss(name: str, config: Any = None, **kwargs: Any) -> ILoss:
    kw = dict(config or {})
    kw.update(kwargs)
    if name not in ILoss.d:
        raise ValueError(f"loss '{name}' is not registered (available: {sorted(ILoss.d)})")
    return ILoss.d[name](**kw)


def register_loss(name: str, *, allow_duplicate: bool = False) -> Any:
    """reference `register_loss` (`schema.py` losses registry)."""
    return ILoss.register(name, allow_duplicate=allow_duplicate)
