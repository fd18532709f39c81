"""Context managers + misc parity helpers.

Parity: reference `cflearn/toolkit.py` — `eval_context`/`train_context`/
`mode_context` (:2060-2204), `no_grad_context` (jax has no grad tape; the
analogue is `jax.lax.stop_gradient` at use sites — kept as a no-op guard for
API compatibility), `toggle_optimizer` (:1965 — subsumed by per-scope param
filters in the jitted step), `auto_num_layers` (:2696), `gradient_checkpoint`
(:2535 — thin wrapper over `jax.checkpoint`/remat).
"""

import math
from contextlib import contextmanager
from typing import Any, Callable, Iterator, Optional


@contextmanager
def eval_context(model: Any) -> Iterator[None]:
    """Temporarily flip a model (IDLModel or nnx.Module) to eval mode."""
    set_mode = getattr(model, "set_mode", None)
    if set_mode is not None:
        set_mode(False)
        try:
            yield
        finally:
            set_mode(True)
        return
    model.eval()
    try:
        yield
    finally:
        model.train()


@contextmanager
def train_context(model: Any) -> Iterator[None]:
    set_mode = getattr(model, "set_mode", None)
    if set_mode is not None:
        set_mode(True)
        try:
            yield
        finally:
            set_mode(False)
        return
    model.train()
    try:
        yield
    finally:
        model.eval()


def mode_context(model: Any, *, to_train: bool) -> Any:
    """reference `toolkit.py:2060` — train/eval context selected by flag."""
    return train_context(model) if to_train else eval_context(model)


@contextmanager
def no_grad_context() -> Iterator[None]:
    """No-op under JAX's functional autodiff; use `jax.lax.stop_gradient` on
    values instead. Kept so reference-shaped code keeps running."""
    yield


def gradient_checkpoint(fn: Callable, *args: Any, **kwargs: Any) -> Any:
    """Rematerialized call (reference `GradientCheckpointFunction`,
    `toolkit.py:2535-2652`)."""
    import jax

    return jax.checkpoint(fn)(*args, **kwargs)


def auto_num_layers(img_size: int, *, min_size: int = 4, max_layers: Optional[int] = None) -> int:
    """#downsample layers to reach `min_size` (reference `toolkit.py:2696`)."""
    num = int(round(math.log2(img_size / min_size)))
    if max_layers is not None:
        num = min(num, max_layers)
    return max(1, num)
