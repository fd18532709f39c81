"""LR scheduler registry on optax schedules.

Parity: reference `cflearn/schedulers.py` — registry + `WarmupScheduler`
(:126, multiplier warmup wrapping an "afterwards" scheduler), `linear`,
`linear_inverse`, `step`, `exponential` (with lr floor), `plateau`, and
`OpScheduler` ops `cosine_warmup`/`linear_warmup` (:193-243).

TPU-native: schedulers are pure `step -> lr` functions compiled into the
jitted train step (no host-side `scheduler.step()` mutation). `plateau` is the
one metric-driven scheduler; it is handled by the trainer via a host-side
`lr_scale` multiplier (see `Trainer._handle_plateau`), mirroring the
reference's `scheduler_requires_metric` special-case (`toolkit.py:1596`).
"""

from typing import Any, Callable, Dict, Optional

import optax

scheduler_dict: Dict[str, Callable[..., optax.Schedule]] = {}

# names whose updates are driven by the validation metric, not the step count
scheduler_requires_metric = {"plateau"}


def register_scheduler(name: str) -> Callable:
    def _core(fn: Callable[..., optax.Schedule]) -> Callable:
        scheduler_dict[name] = fn
        return fn

    return _core


def build_scheduler(name: str, lr: float, **kwargs: Any) -> optax.Schedule:
    if name not in scheduler_dict:
        raise ValueError(f"scheduler '{name}' is not registered (available: {sorted(scheduler_dict)})")
    return scheduler_dict[name](lr, **kwargs)


@register_scheduler("linear")
def _linear(lr: float, *, start_epoch: int = 0, end_epoch: int = 100, num_step_per_epoch: int = 1, **_: Any) -> optax.Schedule:
    start = start_epoch * num_step_per_epoch
    end = max(start + 1, end_epoch * num_step_per_epoch)
    return optax.linear_schedule(lr, 0.0, end - start, start)


@register_scheduler("linear_inverse")
def _linear_inverse(lr: float, *, decay: float = 0.001, floor_ratio: float = 0.01, **_: Any) -> optax.Schedule:
    def schedule(step: Any) -> Any:
        import jax.numpy as jnp

        return jnp.maximum(lr * floor_ratio, lr / (1.0 + decay * step))

    return schedule


@register_scheduler("step")
def _step(lr: float, *, step_size: int = 10, gamma: float = 0.1, floor_ratio: float = 0.0, **_: Any) -> optax.Schedule:
    def schedule(step: Any) -> Any:
        import jax.numpy as jnp

        lr_t = lr * gamma ** (step // step_size)
        return jnp.maximum(lr * floor_ratio, lr_t)

    return schedule


@register_scheduler("exponential")
def _exponential(lr: float, *, gamma: float = 0.99, floor_ratio: float = 0.0, **_: Any) -> optax.Schedule:
    def schedule(step: Any) -> Any:
        import jax.numpy as jnp

        return jnp.maximum(lr * floor_ratio, lr * gamma**step)

    return schedule


@register_scheduler("cosine")
def _cosine(lr: float, *, decay_steps: int = 10000, alpha: float = 0.0, **_: Any) -> optax.Schedule:
    return optax.cosine_decay_schedule(lr, decay_steps, alpha)


@register_scheduler("cosine_warmup")
def _cosine_warmup(
    lr: float,
    *,
    warmup_steps: int = 1000,
    decay_steps: int = 10000,
    init_ratio: float = 0.0,
    alpha: float = 0.0,
    **_: Any,
) -> optax.Schedule:
    return optax.warmup_cosine_decay_schedule(
        init_value=lr * init_ratio,
        peak_value=lr,
        warmup_steps=warmup_steps,
        decay_steps=warmup_steps + decay_steps,
        end_value=lr * alpha,
    )


@register_scheduler("linear_warmup")
def _linear_warmup(lr: float, *, warmup_steps: int = 1000, init_ratio: float = 0.0, **_: Any) -> optax.Schedule:
    warm = optax.linear_schedule(lr * init_ratio, lr, warmup_steps)
    return warm


@register_scheduler("warmup")
def _warmup(
    lr: float,
    *,
    multiplier: float = 1.0,
    warmup_step: int = 1000,
    afterwards: Optional[str] = None,
    afterwards_config: Optional[Dict[str, Any]] = None,
    **_: Any,
) -> optax.Schedule:
    """`WarmupScheduler` (reference `schedulers.py:126`): ramp from lr to
    lr*multiplier over `warmup_step`, then hand off to `afterwards`. The
    ramp STARTS at lr (reference: base_lr*((multiplier-1)*step/warmup+1))."""
    peak = lr * multiplier
    warm = optax.linear_schedule(lr, peak, warmup_step)
    if afterwards is None:
        after = optax.constant_schedule(peak)
    else:
        after = build_scheduler(afterwards, peak, **(afterwards_config or {}))
    return optax.join_schedules([warm, after], [warmup_step])


@register_scheduler("constant")
def _constant(lr: float, **_: Any) -> optax.Schedule:
    return optax.constant_schedule(lr)


@register_scheduler("plateau")
def _plateau(lr: float, **_: Any) -> optax.Schedule:
    # The step→lr part is constant; the metric-driven decay is applied by the
    # trainer through its host-side `lr_scale` (see `Trainer`).
    return optax.constant_schedule(lr)


class PlateauState:
    """Host-side ReduceLROnPlateau logic (reference torch `plateau` shim)."""

    def __init__(
        self,
        *,
        mode: str = "max",
        factor: float = 0.1,
        patience: int = 10,
        threshold: float = 1e-4,
        min_scale: float = 1e-8,
    ) -> None:
        self.mode = mode
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.min_scale = min_scale
        self.best: Optional[float] = None
        self.num_bad = 0
        self.scale = 1.0

    def update(self, metric: float) -> float:
        better = (
            self.best is None
            or (self.mode == "max" and metric > self.best + self.threshold)
            or (self.mode == "min" and metric < self.best - self.threshold)
        )
        if better:
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
            if self.num_bad > self.patience:
                self.scale = max(self.min_scale, self.scale * self.factor)
                self.num_bad = 0
        return self.scale


# scheduler "ops" registry (reference `schedulers.py:184` register_op — here
# ops are optax-schedule factories like everything else)
scheduler_ops: Dict[str, Callable[..., optax.Schedule]] = {}


def register_op(name: str) -> Callable:
    def _register(fn: Any) -> Any:
        scheduler_ops[name] = fn
        return fn

    return _register


# reference scheduler names → the optax factories that play the same role
# (reference classes wrap torch LRScheduler; here every scheduler is an
# optax.Schedule factory `f(lr, **kwargs)`)
WarmupScheduler = _warmup
StepLRWithFloor = _step
ExponentialLRWithFloor = _exponential
LinearInverseScheduler = _linear_inverse
ReduceLROnPlateauWithGet = _plateau
LinearWarmupOp = register_op("linear")(_linear_warmup)
CosineWarmupOp = register_op("cosine")(_cosine_warmup)
