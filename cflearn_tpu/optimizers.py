"""Optimizer registry on optax.

Parity: reference `cflearn/optimizers.py` — `optimizer_dict` registry with
sgd/adam/adamw/rmsprop (:29-32) and an in-repo `AdamP` (:74). TPU-native: all
optimizers are optax gradient transforms; learning-rate schedules plug in as
optax schedules (see `schedulers.py`); ZeRO-style optimizer-state sharding is
applied by the trainer placing optax state with the same NamedSharding as the
params.
"""

from typing import Any, Callable, Dict, NamedTuple, Optional, Union

import jax
import jax.numpy as jnp
import optax

ScalarOrSchedule = Union[float, optax.Schedule]

optimizer_dict: Dict[str, Callable[..., optax.GradientTransformation]] = {}


def register_optimizer(name: str) -> Callable:
    def _core(fn: Callable[..., optax.GradientTransformation]) -> Callable:
        optimizer_dict[name] = fn
        return fn

    return _core


def build_optimizer(
    name: str,
    lr: ScalarOrSchedule,
    **kwargs: Any,
) -> optax.GradientTransformation:
    if name not in optimizer_dict:
        raise ValueError(f"optimizer '{name}' is not registered (available: {sorted(optimizer_dict)})")
    return optimizer_dict[name](lr, **kwargs)


@register_optimizer("sgd")
def _sgd(lr: ScalarOrSchedule, *, momentum: float = 0.0, nesterov: bool = False, weight_decay: float = 0.0, **_: Any) -> optax.GradientTransformation:
    tx = optax.sgd(lr, momentum=momentum or None, nesterov=nesterov)
    if weight_decay > 0:
        tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
    return tx


@register_optimizer("adam")
def _adam(lr: ScalarOrSchedule, *, betas: Any = (0.9, 0.999), eps: float = 1e-8, weight_decay: float = 0.0, **_: Any) -> optax.GradientTransformation:
    b1, b2 = betas
    tx = optax.adam(lr, b1=b1, b2=b2, eps=eps)
    if weight_decay > 0:
        tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
    return tx


@register_optimizer("adamw")
def _adamw(lr: ScalarOrSchedule, *, betas: Any = (0.9, 0.999), eps: float = 1e-8, weight_decay: float = 1e-2, **_: Any) -> optax.GradientTransformation:
    b1, b2 = betas
    return optax.adamw(lr, b1=b1, b2=b2, eps=eps, weight_decay=weight_decay)


@register_optimizer("rmsprop")
def _rmsprop(lr: ScalarOrSchedule, *, alpha: float = 0.99, eps: float = 1e-8, momentum: float = 0.0, weight_decay: float = 0.0, **_: Any) -> optax.GradientTransformation:
    tx = optax.rmsprop(lr, decay=alpha, eps=eps, momentum=momentum or None)
    if weight_decay > 0:
        tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
    return tx


@register_optimizer("nadam")
def _nadam(lr: ScalarOrSchedule, *, betas: Any = (0.9, 0.999), eps: float = 1e-8, **_: Any) -> optax.GradientTransformation:
    b1, b2 = betas
    return optax.nadam(lr, b1=b1, b2=b2, eps=eps)


def _adamp_transform(
    *,
    betas: Any = (0.9, 0.999),
    eps: float = 1e-8,
    delta: float = 0.1,
    wd_ratio: float = 0.1,
    weight_decay: float = 0.0,
) -> optax.GradientTransformation:
    """AdamP (reference `optimizers.py:74`): Adam with projection that removes
    the radial component of the update for scale-invariant weights.
    """
    b1, b2 = betas

    def init_fn(params: Any) -> Any:
        mu = jax.tree_util.tree_map(jnp.zeros_like, params)
        nu = jax.tree_util.tree_map(jnp.zeros_like, params)
        return {"mu": mu, "nu": nu, "count": jnp.zeros((), jnp.int32)}

    def _channel_view(x: jax.Array) -> jax.Array:
        return x.reshape(x.shape[0], -1) if x.ndim > 1 else x.reshape(1, -1)

    def _cosine_sim(x: jax.Array, y: jax.Array) -> jax.Array:
        xv, yv = _channel_view(x), _channel_view(y)
        x_norm = jnp.linalg.norm(xv, axis=1) + eps
        y_norm = jnp.linalg.norm(yv, axis=1) + eps
        dot = jnp.sum(xv * yv, axis=1)
        return jnp.abs(dot) / (x_norm * y_norm)

    def _project(p: jax.Array, update: jax.Array) -> Any:
        if p.ndim < 2:
            return update, 1.0
        cos = _cosine_sim(p, update)  # per output-channel
        view = _channel_view(p)
        scale = view / (jnp.linalg.norm(view, axis=1, keepdims=True) + eps)
        u_view = _channel_view(update)
        radial = jnp.sum(u_view * scale, axis=1, keepdims=True) * scale
        projected = (u_view - radial).reshape(update.shape)
        cond = (cos < delta / jnp.sqrt(view.shape[1])).reshape((-1,) + (1,) * (update.ndim - 1))
        return jnp.where(cond, projected, update), jnp.where(cond.any(), wd_ratio, 1.0)

    def update_fn(grads: Any, state: Any, params: Any = None) -> Any:
        count = state["count"] + 1
        mu = jax.tree_util.tree_map(lambda m, g: b1 * m + (1 - b1) * g, state["mu"], grads)
        nu = jax.tree_util.tree_map(lambda v, g: b2 * v + (1 - b2) * g * g, state["nu"], grads)
        bc1 = 1 - b1**count.astype(jnp.float32)
        bc2 = 1 - b2**count.astype(jnp.float32)

        def _step(m: jax.Array, v: jax.Array, p: jax.Array) -> jax.Array:
            step = (m / bc1) / (jnp.sqrt(v / bc2) + eps)
            step, wd = _project(p, step)
            if weight_decay > 0:
                step = step + weight_decay * wd * p
            return -step

        updates = jax.tree_util.tree_map(_step, mu, nu, params)
        return updates, {"mu": mu, "nu": nu, "count": count}

    return optax.GradientTransformation(init_fn, update_fn)


@register_optimizer("adamp")
def _adamp(lr: ScalarOrSchedule, **kwargs: Any) -> optax.GradientTransformation:
    return optax.chain(
        _adamp_transform(**kwargs),
        optax.scale_by_learning_rate(lr),
    )


class OptimizerPack(NamedTuple):
    """Per-scope optimizer/scheduler declaration (reference `schema.py:1718`);
    accepted as a value of `TrainerConfig.optimizer_settings` and as an entry
    of the list-form `TrainerConfig.optimizer_packs`."""

    scope: str
    optimizer_name: str
    scheduler_name: Optional[str] = None
    optimizer_config: Optional[Dict[str, Any]] = None
    scheduler_config: Optional[Dict[str, Any]] = None
