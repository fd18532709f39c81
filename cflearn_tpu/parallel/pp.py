"""Pipeline parallelism — GPipe-style microbatch pipelining over a `pipe`
mesh axis.

SURVEY.md §2.10 lists PP as absent in the reference (and out of scope v1);
this closes the row the TPU-native way: the layer stack of a homogeneous
deep encoder is split into `pipe` contiguous stage groups, each stage's
parameters live on its own mesh slice, and microbatch activations rotate
stage→stage+1 with `jax.lax.ppermute` (riding ICI). The whole schedule is
one `lax.scan` inside one `shard_map` — a single XLA program; reverse-mode
AD through the scan + ppermute yields the backward pipeline (reverse tick
order) automatically, so the same primitive serves training.

Schedule: plain GPipe filling/draining — `T = M + S - 1` ticks for M
microbatches over S stages (bubble fraction `(S-1)/T`; pick
`num_microbatches >= S`, default `S`, to bound it). Each device applies its
stage group every tick; fill/drain garbage is masked out of the output
buffer rather than skipped (XLA prefers uniform work over per-tick
control flow).

Constraints (checked): the stacked block leading axis `L` must divide by the
pipe size, activations must keep one shape through the stack (true for
transformer/mixer stacks), and the microbatch count must divide the batch.
Composes with data parallelism (batch axes sharded inside the same
shard_map, like `ops.ring_attention`); TP inside a PP stage is out of scope.
"""

import math
from functools import partial
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def _batch_axes(mesh: Mesh) -> Tuple[str, ...]:
    return tuple(a for a in ("data", "fsdp") if mesh.shape.get(a, 1) > 1)


def pipeline_apply(
    block_fn: Callable[[Any, jax.Array], jax.Array],
    stacked_params: Any,
    x: jax.Array,
    *,
    mesh: Mesh,
    axis: str = "pipe",
    num_microbatches: Optional[int] = None,
    block_kwargs: Optional[dict] = None,
) -> jax.Array:
    """Run `x` through `L` stacked blocks pipelined over the mesh's `axis`.

    `stacked_params`: pytree whose leaves carry a leading block axis `L`
    (block i's params = `leaf[i]`); sharded over `axis` inside, so each
    device owns a contiguous group of `L / pipe` blocks.
    `block_fn(params_i, h) -> h` applies ONE block. `x` is the global
    activation batch `(B, *feat)`; returns the same shape.
    """
    if block_kwargs:
        block_fn = partial(block_fn, **block_kwargs)
    pp = mesh.shape.get(axis, 1)
    if pp <= 1:  # no pipe axis — plain sequential scan over the blocks
        def body(h: jax.Array, p: Any) -> Tuple[jax.Array, None]:
            return block_fn(p, h), None

        h, _ = jax.lax.scan(body, x, stacked_params)
        return h

    lead = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    if lead % pp != 0:
        raise ValueError(f"{lead} stacked blocks do not divide over pipe={pp}")
    m = num_microbatches or pp
    if x.shape[0] % m != 0:
        raise ValueError(f"batch {x.shape[0]} not divisible by num_microbatches={m}")

    batch_axes = _batch_axes(mesh)
    div = math.prod(mesh.shape[a] for a in batch_axes) if batch_axes else 1
    mb = x.shape[0] // m
    batch_spec = batch_axes if batch_axes and mb % div == 0 else None
    x_spec = P(None, batch_spec)  # (M, mb, *feat)
    p_spec = P(axis)  # leading block axis split into stage groups

    def pipelined(params_local: Any, xs: jax.Array) -> jax.Array:
        s = jax.lax.axis_size(axis)
        stage = jax.lax.axis_index(axis)
        is_first = stage == 0
        is_last = stage == s - 1
        perm = [(i, (i + 1) % s) for i in range(s)]

        def stage_apply(h: jax.Array) -> jax.Array:
            def body(h: jax.Array, p: Any) -> Tuple[jax.Array, None]:
                return block_fn(p, h), None

            h, _ = jax.lax.scan(body, h, params_local)
            return h

        out0 = jnp.zeros_like(xs)
        h0 = jnp.zeros_like(xs[0])

        def tick(carry: Tuple[jax.Array, jax.Array], t: jax.Array):
            h, out = carry
            x_mb = jax.lax.dynamic_index_in_dim(
                xs, jnp.clip(t, 0, m - 1), 0, keepdims=False
            )
            h = jnp.where(is_first, x_mb, h)
            h = stage_apply(h)
            idx = jnp.clip(t - (s - 1), 0, m - 1)
            cur = jax.lax.dynamic_index_in_dim(out, idx, 0, keepdims=False)
            upd = jnp.where(is_last & (t >= s - 1), h, cur)
            out = jax.lax.dynamic_update_index_in_dim(out, upd, idx, 0)
            h = jax.lax.ppermute(h, axis, perm)
            return (h, out), None

        (_, out), _ = jax.lax.scan(tick, (h0, out0), jnp.arange(m + s - 1))
        # results live on the last stage — replicate via a masked psum
        out = jnp.where(is_last, out, jnp.zeros_like(out))
        return jax.lax.psum(out, axis)

    from jax.experimental.shard_map import shard_map

    from .mesh import get_ambient_mesh, set_mesh

    fn = shard_map(
        pipelined,
        mesh=mesh,
        in_specs=(p_spec, x_spec),
        out_specs=x_spec,
        check_rep=False,
    )
    xs = x.reshape((m, mb) + x.shape[1:])
    # the block stack traces inside shard_map's MANUAL region: ambient-mesh
    # parallel routing (sdp_attn's ring-attention switch, nested PP) would
    # open a nested shard_map on a different mesh, which is invalid there —
    # the pipeline owns the parallelism of its region, so mask the ambient
    # mesh for the duration of the trace
    ambient = get_ambient_mesh()
    set_mesh(None)
    try:
        out = fn(stacked_params, xs)
    finally:
        set_mesh(ambient)
    return out.reshape(x.shape)


def stack_module_states(modules: Sequence[Any]) -> Tuple[Any, Any]:
    """Split N structurally-identical nnx modules and stack their states on a
    new leading block axis — the `stacked_params` input of `pipeline_apply`.
    Returns `(graphdef, stacked_state)`; restore block i functionally with
    `nnx.merge(graphdef, jax.tree.map(lambda l: l[i], stacked_state))` (what
    `pipeline_apply`'s scan does per block)."""
    from flax import nnx

    graphdef, state0 = nnx.split(modules[0])
    states = [state0] + [nnx.split(b)[1] for b in modules[1:]]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)
    return graphdef, stacked
