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

SPMD structure (round 3): the shard_map is PARTIAL-MANUAL — only the `pipe`
axis is manual (`jax.shard_map(axis_names={axis})`); `data`/`fsdp`/`model`
stay automatic, so GSPMD shards the batch and any tensor-parallel weights
*inside* the pipeline region exactly as it would outside. This is what
makes TP/EP compose with PP: a MoE channel mixer's expert tensors, placed
`P('pipe', 'model', ...)` by `parallel.tp.place_params`, keep their expert-
axis sharding inside each stage, and GSPMD inserts the dispatch/combine
collectives per stage. It also removes the in-trace param re-stacking that
used to force SPMD "involuntary full rematerialization" on the stacked
leaves: stacks are built ONCE at module init (`MixedStackedEncoder`), enter
the program already sharded `P('pipe', ...)`, and the shard_map in_spec is
then a no-op.

Constraints (checked): the stacked block leading axis `L` must divide by the
pipe size, activations must keep one shape through the stack (true for
transformer/mixer stacks), and the microbatch count must divide the batch.
"""

from functools import lru_cache, partial
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def _sequential(
    block_fn: Callable[..., Any], stacked_params: Any, x: jax.Array, with_aux: bool
) -> Any:
    if with_aux:
        def body_aux(h: jax.Array, p: Any) -> Tuple[jax.Array, jax.Array]:
            h, aux = block_fn(p, h)
            return h, aux

        h, auxs = jax.lax.scan(body_aux, x, stacked_params)
        return h, jnp.sum(auxs)

    def body(h: jax.Array, p: Any) -> Tuple[jax.Array, None]:
        return block_fn(p, h), None

    h, _ = jax.lax.scan(body, x, stacked_params)
    return h


def pipeline_apply(
    block_fn: Callable[[Any, jax.Array], jax.Array],
    stacked_params: Any,
    x: jax.Array,
    *,
    mesh: Optional[Mesh] = None,
    axis: str = "pipe",
    num_microbatches: Optional[int] = None,
    block_kwargs: Optional[dict] = None,
    with_aux: bool = False,
) -> Any:
    """Run `x` through `L` stacked blocks pipelined over the mesh's `axis`.

    `stacked_params`: pytree whose leaves carry a leading block axis `L`
    (block i's params = `leaf[i]`); sharded over `axis` inside, so each
    device owns a contiguous group of `L / pipe` blocks.
    `block_fn(params_i, h) -> h` applies ONE block. `x` is the global
    activation batch `(B, *feat)`; returns the same shape. `mesh=None` (or
    a mesh without the axis) runs the plain sequential scan.

    `with_aux=True` changes the contract to `block_fn(params_i, h) ->
    (h, aux_scalar)` and the return to `(out, aux)`: sown per-block scalar
    objectives (e.g. the MoE load-balancing loss) cannot flow back through
    the functional re-merge inside the scan, so the pipeline carries them
    explicitly — per-stage sums are masked to valid (non-fill/drain) ticks,
    psum'd over the pipe axis, and averaged over microbatches (the
    sequential path sums the per-block full-batch values, so `aux` there is
    exactly the module-loop semantics; under pipelining it is the mean of
    per-microbatch values — the Switch-style batch statistic computed per
    microbatch)."""
    kw_items = tuple(sorted(block_kwargs.items())) if block_kwargs else ()
    pp = mesh.shape.get(axis, 1) if mesh is not None else 1
    if pp <= 1:  # no pipe axis — plain sequential scan over the blocks
        if kw_items:
            block_fn = partial(block_fn, **dict(kw_items))
        return _sequential(block_fn, stacked_params, x, with_aux)

    lead = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    if lead % pp != 0:
        raise ValueError(f"{lead} stacked blocks do not divide over pipe={pp}")
    m = num_microbatches or pp
    if x.shape[0] % m != 0:
        raise ValueError(f"batch {x.shape[0]} not divisible by num_microbatches={m}")
    mb = x.shape[0] // m

    try:  # cache the jit wrapper so eager callers don't retrace per call
        fn = _pipelined_jit(block_fn, kw_items, mesh, axis, m, with_aux)
    except TypeError:  # unhashable key parts — build (and retrace) inline
        fn = _pipelined_jit.__wrapped__(block_fn, kw_items, mesh, axis, m, with_aux)
    xs = x.reshape((m, mb) + x.shape[1:])
    # the block stack traces inside shard_map's pipe-manual region:
    # ambient-mesh parallel routing (sdp_attn's ring-attention switch, nested
    # PP) would open a nested shard_map on a different mesh, which is invalid
    # there — the pipeline owns the `pipe` parallelism of its region, so mask
    # the ambient mesh for the duration of the trace
    from .mesh import get_ambient_mesh, set_mesh

    ambient = get_ambient_mesh()
    set_mesh(None)
    try:
        out = fn(stacked_params, xs)
    finally:
        set_mesh(ambient)
    if with_aux:
        out, aux = out
        return out.reshape(x.shape), aux
    return out.reshape(x.shape)


@lru_cache(maxsize=64)
def _pipelined_jit(
    block_fn: Callable[..., Any],
    kw_items: Tuple[Tuple[str, Any], ...],
    mesh: Mesh,
    axis: str,
    m: int,
    with_aux: bool,
) -> Callable[..., Any]:
    """Build (once per key) the jitted partial-manual shard_map pipeline.

    jax.jit's trace cache is keyed on the wrapped function object, so a fresh
    wrapper per pipeline_apply call meant eager callers recompiled every
    invocation (ADVICE r3). Keys: block_fn identity + kwargs items, mesh,
    axis name, microbatch count, aux contract — everything the traced
    program closes over besides operand shapes (which jit itself keys on)."""
    if kw_items:
        block_fn = partial(block_fn, **dict(kw_items))
    p_spec = P(axis)  # leading block axis split into stage groups
    x_spec = P()  # (M, mb, *feat): replicated over `pipe`; batch sharding
    # over data/fsdp stays with GSPMD (those axes are auto, not manual)

    def pipelined(params_local: Any, xs: jax.Array) -> Any:
        s = jax.lax.axis_size(axis)
        stage = jax.lax.axis_index(axis)
        is_first = stage == 0
        is_last = stage == s - 1
        perm = [(i, (i + 1) % s) for i in range(s)]

        def stage_apply(h: jax.Array) -> Tuple[jax.Array, jax.Array]:
            def body(h: jax.Array, p: Any) -> Tuple[jax.Array, jax.Array]:
                if with_aux:
                    h, aux = block_fn(p, h)
                else:
                    h, aux = block_fn(p, h), jnp.zeros((), jnp.float32)
                return h, aux

            h, auxs = jax.lax.scan(body, h, params_local)
            return h, jnp.sum(auxs)

        out0 = jnp.zeros_like(xs)
        h0 = jnp.zeros_like(xs[0])
        aux0 = jnp.zeros((), jnp.float32)

        def tick(carry: Tuple[jax.Array, jax.Array, jax.Array], t: jax.Array):
            h, out, aux_sum = carry
            x_mb = jax.lax.dynamic_index_in_dim(
                xs, jnp.clip(t, 0, m - 1), 0, keepdims=False
            )
            h = jnp.where(is_first, x_mb, h)
            h, aux = stage_apply(h)
            # fill/drain ticks run garbage microbatches through the stage;
            # their aux contributions are masked (tick t is valid for this
            # stage iff its microbatch index t - stage is in [0, m))
            valid = (t >= stage) & (t < stage + m)
            aux_sum = aux_sum + jnp.where(valid, aux, 0.0)
            idx = jnp.clip(t - (s - 1), 0, m - 1)
            cur = jax.lax.dynamic_index_in_dim(out, idx, 0, keepdims=False)
            upd = jnp.where(is_last & (t >= s - 1), h, cur)
            out = jax.lax.dynamic_update_index_in_dim(out, upd, idx, 0)
            h = jax.lax.ppermute(h, axis, perm)
            return (h, out, aux_sum), None

        (_, out, aux_sum), _ = jax.lax.scan(
            tick, (h0, out0, aux0), jnp.arange(m + s - 1)
        )
        # results live on the last stage — replicate via a masked psum
        out = jnp.where(is_last, out, jnp.zeros_like(out))
        out = jax.lax.psum(out, axis)
        if not with_aux:
            return out
        # sum over stages (each stage summed its own blocks), mean over
        # microbatches
        return out, jax.lax.psum(aux_sum, axis) / m

    # the partial-manual shard_map (manual over `pipe` only) requires the
    # traced path — its eager impl resolves out_specs against ALL mesh axes
    # (jax _unmatch with check_vma=False) and rejects partial manual. The
    # nested jit is inlined when we are already inside an outer jit trace.
    return jax.jit(
        jax.shard_map(
            pipelined,
            mesh=mesh,
            in_specs=(p_spec, x_spec),
            out_specs=(x_spec, P()) if with_aux else x_spec,
            axis_names=frozenset({axis}),
            check_vma=False,
        )
    )


def stack_module_states(modules: Sequence[Any]) -> Tuple[Any, Any]:
    """Split N structurally-identical nnx modules and stack their states on a
    new leading block axis — the `stacked_params` input of `pipeline_apply`.
    Returns `(graphdef, stacked_state)`; restore block i functionally with
    `nnx.merge(graphdef, jax.tree.map(lambda l: l[i], stacked_state))` (what
    `pipeline_apply`'s scan does per block). Call at module INIT time, not
    inside a traced function: an in-trace stack of already-sharded params
    forces an SPMD resharding ("involuntary full rematerialization") on
    every leaf."""
    from flax import nnx

    graphdef, state0 = nnx.split(modules[0])
    states = [state0] + [nnx.split(b)[1] for b in modules[1:]]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)
    return graphdef, stacked
