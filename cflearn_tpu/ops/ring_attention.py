"""Ring attention — context-parallel attention over the `context` mesh axis.

SURVEY.md §5.7: the reference has no sequence parallelism (only single-device
memory tricks); here long-context attention shards the sequence over the
`context` axis and rotates K/V blocks around the ring with
`jax.lax.ppermute` (rides ICI), merging partial softmax results with the
online (flash) recurrence. Each ring step's local attention uses the fused
XLA path (or the Pallas kernel on TPU), so compute overlaps naturally with
the next permute under XLA's scheduler.

Usage (inside `shard_map` over a mesh with a "context" axis):

    out = ring_attention(q_shard, k_shard, v_shard, axis_name="context")

For causal masking, pass the GLOBAL query/key offsets implied by the axis
index — handled internally from `jax.lax.axis_index`.
"""

import math
from functools import lru_cache, partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_NEG_INF = -1.0e30


def _block_attend(
    q: jax.Array,  # (B, H, Lq, D)
    k: jax.Array,  # (B, H, Lk, D)
    v: jax.Array,
    sm_scale: float,
    mask: Optional[jax.Array],
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Unnormalized attention block: returns (acc, m, l) for online merging."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * sm_scale
    if mask is not None:
        s = jnp.where(mask, s, _NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)  # (B,H,Lq,1)
    # guard fully-masked rows
    m_safe = jnp.maximum(m, -0.5e30)
    p = jnp.exp(s - m_safe)
    l = jnp.sum(p, axis=-1, keepdims=True)
    acc = jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32), preferred_element_type=jnp.float32)
    return acc, m_safe, l


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    axis_name: str = "context",
    causal: bool = False,
    sm_scale: Optional[float] = None,
) -> jax.Array:
    """Attention where L is sharded over `axis_name`. Inputs are the LOCAL
    shards (B, H, L_local, D); output is the local shard of the result."""
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(q.shape[-1])
    axis_size = jax.lax.axis_size(axis_name)
    my_idx = jax.lax.axis_index(axis_name)
    l_local = q.shape[2]

    def mask_for(kv_owner: jax.Array) -> Optional[jax.Array]:
        if not causal:
            return None
        q_pos = my_idx * l_local + jnp.arange(l_local)[:, None]
        k_pos = kv_owner * l_local + jnp.arange(l_local)[None, :]
        return (k_pos <= q_pos)[None, None]

    def step(carry, _):
        acc, m, l, cur_k, cur_v, owner = carry
        blk_acc, blk_m, blk_l = _block_attend(q, cur_k, cur_v, sm_scale, mask_for(owner))
        new_m = jnp.maximum(m, blk_m)
        alpha = jnp.exp(m - new_m)
        beta = jnp.exp(blk_m - new_m)
        acc = acc * alpha + blk_acc * beta
        l = l * alpha + blk_l * beta
        # rotate kv to the next device on the ring
        perm = [(i, (i + 1) % axis_size) for i in range(axis_size)]
        nxt_k = jax.lax.ppermute(cur_k, axis_name, perm)
        nxt_v = jax.lax.ppermute(cur_v, axis_name, perm)
        owner = (owner - 1) % axis_size
        return (acc, new_m, l, nxt_k, nxt_v, owner), None

    b, h, lq, d = q.shape
    acc0 = jnp.zeros((b, h, lq, d), jnp.float32)
    m0 = jnp.full((b, h, lq, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((b, h, lq, 1), jnp.float32)
    # under check_vma the scan carry must already be device-varying over the
    # ring axis (the outputs become varying after touching q/k/v shards)
    acc0, m0, l0 = (
        jax.lax.pcast(x, axis_name, to="varying") for x in (acc0, m0, l0)
    )
    (acc, m, l, _, _, _), _ = jax.lax.scan(
        step, (acc0, m0, l0, k, v, my_idx), None, length=axis_size
    )
    out = acc / jnp.maximum(l, 1e-30)
    return out.astype(q.dtype)


def context_parallel_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mesh: "jax.sharding.Mesh",
    *,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    method: str = "auto",
) -> jax.Array:
    """Convenience wrapper: shard (B,H,L,D) tensors over the mesh's `context`
    axis on L and run context-parallel attention via shard_map.

    `method`: "ring" (KV blocks rotate via ppermute — works for any head
    count), "ulysses" (two all_to_alls re-shard sequence<->heads — fewer
    collectives, needs H % cp == 0), or "auto" (ulysses when heads divide
    the axis, ring otherwise)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    cp = mesh.shape["context"]
    if method == "auto":
        method = "ulysses" if q.shape[1] % cp == 0 else "ring"
    if method == "ulysses" and q.shape[1] % cp != 0:
        raise ValueError(f"ulysses needs heads ({q.shape[1]}) divisible by context axis ({cp})")
    inner = ulysses_attention if method == "ulysses" else ring_attention
    # PARTIAL-MANUAL shard_map: only `context` is manual; batch sharding
    # over data/fsdp stays with GSPMD (auto axes), and — critically — no
    # replication claim is made about the `model` axis. The previous
    # full-manual form with check_rep=False out-specs silently claimed
    # model-replication, and the AD transpose then inserted a spurious psum
    # over `model` on the cotangent: every gradient upstream of attention
    # was multiplied by the model-axis size on model×context meshes (caught
    # by tests/test_parallel.py::test_training_parity_ddpm_context_mesh).
    # (the `context`-manual spec itself lives in _cp_attention_jit)

    # Sharding BARRIER around the manual region: pin the sequence dim
    # replicated at the boundary (other dims stay UNCONSTRAINED so dp/tp
    # activation shardings pass through). Without it, GSPMD propagates the
    # `context` sharding from the shard_map operands backward into the
    # producing ops, and XLA's SPMD partitioner miscompiles the GRADIENT of
    # `conv_general_dilated` whose spatial dims became context-sharded
    # through a reshape: the halo regions are double-counted and the kernel
    # cotangent comes out exactly context-axis-size times too large
    # (finite-difference-verified repro: conv3x3 → reshape → attention on a
    # (data=1, model=2, context=2) mesh doubles the conv kernel grads;
    # caught by tests/test_parallel.py::test_training_parity_ddpm_context_mesh).
    U = P.UNCONSTRAINED
    barrier = NamedSharding(mesh, P(U, U, None, U))
    q, k, v = (jax.lax.with_sharding_constraint(t, barrier) for t in (q, k, v))

    fn = _cp_attention_jit(inner, mesh, causal, sm_scale)
    return jax.lax.with_sharding_constraint(fn(q, k, v), barrier)


@lru_cache(maxsize=32)
def _cp_attention_jit(
    inner, mesh: "jax.sharding.Mesh", causal: bool, sm_scale: Optional[float]
):
    """Cache the jitted partial-manual shard_map per (method, mesh, flags):
    jit's trace cache is keyed on the wrapped function object, so building a
    fresh wrapper per call retraced eager callers every time (ADVICE r3)."""
    from jax.sharding import PartitionSpec as P

    spec = P(None, None, "context", None)
    return jax.jit(
        jax.shard_map(
            partial(inner, causal=causal, sm_scale=sm_scale),
            mesh=mesh,
            in_specs=(spec, spec, spec),
            out_specs=spec,
            axis_names=frozenset({"context"}),
            check_vma=True,
        )
    )


def ulysses_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    axis_name: str = "context",
    causal: bool = False,
    sm_scale: Optional[float] = None,
) -> jax.Array:
    """Ulysses-style context-parallel attention (SURVEY §5.7c): instead of
    rotating K/V around a ring, ONE `all_to_all` re-shards the tensors from
    sequence-sharded to head-sharded, each device runs dense attention over
    the FULL sequence for its subset of heads, and a second `all_to_all`
    restores sequence sharding. Two collectives total (vs cp-1 permutes for
    the ring) — the better trade for attention-heavy shapes when the head
    count divides the axis. Inputs are LOCAL shards (B, H, L_local, D);
    requires H % axis_size == 0 (checked statically by the wrapper)."""
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(q.shape[-1])

    def to_heads(x: jax.Array) -> jax.Array:
        # (B, H, Lc, D) -> (B, H/cp, L, D)
        return jax.lax.all_to_all(x, axis_name, split_axis=1, concat_axis=2, tiled=True)

    qh, kh, vh = to_heads(q), to_heads(k), to_heads(v)
    s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh, preferred_element_type=jnp.float32) * sm_scale
    if causal:
        l_full = qh.shape[2]
        idx = jnp.arange(l_full)
        s = jnp.where(idx[None, None, :, None] >= idx[None, None, None, :], s, _NEG_INF)
    p = jax.nn.softmax(s, axis=-1).astype(vh.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", p, vh)
    # (B, H/cp, L, D) -> (B, H, Lc, D)
    return jax.lax.all_to_all(out, axis_name, split_axis=2, concat_axis=1, tiled=True)
