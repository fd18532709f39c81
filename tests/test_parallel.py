"""Parallelism tests: ring attention over the context axis, fsdp sharding,
mesh construction, multi-device training step (reference analogue:
env-faked DDP tests, `tests/test_pipeline.py:30-44`)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cflearn_tpu.ops.attention import xla_attention
from cflearn_tpu.ops.ring_attention import context_parallel_attention
from cflearn_tpu.parallel.mesh import make_mesh, shard_params_fsdp
from cflearn_tpu.schema.config import MeshConfig


def _mesh(**axes):
    mc = MeshConfig()
    mc.from_info(axes)
    return make_mesh(mc)


def test_ring_attention_matches_dense() -> None:
    mesh = _mesh(data=1, context=8)
    np.random.seed(0)
    q = jnp.asarray(np.random.randn(2, 4, 64, 32).astype(np.float32))
    k = jnp.asarray(np.random.randn(2, 4, 64, 32).astype(np.float32))
    v = jnp.asarray(np.random.randn(2, 4, 64, 32).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(context_parallel_attention(q, k, v, mesh)),
        np.asarray(xla_attention(q, k, v)),
        atol=1e-5,
    )


def test_ring_attention_causal() -> None:
    mesh = _mesh(data=1, context=4)
    q = jnp.asarray(np.random.RandomState(1).randn(1, 2, 32, 16).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(context_parallel_attention(q, q, q, mesh, causal=True)),
        np.asarray(xla_attention(q, q, q, causal=True)),
        atol=1e-5,
    )


def test_mesh_axis_sizes() -> None:
    mesh = _mesh(data=-1, fsdp=2)
    assert mesh.shape["data"] == 4 and mesh.shape["fsdp"] == 2
    with pytest.raises(ValueError):
        _mesh(data=3, fsdp=3)


def test_fsdp_sharding() -> None:
    mesh = _mesh(data=4, fsdp=2)
    params = {"w": jnp.ones((16, 8)), "b": jnp.ones((7,))}
    placed = shard_params_fsdp(params, mesh)
    w_shard = placed["w"].sharding
    assert "fsdp" in str(w_shard.spec)
    # 7 not divisible by 2 → replicated
    assert "fsdp" not in str(placed["b"].sharding.spec)


def test_sharded_training_step() -> None:
    """Full dp x fsdp x tp training step on the virtual 8-device mesh."""
    import sys

    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)
