"""Pallas flash attention (forward + custom-VJP backward) numerical parity
vs XLA attention, run in interpreter mode on CPU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cflearn_tpu.ops import attention as A


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(A, "_INTERPRET", True)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("shape", [(1, 2, 256, 32), (1, 2, 300, 16)])
def test_flash_forward_parity(causal, shape) -> None:
    b, h, l, d = shape
    q = jax.random.normal(jax.random.PRNGKey(0), shape)
    k = jax.random.normal(jax.random.PRNGKey(1), shape)
    v = jax.random.normal(jax.random.PRNGKey(2), shape)
    out = A.flash_attention(q, k, v, causal=causal, block_q=128, block_k=128)
    ref = A.xla_attention(q, k, v, causal=causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_flash_trainable_grad_parity(causal) -> None:
    """Custom-VJP backward must match XLA attention gradients (the round-1
    gap: training attention fell back to XLA because the kernel had no
    backward)."""
    shape = (1, 2, 256, 32)
    q = jax.random.normal(jax.random.PRNGKey(0), shape)
    k = jax.random.normal(jax.random.PRNGKey(1), shape)
    v = jax.random.normal(jax.random.PRNGKey(2), shape)
    t = jax.random.normal(jax.random.PRNGKey(3), shape)

    def loss_pallas(q, k, v):
        out = A.flash_attention_trainable(q, k, v, causal, None)
        return jnp.sum((out - t) ** 2)

    def loss_xla(q, k, v):
        out = A.xla_attention(q, k, v, causal=causal)
        return jnp.sum((out - t) ** 2)

    g_p = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    g_x = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for gp, gx, name in zip(g_p, g_x, "qkv"):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gx), atol=5e-4, err_msg=name)


def test_flash_trainable_grad_parity_ragged_kv() -> None:
    """Non-multiple-of-block kv length exercises the pad-masking in both
    directions (padded kv columns must receive zero grads)."""
    qs, kvs = (1, 2, 256, 32), (1, 2, 200, 32)
    q = jax.random.normal(jax.random.PRNGKey(0), qs)
    k = jax.random.normal(jax.random.PRNGKey(1), kvs)
    v = jax.random.normal(jax.random.PRNGKey(2), kvs)

    def loss_pallas(q, k, v):
        return jnp.sum(A.flash_attention_trainable(q, k, v, False, None) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(A.xla_attention(q, k, v) ** 2)

    g_p = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    g_x = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for gp, gx, name in zip(g_p, g_x, "qkv"):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gx), atol=5e-4, err_msg=name)


def test_causal_with_explicit_mask_keeps_causality() -> None:
    """Regression (code review): sdp_attn(causal=True, mask=...) silently
    dropped the causal constraint. With an all-keep mask, causal+mask must
    equal causal alone."""
    import jax
    import jax.numpy as jnp

    from cflearn_tpu.ops.attention import sdp_attn

    q = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 16, 8))
    k = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 16, 8))
    v = jax.random.normal(jax.random.PRNGKey(2), (1, 2, 16, 8))
    causal_only = sdp_attn(q, k, v, causal=True)
    keep_all = jnp.ones((1, 1, 16, 16), dtype=bool)
    causal_masked = sdp_attn(q, k, v, causal=True, mask=keep_all)
    import numpy as np

    np.testing.assert_allclose(
        np.asarray(causal_masked), np.asarray(causal_only), atol=1e-5
    )


def test_flash_bwd_split_fallback_matches_fused(monkeypatch) -> None:
    """The fused dq+dk+dv backward kernel (default) and the split dq / dkv
    pair (the VMEM-budget fallback, forced here via the module gate) must
    produce identical gradients — guards the fallback path, which default
    runs never take."""
    import jax
    import jax.numpy as jnp

    from cflearn_tpu.ops import attention as A

    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.normal(size=(2, 3, 200, 40)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(2, 3, 131, 40)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(2, 3, 131, 40)), jnp.float32)

    def loss(q, k, v):
        return jnp.sum(A.flash_attention_trainable(q, k, v, False, None) ** 2)

    fused = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    monkeypatch.setattr(A, "_FUSED_BWD", False)
    split = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(fused, split):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-4)
