"""Pallas 3x3 NHWC conv kernel: numerical parity vs XLA conv (forward +
custom-VJP backward), run in interpreter mode on CPU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cflearn_tpu.ops import conv as C


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(C, "_INTERPRET", True)


def _xla(x, w, b=None):
    out = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    if b is not None:
        out = out + b
    return out


@pytest.mark.parametrize(
    "shape,co",
    [
        ((2, 8, 8, 128), 128),
        ((1, 16, 16, 256), 512),  # exercises Co blocking paths
        ((1, 12, 20, 64), 192),  # non-pow2 spatial, odd Co
    ],
)
def test_conv3x3_forward_parity(shape, co) -> None:
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, shape, jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, shape[-1], co), jnp.float32) * 0.05
    b = jax.random.normal(jax.random.PRNGKey(2), (co,)) * 0.1
    got = C.conv3x3_pallas(x, w, b)
    ref = _xla(x, w, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_conv3x3_grad_parity() -> None:
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 8, 8, 128), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 128, 128), jnp.float32) * 0.05
    b = jnp.zeros((128,))

    def f_pal(x, w, b):
        return jnp.sum(C.conv3x3(x, w, b) ** 2)

    def f_xla(x, w, b):
        return jnp.sum(_xla(x, w, b) ** 2)

    g1 = jax.grad(f_pal, argnums=(0, 1, 2))(x, w, b)
    g2 = jax.grad(f_xla, argnums=(0, 1, 2))(x, w, b)
    for a, c in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-3)


def test_use_pallas_conv_gating() -> None:
    x_big = jnp.zeros((1, 128, 128, 128))
    x_small = jnp.zeros((1, 32, 32, 128))
    w = jnp.zeros((3, 3, 128, 128))
    w5 = jnp.zeros((5, 5, 128, 128))
    # shape gate (backend-independent parts): wrong kernel/stride/padding off
    assert not C.use_pallas_conv(x_big, w5, (1, 1), "SAME")
    assert not C.use_pallas_conv(x_big, w, (2, 2), "SAME")
    assert not C.use_pallas_conv(x_big, w, (1, 1), "VALID")
    # small spatial with narrow channels loses to XLA
    assert not C._shape_wins(x_small, w)
    # f32 never dispatches (wins measured at bf16 only; the pinned VAE
    # config compile-OOMs scoped VMEM at 4-byte operands)
    assert not C._shape_wins(x_big, w)
    assert not C.use_pallas_conv(x_big, w, (1, 1), "SAME")
    assert C._shape_wins(x_big.astype(jnp.bfloat16), w.astype(jnp.bfloat16))


def test_conv3x3_w8a8_quant_noise_bounded() -> None:
    """Dynamic W8A8 path: output matches fp within int8 quantization noise."""
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, 8, 8, 128), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 128, 128), jnp.float32) * 0.05
    b = jax.random.normal(jax.random.PRNGKey(2), (128,)) * 0.1
    ref = _xla(x, w, b)
    got = C.conv3x3_w8a8(x, w, b)
    rel = float(jnp.max(jnp.abs(got - ref))) / float(jnp.max(jnp.abs(ref)))
    assert rel < 0.05, f"w8a8 relative error too large: {rel}"


@pytest.mark.parametrize(
    "shape,co",
    [
        ((2, 8, 8, 128), 128),
        ((1, 16, 16, 256), 512),  # Co blocking path
        ((2, 8, 8, 320), 320),  # non-128-multiple channels (the pad-waste case)
    ],
)
def test_conv3x3_wgrad_parity(shape, co) -> None:
    x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32)
    dy = jax.random.normal(jax.random.PRNGKey(1), shape[:3] + (co,), jnp.float32)
    got = C.conv3x3_wgrad_pallas(x, dy)
    ref = C._xla_conv3x3_wgrad(x, dy)
    assert got.shape == (3, 3, shape[-1], co)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-3, rtol=1e-4)


def test_conv3x3_input_grad_uses_flipped_forward() -> None:
    """dx of a stride-1 SAME 3x3 conv == the same conv of dy with rot180
    in/out-transposed weights — the identity `_conv3x3_bwd` relies on to
    reuse the forward kernel."""
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 64), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 64, 96), jnp.float32) * 0.05
    dy = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 96), jnp.float32)
    _, vjp = jax.vjp(lambda x_: _xla(x_, w), x)
    ref = vjp(dy)[0]
    got = _xla(dy, jnp.transpose(w[::-1, ::-1], (0, 1, 3, 2)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_conv3x3_full_bwd_parity_all_pallas(monkeypatch) -> None:
    """End-to-end custom VJP with BOTH pallas backward kernels forced on."""
    monkeypatch.setattr(C, "_shape_wins", lambda *a: True)
    monkeypatch.setattr(C, "_wgrad_shape_wins", lambda *a: True)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 128), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 128, 128), jnp.float32) * 0.05
    b = jax.random.normal(jax.random.PRNGKey(2), (128,)) * 0.1

    def f_pal(x, w, b):
        return jnp.sum(C.conv3x3(x, w, b) ** 2)

    def f_xla(x, w, b):
        return jnp.sum(_xla(x, w, b) ** 2)

    g1 = jax.grad(f_pal, argnums=(0, 1, 2))(x, w, b)
    g2 = jax.grad(f_xla, argnums=(0, 1, 2))(x, w, b)
    for a, c in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=2e-3, rtol=1e-4)


def test_conv3x3_bwd_no_bias() -> None:
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 64), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 64, 64), jnp.float32) * 0.05
    g1 = jax.grad(lambda x_, w_: jnp.sum(C.conv3x3(x_, w_) ** 2), argnums=(0, 1))(x, w)
    g2 = jax.grad(lambda x_, w_: jnp.sum(_xla(x_, w_) ** 2), argnums=(0, 1))(x, w)
    for a, c in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=2e-3, rtol=1e-4)
