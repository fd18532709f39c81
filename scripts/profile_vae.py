"""Bisect VAE-decoder time: conv / groupnorm / attention / full decoder."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/cflearn_tpu/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import jax.numpy as jnp
from flax import nnx


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def timed(fn, *args, iters=8, warmup=2):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.time() - t0) / iters


def to_bf16(m):
    params = nnx.state(m, nnx.Param)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        params,
    )
    nnx.update(m, params)
    return m


def main() -> None:
    key = jax.random.PRNGKey(0)
    B = 4

    # (a) plain conv 3x3 at 512x512x128 bf16
    x = jax.random.normal(key, (B, 512, 512, 128), jnp.bfloat16)
    w = jax.random.normal(key, (3, 3, 128, 128), jnp.bfloat16)

    @jax.jit
    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )

    dt = timed(conv, x, w)
    print(f"conv 512x512x128->128 B4: {dt*1e3:.2f} ms  ({309/ (dt*1e3):.0f} TF/s)")

    # (b) GroupNorm(32) + silu at same shape
    gn = nnx.GroupNorm(128, num_groups=32, epsilon=1e-6, rngs=nnx.Rngs(0))
    gn = to_bf16(gn)
    gdef, gstate = nnx.split(gn)

    @jax.jit
    def gn_silu(st, x):
        m = nnx.merge(gdef, st)
        return jax.nn.silu(m(x))

    dt = timed(gn_silu, gstate, x)
    print(f"GN+silu 512x512x128 B4:   {dt*1e3:.2f} ms")

    # (c) SpatialAttention at 64x64x512
    from cflearn_tpu.modules.core.attentions import SpatialAttention

    attn = to_bf16(SpatialAttention(512, rngs=nnx.Rngs(0)))
    adef, astate = nnx.split(attn)
    xa = jax.random.normal(key, (B, 64, 64, 512), jnp.bfloat16)

    @jax.jit
    def attn_fn(st, x):
        m = nnx.merge(adef, st)
        return m(x)

    dt = timed(attn_fn, astate, xa)
    print(f"SpatialAttention 64x64x512 B4: {dt*1e3:.2f} ms")

    # (d) ResidualBlock at 512x512x128
    from cflearn_tpu.modules.core.convs import ResidualBlock

    rb = to_bf16(ResidualBlock(128, 128, rngs=nnx.Rngs(0)))
    rdef, rstate = nnx.split(rb)

    @jax.jit
    def rb_fn(st, x):
        m = nnx.merge(rdef, st)
        return m(x)

    dt = timed(rb_fn, rstate, x)
    print(f"ResidualBlock 512x512x128 B4: {dt*1e3:.2f} ms")

    # (e) UpsampleConv2d 256->512 at ch 256
    from cflearn_tpu.modules.core.convs import UpsampleConv2d

    up = to_bf16(UpsampleConv2d(256, 256, factor=2.0, rngs=nnx.Rngs(0)))
    udef, ustate = nnx.split(up)
    xu = jax.random.normal(key, (B, 256, 256, 256), jnp.bfloat16)

    @jax.jit
    def up_fn(st, x):
        m = nnx.merge(udef, st)
        return m(x)

    dt = timed(up_fn, ustate, xu)
    print(f"UpsampleConv2d 256->512 ch256 B4: {dt*1e3:.2f} ms")

    # (f) full AttnDecoder (SD f8 config)
    from cflearn_tpu.modules.cv.ae import AttnDecoder

    dec = to_bf16(
        AttnDecoder(
            img_size=512,
            out_channels=3,
            inner_channels=128,
            z_channels=4,
            channel_multipliers=[1, 2, 4, 4],
            num_res_blocks=2,
            attention_resolutions=[64],
            rngs=nnx.Rngs(0),
        )
    )
    ddef, dstate = nnx.split(dec)
    z = jax.random.normal(key, (B, 64, 64, 4), jnp.float32)

    @jax.jit
    def dec_fn(st, z):
        m = nnx.merge(ddef, st)
        return m(z)

    dt = timed(dec_fn, dstate, z, iters=4)
    print(f"AttnDecoder full B4: {dt*1e3:.1f} ms")


if __name__ == "__main__":
    main()
