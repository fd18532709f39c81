"""Capture a jax.profiler trace of the UNet CFG step + VAE decode and print
the top ops by self-time (parsed from the xplane proto via
tensorboard_plugin_profile's raw_to_tool converter)."""

import glob
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/cflearn_tpu/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import jax.numpy as jnp
from flax import nnx

LOGDIR = "/tmp/sd_trace"


def _sync(out):
    return float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))


def main() -> None:
    from cflearn_tpu.modules.multimodal.diffusion.ldm import StableDiffusion

    model = StableDiffusion(version="v1", rngs=nnx.Rngs(0))
    params = nnx.state(model, nnx.Param)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        params,
    )
    nnx.update(model, params)
    graphdef, state = nnx.split(model)

    key = jax.random.PRNGKey(0)
    B = 4
    z2 = jax.random.normal(key, (2 * B, 64, 64, 4), jnp.bfloat16)
    t = jnp.full((2 * B,), 500, jnp.int32)
    ctx = jax.random.normal(key, (2 * B, 77, 768), jnp.bfloat16)
    z = jax.random.normal(key, (B, 64, 64, 4), jnp.float32)

    @jax.jit
    def unet_step(st, z2, t, ctx):
        m = nnx.merge(graphdef, st)
        return m.unet(z2, t, context=ctx)

    @jax.jit
    def vae_decode(st, z):
        m = nnx.merge(graphdef, st)
        return m.decode(z)

    _sync(unet_step(state, z2, t, ctx))
    _sync(vae_decode(state, z))

    with jax.profiler.trace(LOGDIR):
        for _ in range(3):
            o1 = unet_step(state, z2, t, ctx)
        _sync(o1)
        for _ in range(3):
            o2 = vae_decode(state, z)
        _sync(o2)

    # parse the trace
    xplanes = glob.glob(os.path.join(LOGDIR, "**", "*.xplane.pb"), recursive=True)
    xplanes.sort(key=os.path.getmtime)
    path = xplanes[-1]
    with open(path, "rb") as f:
        raw = f.read()
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    params_tool = {"tqx": "out:json;"}
    data, _ = rtd.xspace_to_tool_data([path], "framework_op_stats", params_tool)
    if isinstance(data, bytes):
        data = data.decode()
    obj = json.loads(data)
    rows = obj["table"]["rows"] if "table" in obj else obj[0]["rows"]
    cols = [c["label"] for c in (obj["table"]["cols"] if "table" in obj else obj[0]["cols"])]
    print("cols:", cols)
    items = []
    for r in rows:
        vals = [c.get("v") for c in r["c"]]
        items.append(vals)
    # sort by total self time col if present
    try:
        idx = cols.index("Total self-time (us)")
    except ValueError:
        idx = 2
    items.sort(key=lambda v: -(v[idx] or 0))
    for v in items[:30]:
        print(v)


if __name__ == "__main__":
    main()
