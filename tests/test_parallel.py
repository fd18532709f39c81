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


def test_sdp_attn_auto_routes_through_ring_on_context_mesh() -> None:
    """The mesh-config switch (SURVEY §5.7): with a context>1 mesh active,
    every self-attention-shaped sdp_attn call becomes ring attention and
    matches the dense result; cross-attention shapes stay on the dense path."""
    from flax import nnx

    from cflearn_tpu.modules.core.attentions import Attention
    from cflearn_tpu.ops.attention import sdp_attn
    from cflearn_tpu.parallel.mesh import get_active_context_mesh, set_mesh

    mesh = _mesh(data=1, context=8)
    np.random.seed(0)
    q = jnp.asarray(np.random.randn(1, 2, 64, 16).astype(np.float32))
    dense = np.asarray(sdp_attn(q, q, q))
    attn = Attention(32, 2, is_self_attention=True, rngs=nnx.Rngs(0))
    x = jnp.asarray(np.random.randn(1, 64, 32).astype(np.float32))
    base = np.asarray(attn(x))
    try:
        set_mesh(mesh)
        assert get_active_context_mesh() is not None
        routed = np.asarray(sdp_attn(q, q, q))
        np.testing.assert_allclose(routed, dense, atol=1e-5)
        # module-level: identical results through the ring
        np.testing.assert_allclose(np.asarray(attn(x)), base, atol=1e-5)
        # cross-attention shape (kv != q) must not be ring-routed
        kv = jnp.asarray(np.random.randn(1, 2, 24, 16).astype(np.float32))
        out = sdp_attn(q, kv, kv)
        assert out.shape == q.shape
    finally:
        set_mesh(None)


def test_training_step_on_context_mesh(tmp_path) -> None:
    """A full training step jitted over a mesh with a context axis (the
    CP-axis training-step test from the round plan)."""
    from cflearn_tpu.data import ArrayData
    from cflearn_tpu.monitors import LazyMonitor
    from cflearn_tpu.schema import DLConfig, TrainerConfig
    from cflearn_tpu.schema.model import IDLModel
    from cflearn_tpu.trainer import Trainer

    np.random.seed(0)
    x = np.random.randn(32, 8).astype(np.float32)
    y = (x.sum(1, keepdims=True) > 0).astype(np.int64)
    config = DLConfig(
        module_name="fcnn",
        module_config={"input_dim": 8, "output_dim": 2, "hidden_units": [16]},
        loss_name="cross_entropy",
    )
    model = IDLModel.from_config(config)
    trainer = Trainer(
        TrainerConfig(
            workspace=str(tmp_path),
            fixed_steps=2,
            callback_names=[],
            mesh={"data": 2, "context": 4},
        ),
        monitors=[LazyMonitor()],
    )
    trainer.fit(ArrayData.init().fit(x, y), model, skip_final_evaluation=True)
    assert trainer.state is not None and trainer.state.step == 2


def test_pipeline_apply_matches_sequential() -> None:
    """SURVEY §2.10 PP row: GPipe microbatch pipelining over the `pipe` axis
    is EXACT vs the sequential stack — forward and gradients (the backward
    pipeline comes from reverse-mode AD through the scan + ppermute)."""
    from flax import nnx

    from cflearn_tpu.modules.core.mixed_stacks import MixingBlock
    from cflearn_tpu.parallel.pp import pipeline_apply, stack_module_states

    L, B, T, C = 8, 16, 12, 32
    rngs = nnx.Rngs(0)
    blocks = [
        MixingBlock(C, T, 64, token_mixing_type="attention", rngs=rngs)
        for _ in range(L)
    ]
    graphdef, stacked = stack_module_states(blocks)

    def block_fn(state, h):
        return nnx.merge(graphdef, state)(h)

    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, C))
    ref = x
    for b in blocks:
        ref = b(ref)
    mesh = _mesh(data=2, pipe=4)

    out = jax.jit(lambda p, x: pipeline_apply(block_fn, p, x, mesh=mesh))(stacked, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def loss_pp(p, x):
        return jnp.sum(pipeline_apply(block_fn, p, x, mesh=mesh) ** 2)

    def loss_seq(p, x):
        def body(h, pi):
            return block_fn(pi, h), None

        h, _ = jax.lax.scan(body, x, p)
        return jnp.sum(h**2)

    g_pp = jax.jit(jax.grad(loss_pp))(stacked, x)
    g_seq = jax.jit(jax.grad(loss_seq))(stacked, x)
    for a, b in zip(jax.tree_util.tree_leaves(g_pp), jax.tree_util.tree_leaves(g_seq)):
        rel = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-12))
        assert rel < 1e-5, rel
    # more microbatches than stages (smaller bubble) stays exact
    out8 = pipeline_apply(block_fn, stacked, x, mesh=mesh, num_microbatches=8)
    np.testing.assert_allclose(np.asarray(out8), np.asarray(ref), atol=2e-5)


def test_pipeline_parallel_encoder_and_training(tmp_path) -> None:
    """`MixedStackedEncoder(pipeline_parallel=True)` routes its block stack
    through the pipeline when the ambient mesh has a `pipe` axis — identical
    outputs — and a full Trainer step runs on a data x pipe mesh."""
    from flax import nnx

    from cflearn_tpu.data import ArrayData
    from cflearn_tpu.modules.common import build_module
    from cflearn_tpu.monitors import LazyMonitor
    from cflearn_tpu.parallel.mesh import get_active_pipe_mesh, set_mesh
    from cflearn_tpu.schema import DLConfig, TrainerConfig
    from cflearn_tpu.schema.model import IDLModel
    from cflearn_tpu.trainer import Trainer

    module_config = {
        "input_dim": 8,
        "output_dim": 2,
        "num_layers": 4,
        "pipeline_parallel": True,
    }
    m = build_module("transformer", config=module_config, rngs=nnx.Rngs(0))
    x = jnp.asarray(np.random.RandomState(0).randn(16, 8).astype(np.float32))
    base = np.asarray(m(x))
    mesh = _mesh(data=2, pipe=4)
    try:
        set_mesh(mesh)
        assert get_active_pipe_mesh() is not None
        np.testing.assert_allclose(np.asarray(m(x)), base, atol=2e-5)
    finally:
        set_mesh(None)

    xs = np.random.RandomState(1).randn(32, 8).astype(np.float32)
    ys = (xs.sum(1, keepdims=True) > 0).astype(np.int64)
    config = DLConfig(
        module_name="transformer",
        module_config=module_config,
        loss_name="cross_entropy",
    )
    model = IDLModel.from_config(config)
    trainer = Trainer(
        TrainerConfig(
            workspace=str(tmp_path),
            fixed_steps=2,
            callback_names=[],
            mesh={"data": 2, "pipe": 4},
        ),
        monitors=[LazyMonitor()],
    )
    trainer.fit(ArrayData.init().fit(xs, ys), model, skip_final_evaluation=True)
    assert trainer.state is not None and trainer.state.step == 2


def test_pp_checkpoint_layout_portability() -> None:
    """Checkpoints stay portable across the `pipeline_parallel` flag (ADVICE
    r3): `convert_pp_layout` stacks `blocks/{i}/*` -> `pp_block/*` (and
    slices the reverse) inside `load_state_dict`, so train-with-PP /
    serve-without round-trips bit-exactly."""
    from flax import nnx

    from cflearn_tpu.schema import DLConfig
    from cflearn_tpu.schema.model import IDLModel

    def build(pp: bool, seed: int):
        config = DLConfig(
            module_name="transformer",
            module_config={
                "input_dim": 8,
                "output_dim": 2,
                "num_layers": 4,
                "pipeline_parallel": pp,
            },
            loss_name="cross_entropy",
        )
        config.seed = seed
        return IDLModel.from_config(config)

    x = jnp.asarray(np.random.RandomState(0).randn(4, 8).astype(np.float32))
    plain = build(pp=False, seed=0)
    ref = np.asarray(plain.m(x))

    # blocks-layout checkpoint -> PP model (stack), including pp_aux synth
    pp_model = build(pp=True, seed=7)
    assert not np.allclose(np.asarray(pp_model.m(x)), ref)
    pp_model.load_state_dict(plain.state_dict())
    np.testing.assert_allclose(np.asarray(pp_model.m(x)), ref, atol=2e-5)

    # PP-layout checkpoint -> blocks model (unstack)
    plain2 = build(pp=False, seed=7)
    plain2.load_state_dict(pp_model.state_dict(), strict=False)
    np.testing.assert_allclose(np.asarray(plain2.m(x)), ref, atol=2e-5)


def test_pp_block_tp_fallback_on_pipeless_mesh() -> None:
    """On a mesh with model>1 but NO pipe axis, stacked `pp_block` leaves must
    not rule-match their full stacked shape — the 'expert' rule would shard
    the leading BLOCK axis over `model` (ADVICE r3). The inner shape is
    matched instead and the spec shifted right by one."""
    from cflearn_tpu.parallel.tp import place_params
    from jax.sharding import PartitionSpec as P

    mesh = _mesh(data=2, model=4)
    # fake stacked MoE expert leaf: (L=8 blocks, E=4 experts, d, h)
    state = {"enc": {"pp_block": {"channel_mixing": {"experts_w1": jnp.zeros((8, 4, 6, 12))}}}}
    placed = place_params(state, mesh)
    leaf = placed["enc"]["pp_block"]["channel_mixing"]["experts_w1"]
    assert tuple(leaf.sharding.spec) == (None, "model", None, None), leaf.sharding.spec
    # non-pp leaves keep the plain rule (expert axis = dim 0)
    state2 = {"enc": {"blocks": {"0": {"channel_mixing": {"experts_w1": jnp.zeros((4, 6, 12))}}}}}
    placed2 = place_params(state2, mesh)
    leaf2 = placed2["enc"]["blocks"]["0"]["channel_mixing"]["experts_w1"]
    assert tuple(leaf2.sharding.spec)[:1] == ("model",), leaf2.sharding.spec


def test_moe_channel_mixer_and_expert_parallel(tmp_path) -> None:
    """`MoEChannelMixer`: with one expert it IS the plain FF (gates normalize
    to 1); top-2-of-4 routing is differentiable through the router; and EP =
    expert-axis sharding over `model` trains end-to-end (SURVEY §2.10 EP)."""
    from flax import nnx

    from cflearn_tpu.data import ArrayData
    from cflearn_tpu.modules.core.mixed_stacks import MoEChannelMixer
    from cflearn_tpu.monitors import LazyMonitor
    from cflearn_tpu.parallel.tp import compile_rules, tp_spec_for
    from cflearn_tpu.schema import DLConfig, TrainerConfig
    from cflearn_tpu.schema.model import IDLModel
    from cflearn_tpu.trainer import Trainer

    x = jnp.asarray(np.random.RandomState(0).randn(2, 5, 8).astype(np.float32))
    m1 = MoEChannelMixer(8, 16, num_experts=1, top_k=1, capacity_factor=1.0, rngs=nnx.Rngs(0))
    w1, b1 = m1.experts_w1[...][0], m1.experts_b1[...][0]
    w2, b2 = m1.experts_w2[...][0], m1.experts_b2[...][0]
    ref = jax.nn.gelu(x @ w1 + b1) @ w2 + b2
    np.testing.assert_allclose(np.asarray(m1(x)), np.asarray(ref), atol=1e-6)

    m4 = MoEChannelMixer(8, 16, num_experts=4, top_k=2, rngs=nnx.Rngs(1))
    gd, st = nnx.split(m4)

    def loss(st):
        return jnp.sum(nnx.merge(gd, st)(x) ** 2)

    g = jax.jit(jax.grad(loss))(st)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)
    router_grad = g["router"]["kernel"]
    router_grad = getattr(router_grad, "value", router_grad)
    assert float(jnp.max(jnp.abs(router_grad))) > 0.0
    # over-capacity tokens drop to zero (residual passthrough), still finite
    tiny = MoEChannelMixer(8, 16, num_experts=4, top_k=1, capacity_factor=0.1, rngs=nnx.Rngs(2))
    assert bool(jnp.all(jnp.isfinite(tiny(x))))

    # EP placement rule: leading expert axis lands on `model`
    spec = tp_spec_for(
        "encoder/blocks/0/channel_mixer/experts_w1", (4, 32, 128), 2, compile_rules(None)
    )
    assert str(spec) == "PartitionSpec('model', None, None)"

    xs = np.random.RandomState(1).randn(32, 8).astype(np.float32)
    ys = (xs.sum(1, keepdims=True) > 0).astype(np.int64)
    config = DLConfig(
        module_name="transformer",
        module_config={
            "input_dim": 8,
            "output_dim": 2,
            "num_layers": 2,
            "channel_mixing_type": "moe",
            "channel_mixing_config": {"num_experts": 4, "top_k": 2},
        },
        loss_name="cross_entropy",
    )
    model = IDLModel.from_config(config)
    trainer = Trainer(
        TrainerConfig(
            workspace=str(tmp_path),
            fixed_steps=2,
            callback_names=[],
            mesh={"data": 2, "model": 2},
        ),
        monitors=[LazyMonitor()],
    )
    trainer.fit(ArrayData.init().fit(xs, ys), model, skip_final_evaluation=True)
    assert trainer.state is not None and trainer.state.step == 2


def test_moe_load_balancing_aux_loss() -> None:
    """The Switch load-balancing loss sows into an AuxLossVariable, surfaces
    under AUX_LOSS_KEY on training runs only, folds into the optimized
    scalar, and its gradient reaches the router."""
    import jax.numpy as jnp
    import numpy as np
    from flax import nnx

    from cflearn_tpu.constants import AUX_LOSS_KEY, INPUT_KEY, LABEL_KEY, LOSS_KEY
    from cflearn_tpu.schema import DLConfig
    from cflearn_tpu.schema.model import IDLModel

    config = DLConfig(
        module_name="transformer",
        module_config={
            "input_dim": 8,
            "output_dim": 2,
            "num_layers": 2,
            "channel_mixing_type": "moe",
            "channel_mixing_config": {"num_experts": 4, "top_k": 2},
        },
        loss_name="cross_entropy",
    )
    model = IDLModel.from_config(config)
    batch = {
        INPUT_KEY: jnp.asarray(np.random.RandomState(0).randn(4, 8).astype(np.float32)),
        LABEL_KEY: jnp.zeros((4, 1), jnp.int32),
    }
    fwd = model.run(batch, training=True)
    assert AUX_LOSS_KEY in fwd and fwd[AUX_LOSS_KEY].shape == ()
    # uniform-router lower bound is weight * 1 per MoE layer (2 layers here)
    aux = float(fwd[AUX_LOSS_KEY])
    assert aux >= 2 * 0.01 - 1e-6, aux
    assert AUX_LOSS_KEY not in model.run(batch, training=False)

    # the train-step objective includes the aux term
    step = model.train_steps[0]
    losses = step.loss_fn(model, batch, fwd)
    assert AUX_LOSS_KEY in losses
    base = float(losses[LOSS_KEY]) - float(losses[AUX_LOSS_KEY])
    assert abs(float(losses[LOSS_KEY]) - (base + aux)) < 1e-6

    # gradient reaches the router through the balance term alone: an
    # objective that is ONLY the aux loss must move the router weights
    gd, st = nnx.split(model)

    def aux_only(st):
        m = nnx.merge(gd, st)
        return m.run(batch, training=True)[AUX_LOSS_KEY]

    g = jax.grad(aux_only)(st)
    router_leaves = [
        v for p, v in jax.tree_util.tree_leaves_with_path(g) if "router" in str(p)
    ]
    assert router_leaves and any(float(jnp.max(jnp.abs(l))) > 0 for l in router_leaves)


def test_ulysses_attention_matches_dense() -> None:
    """SURVEY §5.7c: the all-to-all head-scatter variant is exact."""
    mesh = _mesh(data=1, context=8)
    rs = np.random.RandomState(2)
    q = jnp.asarray(rs.randn(2, 8, 64, 32).astype(np.float32))
    k = jnp.asarray(rs.randn(2, 8, 64, 32).astype(np.float32))
    v = jnp.asarray(rs.randn(2, 8, 64, 32).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(context_parallel_attention(q, k, v, mesh, method="ulysses")),
        np.asarray(xla_attention(q, k, v)),
        atol=1e-5,
    )


def test_ulysses_attention_causal_and_auto() -> None:
    mesh = _mesh(data=1, context=4)
    q = jnp.asarray(np.random.RandomState(3).randn(1, 4, 32, 16).astype(np.float32))
    got = context_parallel_attention(q, q, q, mesh, causal=True, method="auto")
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(xla_attention(q, q, q, causal=True)), atol=1e-5
    )
    # heads not divisible by the axis -> explicit ulysses raises, auto falls to ring
    q3 = jnp.asarray(np.random.RandomState(4).randn(1, 3, 32, 16).astype(np.float32))
    with pytest.raises(ValueError):
        context_parallel_attention(q3, q3, q3, mesh, method="ulysses")
    got3 = context_parallel_attention(q3, q3, q3, mesh, method="auto")
    np.testing.assert_allclose(
        np.asarray(got3), np.asarray(xla_attention(q3, q3, q3)), atol=1e-5
    )


# ---------------------------------------------------------------------------
# sharded-vs-single-device training parity (VERDICT r2 item 4)
# ---------------------------------------------------------------------------

def _single_device_baseline(workload: str, tmp_path) -> dict:
    """Run the workload on a REAL 1-device process (not a 1-axis mesh on 8
    virtual devices) and return its final params."""
    import os
    import subprocess
    import sys

    out = tmp_path / f"baseline_{workload}.npz"
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = "/root/repo"
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        "import sys; sys.path.insert(0, '/root/repo/tests');"
        "import _parity_common; _parity_common.main()"
    )
    subprocess.run(
        [
            sys.executable, "-c", code, workload, "null",
            str(tmp_path / "baseline_ws"), str(out),
        ],
        env=env,
        check=True,
        timeout=900,
        # argv[0] for -c code is the code itself; _parity_common reads
        # sys.argv[1:5]
        cwd="/root/repo",
    )
    data = np.load(out)
    return {k: data[k] for k in data.files}


def _assert_params_close(base: dict, got: dict, *, atol: float, rtol: float) -> None:
    assert set(base) == set(got)
    for k in sorted(base):
        np.testing.assert_allclose(
            got[k], base[k], atol=atol, rtol=rtol,
            err_msg=f"param {k} diverged from the single-device run",
        )


@pytest.mark.slow
def test_training_parity_transformer_meshes(tmp_path) -> None:
    """3 fixed-seed steps on every transformer-capable mesh config the
    dryrun exercises (dp / dp x fsdp x tp / dp x tp x pipe with MoE) must
    reproduce the single-device params — the sharding analogue of DDP's
    implicit single-process equivalence (reference trainer.py:268-273)."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from _parity_common import run_workload

    base = _single_device_baseline("transformer_pp", tmp_path)
    for i, mesh in enumerate(
        [
            {"data": 8},
            {"data": 2, "fsdp": 2, "model": 2},
            {"data": 2, "model": 2, "pipe": 2},
        ]
    ):
        got = run_workload("transformer_pp", mesh, str(tmp_path / f"ws{i}"))
        # SGD keeps updates linear in grads; 1e-4 absorbs three steps of
        # nonlinear feedback on psum-reassociation noise while still failing
        # loudly on real sharding bugs (those diverge at update scale, >=1e-2)
        _assert_params_close(base, got, atol=1e-4, rtol=0)


@pytest.mark.slow
def test_training_parity_ddpm_context_mesh(tmp_path) -> None:
    """The ring-attention (context axis) training config must also match the
    single-device run."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from _parity_common import run_workload

    base = _single_device_baseline("ddpm_attn", tmp_path)
    for i, mesh in enumerate(
        [
            {"data": 2, "fsdp": 2, "model": 2},
            {"data": 1, "fsdp": 2, "model": 2, "context": 2},
        ]
    ):
        got = run_workload("ddpm_attn", mesh, str(tmp_path / f"dws{i}"))
        _assert_params_close(base, got, atol=1e-4, rtol=0)


def test_pp_stacked_param_placement_composes_with_tp() -> None:
    """`pp_spec_for` (parallel/tp.py): init-time-stacked pipeline params get
    P('pipe', <inner TP rule>) — the placement half of TP/EP-inside-PP (the
    execution half is the partial-manual shard_map in parallel/pp.py)."""
    from jax.sharding import PartitionSpec as P

    from cflearn_tpu.parallel.tp import compile_rules, pp_spec_for

    rules = compile_rules(None)
    # MoE expert tensors: pipe on the block axis + model on the expert axis
    spec = pp_spec_for(
        "encoder/pp_block/channel_mixer/experts_w1/value", (4, 4, 32, 128), 2, 2, rules
    )
    assert spec == P("pipe", "model", None, None)
    # attention in_proj: pipe + column-parallel output dim
    spec = pp_spec_for(
        "encoder/pp_block/token_mixer/net/in_proj/kernel/value", (4, 32, 96), 2, 2, rules
    )
    assert spec == P("pipe", None, "model")
    # non-pp params and indivisible block counts fall through
    assert pp_spec_for("encoder/blocks/0/w/value", (4, 32), 2, 2, rules) is None
    assert pp_spec_for("m/pp_block/w/value", (3, 32), 2, 2, rules) is None


def test_steps_per_dispatch_on_mesh(tmp_path) -> None:
    """steps_per_dispatch composes with sharding: 3 fused-dispatch steps on
    the dp x fsdp x tp mesh reproduce the single-device params — exercises
    jnp.stack over device_put-sharded batches + lax.scan inside the pjit'd
    step (the interaction the single-device parity test cannot see)."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from _parity_common import run_workload

    base = _single_device_baseline("transformer_pp", tmp_path)
    got = run_workload(
        "transformer_pp",
        {"data": 2, "fsdp": 2, "model": 2},
        str(tmp_path / "ws_k3"),
        extra_config={"steps_per_dispatch": 3},
    )
    _assert_params_close(base, got, atol=1e-4, rtol=0)
