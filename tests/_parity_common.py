"""Shared workload builder for the sharded-vs-single-device training parity
tests (VERDICT r2 item 4). Imported both by tests/test_parallel.py (8-device
in-process runs) and by the single-device baseline subprocess it spawns
(XLA_FLAGS=--xla_force_host_platform_device_count=1), so both sides run the
byte-identical fit.

Reference analogue: DDP's implicit guarantee that a multi-rank run optimizes
the same function as a single-rank run (`/root/reference/cflearn/trainer.py:268-273`).
"""

import json
import sys
from typing import Dict, Optional

import numpy as np


def run_workload(
    workload: str,
    mesh: Optional[Dict[str, int]],
    workspace: str,
    extra_config: Optional[Dict] = None,
):
    """Deterministically build data+model, fit 3 fixed steps, return a flat
    param dict path->np.ndarray. `extra_config` overrides TrainerConfig
    fields (e.g. steps_per_dispatch) on top of the fixed protocol."""
    import jax
    from flax import nnx

    from cflearn_tpu.data import ArrayData
    from cflearn_tpu.monitors import LazyMonitor
    from cflearn_tpu.schema import DLConfig
    from cflearn_tpu.schema.model import IDLModel
    from cflearn_tpu.trainer import Trainer

    from cflearn_tpu.optimizers import OptimizerPack

    np.random.seed(142857)
    common = dict(
        workspace=workspace,
        fixed_steps=3,
        callback_names=[],
        # SGD, deliberately: its update is LINEAR in the gradient, so psum
        # reassociation noise stays ~1e-7 and the assert tolerance can be
        # sharp. Adam's g/(|g|+eps) amplifies float noise on near-zero grads
        # into O(lr) update differences, which would force a tolerance loose
        # enough to hide real sharding bugs.
        optimizer_settings={"all": OptimizerPack("all", "sgd", optimizer_config={"lr": 0.05})},
    )
    if mesh is not None:
        common["mesh"] = mesh
    if extra_config:
        common.update(extra_config)
    if workload == "transformer_pp":
        # NOTE: deliberately the plain "ff" channel mixer. MoE's top-k
        # routing is DISCRETE: psum reassociation noise (~1e-7) flips
        # borderline argmax decisions between mesh layouts, which routes
        # tokens to different experts and produces genuinely different
        # (but equally valid) gradients — param-level parity is unsound
        # for MoE. EP correctness is covered by the dedicated MoE tests
        # (exact E=1 reduction, aux-loss math, EP training step).
        config = DLConfig(
            module_name="transformer",
            module_config={
                "input_dim": 8,
                "output_dim": 2,
                "num_layers": 4,
                "pipeline_parallel": True,
            },
            loss_name="cross_entropy",
            **common,
        )
        rng = np.random.RandomState(0)
        x = rng.randn(32, 8).astype(np.float32)
        y = (x.sum(1, keepdims=True) > 0).astype(np.int64)
        data = ArrayData.init().fit(x, y)
    elif workload == "ddpm_attn":
        config = DLConfig(
            model="ddpm",
            module_name="ddpm",
            module_config={
                "img_size": 8,
                "in_channels": 3,
                "out_channels": 3,
                "num_timesteps": 10,
                "unet_config": {
                    "start_channels": 32,
                    "num_res_blocks": 1,
                    "channel_multipliers": (1, 2),
                    "attention_downsample_rates": (2,),
                    "num_heads": 4,
                    "context_dim": 32,
                    "use_spatial_transformer": True,
                },
            },
            **common,
        )
        rng = np.random.RandomState(0)
        x = rng.randn(32, 8, 8, 3).astype(np.float32)
        cond = rng.randn(32, 4, 32).astype(np.float32)
        data = ArrayData.init().fit(x, train_others={"cond": cond})
    else:
        raise ValueError(workload)

    model = IDLModel.from_config(config)
    trainer = Trainer(config, monitors=[LazyMonitor()])
    trainer.fit(data, model, skip_final_evaluation=True)
    assert trainer.state is not None and trainer.state.step == 3

    params = nnx.state(model.m, nnx.Param)
    from cflearn_tpu.toolkit.tree import _key_entry_to_str

    flat = {}
    for path_entries, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        path = "/".join(_key_entry_to_str(p) for p in path_entries)
        flat[path] = np.asarray(jax.device_get(leaf), np.float32)
    return flat


def main() -> None:
    # subprocess entry: argv = [workload, mesh_json_or_null, workspace, out_npz]
    workload, mesh_json, workspace, out = sys.argv[1:5]
    mesh = json.loads(mesh_json)
    flat = run_workload(workload, mesh, workspace)
    np.savez(out, **flat)


if __name__ == "__main__":
    main()
