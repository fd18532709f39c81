"""Deployable-artifact export — the ONNX/TorchScript replacement.

Parity: reference `IDLModel.to_onnx` (`cflearn/schema.py:1410-1522`, onnx +
onnx-simplifier) and `pack_onnx`/`pack_scripted` (`pipeline/api.py:476-484`).

TPU-native (SURVEY.md §7.4): the deployable artifact is a serialized
StableHLO program via `jax.export` — portable across XLA runtimes (TPU/GPU/
CPU, IREE, PJRT C API) — plus the npd weights. `pack_stablehlo` writes both;
`load_exported` rebuilds a callable.
"""

import json
import os
from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ..schema.model import IDLModel


def export_model(
    model: IDLModel,
    example_batch: Dict[str, np.ndarray],
    folder: str,
    *,
    name: str = "model",
) -> str:
    """Serialize the model's inference forward as StableHLO + weights."""
    os.makedirs(folder, exist_ok=True)
    model.set_mode(False)
    graphdef, state = nnx.split(model)
    # jax.export can only serialize plain pytrees — ship the state as a flat
    # {path: array} dict and rebuild the nnx State inside the traced fn
    from ..toolkit.tree import npd_to_tree, tree_to_npd

    flat_state = {k: jnp.asarray(v) for k, v in tree_to_npd(state).items()}

    def forward(flat: Dict[str, jax.Array], batch: Dict[str, jax.Array]) -> Any:
        st = npd_to_tree(flat, state, strict=False)
        m = nnx.merge(graphdef, st)
        return m.run(batch, training=False)

    jit_fn = jax.jit(forward)
    jax_batch = {k: jnp.asarray(v) for k, v in example_batch.items()}
    from jax import export as jax_export

    exported = jax_export.export(jit_fn)(flat_state, jax_batch)
    blob = exported.serialize()
    with open(os.path.join(folder, f"{name}.stablehlo"), "wb") as f:
        f.write(blob)
    model.save(os.path.join(folder, f"{name}.npz"))
    meta = {
        "input_spec": {k: [list(v.shape), str(np.asarray(v).dtype)] for k, v in example_batch.items()},
    }
    with open(os.path.join(folder, f"{name}.json"), "w") as f:
        json.dump(meta, f, indent=2)
    return folder


def load_exported(folder: str, *, name: str = "model") -> Callable:
    """Rebuild a callable from a serialized export. The weights are baked via
    the accompanying npz; callers pass only the batch dict."""
    from jax import export as jax_export

    with open(os.path.join(folder, f"{name}.stablehlo"), "rb") as f:
        exported = jax_export.deserialize(f.read())
    model = IDLModel.load(os.path.join(folder, f"{name}.npz"))
    model.set_mode(False)
    _, state = nnx.split(model)
    from ..toolkit.tree import tree_to_npd

    flat_state = {k: jnp.asarray(v) for k, v in tree_to_npd(state).items()}

    def run(batch: Dict[str, np.ndarray]) -> Any:
        jax_batch = {k: jnp.asarray(v) for k, v in batch.items()}
        return exported.call(flat_state, jax_batch)

    return run


def pack_stablehlo(
    workspace: str,
    export_folder: str,
    example_batch: Dict[str, np.ndarray],
) -> str:
    """Training workspace → deployable StableHLO artifact (the reference's
    `pack_onnx` role)."""
    from .api import DLPipelineSerializer

    pipeline = DLPipelineSerializer.load_inference(os.path.join(workspace, "pipeline"))
    return export_model(pipeline.model, example_batch, export_folder)


def aot_compile(
    model: IDLModel,
    example_batch: Dict[str, np.ndarray],
) -> Callable:
    """AOT-compile the inference forward for the current backend (the
    `torch.compile` analogue, reference `api/multimodal/diffusion.py:1204`)."""
    model.set_mode(False)
    graphdef, state = nnx.split(model)

    def forward(st: Any, batch: Dict[str, jax.Array]) -> Any:
        m = nnx.merge(graphdef, st)
        return m.run(batch, training=False)

    jax_batch = {k: jnp.asarray(v) for k, v in example_batch.items()}
    compiled = jax.jit(forward).lower(state, jax_batch).compile()

    def run(batch: Dict[str, np.ndarray]) -> Any:
        return compiled(state, {k: jnp.asarray(v) for k, v in batch.items()})

    return run
