"""Device mesh + sharding helpers — the single parallelism mechanism.

Design (SURVEY.md §2.10 decision): every strategy is expressed on one named
mesh — `data` (DP), `fsdp` (ZeRO-style param/optimizer-state sharding),
`model` (TP), `context` (SP/ring attention). Replaces the reference's
accelerate/DDP machinery (`trainer.py:226-229`, `toolkit.py:1882-1962`):
GSPMD inserts the gradient all-reduce over ICI that DDP did with NCCL.

Single-chip code runs against a 1-device mesh so parallelism is config, not
code.
"""

import os
from contextlib import contextmanager
from typing import Any, Dict, Iterator, List, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..schema.config import MeshConfig

_current_mesh: Optional[Mesh] = None


def make_mesh(
    config: Optional[MeshConfig] = None,
    *,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    if config is None:
        config = MeshConfig()
    if devices is None:
        devices = jax.devices()
    sizes = config.axis_sizes(len(devices))
    dev_array = np.asarray(devices).reshape(sizes)
    return Mesh(dev_array, tuple(config.axis_names))


def get_mesh() -> Mesh:
    global _current_mesh
    if _current_mesh is None:
        _current_mesh = make_mesh()
    return _current_mesh


def set_mesh(mesh: Optional[Mesh]) -> None:
    global _current_mesh
    _current_mesh = mesh


def get_ambient_mesh() -> Optional[Mesh]:
    """The raw ambient mesh (no axis filtering) — None if never set. Use to
    snapshot/restore around scopes that set their own mesh (Trainer.fit)."""
    return _current_mesh


def get_active_context_mesh() -> Optional[Mesh]:
    """The ambient mesh iff it carries a real context-parallel axis —
    the switch `ops.sdp_attn` consults to route self-attention through
    ring attention (SURVEY §5.7). Returns None when no mesh was set or
    the `context` axis is trivial."""
    if _current_mesh is None:
        return None
    if _current_mesh.shape.get("context", 1) <= 1:
        return None
    return _current_mesh


def get_active_pipe_mesh() -> Optional[Mesh]:
    """The ambient mesh iff it carries a real pipeline-parallel axis — the
    switch `MixedStackedEncoder` consults to route its block stack through
    `parallel.pp.pipeline_apply` (SURVEY §2.10 PP row). Returns None when no
    mesh was set or the `pipe` axis is trivial."""
    if _current_mesh is None:
        return None
    if _current_mesh.shape.get("pipe", 1) <= 1:
        return None
    return _current_mesh


@contextmanager
def mesh_context(mesh: Mesh) -> Iterator[Mesh]:
    global _current_mesh
    backup = _current_mesh
    _current_mesh = mesh
    try:
        yield mesh
    finally:
        _current_mesh = backup


def data_sharding(mesh: Optional[Mesh] = None, *, ndim: int = 0) -> NamedSharding:
    """Batch-axis sharding over ("data", "fsdp") — DP placement for input batches."""
    mesh = mesh or get_mesh()
    spec = [("data", "fsdp")] + [None] * max(0, ndim - 1)
    return NamedSharding(mesh, P(*spec) if ndim else P(("data", "fsdp")))


def replicated_sharding(mesh: Optional[Mesh] = None) -> NamedSharding:
    mesh = mesh or get_mesh()
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Optional[Mesh] = None) -> Dict[str, Any]:
    """Place a host batch with batch-axis sharding over the data axis."""
    mesh = mesh or get_mesh()
    out: Dict[str, Any] = {}
    for k, v in batch.items():
        if hasattr(v, "ndim") and v.ndim >= 1:
            out[k] = jax.device_put(v, data_sharding(mesh, ndim=v.ndim))
        else:
            out[k] = v
    return out


def fsdp_param_sharding(mesh: Mesh, shape: Sequence[int]) -> NamedSharding:
    """Shard the largest divisible axis of a param over the fsdp axis."""
    fsdp = mesh.shape.get("fsdp", 1)
    if fsdp <= 1:
        return NamedSharding(mesh, P())
    best_axis = -1
    best = 0
    for i, s in enumerate(shape):
        if s % fsdp == 0 and s > best:
            best = s
            best_axis = i
    if best_axis < 0:
        return NamedSharding(mesh, P())
    spec: List[Any] = [None] * len(shape)
    spec[best_axis] = "fsdp"
    return NamedSharding(mesh, P(*spec))


def shard_params_fsdp(params: Any, mesh: Optional[Mesh] = None) -> Any:
    """ZeRO-3-style parameter sharding: each float param's largest divisible
    axis is sharded over `fsdp` (the reference's `use_zero` flag, actually
    implemented — SURVEY.md §2.10)."""
    mesh = mesh or get_mesh()

    def _place(x: Any) -> Any:
        if hasattr(x, "shape") and getattr(x, "ndim", 0) >= 1:
            return jax.device_put(x, fsdp_param_sharding(mesh, x.shape))
        return x

    return jax.tree_util.tree_map(_place, params)


def local_device_count() -> int:
    return jax.local_device_count()


def process_index() -> int:
    return jax.process_index()


def is_local_rank_0() -> bool:
    """Reference `is_local_rank_0` (`toolkit.py:1882-1962`) equivalent."""
    return jax.process_index() == 0


def get_world_size() -> int:
    return jax.device_count()


def maybe_initialize_distributed() -> None:
    """Multi-host init (reference: implicit in `Accelerator()`); env-driven.

    `jax.distributed.initialize()` does NOT read our coordinator env vars
    itself (it only auto-detects managed clusters), so pass them explicitly.
    """
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not addr:
        return
    num = os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("JAX_PROCESS_ID")
    jax.distributed.initialize(
        coordinator_address=addr,
        num_processes=int(num) if num else None,
        process_id=int(pid) if pid else None,
    )
    # Host-side RNG sync: data splitting / loader shuffling run on the
    # process-global numpy RNG, and replicated device_put asserts identical
    # arrays on every process — so unless the user already seeded, broadcast
    # rank 0's seed to all ranks (reference: accelerate syncs seeds in DDP).
    if jax.process_count() > 1:
        from ..toolkit import misc as _misc

        if _misc._seed is None:
            import numpy as _np
            from jax.experimental import multihost_utils

            local = _np.int64(_np.random.randint(0, 2**31 - 1))
            _misc.seed_everything(int(multihost_utils.broadcast_one_to_all(local)))
