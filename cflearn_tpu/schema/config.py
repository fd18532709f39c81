"""Config dataclasses — the single object that flows through every layer.

Parity: reference `cflearn/schema.py:1876-2051` (`TrainerConfig` / `Config` /
`DLConfig` / `MLConfig`). TPU-native additions: `mesh_config` (named device
mesh axes — data/fsdp/model/context), `compute_dtype`/`param_dtype` replace
accelerate's `mixed_precision` string (kept as an alias), and the dead
`use_zero` flag of the reference (`schema.py:1908`, declared-never-consumed)
becomes a real `shard_optimizer_states` switch.
"""

import dataclasses
from typing import Any, Dict, List, Optional, Union

from ..toolkit.serialization import DataClassBase

TPath = Optional[str]


@dataclasses.dataclass(eq=False)
class MeshConfig(DataClassBase):
    """Named device-mesh spec. Axes with size -1 absorb remaining devices."""

    data: int = -1
    fsdp: int = 1
    model: int = 1
    context: int = 1
    pipe: int = 1

    @property
    def axis_names(self) -> List[str]:
        return ["data", "fsdp", "model", "context", "pipe"]

    def axis_sizes(self, num_devices: int) -> List[int]:
        sizes = [self.data, self.fsdp, self.model, self.context, self.pipe]
        fixed = 1
        for s in sizes:
            if s > 0:
                fixed *= s
        if num_devices % fixed != 0:
            raise ValueError(f"mesh sizes {sizes} do not divide {num_devices} devices")
        remaining = num_devices // fixed
        out = []
        used_free = False
        for s in sizes:
            if s > 0:
                out.append(s)
            elif used_free:
                out.append(1)
            else:
                out.append(remaining)
                used_free = True
        if not used_free and remaining != 1:
            out[0] *= remaining
        return out


@dataclasses.dataclass(eq=False)
class TrainerConfig(DataClassBase):
    """Reference `TrainerConfig` (`schema.py:1876`), TPU-adapted."""

    workspace: str = "_logs"
    create_sub_workspace: bool = True
    state_config: Optional[Dict[str, Any]] = None
    num_epoch: int = 40
    max_epoch: int = 1000
    fixed_epoch: Optional[int] = None
    fixed_steps: Optional[int] = None
    log_steps: Optional[int] = None
    valid_portion: float = 1.0
    clip_norm: float = 0.0
    grad_accumulate: int = 1
    # precision: "no" | "fp16" | "bf16" (reference accelerate strings).
    # On TPU "fp16" is treated as bf16 compute (MXU-native).
    mixed_precision: str = "no"
    optimizer_name: Optional[str] = None
    scheduler_name: Optional[str] = None
    optimizer_config: Optional[Dict[str, Any]] = None
    scheduler_config: Optional[Dict[str, Any]] = None
    update_scheduler_per_epoch: bool = False
    optimizer_settings: Optional[Dict[str, Optional[Dict[str, Any]]]] = None
    use_incrementer_for_train_loss: bool = True
    metric_names: Optional[Union[str, List[str]]] = None
    metric_configs: Optional[Dict[str, Any]] = None
    metric_weights: Optional[Dict[str, float]] = None
    metric_forward_kwargs: Optional[Dict[str, Any]] = None
    use_losses_as_metrics: Optional[bool] = None
    loss_metrics_weights: Optional[Dict[str, float]] = None
    recompute_train_losses_in_eval: bool = True
    validation_split: Optional[float] = None
    monitor_names: Optional[Union[str, List[str]]] = None
    monitor_configs: Optional[Dict[str, Any]] = None
    auto_callback: bool = True
    callback_names: Optional[Union[str, List[str]]] = None
    callback_configs: Optional[Dict[str, Any]] = None
    lr: Optional[float] = None
    optimizer_packs: Optional[List[Dict[str, Any]]] = None
    use_zero: bool = False  # alias of shard_optimizer_states (reference dead flag)
    shard_optimizer_states: bool = False
    finetune_config: Optional[Dict[str, Any]] = None
    save_pipeline_in_realtime: bool = False
    max_snapshot_file: int = 25
    min_num_sample: int = 3000
    num_snapshot_per_epoch: float = 2.0
    max_step_per_snapshot: int = 1000
    min_snapshot_epoch_gap: int = 0
    # TPU-native knobs
    mesh: Optional[Dict[str, int]] = None
    donate_buffers: bool = True
    # fuse up to k train steps into ONE jitted dispatch (lax.scan over
    # stacked batches). Chunk boundaries are cadence-aligned — they land on
    # monitor/log/snapshot steps, epoch ends, actives changes and profile
    # steps — so monitor/callback semantics are bit-identical to k=1.
    # The lever for dispatch-latency-bound workloads (small models: the GAN
    # 64px row pays ~24ms dispatch against 4.3ms compute — docs/performance.md)
    steps_per_dispatch: int = 1
    # activation checkpointing: False | True (full remat) | a
    # jax.checkpoint_policies name (e.g. "dots_saveable") for selective
    # remat — matmul outputs stay resident, elementwise chains recompute
    remat: Union[bool, str] = False
    profile_steps: Optional[List[int]] = None
    tqdm_settings: Optional[Dict[str, Any]] = None
    # sanitizer analogue (SURVEY §5.2): jax debug flags applied around fit.
    # `debug_nans` re-runs NaN-producing ops de-optimized and raises at the
    # source; `transfer_guard` ("allow"|"log"|"disallow") catches implicit
    # host↔device transfers inside the training loop.
    debug_nans: bool = False
    transfer_guard: Optional[str] = None
    # checkpoint writing happens on a background thread so the training loop
    # never blocks on host-side compression/disk IO (SURVEY §5.4 async plan);
    # restore/rollback paths drain pending writes first
    async_checkpointing: bool = True
    # preemption safety (SURVEY §5.3 — TPU preemption is routine): on
    # SIGTERM the trainer finishes the in-flight step, dumps model +
    # optimizer states + counters to `<workspace root>/preemption/`, and a
    # later `fit` against the same workspace root resumes from that dump
    # (the folder is removed once a fit completes normally)
    save_on_preemption: bool = True
    resume_from_preemption: bool = True

    @property
    def is_debug(self) -> bool:
        return self.fixed_steps == 1

    @property
    def compute_dtype(self) -> str:
        if self.mixed_precision in ("fp16", "bf16"):
            return "bfloat16"
        return "float32"

    def get_mesh_config(self) -> MeshConfig:
        mc = MeshConfig()
        if self.mesh:
            mc.from_info(dict(self.mesh))
        return mc


@dataclasses.dataclass(eq=False)
class Config(TrainerConfig):
    """+ loss/debug fields (reference `schema.py:1918`)."""

    loss_name: Optional[str] = None
    loss_config: Optional[Dict[str, Any]] = None
    in_loading: bool = False
    cudnn_benchmark: bool = False  # kept for config-compat; no-op on TPU

    def to_debug(self) -> "Config":
        self.fixed_steps = 1
        self.valid_portion = 1.0e-4
        return self

    def sanity_check(self) -> None:
        if self.fixed_steps is not None and self.fixed_steps <= 0:
            raise ValueError("`fixed_steps` should be positive when provided")


@dataclasses.dataclass(eq=False)
class DLConfig(Config):
    """+ model/module selection (reference `schema.py:1949`)."""

    model: str = "common"
    model_config: Optional[Dict[str, Any]] = None
    module_name: str = ""
    module_config: Optional[Dict[str, Any]] = None
    num_repeat: Optional[int] = None
    inference_type: str = "dl"
    seed: Optional[int] = None

    def sanity_check(self) -> None:
        super().sanity_check()
        if not self.module_name:
            raise ValueError("`module_name` should be provided")

    @property
    def model_name(self) -> str:
        return self.model


@dataclasses.dataclass(eq=False)
class MLConfig(DLConfig):
    """+ tabular-specific fields (reference `schema.py:2003`)."""

    encoder_settings: Optional[Dict[str, Dict[str, Any]]] = None
    global_encoder_settings: Optional[Dict[str, Any]] = None
    index_mapping: Optional[Dict[str, int]] = None
    infer_encoder_settings: bool = True

    def __post_init__(self) -> None:
        # accept the reference's dataclass settings (MLEncoderSettings /
        # MLGlobalEncoderSettings) anywhere plain dicts are expected
        if self.encoder_settings:
            self.encoder_settings = {
                k: dataclasses.asdict(v) if dataclasses.is_dataclass(v) else v
                for k, v in self.encoder_settings.items()
            }
        if dataclasses.is_dataclass(self.global_encoder_settings):
            self.global_encoder_settings = dataclasses.asdict(self.global_encoder_settings)

    def sanity_check(self) -> None:
        super().sanity_check()

    @classmethod
    def inherit_from(cls, config: DLConfig) -> "MLConfig":
        obj = cls()
        obj.from_info(config.to_info())
        return obj


config_registry: Dict[str, type] = {
    "trainer": TrainerConfig,
    "config": Config,
    "dl": DLConfig,
    "ml": MLConfig,
}


@dataclasses.dataclass
class TqdmSettings(DataClassBase):
    """Progress-bar settings (reference `schema.py:1866`)."""

    use_tqdm: bool = False
    use_step_tqdm: bool = False
    use_tqdm_in_validation: bool = False
    in_distributed: bool = False
    position: int = 0
    desc: str = "epoch"


@dataclasses.dataclass
class MLEncoderSettings(DataClassBase):
    """Per-column categorical encoding settings (reference `schema.py`
    MLEncoderSettings): `dim` = number of values, `methods` =
    "embedding" | "one_hot" (or both)."""

    dim: int
    methods: Union[str, List[str]] = "embedding"
    method_configs: Optional[Dict[str, Any]] = None

    @property
    def use_one_hot(self) -> bool:
        methods = self.methods if isinstance(self.methods, list) else [self.methods]
        return "one_hot" in methods

    @property
    def use_embedding(self) -> bool:
        methods = self.methods if isinstance(self.methods, list) else [self.methods]
        return "embedding" in methods


@dataclasses.dataclass
class MLGlobalEncoderSettings(DataClassBase):
    """Global embedding overrides (reference `schema.py:1996`)."""

    embedding_dim: Optional[int] = None
    embedding_dropout: Optional[float] = None
