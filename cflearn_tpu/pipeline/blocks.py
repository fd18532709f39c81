"""Builder blocks for training pipelines.

Parity: reference `cflearn/pipeline/blocks/basic.py:63-869` + `blocks/ml.py`
— the 17-block build sequence: defaults injection, workspace, state info,
model/metrics/inference/monitors/callbacks/optimizers/trainer builders,
num-samples recorder, report writer, training executor, and the
data/model/optimizer serializers.
"""

import json
import os
from typing import Any, Dict, List, Optional

import numpy as np

from ..inference import DLInference
from ..schema.config import DLConfig, MLConfig
from ..schema.data import IData
from ..schema.metrics_schema import IMetric
from ..schema.model import IDLModel
from ..schema.train_schema import TrainerCallback, TrainerMonitor
from ..toolkit.misc import timestamp
from ..toolkit.serialization import Serializer
from ..trainer import Trainer, get_sorted_checkpoints
from .common import Block

import cflearn_tpu.callbacks.general  # noqa: F401 — register callbacks
import cflearn_tpu.metrics  # noqa: F401 — register metrics
import cflearn_tpu.monitors  # noqa: F401 — register monitors


@Block.register("set_defaults")
class SetDefaultsBlock(Block):
    """Inject default callbacks/monitors/loss (reference `basic.py:63-103`)."""

    def build(self, config: DLConfig) -> None:
        if config.loss_name is None and getattr(config, "module_name", ""):
            from ..schema.losses_schema import ILoss

            if ILoss.has(config.module_name):
                config.loss_name = config.module_name
                self._defaults["loss_name"] = config.loss_name
        if config.monitor_names is None:
            config.monitor_names = ["basic", "mean_std", "plateau"]
            self._defaults["monitor_names"] = config.monitor_names
        if config.callback_names is None and config.auto_callback:
            config.callback_names = ["log_metrics_msg"]
            self._defaults["callback_names"] = config.callback_names


@Block.register("set_ml_defaults")
class SetMLDefaultsBlock(SetDefaultsBlock):
    """ML defaults + encoder-settings inference from the fitted data
    (reference `pipeline/blocks/ml.py:21-64`)."""

    def build(self, config: DLConfig) -> None:
        super().build(config)
        if config.loss_name is None:
            config.loss_name = "mse"
            self._defaults["loss_name"] = "mse"

    def run(self, data: IData, **kwargs: Any) -> None:
        config = self.pipeline.config if self.pipeline is not None else None
        if config is None:
            return
        is_clf = getattr(data, "is_classification", None)
        module_config = dict(config.module_config or {})
        num_features = getattr(data, "num_features", None)
        num_labels = getattr(data, "num_labels", None)
        if num_features is not None:
            module_config.setdefault("input_dim", num_features)
        if num_labels is not None:
            module_config.setdefault("output_dim", num_labels)
        config.module_config = module_config
        if is_clf is not None:
            if is_clf and config.loss_name in (None, "mse") and "loss_name" in self._defaults:
                config.loss_name = "cross_entropy"
                self._defaults["loss_name"] = "cross_entropy"
            if config.metric_names is None:
                config.metric_names = ["acc"] if is_clf else ["mae", "mse"]
                self._defaults["metric_names"] = config.metric_names
        if isinstance(config, MLConfig) and config.infer_encoder_settings:
            settings = getattr(data, "encoder_settings", None)
            if settings:
                config.encoder_settings = settings
                if config.model == "common":
                    config.model = "ml.common"
                self._defaults["encoder_settings"] = list(settings)


@Block.register("prepare_workspace")
class PrepareWorkplaceBlock(Block):
    """Timestamped workspace (reference `basic.py:104`)."""

    def build(self, config: DLConfig) -> None:
        if config.create_sub_workspace:
            import jax as _jax

            # all processes must derive the SAME sub-workspace: the trainer's
            # all-rank best-checkpoint restore reads rank 0's files, so a
            # per-process microsecond suffix would silently diverge ranks.
            # The launcher pins it via env; single-process keeps the
            # collision-proof microsecond suffix.
            env_ts = os.environ.get("CFLEARN_TPU_RUN_TS")
            if env_ts:
                ts = env_ts
            else:
                ts = timestamp(ensure_different=_jax.process_count() == 1)
            workspace = os.path.join(config.workspace, ts)
            config.workspace = workspace
            config.create_sub_workspace = False
            self._defaults["workspace"] = workspace
        if self.is_local_rank_0 and not config.in_loading:
            os.makedirs(config.workspace, exist_ok=True)
        if self.pipeline is not None:
            self.pipeline._workspace = config.workspace


@Block.register("extract_state_info")
class ExtractStateInfoBlock(Block):
    """Snapshot cadence from data size (reference `basic.py:124`)."""

    def run(self, data: IData, **kwargs: Any) -> None:
        pass


@Block.register("build_model")
class BuildModelBlock(Block):
    model: IDLModel

    def build(self, config: DLConfig) -> None:
        self.config = config
        self.model = None  # built lazily in run (needs data-inferred dims)

    def run(self, data: IData, **kwargs: Any) -> None:
        if self.model is None:
            self.build_model()

    def build_model(self) -> IDLModel:
        if getattr(self, "model", None) is None:
            config = self.config
            if config.num_repeat is not None and config.model == "common":
                config.model = "ensemble"
            self.model = IDLModel.from_config(config)
        return self.model

    def save_extra(self, folder: str) -> None:
        if self.model is not None:
            self.model.save(os.path.join(folder, "model.npz"))

    def load_from(self, folder: str) -> None:
        path = os.path.join(folder, "model.npz")
        if os.path.isfile(path):
            self.model = IDLModel.load(path)
            self.config = self.model.config


@Block.register("build_metrics")
class BuildMetricsBlock(Block):
    metrics: Optional[IMetric] = None

    def build(self, config: DLConfig) -> None:
        self.config = config
        self._try_build()

    def run(self, data: IData, **kwargs: Any) -> None:
        # rebuild at run time: ML defaults may have filled `metric_names`
        # from the fitted data (SetMLDefaultsBlock.run)
        self._try_build()

    def _try_build(self) -> None:
        config = self.config
        if config.metric_names is not None:
            self.metrics = IMetric.fuse(
                config.metric_names,
                config.metric_configs,
                metric_weights=config.metric_weights,
            )


@Block.register("build_inference")
class BuildInferenceBlock(Block):
    inference: DLInference

    def build(self, config: DLConfig) -> None:
        self.inference = DLInference()


@Block.register("build_monitors")
class BuildMonitorsBlock(Block):
    monitors: List[TrainerMonitor]

    def build(self, config: DLConfig) -> None:
        names = config.monitor_names or ["basic"]
        if isinstance(names, str):
            names = [names]
        configs = config.monitor_configs or {}
        self.monitors = [TrainerMonitor.make(n, configs.get(n, {})) for n in names]


@Block.register("build_callbacks")
class BuildCallbacksBlock(Block):
    callbacks: List[TrainerCallback]

    def build(self, config: DLConfig) -> None:
        names = config.callback_names or []
        if isinstance(names, str):
            names = [names]
        configs = config.callback_configs or {}
        self.callbacks = [TrainerCallback.make(n, configs.get(n, {})) for n in names]


@Block.register("build_optimizers")
class BuildOptimizersBlock(Block):
    """Normalize optimizer settings into config (actual optax chains are
    built inside the Trainer; reference `basic.py:385-558`)."""

    def build(self, config: DLConfig) -> None:
        if config.optimizer_name is None and config.scheduler_name is None:
            config.optimizer_name = "adam"
            self._defaults["optimizer_name"] = "adam"
        if config.lr is None:
            config.lr = 1.0e-3
            self._defaults["lr"] = config.lr


@Block.register("build_trainer")
class BuildTrainerBlock(Block):
    trainer: Trainer

    def build(self, config: DLConfig) -> None:
        self.config = config
        self.trainer = None

    def run(self, data: IData, **kwargs: Any) -> None:
        if self.trainer is None:
            metrics_block = self.get_previous(BuildMetricsBlock)
            monitors_block = self.get_previous(BuildMonitorsBlock)
            callbacks_block = self.get_previous(BuildCallbacksBlock)
            inference_block = self.get_previous(BuildInferenceBlock)
            config = self.config.copy()
            config.create_sub_workspace = False
            self.trainer = Trainer(
                config,
                metrics=metrics_block.metrics,
                monitors=monitors_block.monitors,
                callbacks=callbacks_block.callbacks,
                inference=inference_block.inference,
            )


@Block.register("record_num_samples")
class RecordNumSamplesBlock(Block):
    def run(self, data: IData, **kwargs: Any) -> None:
        if self.pipeline is not None and self.is_local_rank_0:
            workspace = self.training_workspace
            if workspace:
                info = {"num_train": data.num_train, "num_valid": data.num_valid}
                with open(os.path.join(workspace, "num_samples.json"), "w") as f:
                    json.dump(info, f)


@Block.register("report")
class ReportBlock(Block):
    """`report.txt` — internal defaults vs external config (reference
    `basic.py:587-655`)."""

    def run(self, data: IData, **kwargs: Any) -> None:
        if not self.is_local_rank_0 or self.pipeline is None:
            return
        workspace = self.training_workspace
        if not workspace:
            return
        lines = ["=" * 50, "Internal Defaults", "-" * 50]
        for block in self.pipeline.blocks:
            for k, v in getattr(block, "_defaults", {}).items():
                lines.append(f"{k:>24s} : {v}  [{block.name}]")
        lines += ["=" * 50, "External Configurations", "-" * 50]
        for k, v in self.pipeline.config.to_info().items():
            if v is not None:
                lines.append(f"{k:>24s} : {v}")
        lines.append("=" * 50)
        with open(os.path.join(workspace, "report.txt"), "w") as f:
            f.write("\n".join(lines) + "\n")


@Block.register("training")
class TrainingBlock(Block):
    """Run `trainer.fit` (reference `basic.py:705-725`)."""

    def run(self, data: IData, **kwargs: Any) -> None:
        trainer_block = self.get_previous(BuildTrainerBlock)
        model_block = self.get_previous(BuildModelBlock)
        # SerializeOptimizerBlock is built AFTER TrainingBlock, so it is not
        # in `previous` — look it up on the whole pipeline or optimizer-state
        # resume silently never happens
        opt_block = None
        if self.pipeline is not None:
            opt_block = self.pipeline.try_get_block(SerializeOptimizerBlock)
        if opt_block is not None and getattr(opt_block, "opt_npd", None):
            trainer_block.trainer._preloaded_opt_npd = opt_block.opt_npd
        trainer_block.trainer.fit(data, model_block.model, **kwargs)


@Block.register("serialize_data")
class SerializeDataBlock(Block):
    data: Optional[IData] = None
    package_folder: str = "data_module"

    def save_extra(self, folder: str) -> None:
        if self.data is not None:
            Serializer.save(os.path.join(folder, self.package_folder), self.data, save_npd=False)

    def load_from(self, folder: str) -> None:
        data_folder = os.path.join(folder, self.package_folder)
        if os.path.isdir(data_folder):
            self.data = Serializer.load(data_folder, IData, load_npd=False)


@Block.register("serialize_model")
class SerializeModelBlock(Block):
    """Persist the best model states with the pipeline (reference
    `basic.py:742-832`)."""

    verbose: bool = True

    def save_extra(self, folder: str) -> None:
        model_block = self.try_get_previous(BuildModelBlock)
        if model_block is None or model_block.model is None:
            return
        trainer_block = self.try_get_previous(BuildTrainerBlock)
        # prefer the best checkpoint from training
        if trainer_block is not None and trainer_block.trainer is not None:
            trainer = trainer_block.trainer
            try:
                ckpt_folder = trainer.checkpoint_folder
                best = get_sorted_checkpoints(ckpt_folder)
                if best:
                    loaded = IDLModel.load(os.path.join(ckpt_folder, best[0]))
                    model_block.model.load_state_dict(loaded.state_dict())
            except AssertionError:
                pass
        model_block.model.save(os.path.join(folder, "model.npz"))

    def load_from(self, folder: str) -> None:
        pass  # handled by BuildModelBlock.load_from


@Block.register("serialize_optimizer")
class SerializeOptimizerBlock(Block):
    """Persist optimizer states for resume (reference `basic.py:833-868`)."""

    opt_npd: Optional[Dict[str, Any]] = None

    def save_extra(self, folder: str) -> None:
        trainer_block = self.try_get_previous(BuildTrainerBlock)
        if trainer_block is None or trainer_block.trainer is None:
            return
        opt_states = getattr(trainer_block.trainer, "_opt_states", None)
        if opt_states is None:
            return
        from ..toolkit.tree import tree_to_npd

        npd = {}
        for scope, st in opt_states.items():
            npd.update({f"{scope}::{k}": v for k, v in tree_to_npd(st).items()})
        np.savez_compressed(os.path.join(folder, "optimizers.npz"), **npd)

    def load_from(self, folder: str) -> None:
        path = os.path.join(folder, "optimizers.npz")
        if os.path.isfile(path):
            with np.load(path, allow_pickle=False) as z:
                self.opt_npd = {k: z[k] for k in z.files}


class TryLoadBlock(Block):
    """Block that loads cached state from a serialize folder when available,
    else builds from scratch (reference `pipeline/blocks/utils.py:23`).
    Subclasses implement `try_load` / `from_scratch` / `dump_to`."""

    serialize_folder: Optional[str] = None

    def try_load(self, folder: str) -> bool:
        raise NotImplementedError

    def from_scratch(self, config: DLConfig) -> None:
        raise NotImplementedError

    def dump_to(self, folder: str) -> None:
        raise NotImplementedError

    def build(self, config: DLConfig) -> None:
        if self.serialize_folder is not None:
            folder = os.path.join(self.serialize_folder, self.name)
            if self.try_load(folder):
                return
        self.from_scratch(config)

    def save_extra(self, folder: str) -> None:
        os.makedirs(folder, exist_ok=True)
        self.dump_to(folder)


# reference block names (`pipeline/blocks/basic.py` SetTrainerDefaultsBlock /
# SetMLTrainerDefaultsBlock — trainer-default injection lives in the same
# defaults blocks here)
SetTrainerDefaultsBlock = SetDefaultsBlock
SetMLTrainerDefaultsBlock = SetMLDefaultsBlock
