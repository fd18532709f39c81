"""Functional user API.

Parity: reference `cflearn/api/api.py` — `fit_ml` (:496), `Evaluator`+
`evaluate` (:71-251, cross-pipeline metric comparison tables), `save`/`pack`/
`load_training`/`load_inference`/`load_evaluation` (:370-459), `make_model`/
`make_metric`/`supported_losses`/`supported_metrics` (:462-475),
`make_toy_ml_model` (:573), `repeat_ml` (:529).
"""

import os
from typing import Any, Dict, List, Optional, Union

import numpy as np

from ..data.ml.api import MLData
from ..schema.config import DLConfig, MLConfig
from ..schema.data import DataConfig, DataProcessorConfig, IData
from ..schema.losses_schema import ILoss
from ..schema.metrics_schema import IMetric, MetricsOutputs
from ..schema.model import IDLModel
from ..toolkit.misc import check_is_ci
from ..pipeline.api import (
    DLEvaluationPipeline,
    DLInferencePipeline,
    DLPipelineSerializer,
    MLTrainingPipeline,
    TrainingPipeline,
)


# ----------------------------------------------------------------------------
# training entry points
# ----------------------------------------------------------------------------

def _make_ml_data(
    x_train: Any,
    y_train: Any = None,
    x_valid: Any = None,
    y_valid: Any = None,
    *,
    data_config: Optional[DataConfig] = None,
    processor_config: Optional[DataProcessorConfig] = None,
    sample_weights: Optional[np.ndarray] = None,
) -> MLData:
    data = MLData.init(data_config, processor_config)
    data.fit(x_train, y_train, x_valid, y_valid)
    if sample_weights is not None:
        data.set_sample_weights(sample_weights)
    return data


def fit_ml(
    x_train: Any,
    y_train: Any = None,
    x_valid: Any = None,
    y_valid: Any = None,
    *,
    config: Optional[MLConfig] = None,
    data_config: Optional[DataConfig] = None,
    processor_config: Optional[DataProcessorConfig] = None,
    sample_weights: Optional[np.ndarray] = None,
    debug: bool = False,
    **kwargs: Any,
) -> MLTrainingPipeline:
    """Tabular end-to-end training (reference `api/api.py:496`)."""
    if config is None:
        config = MLConfig(module_name="fcnn")
    else:
        # never mutate the caller's config (reference copies it, :514) —
        # to_debug()/model rewrites below must not leak into later fits
        config = config.copy()
    if config.model == "common":
        # reference auto-resolves ML models to the ml.* family
        # (`schema.py:2018-2023`): prefer a specialized `ml.<module>` model
        specialized = f"ml.{config.module_name}"
        config.model = specialized if IDLModel.has(specialized) else "ml.common"
    if debug or check_is_ci():
        config.to_debug()
    data = _make_ml_data(
        x_train,
        y_train,
        x_valid,
        y_valid,
        data_config=data_config,
        processor_config=processor_config,
        sample_weights=sample_weights,
    )
    return MLTrainingPipeline.init(config).fit(data, **kwargs)


def fit_array(
    x_train: Any,
    y_train: Any = None,
    x_valid: Any = None,
    y_valid: Any = None,
    *,
    config: DLConfig,
    data_config: Optional[DataConfig] = None,
    debug: bool = False,
    **kwargs: Any,
) -> TrainingPipeline:
    """Generic array training with no tabular preprocessing."""
    from ..data.array import ArrayData
    from ..pipeline.api import DLTrainingPipeline

    if debug or check_is_ci():
        config.to_debug()
    data = ArrayData.init(data_config).fit(x_train, y_train, x_valid, y_valid)
    return DLTrainingPipeline.init(config).fit(data, **kwargs)


def make_toy_ml_model(
    config: Optional[MLConfig] = None,
    **kwargs: Any,
) -> MLTrainingPipeline:
    """1-step toy model for tests (reference `api/api.py:573`)."""
    if config is None:
        config = MLConfig(module_name="fcnn", module_config={"hidden_units": [8]})
    config.fixed_steps = 2
    config.num_epoch = 1
    x = np.random.randn(16, 4).astype(np.float32)
    y = (x.sum(1, keepdims=True) > 0).astype(np.int64)
    return fit_ml(x, y, config=config, **kwargs)


# ----------------------------------------------------------------------------
# save / load / pack
# ----------------------------------------------------------------------------

def save(pipeline: TrainingPipeline, folder: str) -> str:
    DLPipelineSerializer.save(pipeline, folder)
    return folder


def pack(workspace: str, export_folder: str, **kwargs: Any) -> str:
    return DLPipelineSerializer.pack(workspace, export_folder, **kwargs)


def load_training(folder: str) -> TrainingPipeline:
    return DLPipelineSerializer.load_training(folder)


def load_inference(folder: str) -> DLInferencePipeline:
    return DLPipelineSerializer.load_inference(folder)


def load_evaluation(folder: str) -> DLEvaluationPipeline:
    return DLPipelineSerializer.load_evaluation(folder)


def fuse_inference(src_folders: List[str], **kwargs: Any) -> Any:
    return DLPipelineSerializer.fuse_inference(src_folders, **kwargs)


def fuse_evaluation(src_folders: List[str], **kwargs: Any) -> Any:
    """Fused ensemble + metric evaluation (reference `api/api.py:435-447`)."""
    return DLPipelineSerializer.fuse_evaluation(src_folders, **kwargs)


# ----------------------------------------------------------------------------
# evaluation
# ----------------------------------------------------------------------------

class Evaluator:
    """Cross-pipeline metric comparison (reference `api/api.py:71-251`)."""

    def __init__(self, metrics: Union[str, List[str]], *, metric_configs: Optional[Dict[str, Any]] = None) -> None:
        self.metric = IMetric.fuse(metrics, metric_configs)

    def evaluate(
        self,
        pipelines: Dict[str, Any],
        x: Any,
        y: Any = None,
        *,
        batch_size: int = 128,
    ) -> Dict[str, MetricsOutputs]:
        results: Dict[str, MetricsOutputs] = {}
        for name, pipeline in pipelines.items():
            loader = pipeline._as_loader(x, y, batch_size)
            outputs = pipeline.inference.get_outputs(loader, metrics=self.metric, return_outputs=False)
            assert outputs.metric_outputs is not None
            results[name] = outputs.metric_outputs
        return results

    @staticmethod
    def report(results: Dict[str, MetricsOutputs]) -> str:
        names = sorted(results)
        metric_keys = sorted({k for r in results.values() for k in r.metric_values})
        lines = [" | ".join(["pipeline".ljust(24)] + [k.ljust(12) for k in metric_keys] + ["score".ljust(12)])]
        best = max(results.items(), key=lambda kv: kv[1].final_score)[0]
        for name in names:
            r = results[name]
            mark = "*" if name == best else " "
            cells = [f"{mark}{name}".ljust(24)]
            cells += [f"{r.metric_values.get(k, float('nan')):.6f}".ljust(12) for k in metric_keys]
            cells.append(f"{r.final_score:.6f}".ljust(12))
            lines.append(" | ".join(cells))
        return "\n".join(lines)


def evaluate(
    pipelines: Union[Any, Dict[str, Any]],
    x: Any,
    y: Any = None,
    *,
    metrics: Union[str, List[str]] = "acc",
    verbose: bool = True,
    **kwargs: Any,
) -> Dict[str, MetricsOutputs]:
    if not isinstance(pipelines, dict):
        pipelines = {"pipeline": pipelines}
    evaluator = Evaluator(metrics)
    results = evaluator.evaluate(pipelines, x, y, **kwargs)
    if verbose:
        print(Evaluator.report(results))
    return results


# ----------------------------------------------------------------------------
# registry views
# ----------------------------------------------------------------------------

def make_model(name: str, config: Optional[DLConfig] = None, **kwargs: Any) -> IDLModel:
    if config is None:
        config = DLConfig(module_name=name, **kwargs)
    return IDLModel.from_config(config)


def make_metric(name: str, **kwargs: Any) -> IMetric:
    return IMetric.make(name, kwargs)


def supported_losses() -> List[str]:
    return sorted(ILoss.d)


def supported_metrics() -> List[str]:
    return sorted(IMetric.d)


def supported_modules() -> List[str]:
    from ..modules.common import module_registry

    return module_registry.keys()


def supported_samplers() -> List[str]:
    from ..modules.multimodal.diffusion.samplers import ISampler

    return sorted(ISampler.d)


def supported_optimizers() -> List[str]:
    from ..optimizers import optimizer_dict

    return sorted(optimizer_dict)


def supported_schedulers() -> List[str]:
    from ..schedulers import scheduler_dict

    return sorted(scheduler_dict)


# ----------------------------------------------------------------------------
# distributed experiment entry points
# ----------------------------------------------------------------------------

def repeat_ml(
    x_train: Any,
    y_train: Any = None,
    *,
    config: Optional[MLConfig] = None,
    workspace: str = "_repeat",
    num_repeat: int = 2,
    num_jobs: int = 1,
    **kwargs: Any,
) -> "Any":
    """Train N copies via the Experiment scheduler (reference `api/api.py:529`
    `repeat_ml` — dumps the data once, each task reloads it). Extra kwargs
    feed the data construction (x_valid/y_valid/processor_config/...)."""
    from ..dist.ml.experiment import Experiment

    if config is None:
        config = MLConfig(module_name="fcnn")
    data = _make_ml_data(x_train, y_train, **kwargs)
    experiment = Experiment(num_jobs=num_jobs)
    data_folder = Experiment.dump_data(data, workspace)
    for _ in range(num_repeat):
        experiment.add_task(
            model=config.module_name,
            config=config.to_info(),
            data_folder=data_folder,
        )
    return experiment.run_tasks(workspace)


def run_multiple(
    config: MLConfig,
    data: IData,
    *,
    workspace: str = "_multiple",
    num_multiple: int = 2,
    num_jobs: int = 1,
    is_fix: bool = False,
) -> "Any":
    """N parallel runs of one config (reference `api/api.py:297`
    `run_multiple`; `is_fix` re-runs only buggy tasks — :310-320)."""
    import os

    from ..dist.ml.experiment import Experiment

    experiment = Experiment(num_jobs=num_jobs)
    data_folder = Experiment.dump_data(data, workspace)
    for i in range(num_multiple):
        if is_fix:
            task_folder = os.path.join(workspace, config.module_name, str(i))
            if not Experiment.is_buggy(task_folder):
                continue
        experiment.add_task(
            model=config.module_name,
            config=config.to_info(),
            data_folder=data_folder,
            index=i,
        )
    return experiment.run_tasks(workspace)
