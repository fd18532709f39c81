"""Training / inference / evaluation pipelines + serializer.

Parity: reference `cflearn/pipeline/api.py:229-675` — `TrainingPipeline.fit`
(:288), `DLTrainingPipeline`/`MLTrainingPipeline` (:316/:327),
`DLInferencePipeline.predict` (:144-199, with class/probability postprocess +
label recovery), `DLEvaluationPipeline` (:358), `DLPipelineSerializer`
(:375-675 — save / pack / load_training / load_inference / load_evaluation /
fuse ensembling).
"""

import abc
import json
import os
from enum import Enum
import shutil
from typing import Any, Dict, List, Optional, TypeVar

import numpy as np

from ..constants import PREDICTIONS_KEY
from ..inference import DLInference, InferenceOutputs
from ..schema.data import IData, IDataLoader
from ..schema.metrics_schema import IMetric, MetricsOutputs
from ..schema.model import IDLModel
from .blocks import (
    BuildCallbacksBlock,
    BuildInferenceBlock,
    BuildMetricsBlock,
    BuildModelBlock,
    BuildMonitorsBlock,
    BuildOptimizersBlock,
    BuildTrainerBlock,
    ExtractStateInfoBlock,
    PrepareWorkplaceBlock,
    RecordNumSamplesBlock,
    ReportBlock,
    SerializeDataBlock,
    SerializeModelBlock,
    SerializeOptimizerBlock,
    SetDefaultsBlock,
    SetMLDefaultsBlock,
    TrainingBlock,
)
from .common import Block, Pipeline

TPipeline = TypeVar("TPipeline", bound="Pipeline")

PIPELINE_INFO_FILE = "pipeline.json"


def _postprocess_predictions(
    results: Dict[str, np.ndarray],
    *,
    return_classes: bool,
    binary_threshold: float,
    return_probabilities: bool,
    recover_labels: bool,
    data: Optional[IData],
) -> Dict[str, np.ndarray]:
    """Shared class/probability/label postprocess (reference
    `pipeline/api.py:165-195`). Binary thresholds apply to PROBABILITIES
    (sigmoid of the logit), matching the reference (:185)."""
    predictions = results.get(PREDICTIONS_KEY)
    if predictions is None:
        return results
    if return_classes and return_probabilities:
        raise ValueError("`return_classes` and `return_probabilities` are exclusive")
    if return_classes:
        if predictions.ndim >= 2 and predictions.shape[-1] > 1:
            results[PREDICTIONS_KEY] = np.argmax(predictions, axis=-1)[..., None]
        else:
            probs = 1.0 / (1.0 + np.exp(-predictions))
            results[PREDICTIONS_KEY] = (probs > binary_threshold).astype(np.int64)
    elif return_probabilities:
        logits = predictions
        if logits.ndim >= 2 and logits.shape[-1] > 1:
            e = np.exp(logits - logits.max(-1, keepdims=True))
            results[PREDICTIONS_KEY] = e / e.sum(-1, keepdims=True)
        else:
            sig = 1.0 / (1.0 + np.exp(-logits))
            results[PREDICTIONS_KEY] = np.concatenate([1.0 - sig, sig], axis=-1)
    elif recover_labels and data is not None:
        if np.issubdtype(results[PREDICTIONS_KEY].dtype, np.floating) and (
            results[PREDICTIONS_KEY].ndim < 2 or results[PREDICTIONS_KEY].shape[-1] == 1
        ):
            results[PREDICTIONS_KEY] = data.recover_labels(results[PREDICTIONS_KEY])
    return results


class _InferencePipelineMixin:
    """predict + postprocess + label recovery (reference
    `pipeline/api.py:144-199`)."""

    def predict(
        self,
        loader_or_x: Any,
        y: Any = None,
        *,
        batch_size: int = 128,
        return_classes: bool = False,
        binary_threshold: float = 0.5,
        return_probabilities: bool = False,
        recover_labels: bool = True,
        **kwargs: Any,
    ) -> Dict[str, np.ndarray]:
        loader = self._as_loader(loader_or_x, y, batch_size)
        outputs = self.inference.get_outputs(loader, **kwargs)
        results = dict(outputs.forward_results)
        return _postprocess_predictions(
            results,
            return_classes=return_classes,
            binary_threshold=binary_threshold,
            return_probabilities=return_probabilities,
            recover_labels=recover_labels,
            data=self.data,
        )

    def _as_loader(self, loader_or_x: Any, y: Any, batch_size: int) -> IDataLoader:
        if isinstance(loader_or_x, IDataLoader):
            return loader_or_x
        assert self.data is not None, "data (processor) is required to build loaders"
        return self.data.build_loader(loader_or_x, y, batch_size=batch_size)



class TrainingPipeline(_InferencePipelineMixin, Pipeline):
    """build blocks → serialize data → run blocks → serialize pipeline
    (reference `pipeline/api.py:229-315`)."""

    is_fitted: bool = False

    @property
    def set_defaults_block(self) -> Block:
        return SetDefaultsBlock()

    @property
    def building_blocks(self) -> List[Block]:
        return [
            self.set_defaults_block,
            PrepareWorkplaceBlock(),
            ExtractStateInfoBlock(),
            BuildModelBlock(),
            BuildMetricsBlock(),
            BuildInferenceBlock(),
            BuildMonitorsBlock(),
            BuildCallbacksBlock(),
            BuildOptimizersBlock(),
            BuildTrainerBlock(),
            RecordNumSamplesBlock(),
            ReportBlock(),
            TrainingBlock(),
            SerializeDataBlock(),
            SerializeModelBlock(),
            SerializeOptimizerBlock(),
        ]

    def prepare(self) -> None:
        blocks = self.building_blocks
        for b in blocks:
            b.pipeline = self
        self.build(*blocks)

    def fit(self, data: IData, **kwargs: Any) -> "TrainingPipeline":
        self.data = data
        self.run(data, **kwargs)
        self.is_fitted = True
        data_block = self.try_get_block(SerializeDataBlock)
        if data_block is not None:
            data_block.data = data
        workspace = self._workspace or self.config.workspace
        if workspace:
            DLPipelineSerializer.save(self, os.path.join(workspace, "pipeline"))
        return self

    # downstream access -------------------------------------------------------

    @property
    def model(self) -> IDLModel:
        return self.get_block(BuildModelBlock).model

    @property
    def trainer(self) -> Any:
        return self.get_block(BuildTrainerBlock).trainer

    @property
    def inference(self) -> DLInference:
        return self.get_block(BuildInferenceBlock).inference


@Pipeline.register("dl.training")
class DLTrainingPipeline(TrainingPipeline):
    pass


@Pipeline.register("ml.training")
class MLTrainingPipeline(TrainingPipeline):
    @property
    def set_defaults_block(self) -> Block:
        return SetMLDefaultsBlock()


@Pipeline.register("dl.inference")
class DLInferencePipeline(_InferencePipelineMixin, Pipeline):
    is_built: bool = False

    @property
    def building_blocks(self) -> List[Block]:
        return [BuildModelBlock(), BuildInferenceBlock(), SerializeDataBlock()]

    def prepare(self) -> None:
        blocks = self.building_blocks
        for b in blocks:
            b.pipeline = self
        self.build(*blocks)

    @property
    def model(self) -> IDLModel:
        return self.get_block(BuildModelBlock).model

    @property
    def inference(self) -> DLInference:
        inference = self.get_block(BuildInferenceBlock).inference
        if inference.model is None:
            inference.model = self.model
        return inference

    @classmethod
    def from_model(cls, model: IDLModel, data: Optional[IData] = None) -> "DLInferencePipeline":
        self = cls.init(model.config)
        self.get_block(BuildModelBlock).model = model
        self.data = data
        self.is_built = True
        return self


@Pipeline.register("ml.inference")
class MLInferencePipeline(DLInferencePipeline):
    pass


@Pipeline.register("dl.evaluation")
class DLEvaluationPipeline(DLInferencePipeline):
    def evaluate(self, loader_or_x: Any, y: Any = None, **kwargs: Any) -> MetricsOutputs:
        config = self.config
        metrics = IMetric.fuse(
            config.metric_names or "acc",
            config.metric_configs,
            metric_weights=config.metric_weights,
        )
        loader = self._as_loader(loader_or_x, y, 128)
        outputs = self.inference.get_outputs(loader, metrics=metrics, return_outputs=False)
        assert outputs.metric_outputs is not None
        return outputs.metric_outputs


@Pipeline.register("ml.evaluation")
class MLEvaluationPipeline(DLEvaluationPipeline):
    pass


class DLPipelineSerializer:
    """Folder save/load of pipelines (reference `pipeline/api.py:375-675`)."""

    # save --------------------------------------------------------------------

    @staticmethod
    def save(pipeline: Pipeline, folder: str) -> None:
        os.makedirs(folder, exist_ok=True)
        info = {
            "type": getattr(pipeline, "__identifier__", "dl.training"),
            "info": pipeline.to_info(),
        }
        with open(os.path.join(folder, PIPELINE_INFO_FILE), "w") as f:
            json.dump(info, f, indent=2)
        for block in pipeline.blocks:
            block.save_extra(folder)

    # load --------------------------------------------------------------------

    @staticmethod
    def _load(folder: str, *, swap_id: Optional[str] = None) -> Pipeline:
        with open(os.path.join(folder, PIPELINE_INFO_FILE), "r") as f:
            pack = json.load(f)
        type_id = swap_id or pack["type"]
        pipeline = Pipeline.get(type_id)()
        pipeline.from_info(pack["info"])
        for block in pipeline.blocks:
            block.load_from(folder)
        data_block = pipeline.try_get_block(SerializeDataBlock)
        if data_block is not None and data_block.data is not None:
            pipeline.data = data_block.data
        return pipeline

    @classmethod
    def load_training(cls, folder: str) -> TrainingPipeline:
        with open(os.path.join(folder, PIPELINE_INFO_FILE), "r") as f:
            pack = json.load(f)
        swap = pack["type"].replace("inference", "training").replace("evaluation", "training")
        pipeline = cls._load(folder, swap_id=swap)
        assert isinstance(pipeline, TrainingPipeline)
        # carry over pretrained states into the new model when present
        loaded_model_block = pipeline.try_get_block(BuildModelBlock)
        if loaded_model_block is not None and loaded_model_block.model is not None:
            pipeline._pretrained_model = loaded_model_block.model  # type: ignore[attr-defined]
        return pipeline

    @classmethod
    def load_inference(cls, folder: str) -> DLInferencePipeline:
        with open(os.path.join(folder, PIPELINE_INFO_FILE), "r") as f:
            pack = json.load(f)
        swap = pack["type"].replace("training", "inference").replace("evaluation", "inference")
        pipeline = cls._load(folder, swap_id=swap)
        assert isinstance(pipeline, DLInferencePipeline)
        pipeline.is_built = True
        return pipeline

    @classmethod
    def load_evaluation(cls, folder: str) -> DLEvaluationPipeline:
        with open(os.path.join(folder, PIPELINE_INFO_FILE), "r") as f:
            pack = json.load(f)
        swap = pack["type"].replace("training", "evaluation").replace("inference", "evaluation")
        pipeline = cls._load(folder, swap_id=swap)
        assert isinstance(pipeline, DLEvaluationPipeline)
        return pipeline

    # pack: training workspace → compact deployable artifact ------------------

    @classmethod
    def pack(
        cls,
        workspace: str,
        export_folder: str,
        *,
        compress: bool = False,
    ) -> str:
        pipeline_folder = os.path.join(workspace, "pipeline")
        if not os.path.isdir(pipeline_folder):
            raise ValueError(f"no serialized pipeline under workspace '{workspace}'")
        os.makedirs(os.path.dirname(os.path.abspath(export_folder)) or ".", exist_ok=True)
        if os.path.isdir(export_folder):
            shutil.rmtree(export_folder)
        shutil.copytree(pipeline_folder, export_folder)
        if compress:
            archive = shutil.make_archive(export_folder, "zip", export_folder)
            shutil.rmtree(export_folder)
            return archive
        return export_folder

    # fuse: ensemble multiple trained pipelines --------------------------------

    @staticmethod
    def _pick_folders(src_folders: List[str], num_picked: Any) -> List[str]:
        """`num_picked` (int, or float fraction) keeps the best folders by
        their recorded checkpoint score (reference `pack_multiple`/fuse
        semantics, `api/api.py:424-447`); folders without scores keep their
        given order."""
        if num_picked is None:
            return list(src_folders)
        import json as _json

        from ..constants import CHECKPOINTS_FOLDER, SCORES_FILE

        def score_of(folder: str) -> float:
            path = os.path.join(folder, CHECKPOINTS_FOLDER, SCORES_FILE)
            if not os.path.isfile(path):
                path = os.path.join(folder, SCORES_FILE)
            if os.path.isfile(path):
                with open(path, "r") as f:
                    scores = _json.load(f)
                if scores:
                    return max(float(v) for v in scores.values())
            return float("-inf")

        n = num_picked if isinstance(num_picked, int) else max(1, round(num_picked * len(src_folders)))
        ranked = sorted(src_folders, key=score_of, reverse=True)
        return ranked[:n]

    @classmethod
    def fuse_inference(
        cls,
        src_folders: List[str],
        *,
        num_picked: Any = None,
        cuda: Any = None,
    ) -> DLInferencePipeline:
        pipelines = [cls.load_inference(f) for f in cls._pick_folders(src_folders, num_picked)]
        return FusedInferencePipeline(pipelines)

    @classmethod
    def fuse_evaluation(
        cls,
        src_folders: List[str],
        *,
        num_picked: Any = None,
        cuda: Any = None,
    ) -> "FusedEvaluationPipeline":
        """Fused ensemble with metric evaluation (reference `fuse_evaluation`,
        `api/api.py:435-447`)."""
        pipelines = [cls.load_evaluation(f) for f in cls._pick_folders(src_folders, num_picked)]
        return FusedEvaluationPipeline(pipelines)


class FusedInferencePipeline(_InferencePipelineMixin):
    """Average predictions over N loaded pipelines (reference `fuse_*`,
    `api/api.py:430-459`). Each sub-pipeline runs its OWN data processor, so
    `fused.predict(x) == mean(p.predict(x) for p in pipelines)` holds exactly
    even when the pipelines were trained with different preprocessing stats
    (the equivalence the reference's ensemble tests assert)."""

    def __init__(self, pipelines: List[DLInferencePipeline]) -> None:
        self.pipelines = pipelines
        self.data = pipelines[0].data

    def predict(
        self,
        loader_or_x: Any,
        y: Any = None,
        *,
        return_classes: bool = False,
        binary_threshold: float = 0.5,
        return_probabilities: bool = False,
        recover_labels: bool = True,
        **kwargs: Any,
    ) -> Dict[str, np.ndarray]:
        # fuse RAW predictions, then derive classes/probabilities from the
        # fused output — averaging per-member class indices would fabricate
        # classes no member predicted
        all_results = [
            p.predict(loader_or_x, y, recover_labels=False, **kwargs)
            for p in self.pipelines
        ]
        fused: Dict[str, np.ndarray] = {}
        for k in all_results[0]:
            fused[k] = np.mean([r[k] for r in all_results], axis=0)
        return _postprocess_predictions(
            fused,
            return_classes=return_classes,
            binary_threshold=binary_threshold,
            return_probabilities=return_probabilities,
            recover_labels=recover_labels,
            data=self.data,
        )

    @property
    def inference(self) -> "FusedInference":
        return FusedInference(self.pipelines)


class FusedEvaluationPipeline(FusedInferencePipeline):
    """Fused ensemble + metric evaluation (reference `DLEvaluationPipeline`
    focus of `fuse_evaluation`, `pipeline/api.py:435-447`): predictions are
    averaged across sub-pipelines, then scored with the fused metrics."""

    def evaluate(self, loader_or_x: Any, y: Any = None, **kwargs: Any) -> MetricsOutputs:
        config = self.pipelines[0].config
        metrics = IMetric.fuse(
            config.metric_names or "acc",
            config.metric_configs,
            metric_weights=config.metric_weights,
        )
        loader = self.pipelines[0]._as_loader(loader_or_x, y, 128)
        outputs = self.inference.get_outputs(loader, metrics=metrics, return_outputs=False)
        assert outputs.metric_outputs is not None
        return outputs.metric_outputs


class FusedInference:
    """Loader-level fusion (all sub-models see the same preprocessed batches)."""

    def __init__(self, pipelines: List[DLInferencePipeline]) -> None:
        self.pipelines = pipelines
        self.model = pipelines[0].model

    def get_outputs(self, loader: IDataLoader, **kwargs: Any) -> InferenceOutputs:
        # sub-inferences must RETURN their outputs (metrics are computed on
        # the fused predictions, not per-member — scoring members
        # individually and returning the first would defeat the ensemble)
        metrics = kwargs.pop("metrics", None)
        sub_kwargs = dict(kwargs, return_outputs=True)
        if metrics is not None:
            sub_kwargs["return_labels"] = True
        all_outputs = [
            p.inference.get_outputs(loader.copy(), **sub_kwargs) for p in self.pipelines
        ]
        fused: Dict[str, np.ndarray] = {}
        for k in all_outputs[0].forward_results:
            fused[k] = np.mean([o.forward_results[k] for o in all_outputs], axis=0)
        first = all_outputs[0]
        metric_outputs = first.metric_outputs
        if metrics is not None:
            from ..constants import LABEL_KEY

            metric_outputs = metrics.evaluate({LABEL_KEY: first.labels}, fused)
        return InferenceOutputs(fused, first.labels, metric_outputs, first.loss_items)


class PipelineTypes(str, Enum):
    DL_TRAINING = "dl.training"
    ML_TRAINING = "ml.training"
    DL_INFERENCE = "dl.inference"
    DL_EVALUATION = "dl.evaluation"


class PackType(str, Enum):
    TRAINING = "training"
    INFERENCE = "inference"
    EVALUATION = "evaluation"


class IEvaluationPipeline(abc.ABC):
    """`evaluate(loader) -> MetricsOutputs` (reference
    `pipeline/schema.py:8`)."""

    @abc.abstractmethod
    def evaluate(self, loader: Any, **kwargs: Any) -> Any:
        ...


IEvaluationPipeline.register(DLEvaluationPipeline)
