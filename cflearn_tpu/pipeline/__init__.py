from .api import (
    DLEvaluationPipeline,
    DLInferencePipeline,
    DLPipelineSerializer,
    DLTrainingPipeline,
    MLEvaluationPipeline,
    MLInferencePipeline,
    MLTrainingPipeline,
    TrainingPipeline,
)
from .blocks import Block
from .common import Pipeline
from .export import aot_compile, export_model, load_exported, pack_stablehlo
