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
