from .general import ArtifactCallback, LogMetricsMsgCallback, MLFlowCallback
from .generator import (
    GeneratorCallback,
    ImageClassificationCallback,
    SigmoidCallback,
    VQVAECallback,
    save_image_grid,
)
