"""cflearn_tpu — a TPU-native (JAX/XLA/Pallas) deep-learning framework with
the capability surface of carefree-learn (reference at /root/reference)."""

__version__ = "0.1.0"

from . import constants, losses, metrics, models, modules, monitors, optimizers, schedulers
from .schema import Config, DLConfig, MLConfig, TrainerConfig

from . import callbacks, data
from .api import (
    evaluate,
    fit_array,
    fit_ml,
    fuse_evaluation,
    fuse_inference,
    load_evaluation,
    load_inference,
    load_training,
    make_toy_ml_model,
    pack,
    save,
)
from .pipeline import DLPipelineSerializer, MLTrainingPipeline
from .schema.model import IDLModel
from .trainer import Trainer

from . import dist, ops, zoo
from .api.common import APIPool, IAPI, Weights
from .api.cv import TranslatorAPI
from .api.multimodal import (
    CLIPExtractor,
    ControlledDiffusionAPI,
    DiffusionAPI,
    InpaintingMode,
    InpaintingSettings,
)
from .zoo.common import SDVersions, get_sd_tag
