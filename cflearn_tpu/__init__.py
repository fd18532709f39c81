"""cflearn_tpu — a TPU-native (JAX/XLA/Pallas) deep-learning framework with
the capability surface of carefree-learn (reference at /root/reference)."""

__version__ = "0.1.0"

from . import constants, losses, metrics, models, modules, monitors, optimizers, schedulers
from .schema import Config, DLConfig, MLConfig, TrainerConfig
