from .api import MLBundledProcessorConfig, MLData, MLDataProcessor, MLProcessorConfig
from . import datasets
