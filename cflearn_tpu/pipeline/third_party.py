"""Third-party evaluation bridge.

Parity: reference `cflearn/pipeline/third_party.py:17-44` — `IPredictor` /
`SKLearnClassifier` / `GeneralEvaluationPipeline`: evaluate ANY external
predictor (e.g. a fitted sklearn model) with this framework's metric system
so its scores are directly comparable with `cf.evaluate` tables.
"""

from abc import ABC, abstractmethod
from typing import Any

import numpy as np

from ..constants import INPUT_KEY, PREDICTIONS_KEY
from ..schema.config import DLConfig
from ..schema.data import IDataLoader
from ..schema.metrics_schema import IMetric, MetricsOutputs


class IPredictor(ABC):
    @abstractmethod
    def predict(self, x: np.ndarray) -> np.ndarray:
        """features → prediction logits/values."""


class SKLearnClassifier(IPredictor):
    """Wrap a fitted sklearn classifier (reference `third_party.py:22-27`):
    log-probabilities play the role of logits for acc/auc metrics."""

    def __init__(self, m: Any) -> None:
        self.m = m

    def predict(self, x: np.ndarray) -> np.ndarray:
        return self.m.predict_log_proba(x)


class GeneralEvaluationPipeline:
    """Metric evaluation of an `IPredictor` (reference `third_party.py:30-44`)."""

    def __init__(self, config: DLConfig, predictor: IPredictor) -> None:
        if config.metric_names is None:
            raise ValueError(
                "`metric_names` should be provided in `config` for `GeneralEvaluationPipeline`"
            )
        self.m = predictor
        self.metrics = IMetric.fuse(
            config.metric_names,
            config.metric_configs,
            metric_weights=config.metric_weights,
        )

    def evaluate(self, loader: IDataLoader) -> MetricsOutputs:
        full_batch = loader.get_full_batch()
        predictions = self.m.predict(full_batch[INPUT_KEY])
        return self.metrics.evaluate(full_batch, {PREDICTIONS_KEY: predictions})
