"""Training monitors.

Parity: reference `cflearn/monitors.py` — `BasicMonitor` (:10, snapshot on
best score / terminate on worst with patience=25), `MeanStdMonitor` (:38),
`PlateauMonitor` (:75), `ConservativeMonitor` (:119), `LazyMonitor` (:128).
"""

import math
from typing import Any, Deque, Optional

from collections import deque

from .schema.train_schema import TrainerMonitor


@TrainerMonitor.register("basic")
class BasicMonitor(TrainerMonitor):
    """Snapshot on new best; terminate when a score falls below the first-seen
    worst score after patience steps (reference `monitors.py:10`)."""

    def __init__(self, patience: int = 25) -> None:
        super().__init__()
        self.patience = patience
        self.num_snapshot = 0
        self.best_score = -math.inf
        self.worst_score: Optional[float] = None

    def should_snapshot(self, new_score: float) -> bool:
        self.num_snapshot += 1
        if self.worst_score is None:
            self.worst_score = new_score
        else:
            self.worst_score = min(self.worst_score, new_score)
        if new_score > self.best_score:
            self.best_score = new_score
            return True
        return False

    def should_terminate(self, new_score: float) -> bool:
        if self.num_snapshot <= self.patience:
            return False
        assert self.worst_score is not None
        return new_score <= self.worst_score

    def punish_extension(self) -> None:
        pass


@TrainerMonitor.register("mean_std")
class MeanStdMonitor(TrainerMonitor):
    """Terminate when score drops below (mean - ratio * std) of its history —
    an overfit-level heuristic (reference `monitors.py:38`)."""

    def __init__(self, window: int = 25, overfit_tolerance: float = 25.0) -> None:
        super().__init__()
        self.window = window
        self.overfit_tolerance = overfit_tolerance
        self._scores: Deque[float] = deque(maxlen=window)
        self.best_score = -math.inf
        self._overfit_level = 0.0

    def should_snapshot(self, new_score: float) -> bool:
        self._scores.append(new_score)
        if new_score > self.best_score:
            self.best_score = new_score
            return True
        return False

    def should_terminate(self, new_score: float) -> bool:
        if len(self._scores) < max(4, self.window // 2):
            return False
        import numpy as np

        arr = np.array(self._scores)
        mean, std = float(arr.mean()), float(arr.std())
        if std <= 1e-12:
            return False
        level = max(0.0, (mean - new_score) / std)
        self._overfit_level += level
        self._overfit_level *= 0.9
        return self._overfit_level >= self.overfit_tolerance

    def punish_extension(self) -> None:
        self.overfit_tolerance *= 0.5


@TrainerMonitor.register("plateau")
class PlateauMonitor(TrainerMonitor):
    """Terminate on plateau of the score/std ratio (reference `monitors.py:75`)."""

    def __init__(self, window: int = 25, plateau_tolerance: float = 25.0) -> None:
        super().__init__()
        self.window = window
        self.plateau_tolerance = plateau_tolerance
        self._scores: Deque[float] = deque(maxlen=window)
        self.best_score = -math.inf
        self._plateau_level = 0.0

    def should_snapshot(self, new_score: float) -> bool:
        self._scores.append(new_score)
        if new_score > self.best_score:
            self.best_score = new_score
            return True
        return False

    def should_terminate(self, new_score: float) -> bool:
        if len(self._scores) < self.window:
            return False
        import numpy as np

        arr = np.array(self._scores)
        std = float(arr.std())
        mean = float(np.abs(arr).mean()) + 1e-12
        ratio = std / mean
        if ratio < 0.01:
            self._plateau_level += 1.0
        else:
            self._plateau_level *= 0.5
        return self._plateau_level >= self.plateau_tolerance

    def punish_extension(self) -> None:
        self.plateau_tolerance *= 0.5


@TrainerMonitor.register("conservative")
class ConservativeMonitor(TrainerMonitor):
    """Always snapshot, never terminate (reference `monitors.py:119`)."""

    def should_snapshot(self, new_score: float) -> bool:
        return True

    def should_terminate(self, new_score: float) -> bool:
        return False


@TrainerMonitor.register("lazy")
class LazyMonitor(TrainerMonitor):
    """Never snapshot, never terminate (reference `monitors.py:128`)."""

    def should_snapshot(self, new_score: float) -> bool:
        return False

    def should_terminate(self, new_score: float) -> bool:
        return False
