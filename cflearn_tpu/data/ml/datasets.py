"""Toy tabular datasets (reference `cflearn/data/ml/datasets.py` — iris /
digits / california / breast from sklearn)."""

from typing import Any, Tuple

import numpy as np


def _from_sklearn(loader_name: str) -> Tuple[np.ndarray, np.ndarray]:
    from sklearn import datasets  # lazy; sklearn is available in CI images

    loader = getattr(datasets, loader_name)
    bunch = loader()
    x = np.asarray(bunch.data, dtype=np.float32)
    y = np.asarray(bunch.target).reshape(-1, 1)
    return x, y


def iris_data() -> Tuple[np.ndarray, np.ndarray]:
    x, y = _from_sklearn("load_iris")
    return x, y.astype(np.int64)


def digits_data() -> Tuple[np.ndarray, np.ndarray]:
    x, y = _from_sklearn("load_digits")
    return x, y.astype(np.int64)


def breast_data() -> Tuple[np.ndarray, np.ndarray]:
    x, y = _from_sklearn("load_breast_cancer")
    return x, y.astype(np.int64)


def california_data() -> Tuple[np.ndarray, np.ndarray]:
    x, y = _from_sklearn("fetch_california_housing")
    return x, y.astype(np.float32)
