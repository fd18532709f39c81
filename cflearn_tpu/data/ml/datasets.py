"""Toy tabular datasets (reference `cflearn/data/ml/datasets.py` — iris /
digits / california / breast from sklearn)."""

from typing import Tuple

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


def mnist_data(*, img_size: int = 28) -> Tuple[np.ndarray, np.ndarray]:
    """MNIST-style images (reference `data/pytorch/datasets.py:17` uses
    torchvision MNIST). Tries torchvision from a local cache; falls back to
    sklearn digits upscaled to `img_size` (zero-egress environments)."""
    try:
        from torchvision.datasets import MNIST  # type: ignore

        ds = MNIST(root="~/.cache/mnist", download=False)
        x = ds.data.numpy().astype(np.float32)[..., None] / 255.0
        y = ds.targets.numpy().astype(np.int64).reshape(-1, 1)
        return x, y
    except Exception:  # noqa: BLE001
        pass
    x, y = digits_data()
    images = x.reshape(-1, 8, 8, 1) / 16.0
    if img_size != 8:
        import jax
        import jax.numpy as jnp

        images = np.asarray(
            jax.image.resize(jnp.asarray(images), (len(images), img_size, img_size, 1), "bilinear")
        )
    return images.astype(np.float32), y
