"""Placeholder torchvision for the reference oracle (see ../README.md) —
only needs to satisfy `from torchvision.datasets import MNIST`-style imports;
nothing from it executes during diffusion-model construction."""

import sys
import types

from cftool import _make_module, _placeholder_class  # reuse the machinery

for _sub in ("datasets", "transforms", "transforms.functional", "models", "utils", "ops", "io"):
    _make_module(f"torchvision.{_sub}")


def __getattr__(name):
    if name.startswith("__") and name.endswith("__"):
        raise AttributeError(name)
    return _placeholder_class(f"torchvision.{name}")
