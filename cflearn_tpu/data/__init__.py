from .array import ArrayData, ArrayDictData
from .utils import ArrayDataset, ArrayLoader, DeviceBatcher, IArrayDataMixin, get_weighted_indices
from .blocks import ml as ml_blocks
from .ml.api import MLData
from .blocks import cv as cv_blocks
