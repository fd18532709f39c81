from .array import ArrayData, ArrayDictData
from .utils import ArrayDataset, ArrayLoader, DeviceBatcher, IArrayDataMixin, get_weighted_indices
