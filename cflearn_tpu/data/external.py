"""Adapter for external / third-party datasets.

Parity: reference `cflearn/data/pytorch/api.py` — `TorchData`/
`TorchDataLoader` wrap `torch.utils.data.Dataset`s and yield numpy dict
batches (:115-123), with DDP sharding via `DistributedSampler` (:62-71).

TPU-native: `ExternalData` wraps ANY indexable dataset (including torch
datasets — torch stays a host-side data source only); batches convert to
numpy dicts; multi-process sharding slices the index space per
`jax.process_index()` (the DistributedSampler role).
"""

from typing import Any, Callable, Dict, Optional, Tuple

import numpy as np

from ..constants import INPUT_KEY, LABEL_KEY
from ..schema.data import DataConfig, IData, IDataset
from .utils import ArrayLoader, IArrayDataMixin


class ExternalDataset(IDataset):
    """Wraps an indexable dataset yielding (x, y) tuples, dicts, or arrays."""

    def __init__(
        self,
        dataset: Any,
        *,
        transform: Optional[Callable[[Any], Any]] = None,
        shard_by_process: bool = True,
    ) -> None:
        self.dataset = dataset
        self.transform = transform
        import jax

        if shard_by_process and jax.process_count() > 1:
            # round-robin shard: covers the tail (contiguous blocks dropped
            # n % P samples) and interleaves any sorted-by-class ordering
            # (the DistributedSampler strategy, reference
            # `data/pytorch/api.py:62-71`)
            self._indices = np.arange(jax.process_index(), len(dataset), jax.process_count())
        else:
            self._indices = np.arange(len(dataset))

    def __len__(self) -> int:
        return len(self._indices)

    def _item(self, i: int) -> Dict[str, np.ndarray]:
        item = self.dataset[int(self._indices[i])]
        if self.transform is not None:
            item = self.transform(item)
        if isinstance(item, dict):
            return {k: np.asarray(v) for k, v in item.items()}
        if isinstance(item, (tuple, list)) and len(item) == 2:
            x, y = item
            return {INPUT_KEY: np.asarray(x), LABEL_KEY: np.asarray(y)}
        return {INPUT_KEY: np.asarray(item)}

    def __getitem__(self, item: Any) -> Dict[str, np.ndarray]:
        indices = np.atleast_1d(np.asarray(item))
        rows = [self._item(int(i)) for i in indices]
        keys = rows[0].keys()
        batch = {k: np.stack([r[k] for r in rows]) for k in keys}
        if LABEL_KEY in batch and batch[LABEL_KEY].ndim == 1:
            batch[LABEL_KEY] = batch[LABEL_KEY][:, None]
        return batch


@IData.register("external")
class ExternalData(IArrayDataMixin, IData):
    """IData over external train/valid datasets."""

    def __init__(self) -> None:
        super().__init__()
        self.train_dataset: Optional[ExternalDataset] = None
        self.valid_dataset: Optional[ExternalDataset] = None

    @classmethod
    def from_datasets(
        cls,
        train: Any,
        valid: Any = None,
        *,
        config: Optional[DataConfig] = None,
        transform: Optional[Callable[[Any], Any]] = None,
        shard_valid: bool = False,
    ) -> "ExternalData":
        self = cls.init(config)
        self.train_dataset = ExternalDataset(train, transform=transform)
        # valid is NOT sharded by default: every rank must see the same
        # metrics or per-rank monitor terminate/extend decisions diverge
        # (one rank leaves the loop while others enter a collective → hang)
        self.valid_dataset = (
            ExternalDataset(valid, transform=transform, shard_by_process=shard_valid)
            if valid is not None
            else None
        )
        return self

    def get_loaders(self) -> Tuple[Any, Optional[Any]]:
        assert self.train_dataset is not None
        postprocess = None
        if self.processor is not None:
            postprocess = lambda item, for_inference: self.processor.postprocess_item(item, for_inference=for_inference)
        train = ArrayLoader(
            self.train_dataset,
            batch_size=self.config.batch_size,
            shuffle=self.config.shuffle_train,
            drop_last=self.config.drop_last,
            sample_weights=getattr(self, "train_weights", None),
            postprocess_fn=postprocess,
            for_inference=self.config.for_inference,
        )
        valid = None
        if self.valid_dataset is not None:
            valid = ArrayLoader(
                self.valid_dataset,
                batch_size=self.config.valid_batch_size or self.config.batch_size,
                shuffle=self.config.shuffle_valid,
                sample_weights=getattr(self, "valid_weights", None),
                postprocess_fn=postprocess,
                for_inference=True,
            )
        return train, valid

    @property
    def num_train(self) -> int:
        return len(self.train_dataset) if self.train_dataset is not None else 0

    @property
    def num_valid(self) -> int:
        return len(self.valid_dataset) if self.valid_dataset is not None else 0


# reference config name (`data/utils.py` TorchDataConfig — external-dataset
# loader config; the shared DataConfig plays that role here)
TorchDataConfig = DataConfig
