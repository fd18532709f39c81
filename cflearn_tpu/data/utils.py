"""Array loader machinery + the host→device prefetcher.

Parity: reference `cflearn/data/utils.py` — `get_weighted_indices` (:46),
`ArrayLoader` (:76-135), `IArrayDataMixin` (:138-212), `TensorBatcher` (:255,
the host→device boundary). TPU-native: `DeviceBatcher` converts numpy batches
to jax arrays (optionally sharded over a mesh's data axis) with an async
prefetch depth so the chip never waits on the host.
"""

import math
from typing import Any, Dict, Iterator, List, Optional, Tuple

import jax
import numpy as np

from ..constants import BATCH_INDICES_KEY, INPUT_KEY, LABEL_KEY, PREDICTIONS_KEY
from ..schema.data import DataConfig, IDataLoader, IDataset
from ..toolkit.misc import np_dict_type, to_jax_dtype


def get_weighted_indices(n: int, weights: Optional[np.ndarray], ensure_all_occur: bool = False) -> np.ndarray:
    """Weighted multinomial resampling (reference `data/utils.py:46`)."""
    indices = np.arange(n)
    if weights is not None:
        p = np.asarray(weights, dtype=np.float64)
        p = p / p.sum()
        numbers = np.random.multinomial(n, p)
        if ensure_all_occur:
            numbers += 1
        indices = indices.repeat(numbers)
    return indices


class ArrayDataset(IDataset):
    """In-memory dict-of-arrays dataset."""

    def __init__(self, arrays: Dict[str, np.ndarray]) -> None:
        self.arrays = arrays
        lens = {v.shape[0] for v in arrays.values() if isinstance(v, np.ndarray)}
        if len(lens) > 1:
            raise ValueError(f"arrays have inconsistent lengths: {lens}")
        self._len = lens.pop() if lens else 0

    def __len__(self) -> int:
        return self._len

    def __getitem__(self, item: Any) -> np_dict_type:
        return {k: v[item] for k, v in self.arrays.items()}


class ArrayLoader(IDataLoader):
    """numpy-native loader: weighted resampling + shuffle + batch slicing +
    `BATCH_INDICES_KEY` injection (reference `data/utils.py:76-135`)."""

    def __init__(
        self,
        dataset: ArrayDataset,
        *,
        batch_size: int = 128,
        shuffle: bool = False,
        drop_last: bool = False,
        sample_weights: Optional[np.ndarray] = None,
        postprocess_fn: Optional[Any] = None,
        for_inference: bool = False,
    ) -> None:
        super().__init__(sample_weights=sample_weights)
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.shuffle_backup = shuffle
        self.drop_last = drop_last
        self.postprocess_fn = postprocess_fn
        self.for_inference = for_inference

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return int(math.ceil(n / self.batch_size))

    def __iter__(self) -> Iterator[np_dict_type]:
        n = len(self.dataset)
        indices = get_weighted_indices(n, self.sample_weights)
        if self.shuffle:
            np.random.shuffle(indices)
        num_batches = len(self)
        for i in range(num_batches):
            batch_indices = indices[i * self.batch_size : (i + 1) * self.batch_size]
            if len(batch_indices) == 0:
                continue
            batch = self.dataset[batch_indices]
            batch[BATCH_INDICES_KEY] = batch_indices
            if self.postprocess_fn is not None:
                batch = self.postprocess_fn(batch, for_inference=self.for_inference)
            yield batch

    def disable_shuffle(self) -> None:
        self.shuffle = False

    def recover_shuffle(self) -> None:
        self.shuffle = self.shuffle_backup


class IArrayDataMixin:
    """Shared `get_loaders` for array-based `IData` (reference `data/utils.py:138-212`)."""

    def get_arrays(self, for_valid: bool) -> Optional[Dict[str, np.ndarray]]:
        raise NotImplementedError

    def get_loaders(self) -> Tuple[IDataLoader, Optional[IDataLoader]]:
        config: DataConfig = self.config  # type: ignore[attr-defined]
        processor = self.processor  # type: ignore[attr-defined]
        train_arrays = self.get_arrays(False)
        assert train_arrays is not None, "`fit` should be called first"
        postprocess = None
        if processor is not None:
            postprocess = lambda item, for_inference: processor.postprocess_item(item, for_inference=for_inference)
        train_loader = ArrayLoader(
            ArrayDataset(train_arrays),
            batch_size=config.batch_size,
            shuffle=config.shuffle_train and not config.for_inference,
            drop_last=config.drop_last,
            sample_weights=self.train_weights,  # type: ignore[attr-defined]
            postprocess_fn=postprocess,
            for_inference=config.for_inference,
        )
        valid_arrays = self.get_arrays(True)
        if valid_arrays is None:
            valid_loader = None
        else:
            valid_loader = ArrayLoader(
                ArrayDataset(valid_arrays),
                batch_size=config.valid_batch_size or config.batch_size,
                shuffle=config.shuffle_valid,
                sample_weights=self.valid_weights,  # type: ignore[attr-defined]
                postprocess_fn=postprocess,
                for_inference=True,
            )
        return train_loader, valid_loader

    def build_loader(
        self,
        x: Any,
        y: Any = None,
        *,
        batch_size: Optional[int] = None,
        shuffle: bool = False,
        **kwargs: Any,
    ) -> IDataLoader:
        config: DataConfig = self.config  # type: ignore[attr-defined]
        bundle = self.transform(x, y)  # type: ignore[attr-defined]
        arrays = {INPUT_KEY: np.asarray(bundle.x_train)}
        if bundle.y_train is not None:
            arrays[LABEL_KEY] = np.asarray(bundle.y_train)
        if bundle.train_others:
            arrays.update({k: v for k, v in bundle.train_others.items() if isinstance(v, np.ndarray)})
        processor = self.processor  # type: ignore[attr-defined]
        postprocess = None
        if processor is not None:
            postprocess = lambda item, for_inference: processor.postprocess_item(item, for_inference=for_inference)
        return ArrayLoader(
            ArrayDataset(arrays),
            batch_size=batch_size or config.batch_size,
            shuffle=shuffle,
            postprocess_fn=postprocess,
            for_inference=True,
        )


class DeviceBatcher:
    """Wraps an `IDataLoader`; numpy batch → jax arrays on device, with
    prefetch (reference `TensorBatcher`, `data/utils.py:255-283` — the
    host→device boundary of the training loop).

    When `sharding` is given, batches are placed with it (data-axis sharded
    arrays for pjit'd steps); otherwise jit's implicit transfer is used.
    """

    def __init__(
        self,
        loader: IDataLoader,
        *,
        sharding: Optional[jax.sharding.Sharding] = None,
        prefetch: int = 2,
        pad_to_batch: bool = False,
    ) -> None:
        self.loader = loader
        self.sharding = sharding
        self.prefetch = max(1, prefetch)
        self.pad_to_batch = pad_to_batch

    def __len__(self) -> int:
        return len(self.loader)

    def _data_divisor(self) -> int:
        if self.sharding is None:
            return 1
        mesh = getattr(self.sharding, "mesh", None)
        if mesh is None:
            return 1
        spec = getattr(self.sharding, "spec", None)
        axes = spec[0] if spec else None
        if axes is None:
            return 1
        if isinstance(axes, str):
            axes = (axes,)
        div = 1
        for a in axes:
            div *= mesh.shape[a]
        return div

    def _convert(
        self, np_batch: np_dict_type, *, allow_pad: bool = True, to_device: bool = False
    ) -> Dict[str, Any]:
        batch: Dict[str, Any] = {}
        divisor = self._data_divisor()
        for k, v in np_batch.items():
            if isinstance(v, np.ndarray) and v.dtype != object:
                v = to_jax_dtype(v)
                if allow_pad and self.pad_to_batch and v.shape[0] < self.loader.batch_size:
                    pad = self.loader.batch_size - v.shape[0]
                    v = np.concatenate([v, np.repeat(v[-1:], pad, axis=0)], axis=0)
                if divisor > 1 and v.ndim >= 1 and v.shape[0] % divisor != 0:
                    # pad to a data-axis multiple by cycling samples — the
                    # DistributedSampler duplication strategy (reference
                    # `data/pytorch/api.py:62-71`), shape-static for XLA
                    pad = divisor - (v.shape[0] % divisor)
                    reps = np.take(v, np.arange(pad) % v.shape[0], axis=0)
                    v = np.concatenate([v, reps], axis=0)
                if self.sharding is not None:
                    batch[k] = jax.device_put(v, self.sharding)
                elif to_device:
                    # ASYNC host→device upload (prefetch-to-device): started
                    # here, `prefetch` batches ahead of the consuming step,
                    # so the transfer overlaps the previous steps' compute
                    # instead of riding the jit call's critical path (r5
                    # measured: the GAN 64px fit loop is INPUT-bound — a
                    # 3.1 MB step batch costs far more to upload than the
                    # 4.3 ms step computes; step batches only — whole-dataset
                    # get_one/full_batch stay host-side)
                    batch[k] = jax.device_put(v)
                else:
                    batch[k] = v
            else:
                batch[k] = v
        return batch

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        import collections
        import itertools

        it = iter(self.loader)
        queue: "collections.deque" = collections.deque()
        for np_batch in itertools.islice(it, self.prefetch):
            queue.append(self._convert(np_batch, to_device=True))
        while queue:
            out = queue.popleft()
            try:
                queue.append(self._convert(next(it), to_device=True))
            except StopIteration:
                pass
            yield out

    def get_one_batch(self) -> Dict[str, Any]:
        # whole-dataset/one-off batches are NOT step batches: padding them
        # with duplicated rows would hand consumers phantom samples
        return self._convert(self.loader.get_one_batch(), allow_pad=False)

    def get_full_batch(self) -> Dict[str, Any]:
        return self._convert(self.loader.get_full_batch(), allow_pad=False)


def predict_array_data(
    m: Any,
    data: "IArrayDataMixin",
    run_fn: Optional[Any] = None,
    *,
    batch_size: Optional[int] = None,
    **predict_kwargs: Any,
) -> Dict[str, np.ndarray]:
    """Run a model over every batch of `data`'s train loader and concatenate
    the outputs (reference `data/utils.py:226`)."""
    if batch_size is not None:
        data.config.batch_size = batch_size
    loader = data.get_loaders()[0]
    results: Dict[str, List[np.ndarray]] = {}
    for i, batch in enumerate(loader):
        if run_fn is None:
            out = m.run(batch, training=False, **predict_kwargs)
        else:
            out = run_fn(m, i, batch, **predict_kwargs)
        if not isinstance(out, dict):
            out = {PREDICTIONS_KEY: out}
        for k, v in out.items():
            if v is not None:
                results.setdefault(k, []).append(np.asarray(v))
    return {k: np.concatenate(v, axis=0) for k, v in results.items()}


# reference interface names (`data/utils.py` IArrayDataset / ArrayDictDataset)
IArrayDataset = ArrayDataset
