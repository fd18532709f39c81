"""Image-folder preparation + packed random-access cache.

Parity: reference `cflearn/data/blocks/cv/image_folder.py` —
`prepare_image_folder` (:249, parallel label-making/copying with optional
LMDB packing :42/:532), `IPreparation`/`DefaultPreparation`/
`ResizedPreparation` (:52-212), `ImageFolderDataset` (:693).

TPU-native: the LMDB C library is replaced by packed npz shards (uniform
uint8 NHWC tensors + labels) with memory-friendly per-shard loading — the
"packed random-access image cache" capability (SURVEY.md §2.9) without
native deps; decode/resize happens once at preparation time.
"""

import json
import os
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Dict, List, NamedTuple, Optional, Tuple

import numpy as np

from ...constants import INPUT_KEY, LABEL_KEY
from ...schema.data import DataConfig, IData, IDataset, IDataBlock
from ..utils import ArrayLoader, IArrayDataMixin

META_FILE = "meta.json"
IMG_EXTENSIONS = {".png", ".jpg", ".jpeg", ".bmp", ".webp"}


class IPreparation:
    """Filter/label hooks (reference `image_folder.py:52`)."""

    def is_ready(self, path: str) -> bool:
        return os.path.splitext(path)[1].lower() in IMG_EXTENSIONS

    def get_label(self, path: str) -> Any:
        return os.path.basename(os.path.dirname(path))

    def process(self, image: np.ndarray) -> np.ndarray:
        return image


class DefaultPreparation(IPreparation):
    pass


class ResizedPreparation(IPreparation):
    def __init__(self, img_size: int = 224) -> None:
        self.img_size = img_size

    def process(self, image: np.ndarray) -> np.ndarray:
        import jax
        import jax.numpy as jnp

        out = jax.image.resize(
            jnp.asarray(image.astype(np.float32)),
            (self.img_size, self.img_size, image.shape[-1]),
            "bilinear",
        )
        return np.clip(np.asarray(out), 0, 255).astype(np.uint8)


def _load_image(path: str) -> Optional[np.ndarray]:
    # PIL missing is an environment error, not a bad image — swallowing it
    # would "succeed" with an empty dataset
    from PIL import Image

    try:
        img = Image.open(path).convert("RGB")
        return np.asarray(img, dtype=np.uint8)
    except Exception:  # noqa: BLE001 — undecodable/corrupt image
        return None


def prepare_image_folder(
    src_folder: str,
    dst_folder: str,
    *,
    preparation: Optional[IPreparation] = None,
    valid_split: float = 0.1,
    shard_size: int = 1024,
    num_jobs: int = 8,
    force: bool = False,
) -> str:
    """Scan `src_folder` (class-subdir layout), decode + process every image
    once, and write packed npz shards under `dst_folder`."""
    preparation = preparation or ResizedPreparation(224)
    meta_path = os.path.join(dst_folder, META_FILE)
    if os.path.isfile(meta_path) and not force:
        return dst_folder
    paths: List[str] = []
    for root, _, files in os.walk(src_folder):
        for f in sorted(files):
            p = os.path.join(root, f)
            if preparation.is_ready(p):
                paths.append(p)
    if not paths:
        raise ValueError(f"no images found under '{src_folder}'")
    labels = [preparation.get_label(p) for p in paths]
    classes = sorted(set(labels))
    label_map = {c: i for i, c in enumerate(classes)}
    indices = np.random.permutation(len(paths))
    n_valid = max(1, int(round(len(paths) * valid_split))) if valid_split else 0
    splits = {"valid": indices[:n_valid], "train": indices[n_valid:]}
    os.makedirs(dst_folder, exist_ok=True)
    from ...native import has_native, write_records

    use_native = has_native()
    shard_info: Dict[str, List[Dict[str, Any]]] = {}
    image_shape: Optional[List[int]] = None
    with ThreadPoolExecutor(max_workers=num_jobs) as pool:
        for split, split_idx in splits.items():
            shard_info[split] = []
            if use_native:
                # one native rcache store per split: O(1) mmap random access
                # (the LMDB-replacement path, SURVEY §2.9)
                images_all: List[np.ndarray] = []
                labels_all: List[int] = []
                decoded = pool.map(lambda i: (_load_image(paths[i]), labels[i]), split_idx)
                for img, label in decoded:
                    if img is None:
                        continue
                    processed = preparation.process(img)
                    if image_shape is not None and list(processed.shape) != image_shape:
                        raise ValueError(
                            "images process to differing shapes "
                            f"({image_shape} vs {list(processed.shape)}); use a "
                            "resizing preparation (e.g. ResizedPreparation) for "
                            "folders with mixed image sizes"
                        )
                    image_shape = list(processed.shape)
                    images_all.append(processed.reshape(-1))
                    labels_all.append(label_map[label])
                if not images_all:
                    continue
                records = np.stack(images_all)
                store_name = f"{split}.rcache"
                write_records(os.path.join(dst_folder, store_name), records)
                np.save(
                    os.path.join(dst_folder, f"{split}_labels.npy"),
                    np.asarray(labels_all, dtype=np.int64)[:, None],
                )
                shard_info[split].append({"file": store_name, "num": len(images_all), "native": True})
                continue
            for s in range(0, len(split_idx), shard_size):
                chunk = split_idx[s : s + shard_size]
                images = list(pool.map(lambda i: _load_image(paths[i]), chunk))
                keep = [(img, labels[i]) for img, i in zip(images, chunk) if img is not None]
                if not keep:
                    continue
                processed = [preparation.process(img) for img, _ in keep]
                shapes = {p_.shape for p_ in processed}
                if len(shapes) > 1 or (image_shape is not None and list(processed[0].shape) != image_shape):
                    raise ValueError(
                        "images process to differing shapes; use a resizing "
                        "preparation (e.g. ResizedPreparation) for folders "
                        "with mixed image sizes"
                    )
                arr = np.stack(processed)
                image_shape = list(arr.shape[1:])
                y = np.array([label_map[l] for _, l in keep], dtype=np.int64)[:, None]
                shard_name = f"{split}_{s // shard_size:05d}.npz"
                np.savez_compressed(os.path.join(dst_folder, shard_name), images=arr, labels=y)
                shard_info[split].append({"file": shard_name, "num": len(keep)})
    with open(meta_path, "w") as f:
        json.dump(
            {"classes": classes, "shards": shard_info, "image_shape": image_shape, "native": use_native},
            f,
            indent=2,
        )
    return dst_folder


class PackedImageDataset(IDataset):
    """Random-access over packed shards with a 1-shard LRU (reference
    `ImageFolderDataset`, `image_folder.py:693`)."""

    def __init__(self, folder: str, split: str = "train") -> None:
        with open(os.path.join(folder, META_FILE), "r") as f:
            meta = json.load(f)
        self.folder = folder
        self.split = split
        self.classes = meta["classes"]
        self.shards = meta["shards"][split]
        self.image_shape = meta.get("image_shape")
        self.offsets = np.cumsum([0] + [s["num"] for s in self.shards])
        self._cache_idx = -1
        self._cache: Optional[Tuple[np.ndarray, np.ndarray]] = None
        self._store = None
        self._store_labels: Optional[np.ndarray] = None
        if self.shards and self.shards[0].get("native"):
            from ...native import RecordCache

            self._store = RecordCache(os.path.join(folder, self.shards[0]["file"]))
            self._store_labels = np.load(os.path.join(folder, f"{split}_labels.npy"))

    def __len__(self) -> int:
        return int(self.offsets[-1])

    def __deepcopy__(self, memo: Any) -> "PackedImageDataset":
        # the native store holds a ctypes handle (unpicklable, and a shared
        # handle would be double-closed) — a copy re-opens the mmap instead
        return PackedImageDataset(self.folder, self.split)

    def _shard(self, shard_idx: int) -> Tuple[np.ndarray, np.ndarray]:
        if shard_idx != self._cache_idx:
            path = os.path.join(self.folder, self.shards[shard_idx]["file"])
            with np.load(path) as z:
                self._cache = (z["images"], z["labels"])
            self._cache_idx = shard_idx
        assert self._cache is not None
        return self._cache

    def __getitem__(self, item: Any) -> Dict[str, np.ndarray]:
        indices = np.atleast_1d(np.asarray(item))
        if self._store is not None:
            flat = self._store.gather(indices.astype(np.int64))
            images = flat.reshape((len(indices), *self.image_shape))
            return {
                INPUT_KEY: images,
                LABEL_KEY: self._store_labels[indices].reshape(-1, 1),
            }
        images = []
        labels = []
        for i in indices:
            shard_idx = int(np.searchsorted(self.offsets, i, side="right")) - 1
            imgs, ys = self._shard(shard_idx)
            local = int(i - self.offsets[shard_idx])
            images.append(imgs[local])
            labels.append(ys[local])
        return {
            INPUT_KEY: np.stack(images),
            LABEL_KEY: np.stack(labels).reshape(-1, 1),
        }


@IData.register("image_folder")
class ImageFolderData(IArrayDataMixin, IData):
    """IData over a prepared packed folder."""

    def __init__(self) -> None:
        super().__init__()
        self.folder: Optional[str] = None

    @classmethod
    def from_folder(
        cls,
        folder: str,
        *,
        config: Optional[DataConfig] = None,
        processor_config: Any = None,
    ) -> "ImageFolderData":
        self = cls.init(config, processor_config)
        self.folder = folder
        return self

    def to_info(self) -> Dict[str, Any]:
        info = super().to_info()
        info["folder"] = self.folder
        return info

    def from_info(self, info: Dict[str, Any]) -> None:
        super().from_info(info)
        self.folder = info.get("folder")

    def _dataset(self, split: str) -> "PackedImageDataset":
        cache = getattr(self, "_dataset_cache", None)
        if cache is None:
            cache = {}
            self._dataset_cache = cache
        if split not in cache:
            cache[split] = PackedImageDataset(self.folder, split)
        return cache[split]

    def get_loaders(self) -> Any:
        assert self.folder is not None
        postprocess = None
        if self.processor is not None:
            postprocess = lambda item, for_inference: self.processor.postprocess_item(item, for_inference=for_inference)
        train = ArrayLoader(
            self._dataset("train"),
            batch_size=self.config.batch_size,
            shuffle=self.config.shuffle_train,
            drop_last=self.config.drop_last,
            sample_weights=getattr(self, "train_weights", None),
            postprocess_fn=postprocess,
            for_inference=self.config.for_inference,
        )
        try:
            valid_ds = self._dataset("valid")
            valid = ArrayLoader(
                valid_ds,
                batch_size=self.config.valid_batch_size or self.config.batch_size,
                postprocess_fn=postprocess,
                for_inference=True,
            ) if len(valid_ds) else None
        except (KeyError, IndexError, FileNotFoundError):
            valid = None
        return train, valid

    @property
    def num_train(self) -> int:
        assert self.folder is not None
        return len(self._dataset("train"))

    @property
    def num_valid(self) -> int:
        assert self.folder is not None
        try:
            return len(self._dataset("valid"))
        except (KeyError, IndexError):
            return 0


default_image_extensions = {".jpg", ".png", ".jpeg"}


class CollectResults(NamedTuple):
    all_img_paths: List[str]
    hierarchy_list: List[List[str]]


def collect_images(
    src_folder: str,
    *,
    prefix: Optional[str] = None,
    extensions: Optional[Any] = None,
    filter_fn: Optional[Any] = None,
) -> CollectResults:
    """Walk `src_folder` and collect image paths + their folder hierarchies
    (reference `data/blocks/cv/image_folder.py:224`)."""
    if extensions is None:
        extensions = default_image_extensions
    prefix_idx = len(prefix.split(os.path.sep)) if prefix is not None else 0
    all_img_paths: List[str] = []
    hierarchy_list: List[List[str]] = []
    for root, _, files in sorted(os.walk(src_folder)):
        for name in sorted(files):
            if os.path.splitext(name)[1].lower() not in extensions:
                continue
            path = os.path.join(root, name)
            hierarchy = path.split(os.path.sep)[prefix_idx:]
            if filter_fn is not None and not filter_fn(hierarchy):
                continue
            hierarchy_list.append(hierarchy)
            all_img_paths.append(path)
    return CollectResults(all_img_paths, hierarchy_list)


@IDataBlock.register("image_folder")
class ImageFolderBlock(IDataBlock):
    """Turn a raw image folder (`bundle.x_train` = src path) into a prepared
    packed folder via `prepare_image_folder` (reference
    `data/blocks/cv/image_folder.py:728`)."""

    tgt_folder: Optional[str]
    preparation_pack: Optional[Dict[str, Any]]
    force_rerun: bool

    @property
    def fields(self) -> List[str]:
        return ["tgt_folder", "preparation_pack", "force_rerun"]

    @property
    def init_fields(self) -> Dict[str, Any]:
        return {"tgt_folder": None, "preparation_pack": None, "force_rerun": False}

    def fit_transform(self, bundle: Any) -> Any:
        return self.transform(bundle, False)

    def transform(self, bundle: Any, for_inference: bool) -> Any:
        src = bundle.x_train
        if not isinstance(src, str):
            return bundle
        tgt = self.tgt_folder or (src.rstrip(os.path.sep) + "_prepared")
        pack = dict(self.preparation_pack or {})
        prep_type = pack.pop("type", "resized")
        preparation = (
            ResizedPreparation(**pack) if prep_type == "resized" else DefaultPreparation()
        )
        prepare_image_folder(src, tgt, preparation=preparation, force=self.force_rerun)
        bundle.x_train = tgt
        return bundle
