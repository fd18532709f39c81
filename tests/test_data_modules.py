"""Data-module round trips (reference analogue: `tests/test_data_modules.py`
— numpy/tensor/dict/ML data + image-folder preparation)."""

import numpy as np

from cflearn_tpu.constants import INPUT_KEY, LABEL_KEY
from cflearn_tpu.data import ArrayData, ArrayDictData, MLData
from cflearn_tpu.data.external import ExternalData
from cflearn_tpu.schema.data import DataConfig, IData
from cflearn_tpu.toolkit.serialization import Serializer


def test_array_data_roundtrip(tmp_path) -> None:
    x = np.random.randn(32, 4).astype(np.float32)
    y = np.random.randint(0, 2, (32, 1))
    data = ArrayData.init().fit(x, y)
    Serializer.save(str(tmp_path / "data"), data)
    loaded = Serializer.load(str(tmp_path / "data"), IData)
    assert loaded.num_train == 32
    batch = loaded.get_loaders()[0].get_one_batch()
    np.testing.assert_array_equal(np.sort(batch[LABEL_KEY].ravel()), np.sort(y.ravel()))


def test_array_dict_data() -> None:
    x = {"input": np.random.randn(16, 4).astype(np.float32), "extra": np.random.randn(16, 2).astype(np.float32)}
    y = np.random.randint(0, 2, (16, 1))
    data = ArrayDictData.init().fit(x, y)
    batch = data.get_loaders()[0].get_one_batch()
    assert "extra" in batch and batch["extra"].shape == (16, 2)


def test_ml_data_serialization_roundtrip(tmp_path) -> None:
    n = 60
    x = np.empty((n, 3), dtype=object)
    x[:, 0] = np.random.randn(n)
    x[:, 1] = np.random.choice(["a", "b"], n)
    x[:, 2] = np.random.randn(n)
    y = np.random.randint(0, 2, (n, 1))
    data = MLData.init().fit(x, y)
    Serializer.save(str(tmp_path / "ml"), data, save_npd=False)
    loaded = Serializer.load(str(tmp_path / "ml"), IData, load_npd=False)
    # processor state (recognizer maps, preprocessor stats) must round trip:
    # transforming the same raw rows must give identical arrays
    b1 = data.transform(x[:8], y[:8])
    b2 = loaded.transform(x[:8], y[:8])
    np.testing.assert_allclose(np.asarray(b1.x_train, dtype=np.float32), np.asarray(b2.x_train, dtype=np.float32))


def test_sample_weights() -> None:
    x = np.random.randn(40, 2).astype(np.float32)
    y = np.zeros((40, 1), dtype=np.int64)
    data = ArrayData.init().fit(x, y)
    weights = np.zeros(40, dtype=np.float32)
    weights[:5] = 1.0  # only the first 5 samples should ever appear
    data.set_sample_weights(weights)
    loader, _ = data.get_loaders()
    batch = loader.get_one_batch()
    seen = {tuple(row) for row in batch[INPUT_KEY]}
    allowed = {tuple(row) for row in x[:5]}
    assert seen <= allowed


def test_cv_runtime_blocks() -> None:
    from cflearn_tpu.data.blocks.cv import (
        AffineNormalizeBlock,
        CenterCropBlock,
        ResizeBlock,
        ToRGBBlock,
    )

    item = {INPUT_KEY: (np.random.rand(10, 20, 30, 1) * 255).astype(np.uint8)}
    item = ToRGBBlock().postprocess_item(item, False)
    assert item[INPUT_KEY].shape[-1] == 3
    item = ResizeBlock(size=16).postprocess_item(item, False)
    assert item[INPUT_KEY].shape[1:3] == (16, 16)
    item = CenterCropBlock(size=8).postprocess_item(item, False)
    assert item[INPUT_KEY].shape[1:3] == (8, 8)
    item = AffineNormalizeBlock(center=127.5, scale=127.5).postprocess_item(item, False)
    assert abs(float(item[INPUT_KEY].mean())) < 1.5


def test_external_data() -> None:
    class ToyDataset:
        def __len__(self) -> int:
            return 20

        def __getitem__(self, i: int):
            return np.full((4,), i, dtype=np.float32), i % 3

    data = ExternalData.from_datasets(ToyDataset(), config=DataConfig(batch_size=8, shuffle_train=False))
    loader, valid = data.get_loaders()
    batch = loader.get_one_batch()
    assert batch[INPUT_KEY].shape == (8, 4)
    assert batch[LABEL_KEY].shape == (8, 1)
    assert valid is None


def test_data_config_pad_divisible() -> None:
    from cflearn_tpu.data.utils import DeviceBatcher
    from cflearn_tpu.parallel.mesh import data_sharding, make_mesh
    from cflearn_tpu.schema.config import MeshConfig

    mc = MeshConfig()
    mc.from_info({"data": 8})
    mesh = make_mesh(mc)
    x = np.random.randn(30, 4).astype(np.float32)
    data = ArrayData.init().fit(x)
    loader, _ = data.get_loaders()
    batcher = DeviceBatcher(loader, sharding=data_sharding(mesh))
    batch = next(iter(batcher))
    # 30 → padded to a multiple of 8
    assert batch[INPUT_KEY].shape[0] % 8 == 0


def test_csv_valid_label_column_and_feature_only_inference(tmp_path) -> None:
    """Regression (code review): (a) the valid CSV's label column was
    re-derived from the mutated header (wrong column when the label is not
    last); (b) a feature-only inference CSV lost its last feature."""
    import csv

    import cflearn_tpu as cf

    def write(path, rows, header):
        with open(path, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(header)
            w.writerows(rows)

    rng = np.random.RandomState(0)
    header = ["target", "f1", "f2"]
    def make_rows(n):
        rows = []
        for _ in range(n):
            f1, f2 = rng.rand(), rng.rand()
            rows.append([int(f1 > 0.5), round(f1, 4), round(f2, 4)])
        return rows

    train_csv = str(tmp_path / "train.csv")
    valid_csv = str(tmp_path / "valid.csv")
    test_csv = str(tmp_path / "test.csv")
    write(train_csv, make_rows(80), header)
    valid_rows = make_rows(20)
    write(valid_csv, valid_rows, header)
    # feature-only file: no target column
    write(test_csv, [r[1:] for r in valid_rows], header[1:])

    from cflearn_tpu.data.ml.api import MLBundledProcessorConfig

    config = cf.MLConfig(
        module_name="fcnn", workspace=str(tmp_path / "ws"), callback_names=[]
    )
    config.to_debug()
    proc = MLBundledProcessorConfig(
        block_configs={"ml_file_parser": {"label_header": "target"}}
    )
    p = cf.fit_ml(train_csv, x_valid=valid_csv, config=config, processor_config=proc)
    # (a) valid labels must be the target column, not f2
    bundle = p.data.bundle
    np.testing.assert_array_equal(
        np.asarray(bundle.y_valid).ravel().astype(np.int64),
        np.asarray([r[0] for r in valid_rows]),
    )
    # (b) feature-only CSV keeps both features (prediction shape matches)
    preds = p.predict(test_csv, return_classes=True)["predictions"]
    assert preds.shape == (20, 1)


def test_nan_drop_cleans_valid_split() -> None:
    """Regression (code review): 'drop' left NaNs in x_valid."""
    from cflearn_tpu.data.blocks.ml import NanHandlerBlock
    from cflearn_tpu.schema.data import DataBundle

    x_train = np.array([[1.0, 2.0], [np.nan, 3.0], [4.0, 5.0]])
    y_train = np.array([[0], [1], [0]])
    x_valid = np.array([[np.nan, 1.0], [2.0, 2.0]])
    y_valid = np.array([[1], [0]])
    block = NanHandlerBlock(method="drop")
    bundle = DataBundle(x_train=x_train, y_train=y_train, x_valid=x_valid, y_valid=y_valid)
    out = block.fit_transform(bundle)
    assert np.isfinite(np.asarray(out.x_train)).all()
    assert np.isfinite(np.asarray(out.x_valid)).all()
    assert len(out.x_valid) == 1 and int(np.asarray(out.y_valid).ravel()[0]) == 0


def test_gather_counts_classes_across_splits() -> None:
    """Regression (code review): a singleton top class moved wholly into the
    valid split undercounted num_classes."""
    from cflearn_tpu.data.blocks.ml import GatherBlock
    from cflearn_tpu.schema.data import DataBundle

    block = GatherBlock()
    bundle = DataBundle(
        x_train=np.random.rand(6, 3).astype(np.float32),
        y_train=np.array([[0], [1], [0], [1], [0], [1]]),
        x_valid=np.random.rand(1, 3).astype(np.float32),
        y_valid=np.array([[2]]),  # singleton class only in valid
    )
    block.fit_transform(bundle)
    assert block.num_classes == 3


def test_labeled_transform_uses_inference_path() -> None:
    """Regression (code review): `IData.transform(x, y)` ran the TRAIN path
    when labels were given, so 'drop'-mode NaN handling removed rows from
    evaluation inputs (misaligning predictions with the caller's arrays)."""
    import cflearn_tpu as cf
    from cflearn_tpu.data.ml.api import MLData, MLBundledProcessorConfig

    rng = np.random.RandomState(0)
    x = rng.rand(64, 3).astype(np.float64)
    y = (x.sum(1, keepdims=True) > 1.5).astype(np.int64)
    proc = MLBundledProcessorConfig(block_configs={"ml_nan_handler": {"method": "drop"}})
    data = MLData.init(processor_config=proc).fit(x, y)
    x_eval = x[:8].copy()
    x_eval[2, 1] = np.nan  # NaN row must NOT be dropped at inference
    loader = data.build_loader(x_eval, y[:8])
    batch = loader.get_full_batch()
    assert len(batch["input"]) == 8


def test_packed_loader_copy(tmp_path) -> None:
    """Regression (code review): `loader.copy()` (used by ensemble fusion)
    deep-copied the native ctypes record store and crashed."""
    from PIL import Image

    from cflearn_tpu.data.cv.image_folder import (
        ImageFolderData,
        ResizedPreparation,
        prepare_image_folder,
    )

    src = tmp_path / "src"
    for cls_name in ("a", "b"):
        d = src / cls_name
        d.mkdir(parents=True)
        for i in range(4):
            arr = (np.random.rand(10 + i, 12, 3) * 255).astype(np.uint8)
            Image.fromarray(arr).save(d / f"{i}.png")
    dst = str(tmp_path / "packed")
    prepare_image_folder(str(src), dst, preparation=ResizedPreparation(8), valid_split=0.25, num_jobs=1)
    data = ImageFolderData.from_folder(dst)
    train, valid = data.get_loaders()
    clone = train.copy()
    b1 = clone.get_one_batch()
    b2 = train.get_one_batch()
    assert b1["input"].shape[1:] == b2["input"].shape[1:]
    assert data.num_train == len(train.dataset)
