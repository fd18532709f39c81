"""Native rcache store tests."""

import numpy as np
import pytest

from cflearn_tpu.native import RecordCache, has_native, write_records


def test_rcache_roundtrip(tmp_path) -> None:
    records = (np.random.rand(100, 256) * 255).astype(np.uint8)
    path = str(tmp_path / "store.rcache")
    write_records(path, records)
    rc = RecordCache(path)
    assert len(rc) == 100 and rc.record_size == 256
    idx = np.array([0, 99, 42, 42, 7])
    np.testing.assert_array_equal(rc.gather(idx), records[idx])
    rc.close()


def test_rcache_bad_file(tmp_path) -> None:
    path = tmp_path / "junk.rcache"
    path.write_bytes(b"not a store at all....." * 4)
    with pytest.raises(Exception):
        RecordCache(str(path))


@pytest.mark.skipif(not has_native(), reason="no C++ toolchain")
def test_rcache_native_out_of_range(tmp_path) -> None:
    records = np.zeros((10, 16), dtype=np.uint8)
    path = str(tmp_path / "s.rcache")
    write_records(path, records)
    rc = RecordCache(path)
    with pytest.raises(IndexError):
        rc.gather(np.array([100]))
    rc.close()
