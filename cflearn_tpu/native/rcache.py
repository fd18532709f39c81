"""ctypes bindings + auto-build for the rcache native store."""

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_HERE = Path(__file__).parent
_SRC = _HERE / "rcache.cpp"
_LIB_PATH = _HERE / "librcache.so"
_MAGIC_HEADER = 24
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _load_lib() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not _LIB_PATH.is_file():
            # compile to a per-process temp path and os.replace (atomic):
            # writing the final path directly leaves a truncated .so behind
            # on interrupt/concurrent builds, permanently poisoning the cache
            tmp_path = _LIB_PATH.with_suffix(f".{os.getpid()}.tmp.so")
            for cc in ("c++", "g++", "clang++"):
                try:
                    subprocess.run(
                        [cc, "-O3", "-shared", "-fPIC", "-std=c++17",
                         "-o", str(tmp_path), str(_SRC), "-lpthread"],
                        check=True,
                        capture_output=True,
                        timeout=120,
                    )
                    os.replace(tmp_path, _LIB_PATH)
                    break
                except (FileNotFoundError, subprocess.CalledProcessError, subprocess.TimeoutExpired):
                    continue
                finally:
                    if tmp_path.is_file():
                        try:
                            tmp_path.unlink()
                        except OSError:
                            pass
            else:
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(str(_LIB_PATH))
        except OSError:
            _build_failed = True
            return None
        lib.rc_open.restype = ctypes.c_void_p
        lib.rc_open.argtypes = [ctypes.c_char_p]
        lib.rc_close.argtypes = [ctypes.c_void_p]
        lib.rc_num_records.restype = ctypes.c_uint64
        lib.rc_num_records.argtypes = [ctypes.c_void_p]
        lib.rc_record_size.restype = ctypes.c_uint64
        lib.rc_record_size.argtypes = [ctypes.c_void_p]
        lib.rc_gather.restype = ctypes.c_int
        lib.rc_gather.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.rc_write.restype = ctypes.c_int
        lib.rc_write.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_uint64,
            ctypes.c_uint64,
        ]
        _lib = lib
        return _lib


def has_native() -> bool:
    return _load_lib() is not None


_RC_MAGIC = 0x52434143484531


def write_records(path: str, records: np.ndarray) -> None:
    """records: (N, record_size) uint8 — written via native writer or numpy."""
    records = np.ascontiguousarray(records, dtype=np.uint8)
    n, rs = records.shape
    lib = _load_lib()
    if lib is not None:
        buf = records.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        if lib.rc_write(str(path).encode(), buf, n, rs) == 0:
            return
    header = np.array([_RC_MAGIC, n, rs], dtype=np.uint64)
    with open(path, "wb") as f:
        f.write(header.tobytes())
        f.write(records.tobytes())


class RecordCache:
    """Random-access packed record reader (native mmap+gather, numpy fallback)."""

    def __init__(self, path: str) -> None:
        self.path = str(path)
        self._lib = _load_lib()
        self._handle = None
        self._np_payload: Optional[np.ndarray] = None
        if self._lib is not None:
            self._handle = self._lib.rc_open(self.path.encode())
        if self._handle:
            self.num_records = int(self._lib.rc_num_records(self._handle))
            self.record_size = int(self._lib.rc_record_size(self._handle))
        else:
            # numpy mmap fallback
            header = np.fromfile(self.path, dtype=np.uint64, count=3)
            if len(header) < 3 or int(header[0]) != _RC_MAGIC:
                raise ValueError(f"'{path}' is not an rcache store")
            self.num_records = int(header[1])
            self.record_size = int(header[2])
            self._np_payload = np.memmap(
                self.path, dtype=np.uint8, mode="r", offset=_MAGIC_HEADER,
                shape=(self.num_records, self.record_size),
            )

    def gather(self, indices: np.ndarray) -> np.ndarray:
        indices = np.ascontiguousarray(indices, dtype=np.int64)
        # consistent bounds semantics across backends: the numpy fallback
        # would silently wrap negative indices that the native path rejects
        if len(indices) and (indices.min() < 0 or indices.max() >= self.num_records):
            raise IndexError("rcache gather: index out of range")
        if self._handle:
            out = np.empty((len(indices), self.record_size), dtype=np.uint8)
            rc = self._lib.rc_gather(
                self._handle,
                indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                len(indices),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            )
            if rc != 0:
                raise IndexError("rc_gather: index out of range")
            return out
        assert self._np_payload is not None
        return np.asarray(self._np_payload[indices])

    def close(self) -> None:
        if self._handle and self._lib is not None:
            self._lib.rc_close(self._handle)
            self._handle = None

    def __del__(self) -> None:  # pragma: no cover
        try:
            self.close()
        except Exception:  # noqa: BLE001
            pass

    def __len__(self) -> int:
        return self.num_records
