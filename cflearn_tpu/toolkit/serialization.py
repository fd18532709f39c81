"""Serialization primitives: `ISerializable`, `Serializer`, dataclass configs.

Parity: reference relies on `cftool` for `ISerializable`/`ISerializableDataClass`/
`Serializer` (imported at `cflearn/schema.py:33-49`). Contract preserved:

- `to_info()` → JSON-able dict, `from_info(info)` restores;
- `to_npd()` → dict of numpy arrays, `from_npd(npd)` restores;
- `Serializer.save(folder, obj)` writes `info.json` (+`__identifier__`) and
  `data.npz`; `Serializer.load(folder, base)` rebuilds from the registered type.
"""

import dataclasses
import json
import os
from typing import Any, Dict, Optional, Type, TypeVar

import numpy as np

from .registry import WithRegister

TSerializable = TypeVar("TSerializable", bound="ISerializable")

INFO_FILE = "info.json"
NPD_FOLDER = "npd"
ID_KEY = "__identifier__"


class ISerializable(WithRegister):
    """Named-registered object with JSON info + numpy-dict payloads."""

    d: Dict[str, type] = {}

    # info (JSON-able) -------------------------------------------------------

    def to_info(self) -> Dict[str, Any]:
        return {}

    def from_info(self, info: Dict[str, Any]) -> None:
        pass

    # npd (numpy payloads) ---------------------------------------------------

    def to_npd(self) -> Dict[str, np.ndarray]:
        return {}

    def from_npd(self, npd: Dict[str, np.ndarray]) -> None:
        pass

    # helpers ----------------------------------------------------------------

    def to_pack(self) -> Dict[str, Any]:
        return {"type": getattr(self, "__identifier__", self.__class__.__name__), "info": self.to_info()}

    @classmethod
    def from_pack(cls: Type[TSerializable], pack: Dict[str, Any]) -> TSerializable:
        obj = cls.get(pack["type"])()
        obj.from_info(pack["info"])
        return obj

    def copy(self: TSerializable) -> TSerializable:
        copied = self.__class__()
        copied.from_info(json.loads(json.dumps(self.to_info())))
        copied.from_npd(self.to_npd())
        return copied


def _jsonify(value: Any) -> Any:
    if isinstance(value, np.ndarray):
        return value.tolist()
    if isinstance(value, (np.integer,)):
        return int(value)
    if isinstance(value, (np.floating,)):
        return float(value)
    if dataclasses.is_dataclass(value) and not isinstance(value, type):
        return {f.name: _jsonify(getattr(value, f.name)) for f in dataclasses.fields(value)}
    if isinstance(value, dict):
        return {k: _jsonify(v) for k, v in value.items()}
    if isinstance(value, (list, tuple)):
        return [_jsonify(v) for v in value]
    return value


@dataclasses.dataclass
class DataClassBase:
    """Serializable dataclass base (reference: `ISerializableDataClass`)."""

    @property
    def fields(self) -> Any:
        return dataclasses.fields(self)

    def asdict(self) -> Dict[str, Any]:
        return {f.name: _jsonify(getattr(self, f.name)) for f in self.fields}

    def to_info(self) -> Dict[str, Any]:
        return self.asdict()

    def from_info(self, info: Dict[str, Any]) -> None:
        names = {f.name for f in self.fields}
        for k, v in info.items():
            if k in names:
                setattr(self, k, v)

    def update_with(self, other: "DataClassBase") -> None:
        for f in other.fields:
            v = getattr(other, f.name)
            if v is not None:
                setattr(self, f.name, v)

    def copy(self) -> "DataClassBase":
        new = self.__class__()
        new.from_info(json.loads(json.dumps(self.to_info())))
        return new

    @classmethod
    def from_dict(cls, info: Dict[str, Any]) -> "DataClassBase":
        obj = cls()
        obj.from_info(info)
        return obj


class Serializer:
    """Folder-based save/load of `ISerializable` objects."""

    @staticmethod
    def save_info(folder: str, *, info: Optional[Dict[str, Any]] = None, serializable: Optional[ISerializable] = None) -> None:
        os.makedirs(folder, exist_ok=True)
        if info is None:
            assert serializable is not None
            info = serializable.to_pack()
        with open(os.path.join(folder, INFO_FILE), "w") as f:
            json.dump(_jsonify(info), f, indent=2)

    @staticmethod
    def load_info(folder: str) -> Dict[str, Any]:
        with open(os.path.join(folder, INFO_FILE), "r") as f:
            return json.load(f)

    @staticmethod
    def save_npd(folder: str, serializable: ISerializable) -> None:
        npd = dict(serializable.to_npd())
        # object arrays would be PICKLED by savez (and then rejected by
        # load_npd's allow_pickle=False) — encode them as unicode arrays with
        # a marker key so the round trip stays pickle-free
        for k in list(npd):
            v = npd[k]
            if isinstance(v, np.ndarray) and v.dtype == object:
                npd[f"__obj__::{k}"] = np.where(
                    np.frompyfunc(lambda x: x is None, 1, 1)(v).astype(bool), "", v
                ).astype(str)
                del npd[k]
        os.makedirs(folder, exist_ok=True)
        np.savez_compressed(os.path.join(folder, "data.npz"), **npd)

    @staticmethod
    def load_npd(folder: str) -> Dict[str, np.ndarray]:
        path = os.path.join(folder, "data.npz")
        if not os.path.isfile(path):
            return {}
        with np.load(path, allow_pickle=False) as z:
            out: Dict[str, np.ndarray] = {}
            for k in z.files:
                if k.startswith("__obj__::"):
                    out[k[len("__obj__::") :]] = z[k].astype(object)
                else:
                    out[k] = z[k]
            return out

    @classmethod
    def save(cls, folder: str, serializable: ISerializable, *, save_npd: bool = True) -> None:
        cls.save_info(folder, serializable=serializable)
        if save_npd:
            cls.save_npd(folder, serializable)

    @classmethod
    def load(
        cls,
        folder: str,
        base: Type[TSerializable],
        *,
        swap_id: Optional[str] = None,
        load_npd: bool = True,
    ) -> TSerializable:
        pack = cls.load_info(folder)
        if swap_id is not None:
            pack["type"] = swap_id
        obj = base.from_pack(pack)
        if load_npd:
            obj.from_npd(cls.load_npd(folder))
        return obj
