"""Minimal stand-in for the reference's `cftool` dependency (see README).

Every attribute of every `cftool.*` module resolves to a FRESH permissive
placeholder class (fresh per name, so multiple-inheritance like
`class X(PureFromInfoMixin, ISerializable)` doesn't see duplicate bases).
Names that actually execute during `import cflearn` / model construction get
real minimal implementations below.
"""

import sys
import types
from abc import ABCMeta


def _permissive(*args, **kwargs):
    """Callable result for placeholder attributes. When used as a decorator
    (called with a single class/function), returns it unchanged so decorated
    definitions stay real; otherwise returns another permissive callable."""
    if len(args) == 1 and not kwargs and (isinstance(args[0], type) or callable(args[0])):
        return args[0]
    return _permissive


class _Meta(ABCMeta):
    def __getattr__(cls, attr):
        if attr.startswith("__") and attr.endswith("__"):
            raise AttributeError(attr)
        return _permissive

    def register(cls, *args, **kwargs):  # shadow ABCMeta.register
        return _permissive


def _placeholder_class(name):
    class Placeholder(metaclass=_Meta):
        def __init__(self, *args, **kwargs):
            pass

        def __init_subclass__(cls, **kwargs):
            pass

        def __class_getitem__(cls, item):
            return cls

        def __call__(self, *args, **kwargs):
            return self

        def __getattr__(self, attr):
            if attr.startswith("__") and attr.endswith("__"):
                raise AttributeError(attr)
            return _placeholder_class(f"{name}.{attr}")()

    Placeholder.__name__ = Placeholder.__qualname__ = name
    return Placeholder


# --- real minimal implementations (names executed at import/constructor time)


def shallow_copy_dict(d):
    return dict(d)


def update_dict(src, tgt):
    for k, v in src.items():
        tv = tgt.get(k)
        if isinstance(v, dict) and isinstance(tv, dict):
            update_dict(v, tv)
        else:
            tgt[k] = v
    return tgt


def safe_execute(fn, kw):
    import inspect

    sig = inspect.signature(fn)
    ok = {}
    for name, param in sig.parameters.items():
        if param.kind is inspect.Parameter.VAR_KEYWORD:
            return fn(**kw)
        if name in kw:
            ok[name] = kw[name]
    return fn(**ok)


def filter_kw(fn, kw):
    import inspect

    sig = inspect.signature(fn)
    return {k: v for k, v in kw.items() if k in sig.parameters}


class WithRegister:
    d = {}
    __identifier__ = ""

    def __class_getitem__(cls, item):
        return cls

    def __init_subclass__(cls, **kwargs):
        super().__init_subclass__(**kwargs)
        if "d" not in cls.__dict__:
            cls.d = {}

    @classmethod
    def get(cls, name):
        return cls.d[name]

    @classmethod
    def has(cls, name):
        return name in cls.d

    @classmethod
    def register(cls, name, *, allow_duplicate=False):
        def before(cls_):
            cls_.__identifier__ = name

        def _register(cls_):
            before(cls_)
            cls.d[name] = cls_
            return cls_

        return _register

    @classmethod
    def make(cls, name, config):
        return cls.get(name)(**config)

    @classmethod
    def remove(cls, name):
        return cls.d.pop(name)


def register_core(name, d, *, allow_duplicate=False, before_register=None, after_register=None):
    def _register(cls_):
        if before_register is not None:
            before_register(cls_)
        d[name] = cls_
        if after_register is not None:
            after_register(cls_)
        return cls_

    return _register


def to_torch(arr):
    import numpy as np
    import torch

    return torch.from_numpy(np.ascontiguousarray(arr))


def to_numpy(tensor):
    return tensor.detach().cpu().numpy()


_REAL = {
    "to_torch": to_torch,
    "to_numpy": to_numpy,
    "shallow_copy_dict": shallow_copy_dict,
    "update_dict": update_dict,
    "safe_execute": safe_execute,
    "filter_kw": filter_kw,
    "WithRegister": WithRegister,
    "register_core": register_core,
    "tensor_dict_type": dict,
    "np_dict_type": dict,
    "configs_type": dict,
    "general_config_type": dict,
    "arr_type": object,
    "d_inp_type": object,
    "TRespT": object,
    "PNUMBER": float,
    "TPath": str,
}


def _make_module(name):
    mod = types.ModuleType(name)

    def __getattr__(attr, _mod_name=name):
        if attr.startswith("__") and attr.endswith("__"):
            raise AttributeError(attr)
        if attr in _REAL:
            return _REAL[attr]
        return _placeholder_class(f"{_mod_name}.{attr}")

    mod.__getattr__ = __getattr__
    sys.modules[name] = mod
    return mod


console = _make_module("cftool.console")
for _sub in ("misc", "array", "cv", "dist", "pipeline", "types", "constants", "data_structures"):
    _make_module(f"cftool.{_sub}")


def __getattr__(name):
    if name.startswith("__") and name.endswith("__"):
        raise AttributeError(name)
    if name in _REAL:
        return _REAL[name]
    return _placeholder_class(f"cftool.{name}")


class OPTBase:
    """Settings holder: attributes resolve from the subclass's `defaults`."""

    def __init__(self):
        self._opt = dict(self.defaults)
        self.update_from_env()

    @property
    def defaults(self):
        return {}

    def update_from_env(self):
        pass

    def __getattr__(self, name):
        if name.startswith("__") and name.endswith("__"):
            raise AttributeError(name)
        try:
            return self.__dict__["_opt"][name]
        except KeyError:
            raise AttributeError(name)


_REAL["OPTBase"] = OPTBase
