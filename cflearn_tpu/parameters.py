"""Process-global settings singleton (`OPT`).

Parity: reference `cflearn/parameters.py:7-48` (`OPTClass`, overridable via the
`CFLEARN_ENV` env JSON). Here the env key is `CFLEARN_TPU_ENV` and the settings
cover cache dirs, lazy API loading and meta settings for `run_multiple`.
"""

import json
import os
from pathlib import Path
from typing import Any, Dict


class OPTClass:
    env_key = "CFLEARN_TPU_ENV"

    def __init__(self) -> None:
        self._defaults: Dict[str, Any] = dict(
            cache_dir=os.path.join(str(Path.home()), ".cache", "cflearn_tpu"),
            external_dir=os.path.join(str(Path.home()), ".cache", "cflearn_tpu", "external"),
            meta_settings={},
            lazy_load_api=False,
            use_cpu_api=False,
            sd_weights_pool_limit=-1,
        )
        self._overrides: Dict[str, Any] = {}
        env = os.environ.get(self.env_key)
        if env:
            try:
                self._overrides.update(json.loads(env))
            except json.JSONDecodeError:
                pass

    def __getattr__(self, key: str) -> Any:
        defaults = object.__getattribute__(self, "_defaults")
        overrides = object.__getattribute__(self, "_overrides")
        if key in overrides:
            return overrides[key]
        if key in defaults:
            return defaults[key]
        raise AttributeError(key)

    # context-style overrides ------------------------------------------------

    def update(self, **kwargs: Any) -> None:
        self._overrides.update(kwargs)

    class _Ctx:
        def __init__(self, opt: "OPTClass", settings: Dict[str, Any]) -> None:
            self.opt = opt
            self.settings = settings
            self.backup: Dict[str, Any] = {}

        def __enter__(self) -> None:
            self.backup = dict(self.opt._overrides)
            self.opt._overrides.update(self.settings)

        def __exit__(self, *args: Any) -> None:
            self.opt._overrides = self.backup

    def opt_context(self, settings: Dict[str, Any]) -> "OPTClass._Ctx":
        return OPTClass._Ctx(self, settings)

    @property
    def cache_dir_path(self) -> Path:
        return Path(self.cache_dir)


OPT = OPTClass()
