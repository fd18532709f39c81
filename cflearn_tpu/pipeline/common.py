"""Pipeline `Block` base + `Pipeline` base.

Parity: reference `cflearn/pipeline/common.py:19-135` — `Block` (named,
registered, serializable, with `build`/`run`/`save_extra`/`load_from`) and
`Pipeline` (ordered blocks sharing one config, run with `previous` injection).
"""

from typing import Any, Dict, List, Optional, Type, TypeVar

from ..schema.config import DLConfig
from ..schema.data import IData
from ..toolkit.block_pipeline import IBlock, IPipeline
from ..toolkit.registry import WithRegister

TBlock = TypeVar("TBlock", bound="Block")
TPipeline = TypeVar("TPipeline", bound="Pipeline")


class Block(IBlock, WithRegister):
    """A build/run/serialize unit in a training or inference pipeline."""

    d: Dict[str, type] = {}

    pipeline: Optional["Pipeline"] = None
    # defaults this block injected, for the report (reference
    # `InjectDefaultsMixin`, `pipeline/blocks/utils.py:12-19`)
    _defaults: Dict[str, Any]

    def __init__(self, **kwargs: Any) -> None:
        self._defaults = {}

    @property
    def name(self) -> str:
        return getattr(self, "__identifier__", self.__class__.__name__)

    def build(self, config: DLConfig) -> None:
        pass

    def run(self, data: IData, **kwargs: Any) -> None:
        pass

    # serialization hooks -----------------------------------------------------

    def save_extra(self, folder: str) -> None:
        pass

    def load_from(self, folder: str) -> None:
        pass

    # helpers -----------------------------------------------------------------

    @property
    def is_local_rank_0(self) -> bool:
        import jax

        return jax.process_index() == 0

    @property
    def training_workspace(self) -> Optional[str]:
        if self.pipeline is None:
            return None
        return getattr(self.pipeline, "_workspace", None)


class Pipeline(IPipeline):
    """Blocks sharing one `DLConfig` (reference `pipeline/common.py:65`)."""

    d: Dict[str, type] = {}
    blocks: List[Block]

    def __init__(self) -> None:
        super().__init__()
        self._config: Optional[DLConfig] = None
        self._workspace: Optional[str] = None
        self.data: Optional[IData] = None

    @property
    def config(self) -> DLConfig:
        assert self._config is not None
        return self._config

    @classmethod
    def init(cls: Type[TPipeline], config: DLConfig) -> TPipeline:
        self = cls()
        self._config = config
        self.prepare()
        return self

    # overridable -------------------------------------------------------------

    @property
    def block_names(self) -> List[str]:
        return []

    def prepare(self) -> None:
        blocks = [Block.make(name, {}) for name in self.block_names]
        for b in blocks:
            b.pipeline = self
        self.build(*blocks)

    def run(self, data: IData, **kwargs: Any) -> None:
        for block in self.blocks:
            block.run(data, **kwargs)

    # serialization -----------------------------------------------------------

    def to_info(self) -> Dict[str, Any]:
        from ..schema.config import config_registry

        config_type = "dl"
        for name, cls in config_registry.items():
            if type(self.config) is cls:
                config_type = name
        return {
            "config": self.config.to_info(),
            "config_type": config_type,
            "blocks": [b.name for b in self.blocks],
        }

    def from_info(self, info: Dict[str, Any]) -> None:
        from ..schema.config import config_registry

        config_cls = config_registry.get(info.get("config_type", "dl"), DLConfig)
        self._config = config_cls()
        self._config.from_info(info["config"])
        self.prepare()


class InjectDefaultsMixin:
    """Records defaults a block injected so the report can show them
    (reference `pipeline/blocks/utils.py:12-19`; `Block` already carries
    `_defaults`, this mixin is the standalone reference name)."""

    _defaults: Dict[str, Any]

    def __init__(self) -> None:
        self._defaults = {}

    def process_defaults(self, _defaults: Dict[str, Any]) -> None:
        for k, v in self._defaults.items():
            _defaults[k] = v
