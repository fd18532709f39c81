"""ML model wrappers.

Parity: reference `cflearn/models/ml/common.py` — `CommonMLModel` (:28,
{encoder, module} pair: categorical `Encoder` + core net, mutating the net's
`input_dim` by the encoder increment; registered `ml.common`) and
`TemporalMLModel` (:101, keeps the temporal axis for rnn/transformer-style
nets).
"""

from typing import Any, List, Optional

from flax import nnx

from ...constants import INPUT_KEY
from ...modules.common import build_module
from ...modules.core.ml_encoder import Encoder
from ...schema.config import DLConfig, MLConfig
from ...schema.losses_schema import build_loss
from ...schema.model import IDLModel
from ..common import CommonDLModel


@IDLModel.register("ml.common")
class CommonMLModel(CommonDLModel):
    """Categorical encoder + core net."""

    encoder: Optional[Encoder]

    def build(self, config: DLConfig) -> None:
        rngs = self.make_rngs()
        module_config = dict(config.module_config or {})
        encoder_settings = module_config.pop("encoder_settings", None)
        if encoder_settings is None and isinstance(config, MLConfig):
            encoder_settings = config.encoder_settings
        global_settings = {}
        if isinstance(config, MLConfig) and config.global_encoder_settings:
            global_settings = dict(config.global_encoder_settings)
        self.encoder = nnx.data(None)
        if encoder_settings:
            self.encoder = Encoder(encoder_settings, rngs=rngs, **global_settings)
            if "input_dim" in module_config:
                module_config["input_dim"] = module_config["input_dim"] + self.encoder.dim_increment
        self.m = build_module(config.module_name, config=module_config, rngs=rngs)
        if config.loss_name is not None:
            self.loss = build_loss(config.loss_name, config.loss_config)
        else:
            self.loss = None

    def forward(self, batch: Any, **kwargs: Any) -> Any:
        net = batch[INPUT_KEY]
        if self.encoder is not None:
            net = self.encoder(net).merged
        return self.m(net)

    @property
    def all_modules(self) -> List[nnx.Module]:
        mods = super().all_modules
        if self.encoder is not None:
            mods.append(self.encoder)
        return mods


@IDLModel.register("ml.temporal")
class TemporalMLModel(CommonMLModel):
    """Keeps the (B, T, d) temporal axis (reference `models/ml/common.py:101`)."""

    def forward(self, batch: Any, **kwargs: Any) -> Any:
        net = batch[INPUT_KEY]
        if self.encoder is not None:
            net = self.encoder(net).merged
        return self.m(net)


def to_ml_model(name: str) -> str:
    """reference `schema.py:1991`."""
    return f"ml.{name}"


def register_ml_model(name: str) -> Any:
    """Register an IDLModel under the `ml.` namespace (reference
    `models/ml/common.py:23`)."""
    return IDLModel.register(to_ml_model(name))


@register_ml_model("wnd")
class WideAndDeepModel(CommonMLModel):
    """Wide-and-deep: the `wnd` module takes (wide=one_hot+numerical,
    deep=embedding+numerical) — reference `models/ml/wnd.py:13`."""
