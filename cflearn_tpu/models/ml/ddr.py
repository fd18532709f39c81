"""DDR model wrapper (reference `cflearn/models/ml/ddr.py:20`)."""

from ...schema.config import DLConfig
from ...schema.model import IDLModel
from ..common import CommonDLModel


@IDLModel.register("ml.ddr")
class DDRModel(CommonDLModel):
    def build(self, config: DLConfig) -> None:
        if config.loss_name is None:
            config.loss_name = "ddr"
        super().build(config)
