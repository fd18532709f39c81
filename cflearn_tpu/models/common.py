"""Common model wrappers.

Parity: reference `cflearn/models/common.py` — `CommonTrainStep` (:26, run the
registered loss), `CommonDLModel` (:47, `build_module` + `build_loss`,
registered "common"), `DLEnsembleModel` (:70, N cloned modules with averaged
outputs, built when `config.num_repeat` is set).
"""

from typing import Any, List, Optional

import jax.numpy as jnp
from flax import nnx

from ..constants import AUX_LOSS_KEY, LOSS_KEY
from ..modules.common import build_module
from ..schema.config import DLConfig
from ..schema.losses_schema import ILoss, build_loss, loss_dict_type
from ..schema.model import IDLModel, TrainStep
from ..toolkit.misc import tensor_dict_type


class CommonTrainStep(TrainStep):
    """Single-optimizer step running the model's registered loss."""

    def __init__(self, loss: Optional[ILoss] = None, **kwargs: Any) -> None:
        super().__init__("all", **kwargs)
        self.loss = loss

    def loss_fn(
        self,
        m: IDLModel,
        batch: tensor_dict_type,
        forward_results: tensor_dict_type,
        **kwargs: Any,
    ) -> loss_dict_type:
        loss = self.loss if self.loss is not None else m.loss
        assert loss is not None, "loss is not built"
        losses = loss.run(forward_results, batch, **kwargs)
        aux = forward_results.get(AUX_LOSS_KEY)
        if aux is not None:
            # sown auxiliary objectives (e.g. MoE load balancing) — logged
            # under their own key and folded into the optimized scalar
            losses[AUX_LOSS_KEY] = aux
            losses[LOSS_KEY] = losses[LOSS_KEY] + aux
        return losses


@IDLModel.register("common")
class CommonDLModel(IDLModel):
    """`build_module(module_name)` + `build_loss(loss_name)` (reference
    `models/common.py:47`)."""

    def build(self, config: DLConfig) -> None:
        rngs = self.make_rngs()
        self.m = build_module(config.module_name, config=config.module_config, rngs=rngs)
        if config.loss_name is not None:
            self.loss = build_loss(config.loss_name, config.loss_config)
        else:
            self.loss = None

    @property
    def train_steps(self) -> List[TrainStep]:
        return [CommonTrainStep()]


@IDLModel.register("ensemble")
class DLEnsembleModel(IDLModel):
    """N cloned modules, averaged outputs (reference `models/common.py:70`)."""

    def build(self, config: DLConfig) -> None:
        num_repeat = config.num_repeat or 2
        modules = []
        for i in range(num_repeat):
            rngs = self.make_rngs(seed=(config.seed or 0) + i)
            modules.append(build_module(config.module_name, config=config.module_config, rngs=rngs))
        self.m = nnx.List(modules)
        if config.loss_name is not None:
            self.loss = build_loss(config.loss_name, config.loss_config)
        else:
            self.loss = None

    def forward(self, batch: tensor_dict_type, **kwargs: Any) -> Any:
        args = self.get_forward_args(batch, **kwargs)
        outputs = [m(*args) for m in self.m]
        return self.reduce(outputs)

    def reduce(self, outputs: List[Any]) -> Any:
        if isinstance(outputs[0], dict):
            keys = outputs[0].keys()
            return {k: jnp.mean(jnp.stack([o[k] for o in outputs]), axis=0) for k in keys}
        return jnp.mean(jnp.stack(outputs), axis=0)

    @property
    def train_steps(self) -> List[TrainStep]:
        return [CommonTrainStep()]

    def set_mode(self, training: bool) -> None:
        for m in self.m:
            if training:
                m.train()
            else:
                m.eval()
        if self.loss is not None:
            (self.loss.train if training else self.loss.eval)()
