"""`TrainStep` / `IDLModel` — the model wrapper and multi-optimizer semantics.

Parity: reference `cflearn/schema.py:1016-1528`:

* `TrainStep` (:1016) — one optimization unit with a `scope` selecting which
  parameters it updates, its own `loss_fn`, `requires_new_forward`,
  `grad_accumulate`, `should_skip`, `callback`. This is the mechanism behind
  GAN/AE multi-optimizer training (`models/cv/gan.py:83-187`).
* `IDLModel` (:1065) — owns the net (`m`) + loss, exposes `train_steps` /
  `all_modules` / `build` / `run` / `save` / `load`.

TPU-native re-design: models are `flax.nnx` modules; the *trainer* compiles the
multi-step optimization into jitted functions over `nnx.split` state pytrees —
`TrainStep.loss_fn` is pure/traceable, scopes are nnx path filters instead of
optimizer toggling, and "no grad in forward" becomes `lax.stop_gradient`.
"""

import json
import os
from typing import Any, Dict, List, NamedTuple, Optional, Tuple, Type, TypeVar

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ..constants import AUX_LOSS_KEY, INPUT_KEY, PREDICTIONS_KEY
from ..toolkit.misc import np_dict_type, tensor_dict_type
from ..toolkit.registry import WithRegister
from ..toolkit.tree import npd_to_tree, tree_to_npd
from .config import DLConfig
from .losses_schema import ILoss, loss_dict_type

TDLModel = TypeVar("TDLModel", bound="IDLModel")

forward_results_type = tensor_dict_type


class AuxLossVariable(nnx.Variable):
    """Sown auxiliary objective: a submodule writes its regularizer here
    during forward (e.g. `MoEChannelMixer`'s load-balancing loss) and
    `IDLModel.run(training=True)` sums every instance into
    `forward_results[AUX_LOSS_KEY]`, which train steps add to the loss."""


class TrainStep:
    """One optimization unit (reference `schema.py:1016-1062`)."""

    def __init__(
        self,
        scope: str = "all",
        *,
        num_forward: int = 1,
        grad_accumulate: Optional[int] = None,
        requires_new_forward: bool = False,
        requires_grad_in_forward: bool = True,
        requires_scheduler_step: bool = False,
        enable_toggle_optimizer: bool = True,
    ) -> None:
        self.scope = scope
        self.num_forward = num_forward
        self.grad_accumulate = grad_accumulate
        self.requires_new_forward = requires_new_forward
        self.requires_grad_in_forward = requires_grad_in_forward
        self.requires_scheduler_step = requires_scheduler_step
        self.enable_toggle_optimizer = enable_toggle_optimizer
        # scope -> active flag for the CURRENTLY COMPILED step program; set by
        # the trainer before tracing so a step's loss can statically depend on
        # whether a sibling step is live (e.g. the AE generator only adds its
        # adversarial term once the discriminator step has started — reference
        # `models/cv/ae.py:220-225` gates on `d_loss_start_step`)
        self.step_actives: Dict[str, bool] = {}

    # traced ------------------------------------------------------------------

    def loss_fn(
        self,
        m: "IDLModel",
        batch: tensor_dict_type,
        forward_results: forward_results_type,
        **kwargs: Any,
    ) -> loss_dict_type:
        raise NotImplementedError

    # host-side ---------------------------------------------------------------

    def should_skip(self, m: "IDLModel", state: Any) -> bool:
        return False

    def callback(self, m: "IDLModel", trainer: Any, batch: np_dict_type, forward_results: Any) -> None:
        pass


class IDLModel(nnx.Module, WithRegister):
    """Model wrapper: net + loss + train-step semantics (reference `schema.py:1065`).

    TPU-native: the wrapper itself is an `nnx.Module`, so the trainer can
    `nnx.split` it into (static graphdef, state pytree) and drive jitted
    functional train/eval steps over the state — the analogue of the
    reference's `model_for_training = model.from_accelerator(...)` clone
    (`schema.py:1099`) without any module mutation.
    """

    d: Dict[str, type] = {}

    m: nnx.Module
    loss: Optional[ILoss]
    config: DLConfig

    def __init__(self, config: DLConfig) -> None:
        self.config = config
        # `loss` may later hold an nnx.Module — mark as data from the start
        self.loss = nnx.data(None)

    # construction ------------------------------------------------------------

    @classmethod
    def from_config(cls: Type[TDLModel], config: DLConfig) -> TDLModel:
        model_cls = IDLModel.get(config.model)
        self = model_cls(config)
        self.build(config)
        return self

    def build(self, config: DLConfig) -> None:
        raise NotImplementedError

    def make_rngs(self, seed: Optional[int] = None) -> nnx.Rngs:
        if seed is None:
            seed = self.config.seed if self.config.seed is not None else 0
        return nnx.Rngs(params=seed, dropout=seed + 1, default=seed + 2)

    # training semantics --------------------------------------------------------

    @property
    def train_steps(self) -> List[TrainStep]:
        raise NotImplementedError

    @property
    def all_modules(self) -> List[nnx.Module]:
        mods: List[nnx.Module] = [self.m]
        if self.loss is not None:
            mods.append(self.loss)
        return mods

    def params_filter(self, scope: str) -> Any:
        """Map a TrainStep scope to an nnx filter over this model's params.

        Scope "all"/"core" → the net's params (excludes loss-internal params
        such as frozen LPIPS); any other scope selects params whose path
        contains the scope name (e.g. "discriminator").
        """
        if scope in ("all", "core"):
            return nnx.All(nnx.Param, nnx.PathContains("m"))
        return nnx.All(nnx.Param, nnx.PathContains(scope))

    def post_step_update(self) -> None:
        """Traced hook run once per optimization step after all train steps —
        e.g. DDPM's EMA update (reference does this in a TrainStep callback,
        `models/cv/diffusion.py:33`; here it stays inside the jitted step)."""

    # forward ------------------------------------------------------------------

    def get_forward_args(self, batch: tensor_dict_type, **kwargs: Any) -> Tuple[Any, ...]:
        return (batch[INPUT_KEY],)

    def postprocess(self, outputs: Any, batch: tensor_dict_type, **kwargs: Any) -> forward_results_type:
        if isinstance(outputs, dict):
            return outputs
        return {PREDICTIONS_KEY: outputs}

    def forward(self, batch: tensor_dict_type, **kwargs: Any) -> Any:
        args = self.get_forward_args(batch, **kwargs)
        return self.m(*args)  # type: ignore[operator]

    def run(self, batch: tensor_dict_type, *, training: bool = False, **kwargs: Any) -> forward_results_type:
        self.set_mode(training)
        outputs = self.forward(batch, **kwargs)
        results = self.postprocess(outputs, batch, **kwargs)
        if training:
            # sown auxiliary objectives: any AuxLossVariable a submodule wrote
            # during this forward (e.g. MoE load-balancing loss) surfaces under
            # AUX_LOSS_KEY; train steps add it to the scalar loss
            aux_leaves = jax.tree_util.tree_leaves(nnx.state(self.m, AuxLossVariable))
            if aux_leaves:
                # jnp.sum per leaf: an init-time-stacked pipeline block carries
                # an (L,)-shaped stale aux variable (its live aux flows through
                # the encoder-level pp_aux instead) — the total must stay scalar
                total = jnp.sum(aux_leaves[0])
                for leaf in aux_leaves[1:]:
                    total = total + jnp.sum(leaf)
                results[AUX_LOSS_KEY] = total
        return results

    def set_mode(self, training: bool) -> None:
        for mod in self.all_modules:
            if training:
                mod.train()
            else:
                mod.eval()

    # serialization ---------------------------------------------------------------

    def state_dict(self) -> Dict[str, np.ndarray]:
        return tree_to_npd(nnx.state(self))

    def load_state_dict(self, npd: Dict[str, np.ndarray], *, strict: bool = True) -> None:
        state = nnx.state(self)
        from ..toolkit.tree import convert_pp_layout

        # checkpoints stay portable across `pipeline_parallel`: stack
        # blocks/{i}/* -> pp_block/* (or slice the reverse) on the fly
        npd = convert_pp_layout(npd, state)
        new_state = npd_to_tree(npd, state, strict=strict)
        nnx.update(self, new_state)

    def save(self, path: str, *, npd: Optional[Dict[str, np.ndarray]] = None) -> None:
        """config + states in one artifact (reference `schema.py:1377-1389`).
        `npd` lets callers snapshot the states up front (async writers)."""
        folder = os.path.dirname(os.path.abspath(path))
        os.makedirs(folder, exist_ok=True)
        if npd is None:
            npd = self.state_dict()
        from .config import config_registry

        config_type = "dl"
        for name, cls in config_registry.items():
            if type(self.config) is cls:
                config_type = name
        meta = json.dumps(
            {
                "config": self.config.to_info(),
                "config_type": config_type,
                "type": getattr(self, "__identifier__", "common"),
            }
        )
        np.savez_compressed(path, __meta__=np.frombuffer(meta.encode(), dtype=np.uint8), **npd)

    def save_sharded(self, directory: str) -> None:
        """Orbax sharded checkpoint (SURVEY §5.4): every process writes its
        own shards, so multi-host saves don't funnel through host 0 and
        sharded arrays are stored without a gather. The config travels in a
        sibling JSON (orbax stores arrays; metadata stays human-readable)."""
        import orbax.checkpoint as ocp

        from .config import config_registry

        directory = os.path.abspath(directory)
        config_type = "dl"
        for name, cls_ in config_registry.items():
            if type(self.config) is cls_:
                config_type = name
        meta = {
            "config": self.config.to_info(),
            "config_type": config_type,
            "type": getattr(self, "__identifier__", "common"),
        }
        # hand orbax the DEVICE arrays keyed by path: np.asarray-ing first
        # (state_dict) would gather every shard to host — crashing for
        # non-addressable multi-host shards and defeating the sharded save
        import jax as _jax

        from ..toolkit.tree import _key_entry_to_str

        flat, _ = _jax.tree_util.tree_flatten_with_path(nnx.state(self))
        device_npd = {
            "/".join(_key_entry_to_str(p) for p in path): leaf
            for path, leaf in flat
            if hasattr(leaf, "dtype")
        }
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(os.path.join(directory, "state"), device_npd, force=True)
        with open(os.path.join(directory, "meta.json"), "w") as f:
            json.dump(meta, f)

    @classmethod
    def load_sharded(cls, directory: str) -> "IDLModel":
        import orbax.checkpoint as ocp

        from .config import config_registry

        directory = os.path.abspath(directory)
        with open(os.path.join(directory, "meta.json")) as f:
            meta = json.load(f)
        with ocp.StandardCheckpointer() as ckptr:
            npd = ckptr.restore(os.path.join(directory, "state"))
        config_cls = config_registry.get(meta.get("config_type", "dl"), DLConfig)
        config = config_cls()
        config.from_info(meta["config"])
        model = IDLModel.get(meta["type"])(config)
        model.build(config)
        model.load_state_dict({k: np.asarray(v) for k, v in npd.items()})
        return model

    @classmethod
    def load(cls, path: str) -> "IDLModel":
        with np.load(path if str(path).endswith(".npz") else f"{path}.npz", allow_pickle=False) as z:
            meta = json.loads(bytes(z["__meta__"]).decode())
            npd = {k: z[k] for k in z.files if k != "__meta__"}
        from .config import config_registry

        config_cls = config_registry.get(meta.get("config_type", "dl"), DLConfig)
        config = config_cls()
        config.from_info(meta["config"])
        model = IDLModel.get(meta["type"])(config)
        model.build(config)
        model.load_state_dict(npd)
        return model

    # misc ---------------------------------------------------------------------

    @property
    def num_params(self) -> int:
        from ..toolkit.tree import tree_num_params

        return sum(tree_num_params(nnx.state(mod, nnx.Param)) for mod in self.all_modules)

    def __repr__(self) -> str:
        return f"{self.__class__.__name__}(module={self.config.module_name})"


class StepOutputs:
    """Host-side view of one train step's results."""

    def __init__(self, forward_results: Any, loss_items: Dict[str, float]) -> None:
        self.forward_results = forward_results
        self.loss_items = loss_items


class TrainStepLoss(NamedTuple):
    """reference `schema.py` TrainStepLoss — the repo's `loss_fn` returns the
    dict form directly; this shape is accepted for migrated code."""

    loss: Any
    losses: Dict[str, Any]
