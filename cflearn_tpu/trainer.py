"""The Trainer — fit loop, jitted multi-step optimization, checkpoint top-k.

Parity: reference `cflearn/trainer.py:87-588` + the inner optimization
algorithm of `IDLModel.train` (`schema.py:1174-1294`):

* multi-`TrainStep` engine with per-scope optimizers (GAN/AE semantics),
  grad accumulation (optax.MultiSteps), grad clipping, scheduler stepping;
* `TrainerState` cadence, monitors (snapshot/terminate/epoch-extension),
  callbacks, metrics evaluation over the valid loader;
* top-k checkpointing by score with `scores.json` (reference
  `trainer.py:380-453`) and best-checkpoint rollback.

TPU-native design: the whole per-batch optimization (all train steps, all
optimizer updates, EMA, schedulers) is ONE jitted XLA program over
`nnx.split` state pytrees with buffer donation; host code only drives the
loop, logging and checkpoint IO. DDP-via-accelerate (`trainer.py:226-229`) is
replaced by mesh sharding: batches are placed over the `data` axis and GSPMD
inserts the gradient all-reduce over ICI.
"""

import json
import os
import shutil
import time
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import nnx

from .constants import (
    CHECKPOINTS_FOLDER,
    CKPT_PREFIX,
    INPUT_KEY,
    LOSS_KEY,
    SCORES_FILE,
)
from .data.utils import DeviceBatcher
from .inference import DLInference
from .optimizers import build_optimizer
from .parallel.mesh import (
    data_sharding,
    get_ambient_mesh,
    is_local_rank_0,
    make_mesh,
    replicated_sharding,
    set_mesh,
)
from .schedulers import PlateauState, build_scheduler, scheduler_requires_metric
from .schema.config import TrainerConfig
from .schema.data import IData
from .schema.metrics_schema import IMetric, MetricsOutputs, weighted_loss_score
from .schema.model import IDLModel, StepOutputs
from .schema.train_schema import (
    ITrainer,
    MonitorResults,
    TrainerCallback,
    TrainerMonitor,
    TrainerState,
)
from .toolkit.misc import resolve_checkpoint_policy, sort_dict_by_value, timestamp


def _refresh(state: Any) -> Any:
    """Identity tree_map: rebuilds nnx Variables at the current trace level
    (State leaves are raw arrays, so unflatten creates fresh Variables)."""
    return jax.tree_util.tree_map(lambda a: a, state)


def _cast_floating(state: Any, dtype: Any) -> Any:
    """Cast the floating leaves of a State (AMP compute cast; ints/bools and
    non-array leaves pass through)."""

    def _cast(a: Any) -> Any:
        return (
            a.astype(dtype)
            if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
            else a
        )

    return jax.tree_util.tree_map(_cast, state)


def get_scores(checkpoint_folder: str) -> Dict[str, float]:
    scores_path = os.path.join(checkpoint_folder, SCORES_FILE)
    if not os.path.isfile(scores_path):
        return {}
    with open(scores_path, "r") as f:
        return json.load(f)


def get_sorted_checkpoints(checkpoint_folder: str) -> List[str]:
    """Best-first (reference `trainer.py` sorted by score)."""
    scores = get_scores(checkpoint_folder)
    return list(sort_dict_by_value(scores, reverse=True).keys())


class Trainer(ITrainer):
    model: IDLModel

    def __init__(
        self,
        config: TrainerConfig,
        *,
        metrics: Optional[IMetric] = None,
        monitors: Optional[List[TrainerMonitor]] = None,
        callbacks: Optional[List[TrainerCallback]] = None,
        inference: Optional[DLInference] = None,
    ) -> None:
        self.config = config
        self.metrics = metrics
        self.monitors = monitors or []
        if callbacks is None and config.callback_names:
            # bare-Trainer usage: honor config.callback_names like the
            # pipeline's BuildCallbacksBlock does
            names = config.callback_names
            if isinstance(names, str):
                names = [names]
            callbacks = [
                TrainerCallback.make(n, (config.callback_configs or {}).get(n, {}))
                for n in names
                if TrainerCallback.has(n)
            ]
        self.callbacks = callbacks or []
        self.inference = inference or DLInference()
        self.state: Optional[TrainerState] = None
        self._num_step_per_epoch: Optional[int] = None
        self.intermediate: Optional[MetricsOutputs] = None
        self.final_results: Optional[MetricsOutputs] = None
        self.checkpoint_scores: Dict[str, float] = {}
        self.lr_scales: Dict[str, PlateauState] = {}
        self._workspace: Optional[str] = None
        self._preloaded_opt_npd: Optional[Dict[str, Any]] = None
        self._step_fn_cache: Dict[Any, Callable] = {}
        self._loss_window: Dict[str, List[float]] = {}
        self._ckpt_futures: List[Any] = []
        self._ckpt_executor: Optional[Any] = None

    # ------------------------------------------------------------------ setup

    @property
    def workspace(self) -> str:
        assert self._workspace is not None, "`fit` should be called first"
        return self._workspace

    @property
    def checkpoint_folder(self) -> str:
        return os.path.join(self.workspace, CHECKPOINTS_FOLDER)

    @property
    def preemption_folder(self) -> str:
        # the workspace ROOT (not the timestamped sub-workspace): a re-run
        # against the same root must find the dump
        return os.path.join(self.config.workspace, "preemption")

    @property
    def metrics_log_path(self) -> str:
        return os.path.join(self.workspace, "metrics.txt")

    def _prepare_workspace(self) -> None:
        workspace = self.config.workspace
        if self.config.create_sub_workspace:
            workspace = os.path.join(workspace, timestamp(ensure_different=True))
        self._workspace = workspace
        if is_local_rank_0():
            os.makedirs(workspace, exist_ok=True)
            os.makedirs(self.checkpoint_folder, exist_ok=True)
            with open(os.path.join(workspace, "trainer_config.json"), "w") as f:
                json.dump(self.config.to_info(), f, indent=2)

    def _default_optimizer_settings(self) -> Dict[str, Dict[str, Any]]:
        """Reference `DefaultOptimizerSettings` (`pipeline/blocks/basic.py:331-360`):
        adam @ 1e-3 with a default `warmup` scheduler (multiplier 3, warmup
        over min(3e5/batch_size, 10*num_batches) steps) handing off to a
        metric-driven `plateau`."""
        lr = self.config.lr if self.config.lr is not None else 1.0e-3
        scheduler = self.config.scheduler_name
        scheduler_config = dict(self.config.scheduler_config or {})
        if scheduler is None:
            scheduler = "warmup"
            state = self.state
            multiplier = scheduler_config.setdefault("multiplier", 3)
            if state is not None:
                default_max_warmup = int(round(3.0e5 / max(1, state.batch_size)))
                scheduler_config.setdefault(
                    "warmup_step",
                    min(default_max_warmup, 10 * state.num_step_per_epoch),
                )
            else:
                scheduler_config.setdefault("warmup_step", 1000)
            scheduler_config.setdefault("afterwards", "plateau")
            lr = lr / multiplier
        elif scheduler == "none":
            scheduler = None
        settings = {
            "all": {
                "optimizer": self.config.optimizer_name or "adam",
                "optimizer_config": dict(self.config.optimizer_config or {}, lr=lr),
                "scheduler": scheduler,
                "scheduler_config": scheduler_config,
            }
        }
        def _merge(scope: str, sub: Any) -> None:
            if sub is None:
                return
            if hasattr(sub, "_asdict"):  # reference OptimizerPack
                sub = sub._asdict()
            sub = {k: v for k, v in dict(sub).items() if k != "scope" and v is not None}
            if "optimizer_name" in sub:
                sub["optimizer"] = sub.pop("optimizer_name")
            if "scheduler_name" in sub:
                sub["scheduler"] = sub.pop("scheduler_name")
            merged = dict(settings.get(scope, settings["all"]))
            merged = json.loads(json.dumps(merged))
            merged.update({k: v for k, v in sub.items() if v is not None})
            if "lr" in sub:
                merged.setdefault("optimizer_config", {})
                merged["optimizer_config"]["lr"] = sub["lr"]
            if sub.get("scheduler") == "none":
                merged["scheduler"] = None
            settings[scope] = merged

        if self.config.optimizer_settings:
            for scope, sub in self.config.optimizer_settings.items():
                _merge(scope, sub)
        # list-form packs (reference `OptimizerPack`, `schema.py:1718` /
        # `pipeline/blocks/basic.py:414-437`) — applied after the dict-form
        # settings so an explicit pack wins for its scope
        if self.config.optimizer_packs:
            for pack in self.config.optimizer_packs:
                if hasattr(pack, "_asdict"):
                    pack = pack._asdict()
                else:
                    pack = dict(pack)
                _merge(pack.get("scope", "all"), pack)
        return settings

    def _build_optimizers(self, model: IDLModel) -> None:
        """Per-scope optax chains (reference `BuildOptimizersBlock`,
        `pipeline/blocks/basic.py:385-558`)."""
        settings = self._default_optimizer_settings()
        self.txs: Dict[str, optax.GradientTransformation] = {}
        self.schedules: Dict[str, Any] = {}
        scopes = sorted({ts.scope for ts in model.train_steps})
        for scope in scopes:
            sub = settings.get(scope, settings["all"])
            opt_config = dict(sub.get("optimizer_config") or {})
            lr = opt_config.pop("lr", self.config.lr or 1.0e-3)
            scheduler_name = sub.get("scheduler")
            scheduler_config = dict(sub.get("scheduler_config") or {})
            if scheduler_name is None:
                schedule: Any = lr
            else:
                schedule = build_scheduler(scheduler_name, lr, **scheduler_config)
                # metric-driven (plateau) schedulers — possibly wrapped in warmup
                plateau_like = scheduler_name in scheduler_requires_metric or (
                    scheduler_config.get("afterwards") in scheduler_requires_metric
                )
                if plateau_like:
                    pkw = scheduler_config.get("afterwards_config") or {}
                    allowed = {"mode", "factor", "patience", "threshold", "min_scale"}
                    self.lr_scales[scope] = PlateauState(
                        **{k: v for k, v in pkw.items() if k in allowed}
                    )
                if self.config.update_scheduler_per_epoch and callable(schedule):
                    # reference `scheduler_step` advances once per EPOCH when
                    # this flag is set (`trainer.py:178-198`); the optax
                    # equivalent feeds the schedule the epoch index instead
                    # of the step count
                    steps_per_epoch = max(1, int(self._num_step_per_epoch or 1))
                    base_schedule = schedule

                    def schedule(count, _b=base_schedule, _n=steps_per_epoch):
                        return _b(count // _n)
            tx = build_optimizer(sub.get("optimizer", "adam"), schedule, **opt_config)
            if self.config.clip_norm > 0.0:
                tx = optax.chain(optax.clip_by_global_norm(self.config.clip_norm), tx)
            accumulate = self.config.grad_accumulate
            for ts in model.train_steps:
                if ts.scope == scope and ts.grad_accumulate is not None:
                    accumulate = ts.grad_accumulate
            if accumulate and accumulate > 1:
                tx = optax.MultiSteps(tx, every_k_schedule=accumulate)
            self.txs[scope] = tx
            self.schedules[scope] = schedule

    # ------------------------------------------------------------- jitted fns

    def _build_step_fn(self, actives: Tuple[bool, ...], k: int = 1) -> Callable:
        model = self.model
        graphdef = self._graphdef_train
        train_steps = model.train_steps
        txs = self.txs
        mesh = self.mesh
        # AMP (SURVEY §2.10; the reference forwards accelerate's
        # `mixed_precision`, `/root/reference/cflearn/trainer.py:226-229`):
        # bf16 compute with f32 master params. Param leaves are cast to bf16
        # INSIDE the loss (grads flow through the cast back to the f32
        # masters, so optimizer state and updates stay f32); non-Param state
        # (BatchStat, noise-schedule buffers) stays f32; the model input is
        # cast so jnp promotion doesn't silently re-widen the network to f32.
        amp_dtype = jnp.bfloat16 if self.config.compute_dtype == "bfloat16" else None
        # activation checkpointing (SURVEY §2.10): with `remat` on, only the
        # step inputs are saved and the forward is recomputed during the
        # backward pass — one extra forward buys O(depth) less activation HBM
        # (module-level `use_checkpoint` flags remat per block instead).
        # A policy-name string (jax.checkpoint_policies) selects selective
        # remat: matmul/attention outputs stay resident, only the cheap
        # elementwise chains are recomputed.
        remat = self.config.remat
        remat_policy = (
            resolve_checkpoint_policy(remat) if isinstance(remat, str) else None
        )
        # callback-mutated kwargs (reference `mutate_train_forward_kwargs` /
        # `mutate_train_loss_kwargs`, `schema.py:1726+`) — static closures
        forward_kwargs: Dict[str, Any] = {}
        loss_kwargs: Dict[str, Any] = {}
        for callback in self.callbacks:
            callback.mutate_train_forward_kwargs(forward_kwargs, self)
            callback.mutate_train_loss_kwargs(loss_kwargs, self)

        # tell each step which scopes are live in THIS compiled program so
        # losses can statically gate on sibling steps (AE adversarial start)
        actives_map = {train_steps[i].scope: bool(actives[i]) for i in range(len(train_steps))}
        for ts in train_steps:
            ts.step_actives = actives_map

        # finetune freezing: per-scope boolean mask trees over the diff params
        # (reference sets requires_grad=False, `trainer.py:457-493`; here the
        # functional equivalent zeroes grads before the optimizer — matching
        # the reference's clipping semantics — and updates after it, so
        # decoupled weight decay cannot move frozen leaves either)
        freeze_masks: Dict[str, Any] = {}
        if self._frozen_paths:
            from .toolkit.tree import _key_entry_to_str

            for scope in sorted({ts.scope for ts in train_steps}):
                _, diff0, _ = nnx.split(model, model.params_filter(scope), ...)
                flat, treedef = jax.tree_util.tree_flatten_with_path(diff0)
                mask_leaves = [
                    "/".join(_key_entry_to_str(p) for p in path) in self._frozen_paths
                    for path, _ in flat
                ]
                freeze_masks[scope] = jax.tree_util.tree_unflatten(treedef, mask_leaves)

    # one XLA program: all train steps + optimizer updates + post-step hooks
        def _fn(
            full_state: Any,
            opt_states: Dict[str, Any],
            lr_scales: Dict[str, jax.Array],
            batch: Dict[str, Any],
        ) -> Tuple[Any, Dict[str, Any], Dict[str, jax.Array]]:
            merged = nnx.merge(graphdef, full_state)
            loss_items: Dict[str, jax.Array] = {}
            for i, ts in enumerate(train_steps):
                if not actives[i]:
                    continue
                flt = merged.params_filter(ts.scope)
                if amp_dtype is None:
                    gd, diff, rest = nnx.split(merged, flt, ...)
                    rest_p = None
                else:
                    # split rest into its Param part (cast for compute, but
                    # written back from the untouched f32 originals — params
                    # outside this scope never change during a forward) and
                    # the mutable non-Param remainder (BatchStat/Rng)
                    gd, diff, rest_p, rest = nnx.split(merged, flt, nnx.Param, ...)

                def loss_fn(
                    diff_params: Any, _gd=gd, _rest_p=rest_p, _rest=rest, _ts=ts, _flt=flt
                ) -> Any:
                    # refresh: rebuild Variables at this trace level so
                    # BatchStat/Rng mutations inside forward are legal
                    if amp_dtype is None:
                        m = nnx.merge(_gd, _refresh(diff_params), _refresh(_rest))
                        fwd_batch = batch
                    else:
                        m = nnx.merge(
                            _gd,
                            _refresh(_cast_floating(diff_params, amp_dtype)),
                            _refresh(_cast_floating(_rest_p, amp_dtype)),
                            _refresh(_rest),
                        )
                        fwd_batch = dict(batch)
                        x_in = fwd_batch.get(INPUT_KEY)
                        if x_in is not None and jnp.issubdtype(x_in.dtype, jnp.floating):
                            fwd_batch[INPUT_KEY] = x_in.astype(amp_dtype)
                    fwd = m.run(fwd_batch, training=True, **forward_kwargs)
                    # losses see the ORIGINAL batch (f32 labels/targets)
                    losses = _ts.loss_fn(m, batch, fwd, **loss_kwargs)
                    if amp_dtype is None:
                        _, _, new_rest = nnx.split(m, _flt, ...)
                    else:
                        _, _, _, new_rest = nnx.split(m, _flt, nnx.Param, ...)
                    return losses[LOSS_KEY].astype(jnp.float32), (losses, new_rest)

                if remat:
                    loss_fn = jax.checkpoint(loss_fn, policy=remat_policy)
                grads, (losses, new_rest) = jax.grad(loss_fn, has_aux=True)(diff)
                new_rest = _refresh(new_rest)
                fmask = freeze_masks.get(ts.scope)
                if fmask is not None:
                    grads = jax.tree_util.tree_map(
                        lambda g, fz: jnp.zeros_like(g) if fz else g, grads, fmask
                    )
                updates, new_opt = txs[ts.scope].update(grads, opt_states[ts.scope], diff)
                if fmask is not None:
                    updates = jax.tree_util.tree_map(
                        lambda u, fz: jnp.zeros_like(u) if fz else u, updates, fmask
                    )
                scale = lr_scales.get(ts.scope)
                if scale is not None:
                    updates = jax.tree_util.tree_map(lambda u: u * scale, updates)
                new_diff = optax.apply_updates(diff, updates)
                if rest_p is None:
                    merged = nnx.merge(gd, new_diff, new_rest)
                else:  # AMP: out-of-scope params come back as f32 masters
                    merged = nnx.merge(gd, new_diff, _refresh(rest_p), new_rest)
                opt_states = dict(opt_states)
                opt_states[ts.scope] = new_opt
                prefix = "" if len(train_steps) == 1 else f"{ts.scope}_"
                for k, v in losses.items():
                    # logged scalars in f32 even when AMP computed them bf16
                    if hasattr(v, "dtype") and jnp.issubdtype(v.dtype, jnp.floating):
                        v = v.astype(jnp.float32)
                    loss_items[prefix + k] = v
            merged.post_step_update()
            new_full = nnx.state(merged)
            return new_full, opt_states, loss_items

        donate = (0, 1) if self.config.donate_buffers else ()
        if k == 1:
            return jax.jit(_fn, donate_argnums=donate)

        # steps_per_dispatch (SURVEY §2.10 / VERDICT r4 #3): k steps fused
        # into ONE XLA program via lax.scan over batches stacked on a leading
        # k axis — one host dispatch amortizes the per-call tunnel/dispatch
        # latency over k steps (the reference's Python hot loop dispatches
        # per step, `/root/reference/cflearn/trainer.py:333`). Loss items
        # come back stacked (k,) so the host loss window sees every step.
        def _chunk_fn(
            full_state: Any,
            opt_states: Dict[str, Any],
            lr_scales: Dict[str, jax.Array],
            batches: Dict[str, Any],
        ) -> Tuple[Any, Dict[str, Any], Dict[str, jax.Array]]:
            def body(carry: Any, batch: Dict[str, Any]) -> Any:
                fs, os_ = carry
                fs, os_, items = _fn(fs, os_, lr_scales, batch)
                return (fs, os_), items

            (fs, os_), items = jax.lax.scan(body, (full_state, opt_states), batches)
            return fs, os_, items

        return jax.jit(_chunk_fn, donate_argnums=donate)

    def get_step_fn(self, actives: Tuple[bool, ...], k: int = 1) -> Callable:
        fn = self._step_fn_cache.get((actives, k))
        if fn is None:
            fn = self._build_step_fn(actives, k)
            self._step_fn_cache[(actives, k)] = fn
        return fn

    # ------------------------------------------------------------------- fit

    def fit(
        self,
        data: IData,
        model: IDLModel,
        *,
        config_export_file: Optional[str] = None,
        skip_final_evaluation: bool = False,
        cuda: Any = None,  # kept for API-compat; ignored on TPU
    ) -> "Trainer":
        # the ambient mesh gates attention CP / encoder PP routing and the
        # sanitizer flags are process-global: restore BOTH even when fit
        # raises (a stale pipe/context mesh would route unrelated later code
        # through shard_map on a dead mesh)
        prev_ambient_mesh = get_ambient_mesh()
        # snapshot the caller's ambient sanitizer flags so `finally` restores
        # THEIR values, not hardcoded defaults (fit may also raise before the
        # flags were ever flipped)
        prev_debug_nans = bool(jax.config.jax_debug_nans)
        prev_transfer_guard = jax.config.jax_transfer_guard or "allow"
        try:
            return self._fit_impl(
                data,
                model,
                config_export_file=config_export_file,
                skip_final_evaluation=skip_final_evaluation,
                cuda=cuda,
            )
        finally:
            if self.config.debug_nans:
                jax.config.update("jax_debug_nans", prev_debug_nans)
            if self.config.transfer_guard:
                jax.config.update("jax_transfer_guard", prev_transfer_guard)
            set_mesh(prev_ambient_mesh)

    def _fit_impl(
        self,
        data: IData,
        model: IDLModel,
        *,
        config_export_file: Optional[str] = None,
        skip_final_evaluation: bool = False,
        cuda: Any = None,
    ) -> "Trainer":
        self.model = model
        self._prepare_workspace()

        # preemption resume (SURVEY §5.3): a previous fit against this
        # workspace root that caught SIGTERM left model + optimizer states +
        # counters under `<root>/preemption/` — pick up where it stopped
        self._resume_meta: Optional[Dict[str, Any]] = None
        pre_folder = self.preemption_folder
        # meta.json is written LAST (atomically) by dump_preemption, so its
        # presence marks a COMPLETE dump; a kill mid-dump leaves model.npz
        # without meta.json and we start fresh instead of crashing later
        resume_ok = (
            self.config.resume_from_preemption
            and os.path.isfile(os.path.join(pre_folder, "model.npz"))
            and os.path.isfile(os.path.join(pre_folder, "meta.json"))
        )
        if self.config.resume_from_preemption and jax.process_count() > 1:
            # the dump is written by process 0 only; every process must make
            # the SAME resume decision or replicated device_put diverges and
            # ranks deadlock in collectives at different step counts.
            # Gather EVERY rank's verdict: if they disagree, raise on ALL
            # ranks (a broadcast-only scheme would leave the readable ranks
            # proceeding into collectives and hanging instead of erroring).
            from jax.experimental import multihost_utils

            flags = np.asarray(
                multihost_utils.process_allgather(np.int32(int(resume_ok)))
            ).reshape(-1)
            if int(flags.min()) != int(flags.max()):
                raise RuntimeError(
                    "preemption-resume disagreement: some processes see a "
                    f"complete dump at {pre_folder} and some do not — "
                    "multi-process preemption resume requires the workspace "
                    "on a shared filesystem"
                )
            resume_ok = bool(int(flags.max()))
        if resume_ok:
            with np.load(os.path.join(pre_folder, "model.npz"), allow_pickle=False) as z:
                model.load_state_dict({k: z[k] for k in z.files if k != "__meta__"})
            opt_path = os.path.join(pre_folder, "optimizers.npz")
            if self._preloaded_opt_npd is None and os.path.isfile(opt_path):
                with np.load(opt_path, allow_pickle=False) as z:
                    self._preloaded_opt_npd = {k: z[k] for k in z.files}
            with open(os.path.join(pre_folder, "meta.json"), "r") as f:
                self._resume_meta = json.load(f)
            print(f"> resuming from preemption dump at step {self._resume_meta['step']}")

        # sanitizer analogue (SURVEY §5.2): NaN debugging + transfer guard
        if self.config.debug_nans:
            jax.config.update("jax_debug_nans", True)
        if self.config.transfer_guard:
            jax.config.update("jax_transfer_guard", self.config.transfer_guard)

        # mesh + placement ----------------------------------------------------
        self.mesh = make_mesh(self.config.get_mesh_config())
        set_mesh(self.mesh)

        # validation_split: carve a validation set out of the train arrays
        # when the caller provided none (seeded, so resumes see the same split)
        v_split = self.config.validation_split
        if v_split and getattr(data, "bundle", None) is not None and data.bundle.x_valid is None:
            data.split_validation(v_split, seed=getattr(self.config, "seed", None) or 0)

        train_loader, valid_loader = data.get_loaders()
        self._num_step_per_epoch = len(train_loader)
        self.train_loader = train_loader
        self.valid_loader = valid_loader

        state = TrainerState.from_config(
            self.config,
            num_step_per_epoch=len(train_loader),
            batch_size=train_loader.batch_size,
        )
        if self._resume_meta is not None:
            state.step = int(self._resume_meta.get("step", 0))
            state.epoch = int(self._resume_meta.get("epoch", 0))
        self.state = state

        # graphdefs for train/eval modes -------------------------------------
        model.set_mode(True)
        self._graphdef_train, full_state = nnx.split(model)
        model.set_mode(False)
        self._graphdef_eval, _ = nnx.split(model)
        model.set_mode(True)

        # finetune: pretrained ckpt + freeze/freeze_except regex (reference
        # `trainer.py:457-493`) — runs BEFORE placement so loaded weights get
        # the TP/fsdp sharding too --------------------------------------------
        self._frozen_paths: set = set()
        if self.config.finetune_config:
            full_state = self._init_finetune(model, full_state)

        # parameter placement: TP rules + fsdp sharding, else replicate -------
        tp_size = self.mesh.shape.get("model", 1)
        use_fsdp = self.config.shard_optimizer_states or self.config.use_zero
        if tp_size > 1 or use_fsdp:
            from .parallel.tp import place_params

            full_state = place_params(full_state, self.mesh, use_fsdp=use_fsdp)
        else:
            full_state = jax.device_put(full_state, replicated_sharding(self.mesh))

        # optimizers ----------------------------------------------------------
        self._build_optimizers(model)
        opt_states: Dict[str, Any] = {}
        for scope, tx in self.txs.items():
            merged = nnx.merge(self._graphdef_train, full_state)
            _, diff, _ = nnx.split(merged, merged.params_filter(scope), ...)
            opt_states[scope] = tx.init(diff)
        if self._preloaded_opt_npd:
            # resume: restore serialized optimizer states (reference
            # `SerializeOptimizerBlock`, `pipeline/blocks/basic.py:833-868`)
            from .toolkit.tree import npd_to_tree

            for scope in list(opt_states):
                sub = {
                    k[len(scope) + 2 :]: v
                    for k, v in self._preloaded_opt_npd.items()
                    if k.startswith(scope + "::")
                }
                if sub:
                    try:
                        opt_states[scope] = npd_to_tree(sub, opt_states[scope], strict=True)
                    except KeyError:
                        pass  # structure changed → fresh optimizer

        self.inference.bind(self)

        # workspace artifacts (reference `trainer.py:286-293` + `model.txt`)
        if is_local_rank_0():
            try:
                from .toolkit.init_summary import summary as _summary

                with open(os.path.join(self.workspace, "summary.txt"), "w") as f:
                    f.write(_summary(model, return_only=True))
                with open(os.path.join(self.workspace, "model.txt"), "w") as f:
                    f.write(repr(model))
            except Exception:  # noqa: BLE001 — observability must not break fit
                pass

        # callbacks -----------------------------------------------------------
        for callback in self.callbacks:
            callback.initialize()
        for callback in self.callbacks:
            callback.before_loop(self)

        batcher = DeviceBatcher(
            train_loader,
            sharding=data_sharding(self.mesh) if self.mesh.size > 1 else None,
        )

        terminate = False
        self._full_state = full_state
        self._opt_states = opt_states
        start_t = time.time()
        has_ckpt = False
        self._has_ckpt = False  # mirrors has_ckpt; survives KeyboardInterrupt

        # preemption safety: TPU preemption delivers SIGTERM — finish the
        # in-flight step, dump a resumable snapshot, stop cleanly
        self._preempted = False
        self._preemption_dumped = False
        prev_sigterm: Any = None
        if self.config.save_on_preemption:
            import signal
            import threading

            if threading.current_thread() is threading.main_thread():
                def _on_sigterm(signum: int, frame: Any) -> None:
                    self._preempted = True

                try:
                    prev_sigterm = signal.signal(signal.SIGTERM, _on_sigterm)
                except ValueError:  # pragma: no cover - non-main interpreter
                    prev_sigterm = None

        try:
            terminate, has_ckpt = self._loop(state, batcher, model, terminate, has_ckpt)
        except KeyboardInterrupt:
            # graceful terminate (reference `trainer.py:348-352`; re-raise in
            # multi-process settings so the whole fleet stops)
            if jax.process_count() > 1:
                raise
            print("> keyboard interrupt — terminating gracefully")
            has_ckpt = self._has_ckpt  # keep the best-ckpt rollback contract
        finally:
            if prev_sigterm is not None:
                import signal

                try:
                    signal.signal(signal.SIGTERM, prev_sigterm)
                except ValueError:  # pragma: no cover
                    pass

        # SIGTERM delivery is per-process: one rank may have caught it while
        # the others did not. All-reduce (OR) the flag so EVERY rank takes
        # the same post-loop path — otherwise the preempted rank skips the
        # collective final eval/rollback and the rest deadlock inside it.
        self._sync_preempted()

        # SIGTERM can land OUTSIDE the in-loop check window (during the final
        # step's monitor/eval, or between the last step and loop exit) — the
        # flag is set but no dump was written; write it now so a preempted
        # fit ALWAYS leaves a resumable snapshot
        if self._preempted and not self._preemption_dumped:
            self.dump_preemption()
            print(f"> SIGTERM — preemption dump written at step {state.step}")

        # rollback to best checkpoint (reference `trainer.py:363-366`).
        # All processes restore (reads are safe on every rank) so model state
        # stays consistent across hosts for subsequent collective eval.
        self._sync_state_to_model()
        if has_ckpt and not self._preempted:
            self.restore_checkpoint()

        if not skip_final_evaluation and not self._preempted:
            with state.disable_logging:
                self.final_results = self._get_metrics(portion=self.config.valid_portion)
        if self.final_results is not None:
            self._log_metrics_msg(self.final_results)
        if not has_ckpt and not self._preempted and is_local_rank_0():
            score = self.final_results.final_score if self.final_results is not None else 0.0
            self.save_checkpoint(score)
        self._drain_checkpoints()
        if not self._preempted and is_local_rank_0():
            # a normally-completed fit invalidates any preemption dump
            import shutil

            shutil.rmtree(self.preemption_folder, ignore_errors=True)

        for callback in self.callbacks:
            callback.finalize(self)
        self._fit_wall_time = time.time() - start_t
        return self

    def _fusable_len(self, state: TrainerState, k: int, model: IDLModel) -> int:
        """Longest chunk length L ≤ k such that fusing steps
        `state.step+1 .. state.step+L` into one dispatch crosses NO cadence
        boundary except at its end: monitor/snapshot steps, log steps,
        `fixed_steps`, profile steps and train-step `actives` changes all
        land on chunk edges, so monitor/callback semantics stay bit-identical
        to k=1."""
        s = state.step

        def until(period: int) -> int:
            return period - (s % period)

        L = min(k, until(state.num_step_per_snapshot), until(state.num_step_per_log))
        if state.fixed_steps is not None:
            L = min(L, max(1, state.fixed_steps - s))
        for p in self.config.profile_steps or ():
            if s < p <= s + L:
                # a profiled step runs un-fused (its own trace window)
                L = max(1, p - s - 1)
        if L > 1:
            # cut where the active train-step set changes (e.g. a GAN
            # discriminator coming online at d_loss_start_step)
            base = None
            cut = L
            for i in range(1, L + 1):
                state.step = s + i
                a = tuple(not ts.should_skip(model, state) for ts in model.train_steps)
                if base is None:
                    base = a
                elif a != base:
                    cut = i - 1
                    break
            state.step = s
            L = cut
        return max(1, L)

    @staticmethod
    def _stack_batches(chunk: List[Dict[str, Any]]) -> Dict[str, Any]:
        """Stack k step batches on a new leading axis for the fused scan
        (values pre-checked array-typed by the collection loop; jax arrays
        stack on device, numpy on host)."""
        out: Dict[str, Any] = {}
        for key in chunk[0]:
            vals = [b[key] for b in chunk]
            if isinstance(vals[0], jax.Array):
                out[key] = jnp.stack(vals)
            else:
                out[key] = np.stack(vals)
        return out

    def _loop(self, state: TrainerState, batcher: DeviceBatcher, model: IDLModel, terminate: bool, has_ckpt: bool) -> Tuple[bool, bool]:
        k_cfg = max(1, int(self.config.steps_per_dispatch or 1))
        # lr scales change only at monitor cadence (plateau events): cache
        # the device scalars instead of re-uploading per step
        lr_cache: Dict[Tuple, Dict[str, jnp.ndarray]] = {}

        def get_lr_scales() -> Dict[str, jnp.ndarray]:
            key = tuple((s, float(ps.scale)) for s, ps in sorted(self.lr_scales.items()))
            cached = lr_cache.get(key)
            if cached is None:
                cached = {s: jnp.asarray(v, dtype=jnp.float32) for s, v in key}
                lr_cache[key] = cached
            return cached
        while state.should_train and not terminate:
            state.epoch += 1
            batch_it = iter(batcher)
            pending: Optional[Dict[str, Any]] = None
            while True:
                if not state.should_train:
                    break
                if pending is not None:
                    np_batch, pending = pending, None
                else:
                    try:
                        np_batch = next(batch_it)
                    except StopIteration:
                        break
                # collect up to _fusable_len batches for one fused dispatch
                # (k_cfg=1 → always a single step, the default path); batches
                # with non-array values cannot thread through scan → L=1
                chunk = [np_batch]
                stackable = k_cfg > 1 and all(
                    isinstance(v, jax.Array)
                    or (isinstance(v, np.ndarray) and v.dtype != object)
                    for v in np_batch.values()
                )
                if stackable:
                    L = self._fusable_len(state, k_cfg, model)
                    shapes = jax.tree_util.tree_map(
                        lambda a: getattr(a, "shape", None), np_batch
                    )
                    while len(chunk) < L:
                        try:
                            nb = next(batch_it)
                        except StopIteration:
                            break
                        if (
                            jax.tree_util.tree_map(
                                lambda a: getattr(a, "shape", None), nb
                            )
                            != shapes
                        ):
                            # ragged tail batch — becomes its own dispatch
                            pending = nb
                            break
                        chunk.append(nb)
                state.step += 1
                # first-class profiling (SURVEY §5.1): capture a jax.profiler
                # trace for the configured steps into workspace/traces
                profiling = bool(self.config.profile_steps) and state.step in self.config.profile_steps
                if profiling:
                    jax.profiler.start_trace(os.path.join(self.workspace, "traces"))
                actives = tuple(
                    not ts.should_skip(model, state) for ts in model.train_steps
                )
                lr_scales = get_lr_scales()
                if len(chunk) == 1:
                    step_fn = self.get_step_fn(actives)
                    self._full_state, self._opt_states, loss_items = step_fn(
                        self._full_state, self._opt_states, lr_scales, np_batch
                    )
                else:
                    state.step += len(chunk) - 1
                    stacked = self._stack_batches(chunk)
                    step_fn = self.get_step_fn(actives, len(chunk))
                    # loss_items leaves come back stacked (len(chunk),)
                    self._full_state, self._opt_states, loss_items = step_fn(
                        self._full_state, self._opt_states, lr_scales, stacked
                    )
                if profiling:
                    jax.block_until_ready(jax.tree_util.tree_leaves(loss_items))
                    jax.profiler.stop_trace()
                if self._maybe_sync_preempted(state):
                    # the step that was in flight when SIGTERM arrived has
                    # completed — dump a resumable snapshot and stop
                    self.dump_preemption()
                    print(f"> SIGTERM — preemption dump written at step {state.step}")
                    return True, has_ckpt

                for k, v in loss_items.items():
                    window = self._loss_window.setdefault(k, [])
                    if len(chunk) > 1:
                        # fused dispatch: one (k,) leaf per item — the window
                        # still records every step (lazy device slices, no
                        # host sync here)
                        window.extend(v[i] for i in range(len(chunk)))
                    else:
                        window.append(v)
                    if len(window) > 64:
                        del window[:-64]

                # monitor BEFORE the logging drain: train-loss monitoring
                # peeks the window, and log/monitor cadences coincide by
                # default — draining first would score an empty window
                if state.should_monitor:
                    monitor_results = self._monitor_step(state)
                    if monitor_results.save_checkpoint and is_local_rank_0():
                        assert monitor_results.metric_outputs is not None
                        self.save_checkpoint(monitor_results.metric_outputs.final_score)
                        has_ckpt = True
                        self._has_ckpt = True
                    for callback in self.callbacks:
                        callback.after_monitor(monitor_results, state)
                    if monitor_results.terminate:
                        terminate = True

                if state.should_log_losses:
                    host_losses = self._drain_loss_window()
                    for callback in self.callbacks:
                        callback.after_step(StepOutputs(None, host_losses), state)

                if state.should_log_artifacts:
                    # artifact dumps (image grids etc. — reference
                    # `trainer.py:537-539`)
                    self._sync_state_to_model()
                    for callback in self.callbacks:
                        callback.log_artifacts(self)

                if terminate:
                    break
        return terminate, has_ckpt

    def _init_finetune(self, model: IDLModel, full_state: Any) -> Any:
        """Load a pretrained checkpoint and freeze params by regex (reference
        `trainer.py:457-493`). Frozen params get zero updates via an optax
        mask rather than optimizer toggling."""
        import re

        cfg = dict(self.config.finetune_config or {})
        ckpt = cfg.get("pretrained_ckpt")
        if ckpt:
            loaded = IDLModel.load(ckpt)
            model.load_state_dict(loaded.state_dict(), strict=False)
            model.set_mode(True)
            _, full_state = nnx.split(model)
        freeze = cfg.get("freeze", "")
        freeze_except = cfg.get("freeze_except", "")
        if freeze and freeze_except:
            raise ValueError("`freeze` & `freeze_except` should not be provided together")
        if freeze or freeze_except:
            from .toolkit.tree import tree_to_npd

            npd_keys = tree_to_npd(nnx.state(model, nnx.Param)).keys()
            pattern = re.compile(freeze or freeze_except)
            for k in npd_keys:
                hit = bool(pattern.search(k))
                if (freeze and hit) or (freeze_except and not hit):
                    self._frozen_paths.add(k)
        return full_state

    # ------------------------------------------------------------- monitoring

    def _drain_loss_window(self) -> Dict[str, float]:
        out = self._peek_loss_window()
        self._loss_window = {}
        return out

    def _peek_loss_window(self) -> Dict[str, float]:
        return {
            k: float(np.mean([np.asarray(v) for v in vs[-8:]]))
            for k, vs in self._loss_window.items()
            if vs
        }

    def _sync_state_to_model(self) -> None:
        nnx.update(self.model, self._full_state)

    def _get_metrics(self, *, portion: float = 1.0) -> MetricsOutputs:
        state = self.state
        loader = self.valid_loader if self.valid_loader is not None else self.train_loader
        self._sync_state_to_model()
        outputs = self.inference.get_outputs(
            loader,
            portion=portion,
            metrics=self.metrics,
            use_losses_as_metrics=self._use_losses_as_metrics,
            return_outputs=False,
        )
        metric_outputs = outputs.metric_outputs
        if metric_outputs is None:
            score = weighted_loss_score(outputs.loss_items or {}, self.config.loss_metrics_weights)
            metric_outputs = MetricsOutputs(score, dict(outputs.loss_items or {}), {})
        self.intermediate = metric_outputs
        return metric_outputs

    @property
    def _use_losses_as_metrics(self) -> bool:
        if self.config.use_losses_as_metrics is not None:
            return self.config.use_losses_as_metrics
        return self.metrics is None

    def _monitor_step(self, state: TrainerState) -> MonitorResults:
        terminate = False
        save_checkpoint = False
        if self.valid_loader is None and self._use_losses_as_metrics:
            # no valid set → score from the running train loss (reference
            # `use_incrementer_for_train_loss`, avoids a full eval pass per
            # monitor step)
            host_losses = self._peek_loss_window()
            if not host_losses:
                # drained window (monitor after an out-of-band log) — a 0.0
                # score would look like a huge improvement; do a real eval
                metric_outputs = self._get_metrics(portion=self.config.valid_portion)
            else:
                score = weighted_loss_score(host_losses, self.config.loss_metrics_weights)
                metric_outputs = MetricsOutputs(score, host_losses, {})
            self.intermediate = metric_outputs
        else:
            metric_outputs = self._get_metrics(portion=self.config.valid_portion)
        score = metric_outputs.final_score
        # plateau schedulers consume the score
        for scope, plateau in self.lr_scales.items():
            plateau.update(score)
        if state.should_start_snapshot:
            for monitor in self.monitors:
                monitor.handle_extension(state)
                if monitor.should_snapshot(score) and state.can_snapshot:
                    state.update_snapshot_epoch()
                    save_checkpoint = True
                if monitor.should_terminate(score):
                    terminate = True
        if state.reached_max_epoch:
            terminate = True
        if state.should_log_metrics_msg:
            self._log_metrics_msg(metric_outputs)
        return MonitorResults(terminate, save_checkpoint, metric_outputs)

    def _log_metrics_msg(self, metric_outputs: MetricsOutputs) -> None:
        state = self.state
        for callback in self.callbacks:
            callback.log_metrics(metric_outputs, state)
            callback.log_metrics_msg(metric_outputs, self.metrics_log_path, state)

    # ------------------------------------------------------------ checkpoints

    def save_checkpoint(
        self,
        score: float,
        folder: Optional[str] = None,
        *,
        no_history: bool = False,
    ) -> None:
        """Top-k by score with `scores.json` (reference `trainer.py:380-419`).

        With `config.async_checkpointing`, the device->host pull and the
        compressed write run on a background thread (jax arrays are
        immutable, so snapshotting the state tree up front is race-free);
        `_drain_checkpoints` orders restores behind pending writes."""
        if folder is None:
            folder = self.checkpoint_folder
        os.makedirs(folder, exist_ok=True)
        state = self.state
        step = state.step if state is not None else 0
        self._sync_state_to_model()
        file = f"{CKPT_PREFIX}{step}.npz"
        path = os.path.join(folder, file)
        if self.config.async_checkpointing:
            from concurrent.futures import ThreadPoolExecutor

            from .toolkit.tree import tree_to_npd

            if self._ckpt_executor is None:
                self._ckpt_executor = ThreadPoolExecutor(max_workers=1)
            # snapshot with a device-side COPY of each leaf: jax arrays are
            # immutable but not donation-proof — with donate_buffers the next
            # train step donates these exact buffers and a deferred host pull
            # would hit "Buffer has been deleted or donated". An HBM copy is
            # cheap (no host round-trip) and owned by the snapshot alone.
            tree = jax.tree.map(
                lambda x: x.copy() if isinstance(x, jax.Array) else x,
                nnx.state(self.model),
            )

            # bind `path`/`tree` NOW: the retention loop below rebinds locals
            # before the executor thread runs
            def _write(path: str = path, tree: Any = tree) -> None:
                self.model.save(path, npd=tree_to_npd(tree))

            self._ckpt_futures.append(self._ckpt_executor.submit(_write))
        else:
            self.model.save(path)
        scores = {} if no_history else get_scores(folder)
        scores[file] = score
        # retention: keep best `max_snapshot_file`
        sorted_files = list(sort_dict_by_value(scores, reverse=True).keys())
        for stale in sorted_files[self.config.max_snapshot_file:]:
            stale_path = os.path.join(folder, stale)
            if os.path.isfile(stale_path):
                os.remove(stale_path)
            scores.pop(stale, None)
        with open(os.path.join(folder, SCORES_FILE), "w") as f:
            json.dump(scores, f, indent=2)
        self.checkpoint_scores = scores

    def _sync_preempted(self) -> bool:
        """All-reduce (OR) the per-process SIGTERM flag so every rank takes
        the same control-flow path; SIGTERM delivery is per-process."""
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            any_preempted = np.asarray(
                multihost_utils.process_allgather(np.int32(int(self._preempted)))
            ).max()
            self._preempted = bool(int(any_preempted))
        return self._preempted

    def _maybe_sync_preempted(self, state: "TrainerState") -> bool:
        """In-loop preemption check. Multi-process runs must agree on it, and
        the OR-sync is itself a collective — so the decision to sync must be
        rank-identical. Sync every step when save_on_preemption is on (a
        scalar allgather is tiny next to a train step); single-process runs
        read the local flag directly."""
        if jax.process_count() > 1 and self.config.save_on_preemption:
            return self._sync_preempted()
        return self._preempted

    def dump_preemption(self) -> str:
        """Resumable snapshot for SIGTERM/preemption (SURVEY §5.3): model
        states + optimizer states + step/epoch counters, written
        SYNCHRONOUSLY (the process is about to die) to the workspace root.
        meta.json is written LAST via temp-file+rename so its presence marks
        a complete dump (resume gates on it); a kill mid-dump therefore
        leads to a fresh start, not a crash."""
        folder = self.preemption_folder
        self._drain_checkpoints()
        self._sync_state_to_model()
        if is_local_rank_0():
            os.makedirs(folder, exist_ok=True)
            self.model.save(os.path.join(folder, "model.npz"))
            from .toolkit.tree import tree_to_npd

            npd: Dict[str, Any] = {}
            for scope, st in (self._opt_states or {}).items():
                npd.update({f"{scope}::{k}": v for k, v in tree_to_npd(st).items()})
            np.savez_compressed(os.path.join(folder, "optimizers.npz"), **npd)
            state = self.state
            meta_path = os.path.join(folder, "meta.json")
            tmp_path = meta_path + ".tmp"
            with open(tmp_path, "w") as f:
                json.dump(
                    {
                        "step": state.step if state is not None else 0,
                        "epoch": state.epoch if state is not None else 0,
                    },
                    f,
                )
            os.replace(tmp_path, meta_path)
        self._preemption_dumped = True
        return folder

    def _drain_checkpoints(self) -> None:
        """Wait for pending async checkpoint writes (re-raises their errors)."""
        futures, self._ckpt_futures = self._ckpt_futures, []
        for fut in futures:
            fut.result()

    def restore_checkpoint(self, folder: Optional[str] = None) -> bool:
        """Roll back to the best checkpoint (reference `trainer.py:421-453`)."""
        self._drain_checkpoints()
        if folder is None:
            folder = self.checkpoint_folder
        best = get_sorted_checkpoints(folder)
        if not best:
            return False
        path = os.path.join(folder, best[0])
        if not os.path.isfile(path):
            return False
        loaded = IDLModel.load(path)
        self.model.load_state_dict(loaded.state_dict())
        self._full_state = nnx.state(self.model)
        return True


def get_input_sample(loader: Any) -> Dict[str, Any]:
    """First batch, truncated to one sample per key (reference
    `trainer.py:75`)."""
    sample = dict(next(iter(loader)))
    for k, v in sample.items():
        if isinstance(v, (np.ndarray, jax.Array)):
            sample[k] = v[:1]
        elif isinstance(v, list):
            sample[k] = [vv[:1] if isinstance(vv, (np.ndarray, jax.Array)) else vv for vv in v]
    return sample


def get_update_fn(trainer: "Trainer") -> Any:
    """The trainer's compiled step-function factory (reference
    `schema.py:977` builds the torch update closure; here the whole
    forward+loss+update is one jitted program keyed by the active-step
    tuple)."""
    return trainer.get_step_fn
