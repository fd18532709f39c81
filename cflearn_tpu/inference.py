"""`DLInference` — batched inference + metric aggregation.

Parity: reference `cflearn/inference.py:32-214` — `get_outputs` loops a
loader (optionally a portion of it), runs the model in eval mode, collects
numpy outputs, evaluates metrics (per-batch averaged, or on the full
concatenation for `requires_all` metrics like AUC, `schema.py:845-855`), and
can use losses as metrics.

TPU-native: the eval step is one jitted program (forward + all train-step
losses) over the split state; numpy conversion happens once per batch at the
host boundary.
"""

import math
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import numpy as np
from flax import nnx

from .constants import LABEL_KEY, PREDICTIONS_KEY
from .schema.data import IDataLoader
from .schema.metrics_schema import IMetric, MetricsOutputs
from .schema.model import IDLModel
from .toolkit.misc import np_dict_type


class InferenceOutputs:
    def __init__(
        self,
        forward_results: np_dict_type,
        labels: Optional[np.ndarray],
        metric_outputs: Optional[MetricsOutputs],
        loss_items: Optional[Dict[str, float]],
    ) -> None:
        self.forward_results = forward_results
        self.labels = labels
        self.metric_outputs = metric_outputs
        self.loss_items = loss_items


class DLInference:
    def __init__(self, *, model: Optional[IDLModel] = None) -> None:
        self.model = model
        self.trainer: Any = None
        self._eval_cache: Dict[Any, Callable] = {}

    def bind(self, trainer: Any) -> None:
        self.trainer = trainer
        self.model = trainer.model

    # ----------------------------------------------------------------- jitted

    def _get_fns(self, model: IDLModel, compute_losses: bool) -> Tuple[Any, Any, Callable]:
        model.set_mode(False)
        graphdef, state = nnx.split(model)
        key = (id(model), compute_losses)
        fn = self._eval_cache.get(key)
        if fn is None:
            train_steps = model.train_steps if compute_losses else []

            def _eval(st: Any, batch: Dict[str, Any]) -> Any:
                m = nnx.merge(graphdef, st)
                fwd = m.run(batch, training=False)
                losses: Dict[str, jax.Array] = {}
                for ts in train_steps:
                    try:
                        sub = ts.loss_fn(m, batch, fwd)
                    except Exception:  # noqa: BLE001 — loss not computable in eval
                        continue
                    prefix = "" if len(train_steps) == 1 else f"{ts.scope}_"
                    for k, v in sub.items():
                        losses[prefix + k] = v
                return fwd, losses

            fn = jax.jit(_eval)
            self._eval_cache[key] = fn
        return graphdef, state, fn

    # -------------------------------------------------------------------- api

    def get_outputs(
        self,
        loader: IDataLoader,
        *,
        portion: float = 1.0,
        metrics: Optional[IMetric] = None,
        use_losses_as_metrics: bool = False,
        return_outputs: bool = True,
        return_labels: bool = False,
        recover_labels_fn: Optional[Callable[[np.ndarray], np.ndarray]] = None,
        **kwargs: Any,
    ) -> InferenceOutputs:
        model = self.model
        assert model is not None, "model is not provided/bound"
        _, state, eval_fn = self._get_fns(model, use_losses_as_metrics)

        num_batches = max(1, int(math.ceil(len(loader) * portion)))
        requires_all = metrics is not None and metrics.requires_all

        all_np_outputs: List[np_dict_type] = []
        all_labels: List[np.ndarray] = []
        batch_sizes: List[int] = []
        metric_batches: List[MetricsOutputs] = []
        loss_sums: Dict[str, float] = {}
        loss_weights = 0.0

        keep_outputs = return_outputs or requires_all

        with loader.temporarily_disable_shuffle():
            for i, np_batch in enumerate(loader):
                if i >= num_batches:
                    break
                fwd, losses = eval_fn(state, np_batch)
                np_outputs = {
                    k: np.asarray(v) for k, v in fwd.items() if isinstance(v, jax.Array)
                }
                bs = _batch_len(np_batch)
                batch_sizes.append(bs)
                if keep_outputs:
                    all_np_outputs.append(np_outputs)
                label = np_batch.get(LABEL_KEY)
                if label is not None and (return_labels or requires_all):
                    all_labels.append(np.asarray(label))
                if use_losses_as_metrics:
                    for k, v in losses.items():
                        loss_sums[k] = loss_sums.get(k, 0.0) + float(np.asarray(v)) * bs
                    loss_weights += bs
                if metrics is not None and not requires_all:
                    metric_batches.append(metrics.evaluate(np_batch, np_outputs))

        stacked: np_dict_type = {}
        if keep_outputs and all_np_outputs:
            keys = all_np_outputs[0].keys()
            stacked = {
                k: np.concatenate([o[k] for o in all_np_outputs], axis=0)
                if all_np_outputs[0][k].ndim > 0
                else np.stack([o[k] for o in all_np_outputs])
                for k in keys
            }
        labels = np.concatenate(all_labels, axis=0) if all_labels else None

        loss_items: Optional[Dict[str, float]] = None
        if use_losses_as_metrics and loss_weights > 0:
            loss_items = {k: v / loss_weights for k, v in loss_sums.items()}

        metric_outputs: Optional[MetricsOutputs] = None
        if metrics is not None:
            if requires_all:
                full_batch = {LABEL_KEY: labels}
                metric_outputs = metrics.evaluate(full_batch, stacked)
            elif metric_batches:
                total = float(sum(batch_sizes[: len(metric_batches)]))
                score = sum(m.final_score * b for m, b in zip(metric_batches, batch_sizes)) / total
                values: Dict[str, float] = {}
                is_positive: Dict[str, bool] = {}
                for m, b in zip(metric_batches, batch_sizes):
                    for k, v in m.metric_values.items():
                        values[k] = values.get(k, 0.0) + v * b
                    is_positive.update(m.is_positive)
                values = {k: v / total for k, v in values.items()}
                metric_outputs = MetricsOutputs(score, values, is_positive)

        if recover_labels_fn is not None and PREDICTIONS_KEY in stacked:
            stacked[PREDICTIONS_KEY] = recover_labels_fn(stacked[PREDICTIONS_KEY])

        return InferenceOutputs(
            stacked if return_outputs else {},
            labels if return_labels else None,
            metric_outputs,
            loss_items,
        )


def _batch_len(np_batch: np_dict_type) -> int:
    for v in np_batch.values():
        if isinstance(v, np.ndarray) and v.ndim >= 1:
            return v.shape[0]
    return 1


# reference interface name (`schema.py:954` IInference)
IInference = DLInference
