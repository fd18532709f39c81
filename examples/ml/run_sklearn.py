"""sklearn runner task (reference `examples/ml/iris/run_sklearn.py`):
launched by the Experiment scheduler as a custom `run_command`; reads the
shared experiment data via `get_info()`, fits a sklearn model, pickles it
into the task workspace."""

import os
import pickle

import numpy as np

from sklearn.tree import DecisionTreeClassifier
from sklearn.ensemble import RandomForestClassifier
from cflearn_tpu.constants import INPUT_KEY, LABEL_KEY
from cflearn_tpu.dist.ml.runs._utils import get_info


if __name__ == "__main__":
    import sys

    if not os.environ.get("CFLEARN_TPU_TASK_FOLDER") and not any(
        a.startswith("--task_folder") for a in sys.argv[1:]
    ):
        # launched standalone (e.g. the --ci smoke matrix): nothing to do —
        # this script only makes sense as an Experiment `run_command`
        print("run_sklearn is an Experiment task runner; see iris_sklearn.py")
        raise SystemExit(0)
    info = get_info()
    meta = info.meta
    # data
    data = info.data
    assert data is not None
    loader = data.get_loaders()[0]
    dataset = loader.get_full_batch()
    x, y = dataset[INPUT_KEY], dataset[LABEL_KEY]
    assert isinstance(x, np.ndarray)
    assert isinstance(y, np.ndarray)
    # model
    model = meta["module"]
    if model == "decision_tree":
        base = DecisionTreeClassifier
    elif model == "random_forest":
        base = RandomForestClassifier
    else:
        raise NotImplementedError(model)
    sk_model = base()
    # train & save
    sk_model.fit(x, y.ravel())
    with open(os.path.join(info.workspace, "sk_model.pkl"), "wb") as f:
        pickle.dump(sk_model, f)
