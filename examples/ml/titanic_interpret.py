"""Feature-importance interpretation on the titanic-style CSV task
(reference `examples/ml/titanic/run_titanic_interpret.py`): fit the
wide-and-deep model on a raw CSV with categoricals + missing cells, then run
the integrated-gradients `Interpreter` and export the importance bar chart.
"""

import argparse
import csv
import os
import tempfile

import numpy as np


def make_csv(path: str, n: int = 200, seed: int = 0) -> None:
    rng = np.random.default_rng(seed)
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["pclass", "sex", "age", "fare", "embarked", "survived"])
        for _ in range(n):
            pclass = int(rng.integers(1, 4))
            sex = rng.choice(["male", "female"])
            age = "" if rng.random() < 0.15 else f"{rng.uniform(1, 80):.1f}"
            fare = f"{rng.uniform(5, 500):.2f}"
            embarked = rng.choice(["S", "C", "Q"])
            p = 0.8 if (sex == "female" and pclass < 3) else 0.25
            w.writerow([pclass, sex, age, fare, embarked, int(rng.random() < p)])


def main(ci: bool) -> None:
    import jax

    if ci:
        jax.config.update("jax_platforms", "cpu")
    import cflearn_tpu as cf

    workspace = tempfile.mkdtemp(prefix="titanic_interpret_")
    csv_path = os.path.join(workspace, "titanic.csv")
    make_csv(csv_path)

    config = cf.MLConfig(
        module_name="wnd",
        loss_name="bce",
        metric_names=["acc", "auc"],
        workspace=os.path.join(workspace, "ws"),
    )
    if ci:
        config.to_debug()
    p = cf.fit_ml(csv_path, config=config)

    interpreter = cf.ml.Interpreter(p.data, p.model)
    export_path = os.path.join(workspace, "titanic_interpret.png")
    importances = interpreter.interpret(csv_path, export_path=export_path)
    print("importances:", np.round(importances, 4))
    print("chart:", export_path, os.path.isfile(export_path))


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--ci", type=int, default=0)
    main(bool(parser.parse_args().ci))
