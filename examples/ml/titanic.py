"""Titanic-style CSV training (reference `examples/ml/titanic`): a raw CSV
with string categoricals and missing cells goes straight into `fit_ml` —
FileParser → Recognizer → NanHandler → Splitter → PreProcessor → Gather
handle parsing/encoding/imputation, and predictions recover label strings.
The CSV is synthesized locally (no download) with the same column shapes.
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
            # plant signal: women in low classes mostly survive
            p = 0.8 if (sex == "female" and pclass < 3) else 0.25
            w.writerow([pclass, sex, age, fare, embarked, int(rng.random() < p)])


def main(ci: bool) -> None:
    import jax

    if ci:
        jax.config.update("jax_platforms", "cpu")
    import cflearn_tpu as cf

    workspace = tempfile.mkdtemp(prefix="titanic_")
    csv_path = os.path.join(workspace, "titanic.csv")
    make_csv(csv_path)

    config = cf.MLConfig(module_name="fcnn", workspace=os.path.join(workspace, "ws"))
    if ci:
        config.to_debug()
    p = cf.fit_ml(csv_path, config=config)
    preds = p.predict(csv_path, return_classes=True)["predictions"]
    print("predictions:", preds.ravel()[:10])
    folder = os.path.join(p._workspace, "pipeline")
    loaded = cf.load_inference(folder)
    assert np.array_equal(
        loaded.predict(csv_path, return_classes=True)["predictions"], preds
    )
    # feature attribution (reference `run_titanic_interpret.py`)
    interpreter = cf.ml.Interpreter(p.data, p.model)
    importances = interpreter.interpret(
        csv_path, export_path=os.path.join(workspace, "titanic_interpret.png")
    )
    print("feature importances:", np.round(importances, 4))


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--ci", type=int, default=0)
    args = parser.parse_args()
    main(bool(args.ci))
