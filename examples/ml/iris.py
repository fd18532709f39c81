"""Iris end-to-end (reference `examples/ml/simple/iris.py`): fit → predict →
serialize round trip → evaluate."""

import argparse
import os

import numpy as np


def main(ci: bool) -> None:
    import jax

    if ci:
        jax.config.update("jax_platforms", "cpu")
    import cflearn_tpu as cf
    from cflearn_tpu.data.ml.datasets import iris_data

    x, y = iris_data()
    config = cf.MLConfig(module_name="fcnn", workspace="_iris")
    if ci:
        config.to_debug()
    p = cf.fit_ml(x, y, config=config)
    preds = p.predict(x[:8], return_classes=True)["predictions"]
    print("predictions:", preds.ravel())
    folder = os.path.join(p._workspace, "pipeline")
    loaded = cf.load_inference(folder)
    assert np.array_equal(loaded.predict(x[:8], return_classes=True)["predictions"], preds)
    cf.evaluate(p, x, y, metrics="acc")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--ci", type=int, default=0)
    args = parser.parse_args()
    main(bool(args.ci))
