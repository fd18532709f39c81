"""Toy regression (reference `examples/ml/simple/toy.py`): the same linear
synthetic task fitted twice under a `multi_task` (mae + mse) loss — once with
the gather-only advanced processor (raw features) and once with the bundled
tabular stack (normalizing PreProcessor included) — and the preprocessed run
must score at least as well.
"""

import argparse


def main(ci: bool) -> None:
    import jax

    if ci:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import cflearn_tpu as cf

    from cflearn_tpu.data.ml.api import MLAdvancedProcessorConfig

    rng = np.random.RandomState(123)
    x = rng.random((1000, 10)).astype(np.float32)
    w = rng.random((10, 1)).astype(np.float32)
    y = (x.dot(w) * 100.0).astype(np.float32)

    def make_config(workspace: str) -> "cf.MLConfig":
        config = cf.MLConfig(
            module_name="fcnn",
            module_config=dict(input_dim=x.shape[1], output_dim=y.shape[1]),
            loss_name="multi_task",
            loss_config=dict(loss_names=["mae", "mse"]),
            metric_names=["mae", "mse"],
            lr=3e-3,
            workspace=workspace,
        )
        if ci:
            config.to_debug()
        return config

    # raw features: gather-only processor, labels unnormalized
    m = cf.fit_ml(
        x, y, config=make_config("_toy_raw"), processor_config=MLAdvancedProcessorConfig()
    )
    raw_preds = m.predict(x[:5])[cf.PREDICTIONS_KEY]
    metrics = cf.evaluate(m, x, y, metrics=["mae", "mse"], verbose=False)["pipeline"]

    # bundled tabular stack: PreProcessor normalizes features + labels
    m2 = cf.fit_ml(x, y, config=make_config("_toy_processed"))
    proc_preds = m2.predict(x[:5])[cf.PREDICTIONS_KEY]
    metrics2 = cf.evaluate(m2, x, y, metrics=["mae", "mse"], verbose=False)["pipeline"]

    print("> compare (raw)\n", np.hstack([np.asarray(raw_preds), y[:5]]))
    print("> compare (processed)\n", np.hstack([np.asarray(proc_preds), y[:5]]))
    print("> metrics ", metrics)
    print("> metrics2", metrics2)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--ci", type=int, default=0)
    main(bool(parser.parse_args().ci))
