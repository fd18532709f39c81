"""California housing with mlflow logging (reference
`examples/ml/mlflow/california_with_mlflow.py`): multi-task mae+mse loss,
an advanced processor-block selection, and the `mlflow` callback. The
callback silently no-ops when the `mlflow` package is absent, so the example
exercises the full wiring either way; with mlflow installed an `mlruns`
folder appears in the working dir (`mlflow server` then serves the curves).
"""

import argparse


def main(ci: bool) -> None:
    import jax

    if ci:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import cflearn_tpu as cf

    cf.toolkit.seed_everything(123)

    if ci:
        x = np.random.randn(128, 8).astype(np.float32)
        y = x.sum(1, keepdims=True).astype(np.float32)
    else:
        from cflearn_tpu.data.ml.datasets import california_data

        x, y = california_data()
    y = (y - y.mean()) / y.std()

    config = cf.MLConfig(
        module_name="fcnn",
        module_config=dict(input_dim=x.shape[1], output_dim=1),
        loss_name="multi_task",
        loss_config=dict(loss_names=["mae", "mse"]),
        callback_names="mlflow",
        workspace="_california_mlflow",
    )
    if ci:
        config.to_debug()

    # the reference routes the array through an explicit block selection
    # (recognizer → preprocessor → splitter) instead of the bundled default
    block_names = ["ml_recognizer", "ml_preprocessor", "ml_splitter"]
    p = cf.fit_ml(
        x,
        y,
        config=config,
        processor_config=cf.MLAdvancedProcessorConfig(block_names=block_names),
    )
    print("> metrics", cf.evaluate(p, x, y, metrics=["mae", "mse"], verbose=False))


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--ci", type=int, default=0)
    main(bool(parser.parse_args().ci))
