"""Operations example (reference `examples/ml/operations/run_op.py`):
learn sum/prod over a (B, T, 1) temporal axis with an RNN under a
`multi_task` (mae + mse) loss — exercises TemporalMLModel + multi-loss."""

import argparse


def main(ci: bool) -> None:
    import jax

    if ci:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import cflearn_tpu as cf

    rng = np.random.RandomState(123)
    dim, num_data = 5, 256
    x = (rng.random((num_data, dim, 1)) * 2.0).astype(np.float32)
    y = np.sum(x, axis=1).astype(np.float32)

    from cflearn_tpu.data.ml.api import MLAdvancedProcessorConfig

    config = cf.MLConfig(
        model="ml.temporal",
        module_name="rnn",
        module_config=dict(input_dim=1, output_dim=1),
        loss_name="multi_task",
        loss_config=dict(loss_names=["mae", "mse"]),
        metric_names=["mae", "mse"],
        workspace="_operations",
    )
    if ci:
        config.to_debug()
    p = cf.fit_ml(x, y, config=config, processor_config=MLAdvancedProcessorConfig())
    preds = p.predict(x[:8])["predictions"]
    print("sum-head predictions:", np.asarray(preds).ravel()[:4])


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--ci", type=int, default=0)
    main(bool(parser.parse_args().ci))
