"""California housing regression (reference `examples/ml` regression)."""

import argparse


def main(ci: bool) -> None:
    import jax

    if ci:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import cflearn_tpu as cf

    if ci:
        x = np.random.randn(128, 8).astype(np.float32)
        y = x.sum(1, keepdims=True).astype(np.float32)
    else:
        from cflearn_tpu.data.ml.datasets import california_data

        x, y = california_data()
    config = cf.MLConfig(module_name="fcnn", workspace="_california")
    if ci:
        config.to_debug()
    p = cf.fit_ml(x, y, config=config)
    cf.evaluate(p, x, y, metrics=["mae", "mse"])


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--ci", type=int, default=0)
    main(bool(parser.parse_args().ci))
