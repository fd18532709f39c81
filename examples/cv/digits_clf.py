"""Image classification (reference `examples/cv/mnist` classifier; uses
sklearn digits in zero-egress environments)."""

import argparse


def main(ci: bool) -> None:
    import jax

    if ci:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import cflearn_tpu as cf
    from cflearn_tpu.data import ArrayData
    from cflearn_tpu.data.ml.datasets import digits_data

    x, y = digits_data()
    images = (x.reshape(-1, 8, 8, 1) / 16.0).astype(np.float32)
    data = ArrayData.init().fit(images, y)
    config = cf.DLConfig(
        module_name="clf",
        module_config={"img_size": 8, "in_channels": 1, "num_classes": 10, "latent_dim": 64,
                       "encoder_config": {"num_downsample": 2}},
        loss_name="cross_entropy",
        metric_names="acc",
        workspace="_digits",
    )
    if ci:
        config.to_debug()
    p = cf.fit_array(images, y, config=config)
    print("acc:", p.trainer.final_results.metric_values)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--ci", type=int, default=0)
    main(bool(parser.parse_args().ci))
