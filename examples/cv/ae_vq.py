"""AE-VQ adversarial training (reference `examples/cv/ae/mnist_ae_vq.py`):
the vector-quantized autoencoder under the two-optimizer
generator/discriminator TrainStep engine with the VQ commitment loss."""

import argparse


def main(ci: bool) -> None:
    import jax

    if ci:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import cflearn_tpu as cf

    from cflearn_tpu.data.ml.datasets import digits_data

    x, _ = digits_data()
    images = np.repeat(((x.reshape(-1, 8, 8, 1) / 8.0) - 1.0), 3, axis=-1).astype(np.float32)
    config = cf.DLConfig(
        model="ae_vq",
        module_name="ae_vq",
        module_config={
            "img_size": 8,
            "in_channels": 3,
            "inner_channels": 32,
            "z_channels": 4,
            "embedding_channels": 4,
            "num_code": 64,
            "channel_multipliers": [1, 2],
            "num_res_blocks": 1,
        },
        workspace="_ae_vq",
    )
    if ci:
        config.to_debug()
    p = cf.fit_array(images, config=config)
    scopes = sorted({ts.scope for ts in p.model.train_steps})
    print("done:", p.trainer.state.step, "steps; scopes:", scopes)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--ci", type=int, default=0)
    main(bool(parser.parse_args().ci))
