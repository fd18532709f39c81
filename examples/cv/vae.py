"""VAE on digit images (reference `examples/cv/vae/mnist_vae.py`)."""

import argparse


def main(ci: bool) -> None:
    import jax

    if ci:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import cflearn_tpu as cf

    from cflearn_tpu.data.ml.datasets import digits_data

    x, _ = digits_data()
    images = ((x.reshape(-1, 8, 8, 1) / 8.0) - 1.0).astype(np.float32)
    config = cf.DLConfig(
        model="vae",
        module_name="vae",
        module_config={"img_size": 8, "in_channels": 1, "latent_dim": 16, "num_downsample": 2},
        workspace="_vae",
        callback_names=["generator"],
    )
    if ci:
        config.to_debug()
    p = cf.fit_array(images, config=config)
    print("done:", p.trainer.state.step, "steps")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--ci", type=int, default=0)
    main(bool(parser.parse_args().ci))
