"""VQ-VAE on digit images (reference `examples/cv/vae/mnist_vq_vae.py`):
train the codebook autoencoder, then reconstruct through the codes."""

import argparse


def main(ci: bool) -> None:
    import jax

    if ci:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import cflearn_tpu as cf

    from cflearn_tpu.data.ml.datasets import digits_data

    x, y = digits_data()
    images = ((x.reshape(-1, 8, 8, 1) / 8.0) - 1.0).astype(np.float32)
    labels = y.astype(np.int32).reshape(-1, 1)
    config = cf.DLConfig(
        model="vq_vae",
        module_name="vq_vae",
        module_config={
            "img_size": 8,
            "in_channels": 1,
            "code_dimension": 16,
            "num_codes": 32,
            "num_downsample": 2,
            "num_classes": 10,
            "apply_tanh": True,
        },
        workspace="_vq_vae",
        callback_names=["vq_vae"],
        callback_configs={"vq_vae": {"num_classes": 10}},
    )
    if ci:
        config.to_debug()
    p = cf.fit_array(images, labels, config=config)
    recon = p.model.m(jnp.asarray(images[:4]))
    out = recon["predictions"] if isinstance(recon, dict) else recon
    print("reconstruction:", jax.tree_util.tree_map(lambda a: a.shape, out))


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--ci", type=int, default=0)
    main(bool(parser.parse_args().ci))
