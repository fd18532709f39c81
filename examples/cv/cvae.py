"""Class-conditional VAE on digit images (reference
`examples/cv/vae/mnist_cvae.py` — `num_classes` routes a per-class learned
map into the decoder, `apply_tanh` bounds the reconstructions)."""

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
        model="vae",
        module_name="vae",
        module_config={
            "img_size": 8,
            "in_channels": 1,
            "latent_dim": 16,
            "num_downsample": 2,
            "num_classes": 10,
            "apply_tanh": True,
        },
        workspace="_cvae",
        callback_names=["generator"],
    )
    if ci:
        config.to_debug()
    p = cf.fit_array(images, labels, config=config)
    # per-class sampling
    m = p.model.m
    for class_idx in (0, 1):
        sampled = m.sample(4, class_idx=class_idx)
        assert float(jnp.abs(sampled).max()) <= 1.0
        print(f"class {class_idx} samples:", sampled.shape)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--ci", type=int, default=0)
    main(bool(parser.parse_args().ci))
