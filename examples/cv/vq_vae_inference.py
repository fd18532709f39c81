"""Train a PixelCNN prior over a trained VQ-VAE's code indices, then sample
(reference `examples/cv/vae/mnist_vq_vae_inference.py`). Self-contained: the
VQ-VAE is trained (briefly) first, then `VQVAEInference` exports the code
indices and fits the conditional prior."""

import argparse


def main(ci: bool) -> None:
    import jax

    if ci:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import cflearn_tpu as cf

    from cflearn_tpu.data.array import ArrayData
    from cflearn_tpu.data.ml.datasets import digits_data
    from cflearn_tpu.schema.data import DataConfig
    from cflearn_tpu.toolkit import get_latest_workspace

    x, y = digits_data()
    images = ((x.reshape(-1, 8, 8, 1) / 8.0) - 1.0).astype(np.float32)
    labels = y.astype(np.int32).reshape(-1, 1)

    # stage 1: the VQ-VAE itself
    workspace = "_vq_vae_inference"
    vq_config = cf.DLConfig(
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
        workspace=workspace,
    )
    if ci:
        vq_config.to_debug()
    cf.fit_array(images, labels, config=vq_config)

    # stage 2: the auto-regressive prior over code indices
    config = cf.DLConfig(
        model="ar",
        module_name="pixel_cnn",
        module_config={
            "num_codes": 32,
            "img_size": 2,
            "in_channels": 1,
            "latent_channels": 32,
            "num_layers": 2,
            "num_classes": 10,
        },
        workspace=workspace,
    )
    if ci:
        config.to_debug()
        config.callback_names = []
    vqvae_log_folder = get_latest_workspace(workspace)
    inference = cf.cv.VQVAEInference(
        config,
        workspace=workspace,
        vqvae_log_folder=str(vqvae_log_folder),
        num_classes=10,
    )
    data = ArrayData.init(DataConfig(batch_size=4 if ci else 16))
    data.fit(images, labels)
    inference.fit(data)
    sampled = inference.sample(4, class_idx=3)
    print("sampled:", sampled.shape)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--ci", type=int, default=0)
    main(bool(parser.parse_args().ci))
