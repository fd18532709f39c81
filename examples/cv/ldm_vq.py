"""Latent diffusion with a VQ first stage (reference
`examples/cv/diffusion/mnist_ldm_vq.py`): the `diffusion/ldm.vq` zoo preset
is shrunk CI-style, diffusion runs over the quantized `z_q` latents of a
(frozen) `ae_vq` first stage."""

import argparse


def main(ci: bool) -> None:
    import jax

    if ci:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import cflearn_tpu as cf
    from cflearn_tpu.data.ml.datasets import digits_data
    from cflearn_tpu.zoo import load_predefined_config

    x, _ = digits_data()
    images = ((x.reshape(-1, 8, 8, 1) / 8.0) - 1.0).astype(np.float32)
    if ci:
        images = images[:32]

    # reference recipe: start from the vq LDM preset, shrink the first stage
    # and the UNet to the dataset
    d = load_predefined_config("diffusion/ldm.vq")
    d.model = "ddpm"
    mc = d.module_config
    mc["img_size"] = 4  # 8px images, one vq downsample
    mc["in_channels"] = 3
    mc["out_channels"] = 3
    mc["num_timesteps"] = 100
    mc["first_stage_config"] = {
        "img_size": 8,
        "in_channels": 1,
        "out_channels": 1,
        "inner_channels": 32,
        "z_channels": 3,
        "embedding_channels": 3,
        "num_code": 64,
        "channel_multipliers": [1, 2],
        "num_res_blocks": 1,
    }
    mc["unet_config"] = {
        "start_channels": 32,
        "num_res_blocks": 1,
        "channel_multipliers": (1, 2),
        "attention_downsample_rates": (2,),
        "num_heads": 4,
        "context_dim": None,
        "use_spatial_transformer": False,
    }
    d.workspace = "_ldm_vq"
    if ci:
        d.to_debug()
    p = cf.fit_array(images, config=d)
    ldm = p.model.m
    latents = ldm.sample(4, num_steps=5 if ci else 50)
    decoded = ldm.decode(latents)
    print("sampled latents:", latents.shape, "decoded:", decoded.shape)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--ci", type=int, default=0)
    main(bool(parser.parse_args().ci))
