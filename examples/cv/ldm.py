"""Latent diffusion on digit images (reference
`examples/cv/diffusion/mnist_ldm.py`): a DDPM trained in the latent space of
a (frozen) first-stage KL autoencoder. The first stage would be pretrained in
a real run (`kl.f4` in the reference); here it is random/frozen to
demonstrate the training mechanics."""

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
    if ci:
        images = images[:32]
    config = cf.DLConfig(
        model="ddpm",
        module_name="ldm",
        module_config={
            # latent space: 8px images -> one downsample -> 4x4x4 latents
            "img_size": 4,
            "in_channels": 4,
            "out_channels": 4,
            "num_timesteps": 100,
            "ema_decay": 0.999,
            "unet_config": {
                "start_channels": 32,
                "num_res_blocks": 1,
                "channel_multipliers": (1, 2),
                "attention_downsample_rates": (2,),
                "num_heads": 4,
                "context_dim": None,
                "use_spatial_transformer": False,
            },
            "first_stage_config": {
                "img_size": 8,
                "in_channels": 1,
                "out_channels": 1,
                "inner_channels": 32,
                "z_channels": 4,
                "embedding_channels": 4,
                "channel_multipliers": [1, 2],
                "num_res_blocks": 1,
            },
        },
        workspace="_ldm",
    )
    if ci:
        config.to_debug()
    p = cf.fit_array(images, config=config)
    # the first stage stayed frozen; sample latents + decode to pixel space
    ldm = p.model.m
    latents = ldm.sample(4, num_steps=5 if ci else 50)
    decoded = ldm.decode(latents)
    print("sampled latents:", latents.shape, "decoded:", decoded.shape)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--ci", type=int, default=0)
    main(bool(parser.parse_args().ci))
