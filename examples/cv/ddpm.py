"""DDPM on digit images (reference `examples/cv/diffusion/mnist_ddpm.py`)."""

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
        model="ddpm",
        module_name="ddpm",
        module_config={
            "img_size": 8, "in_channels": 1, "out_channels": 1, "num_timesteps": 100,
            "ema_decay": 0.999,
            "unet_config": {"start_channels": 32, "num_res_blocks": 1, "channel_multipliers": (1, 2),
                             "attention_downsample_rates": (2,), "num_heads": 4, "context_dim": None,
                             "use_spatial_transformer": False},
        },
        workspace="_ddpm",
    )
    if ci:
        config.to_debug()
    p = cf.fit_array(images, config=config)
    samples = p.model.m.sample(4, num_steps=10)
    print("sampled:", samples.shape)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--ci", type=int, default=0)
    main(bool(parser.parse_args().ci))
