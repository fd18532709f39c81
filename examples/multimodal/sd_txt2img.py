"""SD txt2img (reference `examples/multimodal` / DiffusionAPI usage).

With --pretrained, weights convert from the original SD checkpoint (needs a
populated download cache in zero-egress environments); otherwise random
weights demonstrate the pipeline mechanics.
"""

import argparse


def main(ci: bool, pretrained: bool) -> None:
    import jax

    if ci:
        jax.config.update("jax_platforms", "cpu")
    from flax import nnx
    import cflearn_tpu as cf

    if ci:
        # tiny LDM for CI
        from cflearn_tpu.modules.multimodal.diffusion.ldm import LDM
        from cflearn_tpu.modules.multimodal.diffusion.cond_models import CLIPTextConditionModel

        rngs = nnx.Rngs(0)
        m = LDM(
            img_size=8, in_channels=4, out_channels=4, num_timesteps=50,
            condition_model=CLIPTextConditionModel(latent_dim=32, num_layers=1, num_heads=2, rngs=rngs),
            unet_config=dict(start_channels=32, num_res_blocks=1, channel_multipliers=(1, 2),
                             attention_downsample_rates=(1,), num_heads=4, context_dim=32),
            first_stage_config=dict(img_size=64, inner_channels=32, z_channels=4, embedding_channels=4,
                                    channel_multipliers=[1, 2, 2, 2], num_res_blocks=1),
            rngs=rngs,
        )
        api = cf.DiffusionAPI(m)
        images = api.txt2img("a cat", size=(64, 64), num_steps=3, seed=42)
    else:
        api = cf.DiffusionAPI.from_sd(pretrained=pretrained, use_bf16=True)
        images = api.txt2img("a futuristic city at sunset", size=(512, 512), num_steps=20, seed=42)
    print("images:", images.shape, images.dtype)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--ci", type=int, default=0)
    parser.add_argument("--pretrained", type=int, default=0)
    args = parser.parse_args()
    main(bool(args.ci), bool(args.pretrained))
