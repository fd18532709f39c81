"""Multi-ControlNet txt2img (reference
`examples/multimodal/stable_diffusion/run_controlnet.py`): annotate a guide
image (canny edges here), run ControlNets alongside the UNet with per-hint
scales. CI uses a tiny random-weight LDM + ControlNet; a real run would pull
converted ControlNet checkpoints via the zoo."""

import argparse


def main(ci: bool, pretrained: bool) -> None:
    import jax

    if ci:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from flax import nnx

    import cflearn_tpu as cf
    from cflearn_tpu.api.multimodal.diffusion import ControlledDiffusionAPI
    from cflearn_tpu.modules.multimodal.diffusion.cond_models import CLIPTextConditionModel
    from cflearn_tpu.modules.multimodal.diffusion.ldm import LDM
    from cflearn_tpu.modules.multimodal.diffusion.unet import ControlNet

    rngs = nnx.Rngs(0)
    if ci:
        m = LDM(
            img_size=8, in_channels=4, out_channels=4, num_timesteps=50,
            condition_model=CLIPTextConditionModel(latent_dim=32, num_layers=1, num_heads=2, rngs=rngs),
            unet_config=dict(start_channels=32, num_res_blocks=1, channel_multipliers=(1, 2),
                             attention_downsample_rates=(1,), num_heads=4, context_dim=32),
            first_stage_config=dict(img_size=64, inner_channels=32, z_channels=4, embedding_channels=4,
                                    channel_multipliers=[1, 2, 2, 2], num_res_blocks=1),
            rngs=rngs,
        )
        api = ControlledDiffusionAPI(m)
        control = ControlNet(
            hint_channels=3, in_channels=4, start_channels=32, num_res_blocks=1,
            channel_multipliers=(1, 2), attention_downsample_rates=(1,),
            num_heads=4, context_dim=32, rngs=nnx.Rngs(1),
        )
        api.prepare_control("canny", control)
        size, steps = (64, 64), 2
    else:
        api = ControlledDiffusionAPI.from_sd(pretrained=pretrained, use_bf16=True)
        from cflearn_tpu.zoo import load_control_net  # converted checkpoint

        api.prepare_control("canny", load_control_net("canny", pretrained=pretrained))
        size, steps = (512, 512), 20

    guide = (np.random.rand(size[0], size[1], 3) * 255).astype(np.uint8)
    edges = api.get_hint_of("canny", guide)
    images = api.sample_with_control(
        1,
        {"canny": edges},
        cond="a house in the style of the guide",
        size=size,
        num_steps=steps,
        seed=42,
        # per-hint step gating: control active for the first 80% of steps
        hint_ends={"canny": 0.8},
    )
    print("controlled sample:", images.shape, images.dtype)

    # controls can be toggled without rebuilding the API
    api.disable_control()
    plain = api.sample_with_control(1, {"canny": edges}, cond="a house", size=size, num_steps=steps, seed=42)
    api.enable_control()
    print("control disabled fallback:", plain.shape)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--ci", type=int, default=0)
    parser.add_argument("--pretrained", type=int, default=0)
    args = parser.parse_args()
    main(bool(args.ci), bool(args.pretrained))
