"""Style-reference ("reference-only") generation (reference
`examples/multimodal/stable_diffusion/run_style_reference.py`): a WRITE pass
records the reference image's self-attention states; the READ pass steers
generation toward them (no extra weights needed)."""

import argparse


def main(ci: bool, pretrained: bool) -> None:
    import jax

    if ci:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from flax import nnx

    import cflearn_tpu as cf

    if ci:
        from cflearn_tpu.modules.multimodal.diffusion.cond_models import CLIPTextConditionModel
        from cflearn_tpu.modules.multimodal.diffusion.ldm import LDM

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
        # random-weight UNets have the SD-parity zero conv_out: de-zero so
        # the style steer visibly changes outputs in this demo
        conv_out = api.m.unet.conv_out
        conv_out.kernel.value = 0.1 * jax.random.normal(jax.random.PRNGKey(1), conv_out.kernel.value.shape)
        size, steps = (64, 64), 2
        ref = np.random.default_rng(3).integers(0, 255, (size[0], size[1], 3), dtype=np.uint8)
    else:
        api = cf.DiffusionAPI.from_sd(pretrained=pretrained, use_bf16=True)
        size, steps = (512, 512), 20
        ref = (np.random.rand(512, 512, 3) * 255).astype(np.uint8)  # load a real image here

    base = api.txt2img("a portrait", size=size, num_steps=steps, seed=42)
    api.setup_hooks(
        style_reference_image=ref,
        style_reference_states=dict(style_fidelity=0.5, reference_weight=1.0),
    )
    styled = api.txt2img("a portrait", size=size, num_steps=steps, seed=42)
    api.setup_hooks()  # clear
    print("base:", base.shape, "styled:", styled.shape, "differs:", not np.array_equal(base, styled))


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--ci", type=int, default=0)
    parser.add_argument("--pretrained", type=int, default=0)
    args = parser.parse_args()
    main(bool(args.ci), bool(args.pretrained))
