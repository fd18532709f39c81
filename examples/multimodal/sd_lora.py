"""SD + LoRA (reference `examples/multimodal/stable_diffusion/run_lora.py`):
load LoRA packs (kohya/diffusers .safetensors convert via
`cflearn_tpu.zoo.convert_lora`), inject with per-pack scales, and unwind.
CI builds a synthetic pack against a tiny LDM."""

import argparse


def main(ci: bool, lora_path: str) -> None:
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
        size, steps = (64, 64), 2
        # random-weight UNets have the SD-parity zero conv_out, which makes
        # eps (and therefore the LoRA's effect) invisible — de-zero for demo
        conv_out = api.m.unet.conv_out
        conv_out.kernel.value = 0.1 * jax.random.normal(
            jax.random.PRNGKey(1), conv_out.kernel.value.shape
        )

        # synthetic LoRA pack targeting the first transformer block's to_q
        from cflearn_tpu.modules.core.lora import LoRAPack
        from cflearn_tpu.modules.multimodal.diffusion.unet import walk_transformer_blocks
        from cflearn_tpu.toolkit.tree import tree_to_npd

        blk = walk_transformer_blocks(api.m.unet)[0]
        base = np.asarray(blk.attn1.to_q.kernel[...])
        npd = tree_to_npd(nnx.state(api.m, nnx.Param))
        path = next(k for k, v in npd.items() if v.shape == base.shape and np.allclose(v, base))
        rng = np.random.default_rng(0)
        down = rng.normal(size=(base.shape[0], 4)).astype(np.float32) * 0.05
        up = rng.normal(size=(4, base.shape[1])).astype(np.float32) * 0.05
        api.load_sd_lora("style_a", pack=LoRAPack(deltas={path: (down, up)}, alpha=4.0, rank=4))
    else:
        api = cf.DiffusionAPI.from_sd(pretrained=True, use_bf16=True)
        size, steps = (512, 512), 20
        # a kohya/diffusers-format .safetensors LoRA converts on load
        api.load_sd_lora("style_a", path=lora_path)

    base_img = api.txt2img("a castle", size=size, num_steps=steps, seed=42)
    api.inject_sd_lora("style_a")
    lora_img = api.txt2img("a castle", size=size, num_steps=steps, seed=42)
    api.cleanup_sd_lora()
    restored = api.txt2img("a castle", size=size, num_steps=steps, seed=42)
    print(
        "lora differs:", not np.array_equal(base_img, lora_img),
        "| cleanup restores:", np.array_equal(base_img, restored),
    )


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--ci", type=int, default=0)
    parser.add_argument("--lora", type=str, default="")
    args = parser.parse_args()
    main(bool(args.ci), args.lora)
