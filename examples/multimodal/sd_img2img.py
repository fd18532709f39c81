"""SD img2img / inpainting / outpainting (reference
`examples/multimodal/stable_diffusion/run_img2img.py`). CI runs the flows on
a tiny random-weight LDM; otherwise the full SD-1.5 architecture."""

import argparse


def _tiny_api():
    from flax import nnx

    import cflearn_tpu as cf
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
    return cf.DiffusionAPI(m)


def main(ci: bool, pretrained: bool) -> None:
    import jax

    if ci:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    import cflearn_tpu as cf

    if ci:
        api = _tiny_api()
        size, steps = (64, 64), 2
    else:
        api = cf.DiffusionAPI.from_sd(pretrained=pretrained, use_bf16=True)
        size, steps = (512, 512), 20

    base = api.txt2img("a mountain lake at dawn", size=size, num_steps=steps, seed=42)
    # img2img: keep the layout, restyle (fidelity = how much of the original
    # to keep; reference semantics)
    i2i = api.img2img(base, cond="the same lake in winter", fidelity=0.6, num_steps=steps, seed=1)
    print("img2img:", i2i.shape, i2i.dtype)

    # inpainting: regenerate only the masked region
    h, w = size
    mask = np.zeros((h, w), np.float32)
    mask[h // 4 : 3 * h // 4, w // 4 : 3 * w // 4] = 1.0
    inp = api.inpainting(base, mask, cond="a sailboat", num_steps=steps, seed=2)
    print("inpainting:", inp.shape)

    # outpainting: extend the canvas around the original
    out = api.outpainting(base[0], anchor="center", cond="wide landscape", num_steps=steps, seed=3)
    print("outpainting:", out.shape)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--ci", type=int, default=0)
    parser.add_argument("--pretrained", type=int, default=0)
    args = parser.parse_args()
    main(bool(args.ci), bool(args.pretrained))
