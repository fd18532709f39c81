"""CLIP zero-shot classification (reference `examples/multimodal` CLIP usage,
`tests/test_reproduce.py` analogue)."""

import argparse


def main(ci: bool) -> None:
    import jax

    if ci:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from flax import nnx
    import cflearn_tpu as cf
    from cflearn_tpu.modules.multimodal import CLIP

    if ci:
        m = CLIP(img_size=32, latent_dim=16, vision_latent_dim=32, vision_patch_size=8,
                 vision_num_layers=2, vision_num_heads=2, text_latent_dim=32,
                 text_num_layers=2, text_num_heads=2, rngs=nnx.Rngs(0))
    else:
        from cflearn_tpu.zoo import clip as clip_zoo

        m = clip_zoo(pretrained=True)
    extractor = cf.CLIPExtractor(m)
    size = m.img_size
    images = (np.random.rand(4, size, size, 3) * 255).astype(np.uint8)
    classes = ["a photo of a cat", "a photo of a dog", "a photo of a car"]
    preds = extractor.zero_shot_classify(images, classes)
    print("predicted classes:", preds)
    img_latent = extractor.get_image_latent(images)
    txt_latent = extractor.get_text_latent(classes)
    print("latents:", img_latent.shape, txt_latent.shape)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--ci", type=int, default=0)
    main(bool(parser.parse_args().ci))
