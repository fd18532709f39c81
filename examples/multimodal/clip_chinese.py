"""ChineseCLIP zero-shot (reference `examples/reproduce/clip/run_chinese.py`):
ViT vision tower + Chinese-BERT text tower, driven through `CLIPExtractor`
(which auto-selects the `chinese_clip` tokenizer for BERT text towers). CI
builds a tiny random-weight model; pass converted weights for real use."""

import argparse


def main(ci: bool) -> None:
    import jax

    if ci:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from flax import nnx
    import cflearn_tpu as cf
    from cflearn_tpu.modules.multimodal.clip import ChineseCLIP

    if ci:
        m = ChineseCLIP(
            img_size=32,
            latent_dim=16,
            vision_latent_dim=32,
            vision_patch_size=8,
            vision_num_layers=2,
            vision_num_heads=2,
            text_latent_dim=32,
            text_num_layers=2,
            text_num_heads=2,
            context_length=64,
            rngs=nnx.Rngs(0),
        )
    else:
        from cflearn_tpu.zoo import chinese_clip

        m = chinese_clip(pretrained=False)
    extractor = cf.CLIPExtractor(m)
    size = m.img_size
    images = (np.random.rand(2, size, size, 3) * 255).astype(np.uint8)
    texts = ["一张猫的照片", "一张狗的照片"]
    img_latent = extractor.get_image_latent(images)
    txt_latent = extractor.get_text_latent(texts)
    # latents are L2-normalized
    np.testing.assert_allclose(np.linalg.norm(txt_latent, axis=-1), 1.0, atol=1e-4)
    preds = extractor.zero_shot_classify(images, texts)
    print("image latents:", img_latent.shape, "text latents:", txt_latent.shape)
    print("predicted:", preds)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--ci", type=int, default=0)
    main(bool(parser.parse_args().ci))
