"""open_clip reproduction (reference `examples/reproduce/clip/run_open_clip.py`):
build the zoo's open_clip ViT-H/14 geometry, embed an image + two texts with
`CLIPExtractor`, and — when the `open_clip` package and pretrained weights
are available — assert the embeddings match open_clip to 1e-6, exactly like
the reference does. Without open_clip installed (CI / zero-egress), the
example still exercises the full zoo-constructor → extractor path on a
down-scaled geometry and validates embedding normalization instead.
"""

import argparse


def main(ci: bool) -> None:
    import jax

    if ci:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from PIL import Image

    import cflearn_tpu as cf

    texts = ["a photo of a cat.", "a photo of a dog"]
    rng = np.random.default_rng(0)
    image = Image.fromarray(rng.integers(0, 255, (224, 224, 3), dtype=np.uint8))

    if ci:
        # ViT-H/14 is ~1B params — shrink the geometry for the CPU smoke run
        # (same constructor, same preset, overridden dims)
        m = cf.zoo.open_clip_ViT_H_14(
            pretrained=False,
            vision_num_layers=2,
            vision_num_heads=4,
            vision_latent_dim=64,
            text_num_layers=2,
            text_num_heads=4,
            text_latent_dim=64,
            latent_dim=32,
        )
    else:
        m = cf.zoo.open_clip_ViT_H_14(pretrained=True)
    extractor = cf.multimodal.CLIPExtractor(m)
    cf_text_embeds = extractor.get_texts_latent(texts)
    cf_image_embeds = extractor.get_image_latent(image)

    # embeddings come back L2-normalized — the property the zero-shot
    # cosine-similarity workflows rely on
    assert np.allclose(np.linalg.norm(cf_text_embeds, axis=-1), 1.0, atol=1e-4)
    assert np.allclose(np.linalg.norm(cf_image_embeds, axis=-1), 1.0, atol=1e-4)
    print("text embeds:", cf_text_embeds.shape, "image embeds:", cf_image_embeds.shape)

    try:
        import open_clip  # type: ignore
        import torch  # noqa: F401
    except ImportError:
        print("open_clip not installed — skipping the numerical comparison")
        return

    model, _, preprocess = open_clip.create_model_and_transforms(
        "ViT-H-14", pretrained="laion2b_s32b_b79k"
    )
    model.eval()
    tokenizer = open_clip.get_tokenizer("ViT-H-14")
    import torch

    with torch.no_grad():
        image_embeds = model.encode_image(preprocess(image).unsqueeze(0))
        text_embeds = model.encode_text(tokenizer(texts))
        image_embeds = (image_embeds / image_embeds.norm(dim=-1, keepdim=True)).numpy()
        text_embeds = (text_embeds / text_embeds.norm(dim=-1, keepdim=True)).numpy()
    assert np.abs(text_embeds - cf_text_embeds).max() <= 1.0e-6
    assert np.abs(image_embeds - cf_image_embeds).max() <= 1.0e-6
    print("open_clip parity OK")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--ci", type=int, default=0)
    main(bool(parser.parse_args().ci))
