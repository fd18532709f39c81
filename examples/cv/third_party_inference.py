"""Vendored third-party inference nets (reference
`examples/cv/third_party/run_lama.py` / `run_isnet.py` /
`run_harmonization.py` / `run_sr.py`): LaMa inpainting, ISNet salient-object
segmentation, iDIH-HRNet harmonization, and ESRGAN super-resolution driven
through their APIs. Checkpoints are optional (pass paths for real weights);
the CI run exercises the full pre/post-processing pipelines on random
weights and tiny inputs."""

import argparse


def main(ci: bool) -> None:
    import jax

    if ci:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from cflearn_tpu.api.cv.third_party.lama import LaMaAPI
    from cflearn_tpu.api.cv.third_party.isnet import ISNetAPI
    from cflearn_tpu.api.cv.third_party.iharm import ImageHarmonizationAPI
    from cflearn_tpu.api.cv.translator import TranslatorAPI

    rng = np.random.RandomState(0)
    size = 32 if ci else 256
    image = (rng.rand(size, size, 3) * 255).astype(np.uint8)
    mask = np.zeros((size, size), np.float32)
    mask[size // 4 : size // 2, size // 4 : size // 2] = 1.0

    # LaMa inpainting: untouched pixels must be preserved exactly
    lama = LaMaAPI()
    out = lama.inpaint(image, mask)
    keep = mask == 0
    np.testing.assert_allclose(out[keep], image.astype(np.float32)[keep] / 255.0, atol=1e-6)
    print("lama:", out.shape, out.dtype)

    # ISNet salient-object segmentation → [0, 1] saliency map
    isnet = ISNetAPI(scale=1)
    sal = isnet.segment(image, infer_size=64 if ci else 1024)
    assert sal.shape == (size, size) and 0.0 <= sal.min() and sal.max() <= 1.0
    print("isnet:", sal.shape)

    # image harmonization (composite region blended to background stats)
    # the iDIH decoder needs the deepest feature ≥2px: depth 7 wants ≥256px
    # padded inputs, so the CI config shrinks depth with the image
    iharm = ImageHarmonizationAPI(
        width=4 if ci else 32, ocr_width=8 if ci else 64, ch=8 if ci else 64, depth=4 if ci else 7
    )
    harmonized = iharm.run(image, mask)
    assert harmonized.shape == image.shape and harmonized.dtype == np.uint8
    print("iharm:", harmonized.shape)

    # ESRGAN 4x super-resolution
    sr = TranslatorAPI.from_esr(pretrained=False)
    up = sr.sr(image[None].astype(np.float32) / 127.5 - 1.0)
    assert up.shape[1] == size * 4
    print("esr 4x:", up.shape)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--ci", type=int, default=0)
    main(bool(parser.parse_args().ci))
