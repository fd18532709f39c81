"""`TranslatorAPI` — ESRGAN super-resolution.

Parity: reference `cflearn/api/cv/translator.py:19` — tensorize image,
forward RRDB, alpha-channel-aware upscale; `from_esr`/`from_esr_anime`.
"""

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ...modules.cv.classifier import RRDBNet
from ..common import IAPI


class TranslatorAPI(IAPI):
    def __init__(self, m: RRDBNet, *, use_bf16: bool = False) -> None:
        super().__init__(m, use_bf16=use_bf16)
        self.m: RRDBNet = m
        graphdef, _ = nnx.split(m)
        self._fn = jax.jit(lambda st, x: nnx.merge(graphdef, st)(x))

    def sr(
        self,
        image: Any,
        export_path: Optional[str] = None,
        *,
        max_wh: int = 2048,
    ) -> np.ndarray:
        """4x upscale. uint8/float NHWC (or HWC) arrays, paths, or PIL
        images in; uint8 out. Alpha channels are upscaled separately with
        bilinear, and `export_path` saves the result (reference
        `translator.py:20`)."""
        was_single_pil = False
        if isinstance(image, str) or (
            not isinstance(image, np.ndarray) and hasattr(image, "getbands")
        ):
            from ..multimodal.utils import read_image

            res = read_image(image, None, anchor=None)
            image = res.image
            if res.alpha is not None:
                image = np.concatenate([image, res.alpha], axis=-1)
            was_single_pil = True
        image = np.asarray(image)
        squeeze = image.ndim == 3 or was_single_pil
        if image.ndim == 3:
            image = image[None]
        if image.dtype == np.uint8:
            image = image.astype(np.float32) / 255.0
        alpha = None
        if image.shape[-1] == 4:
            alpha = image[..., 3:]
            image = image[..., :3]
        b, h, w, _ = image.shape
        if max(h, w) > max_wh:
            raise ValueError(f"image too large ({h}x{w} > {max_wh})")
        out = np.asarray(self._fn(nnx.state(self.m), jnp.asarray(image)))
        if alpha is not None:
            up = jax.image.resize(
                jnp.asarray(alpha), (b, out.shape[1], out.shape[2], 1), "bilinear"
            )
            out = np.concatenate([out, np.asarray(up)], axis=-1)
        out = (np.clip(out, 0.0, 1.0) * 255.0).round().astype(np.uint8)
        out = out[0] if squeeze else out
        if export_path is not None:
            from PIL import Image  # type: ignore

            Image.fromarray(out if out.ndim == 3 else out[0]).save(export_path)
        return out

    @classmethod
    def from_esr(cls, *, pretrained: bool = False, **kwargs: Any) -> "TranslatorAPI":
        from ...zoo.common import load_module

        m = load_module("sr/esr", pretrained=pretrained)
        return cls(m, **kwargs)

    @classmethod
    def from_esr_anime(cls, *, pretrained: bool = False, **kwargs: Any) -> "TranslatorAPI":
        from ...zoo.common import load_module

        m = load_module("sr/esr.anime", pretrained=pretrained)
        return cls(m, **kwargs)
