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

    def sr(self, image: np.ndarray, *, max_wh: int = 2048) -> np.ndarray:
        """4x upscale. uint8/float NHWC (or HWC) in, uint8 out. Alpha channels
        are upscaled separately with bilinear (reference behavior)."""
        image = np.asarray(image)
        squeeze = image.ndim == 3
        if squeeze:
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
        return out[0] if squeeze else out

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
