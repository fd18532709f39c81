"""`CLIPExtractor` — image/text embedding extraction.

Parity: reference `cflearn/api/multimodal/clip.py:27` (tokenizer + batched
jitted encoders).
"""

from typing import Any, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ...modules.multimodal.clip import CLIP
from ...modules.nlp.tokenizers import CLIPTokenizer
from ..common import IAPI


CLIP_MEAN = np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32)


class CLIPExtractor(IAPI):
    def __init__(self, m: CLIP, *, use_bf16: bool = False, tokenizer: Optional[Any] = None) -> None:
        super().__init__(m, use_bf16=use_bf16)
        self.m: CLIP = m
        if tokenizer is None:
            # ChineseCLIP's text tower is BERT — the English BPE tokenizer's
            # ids would silently index garbage (reference selects
            # 'clip.chinese' by context_length; the class check also covers
            # down-scaled test/CI geometries)
            from ...modules.multimodal.clip import ChineseCLIP

            if isinstance(m, ChineseCLIP) or getattr(m, "context_length", 77) == 512:
                from ...modules.nlp.tokenizers import ChineseCLIPTokenizer

                tokenizer = ChineseCLIPTokenizer()
            else:
                tokenizer = CLIPTokenizer()
        self.tokenizer = tokenizer
        graphdef, _ = nnx.split(m)
        self._graphdef = graphdef
        self._img_fn = jax.jit(lambda st, x: nnx.merge(graphdef, st).encode_image(x))
        self._txt_fn = jax.jit(lambda st, t: nnx.merge(graphdef, st).encode_text(t))

    @classmethod
    def from_zoo(
        cls, *, version: str = "base", pretrained: bool = True, use_bf16: bool = False
    ) -> "CLIPExtractor":
        """Build from zoo weights: version "base" (ViT-B/32) or "large"
        (ViT-L/14). `pretrained=True` downloads+converts the published
        checkpoint on first use (needs egress); this is the extractor
        `toolkit.quality.clip_score` defaults to."""
        from ... import zoo

        make = {"base": zoo.clip, "large": zoo.clip_large}.get(version)
        if make is None:
            raise ValueError(f"unknown CLIP zoo version {version!r} (base|large)")
        return cls(make(pretrained=pretrained), use_bf16=use_bf16)

    def get_image_latent(self, images: Any, *, batch_size: int = 64, **kwargs: Any) -> np.ndarray:
        """images: uint8 (or [0,1]/[-1,1] float) NHWC at the model's
        img_size — or PIL image(s), resized to the model's `img_size`
        (reference `get_transform`'s Resize+CenterCrop); normalized with
        CLIP's per-channel mean/std (the stats the pretrained weights were
        trained with)."""
        if not isinstance(images, np.ndarray):
            pils = images if isinstance(images, (list, tuple)) else [images]
            if pils and hasattr(pils[0], "getbands"):
                size = getattr(self.m, "img_size", 224)
                images = np.stack(
                    [np.asarray(p.convert("RGB").resize((size, size))) for p in pils]
                )
        images = np.asarray(images)
        if images.ndim == 3:
            images = images[None]
        if images.dtype == np.uint8:
            images = images.astype(np.float32) / 255.0
        elif images.min() < -1e-3:
            # [-1, 1] input → [0, 1]
            images = (images.astype(np.float32) + 1.0) / 2.0
        images = (images - CLIP_MEAN) / CLIP_STD
        state = nnx.state(self.m)
        outs: List[np.ndarray] = []
        for i in range(0, len(images), batch_size):
            outs.append(np.asarray(self._img_fn(state, jnp.asarray(images[i : i + batch_size]))))
        return np.concatenate(outs, axis=0)

    def get_text_latent(self, texts: Union[str, List[str]], *, batch_size: int = 64) -> np.ndarray:
        tokens = self.tokenizer.tokenize(texts)
        state = nnx.state(self.m)
        outs: List[np.ndarray] = []
        for i in range(0, len(tokens), batch_size):
            outs.append(np.asarray(self._txt_fn(state, jnp.asarray(tokens[i : i + batch_size]))))
        return np.concatenate(outs, axis=0)

    # reference names (`api/multimodal/clip.py:72-131`)
    def get_texts_latent(self, texts: Union[str, List[str]], *, batch_size: int = 64, **kwargs: Any) -> np.ndarray:
        return self.get_text_latent(texts, batch_size=batch_size)

    def get_paths_latent(self, image_paths: List[str], *, batch_size: int = 64, **kwargs: Any) -> np.ndarray:
        from PIL import Image  # type: ignore

        images = [Image.open(p) for p in image_paths]
        return self.get_image_latent(images, batch_size=batch_size)

    def get_folder_latent(self, image_folder: str, *, batch_size: int = 64, **kwargs: Any) -> np.ndarray:
        import os

        exts = {".png", ".jpg", ".jpeg", ".bmp", ".webp"}
        paths = sorted(
            os.path.join(image_folder, f)
            for f in os.listdir(image_folder)
            if os.path.splitext(f)[1].lower() in exts
        )
        return self.get_paths_latent(paths, batch_size=batch_size)

    def zero_shot_classify(self, images: np.ndarray, class_texts: List[str]) -> np.ndarray:
        img = self.get_image_latent(images)
        txt = self.get_text_latent(class_texts)
        return np.argmax(img @ txt.T, axis=-1)
