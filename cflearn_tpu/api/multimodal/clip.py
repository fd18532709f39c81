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


class CLIPExtractor(IAPI):
    def __init__(self, m: CLIP, *, use_bf16: bool = False, tokenizer: Optional[CLIPTokenizer] = None) -> None:
        super().__init__(m, use_bf16=use_bf16)
        self.m: CLIP = m
        self.tokenizer = tokenizer or CLIPTokenizer()
        graphdef, _ = nnx.split(m)
        self._graphdef = graphdef
        self._img_fn = jax.jit(lambda st, x: nnx.merge(graphdef, st).encode_image(x))
        self._txt_fn = jax.jit(lambda st, t: nnx.merge(graphdef, st).encode_text(t))

    def get_image_latent(self, images: np.ndarray, *, batch_size: int = 64) -> np.ndarray:
        """images: uint8/float NHWC at the model's img_size, normalized [-1,1]."""
        images = np.asarray(images)
        if images.ndim == 3:
            images = images[None]
        if images.dtype == np.uint8:
            images = images.astype(np.float32) / 127.5 - 1.0
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

    def zero_shot_classify(self, images: np.ndarray, class_texts: List[str]) -> np.ndarray:
        img = self.get_image_latent(images)
        txt = self.get_text_latent(class_texts)
        return np.argmax(img @ txt.T, axis=-1)
