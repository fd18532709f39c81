"""`VQVAEInference` — sample from a trained VQ-VAE (+ optional PixelCNN prior).

Parity: reference `cflearn/api/cv/vq_vae.py:91` — decode codebook indices to
images; with a trained auto-regressor prior, ancestral-sample indices first.
"""

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ...modules.cv.classifier import PixelCNN
from ...modules.cv.vae import VQVAE
from ..common import IAPI


class VQVAEInference(IAPI):
    def __init__(self, m: VQVAE, *, prior: Optional[PixelCNN] = None) -> None:
        super().__init__(m)
        self.m: VQVAE = m
        self.prior = prior
        graphdef, _ = nnx.split(m)
        self._decode_fn = jax.jit(
            lambda st, idx: nnx.merge(graphdef, st).decode_indices(idx)
        )

    def decode_indices(self, indices: np.ndarray) -> np.ndarray:
        out = self._decode_fn(nnx.state(self.m), jnp.asarray(indices))
        return np.asarray(out)

    def reconstruct(self, images: np.ndarray) -> np.ndarray:
        out = self.m(jnp.asarray(images))
        return np.asarray(out["predictions"])

    def sample(self, num_samples: int, *, key: Optional[jax.Array] = None) -> np.ndarray:
        res = self.m.latent_resolution
        if self.prior is not None:
            indices = np.asarray(self.prior.sample(num_samples, key=key))[..., 0]
        else:
            rng = np.random.RandomState(0 if key is None else int(jax.random.randint(key, (), 0, 2**31 - 1)))
            indices = rng.randint(0, self.m.num_code, (num_samples, res, res))
        return self.decode_indices(indices)
