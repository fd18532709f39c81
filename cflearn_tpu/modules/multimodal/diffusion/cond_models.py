"""Condition models for diffusion.

Parity: reference `cflearn/modules/multimodal/diffusion/cond_models/` —
`condition_models` registry (`common.py:10-12`), `CLIPTextConditionModel`
(`cond_models/clip.py` — tokenized text → CLIP text-tower hidden states,
with clip-skip and custom-embedding support), `rescaler` specialized cond
(`cond_models/rescaler.py`).
"""

from typing import Dict, Optional

import jax
import jax.numpy as jnp
from flax import nnx

from ...common import PrefixModules
from ..clip import TeTEncoder

condition_models = PrefixModules("condition_models")
specialized_condition_models = PrefixModules("specialized_condition_models")


@condition_models.register("clip_text")
class CLIPTextConditionModel(nnx.Module):
    """Text conditioning: token ids → per-token hidden states (B, 77, D).

    For SD v1 the tower is CLIP ViT-L/14's text encoder (width 768) and the
    FINAL layer norm is applied; clip-skip picks earlier hidden states
    (reference `cond_models/clip.py`)."""

    def __init__(
        self,
        *,
        latent_dim: int = 768,
        num_layers: int = 12,
        num_heads: int = 12,
        context_length: int = 77,
        vocab_size: int = 49408,
        clip_skip: int = 0,
        rngs: nnx.Rngs,
    ) -> None:
        self.clip_skip = clip_skip
        self.encoder = TeTEncoder(
            vocab_size=vocab_size,
            context_length=context_length,
            latent_dim=latent_dim,
            num_layers=num_layers,
            num_heads=num_heads,
            activation="quick_gelu",
            rngs=rngs,
        )

    def __call__(self, token_ids: jax.Array) -> jax.Array:
        if token_ids.dtype not in (jnp.int32, jnp.int64):
            # already-encoded context passes through (pre-encoded conds)
            return token_ids
        return self.encoder(token_ids, clip_skip=self.clip_skip, apply_final_ln=True)

    def encode_with_custom_embeddings(
        self,
        token_ids: jax.Array,
        custom_embeddings: Optional[Dict[int, jax.Array]] = None,
    ) -> jax.Array:
        """Textual-inversion style: replace given token ids' embeddings."""
        embeddings = self.encoder.token_embedding(token_ids)
        if custom_embeddings:
            for token_id, embed in custom_embeddings.items():
                mask = (token_ids == token_id)[..., None]
                embeddings = jnp.where(mask, embed, embeddings)
        return self.encoder.embed_with(embeddings)


@specialized_condition_models.register("rescaler")
class Rescaler(nnx.Module):
    """Downsample a spatial condition by `multiplier` per stage, optionally
    remapping channels with a 1x1 conv (reference `cond_models/rescaler.py:13`
    `SpatialRescaler` — used by the semantic LDM with
    `in_channels=182, out_channels=3`)."""

    def __init__(
        self,
        *,
        in_channels: int = 3,
        out_channels: Optional[int] = None,
        num_stages: int = 1,
        multiplier: float = 0.5,
        method: str = "bilinear",
        bias: bool = False,
        rngs: Optional[nnx.Rngs] = None,
    ) -> None:
        supported = {"nearest", "linear", "bilinear", "trilinear", "bicubic"}
        if method not in supported:
            raise ValueError(f"`method` should be one of {supported}")
        self.in_channels = in_channels
        self.num_stages = num_stages
        self.multiplier = multiplier
        self.method = method
        if out_channels is None:
            self.channel_mapper = None
        else:
            from flax import nnx as _nnx

            self.channel_mapper = _nnx.Conv(
                in_channels, out_channels, kernel_size=(1, 1), use_bias=bias,
                rngs=rngs or _nnx.Rngs(0),
            )

    def __call__(self, x: jax.Array) -> jax.Array:
        for _ in range(self.num_stages):
            b, h, w, c = x.shape
            nh = max(1, int(round(h * self.multiplier)))
            nw = max(1, int(round(w * self.multiplier)))
            x = jax.image.resize(x, (b, nh, nw, c), self.method)
        if self.channel_mapper is not None:
            x = self.channel_mapper(x)
        return x


# reference class name (`cond_models/rescaler.py:13`)
SpatialRescaler = Rescaler
