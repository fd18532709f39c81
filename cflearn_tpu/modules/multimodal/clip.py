"""CLIP — vision ViT + text transformer perceptor.

Parity: reference `cflearn/modules/multimodal/clip.py:23-120+` (registered
"clip": ViT vision tower + causal text transformer, quick_gelu, learned
logit scale) and `cflearn/modules/nlp/encoder/transformer.py:17`
(`TeTEncoder`, registered "tet"). The SD text encoder is this text tower with
final-LN (clip-skip supported at the condition-model level).
"""

import math
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
from flax import nnx

from ...constants import PREDICTIONS_KEY
from ..common import register_module
from ...ops.attention import sdp_attn


def quick_gelu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPAttention(nnx.Module):
    def __init__(self, dim: int, num_heads: int, *, rngs: nnx.Rngs) -> None:
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.q_proj = nnx.Linear(dim, dim, rngs=rngs)
        self.k_proj = nnx.Linear(dim, dim, rngs=rngs)
        self.v_proj = nnx.Linear(dim, dim, rngs=rngs)
        self.out_proj = nnx.Linear(dim, dim, rngs=rngs)

    def __call__(self, x: jax.Array, *, causal: bool = False) -> jax.Array:
        b, l, d = x.shape
        h = self.num_heads

        def split(t: jax.Array) -> jax.Array:
            return t.reshape(b, l, h, d // h).transpose(0, 2, 1, 3)

        out = sdp_attn(
            split(self.q_proj(x)), split(self.k_proj(x)), split(self.v_proj(x)), causal=causal
        )
        out = out.transpose(0, 2, 1, 3).reshape(b, l, d)
        return self.out_proj(out)


class CLIPMLP(nnx.Module):
    def __init__(self, dim: int, *, ratio: float = 4.0, activation: str = "quick_gelu", rngs: nnx.Rngs) -> None:
        hidden = int(dim * ratio)
        self.fc1 = nnx.Linear(dim, hidden, rngs=rngs)
        self.fc2 = nnx.Linear(hidden, dim, rngs=rngs)
        self.activation = activation

    def __call__(self, x: jax.Array) -> jax.Array:
        x = self.fc1(x)
        x = quick_gelu(x) if self.activation == "quick_gelu" else jax.nn.gelu(x)
        return self.fc2(x)


class CLIPBlock(nnx.Module):
    def __init__(self, dim: int, num_heads: int, *, activation: str = "quick_gelu", rngs: nnx.Rngs) -> None:
        self.ln_1 = nnx.LayerNorm(dim, epsilon=1e-5, rngs=rngs)
        self.attn = CLIPAttention(dim, num_heads, rngs=rngs)
        self.ln_2 = nnx.LayerNorm(dim, epsilon=1e-5, rngs=rngs)
        self.mlp = CLIPMLP(dim, activation=activation, rngs=rngs)

    def __call__(self, x: jax.Array, *, causal: bool = False) -> jax.Array:
        x = x + self.attn(self.ln_1(x), causal=causal)
        x = x + self.mlp(self.ln_2(x))
        return x


@register_module("tet")
class TeTEncoder(nnx.Module):
    """Text transformer encoder (reference `nlp/encoder/transformer.py:17`).

    Causal transformer over BPE tokens; returns all hidden states so
    clip-skip can pick intermediate layers (SD conditioning)."""

    def __init__(
        self,
        *,
        vocab_size: int = 49408,
        context_length: int = 77,
        latent_dim: int = 512,
        num_layers: int = 12,
        num_heads: int = 8,
        activation: str = "quick_gelu",
        rngs: nnx.Rngs,
    ) -> None:
        self.context_length = context_length
        self.token_embedding = nnx.Embed(vocab_size, latent_dim, rngs=rngs)
        key = rngs.params()
        self.positional_embedding = nnx.Param(
            jax.random.normal(key, (context_length, latent_dim)) * 0.01
        )
        self.blocks = nnx.List(
            [CLIPBlock(latent_dim, num_heads, activation=activation, rngs=rngs) for _ in range(num_layers)]
        )
        self.ln_final = nnx.LayerNorm(latent_dim, epsilon=1e-5, rngs=rngs)

    def __call__(
        self,
        token_ids: jax.Array,
        *,
        clip_skip: int = 0,
        apply_final_ln: bool = True,
        return_pooled: bool = False,
    ) -> Any:
        # slice positions to the input length (callers need not pad to max)
        x = self.token_embedding(token_ids) + self.positional_embedding[...][None, : token_ids.shape[1]]
        hidden_states: List[jax.Array] = []
        for block in self.blocks:
            x = block(x, causal=True)
            hidden_states.append(x)
        if clip_skip > 0:
            x = hidden_states[-(clip_skip + 1)]
        if apply_final_ln:
            x = self.ln_final(x)
        if return_pooled:
            eot = jnp.argmax(token_ids, axis=-1)
            pooled = x[jnp.arange(x.shape[0]), eot]
            return x, pooled
        return x

    def embed_with(self, embeddings: jax.Array, *, apply_final_ln: bool = True) -> jax.Array:
        """Run the tower on pre-computed token embeddings (custom/textual-
        inversion embeddings, reference cond_models/clip)."""
        x = embeddings + self.positional_embedding[...][None, : embeddings.shape[1]]
        for block in self.blocks:
            x = block(x, causal=True)
        if apply_final_ln:
            x = self.ln_final(x)
        return x


class CLIPVisionTower(nnx.Module):
    def __init__(
        self,
        *,
        img_size: int = 224,
        patch_size: int = 32,
        latent_dim: int = 768,
        num_layers: int = 12,
        num_heads: int = 12,
        activation: str = "quick_gelu",
        rngs: nnx.Rngs,
    ) -> None:
        self.conv = nnx.Conv(
            3,
            latent_dim,
            kernel_size=(patch_size, patch_size),
            strides=(patch_size, patch_size),
            use_bias=False,
            rngs=rngs,
        )
        num_patches = (img_size // patch_size) ** 2
        key = rngs.params()
        self.class_embedding = nnx.Param(jax.random.normal(key, (latent_dim,)) * 0.02)
        self.positional_embedding = nnx.Param(
            jax.random.normal(rngs.params(), (num_patches + 1, latent_dim)) * 0.02
        )
        self.ln_pre = nnx.LayerNorm(latent_dim, epsilon=1e-5, rngs=rngs)
        self.blocks = nnx.List(
            [CLIPBlock(latent_dim, num_heads, activation=activation, rngs=rngs) for _ in range(num_layers)]
        )
        self.ln_post = nnx.LayerNorm(latent_dim, epsilon=1e-5, rngs=rngs)

    def __call__(self, x: jax.Array) -> jax.Array:
        net = self.conv(x)  # (B, H/p, W/p, D)
        b, h, w, d = net.shape
        net = net.reshape(b, h * w, d)
        cls = jnp.broadcast_to(self.class_embedding[...][None, None], (b, 1, d))
        net = jnp.concatenate([cls, net], axis=1)
        net = net + self.positional_embedding[...][None]
        net = self.ln_pre(net)
        for block in self.blocks:
            net = block(net)
        return self.ln_post(net[:, 0])


class IPerceptor(nnx.Module):
    """Image/text joint embedding interface (reference `multimodal/schema.py:10`)."""

    def encode_image(self, image: jax.Array) -> jax.Array:
        raise NotImplementedError

    def encode_text(self, token_ids: jax.Array) -> jax.Array:
        raise NotImplementedError


@register_module("clip")
class CLIP(IPerceptor):
    """CLIP (reference `multimodal/clip.py:23`). ViT-B/32 defaults."""

    def __init__(
        self,
        *,
        img_size: int = 224,
        latent_dim: int = 512,
        # vision
        vision_latent_dim: int = 768,
        vision_patch_size: int = 32,
        vision_num_layers: int = 12,
        vision_num_heads: int = 12,
        # text
        vocab_size: int = 49408,
        context_length: int = 77,
        text_latent_dim: int = 512,
        text_num_layers: int = 12,
        text_num_heads: int = 8,
        activation: str = "quick_gelu",
        build_text_tower: bool = True,
        rngs: nnx.Rngs,
    ) -> None:
        self.img_size = img_size
        self.context_length = context_length
        self.vit = CLIPVisionTower(
            img_size=img_size,
            patch_size=vision_patch_size,
            latent_dim=vision_latent_dim,
            num_layers=vision_num_layers,
            num_heads=vision_num_heads,
            activation=activation,
            rngs=rngs,
        )
        self.visual_projection = nnx.Linear(vision_latent_dim, latent_dim, use_bias=False, rngs=rngs)
        if build_text_tower:
            self.token_encoder = TeTEncoder(
                vocab_size=vocab_size,
                context_length=context_length,
                latent_dim=text_latent_dim,
                num_layers=text_num_layers,
                num_heads=text_num_heads,
                activation=activation,
                rngs=rngs,
            )
            self.text_projection = nnx.Linear(text_latent_dim, latent_dim, use_bias=False, rngs=rngs)
        self.logit_scale = nnx.Param(jnp.asarray(math.log(1.0 / 0.07)))

    def encode_image(self, image: jax.Array, *, normalize: bool = True) -> jax.Array:
        latent = self.visual_projection(self.vit(image))
        if normalize:
            latent = latent / jnp.linalg.norm(latent, axis=-1, keepdims=True)
        return latent

    def encode_text(self, token_ids: jax.Array, *, normalize: bool = True) -> jax.Array:
        _, pooled = self.token_encoder(token_ids, return_pooled=True)
        latent = self.text_projection(pooled)
        if normalize:
            latent = latent / jnp.linalg.norm(latent, axis=-1, keepdims=True)
        return latent

    def __call__(self, image: jax.Array, token_ids: jax.Array) -> Dict[str, jax.Array]:
        image_embeds = self.encode_image(image)
        text_embeds = self.encode_text(token_ids)
        scale = jnp.exp(self.logit_scale[...])
        logits = scale * image_embeds @ text_embeds.T
        return {
            "image_embeds": image_embeds,
            "text_embeds": text_embeds,
            "logits_per_image": logits,
            "logits_per_text": logits.T,
            PREDICTIONS_KEY: logits,
        }


class BertTextEncoder(nnx.Module):
    """BERT-style text tower for ChineseCLIP (reference config
    `zoo/configs/multimodal/clip/chinese.json` — post-norm blocks,
    token-type embeddings, embedding LayerNorm, bidirectional attention,
    [CLS] 'bert' pooler with tanh head)."""

    def __init__(
        self,
        *,
        vocab_size: int = 21128,
        context_length: int = 512,
        latent_dim: int = 1024,
        num_layers: int = 24,
        num_heads: int = 16,
        token_type_size: int = 2,
        norm_eps: float = 1e-12,
        rngs: nnx.Rngs,
    ) -> None:
        self.context_length = context_length
        self.token_embedding = nnx.Embed(vocab_size, latent_dim, rngs=rngs)
        self.token_type_embedding = nnx.Embed(token_type_size, latent_dim, rngs=rngs)
        key = rngs.params()
        self.positional_embedding = nnx.Param(
            jax.random.normal(key, (context_length, latent_dim)) * 0.01
        )
        self.embedding_norm = nnx.LayerNorm(latent_dim, epsilon=norm_eps, rngs=rngs)
        self.blocks = nnx.List(
            [
                _BertBlock(latent_dim, num_heads, norm_eps=norm_eps, rngs=rngs)
                for _ in range(num_layers)
            ]
        )
        self.pooler = nnx.Linear(latent_dim, latent_dim, rngs=rngs)

    def __call__(self, token_ids: jax.Array, *, return_pooled: bool = False) -> Any:
        l = token_ids.shape[1]
        x = (
            self.token_embedding(token_ids)
            + self.token_type_embedding(jnp.zeros_like(token_ids))
            + self.positional_embedding[...][None, :l]
        )
        x = self.embedding_norm(x)
        for block in self.blocks:
            x = block(x)
        if return_pooled:
            pooled = jnp.tanh(self.pooler(x[:, 0]))  # [CLS]
            return x, pooled
        return x


class _BertBlock(nnx.Module):
    """Post-norm transformer block (residual -> LayerNorm), GELU FF."""

    def __init__(self, dim: int, num_heads: int, *, norm_eps: float, rngs: nnx.Rngs) -> None:
        self.attn = CLIPAttention(dim, num_heads, rngs=rngs)
        self.ln_1 = nnx.LayerNorm(dim, epsilon=norm_eps, rngs=rngs)
        self.mlp = CLIPMLP(dim, activation="gelu", rngs=rngs)
        self.ln_2 = nnx.LayerNorm(dim, epsilon=norm_eps, rngs=rngs)

    def __call__(self, x: jax.Array) -> jax.Array:
        x = self.ln_1(x + self.attn(x, causal=False))
        x = self.ln_2(x + self.mlp(x))
        return x


@register_module("clip.chinese")
class ChineseCLIP(CLIP):
    """ChineseCLIP (reference zoo `multimodal/clip.chinese`): ViT-L/14
    vision tower + Chinese-BERT text tower. The tokenizer is the HF-backed
    `chinese_clip` tokenizer (`nlp/tokenizers`)."""

    def __init__(
        self,
        *,
        img_size: int = 224,
        latent_dim: int = 768,
        vocab_size: int = 21128,
        context_length: int = 512,
        text_latent_dim: int = 1024,
        text_num_layers: int = 24,
        text_num_heads: int = 16,
        token_type_size: int = 2,
        rngs: nnx.Rngs,
        **kwargs: Any,
    ) -> None:
        super().__init__(
            img_size=img_size,
            latent_dim=latent_dim,
            vision_latent_dim=kwargs.pop("vision_latent_dim", 1024),
            vision_patch_size=kwargs.pop("vision_patch_size", 14),
            vision_num_layers=kwargs.pop("vision_num_layers", 24),
            vision_num_heads=kwargs.pop("vision_num_heads", 16),
            # the BERT text tower below replaces CLIP's — don't allocate the
            # ~63M-param placeholder just to throw it away
            build_text_tower=False,
            rngs=rngs,
        )
        if kwargs:
            raise TypeError(f"unrecognized ChineseCLIP kwargs: {sorted(kwargs)}")
        self.token_encoder = BertTextEncoder(
            vocab_size=vocab_size,
            context_length=context_length,
            latent_dim=text_latent_dim,
            num_layers=text_num_layers,
            num_heads=text_num_heads,
            token_type_size=token_type_size,
            rngs=rngs,
        )
        self.text_projection = nnx.Linear(text_latent_dim, latent_dim, use_bias=False, rngs=rngs)
        self.context_length = context_length
