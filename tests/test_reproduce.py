"""Cross-framework parity (reference analogue: `tests/test_reproduce.py` —
CLIP outputs compared against HF transformers). Here a randomly-initialized
HF CLIPTextModel's weights convert through `zoo.convert` into our text tower
and the hidden states must match to fp32 tolerance — validating both the
conversion mapping AND the architecture (quick_gelu, pre-LN, causal mask,
eps) without any downloads."""

import numpy as np
import pytest

pytest.importorskip("transformers")
pytest.importorskip("torch")


def test_clip_text_parity_vs_hf() -> None:
    import torch
    from transformers import CLIPTextConfig, CLIPTextModel

    import jax.numpy as jnp
    from flax import nnx

    from cflearn_tpu.modules.multimodal.diffusion.cond_models import CLIPTextConditionModel
    from cflearn_tpu.toolkit.tree import npd_to_tree
    from cflearn_tpu.zoo.convert import apply_mapping, build_clip_text_mapping

    torch.manual_seed(0)
    cfg = CLIPTextConfig(
        vocab_size=100,
        hidden_size=32,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=2,
        max_position_embeddings=16,
        hidden_act="quick_gelu",
    )
    hf = CLIPTextModel(cfg).eval()
    tokens = torch.randint(0, 100, (2, 16))
    with torch.no_grad():
        hf_out = hf(tokens).last_hidden_state.numpy()

    ours = CLIPTextConditionModel(
        latent_dim=32, num_layers=2, num_heads=2, context_length=16, vocab_size=100, rngs=nnx.Rngs(0)
    )
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    mapping = build_clip_text_mapping(prefix="text_model", our_prefix="enc", num_layers=2)
    npd = {k[len("enc/"):]: v for k, v in apply_mapping(mapping, sd, strict=True).items()}
    nnx.update(ours.encoder, npd_to_tree(npd, nnx.state(ours.encoder), strict=True))

    our_out = np.asarray(ours(jnp.asarray(tokens.numpy())))
    np.testing.assert_allclose(our_out, hf_out, atol=2e-5)


def test_gpt2_parity_vs_hf() -> None:
    """GPT-2 decoder parity: a random HF GPT2LMHeadModel converts through
    `convert_gpt2` and logits must match to fp32 tolerance (validates the
    prompt-enhance port, reference `api/nlp/third_party/prompt.py:26`)."""
    import torch
    from transformers import GPT2Config, GPT2LMHeadModel

    import jax.numpy as jnp
    from flax import nnx

    from cflearn_tpu.api.nlp.third_party.prompt import GPT2LMHead, convert_gpt2
    from cflearn_tpu.toolkit.tree import npd_to_tree

    torch.manual_seed(0)
    cfg = GPT2Config(
        vocab_size=120, n_positions=32, n_embd=48, n_layer=2, n_head=4,
        resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
    )
    hf = GPT2LMHeadModel(cfg).eval()
    tokens = torch.randint(0, 120, (2, 16))
    with torch.no_grad():
        hf_logits = hf(tokens).logits.numpy()

    ours = GPT2LMHead(vocab_size=120, dim=48, num_layers=2, num_heads=4, max_positions=32, rngs=nnx.Rngs(0))
    npd = convert_gpt2({k: v.numpy() for k, v in hf.state_dict().items()})
    nnx.update(ours, npd_to_tree(npd, nnx.state(ours), strict=True))
    our_logits = np.asarray(ours(jnp.asarray(tokens.numpy())))
    np.testing.assert_allclose(our_logits, hf_logits, atol=3e-4)


def test_gpt2_sampling_contract() -> None:
    """Fixed-shape sampling loop: deterministic under a fixed key, respects
    max_length, prompt preserved, repetition penalty applied."""
    from flax import nnx

    import jax

    from cflearn_tpu.api.nlp.third_party.prompt import GPT2LMHead, sample_tokens

    m = GPT2LMHead(vocab_size=100, dim=32, num_layers=1, num_heads=2, max_positions=64, rngs=nnx.Rngs(0))
    prompt = np.asarray([5, 7, 11], np.int64)
    out1 = sample_tokens(m, prompt, max_length=12, eos_token=99, num_return_sequences=2, key=jax.random.PRNGKey(1))
    out2 = sample_tokens(m, prompt, max_length=12, eos_token=99, num_return_sequences=2, key=jax.random.PRNGKey(1))
    assert out1.shape == (2, 12)
    np.testing.assert_array_equal(out1, out2)
    np.testing.assert_array_equal(out1[:, :3], np.stack([prompt] * 2))
    assert ((out1 >= 0) & (out1 < 100)).all()


def test_blip_text_decoder_parity_vs_hf_bert() -> None:
    """BLIP text decoder parity: a random HF BertLMHeadModel (is_decoder +
    cross attention) converts through `convert_blip` and logits must match
    (validates the BLIP captioner port, reference
    `api/multimodal/third_party/blip.py:15`)."""
    import torch
    from transformers import BertConfig, BertLMHeadModel

    import jax.numpy as jnp
    from flax import nnx

    from cflearn_tpu.api.multimodal.third_party.blip import BLIPTextDecoder, convert_blip
    from cflearn_tpu.toolkit.tree import npd_to_tree

    torch.manual_seed(0)
    cfg = BertConfig(
        vocab_size=90, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, max_position_embeddings=24,
        is_decoder=True, add_cross_attention=True,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    hf = BertLMHeadModel(cfg).eval()
    tokens = torch.randint(0, 90, (2, 10))
    enc = torch.randn(2, 7, 32)
    with torch.no_grad():
        hf_logits = hf(tokens, encoder_hidden_states=enc).logits.numpy()

    ours = BLIPTextDecoder(vocab_size=90, dim=32, depth=2, heads=4, max_positions=24, rngs=nnx.Rngs(0))
    sd = {f"text_decoder.{k}": v.numpy() for k, v in hf.state_dict().items()}
    npd = {k[len("text_decoder/"):]: v for k, v in convert_blip(sd).items()}
    nnx.update(ours, npd_to_tree(npd, nnx.state(ours), strict=True))
    # HF decoder applies a causal mask internally when is_decoder
    our_logits = np.asarray(ours(jnp.asarray(tokens.numpy()), jnp.asarray(enc.numpy())))
    np.testing.assert_allclose(our_logits, hf_logits, atol=3e-4)


def test_blip_caption_generation_contract() -> None:
    """Greedy generation: fixed shapes, prompt preserved, ends at eos."""
    import jax
    import jax.numpy as jnp
    from flax import nnx

    from cflearn_tpu.api.multimodal.third_party.blip import BLIPCaptioner, generate_caption_tokens

    m = BLIPCaptioner(img_size=64, dim=32, vision_depth=1, text_depth=1, heads=2, vocab_size=80, rngs=nnx.Rngs(0))
    img = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 3))
    prompt = np.asarray([3, 5], np.int64)
    out = generate_caption_tokens(m, img, prompt, max_length=9, eos_token=79, pad_token=0)
    assert out.shape == (1, 9)
    np.testing.assert_array_equal(out[0, :2], prompt)
    out2 = generate_caption_tokens(m, img, prompt, max_length=9, eos_token=79, pad_token=0)
    np.testing.assert_array_equal(out, out2)  # greedy = deterministic
