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
