"""Module/block unit tests (reference analogue: `tests/test_blocks.py` —
EMA semantics, attention parity, conv modes, encoders)."""

import numpy as np

import jax
import jax.numpy as jnp
from flax import nnx

from cflearn_tpu.modules.common import EMA, Residual, zero_module
from cflearn_tpu.modules.core.activations import build_activation
from cflearn_tpu.modules.core.attentions import Attention
from cflearn_tpu.modules.core.customs import DNDF
from cflearn_tpu.modules.core.ml_encoder import Encoder
from cflearn_tpu.ops.attention import xla_attention


def test_attention_vs_naive() -> None:
    rngs = nnx.Rngs(0)
    attn = Attention(16, 4, rngs=rngs)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 16))
    out = attn(x)
    assert out.shape == (2, 8, 16)
    # parity with explicit softmax math
    q = attn.q_proj(x).reshape(2, 8, 4, 4).transpose(0, 2, 1, 3)
    k = attn.k_proj(x).reshape(2, 8, 4, 4).transpose(0, 2, 1, 3)
    v = attn.v_proj(x).reshape(2, 8, 4, 4).transpose(0, 2, 1, 3)
    scores = jax.nn.softmax((q @ k.transpose(0, 1, 3, 2)) * attn.scale, axis=-1)
    naive = (scores @ v).transpose(0, 2, 1, 3).reshape(2, 8, 16)
    naive = attn.out_proj(naive)
    np.testing.assert_allclose(np.asarray(out), np.asarray(naive), atol=1e-5)


def test_causal_attention_is_causal() -> None:
    q = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 6, 8))
    out1 = xla_attention(q, q, q, causal=True)
    # changing future positions must not affect earlier outputs
    q2 = q.at[:, :, -1].set(0.0)
    out2 = xla_attention(q2, q2, q2, causal=True)
    np.testing.assert_allclose(np.asarray(out1[:, :, :3]), np.asarray(out2[:, :, :3]), atol=1e-5)


def test_ema_semantics() -> None:
    class Tiny(nnx.Module):
        def __init__(self, rngs: nnx.Rngs) -> None:
            self.lin = nnx.Linear(2, 2, rngs=rngs)

    m = Tiny(nnx.Rngs(0))
    ema = EMA(0.9, m)
    w0 = np.asarray(m.lin.kernel[...]).copy()
    m.lin.kernel[...] = m.lin.kernel[...] + 1.0
    ema.update(m)
    # first update: decay = min(0.9, 2/11)
    decay = min(0.9, 2.0 / 11.0)
    shadow = jax.tree_util.tree_leaves(ema.shadow)
    expected = decay * w0 + (1 - decay) * (w0 + 1.0)
    kernel_shadow = [s for s in shadow if s.shape == (2, 2)][0]
    np.testing.assert_allclose(np.asarray(kernel_shadow), expected, atol=1e-6)
    # copy_to swaps shadow into the live module
    ema.copy_to(m)
    np.testing.assert_allclose(np.asarray(m.lin.kernel[...]), expected, atol=1e-6)


def test_zero_module() -> None:
    lin = nnx.Linear(4, 4, rngs=nnx.Rngs(0))
    zero_module(lin)
    assert float(jnp.abs(lin.kernel[...]).max()) == 0.0


def test_dndf_routes_sum_to_one() -> None:
    dndf = DNDF(8, None, num_tree=3, tree_depth=3, rngs=nnx.Rngs(0))
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 8))
    routes = dndf(x).reshape(4, 3, 8)
    np.testing.assert_allclose(np.asarray(routes.sum(-1)), 1.0, atol=1e-4)


def test_dndf_classification_probabilities() -> None:
    dndf = DNDF(8, 3, num_tree=2, tree_depth=2, rngs=nnx.Rngs(0))
    out = dndf(jax.random.normal(jax.random.PRNGKey(0), (4, 8)))
    assert out.shape == (4, 3)
    np.testing.assert_allclose(np.asarray(out.sum(-1)), 1.0 / 2 * 2, atol=1e-4)


def test_ml_encoder() -> None:
    enc = Encoder({"1": {"dim": 4}, "3": {"dim": 3, "methods": "one_hot"}}, rngs=nnx.Rngs(0))
    x = jnp.asarray(np.random.randn(5, 4).astype(np.float32))
    x = x.at[:, 1].set(jnp.asarray([0, 1, 2, 3, 0]))
    x = x.at[:, 3].set(jnp.asarray([0, 1, 2, 0, 1]))
    pack = enc(x)
    merged = pack.merged
    assert merged.shape[-1] == 2 + 3 + enc.embed_dims[0]
    assert enc.dim_increment == merged.shape[-1] - 4


def test_activations() -> None:
    x = jnp.linspace(-2, 2, 9)
    for name in ["relu", "gelu", "silu", "mish", "quick_gelu", "h_swish", "sigmoid", "tanh", "sine"]:
        act = build_activation(name)
        out = act(x)
        assert out.shape == x.shape
        assert bool(jnp.isfinite(out).all())


def test_residual() -> None:
    lin = nnx.Linear(4, 4, rngs=nnx.Rngs(0))
    res = Residual(lin)
    x = jnp.ones((2, 4))
    np.testing.assert_allclose(np.asarray(res(x)), np.asarray(x + lin(x)), atol=1e-6)


def test_group_norm_parity() -> None:
    from cflearn_tpu.ops.group_norm import _group_norm_xla

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 8))
    ours = _group_norm_xla(x, None, None, num_groups=2, eps=1e-5, apply_silu=False)
    gn = nnx.GroupNorm(8, num_groups=2, epsilon=1e-5, use_bias=False, use_scale=False, rngs=nnx.Rngs(0))
    theirs = gn(x)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(theirs), atol=1e-5)


def test_vq_codebook_straight_through() -> None:
    from cflearn_tpu.modules.cv.common import VQCodebook

    cb = VQCodebook(16, 4, rngs=nnx.Rngs(0))
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 3, 4))

    def loss_fn(z: jax.Array) -> jax.Array:
        out = cb(z)
        return jnp.sum(out.z_q**2)

    g = jax.grad(loss_fn)(z)
    # straight-through: gradient flows to z
    assert float(jnp.abs(g).sum()) > 0.0


def test_tokenizer_fallback() -> None:
    from cflearn_tpu.modules.nlp.tokenizers import CLIPTokenizer

    tok = CLIPTokenizer()
    out = tok.tokenize(["hello world", "a photo of a cat"])
    assert out.shape == (2, 77)
    assert out[0, 0] == tok.sot_token
    assert tok.eot_token in out[0]


def test_clip_pretokenization_pattern() -> None:
    """CLIP's pattern splits digits into single-character tokens and never
    merges letters with digits — `\\w+` would (silently breaking pretrained
    conditioning for any prompt with numbers)."""
    from cflearn_tpu.modules.nlp.tokenizers import CLIPTokenizer

    pat = CLIPTokenizer().pat
    assert pat.findall("photo of 2023") == ["photo", "of", "2", "0", "2", "3"]
    assert pat.findall("sd15 model") == ["sd", "1", "5", "model"]
    assert pat.findall("it's a cat!!") == ["it", "'s", "a", "cat", "!!"]
    assert pat.findall("café ça") == ["café", "ça"]


def test_downsample_torch_padding_parity() -> None:
    """Stride-2 downsample window alignment vs torch, both conventions:
    the UNet's ResDownsample is a symmetric padding=1 conv (reference
    `core/convs/residual.py:94`), the VAE encoder pads (0,1,0,1) then runs a
    padding=0 conv (reference `encoder/attn.py:25`). A converted checkpoint
    only matches if the conv windows align exactly."""
    import torch
    import torch.nn.functional as F
    from flax import nnx

    from cflearn_tpu.modules.core.convs import Downsample

    rng = np.random.RandomState(0)
    x = rng.randn(1, 8, 10, 10).astype(np.float32)  # NCHW (torch)
    w = rng.randn(8, 8, 3, 3).astype(np.float32)
    b = rng.randn(8).astype(np.float32)

    tx = torch.from_numpy(x)
    tw, tb = torch.from_numpy(w), torch.from_numpy(b)
    ref_unet = F.conv2d(tx, tw, tb, stride=2, padding=1).numpy()
    ref_vae = F.conv2d(F.pad(tx, (0, 1, 0, 1)), tw, tb, stride=2, padding=0).numpy()

    for symmetric, ref in [(True, ref_unet), (False, ref_vae)]:
        down = Downsample(8, use_conv=True, symmetric=symmetric, rngs=nnx.Rngs(0))
        down.conv.kernel.value = jnp.asarray(w.transpose(2, 3, 1, 0))  # OIHW→HWIO
        down.conv.bias[...] = jnp.asarray(b)
        out = np.asarray(down(jnp.asarray(x.transpose(0, 2, 3, 1))))  # NHWC
        np.testing.assert_allclose(out.transpose(0, 3, 1, 2), ref, atol=1e-5)


def test_decayed_attention_matches_multiplicative_reference() -> None:
    """The reference multiplies post-softmax weights by a decay matrix and
    renormalizes (`attentions.py:322-327`); ours adds the log-decay to the
    logits. These are mathematically identical — verify numerically."""
    from cflearn_tpu.modules.core.attentions import DecayedAttention, np_decay_log_bias

    seq_len, heads, dim = 6, 2, 8
    attn = DecayedAttention(dim, heads, seq_len=seq_len, is_self_attention=True, rngs=nnx.Rngs(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, seq_len, dim))
    out = np.asarray(attn(x))

    # numpy reference: softmax then multiplicative decay + renorm
    qkv = np.asarray(attn.in_proj(x))
    q, k, v = np.split(qkv, 3, axis=-1)
    dh = dim // heads
    q = q.reshape(1, seq_len, heads, dh).transpose(0, 2, 1, 3)
    k = k.reshape(1, seq_len, heads, dh).transpose(0, 2, 1, 3)
    v = v.reshape(1, seq_len, heads, dh).transpose(0, 2, 1, 3)
    logits = q @ k.transpose(0, 1, 3, 2) / np.sqrt(dh)
    w = np.exp(logits - logits.max(-1, keepdims=True))
    w = w / w.sum(-1, keepdims=True)
    decay = np.exp(np_decay_log_bias(seq_len, heads))
    w = w * decay[None]
    w = w / (w.sum(-1, keepdims=True) + 1e-8)
    ref = (w @ v).transpose(0, 2, 1, 3).reshape(1, seq_len, dim)
    ref = np.asarray(attn.out_proj(jnp.asarray(ref)))
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_attention_mask_polarity_zeroes_marked_slots() -> None:
    """Reference convention (`attentions.py:212`): mask=True marks slots to
    be zeroed out. A fully-masked key position must get zero weight."""
    dim = 8
    attn = Attention(dim, 2, is_self_attention=True, rngs=nnx.Rngs(0))
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, dim))
    mask = np.zeros((1, 1, 4, 4), dtype=bool)
    mask[..., -1] = True  # zero out the last key slot
    out_masked = np.asarray(attn(x, mask=jnp.asarray(mask)))
    # perturbing the masked-out position must not change the output of other queries
    x2 = x.at[0, -1].set(x[0, -1] + 10.0)
    out_masked2 = np.asarray(attn(x2, mask=jnp.asarray(mask)))
    np.testing.assert_allclose(out_masked[0, :3], out_masked2[0, :3], atol=1e-5)


def test_focal_loss_scalar_alpha_and_recon_base() -> None:
    """Regression (code review): FocalLoss(alpha=0.25) crashed on the scalar
    index; recon loss defaults to MAE per the reference."""
    import jax
    import jax.numpy as jnp

    from cflearn_tpu.losses.basic import FocalLoss, ReconstructionLoss

    logits = jax.random.normal(jax.random.PRNGKey(0), (8, 2))
    labels = jnp.asarray(np.random.RandomState(0).randint(0, 2, (8, 1)))
    out = FocalLoss(alpha=0.25).forward(logits, labels)
    assert bool(jnp.isfinite(out).all())
    p = jnp.asarray([[1.0]])
    x = jnp.asarray([[3.0]])
    assert float(ReconstructionLoss().forward(p, x)[0, 0]) == 2.0  # MAE default
    assert float(ReconstructionLoss(base_loss="mse").forward(p, x)[0, 0]) == 4.0


def test_warmup_scheduler_starts_at_base_lr() -> None:
    """Regression (code review): the warmup ramp must START at lr, not
    lr/multiplier (reference base_lr*((multiplier-1)*step/warmup+1))."""
    from cflearn_tpu.schedulers import build_scheduler

    sched = build_scheduler("warmup", 1e-3, multiplier=5.0, warmup_step=10)
    assert abs(float(sched(0)) - 1e-3) < 1e-9
    assert abs(float(sched(10)) - 5e-3) < 1e-9


def test_tome_non_divisible_sizes_keep_all_tokens() -> None:
    """Regression (code review): odd h/w truncated real dst tokens and
    zero-padded src indices (dropped/duplicated tokens). merge→unmerge of a
    CONSTANT-per-token tensor must reproduce every token exactly when r=0,
    and preserve total token count in general."""
    import jax
    import jax.numpy as jnp

    from cflearn_tpu.modules.core.tome import bipartite_soft_matching_random2d

    h, w, c = 5, 4, 8
    x = jnp.arange(h * w, dtype=jnp.float32)[None, :, None] * jnp.ones((1, 1, c))
    merge, unmerge, _ = bipartite_soft_matching_random2d(x, h, w, ratio=0.0)
    np.testing.assert_allclose(np.asarray(unmerge(merge(x))), np.asarray(x), atol=1e-5)
    # with merging active, every output row must come from a real token
    merge, unmerge, _ = bipartite_soft_matching_random2d(x, h, w, ratio=0.3)
    out = np.asarray(unmerge(merge(x)))
    assert out.shape == np.asarray(x).shape
    assert np.isfinite(out).all()


def test_mhsa_uses_legacy_interleaved_qkv_layout() -> None:
    """Regression (code review): fused-qkv channels are per-head interleaved
    [h0:(q,k,v), h1:(q,k,v), …] (reference QKVAttentionLegacy) — a global
    [Q|K|V] split would slice converted checkpoints wrongly for heads>1."""
    import jax
    import jax.numpy as jnp

    from cflearn_tpu.modules.core.attentions import MultiHeadSpatialAttention

    heads, c = 2, 8
    m = MultiHeadSpatialAttention(c, num_heads=heads, num_groups=4, rngs=nnx.Rngs(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 3, c))
    out = m(x)
    # manual legacy computation from the module's own weights
    net = np.asarray(m.norm(x)).reshape(1, 9, c)
    w = np.asarray(m.to_qkv.kernel[...])
    bqkv = np.asarray(m.to_qkv.bias[...])
    qkv = net @ w + bqkv  # (1, 9, 3c)
    dh = c // heads
    qkv = qkv.reshape(1, 9, heads, 3 * dh)
    q, k, v = qkv[..., :dh], qkv[..., dh : 2 * dh], qkv[..., 2 * dh :]
    outs = []
    for h_ in range(heads):
        scores = (q[0, :, h_] / np.sqrt(dh)) @ k[0, :, h_].T
        p = np.exp(scores - scores.max(-1, keepdims=True))
        p = p / p.sum(-1, keepdims=True)
        outs.append(p @ v[0, :, h_])
    attn = np.concatenate(outs, axis=-1)
    expected = np.asarray(x) + (
        attn @ np.asarray(m.to_out.kernel[...]) + np.asarray(m.to_out.bias[...])
    ).reshape(1, 3, 3, c)
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-4)


def test_ndt_routes_match_sklearn_tree() -> None:
    """Regression (code review): a depth-proportional route bias misrouted
    leaves on unbalanced trees."""
    from sklearn.tree import DecisionTreeClassifier

    from cflearn_tpu.modules.ml.nets import NDT

    rng = np.random.RandomState(0)
    # unbalanced: one shallow pure region + deep structure elsewhere
    x = rng.rand(400, 3).astype(np.float32)
    y = ((x[:, 0] > 0.7) | ((x[:, 1] > 0.5) & (x[:, 2] > 0.5))).astype(np.int64)
    tree = DecisionTreeClassifier(max_depth=5, random_state=0).fit(x, y)
    ndt = NDT.from_sklearn_tree(tree, 3, 2, rngs=nnx.Rngs(0))
    import jax.numpy as jnp

    pred = np.argmax(np.asarray(ndt(jnp.asarray(x))), axis=-1)
    agreement = float((pred == tree.predict(x)).mean())
    assert agreement > 0.95, agreement


def test_rnn_bidirectional_and_conv2d_gain() -> None:
    """Regression (code review): `bidirectional` was silently ignored;
    Conv2d `gain` scaled activations at runtime instead of init."""
    import jax
    import jax.numpy as jnp

    from cflearn_tpu.modules.core.convs import Conv2d
    from cflearn_tpu.modules.ml.nets import RNN

    x = jax.random.normal(jax.random.PRNGKey(0), (4, 6, 3))
    uni = RNN(3, 2, hidden_dim=8, rngs=nnx.Rngs(0))
    bi = RNN(3, 2, hidden_dim=8, bidirectional=True, rngs=nnx.Rngs(0))
    assert uni(x).shape == bi(x).shape == (4, 2)
    assert bi.head.kernel[...].shape[0] == 16  # doubled head input

    img = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4))
    plain = Conv2d(4, 4, kernel_size=3, rngs=nnx.Rngs(0))
    scaled = Conv2d(4, 4, kernel_size=3, weight_scale=2.0, rngs=nnx.Rngs(0))
    np.testing.assert_allclose(
        np.asarray(scaled(img)), 2.0 * np.asarray(plain(img)), atol=1e-5
    )
    # transform_kernel runs (was stored-but-ignored) and changes the output
    tk = Conv2d(4, 4, kernel_size=3, transform_kernel=True, rngs=nnx.Rngs(0))
    assert not np.allclose(np.asarray(tk(img)), np.asarray(plain(img)))


def test_weights_pool_reregister_replaces() -> None:
    """Regression (code review): re-registering a tag kept the stale copy."""
    from cflearn_tpu.api.common import Weights

    w = Weights()
    w.register("v", {"a": np.zeros(2)})
    w.register("v", {"a": np.ones(2)})
    np.testing.assert_array_equal(w.get("v")["a"], np.ones(2))
