"""Derive + audit the cflearn-layout -> original-SD key mapping.

The reference re-hosts its anime/dreamlike SD family as checkpoints in ITS
OWN torch layout (`/root/reference/cflearn/zoo/available.json`), produced by
its order-based aligner (`/root/reference/cflearn/scripts/sd.py:192-238`)
from original-SD checkpoints. `cflearn_tpu.zoo.convert` derives the inverse
correspondence STRUCTURALLY (`build_sd_cflearn_renames`); this script audits
that derivation against the reference itself and commits the result:

1. instantiate the reference's actual StableDiffusion module (read-only,
   under the `_ref_oracle` cftool/torchvision stubs) and take its
   state_dict keys + shapes — the ground-truth cflearn layout;
2. build OUR StableDiffusion, invert `build_sd_mapping` into a synthetic
   original-layout state dict — the ground-truth original shapes;
3. assert the structural rename table is exact: every generated cflearn key
   exists in the reference model with an IDENTICAL shape, and every
   reference weight key is either renamed or one of the documented specials
   (fused qkv, pos-embedding broadcast dim, model-constant buffers);
4. assert the full conversion loop numerically: synthesize a cflearn-layout
   checkpoint from the original-layout dict, run `convert_sd_cflearn`, and
   require exact equality with `convert_sd` on the original;
5. write `cflearn_tpu/zoo/sd_cflearn_mapping.json` (renames + specials +
   reference shapes) — the audited artifact `tests/test_convert.py`
   re-validates offline.

Run: python scripts/gen_sd_cflearn_mapping.py   (CPU, ~3 min)
"""

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

OUT_PATH = REPO / "cflearn_tpu" / "zoo" / "sd_cflearn_mapping.json"

# keys of the reference model that are NOT checkpoint content we consume:
# noise-schedule buffers + CLIP constants are recomputed at init; the
# text_projection is unused by SD's conditioning path
NON_CHECKPOINT_KEYS = {
    "betas",
    "alphas_cumprod",
    "alphas_cumprod_prev",
    "sqrt_alphas_cumprod",
    "sqrt_one_minus_alphas_cumprod",
    "posterior_variance",
    "posterior_log_variance_clipped",
    "posterior_coef1",
    "posterior_coef2",
    "condition_model.m.logit_scale",
    "condition_model.m.text_transformer.attention_mask",
    "condition_model.m.text_projection.weight",
    "condition_model.m.text_projection.bias",
}

COND_BLOCKS = "condition_model.m.text_transformer.encoder.mixing_blocks"
POS_KEY = "condition_model.m.text_transformer.encoder.pos_encoding.pos_encoding"
HF_LAYERS = "cond_stage_model.transformer.text_model.encoder.layers"
HF_POS = "cond_stage_model.transformer.text_model.embeddings.position_embedding.weight"


def reference_sd_shapes() -> dict:
    """Instantiate the reference StableDiffusion under the oracle stubs and
    return {key: shape}. The reference runs read-only, as-is."""
    import importlib.metadata as _md

    _orig_version = _md.version

    def _version(name):
        if name == "carefree-learn":
            return "0.5.0"
        return _orig_version(name)

    _md.version = _version
    sys.path.insert(0, str(REPO / "scripts" / "_ref_oracle"))
    sys.path.insert(0, "/root/reference")

    # the reference's CLIP tokenizer fetches HF vocab files at __init__;
    # the parameter layout does not depend on the tokenizer, so stub it
    import transformers

    class _DummyTok:
        bos_token_id = 49406
        eos_token_id = 49407
        pad_token_id = 0
        vocab_size = 49408
        model_max_length = 77

        @classmethod
        def from_pretrained(cls, *a, **k):
            return cls()

        def get_vocab(self):
            import collections

            return collections.defaultdict(int)

        def __call__(self, *a, **k):
            return {}

        def __getattr__(self, name):
            if name.startswith("__"):
                raise AttributeError(name)

            def _any(*a, **k):
                return {}

            return _any

    for name in ("CLIPTokenizer", "BertTokenizer", "AutoTokenizer", "GPT2Tokenizer"):
        if hasattr(transformers, name):
            getattr(transformers, name).from_pretrained = classmethod(
                lambda cls, *a, **k: _DummyTok()
            )

    import cflearn  # the REFERENCE package (read-only)

    m = cflearn.zoo.ldm_sd(pretrained=False)
    return {k: tuple(v.shape) for k, v in m.state_dict().items()}


def our_original_layout() -> dict:
    """Synthetic original-SD state dict (deterministic unique values) from
    our random-init model through the inverse of `build_sd_mapping`."""
    from flax import nnx

    from cflearn_tpu.modules.multimodal.diffusion.ldm import StableDiffusion
    from cflearn_tpu.toolkit.tree import tree_to_npd
    from cflearn_tpu.zoo import convert as C

    model = StableDiffusion(version="v1", rngs=nnx.Rngs(0))
    npd = tree_to_npd(nnx.state(model, nnx.Param))
    mapping = C.build_sd_mapping("v1")
    orig = C.invert_mapping(mapping, npd)
    # deterministic unique values so swapped keys cannot cancel out
    for i, k in enumerate(sorted(orig)):
        a = orig[k]
        orig[k] = (np.arange(a.size, dtype=np.float64) * 1e-6 + i).reshape(a.shape).astype(np.float32)
    return orig


def original_to_cflearn(orig: dict, renames: dict) -> dict:
    """Synthesize a cflearn-layout checkpoint (the direction the reference's
    aligner produces) for the round-trip check."""
    cf = {}
    for ck, ok in renames.items():
        cf[ck] = orig[ok]
    cf[POS_KEY] = orig[HF_POS][None]
    i = 0
    while f"{HF_LAYERS}.{i}.self_attn.q_proj.weight" in orig:
        ws = [orig[f"{HF_LAYERS}.{i}.self_attn.{n}_proj.weight"] for n in "qkv"]
        bs = [orig[f"{HF_LAYERS}.{i}.self_attn.{n}_proj.bias"] for n in "qkv"]
        cf[f"{COND_BLOCKS}.{i}.token_mixing.net.in_w"] = np.concatenate(ws, 0)
        cf[f"{COND_BLOCKS}.{i}.token_mixing.net.qkv_bias"] = np.concatenate(bs, 0)
        i += 1
    return cf


def main() -> None:
    from cflearn_tpu.zoo import convert as C

    print("[1/4] instantiating the reference StableDiffusion (oracle)...", flush=True)
    ref_shapes = reference_sd_shapes()
    print(f"      {len(ref_shapes)} reference keys", flush=True)

    print("[2/4] building our model + synthetic original-layout dict...", flush=True)
    orig = our_original_layout()
    renames = C.build_sd_cflearn_renames("v1")
    print(f"      {len(orig)} original keys, {len(renames)} rename pairs", flush=True)

    print("[3/4] auditing the rename table against the oracle...", flush=True)
    errors = []
    for ck, ok in renames.items():
        if ck not in ref_shapes:
            errors.append(f"generated key missing from reference: {ck}")
        elif tuple(ref_shapes[ck]) != tuple(orig[ok].shape):
            errors.append(f"shape mismatch {ck} {ref_shapes[ck]} != {ok} {orig[ok].shape}")
    special = {POS_KEY}
    i = 0
    while f"{COND_BLOCKS}.{i}.token_mixing.net.in_w" in ref_shapes:
        special |= {
            f"{COND_BLOCKS}.{i}.token_mixing.net.in_w",
            f"{COND_BLOCKS}.{i}.token_mixing.net.qkv_bias",
        }
        i += 1
    uncovered = set(ref_shapes) - set(renames) - special - NON_CHECKPOINT_KEYS
    if uncovered:
        errors.append(f"uncovered reference keys: {sorted(uncovered)[:10]}")
    # specials: fused shapes must equal the concatenated original shapes
    for j in range(i):
        q = orig[f"{HF_LAYERS}.{j}.self_attn.q_proj.weight"].shape
        fused = ref_shapes[f"{COND_BLOCKS}.{j}.token_mixing.net.in_w"]
        if tuple(fused) != (3 * q[0], q[1]):
            errors.append(f"fused qkv shape mismatch at layer {j}: {fused} vs 3x{q}")
    if tuple(ref_shapes[POS_KEY])[1:] != tuple(orig[HF_POS].shape):
        errors.append("pos-encoding shape mismatch")
    if errors:
        for e in errors[:20]:
            print("  ERROR:", e)
        sys.exit(1)
    print("      audit clean: every rename shape-exact, coverage complete", flush=True)

    print("[4/4] numeric round trip: cflearn ckpt -> our npd == convert_sd(original)...", flush=True)
    cf_sd = original_to_cflearn(orig, renames)
    via_cflearn = C.convert_sd_cflearn(cf_sd)
    direct = C.convert_sd(orig)
    assert set(via_cflearn) == set(direct), (
        len(set(via_cflearn) - set(direct)),
        len(set(direct) - set(via_cflearn)),
    )
    for k in direct:
        np.testing.assert_array_equal(via_cflearn[k], direct[k], err_msg=k)
    print(f"      {len(direct)} converted tensors bit-identical", flush=True)

    artifact = {
        "comment": (
            "cflearn(reference torch layout) -> original-SD key renames for the "
            "re-hosted anime/dreamlike SD family. Derived structurally by "
            "cflearn_tpu.zoo.convert.build_sd_cflearn_renames and audited by "
            "scripts/gen_sd_cflearn_mapping.py against the reference model "
            "instantiated under scripts/_ref_oracle (key+shape exact). "
            "Specials (value transforms, handled by convert_sd_cflearn): "
            "token_mixing.net.in_w/qkv_bias = fused q/k/v projections; "
            "pos_encoding carries a leading broadcast dim; the listed "
            "non-checkpoint buffers are recomputed at init."
        ),
        "reference": "/root/reference/cflearn/scripts/sd.py:192-238",
        "renames": renames,
        "special_fused_qkv_layers": i,
        "non_checkpoint_keys": sorted(NON_CHECKPOINT_KEYS),
        "reference_shapes": {k: list(v) for k, v in ref_shapes.items()},
    }
    OUT_PATH.write_text(json.dumps(artifact, indent=1, sort_keys=True) + "\n")
    print(f"wrote {OUT_PATH} ({OUT_PATH.stat().st_size/1e6:.2f} MB)")


if __name__ == "__main__":
    main()
