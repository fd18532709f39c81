"""PyTorch → JAX checkpoint conversion (SD / CLIP / VAE / ESRGAN).

Parity: reference `cflearn/scripts/sd.py:272-332` (`convert`/`convert_v2`/
`inject`) — the original-SD → framework key mapping. Here the mapping is
declarative: `build_*_mapping` emits (torch_key, our_key, kind) triplets and
`apply_mapping` performs the tensor transforms:

* linear `weight` (out,in) → `kernel` (in,out);
* conv `weight` (O,I,kH,kW) → `kernel` (kH,kW,I,O)  [OIHW → HWIO];
* norm `weight` → `scale`;
* 1x1-conv-as-linear (VAE attention q/k/v) → squeezed linear kernel.

The mapping machinery is validated by an exact bidirectional round-trip test
(`tests/test_convert.py`) — no pretrained download needed.
"""

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

Triplet = Tuple[str, str, str]  # torch_key, our_key, kind


# ----------------------------------------------------------------------------
# transforms
# ----------------------------------------------------------------------------

def _fwd(kind: str, w: np.ndarray) -> np.ndarray:
    if kind.startswith("linear_") and kind[-1] in "qkv" and kind[-2] == "3":
        # fused qkv weight (3D, in) → one third, transposed (open_clip layout)
        third = w.shape[0] // 3
        i = "qkv".index(kind[-1])
        return np.ascontiguousarray(w[i * third : (i + 1) * third].T)
    if kind.startswith("bias_") and kind[-1] in "qkv" and kind[-2] == "3":
        third = w.shape[0] // 3
        i = "qkv".index(kind[-1])
        return np.asarray(w[i * third : (i + 1) * third])
    if kind == "linear":
        return np.ascontiguousarray(w.T)
    if kind == "conv":
        return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))
    if kind == "conv1x1_to_linear":
        return np.ascontiguousarray(w[:, :, 0, 0].T)
    if kind in ("bias", "norm", "copy"):
        return np.asarray(w)
    if kind == "embedding":
        return np.asarray(w)
    raise ValueError(kind)


def _inv(kind: str, w: np.ndarray) -> np.ndarray:
    if kind.startswith(("linear_", "bias_")) and kind[-2] == "3":
        raise ValueError("fused-qkv kinds are forward-only (inverse needs all three parts)")
    if kind == "linear":
        return np.ascontiguousarray(w.T)
    if kind == "conv":
        return np.ascontiguousarray(np.transpose(w, (3, 2, 0, 1)))
    if kind == "conv1x1_to_linear":
        return np.ascontiguousarray(w.T[:, :, None, None])
    if kind in ("bias", "norm", "copy", "embedding"):
        return np.asarray(w)
    raise ValueError(kind)


def apply_mapping(
    mapping: Sequence[Triplet],
    torch_sd: Dict[str, np.ndarray],
    *,
    strict: bool = True,
) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    missing = []
    for torch_key, our_key, kind in mapping:
        w = torch_sd.get(torch_key)
        if w is None:
            missing.append(torch_key)
            continue
        out[our_key] = _fwd(kind, np.asarray(w))
    if strict and missing:
        raise KeyError(f"{len(missing)} keys missing from torch state dict, e.g. {missing[:5]}")
    return out


def invert_mapping(
    mapping: Sequence[Triplet],
    npd: Dict[str, np.ndarray],
) -> Dict[str, np.ndarray]:
    """our npd → torch-style state dict (used for round-trip tests and for
    exporting back to PyTorch)."""
    out: Dict[str, np.ndarray] = {}
    for torch_key, our_key, kind in mapping:
        if our_key in npd:
            out[torch_key] = _inv(kind, npd[our_key])
    return out


# ----------------------------------------------------------------------------
# building blocks
# ----------------------------------------------------------------------------

def _linear(t: str, o: str) -> List[Triplet]:
    return [(f"{t}.weight", f"{o}/kernel/value", "linear"), (f"{t}.bias", f"{o}/bias/value", "bias")]


def _linear_nb(t: str, o: str) -> List[Triplet]:
    return [(f"{t}.weight", f"{o}/kernel/value", "linear")]


def _conv(t: str, o: str) -> List[Triplet]:
    return [(f"{t}.weight", f"{o}/kernel/value", "conv"), (f"{t}.bias", f"{o}/bias/value", "bias")]


def _norm(t: str, o: str) -> List[Triplet]:
    return [(f"{t}.weight", f"{o}/scale/value", "norm"), (f"{t}.bias", f"{o}/bias/value", "bias")]


def _attn_qkvo_1x1(t: str, o: str) -> List[Triplet]:
    """VAE attention: 1x1 convs in torch, linears here."""
    out: List[Triplet] = []
    for a, b in (("q", "to_q"), ("k", "to_k"), ("v", "to_v"), ("proj_out", "to_out")):
        out.append((f"{t}.{a}.weight", f"{o}/{b}/kernel/value", "conv1x1_to_linear"))
        out.append((f"{t}.{a}.bias", f"{o}/{b}/bias/value", "bias"))
    return out


# ----------------------------------------------------------------------------
# UNet
# ----------------------------------------------------------------------------

def _res_block(t: str, o: str, *, has_shortcut: bool) -> List[Triplet]:
    out = (
        _norm(f"{t}.in_layers.0", f"{o}/norm1")
        + _conv(f"{t}.in_layers.2", f"{o}/conv1")
        + _linear(f"{t}.emb_layers.1", f"{o}/time_proj")
        + _norm(f"{t}.out_layers.0", f"{o}/norm2")
        + _conv(f"{t}.out_layers.3", f"{o}/conv2")
    )
    if has_shortcut:
        out += _conv(f"{t}.skip_connection", f"{o}/shortcut")
    return out


def _transformer(t: str, o: str, *, num_layers: int, use_linear: bool) -> List[Triplet]:
    out = _norm(f"{t}.norm", f"{o}/norm")
    if use_linear:
        out += _linear(f"{t}.proj_in", f"{o}/proj_in")
        out += _linear(f"{t}.proj_out", f"{o}/proj_out")
    else:
        out += _conv(f"{t}.proj_in", f"{o}/proj_in")
        out += _conv(f"{t}.proj_out", f"{o}/proj_out")
    for m in range(num_layers):
        bt = f"{t}.transformer_blocks.{m}"
        bo = f"{o}/blocks/{m}"
        for attn in ("attn1", "attn2"):
            out += _linear_nb(f"{bt}.{attn}.to_q", f"{bo}/{attn}/to_q")
            out += _linear_nb(f"{bt}.{attn}.to_k", f"{bo}/{attn}/to_k")
            out += _linear_nb(f"{bt}.{attn}.to_v", f"{bo}/{attn}/to_v")
            out += _linear(f"{bt}.{attn}.to_out.0", f"{bo}/{attn}/to_out")
        out += _linear(f"{bt}.ff.net.0.proj", f"{bo}/ff/net1/net")
        out += _linear(f"{bt}.ff.net.2", f"{bo}/ff/linear2")
        out += _norm(f"{bt}.norm1", f"{bo}/norm1")
        out += _norm(f"{bt}.norm2", f"{bo}/norm2")
        out += _norm(f"{bt}.norm3", f"{bo}/norm3")
    return out


def build_unet_mapping(
    *,
    prefix: str = "model.diffusion_model",
    our_prefix: str = "unet",
    in_channels: int = 4,
    start_channels: int = 320,
    num_res_blocks: int = 2,
    channel_multipliers: Sequence[int] = (1, 2, 4, 4),
    attention_downsample_rates: Sequence[int] = (1, 2, 4),
    num_transformer_layers: int = 1,
    use_linear_in_transformer: bool = False,
) -> List[Triplet]:
    """Mirror `UNetDiffuser.__init__`'s block construction exactly."""
    t, o = prefix, our_prefix
    out: List[Triplet] = []
    out += _linear(f"{t}.time_embed.0", f"{o}/time_fc1")
    out += _linear(f"{t}.time_embed.2", f"{o}/time_fc2")
    out += _conv(f"{t}.input_blocks.0.0", f"{o}/conv_in")

    ch = start_channels
    ds = 1
    sd_idx = 1  # sd input_blocks.0 is conv_in
    our_idx = 0
    for level, mult in enumerate(channel_multipliers):
        for _ in range(num_res_blocks):
            out_ch = start_channels * mult
            tb = f"{t}.input_blocks.{sd_idx}"
            ob = f"{o}/input_blocks/{our_idx}/mods"
            out += _res_block(f"{tb}.0", f"{ob}/0", has_shortcut=ch != out_ch)
            ch = out_ch
            if ds in attention_downsample_rates:
                out += _transformer(
                    f"{tb}.1", f"{ob}/1", num_layers=num_transformer_layers, use_linear=use_linear_in_transformer
                )
            sd_idx += 1
            our_idx += 1
        if level != len(channel_multipliers) - 1:
            out += _conv(f"{t}.input_blocks.{sd_idx}.0.op", f"{o}/input_blocks/{our_idx}/mods/0/conv")
            sd_idx += 1
            our_idx += 1
            ds *= 2

    out += _res_block(f"{t}.middle_block.0", f"{o}/mid/mods/0", has_shortcut=False)
    out += _transformer(
        f"{t}.middle_block.1", f"{o}/mid/mods/1", num_layers=num_transformer_layers, use_linear=use_linear_in_transformer
    )
    out += _res_block(f"{t}.middle_block.2", f"{o}/mid/mods/2", has_shortcut=False)

    # output blocks (skip-concat input → every res block has a shortcut)
    our_idx = 0
    for level, mult in reversed(list(enumerate(channel_multipliers))):
        for i in range(num_res_blocks + 1):
            tb = f"{t}.output_blocks.{our_idx}"
            ob = f"{o}/output_blocks/{our_idx}/mods"
            out += _res_block(f"{tb}.0", f"{ob}/0", has_shortcut=True)
            sub = 1
            if ds in attention_downsample_rates:
                out += _transformer(
                    f"{tb}.{sub}", f"{ob}/{sub}", num_layers=num_transformer_layers, use_linear=use_linear_in_transformer
                )
                sub += 1
            if level != 0 and i == num_res_blocks:
                out += _conv(f"{tb}.{sub}.conv", f"{ob}/{sub}/conv/conv")
                ds //= 2
            our_idx += 1

    out += _norm(f"{t}.out.0", f"{o}/norm_out")
    out += _conv(f"{t}.out.2", f"{o}/conv_out")
    return out


# ----------------------------------------------------------------------------
# VAE (first stage)
# ----------------------------------------------------------------------------

def _vae_res(t: str, o: str, *, has_shortcut: bool) -> List[Triplet]:
    out = (
        _norm(f"{t}.norm1", f"{o}/norm1")
        + _conv(f"{t}.conv1", f"{o}/conv1")
        + _norm(f"{t}.norm2", f"{o}/norm2")
        + _conv(f"{t}.conv2", f"{o}/conv2")
    )
    if has_shortcut:
        out += _conv(f"{t}.nin_shortcut", f"{o}/shortcut")
    return out


def _vae_attn(t: str, o: str) -> List[Triplet]:
    return _norm(f"{t}.norm", f"{o}/norm") + _attn_qkvo_1x1(t, o)


def build_vae_mapping(
    *,
    prefix: str = "first_stage_model",
    our_prefix: str = "first_stage",
    inner_channels: int = 128,
    z_channels: int = 4,
    embedding_channels: int = 4,
    channel_multipliers: Sequence[int] = (1, 2, 4, 4),
    num_res_blocks: int = 2,
    attention_resolutions: Sequence[int] = (),
    img_size: int = 256,
) -> List[Triplet]:
    t, o = prefix, our_prefix
    out: List[Triplet] = []
    # encoder
    out += _conv(f"{t}.encoder.conv_in", f"{o}/encoder/conv_in")
    ch = inner_channels
    flat = 0
    resolution = img_size
    for i, mult in enumerate(channel_multipliers):
        out_ch = inner_channels * mult
        for j in range(num_res_blocks):
            out += _vae_res(
                f"{t}.encoder.down.{i}.block.{j}",
                f"{o}/encoder/blocks/{flat}",
                has_shortcut=ch != out_ch,
            )
            ch = out_ch
            flat += 1
            if resolution in attention_resolutions:
                out += _vae_attn(f"{t}.encoder.down.{i}.attn.{j}", f"{o}/encoder/blocks/{flat}")
                flat += 1
        if i != len(channel_multipliers) - 1:
            out += _conv(f"{t}.encoder.down.{i}.downsample.conv", f"{o}/encoder/blocks/{flat}/conv")
            flat += 1
            resolution //= 2
    out += _vae_res(f"{t}.encoder.mid.block_1", f"{o}/encoder/mid_res1", has_shortcut=False)
    out += _vae_attn(f"{t}.encoder.mid.attn_1", f"{o}/encoder/mid_attn")
    out += _vae_res(f"{t}.encoder.mid.block_2", f"{o}/encoder/mid_res2", has_shortcut=False)
    out += _norm(f"{t}.encoder.norm_out", f"{o}/encoder/norm_out")
    out += _conv(f"{t}.encoder.conv_out", f"{o}/encoder/conv_out")
    # quant convs
    out += _conv(f"{t}.quant_conv", f"{o}/to_embedding")
    out += _conv(f"{t}.post_quant_conv", f"{o}/from_embedding")
    # decoder
    out += _conv(f"{t}.decoder.conv_in", f"{o}/decoder/conv_in")
    out += _vae_res(f"{t}.decoder.mid.block_1", f"{o}/decoder/mid_res1", has_shortcut=False)
    out += _vae_attn(f"{t}.decoder.mid.attn_1", f"{o}/decoder/mid_attn")
    out += _vae_res(f"{t}.decoder.mid.block_2", f"{o}/decoder/mid_res2", has_shortcut=False)
    ch = inner_channels * channel_multipliers[-1]
    flat = 0
    resolution = img_size // (2 ** (len(channel_multipliers) - 1))
    for i, mult in reversed(list(enumerate(channel_multipliers))):
        out_ch = inner_channels * mult
        for j in range(num_res_blocks + 1):
            out += _vae_res(
                f"{t}.decoder.up.{i}.block.{j}",
                f"{o}/decoder/blocks/{flat}",
                has_shortcut=ch != out_ch,
            )
            ch = out_ch
            flat += 1
            if resolution in attention_resolutions:
                out += _vae_attn(f"{t}.decoder.up.{i}.attn.{j}", f"{o}/decoder/blocks/{flat}")
                flat += 1
        if i != 0:
            out += _conv(f"{t}.decoder.up.{i}.upsample.conv", f"{o}/decoder/blocks/{flat}/conv/conv")
            flat += 1
            resolution *= 2
    out += _norm(f"{t}.decoder.norm_out", f"{o}/decoder/norm_out")
    out += _conv(f"{t}.decoder.conv_out", f"{o}/decoder/conv_out")
    return out


# ----------------------------------------------------------------------------
# CLIP text (HF CLIPTextModel layout, used by SD v1)
# ----------------------------------------------------------------------------

def build_clip_text_mapping(
    *,
    prefix: str = "cond_stage_model.transformer.text_model",
    our_prefix: str = "condition_model/encoder",
    num_layers: int = 12,
) -> List[Triplet]:
    t, o = prefix, our_prefix
    out: List[Triplet] = [
        (f"{t}.embeddings.token_embedding.weight", f"{o}/token_embedding/embedding/value", "embedding"),
        (f"{t}.embeddings.position_embedding.weight", f"{o}/positional_embedding/value", "embedding"),
    ]
    for n in range(num_layers):
        lt = f"{t}.encoder.layers.{n}"
        lo = f"{o}/blocks/{n}"
        out += _norm(f"{lt}.layer_norm1", f"{lo}/ln_1")
        out += _norm(f"{lt}.layer_norm2", f"{lo}/ln_2")
        for p in ("q", "k", "v"):
            out += _linear(f"{lt}.self_attn.{p}_proj", f"{lo}/attn/{p}_proj")
        out += _linear(f"{lt}.self_attn.out_proj", f"{lo}/attn/out_proj")
        out += _linear(f"{lt}.mlp.fc1", f"{lo}/mlp/fc1")
        out += _linear(f"{lt}.mlp.fc2", f"{lo}/mlp/fc2")
    out += _norm(f"{t}.final_layer_norm", f"{o}/ln_final")
    return out


def build_open_clip_text_mapping(
    *,
    prefix: str = "cond_stage_model.model",
    our_prefix: str = "condition_model/encoder",
    num_layers: int = 23,
) -> List[Triplet]:
    """SD v2's open_clip text tower (`transformer.resblocks.N` layout with
    fused `attn.in_proj_weight`)."""
    t, o = prefix, our_prefix
    out: List[Triplet] = [
        (f"{t}.token_embedding.weight", f"{o}/token_embedding/embedding/value", "embedding"),
        (f"{t}.positional_embedding", f"{o}/positional_embedding/value", "embedding"),
    ]
    for n in range(num_layers):
        lt = f"{t}.transformer.resblocks.{n}"
        lo = f"{o}/blocks/{n}"
        out += _norm(f"{lt}.ln_1", f"{lo}/ln_1")
        out += _norm(f"{lt}.ln_2", f"{lo}/ln_2")
        for p in "qkv":
            out.append((f"{lt}.attn.in_proj_weight", f"{lo}/attn/{p}_proj/kernel/value", f"linear_3{p}"))
            out.append((f"{lt}.attn.in_proj_bias", f"{lo}/attn/{p}_proj/bias/value", f"bias_3{p}"))
        out += _linear(f"{lt}.attn.out_proj", f"{lo}/attn/out_proj")
        out += _linear(f"{lt}.mlp.c_fc", f"{lo}/mlp/fc1")
        out += _linear(f"{lt}.mlp.c_proj", f"{lo}/mlp/fc2")
    out += _norm(f"{t}.ln_final", f"{o}/ln_final")
    return out


# ----------------------------------------------------------------------------
# ESRGAN (RRDBNet)
# ----------------------------------------------------------------------------

def build_esrgan_mapping(*, num_blocks: int = 23, our_prefix: str = "") -> List[Triplet]:
    o = our_prefix
    p = f"{o}/" if o else ""
    out: List[Triplet] = []
    out += _conv("conv_first", f"{p}conv_first")
    for b in range(num_blocks):
        for d in range(3):
            tb = f"body.{b}.rdb{d+1}"
            ob = f"{p}body/{b}/dense_blocks/{d}"
            for c in range(4):
                out += _conv(f"{tb}.conv{c+1}", f"{ob}/convs/{c}")
            out += _conv(f"{tb}.conv5", f"{ob}/conv_out")
    for name in ("conv_body", "conv_up1", "conv_up2", "conv_hr", "conv_last"):
        out += _conv(name, f"{p}{name}")
    return out


# ----------------------------------------------------------------------------
# full SD checkpoint
# ----------------------------------------------------------------------------

def build_sd_mapping(version: str = "v1") -> List[Triplet]:
    """Original-SD (CompVis-layout) checkpoint → our `StableDiffusion` npd."""
    use_linear = version.startswith("v2")
    unet = build_unet_mapping(
        use_linear_in_transformer=use_linear,
    )
    vae = build_vae_mapping()
    if version.startswith("v2"):
        clip: List[Triplet] = build_open_clip_text_mapping(num_layers=23)
    else:
        clip = build_clip_text_mapping()
    return unet + vae + clip


def convert_sd(torch_sd: Dict[str, np.ndarray], *, version: str = "v1", strict: bool = False) -> Dict[str, np.ndarray]:
    mapping = build_sd_mapping(version)
    return apply_mapping(mapping, torch_sd, strict=strict)


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a .ckpt/.pt (pickle) or .safetensors checkpoint into numpy."""
    if str(path).endswith(".safetensors"):
        from safetensors import safe_open  # type: ignore

        out: Dict[str, np.ndarray] = {}
        with safe_open(path, framework="np") as f:  # type: ignore[arg-type]
            for k in f.keys():
                out[k] = f.get_tensor(k)
        return out
    import torch  # CPU wheel is available

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in sd.items()}


# ----------------------------------------------------------------------------
# reference (cflearn) torch layout -> original-SD layout
# ----------------------------------------------------------------------------
#
# The reference re-hosts part of the SD family (the anime/dreamlike models)
# as checkpoints in ITS OWN torch layout — produced by its order-based
# aligner (`/root/reference/cflearn/scripts/sd.py:192-238`) from original-SD
# checkpoints. To load them we derive the inverse correspondence
# structurally: every cflearn key is a pure RENAME of an original-SD key
# (validated key-by-key, shape-by-shape against the reference model
# instantiated under `scripts/_ref_oracle` by
# `scripts/gen_sd_cflearn_mapping.py`, which commits the audited table to
# `zoo/sd_cflearn_mapping.json`), except three cond-stage specials handled
# in `convert_sd_cflearn`:
#   * fused attention `in_w`/`qkv_bias`  -> split into q/k/v projections,
#   * `pos_encoding` [1, 77, d]          -> position_embedding [77, d],
#   * model-constant buffers (logit_scale, attention_mask, text_projection,
#     noise-schedule buffers) -> dropped (recomputed at init).

_CF_UNET_RENAMES = [
    (".in_layers.0.", ".norm1."),
    (".in_layers.2.", ".conv1."),
    (".emb_layers.1.", ".time_embedding."),
    (".out_layers.0.", ".norm2."),
    (".out_layers.3.", ".conv2."),
    (".skip_connection.", ".shortcut."),
    (".op.", ".net."),  # Downsample
    (".proj_in.", ".to_latent."),
    (".proj_out.", ".from_latent."),
    (".transformer_blocks.", ".blocks."),
    (".to_out.0.", ".out_linear.0."),
    (".ff.net.0.proj.", ".ff.net.0.net."),
    (".ff.net.2.", ".ff.net.2.linear."),
]

_CF_VAE_RES = [("nin_shortcut", "shortcut")]
_CF_VAE_ATTN = [
    ("norm", "group_norm"),
    ("q", "to_q"),
    ("k", "to_k"),
    ("v", "to_v"),
    ("proj_out", "to_out"),
]


def _cf_unet_key(orig: str) -> str:
    """original `model.diffusion_model.X` -> cflearn `unet.X'`."""
    k = orig[len("model.diffusion_model."):]
    if k.startswith("time_embed."):
        k = "time_embedding." + k[len("time_embed."):]
    elif k.startswith("middle_block."):
        k = "residual." + k[len("middle_block."):]
    elif k.startswith("out."):
        k = "head." + k[len("out."):]
    for a, b in _CF_UNET_RENAMES:
        k = k.replace(a, b)
    return "unet." + k


def _cf_vae_inner(tail: str, table: List[Tuple[str, str]]) -> str:
    mod, _, param = tail.rpartition(".")
    for a, b in table:
        if mod == a:
            return f"{b}.{param}"
    return tail


def _cf_vae_key(
    orig: str,
    *,
    num_levels: int = 4,
    enc_blocks: int = 2,
    dec_blocks: int = 3,
) -> str:
    """original `first_stage_model.X` -> cflearn `first_stage.X'` (SD f8
    geometry: no per-level attention; the cflearn encoder/decoder are FLAT
    module lists interleaving resblocks and down/upsamples, activations
    holding gaps in the numbering)."""
    k = orig[len("first_stage_model."):]
    if k.startswith("quant_conv."):
        return "first_stage.to_embedding." + k.rpartition(".")[2]
    if k.startswith("post_quant_conv."):
        return "first_stage.from_embedding." + k.rpartition(".")[2]
    side, _, rest = k.partition(".")
    p = f"first_stage.generator.{side}.{side}"
    enc_stride = enc_blocks + 1  # blocks + downsample per level
    dec_stride = dec_blocks + 1  # blocks + upsample per level
    enc_mid = 1 + (num_levels - 1) * enc_stride + enc_blocks
    if side == "encoder":
        if rest.startswith("conv_in."):
            return f"{p}.0.{rest.rpartition('.')[2]}"
        if rest.startswith("down."):
            _, lvl, kind, idx_or_conv, *tail = rest.split(".")
            base = 1 + int(lvl) * enc_stride
            if kind == "block":
                inner = _cf_vae_inner(".".join(tail), _CF_VAE_RES)
                return f"{p}.{base + int(idx_or_conv)}.{inner}"
            # downsample.conv.*
            return f"{p}.{base + enc_blocks}.conv.{tail[-1]}"
        if rest.startswith("mid."):
            _, which, *tail = rest.split(".")
            off = {"block_1": 0, "attn_1": 1, "block_2": 2}[which]
            table = _CF_VAE_ATTN if which == "attn_1" else _CF_VAE_RES
            return f"{p}.{enc_mid + off}.{_cf_vae_inner('.'.join(tail), table)}"
        if rest.startswith("norm_out."):
            return f"{p}.{enc_mid + 3}.{rest.rpartition('.')[2]}"
        if rest.startswith("conv_out."):  # +4 is the activation (no params)
            return f"{p}.{enc_mid + 5}.{rest.rpartition('.')[2]}"
    if side == "decoder":
        if rest.startswith("conv_in."):
            return f"{p}.0.{rest.rpartition('.')[2]}"
        if rest.startswith("mid."):
            _, which, *tail = rest.split(".")
            off = {"block_1": 1, "attn_1": 2, "block_2": 3}[which]
            table = _CF_VAE_ATTN if which == "attn_1" else _CF_VAE_RES
            return f"{p}.{off}.{_cf_vae_inner('.'.join(tail), table)}"
        if rest.startswith("up."):
            # original indexes up.{L} bottom-of-list-first (L=num_levels-1
            # runs first); the cflearn decoder is flat in RUN order
            _, lvl, kind, idx_or_conv, *tail = rest.split(".")
            base = 4 + (num_levels - 1 - int(lvl)) * dec_stride
            if kind == "block":
                inner = _cf_vae_inner(".".join(tail), _CF_VAE_RES)
                return f"{p}.{base + int(idx_or_conv)}.{inner}"
            # upsample.conv.*
            return f"{p}.{base + dec_blocks}.conv.{tail[-1]}"
        if rest.startswith("norm_out."):
            return f"first_stage.generator.decoder.head.0.{rest.rpartition('.')[2]}"
        if rest.startswith("conv_out."):
            return f"first_stage.generator.decoder.head.2.{rest.rpartition('.')[2]}"
    raise ValueError(f"unmapped VAE key: {orig}")


_CF_COND_PREFIX = "condition_model.m"
_CF_COND_BLOCKS = f"{_CF_COND_PREFIX}.text_transformer.encoder.mixing_blocks"
_CF_COND_INNER = [
    ("layer_norm1", "token_norm"),
    ("layer_norm2", "channel_norm"),
    ("self_attn.out_proj", "token_mixing.net.out_linear.linear"),
    ("mlp.fc1", "channel_mixing.net.0.linear"),
    ("mlp.fc2", "channel_mixing.net.3.linear"),
]


def _cf_cond_key(orig: str) -> Optional[str]:
    """original HF-CLIPText `cond_stage_model.X` -> cflearn key, or None for
    the fused-qkv / pos-embedding specials."""
    k = orig[len("cond_stage_model.transformer.text_model."):]
    if k == "embeddings.token_embedding.weight":
        return f"{_CF_COND_PREFIX}.token_embedding.weight"
    if k == "embeddings.position_embedding.weight":
        return None  # special: pos_encoding carries a leading broadcast dim
    if k.startswith("final_layer_norm."):
        param = k.rpartition(".")[2]
        return f"{_CF_COND_PREFIX}.text_transformer.encoder.head.norms.0.{param}"
    if k.startswith("encoder.layers."):
        _, _, idx, *rest = k.split(".")
        tail = ".".join(rest)
        mod, _, param = tail.rpartition(".")
        if mod.startswith("self_attn.") and mod.split(".")[1] in ("q_proj", "k_proj", "v_proj"):
            return None  # special: fused into in_w / qkv_bias
        for a, b in _CF_COND_INNER:
            if mod == a:
                return f"{_CF_COND_BLOCKS}.{idx}.{b}.{param}"
    raise ValueError(f"unmapped cond key: {orig}")


def build_sd_cflearn_renames(version: str = "v1") -> Dict[str, str]:
    """{cflearn_key: original_sd_key} for every pure-rename pair of the SD
    checkpoint (the fused-qkv and pos-embedding specials are value
    transforms, handled by `convert_sd_cflearn`). Generated structurally
    from the same geometry as `build_sd_mapping`; audited against the
    reference model by `scripts/gen_sd_cflearn_mapping.py`."""
    if not version.startswith("v1"):
        raise ValueError(
            "cflearn-layout checkpoints are only published for the SD-v1 "
            f"family (got version={version!r})"
        )
    renames: Dict[str, str] = {}
    for orig, _, _ in build_sd_mapping("v1"):
        if orig.startswith("model.diffusion_model."):
            ck = _cf_unet_key(orig)
        elif orig.startswith("first_stage_model."):
            ck = _cf_vae_key(orig)
        elif orig.startswith("cond_stage_model."):
            ck = _cf_cond_key(orig)
            if ck is None:
                continue
        else:
            continue
        if ck in renames:
            raise ValueError(f"duplicate cflearn key {ck} ({orig} vs {renames[ck]})")
        renames[ck] = orig
    return renames


def cflearn_sd_to_original(torch_sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """cflearn-layout SD state dict -> original-SD layout (renames + the
    cond-stage value specials). Unknown keys (noise-schedule buffers,
    logit_scale, attention_mask, text_projection, EMA leftovers) are
    dropped — they are model constants recomputed at init."""
    renames = build_sd_cflearn_renames()
    orig: Dict[str, np.ndarray] = {}
    for ck, ok in renames.items():
        if ck in torch_sd:
            orig[ok] = np.asarray(torch_sd[ck])
    pos = torch_sd.get(f"{_CF_COND_PREFIX}.text_transformer.encoder.pos_encoding.pos_encoding")
    if pos is not None:
        pos = np.asarray(pos)
        orig["cond_stage_model.transformer.text_model.embeddings.position_embedding.weight"] = pos[0]
    i = 0
    hf = "cond_stage_model.transformer.text_model.encoder.layers"
    while f"{_CF_COND_BLOCKS}.{i}.token_mixing.net.in_w" in torch_sd:
        in_w = np.asarray(torch_sd[f"{_CF_COND_BLOCKS}.{i}.token_mixing.net.in_w"])
        qkv_b = np.asarray(torch_sd[f"{_CF_COND_BLOCKS}.{i}.token_mixing.net.qkv_bias"])
        third = in_w.shape[0] // 3
        for j, n in enumerate("qkv"):
            orig[f"{hf}.{i}.self_attn.{n}_proj.weight"] = in_w[j * third : (j + 1) * third]
            orig[f"{hf}.{i}.self_attn.{n}_proj.bias"] = qkv_b[j * third : (j + 1) * third]
        i += 1
    return orig


def convert_sd_cflearn(
    torch_sd: Dict[str, np.ndarray], *, version: str = "v1", strict: bool = False
) -> Dict[str, np.ndarray]:
    """Convert a reference-hosted cflearn-layout SD checkpoint (the anime/
    dreamlike family) to our npd: cflearn layout -> original-SD layout ->
    `convert_sd`."""
    return convert_sd(cflearn_sd_to_original(torch_sd), version=version, strict=strict)
