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

from typing import Any, Dict, List, Optional, Sequence, Tuple

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
