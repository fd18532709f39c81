"""Zoo: JSON presets + pretrained loading.

Parity: reference `cflearn/zoo/common.py:18-111` — `load_module(config,
pretrained=...)` = parse JSON preset → `build_module` → download checkpoint +
sha verify + load states; presets under `zoo/configs/**.json`; checkpoint
index `zoo/available.json` (sha + size + HF URL); named ctors in
`zoo/__init__.py:17-205`.

TPU-native: pretrained checkpoints are original PyTorch artifacts converted
through `cflearn_tpu.zoo.convert` at load time (the reference ships
pre-converted torch checkpoints; we convert in-flight and cache the npd).
"""

import json
from pathlib import Path
from typing import Any, Dict, Optional

import numpy as np
from flax import nnx

from ..modules.common import build_module
from ..parameters import OPT
from ..toolkit.misc import download
from ..toolkit.tree import npd_to_tree

CONFIGS_DIR = Path(__file__).parent / "configs"
AVAILABLE_FILE = Path(__file__).parent / "available.json"


def parse_config(config: str) -> Dict[str, Any]:
    """`"ae/kl.f8"` → configs/ae/kl.json with tag "f8" applied."""
    if "." in config.split("/")[-1]:
        path_part, _, tag = config.rpartition(".")
    else:
        path_part, tag = config, "default"
    json_path = CONFIGS_DIR / f"{path_part}.json"
    if not json_path.is_file():
        raise ValueError(f"no zoo preset at '{json_path}'")
    with open(json_path, "r") as f:
        preset = json.load(f)
    base = dict(preset.get("__base__", {}))
    tags = preset.get("tags", {})
    if tag != "default" and tag not in tags:
        raise ValueError(f"tag '{tag}' not found in preset '{path_part}' (available: {sorted(tags)})")
    tag_cfg = dict(tags.get(tag, {}))
    # a tag may replace the base entirely and/or select a different module
    # (reference keeps per-tag json files, e.g. `diffusion/ldm/{sd,vq}.json`;
    # here tags live in one file so these two escape hatches cover the same)
    if tag_cfg.pop("__replace__", False):
        base = {}
    module_override = tag_cfg.pop("__module__", None)
    base.update(tag_cfg)
    base["__module__"] = module_override or preset["module"]
    base["__converter__"] = preset.get("converter")
    base["__download__"] = preset.get("download", {}).get(tag) or preset.get("download", {}).get("default")
    return base


def get_available() -> Dict[str, Any]:
    if AVAILABLE_FILE.is_file():
        with open(AVAILABLE_FILE, "r") as f:
            return json.load(f)
    return {}


def _npd_cache_path(tag: str) -> Path:
    folder = Path(OPT.cache_dir) / "converted"
    folder.mkdir(parents=True, exist_ok=True)
    return folder / f"{tag}.npz"


def resolve_download(entry: Any) -> Dict[str, Any]:
    """Resolve a preset `download` value: either an inline dict or the name
    of a checkpoint in `available.json` (sha-verified when recorded)."""
    if isinstance(entry, str):
        index = get_available().get("checkpoints", {})
        if entry not in index:
            raise ValueError(f"'{entry}' is not in the checkpoint index")
        info = dict(index[entry])
        info.setdefault("tag", entry)
        return info
    return dict(entry)


def load_states(download_info: Any, converter: Optional[str], converter_kwargs: Optional[Dict[str, Any]] = None) -> Dict[str, np.ndarray]:
    """Download (or find cached) torch checkpoint, convert, cache npd."""
    download_info = resolve_download(download_info)
    converter = download_info.get("converter", converter)
    if download_info.get("layout") == "cflearn":
        # the reference's re-hosted cflearn-layout SD family (anime/
        # dreamlike): convert through the audited cflearn->original rename
        # table (zoo/sd_cflearn_mapping.json, derived+validated by
        # scripts/gen_sd_cflearn_mapping.py) and the regular SD converter
        if converter not in (None, "sd", "sd_cflearn"):
            raise ValueError(
                f"cflearn-layout entries use the SD converter, got {converter!r}"
            )
        converter = "sd_cflearn"
    tag = download_info.get("tag") or download_info["url"].split("/")[-1]
    cache = _npd_cache_path(tag)
    if cache.is_file():
        with np.load(cache, allow_pickle=False) as z:
            return {k: z[k] for k in z.files}
    path = download(
        download_info["url"],
        name=download_info.get("name"),
        sha=download_info.get("sha"),
        sha_prefix=download_info.get("sha_prefix"),
        min_size=download_info.get("min_size"),
    )
    from . import convert as C

    torch_sd = C.load_torch_state_dict(str(path))
    kwargs = converter_kwargs or {}
    if converter == "sd":
        npd = C.convert_sd(torch_sd, **kwargs)
    elif converter == "sd_cflearn":
        npd = C.convert_sd_cflearn(torch_sd, **kwargs)
    elif converter == "sd_v2":
        npd = C.convert_sd(torch_sd, version="v2", **kwargs)
    elif converter == "esrgan":
        npd = C.apply_mapping(C.build_esrgan_mapping(**kwargs), torch_sd, strict=False)
    elif converter == "clip_text":
        npd = C.apply_mapping(C.build_clip_text_mapping(**kwargs), torch_sd, strict=False)
    elif converter == "vae":
        npd = C.apply_mapping(C.build_vae_mapping(**kwargs), torch_sd, strict=False)
    elif converter == "controlnet":
        from ..scripts.sd import convert_controlnet_sd

        npd = convert_controlnet_sd(torch_sd, **kwargs)
    elif converter == "hed":
        from ..api.cv.third_party.hed import convert_hed

        npd = convert_hed(torch_sd)
    elif converter == "mlsd":
        from ..api.cv.third_party.mlsd import convert_mlsd

        npd = convert_mlsd(torch_sd)
    elif converter == "midas":
        from ..api.cv.third_party.midas import convert_midas

        npd = convert_midas(torch_sd)
    elif converter == "pidi":
        from ..api.cv.third_party.pidi import convert_pidi

        npd = convert_pidi(torch_sd)
    elif converter == "openpose":
        from ..api.cv.third_party.openpose import convert_openpose

        npd = convert_openpose(torch_sd)
    elif converter == "vgg16":
        from ..losses.lpips import convert_vgg16

        npd = convert_vgg16(torch_sd)
    elif converter == "lpips":
        from ..losses.lpips import convert_lpips

        npd = convert_lpips(torch_sd)
    elif converter == "lama":
        from ..api.cv.third_party.lama import convert_lama

        npd = convert_lama(torch_sd)
    elif converter == "isnet":
        from ..api.cv.third_party.isnet import convert_isnet

        npd = convert_isnet(torch_sd)
    elif converter == "iharm":
        from ..api.cv.third_party.iharm import convert_iharm

        npd = convert_iharm(torch_sd)
    else:
        npd = {k: np.asarray(v) for k, v in torch_sd.items()}
    np.savez_compressed(cache, **npd)
    return npd


def load_module(
    config: str,
    *,
    pretrained: bool = False,
    tag: Optional[str] = None,
    rngs: Optional[nnx.Rngs] = None,
    **kwargs: Any,
) -> nnx.Module:
    """Build (and optionally load pretrained states into) a zoo module.
    `tag` overrides the checkpoint-index entry the preset would use
    (reference `zoo/common.py` load_module's `tag` argument)."""
    parsed = parse_config(config)
    module_name = parsed.pop("__module__")
    converter = parsed.pop("__converter__", None)
    download_info = parsed.pop("__download__", None)
    if tag is not None:
        download_info = tag
    parsed.update(kwargs)
    module = build_module(module_name, config=parsed, rngs=rngs or nnx.Rngs(0))
    if pretrained:
        if download_info is None:
            raise ValueError(f"no pretrained checkpoint is registered for '{config}'")
        npd = load_states(download_info, converter)
        state = nnx.state(module)
        nnx.update(module, npd_to_tree(npd, state, strict=False))
    return module


def load_sd(version: str = "v1", *, pretrained: bool = False, rngs: Optional[nnx.Rngs] = None) -> Any:
    """SD constructor (reference `zoo/__init__.py:139` `ldm_sd`)."""
    from ..modules.multimodal.diffusion.ldm import StableDiffusion, StableDiffusionInpainting

    rngs = rngs or nnx.Rngs(0)
    # community finetune tags (anime*/dreamlike, reference SDVersions) are
    # SD-1.5 architecture with swapped weights
    arch = "v1" if (version.startswith("anime") or version.startswith("dreamlike") or version == "v1.5") else version
    if version.endswith("_inpainting"):
        m = StableDiffusionInpainting(rngs=rngs, version=arch.replace("_inpainting", ""))
    else:
        m = StableDiffusion(version=arch, rngs=rngs)
    if pretrained:
        entry = {
            "v1": "sd_v1.5",
            "v1.5": "sd_v1.5",
            "v1_inpainting": "sd_v1.5_inpainting",
            "v2": "sd_v2.1",
            "v2_v": "sd_v2.1",
            "v2_base": "sd_v2_base",
            "anime": "cflearn_ldm_sd_anime_nai",
            "anime_anything": "cflearn_ldm_sd_anime_anything",
            "anime_hybrid": "cflearn_ldm_sd_anime_hybrid",
            "anime_guofeng": "cflearn_ldm_sd_anime_guofeng",
            "anime_orange": "cflearn_ldm_sd_anime_orange",
            "dreamlike_v1": "cflearn_ldm_sd_dreamlike",
        }.get(version)
        if entry is None or entry not in get_available().get("checkpoints", {}):
            raise ValueError(f"no pretrained checkpoint registered for sd {version}")
        npd = load_states(entry, "sd_v2" if version.startswith("v2") else "sd")
        state = nnx.state(m)
        nnx.update(m, npd_to_tree(npd, state, strict=False))
    return m


def load_control_net(
    hint: str,
    *,
    pretrained: bool = False,
    rngs: Optional[nnx.Rngs] = None,
) -> Any:
    """SD-1.5-scale ControlNet for a v1.1 hint type (reference
    `api/multimodal/diffusion.py:1760` pulls these from its zoo by tag).
    Hints with indexed checkpoints: canny/depth/mlsd/softedge/pose."""
    from ..modules.multimodal.diffusion.ldm import sd_unet_config
    from ..modules.multimodal.diffusion.unet import ControlNet

    cfg = dict(sd_unet_config("v1"))
    cfg.pop("out_channels", None)  # the control branch has no output head
    m = ControlNet(hint_channels=3, rngs=rngs or nnx.Rngs(0), **cfg)
    if pretrained:
        entry = f"controlnet_v11_{hint}"
        if entry not in get_available().get("checkpoints", {}):
            raise ValueError(f"no pretrained ControlNet registered for hint '{hint}'")
        npd = load_states(entry, "controlnet")
        state = nnx.state(m)
        nnx.update(m, npd_to_tree(npd, state, strict=False))
    return m


# named constructors (reference `zoo/__init__.py:17-205`)

def esr(pretrained: bool = False, **kwargs: Any) -> nnx.Module:
    return load_module("sr/esr", pretrained=pretrained, **kwargs)


def esr_anime(pretrained: bool = False, **kwargs: Any) -> nnx.Module:
    return load_module("sr/esr.anime", pretrained=pretrained, **kwargs)


def clip(pretrained: bool = False, **kwargs: Any) -> nnx.Module:
    return load_module("multimodal/clip", pretrained=pretrained, **kwargs)


def clip_large(pretrained: bool = False, **kwargs: Any) -> nnx.Module:
    return load_module("multimodal/clip.large", pretrained=pretrained, **kwargs)


def chinese_clip(pretrained: bool = False, **kwargs: Any) -> nnx.Module:
    """ChineseCLIP (reference `zoo/__init__.py:32`): ViT-L/14 vision +
    Chinese-BERT text tower; tokenizer = `chinese_clip` (HF-backed). The
    reference's pretrained re-host is cflearn-layout (provenance entries in
    available.json) — build with `pretrained=False` and load converted
    weights via `zoo.convert` mappings."""
    if pretrained:
        raise ValueError(
            "chinese_clip pretrained weights are only re-hosted in the "
            "reference's cflearn layout; convert an upstream checkpoint and "
            "load it explicitly"
        )
    from ..modules.common import build_module

    rngs = kwargs.pop("rngs", None) or nnx.Rngs(0)
    return build_module("clip.chinese", config=kwargs, rngs=rngs)


def open_clip_ViT_H_14(pretrained: bool = False, **kwargs: Any) -> nnx.Module:
    """open_clip ViT-H/14 geometry (reference `zoo/__init__.py:36`). The
    reference's pretrained re-host is cflearn-layout (see available.json
    provenance entries); `pretrained=True` needs an original open_clip
    checkpoint conversion which covers the text tower today — build with
    `pretrained=False` and convert via `zoo.convert` mappings."""
    return load_module("multimodal/clip.open_clip_ViT_H_14", pretrained=pretrained, **kwargs)


def ae_kl_f8(pretrained: bool = False, **kwargs: Any) -> nnx.Module:
    return load_module("ae/kl.f8", pretrained=pretrained, **kwargs)


def ae_kl_f4(pretrained: bool = False, **kwargs: Any) -> nnx.Module:
    return load_module("ae/kl.f4", pretrained=pretrained, **kwargs)


def ae_kl_f16(pretrained: bool = False, **kwargs: Any) -> nnx.Module:
    return load_module("ae/kl.f16", pretrained=pretrained, **kwargs)


def ae_vq_f4(pretrained: bool = False, **kwargs: Any) -> nnx.Module:
    return load_module("ae/vq.f4", pretrained=pretrained, **kwargs)


def ae_vq_f4_no_attn(pretrained: bool = False, **kwargs: Any) -> nnx.Module:
    return load_module("ae/vq.f4_no_attn", pretrained=pretrained, **kwargs)


def ae_vq_f8(pretrained: bool = False, **kwargs: Any) -> nnx.Module:
    return load_module("ae/vq.f8", pretrained=pretrained, **kwargs)


# generic latent diffusion (reference `zoo/__init__.py:159-205`)

def ldm_vq(
    latent_size: int = 64,
    latent_in_channels: int = 3,
    latent_out_channels: int = 3,
    *,
    pretrained: bool = False,
    tag: Optional[str] = None,
    **kwargs: Any,
) -> nnx.Module:
    """VQ-first-stage LDM (reference `zoo/__init__.py:159`)."""
    kwargs["img_size"] = latent_size
    kwargs["in_channels"] = latent_in_channels
    kwargs["out_channels"] = latent_out_channels
    return load_module("diffusion/ldm.vq", pretrained=pretrained, tag=tag, **kwargs)


def ldm_inpainting(pretrained: bool = False, **kwargs: Any) -> nnx.Module:
    """LDM inpainting (reference `zoo/__init__.py:174` — concat conditioning
    over 7 latent channels, resblock resampling, attention-free first stage)."""
    kwargs.setdefault("condition_type", "concat")
    kwargs.setdefault(
        "first_stage_config", {"img_size": 256, "attention_type": "none"}
    )
    kwargs.setdefault(
        "unet_config",
        {
            "start_channels": 256,
            "num_res_blocks": 2,
            "channel_multipliers": [1, 2, 3, 4],
            "attention_downsample_rates": [2, 4, 8],
            "num_heads": 8,
            "use_spatial_transformer": False,
            "resample_with_resblock": True,
        },
    )
    return ldm_vq(
        pretrained=pretrained,
        latent_in_channels=7,
        tag="cflearn_ldm_inpainting",
        **kwargs,
    )


def ldm_semantic(pretrained: bool = False, **kwargs: Any) -> nnx.Module:
    """Semantic-map-to-image LDM (reference `zoo/__init__.py:189` — concat
    conditioning through a SpatialRescaler over 182 semantic channels)."""
    kwargs.setdefault("condition_type", "concat")
    kwargs.setdefault("condition_model", "rescaler")
    kwargs.setdefault(
        "condition_config", {"num_stages": 2, "in_channels": 182, "out_channels": 3}
    )
    kwargs.setdefault("first_stage_config", {"img_size": 256})
    kwargs.setdefault(
        "unet_config",
        {
            "start_channels": 128,
            "num_res_blocks": 2,
            "channel_multipliers": [1, 4, 8],
            "attention_downsample_rates": [8, 16, 32],
            "num_heads": 8,
            "use_spatial_transformer": False,
        },
    )
    kwargs.setdefault("latent_size", 128)
    kwargs.setdefault("latent_in_channels", 6)
    return ldm_vq(
        pretrained=pretrained,
        tag="cflearn_ldm_semantic",
        **kwargs,
    )


def ldm_sd(pretrained: bool = False, **kwargs: Any) -> Any:
    return load_sd("v1", pretrained=pretrained, **kwargs)


def ldm_sd_v2(pretrained: bool = False, **kwargs: Any) -> Any:
    return load_sd("v2", pretrained=pretrained, **kwargs)


def ldm_sd_inpainting(pretrained: bool = False, **kwargs: Any) -> Any:
    return load_sd("v1_inpainting", pretrained=pretrained, **kwargs)


class SDVersions:
    """reference `zoo/__init__.py:82-91`. The anime/dreamlike tags select
    community SD-1.5 finetunes: same architecture (`load_sd("v1")`), weights
    swapped in via `DiffusionAPI.prepare_sd`/`switch_sd` after converting
    the community checkpoint with `scripts.sd.convert`."""

    v1 = "v1"
    v1_5 = "v1.5"
    v2 = "v2"
    v2_v = "v2_v"
    ANIME = "anime"
    ANIME_ANYTHING = "anime_anything"
    ANIME_HYBRID = "anime_hybrid"
    ANIME_GUOFENG = "anime_guofeng"
    ANIME_ORANGE = "anime_orange"
    DREAMLIKE = "dreamlike_v1"


def get_sd_tag(version: Optional[str]) -> str:
    """reference `zoo/__init__.py:93-108` — normalize a version to its
    checkpoint tag (community tags map to their versioned names)."""
    if version is None or version in ("", "v1", "v1.5"):
        return "v1.5"
    return {
        SDVersions.ANIME: "anime_nai",
        SDVersions.ANIME_ANYTHING: "anime_anything_v3",
        SDVersions.ANIME_HYBRID: "anime_hybrid_v1",
        SDVersions.ANIME_GUOFENG: "anime_guofeng3",
        SDVersions.ANIME_ORANGE: "anime_orange2",
    }.get(version, version)


def parse_json(json_path: Any) -> Dict[str, Any]:
    """Load a zoo preset json (reference `zoo/utils.py:36`)."""
    with open(json_path, "r") as f:
        return json.load(f)


def parse_config_info(config: str) -> Dict[str, Any]:
    """Parsed preset plus its resolved metadata (reference
    `zoo/utils.py:22`)."""
    parsed = parse_config(config)
    return {
        "config": config,
        "module": parsed.get("__module__"),
        "converter": parsed.get("__converter__"),
        "download": parsed.get("__download__"),
        "parsed": parsed,
    }


def load_predefined_config(config: str) -> Any:
    """Zoo preset → DLConfig (reference `zoo/common.py:18`)."""
    from ..schema.config import DLConfig

    parsed = parse_config(config)
    module_name = parsed.pop("__module__", None)
    parsed.pop("__converter__", None)
    parsed.pop("__download__", None)
    if module_name is None:
        raise ValueError(f"module name not found in '{config}'")
    return DLConfig(module_name=module_name, module_config=parsed)


def build_predefined_module(config: str, **kwargs: Any) -> nnx.Module:
    """Build a zoo module without pretrained weights (reference
    `zoo/common.py:26`)."""
    return load_module(config, pretrained=False, **kwargs)


def load_pretrained_weights(module: nnx.Module, tag: str, **download_kwargs: Any) -> nnx.Module:
    """Download checkpoint `tag` and load it into `module` (reference
    `zoo/common.py:38`)."""
    if tag not in get_available().get("checkpoints", {}):
        raise ValueError(f"no pretrained checkpoint registered under tag '{tag}'")
    # load_states resolves the tag through the checkpoint index (sha-verified)
    npd = load_states(tag, None)
    state = nnx.state(module)
    nnx.update(module, npd_to_tree(npd, state, strict=False))
    return module


def load_pretrained_module(config: str, **kwargs: Any) -> nnx.Module:
    """Build + load pretrained (reference `zoo/common.py:50`)."""
    return load_module(config, pretrained=True, **kwargs)
