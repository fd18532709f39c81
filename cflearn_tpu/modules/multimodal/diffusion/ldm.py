"""LDM / Stable Diffusion generators.

Parity: reference `cflearn/modules/multimodal/diffusion/ldm.py` — `LDM`
(:49, latent diffusion with a first-stage AE + scale factor, `IFirstStage`
:36) and `StableDiffusion` (:222, SD v1/v2 configs — v2 uses
num_head_channels=64, context 1024, v-parameterization for 768-v).
`SDLoRAMode`/`convert_lora` (:205-219) map to the functional LoRA manager in
`cflearn_tpu.modules.core.lora`.
"""

from typing import Any, Dict, Optional

from enum import Enum

import jax
import jax.numpy as jnp
from flax import nnx

from ...common import register_module
from .cond_models import CLIPTextConditionModel
from .ddpm import DDPM
from .utils import CROSS_ATTN_TYPE


@register_module("ldm")
class LDM(DDPM):
    """Latent diffusion: DDPM over first-stage latents (reference `ldm.py:49`).

    `first_stage` may be a module OR a zoo config name (reference passes
    registry names like "ae/kl.f8" / "ae/vq.f4", `ldm.py:154-157`); VQ first
    stages are handled by taking the quantized `z_q` from the codebook output
    (reference `ldm.py:185-191` `preprocess`). `use_first_stage_as_condition`
    routes raw conditions through the (frozen) first-stage encoder (reference
    `ldm.py:105-112, 160-162` — the semantic/super-resolution LDMs)."""

    def __init__(
        self,
        *,
        first_stage: Optional[Any] = None,
        first_stage_config: Optional[Dict[str, Any]] = None,
        first_stage_scale_factor: Optional[float] = None,
        latent_scale: float = 0.18215,
        use_first_stage_as_condition: bool = False,
        rngs: nnx.Rngs,
        **kwargs: Any,
    ) -> None:
        if use_first_stage_as_condition and kwargs.get("condition_learnable"):
            raise ValueError(
                "should not set `condition_learnable` to True when "
                "`use_first_stage_as_condition` is True"
            )
        super().__init__(rngs=rngs, **kwargs)
        if first_stage_scale_factor is not None:
            latent_scale = first_stage_scale_factor
        self.latent_scale = latent_scale
        self.use_first_stage_as_condition = use_first_stage_as_condition
        if isinstance(first_stage, str):
            from ...cv.common import generators
            from ....zoo.common import load_module

            cfg = dict(first_stage_config or {})
            cfg.pop("prefix_module", None)
            pretrained = cfg.pop("pretrained", False)
            if generators.has(first_stage):
                first_stage = generators.build(first_stage, rngs=rngs, **cfg)
            else:
                first_stage = load_module(first_stage, pretrained=pretrained, rngs=rngs, **cfg)
        elif first_stage is None and first_stage_config is not None:
            from ...cv.ae import AutoEncoderKL

            first_stage = AutoEncoderKL(rngs=rngs, **first_stage_config)
        self.first_stage = nnx.data(first_stage)

    # first stage -------------------------------------------------------------

    def encode_first_stage(self, images: jax.Array, *, key: Optional[jax.Array] = None, deterministic: bool = True) -> jax.Array:
        assert self.first_stage is not None
        from ...cv.common import GaussianDistribution

        try:
            out = self.first_stage.encode(images, deterministic=deterministic)
        except TypeError:
            out = self.first_stage.encode(images)
        if isinstance(out, GaussianDistribution):
            z = out.mode() if deterministic else out.sample(key if key is not None else self.rngs.default())
        elif hasattr(out, "z_q"):
            z = out.z_q
        else:
            z = out
        return z * self.latent_scale

    def decode_first_stage(self, z: jax.Array) -> jax.Array:
        assert self.first_stage is not None
        return self.first_stage.decode(z / self.latent_scale)

    def decode(self, z: jax.Array, *, clip_output: bool = True) -> jax.Array:
        out = self.decode_first_stage(z)
        if clip_output:
            out = jnp.clip(out, -1.0, 1.0)
        return out

    # condition ---------------------------------------------------------------

    def get_cond(self, cond: Any) -> Any:
        if self.use_first_stage_as_condition:
            return jax.lax.stop_gradient(self.encode_first_stage(cond))
        return super().get_cond(cond)


def sd_unet_config(version: str = "v1") -> Dict[str, Any]:
    if version.startswith("v2"):
        return dict(
            in_channels=4,
            out_channels=4,
            start_channels=320,
            num_res_blocks=2,
            attention_downsample_rates=(1, 2, 4),
            channel_multipliers=(1, 2, 4, 4),
            num_head_channels=64,
            num_heads=None,
            context_dim=1024,
            use_linear_in_transformer=True,
        )
    return dict(
        in_channels=4,
        out_channels=4,
        start_channels=320,
        num_res_blocks=2,
        attention_downsample_rates=(1, 2, 4),
        channel_multipliers=(1, 2, 4, 4),
        num_heads=8,
        context_dim=768,
        use_linear_in_transformer=False,
    )


def sd_first_stage_config() -> Dict[str, Any]:
    return dict(
        img_size=256,
        in_channels=3,
        out_channels=3,
        inner_channels=128,
        z_channels=4,
        embedding_channels=4,
        channel_multipliers=[1, 2, 4, 4],
        num_res_blocks=2,
        attention_resolutions=[],
    )


@register_module("sd")
@register_module("generators.sd", allow_duplicate=True)
class StableDiffusion(LDM):
    """SD v1/v2 (reference `ldm.py:222`)."""

    def __init__(
        self,
        *,
        version: str = "v1",
        in_channels: int = 4,
        with_first_stage: bool = True,
        parameterization: Optional[str] = None,
        rngs: nnx.Rngs,
        **kwargs: Any,
    ) -> None:
        unet_config = dict(sd_unet_config(version))
        unet_config["in_channels"] = in_channels
        if parameterization is None:
            parameterization = "v" if version == "v2_v" else "eps"
        cond_kw: Dict[str, Any] = dict(latent_dim=768, num_layers=12, num_heads=12)
        if version.startswith("v2"):
            cond_kw = dict(latent_dim=1024, num_layers=23, num_heads=16)
        condition_model = CLIPTextConditionModel(rngs=rngs, **cond_kw)
        super().__init__(
            img_size=64,
            in_channels=in_channels,
            out_channels=4,
            condition_type=CROSS_ATTN_TYPE,
            condition_model=condition_model,
            unet_config=unet_config,
            parameterization=parameterization,
            first_stage_config=sd_first_stage_config() if with_first_stage else None,
            linear_start=0.00085,
            linear_end=0.012,
            rngs=rngs,
            **kwargs,
        )
        self.version = version


@register_module("sd_inpainting")
class StableDiffusionInpainting(StableDiffusion):
    """SD inpainting: UNet takes 9 channels (latent + mask + masked latent)."""

    def __init__(self, *, rngs: nnx.Rngs, **kwargs: Any) -> None:
        kwargs.setdefault("in_channels", 9)
        super().__init__(rngs=rngs, **kwargs)
        self.out_channels = 4


class SDLoRAMode(str, Enum):
    """Which UNet layers LoRA attaches to (reference `ldm.py:205`)."""

    UNET = "unet"
    UNET_EXTENDED = "unet_extended"


def convert_lora(inp: Any) -> Dict[str, Any]:
    """Convert a kohya/diffusers torch LoRA checkpoint into a pack of
    per-layer (down, up, alpha) arrays (reference `ldm.py:210` — there via a
    hosted mapping json; here via the structural key mapper)."""
    from ...core.lora import LoRAManager

    return LoRAManager.load_torch_lora(inp)
