"""`DiffusionAPI` — txt2img / img2img / inpainting / variations.

Parity: reference `cflearn/api/multimodal/diffusion.py:420-1912` —
`sample` (:455 — seeds, slerp-mixed noise variations, highres two-pass,
CFG/uncond management, batching), `txt2img`/`img2img` (:~900-1050),
`inpainting` (:1050), `outpainting`, sampler switching (:1242),
circular/tiling conv padding (:1258), SD weight pool (`prepare_sd`/
`switch_sd` :1211-1240), constructors `from_sd`/`from_sd_inpainting`
(:1372-1452). `ControlledDiffusionAPI` (:1670) adds multi-ControlNet.

TPU-native: per-(batch, size, steps, sampler) shape buckets are jitted once
and cached; each bucket is ONE XLA program (cond encode → scan sampler →
VAE decode). The reference's Python step loop and its per-step host sync
disappear entirely.
"""

from dataclasses import dataclass
from enum import Enum
from typing import Any, Callable, Dict, List, NamedTuple, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ...modules.multimodal.diffusion.ldm import LDM
from ...modules.multimodal.diffusion.samplers import ISampler
from ...modules.nlp.tokenizers import CLIPTokenizer
from ...modules.core.lora import LoRAManager, LoRAPack
from ...toolkit.misc import slerp
from ..common import IAPI, Weights

arr_like = Union[np.ndarray, jax.Array]


def _to_uint8(images: jax.Array) -> np.ndarray:
    # cast on device: device→host bandwidth is the scarce resource (axon
    # tunnel ~20MB/s) — pull 1 byte/px, not 4
    images = (jnp.clip(images, -1.0, 1.0) + 1.0) * 127.5
    return np.asarray(images.astype(jnp.uint8))


def _from_uint8(images: np.ndarray) -> np.ndarray:
    return images.astype(np.float32) / 127.5 - 1.0


# --------------------------------------------------------------------------
# crop-to-mask inpainting machinery (reference :150-395 — ImageBox /
# adjust_lt_rb / crop_masked_area / recover_with / InpaintingSettings).
# Host-side numpy only: this runs once per call, outside the jitted program.
# --------------------------------------------------------------------------

TNumberPair = Optional[Union[int, Tuple[int, int]]]


def _pair(v: TNumberPair) -> Optional[Tuple[int, int]]:
    if v is None:
        return None
    if isinstance(v, int):
        return v, v
    return int(v[0]), int(v[1])


def _resize_np(arr: np.ndarray, wh: Tuple[int, int], method: str = "bilinear") -> np.ndarray:
    """Resize an HW or HWC numpy array to (w, h)."""
    w, h = wh
    squeeze = arr.ndim == 2
    if squeeze:
        arr = arr[..., None]
    out = np.asarray(
        jax.image.resize(jnp.asarray(arr, jnp.float32), (h, w, arr.shape[-1]), method)
    )
    return out[..., 0] if squeeze else out


def _box_blur(mask: np.ndarray, blur: Tuple[int, int]) -> np.ndarray:
    """Separable box blur of a 2D float mask (cv2.blur role, reference :279)."""
    bw, bh = blur
    out = mask.astype(np.float32)
    if bw > 1:
        k = np.ones(bw, np.float32) / bw
        out = np.apply_along_axis(lambda r: np.convolve(np.pad(r, bw // 2, mode="edge"), k, "same")[bw // 2 : bw // 2 + r.size], 1, out)
    if bh > 1:
        k = np.ones(bh, np.float32) / bh
        out = np.apply_along_axis(lambda c: np.convolve(np.pad(c, bh // 2, mode="edge"), k, "same")[bh // 2 : bh // 2 + c.size], 0, out)
    return out


class ImageBox(NamedTuple):
    """l/t/r/b crop box (reference ImageBox)."""

    l: int
    t: int
    r: int
    b: int

    @classmethod
    def from_mask(cls, mask: np.ndarray, threshold: float) -> "ImageBox":
        ys, xs = np.nonzero(mask > threshold)
        if ys.size == 0:
            return cls(0, 0, mask.shape[1], mask.shape[0])
        return cls(int(xs.min()), int(ys.min()), int(xs.max()) + 1, int(ys.max()) + 1)

    def crop(self, arr: np.ndarray) -> np.ndarray:
        return arr[self.t : self.b, self.l : self.r]


def adjust_lt_rb(box: ImageBox, w: int, h: int, padding: TNumberPair) -> ImageBox:
    """Pad the mask bbox, then widen it so the crop keeps the original aspect
    ratio (reference adjust_lt_rb :189-228)."""
    l, t, r, b = box
    pad = _pair(padding)
    if pad is not None:
        l = max(0, l - pad[0])
        t = max(0, t - pad[1])
        r = min(w, r + pad[0])
        b = min(h, b + pad[1])
    ch, cw = b - t, r - l
    if ch / cw > h / w:
        dw, dh = (int(ch * w / h) - cw) // 2, 0
    else:
        dw, dh = 0, (int(cw * h / w) - ch) // 2
    if dw > 0:
        if l < dw:
            l, r = 0, min(w, cw + dw * 2)
        elif r + dw > w:
            l, r = max(0, w - cw - dw * 2), w
        else:
            l, r = l - dw, r + dw
    if dh > 0:
        if t < dh:
            t, b = 0, min(h, ch + dh * 2)
        elif b + dh > h:
            t, b = max(0, h - ch - dh * 2), h
        else:
            t, b = t - dh, b + dh
    return ImageBox(l, t, r, b)


class InpaintingMode(str, Enum):
    NORMAL = "normal"
    MASKED = "masked"


@dataclass
class InpaintingSettings:
    """reference InpaintingSettings (:392). MASKED mode crops to the padded
    mask bbox, diffuses the crop at full working resolution, and pastes the
    result back with a feathered blend — far higher effective resolution on
    small masked regions for the same FLOPs."""

    mode: InpaintingMode = InpaintingMode.NORMAL
    mask_blur: TNumberPair = None
    mask_padding: TNumberPair = 32
    mask_binary_threshold: Optional[int] = 32
    target_wh: TNumberPair = None


class CropResponse(NamedTuple):
    box: ImageBox
    wh: Tuple[int, int]
    original_image: np.ndarray  # (b, H, W, C) float [-1, 1]
    cropped_mask: np.ndarray  # (ch, cw) float binary
    image: np.ndarray  # (b, h, w, C) resized crop
    mask: np.ndarray  # (b, h, w, 1) resized mask


def _round64(v: int) -> int:
    return max(64, int(round(v / 64)) * 64)


def fidelity_start_step(fidelity: float, num_steps: int) -> int:
    """reference `_q_sample` (:1568): denoise for (1-fidelity)*n steps, i.e.
    skip the first fidelity*n — fidelity 1 keeps the input, 0 regenerates."""
    return max(0, min(num_steps - 1, int(round(fidelity * num_steps))))


def crop_masked_area(
    image: np.ndarray,
    mask: np.ndarray,
    settings: InpaintingSettings,
) -> CropResponse:
    """reference crop_masked_area (:229-251). `image` (b,H,W,C) float [-1,1],
    `mask` (b,H,W,1) float [0,1]; batch shares sample 0's mask box."""
    b, h, w = image.shape[:3]
    mask2d = mask[0, :, :, 0]
    raw_threshold = settings.mask_binary_threshold
    threshold = (32 if raw_threshold is None else raw_threshold) / 255.0
    box = ImageBox.from_mask(mask2d, threshold)
    box = adjust_lt_rb(box, w, h, settings.mask_padding)
    t_wh = _pair(settings.target_wh)
    tw, th = t_wh if t_wh is not None else (w, h)
    tw, th = _round64(tw), _round64(th)
    cropped_mask = (box.crop(mask2d) > threshold).astype(np.float32)
    resized_image = np.stack([_resize_np(box.crop(img), (tw, th)) for img in image])
    resized_mask = _resize_np(cropped_mask, (tw, th), "nearest")
    resized_mask = np.broadcast_to(resized_mask[None, :, :, None], (b, th, tw, 1)).copy()
    return CropResponse(box, (tw, th), image, cropped_mask, resized_image, resized_mask)


def recover_masked_area(
    sampled: np.ndarray,
    crop: CropResponse,
    settings: InpaintingSettings,
    original_u8: Optional[np.ndarray] = None,
) -> np.ndarray:
    """reference recover_with (:259-298): resize the diffused crop back down,
    feather-blend with the (blurred) mask, paste into the original. Returns
    uint8 NHWC; pixels outside the crop box are bit-identical to the input
    when `original_u8` is given."""
    l, t, r, b = crop.box
    ch, cw = b - t, r - l
    blurred = crop.cropped_mask
    pad = _pair(settings.mask_padding)
    if pad is not None and pad[0] > 0 and pad[1] > 0:
        blurred = _box_blur(blurred, pad)
    blurred = blurred[..., None]
    if original_u8 is None:
        original_u8 = _to_uint8(jnp.asarray(crop.original_image))
    out = original_u8.copy()
    untouched = blurred[:, :, 0] == 0.0
    for i, s in enumerate(sampled):
        s = _resize_np(s, (cw, ch))
        region = crop.original_image[i, t:b, l:r]
        mixed = s * blurred + region * (1.0 - blurred)
        mixed_u8 = np.array(_to_uint8(jnp.asarray(mixed)))
        mixed_u8[untouched] = out[i, t:b, l:r][untouched]
        out[i, t:b, l:r] = mixed_u8
    return out


class DiffusionAPI(IAPI):
    def __init__(
        self,
        m: LDM,
        *,
        use_bf16: bool = False,
        tokenizer: Optional[CLIPTokenizer] = None,
    ) -> None:
        super().__init__(m, use_bf16=use_bf16)
        self.m: LDM = m
        self.tokenizer = tokenizer or CLIPTokenizer()
        self.sampler_name = "ddim"
        self.sampler_config: Dict[str, Any] = {}
        self._sd_weights = Weights()
        self._current_sd: Optional[str] = None
        self._jit_cache: Dict[Any, Callable] = {}
        self._circular = False
        self.lora_manager = LoRAManager()
        self._style_ref: Optional[Dict[str, Any]] = None
        self._mesh: Optional[Any] = None

    # ------------------------------------------------------------- switches

    def switch_sampler(self, sampler: str, **sampler_config: Any) -> None:
        """reference :1242."""
        if sampler not in ISampler.d:
            raise ValueError(f"unknown sampler '{sampler}' (available: {sorted(ISampler.d)})")
        self.sampler_name = sampler
        self.sampler_config = sampler_config
        self._jit_cache.clear()

    def switch_circular(self, enable: bool) -> None:
        """Tiling mode — circular conv padding (reference :1258)."""
        self._circular = enable
        from ...modules.core.convs import Conv2d

        for _, module in nnx.iter_graph(self.m):
            if isinstance(module, Conv2d):
                module.set_circular(enable)
        self._jit_cache.clear()

    def set_tome_ratio(self, ratio: float, *, merge_mlp: bool = False) -> None:
        """Enable ToMe token merging on all SpatialTransformers (the
        reference lists ToMe as its SD seq-scaling tool, SURVEY §5.7).
        `merge_mlp` additionally merges for the FF (tomesd `merge_mlp`,
        larger speedup / larger quality cost)."""
        from ...modules.core.mixed_stacks import SpatialTransformer

        for _, module in nnx.iter_graph(self.m):
            if isinstance(module, SpatialTransformer):
                module.set_tome_ratio(ratio, merge_mlp=merge_mlp)
        self._jit_cache.clear()

    def set_deepcache(
        self,
        interval: Optional[int],
        *,
        cut: int = 3,
        center: Optional[float] = None,
    ) -> None:
        """DeepCache (Ma et al. 2023) UNet feature reuse: every `interval`-th
        sampler step runs the full UNet and caches the deep-branch feature;
        in-between steps run only the shallowest `cut` input blocks +
        `cut+1` output blocks, splicing the cache in. `interval=None` (or
        <=1) disables. Trace-time static — programs recompile on change.
        Honored by the ddim-family samplers (ddim/basic — the serving
        default); k-samplers/plms/lcm/solver ignore it (full UNet every
        step). `cut=1` is the paper's standard SD config (cache at the
        shallowest branch); measured tradeoffs in docs/performance.md.
        The cut is clamped to the UNet's block counts at use time, so the
        default is safe on small architectures. `center` (a fraction in
        [0, 1]) switches to the paper's NON-UNIFORM refresh schedule: the
        same number of full passes — identical cost — concentrated around
        that point of the WHOLE step loop (§4.2 of the paper; measured
        tradeoffs in docs/frontier_sd15.json). When `guidance_interval`
        splits the loop into CFG segments, the global fraction is mapped
        into each segment's coordinates so placement matches the
        unsegmented schedule's intent."""
        self.m.deepcache_interval = None if interval is not None and interval <= 1 else interval
        self.m.deepcache_cut = cut
        self.m.deepcache_center = center
        self._jit_cache.clear()

    def setup_hooks(
        self,
        *,
        tome_info: Optional[Dict[str, Any]] = None,
        style_reference_image: Optional[np.ndarray] = None,
        style_reference_states: Optional[Dict[str, Any]] = None,
    ) -> None:
        """reference :1341 — configure ToMe and/or style-reference
        ("reference-only") generation. The style reference image steers
        txt2img: each denoise step runs a WRITE UNet pass over the q-sampled
        reference latent and lets self-attention READ the banked activations
        (all inside one jitted program)."""
        if tome_info is not None:
            self.set_tome_ratio(
                float(tome_info.get("ratio", 0.5)),
                merge_mlp=bool(tome_info.get("merge_mlp", False)),
            )
        if style_reference_image is None:
            self._style_ref = None
            self._jit_cache.clear()
            return
        from ...modules.core.mixed_stacks import StyleReferenceStates
        from ...modules.multimodal.diffusion.unet import style_reference_write_gates

        states = StyleReferenceStates(**(style_reference_states or {}))
        image = self._norm_image(np.asarray(style_reference_image))
        h, w = image.shape[1:3]
        th, tw = _round64(h), _round64(w)
        if (th, tw) != (h, w):
            image = np.stack([_resize_np(im, (tw, th)) for im in image])
        gates = style_reference_write_gates(self.m.unet, states.reference_weight)
        self._style_ref = {"states": states, "gates": tuple(gates), "image": image}
        self._jit_cache.clear()

    def _style_sig(self) -> Optional[Tuple[Any, ...]]:
        if self._style_ref is None:
            return None
        s = self._style_ref["states"]
        return (s.style_fidelity, s.reference_weight, self._style_ref["gates"], self._style_ref["image"].shape)

    def compile(
        self,
        *,
        num_samples: int = 1,
        size: Tuple[int, int] = (512, 512),
        num_steps: int = 20,
        guidance_scale: float = 7.5,
    ) -> None:
        """Pre-warm the jitted txt2img program for a shape bucket (the
        reference's `compile` :1204 wraps torch.compile; here every bucket is
        always compiled — this just pays the cost up front via AOT lowering)."""
        size = (_round64(size[0]), _round64(size[1]))
        fn = self._get_jitted(
            "txt2img", num_steps=num_steps, guidance_scale=guidance_scale, size=size
        )
        latent = (size[0] // 8, size[1] // 8)
        sds = jax.ShapeDtypeStruct
        state = jax.tree_util.tree_map(
            lambda x: sds(x.shape, x.dtype) if hasattr(x, "dtype") else x,
            nnx.state(self.m),
        )
        args = [
            state,
            sds((num_samples, 77), jnp.int32),
            sds((num_samples, 77), jnp.int32),
            sds((num_samples, latent[0], latent[1], self.m.out_channels), jnp.float32),
        ]
        if self._style_ref is not None:
            args.append(sds(self._style_ref["image"].shape, jnp.float32))
        args.append(sds((2,), jnp.uint32))
        fn.lower(*args).compile()

    def use_mesh(
        self,
        mesh: Optional[Any],
        *,
        tp_rules: Optional[Any] = None,
        use_fsdp: bool = False,
    ) -> None:
        """Shard serving over a `jax.sharding.Mesh` (multi-chip inference —
        new capability, no reference analogue: the reference serves
        single-GPU). Params are placed by the Megatron col/row TP rules on
        the `model` axis (replicated otherwise, largest-axis sharded over
        `fsdp` when `use_fsdp`); per-call batches shard over the data axis;
        a non-trivial `context` axis routes self-attention through
        ring/Ulysses attention (`ops.sdp_attn`). Pass None to revert to
        single-device serving."""
        from ...parallel.mesh import set_mesh
        from ...parallel.tp import place_params

        self._mesh = mesh
        set_mesh(mesh)
        if mesh is not None:
            state = nnx.state(self.m)
            nnx.update(self.m, place_params(state, mesh, use_fsdp=use_fsdp, tp_rules=tp_rules))
        self._jit_cache.clear()

    def _shard_batch_arg(self, x: jax.Array) -> jax.Array:
        """Place a batch-leading array over the mesh's batch axes (those of
        data/fsdp actually present in the mesh)."""
        if self._mesh is None:
            return x
        from jax.sharding import NamedSharding, PartitionSpec as P

        axes = tuple(a for a in ("data", "fsdp") if self._mesh.shape.get(a, 1) > 1)
        if not axes:
            return x
        spec = P(axes, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(self._mesh, spec))

    def load_context(self, *, ignore_lora: bool = True) -> Any:
        """reference :1281 — context manager yielding the bare model for
        weight loading: active LoRA fusions are unwound (so checkpoint
        tensors land on clean base weights) and re-applied on exit; jit
        caches are invalidated afterwards."""
        from contextlib import contextmanager

        @contextmanager
        def _ctx() -> Any:
            restored = None
            if ignore_lora and self.lora_manager._active:
                restored = dict(self.lora_manager._active)
                self.lora_manager.deactivate(self.m)
            try:
                yield self.m
            finally:
                if restored:
                    # the module's weights may have been replaced inside the
                    # context — re-capture the base from the CURRENT weights
                    # before fusing, or the old base would clobber them
                    self.lora_manager.reset_base()
                    self.lora_manager.apply_lora(
                        self.m, *restored.keys(), scales=restored
                    )
                self._jit_cache.clear()

        return _ctx()

    # ----------------------------------------------------------------- lora

    def load_sd_lora(self, key: str, *, path: Optional[str] = None, pack: Optional[LoRAPack] = None) -> None:
        """reference :1315 `load_sd_lora`."""
        if pack is None:
            assert path is not None, "either `path` or `pack` is required"
            pack = LoRAManager.load_torch_lora(path)
        self.lora_manager.load_pack_with(key, pack)

    def inject_sd_lora(self, *keys: str) -> None:
        self.lora_manager.apply_lora(self.m, *keys)
        self._jit_cache.clear()

    def set_sd_lora_scales(self, scales: Dict[str, float]) -> None:
        self.lora_manager.set_scales(self.m, scales)
        self._jit_cache.clear()

    def cleanup_sd_lora(self) -> None:
        self.lora_manager.deactivate(self.m)
        self._jit_cache.clear()

    # --------------------------------------------------------- weight pools

    def prepare_sd(self, versions: Dict[str, Dict[str, np.ndarray]]) -> None:
        """Register alternative SD checkpoints (reference :1211)."""
        for tag, states in versions.items():
            self._sd_weights.register(tag, states)

    def switch_sd(self, tag: str) -> None:
        states = self._sd_weights.get(tag)
        if states is None:
            raise ValueError(f"sd tag '{tag}' is not prepared")
        if self._current_sd != tag:
            self.m.load_state_dict(states) if hasattr(self.m, "load_state_dict") else None
            from ...toolkit.tree import npd_to_tree

            state = nnx.state(self.m)
            nnx.update(self.m, npd_to_tree(states, state, strict=False))
            self._current_sd = tag

    # ------------------------------------------------------------ internals

    def _encode_text(self, texts: Union[str, List[str]]) -> np.ndarray:
        return self.tokenizer.tokenize(texts)

    def _get_jitted(self, kind: str, **static: Any) -> Callable:
        key = (
            kind,
            tuple(sorted(static.items())),
            self.sampler_name,
            tuple(sorted(self.sampler_config.items())),
            self._style_sig(),
            # clip_skip is read at trace time inside the text encoder
            getattr(getattr(self.m, "condition_model", None), "clip_skip", None),
            None if self._mesh is None else tuple(sorted(self._mesh.shape.items())),
        )
        fn = self._jit_cache.get(key)
        if fn is not None:
            return fn
        graphdef, state = nnx.split(self.m)
        sampler_name = self.sampler_name
        sampler_config = dict(self.sampler_config)
        num_steps = static["num_steps"]
        guidance = static["guidance_scale"]
        size = static["size"]

        if kind == "txt2img":
            style_ref = self._style_ref

            if style_ref is None:

                def _run(st: Any, tokens: jax.Array, uncond_tokens: jax.Array, z: jax.Array, key: jax.Array) -> jax.Array:
                    m = nnx.merge(graphdef, st)
                    cond = m.get_cond(tokens)
                    uncond = m.get_cond(uncond_tokens) if guidance != 1.0 else None
                    sampler = ISampler.make(sampler_name, dict(sampler_config, model=m))
                    latents = sampler.sample(
                        z, cond=cond, uncond=uncond, guidance_scale=guidance,
                        num_steps=num_steps, key=key,
                    )
                    return m.decode(latents)

            else:
                from ...modules.core.mixed_stacks import SpatialTransformerHooks

                style_states = style_ref["states"]
                style_gates = list(style_ref["gates"])

                def _run(st: Any, tokens: jax.Array, uncond_tokens: jax.Array, z: jax.Array, ref_image: jax.Array, key: jax.Array) -> jax.Array:
                    m = nnx.merge(graphdef, st)
                    cond = m.get_cond(tokens)
                    uncond = m.get_cond(uncond_tokens) if guidance != 1.0 else None
                    ref_z = m.encode_first_stage(ref_image)
                    b = z.shape[0]
                    uncond_mask = None
                    if uncond is not None:
                        # CFG batches [cond, uncond] — uncond rows are b..2b
                        # (reference `inject_uncond_indices` :370)
                        uncond_mask = (jnp.arange(2 * b) >= b)[:, None, None]
                    k1, k2 = jax.random.split(key)
                    hooks = SpatialTransformerHooks(
                        style=style_states,
                        write_gates=style_gates,
                        uncond_mask=uncond_mask,
                        ref_latent=ref_z,
                        key=k1,
                    )
                    sampler = ISampler.make(sampler_name, dict(sampler_config, model=m))
                    latents = sampler.sample(
                        z, cond=cond, uncond=uncond, guidance_scale=guidance,
                        num_steps=num_steps, key=k2, hooks=hooks,
                    )
                    return m.decode(latents)

            fn = jax.jit(_run)

        elif kind == "img2img":
            fidelity = static["fidelity"]
            start_step = fidelity_start_step(fidelity, num_steps)

            def _run(st: Any, tokens: jax.Array, uncond_tokens: jax.Array, image: jax.Array, key: jax.Array) -> jax.Array:
                m = nnx.merge(graphdef, st)
                cond = m.get_cond(tokens)
                uncond = m.get_cond(uncond_tokens) if guidance != 1.0 else None
                z0 = m.encode_first_stage(image)
                sampler = ISampler.make(sampler_name, dict(sampler_config, model=m))
                latents = sampler.sample_from(
                    z0, cond=cond, uncond=uncond, guidance_scale=guidance,
                    num_steps=num_steps, start_step=start_step, key=key,
                )
                return m.decode(latents)

            fn = jax.jit(_run)

        elif kind == "inpainting":
            # two flavors (reference :1050 + `from_sd_inpainting`):
            # * 9-channel inpainting UNet → hybrid cond (concat mask+masked
            #   latents, cross-attn text);
            # * plain UNet → repaint-style latent blending.
            # `force_repaint` = reference `use_raw_inpainting` (:783);
            # `ref_fidelity` = background guidance (:804-811): start sampling
            # from the q-sampled original latents instead of pure noise.
            force_repaint = static.get("force_repaint", False)
            ref_fidelity = static.get("ref_fidelity")
            uses_inpaint_unet = (
                self.m.unet.in_channels > self.m.out_channels and not force_repaint
            )
            start_step = (
                None if ref_fidelity is None else fidelity_start_step(ref_fidelity, num_steps)
            )

            def _run(st: Any, tokens: jax.Array, uncond_tokens: jax.Array, image: jax.Array, mask: jax.Array, key: jax.Array) -> jax.Array:
                from ...modules.multimodal.diffusion.utils import (
                    CONCAT_TYPE,
                    CROSS_ATTN_TYPE,
                )

                m = nnx.merge(graphdef, st)
                text = m.get_cond(tokens)
                text_u = m.get_cond(uncond_tokens) if guidance != 1.0 else None
                masked = image * (1.0 - mask)
                z0 = m.encode_first_stage(image)
                zm = m.encode_first_stage(masked)
                b, lh, lw, lc = z0.shape
                latent_mask = jax.image.resize(mask, (b, lh, lw, 1), "nearest")
                sampler = ISampler.make(sampler_name, dict(sampler_config, model=m))
                k1, k2 = jax.random.split(key)
                z = jax.random.normal(k1, z0.shape, z0.dtype)

                def run_sampler(cond: Any, uncond: Any) -> jax.Array:
                    if start_step is None:
                        return sampler.sample(
                            z, cond=cond, uncond=uncond, guidance_scale=guidance,
                            num_steps=num_steps, key=k2,
                        )
                    return sampler.sample_from(
                        z0, cond=cond, uncond=uncond, guidance_scale=guidance,
                        num_steps=num_steps, start_step=start_step, key=k2,
                    )

                if uses_inpaint_unet:
                    if m.condition_type == CONCAT_TYPE:
                        # concat-only LDM inpainting (reference :1066-1079,
                        # `from_inpainting`): cond = cat([masked latents,
                        # mask]) — image FIRST — no text / no CFG. The
                        # reference masks in [0,1] space with 0-fill
                        # (→ -1 after its 2x-1) and uses a ±1 mask cond
                        # (`mask_cond_fn` at :1077).
                        masked_black = image * (1.0 - mask) - mask
                        zmb = m.encode_first_stage(masked_black)
                        cond = jnp.concatenate(
                            [zmb, latent_mask * 2.0 - 1.0], axis=-1
                        )
                        latents = run_sampler(cond, None)
                        # pixel-space paste-back (reference `callback`
                        # :1066-1069): unmasked pixels come from the input
                        decoded = m.decode(latents)
                        return image * (1.0 - mask) + decoded * mask
                    else:
                        # hybrid conditioning (SD 9-channel, reference :935):
                        # cat([mask, masked latents]) to the UNet input, text
                        # through cross-attention. The sampler's CFG batching
                        # concatenates conds, so pack concat+context channels
                        # into one context tensor is not possible — instead
                        # run with condition_type hybrid via dict cond.
                        concat = jnp.concatenate([latent_mask, zm], axis=-1)
                        cond = {CONCAT_TYPE: concat, CROSS_ATTN_TYPE: text}
                        uncond = (
                            {CONCAT_TYPE: concat, CROSS_ATTN_TYPE: text_u}
                            if text_u is not None
                            else None
                        )
                        backup = m.condition_type
                        m.condition_type = "hybrid"
                        latents = run_sampler(cond, uncond)
                        m.condition_type = backup
                else:
                    latents = run_sampler(text, text_u)
                    # repaint blend: keep unmasked regions from the original
                    latents = latents * latent_mask + z0 * (1.0 - latent_mask)
                return m.decode(latents)

            fn = jax.jit(_run)
        else:
            raise ValueError(f"unknown kind '{kind}'")
        self._jit_cache[key] = fn
        return fn

    def _make_noise(
        self,
        num_samples: int,
        size: Tuple[int, int],
        seed: Optional[int],
        variations: Optional[List[Tuple[int, float]]],
    ) -> jax.Array:
        latent = (size[0] // 8, size[1] // 8)
        key = jax.random.PRNGKey(seed if seed is not None else np.random.randint(0, 2**31 - 1))
        z = jax.random.normal(key, (num_samples, latent[0], latent[1], self.m.out_channels))
        if variations:
            # slerp-mix extra seeds (reference :1488-1518)
            for v_seed, strength in variations:
                vz = jax.random.normal(
                    jax.random.PRNGKey(v_seed), z.shape, z.dtype
                )
                z = slerp(vz, z, strength)
        return z

    # ------------------------------------------------------------------ api

    def sample(
        self,
        num_samples: int,
        *,
        cond: Optional[Union[str, List[str]]] = None,
        negative_prompt: str = "",
        size: Tuple[int, int] = (512, 512),
        num_steps: int = 20,
        guidance_scale: float = 7.5,
        seed: Optional[int] = None,
        variations: Optional[List[Tuple[int, float]]] = None,
        variation_seed: Optional[int] = None,
        variation_strength: Optional[float] = None,
        z: Optional[np.ndarray] = None,
        batch_size: Optional[int] = None,
        callback: Optional[Callable[[np.ndarray], np.ndarray]] = None,
        clip_skip: Optional[int] = None,
        highres_info: Optional[Dict[str, Any]] = None,
        export_path: Optional[str] = None,
        **kwargs: Any,
    ) -> np.ndarray:
        """txt2img (reference :455). Returns uint8 NHWC images.

        `z` injects starting latents directly; `variation_seed`+
        `variation_strength` slerp-mix one extra seed on top of `variations`
        (reference :1488-1518); `batch_size` chunks `num_samples` into
        per-program batches; `callback` transforms the decoded float images
        before uint8 conversion; `clip_skip` overrides the text encoder's
        penultimate-layer tap for this call."""
        prompts = cond if cond is not None else [""] * num_samples
        if isinstance(prompts, str):
            prompts = [prompts] * num_samples
        if len(prompts) != num_samples:
            raise ValueError(
                f"`num_samples` ({num_samples}) should be identical with "
                f"the number of `cond` ({len(prompts)})"
            )
        # round to the UNet's 64px grid (reference `get_size`/anchor=64)
        size = (_round64(size[0]), _round64(size[1]))
        cm = getattr(self.m, "condition_model", None)
        clip_skip_backup: Optional[int] = None
        if clip_skip is not None and hasattr(cm, "clip_skip"):
            clip_skip_backup = cm.clip_skip
            cm.clip_skip = int(clip_skip)
        try:
            tokens = jnp.asarray(self._encode_text(prompts))
            uncond = jnp.asarray(self._encode_text([negative_prompt] * num_samples))
            if z is not None:
                z = jnp.asarray(z)
            else:
                z = self._make_noise(num_samples, size, seed, variations)
                if variation_seed is not None and variation_strength:
                    vz = jax.random.normal(
                        jax.random.PRNGKey(variation_seed), z.shape, z.dtype
                    )
                    z = slerp(vz, z, variation_strength)
            key = jax.random.PRNGKey(seed or 0)
            chunk = batch_size or num_samples
            ref_image = (
                jnp.asarray(self._style_ref["image"])
                if self._style_ref is not None
                else None
            )
            outs = []
            for lo in range(0, num_samples, chunk):
                hi = min(num_samples, lo + chunk)
                fn = self._get_jitted(
                    "txt2img", num_steps=num_steps, guidance_scale=guidance_scale, size=size
                )
                args = (
                    nnx.state(self.m),
                    self._shard_batch_arg(tokens[lo:hi]),
                    self._shard_batch_arg(uncond[lo:hi]),
                    self._shard_batch_arg(z[lo:hi]),
                )
                if ref_image is not None:
                    args = args + (ref_image,)
                k = key if lo == 0 else jax.random.fold_in(key, lo)
                outs.append(fn(*args, k))
            images = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
        finally:
            if clip_skip_backup is not None:
                cm.clip_skip = clip_skip_backup
        if callback is not None:
            images = jnp.asarray(callback(np.asarray(images)))
        if highres_info:
            upscale = highres_info.get("upscale_factor", 2.0)
            fidelity = highres_info.get("fidelity", 0.3)
            hr_size = (int(size[0] * upscale), int(size[1] * upscale))
            big = jax.image.resize(
                images, (num_samples, hr_size[0], hr_size[1], images.shape[-1]), "bilinear"
            )
            return self.img2img(
                _to_uint8(big),
                cond=prompts,
                negative_prompt=negative_prompt,
                fidelity=fidelity,
                num_steps=num_steps,
                guidance_scale=guidance_scale,
                seed=seed,
            )
        out = _to_uint8(images)
        if export_path is not None:
            self._export(out, export_path)
        return out

    def txt2img(self, txt: Union[str, List[str]], **kwargs: Any) -> np.ndarray:
        prompts = [txt] if isinstance(txt, str) else list(txt)
        return self.sample(len(prompts), cond=prompts, **kwargs)

    def img2img(
        self,
        image: np.ndarray,
        *,
        cond: Optional[Union[str, List[str]]] = None,
        negative_prompt: str = "",
        fidelity: float = 0.2,
        num_steps: int = 20,
        guidance_scale: float = 7.5,
        seed: Optional[int] = None,
        export_path: Optional[str] = None,
        **kwargs: Any,
    ) -> np.ndarray:
        """reference :~900-1050. `image`: uint8 or [-1,1] float NHWC.

        Inputs whose sides are not multiples of the UNet's 64px grid are
        resized up to the rounded size for sampling and the output is
        resized back (reference `read_image(anchor=…)` + `original_size`
        restore in `sample`) — for paths/PIL inputs the pre-snap PIL size
        is the restore target."""
        if isinstance(image, str) or (
            not isinstance(image, np.ndarray) and hasattr(image, "getbands")
        ):
            from .utils import read_image

            res = read_image(image, None, anchor=64)
            image = (res.image * 2.0 - 1.0).astype(np.float32)
            # read_image reports (w, h); arrays here are (h, w)
            original_hw = (res.original_size[1], res.original_size[0])
        else:
            image = self._norm_image(image)
            original_hw = (image.shape[1], image.shape[2])
        b = image.shape[0]
        rounded_hw = (_round64(original_hw[0]), _round64(original_hw[1]))
        if (image.shape[1], image.shape[2]) != rounded_hw:
            image = np.asarray(
                jax.image.resize(
                    jnp.asarray(image), (b, *rounded_hw, image.shape[-1]), "bilinear"
                )
            )
        prompts = cond if cond is not None else [""] * b
        if isinstance(prompts, str):
            prompts = [prompts] * b
        tokens = jnp.asarray(self._encode_text(prompts))
        uncond = jnp.asarray(self._encode_text([negative_prompt] * b))
        size = (image.shape[1], image.shape[2])
        fn = self._get_jitted(
            "img2img", num_steps=num_steps, guidance_scale=guidance_scale, size=size, fidelity=fidelity
        )
        key = jax.random.PRNGKey(seed or 0)
        out = _to_uint8(
            fn(
                nnx.state(self.m),
                self._shard_batch_arg(tokens),
                self._shard_batch_arg(uncond),
                self._shard_batch_arg(jnp.asarray(image)),
                key,
            )
        )
        if rounded_hw != original_hw:
            out = np.asarray(
                jnp.clip(
                    jnp.round(
                        jax.image.resize(
                            jnp.asarray(out, jnp.float32),
                            (b, *original_hw, out.shape[-1]),
                            "bilinear",
                        )
                    ),
                    0,
                    255,
                )
            ).astype(np.uint8)
        if export_path is not None:
            self._export(out, export_path)
        return out

    def inpainting(
        self,
        image: np.ndarray,
        mask: np.ndarray,
        *,
        cond: Optional[Union[str, List[str]]] = None,
        negative_prompt: str = "",
        num_steps: int = 20,
        guidance_scale: float = 7.5,
        seed: Optional[int] = None,
        export_path: Optional[str] = None,
        inpainting_settings: Optional[InpaintingSettings] = None,
        use_raw_inpainting: bool = False,
        use_background_guidance: bool = False,
        reference_fidelity: float = 0.2,
        keep_original: bool = False,
        keep_original_fade: int = 50,
        **kwargs: Any,
    ) -> np.ndarray:
        """reference :1050 — masked generation (mask: 1 = regenerate).

        `inpainting_settings` (reference :392) selects NORMAL (diffuse the
        whole canvas) vs MASKED (crop to the padded mask bbox, diffuse the
        crop at working resolution, feather-paste back).
        `use_raw_inpainting` (reference :783) forces the repaint path even on
        a 9-channel inpainting UNet; `use_background_guidance` (:804) starts
        sampling from the q-sampled original latents at `reference_fidelity`;
        `keep_original` (:813-838) pastes the original unmasked pixels over
        the result with a `keep_original_fade`-pixel feather band.
        `refine_fidelity` (reference :1059) is accepted as an alias for the
        background-guidance start: both mean "start from the q-sampled
        original latents at this fidelity" (reference `_img2img` refine)."""
        refine_fidelity = kwargs.pop("refine_fidelity", None)
        if refine_fidelity is not None:
            use_background_guidance = True
            reference_fidelity = float(refine_fidelity)
        if isinstance(image, str) or (
            not isinstance(image, np.ndarray) and hasattr(image, "getbands")
        ):
            image = self._norm_image(image)
        raw = np.asarray(image)
        if raw.ndim == 3:
            raw = raw[None]
        original_u8 = raw if raw.dtype == np.uint8 else None
        image = self._norm_image(raw)
        b = image.shape[0]
        if isinstance(mask, str) or (
            not isinstance(mask, np.ndarray) and hasattr(mask, "getbands")
        ):
            from .utils import read_image

            mask = read_image(mask, None, anchor=None, to_mask=True).image[..., 0]
        mask = np.asarray(mask).astype(np.float32)
        if mask.ndim == 2:
            mask = mask[None, :, :, None]
        elif mask.ndim == 3:
            mask = mask[..., None] if mask.shape[-1] not in (1,) else mask[None]
        mask = (mask > 0.5).astype(np.float32)
        full_mask = mask
        settings = inpainting_settings
        crop_ctx: Optional[CropResponse] = None
        if settings is not None and settings.mode == InpaintingMode.MASKED:
            crop_ctx = crop_masked_area(image, mask, settings)
            image, mask = crop_ctx.image, crop_ctx.mask
        if settings is not None:
            blur = _pair(settings.mask_blur)
            if blur is not None and blur[0] > 0 and blur[1] > 0:
                mask = np.stack([_box_blur(m[:, :, 0], blur)[:, :, None] for m in mask])
        prompts = cond if cond is not None else [""] * b
        if isinstance(prompts, str):
            prompts = [prompts] * b
        tokens = jnp.asarray(self._encode_text(prompts))
        uncond = jnp.asarray(self._encode_text([negative_prompt] * b))
        size = (image.shape[1], image.shape[2])
        fn = self._get_jitted(
            "inpainting",
            num_steps=num_steps,
            guidance_scale=guidance_scale,
            size=size,
            force_repaint=use_raw_inpainting,
            ref_fidelity=reference_fidelity if use_background_guidance else None,
        )
        key = jax.random.PRNGKey(seed or 0)
        sampled = fn(
            nnx.state(self.m),
            self._shard_batch_arg(tokens),
            self._shard_batch_arg(uncond),
            self._shard_batch_arg(jnp.asarray(image)),
            self._shard_batch_arg(jnp.asarray(mask)),
            key,
        )
        if crop_ctx is not None:
            out = recover_masked_area(
                np.clip(np.asarray(sampled), -1.0, 1.0),
                crop_ctx,
                settings,
                original_u8=original_u8,
            )
        else:
            out = _to_uint8(sampled)
        if keep_original:
            # paste_original (reference :813-838): original pixels win where
            # mask < 0.5, faded over `keep_original_fade` pixels
            if original_u8 is not None:
                orig_u8 = original_u8
            else:
                orig_f = crop_ctx.original_image if crop_ctx is not None else image
                orig_u8 = _to_uint8(jnp.asarray(orig_f))
            alpha2d = full_mask[0, :, :, 0]
            if keep_original_fade:
                f = int(keep_original_fade)
                alpha2d = _box_blur(alpha2d, (f, f))
            alpha = alpha2d[None, :, :, None]
            blended = out.astype(np.float32) * alpha + orig_u8.astype(np.float32) * (1.0 - alpha)
            blended_u8 = np.clip(np.round(blended), 0, 255).astype(np.uint8)
            untouched = alpha2d == 0.0
            blended_u8[:, untouched] = orig_u8[:, untouched]
            out = blended_u8
        if export_path is not None:
            self._export(out, export_path)
        return out

    def txt2img_inpainting(
        self,
        txt: Union[str, List[str]],
        image: np.ndarray,
        mask: np.ndarray,
        **kwargs: Any,
    ) -> np.ndarray:
        """Text-guided inpainting (reference :768). Thin front over
        `inpainting` — same flavor dispatch (9-channel inpainting UNet vs
        repaint), plus the reference's `use_raw_inpainting` /
        `use_background_guidance` / `keep_original(_fade)` /
        `inpainting_settings` keywords, all accepted via **kwargs."""
        return self.inpainting(image, mask, cond=txt, **kwargs)

    def semantic2img(
        self,
        semantic: np.ndarray,
        *,
        num_steps: int = 20,
        seed: Optional[int] = None,
        **kwargs: Any,
    ) -> np.ndarray:
        """Segmentation-map → image via CONCAT conditioning (reference :1111;
        requires an LDM trained with concat semantic conditioning).

        Accepts either a class-index map (integer (H, W) / (B, H, W) array,
        path, or grayscale PIL image — one-hotted to the condition model's
        `in_channels`, the reference's behavior) or an already-one-hot float
        (B, H, W, C) array. Values stay {0, 1}: the reference feeds raw
        one-hot maps, NOT [-1, 1]-normalized images (reference :1134-1144,
        `read_image(..., normalize=False)` + `F.one_hot`)."""
        from ...modules.multimodal.diffusion.utils import CONCAT_TYPE

        if self.m.condition_type != CONCAT_TYPE:
            raise ValueError("`semantic2img` requires a concat-conditioned LDM")
        if isinstance(semantic, str) or (
            not isinstance(semantic, np.ndarray) and hasattr(semantic, "getbands")
        ):
            from PIL import Image  # type: ignore

            img = semantic if not isinstance(semantic, str) else Image.open(semantic)
            semantic = np.asarray(img.convert("L"))
        semantic = np.asarray(semantic)
        # class-index maps have no channel axis: (H, W) or (B, H, W).
        # Integer (…, C) arrays are already-one-hot (dtype alone cannot
        # distinguish a uint8 one-hot from an index map).
        num_classes = getattr(self.m.condition_model, "in_channels", None)
        is_index_map = np.issubdtype(semantic.dtype, np.integer) and (
            semantic.ndim <= 2
            or (semantic.ndim == 3 and semantic.shape[-1] != (num_classes or -1))
        )
        if is_index_map:
            if num_classes is None:
                num_classes = int(semantic.max()) + 1
            semantic = np.eye(num_classes, dtype=np.float32)[semantic]
        if semantic.ndim == 3:
            semantic = semantic[None]
        semantic = semantic.astype(np.float32)
        b, h, w, _ = semantic.shape
        graphdef, state = nnx.split(self.m)
        sampler_name, sampler_config = self.sampler_name, dict(self.sampler_config)

        @jax.jit
        def _run(st, sem, key):
            m = nnx.merge(graphdef, st)
            cond = m.get_cond(sem)
            sampler = ISampler.make(sampler_name, dict(sampler_config, model=m))
            z = jax.random.normal(key, (b, cond.shape[1], cond.shape[2], m.out_channels))
            latents = sampler.sample(z, cond=cond, num_steps=num_steps, key=key)
            return m.decode(latents)

        key = jax.random.PRNGKey(seed or 0)
        if self.m.condition_model is not None:
            # a condition model (SpatialRescaler in the reference semantic
            # LDM) owns the map→latent-resolution scaling — feed it full-res
            sem_lat = jnp.asarray(semantic)
        else:
            # rescaler-less concat models: downscale to latent resolution
            sem_lat = jax.image.resize(
                jnp.asarray(semantic), (b, h // 8, w // 8, semantic.shape[-1]), "nearest"
            )
        return _to_uint8(_run(nnx.state(self.m), sem_lat, key))

    def sr(
        self,
        image: np.ndarray,
        *,
        num_steps: int = 20,
        seed: Optional[int] = None,
        **kwargs: Any,
    ) -> np.ndarray:
        """Diffusion super-resolution via concat conditioning on the LR image
        (reference `sr`; requires an LDM-SR checkpoint)."""
        from ...modules.multimodal.diffusion.utils import CONCAT_TYPE

        if self.m.condition_type != CONCAT_TYPE:
            raise ValueError("`sr` requires a concat-conditioned LDM (ldm.sr)")
        image = self._norm_image(image)
        b, h, w, c = image.shape
        graphdef, state = nnx.split(self.m)
        sampler_name, sampler_config = self.sampler_name, dict(self.sampler_config)
        up = 4

        @jax.jit
        def _run(st, img, key):
            m = nnx.merge(graphdef, st)
            lr_up = jax.image.resize(img, (b, h * up, w * up, c), "bicubic")
            sampler = ISampler.make(sampler_name, dict(sampler_config, model=m))
            z = jax.random.normal(key, (b, h * up, w * up, m.out_channels))
            latents = sampler.sample(z, cond=lr_up, num_steps=num_steps, key=key)
            return m.decode(latents) if m.first_stage is not None else latents

        key = jax.random.PRNGKey(seed or 0)
        return _to_uint8(_run(nnx.state(self.m), jnp.asarray(image), key))

    def outpainting(
        self,
        image: Any,
        second: Any = None,
        *,
        anchor: str = "center",
        **kwargs: Any,
    ) -> np.ndarray:
        """Outpainting, both calling conventions:

        * reference (:956): `outpainting(txt, rgba_image)` — the RGBA alpha
          channel IS the mask (transparent = generate), routed through
          `txt2img_inpainting`;
        * pad mode: `outpainting(image, cond=...)` — pad the canvas by 25%
          per side and inpaint the border."""
        if isinstance(image, str) and second is not None:
            txt = image
            from PIL import Image  # type: ignore

            pil = Image.open(second) if isinstance(second, str) else second
            if not isinstance(pil, np.ndarray) and pil.mode != "RGBA":
                raise ValueError("`image` should be `RGBA` in outpainting")
            arr = np.asarray(pil)
            rgb, alpha = arr[..., :3], arr[..., 3]
            mask = (255 - alpha.astype(np.int32)).astype(np.uint8)
            return self.txt2img_inpainting(txt, rgb, (mask > 127).astype(np.float32), **kwargs)
        image = self._norm_image(image)
        b, h, w, c = image.shape
        pad_h, pad_w = h // 4, w // 4
        canvas = np.zeros((b, h + 2 * pad_h, w + 2 * pad_w, c), dtype=np.float32)
        canvas[:, pad_h : pad_h + h, pad_w : pad_w + w] = image
        mask = np.ones((b, h + 2 * pad_h, w + 2 * pad_w, 1), dtype=np.float32)
        mask[:, pad_h : pad_h + h, pad_w : pad_w + w] = 0.0
        return self.inpainting(canvas, mask, **kwargs)

    # ---------------------------------------------------------------- utils

    @staticmethod
    def _norm_image(image: Any) -> np.ndarray:
        # paths / PIL images load through `read_image` (reference accepts
        # them everywhere via `cftool.cv.read_image`); [0,1] → [-1,1]
        if isinstance(image, str) or (
            not isinstance(image, np.ndarray) and hasattr(image, "getbands")
        ):
            from .utils import read_image

            return (read_image(image, None).image * 2.0 - 1.0).astype(np.float32)
        image = np.asarray(image)
        if image.ndim == 3:
            image = image[None]
        if image.dtype == np.uint8:
            image = _from_uint8(image)
        return image.astype(np.float32)

    @staticmethod
    def _export(images: np.ndarray, path: str) -> None:
        try:
            from PIL import Image  # type: ignore

            if images.shape[0] == 1:
                Image.fromarray(images[0]).save(path)
            else:
                for i, img in enumerate(images):
                    stem, _, suffix = path.rpartition(".")
                    Image.fromarray(img).save(f"{stem}_{i}.{suffix}")
        except ImportError:
            np.save(path + ".npy", images)

    # ----------------------------------------------------------- construct

    @classmethod
    def from_sd(
        cls,
        version: str = "v1",
        *,
        pretrained: bool = False,
        use_bf16: bool = True,
        **kwargs: Any,
    ) -> "DiffusionAPI":
        """reference :1372 — build (optionally pretrained) SD."""
        from ...zoo.common import load_sd

        m = load_sd(version, pretrained=pretrained)
        return cls(m, use_bf16=use_bf16, **kwargs)

    @classmethod
    def from_sd_inpainting(cls, *, pretrained: bool = False, use_bf16: bool = True, **kwargs: Any) -> "DiffusionAPI":
        from ...zoo.common import load_sd

        m = load_sd("v1_inpainting", pretrained=pretrained)
        return cls(m, use_bf16=use_bf16, **kwargs)

    @classmethod
    def from_inpainting(cls, *, pretrained: bool = False, use_bf16: bool = True, ldm_kwargs: Optional[Dict[str, Any]] = None, **kwargs: Any) -> "DiffusionAPI":
        """reference :1419 — the concat-conditioned LDM inpainting model
        (`zoo.ldm_inpainting`: 7 latent channels, attention-free VQ first
        stage, resblock resampling)."""
        from ...zoo.common import ldm_inpainting

        m = ldm_inpainting(pretrained=pretrained, **(ldm_kwargs or {}))
        return cls(m, use_bf16=use_bf16, **kwargs)

    @classmethod
    def from_semantic(cls, *, pretrained: bool = False, use_bf16: bool = True, ldm_kwargs: Optional[Dict[str, Any]] = None, **kwargs: Any) -> "DiffusionAPI":
        """reference :1436 — the semantic-map LDM (`zoo.ldm_semantic`:
        182-channel one-hot maps through a SpatialRescaler, concat cond)."""
        from ...zoo.common import ldm_semantic

        m = ldm_semantic(pretrained=pretrained, **(ldm_kwargs or {}))
        return cls(m, use_bf16=use_bf16, **kwargs)


class ControlledDiffusionAPI(DiffusionAPI):
    """Multi-ControlNet txt2img (reference :1670-1880): lazily-loaded control
    branches keyed by hint name, per-hint scales, annotator integration."""

    def __init__(self, m: LDM, **kwargs: Any) -> None:
        super().__init__(m, **kwargs)
        self.controls: Dict[str, Any] = {}
        self.control_scales: Dict[str, float] = {}
        self.annotators: Dict[str, Any] = {}
        self._control_enabled = True

    def prepare_control(self, hint: str, control_net: Any) -> None:
        """reference :1760 — register a ControlNet branch for a hint type."""
        self.controls[hint] = control_net
        self.control_scales.setdefault(hint, 1.0)

    def switch_control(self, *hints: str) -> None:
        """reference :1798 — keep only the given hints active."""
        self.controls = {h: c for h, c in self.controls.items() if h in hints}
        self._jit_cache.clear()

    def enable_control(self) -> None:
        """reference :1892."""
        self._control_enabled = True

    def disable_control(self) -> None:
        """reference :1895 — `sample_with_control` falls back to plain
        sampling while disabled."""
        self._control_enabled = False

    def prepare_annotator(self, hint: str, **kwargs: Any) -> None:
        """reference :1849 — build (and cache) the annotator for a hint type
        so repeated `get_hint_of` calls reuse loaded weights."""
        from ..cv.annotator import Annotator

        if hint not in self.annotators:
            self.annotators[hint] = Annotator.make(hint, kwargs)

    def prepare_annotators(self) -> None:
        """reference :1862 — prepare every annotator with a registered
        control branch."""
        for hint in self.controls:
            try:
                self.prepare_annotator(hint)
            except KeyError:
                pass  # control without a matching annotator (e.g. custom tag)

    def get_hint_of(self, hint: str, image: np.ndarray, **kwargs: Any) -> np.ndarray:
        """reference :1866 — run the registered annotator for a hint type.
        Per-call kwargs go to `annotate` (construction kwargs belong to
        `prepare_annotator`)."""
        self.prepare_annotator(hint)
        return self.annotators[hint].annotate(image, **kwargs)

    def sample_with_control(
        self,
        num_samples: int,
        hint_images: Dict[str, np.ndarray],
        *,
        cond: Optional[Union[str, List[str]]] = None,
        negative_prompt: str = "",
        size: Tuple[int, int] = (512, 512),
        num_steps: int = 20,
        guidance_scale: float = 7.5,
        seed: Optional[int] = None,
        hint_starts: Optional[Dict[str, float]] = None,
        hint_ends: Optional[Dict[str, float]] = None,
        **kwargs: Any,
    ) -> np.ndarray:
        """Multi-ControlNet sampling (reference `diffusion.py:1760-1866`):
        every prepared hint in `hint_images` runs simultaneously; residuals
        are summed with per-hint scales; optional per-hint start/end step
        gating (fractions in [0, 1])."""
        if not self._control_enabled:
            return self.sample(
                num_samples, cond=cond, negative_prompt=negative_prompt,
                size=size, num_steps=num_steps, guidance_scale=guidance_scale,
                seed=seed, **kwargs,
            )
        names = list(hint_images)
        nets = []
        for name in names:
            control_net = self.controls.get(name)
            if control_net is None:
                raise ValueError(f"control '{name}' is not prepared")
            nets.append(control_net)
        prompts = cond if cond is not None else [""] * num_samples
        if isinstance(prompts, str):
            prompts = [prompts] * num_samples
        tokens = jnp.asarray(self._encode_text(prompts))
        uncond_tokens = jnp.asarray(self._encode_text([negative_prompt] * num_samples))
        hints = [jnp.asarray(self._norm_image(hint_images[n])) for n in names]
        m = self.m
        graphdef, state = nnx.split(m)
        c_split = [nnx.split(cn) for cn in nets]
        c_graphdefs = [gd for gd, _ in c_split]
        c_states = [st for _, st in c_split]
        n_levels = len(nets[0].unet.input_chans) + 2
        scales = [[self.control_scales.get(n, 1.0)] * n_levels for n in names]
        starts = [None if not hint_starts else hint_starts.get(n) for n in names]
        ends = [None if not hint_ends else hint_ends.get(n) for n in names]
        gating = any(s is not None for s in starts) or any(e is not None for e in ends)
        sampler_name, sampler_config = self.sampler_name, dict(self.sampler_config)

        @jax.jit
        def _run(st, csts, tokens, uncond_tokens, hints, key):
            mm = nnx.merge(graphdef, st)
            cns = [nnx.merge(gd, cst) for gd, cst in zip(c_graphdefs, csts)]
            cond_e = mm.get_cond(tokens)
            uncond_e = mm.get_cond(uncond_tokens) if guidance_scale != 1.0 else None
            sampler = ISampler.make(sampler_name, dict(sampler_config, model=mm))
            z = jax.random.normal(key, (num_samples, size[0] // 8, size[1] // 8, mm.out_channels))
            gate_kw = (
                {"control_hint_start": starts, "control_hint_end": ends} if gating else {}
            )
            latents = sampler.sample(
                z, cond=cond_e, uncond=uncond_e, guidance_scale=guidance_scale,
                num_steps=num_steps, key=key,
                control_net=cns, control_hint=hints,
                control_scales=scales,
                **gate_kw,
            )
            return mm.decode(latents)

        key = jax.random.PRNGKey(seed or 0)
        return _to_uint8(_run(state, c_states, tokens, uncond_tokens, hints, key))
