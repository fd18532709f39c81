"""CV runtime data blocks — host-side, numpy-native preprocessing.

Parity: reference `cflearn/data/blocks/cv/` — stateless runtime blocks
`TupleToBatchBlock`/`ToNumpyBlock`/`ToRGBBlock`/`HWCToCHWBlock`/
`FlattenBlock` (`blocks/common.py:70`), normalize blocks
`StaticNormalizeBlock`/`AffineNormalizeBlock`/`ImagenetNormalizeBlock`
(`cv/normalize.py:11-47`), resize/crop `ResizeBlock`/`AnchoredResizeBlock`/
`CenterCropBlock`/`RandomCropBlock` (`cv/resize.py:22-44`, `cv/crop.py:14-39`
— albumentations in the reference, numpy/PIL here), base
`IRuntimeDataBlock` (`blocks/common.py:26`).

TPU-native: arrays stay channel-LAST (NHWC) — `ToHWCBlock` replaces the
reference's `HWCToCHWBlock` conversion direction (torch wants CHW, XLA wants
HWC).
"""

from typing import Any, Dict, List, Tuple

import numpy as np

from ...constants import INPUT_KEY, LABEL_KEY
from ...schema.data import IDataBlock, INoInitDataBlock


class IRuntimeDataBlock(INoInitDataBlock):
    """Stateless per-item transforms (reference `blocks/common.py:26-66`)."""

    def postprocess_item(self, item: Any, for_inference: bool) -> Any:
        if isinstance(item, dict) and INPUT_KEY in item:
            item[INPUT_KEY] = self.process(item[INPUT_KEY], for_inference)
        return item

    def process(self, net: np.ndarray, for_inference: bool) -> np.ndarray:
        raise NotImplementedError


@IDataBlock.register("tuple_to_batch")
class TupleToBatchBlock(INoInitDataBlock):
    def postprocess_item(self, item: Any, for_inference: bool) -> Any:
        if isinstance(item, (tuple, list)) and len(item) == 2:
            return {INPUT_KEY: np.asarray(item[0]), LABEL_KEY: np.asarray(item[1])}
        return item


@IDataBlock.register("to_numpy")
class ToNumpyBlock(IRuntimeDataBlock):
    def process(self, net: Any, for_inference: bool) -> np.ndarray:
        return np.asarray(net)


@IDataBlock.register("to_rgb")
class ToRGBBlock(IRuntimeDataBlock):
    def process(self, net: np.ndarray, for_inference: bool) -> np.ndarray:
        if net.ndim == 2:
            net = net[..., None]
        c_axis = -1
        if net.shape[c_axis] == 1:
            net = np.repeat(net, 3, axis=c_axis)
        elif net.shape[c_axis] == 4:
            net = net[..., :3]
        return net


@IDataBlock.register("to_hwc")
class ToHWCBlock(IRuntimeDataBlock):
    """CHW → HWC when needed (TPU-native channel-last layout)."""

    def process(self, net: np.ndarray, for_inference: bool) -> np.ndarray:
        if net.ndim == 3 and net.shape[0] in (1, 3, 4) and net.shape[-1] not in (1, 3, 4):
            return np.transpose(net, (1, 2, 0))
        if net.ndim == 4 and net.shape[1] in (1, 3, 4) and net.shape[-1] not in (1, 3, 4):
            return np.transpose(net, (0, 2, 3, 1))
        return net


@IDataBlock.register("hwc_to_chw")
class HWCToCHWBlock(IRuntimeDataBlock):
    """Kept for reference parity (torch-layout export)."""

    def process(self, net: np.ndarray, for_inference: bool) -> np.ndarray:
        if net.ndim == 3:
            return np.transpose(net, (2, 0, 1))
        if net.ndim == 4:
            return np.transpose(net, (0, 3, 1, 2))
        return net


@IDataBlock.register("flatten")
class FlattenBlock(IRuntimeDataBlock):
    def process(self, net: np.ndarray, for_inference: bool) -> np.ndarray:
        if net.ndim >= 3:
            return net.reshape(net.shape[0], -1) if net.ndim == 4 else net.reshape(-1)
        return net


# ----------------------------------------------------------------------------
# normalize
# ----------------------------------------------------------------------------

@IDataBlock.register("static_normalize")
class StaticNormalizeBlock(IDataBlock):
    """x / div (reference `cv/normalize.py:11`)."""

    @property
    def fields(self) -> List[str]:
        return ["div"]

    @property
    def init_fields(self) -> Dict[str, Any]:
        return {"div": 255.0}

    def postprocess_item(self, item: Any, for_inference: bool) -> Any:
        if isinstance(item, dict) and INPUT_KEY in item:
            item[INPUT_KEY] = np.asarray(item[INPUT_KEY]).astype(np.float32) / self.div
        return item


@IDataBlock.register("affine_normalize")
class AffineNormalizeBlock(IDataBlock):
    """(x - center) / scale (reference `cv/normalize.py`)."""

    @property
    def fields(self) -> List[str]:
        return ["center", "scale"]

    @property
    def init_fields(self) -> Dict[str, Any]:
        return {"center": 0.5, "scale": 0.5}

    def postprocess_item(self, item: Any, for_inference: bool) -> Any:
        if isinstance(item, dict) and INPUT_KEY in item:
            net = np.asarray(item[INPUT_KEY]).astype(np.float32)
            item[INPUT_KEY] = (net - self.center) / self.scale
        return item


@IDataBlock.register("imagenet_normalize")
class ImagenetNormalizeBlock(INoInitDataBlock):
    mean = np.array([0.485, 0.456, 0.406], dtype=np.float32)
    std = np.array([0.229, 0.224, 0.225], dtype=np.float32)

    def postprocess_item(self, item: Any, for_inference: bool) -> Any:
        if isinstance(item, dict) and INPUT_KEY in item:
            net = np.asarray(item[INPUT_KEY]).astype(np.float32)
            if net.max() > 2.0:
                net = net / 255.0
            item[INPUT_KEY] = (net - self.mean) / self.std
        return item


# ----------------------------------------------------------------------------
# resize / crop
# ----------------------------------------------------------------------------

def _resize(net: np.ndarray, size: Tuple[int, int], interpolation: str = "bilinear") -> np.ndarray:
    import jax
    import jax.numpy as jnp

    squeeze = net.ndim == 3
    if squeeze:
        net = net[None]
    out = jax.image.resize(
        jnp.asarray(net.astype(np.float32)),
        (net.shape[0], size[0], size[1], net.shape[-1]),
        method=interpolation,
    )
    out_np = np.asarray(out)
    return out_np[0] if squeeze else out_np


@IDataBlock.register("resize")
class ResizeBlock(IDataBlock):
    @property
    def fields(self) -> List[str]:
        return ["size", "interpolation"]

    @property
    def init_fields(self) -> Dict[str, Any]:
        return {"size": 224, "interpolation": "bilinear"}

    def postprocess_item(self, item: Any, for_inference: bool) -> Any:
        if isinstance(item, dict) and INPUT_KEY in item:
            size = (self.size, self.size) if isinstance(self.size, int) else tuple(self.size)
            item[INPUT_KEY] = _resize(np.asarray(item[INPUT_KEY]), size, self.interpolation)
        return item


@IDataBlock.register("anchored_resize")
class AnchoredResizeBlock(IDataBlock):
    """Resize the short side to `anchor`, keeping aspect ratio."""

    @property
    def fields(self) -> List[str]:
        return ["anchor", "interpolation"]

    @property
    def init_fields(self) -> Dict[str, Any]:
        return {"anchor": 256, "interpolation": "bilinear"}

    def postprocess_item(self, item: Any, for_inference: bool) -> Any:
        if isinstance(item, dict) and INPUT_KEY in item:
            net = np.asarray(item[INPUT_KEY])
            h, w = net.shape[-3], net.shape[-2]
            short = min(h, w)
            ratio = self.anchor / short
            size = (int(round(h * ratio)), int(round(w * ratio)))
            item[INPUT_KEY] = _resize(net, size, self.interpolation)
        return item


def _crop(net: np.ndarray, top: int, left: int, size: Tuple[int, int]) -> np.ndarray:
    if net.ndim == 3:
        return net[top : top + size[0], left : left + size[1]]
    return net[:, top : top + size[0], left : left + size[1]]


@IDataBlock.register("center_crop")
class CenterCropBlock(IDataBlock):
    @property
    def fields(self) -> List[str]:
        return ["size"]

    @property
    def init_fields(self) -> Dict[str, Any]:
        return {"size": 224}

    def postprocess_item(self, item: Any, for_inference: bool) -> Any:
        if isinstance(item, dict) and INPUT_KEY in item:
            net = np.asarray(item[INPUT_KEY])
            size = (self.size, self.size) if isinstance(self.size, int) else tuple(self.size)
            h, w = net.shape[-3], net.shape[-2]
            top = max(0, (h - size[0]) // 2)
            left = max(0, (w - size[1]) // 2)
            item[INPUT_KEY] = _crop(net, top, left, size)
        return item


@IDataBlock.register("random_crop")
class RandomCropBlock(IDataBlock):
    @property
    def fields(self) -> List[str]:
        return ["size"]

    @property
    def init_fields(self) -> Dict[str, Any]:
        return {"size": 224}

    def postprocess_item(self, item: Any, for_inference: bool) -> Any:
        if isinstance(item, dict) and INPUT_KEY in item:
            net = np.asarray(item[INPUT_KEY])
            size = (self.size, self.size) if isinstance(self.size, int) else tuple(self.size)
            h, w = net.shape[-3], net.shape[-2]
            if for_inference:
                top = max(0, (h - size[0]) // 2)
                left = max(0, (w - size[1]) // 2)
            else:
                top = np.random.randint(0, max(1, h - size[0] + 1))
                left = np.random.randint(0, max(1, w - size[1] + 1))
            item[INPUT_KEY] = _crop(net, top, left, size)
        return item
