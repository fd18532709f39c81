"""ControlNet hint annotators.

Parity: reference `cflearn/api/cv/annotator.py:29` — `Annotator` registry
with depth (MiDaS), canny (cv2), pose (OpenPose), mlsd, softedge (HED), pidi.
Round-1 ships the dependency-light annotators (canny via cv2, sobel softedge,
grayscale-gradient depth proxy); the learned annotators (MiDaS/OpenPose/
MLSD/HED/PiDi) are conversion targets for their vendored nets (SURVEY.md
§7.4 — ported lazily).
"""

from typing import Any, Dict

import numpy as np

from ...toolkit.registry import WithRegister


class Annotator(WithRegister):
    d: Dict[str, type] = {}

    def annotate(self, image: np.ndarray, **kwargs: Any) -> np.ndarray:
        """uint8 HWC (or NHWC) in → uint8 hint image out."""
        raise NotImplementedError

    @staticmethod
    def _norm(image: np.ndarray) -> np.ndarray:
        image = np.asarray(image)
        if image.dtype != np.uint8:
            image = (np.clip(image, 0, 1) * 255).astype(np.uint8) if image.max() <= 1.5 else image.astype(np.uint8)
        return image


@Annotator.register("canny")
class CannyAnnotator(Annotator):
    def __init__(self, low_threshold: int = 100, high_threshold: int = 200) -> None:
        self.low = low_threshold
        self.high = high_threshold

    def annotate(self, image: np.ndarray, **kwargs: Any) -> np.ndarray:
        import cv2

        image = self._norm(image)
        squeeze = image.ndim == 3
        batch = image[None] if squeeze else image
        outs = []
        for img in batch:
            edges = cv2.Canny(img, self.low, self.high)
            outs.append(np.repeat(edges[..., None], 3, axis=-1))
        out = np.stack(outs)
        return out[0] if squeeze else out


@Annotator.register("softedge")
class SoftEdgeAnnotator(Annotator):
    """Soft edges: the HED net when a checkpoint is available (reference
    vendored `third_party/hed.py`), else sobel magnitude."""

    def __init__(self, hed_ckpt: Any = None) -> None:
        self._hed = None
        if hed_ckpt:
            from .third_party.hed import load_hed

            self._hed = load_hed(hed_ckpt)

    def annotate(self, image: np.ndarray, **kwargs: Any) -> np.ndarray:
        if self._hed is not None:
            import jax.numpy as jnp

            img = self._norm(image).astype(np.float32)
            squeeze = img.ndim == 3
            batch = img[None] if squeeze else img
            edge = np.asarray(self._hed(jnp.asarray(batch)))
            out = np.repeat((edge * 255).astype(np.uint8), 3, axis=-1)
            return out[0] if squeeze else out
        return self._sobel(image)

    def _sobel(self, image: np.ndarray, **kwargs: Any) -> np.ndarray:
        import cv2

        image = self._norm(image)
        squeeze = image.ndim == 3
        batch = image[None] if squeeze else image
        outs = []
        for img in batch:
            gray = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
            gx = cv2.Sobel(gray, cv2.CV_32F, 1, 0)
            gy = cv2.Sobel(gray, cv2.CV_32F, 0, 1)
            mag = np.sqrt(gx**2 + gy**2)
            mag = (255 * mag / max(mag.max(), 1e-6)).astype(np.uint8)
            outs.append(np.repeat(mag[..., None], 3, axis=-1))
        out = np.stack(outs)
        return out[0] if squeeze else out


@Annotator.register("depth")
class DepthAnnotator(Annotator):
    """Blur-based pseudo-depth (MiDaS conversion is a later-round target)."""

    def annotate(self, image: np.ndarray, **kwargs: Any) -> np.ndarray:
        import cv2

        image = self._norm(image)
        squeeze = image.ndim == 3
        batch = image[None] if squeeze else image
        outs = []
        for img in batch:
            gray = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY).astype(np.float32)
            blurred = cv2.GaussianBlur(gray, (21, 21), 0)
            depth = 255.0 - blurred
            depth = (255 * (depth - depth.min()) / max(float(np.ptp(depth)), 1e-6)).astype(np.uint8)
            outs.append(np.repeat(depth[..., None], 3, axis=-1))
        out = np.stack(outs)
        return out[0] if squeeze else out


@Annotator.register("pose")
class PoseAnnotator(Annotator):
    """Body pose hints via the OpenPose net (reference vendored
    `third_party/openpose/`); requires a converted `body_pose_model`
    checkpoint — raises a clear error otherwise."""

    def __init__(self, ckpt: Any = None) -> None:
        self._net = None
        if ckpt:
            from .third_party.openpose import load_openpose

            self._net = load_openpose(ckpt)

    def annotate(self, image: np.ndarray, **kwargs: Any) -> np.ndarray:
        if self._net is None:
            raise ValueError(
                "pose annotation needs a converted body_pose_model checkpoint "
                "(Annotator.make('pose', {'ckpt': path}))"
            )
        import jax.numpy as jnp

        from .third_party.openpose import render_keypoints

        img = self._norm(image).astype(np.float32) / 255.0 - 0.5
        squeeze = img.ndim == 3
        batch = img[None] if squeeze else img
        _, heatmaps = self._net(jnp.asarray(batch))
        out = render_keypoints(np.asarray(heatmaps), batch.shape[1:3])
        return out[0] if squeeze else out


class ControlNetHints:
    """Hint-type enum (reference `ControlNetHints`, :1662)."""

    canny = "canny"
    depth = "depth"
    softedge = "softedge"
    pose = "pose"
    mlsd = "mlsd"
