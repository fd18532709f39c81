"""Model-specific image callbacks.

Parity: reference `cflearn/callbacks/` — `GeneratorCallback`
(`generator.py:19-25`, registered for ldm/ddpm/ae_kl/ae_vq/vae/gan: dumps
samples + reconstructions each artifact step), `VQVAECallback`
(`vq_vae.py:19`), `ImageClassificationCallback` (`classification.py:14`),
`SigmoidCallback`.
"""

import os
from typing import Any, Optional

import numpy as np

from ..constants import INPUT_KEY, LABEL_KEY, PREDICTIONS_KEY
from ..schema.train_schema import TrainerCallback
from .general import ArtifactCallback


def save_image_grid(images: np.ndarray, path: str, *, value_range: str = "tanh") -> None:
    """Save an NHWC batch as a grid (PIL if available, else .npy)."""
    images = np.asarray(images)
    if value_range == "tanh":
        images = (np.clip(images, -1, 1) + 1) * 127.5
    elif images.dtype != np.uint8:
        # auto-scale float images: [0,1]-normalized and standardized inputs
        # would otherwise clip to near-black
        lo, hi = float(images.min()), float(images.max())
        if hi <= 1.0 + 1e-6 and lo >= -1e-6:
            images = images * 255.0
        elif lo < 0.0 or hi <= 16.0:
            images = (images - lo) / max(hi - lo, 1e-6) * 255.0
        else:
            images = np.clip(images, 0, 255)
    images = images.astype(np.uint8)
    n = images.shape[0]
    cols = int(np.ceil(np.sqrt(n)))
    rows = int(np.ceil(n / cols))
    h, w, c = images.shape[1:]
    grid = np.zeros((rows * h, cols * w, c), dtype=np.uint8)
    for i, img in enumerate(images):
        r, cc = divmod(i, cols)
        grid[r * h : (r + 1) * h, cc * w : (cc + 1) * w] = img
    try:
        from PIL import Image  # type: ignore

        if c == 1:
            grid = grid[..., 0]
        Image.fromarray(grid).save(path)
    except ImportError:
        np.save(path + ".npy", grid)


@TrainerCallback.register("generator")
@TrainerCallback.register("ldm")
@TrainerCallback.register("ddpm")
@TrainerCallback.register("ae_kl")
@TrainerCallback.register("ae_vq")
@TrainerCallback.register("vae")
@TrainerCallback.register("gan")
class GeneratorCallback(ArtifactCallback):
    """Sample + reconstruct grids per artifact step."""

    key = "images"
    num_samples = 4

    def log_artifacts(self, trainer: Any) -> None:
        if not self.is_local_rank_0:
            return
        folder = self._prepare_folder(trainer)
        if folder is None:
            return
        model = trainer.model
        batch = trainer.train_loader.get_one_batch()
        original = np.asarray(batch[INPUT_KEY])[: self.num_samples]
        save_image_grid(original, os.path.join(folder, "original.png"))
        m = model.m
        try:
            if hasattr(m, "sample"):
                sampled = np.asarray(m.sample(self.num_samples, num_steps=10)) if "num_steps" in m.sample.__code__.co_varnames else np.asarray(m.sample(self.num_samples))
                save_image_grid(sampled, os.path.join(folder, "sampled.png"))
        except Exception:  # noqa: BLE001 — sampling is best-effort here
            pass
        try:
            outputs = model.run({INPUT_KEY: original}, training=False)
            recon = outputs.get(PREDICTIONS_KEY)
            if recon is not None and np.asarray(recon).shape == original.shape:
                save_image_grid(np.asarray(recon), os.path.join(folder, "reconstructed.png"))
        except Exception:  # noqa: BLE001
            pass


@TrainerCallback.register("vq_vae")
class VQVAECallback(ArtifactCallback):
    """originals + reconstructions + codebook visualizations, all from the
    SAME batch so the dumped indices match the images (reference
    `callbacks/vq_vae.py:19` — incl. the per-class `codes/conditional/`
    grids when `num_classes` is configured)."""

    key = "images"
    num_samples = 4

    def __init__(self, *args: Any, num_classes: Optional[int] = None, **kwargs: Any) -> None:
        super().__init__(*args, **kwargs)
        self.num_classes = num_classes

    def log_artifacts(self, trainer: Any) -> None:
        if not self.is_local_rank_0:
            return
        folder = self._prepare_folder(trainer)
        if folder is None:
            return
        batch = trainer.train_loader.get_one_batch()
        original = np.asarray(batch[INPUT_KEY])[: self.num_samples]
        run_batch = dict(batch)
        run_batch[INPUT_KEY] = original
        labels = run_batch.get(LABEL_KEY)
        if labels is not None:
            run_batch[LABEL_KEY] = np.asarray(labels)[: self.num_samples]
        save_image_grid(original, os.path.join(folder, "original.png"))
        outputs = trainer.model.run(run_batch, training=False)
        recon = outputs.get(PREDICTIONS_KEY)
        if recon is not None and np.asarray(recon).shape == original.shape:
            save_image_grid(np.asarray(recon), os.path.join(folder, "reconstructed.png"))
        indices = outputs.get("indices")
        if indices is not None:
            np.save(os.path.join(folder, "code_indices.npy"), np.asarray(indices))
        m = getattr(trainer.model, "m", None)
        if m is None or not hasattr(m, "sample_codebook"):
            return
        from ..toolkit.misc import make_indices_visualization_map

        code_folder = os.path.join(folder, "codes")
        os.makedirs(code_folder, exist_ok=True)
        codes, sampled_indices = m.sample_codebook(num_samples=len(original))
        save_image_grid(np.asarray(codes), os.path.join(code_folder, "codes.png"))
        indices_map = make_indices_visualization_map(sampled_indices)
        save_image_grid(indices_map, os.path.join(code_folder, "code_indices.png"))
        if self.num_classes is not None:
            for i in range(self.num_classes):
                i_folder = os.path.join(code_folder, "conditional", str(i))
                os.makedirs(i_folder, exist_ok=True)
                codes, ci = m.sample_codebook(num_samples=len(original), class_idx=i)
                save_image_grid(np.asarray(codes), os.path.join(i_folder, "codes.png"))
                ci_map = make_indices_visualization_map(ci)
                save_image_grid(ci_map, os.path.join(i_folder, "code_indices.png"))


@TrainerCallback.register("image_classification")
class ImageClassificationCallback(ArtifactCallback):
    key = "images"

    def log_artifacts(self, trainer: Any) -> None:
        if not self.is_local_rank_0:
            return
        folder = self._prepare_folder(trainer)
        if folder is None:
            return
        batch = trainer.train_loader.get_one_batch()
        original = np.asarray(batch[INPUT_KEY])[:16]
        save_image_grid(original, os.path.join(folder, "batch.png"), value_range="raw")


@TrainerCallback.register("sigmoid")
class SigmoidCallback(ArtifactCallback):
    key = "images"

    def log_artifacts(self, trainer: Any) -> None:
        if not self.is_local_rank_0:
            return
        folder = self._prepare_folder(trainer)
        if folder is None:
            return
        batch = trainer.train_loader.get_one_batch()
        outputs = trainer.model.run({INPUT_KEY: np.asarray(batch[INPUT_KEY])[:4]}, training=False)
        preds = outputs.get(PREDICTIONS_KEY)
        if preds is not None:
            probs = 1.0 / (1.0 + np.exp(-np.asarray(preds)))
            save_image_grid(probs * 2 - 1, os.path.join(folder, "probabilities.png"))


# reference base-class name (`callbacks/general.py:250` ImageCallback — the
# artifact callback that rasterizes image grids)
ImageCallback = GeneratorCallback
