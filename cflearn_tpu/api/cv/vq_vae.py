"""`VQVAEInference` — train an auto-regressive prior over a trained VQ-VAE's
code indices, then sample images.

Parity: reference `cflearn/api/cv/vq_vae.py:91` — pack the VQ-VAE training
workspace, export code indices for the whole dataset, fit the prior (e.g.
"pixel_cnn") on the codes, and register a temp callback that dumps
original/sampled grids (per-class conditional folders + code interpolations
when `num_classes` is given, reference :29-89).
"""

import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ...constants import INPUT_KEY, LABEL_KEY, PREDICTIONS_KEY
from ...schema.config import DLConfig
from ...schema.data import DataConfig
from ...schema.data import IData
from ...schema.train_schema import TrainerCallback
from ...toolkit.misc import random_hash


def register_callback(vqvae: Any, num_classes: Optional[int]) -> str:
    """Reference `api/cv/vq_vae.py:29` — a throwaway callback bound to the
    loaded (frozen) VQ-VAE."""
    from ...callbacks.general import ArtifactCallback
    from ...callbacks.generator import save_image_grid

    tmp_name = random_hash()

    @TrainerCallback.register(tmp_name)
    class _VQVAEInferenceCallback(ArtifactCallback):
        key = "images"
        num_interpolations = 16

        def log_artifacts(self, trainer: Any) -> None:
            if not self.is_local_rank_0:
                return
            folder = self._prepare_folder(trainer)
            if folder is None:
                return
            loader = trainer.valid_loader or trainer.train_loader
            batch = loader.get_one_batch()
            original_indices = np.asarray(batch[INPUT_KEY])
            labels = batch.get(LABEL_KEY)
            labels = None if labels is None else jnp.asarray(labels)
            img_size = original_indices.shape[1 if original_indices.ndim == 3 else 2]
            batch_size = original_indices.shape[0]
            m = trainer.model.m  # the auto-regressive prior
            sampled_indices = m.sample(batch_size, img_size=img_size, labels=labels)
            original = vqvae.reconstruct_from(jnp.asarray(original_indices), labels=labels)
            sampled = vqvae.reconstruct_from(sampled_indices[..., 0], labels=labels)
            save_image_grid(np.asarray(original), os.path.join(folder, "original.png"))
            save_image_grid(np.asarray(sampled), os.path.join(folder, "sampled.png"))
            if num_classes is None:
                return
            ni = self.num_interpolations
            cond_folder = os.path.join(folder, "conditional")
            os.makedirs(cond_folder, exist_ok=True)
            for i in range(num_classes):
                i_indices = m.sample(batch_size, img_size=img_size, class_idx=i)
                i_sampled = vqvae.reconstruct_from(i_indices[..., 0], class_idx=i)
                save_image_grid(
                    np.asarray(i_sampled), os.path.join(cond_folder, f"sampled_{i}.png")
                )
                i1 = m.sample(ni, img_size=img_size, class_idx=i)
                i2 = m.sample(ni, img_size=img_size, class_idx=i)
                z1, z2 = vqvae.get_code(i1[..., 0]), vqvae.get_code(i2[..., 0])
                ratio = jnp.linspace(0.0, 1.0, ni).reshape(-1, 1, 1, 1)
                z_q = ratio * z1 + (1.0 - ratio) * z2
                i_labels = jnp.full((ni,), i, dtype=jnp.int32)
                interpolations = vqvae.decode(z_q, labels=i_labels)
                save_image_grid(
                    np.asarray(interpolations),
                    os.path.join(cond_folder, f"interpolation_{i}.png"),
                )

    return tmp_name


class VQVAEInference:
    """Reference `api/cv/vq_vae.py:91`. Unlike the reference (class-level
    `tmp_callback_name` — a second instance deregisters the first's callback
    and breaks its later `fit`), the temp callback registration is
    per-instance here."""

    def __init__(
        self,
        config: DLConfig,
        *,
        workspace: str,
        vqvae_log_folder: str,
        num_classes: Optional[int] = None,
        device: Any = None,
    ) -> None:
        from ..api import load_inference, pack

        self.config = config
        self.num_classes = num_classes
        packed_path = os.path.join(str(vqvae_log_folder), "packed")
        pack(str(vqvae_log_folder), packed_path)
        self.vqvae = load_inference(packed_path).model.m
        self.code_export_folder = os.path.join(workspace, "codes")
        self.tmp_callback_name = register_callback(self.vqvae, num_classes)
        callback_names = config.callback_names or []
        if not isinstance(callback_names, list):
            callback_names = [callback_names]
        # copy — never mutate the caller's list in place
        config.callback_names = list(callback_names) + [self.tmp_callback_name]
        self.pipeline: Any = None
        # NOTE: the temp registration is intentionally NOT removed on
        # garbage collection — reloading the fitted workspace later rebuilds
        # callbacks by name and must still resolve it

    # code export -------------------------------------------------------------

    def export_code_indices(self, data: IData, export_folder: str) -> None:
        os.makedirs(export_folder, exist_ok=True)
        finished_path = os.path.join(export_folder, "__finished__")
        if os.path.isfile(finished_path):
            return
        graphdef, state = nnx.split(self.vqvae)
        encode_fn = jax.jit(
            lambda st, net: nnx.merge(graphdef, st).get_code_indices(net)
        )
        loaders = data.get_loaders()
        for name, loader in zip(["train", "valid"], loaders):
            if loader is None:
                continue
            labels = []
            code_indices = []
            for batch in loader:
                y = batch.get(LABEL_KEY)
                if y is not None:
                    labels.append(np.asarray(y))
                net = jnp.asarray(batch[INPUT_KEY])
                code_indices.append(np.asarray(encode_fn(state, net)))
                if getattr(self.config, "is_debug", False):
                    break
            all_codes = np.concatenate(code_indices, axis=0)
            np.save(os.path.join(export_folder, f"{name}.npy"), all_codes)
            if labels:
                all_labels = np.concatenate(labels, axis=0)
                np.save(os.path.join(export_folder, f"{name}_labels.npy"), all_labels)
        if not getattr(self.config, "is_debug", False):
            with open(finished_path, "w"):
                pass

    # fit ---------------------------------------------------------------------

    def fit(self, images: IData, data_config: Optional[DataConfig] = None) -> "VQVAEInference":
        from ...data.array import ArrayData
        from ...pipeline.api import DLTrainingPipeline

        export_folder = self.code_export_folder
        self.export_code_indices(images, export_folder)

        def _load(name: str) -> Optional[np.ndarray]:
            path = os.path.join(export_folder, f"{name}.npy")
            return np.load(path) if os.path.isfile(path) else None

        x_train, y_train = _load("train"), _load("train_labels")
        x_valid, y_valid = _load("valid"), _load("valid_labels")
        tensor_data = ArrayData.init(data_config)
        tensor_data = tensor_data.fit(x_train, y_train, x_valid, y_valid)
        self.pipeline = DLTrainingPipeline.init(self.config).fit(tensor_data)
        return self

    # sampling (convenience on top of the reference surface) ------------------

    @property
    def prior(self) -> Optional[Any]:
        if self.pipeline is None:
            return None
        return self.pipeline.model.m

    def decode_indices(self, indices: np.ndarray, **kwargs: Any) -> np.ndarray:
        return np.asarray(self.vqvae.decode_indices(jnp.asarray(indices), **kwargs))

    def reconstruct(self, images: np.ndarray) -> np.ndarray:
        out = self.vqvae(jnp.asarray(images))
        return np.asarray(out[PREDICTIONS_KEY])

    def sample(
        self,
        num_samples: int,
        *,
        class_idx: Optional[int] = None,
        key: Optional[jax.Array] = None,
    ) -> np.ndarray:
        res = self.vqvae.latent_resolution
        prior = self.prior
        if prior is not None:
            indices = prior.sample(num_samples, img_size=res, class_idx=class_idx, key=key)[..., 0]
            labels = prior.get_sample_labels(num_samples, class_idx) if prior.is_conditional else None
            return np.asarray(self.vqvae.decode_indices(indices, labels=labels))
        rng = np.random.RandomState(
            0 if key is None else int(jax.random.randint(key, (), 0, 2**31 - 1))
        )
        indices = rng.randint(0, self.vqvae.num_codes, (num_samples, res, res))
        if class_idx is not None:
            labels = jnp.full((num_samples,), class_idx, dtype=jnp.int32)
            return np.asarray(self.vqvae.decode_indices(jnp.asarray(indices), labels=labels))
        return np.asarray(self.vqvae.decode_indices(jnp.asarray(indices)))
