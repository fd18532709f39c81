"""Model-family end-to-end 1-step trainings + sampler checks (reference
analogue: `tests/test_cv_example.py` --ci runs)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import nnx

from cflearn_tpu.data import ArrayData
from cflearn_tpu.monitors import LazyMonitor
from cflearn_tpu.schema import DLConfig, TrainerConfig
from cflearn_tpu.schema.model import IDLModel
from cflearn_tpu.trainer import Trainer


@pytest.fixture(scope="module")
def image_data():
    np.random.seed(0)
    x = np.random.rand(32, 16, 16, 3).astype(np.float32) * 2 - 1
    return ArrayData.init().fit(x)


def _train(config: DLConfig, data, tmp_path) -> Trainer:
    model = IDLModel.from_config(config)
    trainer = Trainer(
        TrainerConfig(workspace=str(tmp_path), fixed_steps=2, callback_names=[]),
        monitors=[LazyMonitor()],
    )
    trainer.fit(data, model)
    assert trainer.state is not None and trainer.state.step == 2
    return trainer


def test_gan_training(image_data, tmp_path) -> None:
    config = DLConfig(
        model="gan",
        module_name="gan",
        module_config={
            "img_size": 16,
            "latent_dim": 16,
            "latent_resolution": 4,
            "discriminator_config": {"num_layers": 2, "start_channels": 16},
        },
    )
    trainer = _train(config, image_data, tmp_path)
    # two scopes → per-scope losses logged
    assert any(k.startswith("core_") for k in (trainer.intermediate.metric_values if trainer.intermediate else {}))


def test_vae_training(image_data, tmp_path) -> None:
    config = DLConfig(model="vae", module_name="vae", module_config={"img_size": 16, "latent_dim": 8, "num_downsample": 2})
    _train(config, image_data, tmp_path)


def test_vq_vae_training(image_data, tmp_path) -> None:
    config = DLConfig(model="vq_vae", module_name="vq_vae", module_config={"img_size": 16, "latent_channels": 16, "num_code": 32})
    _train(config, image_data, tmp_path)


def test_ddpm_training_with_ema(image_data, tmp_path) -> None:
    config = DLConfig(
        model="ddpm",
        module_name="ddpm",
        module_config={
            "img_size": 16,
            "in_channels": 3,
            "out_channels": 3,
            "num_timesteps": 50,
            "ema_decay": 0.99,
            "unet_config": {
                "start_channels": 32,
                "num_res_blocks": 1,
                "channel_multipliers": (1, 2),
                "attention_downsample_rates": (2,),
                "num_heads": 4,
                "context_dim": None,
                "use_spatial_transformer": False,
            },
        },
    )
    trainer = _train(config, image_data, tmp_path)
    # EMA counter advanced inside the jitted step
    assert int(trainer.model.ema.num_updates.value) == 2


def test_ae_kl_adversarial_training(image_data, tmp_path) -> None:
    config = DLConfig(
        model="ae_kl",
        module_name="ae_kl",
        module_config={
            "img_size": 16,
            "inner_channels": 32,
            "z_channels": 2,
            "embedding_channels": 2,
            "channel_multipliers": [1, 2],
            "use_perceptual": False,
        },
    )
    _train(config, image_data, tmp_path)


def test_classifier_training(tmp_path) -> None:
    np.random.seed(0)
    x = np.random.rand(32, 16, 16, 1).astype(np.float32)
    y = np.random.randint(0, 3, (32, 1))
    data = ArrayData.init().fit(x, y)
    config = DLConfig(
        module_name="clf",
        module_config={"img_size": 16, "in_channels": 1, "num_classes": 3, "latent_dim": 32},
        loss_name="cross_entropy",
    )
    _train(config, data, tmp_path)


def test_all_samplers_finite() -> None:
    from cflearn_tpu.modules.multimodal.diffusion import DDPM, ISampler

    ddpm = DDPM(
        img_size=8,
        in_channels=3,
        out_channels=3,
        num_timesteps=20,
        unet_config=dict(
            start_channels=32,
            num_res_blocks=1,
            channel_multipliers=(1, 2),
            attention_downsample_rates=(),
            num_heads=4,
            context_dim=None,
            use_spatial_transformer=False,
        ),
        rngs=nnx.Rngs(0),
    )
    z = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 3))
    for name in sorted(ISampler.d):
        sampler = ISampler.make(name, {"model": ddpm})
        out = sampler.sample(z, num_steps=3)
        assert out.shape == z.shape, name
        assert bool(jnp.isfinite(out).all()), name


def test_sampling_inside_jit() -> None:
    """Samplers must work when the model state is a traced jit argument
    (the DiffusionAPI / bench path)."""
    from cflearn_tpu.modules.multimodal.diffusion import DDPM, ISampler

    ddpm = DDPM(
        img_size=8,
        in_channels=3,
        out_channels=3,
        num_timesteps=20,
        unet_config=dict(
            start_channels=32,
            num_res_blocks=1,
            channel_multipliers=(1, 2),
            attention_downsample_rates=(),
            num_heads=4,
            context_dim=None,
            use_spatial_transformer=False,
        ),
        rngs=nnx.Rngs(0),
    )
    graphdef, state = nnx.split(ddpm)

    @jax.jit
    def run(st, z):
        m = nnx.merge(graphdef, st)
        sampler = ISampler.make("ddim", {"model": m})
        return sampler.sample(z, num_steps=3)

    z = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 3))
    out = run(state, z)
    assert bool(jnp.isfinite(out).all())


def test_img_siren() -> None:
    from cflearn_tpu.modules.cv.classifier import ImgSiren

    siren = ImgSiren(img_size=8, latent_dim=16, num_layers=2, rngs=nnx.Rngs(0))
    out = siren()
    img = siren.to_image(out)
    assert img.shape == (1, 8, 8, 3)


def test_rrdb_upscales() -> None:
    from cflearn_tpu.modules.cv.classifier import RRDBNet

    net = RRDBNet(latent_channels=8, growth_channels=4, num_blocks=1, rngs=nnx.Rngs(0))
    out = net(jnp.ones((1, 8, 8, 3)))
    assert out.shape == (1, 32, 32, 3)
