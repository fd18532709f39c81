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


def test_gan_wgangp_and_conditional(tmp_path) -> None:
    """Regression (code review): only the vanilla GAN loss existed — lsgan /
    wgangp (+ gradient penalty) and the class-conditional discriminator head
    (reference `GANLoss`/`GradientNormLoss`, `models/cv/gan.py:35-82`) were
    silently ignored."""
    from cflearn_tpu.models.cv.gan import gan_loss

    logits = jnp.array([0.5, -1.5, 2.0])
    np.testing.assert_allclose(
        np.asarray(gan_loss(logits, True, mode="lsgan")),
        np.mean((np.asarray(logits) - 1.0) ** 2),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(gan_loss(logits, True, mode="wgangp")),
        -np.mean(np.asarray(logits)),
        rtol=1e-6,
    )

    np.random.seed(1)
    x = np.random.rand(32, 16, 16, 3).astype(np.float32) * 2 - 1
    y = np.random.randint(0, 4, (32, 1)).astype(np.int64)
    data = ArrayData.init().fit(x, y)
    config = DLConfig(
        model="gan",
        module_name="gan",
        module_config={
            "img_size": 16,
            "latent_dim": 16,
            "latent_resolution": 4,
            "num_classes": 4,
            "discriminator_config": {"num_layers": 2, "start_channels": 16},
        },
        loss_config={"gan_mode": "wgangp", "lambda_gp": 5.0},
    )
    trainer = _train(config, data, tmp_path)
    mv = trainer.intermediate.metric_values if trainer.intermediate else {}
    assert any("d_gp" in k for k in mv), mv.keys()
    assert any("g_cond" in k for k in mv), mv.keys()
    for v in mv.values():
        assert np.isfinite(v)


def test_vae_training(image_data, tmp_path) -> None:
    config = DLConfig(model="vae", module_name="vae", module_config={"img_size": 16, "latent_dim": 8, "num_downsample": 2})
    _train(config, image_data, tmp_path)


def test_vq_vae_training(image_data, tmp_path) -> None:
    config = DLConfig(model="vq_vae", module_name="vq_vae", module_config={"img_size": 16, "latent_channels": 16, "num_code": 32})
    _train(config, image_data, tmp_path)


def test_conditional_vae_family(tmp_path) -> None:
    """Class-conditional decoding (reference `examples/cv/vae/mnist_cvae.py` /
    `mnist_vq_vae.py` — num_classes + apply_tanh), incl. training through the
    label column and class-swap sensitivity."""
    import jax.numpy as jnp

    np.random.seed(1)
    x = np.random.rand(32, 16, 16, 1).astype(np.float32) * 2 - 1
    y = np.random.randint(0, 4, (32, 1)).astype(np.int64)
    data = ArrayData.init().fit(x, y)

    config = DLConfig(
        model="vae",
        module_name="vae",
        module_config={
            "img_size": 16,
            "in_channels": 1,
            "latent_dim": 8,
            "num_downsample": 2,
            "num_classes": 4,
            "apply_tanh": True,
        },
    )
    trainer = _train(config, data, tmp_path / "cvae")
    m = trainer.model.m
    # tanh bound respected + per-class sampling changes the output
    z = jnp.ones((2, 8))
    img0 = m.decode(z, labels=jnp.array([0, 0]))
    img1 = m.decode(z, labels=jnp.array([1, 1]))
    assert float(jnp.abs(img0).max()) <= 1.0
    assert float(jnp.abs(img0 - img1).max()) > 0.0

    config = DLConfig(
        model="vq_vae",
        module_name="vq_vae",
        module_config={
            "img_size": 16,
            "in_channels": 1,
            "code_dimension": 16,
            "num_codes": 32,
            "num_downsample": 2,
            "num_classes": 4,
            "apply_tanh": True,
        },
    )
    trainer = _train(config, data, tmp_path / "cvq")
    vq = trainer.model.m
    codes, indices = vq.sample_codebook(num_samples=3, class_idx=2)
    assert codes.shape == (3, 16, 16, 1) and indices.shape == (3,)
    assert float(jnp.abs(codes).max()) <= 1.0
    idx = vq.get_code_indices(jnp.asarray(x[:2]))
    rec0 = vq.reconstruct_from(idx, labels=jnp.array([0, 0]))
    rec1 = vq.reconstruct_from(idx, labels=jnp.array([3, 3]))
    assert rec0.shape == (2, 16, 16, 1)
    assert float(jnp.abs(rec0 - rec1).max()) > 0.0


def test_conditional_pixel_cnn_training(tmp_path) -> None:
    """Conditional AR prior over code indices (reference
    `examples/cv/vae/mnist_vq_vae_inference.py`)."""
    import jax.numpy as jnp

    np.random.seed(2)
    codes = np.random.randint(0, 8, (32, 4, 4)).astype(np.int64)
    y = np.random.randint(0, 4, (32, 1)).astype(np.int64)
    data = ArrayData.init().fit(codes, y)
    config = DLConfig(
        model="ar",
        module_name="pixel_cnn",
        module_config={
            "num_codes": 8,
            "img_size": 4,
            "in_channels": 1,
            "latent_channels": 16,
            "num_layers": 2,
            "num_classes": 4,
        },
    )
    trainer = _train(config, data, tmp_path)
    m = trainer.model.m
    sampled = m.sample(2, img_size=4, class_idx=1)
    assert sampled.shape == (2, 4, 4, 1)
    assert int(sampled.max()) < 8 and int(sampled.min()) >= 0


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
    assert int(trainer.model.ema.num_updates[...]) == 2


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


def test_ae_kl_d_loss_start_step_and_adaptive_weight(image_data, tmp_path) -> None:
    """Regression (code review): `d_loss_start_step` was stored but never
    consumed — the adversarial game always ran from step 0 (reference gates
    both steps on it, `models/cv/ae.py:220,339`); `use_adaptive_weight` was
    documented but unimplemented."""
    module_config = {
        "img_size": 16,
        "inner_channels": 32,
        "z_channels": 2,
        "embedding_channels": 2,
        "channel_multipliers": [1, 2],
        "use_perceptual": False,
        "use_adaptive_weight": True,
        "log_var_init": 0.0,
    }

    def run(start_step: int, workspace: str):
        config = DLConfig(
            model="ae_kl",
            module_name="ae_kl",
            module_config={**module_config, "d_loss_start_step": start_step},
        )
        model = IDLModel.from_config(config)
        before = jax.tree_util.tree_map(
            np.asarray, nnx.state(model.discriminator, nnx.Param)
        )
        trainer = Trainer(
            TrainerConfig(workspace=workspace, fixed_steps=2, callback_names=[]),
            monitors=[LazyMonitor()],
        )
        trainer.fit(image_data, model)
        trainer._sync_state_to_model()
        after = jax.tree_util.tree_map(
            np.asarray, nnx.state(trainer.model.discriminator, nnx.Param)
        )
        return before, after

    # never reaches the start step: discriminator must stay bit-identical
    b, a = run(100, str(tmp_path / "late"))
    for lb, la in zip(jax.tree_util.tree_leaves(b), jax.tree_util.tree_leaves(a)):
        np.testing.assert_array_equal(lb, la)
    # starts immediately: discriminator must move (and the adaptive-weight
    # + log_var paths must produce finite, trainable losses)
    b, a = run(0, str(tmp_path / "immediate"))
    moved = any(
        not np.array_equal(lb, la)
        for lb, la in zip(jax.tree_util.tree_leaves(b), jax.tree_util.tree_leaves(a))
    )
    assert moved


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


def test_ddim_guidance_interval() -> None:
    """Guidance-interval CFG (Kynkäänniemi et al. 2024): uncond passes are
    skipped outside the configured band. (0,1) must equal plain CFG exactly;
    (0,0) must equal the no-CFG path; a middle band must differ from both."""
    from cflearn_tpu.modules.multimodal.diffusion import DDPM, ISampler

    ddpm = DDPM(
        img_size=8,
        in_channels=3,
        out_channels=3,
        num_timesteps=20,
        condition_type="adm",
        unet_config=dict(
            start_channels=32,
            num_res_blocks=1,
            channel_multipliers=(1, 2),
            attention_downsample_rates=(),
            num_heads=4,
            context_dim=None,
            use_spatial_transformer=False,
            num_classes=4,
        ),
        rngs=nnx.Rngs(0),
    )
    # de-zero the SD-parity zero-initialized convs (conv_out + resblock
    # conv2s) so the ADM label conditioning actually moves eps
    seed = 1
    for _, mod in nnx.iter_graph(ddpm.unet):
        if isinstance(mod, nnx.Conv) and not np.asarray(mod.kernel[...]).any():
            mod.kernel[...] = 0.1 * jax.random.normal(
                jax.random.PRNGKey(seed), mod.kernel[...].shape
            )
            seed += 1
    z = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 3))
    cond = jnp.asarray([1, 2])
    uncond = jnp.asarray([0, 0])

    def run(interval, scale=3.0):
        s = ISampler.make("ddim", {"model": ddpm, "guidance_interval": interval})
        return s.sample(z, cond=cond, uncond=uncond, guidance_scale=scale, num_steps=4)

    full = run(None)
    np.testing.assert_allclose(np.asarray(run((0.0, 1.0))), np.asarray(full), rtol=1e-6)
    no_cfg = run(None, scale=1.0)
    np.testing.assert_allclose(np.asarray(run((0.0, 0.0))), np.asarray(no_cfg), rtol=1e-6)
    mid = run((0.25, 0.75))
    assert not np.allclose(np.asarray(mid), np.asarray(full))
    assert not np.allclose(np.asarray(mid), np.asarray(no_cfg))
    assert bool(jnp.isfinite(mid).all())

    # euler-family k-samplers honor the interval too (stateless updates)
    def run_k(name, interval, scale=3.0):
        s = ISampler.make(name, {"model": ddpm, "guidance_interval": interval})
        return s.sample(z, cond=cond, uncond=uncond, guidance_scale=scale, num_steps=4)

    for name in ("k_euler", "k_euler_a"):
        k_full = run_k(name, None)
        np.testing.assert_allclose(
            np.asarray(run_k(name, (0.0, 1.0))), np.asarray(k_full), rtol=1e-5
        )
        k_mid = run_k(name, (0.25, 0.75))
        assert not np.allclose(np.asarray(k_mid), np.asarray(k_full)), name
        assert bool(jnp.isfinite(k_mid).all()), name
    # DPM-Solver++(2M) threads its multistep history across segments, so
    # (0,1) is exactly full CFG and a middle band is honored
    dp_full = run_k("k_dpmpp_2m", None)
    np.testing.assert_allclose(
        np.asarray(run_k("k_dpmpp_2m", (0.0, 1.0))), np.asarray(dp_full), rtol=1e-5
    )
    dp_mid = run_k("k_dpmpp_2m", (0.25, 0.75))
    assert not np.allclose(np.asarray(dp_mid), np.asarray(dp_full))
    assert bool(jnp.isfinite(dp_mid).all())
    # PLMS threads its eps history too
    plms_full = run_k("plms", None)
    np.testing.assert_allclose(
        np.asarray(run_k("plms", (0.0, 1.0))), np.asarray(plms_full), rtol=1e-5
    )
    plms_mid = run_k("plms", (0.25, 0.75))
    assert not np.allclose(np.asarray(plms_mid), np.asarray(plms_full))
    assert bool(jnp.isfinite(plms_mid).all())
    # klms + k_heun are segment-safe too: the Lagrange derivative history /
    # the corrector's sigma-derived lookahead timestep thread across
    # segments, so (0,1) is exactly full CFG and a middle band is honored
    for name in ("klms", "k_heun"):
        k_full = run_k(name, None)
        np.testing.assert_allclose(
            np.asarray(run_k(name, (0.0, 1.0))), np.asarray(k_full), rtol=1e-5
        )
        k_mid = run_k(name, (0.25, 0.75))
        assert not np.allclose(np.asarray(k_mid), np.asarray(k_full)), name
        assert bool(jnp.isfinite(k_mid).all()), name
    # exact cross-segment parity: chaining _integrate_carry over a split
    # must reproduce the single-shot integral bit-for-bit semantics
    key = jax.random.PRNGKey(3)
    for name in ("klms", "k_heun", "k_dpmpp_2m"):
        s = ISampler.make(name, {"model": ddpm})
        sigmas, t_of = s._sigmas(6)
        full_out = s._integrate(z, sigmas, t_of, cond, uncond, 3.0, key)
        for split in (1, 3, 5):
            x1, carry = s._integrate_carry(
                z, None, sigmas[: split + 1], t_of[:split], cond, uncond, 3.0, key
            )
            seg_out, _ = s._integrate_carry(
                x1, carry, sigmas[split:], t_of[split:], cond, uncond, 3.0, key
            )
            np.testing.assert_allclose(
                np.asarray(seg_out), np.asarray(full_out), rtol=2e-4, atol=1e-5,
                err_msg=f"{name} split={split}",
            )


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


class _ConstantEpsModel:
    """Stub diffusion with eps(x, t) = const: every consistent ODE sampler
    (DDIM eta=0, DPM-Solver all orders) is EXACT — pred x0 is the same at
    every step — giving a sharp convergence oracle."""

    parameterization = "eps"

    def __init__(self, num_timesteps: int = 1000) -> None:
        import numpy as np

        self.num_timesteps = num_timesteps
        self.schedule_info = {
            "schedule": "linear",
            "num_timesteps": num_timesteps,
            "linear_start": 1e-4,
            "linear_end": 2e-2,
        }
        betas = np.linspace(1e-4**0.5, 2e-2**0.5, num_timesteps) ** 2
        self.acp = np.cumprod(1.0 - betas)
        self.eps_const = jnp.asarray(
            np.random.RandomState(0).randn(1, 4, 4, 2).astype(np.float32)
        )

    def denoise(self, x, t, cond=None, **kwargs):
        return jnp.broadcast_to(self.eps_const, x.shape)

    def predict_eps_from(self, x_t, t, model_out):
        return model_out

    def q_sample(self, x0, t, noise):
        sa = jnp.sqrt(jnp.asarray(self.acp, x0.dtype))[t].reshape(-1, 1, 1, 1)
        return sa * x0 + jnp.sqrt(1.0 - sa**2) * noise


def test_dpm_solver_exact_on_constant_eps() -> None:
    """DPM-Solver orders 1-3 (x0- and eps-prediction, all skip types) must
    recover the analytic solution for a constant-eps field; done-criterion of
    VERDICT #6 (real multistep solver, not a k-sampler alias)."""
    from cflearn_tpu.modules.multimodal.diffusion.samplers import ISampler

    model = _ConstantEpsModel()
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 4, 2))
    c = model.eps_const
    aT = float(np.sqrt(model.acp[-1]))
    x0_true = (z - np.sqrt(1 - aT**2) * c) / aT

    for order in (1, 2, 3):
        for predict_x0 in (True, False):
            for skip in ("time_uniform", "logSNR", "time_quadratic"):
                sampler = ISampler.make(
                    "solver",
                    {"model": model, "order": order, "predict_x0": predict_x0, "skip_type": skip},
                )
                out = sampler.sample(z, num_steps=10)
                t0 = sampler.t0
                a0 = float(sampler._alpha(np.float64(t0)))
                s0 = float(sampler._sigma(np.float64(t0)))
                expected = a0 * x0_true + s0 * c
                np.testing.assert_allclose(
                    np.asarray(out), np.asarray(expected), atol=2e-3,
                    err_msg=f"order={order} predict_x0={predict_x0} skip={skip}",
                )


def test_dpm_solver_beats_ddim_at_low_steps() -> None:
    """On a real (random) tiny UNet: solver@10 closer to ddim@100 than
    ddim@10 is (higher-order multistep convergence)."""
    from cflearn_tpu.modules.multimodal.diffusion import DDPM, ISampler

    ddpm = DDPM(
        img_size=8,
        in_channels=3,
        out_channels=3,
        num_timesteps=100,
        unet_config=dict(
            start_channels=32,
            num_res_blocks=1,
            channel_multipliers=(1,),
            attention_downsample_rates=(),
            num_heads=2,
            context_dim=None,
            use_spatial_transformer=False,
        ),
        rngs=nnx.Rngs(0),
    )
    z = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 3))
    ref = np.asarray(ISampler.make("ddim", {"model": ddpm}).sample(z, num_steps=50))
    ddim10 = np.asarray(ISampler.make("ddim", {"model": ddpm}).sample(z, num_steps=10))
    solver10 = np.asarray(
        ISampler.make("solver", {"model": ddpm, "order": 2}).sample(z, num_steps=10)
    )
    err_ddim = float(np.abs(ddim10 - ref).mean())
    err_solver = float(np.abs(solver10 - ref).mean())
    assert np.isfinite(err_solver)
    assert err_solver < err_ddim, (err_solver, err_ddim)


def test_unet_control_injection_changes_output() -> None:
    """Control residuals must actually alter the UNet output (guards the
    injection indexing in `UNetDiffuser.__call__`; with the init-time zero
    `conv_out` this is only observable after perturbing it)."""
    from cflearn_tpu.modules.multimodal.diffusion.unet import UNetDiffuser

    unet = UNetDiffuser(
        in_channels=4, out_channels=4, start_channels=32, num_res_blocks=1,
        channel_multipliers=(1, 2), attention_downsample_rates=(1,), num_heads=4,
        context_dim=32, rngs=nnx.Rngs(0),
    )
    k = unet.conv_out.kernel[...]
    unet.conv_out.kernel[...] = 0.05 * jax.random.normal(jax.random.PRNGKey(1), k.shape, k.dtype)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 4))
    t = jnp.full((1,), 25)
    ctx = jax.random.normal(jax.random.PRNGKey(3), (1, 77, 32))
    base = unet(x, t, ctx)
    assert float(jnp.abs(base).max()) > 0.0
    n_levels = len(unet.input_blocks) + 2
    # each control level individually must reach the output
    for lv in range(n_levels):
        ctrl = [jnp.zeros(()) for _ in range(n_levels)]
        ctrl[lv] = jnp.zeros(()) + 0.5
        out = unet(x, t, ctx, control=ctrl)
        assert float(jnp.abs(out - base).max()) > 0.0, f"control level {lv} is dead"


def test_unet_remat_variants_match() -> None:
    """`use_checkpoint` in all its forms (off / full remat / selective
    policy string) is a pure memory/schedule knob: forward outputs and
    gradients must be identical (remat recomputes, never changes, values).
    Guards the policy lookup in `UNetDiffuser.__call__.run_block`."""
    from cflearn_tpu.modules.multimodal.diffusion.unet import UNetDiffuser

    def build(use_checkpoint):
        unet = UNetDiffuser(
            in_channels=4, out_channels=4, start_channels=32, num_res_blocks=1,
            channel_multipliers=(1, 2), attention_downsample_rates=(1,),
            num_heads=4, context_dim=32, use_checkpoint=use_checkpoint,
            rngs=nnx.Rngs(0),
        )
        k = unet.conv_out.kernel[...]
        unet.conv_out.kernel[...] = 0.05 * jax.random.normal(
            jax.random.PRNGKey(1), k.shape, k.dtype
        )
        return unet

    x = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 4))
    t = jnp.full((2,), 25)
    ctx = jax.random.normal(jax.random.PRNGKey(3), (2, 77, 32))

    def fwd_and_grad(unet):
        gd, params, rest = nnx.split(unet, nnx.Param, ...)

        def loss_fn(p):
            return jnp.mean(nnx.merge(gd, p, rest)(x, t, ctx) ** 2)

        loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
        gnorm = jnp.sqrt(
            sum(jnp.sum(g**2) for g in jax.tree_util.tree_leaves(grads))
        )
        return float(loss), float(gnorm)

    base_loss, base_gnorm = fwd_and_grad(build(False))
    assert base_gnorm > 0.0
    for variant in (True, "dots_saveable", "dots_with_no_batch_dims_saveable"):
        loss, gnorm = fwd_and_grad(build(variant))
        assert loss == pytest.approx(base_loss, rel=1e-5), variant
        assert gnorm == pytest.approx(base_gnorm, rel=1e-4), variant


def test_ddpm_reconstruct_fidelity_semantics() -> None:
    """Regression (code review): reconstruct inverted fidelity. Higher
    fidelity must stay closer to the input latents."""
    from cflearn_tpu.modules.multimodal.diffusion import DDPM

    ddpm = DDPM(
        img_size=8,
        in_channels=3,
        out_channels=3,
        num_timesteps=50,
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
    x0 = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 3))
    key = jax.random.PRNGKey(1)
    hi = ddpm.reconstruct(x0, fidelity=0.9, num_steps=10, key=key)
    lo = ddpm.reconstruct(x0, fidelity=0.1, num_steps=10, key=key)
    d_hi = float(jnp.mean(jnp.abs(hi - x0)))
    d_lo = float(jnp.mean(jnp.abs(lo - x0)))
    assert d_hi < d_lo
    # sample() must forward the key: different keys → different samples
    a = ddpm.sample(1, size=(8, 8), num_steps=3, key=jax.random.PRNGKey(2))
    b = ddpm.sample(1, size=(8, 8), num_steps=3, key=jax.random.PRNGKey(3))
    assert not bool(jnp.allclose(a, b))


def test_ldm_training_diffuses_in_latent_space(image_data, tmp_path) -> None:
    """LDM training (reference `examples/cv/diffusion/mnist_ldm.py`): the
    train step must encode pixels through the (frozen) first stage and
    diffuse in latent space — and the first stage must not move."""
    config = DLConfig(
        model="ddpm",
        module_name="ldm",
        module_config={
            "img_size": 8,  # 16px images, one downsample -> 8x8 latents
            "in_channels": 4,
            "out_channels": 4,
            "num_timesteps": 50,
            "unet_config": {
                "start_channels": 32,
                "num_res_blocks": 1,
                "channel_multipliers": (1, 2),
                "attention_downsample_rates": (2,),
                "num_heads": 4,
                "context_dim": None,
                "use_spatial_transformer": False,
            },
            "first_stage_config": {
                "img_size": 16,
                "in_channels": 3,
                "out_channels": 3,
                "inner_channels": 32,
                "z_channels": 4,
                "embedding_channels": 4,
                "channel_multipliers": [1, 2],
                "num_res_blocks": 1,
            },
        },
    )
    from cflearn_tpu.schema.model import IDLModel as _IDLModel

    model = _IDLModel.from_config(config)
    import jax as _jax

    fs_before = _jax.tree_util.tree_map(
        np.asarray, _jax.tree_util.tree_leaves(nnx.state(model.m.first_stage, nnx.Param))
    )
    unet_before = np.asarray(model.m.unet.conv_in.kernel[...])
    trainer = Trainer(
        TrainerConfig(workspace=str(tmp_path), fixed_steps=2, callback_names=[]),
        monitors=[LazyMonitor()],
    )
    trainer.fit(image_data, model)
    model2 = trainer.model
    fs_after = _jax.tree_util.tree_map(
        np.asarray, _jax.tree_util.tree_leaves(nnx.state(model2.m.first_stage, nnx.Param))
    )
    for b, a in zip(fs_before, fs_after):
        np.testing.assert_array_equal(b, a)  # first stage frozen
    assert not np.array_equal(unet_before, np.asarray(model2.m.unet.conv_in.kernel[...]))
    # sampled latents decode back to pixel space
    latents = model2.m.sample(2, num_steps=2)
    decoded = model2.m.decode(latents)
    assert latents.shape == (2, 8, 8, 4)
    assert decoded.shape == (2, 16, 16, 3)


def test_ddpm_log_var_and_elbo_options(tmp_path) -> None:
    """learn_log_var (per-timestep learned gamma reweighting) + original
    elbo weight + given_betas + string condition models (reference
    `ddpm.py:166-241, 87`, `models/cv/diffusion.py:74-94`)."""
    import jax as _jax
    import jax.numpy as jnp

    from cflearn_tpu.modules.multimodal.diffusion.ddpm import DDPM, make_condition_model

    unet = {
        "start_channels": 32,
        "num_res_blocks": 1,
        "channel_multipliers": (1, 2),
        "attention_downsample_rates": (2,),
        "num_heads": 4,
        "context_dim": None,
        "use_spatial_transformer": False,
    }
    config = DLConfig(
        model="ddpm",
        module_name="ddpm",
        module_config={
            "img_size": 8,
            "in_channels": 1,
            "out_channels": 1,
            "num_timesteps": 20,
            "learn_log_var": True,
            "unet_config": unet,
        },
        loss_config={"original_elbo_weight": 0.01},
    )
    model = IDLModel.from_config(config)
    batch = {"input": jnp.asarray(np.random.rand(2, 8, 8, 1).astype(np.float32))}
    losses = model.train_steps[0].loss_fn(model, batch, {})
    for key in ("simple", "gamma", "log_var", "vlb", "loss"):
        assert key in losses and np.isfinite(float(losses[key])), key
    # log_var is a trainable Param when learn_log_var
    assert isinstance(model.m.log_var, nnx.Param)

    # given_betas overrides the schedule length
    betas = np.linspace(1e-4, 2e-2, 10)
    d = DDPM(img_size=8, in_channels=1, out_channels=1, given_betas=betas,
             unet_config=unet, rngs=nnx.Rngs(0))
    assert d.num_timesteps == 10 and d.betas[...].shape == (10,)
    assert bool(np.isfinite(np.asarray(d.lvlb_weights[...])).all())

    # string condition model → registry build ("rescaler" w/ channel mapper)
    m = make_condition_model("rescaler", {"num_stages": 2, "in_channels": 6, "out_channels": 3})
    out = m(jnp.zeros((1, 16, 16, 6)))
    assert out.shape == (1, 4, 4, 3)

    # condition model frozen by default (condition_learnable=False)

    config = DLConfig(
        model="ddpm",
        module_name="ddpm",
        module_config={
            "img_size": 8,
            "in_channels": 1,
            "out_channels": 1,
            "num_timesteps": 20,
            "condition_type": "concat",
            "condition_model": "rescaler",
            "condition_config": {"num_stages": 0, "in_channels": 4, "out_channels": 1},
            "unet_config": dict(unet, in_channels=2),
        },
    )
    model = IDLModel.from_config(config)
    mask = nnx.state(model, model.params_filter("all"))
    frozen = [p for p in _jax.tree_util.tree_leaves_with_path(mask) if "condition_model" in str(p[0])]
    assert not frozen


def test_ldm_vq_first_stage(image_data, tmp_path) -> None:
    """VQ-first-stage LDM (reference `examples/cv/diffusion/mnist_ldm_vq.py`
    + `ldm.py:185-191`): `first_stage` given as a zoo/registry name, training
    diffuses over the quantized z_q, the codebook stays frozen."""
    import jax as _jax

    config = DLConfig(
        model="ddpm",
        module_name="ldm",
        module_config={
            "img_size": 8,
            "in_channels": 3,
            "out_channels": 3,
            "num_timesteps": 50,
            "latent_scale": 1.0,
            "first_stage": "ae_vq",  # registry name (reference passes "ae/vq.f4")
            "first_stage_config": {
                "img_size": 16,
                "in_channels": 3,
                "out_channels": 3,
                "inner_channels": 32,
                "z_channels": 3,
                "embedding_channels": 3,
                "num_code": 32,
                "channel_multipliers": [1, 2],
                "num_res_blocks": 1,
            },
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
    from cflearn_tpu.schema.model import IDLModel as _IDLModel

    model = _IDLModel.from_config(config)
    from cflearn_tpu.modules.cv.ae import AutoEncoderVQ

    assert isinstance(model.m.first_stage, AutoEncoderVQ)
    codebook_before = np.asarray(model.m.first_stage.codebook.embedding[...])
    trainer = Trainer(
        TrainerConfig(workspace=str(tmp_path), fixed_steps=2, callback_names=[]),
        monitors=[LazyMonitor()],
    )
    trainer.fit(image_data, model)
    codebook_after = np.asarray(trainer.model.m.first_stage.codebook.embedding[...])
    np.testing.assert_array_equal(codebook_before, codebook_after)
    # encode goes through quantization (z_q), decode returns pixels
    z = trainer.model.m.encode_first_stage(np.zeros((2, 16, 16, 3), np.float32))
    assert z.shape == (2, 8, 8, 3)
    decoded = trainer.model.m.decode(z)
    assert decoded.shape == (2, 16, 16, 3)


def test_review_fixes_conditional_generation() -> None:
    """Regressions from the round-2 review: NHWC code-index squeeze in
    `VQVAE.get_code`, `log_var` sized from the registered schedule under
    `given_betas`, and conditional PixelCNN refusing silent random labels."""
    import jax.numpy as jnp

    from cflearn_tpu.modules.cv.classifier import PixelCNN
    from cflearn_tpu.modules.cv.vae import VQVAE
    from cflearn_tpu.modules.multimodal.diffusion.ddpm import DDPM

    vq = VQVAE(img_size=16, in_channels=1, num_codes=8, code_dimension=16,
               num_downsample=1, rngs=nnx.Rngs(0))
    assert vq.decode_indices(jnp.zeros((2, 8, 8, 1), jnp.int32)).shape == (2, 16, 16, 1)
    assert vq.decode_indices(jnp.zeros((2, 1, 8, 8), jnp.int32)).shape == (2, 16, 16, 1)
    with pytest.raises(ValueError, match="singleton"):
        vq.get_code(jnp.zeros((2, 2, 8, 8), jnp.int32))

    unet = {"start_channels": 32, "num_res_blocks": 1, "channel_multipliers": (1, 2),
            "attention_downsample_rates": (2,), "num_heads": 4,
            "context_dim": None, "use_spatial_transformer": False}
    d = DDPM(img_size=8, in_channels=1, out_channels=1,
             given_betas=np.linspace(1e-4, 2e-2, 10), learn_log_var=True,
             unet_config=unet, rngs=nnx.Rngs(0))
    assert d.log_var[...].shape == (10,)

    pc = PixelCNN(num_codes=8, img_size=4, in_channels=1, latent_channels=16,
                  num_layers=2, num_classes=4, rngs=nnx.Rngs(0))
    with pytest.raises(ValueError, match="labels"):
        pc(jnp.zeros((2, 4, 4), jnp.int32))
