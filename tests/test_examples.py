"""Example-driven smoke tests (reference `tests/test_cv_example.py` /
`test_ml_example.py` — shell out with --ci 1)."""

import os
import subprocess
import sys

import pytest

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")



pytestmark = pytest.mark.slow  # shells out every example script

def _run(path: str) -> None:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    repo_root = os.path.abspath(os.path.join(EXAMPLES, ".."))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    result = subprocess.run(
        [sys.executable, os.path.join(EXAMPLES, path), "--ci", "1"],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
        cwd="/tmp",
    )
    assert result.returncode == 0, f"{path} failed:\n{result.stdout[-2000:]}\n{result.stderr[-3000:]}"


@pytest.mark.parametrize(
    "path",
    [
        "ml/iris.py",
        "ml/toy.py",
        "ml/california.py",
        "ml/titanic.py",
        "ml/titanic_interpret.py",
        "ml/ddr.py",
        "ml/operations.py",
        "ml/run_multiple.py",
        "ml/iris_sklearn.py",
        "ml/california_mlflow.py",
        "ml/titanic_ddp.py",
        "cv/digits_clf.py",
        "cv/vae.py",
        "cv/cvae.py",
        "cv/vq_vae.py",
        "cv/vq_vae_inference.py",
        "cv/ae_kl.py",
        "cv/ae_vq.py",
        "cv/gan.py",
        "cv/ddpm.py",
        "cv/ldm.py",
        "cv/ldm_vq.py",
        "multimodal/sd_txt2img.py",
        "multimodal/sd_img2img.py",
        "multimodal/sd_controlnet.py",
        "multimodal/sd_style_reference.py",
        "multimodal/sd_lora.py",
        "multimodal/clip_zero_shot.py",
        "multimodal/clip_chinese.py",
        "multimodal/clip_open_clip.py",
        "cv/third_party_inference.py",
    ],
)
def test_example(path: str) -> None:
    _run(path)
