#!/usr/bin/env bash
# Egress-day runbook (VERDICT r4 missing #1): ONE command that executes the
# entire network-gated surface the zero-egress build environment could never
# run. Run this the first time the machine has internet access.
#
#   bash scripts/egress_day.sh [--chip]
#
# Without --chip everything runs on the CPU backend (conversion parity and
# CLIP-score math do not need the TPU); with --chip the quality harness runs
# on the real chip, making its rows the actual BASELINE.md north-star
# measurement (speed multiplier AND CLIP-score quality clause in one
# artifact).
#
# Expected wall time (first run, downloads included):
#   downloads        ~6 GB (SD-1.5 ~4GB, CLIP ViT-B/32 ~600MB, CLIP ViT-L/14
#                    via HF for the SD text encoder, ESRGAN ~67MB, VGG16+
#                    LPIPS ~550MB, annotator nets) — bandwidth bound
#   step 1 (tests)   ~15-30 min on CPU (4 conversion-parity tests vs HF)
#   step 2 (quality) ~20 min CPU / ~10 min chip (compiles cached afterwards)
#   step 3 (sha)     seconds (audits cached files only)
# Re-runs skip the downloads (cache at ~/.cache/cflearn_tpu).
set -euo pipefail
cd "$(dirname "$0")/.."

CHIP=0
[ "${1:-}" = "--chip" ] && CHIP=1

export CFLEARN_ALLOW_DOWNLOADS=1

echo "== [1/4] real-checkpoint conversion parity (SD / CLIP / ESRGAN vs HF)"
python -m pytest tests/test_real_checkpoints.py -v -q

echo "== [2/4] quality harness with pretrained SD + CLIP scoring"
echo "   (north-star clause: faithful/accelerated CLIP-score parity vs lossless)"
if [ "$CHIP" = 1 ]; then
  CFLEARN_QH_PRETRAINED=1 CFLEARN_QH_CLIP=1 python scripts/quality_harness.py
else
  CFLEARN_QH_PRETRAINED=1 CFLEARN_QH_CLIP=1 JAX_PLATFORMS=cpu python - <<'PY'
# the axon plugin ignores JAX_PLATFORMS env; pin CPU via config
import jax
jax.config.update("jax_platforms", "cpu")
import runpy
runpy.run_path("scripts/quality_harness.py", run_name="__main__")
PY
fi

echo "== [3/4] LPIPS real-weight path (VGG16 + linear heads download+convert)"
python - <<'PY'
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from cflearn_tpu.losses.lpips import LPIPSLoss

loss = LPIPSLoss(pretrained=True)  # downloads + converts on first call
a = jnp.zeros((1, 64, 64, 3)); b = jnp.ones((1, 64, 64, 3)) * 0.5
v = loss.forward(a, b)
assert float(v) > 0, float(v)
print(f"LPIPS real weights OK (lpips(0, 0.5)={float(v):.4f})")
PY

echo "== [4/4] zoo sha audit of every downloaded checkpoint"
python - <<'PY'
from cflearn_tpu.toolkit.misc import check_sha_with, get_download_cache_dir
from cflearn_tpu.zoo.common import get_available

cache = get_download_cache_dir()
checked = missing = bad = 0
index = get_available().get("checkpoints", {})
for tag, info in sorted(index.items()):
    fname = info.get("name") or info["url"].split("/")[-1]
    path = cache / fname
    if not path.is_file():
        missing += 1
        continue
    sha = info.get("sha")
    if not sha:
        print(f"  {tag}: cached, no pinned sha (trust-on-first-use records it)")
        checked += 1
        continue
    if check_sha_with(str(path), sha):
        checked += 1
    else:
        bad += 1
        print(f"  SHA MISMATCH: {tag} ({path})")
print(f"sha audit: {checked} ok, {missing} not downloaded, {bad} mismatched")
raise SystemExit(1 if bad else 0)
PY

echo "== egress day complete — see docs/quality_sd15.json for the north-star rows"
