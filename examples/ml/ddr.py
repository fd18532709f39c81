"""DDR (distribution regression) on a synthetic heteroscedastic task
(reference `examples/ml/ddr`): train quantile/CDF heads, then use the
DDRPredictor/DDRVisualizer API to extract medians, quantile bands, and CDF
plots."""

import argparse
import os
import tempfile

import numpy as np


def main(ci: bool) -> None:
    import jax

    if ci:
        jax.config.update("jax_platforms", "cpu")
    import cflearn_tpu as cf
    from cflearn_tpu.api.ml import DDRPredictor, DDRVisualizer

    rng = np.random.RandomState(0)
    x = rng.uniform(-2, 2, (512, 1)).astype(np.float32)
    y = (np.sin(x) + (0.1 + 0.2 * np.abs(x)) * rng.randn(512, 1)).astype(np.float32)

    workspace = tempfile.mkdtemp(prefix="ddr_")
    config = cf.MLConfig(module_name="ddr", loss_name="ddr", workspace=workspace)
    if ci:
        config.to_debug()
    else:
        config.num_epoch = 40
    p = cf.fit_ml(x, y, config=config)

    ddr = p.model.m["module"] if hasattr(p.model.m, "__getitem__") else p.model.m
    pred = DDRPredictor(ddr)
    med = pred.median(x[:8])
    q = pred.quantile(x[:8], [0.1, 0.5, 0.9])
    print("median:", med.ravel()[:4], "q shape:", q.shape)

    viz = DDRVisualizer(ddr)
    out = viz.visualize_quantiles(x, y, os.path.join(workspace, "quantiles.png"))
    print("saved:", out)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--ci", type=int, default=0)
    main(bool(parser.parse_args().ci))
