"""Experiment-parallel training (reference `examples/run_multiple/`):
`repeat_ml` trains N copies of one config through the Experiment scheduler
(each task gets its own chip subset via TPU_VISIBLE_CHIPS in real runs);
`run_multiple` re-runs only buggy tasks with `is_fix=True`."""

import argparse
import os
import shutil


def main(ci: bool) -> None:
    import jax

    if ci:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    import cflearn_tpu as cf

    rng = np.random.RandomState(0)
    x = rng.randn(200, 6).astype(np.float32)
    y = (x[:, :2].sum(1, keepdims=True) > 0).astype(np.int64)

    ws = "_run_multiple"
    shutil.rmtree(ws, ignore_errors=True)
    config = cf.MLConfig(module_name="fcnn", callback_names=[])
    if ci:
        config.fixed_steps = 1

    results = cf.api.repeat_ml(
        x, y, config=config, workspace=ws,
        num_repeat=2 if ci else 5, num_jobs=1,
    )
    pipelines = results.load_pipelines()
    accs = []
    for key, p in pipelines.items():
        preds = p.predict(x[:50], return_classes=True)[cf.PREDICTIONS_KEY]
        accs.append(float((preds == y[:50]).mean()))
    print("repeat_ml tasks finished:", len(pipelines), "accs:", [round(a, 3) for a in accs])


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--ci", type=int, default=0)
    main(bool(parser.parse_args().ci))
