"""Subprocess task entrypoint (reference `cflearn/dist/ml/runs/basic.py` —
load task → rebuild data + config → `MLTrainingPipeline.fit`)."""

import argparse
import os
import sys


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--task_folder", type=str, default=os.environ.get("CFLEARN_TPU_TASK_FOLDER"))
    args = parser.parse_args()
    task_folder = args.task_folder
    assert task_folder, "--task_folder is required"

    if os.environ.get("CFLEARN_TPU_FORCE_CPU") == "1":
        import jax

        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass

    from cflearn_tpu.dist.ml.experiment import Experiment, Task
    from cflearn_tpu.pipeline.api import MLTrainingPipeline
    from cflearn_tpu.schema.config import MLConfig

    task = Task.load(task_folder)
    config = MLConfig()
    config.from_info(task.config)
    config.workspace = task_folder
    config.create_sub_workspace = False
    assert task.data_folder is not None, "task has no data folder"
    data = Experiment.fetch_data(task.data_folder)
    pipeline = MLTrainingPipeline.init(config)
    pipeline.fit(data)
    return 0


if __name__ == "__main__":
    sys.exit(main())
