"""Distributed titanic training (reference
`examples/ml/titanic/run_titanic_ddp.py`): the training task runs as TWO
cooperating processes through `dist.launch.run_distributed` (the
`run_accelerate` replacement — jax.distributed + the data mesh instead of
DDP), then the parent process loads the trained pipeline from the latest
workspace and writes a `submission.csv` exactly like the reference does.
"""

import argparse
import csv
import os
import sys
import tempfile
import textwrap

import numpy as np


def make_csv(path: str, n: int, seed: int, labeled: bool) -> None:
    rng = np.random.default_rng(seed)
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        header = ["PassengerId", "pclass", "sex", "age", "fare"]
        w.writerow(header + (["survived"] if labeled else []))
        for i in range(n):
            pclass = int(rng.integers(1, 4))
            sex = rng.choice(["male", "female"])
            age = f"{rng.uniform(1, 80):.1f}"
            fare = f"{rng.uniform(5, 500):.2f}"
            row = [900 + i, pclass, sex, age, fare]
            if labeled:
                p = 0.8 if (sex == "female" and pclass < 3) else 0.25
                row.append(int(rng.random() < p))
            w.writerow(row)


def main(ci: bool) -> None:
    import jax

    if ci:
        jax.config.update("jax_platforms", "cpu")
    import cflearn_tpu as cf
    from cflearn_tpu.dist.launch import run_distributed

    folder = tempfile.mkdtemp(prefix="titanic_ddp_")
    train_file = os.path.join(folder, "train.csv")
    test_file = os.path.join(folder, "test.csv")
    make_csv(train_file, 160, seed=0, labeled=True)
    make_csv(test_file, 40, seed=1, labeled=False)
    workspace_root = os.path.join(folder, "_titanic_ddp")

    # the per-rank training task (reference `_titanic_task.py`) — every rank
    # derives the SAME sub-workspace (the launcher pins CFLEARN_TPU_RUN_TS)
    task_file = os.path.join(folder, "_titanic_task.py")
    with open(task_file, "w") as f:
        f.write(textwrap.dedent(f"""
            import os
            import jax
            if os.environ.get("CFLEARN_TPU_FORCE_CPU") == "1":
                jax.config.update("jax_platforms", "cpu")
            import sys
            sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))!r})
            import cflearn_tpu as cf
            from cflearn_tpu.parallel.mesh import maybe_initialize_distributed

            maybe_initialize_distributed()
            config = cf.MLConfig(
                module_name="fcnn",
                workspace={workspace_root!r},
                mesh={{"data": jax.process_count()}},
            )
            if {ci!r}:
                config.to_debug()
            cf.fit_ml({train_file!r}, config=config)
        """))

    code = run_distributed(
        task_file, num_processes=2, coordinator_port=23471, force_cpu=ci
    )
    assert code == 0, f"distributed training failed with exit code {code}"

    latest = cf.toolkit.get_latest_workspace(workspace_root)
    assert latest is not None
    m = cf.load_inference(os.path.join(str(latest), "pipeline"))
    classes = m.predict(test_file, return_classes=True)[cf.PREDICTIONS_KEY]
    with open(test_file, "r") as f:
        f.readline()
        id_list = [line.strip().split(",")[0] for line in f]
    submission = os.path.join(folder, "submission.csv")
    with open(submission, "w") as f:
        f.write("PassengerId,Survived\n")
        for test_id, c in zip(id_list, np.asarray(classes).ravel()):
            f.write(f"{test_id},{c}\n")
    print("wrote", submission, "with", len(id_list), "rows")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--ci", type=int, default=0)
    main(bool(parser.parse_args().ci))
