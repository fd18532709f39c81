"""Multi-process experiment scheduler.

Parity: reference `cflearn/dist/ml/` — `Task` (`task.py:16-52`, serializable
config+command; `run` saves a task folder then launches a subprocess) and
`Experiment` (`experiment.py:68-235`, task table keyed `(module, index)`,
data dump/fetch, `run_tasks` → process pool with per-task GPU assignment,
result collection + pipeline reload).

TPU-native: per-task device assignment uses chip subsets via
`JAX_VISIBLE_DEVICES`-style env (`TPU_VISIBLE_CHIPS`) instead of
`CUDA_VISIBLE_DEVICES` (SURVEY.md §2.10); workers force the CPU backend when
no chips are assigned so CI fleets run host-side.
"""

import json
import os
import subprocess
import sys
from concurrent.futures import ProcessPoolExecutor, as_completed
from typing import Any, Dict, List, Optional, Tuple


from ...toolkit.serialization import Serializer

TASK_META_FILE = "__task_meta__.json"
DATA_FOLDER = "__data__"


class Task:
    """One training job: serialized config + data pointer (reference
    `dist/ml/task.py:16`)."""

    def __init__(
        self,
        *,
        config: Optional[Dict[str, Any]] = None,
        run_command: Optional[str] = None,
        data_folder: Optional[str] = None,
        model: Optional[str] = None,
    ) -> None:
        self.config = config or {}
        self.run_command = run_command
        self.data_folder = data_folder
        self.model = model

    def to_info(self) -> Dict[str, Any]:
        return {
            "config": self.config,
            "run_command": self.run_command,
            "data_folder": self.data_folder,
            "model": self.model,
        }

    @classmethod
    def from_info(cls, info: Dict[str, Any]) -> "Task":
        return cls(**info)

    def dump(self, folder: str) -> None:
        os.makedirs(folder, exist_ok=True)
        with open(os.path.join(folder, TASK_META_FILE), "w") as f:
            json.dump(self.to_info(), f, indent=2)

    @classmethod
    def load(cls, folder: str) -> "Task":
        with open(os.path.join(folder, TASK_META_FILE), "r") as f:
            return cls.from_info(json.load(f))

    def run(self, task_folder: str, *, visible_devices: Optional[str] = None) -> int:
        """Launch the task in a subprocess (reference `task.py:38-52`)."""
        self.dump(task_folder)
        cmd = self.run_command or f"{sys.executable} -m cflearn_tpu.dist.ml.runs.basic"
        env = dict(os.environ)
        env["CFLEARN_TPU_TASK_FOLDER"] = task_folder
        if visible_devices is not None:
            env["TPU_VISIBLE_CHIPS"] = visible_devices
        else:
            # no chip assigned → run on host CPU
            env["CFLEARN_TPU_FORCE_CPU"] = "1"
        full_cmd = f"{cmd} --task_folder {task_folder}"
        return subprocess.call(full_cmd.split(), env=env)


def _run_task(args: Tuple[str, Dict[str, Any], Optional[str]]) -> Tuple[str, int]:
    task_folder, info, devices = args
    task = Task.from_info(info)
    code = task.run(task_folder, visible_devices=devices)
    return task_folder, code


class Experiment:
    """Task table + parallel runner (reference `dist/ml/experiment.py:68`)."""

    def __init__(self, *, num_jobs: int = 1, available_chips: Optional[List[str]] = None) -> None:
        self.num_jobs = max(1, num_jobs)
        self.available_chips = available_chips
        self.tasks: Dict[Tuple[str, int], Task] = {}
        self.results: Dict[Tuple[str, int], str] = {}

    # task table --------------------------------------------------------------

    def add_task(
        self,
        *,
        model: str = "fcnn",
        config: Optional[Dict[str, Any]] = None,
        data_folder: Optional[str] = None,
        run_command: Optional[str] = None,
        index: Optional[int] = None,
    ) -> Tuple[str, int]:
        """`index` pins the task's workspace slot — repair runs
        (`run_multiple(is_fix=True)`) must retrain INTO the buggy folder, not
        claim a fresh index that clobbers a healthy one."""
        if index is None:
            indices = [idx for (m, idx) in self.tasks if m == model]
            index = max(indices) + 1 if indices else 0
        task = Task(config=config or {}, run_command=run_command, data_folder=data_folder, model=model)
        self.tasks[(model, index)] = task
        return model, index

    # data --------------------------------------------------------------------

    @staticmethod
    def dump_data(data: Any, workspace: str) -> str:
        folder = os.path.join(workspace, DATA_FOLDER)
        Serializer.save(folder, data)
        return folder

    @staticmethod
    def fetch_data(folder: str) -> Any:
        from ...schema.data import IData

        return Serializer.load(folder, IData)

    # run ---------------------------------------------------------------------

    def run_tasks(self, workspace: str, *, task_loader: Optional[Any] = None) -> "ExperimentResults":
        os.makedirs(workspace, exist_ok=True)
        jobs: List[Tuple[str, Dict[str, Any], Optional[str]]] = []
        for i, ((model, idx), task) in enumerate(sorted(self.tasks.items())):
            task_folder = os.path.join(workspace, model, str(idx))
            devices = None
            if self.available_chips:
                devices = self.available_chips[i % len(self.available_chips)]
            jobs.append((task_folder, task.to_info(), devices))
        checkpoint_folders: Dict[Tuple[str, int], str] = {}
        if self.num_jobs <= 1:
            for args in jobs:
                folder, code = _run_task(args)
        else:
            with ProcessPoolExecutor(max_workers=self.num_jobs) as pool:
                futures = [pool.submit(_run_task, args) for args in jobs]
                for fut in as_completed(futures):
                    folder, code = fut.result()
        for (model, idx), task in sorted(self.tasks.items()):
            task_folder = os.path.join(workspace, model, str(idx))
            self.results[(model, idx)] = task_folder
            checkpoint_folders[(model, idx)] = task_folder
        return ExperimentResults(workspace, dict(self.tasks), checkpoint_folders)

    # repair (reference `is_fix`, `api/api.py:310-320`) -----------------------

    @staticmethod
    def is_buggy(task_folder: str) -> bool:
        """A task is buggy when its workspace lacks a serialized pipeline."""
        pipeline_folder = os.path.join(task_folder, "pipeline")
        if os.path.isdir(pipeline_folder):
            return False
        for sub in sorted(os.listdir(task_folder)) if os.path.isdir(task_folder) else []:
            if os.path.isdir(os.path.join(task_folder, sub, "pipeline")):
                return False
        return True


class ExperimentResults:
    def __init__(
        self,
        workspace: str,
        tasks: Dict[Tuple[str, int], Task],
        checkpoint_folders: Dict[Tuple[str, int], str],
    ) -> None:
        self.workspace = workspace
        self.tasks = tasks
        self.checkpoint_folders = checkpoint_folders

    def load_pipelines(self) -> Dict[Tuple[str, int], Any]:
        from ...pipeline.api import DLPipelineSerializer

        out: Dict[Tuple[str, int], Any] = {}
        for key, folder in self.checkpoint_folders.items():
            pipeline_folder = os.path.join(folder, "pipeline")
            if not os.path.isdir(pipeline_folder):
                # task workspaces may have a timestamped sub-folder
                subs = sorted(os.listdir(folder)) if os.path.isdir(folder) else []
                for sub in subs:
                    cand = os.path.join(folder, sub, "pipeline")
                    if os.path.isdir(cand):
                        pipeline_folder = cand
                        break
            if os.path.isdir(pipeline_folder):
                out[key] = DLPipelineSerializer.load_inference(pipeline_folder)
        return out
