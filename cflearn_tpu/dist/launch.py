"""Multi-process / multi-host launch — the `run_accelerate` replacement.

Parity: reference `cflearn/api/api.py:269-294` (`run_accelerate` rewrites the
training script and shells out to `accelerate launch`, which spawns N
processes wired for DDP).

TPU-native: SPMD training needs ONE process per HOST (not per chip) —
`jax.distributed.initialize` + the mesh does the rest (SURVEY.md §5.8). The
launcher spawns N processes with coordinator env vars
(`JAX_COORDINATOR_ADDRESS` / `JAX_NUM_PROCESSES` / `JAX_PROCESS_ID`);
`cflearn_tpu.parallel.maybe_initialize_distributed` (called by the Trainer
via mesh setup, or by user scripts) picks them up. On a real TPU pod each
host launches the same script via the pod runtime instead.
"""

import os
import subprocess
import sys
from typing import List, Optional


def run_distributed(
    script_path: str,
    *,
    num_processes: int = 2,
    coordinator_port: int = 12355,
    extra_args: Optional[List[str]] = None,
    env_overrides: Optional[dict] = None,
    force_cpu: bool = False,
) -> int:
    """Spawn `num_processes` copies of `script_path` wired for
    `jax.distributed`. Returns the first nonzero exit code (0 on success)."""
    import time

    from ..toolkit.misc import timestamp

    run_ts = timestamp(ensure_different=True)
    procs = []
    for pid in range(num_processes):
        env = dict(os.environ)
        env["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{coordinator_port}"
        env["JAX_NUM_PROCESSES"] = str(num_processes)
        env["JAX_PROCESS_ID"] = str(pid)
        # every rank derives the SAME sub-workspace (PrepareWorkplaceBlock)
        env["CFLEARN_TPU_RUN_TS"] = run_ts
        if force_cpu:
            env["CFLEARN_TPU_FORCE_CPU"] = "1"
        if env_overrides:
            env.update({k: str(v) for k, v in env_overrides.items()})
        cmd = [sys.executable, script_path] + list(extra_args or [])
        procs.append(subprocess.Popen(cmd, env=env))
    # poll-and-terminate: if any rank dies, the survivors would block forever
    # in jax.distributed barriers — kill the group and report the failure
    code = 0
    try:
        while procs:
            alive = []
            for p in procs:
                rc = p.poll()
                if rc is None:
                    alive.append(p)
                elif rc != 0 and code == 0:
                    code = rc
            if code != 0:
                for p in alive:
                    p.terminate()
                for p in alive:
                    try:
                        p.wait(timeout=10)
                    except subprocess.TimeoutExpired:
                        p.kill()
                return code
            procs = alive
            if procs:
                time.sleep(0.2)
    finally:
        for p in procs:
            if p.poll() is None:
                p.terminate()
    return code
