"""Device-lease pool + subprocess trial runner.

Parity with the reference's process-per-GPU HPO plumbing: the thread-safe
``GPUPool`` (``newenv/optuna_runner_dummy.py:15-27``) and the
subprocess-with-``--metrics_out`` trial contract
(``newenv/run_optuna_experiments.py:30-73``). On TPU the per-trial isolation
env var is ``TPU_VISIBLE_CHIPS``/``JAX_PLATFORMS`` rather than
``CUDA_VISIBLE_DEVICES``; the lease mechanics are identical.
"""

from __future__ import annotations

import json
import os
import pathlib
import queue
import subprocess
import sys
import tempfile
from typing import Any, Mapping, Sequence

__all__ = ["DevicePool", "run_trial_subprocess"]


class DevicePool:
    """Thread-safe pool of device ids leased to concurrent trials."""

    def __init__(self, device_ids: Sequence[int]) -> None:
        self._q: queue.Queue[int] = queue.Queue()
        for d in device_ids:
            self._q.put(int(d))

    def acquire(self, timeout: float | None = None) -> int:
        return self._q.get(timeout=timeout)

    def release(self, device_id: int) -> None:
        self._q.put(int(device_id))

    def __len__(self) -> int:
        return self._q.qsize()


def run_trial_subprocess(
    script: str,
    params: Mapping[str, Any],
    device_id: int | None = None,
    device_env_var: str = "TPU_VISIBLE_CHIPS",
    timeout: float | None = None,
    python: str | None = None,
) -> dict:
    """Launch ``python <script> --k v … --metrics_out <tmp.json>`` and read
    the objective back.

    Params become ``--name value`` CLI flags (ref ``:30-40``); the device
    lease is pinned via ``device_env_var`` (ref ``:88-90``). The child must
    write ``{"objective": float, ...}`` to the ``--metrics_out`` path; as a
    fallback the last stdout line parseable as JSON-with-objective is used
    (ref ``:43-73``). Returns the metrics dict plus ``returncode``/stdout
    tails on failure.
    """
    with tempfile.NamedTemporaryFile(
        suffix=".json", delete=False, mode="w"
    ) as f:
        metrics_path = f.name

    cmd = [python or sys.executable, script]
    for k, v in params.items():
        cmd += [f"--{k}", str(v)]
    cmd += ["--metrics_out", metrics_path]

    env = dict(os.environ)
    if device_id is not None:
        env[device_env_var] = str(device_id)

    try:
        proc = subprocess.run(
            cmd, capture_output=True, text=True, timeout=timeout, env=env
        )
        metrics: dict = {"returncode": proc.returncode}
        mp = pathlib.Path(metrics_path)
        if mp.exists() and mp.stat().st_size > 0:
            try:
                metrics.update(json.loads(mp.read_text()))
                return metrics
            except json.JSONDecodeError:
                pass
        for line in reversed(proc.stdout.splitlines()):
            try:
                obj = json.loads(line)
                if isinstance(obj, dict) and "objective" in obj:
                    metrics.update(obj)
                    return metrics
            except json.JSONDecodeError:
                continue
        metrics["stdout_tail"] = proc.stdout[-2000:]
        metrics["stderr_tail"] = proc.stderr[-2000:]
        return metrics
    finally:
        pathlib.Path(metrics_path).unlink(missing_ok=True)
