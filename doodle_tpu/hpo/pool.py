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
import signal
import subprocess
import sys
import tempfile
import time
from typing import Any, Callable, Mapping, Sequence

__all__ = ["DevicePool", "run_trial_subprocess", "run_trial_streaming"]


def _script_argv(script: str) -> list[str]:
    """A ``script`` of the form ``"-m pkg.module"`` runs as a module
    (needed for CLIs using relative imports, e.g. ``-m doodle_tpu.cli.train``);
    anything else is a file path."""
    if script.startswith("-m "):
        return ["-m", script[3:].strip()]
    return [script]


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

    cmd = [python or sys.executable] + _script_argv(script)
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


def _kill_group(proc: subprocess.Popen, grace: float = 5.0) -> None:
    """Terminate the child's whole process group (exact pgid, never by
    pattern): SIGTERM, then SIGKILL after ``grace`` seconds."""
    try:
        pgid = os.getpgid(proc.pid)
    except ProcessLookupError:
        return
    try:
        os.killpg(pgid, signal.SIGTERM)
        proc.wait(timeout=grace)
    except (subprocess.TimeoutExpired, ProcessLookupError):
        try:
            os.killpg(pgid, signal.SIGKILL)
        except ProcessLookupError:
            pass
        proc.wait()


def run_trial_streaming(
    script: str,
    params: Mapping[str, Any],
    on_value: Callable[[int, float], bool] | None = None,
    watch_tag: str = "mse/test",
    device_id: int | None = None,
    device_env_var: str = "TPU_VISIBLE_CHIPS",
    timeout: float | None = None,
    python: str | None = None,
    poll_interval: float = 0.25,
    workdir: str | None = None,
) -> dict:
    """Subprocess trial runner with live intermediate values and mid-run
    pruning by process kill.

    Parity: the reference's streaming Optuna runner
    (``newenv/optuna_runner_dummy.py:31-140``), which live-tails a metrics
    CSV written by the trial subprocess, reports each intermediate value to
    the pruner, and kills losing trials before they finish. Here the child
    is launched with ``--logdir <tmp>`` so its :class:`JsonlWriter` streams
    ``metrics.jsonl``; every scalar line whose tag equals ``watch_tag``
    triggers ``on_value(step, value)`` — a truthy return prunes the trial:
    the child's process group is killed (exact pgid) and
    ``{"pruned": True, "last_step": s, "last_value": v}`` is returned.

    For Optuna wire ``on_value = make_optuna_pruning_callback(trial)``
    (:mod:`doodle_tpu.hpo.optuna_search`). Without ``on_value`` this still
    streams (returning the value history) but never prunes.

    On normal exit, the objective is read from ``--metrics_out`` with the
    same stdout-JSON fallback as :func:`run_trial_subprocess`. A ``timeout``
    kills the group and returns ``{"timed_out": True, ...}``.
    """
    own_workdir = workdir is None
    workdir_p = pathlib.Path(
        workdir if workdir is not None else tempfile.mkdtemp(prefix="trial_")
    )
    workdir_p.mkdir(parents=True, exist_ok=True)
    metrics_path = workdir_p / "final.json"
    jsonl_path = workdir_p / "metrics.jsonl"

    cmd = [python or sys.executable] + _script_argv(script)
    for k, v in params.items():
        cmd += [f"--{k}", str(v)]
    cmd += ["--metrics_out", str(metrics_path), "--logdir", str(workdir_p)]

    env = dict(os.environ)
    if device_id is not None:
        env[device_env_var] = str(device_id)

    history: list[tuple[int, float]] = []
    result: dict = {}
    deadline = None if timeout is None else time.monotonic() + timeout
    buf = ""
    fh = None

    with open(workdir_p / "stdout.log", "w") as out_f, open(
        workdir_p / "stderr.log", "w"
    ) as err_f:
        proc = subprocess.Popen(
            cmd, stdout=out_f, stderr=err_f, text=True, env=env,
            start_new_session=True,
        )
    try:
        while True:
            rc = proc.poll()
            # Drain any new complete jsonl lines (keep partial tail in buf).
            if fh is None and jsonl_path.exists():
                fh = open(jsonl_path, "r")
            if fh is not None:
                buf += fh.read()
                *lines, buf = buf.split("\n")
                for line in lines:
                    if not line.strip():
                        continue
                    try:
                        d = json.loads(line)
                    except json.JSONDecodeError:
                        continue
                    if (
                        d.get("event") == "scalar"
                        and d.get("tag") == watch_tag
                    ):
                        step, value = int(d["step"]), float(d["value"])
                        history.append((step, value))
                        if on_value is not None and on_value(step, value):
                            _kill_group(proc)
                            result = {
                                "pruned": True,
                                "last_step": step,
                                "last_value": value,
                            }
                            break
                if result:
                    break
            if rc is not None:
                result = {"returncode": rc}
                break
            if deadline is not None and time.monotonic() > deadline:
                _kill_group(proc)
                result = {"timed_out": True}
                break
            time.sleep(poll_interval)
    finally:
        if fh is not None:
            fh.close()
        if proc.poll() is None:  # never leak the child on an exception
            _kill_group(proc)

    result["history"] = history
    if not result.get("pruned") and not result.get("timed_out"):
        if metrics_path.exists() and metrics_path.stat().st_size > 0:
            try:
                result.update(json.loads(metrics_path.read_text()))
            except json.JSONDecodeError:
                pass
        if "objective" not in result:
            try:
                stdout_text = (workdir_p / "stdout.log").read_text()
            except OSError:
                stdout_text = ""
            for line in reversed(stdout_text.splitlines()):
                try:
                    obj = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if isinstance(obj, dict) and "objective" in obj:
                    result.update(obj)
                    break
    if own_workdir and "objective" in result:
        # Clean scratch dirs for completed trials; keep them for
        # pruned/failed runs so stdout/stderr.log stay inspectable.
        import shutil

        shutil.rmtree(workdir_p, ignore_errors=True)
    return result
