"""Crash-resilient one-at-a-time sweeps (parity: ``run_experiments.py``).

Layout per run: ``<root>/<prop>/<value>/seed-<seed>/`` containing
``RUN_STARTED``/``RUN_DONE``/``RUN_FAILED``, ``args.json``, ``status.json``,
``stdout.log``/``stderr.log``, and an atomic ``RUN_LOCK`` (O_CREAT|O_EXCL)
so several sweep processes can share a root safely (ref ``:156-233``).
Completed runs are skipped; interrupted runs (STARTED without DONE) re-run;
failures capture the traceback. A summary CSV is written at the end.
"""

from __future__ import annotations

import contextlib
import csv
import dataclasses
import json
import os
import pathlib
import time
import traceback
from typing import Any, Callable, Mapping, Sequence

__all__ = ["SweepConfig", "run_sweep"]


@dataclasses.dataclass
class SweepConfig:
    """What to sweep.

    ``defaults``: the frozen base config (dict of arg name → value).
    ``analyze``: property → list of values; each property is swept alone
    against the defaults (ref ``:86-95``).
    ``seeds``: every (prop, value) runs once per seed.
    ``derive``: optional hook ``args_dict -> args_dict`` applying dependent
    rules (the reference's ``batch_size = 1000 // k`` style, ``:105-111``).
    """

    defaults: Mapping[str, Any]
    analyze: Mapping[str, Sequence[Any]]
    seeds: Sequence[int] = (42, 420, 69, 666, 999)
    derive: Callable[[dict], dict] | None = None


def _atomic_lock(path: pathlib.Path) -> bool:
    try:
        fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        os.write(fd, str(os.getpid()).encode())
        os.close(fd)
        return True
    except FileExistsError:
        return False


def run_single(
    target: Callable[[dict], float],
    run_dir: pathlib.Path,
    args: dict,
    redirect_io: bool = True,
) -> dict:
    """Execute one run with the full lock/status protocol. Returns the
    status dict (also written to ``status.json``)."""
    run_dir.mkdir(parents=True, exist_ok=True)
    done = run_dir / "RUN_DONE"
    failed = run_dir / "RUN_FAILED"
    started = run_dir / "RUN_STARTED"
    lock = run_dir / "RUN_LOCK"

    if done.exists():
        return {"state": "skipped", "dir": str(run_dir)}
    if not _atomic_lock(lock):
        return {"state": "locked", "dir": str(run_dir)}

    try:
        failed.unlink(missing_ok=True)
        started.write_text(time.strftime("%Y-%m-%d %H:%M:%S"))
        (run_dir / "args.json").write_text(json.dumps(args, default=str, indent=1))

        t0 = time.time()
        ctx: Any = contextlib.nullcontext()
        if redirect_io:
            out = open(run_dir / "stdout.log", "w")
            err = open(run_dir / "stderr.log", "w")
            ctx = contextlib.ExitStack()
            ctx.enter_context(out)
            ctx.enter_context(err)
            ctx.enter_context(contextlib.redirect_stdout(out))
            ctx.enter_context(contextlib.redirect_stderr(err))
        try:
            with ctx:
                objective = target(args)
            status = {
                "state": "done",
                "objective": None if objective is None else float(objective),
                "seconds": time.time() - t0,
            }
            (run_dir / "status.json").write_text(json.dumps(status))
            done.write_text(time.strftime("%Y-%m-%d %H:%M:%S"))
            return status
        except Exception:
            tb = traceback.format_exc()
            failed.write_text(tb)
            status = {"state": "failed", "seconds": time.time() - t0,
                      "traceback": tb}
            (run_dir / "status.json").write_text(json.dumps(status))
            return status
    finally:
        lock.unlink(missing_ok=True)


def run_sweep(
    target: Callable[[dict], float],
    cfg: SweepConfig,
    root: str,
    redirect_io: bool = True,
) -> list[dict]:
    """Run the full sweep plan; returns per-run summaries and writes
    ``<root>/summary.csv`` (ref ``:277-282``)."""
    root_p = pathlib.Path(root)
    results = []
    for prop, values in cfg.analyze.items():
        for value in values:
            for seed in cfg.seeds:
                args = dict(cfg.defaults)
                args[prop] = value
                args["seed"] = seed
                if cfg.derive is not None:
                    args = cfg.derive(args)
                run_dir = root_p / prop / str(value) / f"seed-{seed}"
                status = run_single(target, run_dir, args, redirect_io)
                results.append(
                    {"prop": prop, "value": value, "seed": seed, **status}
                )

    root_p.mkdir(parents=True, exist_ok=True)
    with open(root_p / "summary.csv", "w", newline="") as f:
        w = csv.DictWriter(
            f, fieldnames=["prop", "value", "seed", "state", "objective",
                           "seconds"],
            extrasaction="ignore",
        )
        w.writeheader()
        w.writerows(results)
    return results
