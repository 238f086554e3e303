"""HPO-layer tests: sweep lock/resume protocol, shrinking grid search,
random search pruning, device pool, subprocess trial contract."""

import json
import math
import pathlib
import sys

import pytest

from doodle_tpu.hpo import (
    DevicePool,
    SweepConfig,
    iterative_grid_search,
    random_search,
    run_sweep,
    run_trial_subprocess,
)
from doodle_tpu.hpo.sweep import run_single


# ------------------------------------------------------------------- sweep
def test_sweep_runs_and_writes_protocol_files(tmp_path):
    calls = []

    def target(args):
        calls.append(dict(args))
        return args["x"] * args["seed"]

    cfg = SweepConfig(
        defaults={"x": 1, "y": "base"},
        analyze={"x": [1, 2]},
        seeds=[1, 2],
    )
    results = run_sweep(target, cfg, str(tmp_path), redirect_io=False)
    assert len(results) == 4
    assert all(r["state"] == "done" for r in results)
    d = tmp_path / "x" / "2" / "seed-1"
    assert (d / "RUN_DONE").exists()
    assert (d / "status.json").exists()
    assert json.loads((d / "args.json").read_text())["x"] == 2
    assert (tmp_path / "summary.csv").exists()
    # rerun skips everything
    results2 = run_sweep(target, cfg, str(tmp_path), redirect_io=False)
    assert all(r["state"] == "skipped" for r in results2)
    assert len(calls) == 4


def test_sweep_records_failure_and_reruns(tmp_path):
    state = {"fail": True}

    def target(args):
        if state["fail"]:
            raise RuntimeError("boom")
        return 1.0

    d = tmp_path / "r"
    s = run_single(target, d, {"a": 1}, redirect_io=False)
    assert s["state"] == "failed"
    assert "boom" in (d / "RUN_FAILED").read_text()
    assert not (d / "RUN_DONE").exists()
    # interrupted/failed runs re-run
    state["fail"] = False
    s2 = run_single(target, d, {"a": 1}, redirect_io=False)
    assert s2["state"] == "done"
    assert not (d / "RUN_FAILED").exists()


def test_sweep_lock_blocks_concurrent(tmp_path):
    d = tmp_path / "r"
    d.mkdir()
    (d / "RUN_LOCK").write_text("999")
    s = run_single(lambda a: 0.0, d, {}, redirect_io=False)
    assert s["state"] == "locked"


def test_sweep_derive_rule(tmp_path):
    seen = []

    def target(args):
        seen.append(args["batch_size"])
        return 0.0

    cfg = SweepConfig(
        defaults={"k": 2, "batch_size": 0},
        analyze={"k": [2, 4]},
        seeds=[1],
        derive=lambda a: {**a, "batch_size": 1000 // a["k"]},
    )
    run_sweep(target, cfg, str(tmp_path), redirect_io=False)
    assert seen == [500, 250]


# -------------------------------------------------------------------- grid
def test_grid_search_converges_to_minimum(tmp_path):
    def obj(p):
        return (p["a"] - 3.0) ** 2 + (math.log(p["b"]) - 0.0) ** 2

    best, val, hist = iterative_grid_search(
        obj,
        {"a": {"low": 0.0, "high": 10.0},
         "b": {"low": 0.1, "high": 10.0, "log": True}},
        rounds=4, points_per_axis=4, keep_top=2,
        results_file=str(tmp_path / "grid.json"),
    )
    assert abs(best["a"] - 3.0) < 1.0
    assert abs(math.log(best["b"])) < 1.0
    assert (tmp_path / "grid.json").exists()
    assert len(hist) == 4 * 16


def test_grid_search_tolerates_errors():
    def obj(p):
        if p["a"] < 5:
            raise RuntimeError("crash")
        return p["a"]

    best, val, _ = iterative_grid_search(
        obj, {"a": {"low": 0.0, "high": 10.0}}, rounds=1, points_per_axis=5
    )
    assert best["a"] >= 5


# ------------------------------------------------------------ random search
def test_random_search_finds_reasonable_min(tmp_path):
    def obj(p):
        return (p["lr"] - 1e-3) ** 2 * 1e6 + (p["n"] - 5) ** 2

    best, val, trials = random_search(
        obj,
        {"lr": {"low": 1e-5, "high": 1e-1, "log": True},
         "n": {"low": 1, "high": 10, "int": True}},
        n_trials=60, seed=0, results_file=str(tmp_path / "rs.json"),
    )
    assert best is not None
    assert 1e-4 < best["lr"] < 1e-2
    assert (tmp_path / "rs.json").exists()


def test_random_search_prunes_and_constrains():
    def obj(p):
        return float("nan") if p["x"] > 5 else p["x"]

    best, val, trials = random_search(
        obj, {"x": {"low": 0.0, "high": 10.0}},
        n_trials=30, seed=1, constraint=lambda p: p["x"] > 1.0,
    )
    assert all(t["params"]["x"] > 1.0 for t in trials)
    pruned = [t for t in trials if t["state"] == "pruned"]
    assert pruned and best["x"] <= 5


# -------------------------------------------------------------------- pool
def test_device_pool_lease_cycle():
    pool = DevicePool([0, 1])
    a, b = pool.acquire(), pool.acquire()
    assert {a, b} == {0, 1}
    assert len(pool) == 0
    pool.release(a)
    assert pool.acquire(timeout=1) == a


def test_run_trial_subprocess_contract(tmp_path):
    script = tmp_path / "trial.py"
    script.write_text(
        "import argparse, json, os\n"
        "p = argparse.ArgumentParser()\n"
        "p.add_argument('--lr', type=float)\n"
        "p.add_argument('--metrics_out')\n"
        "a = p.parse_args()\n"
        "open(a.metrics_out, 'w').write(json.dumps(\n"
        "    {'objective': a.lr * 2, 'device': os.environ.get('TPU_VISIBLE_CHIPS')}))\n"
    )
    m = run_trial_subprocess(str(script), {"lr": 0.5}, device_id=3)
    assert m["returncode"] == 0
    assert m["objective"] == 1.0
    assert m["device"] == "3"


def test_run_trial_subprocess_stdout_fallback(tmp_path):
    script = tmp_path / "trial.py"
    script.write_text(
        "import argparse, json\n"
        "p = argparse.ArgumentParser()\n"
        "p.add_argument('--metrics_out')\n"
        "p.parse_args()\n"
        "print('noise')\n"
        "print(json.dumps({'objective': 7.0}))\n"
    )
    m = run_trial_subprocess(str(script), {})
    assert m["objective"] == 7.0


# ------------------------------------------- streaming runner (mid-run prune)
_STREAMING_CHILD = """\
import argparse, json, pathlib, time
p = argparse.ArgumentParser()
p.add_argument('--lr', type=float, default=0.1)
p.add_argument('--steps', type=int, default=5)
p.add_argument('--delay', type=float, default=0.05)
p.add_argument('--metrics_out')
p.add_argument('--logdir')
a = p.parse_args()
with open(pathlib.Path(a.logdir) / 'metrics.jsonl', 'w') as jl:
    for step in range(a.steps):
        jl.write(json.dumps({'event': 'scalar', 'tag': 'mse/test',
                             'value': 1.0 / (step + 1), 'step': step}) + '\\n')
        jl.flush()
        time.sleep(a.delay)
open(a.metrics_out, 'w').write(json.dumps({'objective': a.lr}))
"""


def test_run_trial_streaming_completion(tmp_path):
    from doodle_tpu.hpo import run_trial_streaming

    script = tmp_path / "trial.py"
    script.write_text(_STREAMING_CHILD)
    seen = []
    m = run_trial_streaming(
        str(script), {"lr": 0.25, "steps": 4, "delay": 0.01},
        on_value=lambda s, v: seen.append((s, v)) and False,
        workdir=str(tmp_path / "work"),
    )
    assert m["returncode"] == 0
    assert m["objective"] == 0.25
    assert [s for s, _ in m["history"]] == [0, 1, 2, 3]
    assert seen == m["history"]


def test_run_trial_streaming_prunes_and_kills(tmp_path):
    import time as _time

    from doodle_tpu.hpo import run_trial_streaming

    script = tmp_path / "trial.py"
    script.write_text(_STREAMING_CHILD)
    t0 = _time.monotonic()
    m = run_trial_streaming(
        str(script), {"steps": 1000, "delay": 0.2},  # would run ~200 s
        on_value=lambda step, value: step >= 2,
        workdir=str(tmp_path / "work"),
    )
    wall = _time.monotonic() - t0
    assert m["pruned"] is True
    assert m["last_step"] == 2
    assert m["last_value"] == 1.0 / 3
    assert "objective" not in m
    assert wall < 30  # killed long before the 200 s the child wanted
    # pruned runs keep their scratch dir for inspection
    assert (tmp_path / "work" / "stderr.log").exists()


def test_run_trial_streaming_timeout(tmp_path):
    from doodle_tpu.hpo import run_trial_streaming

    script = tmp_path / "trial.py"
    script.write_text(_STREAMING_CHILD)
    m = run_trial_streaming(
        str(script), {"steps": 1000, "delay": 0.2}, timeout=1.0,
        workdir=str(tmp_path / "work"),
    )
    assert m["timed_out"] is True
    assert "objective" not in m


def test_optuna_pruning_callback_stub():
    """The adapter only needs .report/.should_prune — works with any trial."""
    from doodle_tpu.hpo.optuna_search import make_optuna_pruning_callback

    class StubTrial:
        def __init__(self):
            self.reported = []

        def report(self, value, step):
            self.reported.append((step, value))

        def should_prune(self):
            return len(self.reported) >= 3

    trial = StubTrial()
    cb = make_optuna_pruning_callback(trial)
    assert cb(0, 1.0) is False
    assert cb(1, 0.5) is False
    assert cb(2, 0.3) is True
    assert trial.reported == [(0, 1.0), (1, 0.5), (2, 0.3)]
