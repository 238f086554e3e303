"""Explain the n50 bench drop r3→r4 (VERDICT r4 item 4).

BENCH_r03 `n50_res128_b25_device` = 2,820,137 env-steps/s; BENCH_r04 =
2,506,330 (−11%, outside the documented ±7% single-kernel variance).
Back-to-back A/B in ONE session on a quiet chip: the r3 code (git
worktree `.r3tree` @ ae761af) vs HEAD, interleaved twice each, same
bench_device_rate call (reps 400/3200 — the shipped n50 rep counts).
Run via subprocesses so each side imports its own tree's `bench` and
`doodle_tpu` from its own cwd.

Run: `timeout 3600 python scripts/n50_ab.py` from the repo root.
Writes results/n50_ab.json.
"""
from __future__ import annotations

import json
import pathlib
import subprocess
import sys
import time

CHILD = r"""
import sys, json
sys.path.insert(0, ".")
import bench
rate, dt, raw = bench.bench_device_rate(
    50, 128, 25, False, reps_small=400, reps_large=3200)
print("RESULT " + json.dumps(
    {"rate": rate, "step_ms": dt * 1e3, "raw_ms": raw}))
"""


def run_side(cwd: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", CHILD], cwd=cwd, capture_output=True,
        text=True, timeout=900,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT from {cwd}: {out.stdout[-500:]}"
                       f" STDERR {out.stderr[-500:]}")


def main():
    root = pathlib.Path(".").absolute()
    r3 = root / ".r3tree"
    assert r3.exists(), "git worktree add .r3tree <r3-commit> first"
    res = {"r3_bench": 2820137.0, "r4_bench": 2506330.0, "rounds": []}
    for i in range(2):
        for name, cwd in (("head", root), ("r3", r3)):
            t0 = time.time()
            row = run_side(str(cwd))
            row["side"] = name
            row["wall_s"] = round(time.time() - t0, 0)
            res["rounds"].append(row)
            print(name, json.dumps(row), flush=True)
            pathlib.Path("results/n50_ab.json").write_text(
                json.dumps(res, indent=1) + "\n")
    heads = [r["rate"] for r in res["rounds"] if r["side"] == "head"]
    r3s = [r["rate"] for r in res["rounds"] if r["side"] == "r3"]
    res["head_mean"] = sum(heads) / len(heads)
    res["r3_mean"] = sum(r3s) / len(r3s)
    res["head_over_r3"] = res["head_mean"] / res["r3_mean"]
    pathlib.Path("results/n50_ab.json").write_text(
        json.dumps(res, indent=1) + "\n")
    print(json.dumps(res))


if __name__ == "__main__":
    main()
