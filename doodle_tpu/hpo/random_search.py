"""Dependency-free random search with NaN/explosion pruning.

The always-available fallback for the reference's TPE studies
(``newenv/optuna_run.py``, ``newenv/bayesian_optimization.py``) when optuna
isn't installed: log/linear/categorical sampling, constraint hook, trial
history JSON. Same objective contract (minimize; NaN/>prune_above discarded,
ref ``optuna_env.py:94-103``).
"""

from __future__ import annotations

import json
import math
import pathlib
import random
from typing import Any, Callable, Mapping

__all__ = ["random_search"]


def _sample(rng: random.Random, spec: dict) -> Any:
    if "choices" in spec:
        return rng.choice(list(spec["choices"]))
    lo, hi = float(spec["low"]), float(spec["high"])
    if spec.get("log", False):
        return math.exp(rng.uniform(math.log(lo), math.log(hi)))
    if spec.get("int", False):
        return rng.randint(int(lo), int(hi))
    return rng.uniform(lo, hi)


def random_search(
    objective: Callable[[dict], float],
    space: Mapping[str, dict],
    n_trials: int = 20,
    seed: int = 0,
    prune_above: float = 1e9,
    constraint: Callable[[dict], bool] | None = None,
    results_file: str | None = None,
) -> tuple[dict | None, float, list[dict]]:
    """Minimize ``objective``. ``space``: name → {"low","high","log","int"}
    or {"choices": [...]}; ``constraint(params) -> bool`` rejects invalid
    combos before evaluation (the ``cutoff < steps`` idiom,
    ``bayesian_optimization.py:66-67``). Returns (best, value, trials)."""
    rng = random.Random(seed)
    trials: list[dict] = []
    best, best_val = None, math.inf

    t = 0
    attempts = 0
    while t < n_trials and attempts < n_trials * 20:
        attempts += 1
        params = {k: _sample(rng, v) for k, v in space.items()}
        if constraint is not None and not constraint(params):
            continue
        t += 1
        try:
            val = float(objective(params))
        except Exception as e:
            trials.append({"params": params, "state": "error", "error": str(e)})
            continue
        pruned = (not math.isfinite(val)) or val > prune_above
        trials.append({
            "params": params,
            "value": None if pruned else val,
            "state": "pruned" if pruned else "complete",
        })
        if not pruned and val < best_val:
            best, best_val = params, val

    if results_file:
        p = pathlib.Path(results_file)
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(json.dumps(
            {"best_params": best, "best_value": best_val, "trials": trials},
            indent=1, default=str,
        ))
    return best, best_val, trials
