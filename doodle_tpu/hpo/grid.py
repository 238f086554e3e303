"""Iterative shrinking grid search (parity: ``newenv/iterative_grid_search.py:67-208``).

Cartesian grid over log- or linear-scaled axes; each round keeps the top-n
configurations and shrinks every axis's bounds around the winners, then
re-grids. Error-tolerant: failing evaluations score +inf. Results JSON per
round.
"""

from __future__ import annotations

import itertools
import json
import math
import pathlib
from typing import Any, Callable, Mapping

__all__ = ["iterative_grid_search"]


def _axis_points(lo: float, hi: float, n: int, log: bool) -> list[float]:
    if n == 1:
        return [math.sqrt(lo * hi) if log else (lo + hi) / 2]
    if log:
        llo, lhi = math.log(lo), math.log(hi)
        return [math.exp(llo + i * (lhi - llo) / (n - 1)) for i in range(n)]
    return [lo + i * (hi - lo) / (n - 1) for i in range(n)]


def iterative_grid_search(
    objective: Callable[[dict], float],
    space: Mapping[str, dict],
    rounds: int = 3,
    points_per_axis: int = 3,
    keep_top: int = 2,
    shrink: float = 0.5,
    results_file: str | None = None,
) -> tuple[dict, float, list[dict]]:
    """Minimize ``objective`` over ``space``.

    ``space``: name → {"low": float, "high": float, "log": bool}.
    Each round evaluates the full Cartesian grid, keeps the ``keep_top``
    winners, and shrinks each axis to ``shrink`` × its width centered on the
    winners' span (ref ``:108-127``). Returns
    ``(best_params, best_value, history)``.
    """
    bounds = {k: (float(v["low"]), float(v["high"])) for k, v in space.items()}
    logs = {k: bool(v.get("log", False)) for k, v in space.items()}
    names = list(space)
    history: list[dict] = []
    best_params, best_value = None, math.inf

    for rnd in range(rounds):
        axes = [
            _axis_points(*bounds[k], points_per_axis, logs[k]) for k in names
        ]
        evals = []
        for combo in itertools.product(*axes):
            params = dict(zip(names, combo))
            try:
                val = float(objective(params))
                if not math.isfinite(val):
                    val = math.inf
            except Exception:
                val = math.inf
            evals.append((val, params))
            history.append({"round": rnd, "params": params, "value": val})

        evals.sort(key=lambda t: t[0])
        if evals[0][0] < best_value:
            best_value, best_params = evals[0][0], evals[0][1]

        winners = [p for _, p in evals[:keep_top]]
        for k in names:
            vals = [w[k] for w in winners]
            lo, hi = bounds[k]
            if logs[k]:
                c = math.exp(sum(math.log(v) for v in vals) / len(vals))
                half = (math.log(hi) - math.log(lo)) * shrink / 2
                bounds[k] = (
                    max(lo, math.exp(math.log(c) - half)),
                    min(hi, math.exp(math.log(c) + half)),
                )
            else:
                c = sum(vals) / len(vals)
                half = (hi - lo) * shrink / 2
                bounds[k] = (max(lo, c - half), min(hi, c + half))

    if results_file:
        p = pathlib.Path(results_file)
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(json.dumps(
            {"best_params": best_params, "best_value": best_value,
             "history": history}, indent=1,
        ))
    return best_params, best_value, history
