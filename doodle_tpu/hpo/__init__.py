"""Hyper-parameter optimization & experiment orchestration (SURVEY §2.7).

Host-side Python, as in the reference — the search layer doesn't need to be
on-device:

* :mod:`sweep`   — one-at-a-time property sweeps with crash-safe lock-file
  resume (``run_experiments.py`` idiom);
* :mod:`grid`    — iterative shrinking grid search
  (``newenv/iterative_grid_search.py``);
* :mod:`random_search` — dependency-free random/TPE-lite searcher (the
  fallback when optuna isn't installed);
* :mod:`optuna_search` — optuna TPE/pruning driver (import-gated);
* :mod:`pool`    — device-lease pool + subprocess trial runner
  (``newenv/optuna_runner_dummy.py:15-27``, ``run_optuna_experiments.py``).
"""

from .grid import iterative_grid_search
from .pool import DevicePool, run_trial_streaming, run_trial_subprocess
from .random_search import random_search
from .sweep import SweepConfig, run_sweep

__all__ = [
    "SweepConfig",
    "run_sweep",
    "iterative_grid_search",
    "random_search",
    "DevicePool",
    "run_trial_subprocess",
    "run_trial_streaming",
]
