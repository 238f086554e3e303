"""TPE study driver (parity: ``newenv/optuna_run.py``,
``newenv/optuna_env.py``, ``newenv/bayesian_optimization.py``).

Multivariate/grouped TPE + MedianPruner over a declarative space, storage
with ``load_if_exists`` resume, NaN/explosion pruning, CSV export of the
trial history. Uses optuna when installed; otherwise runs on the built-in
engine (:mod:`doodle_tpu.hpo.tpe` — same algorithm, same API subset), so
the TPE path is always executable in this image.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Mapping

__all__ = ["optuna_minimize", "make_optuna_pruning_callback"]


def make_optuna_pruning_callback(trial) -> Callable[[int, float], bool]:
    """``on_value`` adapter for :func:`doodle_tpu.hpo.pool.run_trial_streaming`:
    reports each intermediate value to the Optuna trial and returns True
    (→ kill the trial subprocess) when the pruner says to stop — the
    reference's mid-run prune-with-kill loop
    (``newenv/optuna_runner_dummy.py:96-131``)."""

    def on_value(step: int, value: float) -> bool:
        trial.report(value, step)
        return trial.should_prune()

    return on_value


def optuna_minimize(
    objective: Callable[[dict], float],
    space: Mapping[str, dict],
    n_trials: int = 50,
    study_name: str = "doodle_tpu",
    storage: str | None = None,       # e.g. "sqlite:///optuna.db"
    seed: int = 0,
    prune_above: float = 1e9,
    constraint: Callable[[dict], bool] | None = None,
    csv_out: str | None = None,
):
    """Run a TPE study; returns ``(best_params, best_value, study)``.

    ``space`` entries: {"low","high","log","int"} or {"choices": [...]}
    — the same schema as :func:`doodle_tpu.hpo.random_search.random_search`.

    Backend: optuna when installed (the reference's engine), else the
    built-in :mod:`doodle_tpu.hpo.tpe`. For the built-in backend,
    ``storage`` is a journal file path (a ``sqlite:///x.db`` URL is mapped
    to ``x.db.journal.jsonl`` so call sites stay portable).
    """
    try:
        import optuna
    except ImportError:
        return _builtin_minimize(
            objective, space, n_trials, study_name, storage, seed,
            prune_above, constraint, csv_out,
        )

    def suggest(trial: "optuna.Trial") -> dict:
        params = {}
        for name, spec in space.items():
            if "choices" in spec:
                params[name] = trial.suggest_categorical(
                    name, list(spec["choices"])
                )
            elif spec.get("int", False):
                params[name] = trial.suggest_int(
                    name, int(spec["low"]), int(spec["high"]),
                    log=spec.get("log", False),
                )
            else:
                params[name] = trial.suggest_float(
                    name, float(spec["low"]), float(spec["high"]),
                    log=spec.get("log", False),
                )
        return params

    def wrapped(trial: "optuna.Trial") -> float:
        params = suggest(trial)
        if constraint is not None and not constraint(params):
            raise optuna.TrialPruned("constraint violated")
        try:
            val = float(objective(params))
        except Exception as e:
            raise optuna.TrialPruned(f"crashed: {e}") from e
        if not math.isfinite(val) or val > prune_above:
            raise optuna.TrialPruned(f"bad value {val}")
        return val

    sampler = optuna.samplers.TPESampler(
        seed=seed, multivariate=True, group=True
    )
    study = optuna.create_study(
        study_name=study_name,
        storage=storage,
        load_if_exists=storage is not None,
        direction="minimize",
        sampler=sampler,
        pruner=optuna.pruners.MedianPruner(),
    )
    study.optimize(wrapped, n_trials=n_trials)

    if csv_out:
        study.trials_dataframe().to_csv(csv_out, index=False)
    return study.best_params, study.best_value, study


def _builtin_minimize(
    objective, space, n_trials, study_name, storage, seed,
    prune_above, constraint, csv_out,
):
    """The same study semantics on :mod:`doodle_tpu.hpo.tpe`."""
    from . import tpe

    if storage is not None and str(storage).startswith("sqlite:///"):
        storage = str(storage)[len("sqlite:///"):] + ".journal.jsonl"

    def wrapped(trial: tpe.Trial) -> float:
        params = {}
        for name, spec in space.items():
            if "choices" in spec:
                params[name] = trial.suggest_categorical(
                    name, list(spec["choices"])
                )
            elif spec.get("int", False):
                params[name] = trial.suggest_int(
                    name, int(spec["low"]), int(spec["high"]),
                    log=spec.get("log", False),
                )
            else:
                params[name] = trial.suggest_float(
                    name, float(spec["low"]), float(spec["high"]),
                    log=spec.get("log", False),
                )
        if constraint is not None and not constraint(params):
            raise tpe.TrialPruned("constraint violated")
        try:
            val = float(objective(params))
        except Exception as e:
            raise tpe.TrialPruned(f"crashed: {e}") from e
        if not math.isfinite(val) or val > prune_above:
            raise tpe.TrialPruned(f"bad value {val}")
        return val

    study = tpe.create_study(
        study_name=study_name,
        storage=storage,
        load_if_exists=storage is not None,
        sampler=tpe.TPESampler(seed=seed),
        pruner=tpe.MedianPruner(),
    )
    study.optimize(wrapped, n_trials=n_trials, space=space)
    if csv_out:
        study.trials_to_csv(csv_out)
    return study.best_params, study.best_value, study
