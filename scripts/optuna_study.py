"""Run a REAL TPE study over `cli.train` subprocess trials (VERDICT r1 #4).

Drives the full reference-parity HPO stack end-to-end, on this machine:

  * TPE sampling + journal storage + MedianPruner from
    :mod:`doodle_tpu.hpo.tpe` (or optuna when installed — same API);
  * each trial is a real ``python -m doodle_tpu.cli.train`` child on a tiny
    CPU config, launched via :func:`doodle_tpu.hpo.pool.run_trial_streaming`
    — live-tailing the child's ``metrics.jsonl`` and reporting every
    ``mse/test`` scalar to the pruner, with **mid-run prune-by-process-kill**
    (the reference's ``newenv/optuna_runner_dummy.py:96-131`` loop);
  * artifacts: journal + trial-history CSV + summary JSON under ``--out``.

    python scripts/optuna_study.py --n_trials 8 --out results/optuna_study
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, ".")

from doodle_tpu.hpo import tpe
from doodle_tpu.hpo.optuna_search import make_optuna_pruning_callback
from doodle_tpu.hpo.pool import run_trial_streaming

SPACE = {
    "lr": {"low": 1e-4, "high": 3e-2, "log": True},
    "lstm_hid": {"choices": [16, 32]},
    "dropout": {"low": 0.0, "high": 0.3},
}

# Tiny but real training runs (CPU): ~100 optimizer steps of the LSTM
# trainer at N=8/res=32/B=4, eval (the pruner's stream) every 10 steps.
FIXED = {
    "num_heliostats": 8,
    "batch_size": 4,
    "num_batches": 1,
    "steps": 100,
    "T": 2,
    "k": 2,
    "resolution": 32,
    "sigma_scale": 0.01,
    "error_scale_mrad": 60.0,
    "alignment_pretrain_steps": 0,
    "warmup_steps": 0,
    "alignment_always": "true",
    "grad_clip": 1e9,
    "scheduler": "none",
    "eval_every": 10,
    "log_every": 1000,
    "test_size": 4,
    "architecture": "lstm",
    "seed": 7,
    # Children must run on CPU: JAX_PLATFORMS alone cannot override the
    # axon plugin, so cli flags force it through the config API.
    "platform": "cpu",
}


def suggest_params(trial: tpe.Trial) -> dict:
    return {
        "lr": trial.suggest_float("lr", 1e-4, 3e-2, log=True),
        "lstm_hid": trial.suggest_categorical("lstm_hid", [16, 32]),
        "dropout": trial.suggest_float("dropout", 0.0, 0.3),
    }


# Scheduler-family search: the reference's second study axis
# (``newenv/optuna_env.py:33-152`` — cyclic-vs-plateau family plus the
# family's own hyperparameters, conditionally suggested per trial).
SCHED_SPACE = {
    "lr": {"low": 3e-4, "high": 3e-2, "log": True},
    "scheduler": {"choices": ["cyclic", "plateau", "exp"]},
    "scheduler_mode": {"choices": ["triangular", "triangular2", "exp_range"]},
    "scheduler_patience": {"low": 5, "high": 40, "int": True},
    "scheduler_factor": {"low": 0.1, "high": 0.7},
    "exp_decay": {"low": 0.95, "high": 0.9999, "log": True},
}


def suggest_sched_params(trial: tpe.Trial) -> dict:
    p = {
        "lr": trial.suggest_float("lr", 3e-4, 3e-2, log=True),
        "scheduler": trial.suggest_categorical(
            "scheduler", ["cyclic", "plateau", "exp"]
        ),
    }
    if p["scheduler"] == "cyclic":
        p["scheduler_mode"] = trial.suggest_categorical(
            "scheduler_mode", ["triangular", "triangular2", "exp_range"]
        )
    elif p["scheduler"] == "plateau":
        p["scheduler_patience"] = trial.suggest_int(
            "scheduler_patience", 5, 40
        )
        p["scheduler_factor"] = trial.suggest_float(
            "scheduler_factor", 0.1, 0.7
        )
    else:
        p["exp_decay"] = trial.suggest_float(
            "exp_decay", 0.95, 0.9999, log=True
        )
    return p


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_trials", type=int, default=8)
    ap.add_argument("--out", type=str, default="results/optuna_study")
    ap.add_argument("--trial_timeout", type=float, default=1800.0)
    ap.add_argument("--space", choices=["policy", "scheduler"],
                    default="policy",
                    help="'policy' = lr/lstm_hid/dropout; 'scheduler' = the "
                         "reference optuna_env.py scheduler-family search")
    args = ap.parse_args(argv)

    out = pathlib.Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    study = tpe.create_study(
        study_name="cli_train_tiny",
        storage=out / "journal.jsonl",
        load_if_exists=True,
        sampler=tpe.TPESampler(seed=0, n_startup_trials=4),
        pruner=tpe.MedianPruner(n_startup_trials=2),
    )

    space = SPACE if args.space == "policy" else SCHED_SPACE
    suggest = suggest_params if args.space == "policy" else suggest_sched_params

    t0 = time.time()
    for _ in range(args.n_trials):
        trial = study.ask(space)
        params = suggest(trial)
        print(f"trial {trial.number}: {params}", flush=True)
        res = run_trial_streaming(
            "-m doodle_tpu.cli.train",
            {**FIXED, **params},
            on_value=make_optuna_pruning_callback(trial),
            watch_tag="mse/test",
            timeout=args.trial_timeout,
            workdir=str(out / f"trial_{trial.number:03d}"),
        )
        if res.get("pruned"):
            print(f"  PRUNED at step {res['last_step']} "
                  f"(value {res['last_value']:.3e})", flush=True)
            study.tell(trial, None, "PRUNED")
        elif "objective" in res:
            print(f"  objective {res['objective']:.4e} "
                  f"({len(res['history'])} reports)", flush=True)
            study.tell(trial, float(res["objective"]), "COMPLETE")
        else:
            print(f"  FAILED: {res}", flush=True)
            study.tell(trial, None, "FAIL")

    study.trials_to_csv(out / "trials.csv")
    states = [t.state for t in study.trials]
    summary = {
        "n_trials": len(study.trials),
        "complete": states.count("COMPLETE"),
        "pruned": states.count("PRUNED"),
        "failed": states.count("FAIL"),
        "best_value": study.best_value,
        "best_params": study.best_params,
        "wall_s": round(time.time() - t0, 1),
    }
    (out / "summary.json").write_text(json.dumps(summary, indent=2))
    print(json.dumps(summary))
    assert summary["complete"] >= 2, "study produced too few completed trials"


if __name__ == "__main__":
    main()
