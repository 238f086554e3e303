"""TPE study at CONFIG-4 geometry: point the HPO stack at the question
that needs it (VERDICT r3 item 5).

Every r3 study optimized N=8/res=32 CPU toys; this one drives real
`cli.train` children on the TPU at N=500/256² with the residual head,
searching (mse_f, dist_f, lr, schedule) for an operating point that
improves **both** held-out test MSE and test dist from the aligned start
— the r3 residual-head blend run improved dist −43% while regressing MSE
+60%, and nothing searched the weight space.

Objective (minimized): ``max(mse_end/mse_start, dist_end/dist_start)``
over the trial's own eval stream — < 1 iff BOTH metrics improved. The
pruner watches the mse/test stream (kills divergent trials mid-run by
process kill, the reference's optuna_runner_dummy.py idiom); the
composite is computed from the child's metrics.jsonl afterwards.

All trials share one compiled program (lr, loss weights, and schedule
factors are traced/host-side), so after trial 0's cold compile the study
runs at ~2 min/trial.

Run on the TPU: `timeout 10000 python scripts/optuna_study_config4.py`.
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

# The r3 residual-head blend run's setup (results/config4_flux_residual),
# shrunk to study-trial cost: B=32, 200 steps, eval every 25.
FIXED = {
    "num_heliostats": 500,
    "batch_size": 32,
    "num_batches": 1,
    "steps": 200,
    "T": 4,
    "k": 2,
    "resolution": 256,
    "sigma_scale": 0.05,
    "error_scale_mrad": 30.0,
    "anti_spill": 15000.0,
    "boundary_thresh": 1000.0,
    "warmup_steps": 20,
    "alignment_pretrain_steps": 0,
    "alignment_always": "false",
    "residual_head": "true",
    "encoder_dtype": "bfloat16",
    "use_error_mask": "true",
    "test_size": 32,
    "eval_every": 25,
    "log_every": 50,
    "dropout": 0.1,
    "seed": 42,
}

SPACE = {
    "lr": {"low": 5e-5, "high": 3e-3, "log": True},
    "mse_f": {"low": 0.1, "high": 100.0, "log": True},
    "dist_f": {"low": 1e2, "high": 1e6, "log": True},
    "scheduler": {"choices": ["exp", "cyclic", "none"]},
    "exp_decay": {"low": 0.99, "high": 0.9999, "log": True},
    "scheduler_mode": {"choices": ["triangular", "triangular2"]},
}


def suggest(trial: tpe.Trial) -> dict:
    p = {
        "lr": trial.suggest_float("lr", 5e-5, 3e-3, log=True),
        "mse_f": trial.suggest_float("mse_f", 0.1, 100.0, log=True),
        "dist_f": trial.suggest_float("dist_f", 1e2, 1e6, log=True),
        "scheduler": trial.suggest_categorical(
            "scheduler", ["exp", "cyclic", "none"]
        ),
    }
    if p["scheduler"] == "exp":
        p["exp_decay"] = trial.suggest_float(
            "exp_decay", 0.99, 0.9999, log=True
        )
    elif p["scheduler"] == "cyclic":
        p["scheduler_mode"] = trial.suggest_categorical(
            "scheduler_mode", ["triangular", "triangular2"]
        )
    return p


def composite_from_jsonl(workdir: str) -> dict | None:
    """max(mse_end/mse_0, dist_end/dist_0) from the child's eval stream."""
    path = pathlib.Path(workdir) / "metrics.jsonl"
    if not path.exists():
        return None
    series: dict[str, list[tuple[int, float]]] = {}
    for line in path.read_text().splitlines():
        try:
            d = json.loads(line)
        except json.JSONDecodeError:
            continue
        if d.get("event") == "scalar" and d.get("tag") in (
            "mse/test", "dist/test"
        ):
            series.setdefault(d["tag"], []).append(
                (int(d["step"]), float(d["value"]))
            )
    if not all(len(series.get(t, [])) >= 2 for t in ("mse/test", "dist/test")):
        return None
    out = {}
    for tag, key in (("mse/test", "mse"), ("dist/test", "dist")):
        pts = sorted(series[tag])
        start, end = pts[0][1], pts[-1][1]
        out[f"{key}_start"] = start
        out[f"{key}_end"] = end
        out[f"{key}_ratio"] = end / max(start, 1e-30)
    out["objective"] = max(out["mse_ratio"], out["dist_ratio"])
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_trials", type=int, default=14)
    ap.add_argument("--out", type=str, default="results/optuna_study_config4")
    ap.add_argument("--trial_timeout", type=float, default=2400.0)
    args = ap.parse_args(argv)

    out = pathlib.Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    study = tpe.create_study(
        study_name="config4_flux_blend",
        storage=out / "journal.jsonl",
        load_if_exists=True,
        sampler=tpe.TPESampler(seed=0, n_startup_trials=5),
        # Prune on diverging test MSE (reported stream); composite computed
        # post-hoc. Higher warmup: flux runs are noisy early.
        pruner=tpe.MedianPruner(n_startup_trials=3, n_warmup_steps=50),
    )

    t0 = time.time()
    done = len(study.trials)
    details = {}
    dpath = out / "trial_details.json"
    if dpath.exists():
        details = json.loads(dpath.read_text())
    for _ in range(max(0, args.n_trials - done)):
        trial = study.ask(SPACE)
        params = suggest(trial)
        print(f"trial {trial.number}: {params}", flush=True)
        wd = out / f"trial_{trial.number:03d}"
        res = run_trial_streaming(
            "-m doodle_tpu.cli.train",
            {**FIXED, **params},
            on_value=make_optuna_pruning_callback(trial),
            watch_tag="mse/test",
            timeout=args.trial_timeout,
            workdir=str(wd),
        )
        comp = composite_from_jsonl(str(wd))
        if res.get("pruned"):
            print(f"  PRUNED at step {res['last_step']}", flush=True)
            study.tell(trial, None, "PRUNED")
        elif comp is not None:
            print(f"  composite {comp['objective']:.4f} "
                  f"(mse {comp['mse_ratio']:.3f}, "
                  f"dist {comp['dist_ratio']:.3f})", flush=True)
            study.tell(trial, comp["objective"], "COMPLETE")
            details[str(trial.number)] = {**params, **comp}
        else:
            print(f"  FAILED: {str(res)[:300]}", flush=True)
            study.tell(trial, None, "FAIL")
        dpath.write_text(json.dumps(details, indent=1) + "\n")

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


if __name__ == "__main__":
    main()
