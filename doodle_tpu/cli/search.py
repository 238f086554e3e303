"""Hyper-parameter search CLI (parity: ``newenv/optuna_run.py`` family).

Search space JSON:

    {"lr": {"low": 1e-5, "high": 1e-2, "log": true},
     "batch_size": {"low": 8, "high": 64, "int": true},
     "scheduler": {"choices": ["exp", "cyclic", "plateau"]}}

    python -m doodle_tpu.cli.search --space space.json --n_trials 30 \
        --engine random --out results.json
"""

from __future__ import annotations

import argparse
import json

from ..train import TrainConfig, train_and_eval


def _objective(params: dict) -> float:
    field_names = {f.name for f in TrainConfig.__dataclass_fields__.values()}
    clean = {}
    for k, v in params.items():
        if k in field_names:
            default = TrainConfig.__dataclass_fields__[k].default
            clean[k] = type(default)(v) if default is not None else v
    return train_and_eval(TrainConfig(**clean))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--space", required=True)
    p.add_argument("--n_trials", type=int, default=20)
    p.add_argument("--engine", choices=["random", "grid", "optuna"],
                   default="random")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", type=str, default="search_results.json")
    p.add_argument("--storage", type=str, default=None,
                   help="optuna storage URI, e.g. sqlite:///optuna.db")
    args = p.parse_args(argv)

    space = json.loads(open(args.space).read())

    if args.engine == "random":
        from ..hpo import random_search

        best, val, _ = random_search(
            _objective, space, n_trials=args.n_trials, seed=args.seed,
            results_file=args.out,
        )
    elif args.engine == "grid":
        from ..hpo import iterative_grid_search

        best, val, _ = iterative_grid_search(
            _objective, space, results_file=args.out
        )
    else:
        from ..hpo.optuna_search import optuna_minimize

        best, val, _ = optuna_minimize(
            _objective, space, n_trials=args.n_trials, seed=args.seed,
            storage=args.storage, csv_out=args.out.replace(".json", ".csv"),
        )
    print(f"best objective {val} with {best}")


if __name__ == "__main__":
    main()
