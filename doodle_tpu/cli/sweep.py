"""Sweep CLI (parity: ``run_experiments.py``).

One-at-a-time property sweeps against frozen defaults, with the lock-file
resume protocol. The plan lives in a JSON file:

    {"defaults": {"steps": 2000, "T": 8, ...},
     "analyze": {"T": [4, 8, 16], "error_scale_mrad": [90, 180]},
     "seeds": [42, 420]}

    python -m doodle_tpu.cli.sweep --plan plan.json --root experiments/
"""

from __future__ import annotations

import argparse
import json

from ..hpo import SweepConfig, run_sweep
from ..train import TrainConfig, train_and_eval

# The reference's derived rules (run_experiments.py:100-111).
def _derive(args: dict) -> dict:
    out = dict(args)
    k = out.get("k")
    if k is not None and k >= 2:
        out["batch_size"] = max(1, 1000 // int(k))
    return out


def _target(args: dict) -> float:
    field_names = {f.name for f in TrainConfig.__dataclass_fields__.values()}
    cfg = TrainConfig(**{k: v for k, v in args.items() if k in field_names})
    return train_and_eval(cfg)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--plan", required=True, help="JSON plan file")
    p.add_argument("--root", required=True, help="experiment root dir")
    p.add_argument("--no_derive", action="store_true",
                   help="disable the batch_size=1000//k derived rule")
    args = p.parse_args(argv)

    plan = json.loads(open(args.plan).read())
    cfg = SweepConfig(
        defaults=plan["defaults"],
        analyze=plan["analyze"],
        seeds=plan.get("seeds", [42, 420, 69, 666, 999]),
        derive=None if args.no_derive else _derive,
    )
    results = run_sweep(_target, cfg, args.root)
    done = sum(1 for r in results if r["state"] == "done")
    print(f"sweep finished: {done}/{len(results)} runs done "
          f"(summary: {args.root}/summary.csv)")


if __name__ == "__main__":
    main()
