"""Standard trainer CLI (parity: ``train_with_env.py`` ``__main__``).

    python -m doodle_tpu.cli.train --num_heliostats 50 --steps 5000 \
        --architecture lstm --scheduler exp --logdir runs/exp1
"""

from __future__ import annotations

import argparse

from ..train import TrainConfig, train_and_eval
from ._common import (
    add_dataclass_args,
    add_multihost_args,
    apply_multihost,
    add_platform_arg,
    apply_platform,
    config_from_args,
    ensure_pod_data_parallel,
    make_writer,
    write_metrics_out,
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    add_dataclass_args(p, TrainConfig)
    p.add_argument("--logdir", type=str, default=None)
    p.add_argument("--tensorboard", action="store_true")
    p.add_argument("--monitor_dir", type=str, default=None,
                   help="dump 3-D scatter diagnostics here every 50 steps")
    p.add_argument("--metrics_out", type=str, default=None)
    add_platform_arg(p)
    add_multihost_args(p)
    return p


def main(argv=None) -> float:
    args = build_parser().parse_args(argv)
    apply_platform(args)
    apply_multihost(args)
    cfg = ensure_pod_data_parallel(config_from_args(args, TrainConfig))
    writer = make_writer(args)   # None on non-primary hosts

    monitor_cb = None
    if args.monitor_dir:
        from ..utils import scatter3d_vectors

        def monitor_cb(step, mon):
            base = f"{args.monitor_dir}/step_{step}"
            scatter3d_vectors(
                mon["normals"].reshape(-1, 3), mon["all_bounds"].reshape(-1),
                html_file=f"{base}/bounds.html",
            )
            scatter3d_vectors(
                mon["reflected_rays"].reshape(-1, 3),
                mon["all_bounds"].reshape(-1),
                html_file=f"{base}/r_bounds.html",
            )

    best = train_and_eval(cfg, writer=writer, monitor_cb=monitor_cb)
    from ..parallel.launch import is_primary_host

    if is_primary_host():   # process 0 owns metrics_out + console lines
        write_metrics_out(args.metrics_out, best)
        print(f"best_test_mse: {best}")
    return best


if __name__ == "__main__":
    main()
