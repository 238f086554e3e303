"""TTT trainer CLI (parity: ``train_with_env_com_trunc_advantage_ttt.py``
``__main__``, ``:787-862``).

    python -m doodle_tpu.cli.train_ttt --truncate_every 4 \
        --fine_enabled test --fine_steps_per_t 10 --extra_steps 4
"""

from __future__ import annotations

import argparse

from ..train import TTTConfig, ttt_train_and_eval
from ._common import (
    add_dataclass_args,
    add_multihost_args,
    apply_multihost,
    add_platform_arg,
    apply_platform,
    config_from_args,
    make_writer,
    write_metrics_out,
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    add_dataclass_args(p, TTTConfig)
    p.add_argument(
        "--ttc_recipe", type=str, default="none",
        choices=["none", "delivery"],
        help="'delivery' applies the measured TTC production recipe "
        "(train.ttt.TTC_DELIVERY_RECIPE: fine_steps_per_t=60, "
        "extra_steps=8, fine_lr=1e-3, MSE inner objective) over the "
        "reference defaults.",
    )
    p.add_argument("--logdir", type=str, default=None)
    p.add_argument("--tensorboard", action="store_true")
    p.add_argument("--metrics_out", type=str, default=None)
    add_platform_arg(p)
    add_multihost_args(p)
    return p


def main(argv=None) -> float:
    args = build_parser().parse_args(argv)
    apply_platform(args)
    apply_multihost(args)
    cfg = config_from_args(args, TTTConfig)
    if args.ttc_recipe == "delivery":
        from ..train.ttt import apply_ttc_delivery_recipe

        cfg = apply_ttc_delivery_recipe(cfg)

    import jax

    if jax.process_count() > 1 and jax.process_index() == 0:
        # The TTT trainer's state (fine_error_vec, curriculum envs) is
        # host-replicated by design — a pod runs N identical copies, it
        # does not scale the batch. Say so loudly instead of implying DP.
        print(
            "[doodle_tpu] note: the TTT trainer runs host-replicated on "
            "multi-process runtimes (no batch sharding); use cli.train "
            "--data_parallel for pod-scaled training"
        )
    writer = make_writer(args)   # None on non-primary hosts
    best = ttt_train_and_eval(cfg, writer=writer)
    from ..parallel.launch import is_primary_host

    if is_primary_host():   # process 0 owns metrics_out + console lines
        write_metrics_out(args.metrics_out, best)
        print(f"best_test_mse: {best}")
    return best


if __name__ == "__main__":
    main()
