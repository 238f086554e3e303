"""Shared argparse plumbing for the trainer CLIs."""

from __future__ import annotations

import argparse
import dataclasses
import json
from typing import Any


def add_dataclass_args(parser: argparse.ArgumentParser, cls) -> None:
    """One ``--flag`` per dataclass field, typed from the field default.

    bools use explicit true/false parsing (the reference's ``type=bool``
    flags silently treat any string as True — a footgun we don't copy);
    Optional[float] fields accept ``none``.
    """
    for f in dataclasses.fields(cls):
        name = f"--{f.name}"
        default = f.default
        optional = "None" in str(f.type)
        if isinstance(default, bool):
            parser.add_argument(
                name, type=lambda s: s.lower() in ("1", "true", "yes"),
                default=default,
            )
        elif isinstance(default, int) and not optional:
            parser.add_argument(name, type=int, default=default)
        elif isinstance(default, float) and not optional:
            parser.add_argument(name, type=float, default=default)
        elif optional and isinstance(default, (int, float, type(None))):
            parser.add_argument(
                name,
                type=lambda s: None if s.lower() == "none" else _num_or_str(s),
                default=default,
            )
        elif isinstance(default, str) and not optional:
            # Plain string field: keep values (and the default!) as
            # strings. The none→None mapping below is only for optional
            # fields — argparse re-parses STRING defaults through `type`,
            # so a field whose default is the literal "none" (e.g.
            # TTTConfig.remat_save) would silently become None here
            # (caught by an on-chip CLI drive, r5).
            parser.add_argument(name, type=str, default=default)
        elif default is None or isinstance(default, (str, type(None))):
            parser.add_argument(
                name,
                type=lambda s: None if s.lower() == "none" else _num_or_str(s),
                default=default,
            )
        else:
            continue  # non-scalar fields are not CLI-exposed


def _num_or_str(s: str) -> Any:
    try:
        return float(s) if "." in s or "e" in s.lower() else int(s)
    except ValueError:
        return s


def config_from_args(args: argparse.Namespace, cls):
    field_names = {f.name for f in dataclasses.fields(cls)}
    kwargs = {k: v for k, v in vars(args).items() if k in field_names}
    return cls(**kwargs)


def write_metrics_out(path: str | None, objective: float) -> None:
    if path:
        with open(path, "w") as f:
            json.dump({"objective": float(objective)}, f)


def add_platform_arg(parser: argparse.ArgumentParser) -> None:
    parser.add_argument(
        "--platform", type=str, default=None,
        help="force a JAX backend (e.g. 'cpu'). Needed for CPU HPO "
        "children: the axon TPU plugin in this image ignores the "
        "JAX_PLATFORMS env var, so the config API is the only override.",
    )


def apply_platform(args: argparse.Namespace) -> None:
    """Must run before any JAX backend is touched (i.e. first thing in
    ``main``, before building envs/policies)."""
    if getattr(args, "platform", None):
        import jax

        jax.config.update("jax_platforms", args.platform)


def add_multihost_args(parser: argparse.ArgumentParser) -> None:
    parser.add_argument(
        "--multihost", type=lambda s: s.lower() in ("1", "true", "yes"),
        default=False,
        help="bring up jax.distributed before training (multi-host pod). "
        "Autodetects Cloud TPU / SLURM / OpenMPI / JAX_COORDINATOR_ADDRESS; "
        "or pass --coordinator_address/--num_processes/--process_id "
        "explicitly. Every host runs the same command; writers and console "
        "output are gated to process 0 by the trainer.",
    )
    parser.add_argument("--coordinator_address", type=str, default=None)
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--process_id", type=int, default=None)


def apply_multihost(args: argparse.Namespace) -> bool:
    """Initialize jax.distributed when requested. Must run right after
    ``apply_platform`` (before the first JAX computation).

    Raises when ``--multihost true`` was explicitly requested but no
    cluster could be found or brought up — the user asked for a pod and
    must not silently get a single-process run.
    """
    if not (
        getattr(args, "multihost", False)
        or getattr(args, "coordinator_address", None)
    ):
        return False
    import jax

    from ..parallel.launch import initialize_distributed

    active = initialize_distributed(
        coordinator_address=getattr(args, "coordinator_address", None),
        num_processes=getattr(args, "num_processes", None),
        process_id=getattr(args, "process_id", None),
    )
    if getattr(args, "multihost", False) and not jax.distributed.is_initialized():
        raise RuntimeError(
            "--multihost true, but no cluster was detected: pass "
            "--coordinator_address/--num_processes/--process_id explicitly "
            "or launch under a recognized runtime (Cloud TPU pod, SLURM, "
            "OpenMPI, JAX_COORDINATOR_ADDRESS)."
        )
    return active


def ensure_pod_data_parallel(cfg):
    """On a multi-process runtime, the standard trainer must shard the env
    batch over the global mesh — otherwise every host redundantly runs the
    full unsharded program and collective checkpoint saves see only
    process-local arrays. Forces ``data_parallel=True`` (with a console
    warning) when ``jax.process_count() > 1``."""
    import jax

    if jax.process_count() > 1 and not cfg.data_parallel:
        if jax.process_index() == 0:
            print(
                "[doodle_tpu] multi-process runtime detected: forcing "
                "--data_parallel true (required on pods; see "
                "docs/MIGRATION.md)"
            )
        return dataclasses.replace(cfg, data_parallel=True)
    return cfg


def make_writer(args: argparse.Namespace):
    """--logdir → JsonlWriter (+TensorBoard with --tensorboard).

    Primary-host only: on a pod every host shares the filesystem, so
    constructing writers on non-primary processes would append duplicate
    params events to the same metrics.jsonl and spawn stray per-host
    TensorBoard event files (the trainer would discard-but-not-close them).
    Call after ``apply_multihost`` so ``jax.process_index()`` is final.
    """
    if not getattr(args, "logdir", None):
        return None
    from ..parallel.launch import is_primary_host

    if not is_primary_host():
        return None
    from ..utils import JsonlWriter, MultiWriter, TensorBoardWriter

    writers = [JsonlWriter(args.logdir, params=vars(args))]
    if getattr(args, "tensorboard", False):
        writers.append(TensorBoardWriter(args.logdir))
    return MultiWriter(*writers) if len(writers) > 1 else writers[0]
