"""Multi-process (multi-host pod) runtime bring-up.

The reference has no distributed runtime at all (SURVEY §0: no
``torch.distributed``/NCCL/MPI anywhere; its only multi-device mechanism is
process-per-GPU HPO, ``newenv/run_optuna_experiments.py:88-90``). The
TPU-native scaling story (BASELINE config 5: 2000 heliostats, env batches
sharded over >=2 hosts) instead runs ONE SPMD program over every chip of a
pod: each host launches the same script, ``jax.distributed`` connects the
processes, ``jax.devices()`` becomes the *global* device list, and the
existing :func:`~doodle_tpu.parallel.make_mesh` /
:func:`~doodle_tpu.parallel.make_multislice_mesh` meshes + shardings span
hosts with no further code changes (gradient all-reduce rides ICI within a
slice, DCN across slices — analytic budget in BASELINE.md).

This module is the thin host-runtime layer around that model:

* :func:`initialize_distributed` — idempotent ``jax.distributed`` bring-up:
  explicit coordinator args, environment autodetection (Cloud TPU metadata,
  SLURM, OpenMPI, ``JAX_COORDINATOR_ADDRESS``), and a safe no-op for
  ordinary single-process runs.
* :func:`is_primary_host` / :func:`is_multiprocess` — gate host-side
  effects (writers, console lines, HTML/PNG dumps) to process 0. Device
  code needs no gating: checkpoint saves (orbax) are collective and must
  run on every process, and metric fetches read fully-replicated arrays,
  which every process can address.
* :func:`sync_hosts` / :func:`broadcast_from_primary` — barrier and
  host-to-host broadcast for the few places host code must agree (e.g.
  making a run directory before any process writes into it).

Executed evidence (not just a virtual mesh): ``tests/test_multihost.py``
runs the real cross-process path — two OS processes with two CPU devices
each, gloo collectives — through ``make_sharded_train_step`` on a global
4-device mesh and asserts parity with the same step on a single-process
mesh.
"""

from __future__ import annotations

import os
from typing import Any

import jax

__all__ = [
    "initialize_distributed",
    "is_multiprocess",
    "is_primary_host",
    "sync_hosts",
    "broadcast_from_primary",
]


def _env_int(name: str) -> int | None:
    v = os.environ.get(name)
    if v is None or v == "":
        return None
    try:
        return int(v)
    except ValueError:
        return None


def _cluster_env_detected() -> bool:
    """True when the environment says this process is one of several.

    Covers the launchers ``jax.distributed.initialize()`` can autodetect
    (Cloud TPU pod metadata, SLURM, OpenMPI) plus the explicit
    ``JAX_COORDINATOR_ADDRESS`` convention.
    """
    env = os.environ
    if env.get("JAX_COORDINATOR_ADDRESS") or env.get("COORDINATOR_ADDRESS"):
        return True
    ntasks = _env_int("SLURM_NTASKS")
    if ntasks is not None and ntasks > 1:
        return True
    world = _env_int("OMPI_COMM_WORLD_SIZE")
    if world is not None and world > 1:
        return True
    # Cloud TPU pod: the runtime lists every worker's hostname. A single
    # entry is a single-host deployment (the axon image sets
    # TPU_WORKER_HOSTNAMES=localhost), not a pod.
    hostnames = env.get("TPU_WORKER_HOSTNAMES", "")
    if len([h for h in hostnames.split(",") if h.strip()]) > 1:
        return True
    if env.get("MEGASCALE_COORDINATOR_ADDRESS"):
        return True
    return False


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids: Any | None = None,
) -> bool:
    """Bring up ``jax.distributed`` if this run spans processes.

    Returns True when a multi-process runtime is active afterwards, False
    for a plain single-process run. Idempotent: a second call is a no-op.

    Resolution order:
      1. already initialized -> report current state;
      2. explicit args -> ``jax.distributed.initialize(**args)``;
      3. ``JAX_COORDINATOR_ADDRESS`` (+ ``JAX_NUM_PROCESSES`` /
         ``JAX_PROCESS_ID``) -> initialize from those;
      4. a recognized cluster launcher (Cloud TPU pod, SLURM, OpenMPI) ->
         ``jax.distributed.initialize()`` autodetection;
      5. nothing detected -> no-op (single process).

    Must run before the first JAX computation (backend init); the package
    keeps imports backend-free so calling this first thing in ``main()`` is
    safe.
    """
    if jax.distributed.is_initialized():
        return jax.process_count() > 1

    env = os.environ
    if coordinator_address is None:
        coordinator_address = (
            env.get("JAX_COORDINATOR_ADDRESS") or env.get("COORDINATOR_ADDRESS")
        )
        if coordinator_address is not None:
            if num_processes is None:
                num_processes = _env_int("JAX_NUM_PROCESSES")
            if process_id is None:
                process_id = _env_int("JAX_PROCESS_ID")

    if coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            local_device_ids=local_device_ids,
        )
        return jax.process_count() > 1

    if _cluster_env_detected():
        # Launcher autodetection (Cloud TPU metadata, SLURM, OpenMPI).
        jax.distributed.initialize()
        return jax.process_count() > 1

    return False


def is_multiprocess() -> bool:
    """True when this run spans more than one OS process."""
    return jax.process_count() > 1


def is_primary_host() -> bool:
    """True on process 0 — the only process that should write logs,
    console lines, and diagnostic dumps. (Checkpoint saves are collective:
    every process must call them.)"""
    return jax.process_index() == 0


def sync_hosts(tag: str = "doodle_tpu_barrier") -> None:
    """Cross-host barrier (no-op semantics on a single process): every
    process blocks until all processes reach the same ``tag``."""
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(tag)


def broadcast_from_primary(tree: Any) -> Any:
    """Broadcast a host-side pytree of arrays/scalars from process 0 to all
    processes (identity on a single process). Use for values that must be
    identical across hosts but are produced by host-side code (sampled run
    ids, resolved run directories, host clocks)."""
    from jax.experimental import multihost_utils

    return multihost_utils.broadcast_one_to_all(tree)
