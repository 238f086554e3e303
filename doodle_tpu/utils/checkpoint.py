"""Checkpoint/restore via orbax — a new capability (SURVEY §5: the reference
never persists model state; only experiment-level resume exists).

Saves arbitrary pytrees (params, optimizer state, step counters) with
orbax's async-safe StandardCheckpointer. Restore round-trips shardings when
given a matching abstract target.

Checkpoints are **self-describing** (VERDICT r2 item 3): ``save_checkpoint``
accepts a JSON-serializable ``meta`` dict — the trainers store the policy's
constructor kwargs and the full train config — written as a
``<path>_meta.json`` sidecar (primary host only; orbax owns the checkpoint
directory itself and may atomically replace it). ``serve.InferenceSession
.from_checkpoint`` rebuilds the exact training-time policy from the sidecar,
no hand-matched kwargs needed.

Multi-process: orbax saves are COLLECTIVE — every process must call
``save_checkpoint`` (each writes its addressable shards); only the sidecar
write is primary-gated. Restoring with a ``target`` whose arrays carry
shardings for the *current* mesh performs elastic resume: the checkpoint's
layout on disk is mesh-agnostic, so a run saved on one process/device
topology restores onto any other (exercised by ``tests/test_multihost.py``).
"""

from __future__ import annotations

import dataclasses
import json
import pathlib
from typing import Any

import jax

__all__ = [
    "save_checkpoint",
    "restore_checkpoint",
    "load_meta",
    "policy_meta",
]


def save_checkpoint(
    path: str, tree: Any, force: bool = True, meta: dict | None = None
) -> str:
    """Write ``tree`` (any pytree of arrays) to ``path`` (absolute dir).

    Collective on multi-process runtimes: call from EVERY process. ``meta``
    (JSON-serializable) is written to ``<path>_meta.json`` by process 0.
    """
    import orbax.checkpoint as ocp

    p = pathlib.Path(path).absolute()
    p.parent.mkdir(parents=True, exist_ok=True)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(p, tree, force=force)
    if meta is not None and jax.process_index() == 0:
        meta_path = p.parent / (p.name + "_meta.json")
        meta_path.write_text(json.dumps(meta, default=str))
    return str(p)


def restore_checkpoint(path: str, target: Any | None = None) -> Any:
    """Load a checkpoint. ``target``: an example pytree (or abstract
    ShapeDtypeStructs) fixing structure/shardings; None restores as saved.

    Elastic resume: pass a ``target`` built for the CURRENT mesh/device
    count — orbax reshards from the on-disk layout, which is topology-free.
    """
    import orbax.checkpoint as ocp

    p = pathlib.Path(path).absolute()
    with ocp.StandardCheckpointer() as ckptr:
        if target is not None:
            abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, target)
            return ckptr.restore(p, abstract)
        try:
            return ckptr.restore(p)
        except ValueError:
            # Saved on a different process/device topology (orbax refuses
            # to rebuild shardings for devices that no longer exist, e.g. a
            # pod checkpoint opened single-process for serving). Rebuild a
            # shape/dtype-only target from the stored metadata and restore
            # onto the current default device.
            meta = ckptr.metadata(p).item_metadata.tree
            sharding = jax.sharding.SingleDeviceSharding(
                jax.local_devices()[0]
            )
            abstract = jax.tree.map(
                lambda m: jax.ShapeDtypeStruct(
                    m.shape, m.dtype, sharding=sharding
                ),
                meta,
            )
            return ckptr.restore(p, abstract)


def load_meta(path: str) -> dict | None:
    """Read the ``<path>_meta.json`` sidecar written by ``save_checkpoint``
    (None when the checkpoint predates self-describing metadata)."""
    p = pathlib.Path(path).absolute()
    meta_path = p.parent / (p.name + "_meta.json")
    if not meta_path.exists():
        return None
    return json.loads(meta_path.read_text())


def policy_meta(policy) -> dict:
    """The policy's constructor kwargs as a JSON-serializable dict.

    flax Modules are dataclasses, so the field values ARE the construction
    arguments — recording them reproduces the exact architecture at restore
    time (``PolicyNet(**meta)``).
    """
    skip = {"parent", "name"}
    out = {}
    for f in dataclasses.fields(policy):
        if f.name in skip:
            continue
        v = getattr(policy, f.name)
        out[f.name] = list(v) if isinstance(v, tuple) else v
    return out
