"""Checkpoint/restore via orbax — a new capability (SURVEY §5: the reference
never persists model state; only experiment-level resume exists).

Saves arbitrary pytrees (params, optimizer state, step counters) with
orbax's async-safe StandardCheckpointer. Restore round-trips shardings when
given a matching abstract target.
"""

from __future__ import annotations

import pathlib
from typing import Any

import jax

__all__ = ["save_checkpoint", "restore_checkpoint"]


def save_checkpoint(path: str, tree: Any, force: bool = True) -> str:
    """Write ``tree`` (any pytree of arrays) to ``path`` (absolute dir)."""
    import orbax.checkpoint as ocp

    p = pathlib.Path(path).absolute()
    p.parent.mkdir(parents=True, exist_ok=True)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(p, tree, force=force)
    return str(p)


def restore_checkpoint(path: str, target: Any | None = None) -> Any:
    """Load a checkpoint. ``target``: an example pytree (or abstract
    ShapeDtypeStructs) fixing structure/shardings; None restores as saved."""
    import orbax.checkpoint as ocp

    p = pathlib.Path(path).absolute()
    with ocp.StandardCheckpointer() as ckptr:
        if target is not None:
            abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, target)
            return ckptr.restore(p, abstract)
        return ckptr.restore(p)
