"""Mesh construction and EnvState sharding helpers."""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..env.env import EnvState

__all__ = ["BATCH_AXIS", "HELIO_AXIS", "make_mesh", "shard_batch", "shard_env_state"]

# Canonical axis names. "batch" is the data axis (env batch = suns ×
# error-samples); "helio" optionally shards the heliostat dimension of the
# render reduction (model-ish axis for 10k+ mirror fields).
BATCH_AXIS = "batch"
HELIO_AXIS = "helio"


def make_mesh(
    n_devices: int | None = None,
    helio_parallel: int = 1,
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """Build a ``(batch, helio)`` device mesh.

    ``n_devices`` defaults to all visible devices; ``helio_parallel`` splits
    them between the data axis and the heliostat axis
    (``batch = n // helio_parallel``). On a pod slice, lay the batch axis
    along the torus so gradient ``psum`` rides ICI.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = list(devices)[:n_devices]
    if n_devices % helio_parallel != 0:
        raise ValueError(
            f"n_devices={n_devices} not divisible by helio_parallel={helio_parallel}"
        )
    arr = np.array(devices).reshape(n_devices // helio_parallel, helio_parallel)
    return Mesh(arr, (BATCH_AXIS, HELIO_AXIS))


def shard_batch(mesh: Mesh, x: jax.Array) -> jax.Array:
    """Place ``x`` with its leading axis sharded over the batch mesh axis."""
    spec = P(BATCH_AXIS, *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def shard_env_state(mesh: Mesh, state: EnvState) -> EnvState:
    """Shard every batch-leading field of an :class:`EnvState` over the
    batch axis; scalar fields (ref_min/ref_max) are replicated."""

    def place(x):
        if getattr(x, "ndim", 0) >= 1:
            return shard_batch(mesh, x)
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree.map(place, state)
