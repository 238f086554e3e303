"""Mesh construction and EnvState sharding helpers."""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..env.env import EnvState

__all__ = [
    "BATCH_AXIS",
    "HELIO_AXIS",
    "make_mesh",
    "make_multislice_mesh",
    "shard_batch",
    "shard_env_state",
]

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


def make_multislice_mesh(
    helio_parallel: int = 1,
    devices: Sequence[jax.Device] | None = None,
    n_slices: int | None = None,
) -> Mesh:
    """Build a ``(batch, helio)`` mesh over a multi-slice (DCN-connected)
    TPU deployment, with the batch axis ordered **slice-major**.

    On a multislice pod the chips within one slice share ICI while slices
    only see each other over the much slower DCN. Laying the DP axis out
    slice-major (all of slice 0's chips, then slice 1's, ...) lets XLA
    decompose the gradient all-reduce hierarchically — per-slice
    reduce-scatter over ICI, one small cross-slice exchange over DCN,
    per-slice all-gather — instead of running a flat ring whose every
    (n_slices) hops cross DCN. The ``helio`` axis (a per-render ``psum``,
    latency-sensitive) is always confined *within* a slice.

    Slice membership comes from ``device.slice_index`` when the runtime
    exposes it (real multislice TPU); otherwise ``n_slices`` splits the
    device list into equal contiguous groups (virtual-device tests,
    DCN-connected CPU pools). With one slice this reduces exactly to
    :func:`make_mesh`.
    """
    if devices is None:
        devices = jax.devices()
    devices = list(devices)

    groups: dict[object, list[jax.Device]] = {}
    if any(getattr(d, "slice_index", None) is not None for d in devices):
        for d in devices:
            groups.setdefault(getattr(d, "slice_index", -1), []).append(d)
        slices = [groups[k] for k in sorted(groups)]
        if n_slices is not None and n_slices != len(slices):
            raise ValueError(
                f"runtime reports {len(slices)} slices, caller asked for "
                f"{n_slices}"
            )
    else:
        n_slices = n_slices or 1
        if len(devices) % n_slices != 0:
            raise ValueError(
                f"{len(devices)} devices not divisible into {n_slices} slices"
            )
        per = len(devices) // n_slices
        slices = [devices[i * per : (i + 1) * per] for i in range(n_slices)]

    per_slice = len(slices[0])
    if any(len(s) != per_slice for s in slices):
        raise ValueError(
            f"unequal slice sizes {[len(s) for s in slices]}: the batch axis "
            "needs the same DP width per slice"
        )
    if per_slice % helio_parallel != 0:
        raise ValueError(
            f"per-slice device count {per_slice} not divisible by "
            f"helio_parallel={helio_parallel} (the helio psum must stay on "
            "one slice's ICI)"
        )
    # [n_slices, per_slice/helio, helio] → slice-major batch axis.
    arr = np.array([np.array(s) for s in slices]).reshape(
        len(slices), per_slice // helio_parallel, helio_parallel
    )
    return Mesh(
        arr.reshape(-1, helio_parallel), (BATCH_AXIS, HELIO_AXIS)
    )


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
