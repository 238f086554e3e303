"""Exact Euclidean distance transforms, on-device.

The reference computes its "distance maps" (the support of the dist-weighted
flux loss) by shipping every rendered image to the host and running scipy's
``distance_transform_edt`` (``test_environment.py:92-97``) — the only
device→host→device round-trip in its pipeline.

Here the transform runs on-device and under ``jit``. The exact squared EDT of
a binary mask decomposes into two 1-D min-plus passes (columns then rows):

    g[i, j]  = min_k  (i − k)²  over k with mask[k, j]
    D²[i, j] = min_l  g[i, l] + (j − l)²

Each pass is a min-plus contraction against the static ``(i−k)²`` kernel —
regular, static-shaped reductions the TPU vectorizes well. O(res³) work per
image, but this runs once per sun-position set (like the reference's cached
maps, ``test_environment.py:359-370``), not in the step hot path.

Results match ``scipy.ndimage.distance_transform_edt`` exactly: both compute
integer squared distances to the nearest masked pixel, then a square root.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["edt", "distance_maps"]

# Plain Python float: a module-level jnp constant would initialize the
# default JAX backend at import time, defeating any later
# jax.config.update("jax_platforms", ...) (e.g. cli --platform cpu).
_BIG = 1e12


def _sq_offsets(n: int) -> jax.Array:
    idx = jnp.arange(n, dtype=jnp.float32)
    return (idx[:, None] - idx[None, :]) ** 2  # [n, n]


def _minplus(kernel_sq: jax.Array, costs: jax.Array) -> jax.Array:
    """out[i, j] = min_k kernel_sq[i, k] + costs[k, j]."""
    return jnp.min(kernel_sq[:, :, None] + costs[None, :, :], axis=1)


def edt(mask: jax.Array) -> jax.Array:
    """Euclidean distance from every pixel to the nearest True pixel.

    Args:
      mask: ``[H, W]`` boolean (or {0,1}) array. Must contain at least one
            True pixel for meaningful output; an empty mask yields distances
            clamped to ~sqrt(1e12).
    Returns:
      ``[H, W]`` float32 distances (0 on mask pixels).
    """
    mask = mask.astype(bool)
    h, w = mask.shape
    # Pass 1: per-column squared distance to the nearest mask pixel in
    # that column.
    col_cost = jnp.where(mask, 0.0, _BIG).astype(jnp.float32)       # [h, w]
    g = _minplus(_sq_offsets(h), col_cost)                          # [h, w]
    # Pass 2: per-row min-plus against the column results.
    d_sq = _minplus(_sq_offsets(w), g.T).T                          # [h, w]
    return jnp.sqrt(d_sq)


@functools.partial(jax.jit, static_argnames=("threshold",))
def distance_maps(imgs: jax.Array, threshold: float = 0.5) -> jax.Array:
    """Per-image distance maps from flux images.

    For each image: binarize at ``threshold * max`` then take the EDT of the
    complement — distance of every pixel to the nearest bright pixel. Matches
    the reference's ``make_distance_maps`` (``test_environment.py:92-97``)
    but stays on-device and inside ``jit``.

    Args:
      imgs: ``[B, H, W]``.
    Returns:
      ``[B, H, W]`` float32.
    """
    maxes = jnp.max(imgs, axis=(-2, -1), keepdims=True)
    masks = imgs > threshold * maxes
    # lax.map (not vmap) keeps peak memory at one [H, W, W] reduction
    # temporary at a time; this path is reset-time only.
    return jax.lax.map(edt, masks)
