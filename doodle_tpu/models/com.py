"""Differentiable center of mass for single-channel image batches.

Functional counterpart of the reference ``CenterOfMass2D``
(``layers/center_of_mass.py:4-60``): pixel intensities are mass, output is
``(x_com, y_com)`` with the origin at the top-left (x → columns/right,
y → rows/down), and zero-mass images map to ``(-1, -1)``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["center_of_mass_2d"]


def center_of_mass_2d(x: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Center of mass of ``[B, H, W]`` (or ``[B, 1, H, W]``) images → ``[B, 2]``.

    Negative intensities are clamped to zero; the denominator carries ``eps``
    so near-zero-mass images stay differentiable; exactly-zero-mass images
    return ``(-1, -1)`` via a ``where`` (gradients for other images are
    unaffected — branch-free version of ref ``layers/center_of_mass.py:55-58``).
    """
    if x.ndim == 4:
        x = x[:, 0]
    if x.ndim != 3:
        raise ValueError(f"expected [B, H, W] or [B, 1, H, W], got {x.shape}")

    H, W = x.shape[-2:]
    w = jnp.maximum(x, 0.0)
    yy = jnp.arange(H, dtype=x.dtype)[:, None]
    xx = jnp.arange(W, dtype=x.dtype)[None, :]

    w_sum = jnp.sum(w, axis=(-2, -1))
    x_com = jnp.sum(w * xx, axis=(-2, -1)) / (w_sum + eps)
    y_com = jnp.sum(w * yy, axis=(-2, -1)) / (w_sum + eps)
    coords = jnp.stack([x_com, y_com], axis=-1)

    no_mass = (w_sum <= 0.0)[..., None]
    return jnp.where(no_mass, jnp.full_like(coords, -1.0), coords)
