"""Sun-direction sampling.

Parity with the reference helpers in ``test_environment.py:18-88`` — az/el →
ENU unit vector and uniform sampling on a spherical cap — with explicit PRNG
keys instead of global torch RNG state.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..ops.optics import normalize

__all__ = [
    "azel_to_direction",
    "sample_cone_directions",
    "sample_sun_positions",
    "SUN_RADIUS",
]

# The reference places suns at a fixed range hypot(10000, 10000) from the
# origin (test_environment.py:323-326).
SUN_RADIUS = math.hypot(10000.0, 10000.0)


def azel_to_direction(azimuth_deg: float, elevation_deg: float) -> jax.Array:
    """Azimuth/elevation (degrees) → ENU unit direction.

    0° azimuth = +X, increasing CCW toward +Y; 0° elevation = horizon,
    90° = zenith (ref ``test_environment.py:18-40``).
    """
    az = math.radians(azimuth_deg)
    el = math.radians(elevation_deg)
    v = jnp.array(
        [
            math.cos(el) * math.cos(az),
            math.cos(el) * math.sin(az),
            math.sin(el),
        ],
        dtype=jnp.float32,
    )
    return v / jnp.linalg.norm(v)


def sample_cone_directions(
    key: jax.Array,
    n: int,
    axis: jax.Array,
    half_angle_deg: float,
    force_upper_hemisphere: bool = False,
) -> jax.Array:
    """Uniformly sample ``n`` unit vectors on the spherical cap around ``axis``.

    cosθ ~ U[cos α, 1], φ ~ U[0, 2π), constructed in an orthonormal basis
    {u, v, axis}; optionally mirror below-horizon samples upward via
    ``|z|`` (ref ``test_environment.py:42-88``, including the basis-helper
    switch when the axis is nearly vertical).
    """
    a = normalize(axis, axis=0) if axis.ndim == 1 else normalize(axis)
    helper = jnp.where(
        jnp.abs(a[2]) > 0.999,
        jnp.array([0.0, 1.0, 0.0], dtype=a.dtype),
        jnp.array([0.0, 0.0, 1.0], dtype=a.dtype),
    )
    u = normalize(jnp.cross(helper, a), axis=0)
    v = jnp.cross(a, u)

    alpha = math.radians(half_angle_deg)
    k1, k2 = jax.random.split(key)
    u01 = jax.random.uniform(k1, (n,), dtype=a.dtype)
    cos_theta = 1.0 - u01 * (1.0 - math.cos(alpha))
    sin_theta = jnp.sqrt(jnp.clip(1.0 - cos_theta**2, min=0.0))
    phi = 2.0 * math.pi * jax.random.uniform(k2, (n,), dtype=a.dtype)

    dirs = (
        u[None, :] * (sin_theta * jnp.cos(phi))[:, None]
        + v[None, :] * (sin_theta * jnp.sin(phi))[:, None]
        + a[None, :] * cos_theta[:, None]
    )
    dirs = normalize(dirs)
    if force_upper_hemisphere:
        dirs = dirs.at[:, 2].set(jnp.abs(dirs[:, 2]))
    return dirs


def sample_sun_positions(
    key: jax.Array,
    batch_size: int,
    azimuth: float | None,
    elevation: float | None,
    single_sun: bool = False,
    half_angle_deg: float = 2.0,
    radius: float = SUN_RADIUS,
) -> jax.Array:
    """Sample the env's ``[B, 3]`` sun positions.

    With az/el given: B draws from a ``half_angle_deg`` cone about the
    primary direction (or 1 draw repeated B times when ``single_sun``).
    Without: random upper-hemisphere directions. Either way scaled to
    ``radius`` (ref ``test_environment.py:286-326``).
    """
    if azimuth is not None and elevation is not None:
        primary = azel_to_direction(azimuth, elevation)
        n = 1 if single_sun else batch_size
        dirs = sample_cone_directions(
            key, n, primary, half_angle_deg, force_upper_hemisphere=True
        )
        if single_sun:
            dirs = jnp.tile(dirs, (batch_size, 1))
    else:
        n = 1 if single_sun else batch_size
        dirs = normalize(jax.random.normal(key, (n, 3), dtype=jnp.float32))
        if single_sun:
            dirs = jnp.tile(dirs, (batch_size, 1))
        dirs = dirs.at[:, 2].set(jnp.abs(dirs[:, 2]))
    return dirs * radius
