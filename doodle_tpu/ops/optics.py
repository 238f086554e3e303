"""Low-level differentiable optics kernels.

Pure ``jax.numpy`` functions; everything is shape-polymorphic over leading
batch dimensions where noted and safe under ``jit``/``vmap``/``grad``.

Capability parity with the reference's L0 layer
(``newenv_rl_test_multi_error.py:7-149``), re-derived from the underlying
math rather than translated:

  * :func:`reflect`            — specular reflection (ref ``:46-50``)
  * :func:`ray_plane_intersect`— masked ray/plane intersection (ref ``:52-75``)
  * :func:`rotate_mrad_eu`     — milliradian East/Up orientation error
                                 rotation (ref ``:78-104``)
  * :func:`cone_project`       — projection onto a circular cone
                                 (ref ``:7-44``; dead code in the reference's
                                 current render path but part of its API)
  * :func:`ideal_normals`      — half-vector aiming law (ref ``:256-278``)

Conventions (identical to the reference):
  * incident vectors point FROM the heliostat TOWARD the sun;
  * orientation errors are given in **milliradians** as (East-axis, Up-axis)
    pairs and applied as an Up(Z) rotation followed by an East(X) rotation;
  * rays parallel to the target plane are masked to zero, never NaN, so the
    whole pipeline stays differentiable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "normalize",
    "safe_norm",
    "reflect",
    "ray_plane_intersect",
    "rotate_mrad_eu",
    "cone_project",
    "ideal_normals",
]

_EPS_NORM = 1e-9


def safe_norm(v: jax.Array, axis: int = -1, keepdims: bool = True) -> jax.Array:
    """L2 norm with a NaN-free gradient at ``v == 0``.

    ``jnp.linalg.norm`` has gradient 0/0 = NaN at the origin, and JAX's
    ``maximum(norm, eps)`` clamp does not stop that NaN from propagating
    (0 * NaN = NaN through the chain rule). The double-``where`` below keeps
    both the value and the gradient finite — matching torch's convention of
    a zero subgradient for ``norm`` at 0 (the reference relies on it via
    ``.norm(...).clamp_min(1e-9)``).
    """
    sq = jnp.sum(v * v, axis=axis, keepdims=keepdims)
    positive = sq > 0
    safe_sq = jnp.where(positive, sq, 1.0)
    return jnp.where(positive, jnp.sqrt(safe_sq), 0.0)


def normalize(v: jax.Array, axis: int = -1, eps: float = _EPS_NORM) -> jax.Array:
    """Unit-normalize along ``axis`` with the reference's clamp-min semantics.

    Matches ``v / v.norm(dim).clamp_min(1e-9)`` (used throughout the
    reference, e.g. ``newenv_rl_test_multi_error.py:48,192,264-267``):
    zero vectors map to zero, not NaN — in value *and* in gradient.
    """
    return v / jnp.maximum(safe_norm(v, axis=axis), eps)


def reflect(incidents: jax.Array, normals: jax.Array) -> jax.Array:
    """Specular reflection of ``incidents`` about ``normals``.

    ``incidents`` point heliostat→sun; the returned vector is the outgoing
    ray direction ``2 (i·n̂) n̂ − i`` (written in the reference's sign
    convention ``-i − 2(−i·n̂)n̂``, ``newenv_rl_test_multi_error.py:46-50``).
    ``normals`` are unit-normalized internally; ``incidents`` are used as
    given. Broadcasts over any leading dims; the vector axis is the last.
    """
    n_unit = normalize(normals)
    dots = -jnp.sum(incidents * n_unit, axis=-1, keepdims=True)
    return -incidents - 2.0 * dots * n_unit


def ray_plane_intersect(
    ray_origins: jax.Array,
    ray_dirs: jax.Array,
    plane_point: jax.Array,
    plane_normal: jax.Array,
    epsilon: float = 1e-9,
) -> tuple[jax.Array, jax.Array]:
    """Intersect rays with a single plane, masking near-parallel rays.

    Returns ``(intersections, valid_mask)`` where ``valid_mask`` is a float
    ``[..., 1]`` tensor (1.0 for valid rays). Invalid (parallel) rays get an
    all-zero intersection point rather than inf/NaN, keeping gradients clean
    — same contract as the reference (``newenv_rl_test_multi_error.py:52-75``).

    Broadcasts over leading dims of ``ray_origins``/``ray_dirs``; the plane
    is a single (point, normal) pair.
    """
    n_unit = plane_normal / jnp.maximum(jnp.linalg.norm(plane_normal), _EPS_NORM)
    denom = jnp.sum(ray_dirs * n_unit, axis=-1, keepdims=True)
    valid = jnp.abs(denom) > epsilon
    safe_denom = jnp.where(valid, denom, epsilon)
    t = jnp.sum((plane_point - ray_origins) * n_unit, axis=-1, keepdims=True) / safe_denom
    safe_t = jnp.where(valid, t, 0.0)
    intersections = ray_origins + safe_t * ray_dirs
    intersections = jnp.where(valid, intersections, 0.0)
    return intersections, valid.astype(ray_dirs.dtype)


def rotate_mrad_eu(normals: jax.Array, error_angles_mrad: jax.Array) -> jax.Array:
    """Rotate normals by (East-axis, Up-axis) errors given in milliradians.

    Order of application (matches ``newenv_rl_test_multi_error.py:78-104``):
    first rotate about the Up/Z axis by the *second* component, then about
    the East/X axis by the *first* component. Closed form, no matmuls —
    pure VPU elementwise work.

    Args:
      normals:           ``[..., 3]``.
      error_angles_mrad: ``[..., 2]`` (East, Up) in mrad, broadcastable
                         against the leading dims of ``normals``.
    """
    angle_e = error_angles_mrad[..., 0] * 1e-3
    angle_u = error_angles_mrad[..., 1] * 1e-3
    cos_e, sin_e = jnp.cos(angle_e), jnp.sin(angle_e)
    cos_u, sin_u = jnp.cos(angle_u), jnp.sin(angle_u)

    x, y, z = normals[..., 0], normals[..., 1], normals[..., 2]
    # Up (Z) rotation
    x_u = cos_u * x - sin_u * y
    y_u = sin_u * x + cos_u * y
    # East (X) rotation
    y_e = cos_e * y_u - sin_e * z
    z_e = sin_e * y_u + cos_e * z
    return jnp.stack([x_u, y_e, z_e], axis=-1)


def cone_project(
    a: jax.Array,
    b: jax.Array,
    theta: float,
    eps: float = 1e-12,
) -> jax.Array:
    """Project vectors ``a`` onto the circular cone of half-angle ``theta``
    around axis ``b`` (apex at the origin).

    Three cases per vector (reference ``newenv_rl_test_multi_error.py:7-44``;
    kept for API completeness — the reference's render path has this call
    commented out at ``:361-365``):
      * already inside the cone → unchanged;
      * in the polar opposite cone → zero;
      * otherwise → nearest point on the cone surface.

    Vector axis is the last; broadcasts over leading dims. Branch-free
    (``jnp.where``) so it stays jit/vmap/grad friendly.
    """
    b_norm = jnp.maximum(safe_norm(b), eps)
    c = b / b_norm

    beta = jnp.sum(a * c, axis=-1, keepdims=True)
    u = a - beta * c
    alpha = safe_norm(u)

    tau = jnp.maximum(jnp.tan(jnp.asarray(theta, dtype=a.dtype)), eps)
    thresh = alpha / tau

    inside = beta >= thresh
    zero = beta <= -thresh

    s = 0.5 * (beta + thresh)
    # alpha > 0 whenever the middle branch is taken; guard the division anyway.
    w_scale = (beta * tau + alpha) / jnp.maximum(2.0 * alpha, eps)
    mid_val = s * c + w_scale * u

    out = jnp.where(inside, a, jnp.where(zero, jnp.zeros_like(a), mid_val))
    return out


def ideal_normals(
    heliostat_pos: jax.Array,
    target_pos: jax.Array,
    sun_pos: jax.Array,
) -> jax.Array:
    """Per-heliostat normals that reflect the sun exactly onto the target.

    The aiming law is the unit half-vector between the (unit) heliostat→sun
    and heliostat→target directions (reference
    ``newenv_rl_test_multi_error.py:256-278``).

    Args:
      heliostat_pos: ``[N, 3]``.
      target_pos:    ``[3]``.
      sun_pos:       ``[3]`` or ``[B, 3]``.
    Returns:
      ``[N, 3]`` or ``[B, N, 3]`` unit normals, matching ``sun_pos`` rank.
    """
    batched = sun_pos.ndim > 1
    sun = jnp.atleast_2d(sun_pos)  # [B, 3]
    incidents = sun[:, None, :] - heliostat_pos[None, :, :]
    reflected = target_pos[None, None, :] - heliostat_pos[None, :, :]
    half = normalize(incidents) + normalize(reflected)
    out = normalize(half)
    return out if batched else out[0]
