"""Gaussian flux splatting onto the receiver grid — the hot kernel.

The reference implementation (``newenv_rl_test_multi_error.py:107-149``)
materializes, for every ray m of M = B*N, the full ``[M, res, res]`` tensor
of squared distances from each receiver-grid point to the ray's plane
intersection and exponentiates it: O(M * res^2) transcendentals and, at the
north-star config (B=128, N=500, res=256), a ~16.8 GB intermediate.

TPU-native reformulation (exact, not an approximation): the receiver grid is
``p(i, j) = origin + gx_i * u + gy_j * v`` with {u, v} an *orthonormal* basis
of the plane (the scene construction guarantees u ⟂ v, |u| = |v| = 1, see
``core/scene.py``). Writing r = intersection − origin and a = r·u, b = r·v,
c = r − a·u − b·v (the off-plane residual; ~0 for true intersections but kept
for exactness):

    |p(i,j) − x|² = (gx_i − a)² + (gy_j − b)² + |c|²

so the per-ray Gaussian **separates into an outer product**:

    exp(−d²/2σ²) = [exp(−((gx_i−a)² + |c|²)/2σ²)] ⊗ [exp(−(gy_j−b)²/2σ²)]

and the sum over heliostats becomes a batched matmul on the MXU:

    image[b] = Fx[b]ᵀ @ Fy[b],   Fx, Fy : [N, res] exp tables.

Cost: O(B·N·res) transcendentals (a factor res/2 fewer than the reference)
plus B·res²·N MACs of matmul — exactly the op the MXU is built for — with no
[M, res, res] intermediate at any point. XLA's autodiff of (elementwise exp +
matmul) yields an equally matmul-shaped backward pass.

Invalid-ray semantics (parity quirk): the reference multiplies the *diffs* by
the valid mask before squaring, so an invalid (plane-parallel) ray contributes
exp(0) = 1 over the whole image (``newenv_rl_test_multi_error.py:140-148``).
We reproduce this exactly by forcing both factor vectors to 1 for invalid
rays (1 ⊗ 1 = all-ones image contribution).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .optics import safe_norm

__all__ = ["splat_factors", "splat_image", "splat_images_summed"]


def _grid_axis(extent: float, resolution: int, dtype) -> jax.Array:
    """Receiver-grid sample coordinates: linspace(-extent/2, extent/2, res).

    Matches the reference's ``torch.linspace`` grid
    (``newenv_rl_test_multi_error.py:129-130``).
    """
    return jnp.linspace(-extent / 2.0, extent / 2.0, resolution, dtype=dtype)


def splat_factors(
    intersections: jax.Array,   # [..., 3]
    ray_origins: jax.Array,     # [..., 3] heliostat positions (σ anchor)
    plane_origin: jax.Array,    # [3]
    plane_u: jax.Array,         # [3] unit, ⟂ plane_v
    plane_v: jax.Array,         # [3] unit
    width: float,
    height: float,
    resolution: int,
    sigma_scale: float,
    valid_mask: jax.Array,      # [..., 1] float (1 = valid)
) -> tuple[jax.Array, jax.Array]:
    """Per-ray separable Gaussian factor tables.

    Returns ``(fx, fy)`` with shape ``[..., resolution]`` each such that the
    ray's image contribution is ``fx[..., :, None] * fy[..., None, :]``
    (row index ↔ the u/"east" grid axis, matching the reference's
    ``meshgrid(indexing='ij')`` layout, ``newenv_rl_test_multi_error.py:131``).

    σ = clamp(sigma_scale * |intersection − origin|, 1e-9) — the Gaussian
    width grows with the heliostat→intersection distance (ref ``:126-127``),
    and 2σ² is clamped at 1e-12 (ref ``:146``).
    """
    dtype = intersections.dtype
    distances = safe_norm(intersections - ray_origins, keepdims=False)
    sigma = jnp.maximum(sigma_scale * distances, 1e-9)
    inv_two_sigma_sq = 1.0 / jnp.maximum(2.0 * sigma * sigma, 1e-12)  # [...]

    r = intersections - plane_origin                     # [..., 3]
    a = jnp.sum(r * plane_u, axis=-1)                    # [...]
    b = jnp.sum(r * plane_v, axis=-1)                    # [...]
    # Off-plane residual, computed by explicit orthogonalization (no
    # cancellation-prone |r|² − a² − b²).
    r_perp = r - a[..., None] * plane_u - b[..., None] * plane_v
    c_sq = jnp.sum(r_perp * r_perp, axis=-1)             # [...]

    gx = _grid_axis(width, resolution, dtype)            # [res]
    gy = _grid_axis(height, resolution, dtype)           # [res]

    dx_sq = (gx - a[..., None]) ** 2                     # [..., res]
    dy_sq = (gy - b[..., None]) ** 2                     # [..., res]

    s = inv_two_sigma_sq[..., None]
    fx = jnp.exp(-(dx_sq + c_sq[..., None]) * s)
    fy = jnp.exp(-dy_sq * s)

    # Invalid rays contribute a constant-1 image (see module docstring).
    valid = valid_mask  # [..., 1]
    fx = jnp.where(valid > 0, fx, 1.0)
    fy = jnp.where(valid > 0, fy, 1.0)
    return fx, fy


def splat_image(
    fx: jax.Array, fy: jax.Array, precision: str | None = "highest"
) -> jax.Array:
    """Contract per-ray factors into summed flux images.

    Args:
      fx, fy: ``[..., N, res]`` factor tables for N rays per image.
      precision: matmul precision for the contraction. On TPU, ``"highest"``
        keeps the MXU in full-f32 mode (needed for bitwise-level parity with
        the reference); ``"default"`` allows the faster reduced-precision
        passes — a deliberate perf/parity knob for training runs.
    Returns:
      ``[..., res, res]`` images: ``sum_n outer(fx[n], fy[n])`` — a single
      (batched) [res, N] @ [N, res] contraction that XLA maps onto the MXU.
    """
    return jnp.einsum(
        "...nx,...ny->...xy",
        fx,
        fy,
        precision=precision,
        preferred_element_type=fx.dtype,
    )


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "resolution", "sigma_scale", "precision"),
)
def splat_images_summed(
    intersections: jax.Array,   # [B, N, 3]
    ray_origins: jax.Array,     # [B, N, 3]
    plane_origin: jax.Array,
    plane_u: jax.Array,
    plane_v: jax.Array,
    width: float,
    height: float,
    resolution: int,
    sigma_scale: float,
    valid_mask: jax.Array,      # [B, N, 1]
    precision: str | None = "highest",
) -> jax.Array:
    """Fused splat + heliostat reduction: ``[B, N, 3]`` rays → ``[B, res, res]``.

    Equivalent to the reference's ``gaussian_blur_batch`` followed by
    ``gauss.view(B, N, res, res).sum(dim=1)``
    (``newenv_rl_test_multi_error.py:391-406``), without ever materializing
    the [B*N, res, res] tensor.
    """
    fx, fy = splat_factors(
        intersections, ray_origins, plane_origin, plane_u, plane_v,
        width, height, resolution, sigma_scale, valid_mask,
    )
    return splat_image(fx, fy, precision=precision)
