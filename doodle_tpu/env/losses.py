"""Flux-shaping losses.

Parity with the reference's loss helpers (``test_environment.py:92-171``)
and the metric computation inside ``HelioEnv.step``
(``test_environment.py:427-493``), as pure jit-able functions.

Reference quirks reproduced deliberately (they are behavior, not bugs):
  * the boundary loss shrinks the target box to 75% and then applies the
    0.75 tolerance a second time to the half-width inside the ReLU
    (``test_environment.py:123-124``);
  * the boundary "intersection" uses ``t = (targ_pos·v)/(−v·n)`` with the
    heliostat offset ignored in the numerator — an approximation computed
    from the action normals themselves, not the reflected rays;
  * angle clamping uses float32 nextafter(1, 0) bounds ± epsilon
    (``test_environment.py:147-154``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "boundary",
    "angles_mrad",
    "alignment_loss_cheap",
    "chamfer_loss",
    "flux_metrics",
    "spillage",
]


def boundary(
    vects: jax.Array,          # [B, N, 3] action normals
    heliostat_pos: jax.Array,  # [N, 3]
    targ_pos: jax.Array,       # [3]
    targ_norm: jax.Array,      # [3]
    targ_area: tuple[float, float],
    east_axis: jax.Array,      # [3]
    up_axis: jax.Array,        # [3]
    return_all: bool = False,
) -> jax.Array:
    """Anti-spillage penalty computed analytically from action normals.

    Distance (in local receiver coordinates) by which each normal's
    pseudo-intersection falls outside a 75%-shrunk target box, ReLU'd and
    root-summed; zero inside. Mean over all elements unless ``return_all``
    (ref ``test_environment.py:101-130``).
    """
    u, v = east_axis, up_axis
    border_tolerance = 0.75

    dots = jnp.einsum("bij,j->bi", -vects, targ_norm)
    eps = 1e-6
    valid = jnp.abs(dots) > eps
    t = jnp.einsum("j,bij->bi", targ_pos, vects) / (
        dots + (~valid).astype(vects.dtype) * eps
    )
    inter = heliostat_pos[None, :, :] + vects * t[..., None]
    local = inter - targ_pos
    xl = jnp.einsum("bij,j->bi", local, u)
    yl = jnp.einsum("bij,j->bi", local, v)
    hw = (targ_area[0] * border_tolerance) / 2.0
    hh = (targ_area[1] * border_tolerance) / 2.0
    dx = jax.nn.relu(jnp.abs(xl) - hw * border_tolerance)
    dy = jax.nn.relu(jnp.abs(yl) - hh * border_tolerance)
    dist = jnp.sqrt(dx * dx + dy * dy + 1e-8)
    inside = (jnp.abs(xl) <= hw) & (jnp.abs(yl) <= hh) & valid
    out = dist * (~inside).astype(vects.dtype)
    if return_all:
        return out
    return jnp.mean(out)


# float32 nextafter(1, 0): the clamp bound the reference builds with
# torch.nextafter (test_environment.py:148-150).
_UPPER_F32 = float(np.nextafter(np.float32(1.0), np.float32(0.0)))


def angles_mrad(
    v1: jax.Array, v2: jax.Array, epsilon: float = 1e-10
) -> jax.Array:
    """Angle between unit-vector batches in milliradians.

    acos of the dot product clamped just inside ±nextafter(1, 0), ×1000
    (ref ``test_environment.py:132-155``; assumes unit inputs, as there).
    Reduces over the last axis; broadcasts elsewhere.
    """
    cos = jnp.sum(v1 * v2, axis=-1)
    upper = _UPPER_F32 - epsilon
    lower = -_UPPER_F32 + epsilon
    return jnp.arccos(jnp.clip(cos, lower, upper)) * 1000.0


def alignment_loss_cheap(v1: jax.Array, v2: jax.Array) -> jax.Array:
    """(1 − cosine) × 1000 — the reference's cheap alignment alternative
    (``losses/alignment_loss.py:5-18``)."""
    return (1.0 - jnp.sum(v1 * v2, axis=-1)) * 1000.0


def chamfer_loss(
    pred_image: jax.Array,
    target_image: jax.Array,
    threshold: float = 0.1,
    kernel_size: int = 15,
) -> jax.Array:
    """Symmetric Chamfer-style flux-overlap distance
    (ref ``newenv/losses.py:4-40``).

    Binarizes both images at ``threshold`` and scores each binary mask
    against a distance map of the other. The "distance map" reproduces the
    reference's conv approximation: the *inverse* mask convolved with a
    ``kernel_size``² Euclidean-distance kernel — a neighborhood *sum* of
    distances, not a true min-distance transform (behavior, kept; the exact
    on-device EDT lives in ``ops.edt`` for callers who want the real thing).
    The convolution is a single XLA conv (MXU-friendly), jit-able.

    Accepts ``[H, W]`` or ``[B, H, W]``; returns a scalar summed over all
    pixels and batch elements, matching the reference's ``.sum()``.
    """
    pred = pred_image[None] if pred_image.ndim == 2 else pred_image
    targ = target_image[None] if target_image.ndim == 2 else target_image
    pred_bin = (pred > threshold).astype(jnp.float32)
    targ_bin = (targ > threshold).astype(jnp.float32)

    pad = kernel_size // 2
    coords = jnp.arange(kernel_size, dtype=jnp.float32) - pad
    dist_kernel = jnp.sqrt(
        coords[:, None] ** 2 + coords[None, :] ** 2
    )[None, None]                                   # [1, 1, k, k] (OIHW)

    def dt(inv_bin):                                # [B, H, W] → [B, H, W]
        return jax.lax.conv_general_dilated(
            inv_bin[:, None],                       # NCHW
            dist_kernel,
            window_strides=(1, 1),
            padding=[(pad, pad), (pad, pad)],
        )[:, 0]

    dt_pred = dt(1.0 - pred_bin)
    dt_targ = dt(1.0 - targ_bin)
    return jnp.sum(pred_bin * dt_targ) + jnp.sum(targ_bin * dt_pred)


def spillage(
    intersections: jax.Array,   # [..., 3] ray/plane intersection points
    plane_origin: jax.Array,    # [3]
    plane_u: jax.Array,         # [3]
    plane_v: jax.Array,         # [3]
    width: float,
    height: float,
) -> tuple[jax.Array, jax.Array]:
    """Spillage accounting from true ray/plane intersections.

    The older reference generations count rays whose intersection projects
    outside the target box (``newenv/newenv_rl_test_vec.py:213-218``,
    ``newenv/newenv_rl_test_loops.py:91-101``). Returns
    ``(mask [...], count)`` — the boolean per-ray mask and the total count
    over all leading axes. jit-able; the count is a traced scalar rather
    than the reference's host int.
    """
    rel = intersections - plane_origin
    pu = jnp.sum(rel * plane_u, axis=-1) / jnp.sum(plane_u * plane_u)
    pv = jnp.sum(rel * plane_v, axis=-1) / jnp.sum(plane_v * plane_v)
    mask = (jnp.abs(pu) > width / 2.0) | (jnp.abs(pv) > height / 2.0)
    return mask, jnp.sum(mask)


def flux_metrics(
    pred_img: jax.Array,        # [B, res, res]
    target_img: jax.Array,      # [B, res, res]
    distance_maps: jax.Array,   # [B, res, res]
    ideal_normals: jax.Array,   # [B, N, 3]
    actual_normals: jax.Array,  # [B, N, 3]
    use_error_mask: bool = False,
    error_mask_ratio: float = 0.2,
    batch_axis: str | None = None,
) -> dict[str, jax.Array]:
    """Core flux losses of ``HelioEnv.step`` (ref ``test_environment.py:427-457``).

    Both images are normalized by the *target's* per-image max; the optional
    error mask gates mse/dist to the worst ``error_mask_ratio`` fraction of
    images by mean absolute error (quantile with linear interpolation, like
    ``torch.quantile``).

    ``batch_axis``: when the batch dimension is a shard_map-manual mesh axis
    (each device sees a local slice), pass its name so the worst-k% cutoff —
    the one cross-batch nonlinearity in the loss set — is computed over the
    *global* batch via an ``all_gather`` of the per-image mean errors
    (B floats; negligible ICI traffic). All other reductions are local
    means, globalized by the caller's single post-step ``pmean``.

    Returns mse, dist, alignment_loss, plus the per-image mean-absolute-error
    (``mae_image``) and per-element alignment errors used by the monitor.
    """
    tx = jnp.clip(
        jnp.max(target_img, axis=(-2, -1), keepdims=True), min=1e-6
    )
    pred_n = pred_img / tx
    targ_n = target_img / tx

    err = jnp.abs(pred_n - targ_n)
    avg_error = jnp.mean(err, axis=(-2, -1))                  # [B]

    align_all = angles_mrad(ideal_normals, actual_normals)    # [B, N]
    alignment = jnp.mean(align_all)

    if use_error_mask:
        pool = (
            avg_error
            if batch_axis is None
            else jax.lax.all_gather(avg_error, batch_axis, tiled=True)
        )
        cutoff = jnp.quantile(pool, 1.0 - error_mask_ratio)
        mask = (avg_error > cutoff).astype(pred_n.dtype)[:, None, None]
        mse = jnp.mean((pred_n * mask - targ_n * mask) ** 2)
        dist = jnp.mean(jnp.sum(mask * (err * distance_maps), axis=(1, 2)))
    else:
        mse = jnp.mean((pred_n - targ_n) ** 2)
        dist = jnp.mean(jnp.sum(err * distance_maps, axis=(1, 2)))

    return {
        "mse": mse,
        "dist": dist,
        "alignment_loss": alignment,
        "mae_image": avg_error[:, None],
        "alignment_errors": align_all.reshape(-1),
    }
