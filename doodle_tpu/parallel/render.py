"""Heliostat-axis-sharded rendering.

For fields too large for one chip's HBM/FLOPs (10k+ mirrors), shard the
heliostat axis of the render over the ``helio`` mesh axis with ``shard_map``:
each device computes the splat contribution of its mirror chunk, and the
flux images are summed with a single ``psum`` over ICI — the reduction over
heliostats *is* the collective. The flux image is linear in per-mirror
contributions, so this is exact.

On a 2-axis ``(batch, helio)`` mesh the sun batch is simultaneously
sharded over the ``batch`` axis (each device renders its [B/nb, N/nh]
block), so the same function is the combined DP × mirror-parallel
program; the batch axis needs no collective (images are per-sun) and is
a no-op when its size is 1.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.field import apply_orientation_errors
from ..core.scene import FieldConfig, Scene
from ..ops.optics import normalize, ray_plane_intersect, reflect
from ..ops.splat import splat_factors, splat_image
from .mesh import BATCH_AXIS, HELIO_AXIS

__all__ = ["render_helio_sharded"]


def render_helio_sharded(
    scene: Scene,
    cfg: FieldConfig,
    sun_pos: jax.Array,       # [B, 3]              (replicated)
    normals: jax.Array,       # [B, N, 3]           (sharded over N)
    errors_mrad: jax.Array,   # [B, N, 2]           (sharded over N)
    mesh: Mesh,
) -> jax.Array:
    """Render ``[B, res, res]`` flux images with the heliostat axis sharded
    (and, on a 2-axis mesh, the sun batch sharded over ``batch``).

    ``scene.heliostat_pos``/``normals``/``errors_mrad`` must have N divisible
    by the ``helio`` mesh-axis size and B divisible by the ``batch`` axis
    size. Returns images summed over heliostats, batch-sharded like the
    inputs (replicated when the batch axis has size 1).
    """
    n_shards = mesh.shape[HELIO_AXIS]
    nb = mesh.shape[BATCH_AXIS]
    N = scene.num_heliostats
    if N % n_shards != 0:
        raise ValueError(f"N={N} not divisible by helio shards={n_shards}")
    if sun_pos.shape[0] % nb != 0:
        raise ValueError(
            f"B={sun_pos.shape[0]} not divisible by batch shards={nb}"
        )

    def local_render(helio_pos, sun, act, errs):
        # Everything here sees the local [B, N/n, ...] chunk.
        actual = apply_orientation_errors(act, errs)
        incidents = sun[:, None, :] - helio_pos[None, :, :]
        refl = normalize(reflect(normalize(incidents), actual))
        origins = jnp.broadcast_to(helio_pos[None], (sun.shape[0], *helio_pos.shape))
        inter, valid = ray_plane_intersect(
            origins, refl, scene.target_pos, scene.target_normal
        )
        fx, fy = splat_factors(
            inter, origins, scene.target_pos, scene.plane_u, scene.plane_v,
            cfg.target_width, cfg.target_height, cfg.resolution,
            cfg.sigma_scale, valid,
        )
        partial = splat_image(fx, fy, precision=cfg.precision)
        # Sum of per-chunk images over the helio axis — one psum on ICI.
        return jax.lax.psum(partial, HELIO_AXIS)

    shard = jax.shard_map(
        local_render,
        mesh=mesh,
        in_specs=(
            P(HELIO_AXIS, None),              # heliostat positions [N, 3]
            P(BATCH_AXIS),                    # suns [B, 3]
            P(BATCH_AXIS, HELIO_AXIS, None),  # normals [B, N, 3]
            P(BATCH_AXIS, HELIO_AXIS, None),  # errors [B, N, 2]
        ),
        out_specs=P(BATCH_AXIS),
    )
    return shard(scene.heliostat_pos, sun_pos, normals, errors_mrad)
