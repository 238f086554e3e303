"""Low-level optics + image kernels (pure jax.numpy / Pallas)."""

from .optics import (  # noqa: F401
    normalize,
    reflect,
    ray_plane_intersect,
    rotate_mrad_eu,
    cone_project,
    ideal_normals,
)
from .splat import splat_factors, splat_image, splat_images_summed  # noqa: F401
from .edt import edt, distance_maps  # noqa: F401
