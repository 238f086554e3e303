"""Scene description + field renderer."""

from .scene import Scene, FieldConfig, make_scene  # noqa: F401
from .field import render, apply_orientation_errors, HelioField  # noqa: F401
