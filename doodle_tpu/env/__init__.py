"""Gym-style heliostat flux environment: losses, sun sampling, reset/step."""

from .sun import (  # noqa: F401
    SUN_RADIUS,
    azel_to_direction,
    sample_cone_directions,
    sample_sun_positions,
)
from .losses import (  # noqa: F401
    angles_mrad,
    alignment_loss_cheap,
    boundary,
    chamfer_loss,
    flux_metrics,
    spillage,
)
from .env import EnvConfig, EnvState, HelioEnv, init_state, reset, set_sun_pos, step  # noqa: F401
