"""HelioEnv — the flux-control environment as pure reset/step functions.

The reference ``HelioEnv`` (``test_environment.py:175-526``) is a stateful
gym.Env holding two ``HelioField`` objects, cached sun positions, distance
maps and implicit torch RNG. Here the environment is decomposed JAX-style:

  * :class:`EnvConfig`   — static knobs (hashable; a jit static argument);
  * :class:`EnvState`    — arrays: sun positions, pre-sampled orientation
                           errors, cached target image / distance maps /
                           ideal normals (a pytree that can be sharded over
                           a device mesh along the batch axis);
  * :func:`init_state` / :func:`set_sun_pos` / :func:`reset` / :func:`step`
                           — pure functions ``(scene, cfg, state, …) → …``.

Everything inside :func:`step` is jit-able and differentiable w.r.t. the
action. The stateful :class:`HelioEnv` class at the bottom provides the
reference-shaped convenience API on top (including gymnasium spaces when
gymnasium is available).

Deliberate deviations from the reference, all value-preserving:
  * the step-loss target image (ideal normals, zero errors — deterministic)
    is rendered once per sun change and cached in :class:`EnvState`, not
    re-rendered every step (ref re-renders at ``test_environment.py:429-435``;
    the output is bitwise identical each time);
  * distance maps are computed on-device with ``ops.edt`` instead of a host
    scipy round-trip (same values, see ``ops/edt.py``);
  * the reference's latent bugs are not reproduced: ``_sample_sun_pos``
    (called but never defined, ``test_environment.py:379``) is implemented
    properly here, and NaN checks are optional host-side validation instead
    of hard asserts inside the hot path.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from ..core.field import render
from ..core.scene import FieldConfig, Scene
from ..ops.edt import distance_maps as make_distance_maps
from ..ops.optics import ideal_normals as _ideal_normals
from ..ops.optics import normalize
from ..ops.optics import ray_plane_intersect
from .losses import angles_mrad, boundary, flux_metrics, spillage
from .sun import sample_sun_positions

__all__ = ["EnvConfig", "EnvState", "init_state", "set_sun_pos", "reset", "step", "HelioEnv"]


@dataclasses.dataclass(frozen=True)
class EnvConfig:
    """Static environment configuration (ref ctor, ``test_environment.py:177-330``)."""

    resolution: int = 128
    batch_size: int = 25
    sigma_scale: float = 0.1
    error_scale_mrad: float = 180.0
    target_width: float = 15.0
    target_height: float = 15.0
    new_sun_pos_every_reset: bool = False
    new_errors_every_reset: bool = True
    use_error_mask: bool = False
    error_mask_ratio: float = 0.2
    exponential_risk: bool = False
    single_sun: bool = False
    azimuth: float | None = 45.0
    elevation: float | None = 45.0
    half_angle_deg: float = 2.0
    # The reference env accepts initial_action_noise but never forwards it to
    # its fields, which keep their 0.01 default (test_environment.py:255-277
    # vs newenv_rl_test_multi_error.py:170). We reproduce the *effective*
    # behavior and make it explicit:
    field_init_noise: float = 0.01
    precision: str = "highest"
    splat_backend: str = "xla"   # "xla" | "pallas" | "auto" (see FieldConfig)
    # Action parameterization: "normals" (direct [B, N*3] mirror normals,
    # the current-generation env) or "angles" ([B, N*2] East/Up rotations
    # applied to north-pointing dummy normals — the angular variant,
    # ``newenv/test_environment_angular.py:204-213``; the values feed
    # ``rotate_mrad_eu`` directly, i.e. they are in mrad like the error
    # tensors, reproducing the reference's unit convention).
    #
    # Documented deviation from the older angular generation: only the
    # action parameterization changes — metric semantics stay those of the
    # current-generation env (step aux carries the action-derived normals
    # and mse normalizes both images by the *target* max), whereas the old
    # angular env fed ideal normals in aux and normalized pred flux by its
    # own max (``newenv/test_environment_angular.py:219-230``). One env,
    # one metric contract, two action spaces.
    action_space: str = "normals"
    # Name of the shard_map-manual mesh axis the batch dimension lives on,
    # or None when the batch is unsharded / GSPMD-sharded. Set by
    # parallel.train's shard_map implementation so the worst-k% quantile
    # (the one cross-batch nonlinearity) gathers globally; see
    # losses.flux_metrics.
    batch_axis: str | None = None

    def field_config(self, error_scale_mrad: float) -> FieldConfig:
        return FieldConfig(
            resolution=self.resolution,
            sigma_scale=self.sigma_scale,
            error_scale_mrad=error_scale_mrad,
            initial_action_noise=self.field_init_noise,
            target_width=self.target_width,
            target_height=self.target_height,
            max_batch_size=self.batch_size,
            precision=self.precision,
            splat_backend=self.splat_backend,
        )


@struct.dataclass
class EnvState:
    """Per-environment array state. Leading dim of every field is the env
    batch B — the axis to shard over a device mesh."""

    sun_pos: jax.Array         # [B, 3]
    errors: jax.Array          # [B, N, 2] noisy-field orientation errors
    ideal_normals: jax.Array   # [B, N, 3]
    target_img: jax.Array      # [B, res, res] ideal-normal reference render
    distance_maps: jax.Array   # [B, res, res]
    ref_min: jax.Array         # [] display-normalization range
    ref_max: jax.Array         # []


def _sample_errors(key: jax.Array, cfg: EnvConfig, num_heliostats: int) -> jax.Array:
    return (
        jax.random.normal(
            key, (cfg.batch_size, num_heliostats, 2), dtype=jnp.float32
        )
        * cfg.error_scale_mrad
    )


def set_sun_pos(
    scene: Scene, cfg: EnvConfig, state: EnvState | None, sun_pos: jax.Array,
    key: jax.Array,
) -> EnvState:
    """Recompute every sun-derived cache for new sun positions.

    Mirrors the reference's ``set_sun_pos`` (``test_environment.py:359-370``):
    the distance maps and display range come from a *noisy-init-action*
    zero-error render (field_init_noise noise on the ideal normals), while
    the step-loss target is the clean ideal-normal render.
    """
    sun_pos = jnp.asarray(sun_pos, dtype=jnp.float32)
    ideal = _ideal_normals(scene.heliostat_pos, scene.target_pos, sun_pos)
    zero_err = jnp.zeros((sun_pos.shape[0], scene.num_heliostats, 2), jnp.float32)
    ref_cfg = cfg.field_config(0.0)

    noise = (
        jax.random.normal(key, ideal.shape, dtype=jnp.float32)
        * cfg.field_init_noise
    )
    init_action = normalize(ideal + noise)
    timg, _, _ = render(scene, ref_cfg, sun_pos, init_action, zero_err)
    dmaps = make_distance_maps(timg)

    target_img, _, _ = render(scene, ref_cfg, sun_pos, ideal, zero_err)

    errors = (
        state.errors
        if state is not None
        else jnp.zeros((cfg.batch_size, scene.num_heliostats, 2), jnp.float32)
    )
    return EnvState(
        sun_pos=sun_pos,
        errors=errors,
        ideal_normals=ideal,
        target_img=target_img,
        distance_maps=dmaps,
        ref_min=jnp.min(timg),
        ref_max=jnp.max(timg),
    )


def init_state(scene: Scene, cfg: EnvConfig, key: jax.Array) -> EnvState:
    """Build the initial environment state (ref ctor sun setup + error
    sampling, ``test_environment.py:284-327``)."""
    k_sun, k_err, k_set = jax.random.split(key, 3)
    sun_pos = sample_sun_positions(
        k_sun,
        cfg.batch_size,
        cfg.azimuth,
        cfg.elevation,
        single_sun=cfg.single_sun,
        half_angle_deg=cfg.half_angle_deg,
    )
    state = set_sun_pos(scene, cfg, None, sun_pos, k_set)
    return state.replace(errors=_sample_errors(k_err, cfg, scene.num_heliostats))


def reset(
    scene: Scene, cfg: EnvConfig, state: EnvState, key: jax.Array
) -> tuple[EnvState, dict[str, jax.Array]]:
    """Reset: optionally resample suns and/or errors, render the initial
    noisy image (ref ``test_environment.py:372-400``).

    Returns ``(state, obs)`` with obs = {'img': [B,res,res],
    'aux': [B, 3 + N*3] = [sun_pos | ideal_normals]}.
    """
    k_sun, k_set, k_err, k_act = jax.random.split(key, 4)

    if cfg.new_sun_pos_every_reset:
        sun_pos = sample_sun_positions(
            k_sun,
            cfg.batch_size,
            cfg.azimuth,
            cfg.elevation,
            single_sun=cfg.single_sun,
            half_angle_deg=cfg.half_angle_deg,
        )
        state = set_sun_pos(scene, cfg, state, sun_pos, k_set)

    if cfg.new_errors_every_reset:
        state = state.replace(
            errors=_sample_errors(k_err, cfg, scene.num_heliostats)
        )

    # Initial noisy-field action: ideal normals + field_init_noise noise
    # (noisy_field.init_actions, ref :391-394).
    noise = (
        jax.random.normal(k_act, state.ideal_normals.shape, dtype=jnp.float32)
        * cfg.field_init_noise
    )
    init_action = normalize(state.ideal_normals + noise)
    img, _, _ = render(
        scene,
        cfg.field_config(cfg.error_scale_mrad),
        state.sun_pos,
        init_action,
        state.errors,
    )

    aux = jnp.concatenate(
        [state.sun_pos, state.ideal_normals.reshape(cfg.batch_size, -1)], axis=1
    )
    return state, {"img": img, "aux": aux}


def step(
    scene: Scene, cfg: EnvConfig, state: EnvState, action: jax.Array
) -> tuple[dict[str, jax.Array], dict[str, jax.Array], dict[str, jax.Array]]:
    """Apply an action, render, and compute all metrics.

    Pure and differentiable w.r.t. ``action``. Parity with the reference
    ``step`` (``test_environment.py:402-516``): same losses (mse/dist/bound/
    alignment, optional worst-k% mask and exponential risk), same obs/aux
    layout, same monitor payload.

    Args:
      action: ``[B, N*3]`` (or ``[B, N, 3]``) mirror-normal action.
    Returns:
      ``(obs, metrics, monitor)``.
    """
    B = cfg.batch_size
    N = scene.num_heliostats
    action = jnp.asarray(action, jnp.float32)
    if cfg.action_space == "angles":
        from ..ops.optics import rotate_mrad_eu

        north = jnp.zeros((B, N, 3), jnp.float32).at[..., 1].set(1.0)
        normals = rotate_mrad_eu(north, action.reshape(B, N, 2))
    else:
        normals = action.reshape(B, N, 3)

    img, actual, refl = render(
        scene,
        cfg.field_config(cfg.error_scale_mrad),
        state.sun_pos,
        normals,
        state.errors,
    )

    aux = jnp.concatenate(
        [jax.lax.stop_gradient(state.sun_pos), normals.reshape(B, -1)], axis=1
    )

    core = flux_metrics(
        img,
        jax.lax.stop_gradient(state.target_img),
        state.distance_maps,
        state.ideal_normals,
        actual,
        use_error_mask=cfg.use_error_mask,
        error_mask_ratio=cfg.error_mask_ratio,
        batch_axis=cfg.batch_axis,
    )

    east = jnp.array([1.0, 0.0, 0.0], jnp.float32)
    up = jnp.array([0.0, 0.0, 1.0], jnp.float32)
    area = (cfg.target_width, cfg.target_height)
    all_bounds = boundary(
        normals, scene.heliostat_pos, scene.target_pos, scene.target_normal,
        area, east, up, return_all=True,
    )
    if cfg.exponential_risk:
        bound = jnp.mean(jnp.exp(all_bounds + 1e-6))
    else:
        bound = jnp.mean(all_bounds)

    metrics = {
        "mse": core["mse"],
        "dist": core["dist"],
        "bound": bound,
        "alignment_loss": core["alignment_loss"],
    }
    # Spillage accounting from the true reflected-ray intersections (the
    # older generations' show_spillage capability, SURVEY §2.9).
    origins = jnp.broadcast_to(
        scene.heliostat_pos[None], (B, N, 3)
    )
    inter, _ = ray_plane_intersect(
        origins, refl, scene.target_pos, scene.target_normal
    )
    spill_mask, spill_count = spillage(
        inter, scene.target_pos, scene.plane_u, scene.plane_v,
        cfg.target_width, cfg.target_height,
    )

    obs = {"img": img, "aux": aux}
    monitor = {
        "normals": normals,
        "reflected_rays": refl.reshape(-1, 3),
        "ideal_normals": state.ideal_normals.reshape(-1, 3),
        "all_bounds": all_bounds,
        "mae_image": core["mae_image"],
        "alignment_errors": jax.lax.stop_gradient(core["alignment_errors"]),
        "spillage_mask": spill_mask,
        "spillage_count": spill_count,
    }
    return obs, metrics, monitor


# --------------------------------------------------------------------------
# Stateful convenience wrapper (reference-shaped API)
# --------------------------------------------------------------------------

try:  # pragma: no cover - import gate
    import gymnasium as _gym
    from gymnasium import spaces as _spaces
except Exception:  # pragma: no cover
    _gym = None
    _spaces = None


class HelioEnv:
    """Stateful wrapper with the reference ``HelioEnv`` surface.

    Holds ``(scene, cfg, state, key)`` and delegates to the pure functions;
    ``step`` is jitted end-to-end on first use. Gymnasium ``action_space``/
    ``observation_space`` are attached when gymnasium is importable.
    """

    def __init__(self, scene: Scene, cfg: EnvConfig, key: jax.Array,
                 validate: bool = False) -> None:
        self.scene = scene
        self.cfg = cfg
        self.validate = validate
        self._key = key
        self.state = init_state(scene, cfg, self._next_key())
        self._step = jax.jit(step, static_argnames=("cfg",))
        self._reset = jax.jit(reset, static_argnames=("cfg",))

        if _spaces is not None:
            import numpy as np

            n = scene.num_heliostats
            act_dim = n * 2 if cfg.action_space == "angles" else n * 3
            self.action_space = _spaces.Box(-1.0, 1.0, (act_dim,), np.float32)
            self.observation_space = _spaces.Dict(
                {
                    "img": _spaces.Box(
                        0.0, np.inf,
                        (cfg.batch_size, cfg.resolution, cfg.resolution),
                        np.float32,
                    ),
                    "aux": _spaces.Box(
                        -np.inf, np.inf,
                        (cfg.batch_size, 3 + n * 3), np.float32,
                    ),
                }
            )

    # ------------------------------------------------------------------
    def _next_key(self) -> jax.Array:
        self._key, sub = jax.random.split(self._key)
        return sub

    def seed(self, seed: int) -> None:
        self._key = jax.random.PRNGKey(seed)

    @property
    def sun_pos(self) -> jax.Array:
        return self.state.sun_pos

    @property
    def ideal_normals(self) -> jax.Array:
        return self.state.ideal_normals

    @property
    def distance_maps(self) -> jax.Array:
        return self.state.distance_maps

    @property
    def ref_min(self) -> jax.Array:
        return self.state.ref_min

    @property
    def ref_max(self) -> jax.Array:
        return self.state.ref_max

    @property
    def resolution(self) -> int:
        return self.cfg.resolution

    @property
    def batch_size(self) -> int:
        return self.cfg.batch_size

    @property
    def num_heliostats(self) -> int:
        return self.scene.num_heliostats

    # ------------------------------------------------------------------
    def set_sun_pos(self, sun_positions) -> None:
        self.state = set_sun_pos(
            self.scene, self.cfg, self.state, sun_positions, self._next_key()
        )

    def reset(self) -> dict[str, jax.Array]:
        self.state, obs = self._reset(
            self.scene, self.cfg, self.state, self._next_key()
        )
        return obs

    def step(self, action) -> tuple[dict, dict, dict]:
        obs, metrics, monitor = self._step(
            self.scene, self.cfg, self.state, jnp.asarray(action)
        )
        if self.validate:
            import numpy as np

            for name in ("mse", "dist", "bound"):
                val = np.asarray(metrics[name])
                if not np.isfinite(val).all():
                    raise FloatingPointError(
                        f"{name} is not finite: {val!r}"
                    )
        return obs, metrics, monitor
