"""Field renderer: the pure flux-image function plus a thin stateful wrapper.

The functional core is :func:`render` — ``(scene, cfg, sun, normals, errors)
→ (image, actual_normals, reflected)`` — a pure, fully traced function. All
batching is explicit array batching (no Python loops); the policy gradient
flows straight through it.

:class:`HelioField` wraps it with the reference's stateful conveniences
(``newenv_rl_test_multi_error.py:154-415``): cached pre-sampled error
tensors that stay fixed between ``reset_errors`` calls (the reproducibility
contract, ref ``:155-160``), the single-sun legacy path, and noisy initial
actions — but all RNG goes through an explicit ``jax.random.PRNGKey``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops.optics import ideal_normals as _ideal_normals
from ..ops.optics import normalize, ray_plane_intersect, reflect, rotate_mrad_eu
from ..ops.splat import splat_factors, splat_image
from .scene import FieldConfig, Scene

__all__ = ["render", "apply_orientation_errors", "HelioField"]


def apply_orientation_errors(normals: jax.Array, errors_mrad: jax.Array) -> jax.Array:
    """Rotate normals by mrad (East, Up) errors, clamp the up component, renormalize.

    The up-axis clamp is the reference's leaky-ReLU "don't point into the
    ground" guard (``newenv_rl_test_multi_error.py:367-372``): z ← leaky_relu(z)
    (slope 0.01) followed by renormalization.
    """
    actual = rotate_mrad_eu(normals, errors_mrad)
    z = jax.nn.leaky_relu(actual[..., 2], negative_slope=0.01)
    actual = jnp.concatenate([actual[..., :2], z[..., None]], axis=-1)
    return normalize(actual)


@functools.partial(jax.jit, static_argnames=("cfg",))
def render(
    scene: Scene,
    cfg: FieldConfig,
    sun_pos: jax.Array,       # [B, 3]
    normals: jax.Array,       # [B, N, 3] action normals (need not be unit)
    errors_mrad: jax.Array,   # [B, N, 2] or [N, 2] orientation errors
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Render flux images for a batch of suns.

    Pipeline (parity with reference ``render``,
    ``newenv_rl_test_multi_error.py:308-415``, re-expressed batched):
      1. apply orientation errors + up-axis clamp;
      2. reflect the unit heliostat→sun rays about the actual normals;
      3. intersect with the receiver plane (parallel rays masked, not NaN);
      4. separable Gaussian splat, contracted over heliostats on the MXU.

    Total-energy normalization is off by default: the reference computes it
    and then does not apply it (ref ``:409-410``). The older generations'
    unit-energy behavior (§2.9) is available via
    ``FieldConfig.normalize_energy``.

    Returns:
      ``(images [B, res, res], actual_normals [B, N, 3], reflected [B, N, 3])``.
    """
    B = sun_pos.shape[0]
    helio = scene.heliostat_pos                          # [N, 3]

    if errors_mrad.ndim == 2:
        errors_mrad = jnp.broadcast_to(
            errors_mrad[None], (B, *errors_mrad.shape)
        )

    if cfg.error_model == "additive":
        # Generation-1 error model (``newenv/newenv.py:122-123``): additive
        # 3-vector on the normal, renormalized, no up-axis clamp. The
        # reference always adds to *unit* ideal normals; normalizing the
        # action first keeps the perturbation magnitude independent of the
        # action's norm (actions here "need not be unit") — identical
        # values for unit inputs.
        actual = normalize(normalize(normals) + errors_mrad)  # [B, N, 3]
    else:
        actual = apply_orientation_errors(normals, errors_mrad)  # [B, N, 3]

    incidents = sun_pos[:, None, :] - helio[None, :, :]       # [B, N, 3]
    inc_unit = normalize(incidents)
    refl = reflect(inc_unit, actual)
    refl_unit = normalize(refl)

    origins = jnp.broadcast_to(helio[None], (B, *helio.shape))
    inter, valid = ray_plane_intersect(
        origins, refl_unit, scene.target_pos, scene.target_normal
    )

    backend = cfg.splat_backend
    if backend == "auto":
        backend = "pallas" if scene.heliostat_pos.shape[0] >= 400 else "xla"
    if cfg.normalize_kernels:
        backend = "xla"   # legacy gen-1 path; see FieldConfig
    if backend == "pallas":
        from ..ops.splat_pallas import splat_summed_pallas

        images = splat_summed_pallas(
            inter, origins, scene.target_pos, scene.plane_u, scene.plane_v,
            cfg.target_width, cfg.target_height, cfg.resolution,
            cfg.sigma_scale, valid, precision=cfg.precision,
        )
    else:
        fx, fy = splat_factors(
            inter,
            origins,
            scene.target_pos,
            scene.plane_u,
            scene.plane_v,
            cfg.target_width,
            cfg.target_height,
            cfg.resolution,
            cfg.sigma_scale,
            valid,
        )
        if cfg.normalize_kernels:
            # Unit-mass kernels (gen 1, ``newenv/newenv.py:78-79``): the
            # separable kernel's total is exactly (Σ_i fx_i)·(Σ_j fy_j).
            mass = (
                jnp.sum(fx, axis=-1) * jnp.sum(fy, axis=-1)
            )[..., None]                                     # [B, N, 1]
            fx = fx / jnp.clip(mass, 1e-30, None)
        images = splat_image(fx, fy, precision=cfg.precision)  # [B, res, res]
    if cfg.normalize_energy:
        # Older-generation unit-energy images (newenv/newenv_rl_test.py:
        # 183-184): per-image total clamped below at 1e-9.
        sums = jnp.clip(
            jnp.sum(images, axis=(-2, -1), keepdims=True), 1e-9, None
        )
        images = images / sums
    return images, actual, refl_unit


class HelioField:
    """Stateful convenience wrapper over the pure renderer.

    API parity with the reference ``HelioField``
    (``newenv_rl_test_multi_error.py:154-415``): pre-sampled error tensors
    reused deterministically across ``render`` calls until the next
    ``reset_errors``; a dedicated single-sun error tensor for the legacy
    B == 1 path (ref ``:339-353``); noisy ``init_actions``. The difference:
    randomness comes from an explicit PRNG key chain, so every sample is
    reproducible from the constructor seed alone.
    """

    def __init__(
        self,
        scene: Scene,
        cfg: FieldConfig,
        key: jax.Array,
    ) -> None:
        self.scene = scene
        self.cfg = cfg
        self._key = key
        self.initial_action = None
        self.reset_errors()

    # ------------------------------------------------------------------ RNG
    def _next_key(self) -> jax.Array:
        self._key, sub = jax.random.split(self._key)
        return sub

    # ------------------------------------------------------------- Errors
    @property
    def _error_dim(self) -> int:
        """2 mrad angles per heliostat, or 3 additive components (gen-1)."""
        return 3 if self.cfg.error_model == "additive" else 2

    def sample_error_angles(self, key: jax.Array, batch_size: int) -> jax.Array:
        """``[batch_size, N, {2|3}]`` errors ~ N(0, error_scale_mrad²)."""
        return (
            jax.random.normal(
                key,
                (batch_size, self.scene.num_heliostats, self._error_dim),
                dtype=jnp.float32,
            )
            * self.cfg.error_scale_mrad
        )

    def reset_errors(self) -> None:
        """Resample both cached error tensors (ref ``:220-239``)."""
        self.error_angles_mrad = (
            jax.random.normal(
                self._next_key(),
                (self.scene.num_heliostats, self._error_dim),
                dtype=jnp.float32,
            )
            * self.cfg.error_scale_mrad
        )
        if self.cfg.max_batch_size >= 1:
            self.batch_error_angles_mrad = self.sample_error_angles(
                self._next_key(), self.cfg.max_batch_size
            )
        else:
            self.batch_error_angles_mrad = None

    def errors_for_batch(self, batch_size: int) -> jax.Array:
        """Select the error tensor a render with B suns will use (ref ``:339-353``)."""
        if batch_size == 1:
            return self.error_angles_mrad[None]
        if (
            self.batch_error_angles_mrad is not None
            and batch_size <= self.batch_error_angles_mrad.shape[0]
        ):
            return self.batch_error_angles_mrad[:batch_size]
        return self.sample_error_angles(self._next_key(), batch_size)

    # -------------------------------------------------------------- Optics
    def calculate_ideal_normals(self, sun_pos) -> jax.Array:
        sun_pos = jnp.asarray(sun_pos, dtype=jnp.float32)
        return _ideal_normals(self.scene.heliostat_pos, self.scene.target_pos, sun_pos)

    def init_actions(self, sun_pos) -> jax.Array:
        """Noisy initial orientations, flattened (ref ``:291-304``)."""
        ideal = self.calculate_ideal_normals(sun_pos)
        noise = (
            jax.random.normal(self._next_key(), ideal.shape, dtype=ideal.dtype)
            * self.cfg.initial_action_noise
        )
        noisy = normalize(ideal + noise)
        if noisy.ndim == 2:
            self.initial_action = noisy.reshape(-1)
        else:
            self.initial_action = noisy.reshape(noisy.shape[0], -1)
        return self.initial_action

    # -------------------------------------------------------------- Render
    def render(self, sun_pos, action, monitor: bool = False):
        """Render with the cached error tensors.

        Accepts ``sun_pos`` of shape [3] (legacy single-sun) or [B, 3], and
        flattened or structured actions. Returns ``(img, actual)`` or
        ``(img, actual, reflected)`` when ``monitor`` — unbatched when the
        input sun was 1-D (ref ``:412-415``).
        """
        sun = jnp.asarray(sun_pos, dtype=jnp.float32)
        batched = sun.ndim > 1
        sun = jnp.atleast_2d(sun)
        B = sun.shape[0]
        N = self.scene.num_heliostats

        act = jnp.asarray(action, dtype=jnp.float32).reshape(B, N, 3)
        errs = self.errors_for_batch(B)

        images, actual, refl = render(self.scene, self.cfg, sun, act, errs)
        if not batched:
            images, actual, refl = images[0], actual[0], refl[0]
        if monitor:
            return images, actual, refl
        return images, actual
