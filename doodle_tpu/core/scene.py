"""Scene description: geometry pytree + static render configuration.

The reference folds geometry, RNG state and render knobs into a stateful
``HelioField`` object (``newenv_rl_test_multi_error.py:154-216``). Here the
same information splits cleanly along JAX lines:

  * :class:`Scene`        — arrays (heliostat/target geometry, plane basis):
                            a pytree that flows through jit/vmap/shard_map;
  * :class:`FieldConfig`  — hashable static config (resolution, sigma scale,
                            error scale, …): a ``jit`` static argument, so
                            each distinct config compiles exactly once.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

__all__ = ["Scene", "FieldConfig", "make_scene"]


@struct.dataclass
class Scene:
    """Field geometry as a pytree of arrays.

    Attributes:
      heliostat_pos: ``[N, 3]`` heliostat positions (ENU frame, z up).
      target_pos:    ``[3]`` receiver-plane center.
      target_normal: ``[3]`` unit receiver-plane normal.
      plane_u:       ``[3]`` receiver-grid "east" axis (unit, ⟂ plane_v).
      plane_v:       ``[3]`` receiver-grid "up" axis (unit).
    """

    heliostat_pos: jax.Array
    target_pos: jax.Array
    target_normal: jax.Array
    plane_u: jax.Array
    plane_v: jax.Array

    @property
    def num_heliostats(self) -> int:
        return self.heliostat_pos.shape[0]


@dataclasses.dataclass(frozen=True)
class FieldConfig:
    """Static (hashable) render configuration.

    Mirrors the reference ``HelioField.__init__`` knobs
    (``newenv_rl_test_multi_error.py:162-198``). ``target_width/height`` are
    static because they define the receiver-grid linspace shape inside the
    splat kernel.
    """

    resolution: int = 100
    sigma_scale: float = 0.01
    error_scale_mrad: float = 1.0
    initial_action_noise: float = 0.01
    target_width: float = 15.0
    target_height: float = 15.0
    max_batch_size: int = 25
    # MXU precision for the splat contraction: "highest" = full-f32 MXU
    # passes (reference-grade parity), "default" = fast reduced-precision
    # (training-run perf knob).
    precision: str = "highest"
    # Splat backend: "xla" (separable einsum; reference-grade parity and
    # full autodiff fusion), "pallas" (fused VMEM kernel — the factor
    # tables never hit HBM, forward or backward — the backward is a fused
    # kernel too, so no [B, N, res] cotangent tables either), or
    # "auto" (pallas for N >= 400 heliostats, xla below). Crossover swept
    # on v5e 2026-08-17 (env-step ms, xla vs pallas): N=500 pallas wins
    # at both resolutions (0.37 vs 0.26 at 256²/B=128; 0.069 vs 0.047 at
    # 128²/B=25); N<=256 xla wins at both (0.015 vs 0.066 at 256²,
    # 0.004 vs 0.054 at 128²) — small factor tables make XLA's HBM
    # roundtrip cheap while the kernel pays its fixed 512-deep chunk
    # padding and per-grid-step overhead.
    splat_backend: str = "xla"
    # Older-generation behavior (§2.9): normalize each flux image to unit
    # total energy (``newenv/newenv_rl_test.py:183-184`` per-image with a
    # 1e-9 clamp; ``newenv/newenv.py:148`` unclamped). The current reference
    # generation computes the total and then does NOT apply it
    # (``newenv_rl_test_multi_error.py:409-410``) — False reproduces that.
    normalize_energy: bool = False
    # Generation-1 behavior (``newenv/newenv.py:78-79``): each ray's splat
    # kernel normalized to unit mass before summation (later generations
    # comment this out, ``newenv/newenv_rl_test_vec.py:100-101``). Exact in
    # the separable form — a kernel's mass is (Σfx)·(Σfy) — and a legacy
    # flag, so it routes to the XLA backend.
    normalize_kernels: bool = False
    # Error model (§2.9 evolution strata):
    #   "rotation_mrad" — current generation: (East, Up) rotations in mrad
    #     ([..., N, 2] error tensors) followed by the leaky-ReLU up-clamp
    #     (``newenv_rl_test_multi_error.py:356-372``);
    #   "additive" — generation 1: a 3-vector added to the ideal normal and
    #     renormalized, no up-clamp (``newenv/newenv.py:94,122-123``);
    #     error tensors are [..., N, 3] and error_scale_mrad is the raw
    #     stddev of the additive vector (the old ``error_scale``).
    error_model: str = "rotation_mrad"


def make_scene(
    heliostat_pos,
    target_pos,
    target_normal,
    dtype=jnp.float32,
) -> Scene:
    """Build a :class:`Scene`, normalizing the target normal and deriving the
    receiver-plane basis.

    Basis rule (matches ``newenv_rl_test_multi_error.py:206-213``):
    ``plane_u = [1, 0, 0]``; ``plane_v = [0, 0, 1]`` when the target normal
    is (numerically) ``[0, 1, 0]``, else ``normalize(target_normal × plane_u)``.
    In both cases {u, v} is orthonormal (v ∝ n × u ⟂ u), which is what makes
    the separable splat factorization in ``ops/splat.py`` exact.
    """
    heliostat_pos = jnp.asarray(heliostat_pos, dtype=dtype)
    target_pos = jnp.asarray(target_pos, dtype=dtype)
    n = np.asarray(target_normal, dtype=np.float64)
    n = n / max(np.linalg.norm(n), 1e-9)

    u = np.array([1.0, 0.0, 0.0])
    if np.allclose(n, [0.0, 1.0, 0.0]):
        v = np.array([0.0, 0.0, 1.0])
    else:
        v = np.cross(n, u)
        v = v / max(np.linalg.norm(v), 1e-9)

    return Scene(
        heliostat_pos=heliostat_pos,
        target_pos=target_pos,
        target_normal=jnp.asarray(n, dtype=dtype),
        plane_u=jnp.asarray(u, dtype=dtype),
        plane_v=jnp.asarray(v, dtype=dtype),
    )
