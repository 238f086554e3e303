"""Legacy-generation goldens: the evolution-strata flags vs the ACTUAL old
reference code (SURVEY §2.9), not just the builder's reading of it.

* gen 1 (``newenv/newenv.py``): ``error_model="additive"`` +
  ``normalize_kernels`` + ``normalize_energy`` must reproduce the
  per-heliostat-loop renderer bit-for-tolerance (additive 3-vector errors,
  unit-mass kernels, unit-total image, no up-clamp).
* gen 4 (``newenv/newenv_rl_test_vec.py``): rotation-mrad errors +
  ``normalize_energy`` (kernels unnormalized) under the old reflect sign
  convention — images agree because ray-plane intersection is sign/scale
  invariant in the ray direction.

Goldens: ``scripts/capture_legacy_goldens.py``.
"""

import pathlib

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from doodle_tpu.core.field import render
from doodle_tpu.core.scene import FieldConfig, make_scene
from doodle_tpu.ops.optics import ideal_normals

GOLD = pathlib.Path(__file__).parent / "goldens" / "legacy_fields.npz"

pytestmark = pytest.mark.skipif(
    not GOLD.exists(), reason="run scripts/capture_legacy_goldens.py first"
)


@pytest.fixture(scope="module")
def g():
    return dict(np.load(GOLD))


@pytest.fixture(scope="module")
def scene(g):
    return make_scene(g["helio"], g["targ_pos"], g["targ_norm"])


def test_gen1_additive_unit_kernel_render(g, scene):
    ideal = ideal_normals(
        scene.heliostat_pos, scene.target_pos, jnp.asarray(g["sun"])[None]
    )
    np.testing.assert_allclose(
        np.asarray(ideal[0]), g["gen1_ideal"], rtol=1e-5, atol=1e-6
    )
    cfg = FieldConfig(
        resolution=int(g["resolution"]),
        sigma_scale=float(g["sigma_scale"]),
        error_model="additive",
        normalize_kernels=True,
        normalize_energy=True,
        max_batch_size=1,
        precision="highest",
    )
    img, _, _ = render(
        scene, cfg, jnp.asarray(g["sun"])[None], ideal,
        jnp.asarray(g["gen1_err_vec"])[None],
    )
    np.testing.assert_allclose(
        np.asarray(img[0]), g["gen1_img"], rtol=2e-4, atol=1e-7
    )


def test_gen4_rotation_energy_normalized_render(g, scene):
    cfg = FieldConfig(
        resolution=int(g["resolution"]),
        sigma_scale=float(g["sigma_scale"]),
        error_model="rotation_mrad",
        normalize_energy=True,
        max_batch_size=1,
        precision="highest",
    )
    # Gen 4's ideal normals are NEGATED relative to the current generation
    # (``newenv_rl_test_vec.py:166`` vs SURVEY §2.2) — its renderer is
    # n→−n invariant (reflection and the mrad rotation both are), but the
    # current generation's up-axis clamp is not, so the golden action is
    # fed in the current sign convention.
    img, _, _ = render(
        scene, cfg, jnp.asarray(g["sun"])[None],
        -jnp.asarray(g["gen4_action"])[None],
        jnp.asarray(g["gen4_err_mrad"])[None],
    )
    np.testing.assert_allclose(
        np.asarray(img[0]), g["gen4_img"], rtol=2e-4, atol=1e-7
    )


def test_normalize_kernels_unit_mass_property(scene):
    """Every ray's kernel contributes exactly unit mass before the image
    normalization (gen-1 contract) — checked without the energy norm."""
    cfg = FieldConfig(
        resolution=48, sigma_scale=0.05, error_model="additive",
        normalize_kernels=True, normalize_energy=False, max_batch_size=1,
    )
    sun = jnp.asarray([3000.0, 9000.0, 10000.0])[None]
    ideal = ideal_normals(scene.heliostat_pos, scene.target_pos, sun)
    img, _, _ = render(
        scene, cfg, sun, ideal,
        jnp.zeros((1, scene.num_heliostats, 3)),
    )
    np.testing.assert_allclose(
        float(img.sum()), scene.num_heliostats, rtol=1e-4
    )
