"""Parity tests: field renderer vs. reference goldens + splat properties."""

import jax
import jax.numpy as jnp
import numpy as np

from doodle_tpu.core import FieldConfig, HelioField, make_scene, render
from doodle_tpu.ops import splat_images_summed


def _scene_cfg(g, targ_norm_key="targ_norm"):
    scene = make_scene(g["helio"], g["targ_pos"], g[targ_norm_key])
    cfg = FieldConfig(
        resolution=int(g["resolution"]),
        sigma_scale=float(g["sigma_scale"]),
        error_scale_mrad=180.0,
        target_width=float(g["targ_area"][0]),
        target_height=float(g["targ_area"][1]),
        max_batch_size=int(g["sun"].shape[0]),
    )
    return scene, cfg


def test_render_matches_reference_batched(goldens):
    g = goldens["field_render"]
    scene, cfg = _scene_cfg(g)
    img, actual, refl = render(
        scene, cfg, jnp.asarray(g["sun"]), jnp.asarray(g["action"]),
        jnp.asarray(g["errors_b"]),
    )
    np.testing.assert_allclose(np.asarray(actual), g["actual"], atol=2e-6)
    B, N = g["action"].shape[:2]
    np.testing.assert_allclose(
        np.asarray(refl).reshape(B * N, 3), g["refl"], atol=2e-6
    )
    np.testing.assert_allclose(np.asarray(img), g["img"], atol=2e-4, rtol=1e-4)


def test_render_matches_reference_single_sun(goldens):
    g = goldens["field_render"]
    scene, cfg = _scene_cfg(g)
    img, actual, _ = render(
        scene, cfg, jnp.asarray(g["sun"][:1]),
        jnp.asarray(g["action"][:1]),
        jnp.asarray(g["errors_1"])[None],
    )
    # the reference returns single-sun actual normals still batched
    # (newenv_rl_test_multi_error.py:413) — compare content, not rank
    np.testing.assert_allclose(
        np.asarray(actual[0]), g["actual1"].reshape(-1, 3), atol=2e-6
    )
    np.testing.assert_allclose(np.asarray(img[0]), g["img1"], atol=2e-4, rtol=1e-4)


def test_render_matches_reference_tilted_target(goldens):
    """General plane-basis branch (target normal not [0,1,0])."""
    g = goldens["field_render"]
    scene, cfg = _scene_cfg(g, targ_norm_key="targ_norm2")
    img, actual, _ = render(
        scene, cfg, jnp.asarray(g["sun"]), jnp.asarray(g["action"]),
        jnp.asarray(g["errors_b"]),
    )
    np.testing.assert_allclose(np.asarray(actual), g["actual2"], atol=2e-6)
    np.testing.assert_allclose(np.asarray(img), g["img2"], atol=2e-4, rtol=1e-4)


def test_helio_field_wrapper_matches_pure_render(goldens):
    g = goldens["field_render"]
    scene, cfg = _scene_cfg(g)
    field = HelioField(scene, cfg, jax.random.PRNGKey(0))
    field.batch_error_angles_mrad = jnp.asarray(g["errors_b"])
    B = g["sun"].shape[0]
    img, actual, refl = field.render(
        g["sun"], g["action"].reshape(B, -1), monitor=True
    )
    np.testing.assert_allclose(np.asarray(img), g["img"], atol=2e-4, rtol=1e-4)
    # single-sun legacy path uses the dedicated [N, 2] error tensor
    field.error_angles_mrad = jnp.asarray(g["errors_1"])
    img1, actual1 = field.render(g["sun"][0], g["action"][0].reshape(-1))
    assert img1.ndim == 2
    np.testing.assert_allclose(np.asarray(img1), g["img1"], atol=2e-4, rtol=1e-4)


def test_error_reuse_contract():
    """Pre-sampled errors must be bitwise identical across renders until
    reset_errors, then change (reference contract,
    newenv_rl_test_multi_error.py:155-160,220-239)."""
    key = jax.random.PRNGKey(5)
    scene = make_scene(
        np.array([[80.0, 85.0, 0.0], [90.0, 82.0, 0.0]]),
        np.array([0.0, -5.0, 0.0]),
        np.array([0.0, 1.0, 0.0]),
    )
    cfg = FieldConfig(resolution=16, error_scale_mrad=100.0, max_batch_size=3)
    field = HelioField(scene, cfg, key)
    e1 = np.asarray(field.errors_for_batch(3))
    e2 = np.asarray(field.errors_for_batch(3))
    np.testing.assert_array_equal(e1, e2)
    field.reset_errors()
    e3 = np.asarray(field.errors_for_batch(3))
    assert np.abs(e1 - e3).max() > 1e-3
    # B > max_batch_size falls back to fresh sampling: deterministic only
    # within a call
    e4 = np.asarray(field.errors_for_batch(5))
    e5 = np.asarray(field.errors_for_batch(5))
    assert e4.shape == (5, 2, 2)
    assert np.abs(e4 - e5).max() > 1e-3


def test_duplicated_sun_errors_independent():
    """Duplicated suns in a batch must produce different images — per-batch-
    element error independence (reference sanity_check_multi_error.py idiom)."""
    key = jax.random.PRNGKey(11)
    rng = np.random.default_rng(0)
    helio = (rng.random((5, 3)) * 10 + 80).astype(np.float32)
    helio[:, 2] = 0
    scene = make_scene(helio, [0.0, -5.0, 0.0], [0.0, 1.0, 0.0])
    cfg = FieldConfig(
        resolution=32, sigma_scale=0.1, error_scale_mrad=150.0, max_batch_size=4
    )
    field = HelioField(scene, cfg, key)
    sun = np.tile(np.array([[7071.0, 7071.0, 7071.0]], np.float32), (4, 1))
    ideal = field.calculate_ideal_normals(sun)
    img, _ = field.render(sun, np.asarray(ideal).reshape(4, -1))
    img = np.asarray(img)
    max_pairwise = max(
        np.abs(img[i] - img[j]).max() for i in range(4) for j in range(i + 1, 4)
    )
    assert max_pairwise > 1e-6


def test_splat_invalid_ray_contributes_ones():
    """Reference quirk parity: a masked (plane-parallel) ray contributes a
    constant-1 image (newenv_rl_test_multi_error.py:140-148)."""
    inter = jnp.zeros((1, 1, 3))
    origins = jnp.array([[[80.0, 80.0, 0.0]]])
    img = splat_images_summed(
        inter, origins,
        jnp.array([0.0, -5.0, 0.0]), jnp.array([1.0, 0.0, 0.0]),
        jnp.array([0.0, 0.0, 1.0]),
        15.0, 15.0, 8, 0.1,
        jnp.zeros((1, 1, 1)),
    )
    np.testing.assert_allclose(np.asarray(img), 1.0, atol=0)


def test_zero_action_gradient_finite(goldens):
    """Regression: grad through an all-zero action must be finite.

    jnp.linalg.norm has a NaN gradient at 0 that survives the maximum()
    clamp (0 * NaN = NaN); ops.optics.safe_norm works around it, matching
    torch's zero-subgradient convention for norm at the origin."""
    g = goldens["field_render"]
    scene, cfg = _scene_cfg(g)

    def loss(action):
        img, _, _ = render(
            scene, cfg, jnp.asarray(g["sun"]), action, jnp.asarray(g["errors_b"])
        )
        return jnp.mean(img**2)

    grad = jax.grad(loss)(jnp.zeros_like(jnp.asarray(g["action"])))
    assert np.isfinite(np.asarray(grad)).all()


def test_render_differentiable_and_jittable(goldens):
    g = goldens["field_render"]
    scene, cfg = _scene_cfg(g)

    def loss(action):
        img, _, _ = render(
            scene, cfg, jnp.asarray(g["sun"]), action, jnp.asarray(g["errors_b"])
        )
        return jnp.mean(img**2)

    grad = jax.jit(jax.grad(loss))(jnp.asarray(g["action"]))
    arr = np.asarray(grad)
    assert np.isfinite(arr).all()
    assert np.abs(arr).max() > 0


def test_render_normalize_energy():
    """FieldConfig.normalize_energy reproduces the older generations'
    unit-total-energy images (newenv/newenv_rl_test.py:183-184); off by
    default (the current generation computes then discards the total,
    newenv_rl_test_multi_error.py:409-410)."""
    from doodle_tpu.ops.optics import ideal_normals

    scene = make_scene(
        np.array([[80.0, 85.0, 0.0], [90.0, 82.0, 0.0]]),
        np.array([0.0, -5.0, 0.0]),
        np.array([0.0, 1.0, 0.0]),
    )
    sun = jnp.array([[0.0, 0.0, 1000.0], [100.0, 0.0, 900.0]])
    normals = ideal_normals(scene.heliostat_pos, scene.target_pos, sun)
    errors = jnp.zeros((2, scene.num_heliostats, 2))

    cfg_raw = FieldConfig(resolution=32)
    cfg_norm = FieldConfig(resolution=32, normalize_energy=True)
    img_raw, _, _ = render(scene, cfg_raw, sun, normals, errors)
    img_norm, _, _ = render(scene, cfg_norm, sun, normals, errors)

    sums_raw = np.asarray(img_raw).sum(axis=(-2, -1))
    assert (np.abs(sums_raw - 1.0) > 1e-3).any()          # default: raw flux
    np.testing.assert_allclose(
        np.asarray(img_norm).sum(axis=(-2, -1)), 1.0, atol=1e-5
    )
    # normalization is per image, not global
    np.testing.assert_allclose(
        np.asarray(img_norm),
        np.asarray(img_raw) / sums_raw[:, None, None],
        rtol=1e-5,
    )


def test_additive_error_model_gen1():
    """Generation-1 error model (newenv/newenv.py:122-123): normal + 3-vector,
    renormalized, no up-axis clamp."""
    import dataclasses

    from doodle_tpu.core.field import HelioField, render
    from doodle_tpu.core.scene import FieldConfig, make_scene
    from doodle_tpu.ops.optics import ideal_normals, normalize

    key = jax.random.PRNGKey(5)
    k1, k2, k3 = jax.random.split(key, 3)
    pos = jax.random.uniform(k1, (6, 3)) * 10.0 + 80.0
    pos = pos.at[:, 2].set(0.0)
    scene = make_scene(pos, [0.0, -5.0, 0.0], [0.0, 1.0, 0.0])
    cfg = FieldConfig(
        resolution=32, sigma_scale=0.1, error_scale_mrad=0.05,
        max_batch_size=2, error_model="additive",
    )
    sun = jnp.asarray([[100.0, 100.0, 800.0], [-50.0, 80.0, 900.0]])
    ideal = ideal_normals(scene.heliostat_pos, scene.target_pos, sun)
    errs = jax.random.normal(k2, (2, 6, 3)) * 0.05

    img, actual, _ = render(scene, cfg, sun, ideal, errs)
    np.testing.assert_allclose(
        np.asarray(actual), np.asarray(normalize(ideal + errs)),
        rtol=1e-6, atol=1e-6,
    )
    assert np.isfinite(np.asarray(img)).all()

    # No up-clamp: a strongly-down-pointing additive error survives.
    down = jnp.zeros((2, 6, 3)).at[..., 2].set(-5.0)
    _, actual_down, _ = render(scene, cfg, sun, ideal, down)
    assert float(np.asarray(actual_down)[..., 2].max()) < 0.0

    # The rotation model would have clamped it.
    rot_cfg = dataclasses.replace(cfg, error_model="rotation_mrad")
    zero_rot = jnp.zeros((2, 6, 2))
    _, actual_rot, _ = render(scene, rot_cfg, sun, ideal, zero_rot)
    assert float(np.asarray(actual_rot)[..., 2].min()) > 0.0

    # The stateful wrapper samples 3-component error tensors.
    field = HelioField(scene, cfg, key=k3)
    assert field.error_angles_mrad.shape == (6, 3)
    assert field.batch_error_angles_mrad.shape == (2, 6, 3)
    img_w, _ = field.render(sun, ideal)
    assert img_w.shape == (2, 32, 32)
