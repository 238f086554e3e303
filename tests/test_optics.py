"""Parity tests: L0 optics kernels vs. goldens captured from the reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from doodle_tpu.ops import (
    cone_project,
    ideal_normals,
    normalize,
    ray_plane_intersect,
    reflect,
    rotate_mrad_eu,
)


def test_reflect_matches_reference(goldens):
    g = goldens["optics_kernels"]
    out = reflect(jnp.asarray(g["incidents"]), jnp.asarray(g["normals"]))
    np.testing.assert_allclose(np.asarray(out), g["refl"], atol=1e-6)


def test_reflect_law():
    """Physical sanity: |r| == |i| and angle(i, n) == angle(r, n)."""
    key = jax.random.PRNGKey(0)
    i = normalize(jax.random.normal(key, (32, 3)))
    n = normalize(jax.random.normal(jax.random.fold_in(key, 1), (32, 3)))
    r = reflect(i, n)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(r), axis=1), 1.0, atol=1e-5
    )
    cos_in = np.sum(np.asarray(i) * np.asarray(n), axis=1)
    cos_rn = np.sum(np.asarray(r) * np.asarray(n), axis=1)
    np.testing.assert_allclose(cos_in, cos_rn, atol=1e-5)


def test_ray_plane_matches_reference(goldens):
    g = goldens["optics_kernels"]
    inter, valid = ray_plane_intersect(
        jnp.asarray(g["origins"]),
        jnp.asarray(g["dirs"]),
        jnp.asarray(g["plane_point"]),
        jnp.asarray(g["plane_normal"]),
    )
    np.testing.assert_allclose(np.asarray(inter), g["inter"], atol=1e-3)
    np.testing.assert_allclose(np.asarray(valid), g["valid"], atol=0)
    # the parallel rays constructed in the golden must be masked
    assert np.asarray(valid)[:4].sum() == 0


def test_ray_plane_points_lie_on_plane(goldens):
    g = goldens["optics_kernels"]
    inter, valid = ray_plane_intersect(
        jnp.asarray(g["origins"]),
        jnp.asarray(g["dirs"]),
        jnp.asarray(g["plane_point"]),
        jnp.asarray(g["plane_normal"]),
    )
    offset = np.sum(
        (np.asarray(inter) - g["plane_point"]) * g["plane_normal"], axis=1
    )
    np.testing.assert_allclose(offset * np.asarray(valid)[:, 0], 0.0, atol=1e-2)


def test_rotate_matches_reference(goldens):
    g = goldens["optics_kernels"]
    out = rotate_mrad_eu(jnp.asarray(g["normals"]), jnp.asarray(g["errors"]))
    np.testing.assert_allclose(np.asarray(out), g["rot"], atol=1e-6)


def test_rotate_preserves_norm():
    key = jax.random.PRNGKey(3)
    n = jax.random.normal(key, (64, 3))
    e = jax.random.normal(jax.random.fold_in(key, 1), (64, 2)) * 500.0
    out = rotate_mrad_eu(n, e)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out), axis=1),
        np.linalg.norm(np.asarray(n), axis=1),
        rtol=1e-5,
    )


def test_rotate_zero_is_identity():
    key = jax.random.PRNGKey(4)
    n = jax.random.normal(key, (16, 3))
    out = rotate_mrad_eu(n, jnp.zeros((16, 2)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(n), atol=1e-7)


def test_cone_project_matches_reference(goldens):
    g = goldens["optics_kernels"]
    out = cone_project(
        jnp.asarray(g["cone_a"]), jnp.asarray(g["cone_b"]), float(g["cone_theta"])
    )
    np.testing.assert_allclose(np.asarray(out), g["cone"], atol=1e-5)


def test_ideal_normals_matches_reference(goldens):
    g = goldens["field_render"]
    out = ideal_normals(
        jnp.asarray(g["helio"]), jnp.asarray(g["targ_pos"]), jnp.asarray(g["sun"])
    )
    np.testing.assert_allclose(np.asarray(out), g["ideal"], atol=1e-6)
    # single-sun path
    out1 = ideal_normals(
        jnp.asarray(g["helio"]), jnp.asarray(g["targ_pos"]), jnp.asarray(g["sun"][0])
    )
    np.testing.assert_allclose(np.asarray(out1), g["ideal"][0], atol=1e-6)


def test_ideal_normals_reflect_onto_target(goldens):
    """The aiming law must actually aim: reflecting the sun ray about the
    ideal normal hits the target position."""
    g = goldens["field_render"]
    helio = jnp.asarray(g["helio"])
    targ = jnp.asarray(g["targ_pos"])
    sun = jnp.asarray(g["sun"])
    normals = ideal_normals(helio, targ, sun)
    inc = normalize(sun[:, None, :] - helio[None, :, :])
    refl = normalize(reflect(inc, normals))
    to_target = normalize(targ[None, None, :] - helio[None, :, :])
    to_target = jnp.broadcast_to(to_target, refl.shape)
    np.testing.assert_allclose(np.asarray(refl), np.asarray(to_target), atol=1e-5)


@pytest.mark.parametrize("fn_grad", ["reflect", "rotate"])
def test_kernels_differentiable(fn_grad):
    key = jax.random.PRNGKey(9)
    n = jax.random.normal(key, (8, 3))

    if fn_grad == "reflect":
        f = lambda x: jnp.sum(reflect(normalize(n), x) ** 2)
    else:
        e = jax.random.normal(jax.random.fold_in(key, 2), (8, 2))
        f = lambda x: jnp.sum(rotate_mrad_eu(x, e) ** 2)
    grad = jax.grad(f)(n)
    assert np.isfinite(np.asarray(grad)).all()
