"""Pallas splat kernel: parity vs the XLA separable path (forward and
gradients), invalid-ray quirk, chunked accumulation, render integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from doodle_tpu.core.field import render
from doodle_tpu.core.scene import FieldConfig, make_scene
from doodle_tpu.ops.splat import splat_factors, splat_image
from doodle_tpu.ops.splat_pallas import splat_summed_pallas


def _mk(B=3, N=7, res=32, seed=0, with_invalid=True):
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    inter = jax.random.normal(k1, (B, N, 3)) * 5.0
    origins = jax.random.normal(k2, (B, N, 3)) * 3.0 + 50.0
    valid = jnp.ones((B, N, 1))
    if with_invalid:
        valid = valid.at[0, 0, 0].set(0.0).at[1, 3, 0].set(0.0)
    pu = jnp.array([1.0, 0.0, 0.0])
    pv = jnp.array([0.0, 0.0, 1.0])
    po = jnp.array([0.0, -5.0, 0.0])
    return inter, origins, po, pu, pv, valid, res


def _xla(inter, origins, po, pu, pv, valid, res, w=15.0, h=15.0, ss=0.05):
    fx, fy = splat_factors(inter, origins, po, pu, pv, w, h, res, ss, valid)
    return splat_image(fx, fy, precision="highest")


def _pal(inter, origins, po, pu, pv, valid, res, w=15.0, h=15.0, ss=0.05):
    return splat_summed_pallas(
        inter, origins, po, pu, pv, w, h, res, ss, valid,
        precision="highest",
    )


def test_forward_parity_with_invalid_rays():
    args = _mk()
    np.testing.assert_allclose(
        np.asarray(_pal(*args)), np.asarray(_xla(*args)), rtol=2e-5, atol=1e-5
    )


def test_forward_parity_nonmultiple_res_and_chunking():
    # res=100 exercises non-128-multiple lanes; N=530 > chunk=512 exercises
    # the accumulation path.
    args = _mk(B=2, N=530, res=100, with_invalid=True)
    np.testing.assert_allclose(
        np.asarray(_pal(*args)), np.asarray(_xla(*args)), rtol=2e-5, atol=1e-5
    )


def test_gradient_parity():
    inter, origins, po, pu, pv, valid, res = _mk(B=2, N=5, res=24)

    def loss_pal(x):
        return jnp.sum(_pal(x, origins, po, pu, pv, valid, res) ** 2)

    def loss_xla(x):
        return jnp.sum(_xla(x, origins, po, pu, pv, valid, res) ** 2)

    g_pal = jax.grad(loss_pal)(inter)
    g_xla = jax.grad(loss_xla)(inter)
    np.testing.assert_allclose(
        np.asarray(g_pal), np.asarray(g_xla), rtol=1e-3, atol=1e-5
    )


def test_gradient_parity_chunked_and_origins():
    # N=530 > chunk=512 pins the fused backward's multi-chunk path; the
    # origins gradient pins the σ (inv2s2) cotangent chain.
    inter, origins, po, pu, pv, valid, res = _mk(B=2, N=530, res=32)

    def loss_pal(x, o):
        return jnp.sum(_pal(x, o, po, pu, pv, valid, res) ** 2)

    def loss_xla(x, o):
        return jnp.sum(_xla(x, o, po, pu, pv, valid, res) ** 2)

    gi_p, go_p = jax.grad(loss_pal, argnums=(0, 1))(inter, origins)
    gi_x, go_x = jax.grad(loss_xla, argnums=(0, 1))(inter, origins)
    np.testing.assert_allclose(
        np.asarray(gi_p), np.asarray(gi_x), rtol=1e-3, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(go_p), np.asarray(go_x), rtol=1e-3, atol=1e-5
    )


def test_render_backend_knob_parity():
    pos = np.stack(
        [np.linspace(-10, 10, 6), np.full(6, 80.0), np.zeros(6)], axis=1
    )
    scene = make_scene(pos, [0.0, -5.0, 0.0], [0.0, 1.0, 0.0])
    sun = jnp.array([[1000.0, 1000.0, 8000.0]] * 2)
    normals = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 3))
    errors = jax.random.normal(jax.random.PRNGKey(2), (2, 6, 2)) * 20.0

    cfg_x = FieldConfig(resolution=32, sigma_scale=0.1, splat_backend="xla")
    cfg_p = FieldConfig(resolution=32, sigma_scale=0.1, splat_backend="pallas")
    ix, _, _ = render(scene, cfg_x, sun, normals, errors)
    ip, _, _ = render(scene, cfg_p, sun, normals, errors)
    np.testing.assert_allclose(
        np.asarray(ip), np.asarray(ix), rtol=2e-5, atol=1e-5
    )


def test_pallas_jit_and_vmap_compose():
    args = _mk(B=2, N=5, res=16)

    f = jax.jit(lambda inter: _pal(inter, *args[1:]))
    out = f(args[0])
    assert out.shape == (2, 16, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_render_auto_backend_matches_xla():
    # "auto" resolves to xla below 400 heliostats and pallas at/above; both
    # must agree with the xla reference path either way.
    pos = np.stack(
        [np.linspace(-10, 10, 6), np.full(6, 80.0), np.zeros(6)], axis=1
    )
    scene = make_scene(pos, [0.0, -5.0, 0.0], [0.0, 1.0, 0.0])
    sun = jnp.array([[1000.0, 1000.0, 8000.0]] * 2)
    normals = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 3))
    errors = jax.random.normal(jax.random.PRNGKey(2), (2, 6, 2)) * 20.0

    cfg_x = FieldConfig(resolution=32, sigma_scale=0.1, splat_backend="xla")
    cfg_a = FieldConfig(resolution=32, sigma_scale=0.1, splat_backend="auto")
    ix, _, _ = render(scene, cfg_x, sun, normals, errors)
    ia, _, _ = render(scene, cfg_a, sun, normals, errors)
    np.testing.assert_allclose(np.asarray(ia), np.asarray(ix), rtol=0, atol=0)


def test_forward_default_precision_close_to_exact():
    # The bf16 fast path (exp2 + quadratic expansion, _splat_kernel_fast)
    # trades ~1e-3 relative flux error for speed; it must stay within the
    # bf16 quantization budget of the exact HIGHEST image, including with
    # invalid rays and multi-chunk N.
    args = _mk(B=2, N=530, res=64)
    hi = np.asarray(_xla(*args))
    lo = np.asarray(splat_summed_pallas(
        *args[:5], 15.0, 15.0, args[6], 0.05, args[5], precision="default",
    ))
    rel = np.abs(lo - hi).max() / hi.max()
    assert rel < 5e-3, rel


def test_fast_path_invalid_ray_exact_ones():
    # Invalid rays must contribute the exact all-ones image (reference
    # quirk) in the fast encoding too: p=q=r=0 => exp2(0) == 1 exactly.
    inter = jnp.ones((1, 1, 3)) * 5.0
    origins = jnp.zeros((1, 1, 3))
    valid = jnp.zeros((1, 1, 1))
    pu = jnp.array([1.0, 0.0, 0.0])
    pv = jnp.array([0.0, 0.0, 1.0])
    po = jnp.array([0.0, -5.0, 0.0])
    img = np.asarray(splat_summed_pallas(
        inter, origins, po, pu, pv, 15.0, 15.0, 16, 0.05, valid,
        precision="default",
    ))
    np.testing.assert_array_equal(img, np.ones((1, 16, 16), np.float32))


@pytest.mark.parametrize("mxu_args,pipeline", [(True, False), (True, True),
                                               (False, True)])
def test_fast_variant_kernels_match_base(mxu_args, pipeline, monkeypatch):
    """The r4 co-issue experiment kernels (MXU-built args, cross-step
    double-buffered pipeline — kept in-tree as measured negative results,
    BASELINE.md "Splat co-issue attempts") must stay numerically
    interchangeable with the shipped base kernel."""
    from doodle_tpu.ops import splat_pallas as sp

    inter, origins, po, pu, pv, valid, res = _mk(B=3, N=140, res=32, seed=3)
    args = (inter, origins, po, pu, pv, 15.0, 15.0, res, 0.05, valid)
    base = np.asarray(splat_summed_pallas(*args, precision="default"))
    monkeypatch.setitem(sp.TUNE["fwd"], "mxu_args", mxu_args)
    monkeypatch.setitem(sp.TUNE["fwd"], "pipeline", pipeline)
    var = np.asarray(splat_summed_pallas(*args, precision="default"))
    rel = np.abs(var - base).max() / max(base.max(), 1e-9)
    assert rel < 2e-3, rel
