"""ops/conv5x5 — matmul-formulated conv gradients (VERDICT r3 item 1).

The contract: forward bit-identical to ``lax.conv_general_dilated``;
every (dgrad, wgrad) backend combination gradient-equal to XLA's autodiff
(same math, different schedule); the encoder module drop-in preserves the
param tree and the policy forward/backward.
"""

import itertools

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import linen as nn

from doodle_tpu.ops import conv5x5 as c5
from doodle_tpu.models.encoders import CNNEncoder, _MXUConv


def _ref_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((2, 2), (2, 2)),
        dimension_numbers=jax.lax.conv_dimension_numbers(
            x.shape, w.shape, ("NHWC", "HWIO", "NHWC")),
    )


SHAPES = [
    (2, 16, 16, 1, 8),      # Cin=1 (the L1 shape class)
    (2, 16, 16, 3, 4),
    (1, 32, 8, 4, 8),       # H % strip != 0 fallback path
]


@pytest.mark.parametrize("B,H,W,cin,cout", SHAPES)
@pytest.mark.parametrize("fwd,dgrad,wgrad", [
    ("xla", "flip", "patch"), ("xla", "flip", "tap"),
    ("xla", "flip", "xla"), ("xla", "flip", "pallas"),
    ("xla", "xla", "xla"), ("xla", "pallas", "xla"),
    ("xla", "s2d", "xla"), ("xla", "flip", "s2d"), ("s2d", "s2d", "s2d"),
    ("pallas", "flip", "xla"), ("pallas", "pallas", "pallas"),
])
def test_grad_parity_all_backends(B, H, W, cin, cout, fwd, dgrad, wgrad,
                                  monkeypatch):
    monkeypatch.setitem(c5.TUNE, "fwd", fwd)
    monkeypatch.setitem(c5.TUNE, "dgrad", dgrad)
    monkeypatch.setitem(c5.TUNE, "wgrad", wgrad)
    key = jax.random.PRNGKey(B * 100 + cin)
    kx, kw, kd = jax.random.split(key, 3)
    x = jax.random.normal(kx, (B, H, W, cin))
    w = jax.random.normal(kw, (5, 5, cin, cout)) * 0.1
    dy = jax.random.normal(kd, (B, H, W, cout))

    if fwd == "xla":
        np.testing.assert_array_equal(c5.conv5x5(x, w), _ref_conv(x, w))
    else:  # im2col matmul: same sum, different order
        np.testing.assert_allclose(
            c5.conv5x5(x, w), _ref_conv(x, w), rtol=2e-5, atol=2e-5)

    def loss(f):
        return lambda x, w: jnp.sum(f(x, w) * dy)

    gx_ref, gw_ref = jax.grad(loss(_ref_conv), argnums=(0, 1))(x, w)
    gx, gw = jax.grad(loss(c5.conv5x5), argnums=(0, 1))(x, w)
    np.testing.assert_allclose(gx, gx_ref, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(gw, gw_ref, rtol=2e-5, atol=2e-4)


def test_dgrad_s2d_odd_shape_falls_back(monkeypatch):
    """s2d needs even H/W; odd shapes must silently use the flip path with
    identical gradients."""
    monkeypatch.setitem(c5.TUNE, "dgrad", "s2d")
    key = jax.random.PRNGKey(11)
    kx, kw, kd = jax.random.split(key, 3)
    x = jax.random.normal(kx, (2, 15, 17, 3))
    w = jax.random.normal(kw, (5, 5, 3, 4)) * 0.1
    dy = jax.random.normal(kd, (2, 15, 17, 4))

    def loss(f):
        return lambda x, w: jnp.sum(f(x, w) * dy)

    gx_ref, _ = jax.grad(loss(_ref_conv), argnums=(0, 1))(x, w)
    gx, _ = jax.grad(loss(c5.conv5x5), argnums=(0, 1))(x, w)
    np.testing.assert_allclose(gx, gx_ref, rtol=2e-5, atol=2e-5)


def test_bf16_grad_parity():
    key = jax.random.PRNGKey(7)
    kx, kw, kd = jax.random.split(key, 3)
    x = jax.random.normal(kx, (2, 16, 16, 4), jnp.bfloat16)
    w = (jax.random.normal(kw, (5, 5, 4, 8)) * 0.1).astype(jnp.bfloat16)
    dy = jax.random.normal(kd, (2, 16, 16, 8), jnp.bfloat16)

    def loss(f):
        return lambda x, w: jnp.sum((f(x, w) * dy).astype(jnp.float32))

    gx_ref, gw_ref = jax.grad(loss(_ref_conv), argnums=(0, 1))(x, w)
    gx, gw = jax.grad(loss(c5.conv5x5), argnums=(0, 1))(x, w)
    assert gx.dtype == jnp.bfloat16 and gw.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(gx, np.float32), np.asarray(gx_ref, np.float32),
        rtol=3e-2, atol=3e-2)  # bf16 rounding; the math is the same f32 sum
    np.testing.assert_allclose(
        np.asarray(gw, np.float32), np.asarray(gw_ref, np.float32),
        rtol=3e-2, atol=1e-1)


def test_mxuconv_matches_nn_conv_module():
    """Drop-in check: same param tree, same forward, same grads as the
    nn.Conv formulation it replaced."""
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 12, 12, 2))
    mine = _MXUConv(6, name="Conv_0")
    ref = nn.Conv(6, (5, 5), strides=(1, 1), padding=2, name="Conv_0")
    pm = mine.init(jax.random.PRNGKey(1), x)
    pr = ref.init(jax.random.PRNGKey(1), x)
    assert jax.tree_util.tree_structure(pm) == jax.tree_util.tree_structure(pr)
    # Same init distributions & key → identical params.
    for a, b in zip(jax.tree.leaves(pm), jax.tree.leaves(pr)):
        np.testing.assert_array_equal(a, b)

    ym = mine.apply(pm, x)
    yr = ref.apply(pr, x)
    np.testing.assert_allclose(ym, yr, rtol=1e-6, atol=1e-6)

    gm = jax.grad(lambda p: jnp.sum(mine.apply(p, x) ** 2))(pm)
    gr = jax.grad(lambda p: jnp.sum(ref.apply(p, x) ** 2))(pr)
    for a, b in zip(jax.tree.leaves(gm), jax.tree.leaves(gr)):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5)


def test_stride2_falls_back_to_xla_autodiff():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 2))
    mine = _MXUConv(4, strides=(2, 2), name="Conv_0")
    ref = nn.Conv(4, (5, 5), strides=(2, 2), padding=2, name="Conv_0")
    p = mine.init(jax.random.PRNGKey(1), x)
    np.testing.assert_allclose(
        mine.apply(p, x), ref.apply(p, x), rtol=1e-6, atol=1e-6)
    g = jax.grad(lambda p: jnp.sum(mine.apply(p, x) ** 2))(p)
    assert all(np.isfinite(l).all() for l in jax.tree.leaves(g))


def test_encoder_grad_parity_vs_plain_conv():
    """Full CNNEncoder backward with the MXU lowerings equals the same
    encoder with XLA's own transposes (TUNE=xla/xla)."""
    enc = CNNEncoder(out_dim=8, dropout=0.0, features=(4, 8))
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16))
    params = enc.init(jax.random.PRNGKey(3), x)

    def loss(p):
        return jnp.sum(enc.apply(p, x) ** 2)

    g_mxu = jax.grad(loss)(params)
    old = dict(c5.TUNE)
    try:
        c5.TUNE.update(dgrad="xla", wgrad="xla")
        g_xla = jax.grad(loss)(params)
    finally:
        c5.TUNE.update(old)
    for a, b in zip(jax.tree.leaves(g_mxu), jax.tree.leaves(g_xla)):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5)
