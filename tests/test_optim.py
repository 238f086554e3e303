"""Optimizer/schedule tests: AdamP behavior (Adam parity for 1-D params,
projection for scale-invariant weights), smoothed/dominant gradient
estimators, and schedule shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from doodle_tpu.optim import (
    adamp,
    cyclic_lr,
    dominant_adam,
    dominant_grad,
    exponential_decay,
    piecewise_constant_schedule,
    reduce_on_plateau,
    smoothed_adam,
    smoothed_value_and_grad,
)
from doodle_tpu.optim.dominant import dominant_value_and_grads


# ------------------------------------------------------------------- AdamP
def test_adamp_matches_adam_for_1d_params():
    """1-D parameters never project, and with wd=0 AdamP == Adam."""
    params = {"b": jnp.array([1.0, -2.0, 3.0])}
    grads = {"b": jnp.array([0.1, 0.2, -0.3])}

    tx_p = adamp(1e-2)
    tx_a = optax.adam(1e-2)
    sp, sa = tx_p.init(params), tx_a.init(params)
    p_p, p_a = params, params
    for _ in range(5):
        up, sp = tx_p.update(grads, sp, p_p)
        p_p = optax.apply_updates(p_p, up)
        ua, sa = tx_a.update(grads, sa, p_a)
        p_a = optax.apply_updates(p_a, ua)
    np.testing.assert_allclose(np.asarray(p_p["b"]), np.asarray(p_a["b"]), atol=1e-6)


def test_adamp_projects_scale_invariant_update():
    """For g ⟂ p (scale-invariant direction), the AdamP step must stay in the
    tangent space: |p| changes less than Adam's step would change it."""
    p0 = jnp.array([[3.0, 0.0], [0.0, 4.0]])
    g = jnp.array([[0.0, 1.0], [1.0, 0.0]])  # exactly orthogonal per row
    params = {"w": p0}
    tx = adamp(1e-2)
    state = tx.init(params)
    up, _ = tx.update({"w": g}, state, params)
    new_p = optax.apply_updates(params, up)["w"]
    # Tangent-space step: first-order norm preservation per channel row.
    norms0 = np.linalg.norm(np.asarray(p0), axis=1)
    norms1 = np.linalg.norm(np.asarray(new_p), axis=1)
    np.testing.assert_allclose(norms1, norms0, rtol=1e-4)
    # And the parameters did move.
    assert float(jnp.abs(new_p - p0).sum()) > 1e-4


def test_adamp_no_projection_for_radial_grad():
    """g ∥ p is scale-variant: no projection, plain Adam step changes |p|."""
    p0 = jnp.array([[3.0, 0.0]])
    g = jnp.array([[1.0, 0.0]])
    params = {"w": p0}
    tx = adamp(1e-2)
    up, _ = tx.update({"w": g}, tx.init(params), params)
    new_p = optax.apply_updates(params, up)["w"]
    assert abs(float(jnp.linalg.norm(new_p)) - 3.0) > 1e-3


def test_adamp_weight_decay_shrinks():
    params = {"w": jnp.array([[3.0, 0.0]])}
    g = {"w": jnp.array([[0.0, 0.0]])}
    tx = adamp(1e-2, weight_decay=1e-2)
    up, _ = tx.update(g, tx.init(params), params)
    new_p = optax.apply_updates(params, up)["w"]
    assert float(jnp.linalg.norm(new_p)) < 3.0


def test_adamp_requires_params():
    tx = adamp(1e-2)
    with pytest.raises(ValueError):
        tx.update({"w": jnp.zeros(2)}, tx.init({"w": jnp.zeros(2)}), None)


def test_adamp_optimizes_quadratic():
    tx = adamp(0.1)
    params = {"w": jnp.array([[5.0, -3.0], [2.0, 4.0]])}
    state = tx.init(params)

    @jax.jit
    def step(params, state):
        loss, g = jax.value_and_grad(
            lambda p: jnp.sum((p["w"] - 1.0) ** 2)
        )(params)
        up, state = tx.update(g, state, params)
        return optax.apply_updates(params, up), state, loss

    for _ in range(200):
        params, state, loss = step(params, state)
    assert float(loss) < 1e-2


# -------------------------------------------------------------- Smoothed
def test_smoothed_grad_matches_exact_on_linear():
    """For a linear loss the smoothing is exact: E[∇L(θ+δ)] = ∇L(θ)."""
    w = jnp.array([1.0, 2.0, 3.0])

    def loss(p):
        return jnp.dot(w, p["x"])

    est = smoothed_value_and_grad(loss, width=0.5, n_samples=8)
    _, g = est({"x": jnp.zeros(3)}, jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(g["x"]), np.asarray(w), atol=1e-5)


def test_smoothed_adam_descends_noisy_quadratic():
    def loss(p):
        return jnp.sum(jnp.sin(20.0 * p["x"]) * 0.01 + (p["x"] - 2.0) ** 2)

    est = smoothed_value_and_grad(loss, width=0.1, n_samples=4)
    tx = smoothed_adam(5e-2, max_grad_norm=10.0)
    params = {"x": jnp.zeros(4)}
    state = tx.init(params)
    key = jax.random.PRNGKey(0)

    @jax.jit
    def step(params, state, key):
        key, sub = jax.random.split(key)
        val, g = est(params, sub)
        up, state = tx.update(g, state, params)
        return optax.apply_updates(params, up), state, key, val

    for _ in range(300):
        params, state, key, val = step(params, state, key)
    np.testing.assert_allclose(np.asarray(params["x"]), 2.0, atol=0.1)


# -------------------------------------------------------------- Dominant
def test_dominant_grad_picks_largest_norm():
    g1 = {"a": jnp.ones(3) * 0.1}
    g2 = {"a": jnp.ones(3) * 5.0}
    g3 = {"a": jnp.ones(3) * 1.0}
    chosen, idx = dominant_grad([g1, g2, g3])
    assert int(idx) == 1
    np.testing.assert_allclose(np.asarray(chosen["a"]), 5.0)


def test_dominant_grad_needs_two():
    with pytest.raises(ValueError):
        dominant_grad([{"a": jnp.ones(2)}])


def test_dominant_value_and_grads_end_to_end():
    loss_fns = [
        lambda p: jnp.sum(p["x"] ** 2),          # grad 2x
        lambda p: 10.0 * jnp.sum(p["x"] ** 2),   # grad 20x — dominant
    ]
    est = dominant_value_and_grads(loss_fns)
    tx = dominant_adam(0.05, max_grad_norm=None)
    params = {"x": jnp.array([3.0, -2.0])}
    state = tx.init(params)

    @jax.jit
    def step(params, state):
        losses, g, idx = est(params)
        up, state = tx.update(g, state, params)
        return optax.apply_updates(params, up), state, losses, idx

    for _ in range(150):
        params, state, losses, idx = step(params, state)
    assert int(idx) == 1
    assert float(losses[0]) < 1e-3


# -------------------------------------------------------------- Schedules
def test_piecewise_constant_values():
    s = piecewise_constant_schedule([10, 20], [1.0, 0.1, 0.01])
    got = [float(s(c)) for c in [0, 9, 10, 15, 20, 100]]
    np.testing.assert_allclose(got, [1.0, 1.0, 0.1, 0.1, 0.01, 0.01])


def test_piecewise_constant_validation():
    with pytest.raises(ValueError):
        piecewise_constant_schedule([10], [1.0])
    with pytest.raises(ValueError):
        piecewise_constant_schedule([20, 10], [1.0, 0.5, 0.1])


def test_piecewise_constant_lr_stateful():
    from doodle_tpu.optim import PiecewiseConstantLR

    # base_lr before the first milestone (ref piecewise_constant_lr.py:102-108)
    pw = PiecewiseConstantLR(3e-4, {5: 1e-4, 20: 3e-5})
    got = [pw.step() for _ in range(25)]  # steps 0..24
    assert got[:5] == [3e-4] * 5
    assert got[5:20] == [1e-4] * 15
    assert got[20:] == [3e-5] * 5
    assert pw.next_change_step is None

    # on-the-fly milestone insert and update (ref :121-141)
    pw.set_milestone(30, 1e-5)
    assert pw.next_change_step == 30
    pw.set_milestone(20, 2e-5)  # update in place
    assert pw.lr == 2e-5

    # state round-trip (ref :68-83)
    clone = PiecewiseConstantLR(1.0, {0: 1.0})
    clone.load_state_dict(pw.state_dict())
    assert clone.lr == pw.lr and clone.next_change_step == 30
    for _ in range(10):
        clone.step()
    assert clone.lr == 1e-5

    # CLI spec parsing (reference docstring's example schedule, :26)
    spec = PiecewiseConstantLR.parse(3e-4, "0:3e-4,10000:1e-4,50000:3e-5")
    assert spec.lr_at(9_999) == 3e-4
    assert spec.lr_at(10_000) == 1e-4
    assert spec.lr_at(1_000_000) == 3e-5

    with pytest.raises(ValueError):
        PiecewiseConstantLR(1.0, {})
    with pytest.raises(ValueError):
        PiecewiseConstantLR(1.0, {-1: 0.1})


def test_cyclic_triangular():
    s = cyclic_lr(0.1, 1.1, step_size_up=10, mode="triangular")
    np.testing.assert_allclose(float(s(0)), 0.1, atol=1e-6)
    np.testing.assert_allclose(float(s(10)), 1.1, atol=1e-6)
    np.testing.assert_allclose(float(s(20)), 0.1, atol=1e-6)
    np.testing.assert_allclose(float(s(5)), 0.6, atol=1e-6)


def test_cyclic_triangular2_halves_amplitude():
    s = cyclic_lr(0.0, 1.0, step_size_up=10, mode="triangular2")
    np.testing.assert_allclose(float(s(10)), 1.0, atol=1e-6)
    np.testing.assert_allclose(float(s(30)), 0.5, atol=1e-6)


def test_cyclic_exp_range_decays():
    s = cyclic_lr(0.0, 1.0, step_size_up=10, mode="exp_range", gamma=0.9)
    assert float(s(30)) < float(s(10))


def test_exponential_decay():
    s = exponential_decay(1.0, 0.9)
    np.testing.assert_allclose(float(s(3)), 0.9**3, rtol=1e-5)


def test_reduce_on_plateau_reduces_scale():
    tx = reduce_on_plateau(factor=0.5, patience=2)
    params = {"x": jnp.zeros(2)}
    state = tx.init(params)
    g = {"x": jnp.ones(2)}
    # Flat metric → after patience exhausted the scale halves.
    scales = []
    for i in range(8):
        up, state = tx.update(g, state, params, value=1.0)
        scales.append(float(state.scale))
    assert min(scales) <= 0.5


def test_smoothed_value_and_grad_has_aux():
    """has_aux: loss_fn returns (loss, aux); estimator returns
    ((mean_loss, last_aux), mean_grad) with the aux of the last sample."""
    w = jnp.array([1.0, -2.0, 0.5])

    def loss(p):
        v = jnp.dot(w, p["x"])
        return v, {"twice": 2.0 * v}

    est = smoothed_value_and_grad(loss, width=0.3, n_samples=6, has_aux=True)
    (mean_loss, aux), g = est({"x": jnp.zeros(3)}, jax.random.PRNGKey(2))
    np.testing.assert_allclose(np.asarray(g["x"]), np.asarray(w), atol=1e-5)
    assert np.isfinite(float(mean_loss))
    assert np.asarray(aux["twice"]).shape == ()
