"""Model-layer tests: CoM math, encoder/policy shapes, carry threading,
determinism, and gradient flow."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from doodle_tpu.models import (
    CNNEncoder,
    COMEncoder,
    PolicyNet,
    center_of_mass_2d,
    initial_carry,
)


# --------------------------------------------------------------------- CoM
def test_com_point_mass():
    img = jnp.zeros((1, 8, 8)).at[0, 2, 5].set(3.0)
    coords = center_of_mass_2d(img)
    np.testing.assert_allclose(np.asarray(coords), [[5.0, 2.0]], atol=1e-5)


def test_com_uniform_mass_is_center():
    img = jnp.ones((2, 9, 9))
    coords = center_of_mass_2d(img)
    np.testing.assert_allclose(np.asarray(coords), [[4.0, 4.0]] * 2, atol=1e-4)


def test_com_zero_mass_sentinel():
    img = jnp.zeros((3, 4, 4))
    coords = center_of_mass_2d(img)
    np.testing.assert_allclose(np.asarray(coords), [[-1.0, -1.0]] * 3)


def test_com_accepts_nchw_and_clamps_negatives():
    img = jnp.zeros((1, 1, 8, 8)).at[0, 0, 1, 1].set(2.0).at[0, 0, 7, 7].set(-5.0)
    coords = center_of_mass_2d(img)
    np.testing.assert_allclose(np.asarray(coords), [[1.0, 1.0]], atol=1e-5)


def test_com_differentiable():
    def f(img):
        return jnp.sum(center_of_mass_2d(img))

    img = jnp.ones((1, 6, 6)).at[0, 3, 3].set(5.0)
    g = jax.grad(f)(img)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0.0


# ---------------------------------------------------------------- Encoders
@pytest.mark.parametrize("enc_cls", [CNNEncoder, COMEncoder])
def test_encoder_shapes(enc_cls):
    enc = enc_cls(out_dim=32)
    x = jax.random.uniform(jax.random.PRNGKey(0), (4, 16, 16))
    params = enc.init(jax.random.PRNGKey(1), x)
    y = enc.apply(params, x)
    assert y.shape == (4, 32)
    assert np.isfinite(np.asarray(y)).all()


def test_cnn_encoder_stride_param_compatible():
    """stride is a pure compute knob: parameter trees (and so checkpoints)
    are identical across stride settings; stride=1 is bit-identical to the
    pre-knob encoder; stride=2 still produces finite, input-dependent
    features."""
    x = jax.random.uniform(jax.random.PRNGKey(0), (3, 16, 16))
    e1 = CNNEncoder(out_dim=32)
    e2 = CNNEncoder(out_dim=32, stride=2)
    p1 = e1.init(jax.random.PRNGKey(1), x)
    p2 = e2.init(jax.random.PRNGKey(1), x)
    assert jax.tree.structure(p1) == jax.tree.structure(p2)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        assert a.shape == b.shape
    y2 = e2.apply(p1, x)                       # cross-load: p1 into stride-2
    assert y2.shape == (3, 32)
    assert np.isfinite(np.asarray(y2)).all()
    y2b = e2.apply(p1, x.at[0, 8, 8].add(3.0))
    assert not np.allclose(np.asarray(y2), np.asarray(y2b))


def test_cnn_dropout_stochastic_vs_deterministic():
    enc = CNNEncoder(out_dim=16, dropout=0.5)
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 12, 12))
    params = enc.init(jax.random.PRNGKey(1), x)
    det = enc.apply(params, x, deterministic=True)
    det2 = enc.apply(params, x, deterministic=True)
    np.testing.assert_array_equal(np.asarray(det), np.asarray(det2))
    sto = enc.apply(
        params, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(2)}
    )
    assert not np.allclose(np.asarray(det), np.asarray(sto))


# ------------------------------------------------------------------ Policy
def _make_policy(arch, encoder="cnn", normalize_output=True):
    return PolicyNet(
        num_heliostats=5,
        enc_dim=32,
        lstm_hid=32,
        transformer_layers=1,
        transformer_heads=4,
        transformer_ff=64,
        architecture=arch,
        encoder=encoder,
        dropout=0.1,
    )


def _init(policy, B=3, T=2, res=16, N=5):
    img = jax.random.uniform(jax.random.PRNGKey(0), (B, T, res, res))
    aux = jax.random.normal(jax.random.PRNGKey(1), (B, 3 + N * 3))
    carry = policy.init_carry(B)
    params = policy.init(jax.random.PRNGKey(2), img, aux, carry)
    return params, img, aux, carry


@pytest.mark.parametrize("arch", ["mlp", "lstm", "transformer"])
def test_policy_output_shape_and_unit_norm(arch):
    policy = _make_policy(arch)
    params, img, aux, carry = _init(policy)
    normals, new_carry = policy.apply(params, img, aux, carry)
    assert normals.shape == (3, 5, 3)
    norms = np.linalg.norm(np.asarray(normals), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    assert jax.tree.structure(new_carry) == jax.tree.structure(carry)


def test_policy_unnormalized_output_for_ttt():
    policy = PolicyNet(num_heliostats=5, enc_dim=32, architecture="mlp",
                       normalize_output=False)
    params, img, aux, carry = _init(policy)
    normals, _ = policy.apply(params, img, aux, carry)
    norms = np.linalg.norm(np.asarray(normals), axis=-1)
    assert not np.allclose(norms, 1.0, atol=1e-3)


def test_policy_angular_action_space():
    """action_space='angles' → [B, N, 2] E/U mrad actions bounded by
    ±angle_scale (the intent of the unrunnable reference angular head,
    newenv/train_with_env_angular.py:201-249)."""
    policy = PolicyNet(num_heliostats=5, enc_dim=32, architecture="mlp",
                       action_space="angles", angle_scale=50.0, dropout=0.0)
    params, img, aux, carry = _init(policy)
    angles, _ = policy.apply(params, img, aux, carry)
    assert angles.shape == (3, 5, 2)
    a = np.asarray(angles)
    assert (np.abs(a) < 50.0).all()

    # gradients flow through the tanh head
    def loss(p):
        out, _ = policy.apply(p, img, aux, carry)
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(params)
    total = sum(float(jnp.abs(l).sum()) for l in jax.tree.leaves(g))
    assert np.isfinite(total) and total > 0


def test_lstm_carry_changes_output():
    """Threading the LSTM carry across calls must change the prediction."""
    policy = _make_policy("lstm")
    params, img, aux, carry = _init(policy)
    out1, carry1 = policy.apply(params, img, aux, carry)
    out2, _ = policy.apply(params, img, aux, carry1)
    assert not np.allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)


def test_transformer_zero_carry_matches_none_semantics():
    """Zeros initial residual ≡ the reference's hx=None first call; a nonzero
    carry shifts the features residually."""
    policy = _make_policy("transformer")
    params, img, aux, carry = _init(policy)
    assert carry.shape == (3, 32)
    np.testing.assert_array_equal(np.asarray(carry), 0.0)
    out1, carry1 = policy.apply(params, img, aux, carry)
    out2, carry2 = policy.apply(params, img, aux, carry1)
    assert not np.allclose(np.asarray(carry1), np.asarray(carry2))
    assert not np.allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)


def test_policy_com_encoder_path():
    policy = _make_policy("mlp", encoder="com")
    params, img, aux, carry = _init(policy)
    normals, _ = policy.apply(params, img, aux, carry)
    assert normals.shape == (3, 5, 3)
    assert np.isfinite(np.asarray(normals)).all()


def test_policy_gradients_finite_and_nonzero():
    policy = _make_policy("lstm")
    params, img, aux, carry = _init(policy)

    def loss_fn(p):
        normals, _ = policy.apply(p, img, aux, carry)
        return jnp.sum(normals**2)

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(float(jnp.abs(l).sum()) > 0 for l in leaves)


def test_policy_scan_compatible():
    """The (img, aux, carry) → (action, carry) step must lax.scan cleanly."""
    policy = _make_policy("lstm")
    params, img, aux, carry = _init(policy)

    def step(c, _):
        normals, c = policy.apply(params, img, aux, c)
        return c, normals

    final_carry, actions = jax.lax.scan(step, carry, None, length=4)
    assert actions.shape == (4, 3, 5, 3)
    assert jax.tree.structure(final_carry) == jax.tree.structure(carry)


def test_initial_carry_structures():
    assert initial_carry("mlp", 2) == ()
    c, h = initial_carry("lstm", 2, lstm_hid=7)
    assert c.shape == (2, 7) and h.shape == (2, 7)
    hx = initial_carry("transformer", 2, enc_dim=9)
    assert hx.shape == (2, 9)
    with pytest.raises(ValueError):
        initial_carry("nope", 2)


def test_encoder_gelu_knob():
    """TrainConfig defaults to the tanh-approx conv GELU (1.84× faster
    config-4 train step); the model-level default stays erf (torch
    parity). The two must actually differ numerically (the knob is live)
    and agree to the documented ~3e-4 absolute tolerance."""
    import jax
    import jax.numpy as jnp

    from doodle_tpu.models.policy import PolicyNet
    from doodle_tpu.train import TrainConfig

    assert TrainConfig().encoder_gelu == "tanh"
    assert PolicyNet(num_heliostats=3).encoder_gelu_approximate is False

    img = jax.random.uniform(jax.random.PRNGKey(0), (2, 2, 16, 16))
    aux = jnp.zeros((2, 3 + 9))
    outs = {}
    for approx in (False, True):
        p = PolicyNet(num_heliostats=3, enc_dim=16, lstm_hid=8,
                      architecture="mlp", dropout=0.0,
                      encoder_gelu_approximate=approx)
        params = p.init(jax.random.PRNGKey(1), img, aux, p.init_carry(2))
        outs[approx], _ = p.apply(params, img, aux, p.init_carry(2),
                                  deterministic=True)
    a, b = np.asarray(outs[False]), np.asarray(outs[True])
    assert not np.array_equal(a, b)          # knob is live
    np.testing.assert_allclose(a, b, atol=5e-3)   # but numerically close


# ------------------------------------------------------- residual head
def test_residual_head_starts_at_aux_base():
    """With residual_head the final Dense is zero-init, so the initial
    action is exactly normalize(aux normals) — alignment 0 from step 0."""
    policy = PolicyNet(num_heliostats=5, enc_dim=32, architecture="lstm",
                       lstm_hid=32, residual_head=True)
    params, img, aux, carry = _init(policy)
    normals, _ = policy.apply(params, img, aux, carry)
    base = np.asarray(aux[:, 3:]).reshape(3, 5, 3)
    base = base / np.linalg.norm(base, axis=-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(normals), base, atol=1e-6)


def test_residual_head_gradients_reach_delta_layer():
    """Zero-init kills the kernel's forward contribution but not its
    gradient: downstream loss gradients must reach Dense_1 (and through
    the erf-GELU features, the encoder) so the delta can learn."""
    policy = PolicyNet(num_heliostats=5, enc_dim=32, architecture="mlp",
                       residual_head=True)
    params, img, aux, carry = _init(policy)

    def loss_fn(p):
        normals, _ = policy.apply(p, img, aux, carry)
        return jnp.sum((normals - 0.1) ** 2)

    g = jax.grad(loss_fn)(params)
    k = g["params"]["Dense_1"]["kernel"]
    assert float(jnp.abs(k).sum()) > 0
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(g))


def test_residual_head_base_is_stop_gradiented():
    """The aux base is observation data: no gradient flows into aux
    through the residual path beyond what the plain head already routes
    (the concat into LayerNorm); the base add itself must be detached."""
    policy = PolicyNet(num_heliostats=5, enc_dim=32, architecture="mlp",
                       residual_head=True)
    params, img, aux, carry = _init(policy)

    def loss_fn(a):
        normals, _ = policy.apply(params, img, a, carry)
        return jnp.sum(normals)

    g_res = jax.grad(loss_fn)(aux)
    # Same loss through the non-residual head: aux grads only via concat.
    plain = PolicyNet(num_heliostats=5, enc_dim=32, architecture="mlp")
    p2 = plain.init(jax.random.PRNGKey(2), img, aux, carry)

    def loss_plain(a):
        normals, _ = plain.apply(p2, img, a, carry)
        return jnp.sum(normals)

    g_plain = jax.grad(loss_plain)(aux)
    # Residual-head aux grad at zero-init: Dense_1 kernel is zero so the
    # concat path contributes nothing, and the detached base contributes
    # nothing — the gradient must be exactly zero (while the plain head's
    # is generically nonzero, proving the probe has power).
    assert float(jnp.abs(g_res).sum()) == 0.0
    assert float(jnp.abs(g_plain).sum()) > 0


def test_residual_head_rejects_angular_space():
    with pytest.raises(ValueError):
        PolicyNet(num_heliostats=5, action_space="angles",
                  residual_head=True).init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 2, 16, 16)), jnp.zeros((1, 3 + 15)), (),
        )
