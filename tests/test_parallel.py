"""Sharding tests on the 8-device virtual CPU mesh: mesh construction,
EnvState sharding, helio-sharded render parity vs the single-device
renderer, and a sharded train step that matches the unsharded one."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import PartitionSpec as P

from doodle_tpu.core.field import render
from doodle_tpu.core.scene import FieldConfig, make_scene
from doodle_tpu.env import env as env_lib
from doodle_tpu.models.policy import PolicyNet
from doodle_tpu.parallel import (
    BATCH_AXIS,
    HELIO_AXIS,
    make_mesh,
    make_sharded_train_step,
    render_helio_sharded,
    shard_env_state,
)
from doodle_tpu.train.rollout import rollout


@pytest.fixture(scope="module")
def scene8():
    pos = np.stack(
        [np.linspace(-20, 20, 8), np.full(8, 80.0), np.zeros(8)], axis=1
    )
    return make_scene(pos, [0.0, -5.0, 0.0], [0.0, 1.0, 0.0])


def test_make_mesh_shapes():
    m = make_mesh(8)
    assert m.shape[BATCH_AXIS] == 8 and m.shape[HELIO_AXIS] == 1
    m2 = make_mesh(8, helio_parallel=2)
    assert m2.shape[BATCH_AXIS] == 4 and m2.shape[HELIO_AXIS] == 2
    with pytest.raises(ValueError):
        make_mesh(8, helio_parallel=3)


def test_shard_env_state_placement(scene8):
    cfg = env_lib.EnvConfig(resolution=16, batch_size=8, error_scale_mrad=30.0)
    state = env_lib.init_state(scene8, cfg, jax.random.PRNGKey(0))
    mesh = make_mesh(8)
    sharded = shard_env_state(mesh, state)
    spec = sharded.errors.sharding.spec
    assert spec[0] == BATCH_AXIS
    assert sharded.ref_min.sharding.spec == P()


def test_helio_sharded_render_matches_dense(scene8):
    cfg = FieldConfig(resolution=32, sigma_scale=0.1, target_width=15.0,
                      target_height=15.0)
    B, N = 4, 8
    key = jax.random.PRNGKey(1)
    sun = jax.random.normal(key, (B, 3))
    sun = sun.at[:, 2].set(jnp.abs(sun[:, 2])) * 10000.0
    normals = jax.random.normal(jax.random.PRNGKey(2), (B, N, 3))
    normals = normals / jnp.linalg.norm(normals, axis=-1, keepdims=True)
    errors = jax.random.normal(jax.random.PRNGKey(3), (B, N, 2)) * 10.0

    dense, _, _ = render(scene8, cfg, sun, normals, errors)
    mesh = make_mesh(8, helio_parallel=4)
    sharded = render_helio_sharded(scene8, cfg, sun, normals, errors, mesh)
    np.testing.assert_allclose(
        np.asarray(sharded), np.asarray(dense), rtol=2e-5, atol=1e-6
    )


def test_helio_sharded_render_rejects_indivisible(scene8):
    cfg = FieldConfig(resolution=16)
    mesh = make_mesh(6, helio_parallel=3)
    with pytest.raises(ValueError):
        render_helio_sharded(
            scene8, cfg,
            jnp.ones((2, 3)), jnp.ones((2, 8, 3)), jnp.ones((2, 8, 2)), mesh,
        )


def test_sharded_train_step_matches_unsharded(scene8):
    """One DP-sharded (GSPMD) train step must equal the single-device step
    bitwise (same math, different placement)."""
    cfg = env_lib.EnvConfig(
        resolution=16, batch_size=8, sigma_scale=0.1, error_scale_mrad=30.0
    )
    state = env_lib.init_state(scene8, cfg, jax.random.PRNGKey(0))
    policy = PolicyNet(num_heliostats=8, enc_dim=16, lstm_hid=16,
                       architecture="lstm", dropout=0.0)
    img = jnp.zeros((8, 2, 16, 16))
    aux = jnp.zeros((8, 3 + 24))
    params = policy.init(jax.random.PRNGKey(1), img, aux, policy.init_carry(8))
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    weights = jnp.array([1.0, 0.0, 0.0, 0.0])
    key = jax.random.PRNGKey(5)

    mesh = make_mesh(8)
    sharded_step = make_sharded_train_step(
        policy, scene8, cfg, opt, mesh, k=2, T=2, deterministic=True,
        impl="gspmd",
    )
    s_state = shard_env_state(mesh, state)
    p1, o1, st1, loss1, parts1 = sharded_step(
        params, opt_state, s_state, key, weights
    )

    def plain_step(params, opt_state, env_state, key, weights):
        def loss_fn(p):
            res = rollout(policy, p, scene8, cfg, env_state, key,
                          k=2, T=2, deterministic=True)
            parts = res.losses
            total = weights[0] * parts["alignment_loss"]
            return total, parts

        (loss, parts), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        up, opt_state = opt.update(g, opt_state, params)
        return optax.apply_updates(params, up), opt_state, loss, parts

    p2, o2, loss2, parts2 = jax.jit(plain_step)(
        params, opt_state, state, key, weights
    )
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    # atol 2e-5: post-adam params are O(1e-2); shard_map reduction order
    # shifts a handful of elements by ~1e-5 (observed max 1.1e-5).
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
    # The sharded step really ran on 8 devices
    assert len(loss1.devices()) == 8 or loss1.sharding.is_fully_replicated


def _policy_setup(scene8, cfg, use_error_mask=False):
    policy = PolicyNet(num_heliostats=8, enc_dim=16, lstm_hid=16,
                       architecture="lstm", dropout=0.0)
    img = jnp.zeros((8, 2, 16, 16))
    aux = jnp.zeros((8, 3 + 24))
    params = policy.init(jax.random.PRNGKey(1), img, aux,
                         policy.init_carry(8))
    return policy, params


def test_shard_map_train_step_matches_unsharded(scene8):
    """The shard_map train step (explicit single pmean) must match the
    single-device step when the step consumes no randomness (errors kept,
    init noise zero, deterministic policy) — up to reduction order.

    sigma_scale=0.01 (trainer-grade): at 0.1 the flux is near-uniform and
    every per-image mean error ties to the ulp, making the worst-k% mask
    noise-dominated on both sides (CLAUDE.md gotcha)."""
    cfg = env_lib.EnvConfig(
        resolution=16, batch_size=8, sigma_scale=0.01, error_scale_mrad=30.0,
        new_errors_every_reset=False, field_init_noise=0.0,
        use_error_mask=True,
    )
    state = env_lib.init_state(scene8, cfg, jax.random.PRNGKey(0))
    policy, params = _policy_setup(scene8, cfg)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    weights = jnp.array([1.0, 0.0, 1.0, 1.0])
    key = jax.random.PRNGKey(5)

    mesh = make_mesh(8)
    step = make_sharded_train_step(
        policy, scene8, cfg, opt, mesh, k=2, T=2, deterministic=True,
        impl="shard_map",
    )
    s_state = shard_env_state(mesh, state)
    p1, o1, st1, loss1, parts1 = step(params, opt_state, s_state, key, weights)

    def plain_step(params, opt_state, env_state, key, weights):
        def loss_fn(p):
            res = rollout(policy, p, scene8, cfg, env_state, key,
                          k=2, T=2, deterministic=True)
            parts = res.losses
            total = (weights[0] * parts["alignment_loss"]
                     + weights[2] * parts["mse"] + weights[3] * parts["dist"])
            return total, parts

        (loss, parts), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        up, opt_state = opt.update(g, opt_state, params)
        return optax.apply_updates(params, up), opt_state, loss, parts

    p2, o2, loss2, parts2 = jax.jit(plain_step)(
        params, opt_state, state, key, weights
    )
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    assert float(parts2["mse"]) > 0, "mask degenerate — test config is moot"
    for k_, v in parts1.items():
        np.testing.assert_allclose(
            float(v), float(parts2[k_]), rtol=1e-5, atol=1e-7,
            err_msg=f"metric {k_} diverged",
        )
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_shard_map_rejects_indivisible_batch(scene8):
    cfg = env_lib.EnvConfig(resolution=16, batch_size=7)
    policy, _ = _policy_setup(scene8, cfg)
    with pytest.raises(ValueError, match="not divisible"):
        make_sharded_train_step(
            policy, scene8, cfg, optax.adam(1e-3), make_mesh(8), k=2, T=2,
            impl="shard_map",
        )


def test_collective_budget(scene8):
    """Pin the collective budget of the compiled train step (VERDICT r1 #1).

    shard_map impl: exactly ONE all-reduce (the fused grads+loss+parts
    pmean), payload ≈ param bytes, placed OUTSIDE every loop, plus only
    tiny [B]-float all-gathers for the worst-k% quantile. Any change that
    introduces extra syncs — or lets the gradient reduction slip inside
    the backward scan — fails here.
    """
    from doodle_tpu.parallel.audit import (
        annotate_loop_placement,
        collective_summary,
    )

    cfg = env_lib.EnvConfig(
        resolution=16, batch_size=8, sigma_scale=0.1, error_scale_mrad=30.0,
        use_error_mask=True,
    )
    state = env_lib.init_state(scene8, cfg, jax.random.PRNGKey(0))
    policy, params = _policy_setup(scene8, cfg)
    opt = optax.adam(1e-3)
    mesh = make_mesh(8)
    weights = jnp.array([1.0, 0.0, 1.0, 1.0])

    # unroll=1 pins the TPU-shaped program (a real scan, so the
    # outside-every-loop property is non-trivial); the CPU-mesh auto
    # default would unroll the loop away.
    step = make_sharded_train_step(
        policy, scene8, cfg, opt, mesh, k=2, T=3, deterministic=True,
        impl="shard_map", unroll=1,
    )
    s_state = shard_env_state(mesh, state)
    compiled = step.lower(
        params, opt.init(params), s_state, jax.random.PRNGKey(5), weights
    ).compile()
    placed = annotate_loop_placement(compiled.as_text())

    allreduces = [(c, il) for c, il in placed if c.op == "all-reduce"]
    others = [(c, il) for c, il in placed
              if c.op not in ("all-reduce", "all-gather")]
    gathers = [(c, il) for c, il in placed if c.op == "all-gather"]

    assert len(allreduces) == 1, (
        f"expected exactly 1 all-reduce, got "
        f"{[(c.op, c.result_shape) for c, _ in allreduces]}"
    )
    ar, in_loop = allreduces[0]
    assert not in_loop, "gradient all-reduce slipped inside a loop body"
    param_bytes = sum(
        x.size * x.dtype.itemsize for x in jax.tree.leaves(params)
    )
    # grads tree + loss + 4 metric scalars, fused into one op
    assert param_bytes <= ar.bytes <= param_bytes + 64, (
        f"all-reduce payload {ar.bytes} vs params {param_bytes}"
    )
    assert ar.group_size == 8
    # worst-k% quantile gathers: [B]-float only (tiny, allowed in-loop)
    for c, _ in gathers:
        assert c.bytes <= 4 * cfg.batch_size, (
            f"unexpectedly large all-gather {c.result_shape}"
        )
    assert not others, (
        f"unexpected collectives: {[(c.op, c.result_shape) for c, _ in others]}"
    )


def test_collective_budget_gspmd_allreduce_only(scene8):
    """The GSPMD impl may fuse/place differently, but it must still emit
    only all-reduces (plus quantile all-gathers) — never permutes or
    all-to-alls — and no more than a handful."""
    from doodle_tpu.parallel.audit import parse_collectives

    cfg = env_lib.EnvConfig(
        resolution=16, batch_size=8, sigma_scale=0.1, error_scale_mrad=30.0,
    )
    state = env_lib.init_state(scene8, cfg, jax.random.PRNGKey(0))
    policy, params = _policy_setup(scene8, cfg)
    opt = optax.adam(1e-3)
    mesh = make_mesh(8)
    step = make_sharded_train_step(
        policy, scene8, cfg, opt, mesh, k=2, T=2, deterministic=True,
        impl="gspmd",
    )
    s_state = shard_env_state(mesh, state)
    compiled = step.lower(
        params, opt.init(params), s_state, jax.random.PRNGKey(5),
        jnp.array([1.0, 0.0, 0.0, 0.0]),
    ).compile()
    colls = parse_collectives(compiled.as_text())
    assert all(c.op == "all-reduce" for c in colls), (
        [(c.op, c.result_shape) for c in colls]
    )
    assert len(colls) <= 4


def test_sharded_transformer_large_field():
    """BASELINE config 5 shape: transformer-head policy, large heliostat
    count, env batch sharded over all 8 devices (scaled down for CI)."""
    N, RES, B = 64, 32, 8
    pos = np.stack([
        np.linspace(-50, 50, N), np.full(N, 80.0), np.zeros(N)
    ], axis=1)
    scene = make_scene(pos, [0.0, -5.0, 0.0], [0.0, 1.0, 0.0])
    cfg = env_lib.EnvConfig(
        resolution=RES, batch_size=B, sigma_scale=0.01, error_scale_mrad=90.0
    )
    state = env_lib.init_state(scene, cfg, jax.random.PRNGKey(0))
    policy = PolicyNet(
        num_heliostats=N, enc_dim=32, architecture="transformer",
        transformer_layers=1, transformer_heads=4, transformer_ff=64,
        dropout=0.0,
    )
    img = jnp.zeros((B, 2, RES, RES))
    aux = jnp.zeros((B, 3 + N * 3))
    params = policy.init(jax.random.PRNGKey(1), img, aux, policy.init_carry(B))
    opt = optax.adam(1e-3)
    mesh = make_mesh(8)
    step = make_sharded_train_step(
        policy, scene, cfg, opt, mesh, k=2, T=2, deterministic=True
    )
    s_state = shard_env_state(mesh, state)
    p, o, st, loss, parts = step(
        params, opt.init(params), s_state, jax.random.PRNGKey(2),
        jnp.array([1.0, 0.0, 0.0, 0.0]),
    )
    assert np.isfinite(float(loss))
    moved = any(
        float(jnp.abs(a - b).max()) > 0
        for a, b in zip(jax.tree.leaves(p), jax.tree.leaves(params))
    )
    assert moved


def test_make_multislice_mesh_layout():
    """Slice-major batch ordering; helio shards confined to one slice;
    single-slice case reduces exactly to make_mesh."""
    from doodle_tpu.parallel import make_multislice_mesh

    devs = jax.devices()
    m = make_multislice_mesh(n_slices=2)
    assert m.shape[BATCH_AXIS] == 8 and m.shape[HELIO_AXIS] == 1
    # Batch axis is slice-major: first 4 rows are slice 0's devices.
    flat = list(m.devices.reshape(-1))
    assert flat[:4] == devs[:4] and flat[4:] == devs[4:]

    m2 = make_multislice_mesh(helio_parallel=2, n_slices=2)
    assert m2.shape[BATCH_AXIS] == 4 and m2.shape[HELIO_AXIS] == 2
    # Each helio row stays within one slice (its psum never crosses DCN).
    for row in range(4):
        ids = {devs.index(d) // 4 for d in m2.devices[row]}
        assert len(ids) == 1, f"helio row {row} spans slices {ids}"

    # One slice == make_mesh device order.
    m1 = make_multislice_mesh(n_slices=1)
    assert list(m1.devices.reshape(-1)) == list(
        make_mesh(8).devices.reshape(-1)
    )

    with pytest.raises(ValueError, match="not divisible into"):
        make_multislice_mesh(n_slices=3)
    with pytest.raises(ValueError, match="helio_parallel"):
        make_multislice_mesh(helio_parallel=8, n_slices=2)


def test_multislice_mesh_runs_shard_map_step(scene8):
    """The shard_map train step compiles and runs on a multislice-ordered
    mesh and matches the contiguous-mesh result (same math, only the
    device→shard assignment differs)."""
    from doodle_tpu.parallel import make_multislice_mesh

    cfg = env_lib.EnvConfig(
        resolution=16, batch_size=8, sigma_scale=0.01, error_scale_mrad=30.0,
        new_errors_every_reset=False, field_init_noise=0.0,
    )
    state = env_lib.init_state(scene8, cfg, jax.random.PRNGKey(0))
    policy, params = _policy_setup(scene8, cfg)
    opt = optax.adam(1e-3)
    weights = jnp.array([1.0, 0.0, 1.0, 1.0])
    key = jax.random.PRNGKey(5)

    results = []
    for mesh in (make_multislice_mesh(n_slices=2), make_mesh(8)):
        step = make_sharded_train_step(
            policy, scene8, cfg, opt, mesh, k=2, T=2, deterministic=True,
            impl="shard_map",
        )
        p, o, st, loss, parts = step(
            params, opt.init(params), shard_env_state(mesh, state), key,
            weights,
        )
        results.append((p, float(loss)))
    (p_ms, loss_ms), (p_ref, loss_ref) = results
    np.testing.assert_allclose(loss_ms, loss_ref, rtol=1e-6)
    for a, b in zip(jax.tree.leaves(p_ms), jax.tree.leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
