"""Elastic restore across DEVICE WIDTHS — the actual pod-resize event
(VERDICT r3 item 6): save on a 4-device mesh, restore and continue on a
2-device and an 8-device mesh (different per-device batch), and assert the
training trajectory continues exactly.

Uses the GSPMD step: it is the width-invariant program (one global PRNG
stream — ``parallel/train.py`` module docstring), so the continuation loss
is directly comparable across mesh widths. The shard_map step folds the
device index into the key, giving per-shard independent streams whose
draws legitimately differ across widths — restore *fidelity* still holds
there (same params), but per-draw trajectory equality is a GSPMD property.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from doodle_tpu.core.scene import make_scene
from doodle_tpu.env import env as env_lib
from doodle_tpu.models.policy import PolicyNet
from doodle_tpu.parallel import (
    make_mesh,
    make_sharded_train_step,
    shard_env_state,
)
from doodle_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint


def _setup():
    pos = np.stack(
        [np.linspace(-20, 20, 8), np.full(8, 80.0), np.zeros(8)], axis=1
    )
    scene = make_scene(pos, [0.0, -5.0, 0.0], [0.0, 1.0, 0.0])
    cfg = env_lib.EnvConfig(
        resolution=16, batch_size=8, sigma_scale=0.01, error_scale_mrad=30.0,
        new_errors_every_reset=False, field_init_noise=0.0,
    )
    state = env_lib.init_state(scene, cfg, jax.random.PRNGKey(0))
    policy = PolicyNet(num_heliostats=8, enc_dim=16, lstm_hid=16,
                       architecture="lstm", dropout=0.0)
    img = jnp.zeros((8, 2, 16, 16))
    aux = jnp.zeros((8, 3 + 24))
    params = policy.init(jax.random.PRNGKey(1), img, aux,
                         policy.init_carry(8))
    opt = optax.adam(1e-3)
    return scene, cfg, state, policy, params, opt


@pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual mesh"
)
def test_elastic_restore_across_device_widths(tmp_path):
    scene, cfg, state, policy, params, opt = _setup()
    opt_state = opt.init(params)
    weights = jnp.array([1.0, 0.0, 1.0, 1.0])
    key = jax.random.PRNGKey(5)

    def make_step(mesh):
        return make_sharded_train_step(
            policy, scene, cfg, opt, mesh, k=2, T=2, deterministic=True,
            impl="gspmd",
        )

    # ---- train 2 steps on the 4-device mesh, then save
    mesh4 = make_mesh(4)
    step4 = make_step(mesh4)
    s_state = shard_env_state(mesh4, state)
    for _ in range(2):
        params, opt_state, s_state, loss, _ = step4(
            params, opt_state, s_state, key, weights
        )
    path = os.path.join(str(tmp_path), "width_ckpt")
    save_checkpoint(path, {"params": params, "opt_state": opt_state,
                           "env_state": s_state})
    saved_leaves = [np.asarray(x) for x in jax.tree.leaves(params)]

    # ---- the reference continuation: THREE more steps at width 4
    # (a multi-step continuation exercises the restored opt_state moments,
    # not just the params — a single step can mask a stale-moment restore).
    losses_ref = []
    p_ref, os_ref, st_ref = params, opt_state, s_state
    for i in range(3):
        k_i = jax.random.fold_in(key, i)
        p_ref, os_ref, st_ref, loss_ref, _ = step4(
            p_ref, os_ref, st_ref, k_i, weights
        )
        losses_ref.append(float(loss_ref))
    assert np.all(np.isfinite(losses_ref))

    # ---- restore + continue at widths 2 and 8 (batch resharded 4→2→8)
    fresh_params = policy.init(
        jax.random.PRNGKey(1),
        jnp.zeros((8, 2, 16, 16)), jnp.zeros((8, 27)), policy.init_carry(8),
    )
    for n in (2, 8):
        mesh_n = make_mesh(n)
        repl = NamedSharding(mesh_n, P())
        template = {
            "params": jax.device_put(fresh_params, repl),
            "opt_state": jax.device_put(opt.init(fresh_params), repl),
            # env state template carries the width-n batch sharding, so the
            # data state (sun positions, errors, PRNG chain) reshards too.
            "env_state": shard_env_state(mesh_n, state),
        }
        ck = restore_checkpoint(path, target=template)
        # Restore fidelity: every leaf bit-comparable (abs-sum is
        # permutation- and compensating-error-blind).
        got_leaves = [np.asarray(x) for x in jax.tree.leaves(ck["params"])]
        assert len(got_leaves) == len(saved_leaves)
        for got, want in zip(got_leaves, saved_leaves):
            np.testing.assert_allclose(got, want, rtol=0, atol=0)

        step_n = make_step(mesh_n)
        p_n, os_n, st_n = ck["params"], ck["opt_state"], ck["env_state"]
        for i in range(3):
            k_i = jax.random.fold_in(key, i)
            p_n, os_n, st_n, loss_n, _ = step_n(p_n, os_n, st_n, k_i, weights)
            np.testing.assert_allclose(
                float(loss_n), losses_ref[i], rtol=1e-5,
                err_msg=(
                    f"width-{n} continuation diverged from width-4 "
                    f"at step {i}"
                ),
            )


@pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual mesh"
)
def test_shard_map_restore_fidelity_across_widths(tmp_path):
    """The shard_map step's per-shard PRNG streams make per-draw
    trajectories width-dependent by design (module docstring) — but
    restore FIDELITY (the same params coming back at any width) is
    width-independent and asserted here per-leaf."""
    from doodle_tpu.parallel import make_sharded_train_step as make_step_impl

    scene, cfg, state, policy, params, opt = _setup()
    opt_state = opt.init(params)
    weights = jnp.array([1.0, 0.0, 1.0, 1.0])
    key = jax.random.PRNGKey(5)

    mesh4 = make_mesh(4)
    step4 = make_step_impl(policy, scene, cfg, opt, mesh4, k=2, T=2,
                           deterministic=True, impl="shard_map")
    s_state = shard_env_state(mesh4, state)
    for _ in range(2):
        params, opt_state, s_state, loss, _ = step4(
            params, opt_state, s_state, key, weights
        )
    assert np.isfinite(float(loss))
    path = os.path.join(str(tmp_path), "sm_width_ckpt")
    save_checkpoint(path, {"params": params, "opt_state": opt_state,
                           "env_state": s_state})
    saved_leaves = [np.asarray(x) for x in jax.tree.leaves(params)]

    fresh_params = policy.init(
        jax.random.PRNGKey(1),
        jnp.zeros((8, 2, 16, 16)), jnp.zeros((8, 27)), policy.init_carry(8),
    )
    for n in (2, 8):
        mesh_n = make_mesh(n)
        repl = NamedSharding(mesh_n, P())
        template = {
            "params": jax.device_put(fresh_params, repl),
            "opt_state": jax.device_put(opt.init(fresh_params), repl),
            "env_state": shard_env_state(mesh_n, state),
        }
        ck = restore_checkpoint(path, target=template)
        got_leaves = [np.asarray(x) for x in jax.tree.leaves(ck["params"])]
        assert len(got_leaves) == len(saved_leaves)
        for got, want in zip(got_leaves, saved_leaves):
            np.testing.assert_allclose(got, want, rtol=0, atol=0)
        # The restored state must still TRAIN at the new width (finite
        # loss); exact trajectory equality is the GSPMD test's property.
        step_n = make_step_impl(policy, scene, cfg, opt, mesh_n, k=2, T=2,
                                deterministic=True, impl="shard_map")
        _, _, _, loss_n, _ = step_n(
            ck["params"], ck["opt_state"], ck["env_state"], key, weights
        )
        assert np.isfinite(float(loss_n))
