"""Angular action-space variant (ref ``newenv/test_environment_angular.py``):
[B, N*2] East/Up rotations on north-pointing dummies."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from doodle_tpu.core.scene import make_scene
from doodle_tpu.env import env as env_lib
from doodle_tpu.ops.optics import rotate_mrad_eu


@pytest.fixture(scope="module")
def setup():
    pos = np.stack(
        [np.linspace(-10, 10, 5), np.full(5, 80.0), np.zeros(5)], axis=1
    )
    scene = make_scene(pos, [0.0, -5.0, 0.0], [0.0, 1.0, 0.0])
    cfg = env_lib.EnvConfig(
        resolution=16, batch_size=3, sigma_scale=0.1, error_scale_mrad=30.0,
        action_space="angles",
    )
    state = env_lib.init_state(scene, cfg, jax.random.PRNGKey(0))
    return scene, cfg, state


def test_angular_step_shapes_and_finiteness(setup):
    scene, cfg, state = setup
    action = jnp.zeros((3, 5 * 2))
    obs, metrics, monitor = env_lib.step(scene, cfg, state, action)
    assert obs["img"].shape == (3, 16, 16)
    for v in metrics.values():
        assert np.isfinite(float(v))
    # zero angles → north normals
    np.testing.assert_allclose(
        np.asarray(monitor["normals"]),
        np.broadcast_to([0.0, 1.0, 0.0], (3, 5, 3)),
        atol=1e-6,
    )


def test_angular_matches_manual_rotation(setup):
    scene, cfg, state = setup
    angles = jax.random.normal(jax.random.PRNGKey(1), (3, 5, 2)) * 100.0
    _, _, mon = env_lib.step(scene, cfg, state, angles.reshape(3, -1))
    north = jnp.zeros((3, 5, 3)).at[..., 1].set(1.0)
    expected = rotate_mrad_eu(north, angles)
    np.testing.assert_allclose(
        np.asarray(mon["normals"]), np.asarray(expected), atol=1e-6
    )


def test_angular_differentiable(setup):
    scene, cfg, state = setup

    def loss(a):
        _, m, _ = env_lib.step(scene, cfg, state, a)
        return m["alignment_loss"]

    g = jax.grad(loss)(jnp.zeros((3, 10)))
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_angular_gym_space(setup):
    scene, cfg, _ = setup
    env = env_lib.HelioEnv(scene, cfg, jax.random.PRNGKey(0))
    assert env.action_space.shape == (10,)


def test_spillage_monitor(setup):
    from doodle_tpu.env.losses import spillage
    import jax.numpy as jnp

    scene, cfg, state = setup
    import dataclasses
    ncfg = dataclasses.replace(cfg, action_space="normals")
    # ideal normals → no spillage; badly tilted normals → spillage
    obs, m, mon = env_lib.step(scene, ncfg, state,
                               state.ideal_normals.reshape(3, -1))
    assert "spillage_count" in mon and "spillage_mask" in mon
    tilted = jnp.zeros((3, 5, 3)).at[..., 2].set(1.0)  # straight up
    _, _, mon2 = env_lib.step(scene, ncfg, state, tilted.reshape(3, -1))
    assert int(mon2["spillage_count"]) > int(mon["spillage_count"])
    # direct function: point inside vs outside the box
    inside = jnp.array([[0.0, -5.0, 0.0]])
    outside = jnp.array([[100.0, -5.0, 0.0]])
    mask, cnt = spillage(jnp.stack([inside, outside], 0),
                         scene.target_pos, scene.plane_u, scene.plane_v,
                         15.0, 15.0)
    assert not bool(mask[0, 0]) and bool(mask[1, 0]) and int(cnt) == 1
