"""Serving path: checkpoint → InferenceSession → closed-loop control, and
HPO end-to-end through the trainer."""

import jax
import jax.numpy as jnp
import numpy as np

from doodle_tpu.core.scene import make_scene
from doodle_tpu.env import env as env_lib
from doodle_tpu.serve import InferenceSession
from doodle_tpu.train import TrainConfig, train_and_eval


def _tiny_cfg(tmp_path, **kw):
    base = dict(
        num_heliostats=4, batch_size=3, steps=2, T=2, k=2, resolution=16,
        sigma_scale=0.1, error_scale_mrad=30.0,
        alignment_pretrain_steps=1, warmup_steps=0,
        lr=1e-3, grad_clip=1.0, scheduler="none", eval_every=2,
        log_every=100, test_size=3, dropout=0.0,
        checkpoint_dir=str(tmp_path / "ck"), checkpoint_every=2,
    )
    base.update(kw)
    return TrainConfig(**base)


def test_inference_session_roundtrip(tmp_path):
    cfg = _tiny_cfg(tmp_path)
    train_and_eval(cfg)

    session = InferenceSession.from_checkpoint(
        str(tmp_path / "ck"), num_heliostats=4, batch_size=3,
        policy_kwargs=dict(architecture="lstm", dropout=0.0),
    )
    carry = session.init_carry()
    img_hist = jnp.zeros((3, 2, 16, 16))
    aux = jnp.zeros((3, 3 + 12))
    normals, carry2 = session.control(img_hist, aux, carry)
    assert normals.shape == (3, 4, 3)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(normals), axis=-1), 1.0, atol=1e-5
    )
    # carry threads: second call with updated carry changes output
    normals2, _ = session.control(img_hist, aux, carry2)
    assert not np.allclose(np.asarray(normals), np.asarray(normals2))


def test_session_drives_env_closed_loop(tmp_path):
    cfg = _tiny_cfg(tmp_path)
    train_and_eval(cfg)
    session = InferenceSession.from_checkpoint(
        str(tmp_path / "ck"), num_heliostats=4, batch_size=3,
        policy_kwargs=dict(architecture="lstm", dropout=0.0),
    )
    pos = np.stack([np.linspace(-8, 8, 4), np.full(4, 80.0), np.zeros(4)], 1)
    scene = make_scene(pos, [0.0, -5.0, 0.0], [0.0, 1.0, 0.0])
    ecfg = env_lib.EnvConfig(resolution=16, batch_size=3, sigma_scale=0.1,
                             error_scale_mrad=30.0)
    env = env_lib.HelioEnv(scene, ecfg, jax.random.PRNGKey(0))
    obs = env.reset()
    carry = session.init_carry()
    hist = jnp.zeros((3, 2, 16, 16)).at[:, -1].set(obs["img"])
    for _ in range(3):
        normals, carry = session.control(hist, obs["aux"], carry)
        obs, metrics, _ = env.step(normals.reshape(3, -1))
        hist = jnp.roll(hist, -1, axis=1).at[:, -1].set(obs["img"])
        assert np.isfinite(float(metrics["mse"]))


def test_control_stream_matches_control(tmp_path):
    """The streaming (encode-once) control path must produce the same
    actions as the reference-shaped full-history path fed the equivalent
    frame window."""
    cfg = _tiny_cfg(tmp_path)
    train_and_eval(cfg)
    session = InferenceSession.from_checkpoint(
        str(tmp_path / "ck"), num_heliostats=4, batch_size=3,
        policy_kwargs=dict(architecture="lstm", dropout=0.0),
    )
    key = jax.random.PRNGKey(3)
    frames = jax.random.uniform(key, (4, 3, 16, 16))   # 4 incoming frames

    carry = session.init_carry()
    stream = session.init_stream(k=2, resolution=16)
    hist = jnp.zeros((3, 2, 16, 16))
    for t in range(4):
        hist = jnp.roll(hist, -1, axis=1).at[:, -1].set(frames[t])
        aux = jnp.full((3, 3 + 12), 0.1 * t)
        a_full, carry = session.control(hist, aux, carry)
        a_stream, stream = session.control_stream(frames[t], aux, stream)
        np.testing.assert_allclose(
            np.asarray(a_full), np.asarray(a_stream), rtol=1e-5, atol=1e-6
        )


def test_hpo_end_to_end_through_trainer(tmp_path):
    """random_search driving real (tiny) train_and_eval runs."""
    from doodle_tpu.hpo import random_search

    def objective(params):
        cfg = _tiny_cfg(tmp_path / f"lr_{params['lr']:.0e}",
                        lr=params["lr"], checkpoint_dir=None)
        return train_and_eval(cfg)

    best, val, trials = random_search(
        objective, {"lr": {"low": 1e-4, "high": 1e-2, "log": True}},
        n_trials=2, seed=0,
    )
    assert best is not None and np.isfinite(val)
    assert len([t for t in trials if t["state"] == "complete"]) == 2
