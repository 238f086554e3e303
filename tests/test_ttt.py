"""TTT rollout/trainer tests: truncation semantics, residual actions,
test-time compute, advantage alignment value, curriculum, and a tiny
end-to-end run."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from doodle_tpu.core.scene import make_scene
from doodle_tpu.env import env as env_lib
from doodle_tpu.models.policy import PolicyNet
from doodle_tpu.train.ttt import (
    TTTConfig,
    _curriculum_angles,
    ttt_rollout,
    ttt_train_and_eval,
)


@pytest.fixture(scope="module")
def tiny():
    pos = np.stack(
        [np.linspace(-10, 10, 5), np.full(5, 80.0), np.zeros(5)], axis=1
    )
    scene = make_scene(pos, [0.0, -5.0, 0.0], [0.0, 1.0, 0.0])
    cfg = env_lib.EnvConfig(
        resolution=16, batch_size=3, sigma_scale=0.1, error_scale_mrad=30.0
    )
    state = env_lib.init_state(scene, cfg, jax.random.PRNGKey(0))
    policy = PolicyNet(
        num_heliostats=5, enc_dim=16, lstm_hid=16, architecture="lstm",
        dropout=0.0, normalize_output=False,
    )
    img = jnp.zeros((3, 2, 16, 16))
    aux = jnp.zeros((3, 3 + 15))
    params = policy.init(jax.random.PRNGKey(1), img, aux, policy.init_carry(3))
    return scene, cfg, state, policy, params


def test_ttt_rollout_no_trunc_matches_last_step(tiny):
    scene, cfg, state, policy, params = tiny
    res = ttt_rollout(policy, params, scene, cfg, state, jax.random.PRNGKey(2),
                      k=2, T=3)
    assert res.mse_over_t.shape == (3,)
    np.testing.assert_allclose(
        float(res.losses["mse"]), float(res.mse_over_t[-1]), rtol=1e-6
    )
    assert res.fine_vec is None


def test_ttt_rollout_truncated_losses(tiny):
    scene, cfg, state, policy, params = tiny
    res = ttt_rollout(policy, params, scene, cfg, state, jax.random.PRNGKey(2),
                      k=2, T=4, truncate_every=2)
    # mse overwritten at boundaries → equals final-step mse
    np.testing.assert_allclose(
        float(res.losses["mse"]), float(res.mse_over_t[-1]), rtol=1e-6
    )
    for name in ("dist", "bound", "alignment_loss"):
        assert np.isfinite(float(res.losses[name]))


def test_ttt_advantage_alignment_value(tiny):
    """−Σ_t(−align_t − (−align_{t−1}).detach) telescopes to align_{T−1} when
    the per-step values are reconstructed from a parallel plain rollout."""
    scene, cfg, state, policy, params = tiny
    key = jax.random.PRNGKey(7)
    res = ttt_rollout(policy, params, scene, cfg, state, key,
                      k=2, T=3, truncate_every=3)
    # Telescoping with prev_reward_0 = 0:
    # A = Σ(−a_t − (−a_{t−1})) = −a_{T−1}  ⇒ final alignment = a_{T−1}.
    # Recompute per-step alignments by replaying with the same key.
    replay = ttt_rollout(policy, params, scene, cfg, state, key,
                         k=2, T=3, truncate_every=None)
    np.testing.assert_allclose(
        float(res.losses["alignment_loss"]),
        float(replay.losses["alignment_loss"]),
        rtol=1e-4,
    )


def test_ttt_gradients_flow(tiny):
    scene, cfg, state, policy, params = tiny

    def loss_fn(p):
        res = ttt_rollout(policy, p, scene, cfg, state, jax.random.PRNGKey(3),
                          k=2, T=4, truncate_every=2)
        return res.losses["alignment_loss"]

    g = jax.grad(loss_fn)(params)
    total = sum(float(jnp.abs(l).sum()) for l in jax.tree.leaves(g))
    assert np.isfinite(total) and total > 0


def test_ttt_fine_adjustment_reduces_dist(tiny):
    """TTC inner loop must lower the dist loss vs. the same rollout without."""
    scene, cfg, state, policy, params = tiny
    key = jax.random.PRNGKey(4)
    base = ttt_rollout(policy, params, scene, cfg, state, key, k=2, T=3,
                       test_time=True)
    fine = ttt_rollout(policy, params, scene, cfg, state, key, k=2, T=3,
                       enable_fine=True, fine_from_t0=True,
                       fine_steps_per_t=25, fine_lr=3e-3, test_time=True)
    assert fine.fine_vec is not None
    assert float(fine.losses["dist"]) < float(base.losses["dist"])


def test_ttt_fine_objective_blend(tiny):
    """fine_mse_w/fine_dist_w steer the TTC inner objective: pure-mse
    weights must lower final MSE vs the dist-only reference default, and
    the (0,1) default reproduces the unweighted dist-only fine loss
    exactly (also pinned by the torch TTC golden)."""
    scene, cfg, state, policy, params = tiny
    key = jax.random.PRNGKey(4)
    kw = dict(k=2, T=3, enable_fine=True, fine_from_t0=True,
              fine_steps_per_t=25, fine_lr=3e-3, test_time=True)
    ref = ttt_rollout(policy, params, scene, cfg, state, key, **kw)
    default = ttt_rollout(policy, params, scene, cfg, state, key, **kw,
                          fine_mse_w=0.0, fine_dist_w=1.0)
    np.testing.assert_array_equal(
        np.asarray(ref.fine_vec), np.asarray(default.fine_vec)
    )
    # Traced weights work too (one compile serves a whole weight sweep).
    mse_only = ttt_rollout(
        policy, params, scene, cfg, state, key, **kw,
        fine_mse_w=jnp.float32(1.0), fine_dist_w=jnp.float32(0.0),
    )
    assert float(mse_only.losses["mse"]) < float(ref.losses["mse"])


def test_ttc_delivery_recipe_pinned():
    """The shipped TTC production recipe is exactly the r4 sweep winner
    (results/ttc_gap_sweep.json best-of-54; validated multi-seed in
    results/ttc_multiseed.json), reachable from the CLI."""
    from doodle_tpu.train.ttt import (
        TTC_DELIVERY_RECIPE,
        apply_ttc_delivery_recipe,
    )

    assert TTC_DELIVERY_RECIPE == dict(
        fine_steps_per_t=60, extra_steps=8, fine_lr=1e-3,
        fine_mse_w=1.0, fine_dist_w=0.0, fine_enabled="test",
    )
    cfg = apply_ttc_delivery_recipe(TTTConfig())
    assert cfg.fine_steps_per_t == 60 and cfg.extra_steps == 8
    assert cfg.fine_lr == 1e-3
    assert cfg.fine_mse_w == 1.0 and cfg.fine_dist_w == 0.0
    # Reference defaults stay the parity surface (recipe is opt-in).
    d = TTTConfig()
    assert d.fine_steps_per_t == 10 and d.fine_lr == 1e-4
    assert d.fine_mse_w == 0.0 and d.fine_dist_w == 1.0
    from doodle_tpu.cli.train_ttt import build_parser

    args = build_parser().parse_args(["--ttc_recipe", "delivery"])
    assert args.ttc_recipe == "delivery"


def test_ttt_fine_opt_knobs(tiny):
    """fine_weight_decay / fine_grad_clip (reference TTC kwargs, ttt ref
    :184-185,284,309-310): the defaults (0.0/None) are exactly plain Adam,
    a non-binding clip is a no-op, a binding clip freezes the fine vector
    near its init, and weight decay changes the trajectory."""
    scene, cfg, state, policy, params = tiny
    key = jax.random.PRNGKey(4)
    kw = dict(k=2, T=3, enable_fine=True, fine_from_t0=True,
              fine_steps_per_t=10, fine_lr=3e-3, test_time=True)
    ref = ttt_rollout(policy, params, scene, cfg, state, key, **kw)
    explicit_defaults = ttt_rollout(
        policy, params, scene, cfg, state, key, **kw,
        fine_weight_decay=0.0, fine_grad_clip=None,
    )
    np.testing.assert_array_equal(
        np.asarray(ref.fine_vec), np.asarray(explicit_defaults.fine_vec)
    )
    # A clip far above the actual gradient norm never triggers → identical.
    loose_clip = ttt_rollout(policy, params, scene, cfg, state, key, **kw,
                             fine_grad_clip=1e9)
    np.testing.assert_allclose(
        np.asarray(ref.fine_vec), np.asarray(loose_clip.fine_vec),
        rtol=1e-6, atol=1e-8,
    )
    # A near-zero clip freezes the inner optimization: the fine vector
    # stays within the init range instead of moving O(fine_lr·steps).
    tight_clip = ttt_rollout(policy, params, scene, cfg, state, key, **kw,
                             fine_grad_clip=1e-12)
    assert float(jnp.abs(tight_clip.fine_vec).max()) < 2e-4  # ≈ init eps
    assert float(jnp.abs(ref.fine_vec).max()) > 1e-3
    # Weight decay perturbs the trajectory (torch-Adam L2 on the raw grad).
    wd = ttt_rollout(policy, params, scene, cfg, state, key, **kw,
                     fine_weight_decay=10.0)
    assert not np.allclose(np.asarray(ref.fine_vec), np.asarray(wd.fine_vec))
    # Config + CLI surface carry the knobs (reference API parity).
    from doodle_tpu.cli.train_ttt import build_parser

    args = build_parser().parse_args(
        ["--fine_weight_decay", "0.1", "--fine_grad_clip", "0.5"]
    )
    assert args.fine_weight_decay == 0.1 and args.fine_grad_clip == 0.5
    assert build_parser().parse_args(
        ["--fine_grad_clip", "none"]).fine_grad_clip is None
    c = TTTConfig(fine_weight_decay=0.1, fine_grad_clip=0.5)
    assert c.fine_weight_decay == 0.1 and c.fine_grad_clip == 0.5


def test_ttt_test_time_blocks_policy_gradients(tiny):
    scene, cfg, state, policy, params = tiny

    def loss_fn(p):
        res = ttt_rollout(policy, p, scene, cfg, state, jax.random.PRNGKey(5),
                          k=2, T=2, test_time=True)
        return res.losses["mse"]

    g = jax.grad(loss_fn)(params)
    total = sum(float(jnp.abs(l).sum()) for l in jax.tree.leaves(g))
    assert total == 0.0


def test_curriculum_angles():
    cfg = TTTConfig(num_batches=4, azimuth=45.0, elevation=45.0)
    angles, extrap, interp = _curriculum_angles(cfg)
    assert len(angles) == 4
    assert angles[0] == (45.0, 45.0 + 18.0 - 18.0)
    assert angles[1][0] == 49.0
    # triangle wave: elevation rises then falls around +18
    els = [e for _, e in angles]
    assert els[1] > els[0]
    assert extrap == (45.0 - 6.0, 45.0 - 2.0)
    # interpolation averages envs i >= discard_first
    assert interp[0] == pytest.approx(np.mean([angles[2][0], angles[3][0]]))


def test_ttt_geometry_distance_knob():
    """make_ttt_geometry places the field in [√d, √d+1)² at z=0
    (ref ttt :371) — the run_experiments.py:91 sweep knob."""
    from doodle_tpu.train.trainer import make_ttt_geometry

    key = jax.random.PRNGKey(0)
    for d in (15.0, 150.0, 1500.0):
        scene = make_ttt_geometry(7, d, key)
        pos = np.asarray(scene.heliostat_pos)
        root = np.sqrt(d)
        assert pos.shape == (7, 3)
        assert (pos[:, :2] >= root).all() and (pos[:, :2] < root + 1.0).all()
        assert (pos[:, 2] == 0.0).all()


def test_ttt_train_and_eval_dumps(tiny, tmp_path):
    scene, *_ = tiny
    cfg = TTTConfig(
        num_heliostats=5, batch_size=3, num_batches=2, steps=2, T=2, k=2,
        resolution=16, sigma_scale=0.1, error_scale_mrad=30.0,
        alignment_pretrain_steps=0, warmup_steps=0,
        lr=1e-3, grad_clip=1.0, scheduler="none", eval_every=2,
        log_every=100, test_size=3, dropout=0.0,
        truncate_every=None, fine_enabled="none",
        dump_dir=str(tmp_path / "dumps"), dump_max_imgs=2,
    )
    ttt_train_and_eval(cfg, scene=scene)
    step0 = tmp_path / "dumps" / "step_0"
    assert (step0 / "idx_0" / "t_0.png").exists()
    assert (step0 / "idx_1" / "t_1.png").exists()
    assert (step0 / "alignment_errors.npy").exists()


def test_ttt_train_and_eval_tiny(tiny):
    scene, *_ = tiny
    cfg = TTTConfig(
        num_heliostats=5, batch_size=3, num_batches=3, steps=4, T=2, k=2,
        resolution=16, sigma_scale=0.1, error_scale_mrad=30.0,
        alignment_pretrain_steps=2, warmup_steps=1,
        lr=1e-3, grad_clip=1.0, scheduler="none", eval_every=2,
        log_every=100, test_size=3, dropout=0.0,
        truncate_every=2, fine_enabled="none", extra_steps=1,
    )
    best = ttt_train_and_eval(cfg, scene=scene)
    assert best is not None and np.isfinite(best)


def test_ttt_checkpoint_resume(tiny, tmp_path):
    scene, *_ = tiny
    base = dict(
        num_heliostats=5, batch_size=3, num_batches=2, steps=2, T=2, k=2,
        resolution=16, sigma_scale=0.1, error_scale_mrad=30.0,
        alignment_pretrain_steps=0, warmup_steps=0,
        lr=1e-3, grad_clip=1.0, scheduler="none", eval_every=2,
        log_every=100, test_size=3, dropout=0.0,
        truncate_every=None, fine_enabled="none",
        checkpoint_dir=str(tmp_path / "ck"), checkpoint_every=2,
    )
    seen = []
    ttt_train_and_eval(TTTConfig(**base),
                       progress_cb=lambda i, m: seen.append(i))
    assert seen == [0, 1]
    resumed = []
    ttt_train_and_eval(TTTConfig(**{**base, "steps": 4}),
                       progress_cb=lambda i, m: resumed.append(i))
    assert resumed[0] == 2 and resumed[-1] == 3


def test_ttt_profile_trace(tmp_path):
    """TTTConfig inherits profile_dir/profile_steps; the TTT loop captures a
    jax.profiler trace of steady-state steps like the standard trainer."""
    from doodle_tpu.train.ttt import TTTConfig, ttt_train_and_eval

    prof = tmp_path / "prof"
    cfg = TTTConfig(
        num_heliostats=4, batch_size=2, num_batches=1, steps=6, T=2, k=2,
        resolution=16, sigma_scale=0.1, error_scale_mrad=30.0,
        alignment_pretrain_steps=0, warmup_steps=0,
        lr=1e-3, grad_clip=1.0, scheduler="none", eval_every=100,
        log_every=100, dropout=0.0, truncate_every=2,
        fine_steps_per_t=0, fine_enabled="none",
        profile_dir=str(prof), profile_steps=2,
    )
    ttt_train_and_eval(cfg)
    assert any(p.is_file() for p in prof.rglob("*")), "no trace written"


def test_ttt_residual_head_maps_to_zero_init(tiny):
    """In the TTT trainer --residual_head means zero_init_head: the delta
    layer starts at zero (the rollout's own residual accumulation supplies
    the base), so the first action is exactly the env's init_actions."""
    policy = PolicyNet(
        num_heliostats=5, enc_dim=16, lstm_hid=16, architecture="lstm",
        dropout=0.0, normalize_output=False, zero_init_head=True,
    )
    img = jax.random.uniform(jax.random.PRNGKey(3), (3, 2, 16, 16))
    aux = jax.random.normal(jax.random.PRNGKey(4), (3, 3 + 15))
    params = policy.init(jax.random.PRNGKey(1), img, aux,
                         policy.init_carry(3))
    delta, _ = policy.apply(params, img, aux, policy.init_carry(3))
    np.testing.assert_array_equal(np.asarray(delta), 0.0)

    # With init_base="ideal" the first rollout action is exactly the ideal
    # normals (zero delta + ideal base, renormalized = ideal).
    pos = np.stack(
        [np.linspace(-10, 10, 5), np.full(5, 80.0), np.zeros(5)], axis=1
    )
    scene = make_scene(pos, [0.0, -5.0, 0.0], [0.0, 1.0, 0.0])
    ecfg = env_lib.EnvConfig(
        resolution=16, batch_size=3, sigma_scale=0.1, error_scale_mrad=30.0
    )
    st = env_lib.init_state(scene, ecfg, jax.random.PRNGKey(0))
    res = ttt_rollout(policy, params, scene, ecfg, st, jax.random.PRNGKey(5),
                      k=2, T=2, init_base="ideal", collect_actions=True)
    first = np.asarray(res.actions_over_t[0])
    ideal = np.asarray(res.env_state.ideal_normals).reshape(3, 5, 3)
    np.testing.assert_allclose(first, ideal, atol=1e-6)

    # And the trainer accepts the flag end-to-end.
    cfg = TTTConfig(
        num_heliostats=5, batch_size=3, num_batches=2, steps=2, T=2, k=2,
        resolution=16, sigma_scale=0.1, error_scale_mrad=30.0,
        alignment_pretrain_steps=0, warmup_steps=0, residual_head=True,
        lr=1e-3, grad_clip=1.0, scheduler="none", eval_every=2,
        log_every=100, test_size=3, dropout=0.0,
        truncate_every=2, fine_enabled="none", extra_steps=1,
    )
    best = ttt_train_and_eval(cfg)
    assert best is not None and np.isfinite(best)
