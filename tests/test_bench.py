"""Smoke tests for the bench.py measurement harness (CPU, tiny shapes).

These protect the *methodology*: distinct actions per rep, scan-based
fusion, fetch-synced timing, slope math. Rates themselves are meaningless
on CPU.
"""

import sys

import jax
import numpy as np

sys.path.insert(0, ".")

import bench


def test_make_actions_distinct_and_unit_norm():
    scene, cfg, state = bench._setup(5, 32, 2, False, splat_backend="xla")
    actions = bench._make_actions(state, 3, jax.random.PRNGKey(0))
    assert actions.shape == (3,) + state.ideal_normals.shape
    norms = np.linalg.norm(np.asarray(actions), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    # every rep gets its own action — the anti-hoisting property
    assert not np.allclose(np.asarray(actions[0]), np.asarray(actions[1]))


def test_bench_device_rate_runs_and_is_positive():
    rate, dt, raw = bench.bench_device_rate(
        5, 32, 2, False, reps_small=2, reps_large=6, splat_backend="xla"
    )
    assert rate > 0 and dt > 0
    assert set(raw) == {2, 6}


def test_bench_dispatch_rate_runs():
    rate, dt = bench.bench_dispatch_rate(
        5, 32, 2, False, iters=2, splat_backend="xla"
    )
    assert rate > 0 and dt > 0


def test_bench_train_rate_runs():
    rate, dt, flops = bench.bench_train_rate(
        5, 32, 2, k=2, T=2, use_error_mask=False,
        reps_small=1, reps_large=3, splat_backend="xla",
    )
    assert rate > 0 and dt > 0
    # XLA:CPU exposes the cost model, so the per-step FLOP count should be
    # present and per-step (independent of the rep count).
    assert flops is None or flops > 0


def test_bench_train_rate_frozen_preset_runs():
    rate, dt, flops = bench.bench_train_rate(
        5, 32, 2, k=2, T=2, use_error_mask=False,
        reps_small=1, reps_large=3, splat_backend="xla",
        loss_preset="frozen",
    )
    assert rate > 0 and dt > 0


def test_train_metrics_contract_never_silently_drops_keys():
    """Every TRAIN_PLAN entry must yield rate+ms keys or an explicit
    <name>_skipped reason (VERDICT r2 item 4)."""
    plan = [
        ("a", 100, dict(x=1)),
        ("b", 5, dict(x=2)),      # over budget -> skipped marker
        ("c", 100, dict(x=3)),    # runner raises -> skipped marker
    ]

    def runner(x):
        if x == 3:
            raise RuntimeError("boom")
        return 10.0 / x, x / 10.0

    m = bench.collect_train_metrics(
        t_start=0.0, plan=plan, runner=runner, now=lambda: 50.0
    )
    assert m["a_steps_per_s"] == 10.0 and m["a_step_ms"] == 100.0
    assert "budget" in m["b_skipped"]
    assert "boom" in m["c_skipped"]
    assert "full" in m["train_loss_presets"]
    assert "frozen" in m["train_loss_presets"]
    for name, _, _ in plan:
        assert (f"{name}_steps_per_s" in m) or (f"{name}_skipped" in m)


def test_train_metrics_mfu_keys_when_flops_available():
    """3-tuple runners (rate, dt, flops/step) yield achieved-TFLOP/s and
    %-of-measured-MXU-ceiling keys (VERDICT r3 item 8); 2-tuple runners
    stay valid with no MFU keys."""
    plan = [("a", 100, dict())]
    m = bench.collect_train_metrics(
        t_start=0.0, plan=plan,
        runner=lambda: (2.0, 0.5, 46.075e12), now=lambda: 1.0,
    )
    assert m["a_tflops_per_s"] == 92.2   # 46.075e12 * 2 / 1e12
    assert m["a_mfu_pct"] == 50.0        # vs the measured 184.3 ceiling
    m2 = bench.collect_train_metrics(
        t_start=0.0, plan=plan, runner=lambda: (2.0, 0.5), now=lambda: 1.0,
    )
    assert "a_mfu_pct" not in m2 and m2["a_steps_per_s"] == 2.0


def test_train_plan_includes_frozen_config4():
    names = [name for name, _, _ in bench.TRAIN_PLAN]
    assert "train_config4" in names and "train_config4_frozen" in names
    by_name = {name: kw for name, _, kw in bench.TRAIN_PLAN}
    assert by_name["train_config4"]["loss_preset"] == "full"
    assert by_name["train_config4_frozen"]["loss_preset"] == "frozen"
