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
    rate, dt = bench.bench_train_rate(
        5, 32, 2, k=2, T=2, use_error_mask=False,
        reps_small=1, reps_large=3, splat_backend="xla",
    )
    assert rate > 0 and dt > 0
