"""Benchmark: env-steps/s/chip (driver metric, BASELINE.md).

Measures the full ``HelioEnv.step`` hot path — policy-free, like the
reference's env loop — at the two BASELINE configs:
  * N=50 heliostats, 128² flux, B=25 suns  (config 2)
  * N=500, 256², B=128, worst-k% masking   (config 4)

One env-step = one full render + all losses (mse/dist/bound/alignment) for
one sun; a batch step counts as B env-steps (the reference's "env batch" is
its scale axis, SURVEY §0).

Methodology (hardened 2026-08-17 for remote-attached TPUs):
  * **Distinct inputs per rep.** Each fused iteration consumes its own
    pre-generated action via ``lax.scan`` over an ``[reps, ...]`` batch.
    With identical inputs XLA hoists the loop-invariant step out of a
    ``fori_loop`` (verified in compiled HLO), silently benchmarking one
    step instead of ``reps``.
  * **Fetch-based completion.** On the experimental ``axon`` remote
    platform ``block_until_ready`` can return before device execution
    finishes (measured: a 50-step scan "completing" in 0.05 ms against a
    ≥2.5 ms physical floor). A device→host copy of the result cannot lie,
    so every timing ends in ``np.asarray``.
  * **Two-rep-count slope.** The host↔TPU tunnel round-trip is ~30 ms —
    larger than the compute being measured — so the per-step time is the
    slope between two rep counts, which cancels the constant
    dispatch+fetch term: ``(t(R2) − t(R1)) / (R2 − R1)``.

``vs_baseline``: the PyTorch reference publishes no numbers (BASELINE.md);
we report the ratio against the reference implementation measured on this
machine's CPU (2026-08-17, BASELINE.md "measured" table). The driver north
star is ≥5× an A100 running the reference at N=500/256².
"""

from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

# Reference (l3th4l/DOODLE) HelioEnv.step throughput measured on this
# machine's CPU (torch 2.x, 2026-08-17; see BASELINE.md):
#   N=50, 128², B=25            → 41.5  env-steps/s
#   N=500, 256², B=4 (OOM-safe) → 0.118 env-steps/s
TORCH_CPU_BASELINE = {"n50": 41.5, "n500": 0.118}


def _setup(num_heliostats, resolution, batch_size, use_error_mask,
           splat_backend="auto"):
    from doodle_tpu.core.scene import make_scene
    from doodle_tpu.env import env as env_lib

    key = jax.random.PRNGKey(0)
    k_geo, k_env = jax.random.split(key)
    pos = jax.random.uniform(k_geo, (num_heliostats, 3)) * 10.0 + 80.0
    pos = pos.at[:, 2].set(0.0)
    scene = make_scene(pos, [0.0, -5.0, 0.0], [0.0, 1.0, 0.0])
    cfg = env_lib.EnvConfig(
        resolution=resolution,
        batch_size=batch_size,
        sigma_scale=0.1,
        error_scale_mrad=90.0,
        use_error_mask=use_error_mask,
        precision="default",
        splat_backend=splat_backend,
    )
    state = env_lib.init_state(scene, cfg, k_env)
    return scene, cfg, state


def _make_actions(state, reps, key):
    """``reps`` distinct unit-normal actions around the ideal normals."""
    from doodle_tpu.ops.optics import normalize

    noise = 0.01 * jax.random.normal(
        key, (reps,) + state.ideal_normals.shape, state.ideal_normals.dtype
    )
    return normalize(state.ideal_normals[None] + noise)


def _timed_fetch(fn, *args, tries=12):
    """Best-of-``tries`` wall time of fn(*args) synced by a host copy."""
    np.asarray(fn(*args))  # warm compile + warm transfer path
    best = float("inf")
    for _ in range(tries):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def bench_device_rate(num_heliostats, resolution, batch_size, use_error_mask,
                      reps_small=50, reps_large=400, splat_backend="auto"):
    """Fused rate via the slope between two scan lengths (see module doc)."""
    from doodle_tpu.env import env as env_lib

    scene, cfg, state = _setup(
        num_heliostats, resolution, batch_size, use_error_mask, splat_backend
    )

    @jax.jit
    def loop(actions):
        def body(acc, a):
            _, metrics, _ = env_lib.step(scene, cfg, state, a)
            return acc + metrics["mse"], None
        out, _ = jax.lax.scan(body, 0.0, actions)
        return out

    key = jax.random.PRNGKey(1)
    t = {}
    for reps in (reps_small, reps_large):
        actions = jax.jit(_make_actions, static_argnums=1)(state, reps, key)
        t[reps] = _timed_fetch(loop, actions)
    dt = (t[reps_large] - t[reps_small]) / (reps_large - reps_small)
    dt = max(dt, 1e-9)  # tunnel jitter guard
    return batch_size / dt, dt, {r: round(v * 1e3, 2) for r, v in t.items()}


def bench_dispatch_rate(num_heliostats, resolution, batch_size,
                        use_error_mask, iters=10, splat_backend="auto"):
    """Per-call rate with a host sync every step. On a remote-attached TPU
    this is tunnel-RTT-bound (~30 ms/call here) — the interactive floor,
    not a device metric. Training amortizes it by fusing T steps per call."""
    from doodle_tpu.env import env as env_lib

    scene, cfg, state = _setup(
        num_heliostats, resolution, batch_size, use_error_mask, splat_backend
    )
    actions = jax.jit(_make_actions, static_argnums=1)(
        state, iters, jax.random.PRNGKey(2)
    )
    step = jax.jit(env_lib.step, static_argnames=("cfg",))
    _, metrics, _ = step(scene, cfg, state, actions[0])
    np.asarray(metrics["mse"])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(iters):
            _, metrics, _ = step(scene, cfg, state, actions[i])
            np.asarray(metrics["mse"])
        best = min(best, time.perf_counter() - t0)
    dt = best / iters
    return batch_size / dt, dt


def main():
    dev = jax.devices()[0]
    # Rep counts sized so the compute delta (Δreps × step time) dwarfs the
    # ±10 ms tunnel-RTT jitter: ~0.04 ms/step at N=50 needs Δreps ≈ 2800.
    small_dev, small_dt, small_raw = bench_device_rate(
        50, 128, 25, False, reps_small=400, reps_large=3200
    )
    big_dev, big_dt, big_raw = bench_device_rate(500, 256, 128, True)
    big_disp, disp_dt = bench_dispatch_rate(500, 256, 128, True)

    result = {
        "metric": "env_steps_per_s_per_chip_n500_res256",
        "value": round(big_dev, 1),
        "unit": "env-steps/s/chip",
        "vs_baseline": round(big_dev / TORCH_CPU_BASELINE["n500"], 1),
        "extra": {
            "n50_res128_b25_device": round(small_dev, 1),
            "n50_step_ms": round(small_dt * 1e3, 4),
            "n500_step_ms": round(big_dt * 1e3, 4),
            "n500_dispatch_rate": round(big_disp, 1),
            "dispatch_rtt_ms": round(disp_dt * 1e3, 1),
            "raw_totals_ms": {"n50": small_raw, "n500": big_raw},
            "device": str(dev),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
