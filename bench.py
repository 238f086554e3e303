"""Benchmark: env-steps/s/chip (driver metric, BASELINE.md).

Measures the full ``HelioEnv.step`` hot path — policy-free, like the
reference's env loop — at the two BASELINE configs:
  * N=50 heliostats, 128² flux, B=25 suns  (config 2)
  * N=500, 256², B=128, worst-k% masking   (config 4)

One env-step = one full render + all losses (mse/dist/bound/alignment) for
one sun; a batch step counts as B env-steps (the reference's "env batch" is
its scale axis, SURVEY §0).

Two rates are reported:
  * device rate — steps fused into one XLA program (``lax.fori_loop``),
    which is how training rollouts actually execute (``lax.scan``); this is
    the primary metric;
  * dispatch rate — one jitted call per step from Python, which includes
    the host→TPU dispatch round-trip (the interactive-use floor).

``vs_baseline``: the PyTorch reference publishes no numbers (BASELINE.md);
we report the ratio against the reference implementation measured on this
machine's CPU (2026-08-17, BASELINE.md "measured" table). The driver north
star of ≥5× an A100 remains the stronger standing target — even granting
the A100 a generous 1000× over this CPU baseline, the N=500 number clears it.
"""

from __future__ import annotations

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
    from doodle_tpu.ops.optics import normalize

    key = jax.random.PRNGKey(0)
    k_geo, k_env, k_act = jax.random.split(key, 3)
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
    action = normalize(
        state.ideal_normals
        + 0.01 * jax.random.normal(k_act, state.ideal_normals.shape)
    )
    return scene, cfg, state, action


def bench_device_rate(num_heliostats, resolution, batch_size, use_error_mask,
                      reps=100, splat_backend="auto"):
    """Fused rate: `reps` env steps inside one jitted fori_loop."""
    from doodle_tpu.env import env as env_lib

    scene, cfg, state, action = _setup(
        num_heliostats, resolution, batch_size, use_error_mask, splat_backend
    )

    @jax.jit
    def loop(a):
        def body(i, acc):
            _, metrics, _ = env_lib.step(scene, cfg, state, a + 0e-9 * acc)
            return acc + metrics["mse"]
        return jax.lax.fori_loop(0, reps, body, 0.0)

    out = loop(action)
    out.block_until_ready()
    # Best-of-k: a single timed call (~tens of ms) is at the mercy of
    # tunnel-latency hiccups on remote-attached TPUs; the min over several
    # calls is the honest device rate.
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        out = loop(action)
        out.block_until_ready()
        best = min(best, time.perf_counter() - t0)
    dt = best / reps
    return batch_size / dt, dt


def bench_dispatch_rate(num_heliostats, resolution, batch_size,
                        use_error_mask, iters=50, splat_backend="auto"):
    """Per-call rate including host dispatch (one jit call per step)."""
    from doodle_tpu.env import env as env_lib

    scene, cfg, state, action = _setup(
        num_heliostats, resolution, batch_size, use_error_mask, splat_backend
    )
    step = jax.jit(env_lib.step, static_argnames=("cfg",))
    _, metrics, _ = step(scene, cfg, state, action)
    jax.block_until_ready(metrics["mse"])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            _, metrics, _ = step(scene, cfg, state, action)
        jax.block_until_ready(metrics["mse"])
        best = min(best, time.perf_counter() - t0)
    dt = best / iters
    return batch_size / dt, dt


def main():
    dev = jax.devices()[0]
    small_dev, small_dt = bench_device_rate(50, 128, 25, False)
    big_dev, big_dt = bench_device_rate(500, 256, 128, True)
    big_disp, _ = bench_dispatch_rate(500, 256, 128, True, iters=30)

    result = {
        "metric": "env_steps_per_s_per_chip_n500_res256",
        "value": round(big_dev, 1),
        "unit": "env-steps/s/chip",
        "vs_baseline": round(big_dev / TORCH_CPU_BASELINE["n500"], 1),
        "extra": {
            "n50_res128_b25_device": round(small_dev, 1),
            "n500_dispatch_rate": round(big_disp, 1),
            "n50_step_ms": round(small_dt * 1e3, 3),
            "n500_step_ms": round(big_dt * 1e3, 3),
            "device": str(dev),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
