"""Splat-backend crossover probe: honest slope timing of the full env
step with the xla and pallas backends across field sizes, to place the
`splat_backend="auto"` threshold (see FieldConfig). bench.py methodology;
run from the repo root on a quiet TPU. 2026-08-17 sweep: xla wins at
N<=256 (any res), pallas from N=500 up -> threshold N>=400."""
import sys
sys.path.insert(0, ".")
import jax
import numpy as np

from bench import _setup, _make_actions, _timed_fetch
from doodle_tpu.env import env as env_lib

R1, R2 = 400, 3200


def step_rate(N, RES, B, backend, r1=R1, r2=R2):
    scene, cfg, state = _setup(N, RES, B, False, splat_backend=backend)

    @jax.jit
    def loop(actions):
        def body(acc, a):
            _, metrics, _ = env_lib.step(scene, cfg, state, a)
            return acc + metrics["mse"], None
        return jax.lax.scan(body, 0.0, actions)[0]

    t = {}
    for reps in (r1, r2):
        actions = jax.jit(_make_actions, static_argnums=1)(
            state, reps, jax.random.PRNGKey(1)
        )
        t[reps] = _timed_fetch(loop, actions)
    ms = (t[r2] - t[r1]) / (r2 - r1) * 1e3
    print(f"N={N} res={RES} B={B} {backend:6s}: {ms:.4f} ms/step  "
          f"raw={{r1: {t[r1]*1e3:.1f}, r2: {t[r2]*1e3:.1f}}}", flush=True)
    return ms


for backend in ("xla", "pallas"):
    step_rate(50, 128, 25, backend)
for backend in ("xla", "pallas"):
    step_rate(256, 128, 25, backend, 100, 800)
for backend in ("xla", "pallas"):
    step_rate(256, 256, 25, backend, 100, 800)
for backend in ("xla", "pallas"):
    step_rate(500, 128, 25, backend, 100, 800)
