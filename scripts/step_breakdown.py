"""Where does the config-4 env step's time go? Honest slope timing of
nested slices of the step: splat-only, render-only, render+flux losses,
full step. Run on a quiet TPU from the repo root."""
import sys, time, functools
sys.path.insert(0, ".")
import numpy as np
import jax, jax.numpy as jnp

from bench import _setup, _make_actions, _timed_fetch
from doodle_tpu.env import env as env_lib
from doodle_tpu.env.losses import flux_metrics, boundary
from doodle_tpu.core.field import render

N, RES, B = 500, 256, 128
R1, R2 = 50, 400
scene, cfg, state = _setup(N, RES, B, True)
fcfg = cfg.field_config(cfg.error_scale_mrad)

def slope(make_loop):
    t = {}
    for reps in (R1, R2):
        actions = jax.jit(_make_actions, static_argnums=1)(
            state, reps, jax.random.PRNGKey(1)
        )
        t[reps] = _timed_fetch(make_loop(), actions)
    return (t[R2] - t[R1]) / (R2 - R1) * 1e3, t

def loop_render_only():
    @jax.jit
    def loop(actions):
        def body(acc, a):
            img, actual, refl = render(scene, fcfg, state.sun_pos, a, state.errors)
            return acc + img[0, 0, 0], None
        return jax.lax.scan(body, 0.0, actions)[0]
    return loop

def loop_render_flux():
    @jax.jit
    def loop(actions):
        def body(acc, a):
            img, actual, refl = render(scene, fcfg, state.sun_pos, a, state.errors)
            core = flux_metrics(
                img, jax.lax.stop_gradient(state.target_img),
                state.distance_maps, state.ideal_normals, actual,
                use_error_mask=cfg.use_error_mask,
                error_mask_ratio=cfg.error_mask_ratio,
            )
            return acc + core["mse"] + core["dist"], None
        return jax.lax.scan(body, 0.0, actions)[0]
    return loop

def loop_full_step():
    @jax.jit
    def loop(actions):
        def body(acc, a):
            _, metrics, _ = env_lib.step(scene, cfg, state, a)
            return acc + metrics["mse"], None
        return jax.lax.scan(body, 0.0, actions)[0]
    return loop

for name, mk in [("render only", loop_render_only),
                 ("render+flux losses", loop_render_flux),
                 ("full step", loop_full_step)]:
    ms, raw = slope(mk)
    print(f"{name:20s}: {ms:.4f} ms/rep  raw={ {k: round(v*1e3,1) for k,v in raw.items()} }", flush=True)
