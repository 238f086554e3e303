"""Quick-start: the reference README walkthrough (README.md:59-128 in
l3th4l/DOODLE), TPU-native.

Builds a 50-heliostat field, renders flux images for a batch of suns,
steps the environment, directly optimizes mirror normals against the
alignment loss (the `env_sanity_check.py` probe), and finally runs a short
policy training. Runs on CPU or TPU; on TPU the first compile of the
training step takes minutes (cached afterwards).

Usage:  python examples/quickstart.py [--steps 50] [--train]
"""

from __future__ import annotations

import pathlib
import sys

# Runnable from anywhere: `python examples/quickstart.py` puts examples/ on
# sys.path, not the repo root where doodle_tpu lives.
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import argparse

import jax
import jax.numpy as jnp
import optax

from doodle_tpu.core.scene import make_scene
from doodle_tpu.env import env as env_lib
from doodle_tpu.env.sun import azel_to_direction
from doodle_tpu.ops.optics import normalize


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50,
                    help="direct-optimization steps")
    ap.add_argument("--train", action="store_true",
                    help="also run a short policy training (slow first "
                         "compile on TPU)")
    args = ap.parse_args()

    # --- 1. Scene + env (README quick-start geometry) -------------------
    key = jax.random.PRNGKey(0)
    k_geo, k_env, k_act = jax.random.split(key, 3)
    pos = jax.random.uniform(k_geo, (50, 3)) * 10.0 + 80.0
    pos = pos.at[:, 2].set(0.0)   # mirrors on the ground plane
    scene = make_scene(
        heliostat_pos=pos,
        target_pos=[0.0, -5.0, 0.0],
        target_normal=[0.0, 1.0, 0.0],   # receiver faces +Y
    )
    cfg = env_lib.EnvConfig(
        resolution=128,
        batch_size=25,
        sigma_scale=0.01,
        error_scale_mrad=90.0,
        azimuth=45.0,
        elevation=45.0,
    )
    state = env_lib.init_state(scene, cfg, k_env)
    print(f"sun direction (az=45, el=45): {azel_to_direction(45.0, 45.0)}")

    # --- 2. One env step with noisy ideal normals -----------------------
    action = normalize(
        state.ideal_normals
        + 0.01 * jax.random.normal(k_act, state.ideal_normals.shape)
    )
    obs, metrics, monitor = env_lib.step(scene, cfg, state, action)
    print(f"flux image batch: {obs['img'].shape}, "
          f"mse={float(metrics['mse']):.3e}, "
          f"alignment={float(metrics['alignment_loss']):.1f} mrad, "
          f"spillage={int(monitor['spillage_count'])} rays")

    # --- 3. Direct optimization of the normals (no policy) --------------
    @jax.jit
    def align_loss(n):
        _, m, _ = env_lib.step(scene, cfg, state, normalize(n))
        return m["alignment_loss"]

    opt = optax.adam(1e-2)
    params = action
    opt_state = opt.init(params)

    @jax.jit
    def opt_step(p, s):
        val, g = jax.value_and_grad(align_loss)(p)
        updates, s = opt.update(g, s)
        return optax.apply_updates(p, updates), s, val

    for i in range(args.steps):
        params, opt_state, val = opt_step(params, opt_state)
        if i % max(1, args.steps // 5) == 0:
            print(f"  step {i:4d}: alignment {float(val):8.2f} mrad")
    print(f"  final: alignment {float(align_loss(params)):8.2f} mrad")

    # --- 4. Optional: short policy training -----------------------------
    if args.train:
        from doodle_tpu.train.trainer import TrainConfig, train_and_eval

        # Tiny demo shape so the example also runs on CPU in ~a minute; on
        # TPU, scale freely (see results/RESULTS.md for full-size runs).
        tcfg = TrainConfig(
            num_heliostats=12, batch_size=4, steps=10, T=2, k=2,
            resolution=32, sigma_scale=0.01, error_scale_mrad=90.0,
            architecture="lstm", alignment_always=True, eval_every=5,
            test_size=4, alignment_pretrain_steps=0, warmup_steps=0,
        )
        best = train_and_eval(tcfg, scene=None)
        print(f"policy training: best test mse {best:.3e}")


if __name__ == "__main__":
    main()
