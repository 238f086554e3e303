"""No-policy gradient-sanity probe (parity: ``env_sanity_check.py:9-87``).

Directly optimizes an ``(B, N, 3)`` normal array against the env's alignment
loss with Adam + plateau LR; convergence toward 0 mrad proves the
render→loss path is usefully differentiable end-to-end.

    python scripts/env_sanity_check.py [--steps 300] [--resolution 64]
"""

import argparse
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
import optax

from doodle_tpu.core.scene import make_scene
from doodle_tpu.env import env as env_lib
from doodle_tpu.ops.optics import normalize
from doodle_tpu.optim import reduce_on_plateau


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--num_heliostats", type=int, default=50)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--resolution", type=int, default=64)
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--lr", type=float, default=1e-2)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    key = jax.random.PRNGKey(args.seed)
    k_geo, k_env, k_init = jax.random.split(key, 3)
    pos = jax.random.uniform(k_geo, (args.num_heliostats, 3)) * 10.0 + 80.0
    pos = pos.at[:, 2].set(0.0)
    scene = make_scene(pos, [0.0, -5.0, 0.0], [0.0, 1.0, 0.0])
    cfg = env_lib.EnvConfig(
        resolution=args.resolution, batch_size=args.batch_size,
        sigma_scale=0.1, error_scale_mrad=90.0,
    )
    state = env_lib.init_state(scene, cfg, k_env)

    normals = normalize(
        state.ideal_normals
        + 0.2 * jax.random.normal(k_init, state.ideal_normals.shape)
    )
    opt = optax.chain(optax.adam(args.lr), reduce_on_plateau(patience=25))
    opt_state = opt.init(normals)

    @jax.jit
    def step(normals, opt_state):
        def loss_fn(n):
            _, metrics, _ = env_lib.step(scene, cfg, state, normalize(n))
            return metrics["alignment_loss"]

        loss, g = jax.value_and_grad(loss_fn)(normals)
        updates, opt_state = opt.update(g, opt_state, normals, value=loss)
        return optax.apply_updates(normals, updates), opt_state, loss

    first = None
    for i in range(args.steps):
        normals, opt_state, loss = step(normals, opt_state)
        if first is None:
            first = float(loss)
        if i % 50 == 0 or i == args.steps - 1:
            print(f"[{i:4d}] alignment {float(loss):.3f} mrad")

    final = float(loss)
    print(f"alignment: {first:.1f} -> {final:.3f} mrad")
    assert final < first * 0.05, "env gradients failed to drive alignment down"
    print("ENV SANITY OK")


if __name__ == "__main__":
    main()
