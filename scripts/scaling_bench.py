"""Scaling-efficiency measurement over a device mesh.

Weak scaling of the DP-sharded train step: global env batch grows with the
device count (fixed per-device batch), so perfect scaling = flat step time.
Efficiency(n) = t(1) / t(n).

On real multi-chip hardware this measures ICI-collective overhead directly.
Without one (this image exposes a single chip), run it on the virtual CPU
mesh — it validates the sharded program end-to-end and measures the
partitioning overhead, but CPU "devices" share cores, so treat those
numbers as a lower bound, not the ICI figure.

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/scaling_bench.py --devices 1 2 4 8 --platform cpu

(``--platform cpu`` forces the platform through jax.config — the
JAX_PLATFORMS env var alone cannot override this image's TPU plugin.
Omit it on real multi-chip hardware.)
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, nargs="+", default=[1, 2])
    p.add_argument("--per_device_batch", type=int, default=4)
    p.add_argument("--num_heliostats", type=int, default=50)
    p.add_argument("--resolution", type=int, default=64)
    p.add_argument("--T", type=int, default=2)
    p.add_argument("--k", type=int, default=2)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument(
        "--platform", default=None,
        help="force this JAX platform via jax.config (needed for the "
        "virtual CPU mesh on images whose TPU plugin ignores the "
        "JAX_PLATFORMS env var); default: whatever jax picks",
    )
    args = p.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import optax

    from doodle_tpu.core.scene import make_scene
    from doodle_tpu.env import env as env_lib
    from doodle_tpu.models.policy import PolicyNet
    from doodle_tpu.parallel import make_mesh, make_sharded_train_step, shard_env_state

    key = jax.random.PRNGKey(0)
    k_geo, k_pol = jax.random.split(key)
    pos = jax.random.uniform(k_geo, (args.num_heliostats, 3)) * 10.0 + 80.0
    pos = pos.at[:, 2].set(0.0)
    scene = make_scene(pos, [0.0, -5.0, 0.0], [0.0, 1.0, 0.0])

    times = {}
    for n in args.devices:
        if n > len(jax.devices()):
            print(f"skip n={n}: only {len(jax.devices())} devices")
            continue
        B = args.per_device_batch * n
        cfg = env_lib.EnvConfig(
            resolution=args.resolution, batch_size=B,
            sigma_scale=0.01, error_scale_mrad=90.0,
        )
        state = env_lib.init_state(scene, cfg, jax.random.PRNGKey(1))
        policy = PolicyNet(num_heliostats=args.num_heliostats,
                           architecture="lstm", dropout=0.0)
        img = jnp.zeros((B, args.k, args.resolution, args.resolution))
        aux = jnp.zeros((B, 3 + args.num_heliostats * 3))
        params = policy.init(k_pol, img, aux, policy.init_carry(B))
        opt = optax.adam(1e-3)
        opt_state = opt.init(params)

        mesh = make_mesh(n)
        step = make_sharded_train_step(
            policy, scene, cfg, opt, mesh, k=args.k, T=args.T,
            deterministic=True,
        )
        s_state = shard_env_state(mesh, state)
        w = jnp.array([1.0, 0.0, 0.0, 0.0])

        import numpy as np

        # Sync via a host fetch: on the remote axon platform
        # block_until_ready can return before execution finishes (bench.py
        # module doc); a device→host copy cannot. Iterations chain through
        # ``out`` so none can be elided.
        out = step(params, opt_state, s_state, jax.random.PRNGKey(2), w)
        np.asarray(jax.tree_util.tree_leaves(out[3])[0])
        t0 = time.perf_counter()
        for i in range(args.iters):
            out = step(out[0], out[1], out[2], jax.random.PRNGKey(3 + i), w)
        np.asarray(jax.tree_util.tree_leaves(out[3])[0])
        dt = (time.perf_counter() - t0) / args.iters
        times[n] = dt
        print(f"n={n}: {dt*1e3:.1f} ms/step (global B={B})")

    if 1 in times:
        for n, t in sorted(times.items()):
            eff = times[1] / t
            print(f"weak-scaling efficiency n={n}: {eff:.2%}")
    print(json.dumps({str(n): t for n, t in times.items()}))


if __name__ == "__main__":
    main()
