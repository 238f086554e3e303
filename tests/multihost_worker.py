"""Worker process for the real multi-host integration test.

Launched (twice) by ``tests/test_multihost.py``:

    python tests/multihost_worker.py <coordinator_port> <process_id>

Each worker is one "host" of a 2-process JAX cluster with 2 CPU devices,
connected through the same coordination service + gloo collectives a real
multi-host CPU/DCN deployment uses. The pair runs
``make_sharded_train_step`` on the global 4-device mesh — the gradient
``pmean`` physically crosses the process boundary — and prints one JSON
line of results for the parent to check against a single-process run.
"""

import json
import os
import sys

# Invoked as a script from tests/: put the repo root (not tests/) on the
# path so `doodle_tpu` imports from the working tree, PYTHONPATH-free
# (PYTHONPATH breaks axon plugin discovery — CLAUDE.md).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    port, pid = int(sys.argv[1]), int(sys.argv[2])
    ckpt_dir = sys.argv[3] if len(sys.argv) > 3 else None

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.config.update("jax_num_cpu_devices", 2)

    from doodle_tpu.parallel import (
        broadcast_from_primary,
        initialize_distributed,
        is_multiprocess,
        is_primary_host,
        make_mesh,
        make_sharded_train_step,
        shard_env_state,
        sync_hosts,
    )

    active = initialize_distributed(
        coordinator_address=f"localhost:{port}", num_processes=2,
        process_id=pid,
    )
    assert active and is_multiprocess()
    assert jax.process_count() == 2
    assert len(jax.devices()) == 4
    assert is_primary_host() == (pid == 0)

    import numpy as np
    import jax.numpy as jnp
    import optax

    from doodle_tpu.core.scene import make_scene
    from doodle_tpu.env import env as env_lib
    from doodle_tpu.models.policy import PolicyNet

    # Identical deterministic setup on both hosts (same seeds -> same host
    # values), exactly how a pod run constructs its replicated state.
    pos = np.stack(
        [np.linspace(-20, 20, 8), np.full(8, 80.0), np.zeros(8)], axis=1
    )
    scene = make_scene(pos, [0.0, -5.0, 0.0], [0.0, 1.0, 0.0])
    cfg = env_lib.EnvConfig(
        resolution=16, batch_size=8, sigma_scale=0.01, error_scale_mrad=30.0,
        new_errors_every_reset=False, field_init_noise=0.0,
    )
    state = env_lib.init_state(scene, cfg, jax.random.PRNGKey(0))
    state = jax.tree.map(np.asarray, state)  # host values, process-local

    policy = PolicyNet(num_heliostats=8, enc_dim=16, lstm_hid=16,
                       architecture="lstm", dropout=0.0)
    img = jnp.zeros((8, 2, 16, 16))
    aux = jnp.zeros((8, 3 + 24))
    params = policy.init(jax.random.PRNGKey(1), img, aux,
                         policy.init_carry(8))
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    mesh = make_mesh()            # all 4 GLOBAL devices, 2 per process
    assert mesh.devices.size == 4

    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    to_host = jax.tree.map(np.asarray, (params, opt_state))
    params, opt_state = jax.device_put(to_host, repl)
    s_state = shard_env_state(mesh, state)

    step = make_sharded_train_step(
        policy, scene, cfg, opt, mesh, k=2, T=2, deterministic=True,
        impl="shard_map",
    )
    weights = jax.device_put(np.array([1.0, 0.0, 1.0, 1.0], np.float32), repl)
    key = jax.device_put(np.asarray(jax.random.PRNGKey(5)), repl)

    losses = []
    for _ in range(2):
        params, opt_state, s_state, loss, parts = step(
            params, opt_state, s_state, key, weights
        )
        # loss/params are replicated -> fully addressable on every process.
        losses.append(float(np.asarray(loss)))

    param_sum = float(
        sum(np.abs(np.asarray(x)).sum() for x in jax.tree.leaves(params))
    )

    # Collective checkpoint save across the REAL process boundary (orbax:
    # every process must call save; sidecar meta written by process 0),
    # then one more step so the parent can assert trajectory continuity
    # after an elastic restore (different process/device topology).
    post_save_loss = None
    if ckpt_dir:
        from doodle_tpu.models.policy import PolicyNet as _P  # noqa: F401
        from doodle_tpu.utils.checkpoint import policy_meta, save_checkpoint

        save_checkpoint(
            os.path.join(ckpt_dir, "latest"),
            {"params": params, "opt_state": opt_state},
            meta={"policy": policy_meta(policy), "batch_size": 8},
        )
        sync_hosts("ckpt_saved")
        params, opt_state, s_state, loss, parts = step(
            params, opt_state, s_state, key, weights
        )
        post_save_loss = float(np.asarray(loss))

    # Host-side helpers across the real process boundary.
    token = float(np.asarray(broadcast_from_primary(np.float32(pid + 7.0))))
    sync_hosts("multihost_worker_done")

    print(json.dumps({
        "pid": pid,
        "primary": is_primary_host(),
        "losses": losses,
        "param_sum": param_sum,
        "post_save_loss": post_save_loss,
        "broadcast": token,
    }), flush=True)


if __name__ == "__main__":
    main()
