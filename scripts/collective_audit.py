"""Audit the collectives XLA inserts into the sharded train step.

Backs the BASELINE.md scaling-efficiency claim with checkable arithmetic
(VERDICT r1 item 1): lowers + compiles ``make_sharded_train_step`` on a
virtual n-device CPU mesh, enumerates every collective in the optimized
HLO (op, shape, bytes, group, in-loop placement), and feeds the byte
totals into the analytic ICI model in ``doodle_tpu/parallel/audit.py``.

Usage (CPU only; no TPU needed — SPMD partitioning decides collective
*placement* identically across backends):

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/collective_audit.py [--config4]

Default audits both impls at tiny shapes, at T=2 and T=4 (showing the
shard_map budget is horizon-independent); ``--config4`` additionally
compiles the real N=500 / 256² / B=128 / worst-k%-mask shapes and prints
the production byte table + the v5e weak-scaling model.
"""

from __future__ import annotations

import argparse
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from doodle_tpu.parallel.audit import (
    _fmt_bytes,
    annotate_loop_placement,
    collective_summary,
    efficiency_table,
)

# Measured steady-state single-chip train-step time at config 4 (TPU v5e,
# results/RESULTS.md "0.48 s/step"): per-device compute under weak scaling.
CONFIG4_STEP_S = 0.48


def build_compiled_step(num_heliostats, resolution, batch_size, k, T,
                        n_devices=8, impl="shard_map",
                        use_error_mask=False):
    """Compile the sharded train step; return (compiled, params_bytes)."""
    import optax

    from doodle_tpu.core.scene import make_scene
    from doodle_tpu.env import env as env_lib
    from doodle_tpu.models.policy import PolicyNet
    from doodle_tpu.parallel import make_mesh, make_sharded_train_step

    key = jax.random.PRNGKey(0)
    k_geo, k_pol = jax.random.split(key)
    pos = jax.random.uniform(k_geo, (num_heliostats, 3)) * 10.0 + 80.0
    pos = pos.at[:, 2].set(0.0)
    scene = make_scene(pos, [0.0, -5.0, 0.0], [0.0, 1.0, 0.0])
    cfg = env_lib.EnvConfig(
        resolution=resolution, batch_size=batch_size,
        sigma_scale=0.01, error_scale_mrad=90.0,
        use_error_mask=use_error_mask,
    )
    policy = PolicyNet(num_heliostats=num_heliostats, architecture="lstm",
                       dropout=0.0)

    # Shapes only — no data, no execution. eval_shape keeps the config-4
    # audit cheap (nothing at [B,res,res] is ever materialized).
    state_sds = jax.eval_shape(
        lambda kk: env_lib.init_state(scene, cfg, kk), jax.random.PRNGKey(1)
    )
    img = jnp.zeros((1, k, resolution, resolution))
    aux = jnp.zeros((1, 3 + num_heliostats * 3))
    params = policy.init(k_pol, img, aux, policy.init_carry(1))
    params_bytes = sum(
        x.size * x.dtype.itemsize for x in jax.tree.leaves(params)
    )

    mesh = make_mesh(n_devices)
    opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-3))
    opt_state_sds = jax.eval_shape(opt.init, params)
    # unroll=1: audit the TPU-shaped program (real scan), not the CPU-mesh
    # auto-unrolled variant.
    step = make_sharded_train_step(
        policy, scene, cfg, opt, mesh, k=k, T=T, deterministic=True,
        impl=impl, unroll=1,
    )
    params_sds = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), params
    )
    key_sds = jax.ShapeDtypeStruct((2,), jnp.uint32)
    w_sds = jax.ShapeDtypeStruct((4,), jnp.float32)
    compiled = step.lower(
        params_sds, opt_state_sds, state_sds, key_sds, w_sds
    ).compile()
    return compiled, params_bytes


def audit(name, compiled, params_bytes, T):
    placed = annotate_loop_placement(compiled.as_text())
    colls = [c for c, _ in placed]
    summ = collective_summary(colls)
    # Effective per-step traffic: in-loop collectives fire T times.
    eff_bytes = sum(c.bytes * (T if in_loop else 1) for c, in_loop in placed)
    print(f"\n=== {name} ===")
    print(f"collectives: {summ['total_count']}  "
          f"static payload: {_fmt_bytes(summ['total_bytes'])}  "
          f"effective/step (in-loop × T={T}): {_fmt_bytes(eff_bytes)}  "
          f"(param bytes: {_fmt_bytes(params_bytes)})")
    for c, in_loop in placed:
        shape = c.result_shape
        if len(shape) > 44:
            shape = shape[:41] + "..."
        print(f"  {c.op:<19} {shape:<44} {_fmt_bytes(c.bytes):>12}  "
              f"group={c.group_size}  {'IN-LOOP' if in_loop else 'once'}")
    return summ, eff_bytes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config4", action="store_true",
                    help="also audit the N=500/256²/B=128 worst-k% shapes")
    ap.add_argument("--devices", type=int, default=8)
    args = ap.parse_args()

    # Tiny shapes, both impls, two horizons: the shard_map budget must be
    # horizon-independent and entirely outside loops.
    for impl in ("shard_map", "gspmd"):
        for T in (2, 4):
            compiled, pb = build_compiled_step(
                16, 16, 8, k=2, T=T, n_devices=args.devices, impl=impl
            )
            audit(f"{impl}  tiny N=16 res=16 B=8 T={T} "
                  f"({args.devices} devices)", compiled, pb, T)

    if args.config4:
        rows = {}
        for impl in ("shard_map", "gspmd"):
            compiled, pb = build_compiled_step(
                500, 256, 128, k=4, T=4, n_devices=args.devices,
                impl=impl, use_error_mask=True,
            )
            _, eff = audit(
                f"{impl}  config4 N=500 res=256 B=128 T=4 worst-k% "
                f"({args.devices} devices)", compiled, pb, T=4
            )
            rows[impl] = eff
        print("\n--- analytic v5e weak-scaling model "
              f"(compute {CONFIG4_STEP_S}s/step, ring all-reduce on one "
              "2-link ICI axis @ 45 GB/s/link/direction) ---")
        for impl, eff in rows.items():
            print(f"\nimpl={impl}  effective bytes/step="
                  f"{_fmt_bytes(eff)}")
            print(f"{'chips':>5} {'t_coll (ms)':>12} {'efficiency':>11}")
            for row in efficiency_table(CONFIG4_STEP_S, eff,
                                        (1, 2, 4, 8, 16)):
                print(f"{row['chips']:>5} {row['t_collective_ms']:>12.4f} "
                      f"{row['efficiency']:>10.4%}")


if __name__ == "__main__":
    main()
