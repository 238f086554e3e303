"""Compile-time scaling of the TTT train step vs T (VERDICT r3 item 7).

``train/ttt.py`` unrolls the timestep loop statically ("T ≤ ~34 in all
reference configs") — this measures what that unroll actually costs to
compile at config-4 TTT geometry (N=500, 256², B=16×4 envs, CNN-bf16
encoder, residual head, truncate_every=4 — the `results/ttt_config4_
usable` setup) for T ∈ {6, 15, 30} (the reference's own defaults go to
T=30, ``train_with_env.py:510``). AOT lower+compile only — no step is
executed, so this can run without contending for chip time.

Cold vs warm: the package's persistent XLA compilation cache
(~/.cache/doodle_tpu_xla) makes the second run of the same program warm;
the script reports both by compiling each T twice in-process (the second
compile hits the in-process/executable cache path) and records whether a
persistent-cache entry pre-existed.

Run: `timeout 4800 python scripts/ttt_compile_scaling.py`.
Writes results/ttt_compile_scaling.json.
"""
from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import optax

from doodle_tpu.env import env as env_lib
from doodle_tpu.models.policy import PolicyNet
from doodle_tpu.optim import adamp
from doodle_tpu.train.trainer import make_ttt_geometry
from doodle_tpu.train.ttt import ttt_rollout

N = 500
RES = 256
B = 16
NUM_BATCHES = 4
K = 2


def build(T: int):
    key = jax.random.PRNGKey(0)
    scene = make_ttt_geometry(N, 1500.0, key)
    cfg = env_lib.EnvConfig(
        resolution=RES, batch_size=B, sigma_scale=0.05,
        error_scale_mrad=30.0, precision="default", splat_backend="auto",
    )
    state = env_lib.init_state(scene, cfg, key)
    states = jax.tree.map(
        lambda x: jnp.stack([x] * NUM_BATCHES), state
    )
    policy = PolicyNet(
        num_heliostats=N, architecture="lstm", encoder="cnn",
        dropout=0.1, encoder_dtype="bfloat16",
        encoder_gelu_approximate=True, normalize_output=False,
        zero_init_head=True,
    )
    img = jnp.zeros((1, K, RES, RES))
    aux = jnp.zeros((1, 3 + N * 3))
    params = policy.init(jax.random.PRNGKey(1), img, aux,
                         policy.init_carry(1))
    opt = optax.chain(optax.clip_by_global_norm(1e-7),
                      adamp(5e-4, weight_decay=1e-5))
    opt_state = opt.init(params)

    def train_step(params, opt_state, states, key, weights):
        def loss_fn(p):
            keys = jax.random.split(key, NUM_BATCHES)
            results = jax.vmap(
                lambda s, k: ttt_rollout(
                    policy, p, scene, cfg, s, k, k=K, T=T,
                    truncate_every=4, deterministic=False,
                    init_base="ideal",
                )
            )(states, keys)
            parts = jax.tree.map(jnp.mean, results.losses)
            terms = jnp.stack([
                parts["alignment_loss"], parts["bound"],
                parts["mse"], parts["dist"],
            ])
            return jnp.sum(jnp.where(weights != 0, weights * terms, 0.0))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    args = (params, opt_state, states, jax.random.PRNGKey(2),
            jnp.array([100.0, 0.0, 1.0, 1e4]))
    return train_step, args


def main():
    out = {"config": f"N={N} res={RES} B={B}x{NUM_BATCHES} k={K} "
                     "cnn-bf16 residual trunc=4",
           "backend": jax.default_backend()}
    for T in (6, 15, 30):
        fn, args = build(T)
        t0 = time.time()
        lowered = jax.jit(fn).lower(*args)
        t_lower = time.time() - t0
        t0 = time.time()
        lowered.compile()
        t_compile = time.time() - t0
        # Second compile of the identical program: warm path.
        t0 = time.time()
        jax.jit(fn).lower(*args).compile()
        t_warm = time.time() - t0
        out[f"T{T}"] = {
            "trace_lower_s": round(t_lower, 1),
            "compile_s": round(t_compile, 1),
            "relower_recompile_warm_s": round(t_warm, 1),
        }
        print(f"T={T}: lower {t_lower:.1f}s, compile {t_compile:.1f}s, "
              f"warm re-lower+compile {t_warm:.1f}s", flush=True)
        pathlib.Path("results/ttt_compile_scaling.json").write_text(
            json.dumps(out, indent=1) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
