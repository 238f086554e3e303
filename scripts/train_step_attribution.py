"""Where the config-4 train step's ~399 ms actually goes (r5 re-run).

Counterpart of ``scripts/splat_profile_attribution.py`` one level up: the
same ablation-decomposition idea applied to the full trainer hot program
(rollout fwd + backward + adam) at the bench config-4 shape
(N=500, 256², B=64, k=2, T=4, worst-k% mask, bf16 encoder, "full" loss
preset — exactly ``bench.bench_train_rate``'s program, whose methodology
this reuses verbatim: distinct inputs per rep via ``lax.scan`` over keys,
fetch-synced completion, two-rep-count slope).

r5 revision (VERDICT r4 item 1): the baseline is the SHIPPED lowering —
custom-vjp conv gradients + ``remat_save="convs"`` (the 398.9 ms program
of results/conv_train_ab.json); the r4-era table in git history measured
the superseded 843 ms XLA-autodiff/full-remat program.

Run from the repo root on a quiet TPU:

    timeout 4500 python scripts/train_step_attribution.py

Variants (each an independently compiled program):
  * ``full``        — the bench train_config4 program (remat_save="convs").
  * ``fwd_only``    — rollout forward + loss only, no grad/optimizer:
                      isolates the backward share.
  * ``com_encoder`` — CNN encoder swapped for the (near-free) CoM encoder:
                      isolates the CNN's total share (fwd + bwd).
  * ``T2``          — T=2 instead of 4: the slope vs ``full`` is the
                      marginal cost of one env step (policy+render+losses,
                      fwd+bwd); the intercept is per-train-step overhead
                      (adam, grad norm, reset, encode of the initial
                      k-frame history incl. its backward).
  * ``no_dropout``  — dropout=0.0 (flax short-circuits the mask draw AND
                      the multiply): isolates the dropout share, fwd+bwd.
  * ``conv_frozen`` — conv kernels/biases ``stop_gradient``-ed inside the
                      loss (frames are already detached, so XLA dead-codes
                      the ENTIRE conv backward — dgrad and wgrad — while
                      the conv forward, GELU/dropout and the dense/LSTM/
                      head backward all remain): isolates conv-backward.
  * ``remat_none``  — remat_save="none": the conv-recompute share the
                      selective checkpoint buys back (A/B continuity with
                      results/conv_train_ab.json).

Writes ``results/train_step_attribution.json``.
"""
from __future__ import annotations

import json
import pathlib
import re
import sys
import time

sys.path.insert(0, ".")  # run from the repo root (CLAUDE.md)

import jax
import jax.numpy as jnp
import numpy as np
import optax

import bench
from doodle_tpu.models.policy import PolicyNet
from doodle_tpu.train.rollout import rollout

N, RES, B, K = 500, 256, 64, 2


def _freeze_convs(p):
    """stop_gradient every leaf under a Conv_* module: with the input
    frames already detached this prunes the whole conv backward from the
    grad graph (XLA DCE), leaving conv fwd + elementwise + head backward."""
    import flax

    flat = flax.traverse_util.flatten_dict(p)
    flat = {
        kp: (jax.lax.stop_gradient(v)
             if any(str(k).startswith("Conv_") for k in kp) else v)
        for kp, v in flat.items()
    }
    return flax.traverse_util.unflatten_dict(flat)


def variant_rate(T=4, grad=True, remat=True, remat_save="convs",
                 conv_frozen=False, dropout=0.1, reps=(2, 8), **policy_kw):
    scene, cfg, state = bench._setup(N, RES, B, use_error_mask=True)
    kw = dict(
        num_heliostats=N, architecture="lstm", dropout=dropout,
        encoder_dtype="bfloat16", encoder_gelu_approximate=True,
    )
    kw.update(policy_kw)
    policy = PolicyNet(**kw)
    img = jnp.zeros((1, K, RES, RES))
    aux = jnp.zeros((1, 3 + N * 3))
    params = policy.init(jax.random.PRNGKey(3), img, aux, policy.init_carry(1))
    opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(5e-4))
    opt_state = opt.init(params)
    weights = jnp.array(bench.LOSS_PRESETS["full"])

    def loss_of(p, key_t):
        if conv_frozen:
            p = _freeze_convs(p)
        res = rollout(
            policy, p, scene, cfg, state, key_t, k=K, T=T,
            deterministic=False, remat=remat, encode_once=True,
            remat_save=remat_save,
        )
        parts = res.losses
        terms = jnp.stack([
            parts["alignment_loss"], parts["bound"],
            parts["mse"], parts["dist"],
        ])
        return jnp.sum(jnp.where(weights != 0, weights * terms, 0.0))

    def train_step(carry, key_t):
        params, opt_state = carry
        if not grad:
            # Forward only: fold the loss back into the carry through a
            # zero-magnitude perturbation so the scan stays sequential
            # (same anti-hoisting structure as the grad path).
            loss = loss_of(params, key_t)
            params = jax.tree.map(
                lambda x: x + 0.0 * loss.astype(x.dtype)
                if jnp.issubdtype(x.dtype, jnp.floating) else x,
                params,
            )
            return (params, opt_state), loss
        loss, grads = jax.value_and_grad(loss_of)(params, key_t)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    @jax.jit
    def run(params, opt_state, keys):
        (params, _), losses = jax.lax.scan(train_step, (params, opt_state), keys)
        checksum = sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(params))
        return checksum + jnp.sum(losses)

    t = {}
    for r in reps:
        keys = jax.random.split(jax.random.PRNGKey(4), r)
        t[r] = bench._timed_fetch(run, params, opt_state, keys, tries=4)
    dt = max((t[reps[1]] - t[reps[0]]) / (reps[1] - reps[0]), 1e-9)
    return dt


def main():
    out = {"config": {"N": N, "res": RES, "B": B, "k": K,
                      "loss_preset": "full", "encoder_dtype": "bfloat16"}}
    plan = [
        ("full", dict()),
        ("fwd_only", dict(grad=False)),
        ("com_encoder", dict(encoder="com")),
        ("T2", dict(T=2)),
        ("no_dropout", dict(dropout=0.0)),
        ("conv_frozen", dict(conv_frozen=True)),
        ("remat_none", dict(remat_save="none")),
    ]
    for name, kw in plan:
        t0 = time.time()
        try:
            dt = variant_rate(**kw)
            out[f"{name}_ms"] = round(dt * 1e3, 1)
            print(f"{name}: {dt*1e3:.1f} ms/step "
                  f"({time.time()-t0:.0f}s incl. compile)", flush=True)
        except Exception as e:  # OOM on no_remat is an expected outcome
            # First line only, ANSI escapes stripped: the axon compile
            # helper embeds color codes + its URL in the message, which
            # otherwise ends up verbatim in the checked-in JSON artifact.
            first = re.sub(r"\x1b\[[0-9;]*m", "", str(e)).splitlines()
            out[f"{name}_error"] = (
                f"{type(e).__name__}: {first[0] if first else ''}"[:200])
            print(f"{name}: FAILED {type(e).__name__} "
                  f"({time.time()-t0:.0f}s)", flush=True)

    if "full_ms" in out:
        full = out["full_ms"]
        if "fwd_only_ms" in out:
            out["derived_backward_ms"] = round(full - out["fwd_only_ms"], 1)
        if "com_encoder_ms" in out:
            out["derived_cnn_total_ms"] = round(full - out["com_encoder_ms"], 1)
        if "T2_ms" in out:
            marg = (full - out["T2_ms"]) / 2.0
            out["derived_per_env_step_ms"] = round(marg, 1)
            out["derived_fixed_overhead_ms"] = round(full - 4 * marg, 1)
        if "no_dropout_ms" in out:
            out["derived_dropout_ms"] = round(full - out["no_dropout_ms"], 1)
        if "conv_frozen_ms" in out:
            out["derived_conv_backward_ms"] = round(
                full - out["conv_frozen_ms"], 1)
        if "remat_none_ms" in out:
            out["derived_remat_save_gain_ms"] = round(
                out["remat_none_ms"] - full, 1)

    path = pathlib.Path("results/train_step_attribution.json")
    path.write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
