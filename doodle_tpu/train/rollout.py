"""Policy rollout as a single ``lax.scan`` — fully on-device.

The reference rollout (``train_with_env.py:171-216``) is a Python loop of T
``env.step`` calls with a k-frame history buffer (``torch.roll``) and an
LSTM/residual carry threaded across steps. Here the whole loop is one
``lax.scan`` inside jit, so T renders + policy applies compile into one XLA
program with no host round-trips.

Autodiff semantics match the reference exactly:
  * the history images and aux features fed to the policy are
    ``stop_gradient``-ed (ref ``:193`` — gradients reach the policy only
    through the *current* action's ``env.step``);
  * the recurrent carry is NOT detached, so final-step losses backprop
    through the carry chain into earlier policy applications.

``encode_once=True`` (default): each frame is encoded exactly once, when it
enters the history buffer, and the scan carries the ``[B, k, enc_dim]``
encodings instead of the ``[B, k, res, res]`` raw frames. The reference
re-encodes all k frames at every step; because the policy params are
constant within a rollout and the frames are stop-gradient'ed, re-encoding
recomputes the *same value* — by linearity of the chain rule the summed
parameter gradients are identical, so encode-once is gradient-exact while
cutting the CNN FLOPs (the dominant train-step cost at reference configs)
by k× and shrinking the remat-saved scan carry from O(B·k·res²) to
O(B·k·enc_dim). The only behavioral delta is under dropout: the reference
draws a fresh encoder mask per (step, frame) while encode-once fixes one
mask per frame — a different but equally valid stochastic estimator.
``encode_once=False`` reproduces the reference's re-encoding schedule
exactly (and is what the TTT rollout uses, since its history is
deliberately NOT always detached — see ``train/ttt.py``).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from ..env import env as env_lib
from ..models.policy import PolicyNet

__all__ = ["RolloutResult", "rollout"]


class RolloutResult(NamedTuple):
    losses: dict[str, jax.Array]    # final-step (or running-mean) loss dict
    final_img: jax.Array            # [B, res, res] last rendered flux image
    hist: jax.Array | None          # [B, k, res, res] final history buffer
                                    # (None under encode_once — raw frames
                                    # are never materialized as a buffer)
    mse_over_t: jax.Array           # [T]
    monitor: dict[str, jax.Array]   # last step's monitor payload
    env_state: env_lib.EnvState     # post-reset env state (thread back in)


def rollout(
    policy: PolicyNet,
    params: Any,
    scene,
    cfg: env_lib.EnvConfig,
    state: env_lib.EnvState,
    key: jax.Array,
    k: int,
    T: int,
    use_mean: bool = False,
    deterministic: bool = True,
    remat: bool = True,
    encode_once: bool = True,
    unroll: int | bool = 1,
    remat_save: str = "none",
) -> RolloutResult:
    """Reset the env, run T policy/env steps, return the loss dict.

    ``key`` drives both the env reset and (when ``deterministic=False``)
    per-step dropout. Jit/vmap-compatible: wrap in ``jax.jit`` (with
    ``policy``/``cfg``/``k``/``T`` static) or vmap over a stacked
    ``EnvState`` axis for multi-env batches.

    ``remat``: checkpoint the scan body (``jax.checkpoint``), so the CNN/
    render activations of every timestep are recomputed in the backward pass
    instead of being stored — without it the residuals are
    O(T · B · k · res² · channels) and blow HBM at reference configs. The
    classic TPU trade: spend MXU FLOPs to save HBM.

    ``encode_once``: cache per-frame encodings across steps (see module
    docstring). Gradient-exact; bitwise-equivalent forward in deterministic
    mode up to conv-batching order.

    ``unroll``: passed to ``lax.scan``. Keep 1 on TPU (compact program,
    fast compile). On the CPU backend pass ``True``: XLA:CPU runs ops
    inside ``while`` bodies on a slow serial path — the scan *backward* of
    this rollout measures ~60× slower than the identical unrolled program
    (37 s vs 0.6 s per train step at N=10/res=64/B=8/T=2, 2026-08-19) —
    and unrolling restores the parallel thunks. Value-identical either way.
    """
    B = cfg.batch_size
    res = cfg.resolution
    k_reset, k_drop, k_enc0 = jax.random.split(key, 3)

    state, obs = env_lib.reset(scene, cfg, state, k_reset)
    img = jax.lax.stop_gradient(obs["img"])
    aux = jax.lax.stop_gradient(obs["aux"])

    carry0 = policy.init_carry(B)

    def apply_policy(net_in, pcarry, key_t):
        rngs = None if deterministic else {"dropout": key_t}
        return policy.apply(
            params, net_in, aux, pcarry,
            deterministic=deterministic,
            **({"rngs": rngs} if rngs else {}),
            **({"method": "head"} if encode_once else {}),
        )

    def encode(frames, key_t):
        rngs = None if deterministic else {"dropout": key_t}
        return policy.apply(
            params, frames,
            deterministic=deterministic,
            method="encode",
            **({"rngs": rngs} if rngs else {}),
        )

    if encode_once:
        # Seed the encoding buffer: the k-1 leading zero frames all encode
        # to the same vector (encode one and broadcast — the broadcast's
        # transpose sums the per-use cotangents, matching per-frame
        # re-encoding), the last slot is the reset image's encoding.
        ka, kb = jax.random.split(k_enc0)
        e_zero = encode(jnp.zeros((1, res, res), img.dtype), ka)
        e_img = encode(img, kb)
        hist0 = jnp.broadcast_to(
            e_zero[:, None, :], (B, k, e_zero.shape[-1])
        ).at[:, -1].set(e_img)
    else:
        hist0 = jnp.zeros((B, k, res, res), img.dtype).at[:, -1].set(img)

    # Template monitor so the scan carry has a fixed structure.
    monitor0 = {
        "normals": jnp.zeros((B, scene.num_heliostats, 3), img.dtype),
        "reflected_rays": jnp.zeros((B * scene.num_heliostats, 3), img.dtype),
        "ideal_normals": state.ideal_normals.reshape(-1, 3),
        "all_bounds": jnp.zeros((B, scene.num_heliostats), img.dtype),
        "mae_image": jnp.zeros((B, 1), img.dtype),
        "alignment_errors": jnp.zeros((B * scene.num_heliostats,), img.dtype),
        "spillage_mask": jnp.zeros((B, scene.num_heliostats), bool),
        "spillage_count": jnp.zeros((), jnp.int32),
    }
    zero_losses = {
        "mse": jnp.zeros((), img.dtype),
        "dist": jnp.zeros((), img.dtype),
        "bound": jnp.zeros((), img.dtype),
        "alignment_loss": jnp.zeros((), img.dtype),
    }

    def scan_step(carry, key_t):
        hist, pcarry, mean_losses, _, _ = carry
        k_head, k_enc = jax.random.split(key_t)
        # encode_once: the carried encodings stay differentiable w.r.t.
        # params (the reference's fresh re-encode of detached frames routes
        # the same param gradients); the raw-frame path stop-grads the
        # buffer and lets the policy re-encode, exactly like ref :193.
        net_in = hist if encode_once else jax.lax.stop_gradient(hist)
        action, pcarry = apply_policy(net_in, pcarry, k_head)
        obs_t, losses, monitor = env_lib.step(scene, cfg, state, action)
        new_img = obs_t["img"]
        new_entry = (
            encode(jax.lax.stop_gradient(new_img), k_enc)
            if encode_once
            else jax.lax.stop_gradient(new_img)
        )
        hist = jnp.roll(hist, -1, axis=1).at[:, -1].set(new_entry)
        if use_mean:
            mean_losses = jax.tree.map(
                lambda acc, v: acc + v / T, mean_losses, losses
            )
        return (
            (hist, pcarry, mean_losses,
             jax.lax.stop_gradient(new_img), monitor),
            (losses["mse"], losses),
        )

    step_keys = jax.random.split(k_drop, T)
    body = scan_step
    if remat:
        # remat_save picks which named intermediates survive the
        # checkpoint (models/encoders.py tags conv outputs): "none" =
        # recompute everything (min memory, +1 full conv fwd per step in
        # the backward); "conv_last" = keep the widest conv's output
        # (skips the 80%-of-FLOPs conv3 recompute for ~res²·C_last bf16
        # bytes/frame); "convs" = keep all three (backward recompute is
        # elementwise-only). The classic remat dial, exposed because the
        # conv recompute is ~16% of the config-4 train step.
        # Tag names derived from the encoder's configured depth (the tags
        # are emitted per-conv by CNNEncoder as f"conv{i}_out") so a
        # different feature tuple can't silently desynchronize the policy
        # from the tags. The CoM encoder has no convs — nothing to save.
        from ..models.encoders import CNNEncoder

        n_convs = (
            len(CNNEncoder.features)
            if getattr(policy, "encoder", "cnn") == "cnn" else 0
        )
        conv_names = [f"conv{i}_out" for i in range(n_convs)]
        if remat_save == "none":
            pol = None
        elif remat_save == "conv_last":
            pol = jax.checkpoint_policies.save_only_these_names(
                *conv_names[-1:]
            )
        elif remat_save == "convs":
            pol = jax.checkpoint_policies.save_only_these_names(*conv_names)
        else:
            raise ValueError(
                f"remat_save must be none|conv_last|convs, got {remat_save!r}"
            )
        body = (jax.checkpoint(scan_step, policy=pol) if pol is not None
                else jax.checkpoint(scan_step))
    (hist, _, mean_losses, final_img, monitor), (mse_over_t, last_losses) = (
        jax.lax.scan(
            body,
            (hist0, carry0, zero_losses, jax.lax.stop_gradient(img), monitor0),
            step_keys,
            unroll=unroll,
        )
    )

    losses = (
        mean_losses
        if use_mean
        else jax.tree.map(lambda x: x[-1], last_losses)
    )
    return RolloutResult(
        losses=losses,
        final_img=final_img,
        hist=None if encode_once else hist,
        mse_over_t=mse_over_t,
        monitor=monitor,
        env_state=state,
    )
