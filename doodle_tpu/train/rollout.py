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
    hist: jax.Array                 # [B, k, res, res] final history buffer
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
    """
    B = cfg.batch_size
    res = cfg.resolution
    k_reset, k_drop = jax.random.split(key)

    state, obs = env_lib.reset(scene, cfg, state, k_reset)
    img = jax.lax.stop_gradient(obs["img"])
    aux = jax.lax.stop_gradient(obs["aux"])

    hist0 = jnp.zeros((B, k, res, res), img.dtype).at[:, -1].set(img)
    carry0 = policy.init_carry(B)

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
        net_in = jax.lax.stop_gradient(hist)
        rngs = None if deterministic else {"dropout": key_t}
        action, pcarry = policy.apply(
            params, net_in, aux, pcarry,
            deterministic=deterministic,
            **({"rngs": rngs} if rngs else {}),
        )
        obs_t, losses, monitor = env_lib.step(scene, cfg, state, action)
        new_img = obs_t["img"]
        hist = jnp.roll(hist, -1, axis=1).at[:, -1].set(
            jax.lax.stop_gradient(new_img)
        )
        if use_mean:
            mean_losses = jax.tree.map(
                lambda acc, v: acc + v / T, mean_losses, losses
            )
        return (
            (hist, pcarry, mean_losses, new_img, monitor),
            (losses["mse"], losses),
        )

    step_keys = jax.random.split(k_drop, T)
    body = jax.checkpoint(scan_step) if remat else scan_step
    (hist, _, mean_losses, final_img, monitor), (mse_over_t, last_losses) = (
        jax.lax.scan(
            body,
            (hist0, carry0, zero_losses, img, monitor0),
            step_keys,
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
        hist=hist,
        mse_over_t=mse_over_t,
        monitor=monitor,
        env_state=state,
    )
