"""Mesh-sharded training step.

The data axis is the env batch: every device holds a slice of the suns ×
error-samples batch (a slice of :class:`EnvState`), the policy parameters
and optimizer state are replicated, and the gradient reduction is the
``psum``/``pmean`` XLA inserts for the replicated-output jit — riding ICI.
No host sync happens inside a step.

This is plain ``jit`` + ``NamedSharding`` (GSPMD), not hand-written
collectives: we annotate the placement of inputs/outputs and let the
compiler partition the program (the scaling-book recipe). CI exercises the
same code on a virtual CPU mesh; see ``__graft_entry__.dryrun_multichip``.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.scene import Scene
from ..env.env import EnvConfig
from ..models.policy import PolicyNet
from ..train.rollout import rollout
from .mesh import BATCH_AXIS

__all__ = ["make_sharded_train_step"]


def make_sharded_train_step(
    policy: PolicyNet,
    scene: Scene,
    env_cfg: EnvConfig,
    opt: optax.GradientTransformation,
    mesh: Mesh,
    k: int,
    T: int,
    use_mean: bool = False,
    deterministic: bool = False,
    remat: bool = True,
    encode_once: bool = True,
) -> Callable:
    """Build ``step(params, opt_state, env_state, key, weights) →
    (params, opt_state, env_state, loss, parts)`` jitted over the mesh.

    ``env_state`` must be batch-sharded (see :func:`shard_env_state`);
    params/opt_state replicated. ``env_cfg.batch_size`` is the GLOBAL batch.
    The rollout runs on the sharded batch; loss reduction over the batch
    triggers the cross-device mean; ``jax.grad`` of it yields the gradient
    ``psum`` — all compiler-inserted, all on ICI.
    """
    from ..env.env import EnvState

    repl = NamedSharding(mesh, P())
    bl = NamedSharding(mesh, P(BATCH_AXIS))
    # Sharding pytree for EnvState: batch-leading arrays sharded, scalars
    # replicated. Used as a jit in/out_shardings prefix tree.
    state_shard = EnvState(
        sun_pos=bl, errors=bl, ideal_normals=bl,
        target_img=bl, distance_maps=bl, ref_min=repl, ref_max=repl,
    )

    def step(params, opt_state, env_state, key, weights):
        def loss_fn(p):
            res = rollout(
                policy, p, scene, env_cfg, env_state, key,
                k=k, T=T, use_mean=use_mean,
                deterministic=deterministic, remat=remat,
                encode_once=encode_once,
            )
            parts = res.losses
            # where-guarded so a zero weight truly drops its term: with
            # exponential_risk the bound can overflow to inf, and 0 * inf
            # would otherwise poison the whole loss with NaN.
            terms = jnp.stack([
                parts["alignment_loss"], parts["bound"],
                parts["mse"], parts["dist"],
            ])
            total = jnp.sum(jnp.where(weights != 0, weights * terms, 0.0))
            return total, (parts, res.env_state)

        (loss, (parts, new_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, new_state, loss, parts

    return jax.jit(
        step,
        in_shardings=(repl, repl, state_shard, repl, repl),
        out_shardings=(repl, repl, state_shard, repl, repl),
    )
