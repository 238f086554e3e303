"""Mesh-sharded training step.

The data axis is the env batch: every device holds a slice of the suns ×
error-samples batch (a slice of :class:`EnvState`), the policy parameters
and optimizer state are replicated, and gradients are reduced over ICI.
No host sync happens inside a step.

Two implementations, selected by ``impl``:

* ``"shard_map"`` (default, production): the per-device rollout + backward
  runs as manual SPMD (``jax.shard_map``) and the gradient tree, loss, and
  metric parts are reduced with **one explicit post-backward ``pmean``**.
  The collective budget is therefore deterministic by construction: one
  fused all-reduce of ~param-size outside every loop (plus, with the
  worst-k% mask, a [B] float ``all_gather`` per env step for the global
  quantile — see ``losses.flux_metrics``). Motivated by an HLO audit of
  the GSPMD variant (``scripts/collective_audit.py``): GSPMD places the
  gradient all-reduce *inside the backward scan body*, multiplying ICI
  traffic by T.
* ``"gspmd"``: plain ``jit`` + ``NamedSharding`` in/out annotations — the
  compiler partitions the program (the scaling-book recipe). Kept because
  it is bitwise-faithful to the unsharded program even when the step
  consumes randomness (one global PRNG stream); the shard_map variant
  folds the device index into the key (SURVEY hard part #3), giving
  per-shard independent streams — identical *distribution*, different
  draws.

CI exercises both on a virtual CPU mesh; see
``__graft_entry__.dryrun_multichip`` and ``tests/test_parallel.py``
(including the pinned-collective-budget test).
"""

from __future__ import annotations

import dataclasses
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

__all__ = ["make_sharded_train_step", "make_sharded_ttt_step"]


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
    impl: str = "shard_map",
    unroll: int | None = None,
    remat_save: str = "none",
) -> Callable:
    """Build ``step(params, opt_state, env_state, key, weights) →
    (params, opt_state, env_state, loss, parts)`` jitted over the mesh.

    ``env_state`` must be batch-sharded (see :func:`shard_env_state`);
    params/opt_state replicated. ``env_cfg.batch_size`` is the GLOBAL batch
    (must divide by the batch-axis size under ``impl="shard_map"``).

    ``impl="shard_map"``: per-device rollout/backward, then ONE explicit
    ``pmean`` of (grads, loss, parts) — auditable collective budget, PRNG
    per shard via ``fold_in(key, axis_index)``.
    ``impl="gspmd"``: compiler-partitioned; loss reduction over the batch
    triggers the cross-device mean and ``jax.grad`` of it yields the
    gradient ``psum`` — all compiler-inserted.
    """
    from ..env.env import EnvState

    # auto: unroll the rollout scan on CPU meshes (XLA:CPU's while-body
    # slow path, see train/rollout.py), compact scan on accelerators.
    if unroll is None:
        # Same auto rule as the local trainer: full unroll on CPU meshes,
        # min(T, 4) on accelerators (399.3 → 346.3 ms at config 4,
        # results/unroll_probe.json).
        unroll = T if mesh.devices.flat[0].platform == "cpu" else min(T, 4)

    def total_loss(parts, weights):
        # where-guarded so a zero weight truly drops its term: with
        # exponential_risk the bound can overflow to inf, and 0 * inf
        # would otherwise poison the whole loss with NaN.
        terms = jnp.stack([
            parts["alignment_loss"], parts["bound"],
            parts["mse"], parts["dist"],
        ])
        return jnp.sum(jnp.where(weights != 0, weights * terms, 0.0))

    if impl == "gspmd":
        repl = NamedSharding(mesh, P())
        bl = NamedSharding(mesh, P(BATCH_AXIS))
        # Sharding pytree for EnvState: batch-leading arrays sharded,
        # scalars replicated. Used as a jit in/out_shardings prefix tree.
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
                    encode_once=encode_once, unroll=unroll,
                    remat_save=remat_save,
                )
                return total_loss(res.losses, weights), (
                    res.losses, res.env_state,
                )

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

    if impl != "shard_map":
        raise ValueError(f"impl must be 'shard_map' or 'gspmd', got {impl!r}")

    n_shards = mesh.shape[BATCH_AXIS]
    if env_cfg.batch_size % n_shards != 0:
        raise ValueError(
            f"global batch {env_cfg.batch_size} not divisible by "
            f"batch-axis size {n_shards}"
        )
    local_cfg = dataclasses.replace(
        env_cfg,
        batch_size=env_cfg.batch_size // n_shards,
        batch_axis=BATCH_AXIS,
    )

    def local_step(params, opt_state, env_state, key, weights):
        # Per-shard PRNG stream (SURVEY hard part #3): deterministic and
        # mesh-shape-reproducible, independent across shards.
        key = jax.random.fold_in(key, jax.lax.axis_index(BATCH_AXIS))

        def loss_fn(p):
            res = rollout(
                policy, p, scene, local_cfg, env_state, key,
                k=k, T=T, use_mean=use_mean,
                deterministic=deterministic, remat=remat,
                encode_once=encode_once, unroll=unroll,
                remat_save=remat_save,
            )
            return total_loss(res.losses, weights), (
                res.losses, res.env_state,
            )

        (loss, (parts, new_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        # THE collective: one fused all-reduce of the gradient tree + loss
        # + metric scalars, after the backward scan has fully accumulated
        # locally. Equal shard sizes make the mean of shard-means the
        # global mean.
        grads, loss, parts = jax.lax.pmean(
            (grads, loss, parts), BATCH_AXIS
        )
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, new_state, loss, parts

    state_spec = EnvState(
        sun_pos=P(BATCH_AXIS), errors=P(BATCH_AXIS),
        ideal_normals=P(BATCH_AXIS), target_img=P(BATCH_AXIS),
        distance_maps=P(BATCH_AXIS), ref_min=P(), ref_max=P(),
    )
    shard = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), P(), state_spec, P(), P()),
        out_specs=(P(), P(), state_spec, P(), P()),
        # rollout's scan seeds its carry with zero templates, which the
        # varying-manual-axes checker types as unvarying while the loop
        # outputs are device-varying. Enabling the checker was tried and
        # REVERTED (2026-08-20): the required pcasts on the carry seeds
        # change XLA's psum lowering — the single fused post-backward
        # gradient all-reduce splits into 10 per-layer-chunk all-reduces
        # (caught by test_collective_budget), trading the pinned
        # one-latency-hit design for scheduling this latency-bound small
        # model doesn't want. So replication checking stays off and the
        # replicated-output property is covered by the parity test
        # (tests/test_parallel.py::test_shard_map_train_step_matches_unsharded)
        # plus the collective-budget test, which would catch a diverging
        # output spec as a changed collective signature.
        check_vma=False,
    )
    return jax.jit(shard)


def make_sharded_ttt_step(
    policy: PolicyNet,
    scene: Scene,
    env_cfg: EnvConfig,
    opt: optax.GradientTransformation,
    mesh: Mesh,
    k: int,
    T: int,
    truncate_every: int | None = None,
    deterministic: bool = True,
    **ttt_kw,
) -> Callable:
    """Mesh-sharded TTT train step (shard_map, single post-backward pmean).

    Same contract as :func:`make_sharded_train_step` with
    ``impl="shard_map"`` but running :func:`doodle_tpu.train.ttt.ttt_rollout`
    (residual actions, truncated BPTT, optional test-time-compute inner
    loop) as the per-device program. The policy must be built with
    ``normalize_output=False`` (the TTT contract, ``train/ttt.py``).
    ``ttt_kw`` is forwarded to ``ttt_rollout`` (e.g. ``enable_fine``,
    ``fine_steps_per_t``).
    """
    from ..env.env import EnvState
    from ..train.ttt import ttt_rollout

    n_shards = mesh.shape[BATCH_AXIS]
    if env_cfg.batch_size % n_shards != 0:
        raise ValueError(
            f"global batch {env_cfg.batch_size} not divisible by "
            f"batch-axis size {n_shards}"
        )
    local_cfg = dataclasses.replace(
        env_cfg,
        batch_size=env_cfg.batch_size // n_shards,
        batch_axis=BATCH_AXIS,
    )

    def local_step(params, opt_state, env_state, key, weights):
        key = jax.random.fold_in(key, jax.lax.axis_index(BATCH_AXIS))

        def loss_fn(p):
            res = ttt_rollout(
                policy, p, scene, local_cfg, env_state, key,
                k=k, T=T, truncate_every=truncate_every,
                deterministic=deterministic, **ttt_kw,
            )
            parts = res.losses
            terms = jnp.stack([
                parts["alignment_loss"], parts["bound"],
                parts["mse"], parts["dist"],
            ])
            total = jnp.sum(jnp.where(weights != 0, weights * terms, 0.0))
            return total, (parts, res.env_state)

        (loss, (parts, new_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        grads, loss, parts = jax.lax.pmean(
            (grads, loss, parts), BATCH_AXIS
        )
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, new_state, loss, parts

    state_spec = EnvState(
        sun_pos=P(BATCH_AXIS), errors=P(BATCH_AXIS),
        ideal_normals=P(BATCH_AXIS), target_img=P(BATCH_AXIS),
        distance_maps=P(BATCH_AXIS), ref_min=P(), ref_max=P(),
    )
    shard = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), P(), state_spec, P(), P()),
        out_specs=(P(), P(), state_spec, P(), P()),
        check_vma=False,  # see make_sharded_train_step
    )
    return jax.jit(shard)
