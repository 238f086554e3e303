"""TTT trainer family: residual actions, truncated-BPTT, advantage-style
alignment, and test-time compute ("fine adjustment").

Capability parity with ``train_with_env_com_trunc_advantage_ttt.py``:

* **Residual action accumulation** — the policy predicts a delta that is
  added to the previous step's normals and renormalized (ref ``:241-270``);
* **Truncated BPTT** — every ``truncate_every`` steps the recurrent carry is
  detached and scaled dist/bound contributions are accumulated while mse is
  overwritten (ref ``:320-343``);
* **Advantage-style alignment** — the per-step reward-difference sum
  ``Σ_t(−align_t − (−align_{t−1}).detach())``, negated at the end
  (ref ``:325-328,355``). Note its *gradient* equals ``Σ_t ∇align_t``; only
  the reported value is baselined;
* **Test-time compute** — a persistent learnable ``fine_error_vec [B,N,3]``
  with its own Adam, ``fine_steps_per_t`` inner steps per env step
  minimizing the dist loss through extra ``env.step`` calls with the policy
  frozen (ref ``:274-315``); the inner loop is a ``lax.scan`` of
  ``jax.grad`` + optax updates, fully on-device.

The timestep loop is a static Python unroll (T ≤ ~34 in all reference
configs) with each step ``jax.checkpoint``-ed, because the truncation
boundaries, fine-adjustment windows and residual-detach rules are all
functions of the static step index — unrolling turns every branch into
straight-line XLA code with no traced conditionals.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..env import env as env_lib
from ..models.policy import PolicyNet
from ..ops.optics import normalize

__all__ = [
    "TTTRolloutResult", "ttt_rollout", "TTTConfig", "ttt_train_and_eval",
    "TTC_DELIVERY_RECIPE", "apply_ttc_delivery_recipe",
]


class TTTRolloutResult(NamedTuple):
    losses: dict[str, jax.Array]
    final_img: jax.Array
    hist: jax.Array
    mse_over_t: jax.Array          # [T]
    monitor: dict[str, jax.Array]
    imgs_over_t: jax.Array | None  # [T, B, res, res] when collected
    fine_vec: jax.Array | None     # final fine_error_vec (TTC state)
    env_state: env_lib.EnvState
    actions_over_t: jax.Array | None = None  # [T, B, N, 3] when collected


def ttt_rollout(
    policy: PolicyNet,
    params: Any,
    scene,
    cfg: env_lib.EnvConfig,
    state: env_lib.EnvState,
    key: jax.Array,
    k: int,
    T: int,
    truncate_every: int | None = None,
    detach_input: bool = False,
    enable_fine: bool = False,
    fine_adjustment_start_t: int = 6,
    fine_from_t0: bool = False,
    fine_steps_per_t: int = 10,
    fine_lr: float = 1e-4,
    # Reference TTC inner-optimizer kwargs (ref :184-185): weight_decay is
    # torch-Adam L2 (added to the raw gradient before the moment updates,
    # ref :284), grad_clip is a global-norm clip of the raw gradient
    # before the step (ref :309-310). Defaults (0.0 / None) reproduce the
    # reference defaults — plain Adam.
    fine_weight_decay: float = 0.0,
    fine_grad_clip: float | None = None,
    fine_init_eps: float = 1e-4,
    # TTC inner objective weights: loss = fine_mse_w·mse + fine_dist_w·dist.
    # (0, 1) = the reference's dist-only objective
    # (train_with_env_com_trunc_advantage_ttt.py:292). The held-out metric
    # is MSE, so the r4 TTC-gap sweep (VERDICT r3 item 4) exposes the
    # blend; floats or traced scalars both work (traced ⇒ one compile
    # serves a whole weight sweep).
    fine_mse_w=0.0,
    fine_dist_w=1.0,
    freeze_policy_during_fine: bool = True,
    test_time: bool = False,
    deterministic: bool = True,
    collect_imgs: bool = False,
    collect_actions: bool = False,
    remat: bool = True,
    remat_save: str = "none",
    fine_init: jax.Array | None = None,
    init_base: str = "none",
) -> TTTRolloutResult:
    """Run the TTT rollout. The policy should be built with
    ``normalize_output=False`` (the reference TTT net defers normalization
    to the rollout, ``train_with_env_com_trunc_advantage_ttt.py:162``);
    this function renormalizes after every residual update either way.
    """
    B = cfg.batch_size
    res = cfg.resolution
    k_reset, k_drop, k_fine = jax.random.split(key, 3)

    state, obs = env_lib.reset(scene, cfg, state, k_reset)
    img = jax.lax.stop_gradient(obs["img"])
    aux = jax.lax.stop_gradient(obs["aux"])

    hist = jnp.zeros((B, k, res, res), img.dtype).at[:, -1].set(img)
    pcarry = policy.init_carry(B)
    # init_base="none" is the reference behavior: the FIRST action is
    # normalize(delta) with no base (ref :246) — an untrained net therefore
    # starts O(1000) mrad off at large N. "ideal" (opt-in, production; set
    # by TTTConfig.residual_head together with the zero-init delta layer)
    # seeds the residual accumulation with the post-reset ideal normals, so
    # a zero-init policy's first action is exactly the aligned state.
    if init_base == "ideal":
        prev_normals = jax.lax.stop_gradient(
            state.ideal_normals.reshape(B, scene.num_heliostats, 3)
        )
    elif init_base == "none":
        prev_normals = None
    else:
        raise ValueError(f"unknown init_base {init_base!r}")

    # --- TTC state (persistent across timesteps, ref :274-283)
    # Chain order matches the reference: clip the raw gradient
    # (clip_grad_norm_ before opt.step(), ref :309-310), then add the
    # L2 term wd·θ (inside torch Adam, ref :284), then the Adam moments.
    fine_opt = optax.chain(
        *([optax.clip_by_global_norm(fine_grad_clip)]
          if fine_grad_clip is not None else []),
        *([optax.add_decayed_weights(fine_weight_decay)]
          if fine_weight_decay else []),
        optax.adam(fine_lr),
    )
    fine_vec = None
    fine_opt_state = None
    start_t = 0 if (enable_fine and fine_from_t0) else fine_adjustment_start_t

    # --- truncation bookkeeping
    trunc = truncate_every
    coeff = 1.0 / max(1, (T // trunc)) if trunc else 0.0
    acc = {
        "mse": jnp.zeros(()), "dist": jnp.zeros(()), "bound": jnp.zeros(()),
        "alignment_loss": jnp.zeros(()),
    }
    prev_reward = jnp.zeros(())

    mse_over_t = []
    imgs_over_t = []
    actions_over_t = []
    losses = None
    monitor = None
    step_keys = jax.random.split(k_drop, T)

    def policy_step(params, hist_in, aux_in, pcarry, key_t):
        rngs = None if deterministic else {"dropout": key_t}
        # Raw (unnormalized) output: the TTT policy does not normalize in-net
        # (ref :162) and the rollout adds the RAW delta to prev_normals before
        # renormalizing (ref :253) — the delta's magnitude is the step size.
        out, new_carry = policy.apply(
            params, hist_in, aux_in, pcarry,
            deterministic=deterministic,
            **({"rngs": rngs} if rngs else {}),
        )
        return out, new_carry

    if remat:
        # Same selective-remat dial as train/rollout.py: keep the named
        # conv outputs (models/encoders.py checkpoint_name tags) so the
        # backward's recompute is elementwise-only. Measured 448.6 →
        # 398.9 ms on the standard config-4 train step
        # (results/conv_train_ab.json); the TTT policy_step is the same
        # encoder under the same checkpoint.
        if remat_save == "none":
            policy_step = jax.checkpoint(policy_step)
        elif remat_save == "conv_last":
            policy_step = jax.checkpoint(
                policy_step,
                policy=jax.checkpoint_policies.save_only_these_names(
                    "conv2_out"),
            )
        elif remat_save == "convs":
            policy_step = jax.checkpoint(
                policy_step,
                policy=jax.checkpoint_policies.save_only_these_names(
                    "conv0_out", "conv1_out", "conv2_out"),
            )
        else:
            raise ValueError(
                f"remat_save must be none|conv_last|convs, got {remat_save!r}"
            )

    env_step = env_lib.step
    if remat:
        env_step = jax.checkpoint(env_step, static_argnums=(1,))

    for t in range(T):
        at_seg_start = trunc is not None and (t + 1) % trunc == 1 and t > 0
        detach_now = detach_input or at_seg_start
        hist_in = jax.lax.stop_gradient(hist) if detach_now else hist
        aux_in = jax.lax.stop_gradient(aux) if detach_now else aux

        delta, pcarry = policy_step(
            jax.lax.stop_gradient(params) if test_time else params,
            hist_in, aux_in, pcarry, step_keys[t],
        )
        if prev_normals is None:
            base_normals = normalize(delta)                 # ref :246
        else:
            base_normals = normalize(delta + prev_normals)  # ref :253
        if test_time:
            base_normals = jax.lax.stop_gradient(base_normals)
        prev_normals = base_normals
        normals_to_apply = base_normals

        # ---- test-time compute: inner optimization of fine_vec (ref :284-315)
        if enable_fine and t >= start_t:
            if fine_vec is None:
                # fine_init lets tests inject the exact initial vector the
                # reference drew (cross-implementation golden parity).
                fine_vec = (
                    jnp.asarray(fine_init, jnp.float32)
                    if fine_init is not None
                    else jax.random.uniform(
                        k_fine, base_normals.shape, base_normals.dtype,
                        -fine_init_eps, fine_init_eps,
                    )
                )
                fine_opt_state = fine_opt.init(fine_vec)

            base_for_fine = (
                jax.lax.stop_gradient(base_normals)
                if freeze_policy_during_fine else base_normals
            )

            def fine_objective(fv):
                candidate = normalize(base_for_fine + fv)
                _, inner_losses, _ = env_step(scene, cfg, state, candidate)
                return (fine_mse_w * inner_losses["mse"]
                        + fine_dist_w * inner_losses["dist"])

            def fine_inner(carry, _):
                fv, os = carry
                g = jax.grad(fine_objective)(fv)
                updates, os = fine_opt.update(g, os, fv)
                return (optax.apply_updates(fv, updates), os), None

            (fine_vec, fine_opt_state), _ = jax.lax.scan(
                fine_inner, (fine_vec, fine_opt_state), None,
                length=fine_steps_per_t,
            )
            normals_to_apply = normalize(base_normals + fine_vec)
            prev_normals = normals_to_apply

        obs_t, loss_t, monitor = env_step(scene, cfg, state, normals_to_apply)
        losses = loss_t
        if collect_actions:
            actions_over_t.append(jax.lax.stop_gradient(normals_to_apply))

        # ---- truncated-BPTT accumulation (ref :320-343)
        if trunc is not None:
            acc["alignment_loss"] = acc["alignment_loss"] + (
                -loss_t["alignment_loss"] - prev_reward
            )
            prev_reward = jax.lax.stop_gradient(-loss_t["alignment_loss"])
            if (t == T - 1) or ((t + 1) % trunc == 0):
                acc["mse"] = loss_t["mse"]
                acc["dist"] = acc["dist"] + coeff * loss_t["dist"]
                acc["bound"] = acc["bound"] + coeff * loss_t["bound"]
                pcarry = jax.tree.map(jax.lax.stop_gradient, pcarry)

        mse_over_t.append(loss_t["mse"])
        img = obs_t["img"]
        aux = obs_t["aux"]
        if collect_imgs:
            imgs_over_t.append(jax.lax.stop_gradient(img))
        hist = jnp.roll(hist, -1, axis=1).at[:, -1].set(img)

    if trunc is not None:
        out_losses = dict(acc)
        out_losses["alignment_loss"] = -acc["alignment_loss"]
    else:
        out_losses = losses

    return TTTRolloutResult(
        losses=out_losses,
        final_img=img,
        hist=hist,
        mse_over_t=jnp.stack(mse_over_t),
        monitor=monitor,
        imgs_over_t=jnp.stack(imgs_over_t) if collect_imgs else None,
        fine_vec=fine_vec,
        env_state=state,
        actions_over_t=(
            jnp.stack(actions_over_t) if collect_actions else None
        ),
    )


# ---------------------------------------------------------------------------
# TTT trainer
# ---------------------------------------------------------------------------

from .trainer import TrainConfig, _loss_weights  # noqa: E402  (cycle-free)


@dataclasses.dataclass(frozen=True)
class TTTConfig(TrainConfig):
    """TrainConfig + the TTT CLI extras
    (``train_with_env_com_trunc_advantage_ttt.py:787-862``)."""

    # TTT override of TrainConfig.remat_save="convs": the TTT rollout
    # re-encodes the k-frame raw history at every step (no encode_once —
    # its history is deliberately not always detached), so saving the
    # named conv outputs costs k·T× the standard trainer's footprint:
    # ~22 GB at config-4 TTT geometry (B=16×4, T=6, k=2) — measured OOM
    # (33.1 G vs 15.75 G HBM, r5) on a program that trains fine under
    # full remat. The standard trainer keeps "convs".
    remat_save: str = "none"
    truncate_every: int | None = 4
    fine_steps_per_t: int = 10
    fine_enabled: str = "test"      # none | test | always
    fine_lr: float = 1e-4
    # Reference TTC inner-optimizer kwargs (ref ttt :184-185,284,309-310);
    # the defaults reproduce the reference defaults (plain Adam).
    fine_weight_decay: float = 0.0
    fine_grad_clip: float | None = None
    # TTC inner-objective blend (fine_mse_w·mse + fine_dist_w·dist);
    # (0, 1) = the reference's dist-only fine loss (ref ttt :292).
    fine_mse_w: float = 0.0
    fine_dist_w: float = 1.0
    fine_adjustment_start_t: int = 6
    fine_from_t0: bool = False
    fine_init_eps: float = 1e-4
    detach_input: bool = False
    # Field offset: heliostats uniform in [√d, √d+1)² (ref ttt :371; the
    # sweep knob of run_experiments.py:59,91 — values {15, 150, 1500}).
    heliostat_distance: float = 1500.0
    extra_steps: int = 0            # test rollouts run T + extra_steps
    # Diagnostics dumps at each eval (ref :669-695,719-748): per-timestep
    # flux heatmap PNGs under <dump_dir>/step_<s>/idx_<i>/t_<t>.png and
    # per-element alignment errors as .npy. None disables.
    dump_dir: str | None = None
    dump_max_imgs: int = 4          # batch elements per dump
    deg_diff: float = 4.0           # sun-curriculum azimuth spacing
    max_deg_elevation: float = 18.0 # triangle-wave elevation amplitude
    discard_first: int = 2          # envs excluded from the interpolation avg


# The measured test-time-compute delivery recipe (r4 TTC-gap sweep,
# results/ttc_gap_sweep.json best-of-54; r5 multi-seed validation in
# results/ttc_multiseed.json): MSE inner objective instead of the
# reference's dist-only loss (ttt ref :292), a 60-step inner budget, and
# fine_lr 1e-3. Apply with ``apply_ttc_delivery_recipe`` or the CLI's
# ``--ttc_recipe delivery``. The reference defaults (spt5/lr 1e-4/dist)
# remain TTTConfig's defaults — this preset is the opt-in production
# setting, not the parity surface.
TTC_DELIVERY_RECIPE = dict(
    fine_steps_per_t=60,
    extra_steps=8,
    fine_lr=1e-3,
    fine_mse_w=1.0,
    fine_dist_w=0.0,
    fine_enabled="test",
)


def apply_ttc_delivery_recipe(cfg: TTTConfig) -> TTTConfig:
    """Return ``cfg`` with the measured TTC delivery knobs applied."""
    return dataclasses.replace(cfg, **TTC_DELIVERY_RECIPE)


def _curriculum_angles(cfg: TTTConfig) -> tuple[list[tuple[float, float]],
                                                tuple[float, float],
                                                tuple[float, float]]:
    """Per-env sun curriculum + extrapolation/interpolation test angles
    (ref ``:376-420,424-456``): azimuth marches in ``deg_diff`` steps,
    elevation follows a triangle wave of amplitude ``max_deg_elevation``."""
    angles = []
    avg_az = avg_el = 0.0
    denom = max(1, cfg.num_batches - cfg.discard_first)
    for i in range(cfg.num_batches):
        az = cfg.azimuth + i * cfg.deg_diff
        el = cfg.elevation + cfg.max_deg_elevation - abs(
            cfg.max_deg_elevation - i * cfg.deg_diff
        )
        if i >= cfg.discard_first:
            avg_az += az / denom
            avg_el += el / denom
        angles.append((az, el))
    extrap = (
        cfg.azimuth - 1.5 * cfg.deg_diff,
        cfg.elevation - 0.5 * cfg.deg_diff,
    )
    return angles, extrap, (avg_az, avg_el)


def ttt_train_and_eval(
    cfg: TTTConfig,
    scene=None,
    writer: Any = None,
    return_best_mse: bool = True,
    progress_cb=None,
) -> float:
    """The TTT training loop (ref ``:363-781``): sun-curriculum train envs,
    extrapolation + interpolation test envs, truncated-advantage objective,
    and test-time compute during evaluation. Returns best (or last)
    extrapolation-test MSE.

    Multi-host pods: same contract as ``train_and_eval`` — computations run
    on every process, console/writer/dump IO on process 0 only (TTT state
    is replicated per host, so unlike the standard trainer nothing here
    slices cross-process-sharded arrays and dumps stay enabled)."""
    import math
    import time

    import numpy as np

    from ..optim import adamp
    from .trainer import PlateauTracker, cyclic_lr, make_ttt_geometry
    from ..optim import PiecewiseConstantLR

    # Multi-host gating (parallel.launch): IO on process 0 only; the
    # train/eval computations and collective checkpoint saves run
    # everywhere. TTT state is host-replicated, so dump_dir (which
    # fetches whole arrays, no cross-process slicing) just gates off
    # non-primary hosts.
    _primary = jax.process_index() == 0
    _log = print if _primary else (lambda *a, **k: None)
    if jax.process_count() > 1 and not _primary:
        writer = None
        progress_cb = None
        cfg = dataclasses.replace(cfg, dump_dir=None)

    key = jax.random.PRNGKey(cfg.seed)
    k_geo, k_env, k_policy, k_run = jax.random.split(key, 4)

    if cfg.action_space != "normals":
        # The TTT rollout's residual action accumulation
        # (normalize(Δ + prev_normals)) is defined on unit normals; the
        # reference has no angular TTT variant either. Fail loudly rather
        # than silently training in normals mode.
        raise ValueError(
            "ttt_train_and_eval supports action_space='normals' only; "
            "use train_and_eval for the angular action space"
        )
    # residual_head in the TTT trainer maps to zero_init_head: the TTT
    # rollout already accumulates residual actions on top of the previous
    # step's normals (normalize(Δ + prev), ref
    # train_with_env_com_trunc_advantage_ttt.py:241-270), so the aux-base
    # add would double-apply — but zero-initializing the delta layer keeps
    # the same "start aligned" property: the first rollout action equals
    # the env's init_actions (ideal + noise) instead of O(1) net noise
    # (≈1300 mrad off at N=500; measured, results/RESULTS.md).

    if scene is None:
        scene = make_ttt_geometry(
            cfg.num_heliostats, cfg.heliostat_distance, k_geo
        )
    N = scene.num_heliostats

    def env_cfg_for(az, el, batch, new_sun=False, new_err=False):
        return env_lib.EnvConfig(
            resolution=cfg.resolution,
            batch_size=batch,
            sigma_scale=cfg.sigma_scale,
            error_scale_mrad=cfg.error_scale_mrad,
            new_sun_pos_every_reset=new_sun,
            new_errors_every_reset=new_err,
            use_error_mask=cfg.use_error_mask,
            error_mask_ratio=cfg.error_mask_ratio,
            azimuth=az,
            elevation=el,
            half_angle_deg=cfg.half_angle_deg,
            single_sun=cfg.single_sun,
            exponential_risk=cfg.exponential_risk,
            precision=cfg.precision,
            splat_backend=cfg.splat_backend,
        )

    angles, (ex_az, ex_el), (in_az, in_el) = _curriculum_angles(cfg)
    if writer is not None and hasattr(writer, "log_params"):
        # The reference logs the sun-curriculum geometry into MLflow params
        # (ttt :500-513) so runs are identifiable by their sun setup.
        writer.log_params({
            "train_sun_angles_azel": angles,
            "extrapolation_angles_azel": (ex_az, ex_el),
            "interpolation_angles_azel": (in_az, in_el),
        })
    env_keys = jax.random.split(k_env, cfg.num_batches + 2)
    base_cfg = env_cfg_for(
        angles[0][0], angles[0][1], cfg.batch_size,
        cfg.new_sun_pos_every_reset, cfg.new_errors_every_reset,
    )
    states = [
        env_lib.init_state(
            scene,
            env_cfg_for(az, el, cfg.batch_size,
                        cfg.new_sun_pos_every_reset, cfg.new_errors_every_reset),
            env_keys[i],
        )
        for i, (az, el) in enumerate(angles)
    ]
    train_states = jax.tree.map(lambda *xs: jnp.stack(xs), *states)

    test_B = min(cfg.test_size, cfg.batch_size)
    test_cfg_ex = env_cfg_for(ex_az, ex_el, test_B)
    test_cfg_in = env_cfg_for(in_az, in_el, test_B)
    test_state_ex = env_lib.init_state(scene, test_cfg_ex, env_keys[-2])
    test_state_in = env_lib.init_state(scene, test_cfg_in, env_keys[-1])

    policy = PolicyNet(
        num_heliostats=N,
        architecture=cfg.architecture,
        encoder=cfg.encoder,
        lstm_hid=cfg.lstm_hid,
        transformer_layers=cfg.transformer_layers,
        transformer_heads=cfg.transformer_heads,
        dropout=cfg.dropout,
        encoder_dtype=cfg.encoder_dtype,
        encoder_stride=cfg.encoder_stride,
        encoder_gelu_approximate=cfg.encoder_gelu == "tanh",
        normalize_output=False,     # rollout renormalizes (ref :162)
        zero_init_head=getattr(cfg, "residual_head", False),
    )
    # With the zero-init delta the rollout must also seed the residual
    # accumulation at the ideal normals (the reference's first step is
    # normalize(delta) with no base, ref :246 — degenerate for a zero
    # delta and ~1500 mrad off for an untrained one at N=500).
    init_base = "ideal" if getattr(cfg, "residual_head", False) else "none"
    # Batch-1 init: parameter shapes are batch-independent, and a full-batch
    # init eagerly allocates the CNN activations (OOM at large B·res).
    dummy_img = jnp.zeros((1, cfg.k, cfg.resolution, cfg.resolution))
    dummy_aux = jnp.zeros((1, 3 + N * 3))
    params = policy.init(
        k_policy, dummy_img, dummy_aux, policy.init_carry(1)
    )
    from .trainer import _apply_param_init
    params = _apply_param_init(cfg, params, k_policy)

    def make_opt(learning_rate):
        return optax.chain(
            optax.clip_by_global_norm(cfg.grad_clip),
            adamp(learning_rate, weight_decay=cfg.weight_decay),
        )

    opt = optax.inject_hyperparams(make_opt)(learning_rate=cfg.lr)
    opt_state = opt.init(params)

    train_fine = cfg.fine_enabled == "always"
    test_fine = cfg.fine_enabled in ("test", "always")

    @jax.jit
    def train_step(params, opt_state, states, key, weights):
        def loss_fn(p):
            keys = jax.random.split(key, cfg.num_batches)
            results = jax.vmap(
                lambda s, k: ttt_rollout(
                    policy, p, scene, base_cfg, s, k,
                    k=cfg.k, T=cfg.T,
                    truncate_every=cfg.truncate_every,
                    detach_input=cfg.detach_input,
                    enable_fine=train_fine,
                    fine_steps_per_t=cfg.fine_steps_per_t,
                    fine_lr=cfg.fine_lr,
                    fine_weight_decay=cfg.fine_weight_decay,
                    fine_grad_clip=cfg.fine_grad_clip,
                    fine_adjustment_start_t=cfg.fine_adjustment_start_t,
                    fine_from_t0=cfg.fine_from_t0,
                    fine_init_eps=cfg.fine_init_eps,
                    fine_mse_w=cfg.fine_mse_w,
                    fine_dist_w=cfg.fine_dist_w,
                    remat_save=cfg.remat_save,
                    deterministic=False,
                    init_base=init_base,
                )
            )(states, keys)
            parts = jax.tree.map(jnp.mean, results.losses)
            # where-guarded so a zero weight truly drops its term: with
            # exponential_risk the bound can overflow to inf, and 0 * inf
            # would otherwise poison the whole loss with NaN.
            terms = jnp.stack([
                parts["alignment_loss"], parts["bound"],
                parts["mse"], parts["dist"],
            ])
            total = jnp.sum(jnp.where(weights != 0, weights * terms, 0.0))
            return total, (parts, results.env_state)

        (loss, (parts, new_states)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        # One stacked scalar vector → one device→host fetch per step
        # (each float() costs a ~30-40 ms axon-tunnel round trip).
        scalars = jnp.stack([
            loss, parts["alignment_loss"], parts["bound"],
            parts["mse"], parts["dist"],
        ])
        return params, opt_state, new_states, scalars

    collect = cfg.dump_dir is not None

    @jax.jit
    def eval_step(params, state, key):
        res = ttt_rollout(
            policy, params, scene, test_cfg_ex, state, key,
            k=cfg.k, T=cfg.T + cfg.extra_steps,
            truncate_every=cfg.truncate_every,
            detach_input=cfg.detach_input,
            enable_fine=test_fine,
            fine_steps_per_t=cfg.fine_steps_per_t,
            fine_lr=cfg.fine_lr,
            fine_weight_decay=cfg.fine_weight_decay,
            fine_grad_clip=cfg.fine_grad_clip,
            fine_adjustment_start_t=cfg.fine_adjustment_start_t,
            fine_from_t0=cfg.fine_from_t0,
            fine_init_eps=cfg.fine_init_eps,
            fine_mse_w=cfg.fine_mse_w,
            fine_dist_w=cfg.fine_dist_w,
            test_time=True,
            deterministic=True,
            collect_imgs=collect,
            init_base=init_base,
        )
        return res.losses, res.mse_over_t, res.imgs_over_t, res.monitor

    @jax.jit
    def eval_step_interp(params, state, key):
        res = ttt_rollout(
            policy, params, scene, test_cfg_in, state, key,
            k=cfg.k, T=cfg.T + cfg.extra_steps,
            truncate_every=cfg.truncate_every,
            detach_input=cfg.detach_input,
            enable_fine=test_fine,
            fine_steps_per_t=cfg.fine_steps_per_t,
            fine_lr=cfg.fine_lr,
            fine_weight_decay=cfg.fine_weight_decay,
            fine_grad_clip=cfg.fine_grad_clip,
            fine_adjustment_start_t=cfg.fine_adjustment_start_t,
            fine_from_t0=cfg.fine_from_t0,
            fine_init_eps=cfg.fine_init_eps,
            fine_mse_w=cfg.fine_mse_w,
            fine_dist_w=cfg.fine_dist_w,
            test_time=True,
            deterministic=True,
            init_base=init_base,
        )
        return res.losses, res.mse_over_t

    def _dump_eval(step_i, imgs_over_t, monitor):
        """Flux-heatmap PNGs + alignment-error .npy (ref :669-695)."""
        import pathlib

        from PIL import Image

        base = pathlib.Path(cfg.dump_dir) / f"step_{step_i}"
        imgs = np.asarray(imgs_over_t)                 # [T, B, res, res]
        hi = max(float(imgs.max()), 1e-6)
        for i in range(min(cfg.dump_max_imgs, imgs.shape[1])):
            d = base / f"idx_{i}"
            d.mkdir(parents=True, exist_ok=True)
            for t in range(imgs.shape[0]):
                arr = np.clip(imgs[t, i] / hi, 0.0, 1.0)
                Image.fromarray((arr * 255).astype(np.uint8)).save(
                    d / f"t_{t}.png"
                )
        np.save(base / "alignment_errors.npy",
                np.asarray(monitor["alignment_errors"]))

    plateau = PlateauTracker(cfg.lr, cfg.scheduler_patience, cfg.scheduler_factor)
    cyc = cyclic_lr(1e-5, cfg.lr, cfg.step_size_up, cfg.step_size_down,
                    mode=cfg.scheduler_mode, gamma=cfg.scheduler_gamma)
    pw = (
        PiecewiseConstantLR.parse(cfg.lr, cfg.scheduler_milestones)
        if cfg.scheduler == "piecewise" else None
    )
    sched_count = 0
    lr = cfg.lr
    last_bound = math.inf
    prev_loss: float | None = None
    last_mse = best_mse = None
    pretrain = cfg.alignment_pretrain_steps
    run_key = k_run
    t_start = time.time()
    start_step = 0

    if cfg.checkpoint_dir:
        import pathlib

        from ..utils.checkpoint import restore_checkpoint

        latest = pathlib.Path(cfg.checkpoint_dir) / "latest"
        if latest.exists():
            ck = restore_checkpoint(
                str(latest),
                target={"params": params, "opt_state": opt_state,
                        "step": jnp.asarray(0), "lr": jnp.asarray(0.0)},
            )
            params, opt_state = ck["params"], ck["opt_state"]
            start_step = int(ck["step"]) + 1
            lr = float(ck["lr"])
            sched_count = max(
                0, cfg.num_batches * start_step - cfg.warmup_steps - pretrain
            )
            _log(f"resumed from {latest} at step {start_step}")

    def process(item) -> bool:
        """Consume one completed step's outputs; True on NaN abort. Under
        ``pipeline_host`` this runs after the next step is dispatched, so
        the scalar fetch overlaps device compute (see trainer.py)."""
        nonlocal lr, last_bound, last_mse, best_mse, prev_loss, sched_count
        step_i, scalars, p_params, p_opt_state, k_ev = item
        loss_f, align_f, bound_f, mse_f, dist_f = (
            float(v) for v in np.asarray(scalars)
        )
        last_bound = bound_f
        # Advantage baseline (ref :579-588): value-level only — subtracting a
        # detached scalar does not change gradients.
        objective = loss_f if prev_loss is None else loss_f - prev_loss
        prev_loss = loss_f

        if not math.isfinite(loss_f):
            _log(f"NaN loss at step {step_i} (lr {lr:.2e}); bailing out")
            return True

        if cfg.num_batches * step_i > cfg.warmup_steps + pretrain:
            sched_count += 1
            if cfg.scheduler == "plateau":
                lr = plateau.step(mse_f)
            elif cfg.scheduler == "cyclic":
                lr = float(cyc(sched_count))
            elif cfg.scheduler == "exp":
                lr = lr * cfg.exp_decay
            elif cfg.scheduler == "piecewise":
                lr = pw.step()
            opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)

        if writer is not None:
            writer.add_scalar("loss/total", loss_f, step_i)
            writer.add_scalar("loss/objective", objective, step_i)
            writer.add_scalar("loss/mse", mse_f, step_i)
            writer.add_scalar("loss/dist", dist_f, step_i)
            writer.add_scalar("loss/bound", bound_f, step_i)
            writer.add_scalar("hyperparams/lr", lr, step_i)
            if timer.steps_per_s > 0:
                writer.add_scalar("perf/steps_per_s", timer.steps_per_s, step_i)

        if step_i % cfg.log_every == 0 or step_i == cfg.steps - 1:
            _log(
                f"Step {step_i} | loss {loss_f:.4f} | obj {objective:.4f} | "
                f"mse {mse_f:.2e} | "
                f"align {align_f:.2e} | lr {lr:.6f} | "
                f"{time.time() - t_start:.0f}s"
            )

        if step_i % cfg.eval_every == 0 or step_i == cfg.steps - 1:
            ex_losses, _, ex_imgs, ex_mon = eval_step(
                p_params, test_state_ex, k_ev
            )
            in_losses, _ = eval_step_interp(p_params, test_state_in, k_ev)
            if collect:
                _dump_eval(step_i, ex_imgs, ex_mon)
            test_mse = float(ex_losses["mse"])
            last_mse = test_mse
            best_mse = test_mse if best_mse is None else min(best_mse, test_mse)
            _log(
                f"[{step_i:4d}] extrap_mse {test_mse:.2e} "
                f"interp_mse {float(in_losses['mse']):.2e}"
            )
            if writer is not None:
                writer.add_scalar("mse/test_extrapolation", test_mse, step_i)
                writer.add_scalar(
                    "mse/test_interpolation", float(in_losses["mse"]), step_i
                )

        if cfg.checkpoint_dir and (
            (step_i + 1) % cfg.checkpoint_every == 0
            or step_i == cfg.steps + pretrain - 1
        ):
            import pathlib

            from ..utils.checkpoint import policy_meta, save_checkpoint

            save_checkpoint(
                str(pathlib.Path(cfg.checkpoint_dir) / "latest"),
                {"params": p_params, "opt_state": p_opt_state,
                 "step": jnp.asarray(step_i), "lr": jnp.asarray(lr)},
                meta={"policy": policy_meta(policy),
                      "batch_size": cfg.batch_size,
                      "config": dataclasses.asdict(cfg)},
            )

        if progress_cb is not None:
            progress_cb(step_i, {"loss": loss_f, "objective": objective,
                                 "lr": lr, "test_mse": last_mse})
        return False

    # Profiler capture + steps/s metering, same contract as the standard
    # trainer (TrainConfig.profile_dir/profile_steps).
    from ..utils.profiling import StepTimer

    timer = StepTimer(skip=1 + start_step)
    profile_start = start_step + 2
    tracing = False
    pending = None
    for step_i in range(start_step, cfg.steps + pretrain):
        if cfg.profile_dir and step_i == profile_start:
            jax.profiler.start_trace(cfg.profile_dir)
            tracing = True
        run_key, k_step, k_ev = jax.random.split(run_key, 3)
        weights = _loss_weights(cfg, cfg.num_batches * step_i, last_bound)
        params, opt_state, train_states, scalars = train_step(
            params, opt_state, train_states, k_step, jnp.asarray(weights)
        )
        item = (step_i, scalars, params, opt_state, k_ev)
        if cfg.pipeline_host:
            item, pending = pending, item
            if item is None:
                continue
        aborted = process(item)
        timer.tick()
        if tracing and step_i >= profile_start + cfg.profile_steps:
            jax.profiler.stop_trace()
            tracing = False
        if aborted:
            pending = None
            break
    if tracing:
        jax.profiler.stop_trace()
    if pending is not None:
        process(pending)

    if writer is not None and hasattr(writer, "close"):
        writer.close()
    if last_mse is None:
        return math.nan
    return best_mse if return_best_mse else last_mse
