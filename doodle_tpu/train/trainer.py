"""train_and_eval — the standard policy trainer.

Capability parity with the reference trainer (``train_with_env.py:219-498``):
same geometry recipe, env family, AdamP(+clip) optimization, scheduler
choices, the alignment-pretrain → boundary-warmup → blended-mse/dist loss
schedule, NaN bailout, periodic test evaluation, and best-test-MSE return
for HPO.

TPU-first re-design:
  * the ``num_batches`` train environments are a *stacked* ``EnvState`` pytree
    (leading axis = env index) and the per-env rollouts run under ``vmap`` —
    one compiled program instead of a Python loop of env objects;
  * the whole optimization step (num_batches rollouts → weighted loss → grad
    → clip → AdamP) is ONE jitted function; the loss-phase schedule enters as
    a 4-vector of weights and the LR via ``optax.inject_hyperparams``, so no
    phase change ever recompiles;
  * scheduler logic (exp/cyclic/plateau) and the NaN bailout live on the
    host, exactly where the reference keeps them.
"""

from __future__ import annotations

import dataclasses
import math
import time
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.scene import Scene, make_scene
from ..env import env as env_lib
from ..models.policy import PolicyNet
from ..optim import PiecewiseConstantLR, adamp, cyclic_lr
from .rollout import rollout

__all__ = [
    "TrainConfig",
    "train_and_eval",
    "make_reference_geometry",
    "make_angular_geometry",
    "make_ttt_geometry",
    "PlateauTracker",
]


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Mirror of the reference CLI surface (``train_with_env.py:504-567``)."""

    num_heliostats: int = 50
    error_scale_mrad: float = 90.0
    batch_size: int = 25
    num_batches: int = 1
    steps: int = 5000
    T: int = 4
    k: int = 4
    lr: float = 2e-4
    grad_clip: float = 1e-7          # reference default — yes, 1e-7
    architecture: str = "lstm"
    encoder: str = "cnn"
    encoder_dtype: str | None = None   # "bfloat16" for fast MXU convs
    # First-conv stride of the CNN encoder. 1 = the reference architecture
    # (stride-1 5×5 convs at full res, train_with_env.py:42-49) — the
    # parity default. 2 = ~4× fewer encoder FLOPs (the trainer's dominant
    # cost at scale), opt-in production knob; checkpoints stay loadable
    # across settings (conv param shapes are stride-independent).
    encoder_stride: int = 1
    # GELU flavor for the conv activations — "tanh" (default) is the
    # production knob: measured 843 vs 1549 ms/config-4-train-step (1.84×,
    # v5e 2026-08-20) against "erf" (torch's exact form, the model-level
    # parity default), at ≤3e-4 absolute activation delta — below the bf16
    # conv quantization. Mirrors precision="default" here vs FieldConfig's
    # "highest": trainer = production defaults, core models = parity.
    encoder_gelu: str = "tanh"
    # Opt-in residual head: the policy predicts a zero-initialized delta on
    # the ideal normals carried in aux, starting exactly aligned (see
    # models/policy.py PolicyNet.residual_head). Breaks the N=500 alignment
    # plateau (the binding constraint on flux learning at config-4 scale —
    # results/RESULTS.md flux-boundary section) by making the
    # alignment-pretrain phase unnecessary. False = reference head.
    residual_head: bool = False
    lstm_hid: int = 128
    transformer_layers: int = 2
    transformer_heads: int = 8
    dropout: float = 0.1
    use_mean: bool = False
    scheduler: str = "exp"           # plateau | cyclic | exp | piecewise | none
    scheduler_patience: int = 50
    scheduler_factor: float = 0.27
    scheduler_mode: str = "triangular2"
    scheduler_gamma: float = 0.99
    # "step:lr,step:lr,..." spec for scheduler="piecewise" — the reference
    # ships PiecewiseConstantLR but never wires it into a trainer
    # (train_with_env.py:12 imports it "for testing purposes"); here it is a
    # working option.
    scheduler_milestones: str = "0:5e-4,10000:1e-4,50000:3e-5"
    exp_decay: float = 1.8
    step_size_up: int = 300
    step_size_down: int = 1000
    boundary_thresh: float = 5e-3
    anti_spill: float = 1.5e4
    dist_f: float = 1.0e4
    mse_f: float = 1.0
    alignment_f: float = 100.0
    new_errors_every_reset: bool = False
    new_sun_pos_every_reset: bool = False
    warmup_steps: int = 40
    alignment_pretrain_steps: int = 100
    seed: int = 42
    use_error_mask: bool = False
    error_mask_ratio: float = 0.2
    resolution: int = 128
    sigma_scale: float = 0.01        # trainer passes 0.01 (ref :241)
    azimuth: float | None = 45.0
    elevation: float | None = 45.0
    half_angle_deg: float = 2.0
    single_sun: bool = False
    exponential_risk: bool = False
    # "normals" (current generation) or "angles" — the angular action-space
    # variant (env: newenv/test_environment_angular.py; trainer:
    # newenv/train_with_env_angular.py, unrunnable as shipped — see
    # models/policy.py).
    action_space: str = "normals"
    test_size: int = 60
    eval_every: int = 100
    log_every: int = 25
    weight_decay: float = 1e-5
    # Optimizer family. "adamp" is the production path (ref
    # ``train_with_env.py:293``). "dominant_adam" reproduces the
    # multi-objective legacy trainer (``newenv/train_agent_multi_error_seq_
    # multi_obj.py:188-196``): each loss term gets its own gradient and only
    # the largest-ℓ2-norm one steps; its schedule is phase-free (see
    # ``_loss_weights``) and the chosen objective index is logged.
    # "smoothed_adam" reproduces the MC-smoothed closure trainer
    # (``newenv/train_agent_multi_error_seq_smooth_adam.py:168-203``):
    # gradients averaged over ``smooth_samples`` uniform parameter
    # perturbations of width ``smooth_width``. Both legacy optimizers clip
    # at ``grad_clip``; their reference defaults clip at 1.0, so pass
    # ``grad_clip=1.0`` to reproduce them (this dataclass's 1e-7 default is
    # the standard trainer's AdamP setting).
    optimizer: str = "adamp"
    smooth_width: float = 0.01
    smooth_samples: int = 5
    # Parameter-init distributions. "flax" = flax defaults (lecun-normal
    # kernels, zero biases). "torch" = torch module defaults (Linear/Conv
    # kernel AND bias ~ U(±1/√fan_in), LSTM ~ U(±1/√hidden)) — the
    # distributions the reference policy actually starts from
    # (train_with_env.py:39-55,58-166, implicit in the torch modules), and
    # the named setting of the 5-seed learning-curve parity rule: the flax
    # start is "colder" and costs an ~15-step early transient (83% vs 99%
    # not-worse — results/RESULTS.md). Under residual_head/zero_init_head
    # the zero-initialized output layer is left untouched (its
    # start-exactly-aligned contract needs exact zeros).
    param_init: str = "flax"
    # Reference quirk (behavior, not bug): the loss schedule is frozen to
    # "alignment always" by an `if True:` (train_with_env.py:346-356).
    # True reproduces the frozen behavior; False enables the documented
    # pretrain→warmup→blend schedule.
    alignment_always: bool = False
    # Encode each frame once when it enters the k-history instead of
    # re-encoding all k frames per step (train/rollout.py): gradient-exact,
    # k× fewer CNN FLOPs. False reproduces the reference's re-encoding
    # schedule (fresh dropout mask per step×frame).
    encode_once: bool = True
    # Overlap the per-step device→host scalar fetch + host work with the
    # next step's device compute (dispatch-then-process). Scheduler and
    # boundary-phase weights react one step later than the reference's
    # serial loop; False restores strictly serial sequencing. Auto-disabled
    # for scheduler="plateau" — the one scheduler whose decisions are
    # metric-dependent, where the one-step delay is most visible (the
    # others are step-indexed, so the delay only shifts WHEN a
    # predetermined lr lands, and the phase weights are constant under the
    # shipped alignment_always behavior).
    pipeline_host: bool = True
    # lax.scan unroll for the rollout. None = auto: fully unroll on the CPU
    # backend (XLA:CPU runs while-body ops on a slow serial path — the scan
    # backward is ~60× slower than the unrolled equivalent); unroll
    # min(T, 4) on accelerators (cross-step scheduling: 399.3 → 346.3 ms
    # at config 4, results/unroll_probe.json). Int/True to force.
    scan_unroll: int | None = None
    # Selective rematerialization: which named encoder intermediates the
    # rollout checkpoint KEEPS instead of recomputing in the backward
    # (train/rollout.py). "convs" (default) keeps all three conv outputs —
    # the backward recompute is elementwise-only, measured 448.6 → 398.9
    # ms on the config-4 train step (results/conv_train_ab.json) at
    # ~B·(T+1)·res²·224·2 bytes of HBM (~9.4 GB at config-4 B=64 — fits
    # the 16 GB v5e). Drop to "conv_last" or "none" (classic full remat,
    # minimum memory) if a bigger batch/resolution OOMs.
    remat_save: str = "convs"
    precision: str = "default"
    # Splat backend for all envs: "auto" picks the fused Pallas kernel for
    # large fields and the XLA separable path below (see FieldConfig).
    splat_backend: str = "auto"
    # Checkpoint/resume (new capability — the reference never persists model
    # state, SURVEY §5): save (params, opt_state, step, lr) every
    # checkpoint_every steps and resume from the latest on restart.
    checkpoint_dir: str | None = None
    checkpoint_every: int = 500
    # Profiling (new capability — SURVEY §5: the reference records only
    # wall-clock seconds): capture a ``jax.profiler`` trace of
    # ``profile_steps`` steady-state steps (starting 2 steps after
    # resume/compile) into ``profile_dir``; view in XProf/TensorBoard.
    profile_dir: str | None = None
    profile_steps: int = 5
    # Data-parallel training (new capability — the reference is single-GPU):
    # shard the env batch of every train env over all visible devices
    # (GSPMD: params/opt replicated, batch split, gradient psum over ICI).
    # batch_size is the GLOBAL batch and must divide by the device count.
    # False = single-device jit (identical program, no placement constraints).
    data_parallel: bool = False


class PlateauTracker:
    """Host-side ReduceLROnPlateau ('min' mode), matching torch semantics:
    multiply LR by ``factor`` after ``patience`` non-improving steps."""

    def __init__(self, lr: float, patience: int, factor: float) -> None:
        self.lr = lr
        self.patience = patience
        self.factor = factor
        self.best = math.inf
        self.bad = 0

    def step(self, metric: float) -> float:
        if metric < self.best:
            self.best = metric
            self.bad = 0
        else:
            self.bad += 1
            if self.bad > self.patience:
                self.lr *= self.factor
                self.bad = 0
        return self.lr


def make_reference_geometry(
    num_heliostats: int, key: jax.Array
) -> Scene:
    """The trainer's geometry recipe (``train_with_env.py:227-230``):
    heliostats uniform in [80, 90)² on the ground plane (z=0), receiver at
    (0, −5, 0) facing +Y, 15×15 m."""
    pos = jax.random.uniform(key, (num_heliostats, 3)) * 10.0 + 80.0
    pos = pos.at[:, 2].set(0.0)
    return make_scene(pos, [0.0, -5.0, 0.0], [0.0, 1.0, 0.0])


def make_angular_geometry(num_heliostats: int, key: jax.Array) -> Scene:
    """The angular trainer's near-field geometry
    (``newenv/train_with_env_angular.py:309``): heliostats uniform in
    [0, 10)² on the ground plane (z=0) — close to the receiver, so
    tanh-bounded ±50 mrad tilts of north-pointing normals are a usable
    action space. Receiver at (0, −5, 0) facing +Y, 15×15 m."""
    pos = jax.random.uniform(key, (num_heliostats, 3)) * 10.0
    pos = pos.at[:, 2].set(0.0)
    return make_scene(pos, [0.0, -5.0, 0.0], [0.0, 1.0, 0.0])


def make_ttt_geometry(
    num_heliostats: int, heliostat_distance: float, key: jax.Array
) -> Scene:
    """The TTT trainer's geometry recipe
    (``train_with_env_com_trunc_advantage_ttt.py:371-374``): heliostats
    uniform in [√d, √d+1)² on the ground plane (z=0), receiver at
    (0, −5, 0) facing +Y, 15×15 m. ``heliostat_distance`` is the swept
    field-offset knob (``run_experiments.py:59,91``)."""
    pos = jax.random.uniform(key, (num_heliostats, 3)) + math.sqrt(
        heliostat_distance
    )
    pos = pos.at[:, 2].set(0.0)
    return make_scene(pos, [0.0, -5.0, 0.0], [0.0, 1.0, 0.0])


def _loss_weights(cfg: TrainConfig, global_i: int, last_bound: float) -> np.ndarray:
    """Host-side loss-phase schedule → (w_align, w_bound, w_mse, w_dist).

    Phases (ref ``train_with_env.py:331-368``): alignment pretrain for
    ``alignment_pretrain_steps`` micro-steps, boundary-only during warmup or
    while the boundary loss exceeds ``boundary_thresh``, then
    mse·(1−decay) + dist·decay with decay falling linearly to 1e-5 over 80%
    of the active steps.
    """
    if cfg.optimizer == "dominant_adam":
        # The multi-objective legacy trainer is phase-free (``newenv/
        # train_agent_multi_error_seq_multi_obj.py:187-193``): from step 0
        # the objectives are [mse·(1−decay+1e-5), dist_f·dist·decay,
        # anti_spill·bound] with decay falling linearly over 80% of steps.
        cutoff = max(1, int(0.8 * cfg.steps))
        eff = global_i // max(1, cfg.num_batches)
        decay = max(1e-5, (cutoff - eff) / cutoff)
        return np.array(
            [0.0, cfg.anti_spill, cfg.mse_f * (1.0 - decay + 1e-5),
             cfg.dist_f * decay],
            np.float32,
        )
    # The angular trainer has no alignment phase at all (its env generation
    # predates the alignment loss; schedule at
    # ``newenv/train_with_env_angular.py:404-416`` is warmup/boundary-lock →
    # mse/dist blend only).
    pre = 0 if cfg.action_space == "angles" else cfg.alignment_pretrain_steps
    warm = cfg.warmup_steps
    if cfg.action_space != "angles" and (
        cfg.alignment_always or global_i < pre
    ):
        return np.array([cfg.alignment_f, 0.0, 0.0, 0.0], np.float32)
    if global_i < pre + warm or last_bound > cfg.boundary_thresh:
        return np.array([0.0, cfg.anti_spill, 0.0, 0.0], np.float32)
    active = max(1, cfg.steps - cfg.warmup_steps)
    cutoff = int(0.8 * active)
    eff = global_i // max(1, cfg.num_batches) - warm - pre
    decay = max(1e-5, (cutoff - eff) / cutoff)
    return np.array(
        [0.0, 0.0, cfg.mse_f * (1.0 - decay + 1e-5), cfg.dist_f * decay],
        np.float32,
    )


def _apply_param_init(cfg: "TrainConfig", params, key):
    """Apply ``cfg.param_init`` to freshly initialized policy params.

    "torch" resamples with the reference's implicit torch-module defaults
    (models/init.py); the zero-initialized output layer of
    residual_head/zero_init_head policies is excluded — its
    start-exactly-aligned contract requires exact zeros."""
    if cfg.param_init == "flax":
        return params
    if cfg.param_init != "torch":
        raise ValueError(
            f"param_init must be 'flax' or 'torch', got {cfg.param_init!r}"
        )
    from ..models.init import torch_default_init

    exclude = ("Dense_1",) if cfg.residual_head else ()
    return torch_default_init(
        params, jax.random.fold_in(key, 0x70726368), exclude=exclude
    )


class _ScalarOnlyWriter:
    """Multi-process writer shim: forwards scalars, hides ``add_images``.

    The image fetch slices a batch-sharded array; across processes that
    slice is a collective every host would have to join, so under
    multi-process runs the trainer logs scalars (replicated, locally
    addressable) and skips images."""

    def __init__(self, inner):
        self._inner = inner

    def add_scalar(self, *a, **k):
        return self._inner.add_scalar(*a, **k)

    def close(self):
        if hasattr(self._inner, "close"):
            self._inner.close()


def train_and_eval(
    cfg: TrainConfig,
    scene: Scene | None = None,
    writer: Any = None,
    monitor_cb: Callable[[int, dict], None] | None = None,
    return_best_mse: bool = True,
    progress_cb: Callable[[int, dict], None] | None = None,
    init_transform: Callable[[Any], Any] | None = None,
) -> float:
    """Train the policy; returns best (or last) test MSE — the HPO objective.

    ``init_transform(params) -> params``: optional hook applied to the
    freshly initialized policy params (warm starts, alternative init
    distributions — e.g. the parity harness's torch-style init).

    ``writer``: optional MLflow/TensorBoard-style object with
    ``add_scalar(tag, value, step)`` / ``add_images(...)``.
    ``monitor_cb(step, monitor)``: optional hook for 3-D diagnostics dumps.

    Multi-host pods (``parallel.launch.initialize_distributed`` already
    called): every process runs the same loop — computations (train/eval
    steps, orbax checkpoint saves, which are collective) execute on all
    hosts; console lines, writer scalars, and ``progress_cb`` fire on
    process 0 only. With ``data_parallel`` (the pod configuration), monitor
    dumps and image logging are additionally disabled on every process:
    they slice batch-sharded arrays, and slicing a cross-process-sharded
    array is itself a collective that a primary-only guard would deadlock.
    Without ``data_parallel`` the arrays are process-local, so process 0
    keeps its 3-D diagnostics.
    """
    _primary = jax.process_index() == 0
    _log = print if _primary else (lambda *a, **k: None)
    if jax.process_count() > 1:
        if not _primary:
            writer = None
            progress_cb = None
            monitor_cb = None
        if cfg.data_parallel:
            # cross-process-sharded batch: slicing for dumps/images is a
            # collective — a primary-only call would deadlock the pod.
            monitor_cb = None
            if writer is not None:
                writer = _ScalarOnlyWriter(writer)

    key = jax.random.PRNGKey(cfg.seed)
    k_geo, k_env, k_policy, k_run = jax.random.split(key, 4)

    if scene is None:
        scene = (
            make_angular_geometry(cfg.num_heliostats, k_geo)
            if cfg.action_space == "angles"
            else make_reference_geometry(cfg.num_heliostats, k_geo)
        )
    N = scene.num_heliostats

    env_cfg = env_lib.EnvConfig(
        resolution=cfg.resolution,
        batch_size=cfg.batch_size,
        sigma_scale=cfg.sigma_scale,
        error_scale_mrad=cfg.error_scale_mrad,
        new_sun_pos_every_reset=cfg.new_sun_pos_every_reset,
        new_errors_every_reset=cfg.new_errors_every_reset,
        use_error_mask=cfg.use_error_mask,
        error_mask_ratio=cfg.error_mask_ratio,
        azimuth=cfg.azimuth,
        elevation=cfg.elevation,
        half_angle_deg=cfg.half_angle_deg,
        single_sun=cfg.single_sun,
        exponential_risk=cfg.exponential_risk,
        precision=cfg.precision,
        splat_backend=cfg.splat_backend,
        action_space=cfg.action_space,
    )

    # ---- stacked train env states sharing env 0's suns (ref :253-256)
    env_keys = jax.random.split(k_env, cfg.num_batches + 1)
    state0 = env_lib.init_state(scene, env_cfg, env_keys[0])
    states = [state0]
    for i in range(1, cfg.num_batches):
        si = env_lib.init_state(scene, env_cfg, env_keys[i])
        states.append(state0.replace(errors=si.errors))
    train_states = jax.tree.map(lambda *xs: jnp.stack(xs), *states)

    # ---- test env: train suns (first test_size), own fixed errors (ref :259-276)
    test_B = min(cfg.test_size, cfg.batch_size)
    test_cfg = dataclasses.replace(
        env_cfg,
        batch_size=test_B,
        new_sun_pos_every_reset=False,
        new_errors_every_reset=False,
    )
    test_state = env_lib.init_state(scene, test_cfg, env_keys[-1])
    test_state = env_lib.set_sun_pos(
        scene, test_cfg, test_state, state0.sun_pos[:test_B], env_keys[-1]
    )

    # ---- policy + optimizer
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
        action_space=cfg.action_space,
        residual_head=cfg.residual_head,
    )
    # Init on a batch-1 dummy: parameter shapes are batch-independent, and
    # initializing at the real batch eagerly allocates the full CNN
    # activations (B·k frames at res² — several GB at config-4 scale, an
    # instant OOM that the remat'd train step itself never hits).
    dummy_img = jnp.zeros((1, cfg.k, cfg.resolution, cfg.resolution))
    dummy_aux = jnp.zeros((1, 3 + N * 3))
    params = policy.init(
        k_policy, dummy_img, dummy_aux, policy.init_carry(1)
    )
    params = _apply_param_init(cfg, params, k_policy)
    if init_transform is not None:
        params = init_transform(params)

    def make_opt(learning_rate):
        if cfg.optimizer == "dominant_adam":
            from ..optim import dominant_adam

            return dominant_adam(
                learning_rate, weight_decay=cfg.weight_decay,
                max_grad_norm=cfg.grad_clip,
            )
        if cfg.optimizer == "smoothed_adam":
            from ..optim import smoothed_adam

            return smoothed_adam(
                learning_rate, weight_decay=cfg.weight_decay,
                max_grad_norm=cfg.grad_clip,
            )
        return optax.chain(
            optax.clip_by_global_norm(cfg.grad_clip),
            adamp(learning_rate, weight_decay=cfg.weight_decay),
        )

    opt = optax.inject_hyperparams(make_opt)(learning_rate=cfg.lr)
    opt_state = opt.init(params)

    # ---- optional data-parallel placement: env batch sharded, params/opt
    # replicated; XLA inserts the gradient psum (the scaling-book recipe,
    # same GSPMD idiom as parallel.train.make_sharded_train_step but
    # driving the FULL trainer: loss phases, AdamP, schedulers, eval).
    mesh = None
    if cfg.data_parallel:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.mesh import make_mesh

        mesh = make_mesh()
        ndev = mesh.devices.size
        if cfg.batch_size % ndev:
            raise ValueError(
                f"data_parallel: batch_size={cfg.batch_size} must divide "
                f"by the {ndev}-device mesh"
            )
        _repl = NamedSharding(mesh, P())
        _row = NamedSharding(mesh, P(None, "batch"))  # [num_batches, B, ...]
        _state_shard = env_lib.EnvState(
            sun_pos=_row, errors=_row, ideal_normals=_row,
            target_img=_row, distance_maps=_row,
            ref_min=_repl, ref_max=_repl,
        )
        train_states = jax.device_put(train_states, _state_shard)

    # Rollout scan unroll: auto = unroll fully on CPU (slow while-body
    # path, see TrainConfig.scan_unroll); on accelerators unroll up to 4
    # steps — cross-step scheduling freedom XLA cannot get inside a scan
    # body, measured 399.3 → 346.3 ms (1.15×) on the config-4 train step
    # (results/unroll_probe.json, r5; value-identical by lax.scan
    # semantics). Capped at 4 to bound program size/compile time at the
    # reference's larger horizons (T ≤ ~30).
    unroll = cfg.scan_unroll
    if unroll is None:
        unroll = cfg.T if jax.default_backend() == "cpu" else min(cfg.T, 4)

    # ---- the one jitted train step
    def train_step(params, opt_state, states, key, weights):
        def terms_fn(p):
            keys = jax.random.split(key, cfg.num_batches)
            results = jax.vmap(
                lambda s, k: rollout(
                    policy, p, scene, env_cfg, s, k,
                    k=cfg.k, T=cfg.T,
                    use_mean=cfg.use_mean, deterministic=False,
                    encode_once=cfg.encode_once, unroll=unroll,
                    remat_save=cfg.remat_save,
                )
            )(states, keys)
            parts = jax.tree.map(jnp.mean, results.losses)   # mean over envs
            # where-guarded so a zero weight truly drops its term: with
            # exponential_risk the bound can overflow to inf, and 0 * inf
            # would otherwise poison the whole loss with NaN.
            terms = jnp.stack([
                parts["alignment_loss"], parts["bound"],
                parts["mse"], parts["dist"],
            ])
            wterms = jnp.where(weights != 0, weights * terms, 0.0)
            return wterms, (parts, results)

        def loss_fn(p):
            wterms, aux = terms_fn(p)
            return jnp.sum(wterms), aux

        chosen = jnp.asarray(-1.0, jnp.float32)
        if cfg.optimizer == "dominant_adam":
            # One forward, four pullbacks (vmapped over identity
            # cotangents): the per-objective gradients the reference ADom
            # gets from n separate backward() calls
            # (newenv/dom_adam_optimizer.py:62-76).
            wterms, pullback, (parts, results) = jax.vjp(
                terms_fn, params, has_aux=True
            )
            grads_stack = jax.vmap(lambda ct: pullback(ct)[0])(
                jnp.eye(4, dtype=wterms.dtype)
            )
            norms = jax.vmap(optax.global_norm)(grads_stack)
            idx = jnp.argmax(norms)
            grads = jax.tree.map(lambda g: g[idx], grads_stack)
            loss = jnp.sum(wterms)
            chosen = idx.astype(jnp.float32)
        elif cfg.optimizer == "smoothed_adam":
            from ..optim import smoothed_value_and_grad

            est = smoothed_value_and_grad(
                loss_fn, width=cfg.smooth_width,
                n_samples=cfg.smooth_samples, has_aux=True,
            )
            (loss, (parts, results)), grads = est(
                params, jax.random.fold_in(key, 0x5A)
            )
        else:
            (loss, (parts, results)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
        grad_norm = optax.global_norm(grads)
        # Per-parameter mean grads for observability (the reference logs
        # these via hooks + writer, train_with_env.py:440-445).
        grad_means = {
            jax.tree_util.keystr(path): jnp.mean(g)
            for path, g in jax.tree_util.tree_leaves_with_path(grads)
        }
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        new_states = results.env_state
        # One stacked scalar vector so the host loop pays ONE device→host
        # fetch per step instead of five (each float() is a ~30-40 ms
        # round trip through the axon tunnel).
        scalars = jnp.stack([
            loss, parts["alignment_loss"], parts["bound"],
            parts["mse"], parts["dist"], grad_norm, chosen,
        ])
        return (params, opt_state, new_states, scalars, results, grad_means)

    if mesh is not None:
        # Constrain the inputs; output placements propagate via GSPMD (the
        # new env states come back batch-sharded, params/opt replicated).
        train_step = jax.jit(
            train_step,
            in_shardings=(_repl, _repl, _state_shard, _repl, _repl),
        )
    else:
        train_step = jax.jit(train_step)

    @jax.jit
    def eval_step(params, state, key):
        return rollout(
            policy, params, scene, test_cfg, state, key,
            k=cfg.k, T=cfg.T, deterministic=True,
            encode_once=cfg.encode_once, unroll=unroll,
        )

    # ---- scheduler machinery (host-side, like the reference)
    plateau = PlateauTracker(cfg.lr, cfg.scheduler_patience, cfg.scheduler_factor)
    cyc = cyclic_lr(
        1e-5, cfg.lr, cfg.step_size_up, cfg.step_size_down,
        mode=cfg.scheduler_mode, gamma=cfg.scheduler_gamma,
    )
    pw = (
        PiecewiseConstantLR.parse(cfg.lr, cfg.scheduler_milestones)
        if cfg.scheduler == "piecewise" else None
    )
    sched_count = 0
    lr = cfg.lr

    def next_lr(mse_value: float) -> float:
        nonlocal sched_count
        sched_count += 1
        if cfg.scheduler == "plateau":
            return plateau.step(mse_value)
        if cfg.scheduler == "cyclic":
            return float(cyc(sched_count))
        if cfg.scheduler == "exp":
            return lr * cfg.exp_decay
        if cfg.scheduler == "piecewise":
            return pw.step()
        return lr

    # ---- training loop
    last_bound = math.inf
    last_mse = None
    best_mse = None
    # No alignment phase in the angular trainer or the phase-free
    # multi-objective trainer (see _loss_weights) — don't extend the loop by
    # the pretrain budget either.
    pretrain = (
        0
        if cfg.action_space == "angles" or cfg.optimizer == "dominant_adam"
        else cfg.alignment_pretrain_steps
    )
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
        """Consume one completed step's outputs (fetch scalars, scheduler,
        logging, eval, checkpoint). Returns True on NaN abort.

        Under ``pipeline_host`` this runs AFTER the next step has been
        dispatched, so the ~35 ms device→host fetch and all host work
        overlap the device compute. Consequences: the scheduler and the
        boundary-phase weights react one step later than the reference's
        strictly serial loop (negligible at reference decay rates and
        exactly zero under the shipped ``alignment_always`` behavior, whose
        weights are constant), and a NaN bailout wastes one extra
        already-dispatched step.
        """
        nonlocal lr, last_bound, last_mse, best_mse
        (step_i, scalars, results, grad_means, p_params, p_opt_state,
         p_states, k_eval) = item

        # Single device→host fetch for all per-step scalars.
        loss_f, align_f, bound_f, mse_f, dist_f, gnorm_f, chosen_f = (
            float(v) for v in np.asarray(scalars)
        )
        last_bound = bound_f

        if not math.isfinite(loss_f):
            _log(f"NaN/Inf loss at step {step_i} (lr {lr:.2e}); bailing out")
            return True

        # scheduler starts after pretrain+warmup (ref :385-394); mutates the
        # LIVE opt_state (the one feeding the next dispatch), not the stash.
        if cfg.num_batches * step_i > cfg.warmup_steps + pretrain:
            lr = next_lr(mse_f)
            opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)

        if writer is not None:
            writer.add_scalar("loss/total", loss_f, step_i)
            writer.add_scalar("loss/mse", mse_f, step_i)
            writer.add_scalar("loss/dist", dist_f, step_i)
            writer.add_scalar("loss/bound", bound_f, step_i)
            writer.add_scalar("loss/alignment", align_f, step_i)
            writer.add_scalar("hyperparams/lr", lr, step_i)
            writer.add_scalar("gradients/global_norm", gnorm_f, step_i)
            if chosen_f >= 0:
                writer.add_scalar("optimizer/chosen_objective", chosen_f, step_i)
            if timer.steps_per_s > 0:
                writer.add_scalar("perf/steps_per_s", timer.steps_per_s, step_i)
            if step_i % cfg.eval_every == 0:
                for name, gm in grad_means.items():
                    writer.add_scalar(f"gradients/{name}", float(gm), step_i)

        if monitor_cb is not None and (step_i % 50 == 0 or step_i == cfg.steps - 1):
            mon0 = jax.tree.map(lambda x: np.asarray(x[0]), results.monitor)
            monitor_cb(step_i, mon0)

        if step_i % cfg.log_every == 0 or step_i == cfg.steps - 1:
            # The multi-objective trainer reports which loss won the step
            # (ref "[..] L{chosen} chosen", ..._multi_obj.py:200): index
            # into (alignment, bound, mse, dist).
            if chosen_f >= 0:
                _log(f"L{int(chosen_f)} chosen", end=" | ")
            _log(
                f"Step {step_i} | loss {loss_f:.4f} | "
                f"mse_train {mse_f:.2e} | "
                f"alignment_train {align_f:.2e} | "
                f"lr {lr:.6f} | {time.time() - t_start:.0f}s"
            )

        if step_i % cfg.eval_every == 0 or step_i == cfg.steps - 1:
            test = eval_step(p_params, test_state, k_eval)
            test_mse, test_bound, test_align, test_dist = (
                float(v) for v in np.asarray(jnp.stack([
                    test.losses["mse"], test.losses["bound"],
                    test.losses["alignment_loss"], test.losses["dist"],
                ]))
            )
            last_mse = test_mse
            best_mse = test_mse if best_mse is None else min(best_mse, test_mse)
            _log(
                f"[{step_i:4d}] test_mse {test_mse:.2e} "
                f"test_bound {test_bound:.2e} "
                f"test_alignment {test_align:.2e}"
            )
            if writer is not None:
                writer.add_scalar("mse/test", test_mse, step_i)
                writer.add_scalar("bound/test", test_bound, step_i)
                writer.add_scalar("dist/test", test_dist, step_i)
                if hasattr(writer, "add_images"):
                    imgs = np.asarray(results.final_img[0])[:, None]
                    rng_ = max(
                        float(p_states.ref_max[0] - p_states.ref_min[0]),
                        1e-6,
                    )
                    writer.add_images(
                        "Predicted/normalized_heatmaps",
                        (imgs - float(p_states.ref_min[0])) / rng_,
                        step_i,
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
            progress_cb(
                step_i,
                {
                    "loss": loss_f,
                    "mse": mse_f,
                    "bound": bound_f,
                    "lr": lr,
                    "test_mse": last_mse,
                },
            )
        return False

    from ..utils.profiling import StepTimer

    timer = StepTimer(skip=1 + start_step)
    profile_start = start_step + 2   # past the compile step
    tracing = False
    pending = None
    aborted = False
    for step_i in range(start_step, cfg.steps + pretrain):
        if cfg.profile_dir and step_i == profile_start:
            jax.profiler.start_trace(cfg.profile_dir)
            tracing = True
        run_key, k_step, k_eval = jax.random.split(run_key, 3)
        weights = _loss_weights(cfg, cfg.num_batches * step_i, last_bound)
        (params, opt_state, train_states, scalars, results,
         grad_means) = train_step(
            params, opt_state, train_states, k_step, jnp.asarray(weights)
        )
        item = (step_i, scalars, results, grad_means, params, opt_state,
                train_states, k_eval)
        if cfg.pipeline_host and cfg.scheduler != "plateau":
            # Dispatch-then-process: the fetch inside process() waits on the
            # PREVIOUS step, which the device finishes while this one runs.
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
        jax.profiler.stop_trace()        # loop ended mid-capture
    if pending is not None:
        aborted = process(pending)

    if writer is not None and hasattr(writer, "close"):
        writer.close()
    if aborted and last_mse is None:
        return math.nan
    return best_mse if return_best_mse else last_mse
