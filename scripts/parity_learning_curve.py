"""Cross-implementation learning-curve parity (BASELINE quality bar).

BASELINE.md's stated bar is "`train_with_env` learning curve matches within
seed variance". This script measures exactly that (VERDICT r1 item 2):

* trains the same task — LSTM policy, alignment objective, **identical
  heliostat geometry per seed** (positions sampled once with numpy and fed
  to both frameworks), matched env/optimizer knobs — with BOTH the PyTorch
  reference (imported read-only from /root/reference) and doodle_tpu;
* over ≥5 seeds × ≥100 optimizer steps (the reference's own sweep seed
  list, ``run_experiments.py:28``), recording the full per-step
  alignment curve of every run;
* defines the reference's seed-variance band as the across-seed min/max
  envelope of the (rolling-mean-smoothed, **log-space**) reference curves
  (log space because the loss decays exponentially, so seed variance is
  multiplicative);
* **pre-registered acceptance rule (r3, BASELINE.md)**: the doodle
  geometric-mean curve must be not-worse than the UNWIDENED band's upper
  edge for ≥ ``--band_frac`` (default 90%) of steps (one-sided: the
  north-star goal is match-or-beat — a two-sided in-band test fails on
  the good side when doodle plateaus below the band), and both
  implementations must improve ≥ ``--min_improvement``. The
  ``--band_expand``-widened fractions are reported alongside for
  comparability with the r2 analysis but carry no pass/fail weight.
* ``--ttt`` switches both arms to the TTT rollout (residual actions,
  truncated BPTT, advantage-accumulated alignment objective — reference
  ``train_with_env_com_trunc_advantage_ttt.py:169-360`` vs
  ``doodle_tpu.train.ttt.ttt_rollout``), COM encoder + LSTM policy. The
  advantage-accumulated alignment VALUE telescopes to the last-step
  alignment, so the recorded curves are directly comparable.

Artifacts: per-step curves → ``results/parity_curves[_ttt].json``, overlay
plot → ``results/parity_curves[_ttt].png``, summary printed for RESULTS.md.

    JAX_PLATFORMS=cpu python scripts/parity_learning_curve.py [--ttt]
"""

import argparse
import json
import os
import pathlib
import sys

import numpy as np

sys.path.insert(0, ".")

# Force the CPU backend through the config API — the axon TPU plugin in
# this image ignores the JAX_PLATFORMS env var (CLAUDE.md), and this
# comparison must never contend with a TPU job.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REFERENCE = "/root/reference"


def sample_geometry(seed: int, num_heliostats: int) -> np.ndarray:
    """One geometry per seed, shared verbatim by both frameworks
    (the trainer's recipe: uniform [80, 90)² on the ground plane)."""
    rng = np.random.default_rng(seed)
    pos = rng.uniform(0.0, 10.0, (num_heliostats, 3)).astype(np.float32)
    pos += 80.0
    pos[:, 2] = 0.0
    return pos


def run_reference(args, seed: int, pos_np: np.ndarray) -> list[float]:
    """Per-step alignment curve from the reference env + policy (torch CPU)."""
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    import types

    import torch

    # The reference module imports mlflow/adamp at module scope; neither is
    # installed here and neither is needed for the PolicyNet class — stub.
    if "mlflow" not in sys.modules:
        sys.modules["mlflow"] = types.ModuleType("mlflow")
        sys.modules["mlflow_logger"] = types.SimpleNamespace(MLflowWriter=object)
    if "adamp" not in sys.modules:
        sys.modules["adamp"] = types.SimpleNamespace(AdamP=torch.optim.Adam)
    if "plotly" not in sys.modules:
        sys.modules["plotly"] = types.ModuleType("plotly")
        sys.modules["plotting_utils"] = types.SimpleNamespace(
            scatter3d_vectors=lambda *a, **k: None
        )

    torch.manual_seed(seed)
    from test_environment import HelioEnv as RefEnv
    from train_with_env import PolicyNet as RefPolicy

    N = args.num_heliostats
    env = RefEnv(
        heliostat_pos=torch.from_numpy(pos_np.copy()),
        targ_pos=torch.tensor([0.0, -5.0, 0.0]),
        targ_area=(15.0, 15.0),
        targ_norm=torch.tensor([0.0, 1.0, 0.0]),
        sigma_scale=0.01,
        error_scale_mrad=args.error_scale_mrad,
        initial_action_noise=0.0,
        resolution=args.resolution,
        batch_size=args.batch_size,
        device="cpu",
    )
    # dropout=0 on BOTH sides (run_doodle passes dropout=0.0): the parity
    # signal must not be confounded by dropout sampling noise.
    policy = RefPolicy(
        img_channels=1, num_heliostats=N, aux_dim=3 + N * 3,
        architecture="lstm", lstm_hid=32, dropout=0.0,
    )
    opt = torch.optim.Adam(policy.parameters(), lr=args.lr)

    curve = []
    for step in range(args.steps):
        obs = env.reset()
        img, aux = obs["img"], obs["aux"]
        hist = torch.zeros(args.batch_size, args.k, args.resolution,
                           args.resolution)
        hist[:, -1] = img
        hx = None
        loss = None
        for _ in range(args.T):
            normals, hx = policy(
                hist.unsqueeze(2).detach(), aux.detach(), hx
            )
            obs, parts, _ = env.step(normals)
            hist = torch.roll(hist, -1, dims=1)
            hist[:, -1] = obs["img"]
            # Last-step loss: the reference trainer's default
            # (use_mean=False, train_with_env.py:213-215), matching
            # doodle's TrainConfig default.
            loss = parts["alignment_loss"]
        opt.zero_grad()
        loss.backward()
        opt.step()
        curve.append(float(loss))
        if step % 20 == 0:
            print(f"  [ref seed={seed} {step:3d}] {curve[-1]:.1f} mrad")
    return curve


def run_doodle(args, seed: int, pos_np: np.ndarray) -> list[float]:
    """Per-step alignment curve from doodle_tpu on the same geometry."""
    from doodle_tpu.core.scene import make_scene
    from doodle_tpu.train import TrainConfig, train_and_eval

    scene = make_scene(pos_np, [0.0, -5.0, 0.0], [0.0, 1.0, 0.0])
    cfg = TrainConfig(
        num_heliostats=args.num_heliostats,
        batch_size=args.batch_size,
        num_batches=1,
        steps=args.steps,
        T=args.T,
        k=args.k,
        lr=args.lr,
        resolution=args.resolution,
        sigma_scale=0.01,
        error_scale_mrad=args.error_scale_mrad,
        alignment_pretrain_steps=0,
        alignment_always=True,     # pure alignment objective, like the
        warmup_steps=0,            # reference loop above
        grad_clip=1e9,
        scheduler="none",
        eval_every=10**9,
        log_every=10**9,
        test_size=args.batch_size,
        dropout=0.0,
        architecture="lstm",
        lstm_hid=32,
        seed=seed,
        # The packaged torch-default init option (models/init.py) — the
        # named setting of the re-registered r4 parity rule, replacing the
        # r3 script-local numpy transform.
        param_init="torch" if args.torch_init else "flax",
    )
    curve = []
    train_and_eval(
        cfg, scene=scene,
        progress_cb=lambda i, m: curve.append(m["loss"] / cfg.alignment_f),
    )
    print(f"  [doodle seed={seed}] {curve[0]:.1f} -> {curve[-1]:.1f} mrad")
    return curve[: args.steps]


def _ref_stubs():
    """Stub the reference's module-scope imports (mlflow/adamp/plotly)."""
    import types

    import torch

    if "mlflow" not in sys.modules:
        sys.modules["mlflow"] = types.ModuleType("mlflow")
        sys.modules["mlflow_logger"] = types.SimpleNamespace(MLflowWriter=object)
    if "adamp" not in sys.modules:
        sys.modules["adamp"] = types.SimpleNamespace(AdamP=torch.optim.Adam)
    if "plotly" not in sys.modules:
        sys.modules["plotly"] = types.ModuleType("plotly")
        sys.modules["plotting_utils"] = types.SimpleNamespace(
            scatter3d_vectors=lambda *a, **k: None
        )
    return torch


def run_reference_ttt(args, seed: int, pos_np: np.ndarray) -> list[float]:
    """Per-step advantage-alignment curve from the reference TTT rollout
    (``train_with_env_com_trunc_advantage_ttt.py:169-360``; the
    advantage-accumulated alignment value telescopes to the last-step
    alignment in mrad)."""
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    torch = _ref_stubs()
    torch.manual_seed(seed)

    import train_with_env_com_trunc_advantage_ttt as ttt_mod
    from test_environment import HelioEnv as RefEnv

    N = args.num_heliostats
    env = RefEnv(
        heliostat_pos=torch.from_numpy(pos_np.copy()),
        targ_pos=torch.tensor([0.0, -5.0, 0.0]),
        targ_area=(15.0, 15.0),
        targ_norm=torch.tensor([0.0, 1.0, 0.0]),
        sigma_scale=0.01,
        error_scale_mrad=args.error_scale_mrad,
        initial_action_noise=0.0,
        resolution=args.resolution,
        batch_size=args.batch_size,
        device="cpu",
    )
    policy = ttt_mod.PolicyNet(
        img_channels=1, num_heliostats=N, aux_dim=3 + N * 3,
        architecture="lstm", lstm_hid=32, dropout=0.0,
    )
    opt = torch.optim.Adam(policy.parameters(), lr=args.lr)

    curve = []
    for step in range(args.steps):
        parts, _, _, _, _, _ = ttt_mod.rollout(
            env, policy, args.k, args.T_ttt, torch.device("cpu"),
            truncate_every=args.truncate_every, detach_input=True,
        )
        loss = parts["alignment_loss"]
        opt.zero_grad()
        loss.backward()
        opt.step()
        curve.append(float(loss))
        if step % 20 == 0:
            print(f"  [ref-ttt seed={seed} {step:3d}] {curve[-1]:.1f} mrad")
    return curve


def run_doodle_ttt(args, seed: int, pos_np: np.ndarray) -> list[float]:
    """Per-step advantage-alignment curve from doodle's TTT rollout."""
    import jax.numpy as jnp
    import optax

    from doodle_tpu.core.scene import make_scene
    from doodle_tpu.env import env as env_lib
    from doodle_tpu.models.policy import PolicyNet
    from doodle_tpu.train.ttt import ttt_rollout

    scene = make_scene(pos_np, [0.0, -5.0, 0.0], [0.0, 1.0, 0.0])
    cfg = env_lib.EnvConfig(
        resolution=args.resolution, batch_size=args.batch_size,
        sigma_scale=0.01, error_scale_mrad=args.error_scale_mrad,
        field_init_noise=0.0,
    )
    key = jax.random.PRNGKey(seed)
    k_env, k_pol, k_run = jax.random.split(key, 3)
    state = env_lib.init_state(scene, cfg, k_env)
    policy = PolicyNet(
        num_heliostats=args.num_heliostats, architecture="lstm",
        encoder="com", lstm_hid=32, dropout=0.0, normalize_output=False,
    )
    params = policy.init(
        k_pol,
        jnp.zeros((1, args.k, args.resolution, args.resolution)),
        jnp.zeros((1, 3 + args.num_heliostats * 3)),
        policy.init_carry(1),
    )
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    @jax.jit
    def train_step(params, opt_state, key_t):
        def loss_fn(p):
            res = ttt_rollout(
                policy, p, scene, cfg, state, key_t,
                k=args.k, T=args.T_ttt,
                truncate_every=args.truncate_every,
                detach_input=True, deterministic=True,
            )
            return res.losses["alignment_loss"]

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    curve = []
    run_key = k_run
    for _ in range(args.steps):
        run_key, k_t = jax.random.split(run_key)
        params, opt_state, loss = train_step(params, opt_state, k_t)
        curve.append(float(loss))
    print(f"  [doodle-ttt seed={seed}] {curve[0]:.1f} -> {curve[-1]:.1f} mrad")
    return curve


def smooth(x: np.ndarray, w: int) -> np.ndarray:
    """Centered rolling mean (edge-padded) over the step axis."""
    if w <= 1:
        return x
    pad = w // 2
    xp = np.pad(x, ((pad, w - 1 - pad),) + ((0, 0),) * (x.ndim - 1), "edge")
    k = np.ones(w) / w
    return np.apply_along_axis(lambda v: np.convolve(v, k, "valid"), 0, xp)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--num_heliostats", type=int, default=10)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--resolution", type=int, default=64)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--T", type=int, default=2)
    p.add_argument("--k", type=int, default=2)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--error_scale_mrad", type=float, default=60.0)
    p.add_argument("--seeds", type=str, default="42,420,69,666,999",
                   help="comma-separated; the default is the reference's "
                        "own sweep seed list (run_experiments.py:28)")
    p.add_argument("--ttt", action="store_true",
                   help="run the TTT-rollout arms instead of the standard "
                        "rollout (COM encoder, residual actions, truncated "
                        "advantage objective)")
    p.add_argument("--torch_init", action="store_true",
                   help="re-sample doodle's params with torch's default "
                        "init distributions (attribution experiment for "
                        "init-driven early-transient differences)")
    p.add_argument("--T_ttt", type=int, default=6)
    p.add_argument("--truncate_every", type=int, default=4)
    p.add_argument("--min_improvement", type=float, default=1.15,
                   help="required first/last alignment ratio for both")
    p.add_argument("--band_expand", type=float, default=0.5,
                   help="widen the ref min/max envelope by this fraction of "
                        "its width per side (3 seeds undersample the band)")
    p.add_argument("--band_frac", type=float, default=0.9,
                   help="fraction of steps the doodle mean must be in-band")
    p.add_argument("--smooth_window", type=int, default=5)
    p.add_argument("--out", type=str, default="results")
    p.add_argument("--from_json", type=str, default=None,
                   help="replay the analysis from a saved parity_curves.json "
                        "instead of re-training (the runs are deterministic)")
    args = p.parse_args(argv)
    seeds = [int(s) for s in args.seeds.split(",")]
    run_ref = run_reference_ttt if args.ttt else run_reference
    run_doo = run_doodle_ttt if args.ttt else run_doodle
    stem = "parity_curves_ttt" if args.ttt else "parity_curves"
    # --torch_init is a first-class setting since r4 (the re-registered
    # rule names TrainConfig.param_init="torch"); the artifact keeps the
    # registered name, with the setting recorded in the payload config.

    out = pathlib.Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    if args.from_json:
        payload = json.loads(pathlib.Path(args.from_json).read_text())
        ref_curves = {int(s): c for s, c in payload["reference"].items()}
        doodle_curves = {int(s): c for s, c in payload["doodle_tpu"].items()}
        seeds = list(doodle_curves)
        have_ref = bool(ref_curves)
        print(f"replaying {args.from_json} (seeds {seeds})")
    else:
        have_ref = pathlib.Path(REFERENCE).exists()
        if not have_ref:
            print(f"reference mount {REFERENCE} not found — doodle-only run")

        ref_curves, doodle_curves = {}, {}
        for seed in seeds:
            pos = sample_geometry(seed, args.num_heliostats)
            if have_ref:
                print(f"reference (torch CPU), seed {seed}:")
                ref_curves[seed] = run_ref(args, seed, pos)
            print(f"doodle_tpu, seed {seed}:")
            doodle_curves[seed] = run_doo(args, seed, pos)

        payload = {
            "config": vars(args),
            "reference": {str(s): c for s, c in ref_curves.items()},
            "doodle_tpu": {str(s): c for s, c in doodle_curves.items()},
        }
        (out / f"{stem}.json").write_text(json.dumps(payload))
        print(f"curves -> {out / f'{stem}.json'}")

    D = smooth(np.array([doodle_curves[s] for s in seeds]).T,
               args.smooth_window)                      # [steps, seeds]
    d_mean = D.mean(axis=1)

    for s, c in doodle_curves.items():
        ratio = c[0] / c[-1]
        print(f"doodle seed {s}: {c[0]:.1f} -> {c[-1]:.1f} mrad ({ratio:.2f}x)")
        assert ratio >= args.min_improvement, f"doodle seed {s} did not learn"

    if have_ref:
        R = smooth(np.array([ref_curves[s] for s in seeds]).T,
                   args.smooth_window)                  # [steps, seeds]
        # Band arithmetic in LOG space: the loss decays exponentially
        # (1300 → 49 mrad in 100 steps), so "within seed variance" is a
        # multiplicative statement — a linear band is vanishingly narrow
        # on the descent cliff (where the loss halves every ~3 steps) and
        # meaninglessly wide at the start.
        Rl, dl = np.log(R), np.log(D).mean(axis=1)  # geometric mean
        d_mean = np.exp(dl)                         # for the plot
        lo, hi = Rl.min(axis=1), Rl.max(axis=1)
        width = hi - lo
        lo_x = lo - args.band_expand * width
        hi_x = hi + args.band_expand * width
        # PRIMARY (pre-registered r3 rule, BASELINE.md): unwidened band.
        frac_raw = float((dl <= hi).mean())
        inside_raw = float(((dl >= lo) & (dl <= hi)).mean())
        below_raw = float((dl < lo).mean())
        # Secondary: the r2 ±widened stats, reported for comparability.
        frac_wide = float((dl <= hi_x).mean())
        inside_wide = float(((dl >= lo_x) & (dl <= hi_x)).mean())
        lo_x, hi_x = np.exp(lo_x), np.exp(hi_x)  # back to mrad for the plot

        for s, c in ref_curves.items():
            ratio = c[0] / c[-1]
            print(f"ref    seed {s}: {c[0]:.1f} -> {c[-1]:.1f} mrad "
                  f"({ratio:.2f}x)")
            assert ratio >= args.min_improvement, f"ref seed {s} did not learn"

        print(f"doodle mean vs UNWIDENED ref band ({len(seeds)} seeds): "
              f"not-worse {frac_raw:.1%} of {args.steps} steps "
              f"(required ≥{args.band_frac:.0%}); inside {inside_raw:.1%}, "
              f"better-than-band {below_raw:.1%}")
        print(f"  [secondary, ±{args.band_expand:.0%} widened: "
              f"not-worse {frac_wide:.1%}, inside {inside_wide:.1%}]")
        assert frac_raw >= args.band_frac, (
            f"doodle curve WORSE than the unwidened reference band "
            f"({frac_raw:.1%} < {args.band_frac:.0%} of steps not-worse)"
        )

        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            steps_x = np.arange(len(d_mean))
            fig, ax = plt.subplots(figsize=(8, 5))
            ax.fill_between(steps_x, lo_x, hi_x, alpha=0.2, color="#888",
                            label="reference seed band (widened)")
            for s in seeds:
                ax.plot(steps_x, smooth(np.array(ref_curves[s])[:, None],
                                        args.smooth_window)[:, 0],
                        color="#888", lw=0.8)
            ax.plot(steps_x, d_mean, color="#c0392b", lw=2,
                    label="doodle_tpu mean")
            for s in seeds:
                ax.plot(steps_x, D[:, seeds.index(s)], color="#c0392b",
                        lw=0.6, alpha=0.5)
            ax.set_xlabel("optimizer step")
            ax.set_ylabel("alignment loss (mrad)")
            ax.set_yscale("log")
            ax.set_title("Learning-curve parity: doodle_tpu vs torch "
                         "reference (3 seeds, shared geometry)")
            ax.legend()
            fig.tight_layout()
            fig.savefig(out / f"{stem}.png", dpi=120)
            print(f"plot -> {out / f'{stem}.png'}")
        except Exception as e:  # pragma: no cover — plot is best-effort
            print(f"(plot skipped: {e})")

    print("LEARNING-CURVE PARITY OK")


if __name__ == "__main__":
    main()
