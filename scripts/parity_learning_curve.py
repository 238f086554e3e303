"""Cross-implementation learning-trend parity (BASELINE quality check).

Trains the same task — LSTM policy, alignment-pretrain objective, matched
geometry/env knobs — with BOTH the PyTorch reference (imported read-only
from /root/reference; requires the mount) and doodle_tpu, and compares the
learning trends. Weight inits differ by framework, so the check is
trend-level (both must reduce alignment loss by ≥ the threshold factor over
the same number of optimizer steps), the same standard the reference's own
sanity family uses (SURVEY §4).

    JAX_PLATFORMS=cpu python scripts/parity_learning_curve.py --steps 25
"""

import argparse
import pathlib
import sys

sys.path.insert(0, ".")

REFERENCE = "/root/reference"


def run_reference(args) -> tuple[float, float]:
    """Short alignment-only training with the reference env + policy."""
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

    torch.manual_seed(args.seed)
    from test_environment import HelioEnv as RefEnv
    from train_with_env import PolicyNet as RefPolicy

    N = args.num_heliostats
    pos = torch.rand(N, 3) * 10 + 80
    pos[:, 2] = 0
    env = RefEnv(
        heliostat_pos=pos,
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
    policy = RefPolicy(
        img_channels=1, num_heliostats=N, aux_dim=3 + N * 3,
        architecture="lstm", lstm_hid=32,
    )
    opt = torch.optim.Adam(policy.parameters(), lr=args.lr)

    first = last = None
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
            loss = parts["alignment_loss"]
        opt.zero_grad()
        loss.backward()
        opt.step()
        v = float(loss)
        first = v if first is None else first
        last = v
        if step % 5 == 0:
            print(f"  [ref {step:3d}] alignment {v:.1f} mrad")
    return first, last


def run_doodle(args) -> tuple[float, float]:
    from doodle_tpu.train import TrainConfig, train_and_eval

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
        log_every=5,
        test_size=args.batch_size,
        dropout=0.0,
        architecture="lstm",
        lstm_hid=32,
        seed=args.seed,
    )
    curve = []
    train_and_eval(
        cfg, progress_cb=lambda i, m: curve.append(m["loss"] / cfg.alignment_f)
    )
    return curve[0], curve[-1]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--num_heliostats", type=int, default=10)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--resolution", type=int, default=64)
    p.add_argument("--steps", type=int, default=25)
    p.add_argument("--T", type=int, default=2)
    p.add_argument("--k", type=int, default=2)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--error_scale_mrad", type=float, default=60.0)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--min_improvement", type=float, default=1.15,
                   help="required first/last alignment ratio for both")
    args = p.parse_args(argv)

    if not pathlib.Path(REFERENCE).exists():
        print(f"reference mount {REFERENCE} not found — skipping ref side")
        ref = None
    else:
        print("reference (torch CPU):")
        ref = run_reference(args)

    print("doodle_tpu:")
    ours = run_doodle(args)

    print(f"doodle_tpu alignment: {ours[0]:.1f} -> {ours[1]:.1f} mrad "
          f"({ours[0] / ours[1]:.2f}x)")
    assert ours[0] / ours[1] >= args.min_improvement, "doodle_tpu did not learn"
    if ref is not None:
        print(f"reference alignment:  {ref[0]:.1f} -> {ref[1]:.1f} mrad "
              f"({ref[0] / ref[1]:.2f}x)")
        assert ref[0] / ref[1] >= args.min_improvement, "reference did not learn"
    print("LEARNING-TREND PARITY OK")


if __name__ == "__main__":
    main()
