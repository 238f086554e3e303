"""Learning-trajectory A/B: shipped conv lowering vs r3 XLA autodiff.

VERDICT r3 item 1's "done" bar includes "A/B at config-4 with identical
learning trajectory". The custom-vjp lowering computes the SAME
contractions as XLA's autodiff (parity pinned to ~1e-5 by
tests/test_conv5x5.py); this run shows the trajectory equivalence at
config-4 scale: two 60-step runs at N=500/256²/B=32, same seed and
geometry, one with the shipped lowering (+ remat_save="convs"), one with
plain nn-style XLA autodiff (+ full remat, the r3 program). Curves must
track within bf16 run-to-run noise (the two programs reassociate f32
accumulations differently, so bitwise equality is not the bar; the
DIVERGENCE band is).

Run on the TPU: `timeout 4800 python scripts/conv_lowering_trajectory_ab.py`.
Writes results/conv_lowering_trajectory_ab.json.
"""
from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, ".")

import numpy as np

CFG_KW = dict(
    num_heliostats=500, resolution=256, batch_size=32, num_batches=1,
    steps=60, T=4, k=2, lr=5e-4, sigma_scale=0.05, error_scale_mrad=30.0,
    alignment_pretrain_steps=0, warmup_steps=0, alignment_always=True,
    grad_clip=1.0, scheduler="none", eval_every=10**9, log_every=20,
    test_size=8, dropout=0.0, encoder_dtype="bfloat16", seed=42,
)


def run(arm: str) -> list[float]:
    import doodle_tpu.models.encoders as enc_mod
    from doodle_tpu.ops import conv5x5 as c5
    from doodle_tpu.train import TrainConfig, train_and_eval

    if arm == "r3_autodiff":
        enc_mod.conv5x5 = c5._conv
        cfg = TrainConfig(**CFG_KW, remat_save="none")
    else:
        enc_mod.conv5x5 = c5.conv5x5
        cfg = TrainConfig(**CFG_KW)      # shipped defaults (convs remat)
    curve = []
    t0 = time.time()
    train_and_eval(cfg, progress_cb=lambda i, m: curve.append(m["loss"]))
    print(f"{arm}: {len(curve)} steps, first {curve[0]:.1f} "
          f"last {curve[-1]:.1f} [{time.time()-t0:.0f}s]", flush=True)
    return curve


def main():
    out = {}
    for arm in ("shipped", "r3_autodiff"):
        out[arm] = run(arm)
        pathlib.Path("results/conv_lowering_trajectory_ab.json").write_text(
            json.dumps(out, indent=1) + "\n")
    a = np.array(out["shipped"], np.float64)
    b = np.array(out["r3_autodiff"], np.float64)
    rel = np.abs(a - b) / np.maximum(np.abs(b), 1e-9)
    out["rel_diff_median"] = float(np.median(rel))
    out["rel_diff_max"] = float(rel.max())
    out["end_ratio"] = float(a[-1] / b[-1])
    pathlib.Path("results/conv_lowering_trajectory_ab.json").write_text(
        json.dumps(out, indent=1) + "\n")
    print(json.dumps({k: out[k] for k in
                      ("rel_diff_median", "rel_diff_max", "end_ratio")}))


if __name__ == "__main__":
    main()
