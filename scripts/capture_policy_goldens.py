#!/usr/bin/env python3
"""Capture policy-network goldens from the reference for every head family.

The TTT golden (capture_ttt_goldens.py) covers COM encoder + LSTM head
end-to-end; this captures the remaining architecture surface at the
network level so all three heads — and the CNN encoder — have
cross-implementation checks:

  * ``lstm_cnn``  — standard PolicyNet (``train_with_env.py:58-166``):
    CNN encoder + LSTM head + in-net normalize;
  * ``transformer_cnn`` — same with the transformer head: torch
    ``TransformerEncoderLayer`` (post-LN, relu FF, dim_ff 2048) ×2 and
    the residual ``hx`` chaining across calls (``:96-103,145-153``).

Each scenario records THREE sequential calls with distinct random inputs
(hx threads through), in eval mode (no dropout — determinism), plus the
full state_dict for porting. Run: python scripts/capture_policy_goldens.py
"""

import pathlib
import sys
import types

import numpy as np

REF = "/root/reference"
OUT = pathlib.Path(__file__).resolve().parent.parent / "tests" / "goldens"
OUT.mkdir(parents=True, exist_ok=True)
sys.path.insert(0, REF)

import torch  # noqa: E402

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

from train_with_env import PolicyNet as StdPolicy  # noqa: E402

N, B, K, RES = 5, 3, 2, 24
ENC, LSTM_HID, HEADS, LAYERS = 32, 16, 4, 2
AUX = 3 + N * 3
CALLS = 3


def capture(arch, seed):
    torch.manual_seed(seed)
    policy = StdPolicy(
        img_channels=1, num_heliostats=N, aux_dim=AUX, enc_dim=ENC,
        lstm_hid=LSTM_HID, transformer_layers=LAYERS,
        transformer_heads=HEADS, architecture=arch, dropout=0.0,
    )
    policy.eval()

    rng = np.random.default_rng(seed)
    out = {}
    for name, p in policy.named_parameters():
        out["w__" + name.replace(".", "__")] = p.detach().numpy().copy()

    hx = None
    for c in range(CALLS):
        img = rng.random((B, K, 1, RES, RES)).astype(np.float32)
        aux = rng.normal(size=(B, AUX)).astype(np.float32)
        with torch.no_grad():
            normals, hx = policy(
                torch.from_numpy(img), torch.from_numpy(aux), hx
            )
        out[f"in_img_{c}"] = img
        out[f"in_aux_{c}"] = aux
        out[f"out_{c}"] = normals.numpy()
        if arch == "lstm":
            out[f"hx_h_{c}"] = hx[0].detach().numpy()
            out[f"hx_c_{c}"] = hx[1].detach().numpy()
        elif arch == "transformer":
            out[f"hx_{c}"] = hx.detach().numpy()
    return out


def main():
    for arch, seed in (("lstm", 21), ("transformer", 22), ("mlp", 23)):
        data = capture(arch, seed)
        np.savez(OUT / f"policy_{arch}.npz", **data)
        print(f"policy_{arch}.npz ok ({len(data)} arrays)")


if __name__ == "__main__":
    main()
