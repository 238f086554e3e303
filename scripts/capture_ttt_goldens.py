#!/usr/bin/env python3
"""Capture cross-implementation goldens for the TTT rollout.

The TTT rollout (residual action accumulation, truncated BPTT,
advantage-style alignment, test-time compute) is the most intricate piece
of ported semantics in the repo; this captures the reference's *exact*
numerics so ``tests/test_ttt_golden.py`` can assert parity — the
reference's own strongest verification idiom (new-vs-old ``allclose``
with injected identical tensors, ``newenv/sanity_check_multi_error.py``).

Reference anchor: ``train_with_env_com_trunc_advantage_ttt.py:169-360``.

Everything RNG-dependent is injected so both frameworks see identical
inputs: sun positions, error tensors, policy weights (exported to the
npz), the TTC ``fine_error_vec`` init, and ``initial_action_noise=0`` on
both fields (the env ctor accepts the knob but never forwards it to its
fields — patched post-hoc here, mirrored by ``field_init_noise=0.0``).
The torch policy runs in eval mode (no dropout) — the quantity under
test is the rollout semantics, not dropout sampling.

Scenarios:
  A. train-mode rollout, truncate_every=4, detach_input=True  (+ grads)
  B. train-mode rollout, truncate_every=4, detach_input=False (+ grads)
  C. test-time rollout with TTC (enable_fine, fine_steps_per_t=2)

Run once (requires /root/reference + torch):
    python scripts/capture_ttt_goldens.py
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
import torch.nn.functional as F  # noqa: E402

# The reference module imports mlflow/adamp/plotting at module scope; none
# is needed for the rollout + PolicyNet classes — stub them (same idiom as
# scripts/parity_learning_curve.py).
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

import test_environment as ref_env_mod  # noqa: E402
import train_with_env_com_trunc_advantage_ttt as ttt_mod  # noqa: E402

# ---- tiny deterministic config (VERDICT r2 item 1) ----
N, B, RES = 7, 4, 32
K, T = 3, 8
TRUNC = 4
SIGMA = 0.01            # trainer-grade (ref ttt :403); 0.1 degenerates dist
ERR_SCALE = 150.0
ENC_DIM, LSTM_HID = 32, 16
T_TTC = 6
FINE_START, FINE_STEPS, FINE_LR, FINE_EPS = 2, 2, 1e-3, 1e-4
# loss blend for the grad capture (ref trainer weights, ttt :560,574-575)
ALIGN_F, MSE_F, DIST_F, SPILL_F = 100.0, 1.0, 1.0e4, 1.5e4


def t(x):
    return torch.tensor(np.asarray(x), dtype=torch.float32)


class RecordingEnv:
    """Delegating proxy that records every step() call's action + metrics."""

    def __init__(self, env):
        self._env = env
        self.actions = []   # [n_calls, B, N, 3]
        self.metrics = []   # [n_calls, 4] (mse, dist, bound, alignment)

    def __getattr__(self, name):
        return getattr(self._env, name)

    def reset(self):
        return self._env.reset()

    def step(self, action):
        obs, losses, monitor = self._env.step(action)
        self.actions.append(
            action.detach().reshape(B, N, 3).cpu().numpy().copy()
        )
        self.metrics.append([
            float(losses["mse"]), float(losses["dist"]),
            float(losses["bound"]), float(losses["alignment_loss"]),
        ])
        return obs, losses, monitor


def build_env(rng):
    helio = (rng.random((N, 3)) * 10 + 80).astype(np.float32)
    helio[:, 2] = 0
    targ_pos = np.array([0.0, -5.0, 0.0], np.float32)
    targ_norm = np.array([0.0, 1.0, 0.0], np.float32)

    env = ref_env_mod.HelioEnv(
        heliostat_pos=t(helio), targ_pos=t(targ_pos), targ_area=(15.0, 15.0),
        targ_norm=t(targ_norm), sigma_scale=SIGMA,
        error_scale_mrad=ERR_SCALE, initial_action_noise=0.0,
        resolution=RES, batch_size=B, device="cpu",
        new_sun_pos_every_reset=False, new_errors_every_reset=False,
        use_error_mask=False, exponential_risk=False,
    )
    # The ctor does not forward initial_action_noise to its fields
    # (test_environment.py:255-277); zero it for cross-framework determinism
    # and recompute the sun-derived caches with injected suns.
    env.ref_field.initial_action_noise = 0.0
    env.noisy_field.initial_action_noise = 0.0

    sun = rng.normal(size=(B, 3)).astype(np.float32)
    sun[:, 2] = np.abs(sun[:, 2])
    sun = sun / np.linalg.norm(sun, axis=1, keepdims=True) * 14142.135
    env.set_sun_pos(t(sun))

    errors_b = (rng.normal(size=(B, N, 2)) * ERR_SCALE).astype(np.float32)
    env.noisy_field.batch_error_angles_mrad = t(errors_b)
    env.noisy_field.error_angles_mrad = t(errors_b[0])
    return env, helio, targ_pos, targ_norm, sun, errors_b


def build_policy():
    torch.manual_seed(1234)
    policy = ttt_mod.PolicyNet(
        img_channels=1, num_heliostats=N, aux_dim=3 + N * 3,
        enc_dim=ENC_DIM, lstm_hid=LSTM_HID, architecture="lstm",
        dropout=0.0,
    )
    policy.eval()   # deterministic: no dropout
    return policy


def total_loss(parts):
    return (ALIGN_F * parts["alignment_loss"] + MSE_F * parts["mse"]
            + DIST_F * parts["dist"] + SPILL_F * parts["bound"])


def run_train_scenario(env, policy, detach_input):
    rec = RecordingEnv(env)
    policy.zero_grad(set_to_none=True)
    parts, img, hist, mse_over_t, monitor, _ = ttt_mod.rollout(
        rec, policy, K, T, torch.device("cpu"),
        truncate_every=TRUNC, detach_input=detach_input,
    )
    total = total_loss(parts)
    total.backward()
    grads = {
        name: p.grad.detach().numpy().copy()
        for name, p in policy.named_parameters()
    }
    return {
        "losses": np.array([
            float(parts["mse"]), float(parts["dist"]),
            float(parts["bound"]), float(parts["alignment_loss"]),
        ], np.float32),
        "total": np.float32(float(total)),
        "mse_over_t": np.asarray(mse_over_t, np.float32),
        "actions": np.stack(rec.actions),
        "step_metrics": np.array(rec.metrics, np.float32),
        "final_img": img.detach().numpy(),
        "grads": grads,
    }


def run_ttc_scenario(env, policy, fine_init):
    rec = RecordingEnv(env)

    # Inject the fine_error_vec init: the rollout draws it with
    # ``torch.empty_like(...).uniform_(-eps, eps)`` (ref :280-282) — the only
    # uniform_ call in the whole flow (fields/env use randn; policy is in
    # eval mode). Patch uniform_ to copy the injected values instead.
    calls = []
    orig_uniform = torch.Tensor.uniform_

    def injected_uniform(self, a=0.0, b=1.0):
        calls.append((a, b, tuple(self.shape)))
        with torch.no_grad():
            self.copy_(torch.from_numpy(fine_init))
        return self

    # The rollout neither returns fine_error_vec nor exposes its optimizer;
    # Adam updates the tensor in place, so stashing the param reference at
    # optimizer construction yields the final value after the rollout.
    fine_ref = []
    orig_adam = torch.optim.Adam

    class CapturingAdam(orig_adam):
        def __init__(self, params, *a, **k):
            params = list(params)
            fine_ref.extend(params)
            super().__init__(params, *a, **k)

    torch.Tensor.uniform_ = injected_uniform
    torch.optim.Adam = CapturingAdam
    try:
        parts, img, hist, mse_over_t, monitor, _ = ttt_mod.rollout(
            rec, policy, K, T_TTC, torch.device("cpu"),
            truncate_every=TRUNC, detach_input=True,
            enable_fine=True, fine_adjustment_start_t=FINE_START,
            fine_steps_per_t=FINE_STEPS, fine_lr=FINE_LR,
            fine_init_eps=FINE_EPS, test_time=True,
        )
    finally:
        torch.Tensor.uniform_ = orig_uniform
        torch.optim.Adam = orig_adam
    assert len(calls) == 1 and calls[0][2] == (B, N, 3), calls
    assert len(fine_ref) == 1, fine_ref

    return {
        "fine_final": fine_ref[0].detach().numpy().copy(),
        "losses": np.array([
            float(parts["mse"]), float(parts["dist"]),
            float(parts["bound"]), float(parts["alignment_loss"]),
        ], np.float32),
        "mse_over_t": np.asarray(mse_over_t, np.float32),
        "actions": np.stack(rec.actions),
        "step_metrics": np.array(rec.metrics, np.float32),
        "final_img": img.detach().numpy(),
    }


def main():
    rng = np.random.default_rng(11)
    env, helio, targ_pos, targ_norm, sun, errors_b = build_env(rng)
    policy = build_policy()

    # reset determinism probe (both sides must produce this exactly)
    obs0 = env.reset()

    out = {
        "helio": helio, "targ_pos": targ_pos, "targ_norm": targ_norm,
        "targ_area": np.array([15.0, 15.0], np.float32),
        "sun": sun, "errors_b": errors_b,
        "sigma_scale": np.float32(SIGMA),
        "error_scale": np.float32(ERR_SCALE),
        "resolution": np.int64(RES),
        "N": np.int64(N), "B": np.int64(B), "k": np.int64(K),
        "T": np.int64(T), "T_ttc": np.int64(T_TTC),
        "truncate_every": np.int64(TRUNC),
        "enc_dim": np.int64(ENC_DIM), "lstm_hid": np.int64(LSTM_HID),
        "fine_start": np.int64(FINE_START),
        "fine_steps": np.int64(FINE_STEPS),
        "fine_lr": np.float32(FINE_LR),
        "loss_weights": np.array(
            [ALIGN_F, MSE_F, DIST_F, SPILL_F], np.float32
        ),
        "reset_img": obs0["img"].detach().numpy(),
        "reset_aux": obs0["aux"].detach().numpy(),
    }
    for name, p in policy.named_parameters():
        out["w__" + name.replace(".", "__")] = p.detach().numpy().copy()

    scen_a = run_train_scenario(env, policy, detach_input=True)
    scen_b = run_train_scenario(env, policy, detach_input=False)
    for tag, scen in (("A", scen_a), ("B", scen_b)):
        for key in ("losses", "total", "mse_over_t", "actions",
                    "step_metrics", "final_img"):
            out[f"{tag}_{key}"] = scen[key]
        for name, g in scen["grads"].items():
            out[f"g{tag}__" + name.replace(".", "__")] = g

    fine_init = rng.uniform(-FINE_EPS, FINE_EPS, (B, N, 3)).astype(np.float32)
    out["fine_init"] = fine_init
    scen_c = run_ttc_scenario(env, policy, fine_init)
    for key in ("losses", "mse_over_t", "actions", "step_metrics",
                "final_img", "fine_final"):
        out[f"C_{key}"] = scen_c[key]

    np.savez(OUT / "ttt_rollout.npz", **out)
    print("ttt_rollout.npz", "ok",
          f"({len(out)} arrays, A total={scen_a['total']:.6f})")
    print("A losses [mse dist bound align]:", scen_a["losses"])
    print("C losses [mse dist bound align]:", scen_c["losses"])


if __name__ == "__main__":
    main()
