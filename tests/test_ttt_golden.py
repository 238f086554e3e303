"""Cross-implementation parity for the TTT rollout (VERDICT r2 item 1).

Compares ``train.ttt.ttt_rollout`` against goldens captured from the torch
reference (``train_with_env_com_trunc_advantage_ttt.py:169-360``) by
``scripts/capture_ttt_goldens.py`` — identical injected sun positions,
error tensors, policy weights, and TTC ``fine_error_vec`` init. Covers:

  * residual action accumulation ``normalize(raw_delta + prev)`` (ref :253);
  * truncated BPTT (mse overwrite / scaled dist+bound at segment ends,
    carry detach) — verified by the VALUES and by the GRADIENTS of the
    blended training loss w.r.t. every policy parameter, with both
    ``detach_input`` settings;
  * advantage-style alignment accumulation (ref :325-328,355);
  * test-time compute: the persistent Adam-driven ``fine_error_vec``'s
    final value after 4×2 inner steps must match torch's Adam bit-for-fp32.
"""

import pathlib

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from doodle_tpu.core.scene import make_scene
from doodle_tpu.env import env as env_lib
from doodle_tpu.models.policy import PolicyNet
from doodle_tpu.train.ttt import ttt_rollout

GOLD = pathlib.Path(__file__).parent / "goldens" / "ttt_rollout.npz"

pytestmark = pytest.mark.skipif(
    not GOLD.exists(), reason="run scripts/capture_ttt_goldens.py first"
)


@pytest.fixture(scope="module")
def g():
    return dict(np.load(GOLD))


@pytest.fixture(scope="module")
def setup(g):
    scene = make_scene(g["helio"], g["targ_pos"], g["targ_norm"])
    cfg = env_lib.EnvConfig(
        resolution=int(g["resolution"]),
        batch_size=int(g["B"]),
        sigma_scale=float(g["sigma_scale"]),
        error_scale_mrad=float(g["error_scale"]),
        new_sun_pos_every_reset=False,
        new_errors_every_reset=False,
        use_error_mask=False,
        exponential_risk=False,
        field_init_noise=0.0,   # capture zeroes initial_action_noise
        precision="highest",
    )
    state = env_lib.set_sun_pos(
        scene, cfg, None, g["sun"], jax.random.PRNGKey(0)
    )
    state = state.replace(errors=jnp.asarray(g["errors_b"]))

    policy = PolicyNet(
        num_heliostats=int(g["N"]),
        enc_dim=int(g["enc_dim"]),
        lstm_hid=int(g["lstm_hid"]),
        architecture="lstm",
        encoder="com",
        dropout=0.0,
        normalize_output=False,
    )
    params = {"params": port_torch_params(g, int(g["lstm_hid"]))}
    return scene, cfg, state, policy, params


def port_torch_params(g, H):
    """Map the captured torch state_dict into the flax param tree.

    torch LSTM packs gates as [i, f, g, o] rows of ``weight_ih/hh_l0``;
    flax ``OptimizedLSTMCell`` splits them into per-gate Dense kernels
    (input side bias-free), so the two torch biases fold into the
    hidden-side bias: ``b = b_ih + b_hh``.
    """
    w = {k[len("w__"):]: v for k, v in g.items() if k.startswith("w__")}

    def gate(mat, i):
        return np.ascontiguousarray(mat[i * H:(i + 1) * H].T)

    wi, wh = w["rnn__weight_ih_l0"], w["rnn__weight_hh_l0"]
    b = w["rnn__bias_ih_l0"] + w["rnn__bias_hh_l0"]
    lstm = {}
    for i, name in enumerate("ifgo"):
        lstm["i" + name] = {"kernel": gate(wi, i)}
        lstm["h" + name] = {"kernel": gate(wh, i), "bias": b[i * H:(i + 1) * H]}
    tree = {
        "COMEncoder_0": {
            "Dense_0": {
                "kernel": w["encoder__proj__0__weight"].T,
                "bias": w["encoder__proj__0__bias"],
            }
        },
        "OptimizedLSTMCell_0": lstm,
        "LayerNorm_0": {
            "scale": w["head__0__weight"], "bias": w["head__0__bias"]
        },
        "Dense_0": {
            "kernel": w["head__1__weight"].T, "bias": w["head__1__bias"]
        },
        "Dense_1": {
            "kernel": w["head__4__weight"].T, "bias": w["head__4__bias"]
        },
    }
    return jax.tree.map(jnp.asarray, tree)


def flax_grads_to_torch(grads, H):
    """Inverse of :func:`port_torch_params` for gradient comparison."""
    p = grads["params"]
    lstm = p["OptimizedLSTMCell_0"]
    out = {
        "encoder.proj.0.weight": np.asarray(
            p["COMEncoder_0"]["Dense_0"]["kernel"]).T,
        "encoder.proj.0.bias": np.asarray(
            p["COMEncoder_0"]["Dense_0"]["bias"]),
        "head.0.weight": np.asarray(p["LayerNorm_0"]["scale"]),
        "head.0.bias": np.asarray(p["LayerNorm_0"]["bias"]),
        "head.1.weight": np.asarray(p["Dense_0"]["kernel"]).T,
        "head.1.bias": np.asarray(p["Dense_0"]["bias"]),
        "head.4.weight": np.asarray(p["Dense_1"]["kernel"]).T,
        "head.4.bias": np.asarray(p["Dense_1"]["bias"]),
        "rnn.weight_ih_l0": np.concatenate(
            [np.asarray(lstm["i" + n]["kernel"]).T for n in "ifgo"]),
        "rnn.weight_hh_l0": np.concatenate(
            [np.asarray(lstm["h" + n]["kernel"]).T for n in "ifgo"]),
        # flax has one bias; torch splits it — grads of b_ih and b_hh are
        # equal (they enter additively), each equal to the flax bias grad.
        "rnn.bias_ih_l0": np.concatenate(
            [np.asarray(lstm["h" + n]["bias"]) for n in "ifgo"]),
    }
    out["rnn.bias_hh_l0"] = out["rnn.bias_ih_l0"]
    return out


def test_reset_matches_reference(g, setup):
    scene, cfg, state, policy, params = setup
    _, obs = env_lib.reset(scene, cfg, state, jax.random.PRNGKey(1))
    np.testing.assert_allclose(
        np.asarray(obs["img"]), g["reset_img"], rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(obs["aux"]), g["reset_aux"], rtol=1e-5, atol=1e-5
    )


def _run_train(setup, g, detach_input, with_grads=True):
    scene, cfg, state, policy, params = setup
    align_f, mse_f, dist_f, spill_f = (float(x) for x in g["loss_weights"])

    def run(p):
        res = ttt_rollout(
            policy, p, scene, cfg, state, jax.random.PRNGKey(2),
            k=int(g["k"]), T=int(g["T"]),
            truncate_every=int(g["truncate_every"]),
            detach_input=detach_input,
            deterministic=True,
            collect_actions=True,
        )
        total = (align_f * res.losses["alignment_loss"]
                 + mse_f * res.losses["mse"]
                 + dist_f * res.losses["dist"]
                 + spill_f * res.losses["bound"])
        return total, res

    if with_grads:
        (total, res), grads = jax.value_and_grad(run, has_aux=True)(params)
        return total, res, grads
    total, res = run(params)
    return total, res, None


@pytest.mark.parametrize("tag,detach", [("A", True), ("B", False)])
def test_train_rollout_matches_reference(g, setup, tag, detach):
    total, res, grads = _run_train(setup, g, detach)

    ref_losses = g[f"{tag}_losses"]   # [mse, dist, bound, align]
    got = np.array([
        float(res.losses["mse"]), float(res.losses["dist"]),
        float(res.losses["bound"]), float(res.losses["alignment_loss"]),
    ])
    np.testing.assert_allclose(got, ref_losses, rtol=5e-4, atol=1e-6)
    np.testing.assert_allclose(
        float(total), float(g[f"{tag}_total"]), rtol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(res.mse_over_t), g[f"{tag}_mse_over_t"],
        rtol=5e-4, atol=1e-7,
    )
    # full residual action trajectory, every step (no TTC: all calls outer)
    np.testing.assert_allclose(
        np.asarray(res.actions_over_t), g[f"{tag}_actions"],
        rtol=1e-4, atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(res.final_img), g[f"{tag}_final_img"],
        rtol=1e-3, atol=1e-6,
    )

    got_grads = flax_grads_to_torch(grads, int(g["lstm_hid"]))
    for name, gv in got_grads.items():
        ref = g[f"g{tag}__" + name.replace(".", "__")]
        scale = max(np.abs(ref).max(), 1e-12)
        np.testing.assert_allclose(
            gv, ref, rtol=2e-3, atol=2e-4 * scale,
            err_msg=f"grad mismatch: {name} ({tag})",
        )


def test_ttc_rollout_matches_reference(g, setup):
    scene, cfg, state, policy, params = setup
    T = int(g["T_ttc"])
    fine_start = int(g["fine_start"])
    res = ttt_rollout(
        policy, params, scene, cfg, state, jax.random.PRNGKey(3),
        k=int(g["k"]), T=T,
        truncate_every=int(g["truncate_every"]),
        detach_input=True,
        enable_fine=True,
        fine_adjustment_start_t=fine_start,
        fine_steps_per_t=int(g["fine_steps"]),
        fine_lr=float(g["fine_lr"]),
        test_time=True,
        deterministic=True,
        collect_actions=True,
        fine_init=g["fine_init"],
    )
    got = np.array([
        float(res.losses["mse"]), float(res.losses["dist"]),
        float(res.losses["bound"]), float(res.losses["alignment_loss"]),
    ])
    np.testing.assert_allclose(got, g["C_losses"], rtol=5e-4, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(res.mse_over_t), g["C_mse_over_t"], rtol=5e-4, atol=1e-7
    )
    # final fine_error_vec after 2 Adam inner steps × 4 fine timesteps —
    # the integral of the whole inner-optimization trajectory.
    np.testing.assert_allclose(
        np.asarray(res.fine_vec), g["C_fine_final"], rtol=1e-3, atol=1e-6
    )
    # outer actions: the capture records inner fine calls too — per t ≥
    # fine_start the call pattern is [inner × fine_steps, outer].
    fine_steps = int(g["fine_steps"])
    ref_actions = g["C_actions"]
    for t in range(T):
        if t < fine_start:
            idx = t
        else:
            idx = fine_start + (t - fine_start) * (fine_steps + 1) + fine_steps
        np.testing.assert_allclose(
            np.asarray(res.actions_over_t[t]), ref_actions[idx],
            rtol=1e-4, atol=2e-5, err_msg=f"outer action t={t}",
        )
