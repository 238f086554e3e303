"""Close-or-characterize the 12× policy+TTC gap at config-4 (VERDICT r3
item 4).

r3 measured best held-out extrapolation MSE 9.63e-3 with policy+TTC
(`results/ttt_config4_usable`) against a 7.9e-4 direct-optimization floor
(`results/flux_direct_probe.json`) — and never swept the TTC knobs. This
script:

1. trains the `ttt_config4_usable` setup ONCE (TTC is test-only there, so
   trained params are identical across TTC settings), checkpointed;
2. sweeps the test-time-compute knobs on the held-out envs:
   * static (recompile per combo): fine_steps_per_t ∈ {5, 20, 60},
     extra_steps ∈ {2, 8}
   * traced (one compile serves all): fine_lr ∈ {1e-4, 3e-4, 1e-3},
     (fine_mse_w, fine_dist_w) ∈ {(0,1) ref dist-only, (1,0) pure-mse,
     (1,1e-5) blend}
3. reports best extrap/interp MSE vs the probe floor.

Run on the TPU: `timeout 7200 python scripts/ttc_gap_sweep.py [--skip_train]`.
Writes results/ttc_gap_sweep.json incrementally.
"""
from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp

RESULTS = pathlib.Path("results/ttc_gap_sweep.json")
CKPT = pathlib.Path("results/ttc_sweep_ckpt").absolute()

CFG_KW = dict(
    num_heliostats=500, resolution=256, batch_size=16, num_batches=4,
    steps=300, T=6, k=2, sigma_scale=0.05, error_scale_mrad=30.0,
    residual_head=True, alignment_pretrain_steps=0, warmup_steps=0,
    boundary_thresh=1000.0, truncate_every=4, fine_steps_per_t=5,
    fine_enabled="test", extra_steps=2, lr=5e-4, scheduler="exp",
    exp_decay=0.999, encoder_dtype="bfloat16", test_size=8,
    eval_every=100, log_every=50, seed=42,
)


def train_once():
    from doodle_tpu.train.ttt import TTTConfig, ttt_train_and_eval

    cfg = TTTConfig(**CFG_KW, checkpoint_dir=str(CKPT), checkpoint_every=100)
    t0 = time.time()
    best = ttt_train_and_eval(cfg)
    print(f"train done in {time.time()-t0:.0f}s best_extrap_mse={best:.3e}",
          flush=True)
    return float(best)


def sweep():
    from doodle_tpu.env import env as env_lib
    from doodle_tpu.models.policy import PolicyNet
    from doodle_tpu.train.trainer import make_ttt_geometry
    from doodle_tpu.train.ttt import TTTConfig, _curriculum_angles, ttt_rollout
    from doodle_tpu.utils.checkpoint import restore_checkpoint

    cfg = TTTConfig(**CFG_KW)
    key = jax.random.PRNGKey(cfg.seed)
    k_geo, k_env, k_policy, k_run = jax.random.split(key, 4)
    scene = make_ttt_geometry(cfg.num_heliostats, cfg.heliostat_distance,
                              k_geo)
    N = scene.num_heliostats
    angles, (ex_az, ex_el), (in_az, in_el) = _curriculum_angles(cfg)

    def env_cfg_for(az, el):
        return env_lib.EnvConfig(
            resolution=cfg.resolution, batch_size=cfg.test_size,
            sigma_scale=cfg.sigma_scale,
            error_scale_mrad=cfg.error_scale_mrad,
            azimuth=az, elevation=el,
            half_angle_deg=cfg.half_angle_deg,
            precision=cfg.precision, splat_backend=cfg.splat_backend,
        )

    cfg_ex = env_cfg_for(ex_az, ex_el)
    cfg_in = env_cfg_for(in_az, in_el)
    env_keys = jax.random.split(k_env, cfg.num_batches + 2)
    state_ex = env_lib.init_state(scene, cfg_ex, env_keys[-2])
    state_in = env_lib.init_state(scene, cfg_in, env_keys[-1])

    policy = PolicyNet(
        num_heliostats=N, architecture=cfg.architecture, encoder=cfg.encoder,
        lstm_hid=cfg.lstm_hid, dropout=cfg.dropout,
        encoder_dtype=cfg.encoder_dtype,
        encoder_gelu_approximate=cfg.encoder_gelu == "tanh",
        normalize_output=False, zero_init_head=True,
    )
    ck = restore_checkpoint(str(CKPT / "latest"))
    params = ck["params"]
    print("checkpoint loaded (step", ck.get("step"), ")", flush=True)

    out = {"floor_probe_mse": 7.9e-4,
           "r3_best_extrap_mse": 9.63e-3,
           "combos": {}}
    if RESULTS.exists():
        out = json.loads(RESULTS.read_text())

    def make_eval(env_cfg, steps_per_t, T_total):
        @jax.jit
        def ev(params, state, key, fine_lr, mse_w, dist_w):
            res = ttt_rollout(
                policy, params, scene, env_cfg, state, key,
                k=cfg.k, T=T_total,
                truncate_every=cfg.truncate_every,
                enable_fine=True,
                fine_steps_per_t=steps_per_t,
                fine_lr=fine_lr,
                fine_adjustment_start_t=cfg.fine_adjustment_start_t,
                fine_init_eps=cfg.fine_init_eps,
                fine_mse_w=mse_w, fine_dist_w=dist_w,
                test_time=True, deterministic=True, init_base="ideal",
            )
            return res.losses["mse"], res.mse_over_t
        return ev

    for spt in (5, 20, 60):
        for extra in (2, 8):
            T_total = cfg.T + extra
            evs = {"extrap": (make_eval(cfg_ex, spt, T_total), state_ex),
                   "interp": (make_eval(cfg_in, spt, T_total), state_in)}
            for lr in (1e-4, 3e-4, 1e-3):
                for (mw, dw), oname in (((0.0, 1.0), "dist"),
                                        ((1.0, 0.0), "mse"),
                                        ((1.0, 1e-5), "blend")):
                    tag = f"spt{spt}_ex{extra}_lr{lr:g}_{oname}"
                    if tag in out["combos"]:
                        continue
                    row = {}
                    for split, (ev, st) in evs.items():
                        t0 = time.time()
                        mse, mse_t = ev(params, st, k_run,
                                        jnp.float32(lr), jnp.float32(mw),
                                        jnp.float32(dw))
                        mse_t = np.asarray(mse_t)
                        row[f"{split}_final_mse"] = float(mse_t[-1])
                        row[f"{split}_best_mse_t"] = float(mse_t.min())
                        row[f"{split}_s"] = round(time.time() - t0, 1)
                    out["combos"][tag] = row
                    print(tag, json.dumps(row), flush=True)
                    RESULTS.write_text(json.dumps(out, indent=1) + "\n")

    best = min(out["combos"].items(),
               key=lambda kv: kv[1]["extrap_final_mse"])
    out["best"] = {"tag": best[0], **best[1]}
    RESULTS.write_text(json.dumps(out, indent=1) + "\n")
    print("BEST:", best[0], json.dumps(best[1]))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip_train", action="store_true")
    args = ap.parse_args()
    if not args.skip_train and not (CKPT / "latest").exists():
        train_once()
    sweep()
