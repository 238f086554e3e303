"""Multi-seed validation of the r4 TTC delivery result (VERDICT r4 item 3).

The r4 headline (held-out extrap MSE 7.3e-5, `results/ttc_gap_sweep.json`)
was the best of 54 combos selected on the same eval draws it was reported
on, from ONE trained checkpoint (seed 42). This script re-trains the
`ttt_config4_usable` setup on fresh seeds — new geometry, new error
tensors, new eval draws — and runs ONLY the pre-selected winning combo
(fine_steps_per_t=60, extra_steps=8, fine_lr=1e-3, MSE inner objective;
shipped as ``doodle_tpu.train.ttt.TTC_DELIVERY_RECIPE``), plus the
reference TTC settings (spt5, lr 1e-4, dist objective) as the per-seed
control. No selection happens on these draws: the delivery number is the
median winner-combo MSE across seeds.

Run on the TPU: `timeout 7200 python scripts/ttc_multiseed.py`.
Writes results/ttc_multiseed.json incrementally (one seed at a time).
"""
from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp

RESULTS = pathlib.Path("results/ttc_multiseed.json")
CKPT_ROOT = pathlib.Path("results/ttc_multiseed_ckpt").absolute()

SEEDS = (7, 123, 2026)          # fresh: r4's sweep checkpoint was seed 42

# The training setup of results/ttt_config4_usable — identical to
# scripts/ttc_gap_sweep.py's CFG_KW apart from the seed.
CFG_KW = dict(
    num_heliostats=500, resolution=256, batch_size=16, num_batches=4,
    steps=300, T=6, k=2, sigma_scale=0.05, error_scale_mrad=30.0,
    residual_head=True, alignment_pretrain_steps=0, warmup_steps=0,
    boundary_thresh=1000.0, truncate_every=4, fine_steps_per_t=5,
    fine_enabled="test", extra_steps=2, lr=5e-4, scheduler="exp",
    exp_decay=0.999, encoder_dtype="bfloat16", test_size=8,
    eval_every=100, log_every=50,
)


def run_seed(seed: int) -> dict:
    from doodle_tpu.env import env as env_lib
    from doodle_tpu.models.policy import PolicyNet
    from doodle_tpu.train.trainer import make_ttt_geometry
    from doodle_tpu.train.ttt import (
        TTC_DELIVERY_RECIPE,
        TTTConfig,
        _curriculum_angles,
        ttt_rollout,
        ttt_train_and_eval,
    )
    from doodle_tpu.utils.checkpoint import restore_checkpoint

    ckpt = CKPT_ROOT / f"seed{seed}"
    cfg = TTTConfig(**CFG_KW, seed=seed, checkpoint_dir=str(ckpt),
                    checkpoint_every=100)
    row = {}
    if not (ckpt / "latest").exists():
        from doodle_tpu.utils import JsonlWriter

        t0 = time.time()
        # The JsonlWriter trace doubles as the seed-replicate of the
        # r4 ttt_config4_usable run (VERDICT r4 item 7): start→best
        # extrap/interp MSE per fresh seed.
        best = ttt_train_and_eval(
            cfg, writer=JsonlWriter(str(ckpt / "log"), params={"seed": seed})
        )
        row["train_s"] = round(time.time() - t0, 0)
        row["train_best_extrap_mse_refttc"] = float(best)
        print(f"seed {seed}: trained in {row['train_s']:.0f}s "
              f"(ref-TTC best extrap {best:.3e})", flush=True)

    # ---- rebuild the eval setup exactly as the trainer does (same keys)
    key = jax.random.PRNGKey(seed)
    k_geo, k_env, k_policy, k_run = jax.random.split(key, 4)
    scene = make_ttt_geometry(cfg.num_heliostats, cfg.heliostat_distance,
                              k_geo)
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

    env_keys = jax.random.split(k_env, cfg.num_batches + 2)
    cfg_ex, cfg_in = env_cfg_for(ex_az, ex_el), env_cfg_for(in_az, in_el)
    state_ex = env_lib.init_state(scene, cfg_ex, env_keys[-2])
    state_in = env_lib.init_state(scene, cfg_in, env_keys[-1])

    policy = PolicyNet(
        num_heliostats=scene.num_heliostats, architecture=cfg.architecture,
        encoder=cfg.encoder, lstm_hid=cfg.lstm_hid, dropout=cfg.dropout,
        encoder_dtype=cfg.encoder_dtype,
        encoder_gelu_approximate=cfg.encoder_gelu == "tanh",
        normalize_output=False, zero_init_head=True,
    )
    ck = restore_checkpoint(str(ckpt / "latest"))
    params = ck["params"]

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

    combos = {
        # the pre-selected winner — the only combo scored for delivery
        "winner": dict(
            spt=TTC_DELIVERY_RECIPE["fine_steps_per_t"],
            extra=TTC_DELIVERY_RECIPE["extra_steps"],
            lr=TTC_DELIVERY_RECIPE["fine_lr"],
            mw=TTC_DELIVERY_RECIPE["fine_mse_w"],
            dw=TTC_DELIVERY_RECIPE["fine_dist_w"],
        ),
        # reference TTC settings as the per-seed control
        "ref_ttc": dict(spt=5, extra=2, lr=1e-4, mw=0.0, dw=1.0),
    }
    for name, c in combos.items():
        T_total = cfg.T + c["extra"]
        for split, (ecfg, st) in (("extrap", (cfg_ex, state_ex)),
                                  ("interp", (cfg_in, state_in))):
            ev = make_eval(ecfg, c["spt"], T_total)
            t0 = time.time()
            mse, mse_t = ev(params, st, k_run, jnp.float32(c["lr"]),
                            jnp.float32(c["mw"]), jnp.float32(c["dw"]))
            mse_t = np.asarray(mse_t)
            row[f"{name}_{split}_final_mse"] = float(mse_t[-1])
            row[f"{name}_{split}_best_mse_t"] = float(mse_t.min())
            row[f"{name}_{split}_s"] = round(time.time() - t0, 1)
            print(f"seed {seed} {name} {split}: final {mse_t[-1]:.3e} "
                  f"best-t {mse_t.min():.3e}", flush=True)
    return row


def main():
    out = {"recipe": "spt60_ex8_lr0.001_mse (TTC_DELIVERY_RECIPE)",
           "floor_probe_mse": 7.9e-4,
           "r4_best_of_54_extrap_mse": 7.3e-5,
           "seeds": {}}
    if RESULTS.exists():
        out = json.loads(RESULTS.read_text())
    for seed in SEEDS:
        if str(seed) in out["seeds"]:
            continue
        out["seeds"][str(seed)] = run_seed(seed)
        RESULTS.write_text(json.dumps(out, indent=1) + "\n")

    finals = [s["winner_extrap_final_mse"] for s in out["seeds"].values()
              if "winner_extrap_final_mse" in s]
    if finals:
        out["winner_extrap_final_median"] = float(np.median(finals))
        out["winner_extrap_final_range"] = [float(min(finals)),
                                            float(max(finals))]
    RESULTS.write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
