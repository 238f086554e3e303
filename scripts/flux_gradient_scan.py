#!/usr/bin/env python3
"""Measured flux-gradient scan at config-4 scale (VERDICT r2 item 2).

Question: at N=500 / 256² — the geometry the framework targets — where in
(sigma_scale × error_scale_mrad) does the mse/dist flux blend have USABLE
gradients, i.e. where could the non-frozen loss schedule actually improve
flux delivery? r2 showed training moves alignment but leaves test MSE flat
at this scale; this replaces the prose physics argument with numbers.

For each (sigma_scale, error_scale) and operating point (the policy's state
after alignment pretraining: actions tilted `perturb_mrad` off ideal):

  * ``mse`` / ``dist``   — loss values;
  * ``|g_mse|``/``|g_dist|`` — gradient norms w.r.t. the action;
  * ``cos_mse``/``cos_dist`` — cosine between the DESCENT direction
    (−gradient) and the correction direction (ideal − action). ≈ +1 means
    flux-gradient descent actively re-aligns the mirrors (usable signal);
    ≈ 0 means the flux losses are blind to misalignment at this config.

Config-4 flags: B=128 suns, worst-k% error mask on. Runs on the TPU
(~5 jit compiles, one per sigma_scale — it is a static splat parameter).

    python scripts/flux_gradient_scan.py [--out results/flux_grad_scan.json]
"""

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--num_heliostats", type=int, default=500)
    p.add_argument("--resolution", type=int, default=256)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--sigmas", type=str, default="0.005,0.01,0.02,0.05,0.1")
    p.add_argument("--error_scales", type=str, default="30,90,180")
    p.add_argument("--perturb_mrad", type=str, default="3,10,30")
    p.add_argument("--use_error_mask", type=lambda s: s.lower() == "true",
                   default=True)
    p.add_argument("--out", type=str, default="results/flux_grad_scan.json")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from doodle_tpu.core.scene import make_scene
    from doodle_tpu.env import env as env_lib
    from doodle_tpu.ops.optics import normalize

    key = jax.random.PRNGKey(0)
    k_geo, k_sun, k_err, k_pert = jax.random.split(key, 4)
    N, RES, B = args.num_heliostats, args.resolution, args.batch_size
    pos = jax.random.uniform(k_geo, (N, 3)) * 10.0 + 80.0
    pos = pos.at[:, 2].set(0.0)
    scene = make_scene(pos, [0.0, -5.0, 0.0], [0.0, 1.0, 0.0])

    rows = []
    t0 = time.time()
    for sigma in [float(s) for s in args.sigmas.split(",")]:
        cfg = env_lib.EnvConfig(
            resolution=RES, batch_size=B, sigma_scale=sigma,
            error_scale_mrad=1.0,   # errors injected below; knob unused
            use_error_mask=args.use_error_mask,
            precision="default", splat_backend="auto",
        )
        state0 = env_lib.init_state(
            scene, cfg, jax.random.fold_in(k_sun, int(sigma * 1e4))
        )

        @jax.jit
        def probe(state, action):
            ideal = state.ideal_normals

            def mse_fn(a):
                _, m, _ = env_lib.step(scene, cfg, state, a)
                return m["mse"]

            def dist_fn(a):
                _, m, _ = env_lib.step(scene, cfg, state, a)
                return m["dist"]

            (mse, g_mse) = jax.value_and_grad(mse_fn)(action)
            (dist, g_dist) = jax.value_and_grad(dist_fn)(action)
            corr = ideal - action          # direction that fixes alignment

            def cosine(g):
                descent = -g
                num = jnp.sum(descent * corr)
                den = (jnp.linalg.norm(descent) * jnp.linalg.norm(corr)
                       + 1e-30)
                return num / den

            return jnp.stack([
                mse, dist,
                jnp.linalg.norm(g_mse), jnp.linalg.norm(g_dist),
                cosine(g_mse), cosine(g_dist),
            ])

        for err_scale in [float(s) for s in args.error_scales.split(",")]:
            errors = (
                jax.random.normal(jax.random.fold_in(k_err, int(err_scale)),
                                  (B, N, 2)) * err_scale
            )
            state = state0.replace(errors=errors)
            for pert in [float(s) for s in args.perturb_mrad.split(",")]:
                noise = (
                    jax.random.normal(
                        jax.random.fold_in(k_pert, int(pert)),
                        (B, N, 3),
                    ) * (pert / 1000.0)
                )
                action = normalize(state.ideal_normals + noise)
                vals = np.asarray(probe(state, action), np.float64)
                row = {
                    "sigma_scale": sigma,
                    "error_scale_mrad": err_scale,
                    "perturb_mrad": pert,
                    "mse": vals[0], "dist": vals[1],
                    "g_mse": vals[2], "g_dist": vals[3],
                    "cos_mse": vals[4], "cos_dist": vals[5],
                }
                rows.append(row)
                print(
                    f"sigma={sigma:<6} err={err_scale:<5} pert={pert:<4} "
                    f"mse={vals[0]:.3e} dist={vals[1]:.3e} "
                    f"|g_mse|={vals[2]:.3e} |g_dist|={vals[3]:.3e} "
                    f"cos_mse={vals[4]:+.3f} cos_dist={vals[5]:+.3f}",
                    flush=True,
                )

    out = pathlib.Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps({
        "config": vars(args),
        "geometry": {"N": N, "res": RES, "B": B},
        "rows": rows,
        "wall_s": round(time.time() - t0, 1),
    }, indent=1))
    print(f"-> {out} ({time.time() - t0:.0f}s)")


if __name__ == "__main__":
    main()
