"""Behavioral env probe (parity: ``newenv/sanity_test_env.py:25-113``).

The reference's second verification idiom (SURVEY §4.2): step the env with
the *ideal* normals — every flux/alignment loss should sit near its floor —
then reset and step with *random* actions — losses should be far worse —
and dump per-sun flux image grids (pred | target | diff) for eyeballing.

    python scripts/sanity_test_env.py [--platform cpu] [--out sanity_out]
"""

import argparse
import sys

sys.path.insert(0, ".")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--num_heliostats", type=int, default=50)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--resolution", type=int, default=128)
    p.add_argument("--sigma_scale", type=float, default=0.01)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--platform", type=str, default=None,
                   help="force a JAX platform (e.g. cpu)")
    p.add_argument("--out", type=str, default=None,
                   help="dump image grids as PNGs under this dir")
    args = p.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from doodle_tpu.core.scene import make_scene
    from doodle_tpu.env import env as env_lib
    from doodle_tpu.ops.optics import normalize

    key = jax.random.PRNGKey(args.seed)
    k_geo, k_env, k_rand = jax.random.split(key, 3)
    pos = jax.random.uniform(k_geo, (args.num_heliostats, 3)) * 10.0 + 80.0
    pos = pos.at[:, 2].set(0.0)
    scene = make_scene(pos, [0.0, -5.0, 0.0], [0.0, 1.0, 0.0])
    cfg = env_lib.EnvConfig(
        resolution=args.resolution, batch_size=args.batch_size,
        sigma_scale=args.sigma_scale, error_scale_mrad=90.0,
    )
    env = env_lib.HelioEnv(scene, cfg, k_env)
    obs = env.reset()
    assert obs["img"].shape == (args.batch_size, args.resolution,
                                args.resolution)

    # --- 1a. zero-error env + ideal normals → losses at their exact floor
    cfg0 = env_lib.EnvConfig(
        resolution=args.resolution, batch_size=args.batch_size,
        sigma_scale=args.sigma_scale, error_scale_mrad=0.0,
    )
    env0 = env_lib.HelioEnv(scene, cfg0, k_env)
    env0.reset()
    ideal0 = env0.state.ideal_normals
    _, m_zero, _ = env0.step(ideal0.reshape(args.batch_size, -1))
    print("zero-error ideal losses:",
          {k: f"{float(v):.4g}" for k, v in m_zero.items()})
    # < 1 mrad: f32 acos near 1 is ill-conditioned (√(2·eps) ≈ 0.35 mrad),
    # the same numerical floor the reference's nextafter clamp has.
    assert float(m_zero["alignment_loss"]) < 1.0, (
        "ideal normals in a zero-error field must have ~zero alignment error"
    )
    assert float(m_zero["mse"]) < 1e-8, (
        "ideal normals in a zero-error field must reproduce the target image"
    )

    # --- 1b. noisy env + ideal normals → losses at the error-model floor
    # (the field perturbs the commanded normals by ~error_scale_mrad, so
    # alignment sits at the error scale, not zero — reference behavior)
    ideal = env.state.ideal_normals
    obs_i, m_ideal, _ = env.step(ideal.reshape(args.batch_size, -1))
    print("ideal-normals losses:",
          {k: f"{float(v):.4g}" for k, v in m_ideal.items()})
    assert float(m_ideal["alignment_loss"]) < 3.0 * cfg.error_scale_mrad, (
        "ideal actions should sit near the error-model floor"
    )

    # --- 2. reset re-rolls the initial-action noise (reference behavior:
    # init_actions resamples every call) but keeps shapes/finiteness and,
    # with the default flags, the SAME error tensors and sun positions.
    obs2 = env.reset()
    assert obs2["img"].shape == obs["img"].shape
    assert np.isfinite(np.asarray(obs2["img"])).all()
    assert not np.allclose(np.asarray(obs["img"]), np.asarray(obs2["img"])), (
        "reset must re-roll the initial-action noise (reference init_actions)"
    )

    # --- 3. random actions → losses far off the floor
    rand = normalize(
        jax.random.normal(k_rand, (args.batch_size, args.num_heliostats, 3))
    )
    obs_r, m_rand, _ = env.step(rand.reshape(args.batch_size, -1))
    print("random-action losses:",
          {k: f"{float(v):.4g}" for k, v in m_rand.items()})
    assert float(m_rand["alignment_loss"]) > 5.0 * float(
        m_ideal["alignment_loss"]
    ), "random normals should be far off the ideal-action floor"
    # mse saturates at large miss (pred ≈ 0 everywhere → mse ≈ mean targ²),
    # so the contrast vs the 90-mrad-error floor is small but must exist;
    # the dist loss even DROPS for random actions (flux off-image means no
    # energy lands on the positive-distance ring) — a faithful reference
    # quirk of the |err|·distance_map formulation.
    assert float(m_rand["mse"]) > float(m_ideal["mse"])

    # --- 4. image grids for eyeballing (pred | target | diff per sun)
    if args.out:
        import pathlib

        from PIL import Image

        base = pathlib.Path(args.out)
        base.mkdir(parents=True, exist_ok=True)
        target = np.asarray(env.state.target_img)
        for name, o in (("ideal", obs_i), ("random", obs_r)):
            pred = np.asarray(o["img"])
            hi = max(pred.max(), target.max(), 1e-9)
            rows = []
            for b in range(min(4, args.batch_size)):
                row = np.concatenate(
                    [pred[b] / hi, target[b] / hi,
                     np.abs(pred[b] - target[b]) / hi], axis=1
                )
                rows.append(row)
            grid = np.clip(np.concatenate(rows, axis=0), 0.0, 1.0)
            Image.fromarray((grid * 255).astype(np.uint8)).save(
                base / f"{name}_pred_target_diff.png"
            )
        print(f"image grids written under {base}/")

    print("ENV BEHAVIOR SANITY OK")


if __name__ == "__main__":
    main()
