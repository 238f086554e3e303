"""No-policy test-time-compute probe (parity:
``fine_adjustment_sanity_check.py:9-167``).

Phase 1: alignment-pretrain a global normal tensor. Phase 2: per-timestep
inner optimization of a persistent ``fine_error_vec`` on the dist loss,
printing before/after dist+mse each step — the TTC mechanism isolated from
the policy.

    python scripts/fine_adjustment_sanity_check.py
"""

import argparse
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import optax

from doodle_tpu.core.scene import make_scene
from doodle_tpu.env import env as env_lib
from doodle_tpu.ops.optics import normalize


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--num_heliostats", type=int, default=50)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--resolution", type=int, default=64)
    p.add_argument("--pretrain_steps", type=int, default=150)
    p.add_argument("--T", type=int, default=5)
    p.add_argument("--fine_steps_per_t", type=int, default=20)
    p.add_argument("--fine_lr", type=float, default=3e-4)
    p.add_argument("--sigma_scale", type=float, default=0.01)
    p.add_argument("--error_scale_mrad", type=float, default=90.0)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    key = jax.random.PRNGKey(args.seed)
    k_geo, k_env, k_init, k_fine = jax.random.split(key, 4)
    pos = jax.random.uniform(k_geo, (args.num_heliostats, 3)) * 10.0 + 80.0
    pos = pos.at[:, 2].set(0.0)
    scene = make_scene(pos, [0.0, -5.0, 0.0], [0.0, 1.0, 0.0])
    cfg = env_lib.EnvConfig(
        resolution=args.resolution, batch_size=args.batch_size,
        sigma_scale=args.sigma_scale, error_scale_mrad=args.error_scale_mrad,
    )
    state = env_lib.init_state(scene, cfg, k_env)

    # ---- phase 1: alignment pretrain of the base normals (ref :80-103)
    base = normalize(
        state.ideal_normals
        + 0.1 * jax.random.normal(k_init, state.ideal_normals.shape)
    )
    opt = optax.adam(1e-2)
    opt_state = opt.init(base)

    @jax.jit
    def pre_step(base, opt_state):
        def loss_fn(n):
            _, m, _ = env_lib.step(scene, cfg, state, normalize(n))
            return m["alignment_loss"]

        loss, g = jax.value_and_grad(loss_fn)(base)
        up, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(base, up), opt_state, loss

    for i in range(args.pretrain_steps):
        base, opt_state, align = pre_step(base, opt_state)
    print(f"pretrained alignment: {float(align):.2f} mrad")

    # ---- phase 2: per-step TTC on a persistent fine vector (ref :109-164).
    # Perturb the pretrained base first — a perfectly aligned base has
    # dist ≈ 0 and leaves TTC nothing to do; the probe simulates the
    # imperfect policy output TTC exists to correct.
    k_fine, k_perturb = jax.random.split(k_fine)
    base = normalize(
        base + 0.01 * jax.random.normal(k_perturb, base.shape)
    )
    fine = jax.random.uniform(k_fine, base.shape, base.dtype, -1e-4, 1e-4)
    fopt = optax.adam(args.fine_lr)
    fstate = fopt.init(fine)
    base = jax.lax.stop_gradient(normalize(base))

    def dist_of(n):
        _, m, _ = env_lib.step(scene, cfg, state, n)
        return m["dist"], m["mse"]

    @jax.jit
    def ttc_step(fine, fstate):
        d0, m0 = dist_of(normalize(base + fine))

        def inner(carry, _):
            f, s = carry
            g = jax.grad(lambda f: dist_of(normalize(base + f))[0])(f)
            up, s = fopt.update(g, s)
            return (optax.apply_updates(f, up), s), None

        (fine, fstate), _ = jax.lax.scan(
            inner, (fine, fstate), None, length=args.fine_steps_per_t
        )
        d1, m1 = dist_of(normalize(base + fine))
        return fine, fstate, d0, d1, m0, m1

    improved = 0
    for t in range(args.T):
        fine, fstate, d0, d1, m0, m1 = ttc_step(fine, fstate)
        print(
            f"t={t}: dist {float(d0):.4e} -> {float(d1):.4e} | "
            f"mse {float(m0):.4e} -> {float(m1):.4e}"
        )
        improved += int(float(d1) < float(d0))

    assert improved >= args.T - 1, "TTC failed to reduce dist loss"
    print("FINE ADJUSTMENT SANITY OK")


if __name__ == "__main__":
    main()
