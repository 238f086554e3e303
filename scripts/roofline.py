"""Consolidated roofline / %-of-peak table for BASELINE.md (VERDICT r1 #5).

Instead of quoting vendor peak numbers, this measures EMPIRICAL ceilings on
the actual chip and expresses each hot component against them — arithmetic
a reviewer can re-run:

  * **exp ceiling** — a fused elementwise exp-chain (8 dependent exps per
    element, so the measurement is compute- not HBM-bound): the achievable
    VPU transcendental rate.
  * **MXU ceiling** — a large bf16 matmul: the achievable matmul FLOP/s.
  * **splat fwd / fwd+bwd** — per-call time of the fused Pallas splat at
    config-4 shapes; exp count = B·N·res (fx) + B·N·res (fy) per pass.
  * **encoder fwd** — CNN encode of a config-4 frame batch in bf16; conv
    FLOPs vs the MXU ceiling.
  * **EDT reset cost** — make_distance_maps at config 4 (the O(res³)
    two-pass min-plus transform; reset-time only, never in the hot loop).
  * **dispatch RTT** — single-call host↔device round trip (tunnel floor).

All timings use the bench.py methodology: distinct inputs per rep via scan,
device→host fetch as the completion barrier, slope between two rep counts.
Run on a quiet TPU from the repo root:  python scripts/roofline.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from bench import _make_actions, _setup, _timed_fetch

N, RES, B = 500, 256, 128          # config-4 geometry
BT, KT = 64, 2                     # config-4 trainer batch (B=64, k=2)


def slope_time(loop, make_input, r1, r2):
    t = {}
    for reps in (r1, r2):
        x = make_input(reps)
        t[reps] = _timed_fetch(loop, x)
    return (t[r2] - t[r1]) / (r2 - r1)


def exp_ceiling():
    """Fused chain of 8 dependent exps per element → compute-bound rate."""
    M = 8 * 1024 * 1024  # 32 MiB f32: HBM traffic amortized over 8 exps

    @jax.jit
    def loop(xs):
        def body(acc, x):
            y = x
            for _ in range(8):
                y = jnp.exp(y * 1e-3)   # dependent: no reassociation
            return acc + y.sum(), None
        return jax.lax.scan(body, 0.0, xs)[0]

    def mk(reps):
        return jax.random.normal(jax.random.PRNGKey(0), (reps, M), jnp.float32)

    dt = slope_time(loop, mk, 4, 16)
    return 8 * M / dt                       # exps/s


def mxu_ceiling():
    """Large bf16 matmul rate (achievable MXU FLOP/s)."""
    n = 4096

    @jax.jit
    def loop(xs):
        def body(acc, x):
            y = jnp.dot(x, x, preferred_element_type=jnp.float32)
            return acc + y.sum(), None
        return jax.lax.scan(body, 0.0, xs)[0]

    def mk(reps):
        return jax.random.normal(
            jax.random.PRNGKey(1), (reps, n, n), jnp.bfloat16
        )

    dt = slope_time(loop, mk, 2, 8)
    return 2 * n**3 / dt                    # FLOP/s


def splat_times(scene, cfg, state):
    from doodle_tpu.ops.splat_pallas import splat_summed_pallas
    from doodle_tpu.core.field import render

    fcfg = cfg.field_config(cfg.error_scale_mrad)

    @jax.jit
    def fwd(actions):
        def body(acc, a):
            img, _, _ = render(scene, fcfg, state.sun_pos, a, state.errors)
            return acc + img.sum(), None
        return jax.lax.scan(body, 0.0, actions)[0]

    @jax.jit
    def fwdbwd(actions):
        def body(acc, a):
            def loss(a_):
                img, _, _ = render(
                    scene, fcfg, state.sun_pos, a_, state.errors
                )
                return img.sum()
            v, g = jax.value_and_grad(loss)(a)
            return acc + v + g.sum(), None
        return jax.lax.scan(body, 0.0, actions)[0]

    def mk(reps):
        return _make_actions(state, reps, jax.random.PRNGKey(2))

    t_fwd = slope_time(fwd, mk, 20, 120)
    t_fb = slope_time(fwdbwd, mk, 10, 60)
    return t_fwd, t_fb


def encoder_time():
    from doodle_tpu.models.policy import PolicyNet

    policy = PolicyNet(num_heliostats=N, architecture="lstm",
                       dropout=0.0, encoder_dtype="bfloat16")
    img = jnp.zeros((1, KT, RES, RES))
    aux = jnp.zeros((1, 3 + N * 3))
    params = policy.init(jax.random.PRNGKey(3), img, aux,
                         policy.init_carry(1))

    @jax.jit
    def loop(xs):
        def body(acc, x):
            e = policy.apply(params, x, deterministic=True, method="encode")
            return acc + e.astype(jnp.float32).sum(), None
        return jax.lax.scan(body, 0.0, xs)[0]

    def mk(reps):
        return jax.random.normal(
            jax.random.PRNGKey(4), (reps, BT * KT, RES, RES), jnp.float32
        )

    dt = slope_time(loop, mk, 5, 25)
    # conv FLOPs for the 3×(5×5 conv, stride 1, same) stack 1→32→64→128
    # + Dense 128→128, per frame at RES².
    per_frame = 2 * RES * RES * 25 * (1 * 32 + 32 * 64 + 64 * 128) \
        + 2 * 128 * 128
    return dt, per_frame * BT * KT


def edt_time(scene, cfg, state):
    from doodle_tpu.ops.edt import distance_maps

    @jax.jit
    def loop(imgs):
        def body(acc, im):
            return acc + distance_maps(im).sum(), None
        return jax.lax.scan(body, 0.0, imgs)[0]

    def mk(reps):
        base = jnp.broadcast_to(state.target_img[None], (reps, B, RES, RES))
        jitter = 1e-6 * jax.random.normal(
            jax.random.PRNGKey(5), (reps, 1, 1, 1)
        )
        return base + jitter

    dt = slope_time(loop, mk, 2, 6)
    return dt


def main():
    dev = jax.devices()[0]
    print(f"device: {dev}")
    scene, cfg, state = _setup(N, RES, B, True)

    exp_rate = exp_ceiling()
    print(f"exp ceiling: {exp_rate/1e9:.1f} Gexp/s")
    mxu = mxu_ceiling()
    print(f"MXU bf16 ceiling: {mxu/1e12:.1f} TFLOP/s")

    t_fwd, t_fb = splat_times(scene, cfg, state)
    exps_fwd = 2 * B * N * RES             # fx + fy tables
    print(f"splat fwd: {t_fwd*1e3:.3f} ms/render  "
          f"{exps_fwd/t_fwd/1e9:.1f} Gexp/s "
          f"({exps_fwd/t_fwd/exp_rate:.0%} of exp ceiling)")
    # bwd recomputes both factor tables and their derivative products:
    # ≈ 2× the fwd exp work (d/dx exp = exp reused), plus two more matmuls.
    print(f"splat fwd+bwd: {t_fb*1e3:.3f} ms  "
          f"(fwd+bwd / fwd = {t_fb/t_fwd:.2f}×)")

    t_enc, flops = encoder_time()
    print(f"encoder fwd (B·k={BT*KT} frames {RES}², bf16): "
          f"{t_enc*1e3:.3f} ms  {flops/t_enc/1e12:.1f} TFLOP/s "
          f"({flops/t_enc/mxu:.0%} of MXU ceiling)")

    t_edt = edt_time(scene, cfg, state)
    print(f"EDT distance maps (B={B}, {RES}²): {t_edt*1e3:.1f} ms per reset")

    # dispatch RTT: single tiny call, host-synced
    x = jnp.zeros(())
    f = jax.jit(lambda v: v + 1.0)
    np.asarray(f(x))
    best = 1e9
    for _ in range(8):
        t0 = time.perf_counter()
        np.asarray(f(x))
        best = min(best, time.perf_counter() - t0)
    print(f"dispatch RTT (tiny call, fetch-synced): {best*1e3:.1f} ms")


if __name__ == "__main__":
    main()
