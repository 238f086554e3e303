"""Autotune the fused Pallas splat block parameters on the attached chip.

Sweeps ``splat_pallas.TUNE`` (image_block, vmem_budget/limit, chunk) for
the forward kernel and the fwd+bwd pair at a given config, reporting ms
per call. Run from the repo root on a quiet TPU:

    python scripts/splat_autotune.py --N 500 --res 256 --B 128 --bwd

Timing methodology matches bench.py: distinct inputs per rep (lax.scan —
identical inputs get hoisted out of the loop by XLA), completion forced by
a device→host fetch (block_until_ready can return early on the remote axon
platform), and the per-rep time taken as the slope between two scan
lengths to cancel the ~30 ms tunnel round-trip. The first grid point is
the shipped default — its number should reconcile with the render-stage
breakdown (scripts/render_breakdown.py); if it doesn't, distrust the whole
sweep. Each variant finishes with a HIGHEST-precision parity check against
the XLA separable oracle, so a mis-tiled variant can't win on garbage.
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--N", type=int, default=500)
    p.add_argument("--res", type=int, default=256)
    p.add_argument("--B", type=int, default=128)
    p.add_argument("--reps", type=int, default=50, help="small scan length")
    p.add_argument("--bwd", action="store_true", help="also tune fwd+bwd")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from doodle_tpu.ops import splat_pallas as sp

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 6)
    B, N, res = args.B, args.N, args.res
    R1, R2 = args.reps, args.reps * 8
    a_all = jax.random.uniform(ks[0], (R2, B, N), minval=-5.0, maxval=5.0)
    b = jax.random.uniform(ks[1], (B, N), minval=-5.0, maxval=5.0)
    inv2s2 = jax.random.uniform(ks[2], (B, N), minval=0.1, maxval=2.0)
    c_sq = jax.random.uniform(ks[3], (B, N), minval=0.0, maxval=0.1)
    valid = jnp.ones((B, N))
    # a couple of invalid rays so the quirk path is in the timed program
    valid = valid.at[0, 0].set(0.0).at[1, 3].set(0.0)
    gx = jnp.linspace(-7.5, 7.5, res)
    gy = jnp.linspace(-7.5, 7.5, res)
    g = jax.random.uniform(ks[4], (B, res, res))

    # XLA-oracle image for parity (HIGHEST, one input)
    vm = valid[..., None]

    def oracle(a0):
        # splat_factors wants ray geometry, not scalars — compare at the
        # factor level instead: rebuild fx/fy from the same scalars.
        dx2 = (gx[None, None, :] - a0[..., None]) ** 2
        dy2 = (gy[None, None, :] - b[..., None]) ** 2
        fx = jnp.exp(-(dx2 + c_sq[..., None]) * inv2s2[..., None])
        fy = jnp.exp(-dy2 * inv2s2[..., None])
        fx = jnp.where(vm > 0, fx, 1.0)
        fy = jnp.where(vm > 0, fy, 1.0)
        return jnp.einsum("bni,bnj->bij", fx, fy,
                          precision=jax.lax.Precision.HIGHEST)

    ref_img = np.asarray(jax.jit(oracle)(a_all[0]))

    def timed_fetch(fn, *xs, tries=6):
        np.asarray(fn(*xs))
        best = float("inf")
        for _ in range(tries):
            t0 = time.perf_counter()
            np.asarray(fn(*xs))
            best = min(best, time.perf_counter() - t0)
        return best

    def per_rep_ms(make_loop):
        t1 = timed_fetch(make_loop(), a_all[:R1])
        t2 = timed_fetch(make_loop(), a_all)
        return max((t2 - t1) / (R2 - R1), 1e-9) * 1e3, t1, t2

    grid = [
        # (image_block, vmem_budget, vmem_limit_bytes, chunk)
        (8, 12 * 2**20, None, 512),          # shipped default — the anchor
        (16, 64 * 2**20, 100 * 2**20, 512),
        (32, 100 * 2**20, 100 * 2**20, 512),
        (8, 12 * 2**20, None, 256),
        (16, 64 * 2**20, 100 * 2**20, 256),
    ]
    results = []
    for bs, vmem, limit, chunk in grid:
        tag = f"bs={bs} vmem={vmem >> 20}M limit={limit and limit >> 20}M chunk={chunk}"
        sp.TUNE["fwd"].update(image_block=bs, vmem_budget=vmem,
                              vmem_limit_bytes=limit, chunk=chunk)

        def make_loop():
            @jax.jit
            def loop(a_batch):
                def body(acc, a):
                    img = sp._splat_pallas_fwd_impl(
                        a, b, inv2s2, c_sq, valid, gx, gy, use_bf16=True
                    )
                    return acc + img.sum(), None
                out, _ = jax.lax.scan(body, 0.0, a_batch)
                return out
            return loop

        try:
            ms, t1, t2 = per_rep_ms(make_loop)
            hi = jax.jit(lambda a0: sp._splat_pallas_fwd_impl(
                a0, b, inv2s2, c_sq, valid, gx, gy, use_bf16=False))
            np.testing.assert_allclose(
                np.asarray(hi(a_all[0])), ref_img, rtol=2e-5, atol=1e-4
            )
        except Exception as e:  # noqa: BLE001 — report and keep sweeping
            print(f"{tag}: FAIL {type(e).__name__}: {str(e)[:120]}", flush=True)
            continue
        print(f"{tag}: {ms:.4f} ms fwd  raw=({t1 * 1e3:.1f}, {t2 * 1e3:.1f})",
              flush=True)
        results.append((ms, bs, vmem, limit, chunk))

    results.sort()
    print("\nbest fwd:", results[:3])

    if args.bwd and results:
        # Fix the forward at the winner; sweep the backward independently
        # (its per-image working set is ~4x the forward's, so its optimum
        # sits at a smaller chunk / different budget).
        _, bs, vmem, limit, chunk = results[0]
        sp.TUNE["fwd"].update(image_block=bs, vmem_budget=vmem,
                              vmem_limit_bytes=limit, chunk=chunk)
        print(f"\nbwd sweep (fwd fixed at bs={bs} chunk={chunk}); "
              "numbers are fwd+bwd per rep:")
        bwd_grid = [
            (8, 12 * 2**20, None, 256),      # shipped default
            (8, 12 * 2**20, None, 128),
            (8, 24 * 2**20, 48 * 2**20, 256),
            (8, 48 * 2**20, 96 * 2**20, 512),
            (16, 24 * 2**20, 48 * 2**20, 128),
        ]
        for bs, vmem, limit, chunk in bwd_grid:
            sp.TUNE["bwd"].update(image_block=bs, vmem_budget=vmem,
                                  vmem_limit_bytes=limit, chunk=chunk)

            # fwd-impl has no vjp rule — wire the bwd impl manually
            def make_loop_bwd():
                @jax.jit
                def loop(a_batch):
                    def body(acc, a):
                        img = sp._splat_pallas_fwd_impl(
                            a, b, inv2s2, c_sq, valid, gx, gy, use_bf16=True
                        )
                        # ds/dc come out of the same kernel launch — summing
                        # two of the four outputs keeps all of them live.
                        da, db, ds, dc = sp._splat_pallas_bwd_impl(
                            a, b, inv2s2, c_sq, valid, gx, gy, g,
                            use_bf16=True,
                        )
                        return acc + img.sum() + da.sum() + ds.sum(), None
                    return jax.lax.scan(body, 0.0, a_batch)[0]
                return loop

            try:
                t1 = timed_fetch(make_loop_bwd(), a_all[:R1])
                t2 = timed_fetch(make_loop_bwd(), a_all)
                ms = max((t2 - t1) / (R2 - R1), 1e-9) * 1e3
            except Exception as e:  # noqa: BLE001
                print(f"bs={bs} limit={limit and limit >> 20}M chunk={chunk}: "
                      f"FAIL {type(e).__name__}", flush=True)
                continue
            print(f"bs={bs} vmem={vmem >> 20}M limit={limit and limit >> 20}M "
                  f"chunk={chunk}: {ms:.4f} ms fwd+bwd", flush=True)


if __name__ == "__main__":
    main()
