"""Autotune the fused Pallas splat block parameters on the attached chip.

Sweeps (image_block, vmem_budget, chunk) for the forward kernel and the
fwd+bwd pair at a given config, reporting ms per call. Run from the repo
root on a quiet TPU:

    python scripts/splat_autotune.py --N 500 --res 256 --B 128

Timing methodology matches bench.py: distinct inputs per rep (lax.scan —
identical inputs get hoisted out of the loop by XLA), completion forced by
a device→host fetch (block_until_ready can return early on the remote axon
platform), and the per-rep time taken as the slope between two scan
lengths to cancel the ~30 ms tunnel round-trip.
"""

from __future__ import annotations

import argparse
import functools
import itertools
import sys
import time

sys.path.insert(0, ".")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--N", type=int, default=500)
    p.add_argument("--res", type=int, default=256)
    p.add_argument("--B", type=int, default=128)
    p.add_argument("--reps", type=int, default=64, help="small scan length")
    p.add_argument("--bwd", action="store_true", help="also tune fwd+bwd")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from doodle_tpu.ops import splat_pallas as sp

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 6)
    B, N, res = args.B, args.N, args.res
    R1, R2 = args.reps, args.reps * 4
    a_all = jax.random.uniform(ks[0], (R2, B, N), minval=-5.0, maxval=5.0)
    b = jax.random.uniform(ks[1], (B, N), minval=-5.0, maxval=5.0)
    inv2s2 = jax.random.uniform(ks[2], (B, N), minval=0.1, maxval=2.0)
    c_sq = jax.random.uniform(ks[3], (B, N), minval=0.0, maxval=0.1)
    valid = jnp.ones((B, N))
    gx = jnp.linspace(-7.5, 7.5, res)
    gy = jnp.linspace(-7.5, 7.5, res)
    g = jax.random.uniform(ks[4], (B, res, res))

    def timed_fetch(fn, *xs, tries=5):
        np.asarray(fn(*xs))
        best = float("inf")
        for _ in range(tries):
            t0 = time.perf_counter()
            np.asarray(fn(*xs))
            best = min(best, time.perf_counter() - t0)
        return best

    def per_rep_ms(make_loop):
        t1 = timed_fetch(make_loop(R1), a_all[:R1])
        t2 = timed_fetch(make_loop(R2), a_all)
        return max((t2 - t1) / (R2 - R1), 1e-9) * 1e3

    grid = list(itertools.product(
        [8, 16, 32],                            # image_block
        [12 * 2**20, 32 * 2**20, 64 * 2**20],   # vmem_budget
        [256, 512, 1024],                       # chunk
    ))
    results = []
    for bs, vmem, chunk in grid:
        if chunk > max(N, 256) * 2:
            continue
        impl = functools.partial(
            sp._splat_pallas_fwd_impl, chunk=chunk, image_block=bs,
            vmem_budget=vmem, use_bf16=True,
        )

        def make_loop(reps, impl=impl):
            @jax.jit
            def loop(a_batch):
                def body(acc, a):
                    img = impl(a, b, inv2s2, c_sq, valid, gx, gy)
                    return acc + img[0, 0, 0], None
                out, _ = jax.lax.scan(body, 0.0, a_batch)
                return out
            return loop

        try:
            ms = per_rep_ms(make_loop)
        except Exception as e:  # noqa: BLE001 — report and keep sweeping
            print(f"bs={bs} vmem={vmem>>20}M chunk={chunk}: FAIL {type(e).__name__}")
            continue
        print(f"bs={bs} vmem={vmem>>20}M chunk={chunk}: {ms:.4f} ms fwd", flush=True)
        results.append((ms, bs, vmem, chunk))

    results.sort()
    print("\nbest fwd:", results[:3])

    if args.bwd and results:
        _, bs, vmem, chunk = results[0]
        bwd = functools.partial(
            sp._splat_pallas_bwd_impl, chunk=chunk, image_block=bs,
            vmem_budget=vmem, use_bf16=True,
        )

        def make_loop_bwd(reps):
            @jax.jit
            def loop(a_batch):
                def body(acc, a):
                    da, db, ds, dc = bwd(a, b, inv2s2, c_sq, valid, gx, gy, g)
                    return acc + da[0, 0], None
                out, _ = jax.lax.scan(body, 0.0, a_batch)
                return out
            return loop

        t1 = timed_fetch(make_loop_bwd(R1), a_all[:R1])
        t2 = timed_fetch(make_loop_bwd(R2), a_all)
        ms = max((t2 - t1) / (R2 - R1), 1e-9) * 1e3
        print(f"bwd at best-fwd params: {ms:.4f} ms")


if __name__ == "__main__":
    main()
