"""Autotune the fused Pallas splat block parameters on the attached chip.

Sweeps (image_block, vmem_budget, chunk) for the forward kernel and the
fwd+bwd pair at a given config, reporting ms per call (best-of-5, steps
fused in one jit like bench.py). Run from the repo root on a quiet TPU:

    python scripts/splat_autotune.py --N 500 --res 256 --B 128
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
    p.add_argument("--reps", type=int, default=50)
    p.add_argument("--bwd", action="store_true", help="also tune fwd+bwd")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from doodle_tpu.ops import splat_pallas as sp

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    B, N, res = args.B, args.N, args.res
    a = jax.random.uniform(ks[0], (B, N), minval=-5.0, maxval=5.0)
    b = jax.random.uniform(ks[1], (B, N), minval=-5.0, maxval=5.0)
    inv2s2 = jax.random.uniform(ks[2], (B, N), minval=0.1, maxval=2.0)
    c_sq = jax.random.uniform(ks[3], (B, N), minval=0.0, maxval=0.1)
    valid = jnp.ones((B, N))
    gx = jnp.linspace(-7.5, 7.5, res)
    gy = jnp.linspace(-7.5, 7.5, res)

    def timed(fn, *xs):
        out = fn(*xs)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            out = fn(*xs)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        return best / args.reps * 1e3  # ms per rep

    grid = list(itertools.product(
        [8, 16, 32],                     # image_block
        [12 * 2**20, 32 * 2**20, 64 * 2**20],  # vmem_budget
        [256, 512, 1024],                # chunk
    ))
    results = []
    for bs, vmem, chunk in grid:
        if chunk > max(N, 256) * 2:
            continue
        impl = functools.partial(
            sp._splat_pallas_fwd_impl, chunk=chunk, image_block=bs,
            vmem_budget=vmem, use_bf16=True,
        )

        @jax.jit
        def loop(a, b, s, c, v, gx, gy):
            def body(i, acc):
                img = impl(a + 0e-9 * acc, b, s, c, v, gx, gy)
                return acc + img[0, 0, 0]
            return jax.lax.fori_loop(0, args.reps, body, 0.0)

        try:
            ms = timed(loop, a, b, inv2s2, c_sq, valid, gx, gy)
        except Exception as e:  # noqa: BLE001 — report and keep sweeping
            print(f"bs={bs} vmem={vmem>>20}M chunk={chunk}: FAIL {type(e).__name__}")
            continue
        print(f"bs={bs} vmem={vmem>>20}M chunk={chunk}: {ms:.3f} ms fwd")
        results.append((ms, bs, vmem, chunk))

    results.sort()
    print("\nbest fwd:", results[:3])

    if args.bwd and results:
        _, bs, vmem, chunk = results[0]
        g = jax.random.uniform(ks[4], (B, res, res))
        bwd = functools.partial(
            sp._splat_pallas_bwd_impl, chunk=chunk, image_block=bs,
            vmem_budget=vmem, use_bf16=True,
        )

        @jax.jit
        def loop_bwd(a, b, s, c, v, gx, gy, g):
            def body(i, acc):
                da, db, ds, dc = bwd(a + 0e-9 * acc, b, s, c, v, gx, gy, g)
                return acc + da[0, 0]
            return jax.lax.fori_loop(0, args.reps, body, 0.0)

        ms = timed(loop_bwd, a, b, inv2s2, c_sq, valid, gx, gy, g)
        print(f"bwd at best-fwd params: {ms:.3f} ms")


if __name__ == "__main__":
    main()
