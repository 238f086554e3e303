#!/usr/bin/env python3
"""Attribute the fused splat forward's gap to the overlap bound (VERDICT r2
item 5).

BASELINE.md's roofline: the fast forward measures ~0.24 ms at config 4
(N=500, 256², B=128, bf16) against a serialized light-speed sum of
0.167 ms (VPU tables 0.071 + MXU 0.047 + HBM write 0.049) and a
perfect-overlap bound of 0.071 ms. This script measures WHERE the gap
lives, two ways:

1. **Ablation decomposition** — monkeypatched kernel variants at the real
   config, timed with the bench.py slope methodology (distinct inputs per
   rep via lax.scan, fetch-synced, two rep counts):
     * full          : the shipped kernel (FMAs + exp2 + MXU dot + write)
     * no_exp        : FMAs only, no exp2        → isolates transcendentals
     * no_vpu        : constant tables, MXU+write → isolates dot+overhead
     * no_mxu        : tables + write, no dot     → isolates VPU+overhead
   plus an image-block sweep (bs ∈ {1,2,4,8} ⇒ 128..16 grid steps at
   constant work) whose linear fit gives the per-grid-step overhead.

2. **Profiler capture** — a jax.profiler trace of the forward loop,
   converted with tensorboard_plugin_profile to op-level self-times
   (evidence artifact under results/splat_profile/).

    python scripts/splat_profile_attribution.py
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, ".")

import numpy as np

OUT = pathlib.Path("results/splat_profile")


def main():
    import jax
    import jax.numpy as jnp

    from doodle_tpu.ops import splat_pallas as sp

    B, N, RES = 128, 500, 256
    SIGMA = 0.01
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 6)
    inter = jax.random.uniform(ks[0], (B, N, 3)) * 10.0
    origins = jax.random.uniform(ks[1], (B, N, 3)) * 10.0 + 80.0
    plane_origin = jnp.array([0.0, -5.0, 0.0])
    plane_u = jnp.array([1.0, 0.0, 0.0])
    plane_v = jnp.array([0.0, 0.0, 1.0])
    valid = jnp.ones((B, N, 1))
    a, b, inv2s2, c_sq, vmask = sp.splat_params(
        inter, origins, plane_origin, plane_u, plane_v, SIGMA, valid
    )
    gx = jnp.linspace(-7.5, 7.5, RES)
    gy = jnp.linspace(-7.5, 7.5, RES)

    def timed_rate(reps_small=60, reps_large=240, tries=8):
        """Slope-method ms/call of the CURRENT module state's fwd impl."""
        @jax.jit
        def loop(a_stack):
            def body(acc, a_r):
                img = sp._splat_pallas_fwd_impl(
                    a_r, b, inv2s2, c_sq, vmask, gx, gy, use_bf16=True
                )
                return acc + img.sum(), None
            out, _ = jax.lax.scan(body, 0.0, a_stack)
            return out

        t = {}
        for reps in (reps_small, reps_large):
            # distinct `a` per rep (anti-hoisting, CLAUDE.md)
            a_stack = a[None] + 0.01 * jax.random.normal(
                jax.random.PRNGKey(reps), (reps,) + a.shape
            )
            np.asarray(loop(a_stack))  # warm
            best = float("inf")
            for _ in range(tries):
                t0 = time.perf_counter()
                np.asarray(loop(a_stack))
                best = min(best, time.perf_counter() - t0)
            t[reps] = best
        return (t[reps_large] - t[reps_small]) / (reps_large - reps_small) * 1e3

    # ---- kernel variants (same signature as _splat_kernel_fast) ----
    import jax.experimental.pallas as pl

    def make_variant(mode):
        def kern(px_ref, qx_ref, py_ref, qy_ref, r_ref, gx_ref, gy_ref,
                 out_ref):
            chunk = pl.program_id(1)
            px = px_ref[0, 0]
            qx = qx_ref[0, 0]
            py = py_ref[0, 0]
            qy = qy_ref[0, 0]
            r = r_ref[0, 0]
            gxx = gx_ref[0, :]
            gyy = gy_ref[0, :]
            rr = r[..., None]
            if mode == "min_vpu":
                # one-op tables (the real kernel's first multiply only):
                # full − min_vpu ≈ the remaining FMA+exp2 table cost
                fx = px[..., None] * gxx[None, None, :]
                fy = py[..., None] * gyy[None, None, :]
            else:
                argx = px[..., None] * gxx[None, None, :] - (
                    rr * (gxx * gxx)[None, None, :] + qx[..., None])
                argy = py[..., None] * gyy[None, None, :] - (
                    rr * (gyy * gyy)[None, None, :] + qy[..., None])
                if mode == "no_exp":
                    fx, fy = argx, argy
                else:
                    fx = jnp.exp2(argx)
                    fy = jnp.exp2(argy)
            if mode == "tiny_mxu":
                # contract only 8 of the 512 rays: full tables, ~1/64 of
                # the MXU work (full − tiny_mxu ≈ non-overlapped MXU time)
                tile = jax.lax.dot_general(
                    fx[:, :8, :], fy[:, :8, :], (((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT,
                )
            else:
                tile = jax.lax.dot_general(
                    fx, fy, (((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT,
                )
            @pl.when(chunk == 0)
            def _():
                out_ref[:, :, :] = tile
            @pl.when(chunk > 0)
            def _():
                out_ref[:, :, :] = out_ref[:, :, :] + tile
        return kern

    orig_kernel = sp._splat_kernel_fast
    orig_tune = {k: dict(v) for k, v in sp.TUNE.items()}
    results = {"config": {"B": B, "N": N, "res": RES, "bf16": True}}

    try:
        def save():
            OUT.mkdir(parents=True, exist_ok=True)
            (OUT / "attribution.json").write_text(
                json.dumps(results, indent=1)
            )

        results["full_ms"] = round(timed_rate(), 4)
        print(f"full kernel: {results['full_ms']} ms", flush=True)
        save()

        for mode in ("no_exp", "min_vpu", "tiny_mxu"):
            sp._splat_kernel_fast = make_variant(mode)
            results[f"{mode}_ms"] = round(timed_rate(), 4)
            print(f"{mode}: {results[f'{mode}_ms']} ms", flush=True)
            save()
        sp._splat_kernel_fast = orig_kernel

        # ---- grid-step overhead: image-block sweep at constant work ----
        steps_sweep = {}
        for bs in (8, 4, 2, 1):
            sp.TUNE["fwd"]["image_block"] = bs
            n_steps = (B // bs) * 1  # n_chunks = 1 at N=500/chunk=512
            ms = timed_rate(reps_small=40, reps_large=160)
            steps_sweep[n_steps] = ms
            print(f"bs={bs} ({n_steps} grid steps): {ms} ms", flush=True)
        sp.TUNE["fwd"]["image_block"] = orig_tune["fwd"]["image_block"]
        results["grid_step_sweep"] = steps_sweep
        xs = np.array(sorted(steps_sweep))
        ys = np.array([steps_sweep[x] for x in xs])
        slope, intercept = np.polyfit(xs, ys, 1)
        results["per_grid_step_us"] = round(slope * 1e3, 3)
        results["zero_step_extrapolation_ms"] = round(intercept, 4)
        print(f"per-grid-step overhead: {results['per_grid_step_us']} µs; "
              f"extrapolated 0-step time {intercept:.4f} ms", flush=True)
        save()

        # ---- profiler capture (evidence artifact) ----
        try:
            OUT.mkdir(parents=True, exist_ok=True)
            a_stack = a[None] + 0.01 * jax.random.normal(
                jax.random.PRNGKey(9), (120,) + a.shape
            )

            @jax.jit
            def loop(a_stack):
                def body(acc, a_r):
                    img = sp._splat_pallas_fwd_impl(
                        a_r, b, inv2s2, c_sq, vmask, gx, gy, use_bf16=True
                    )
                    return acc + img.sum(), None
                out, _ = jax.lax.scan(body, 0.0, a_stack)
                return out

            np.asarray(loop(a_stack))
            jax.profiler.start_trace(str(OUT))
            np.asarray(loop(a_stack))
            jax.profiler.stop_trace()
            xplanes = list(OUT.rglob("*.xplane.pb"))
            results["trace_files"] = [str(p) for p in xplanes]
            if xplanes:
                from tensorboard_plugin_profile.convert import (
                    raw_to_tool_data as rtd,
                )
                data, _ = rtd.xspace_to_tool_data(
                    [str(xplanes[-1])], "framework_op_stats", {}
                )
                (OUT / "op_stats.csv").write_bytes(
                    data if isinstance(data, bytes) else data.encode()
                )
                print(f"op stats -> {OUT/'op_stats.csv'}", flush=True)
        except Exception as e:
            results["trace_error"] = f"{type(e).__name__}: {e}"
            print("trace capture failed:", e, flush=True)
    finally:
        sp._splat_kernel_fast = orig_kernel
        sp.TUNE.update(orig_tune)

    OUT.mkdir(parents=True, exist_ok=True)
    (OUT / "attribution.json").write_text(json.dumps(results, indent=1))
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
