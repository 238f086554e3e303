"""Attribute the config-4 conv backward: which lowering is slow, per layer.

VERDICT r3 item 1 groundwork. The train-step attribution (BASELINE.md)
shows the backward of the reference CNN encoder (3× conv5×5 stride-1,
`train_with_env.py:39-55`) at ~2.5× lower MXU efficiency than its forward.
Before designing a replacement, this probe measures — per layer, at the
exact config-4 shapes (64 frames, 256², bf16, NHWC) — each gradient
formulation in isolation:

  fwd         lax.conv_general_dilated (what flax nn.Conv emits)
  dgrad_xla   XLA's own input-gradient transpose (jax.linear_transpose)
  dgrad_flip  dx as a *forward* conv of dy with rot180 + io-swapped weights
              (mathematically exact for stride-1 SAME odd kernels)
  wgrad_xla   XLA's own kernel-gradient transpose
  wgrad_tap   dw as 25 per-tap dot_generals: dw[t] = x_shift(t)ᵀ · dy
  wgrad_patch dw as one patch-matmul per row-strip, accumulated with a
              lax.scan: [25·Cin, P_strip] @ [P_strip, Cout]

Timing: bench.py methodology (distinct per-rep cotangents through a
lax.scan, full-touch checksum, slope between two rep counts to cancel the
~30 ms tunnel RTT).

Run on the TPU: `timeout 2400 python scripts/conv_grad_probe.py`.
Writes results/conv_grad_probe.json.
"""
from __future__ import annotations

import functools
import json
import os
import pathlib
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from doodle_tpu.ops import conv5x5 as c5
from doodle_tpu.ops.conv5x5_pallas import conv5x5_fwd_pallas, wgrad5x5_pallas

F = 64          # frames per encoder call in the config-4 train step
H = W = 256
LAYERS = {      # name -> (Cin, Cout)
    "L1": (1, 32),
    "L2": (32, 64),
    "L3": (64, 128),
}
DTYPE = jnp.bfloat16
DN = jax.lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                    ("NHWC", "HWIO", "NHWC"))


def conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((2, 2), (2, 2)),
        dimension_numbers=DN)


def dgrad_flip(dy, w):
    # dx = conv(dy, rot180(w) with in/out channels swapped) — a plain
    # stride-1 SAME forward conv, which XLA runs at ~93% MXU.
    wf = w[::-1, ::-1].transpose(0, 1, 3, 2)
    return conv(dy, wf)


def wgrad_tap(dy, x, cin, cout):
    xp = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)))
    taps = []
    for kh in range(5):
        for kw in range(5):
            xs = xp[:, kh:kh + H, kw:kw + W, :]
            taps.append(jax.lax.dot_general(
                xs.reshape(-1, cin), dy.reshape(-1, cout),
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
    return jnp.stack(taps).reshape(5, 5, cin, cout).astype(DTYPE)


def wgrad_patch(dy, x, cin, cout, strip=16):
    """Row-strip patch-matmul: per strip build [F·strip·W, 25·Cin] patches
    (25 shifted views concatenated on the channel axis) and contract with
    the strip's dy in ONE MXU dot — M=25·Cin, N=Cout, K streams."""
    xp = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)))
    n_strips = H // strip

    def body(acc, i):
        r0 = i * strip
        xs = jax.lax.dynamic_slice(
            xp, (0, r0, 0, 0), (F, strip + 4, W + 4, cin))
        cols = [xs[:, kh:kh + strip, kw:kw + W, :]
                for kh in range(5) for kw in range(5)]
        patches = jnp.concatenate(cols, axis=-1).reshape(-1, 25 * cin)
        dys = jax.lax.dynamic_slice(
            dy, (0, r0, 0, 0), (F, strip, W, cout)).reshape(-1, cout)
        dw = jax.lax.dot_general(
            patches, dys, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return acc + dw, None

    acc0 = jnp.zeros((25 * cin, cout), jnp.float32)
    dw, _ = jax.lax.scan(body, acc0, jnp.arange(n_strips))
    return dw.reshape(5, 5, cin, cout).astype(DTYPE)


def timed_slope(fn, make_input, fixed=(), reps=(2, 6), tries=4):
    """Per-call seconds: scan over distinct inputs, slope of two rep counts.

    ``fixed``: extra arrays passed to ``fn`` after the per-rep input, as
    REAL jit parameters — closing over a large device array embeds it as a
    program constant, and the axon remote-compile helper rejects programs
    past ~256 MB with HTTP 413 (this is what "failed" every L2/L3 wgrad in
    the first probe run)."""
    @jax.jit
    def run(xs, *fixed_args):
        def body(acc, x):
            return acc + fn(x, *fixed_args), None
        out, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), xs)
        return out

    t = {}
    for r in reps:
        xs = make_input(r)
        np.asarray(run(xs, *fixed))  # compile + warm
        best = float("inf")
        for _ in range(tries):
            t0 = time.perf_counter()
            np.asarray(run(xs, *fixed))
            best = min(best, time.perf_counter() - t0)
        t[r] = best
    return max((t[reps[1]] - t[reps[0]]) / (reps[1] - reps[0]), 1e-9)


def main():
    out = {"shape": f"F={F} {H}x{W} bf16 NHWC", "device": str(jax.devices()[0])}
    key = jax.random.PRNGKey(0)
    for name, (cin, cout) in LAYERS.items():
        kx, kw_, kd = jax.random.split(jax.random.fold_in(key, cin), 3)
        x = jax.random.normal(kx, (F, H, W, cin), DTYPE)
        w = (jax.random.normal(kw_, (5, 5, cin, cout)) * 0.05).astype(DTYPE)
        flops_fwd = 2 * F * H * W * 25 * cin * cout

        def mk_dy(r, kd=kd, cout=cout):
            return jax.random.normal(kd, (r, F, H, W, cout), DTYPE)

        def mk_x(r, kx=kx, cin=cin):
            return jax.random.normal(kx, (r, F, H, W, cin), DTYPE)

        # (fn, per-rep input maker, fixed jit args) — the big fixed arrays
        # (x) must be parameters, not closures (see timed_slope).
        variants = {
            "fwd": (lambda xx: jnp.sum(
                jnp.abs(conv(xx, w).astype(jnp.float32))), mk_x, ()),
            "dgrad_xla": (lambda dy: sum(
                jnp.sum(jnp.abs(t.astype(jnp.float32)))
                for t in jax.linear_transpose(
                    lambda xx: conv(xx, w), x)(dy)), mk_dy, ()),
            "dgrad_flip": (lambda dy: jnp.sum(
                jnp.abs(dgrad_flip(dy, w).astype(jnp.float32))), mk_dy, ()),
            "wgrad_xla": (lambda dy, xf: sum(
                jnp.sum(jnp.abs(t.astype(jnp.float32)))
                for t in jax.linear_transpose(
                    lambda ww: conv(xf, ww), w)(dy)), mk_dy, (x,)),
            "wgrad_tap": (lambda dy, xf: jnp.sum(
                jnp.abs(wgrad_tap(dy, xf, cin, cout).astype(jnp.float32))),
                mk_dy, (x,)),
            "wgrad_patch": (lambda dy, xf: jnp.sum(
                jnp.abs(wgrad_patch(dy, xf, cin, cout).astype(jnp.float32))),
                mk_dy, (x,)),
            "wgrad_pallas": (lambda dy, xf: jnp.sum(
                jnp.abs(wgrad5x5_pallas(dy, xf))), mk_dy, (x,)),
            "fwd_pallas": (lambda xx: jnp.sum(
                jnp.abs(conv5x5_fwd_pallas(xx, w).astype(jnp.float32))),
                mk_x, ()),
            "dgrad_pallas": (lambda dy: jnp.sum(jnp.abs(
                conv5x5_fwd_pallas(
                    dy, w[::-1, ::-1].transpose(0, 1, 3, 2)
                ).astype(jnp.float32))), mk_dy, ()),
            # r5: space-to-depth family (N widened 4×; ops/conv5x5.py).
            "fwd_s2d": (lambda xx: jnp.sum(
                jnp.abs(c5._s2d_conv(xx, w).astype(jnp.float32))), mk_x, ()),
            "dgrad_s2d": (lambda dy: jnp.sum(
                jnp.abs(c5._dgrad_s2d(dy, w).astype(jnp.float32))), mk_dy, ()),
            "wgrad_s2d": (lambda dy, xf: jnp.sum(
                jnp.abs(c5._wgrad_s2d(dy, xf))), mk_dy, (x,)),
        }
        res = {}
        only = os.environ.get("PROBE_ONLY")  # comma-list of variant names
        for vname, (fn, mk, fixed) in variants.items():
            if only and vname not in only.split(","):
                continue
            t0 = time.time()
            try:
                dt = timed_slope(fn, mk, fixed)
                res[vname] = {"ms": round(dt * 1e3, 2),
                              "tflops": round(flops_fwd / dt / 1e12, 1)}
                print(f"{name} {vname}: {dt*1e3:.2f} ms "
                      f"({flops_fwd/dt/1e12:.1f} TF/s eq) "
                      f"[{time.time()-t0:.0f}s]", flush=True)
            except Exception as e:
                res[vname] = {"error": f"{type(e).__name__}: "
                              f"{str(e).splitlines()[0][:160]}"}
                print(f"{name} {vname}: FAILED {type(e).__name__}", flush=True)
            out[name] = res
            # Incremental checkpoint: a wall-clock kill keeps partials.
            pathlib.Path(os.environ.get("PROBE_OUT", "results/conv_grad_probe.json")).write_text(
                json.dumps(out, indent=1) + "\n")

    # Numerical cross-checks (small shape, f32, CPU-friendly): the exact
    # formulations must agree with XLA's transposes.
    xs = jax.random.normal(key, (2, 16, 16, 3), jnp.float32)
    ws = jax.random.normal(kw_, (5, 5, 3, 4), jnp.float32) * 0.1
    dys = jax.random.normal(kd, (2, 16, 16, 4), jnp.float32)
    (dx_ref,) = jax.linear_transpose(lambda xx: conv(xx, ws), xs)(dys)
    (dw_ref,) = jax.linear_transpose(lambda ww: conv(xs, ww), ws)(dys)
    wf = ws[::-1, ::-1].transpose(0, 1, 3, 2)
    dx_flip = jax.lax.conv_general_dilated(
        dys, wf, (1, 1), ((2, 2), (2, 2)), dimension_numbers=DN)
    out["parity_dgrad_flip"] = float(jnp.max(jnp.abs(dx_flip - dx_ref)))
    print("parity dgrad_flip max|Δ|:", out["parity_dgrad_flip"])

    pathlib.Path(os.environ.get("PROBE_OUT", "results/conv_grad_probe.json")).write_text(
        json.dumps(out, indent=1) + "\n")
    print(json.dumps({k: v for k, v in out.items() if k.startswith("L")}))


if __name__ == "__main__":
    main()
