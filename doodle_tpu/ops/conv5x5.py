"""MXU-matmul gradients for the reference CNN's 5×5 stride-1 convs.

The config-4 train step is 99.8% CNN encoder (BASELINE.md "Where the
config-4 train step's 843 ms goes"). XLA's *isolated* conv gradients are
near their N-limited MXU ceilings — the measured deficit is how its
autodiff graph embeds in the remat'd training scan (9.0 TF/s vs
16.9 TF/s for this module's lowering at identical FLOPs; BASELINE.md
"Conv-gradient lowering study"). This module keeps the forward untouched
and swaps only the backward, via ``jax.custom_vjp``:

* **dgrad** (``∂/∂x``): for stride-1 SAME odd kernels, ``dx`` is exactly a
  *forward* conv of the cotangent with the rot-180, in/out-swapped kernel
  — i.e. the very lowering XLA already runs at ~93% MXU. (`"flip"`;
  `"xla"` falls back to XLA's own transpose.)
* **wgrad** (``∂/∂w``): reformulated as plain matmuls —
  - `"tap"`: 25 per-tap contractions ``dw[t] = x_shift(t)ᵀ · dy``, each a
    ``[Cin, B·H·W] @ [B·H·W, Cout]`` streaming dot;
  - `"patch"`: a ``lax.scan`` over row strips building the strip's
    ``[B·strip·W, 25·Cin]`` im2col patch matrix (25 shifted views
    concatenated on the channel axis — pure layout, no arithmetic) and
    contracting with the strip's cotangent in ONE dot of shape
    ``[25·Cin, P] @ [P, Cout]`` — full-height M, streaming K, nothing
    materialized beyond one strip;
  - `"xla"`: XLA's own transpose (for A/B).

The choice per pass lives in ``TUNE`` (measured on a v5e at the config-4
encoder shapes by ``scripts/conv_grad_probe.py`` — see
``results/conv_grad_probe.json``), so autotune sweeps can poke it without
touching call sites.

Math parity: both reformulations are exact (same contraction, different
schedule); f32 parity vs XLA autodiff is covered by
``tests/test_conv5x5.py``. Gradients accumulate in f32 via
``preferred_element_type`` and are cast back to the primal dtype, matching
XLA's own conv-gradient accumulation behavior for bf16 inputs.

Reference anchor: the conv stack being differentiated is
``train_with_env.py:39-55`` (3× Conv2d(5×5, stride 1, pad 2)).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["conv5x5", "TUNE"]

# Backend per gradient pass; values measured/picked by
# scripts/conv_grad_probe.py on a v5e (see results/conv_grad_probe.json).
# The shipped wgrad default is "xla" (XLA's own transpose), with one
# measured exception hardwired in _bwd: at Cin=1 the strip-scan "patch"
# matmul is 1.4× faster, so that case dispatches to "patch" regardless of
# this setting. Unknown values fall through to "xla" in _bwd.
TUNE = {
    "fwd": "xla",        # "xla" | "pallas" (in-VMEM im2col matmul)
    "dgrad": "flip",     # "flip" (XLA conv of dy w/ rot180 kernel) | "xla"
    #                    | "s2d" (space-to-depth: N = 4·Cin, see _dgrad_s2d)
    #                    | "pallas" (im2col matmul of the flipped conv)
    "wgrad": "xla",      # "xla" | "pallas" | "patch" | "tap"
    "wgrad_strip": 16,   # rows per patch-matmul strip ("patch" only)
}


def _dn(x_ndim=4):
    return jax.lax.conv_dimension_numbers(
        (1, 1, 1, 1), (1, 1, 1, 1), ("NHWC", "HWIO", "NHWC")
    )


def _conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((2, 2), (2, 2)),
        dimension_numbers=_dn(),
    )


def _dgrad_flip(dy, w):
    # dx = conv(dy, rot180(w) with Cin/Cout swapped): exact for 5×5
    # stride-1 SAME (odd kernel, symmetric padding).
    wf = w[::-1, ::-1].transpose(0, 1, 3, 2)
    return _conv(dy, wf)


def _dgrad_s2d(dy, w):
    """dgrad with the MXU N-axis widened 4× by space-to-depth.

    The plain flip-conv dgrad's matmul output width is N = Cin (32/64 at
    the reference encoder's L2/L3) — a 25/50% utilization ceiling on the
    128-lane MXU (results/conv_grad_probe.json reading 2). Folding a 2×2
    spatial block into channels turns the 5×5 stride-1 conv into a 3×3
    VALID conv over [H/2+2, W/2+2, 4·Cout] with a [3, 3, 4·Cout, 4·Cin]
    kernel: N = 4·Cin fills the array, at 9·16/25 = 1.44× the FLOPs
    (the 36-tap phase kernel zero-pads the 25 real taps). Exact — the
    phase kernel is a gather of the rot-180 kernel, and invalid taps land
    in the zero padding.

    Derivation: dx[2i+py, 2j+px] = Σ_{u,v} dyp[2i+py+u, 2j+px+v]·wf[u,v]
    with dyp = dy zero-padded by 2. Writing py+u = 2·da + qy gives
    u = 2·da + qy − py with da ∈ {0,1,2} (3 coarse taps), so
    dx_phase(py,px)[i,j] = Σ_{da,db,qy,qx} Z[i+da, j+db, qy,qx,:] ·
    wf[2da+qy−py, 2db+qx−px, :, ci], where Z is the space-to-depth of
    dyp. All four output phases fuse into one conv with 4·Cin output
    channels, un-done by depth-to-space. Requires even H, W.
    """
    F, H, W, cout = dy.shape
    cin = w.shape[2]
    wf = w[::-1, ::-1].transpose(0, 1, 3, 2)        # [5,5,Cout,Cin]
    # u = 2·da + qy − py ∈ [−1, 5]; indexing the (1,1)-padded kernel at
    # u+1 ∈ [0, 6] makes the two out-of-range taps read zeros.
    wfp = jnp.pad(wf, ((1, 1), (1, 1), (0, 0), (0, 0)))   # [7,7,Cout,Cin]
    da = jnp.arange(3)[:, None, None]
    q = jnp.arange(2)[None, :, None]
    p = jnp.arange(2)[None, None, :]
    U = 2 * da + q - p + 1                                # [3,2,2]
    K = wfp[U[:, None, :, None, :, None], U[None, :, None, :, None, :]]
    # [da,db,qy,qx,py,px,Cout,Cin] → [da,db,(qy,qx,Cout),(py,px,Cin)]
    K = K.transpose(0, 1, 2, 3, 6, 4, 5, 7).reshape(3, 3, 4 * cout, 4 * cin)

    dyp = jnp.pad(dy, ((0, 0), (2, 2), (2, 2), (0, 0)))
    Hc, Wc = H // 2, W // 2
    Z = dyp.reshape(F, Hc + 2, 2, Wc + 2, 2, cout)
    Z = Z.transpose(0, 1, 3, 2, 4, 5).reshape(F, Hc + 2, Wc + 2, 4 * cout)
    out = jax.lax.conv_general_dilated(
        Z, K, window_strides=(1, 1), padding="VALID",
        dimension_numbers=_dn(),
    )                                                    # [F, Hc, Wc, 4Cin]
    dx = out.reshape(F, Hc, Wc, 2, 2, cin)
    return dx.transpose(0, 1, 3, 2, 4, 5).reshape(F, H, W, cin)


def _dgrad_xla(dy, w, x_shape):
    zeros = jnp.zeros(x_shape, dy.dtype)
    (dx,) = jax.linear_transpose(lambda xx: _conv(xx, w), zeros)(dy)
    return dx


def _wgrad_xla(dy, x, w_shape):
    zeros = jnp.zeros(w_shape, dy.dtype)
    (dw,) = jax.linear_transpose(lambda ww: _conv(x, ww), zeros)(dy)
    return dw.astype(jnp.float32)


def _wgrad_tap(dy, x):
    B, H, W, cin = x.shape
    cout = dy.shape[-1]
    xp = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)))
    taps = []
    for kh in range(5):
        for kw in range(5):
            xs = xp[:, kh:kh + H, kw:kw + W, :]
            taps.append(jax.lax.dot_general(
                xs.reshape(-1, cin), dy.reshape(-1, cout),
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ))
    return jnp.stack(taps).reshape(5, 5, cin, cout)


def _wgrad_patch(dy, x, strip):
    B, H, W, cin = x.shape
    cout = dy.shape[-1]
    strip = min(strip, H)
    if H % strip:                      # fall back to a divisor
        strip = next(s for s in range(strip, 0, -1) if H % s == 0)
    xp = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)))

    def body(acc, i):
        r0 = i * strip
        xs = jax.lax.dynamic_slice(
            xp, (0, r0, 0, 0), (B, strip + 4, W + 4, cin))
        cols = [xs[:, kh:kh + strip, kw:kw + W, :]
                for kh in range(5) for kw in range(5)]
        patches = jnp.concatenate(cols, axis=-1).reshape(-1, 25 * cin)
        dys = jax.lax.dynamic_slice(
            dy, (0, r0, 0, 0), (B, strip, W, cout)).reshape(-1, cout)
        dw = jax.lax.dot_general(
            patches, dys, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc + dw, None

    acc0 = jnp.zeros((25 * cin, cout), jnp.float32)
    dw, _ = jax.lax.scan(body, acc0, jnp.arange(H // strip))
    # [25·Cin, Cout] rows are ordered (kh, kw, cin) — matches HWIO reshape.
    return dw.reshape(5, 5, cin, cout)


def _fwd_impl(x, w):
    if TUNE["fwd"] == "pallas":
        from .conv5x5_pallas import conv5x5_fwd_pallas

        return conv5x5_fwd_pallas(x, w)
    return _conv(x, w)


@jax.custom_vjp
def conv5x5(x: jax.Array, w: jax.Array) -> jax.Array:
    """5×5 stride-1 SAME NHWC conv, forward-identical to
    ``lax.conv_general_dilated``, with matmul-formulated gradients."""
    return _fwd_impl(x, w)


def _fwd(x, w):
    return _fwd_impl(x, w), (x, w)


def _bwd(res, dy):
    x, w = res
    dgrad = TUNE["dgrad"]
    if dgrad == "pallas":
        from .conv5x5_pallas import conv5x5_fwd_pallas

        wf = w[::-1, ::-1].transpose(0, 1, 3, 2)
        dx = conv5x5_fwd_pallas(dy, wf)
    elif dgrad == "s2d" and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
        dx = _dgrad_s2d(dy, w)
    elif dgrad in ("flip", "s2d"):   # s2d needs even H, W; fall back
        dx = _dgrad_flip(dy, w)
    else:
        dx = _dgrad_xla(dy, w, x.shape)
    wgrad = TUNE["wgrad"]
    if wgrad == "xla" and x.shape[-1] == 1:
        # Measured exception (results/conv_grad_probe.json, L1): at Cin=1
        # XLA's wgrad lowering runs at 1.4 TF/s-eq (4.7 ms at the config-4
        # shape) and the strip-scan patch matmul is 1.4× faster — the
        # patch matrix is only 25 columns wide there, so the usual
        # HBM-traffic objection doesn't apply.
        wgrad = "patch"
    if wgrad == "pallas":
        from .conv5x5_pallas import wgrad5x5_pallas

        dw = wgrad5x5_pallas(dy, x)
    elif wgrad == "patch":
        dw = _wgrad_patch(dy, x, TUNE["wgrad_strip"])
    elif wgrad == "tap":
        dw = _wgrad_tap(dy, x)
    else:
        dw = _wgrad_xla(dy, x, w.shape)
    return dx.astype(x.dtype), dw.astype(w.dtype)


conv5x5.defvjp(_fwd, _bwd)
