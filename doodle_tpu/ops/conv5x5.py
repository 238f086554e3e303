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
import numpy as np

__all__ = ["conv5x5", "TUNE"]

# Backend per gradient pass; values measured/picked by
# scripts/conv_grad_probe.py on a v5e (see results/conv_grad_probe.json).
# The shipped wgrad default is "xla" (XLA's own transpose), with one
# measured exception hardwired in _bwd: at Cin=1 the strip-scan "patch"
# matmul is 1.4× faster, so that case dispatches to "patch" regardless of
# this setting. Unknown values fall through to "xla" in _bwd.
TUNE = {
    "fwd": "xla",        # "xla" | "s2d" (N = 4·Cout when Cout < 128)
    #                    | "pallas" (in-VMEM im2col matmul)
    "dgrad": "flip",     # "flip" (XLA conv of dy w/ rot180 kernel) | "xla"
    #                    | "s2d" (space-to-depth: N = 4·Cin, see _s2d_conv)
    #                    | "pallas" (im2col matmul of the flipped conv)
    "wgrad": "xla",      # "xla" | "s2d" | "pallas" | "patch" | "tap"
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


def _s2d(x):
    """Space-to-depth (2×2): [F, 2I, 2J, C] → [F, I, J, 4C]."""
    F, H, W, C = x.shape
    z = x.reshape(F, H // 2, 2, W // 2, 2, C)
    return z.transpose(0, 1, 3, 2, 4, 5).reshape(F, H // 2, W // 2, 4 * C)


def _s2d_conv(x, wk):
    """5×5 stride-1 SAME conv with the MXU N-axis widened 4× by
    space-to-depth. ``x``: [F, H, W, Ci] (H, W even), ``wk``:
    [5, 5, Ci, Co] → [F, H, W, Co].

    A plain conv's matmul output width is N = Co — a 25/50% utilization
    ceiling on the 128-lane MXU when Co = 32/64 (the reference encoder's
    dgrad and L2-forward shapes; results/conv_grad_probe.json reading 2).
    Folding a 2×2 spatial block into channels turns the 5×5 stride-1
    conv into a 3×3 VALID conv over [H/2+2, W/2+2, 4·Ci] with a
    [3, 3, 4·Ci, 4·Co] phase kernel: N = 4·Co fills the array, at
    9·16/25 = 1.44× the FLOPs (the 36-tap phase kernel zero-pads the 25
    real taps). Exact — the phase kernel is a gather of ``wk``, and
    invalid taps land in the zero padding.

    Derivation: y[2i+py, 2j+px] = Σ_{u,v} xp[2i+py+u, 2j+px+v]·wk[u,v]
    with xp = x zero-padded by 2. Writing py+u = 2·da + qy gives
    u = 2·da + qy − py with da ∈ {0,1,2} (3 coarse taps), so
    y_phase(py,px)[i,j] = Σ_{da,db,qy,qx} Z[i+da, j+db, qy,qx,:] ·
    wk[2da+qy−py, 2db+qx−px, :, :], where Z is the space-to-depth of
    xp. All four output phases fuse into one conv with 4·Co output
    channels, un-done by depth-to-space.
    """
    F, H, W, ci = x.shape
    co = wk.shape[-1]
    # u = 2·da + qy − py ∈ [−1, 5]; indexing the (1,1)-padded kernel at
    # u+1 ∈ [0, 6] makes the two out-of-range taps read zeros.
    wkp = jnp.pad(wk, ((1, 1), (1, 1), (0, 0), (0, 0)))   # [7,7,Ci,Co]
    da = jnp.arange(3)[:, None, None]
    q = jnp.arange(2)[None, :, None]
    p = jnp.arange(2)[None, None, :]
    U = 2 * da + q - p + 1                                # [3,2,2]
    K = wkp[U[:, None, :, None, :, None], U[None, :, None, :, None, :]]
    # [da,db,qy,qx,py,px,Ci,Co] → [da,db,(qy,qx,Ci),(py,px,Co)]
    K = K.transpose(0, 1, 2, 3, 6, 4, 5, 7).reshape(3, 3, 4 * ci, 4 * co)

    xp = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)))
    Hc, Wc = H // 2, W // 2
    Z = _s2d(xp)                                    # [F, Hc+2, Wc+2, 4Ci]
    out = jax.lax.conv_general_dilated(
        Z, K, window_strides=(1, 1), padding="VALID",
        dimension_numbers=_dn(),
    )                                                    # [F, Hc, Wc, 4Co]
    y = out.reshape(F, Hc, Wc, 2, 2, co)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(F, H, W, co)


def _dgrad_s2d(dy, w):
    """dgrad = forward conv of dy with the rot-180, in/out-swapped kernel,
    through the s2d widening (N = 4·Cin instead of Cin)."""
    wf = w[::-1, ::-1].transpose(0, 1, 3, 2)        # [5,5,Cout,Cin]
    return _s2d_conv(dy, wf)


def _wgrad_s2d(dy, x):
    """wgrad with the MXU N-axis widened 4× by space-to-depth.

    ``dw[u,v,ci,co] = Σ_{n,h,w} x[n,h+u−2,w+v−2,ci]·dy[n,h,w,co]`` — the
    plain lowering's matmul is [25·Cin, P] @ [P, Cout]: N = Cout (32/64
    at the encoder's L1/L2 — a 25/50% MXU ceiling; L1's M = 25 is worse
    still). In s2d space the same contraction is the wgrad of a 3×3
    VALID conv between Z_x = s2d(pad(x)) and Z_dy = s2d(dy): a
    [3, 3, 4·Cin, 4·Cout] phase gradient with N = 4·Cout (and M = 36·Cin),
    at the same 1.44× FLOP cost as the other s2d passes. The phase
    gradient maps back exactly: each 5×5 tap (u,v) appears once per
    output phase (py,px) at (da,qy) = ((u+py)//2, (u+py)%2), and the four
    phase copies are the four disjoint spatial subsums of the full tap —
    summed via a 0/1 mapping einsum (25·4·Cin·Cout adds, noise).
    Requires even H, W. Accumulates in f32 like the other wgrad paths.
    """
    F, H, W, ci = x.shape
    co = dy.shape[-1]
    Zx = _s2d(jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0))))
    Zdy = _s2d(dy)

    def conv3(wp):
        return jax.lax.conv_general_dilated(
            Zx, wp, window_strides=(1, 1), padding="VALID",
            dimension_numbers=_dn(),
        )

    zeros = jnp.zeros((3, 3, 4 * ci, 4 * co), dy.dtype)
    (dwp,) = jax.linear_transpose(conv3, zeros)(Zdy)
    dwp = dwp.astype(jnp.float32).reshape(3, 3, 2, 2, ci, 2, 2, co)
    # M[u, py, da, qy] = 1 iff u = 2·da + qy − py  (same index law as the
    # forward phase kernel, inverted).
    u_ = np.arange(5)[:, None, None, None]
    p_ = np.arange(2)[None, :, None, None]
    a_ = np.arange(3)[None, None, :, None]
    q_ = np.arange(2)[None, None, None, :]
    M = jnp.asarray((2 * a_ + q_ - p_ == u_).astype(np.float32))
    return jnp.einsum("upaq,vsbr,abqrcpso->uvco", M, M, dwp)


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
    if (TUNE["fwd"] == "s2d" and w.shape[-1] < 128
            and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0):
        # Only where the N-ceiling binds (Cout < 128 lanes): at full N the
        # 1.44× FLOP overhead is a pure loss.
        return _s2d_conv(x, w)
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
    if wgrad == "s2d" and not (x.shape[1] % 2 or x.shape[2] % 2):
        dw = _wgrad_s2d(dy, x)
    elif wgrad == "s2d":               # odd H/W: fall back
        dw = _wgrad_xla(dy, x, w.shape)
    elif wgrad == "pallas":
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
