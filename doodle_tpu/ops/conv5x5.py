"""MXU-matmul gradients for the reference CNN's 5×5 stride-1 convs.

The config-4 train step is 99.8% CNN encoder, and 83% of it is the conv
backward running at ~2.5× lower MXU efficiency than the forward
(BASELINE.md "Where the config-4 train step's 843 ms goes"). The forward
(`lax.conv_general_dilated`) reaches 93% of the measured MXU ceiling —
XLA's *gradient* lowerings for this shape are what's slow. This module
keeps the forward untouched and swaps only the backward, via
``jax.custom_vjp``:

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
# wgrad "auto" = the Pallas VMEM-im2col kernel (conv5x5_pallas.py) on
# accelerators, "patch" on CPU (interpret-mode Pallas is only for parity
# tests; the XLA patch scan is the fast host path).
TUNE = {
    "fwd": "xla",        # "xla" | "pallas" (in-VMEM im2col matmul)
    "dgrad": "flip",     # "flip" (XLA conv of dy w/ rot180 kernel) | "xla"
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
    elif dgrad == "flip":
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
