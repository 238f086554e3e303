"""Pallas TPU kernels for the 5×5 stride-1 conv: in-VMEM im2col.

The config-4 train step is 99.8% the reference CNN encoder
(``train_with_env.py:39-55``); its conv passes run below the MXU shapes
they could have (measured, ``results/conv_grad_probe.json``): the forward
at Cin=32 reaches 53 TF/s and the input-gradient at 30-74 TF/s because
XLA's spatial conv lowering contracts K=Cin per tap — K=32/64 against a
128-deep MXU. An im2col patch matrix makes every pass one big matmul with
K=25·Cin (800/1600), but materializing it in HBM costs 25× the input
bytes (measured: the XLA-level "patch" formulation is 3-6× *slower* than
the conv it replaces). These kernels build the patch matrix **in VMEM
only**, one row-strip at a time:

  grid = (F, H/strip). Each step loads the strip's input rows plus a
  4-row halo — two BlockSpec views of the same padded array (a
  ``strip``-row main block and an 8-row halo block at block index
  ``4r/(8/strip_blk)+…``), so Pallas pipelines the loads and no manual
  DMA alignment rules apply — builds ``patches [strip·W, 25·Cin]`` with
  25 shifted slice-copies (pure layout), and issues ONE MXU contraction:

  * fwd  : ``patches @ Wflat[25·Cin, Cout]``      → y strip
  * dgrad: same kernel on ``dy`` with the rot-180, in/out-swapped kernel
  * wgrad: ``patchesᵀ @ dy_strip``                → dw accumulator
           (constant output block: dw lives in VMEM for the whole grid)

HBM traffic is one read of the inputs + one write of the output — the
patch matrix never leaves VMEM. Numerics: identical contractions to
XLA's lowerings, f32 accumulation (``preferred_element_type``), summation
order differs only. Parity: ``tests/test_conv5x5.py`` (interpret mode) +
the TPU oracle checks in ``scripts/conv_grad_probe.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["conv5x5_fwd_pallas", "wgrad5x5_pallas", "TUNE"]

TUNE = {
    "strip": 16,          # rows per grid step (patch matrix rows = strip·W)
    "vmem_limit_bytes": 64 * 2**20,
}

_HALO = 8                 # padded halo rows/cols (8-aligned; data needs 4)


def _build_patches(patch_ref, xm, xh, strip, W, cin):
    """Fill ``patch_ref`` ([strip·W, 25·Cin] VMEM scratch) with the
    strip's im2col block: 25 shifted slice-STORES (Mosaic supports
    lane-offset slice stores; concatenating shifted slices is a
    not-implemented path — "result/input offset mismatch on non-concat
    dimension"). ``xm``: [strip, W+8, cin] main rows; ``xh``: [8, W+8,
    cin] halo rows below. Pure data movement, no arithmetic."""
    xv = jnp.concatenate([xm, xh], axis=0)     # [strip+8, W+8, cin]
    for t in range(25):
        kh, kw = divmod(t, 5)
        patch_ref[:, t * cin:(t + 1) * cin] = (
            xv[kh:kh + strip, kw:kw + W, :].reshape(strip * W, cin)
        )


def _fwd_kernel(xm_ref, xh_ref, w_ref, y_ref, patch, *, strip, W, cin,
                cout):
    _build_patches(patch, xm_ref[0], xh_ref[0], strip, W, cin)
    y = jax.lax.dot_general(
        patch[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    y_ref[0] = y.reshape(strip, W, cout).astype(y_ref.dtype)


def _wgrad_kernel(dy_ref, xm_ref, xh_ref, dw_ref, patch, *, strip, W, cin,
                  cout):
    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    _build_patches(patch, xm_ref[0], xh_ref[0], strip, W, cin)
    dys = dy_ref[0].reshape(strip * W, cout)
    dw_ref[...] += jax.lax.dot_general(
        patch[...], dys, (((0,), (0,)), ((), ())),   # patchesᵀ · dy
        preferred_element_type=jnp.float32,
    )


def _strip_specs(F, H, W, cin, strip):
    """(main, halo) BlockSpecs over the [F, H+8, W+8, Cin] padded input."""
    hblocks = strip // _HALO               # halo-block index stride
    main = pl.BlockSpec(
        (1, strip, W + _HALO, cin), lambda f, r: (f, r, 0, 0),
        memory_space=pltpu.VMEM,
    )
    halo = pl.BlockSpec(
        (1, _HALO, W + _HALO, cin),
        lambda f, r: (f, hblocks * (r + 1), 0, 0),
        memory_space=pltpu.VMEM,
    )
    return main, halo


def _pad_input(x):
    # +8 rows/cols total (data offset 2, 6 trailing): every window the
    # specs read stays in-bounds and 8-aligned.
    return jnp.pad(x, ((0, 0), (2, 6), (2, 6), (0, 0)))


def _pick_strip(H):
    strip = TUNE["strip"]
    if H % strip or strip % _HALO:
        # Candidates must be multiples of _HALO that divide H: the halo
        # BlockSpec index map advances in units of strip//_HALO halo
        # blocks, so a non-8-aligned strip (e.g. H=12 → strip 12) would
        # silently read the wrong halo rows.
        start = (min(strip, H) // _HALO) * _HALO
        strip = next(
            (s for s in range(start, _HALO - 1, -_HALO) if H % s == 0),
            None,
        )
        if strip is None:
            raise ValueError(
                f"conv5x5 Pallas backends need H divisible by an 8-aligned "
                f"strip; H={H} has none (use the XLA backend)"
            )
    assert strip % _HALO == 0 and H % strip == 0
    return strip


def conv5x5_fwd_pallas(x: jax.Array, w: jax.Array) -> jax.Array:
    """5×5 stride-1 SAME conv, one im2col matmul per row strip.
    ``x``: [F, H, W, Cin]; ``w``: [5, 5, Cin, Cout] → [F, H, W, Cout]."""
    F, H, W, cin = x.shape
    cout = w.shape[-1]
    strip = _pick_strip(H)
    xp = _pad_input(x)
    wflat = w.reshape(25 * cin, cout)
    main, halo = _strip_specs(F, H, W, cin, strip)
    kernel = functools.partial(
        _fwd_kernel, strip=strip, W=W, cin=cin, cout=cout
    )
    return pl.pallas_call(
        kernel,
        grid=(F, H // strip),
        in_specs=[
            main, halo,
            pl.BlockSpec((25 * cin, cout), lambda f, r: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, strip, W, cout), lambda f, r: (f, r, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((F, H, W, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((strip * W, 25 * cin), x.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * F * H * W * 25 * cin * cout,
            bytes_accessed=(x.size + F * H * W * cout) * x.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=TUNE["vmem_limit_bytes"],
        ),
        interpret=jax.default_backend() == "cpu",
    )(xp, xp, wflat)


def wgrad5x5_pallas(dy: jax.Array, x: jax.Array) -> jax.Array:
    """``dw[kh,kw,cin,cout] = Σ x[f,h+kh,w+kw,cin]·dy[f,h,w,cout]`` — one
    ``patchesᵀ·dy`` contraction per strip into a VMEM-resident f32
    accumulator. Returns f32 [5, 5, Cin, Cout]."""
    F, H, W, cin = x.shape
    cout = dy.shape[-1]
    strip = _pick_strip(H)
    xp = _pad_input(x)
    main, halo = _strip_specs(F, H, W, cin, strip)
    kernel = functools.partial(
        _wgrad_kernel, strip=strip, W=W, cin=cin, cout=cout
    )
    dw = pl.pallas_call(
        kernel,
        grid=(F, H // strip),
        in_specs=[
            pl.BlockSpec((1, strip, W, cout), lambda f, r: (f, r, 0, 0),
                         memory_space=pltpu.VMEM),
            main, halo,
        ],
        out_specs=pl.BlockSpec(
            (25 * cin, cout), lambda f, r: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((25 * cin, cout), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((strip * W, 25 * cin), x.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * F * H * W * 25 * cin * cout,
            bytes_accessed=(x.size + dy.size) * x.dtype.itemsize
            + 25 * cin * cout * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=TUNE["vmem_limit_bytes"],
        ),
        interpret=jax.default_backend() == "cpu",
    )(dy, xp, xp)
    return dw.reshape(5, 5, cin, cout)
