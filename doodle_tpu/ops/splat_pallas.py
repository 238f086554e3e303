"""Fused Pallas TPU kernel for the separable Gaussian splat.

The XLA path (``ops/splat.py``) materializes the per-ray factor tables
``fx, fy : [B, N, res]`` in HBM between the exp and the contraction —
~270 MB of traffic per render at the north-star config, which makes the
render memory-bound (measured 0.53 ms vs 0.04 ms of pure MXU time).

This kernel fuses table construction and contraction: per grid step (one
per (image-block, heliostat-chunk)), the block's fx/fy tables are built in
VMEM straight from the per-ray scalars (a, b, σ, |c|²) and immediately
contracted on the MXU into the output tiles, accumulating across chunks.
The tables never touch HBM; per-render traffic drops to the [B, N] scalar
inputs plus one [B, res, res] image write. Measured on one v5e chip at the
north-star config (N=500, 256², B=128): 0.18-0.20 ms forward vs ~0.31 for
the XLA separable path (full env steps: 0.26 vs 0.37 ms before the
mask-free rework below).

The backward is a fused kernel with the same structure
(``_splat_bwd_kernel``): both factor-table cotangents are themselves MXU
matmuls (``dfx = fy @ gᵀ``, ``dfy = fx @ g``), chained to the per-ray
scalars elementwise in VMEM — so no ``[B, N, res]`` tables (factor or
cotangent) are materialized in either direction, which is what buys
batch-size headroom at large N (XLA's autodiff working set at N=2000,
B=64 is ~0.5 GB; this kernel's is the [B, res, res] cotangent alone).
Fused fwd+bwd measures ≈0.54 ms at the north-star config.

Both kernels are mask-free: per-element compare/select ops for the
valid/invalid/padding ray classes were replaced by encoding the class
into the per-ray scalars (see ``_splat_kernel``), worth ~25% on the
VPU-bound forward (0.25 → 0.184 ms measured). The bf16 mode further
uses a reduced-op table construction (``_splat_kernel_fast``: two FMAs
+ hardware ``exp2`` per element via a quadratic expansion of the
Gaussian argument). Bound analysis (corrected 2026-08-19, see
BASELINE.md roofline): hardware ``exp2`` costs only ~1.4 FMA slots on
this VPU, so the kernel is *elementwise-VPU*-bound, not
transcendental-bound — the fast forward measures 0.239 ms at the
north-star config vs a serialized light-speed sum of 0.167 ms
(VPU tables 0.071 + MXU 0.047 + HBM image write 0.049); the remaining
levers are grid-step overhead and VPU↔MXU co-issue, not fewer exps.
(Tried and rejected 2026-08-19: a manually software-pipelined body —
static sub-chunks so the sub-chunk j+1 table build is independent of the
sub-chunk j MXU dot — measured 0.93-1.01× of this kernel at sub ∈
{64, 128, 256}; Mosaic's scheduler already extracts whatever co-issue the
hardware gives.) Shared-chip congestion moves absolute numbers by
±10-40% — A/B kernel variants within one sweep, never across sessions.

Numerics match ``splat_factors`` + ``splat_image`` (including the
reference's invalid-ray ⇒ all-ones-contribution quirk,
``newenv_rl_test_multi_error.py:140-148``): forward and gradient parity
vs the XLA oracle are covered by tests, on TPU to ~6e-5 relative.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["splat_params", "splat_summed_pallas", "TUNE"]

# Kernel tuning knobs (module-level so autotune sweeps can poke them
# without churning the custom_vjp signature). ``chunk``: contraction
# depth per grid step; ``image_block``: images per grid step (amortizes
# per-step pipeline overhead); ``vmem_budget``: cap on the per-step VMEM
# working set our blocking heuristic targets; ``vmem_limit_bytes``:
# Mosaic's hard VMEM ceiling (None = compiler default ~16 MB).
#
# Forward and backward are tuned separately: the backward's per-image
# working set is ~4x the forward's (fx/fy/dfx/dfy + temps), so at
# chunk=512 under the 12M budget it only fits 2 images per grid step and
# goes overhead-bound. Swept on a v5e at N=500/256²/B=128
# (scripts/splat_autotune.py, 2026-08-17): fwd 0.18-0.20 ms at
# chunk=512/bs=8 (bs=16/32 with a raised VMEM limit measured 0.23-0.27 —
# more VMEM pressure loses to pipelining); bwd ≈0.35 ms at chunk=128
# (0.540 fwd+bwd) vs ≈0.55 at chunk=512/bs=2, with chunk∈{128,256} and
# budget∈{12M,24M,48M} all within ±5% — the backward is compute-bound
# (two MXU dots + factor recompute), so only the bs=2 cliff matters.
TUNE = {
    "fwd": {
        "chunk": 512,
        "image_block": 8,
        "vmem_budget": 12 * 2**20,
        "vmem_limit_bytes": None,
        # Fast-mode (bf16) forward structure — the r4 co-issue attempts
        # (VERDICT r3 item 2), BOTH measured slower-or-equal and left off
        # (kernel-level A/B at config 4, one session, 2026-08-20:
        # base 0.2387 / mxu 0.2531 / mxu+pipe 0.2701 / fma+pipe 0.2458 ms
        # — results/splat_pipeline_ab.json has the env-step view):
        # * mxu_args: build the exp2 ARGUMENTS on the MXU as a K=3 matmul
        #   ([px,−r,−qx]·[g;g²;1]) — the VPU keeps only exp2, but the arg
        #   matmuls' M×N tile passes cost MORE MXU time than the VPU FMAs
        #   they replace (K=3 pads to a full 128-deep pass): +6%.
        # * pipeline: 1-D flattened grid + double-buffered bf16 table
        #   scratch — step s's build is data-independent of step s−1's
        #   contraction by construction, yet measures 1.00-1.03× of the
        #   serial kernel with either build: Mosaic issues grid steps
        #   serially and extracts <3% cross-iteration VPU/MXU overlap
        #   (same bound r2's within-step sub-chunking found). The 0.239 ms
        #   forward is the measured floor of this design family across
        #   five structured attempts; see BASELINE.md.
        "mxu_args": False,
        "pipeline": False,
    },
    "bwd": {
        "chunk": 128,
        "image_block": 8,
        "vmem_budget": 12 * 2**20,
        # The bwd working set at bs=8/chunk=128 sits within ~1% of
        # Mosaic's default 16M scoped-vmem limit — N=600 (5 chunks)
        # overflowed it by 156K at compile time. 32M keeps headroom
        # (hardware VMEM is 128M); measured timing is unchanged.
        "vmem_limit_bytes": 32 * 2**20,
    },
}

# exp(-_PAD_C) == 0 exactly in f32: padding rays contribute nothing.
_PAD_C = 1e30

_LOG2E = 1.4426950408889634  # log2(e): pre-scales s so the kernel calls exp2


def splat_params(
    intersections: jax.Array,   # [B, N, 3]
    ray_origins: jax.Array,     # [B, N, 3]
    plane_origin: jax.Array,
    plane_u: jax.Array,
    plane_v: jax.Array,
    sigma_scale: float,
    valid_mask: jax.Array,      # [B, N, 1]
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Reduce ray geometry to the per-ray scalars the kernel consumes:
    ``(a, b, inv2s2, c_sq, valid) : [B, N]`` each (see ``splat_factors``
    for the math)."""
    diff = intersections - ray_origins
    distances = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12)
    sigma = jnp.maximum(sigma_scale * distances, 1e-9)
    inv2s2 = 1.0 / jnp.maximum(2.0 * sigma * sigma, 1e-12)

    r = intersections - plane_origin
    a = jnp.sum(r * plane_u, axis=-1)
    b = jnp.sum(r * plane_v, axis=-1)
    r_perp = r - a[..., None] * plane_u - b[..., None] * plane_v
    c_sq = jnp.sum(r_perp * r_perp, axis=-1)
    return a, b, inv2s2, c_sq, valid_mask[..., 0]


def _splat_kernel(a_ref, b_ref, s_ref, c_ref, gx_ref, gy_ref, out_ref,
                  *, use_bf16: bool):
    """One grid step = (image block, heliostat chunk): build the block's
    factor tables in VMEM, contract over the chunk with one batched MXU
    dot, accumulate. Blocking several images per step amortizes the
    per-grid-step pipeline overhead (with 1 image/step the dot is ~1 µs of
    MXU work against ~5 µs of step overhead — overhead-bound).

    The kernel is mask-free: ray classes are pre-encoded into the per-ray
    scalars by the impl (valid → real (s, c); invalid-but-real → s=c=0 so
    both factors are exactly exp(0)=1, the reference's all-ones quirk;
    padding → c=1e30, s=1 so fx is exactly 0). Valid-ray arithmetic is
    bit-identical to the masked form — same expression, same op order.

    ``use_bf16``: feed the MXU bf16 factor tables (f32 accumulation) — the
    single-pass fast mode for ``precision="default"``; factors are in [0, 1]
    so the 8-bit mantissa costs ~1e-3 relative flux error."""
    chunk = pl.program_id(1)

    a = a_ref[0, 0]            # [bs, Nc]
    bb = b_ref[0, 0]
    s = s_ref[0, 0]
    c = c_ref[0, 0]
    gx = gx_ref[0, :]          # [res]
    gy = gy_ref[0, :]

    dx2 = (gx[None, None, :] - a[..., None]) ** 2  # [bs, Nc, res]
    dy2 = (gy[None, None, :] - bb[..., None]) ** 2
    fx = jnp.exp(-(dx2 + c[..., None]) * s[..., None])
    fy = jnp.exp(-dy2 * s[..., None])

    if use_bf16:
        fx = fx.astype(jnp.bfloat16)
        fy = fy.astype(jnp.bfloat16)
    tile = jax.lax.dot_general(
        fx, fy, (((1,), (1,)), ((0,), (0,))),      # batch over bs, contract Nc
        preferred_element_type=jnp.float32,
        # Without this, f32 inputs still go through single-pass bf16 MXU
        # multiplies (~2e-3 rel err) — "highest" must mean full-f32 passes
        # to honor FieldConfig's reference-grade-parity contract.
        precision=None if use_bf16 else jax.lax.Precision.HIGHEST,
    )                                               # [bs, res, res]

    @pl.when(chunk == 0)
    def _():
        out_ref[:, :, :] = tile

    @pl.when(chunk > 0)
    def _():
        out_ref[:, :, :] = out_ref[:, :, :] + tile


def _splat_kernel_fast(px_ref, qx_ref, py_ref, qy_ref, r_ref, gx_ref, gy_ref,
                       out_ref):
    """Reduced-op forward for ``precision="default"`` (bf16 MXU mode).

    The Gaussian argument is expanded around the grid coordinate:
    ``-((g-a)² + c)·s·log2e = p·g - (r·g² + q)`` with per-ray scalars
    ``p = 2s'a``, ``q = s'(a²+c)``, ``r = s'`` (``s' = s·log2e``), computed
    once per ray on the host side. Each table element is then two FMAs +
    one hardware ``exp2`` + a bf16 cast — versus sub/mul/add/mul/exp/cast
    for the exact form — on a kernel that is VPU-bound. The expansion's
    cancellation error in the argument is ≲1e-5 absolute for on-target
    rays (|a| ≲ grid extent), invisible next to the bf16 factor
    quantization (~1e-3 relative) this mode already accepts; rays with
    large |a| have argument ≈ -a²·s' where fx underflows to 0 anyway.
    Ray classes ride the same encoding as the exact kernel: invalid →
    p=q=r=0 ⇒ exp2(0)=1 (all-ones quirk); padding → q=1e30 ⇒ fx=0."""
    chunk = pl.program_id(1)

    px = px_ref[0, 0]          # [bs, Nc]
    qx = qx_ref[0, 0]
    py = py_ref[0, 0]
    qy = qy_ref[0, 0]
    r = r_ref[0, 0]
    gx = gx_ref[0, :]          # [res]
    gy = gy_ref[0, :]

    rr = r[..., None]
    argx = px[..., None] * gx[None, None, :] - (
        rr * (gx * gx)[None, None, :] + qx[..., None])
    argy = py[..., None] * gy[None, None, :] - (
        rr * (gy * gy)[None, None, :] + qy[..., None])
    # No explicit bf16 cast: DEFAULT-precision f32 inputs go through the
    # same single-pass bf16 MXU multiply with the conversion fused into
    # the MXU feed — bitwise-identical output, two fewer VPU ops per
    # element (A/B'd 2026-08-19: 0.226 → 0.217 ms at config 4).
    fx = jnp.exp2(argx)
    fy = jnp.exp2(argy)

    tile = jax.lax.dot_general(
        fx, fy, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )                                               # [bs, res, res]

    @pl.when(chunk == 0)
    def _():
        out_ref[:, :, :] = tile

    @pl.when(chunk > 0)
    def _():
        out_ref[:, :, :] = out_ref[:, :, :] + tile


def _mxu_args_tables(px, qx, py, qy, r, gx3, gy3):
    """Shared arg-matmul + exp2 table build for the mxu_args kernels.

    ``argx = px·g − (r·g² + qx)`` evaluated as one K=3 matmul per table:
    lhs rows ``[px, −r, −qx]`` (stacked in-VMEM — 3·bs·Nc elements, noise
    next to the exp2 sweep), rhs ``G = [g; g²; 1]``. The VPU's per-element
    work drops from 2 broadcast-FMAs + exp2 to exp2 alone; the arg FMAs
    ride the MXU. FP summation order inside the argument differs from the
    FMA chain (f32 dot) — sub-1e-6 on the argument, invisible under this
    mode's bf16 factor quantization. Ray classes ride the coefficients as
    before (invalid → all-zero ⇒ exp2(0)=1; padding → −qx=−1e30 ⇒ fx=0).
    """
    bs, nc = px.shape
    res = gx3.shape[-1]
    lhsx = jnp.stack([px, -r, -qx], axis=-1).reshape(bs * nc, 3)
    lhsy = jnp.stack([py, -r, -qy], axis=-1).reshape(bs * nc, 3)
    argx = jax.lax.dot_general(
        lhsx, gx3, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    argy = jax.lax.dot_general(
        lhsy, gy3, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return (jnp.exp2(argx).reshape(bs, nc, res),
            jnp.exp2(argy).reshape(bs, nc, res))


def _splat_kernel_mxu(px_ref, qx_ref, py_ref, qy_ref, r_ref, gx3_ref,
                      gy3_ref, out_ref):
    """Fast-mode forward with MXU-built arguments (TUNE["fwd"]["mxu_args"])
    on the standard (image-block, chunk) grid."""
    chunk = pl.program_id(1)
    fx, fy = _mxu_args_tables(
        px_ref[0, 0], qx_ref[0, 0], py_ref[0, 0], qy_ref[0, 0], r_ref[0, 0],
        gx3_ref[...], gy3_ref[...],
    )
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


def _fma_tables(px, qx, py, qy, r, gx3, gy3):
    """The original broadcast-FMA table build (``_splat_kernel_fast``'s
    arithmetic), reading g and g² from the [3, res] G inputs. Pure VPU —
    the build the pipelined kernel can overlap with the MXU contraction
    (the mxu_args build cannot: its arg matmuls queue on the same MXU as
    the main dot, which is why pipe+mxu_args measured 1.00× of mxu alone,
    results/splat_pipeline_ab.json)."""
    gx, gx2 = gx3[0], gx3[1]
    gy, gy2 = gy3[0], gy3[1]
    rr = r[..., None]
    argx = px[..., None] * gx[None, None, :] - (
        rr * gx2[None, None, :] + qx[..., None])
    argy = py[..., None] * gy[None, None, :] - (
        rr * gy2[None, None, :] + qy[..., None])
    return jnp.exp2(argx), jnp.exp2(argy)


def _splat_kernel_mxu_pipe(px_ref, qx_ref, py_ref, qy_ref, r_ref, gx3_ref,
                           gy3_ref, out_ref, fxb, fyb, *, n_chunks,
                           use_mxu_args=True):
    """Pipelined ``_splat_kernel_mxu`` over a 1-D grid of
    ``n_blocks·n_chunks + 1`` steps: step ``s`` builds flat-chunk ``s``'s
    bf16 tables into scratch slot ``s % 2`` (MXU K=3 args + VPU exp2)
    while the main MXU dot contracts chunk ``s−1``'s tables from the other
    slot — explicit cross-grid-step software pipelining; the build and the
    previous chunk's contraction share no data, so Mosaic can co-issue
    them. The +1 step is the drain (dot only). Because the grid is
    flattened over (image-block, chunk), the overlap also crosses
    image-block boundaries — two image blocks in flight."""
    s = pl.program_id(0)
    total = pl.num_programs(0) - 1     # number of build steps

    @pl.when(s < total)
    def _build():
        build = _mxu_args_tables if use_mxu_args else _fma_tables
        fx, fy = build(
            px_ref[0, 0], qx_ref[0, 0], py_ref[0, 0], qy_ref[0, 0],
            r_ref[0, 0], gx3_ref[...], gy3_ref[...],
        )
        slot = jax.lax.rem(s, 2)
        fxb[slot] = fx.astype(jnp.bfloat16)
        fyb[slot] = fy.astype(jnp.bfloat16)

    @pl.when(s > 0)
    def _contract():
        slot = jax.lax.rem(s - 1, 2)
        tile = jax.lax.dot_general(
            fxb[slot], fyb[slot], (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        pos = jax.lax.rem(s - 1, n_chunks)

        @pl.when(pos == 0)
        def _():
            out_ref[:, :, :] = tile

        @pl.when(pos > 0)
        def _():
            out_ref[:, :, :] = out_ref[:, :, :] + tile


def _compiler_params(tune):
    limit = tune["vmem_limit_bytes"]
    if limit is None:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=limit)


def _balanced_chunk(N: int, max_chunk: int) -> int:
    """Contraction depth per grid step: balance N over the number of
    max_chunk-deep passes it needs, rounded up to the 128-lane tile, so
    the heliostat padding never exceeds one tile per chunk (a fixed
    512-deep chunk wastes up to 70% of the exp work at e.g. N=600 →
    Np=1024). Floored at 256: deep MXU passes amortize weight loads
    (chunk=512 measured ~15% faster than 256 at N=500), and fields small
    enough to care route to the XLA backend anyway."""
    n_passes = -(-N // max_chunk)
    per = -(-N // n_passes)
    return min(max_chunk, max(256, -(-per // 128) * 128))


def _splat_pallas_fwd_impl(
    a, b, inv2s2, c_sq, valid, gx, gy, *, use_bf16: bool = False,
) -> jax.Array:
    tune = TUNE["fwd"]
    B, N = a.shape
    res = gx.shape[0]
    chunk = _balanced_chunk(N, tune["chunk"])
    n_chunks = pl.cdiv(N, chunk)
    Np = n_chunks * chunk

    # Image-block size: as many images per grid step as the VMEM budget
    # allows (fx + fy + out tile per image), capped at image_block.
    bytes_per_img = (2 * chunk * res + res * res) * 4
    bs = max(1, min(tune["image_block"], tune["vmem_budget"] // bytes_per_img))
    n_blocks = pl.cdiv(B, bs)
    Bp = n_blocks * bs

    def pad(x, fill=0.0):
        # [B, N] → [n_blocks, n_chunks, bs, chunk]: the block's trailing two
        # dims (bs, chunk) then EQUAL the array's, which satisfies Mosaic's
        # tiling rule for any bs (a (bs, 1, chunk) block over a
        # [Bp, n_chunks, chunk] array is illegal whenever n_chunks > 1 and
        # bs is not a multiple of 8).
        p = jnp.pad(
            x, ((0, Bp - B), (0, Np - N)), constant_values=fill
        )
        return p.reshape(n_blocks, bs, n_chunks, chunk).transpose(0, 2, 1, 3)

    is_valid = valid > 0
    if use_bf16:
        # Fast mode: per-ray expansion coefficients for _splat_kernel_fast.
        # Invalid-but-real rays get p=q=r=0 (⇒ exp2(0)=1 all-ones quirk);
        # padding gets q=1e30, rest 0 (⇒ fx = exp2(-1e30) = 0 exactly).
        s2 = jnp.where(is_valid, inv2s2 * _LOG2E, 0.0)
        inputs = [
            pad(2.0 * s2 * a),                      # px
            pad(s2 * (a * a + c_sq), fill=_PAD_C),  # qx
            pad(2.0 * s2 * b),                      # py
            pad(s2 * (b * b)),                      # qy
            pad(s2),                                # r
        ]
        kernel = _splat_kernel_fast
    else:
        # Exact mode — ray classes encoded into (s, c), see _splat_kernel's
        # docstring: invalid-but-real rays get s=c=0 (⇒ all-ones factors,
        # the reference quirk); padding gets c=1e30, s=1 (⇒ fx =
        # exp(-1e30) = 0 exactly).
        inputs = [
            pad(a),
            pad(b),
            pad(jnp.where(is_valid, inv2s2, 0.0), fill=1.0),
            pad(jnp.where(is_valid, c_sq, 0.0), fill=_PAD_C),
        ]
        kernel = functools.partial(_splat_kernel, use_bf16=False)

    mxu = use_bf16 and (tune.get("mxu_args") or tune.get("pipeline"))
    pipe = use_bf16 and tune.get("pipeline")
    if mxu:
        ones = jnp.ones_like(gx)
        gtail = [jnp.stack([gx, gx * gx, ones]),
                 jnp.stack([gy, gy * gy, ones])]
        grows = 3
        kernel = _splat_kernel_mxu
    else:
        gtail = [gx[None, :], gy[None, :]]
        grows = 1

    cost = pl.CostEstimate(
        flops=2 * Bp * Np * res * res,
        bytes_accessed=Bp * Np * len(inputs) * 4 + Bp * res * res * 4,
        transcendentals=2 * Bp * Np * res,
    )
    interpret = jax.default_backend() == "cpu"
    out_shape = jax.ShapeDtypeStruct((Bp, res, res), jnp.float32)

    if pipe:
        total = n_blocks * n_chunks       # build steps; +1 drain step
        bstep = lambda s: jnp.minimum(s, total - 1)
        scalar_spec = pl.BlockSpec(
            (1, 1, bs, chunk),
            lambda s: (bstep(s) // n_chunks, bstep(s) % n_chunks, 0, 0),
            memory_space=pltpu.VMEM,
        )
        gspec = pl.BlockSpec((grows, res), lambda s: (0, 0),
                             memory_space=pltpu.VMEM)
        limit = tune["vmem_limit_bytes"] or 64 * 2**20
        out = pl.pallas_call(
            functools.partial(
                _splat_kernel_mxu_pipe, n_chunks=n_chunks,
                use_mxu_args=bool(tune.get("mxu_args")),
            ),
            grid=(total + 1,),
            in_specs=[scalar_spec] * len(inputs) + [gspec, gspec],
            out_specs=pl.BlockSpec(
                (bs, res, res),
                lambda s: (jnp.maximum(s - 1, 0) // n_chunks, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((2, bs, chunk, res), jnp.bfloat16),
                pltpu.VMEM((2, bs, chunk, res), jnp.bfloat16),
            ],
            cost_estimate=cost,
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=limit),
            interpret=interpret,
        )(*inputs, *gtail)
        return out[:B]

    row = lambda i, j: (i, j, 0, 0)  # block index over (image-block, chunk) grid
    scalar_spec = pl.BlockSpec(
        (1, 1, bs, chunk), row, memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kernel,
        grid=(n_blocks, n_chunks),
        in_specs=[scalar_spec] * len(inputs) + [
            pl.BlockSpec((grows, res), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((grows, res), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bs, res, res), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=out_shape,
        cost_estimate=cost,
        compiler_params=_compiler_params(tune),
        # CPU (tests/virtual meshes) runs the kernel in interpreter mode.
        interpret=interpret,
    )(*inputs, *gtail)
    return out[:B]


def _splat_bwd_kernel(a_ref, b_ref, s_ref, c_ref, gx_ref, gy_ref,
                      g_ref, da_ref, db_ref, ds_ref, dc_ref, *,
                      use_bf16: bool):
    """Fused backward: recompute the chunk's factor tables in VMEM, turn the
    upstream image cotangent into factor cotangents with two batched MXU
    dots (``dfx = fy @ gᵀ``, ``dfy = fx @ g``), and chain to the per-ray
    scalars elementwise. Nothing but the [B, res, res] cotangent and the
    [B, N] scalars ever touches HBM.

    Mask-free like the forward: invalid/padding rays arrive with s=c=0, so
    da/db (∝ s) and dc (∝ s) are automatically zero; only ds needs a final
    zeroing, done on the [B, N] output outside the kernel (padding rows are
    simply sliced off by unpad)."""
    a = a_ref[0, 0]            # [bs, Nc]
    bb = b_ref[0, 0]
    s = s_ref[0, 0]
    c = c_ref[0, 0]
    gx = gx_ref[0, :]          # [res]
    gy = gy_ref[0, :]
    g = g_ref[:, :, :]         # [bs, res, res] upstream cotangent

    dx = gx[None, None, :] - a[..., None]          # [bs, Nc, res]
    dy = gy[None, None, :] - bb[..., None]
    ex = (dx * dx + c[..., None]) * s[..., None]
    ey = (dy * dy) * s[..., None]
    fx = jnp.exp(-ex)
    fy = jnp.exp(-ey)

    # bf16 mode needs no explicit casts: DEFAULT-precision f32 inputs run
    # the same single-pass bf16 MXU multiply with the conversion fused
    # into the MXU feed (bitwise-identical, fewer VPU ops — see the
    # forward kernel).
    prec = (jax.lax.Precision.DEFAULT if use_bf16
            else jax.lax.Precision.HIGHEST)
    # dfx[b,n,i] = Σ_j fy[b,n,j] g[b,i,j] ; dfy[b,n,j] = Σ_i fx[b,n,i] g[b,i,j]
    dfx = jax.lax.dot_general(
        fy, g, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=prec,
    )
    dfy = jax.lax.dot_general(
        fx, g, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=prec,
    )

    px = dfx * fx
    py = dfy * fy
    da_ref[0, 0] = jnp.sum(px * dx, axis=-1) * 2.0 * s
    db_ref[0, 0] = jnp.sum(py * dy, axis=-1) * 2.0 * s
    ds_ref[0, 0] = -(jnp.sum(px * (dx * dx + c[..., None]), axis=-1)
                     + jnp.sum(py * (dy * dy), axis=-1))
    dc_ref[0, 0] = -s * jnp.sum(px, axis=-1)


def _splat_pallas_bwd_impl(
    a, b, inv2s2, c_sq, valid, gx, gy, g, *, use_bf16: bool = False,
):
    tune = TUNE["bwd"]
    B, N = a.shape
    res = gx.shape[0]
    chunk = tune["chunk"]
    n_chunks = pl.cdiv(N, chunk)
    Np = n_chunks * chunk

    # fx/fy/dfx/dfy + elementwise temps dominate: ~8 chunk×res f32 buffers
    # per image, plus the res×res cotangent tile.
    bytes_per_img = (8 * chunk * res + res * res) * 4
    bs = max(1, min(tune["image_block"], tune["vmem_budget"] // bytes_per_img))
    n_blocks = pl.cdiv(B, bs)
    Bp = n_blocks * bs

    def pad(x, fill=0.0):
        # [B, N] → [n_blocks, n_chunks, bs, chunk] (see the forward impl for
        # why the trailing block dims must equal the array dims).
        p = jnp.pad(x, ((0, Bp - B), (0, Np - N)), constant_values=fill)
        return p.reshape(n_blocks, bs, n_chunks, chunk).transpose(0, 2, 1, 3)

    # Invalid and padding rays both get s=c=0: every grad channel except ds
    # is then zero by construction (∝ s); ds is re-masked below.
    is_valid = valid > 0
    a_p = pad(a)
    b_p = pad(b)
    s_p = pad(jnp.where(is_valid, inv2s2, 0.0))
    c_p = pad(jnp.where(is_valid, c_sq, 0.0))
    g_p = jnp.pad(g, ((0, Bp - B), (0, 0), (0, 0)))

    row = lambda i, j: (i, j, 0, 0)
    scalar_spec = pl.BlockSpec((1, 1, bs, chunk), row, memory_space=pltpu.VMEM)
    out_sds = jax.ShapeDtypeStruct((n_blocks, n_chunks, bs, chunk), jnp.float32)
    da, db, ds, dc = pl.pallas_call(
        functools.partial(_splat_bwd_kernel, use_bf16=use_bf16),
        grid=(n_blocks, n_chunks),
        in_specs=[
            scalar_spec, scalar_spec, scalar_spec, scalar_spec,
            pl.BlockSpec((1, res), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, res), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bs, res, res), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[scalar_spec, scalar_spec, scalar_spec, scalar_spec],
        out_shape=[out_sds, out_sds, out_sds, out_sds],
        cost_estimate=pl.CostEstimate(
            flops=4 * Bp * Np * res * res,
            bytes_accessed=Bp * Np * 4 * 4 + Bp * res * res * 4,
            transcendentals=2 * Bp * Np * res,
        ),
        compiler_params=_compiler_params(tune),
        interpret=jax.default_backend() == "cpu",
    )(a_p, b_p, s_p, c_p, gx[None, :], gy[None, :], g_p)

    def unpad(x):
        return x.transpose(0, 2, 1, 3).reshape(Bp, Np)[:B, :N]

    return (unpad(da), unpad(db),
            jnp.where(is_valid, unpad(ds), 0.0), unpad(dc))


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _splat_core(a, b, inv2s2, c_sq, valid, gx, gy, width, height, precision):
    return _splat_pallas_fwd_impl(
        a, b, inv2s2, c_sq, valid, gx, gy,
        use_bf16=(precision == "default"),
    )


def _splat_fwd(a, b, inv2s2, c_sq, valid, gx, gy, width, height, precision):
    out = _splat_pallas_fwd_impl(
        a, b, inv2s2, c_sq, valid, gx, gy,
        use_bf16=(precision == "default"),
    )
    return out, (a, b, inv2s2, c_sq, valid, gx, gy)


def _splat_bwd(width, height, precision, res_args, g):
    a, b, inv2s2, c_sq, valid, gx, gy = res_args
    da, db, ds, dc = _splat_pallas_bwd_impl(
        a, b, inv2s2, c_sq, valid, gx, gy, g,
        use_bf16=(precision == "default"),
    )
    return da, db, ds, dc, None, None, None


_splat_core.defvjp(_splat_fwd, _splat_bwd)


def splat_summed_pallas(
    intersections: jax.Array,   # [B, N, 3]
    ray_origins: jax.Array,     # [B, N, 3]
    plane_origin: jax.Array,
    plane_u: jax.Array,
    plane_v: jax.Array,
    width: float,
    height: float,
    resolution: int,
    sigma_scale: float,
    valid_mask: jax.Array,      # [B, N, 1]
    precision: str | None = "default",
) -> jax.Array:
    """Drop-in fused replacement for ``splat_factors`` + ``splat_image``
    (``[B, N, 3]`` rays → ``[B, res, res]`` summed flux images)."""
    a, b, inv2s2, c_sq, valid = splat_params(
        intersections, ray_origins, plane_origin, plane_u, plane_v,
        sigma_scale, valid_mask,
    )
    dtype = intersections.dtype
    gx = jnp.linspace(-width / 2.0, width / 2.0, resolution, dtype=dtype)
    gy = jnp.linspace(-height / 2.0, height / 2.0, resolution, dtype=dtype)
    return _splat_core(
        a, b, inv2s2, c_sq, valid, gx, gy, width, height, precision
    )
