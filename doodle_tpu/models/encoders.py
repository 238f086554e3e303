"""Per-frame image encoders.

Two encoder families, mirroring the reference:

* :class:`CNNEncoder` — 3×(Conv5×5 → GELU → channel dropout) with 32/64/128
  channels, global average pool, projection to ``out_dim``
  (``train_with_env.py:39-55``). NHWC layout (TPU-friendly: the channel axis
  lands on the 128-wide lane dimension).
* :class:`COMEncoder` — differentiable center of mass (2 coords) → Dense →
  Dropout → GELU (``train_with_env_com_trunc_advantage_ttt.py:42-53``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

from ..ops.conv5x5 import conv5x5
from .com import center_of_mass_2d

__all__ = ["CNNEncoder", "COMEncoder"]


class _MXUConv(nn.Module):
    """``nn.Conv``-compatible 5×5 SAME conv whose *gradients* are lowered
    as MXU matmuls (``ops/conv5x5.py``): forward-identical
    ``lax.conv_general_dilated``, dgrad as a flipped forward conv, wgrad as
    im2col patch-matmuls — the backward is where XLA's own lowering runs
    ~2.5× below forward efficiency at config-4 shapes (BASELINE.md).

    Param tree (``kernel`` HWIO + ``bias``, lecun-normal/zeros inits) and
    dtype promotion match ``nn.Conv`` exactly; call sites instantiate with
    ``name="Conv_<i>"`` so checkpoints and goldens are byte-compatible.
    Non-unit strides (the opt-in ``stride=2`` production knob) keep XLA's
    autodiff — the custom lowerings are derived for stride 1.
    """

    features: int
    strides: tuple[int, int] = (1, 1)
    dtype: object = None            # jnp dtype or None (promote like flax)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (5, 5, cin, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,))
        x, kernel, bias = nn.dtypes.promote_dtype(
            x, kernel, bias, dtype=self.dtype
        )
        if self.strides == (1, 1):
            y = conv5x5(x, kernel)
        else:
            y = jax.lax.conv_general_dilated(
                x, kernel, window_strides=self.strides,
                padding=((2, 2), (2, 2)),
                dimension_numbers=jax.lax.conv_dimension_numbers(
                    x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC")
                ),
            )
        return y + bias


class CNNEncoder(nn.Module):
    """Conv stack → global average pool → Dense → GELU.

    Input ``[B, H, W]`` or ``[B, H, W, C]``; output ``[B, out_dim]``.
    Channel dropout (the Dropout2d analogue) broadcasts the mask over the
    spatial axes so whole feature maps are dropped together.
    """

    out_dim: int = 128
    dropout: float = 0.1
    features: tuple[int, ...] = (32, 64, 128)
    # Compute dtype for the conv stack (params stay f32). bfloat16 runs the
    # convs — where ~99% of the policy FLOPs are — at the MXU's fast rate;
    # the head above operates on the f32-cast pooled features.
    dtype: str | None = None
    # Spatial stride of the FIRST conv. The reference architecture is
    # stride-1 5×5 convs at full input resolution (train_with_env.py:42-49)
    # — that is the default and the parity surface. stride=2 is an opt-in
    # production knob: it divides every conv's output area (and so ~all
    # encoder FLOPs) by stride², ~4× at stride 2, at the cost of a coarser
    # first feature map. Parameter shapes are stride-independent, so
    # checkpoints remain loadable across stride settings.
    stride: int = 1
    # GELU flavor for the CONV activations — the encoder's O(B·res²·chans)
    # elementwise bulk (~1.9e9 elements per config-4 forward). False = erf
    # (torch's F.gelu default; the parity surface and this default). True =
    # tanh approximation: measured 1.84× faster config-4 train step
    # (843 vs 1549 ms, v5e 2026-08-20) at ≤3e-4 absolute activation delta —
    # noise below the bf16 conv quantization production configs already
    # run. TrainConfig defaults to tanh (production), mirroring its
    # precision="default" vs FieldConfig's "highest". The tiny head/pool
    # GELUs stay erf unconditionally.
    gelu_approximate: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        if x.ndim == 3:
            x = x[..., None]
        dtype = jnp.dtype(self.dtype) if self.dtype else None
        if dtype is not None:
            x = x.astype(dtype)
        for i, feat in enumerate(self.features):
            s = self.stride if i == 0 else 1
            x = _MXUConv(
                feat, strides=(s, s), dtype=dtype, name=f"Conv_{i}"
            )(x)
            # Named for selective rematerialization: with
            # rollout(remat_save="conv_last"/"convs") the backward keeps
            # these conv outputs resident instead of re-running the convs
            # — the recompute is then elementwise-only (GELU/dropout).
            x = checkpoint_name(x, f"conv{i}_out")
            x = nn.gelu(x, approximate=self.gelu_approximate)
            x = nn.Dropout(self.dropout, broadcast_dims=(1, 2))(
                x, deterministic=deterministic
            )
        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))   # AvgPool2d((1,1))
        return nn.gelu(nn.Dense(self.out_dim)(x), approximate=False)


class COMEncoder(nn.Module):
    """Center-of-mass coordinates → Dense(2 → out_dim) → Dropout → GELU."""

    out_dim: int = 128
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        coords = center_of_mass_2d(x)
        proj = nn.Dense(self.out_dim)(coords)
        proj = nn.Dropout(self.dropout)(proj, deterministic=deterministic)
        return nn.gelu(proj, approximate=False)   # erf GELU = torch default
