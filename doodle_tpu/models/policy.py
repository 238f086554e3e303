"""PolicyNet — frame-history encoder + {MLP, LSTM, Transformer} sequence head.

Capability parity with the reference ``PolicyNet``
(``train_with_env.py:58-166``): a shared per-frame encoder over the k-frame
history, one of three sequence heads, then
LayerNorm → Dense(256) → Dropout → GELU → Dense(N·3) reshaped to ``[B, N, 3]``
mirror normals (L2-normalized unless ``normalize_output=False`` — the TTT
variant defers normalization to the rollout,
``train_with_env_com_trunc_advantage_ttt.py:162``).

JAX-native differences:
  * the recurrent state is an explicit, fixed-structure carry pytree
    (:func:`initial_carry`), so the rollout can be a ``lax.scan``;
  * the reference's ``hx=None`` first-call special case for the transformer
    head (``train_with_env.py:96-103``) is reproduced by an all-zeros initial
    residual state — ``last_token + 0`` ≡ the ``None`` branch;
  * dropout takes an explicit ``'dropout'`` PRNG collection.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.optics import normalize
from .encoders import CNNEncoder, COMEncoder

__all__ = ["PolicyNet", "initial_carry", "TransformerEncoderLayer"]

Carry = Any  # architecture-dependent pytree; see initial_carry


def initial_carry(
    architecture: str,
    batch_size: int,
    lstm_hid: int = 128,
    enc_dim: int = 128,
    dtype=jnp.float32,
) -> Carry:
    """Zero-initialized recurrent carry for a given head architecture.

    lstm → ``(c, h)`` each ``[B, lstm_hid]`` (zeros = torch's default
    ``hx=None`` LSTM init); transformer → residual state ``[B, enc_dim]``
    (zeros = the reference's first-call ``hx is None`` branch); mlp → ``()``.
    """
    arch = architecture.lower()
    if arch == "lstm":
        return (
            jnp.zeros((batch_size, lstm_hid), dtype),
            jnp.zeros((batch_size, lstm_hid), dtype),
        )
    if arch == "transformer":
        return jnp.zeros((batch_size, enc_dim), dtype)
    if arch == "mlp":
        return ()
    raise ValueError(f"unknown architecture {architecture!r}")


class TransformerEncoderLayer(nn.Module):
    """Post-LN transformer encoder layer (torch ``TransformerEncoderLayer``
    defaults: ReLU feed-forward, dropout on attention/FF outputs)."""

    d_model: int
    num_heads: int
    dim_feedforward: int = 2048
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            dropout_rate=self.dropout,
            deterministic=deterministic,
        )(x, x)
        x = nn.LayerNorm()(
            x + nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        )
        ff = nn.Dense(self.dim_feedforward)(x)
        ff = nn.relu(ff)
        ff = nn.Dropout(self.dropout)(ff, deterministic=deterministic)
        ff = nn.Dense(self.d_model)(ff)
        x = nn.LayerNorm()(
            x + nn.Dropout(self.dropout)(ff, deterministic=deterministic)
        )
        return x


class PolicyNet(nn.Module):
    """Shared encoder per frame → sequence head → normal-prediction head.

    Args mirror the reference ctor (``train_with_env.py:60-77``) plus
    ``encoder ∈ {'cnn', 'com'}`` selecting the frame encoder family and
    ``normalize_output`` for the TTT variant.
    """

    num_heliostats: int
    enc_dim: int = 128
    lstm_hid: int = 128
    transformer_layers: int = 2
    transformer_heads: int = 8
    transformer_ff: int = 2048
    architecture: str = "lstm"
    encoder: str = "cnn"
    dropout: float = 0.1
    head_hidden: int = 256
    normalize_output: bool = True
    # "normals" → [B, N, 3] unit mirror normals (current-generation action
    # space); "angles" → [B, N, 2] East/Up rotations in mrad, tanh-bounded
    # and scaled by ``angle_scale`` — the angular-variant policy
    # (``newenv/train_with_env_angular.py:201-249``). The reference's
    # angular head is unrunnable as shipped (missing comma → SyntaxError at
    # :205, and its forward reshapes the N·2 output to (B, N, 3) at :243);
    # this implements its evident intent: tanh ∘ Dense(N·2) × 50.
    action_space: str = "normals"
    angle_scale: float = 50.0
    # Compute dtype for the frame encoder ("bfloat16" ≈ 2-4× conv speed on
    # the MXU; None = f32). Heads/normals stay f32.
    encoder_dtype: str | None = None

    @nn.compact
    def __call__(
        self,
        img_seq: jax.Array,   # [B, T, H, W] frame history (T = k)
        aux: jax.Array,       # [B, aux_dim]
        carry: Carry,
        *,
        deterministic: bool = True,
    ) -> tuple[jax.Array, Carry]:
        """Returns ``(action, new_carry)``: ``[B, N, 3]`` unit mirror
        normals (``action_space="normals"``) or ``[B, N, 2]`` tanh-bounded
        E/U rotations in mrad (``action_space="angles"``)."""
        arch = self.architecture.lower()
        B, T = img_seq.shape[:2]

        if self.encoder == "cnn":
            enc_mod = CNNEncoder(out_dim=self.enc_dim, dropout=self.dropout,
                                 dtype=self.encoder_dtype)
        elif self.encoder == "com":
            enc_mod = COMEncoder(out_dim=self.enc_dim, dropout=self.dropout)
        else:
            raise ValueError(f"unknown encoder {self.encoder!r}")

        frames = img_seq.reshape(B * T, *img_seq.shape[2:])
        enc = enc_mod(frames, deterministic=deterministic)
        enc = enc.reshape(B, T, self.enc_dim)

        if arch == "lstm":
            cell = nn.OptimizedLSTMCell(self.lstm_hid)
            new_carry = carry
            out = None
            for t in range(T):  # T is static (k ≤ ~4): unrolled at trace time
                new_carry, out = cell(new_carry, enc[:, t])
            feat = out
        elif arch == "transformer":
            x = enc
            for _ in range(self.transformer_layers):
                x = TransformerEncoderLayer(
                    d_model=self.enc_dim,
                    num_heads=self.transformer_heads,
                    dim_feedforward=self.transformer_ff,
                    dropout=self.dropout,
                )(x, deterministic=deterministic)
            feat = x[:, -1, :] + carry   # residual state across env steps
            new_carry = feat
        elif arch == "mlp":
            feat = enc[:, -1, :]
            new_carry = ()
        else:
            raise ValueError(f"unknown architecture {self.architecture!r}")

        h = jnp.concatenate([feat, aux], axis=-1)
        h = nn.LayerNorm()(h)
        h = nn.Dense(self.head_hidden)(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.gelu(h)
        if self.action_space == "angles":
            out = nn.Dense(self.num_heliostats * 2)(h)
            angles = jnp.tanh(out) * self.angle_scale
            return angles.reshape(B, self.num_heliostats, 2), new_carry
        out = nn.Dense(self.num_heliostats * 3)(h)
        normals = out.reshape(B, self.num_heliostats, 3)
        if self.normalize_output:
            normals = normalize(normals)
        return normals, new_carry

    # ------------------------------------------------------------------
    def init_carry(self, batch_size: int, dtype=jnp.float32) -> Carry:
        return initial_carry(
            self.architecture, batch_size, self.lstm_hid, self.enc_dim, dtype
        )
