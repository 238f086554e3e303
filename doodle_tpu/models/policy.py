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
  * dropout takes an explicit ``'dropout'`` PRNG collection;
  * the module is split into :meth:`encode` (per-frame encoder) and
    :meth:`head` (sequence head + output layers) so the rollout can cache
    frame encodings across timesteps (each frame enters the k-history once
    but the reference re-encodes it at every step it remains in the buffer —
    identical math, k× the conv FLOPs; see ``train/rollout.py``).
    :meth:`__call__` composes the two and is the reference-shaped entry.
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
        # epsilon=1e-5 = torch nn.LayerNorm default (flax defaults to 1e-6).
        x = nn.LayerNorm(epsilon=1e-5)(
            x + nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        )
        ff = nn.Dense(self.dim_feedforward)(x)
        ff = nn.relu(ff)
        ff = nn.Dropout(self.dropout)(ff, deterministic=deterministic)
        ff = nn.Dense(self.d_model)(ff)
        x = nn.LayerNorm(epsilon=1e-5)(
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
    # First-conv stride of the CNN encoder (1 = the reference architecture;
    # 2 = ~4× fewer encoder FLOPs, opt-in — see CNNEncoder.stride).
    encoder_stride: int = 1
    # tanh-approx GELU for the conv activations (1.84× faster config-4
    # train step; see CNNEncoder.gelu_approximate). False = erf = torch
    # parity, the default here; TrainConfig flips it to tanh.
    encoder_gelu_approximate: bool = False
    # Opt-in (beyond-reference) residual head for action_space="normals":
    # the net predicts a DELTA on the normals carried in ``aux[:, 3:]``
    # (= the ideal normals in the standard rollout, whose aux is fixed at
    # reset — env.reset obs contract, env/env.py) and the final Dense is
    # zero-initialized, so the policy starts exactly aligned
    # (action ≡ normalize(ideal)) and training capacity goes to flux
    # compensation of the unobserved mirror errors instead of re-learning
    # the sun→ideal-normals map through the head bottleneck. Same move the
    # reference's TTT variant makes with residual action accumulation and
    # ``fine_error_vec`` (train_with_env_com_trunc_advantage_ttt.py:241-270,
    # 300) — here as a head-level knob for the standard trainer. The base
    # is stop-gradient'ed (it is observation data, like the reference's
    # detached inputs, train_with_env.py:193).
    residual_head: bool = False
    # Zero-initialize the final Dense WITHOUT adding the aux base — for
    # policies whose rollout already supplies the base (the TTT rollout
    # accumulates normalize(Δ + prev_normals)): the first predicted delta
    # is then exactly zero and the rollout starts at the env's
    # init_actions instead of O(1) net noise ≈ 1300 mrad off at N=500.
    # Implied by residual_head.
    zero_init_head: bool = False

    # Submodule attribute names intentionally match the auto-generated names
    # of the original ``nn.compact`` formulation (``<ClassName>_<i>``) so the
    # parameter tree — and therefore every existing checkpoint — is
    # byte-identical to the pre-split module.
    def setup(self) -> None:
        arch = self.architecture.lower()
        if self.encoder == "cnn":
            self.CNNEncoder_0 = CNNEncoder(
                out_dim=self.enc_dim, dropout=self.dropout,
                dtype=self.encoder_dtype, stride=self.encoder_stride,
                gelu_approximate=self.encoder_gelu_approximate,
            )
        elif self.encoder == "com":
            self.COMEncoder_0 = COMEncoder(
                out_dim=self.enc_dim, dropout=self.dropout
            )
        else:
            raise ValueError(f"unknown encoder {self.encoder!r}")

        if arch == "lstm":
            self.OptimizedLSTMCell_0 = nn.OptimizedLSTMCell(self.lstm_hid)
        elif arch == "transformer":
            self.TransformerEncoderLayer = tuple(
                TransformerEncoderLayer(
                    d_model=self.enc_dim,
                    num_heads=self.transformer_heads,
                    dim_feedforward=self.transformer_ff,
                    dropout=self.dropout,
                )
                for _ in range(self.transformer_layers)
            )
        elif arch != "mlp":
            raise ValueError(f"unknown architecture {self.architecture!r}")

        self.LayerNorm_0 = nn.LayerNorm(epsilon=1e-5)  # torch default eps
        self.Dense_0 = nn.Dense(self.head_hidden)
        self.Dropout_0 = nn.Dropout(self.dropout)
        out_units = self.num_heliostats * (
            2 if self.action_space == "angles" else 3
        )
        if self.residual_head and self.action_space != "normals":
            raise ValueError(
                "residual_head requires action_space='normals' "
                "(the aux base is a normals tensor)"
            )
        self.Dense_1 = nn.Dense(
            out_units,
            **(
                {"kernel_init": nn.initializers.zeros}
                if (self.residual_head or self.zero_init_head)
                else {}
            ),
        )

    # ------------------------------------------------------------------
    def encode(
        self, frames: jax.Array, *, deterministic: bool = True
    ) -> jax.Array:
        """Per-frame encoder: ``[M, H, W]`` (or NHWC) → ``[M, enc_dim]``.

        Exposed so rollouts can encode each frame exactly once when it
        enters the history buffer instead of re-encoding all k frames per
        step. Within one rollout the params are constant and the history
        frames are stop-gradient'ed, so caching is gradient-exact.
        """
        enc_mod = (
            self.CNNEncoder_0 if self.encoder == "cnn" else self.COMEncoder_0
        )
        return enc_mod(frames, deterministic=deterministic)

    # ------------------------------------------------------------------
    def head(
        self,
        enc: jax.Array,    # [B, T, enc_dim] per-frame encodings (T = k)
        aux: jax.Array,    # [B, aux_dim]
        carry: Carry,
        *,
        deterministic: bool = True,
    ) -> tuple[jax.Array, Carry]:
        """Sequence head + output layers over pre-computed encodings."""
        arch = self.architecture.lower()
        B, T = enc.shape[:2]

        if arch == "lstm":
            new_carry = carry
            out = None
            for t in range(T):  # T is static (k ≤ ~4): unrolled at trace time
                new_carry, out = self.OptimizedLSTMCell_0(new_carry, enc[:, t])
            feat = out
        elif arch == "transformer":
            x = enc
            for layer in self.TransformerEncoderLayer:
                x = layer(x, deterministic=deterministic)
            feat = x[:, -1, :] + carry   # residual state across env steps
            new_carry = feat
        else:  # mlp (setup rejects anything else)
            feat = enc[:, -1, :]
            new_carry = ()

        h = jnp.concatenate([feat, aux], axis=-1)
        h = self.LayerNorm_0(h)
        h = self.Dense_0(h)
        h = self.Dropout_0(h, deterministic=deterministic)
        h = nn.gelu(h, approximate=False)   # erf GELU = torch default
        out = self.Dense_1(h)
        if self.action_space == "angles":
            angles = jnp.tanh(out) * self.angle_scale
            return angles.reshape(B, self.num_heliostats, 2), new_carry
        normals = out.reshape(B, self.num_heliostats, 3)
        if self.residual_head:
            base = jax.lax.stop_gradient(
                aux[:, 3 : 3 + self.num_heliostats * 3]
            ).reshape(B, self.num_heliostats, 3)
            normals = base + normals
        if self.normalize_output:
            normals = normalize(normals)
        return normals, new_carry

    # ------------------------------------------------------------------
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
        B, T = img_seq.shape[:2]
        frames = img_seq.reshape(B * T, *img_seq.shape[2:])
        enc = self.encode(frames, deterministic=deterministic)
        enc = enc.reshape(B, T, self.enc_dim)
        return self.head(enc, aux, carry, deterministic=deterministic)

    # ------------------------------------------------------------------
    def init_carry(self, batch_size: int, dtype=jnp.float32) -> Carry:
        return initial_carry(
            self.architecture, batch_size, self.lstm_hid, self.enc_dim, dtype
        )
