"""Inference/serving: load a trained policy and run it as a closed-loop
controller with zero per-call Python overhead beyond dispatch.

The reference has no deployment story (training scripts only); this module
is the production-facing counterpart of the trainers: restore a checkpoint,
pre-compile one control-step function, and serve
``flux images → mirror-normal commands`` with the recurrent state held
explicitly by the caller (so one session can interleave many independent
plants by keeping one carry per plant).

    session = InferenceSession.from_checkpoint(ckpt_dir, num_heliostats=50,
                                               batch_size=25,
                                               policy_kwargs=...)
    carry = session.init_carry()
    normals, carry = session.control(img_history, aux, carry)
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from .models.policy import PolicyNet

__all__ = ["InferenceSession"]


@dataclasses.dataclass
class InferenceSession:
    """Pre-jitted policy inference with explicit recurrent state."""

    policy: PolicyNet
    params: Any
    batch_size: int

    def __post_init__(self) -> None:
        # deterministic=True: no dropout at serve time.
        self._apply = jax.jit(
            lambda params, img, aux, carry: self.policy.apply(
                params, img, aux, carry, deterministic=True
            )
        )
        # Incremental path: per-frame encoder + sequence head split, so a
        # streaming control loop encodes each new flux image once instead of
        # re-encoding the whole k-history every step (k× fewer CNN FLOPs —
        # the encoder is ~99% of policy compute).
        self._encode = jax.jit(
            lambda params, img: self.policy.apply(
                params, img, deterministic=True, method="encode"
            )
        )
        self._head = jax.jit(
            lambda params, enc, aux, carry: self.policy.apply(
                params, enc, aux, carry, deterministic=True, method="head"
            )
        )

    # ------------------------------------------------------------------
    @classmethod
    def from_checkpoint(
        cls,
        checkpoint_dir: str,
        num_heliostats: int,
        batch_size: int,
        policy_kwargs: dict | None = None,
    ) -> "InferenceSession":
        """Restore ``{checkpoint_dir}/latest`` as written by the trainers.

        ``policy_kwargs`` must match the training-time architecture knobs
        (architecture, enc_dim, lstm_hid, …).
        """
        from .utils.checkpoint import restore_checkpoint

        policy = PolicyNet(num_heliostats=num_heliostats,
                           **(policy_kwargs or {}))
        # Restore the full trainer checkpoint as saved and keep only the
        # params subtree (the optimizer state is irrelevant at serve time).
        raw = restore_checkpoint(f"{checkpoint_dir}/latest")
        params = jax.tree.map(jnp.asarray, raw["params"])
        return cls(policy=policy, params=params, batch_size=batch_size)

    # ------------------------------------------------------------------
    def init_carry(self):
        return self.policy.init_carry(self.batch_size)

    def control(self, img_history, aux, carry):
        """One control step: ``([B, k, res, res], [B, aux], carry) →
        (action, carry)`` where the action is ``[B, N, 3]`` unit normals,
        or ``[B, N, 2]`` E/U mrad rotations for a policy built with
        ``policy_kwargs={"action_space": "angles"}``."""
        return self._apply(
            self.params, jnp.asarray(img_history), jnp.asarray(aux), carry
        )

    # ------------------------------------------------------------------
    # Streaming control: encode each incoming frame once and carry the
    # [B, k, enc_dim] encodings, instead of shipping + re-encoding the full
    # raw k-frame history every call. Identical outputs to :meth:`control`
    # fed the equivalent history (deterministic policy, constant params).
    def init_stream(self, k: int, resolution: int):
        """Stream state for :meth:`control_stream`: encodings of the k-1
        zero frames the rollout convention seeds the history with, plus the
        recurrent carry."""
        e_zero = self._encode(
            self.params, jnp.zeros((1, resolution, resolution))
        )
        enc_hist = jnp.broadcast_to(
            e_zero[:, None, :], (self.batch_size, k, e_zero.shape[-1])
        )
        return enc_hist, self.init_carry()

    def control_stream(self, img, aux, stream_state):
        """One streaming control step: ``([B, res, res], [B, aux], state) →
        (action, state)``. The new frame enters the history (last slot),
        then the head runs over the carried encodings."""
        enc_hist, carry = stream_state
        e = self._encode(self.params, jnp.asarray(img))
        enc_hist = jnp.roll(enc_hist, -1, axis=1).at[:, -1].set(e)
        action, carry = self._head(
            self.params, enc_hist, jnp.asarray(aux), carry
        )
        return action, (enc_hist, carry)
