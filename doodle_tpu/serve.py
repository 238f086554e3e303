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
