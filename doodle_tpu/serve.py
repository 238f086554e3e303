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
        # deterministic=True: no dropout at serve time. The recurrent
        # carry is DONATED: the contract of every control call is
        # state-in → state-out (docstrings below), so the old carry's
        # device buffer is dead the moment the call returns — donation
        # lets XLA write the new carry in place instead of allocating a
        # fresh buffer per step of a long-running control loop.
        self._apply = jax.jit(
            lambda params, img, aux, carry: self.policy.apply(
                params, img, aux, carry, deterministic=True
            ),
            donate_argnums=(3,),
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
            ),
            donate_argnums=(3,),
        )

        # Fused streaming step: history roll + insert + head in ONE
        # dispatch (matters behind a ~30 ms remote-attach RTT), with the
        # dead enc-history and carry buffers donated.
        def _stream_step(params, e, enc_hist, aux, carry):
            enc_hist = jnp.roll(enc_hist, -1, axis=1).at[:, -1].set(e)
            action, carry = self.policy.apply(
                params, enc_hist, aux, carry, deterministic=True,
                method="head",
            )
            return action, enc_hist, carry

        self._stream_step = jax.jit(_stream_step, donate_argnums=(2, 4))

    # ------------------------------------------------------------------
    @classmethod
    def from_checkpoint(
        cls,
        checkpoint_dir: str,
        num_heliostats: int | None = None,
        batch_size: int | None = None,
        policy_kwargs: dict | None = None,
    ) -> "InferenceSession":
        """Restore ``{checkpoint_dir}/latest`` as written by the trainers.

        Trainer checkpoints are self-describing (``latest_meta.json``
        sidecar, utils.checkpoint): the training-time policy architecture
        and batch size are reconstructed automatically — pass nothing but
        the directory. Explicit arguments override the sidecar (e.g. a
        different serving batch size); for pre-sidecar checkpoints
        ``num_heliostats``/``batch_size``/``policy_kwargs`` must be given
        and must match the training-time knobs.
        """
        from .utils.checkpoint import load_meta, restore_checkpoint

        meta = load_meta(f"{checkpoint_dir}/latest") or {}
        kwargs = dict(meta.get("policy") or {})
        if num_heliostats is not None:
            kwargs["num_heliostats"] = num_heliostats
        kwargs.update(policy_kwargs or {})
        if "num_heliostats" not in kwargs:
            raise ValueError(
                "checkpoint has no meta sidecar; pass num_heliostats "
                "(and policy_kwargs matching training time)"
            )
        if batch_size is None:
            batch_size = meta.get("batch_size")
            if batch_size is None:
                raise ValueError(
                    "checkpoint has no meta sidecar; pass batch_size"
                )
        policy = PolicyNet(**kwargs)
        # Restore the full trainer checkpoint as saved and keep only the
        # params subtree (the optimizer state is irrelevant at serve time).
        raw = restore_checkpoint(f"{checkpoint_dir}/latest")
        params = jax.tree.map(jnp.asarray, raw["params"])
        return cls(policy=policy, params=params, batch_size=int(batch_size))

    # ------------------------------------------------------------------
    def init_carry(self):
        return self.policy.init_carry(self.batch_size)

    def control(self, img_history, aux, carry):
        """One control step: ``([B, k, res, res], [B, aux], carry) →
        (action, carry)`` where the action is ``[B, N, 3]`` unit normals,
        or ``[B, N, 2]`` E/U mrad rotations for a policy built with
        ``policy_kwargs={"action_space": "angles"}``. The passed ``carry``
        is donated — use the returned carry, never the old one."""
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
        then the head runs over the carried encodings. The passed
        ``stream_state``'s buffers are donated — use the returned state,
        never the old one."""
        enc_hist, carry = stream_state
        e = self._encode(self.params, jnp.asarray(img))
        action, enc_hist, carry = self._stream_step(
            self.params, e, enc_hist, jnp.asarray(aux), carry
        )
        return action, (enc_hist, carry)
