"""Learning-rate schedules.

Optax-schedule counterparts of the reference's LR machinery:
``PiecewiseConstantLR`` (``piecewise_constant_lr.py:8-151``), torch
``CyclicLR``'s three modes and ``ExponentialLR``
(``train_with_env.py:294-301``), and ``ReduceLROnPlateau`` (via the optax
contrib transform, which threads the metric through ``update``).
"""

from __future__ import annotations

import bisect
from typing import Dict, Sequence

import jax.numpy as jnp
import optax
from optax import contrib as _contrib

__all__ = [
    "piecewise_constant_schedule",
    "PiecewiseConstantLR",
    "cyclic_lr",
    "exponential_decay",
    "reduce_on_plateau",
]


def piecewise_constant_schedule(
    boundaries: Sequence[int], values: Sequence[float]
) -> optax.Schedule:
    """Absolute-valued piecewise-constant schedule.

    ``lr(step) = values[bisect_right(boundaries, step)]`` — the reference's
    bisect lookup (``piecewise_constant_lr.py:85-118``), with
    ``len(values) == len(boundaries) + 1``. Unlike
    ``optax.piecewise_constant_schedule`` (multiplicative factors), values
    here are absolute LRs, matching the reference API.
    """
    if len(values) != len(boundaries) + 1:
        raise ValueError(
            f"need len(values) == len(boundaries) + 1, got "
            f"{len(values)} vs {len(boundaries)}"
        )
    if list(boundaries) != sorted(boundaries):
        raise ValueError("boundaries must be sorted")
    b = jnp.asarray(boundaries, jnp.int32)
    v = jnp.asarray(values, jnp.float32)

    def schedule(count):
        return v[jnp.searchsorted(b, count, side="right")]

    return schedule


class PiecewiseConstantLR:
    """Stateful, mutable piecewise-constant LR scheduler.

    Host-side counterpart of the reference's ``PiecewiseConstantLR``
    (``piecewise_constant_lr.py:8-151``): a ``{start_step: lr}`` schedule
    where the active LR is the value of the last milestone whose
    ``start_step <= current_step`` (bisect lookup, ref ``:85-92``), the
    initial ``base_lr`` applies before the first milestone (ref ``:102-108``),
    milestones can be added or updated mid-training via :meth:`set_milestone`
    (ref ``:121-141``), and the full schedule round-trips through
    :meth:`state_dict`/:meth:`load_state_dict` (ref ``:68-83``).

    Deltas from the torch original, both JAX-idiomatic: values are scalars
    (optax injects one ``learning_rate`` hyperparam; torch's per-param-group
    LR lists have no counterpart here), and stepping is explicit — call
    :meth:`step` once per optimizer step and write the returned LR into
    ``opt_state.hyperparams["learning_rate"]``, the same host-side idiom the
    trainer uses for its plateau/cyclic schedulers. The static (jit-friendly)
    variant is :func:`piecewise_constant_schedule`; this class exists for the
    mutable/resumable use the reference designed for.
    """

    def __init__(self, base_lr: float, schedule: Dict[int, float],
                 last_step: int = -1) -> None:
        if not schedule:
            raise ValueError("`schedule` must not be empty.")
        if any(s < 0 for s in schedule):
            raise ValueError("Milestone steps must be >= 0.")
        items = sorted(schedule.items())
        self.base_lr = float(base_lr)
        self.milestone_steps = [int(k) for k, _ in items]
        self.milestone_lrs = [float(v) for _, v in items]
        self.last_step = int(last_step)

    # -- lookup ------------------------------------------------------------
    def _idx_for_step(self, step: int) -> int:
        """Greatest i with milestone_steps[i] <= step, or -1 (use base_lr)."""
        return bisect.bisect_right(self.milestone_steps, step) - 1

    def lr_at(self, step: int) -> float:
        idx = self._idx_for_step(step)
        return self.base_lr if idx < 0 else self.milestone_lrs[idx]

    @property
    def lr(self) -> float:
        """The LR active at the current step."""
        return self.lr_at(self.last_step)

    def step(self) -> float:
        """Advance one optimizer step; returns the now-active LR."""
        self.last_step += 1
        return self.lr

    @property
    def next_change_step(self) -> int | None:
        """Next step at which the LR changes, or None (ref ``:143-151``)."""
        j = self._idx_for_step(self.last_step) + 1
        if j < len(self.milestone_steps):
            return self.milestone_steps[j]
        return None

    # -- mutation ----------------------------------------------------------
    def set_milestone(self, start_step: int, lr: float) -> None:
        """Add or update a milestone during training (ref ``:121-141``)."""
        if start_step < 0:
            raise ValueError("start_step must be >= 0.")
        pos = bisect.bisect_left(self.milestone_steps, start_step)
        if (pos < len(self.milestone_steps)
                and self.milestone_steps[pos] == start_step):
            self.milestone_lrs[pos] = float(lr)
        else:
            self.milestone_steps.insert(pos, int(start_step))
            self.milestone_lrs.insert(pos, float(lr))

    # -- persistence -------------------------------------------------------
    def state_dict(self) -> dict:
        return {
            "base_lr": self.base_lr,
            "milestone_steps": list(self.milestone_steps),
            "milestone_lrs": list(self.milestone_lrs),
            "last_step": self.last_step,
        }

    def load_state_dict(self, state: dict) -> None:
        self.base_lr = float(state["base_lr"])
        self.milestone_steps = [int(s) for s in state["milestone_steps"]]
        self.milestone_lrs = [float(v) for v in state["milestone_lrs"]]
        self.last_step = int(state["last_step"])

    @classmethod
    def parse(cls, base_lr: float, spec: str) -> "PiecewiseConstantLR":
        """Build from a CLI spec string ``"step:lr,step:lr,..."`` —
        e.g. ``"0:3e-4,10000:1e-4,50000:3e-5"`` (the reference docstring's
        example schedule, ``piecewise_constant_lr.py:26``)."""
        schedule: Dict[int, float] = {}
        for part in spec.split(","):
            part = part.strip()
            if not part:
                continue
            step_s, _, lr_s = part.partition(":")
            schedule[int(step_s)] = float(lr_s)
        return cls(base_lr, schedule)


def cyclic_lr(
    base_lr: float,
    max_lr: float,
    step_size_up: int = 2000,
    step_size_down: int | None = None,
    mode: str = "triangular",
    gamma: float = 1.0,
) -> optax.Schedule:
    """torch ``CyclicLR``-compatible schedule: triangular wave between
    ``base_lr`` and ``max_lr`` with per-cycle halving (``triangular2``) or
    per-step exponential shrink (``exp_range``) of the amplitude."""
    if mode not in ("triangular", "triangular2", "exp_range"):
        raise ValueError(f"unknown cyclic mode {mode!r}")
    down = step_size_up if step_size_down is None else step_size_down
    total = step_size_up + down

    def schedule(count):
        count = jnp.asarray(count, jnp.float32)
        cycle = jnp.floor(count / total)
        pos = count - cycle * total
        # rise 0→1 over step_size_up, fall 1→0 over step_size_down
        frac = jnp.where(
            pos < step_size_up, pos / step_size_up, 1.0 - (pos - step_size_up) / down
        )
        amp = max_lr - base_lr
        if mode == "triangular2":
            amp = amp / (2.0**cycle)
        elif mode == "exp_range":
            amp = amp * gamma**count
        return base_lr + amp * frac

    return schedule


def exponential_decay(init_value: float, decay_rate: float) -> optax.Schedule:
    """torch ``ExponentialLR``: ``lr(step) = init * decay_rate**step``."""
    return optax.exponential_decay(
        init_value=init_value, transition_steps=1, decay_rate=decay_rate
    )


def reduce_on_plateau(
    factor: float = 0.5,
    patience: int = 10,
    rtol: float = 1e-4,
    atol: float = 0.0,
    cooldown: int = 0,
    min_scale: float = 0.0,
    accumulation_size: int = 1,
):
    """``ReduceLROnPlateau`` as an optax transform (append to the optimizer
    chain; pass ``value=<metric>`` as an extra arg to ``update``). Thin wrapper
    over ``optax.contrib.reduce_on_plateau`` pinned here so trainers import
    every schedule from one place."""
    return _contrib.reduce_on_plateau(
        factor=factor,
        patience=patience,
        rtol=rtol,
        atol=atol,
        cooldown=cooldown,
        min_scale=min_scale,
        accumulation_size=accumulation_size,
    )
