"""Learning-rate schedules.

Optax-schedule counterparts of the reference's LR machinery:
``PiecewiseConstantLR`` (``piecewise_constant_lr.py:8-151``), torch
``CyclicLR``'s three modes and ``ExponentialLR``
(``train_with_env.py:294-301``), and ``ReduceLROnPlateau`` (via the optax
contrib transform, which threads the metric through ``update``).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import optax
from optax import contrib as _contrib

__all__ = [
    "piecewise_constant_schedule",
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
