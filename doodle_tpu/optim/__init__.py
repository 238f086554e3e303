"""Optimizers and LR schedules.

The reference trains with third-party AdamP (``train_with_env.py:19,293``)
plus torch schedulers, and carries two research optimizers
(``newenv/smooth_adam_opt.py``, ``newenv/dom_adam_optimizer.py``). Here each
becomes an optax-composable piece:

* :func:`adamp` — AdamP (Adam + projection of the update off the radial
  direction for scale-invariant weights) as a GradientTransformation;
* :func:`smoothed_value_and_grad` — the Monte-Carlo smoothed-surrogate
  gradient estimator behind SmoothedAdam (compose with any optimizer);
  :func:`smoothed_adam` bundles it with the reference's clip + Adam update;
* :func:`dominant_grad` / :func:`dominant_adam` — multi-objective
  largest-gradient selection (DomAdam/ADom);
* schedules: :func:`piecewise_constant_schedule`, :func:`cyclic_lr`,
  :func:`exponential_decay`, and the plateau transform
  :func:`reduce_on_plateau`.
"""

from .adamp import adamp
from .dominant import dominant_adam, dominant_grad
from .schedules import (
    PiecewiseConstantLR,
    cyclic_lr,
    exponential_decay,
    piecewise_constant_schedule,
    reduce_on_plateau,
)
from .smoothed import smoothed_adam, smoothed_value_and_grad

__all__ = [
    "adamp",
    "smoothed_value_and_grad",
    "smoothed_adam",
    "dominant_grad",
    "dominant_adam",
    "piecewise_constant_schedule",
    "PiecewiseConstantLR",
    "cyclic_lr",
    "exponential_decay",
    "reduce_on_plateau",
]
