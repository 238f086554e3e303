"""Training loops: scan-based rollouts and the reference trainer family.

* :mod:`rollout`  — the k-frame-history policy rollout as a ``lax.scan``
  (reference ``train_with_env.py:171-216``);
* :mod:`trainer`  — ``train_and_eval``: batched envs, AdamP + schedulers,
  alignment-pretrain → boundary-warmup → blended mse/dist loss schedule
  (reference ``train_with_env.py:219-498``);
* :mod:`ttt`      — the truncated-advantage + test-time-compute variant
  (reference ``train_with_env_com_trunc_advantage_ttt.py``).
"""

from .rollout import RolloutResult, rollout
from .trainer import TrainConfig, train_and_eval
from .ttt import TTTConfig, TTTRolloutResult, ttt_rollout, ttt_train_and_eval

__all__ = [
    "rollout",
    "RolloutResult",
    "TrainConfig",
    "train_and_eval",
    "ttt_rollout",
    "TTTRolloutResult",
    "TTTConfig",
    "ttt_train_and_eval",
]
