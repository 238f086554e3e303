"""Short end-to-end train smoke on the current backend (TPU when available).

Run from the repo root: ``timeout 900 python scripts/verify_train.py``.
30 quickstart-geometry steps through the full train_and_eval path;
asserts a finite best-test-mse. This is the verify-skill drive for
trainer changes, kept in-repo so it is not re-invented each time.
"""
import sys
sys.path.insert(0, ".")  # runnable as `python scripts/verify_train.py` from the repo root

import time, numpy as np, jax
from doodle_tpu.train import TrainConfig, train_and_eval

print("devices:", jax.devices())
cfg = TrainConfig(
    num_heliostats=50, batch_size=25, num_batches=1, steps=30, T=4, k=4,
    resolution=128, error_scale_mrad=90.0,
    alignment_pretrain_steps=20, warmup_steps=2,
    lr=2e-4, grad_clip=1.0, scheduler="none",
    eval_every=10, log_every=10, dropout=0.1,
)
t0 = time.time()
best = train_and_eval(cfg)
print(f"wall {time.time()-t0:.0f}s best_test_mse={best:.3e}")
assert best is not None and np.isfinite(best)
print("VERIFY TRAIN OK")
