"""A/B: config-4 train-step time, erf GELU vs tanh-approx.

Run from the repo root (``python scripts/gelu_ab.py``) on a quiet TPU.
This is the probe behind the 1548.6 → 843.1 ms/step finding in
results/RESULTS.md ("erf-GELU regression"); the shipped resolution is the
``TrainConfig.encoder_gelu`` knob (production default "tanh", parity
default erf at the model level). The monkeypatch below predates that knob
and is kept verbatim so the measurement stays reproducible.
"""
import sys
import time
import numpy as np

sys.path.insert(0, ".")  # run from the repo root (CLAUDE.md)
import bench

t0=time.time()
rate, dt = bench.bench_train_rate(500, 256, 64, k=2, T=4, use_error_mask=True,
                                  encoder_dtype="bfloat16", loss_preset="full")
print(f"erf gelu: {dt*1e3:.1f} ms/step ({time.time()-t0:.0f}s)", flush=True)

# monkeypatch flax gelu back to tanh approximation
import flax.linen as nn
import jax
orig = nn.gelu
import doodle_tpu.models.encoders as enc_mod
import doodle_tpu.models.policy as pol_mod
def tanh_gelu(x, approximate=True):
    return jax.nn.gelu(x, approximate=True)
enc_mod.nn.gelu = tanh_gelu
pol_mod.nn.gelu = tanh_gelu

t0=time.time()
rate, dt = bench.bench_train_rate(500, 256, 64, k=2, T=4, use_error_mask=True,
                                  encoder_dtype="bfloat16", loss_preset="full")
print(f"tanh gelu: {dt*1e3:.1f} ms/step ({time.time()-t0:.0f}s)", flush=True)
