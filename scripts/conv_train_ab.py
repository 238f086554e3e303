"""A/B the r4 conv-backward levers on the FULL config-4 train step.

Variants (cumulative story, each an independently compiled program timed
with the bench.py methodology at N=500/256²/B=64/k=2/T=4, bf16 encoder,
"full" loss preset — the exact `train_config4` bench program):

  baseline    r3 lowering (XLA conv fwd/dgrad/wgrad, full remat)
  conv_last   selective remat: keep conv3's output per frame — the
              backward skips the 80%-of-FLOPs conv3 recompute
  convs       keep all three conv outputs (elementwise-only recompute)
  pallas      in-VMEM im2col matmul kernels for fwd+dgrad+wgrad
  pallas_last pallas + conv_last

Writes results/conv_train_ab.json incrementally.
Run on the TPU: `timeout 7200 python scripts/conv_train_ab.py`.
"""
from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, ".")

import bench
from doodle_tpu.ops import conv5x5 as c5

SHAPE = dict(num_heliostats=500, resolution=256, batch_size=64, k=2, T=4,
             use_error_mask=True, encoder_dtype="bfloat16",
             loss_preset="full")

VARIANTS = {
    # r3-equivalent: bypass the custom vjp entirely (plain conv + XLA
    # autodiff), to attribute the baseline shift.
    "r3_autodiff": (dict(fwd="xla", dgrad="flip", wgrad="xla"), "none"),
    "baseline": (dict(fwd="xla", dgrad="flip", wgrad="xla"), "none"),
    "conv_last": (dict(fwd="xla", dgrad="flip", wgrad="xla"), "conv_last"),
    "convs": (dict(fwd="xla", dgrad="flip", wgrad="xla"), "convs"),
}


def main():
    out = {}
    path = pathlib.Path("results/conv_train_ab.json")
    if path.exists():
        out = json.loads(path.read_text())
    for name, (tune, remat_save) in VARIANTS.items():
        if name in out and "step_ms" in out[name]:
            continue
        import doodle_tpu.models.encoders as enc_mod
        if name == "r3_autodiff":
            enc_mod.conv5x5 = c5._conv          # plain XLA autodiff
        else:
            enc_mod.conv5x5 = c5.conv5x5
        c5.TUNE.update(tune)
        t0 = time.time()
        try:
            rate, dt, flops = bench.bench_train_rate(
                **SHAPE, remat_save=remat_save
            )
            out[name] = {"step_ms": round(dt * 1e3, 1),
                         "steps_per_s": round(rate, 2),
                         "flops_per_step": flops,
                         "wall_s": round(time.time() - t0, 0)}
            if flops:
                out[name]["tflops_per_s"] = round(flops * rate / 1e12, 1)
            print(name, json.dumps(out[name]), flush=True)
        except Exception as e:
            out[name] = {"error": f"{type(e).__name__}: "
                         f"{str(e).splitlines()[0][:200]}",
                         "wall_s": round(time.time() - t0, 0)}
            print(name, "FAILED", out[name]["error"], flush=True)
        path.write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
