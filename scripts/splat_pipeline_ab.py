"""A/B the r4 splat forward variants at config 4 (VERDICT r3 item 2).

Variants (ops/splat_pallas.py TUNE["fwd"]):
  base      r3 fast kernel (VPU broadcast-FMA args + exp2, 2-D grid)
  mxu       MXU-built args (K=3 matmul), VPU keeps only exp2, 2-D grid
  pipe      mxu + 1-D flattened grid with double-buffered bf16 table
            scratch: chunk s's build overlaps chunk s−1's contraction

Measures the full env step (bench.py methodology — distinct actions per
rep via lax.scan, fetch-synced, two-rep-count slope) at N=500/256²/B=128,
which is the driver headline, plus N=2000/B=64 (config-5 scale). One
process, variants interleaved back-to-back per CLAUDE.md's ±7% chip-
variance rule. Writes results/splat_pipeline_ab.json.

Run on the TPU: `timeout 2400 python scripts/splat_pipeline_ab.py`.
"""
from __future__ import annotations

import json
import pathlib
import sys

sys.path.insert(0, ".")

import numpy as np

import bench
from doodle_tpu.ops import splat_pallas as sp

VARIANTS = {
    "base": dict(mxu_args=False, pipeline=False),
    "mxu": dict(mxu_args=True, pipeline=False),
    "pipe": dict(mxu_args=True, pipeline=True),
    # VPU-FMA build + cross-step pipeline: the build the MXU dot can
    # actually overlap (the mxu_args build queues on the MXU itself).
    "pipe_fma": dict(mxu_args=False, pipeline=True),
}

CONFIGS = {
    "n500_res256_b128": dict(num_heliostats=500, resolution=256,
                             batch_size=128, use_error_mask=True),
    "n2000_res256_b64": dict(num_heliostats=2000, resolution=256,
                             batch_size=64, use_error_mask=True),
}


def main():
    out = {}
    for cname, ckw in CONFIGS.items():
        rows = {}
        for vname, flags in VARIANTS.items():
            sp.TUNE["fwd"].update(flags)
            try:
                rate, dt, raw = bench.bench_device_rate(
                    **ckw, splat_backend="pallas"
                )
                rows[vname] = {"env_steps_per_s": round(rate, 1),
                               "step_ms": round(dt * 1e3, 4),
                               "raw_totals_ms": raw}
                print(f"{cname} {vname}: {dt*1e3:.4f} ms/step "
                      f"({rate:,.0f} env-steps/s)", flush=True)
            except Exception as e:
                rows[vname] = {"error": f"{type(e).__name__}: "
                               f"{str(e).splitlines()[0][:200]}"}
                print(f"{cname} {vname}: FAILED {type(e).__name__}: "
                      f"{str(e).splitlines()[0][:200]}", flush=True)
            out[cname] = rows
            pathlib.Path("results/splat_pipeline_ab.json").write_text(
                json.dumps(out, indent=1) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
