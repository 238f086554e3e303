"""Config-4 at its TRUE batch (B=128): the memory/remat operating point.

BASELINE config 4 is B=128 suns; bench.py trains at B=64 because
`remat_save="convs"` keeps ~9.4 GB of conv outputs at B=64 and doubling
the batch would not fit the 15.75 GB HBM. This measures the actual
choices a user has at B=128 — lighter remat policies trading recompute
for memory — and compares per-sun throughput against the shipped
B=64/convs point. bench_train_rate methodology verbatim.

Run: `timeout 4800 python scripts/config4_b128_point.py`.
Writes results/config4_b128_point.json.
"""
from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, ".")

import bench

OUT = pathlib.Path("results/config4_b128_point.json")

PLAN = [
    ("b64_convs", dict(batch_size=64, remat_save="convs")),     # shipped
    ("b128_none", dict(batch_size=128, remat_save="none")),
    ("b128_conv_last", dict(batch_size=128, remat_save="conv_last")),
    ("b128_convs", dict(batch_size=128, remat_save="convs")),   # expect OOM
]


def main():
    out = {}
    if OUT.exists():
        out = json.loads(OUT.read_text())
    for name, kw in PLAN:
        if name in out:
            continue
        t0 = time.time()
        try:
            rate, dt, flops = bench.bench_train_rate(
                num_heliostats=500, resolution=256, k=2, T=4,
                use_error_mask=True, encoder_dtype="bfloat16",
                loss_preset="full", **kw,
            )
            B = kw["batch_size"]
            out[name] = {
                "step_ms": round(dt * 1e3, 1),
                "suns_per_s": round(B / dt, 1),
                "tflops_per_s": round(flops / dt / 1e12, 1) if flops else None,
            }
            print(name, json.dumps(out[name]),
                  f"[{time.time()-t0:.0f}s]", flush=True)
        except Exception as e:
            first = str(e).splitlines()[0][:200]
            out[name] = {"error": f"{type(e).__name__}: {first}"}
            print(name, "FAILED:", out[name]["error"][:120], flush=True)
        OUT.write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
