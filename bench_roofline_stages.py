#!/usr/bin/env python
"""Per-stage roofline breakdown (VERDICT r2 #8): which stage to optimise
next, data-driven.

Reuses bench_kernels.build() so each stage's program is EXACTLY the one the
shootout timed (and its compile is already in the persistent cache after the
shootout ran).  Reads compiled.cost_analysis() per stage and derives the
stage's speed-of-light bounds; pass --measured US_PER_CALL (from the
shootout JSON) to get the achieved fraction.

Usage: bench_roofline_stages.py KERNEL CONFIG [--measured US]
"""

import argparse
import json
import sys

import jax

sys.path.insert(0, __file__.rsplit("/", 1)[0])

import bench_kernels
from bench_kernels import CONFIGS

HBM_BW = 819e9          # B/s, TPU v5e
PEAK_BF16 = 197e12      # FLOP/s
PEAK_F32 = PEAK_BF16 / 4


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("kernel")
    p.add_argument("config", choices=sorted(CONFIGS))
    p.add_argument("--measured", type=float, default=None,
                   help="us/call from the shootout for this (kernel, config)")
    args = p.parse_args()

    cfg = CONFIGS[args.config]
    f, inputs, samples = bench_kernels.build(args.kernel, cfg)
    compiled = f.lower(*inputs).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    byts = float(ca.get("bytes accessed", 0.0))

    t_mem = byts / HBM_BW * 1e6                 # us, memory-bound floor
    t_f32 = flops / PEAK_F32 * 1e6              # us, f32 compute floor
    binding = max(t_mem, t_f32)
    out = {
        "stage": args.kernel, "config": args.config,
        "samples_per_call": samples,
        "flops": flops, "bytes_accessed": byts,
        "arith_intensity": round(flops / byts, 2) if byts else None,
        "sol_us_memory": round(t_mem, 1),
        "sol_us_compute_f32": round(t_f32, 1),
        "binding_bound": "memory" if t_mem > t_f32 else "compute(f32)",
        "binding_sol_us": round(binding, 1),
        "backend": jax.default_backend(),
    }
    if args.measured:
        out["measured_us"] = args.measured
        out["fraction_of_sol"] = round(binding / args.measured, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
