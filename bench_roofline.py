#!/usr/bin/env python
"""Roofline accounting for the full-chain benchmark (VERDICT r1 weak #1).

Compiles the exact program bench.py times — chain_batch with the SAME
BENCH_SYNC_PATH / BENCH_EQ_PATH / BENCH_TX_PATH selections — and reads
XLA's own cost model (compiled.cost_analysis(): algorithmic flops + bytes
accessed), then derives per-sample costs and speed-of-light bounds:

  memory-bound  SoL = HBM_BW / bytes_per_sample
  compute-bound SoL = peak_FLOPS / flops_per_sample

Chip peaks (TPU v5e / "v5 lite", public figures): 197 TFLOP/s bf16 MXU,
819 GB/s HBM.  The chain is complex64 (f32 pairs); f32 matmul throughput on
the MXU is ~1/4 of bf16 (multi-pass decomposition), so both compute bounds
are printed and the f32 one is the honest ceiling for this un-quantised
pipeline.

--update-constants (VERDICT r4 #6): writes flops_per_sample + a fingerprint
of (config fields, path selections, package sources) into
bench_constants.json, which bench.py validates at run time.  Run this ON
THE TPU BACKEND (the cost model reads the TPU lowering — FFTs become
DFT-style matmuls there); it only compiles, never fetches, so it is
tunnel-safe.

Usage: bench_roofline.py [config] [--measured MSPS] [--update-constants]
"""

import argparse
import functools
import json
import os
import sys

import numpy as np

import jax

if os.environ.get("BENCH_CPU"):
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, __file__.rsplit("/", 1)[0])

from bench import CONSTANTS_PATH, bound_fingerprint, chain_batch, env_paths
from lte_gnu_radio_code_tpu.models import rxofdm
from lte_gnu_radio_code_tpu.ops import channel as chan_ops
from lte_gnu_radio_code_tpu.utils.params import GOLDEN64, LTE1024, LTE2048

HBM_BW = 819e9          # B/s, TPU v5e
PEAK_BF16 = 197e12      # FLOP/s
PEAK_F32 = PEAK_BF16 / 4


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("config", nargs="?", default="loopback64",
                   choices=["loopback64", "lte1024", "lte2048"])
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--measured", type=float, default=None,
                   help="Msamples/s/chip from bench.py for this config")
    p.add_argument("--update-constants", action="store_true",
                   help="write flops_per_sample + fingerprint into "
                        "bench_constants.json")
    args = p.parse_args()

    cfg = {"loopback64": GOLDEN64, "lte1024": LTE1024,
           "lte2048": LTE2048}[args.config]
    sync_env, eq_env, tx_env = env_paths()
    fast = {"ifft": "ifft", "conv": True, "pallas": "pallas",
            "exact": False}[sync_env]
    eq = None if eq_env == "xla" else eq_env
    tx_path = None if tx_env == "xla" else tx_env

    n_samples = cfg.frame_len + cfg.nfft - 1
    n_trials, num_patterns = rxofdm.plan_rx(cfg, n_samples)
    h = chan_ops.channel_taps("Fading")
    step = jax.jit(functools.partial(
        chain_batch, cfg, h, n_trials, num_patterns, fast=fast, eq=eq,
        tx_path=tx_path))

    rng = np.random.default_rng(0)
    import jax.numpy as jnp
    bits = jnp.asarray(rng.integers(0, 2, (args.batch, cfg.num_bits),
                                    dtype=np.int32))
    seeds = jnp.arange(args.batch, dtype=jnp.int32)
    compiled = step.lower(bits, seeds).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):                      # older jax returns [dict]
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    byts = float(ca.get("bytes accessed", 0.0))
    total_samples = args.batch * n_samples

    fps = flops / total_samples
    bps = byts / total_samples
    sol_mem = HBM_BW / bps / 1e6 if bps else float("inf")
    sol_f32 = PEAK_F32 / fps / 1e6 if fps else float("inf")
    sol_bf16 = PEAK_BF16 / fps / 1e6 if fps else float("inf")
    out = {
        "metric": f"roofline, full chain, {args.config} (batch {args.batch})",
        "flops_per_sample": round(fps, 1),
        "bytes_per_sample_prefusion": round(bps, 1),
        # cost-model bytes count every intermediate as HBM traffic (XLA
        # fuses most of them into VMEM/registers), so the memory bound is a
        # gross under-estimate — reported for reproducibility, NOT binding.
        "sol_memory_msps_prefusion_lower_bound": round(sol_mem, 1),
        "sol_compute_f32_msps": round(sol_f32, 1),
        "sol_compute_bf16_msps": round(sol_bf16, 1),
        "sync_path": sync_env, "eq_path": eq_env, "tx_path": tx_env,
        "backend": jax.default_backend(),
    }
    if args.measured:
        out["measured_msps"] = args.measured
        # fraction vs the bf16 compute bound — the honest per-dispatch
        # ceiling on v5e (f32 matmuls/convs lower to bf16-multiply,
        # f32-accumulate at DEFAULT precision); >1.0 means the measurement
        # is a dispatch rate, not a compute rate (BASELINE.md integrity)
        out["fraction_of_bf16_compute_sol"] = round(args.measured / sol_bf16, 3)
        out["consistent"] = bool(args.measured <= sol_bf16 * 1.1)
    print(json.dumps(out), flush=True)

    if args.update_constants:
        try:
            with open(CONSTANTS_PATH) as f:
                consts = json.load(f)
        except FileNotFoundError:
            consts = {}
        entry = consts.setdefault(args.config, {})
        fp = bound_fingerprint(cfg, sync_env, eq_env, tx_env)
        if (sync_env, eq_env, tx_env) == ("pallas", "pallas", "pallas"):
            # the default-path view the sibling harnesses read
            entry["flops_per_sample"] = round(fps, 1)
            entry["bound_fingerprint"] = fp
            entry["bound_backend"] = jax.default_backend()
            entry["bound_batch"] = args.batch
        entry.setdefault("bounds", {})[fp] = {
            "flops_per_sample": round(fps, 1),
            "sync_path": sync_env, "eq_path": eq_env, "tx_path": tx_env,
            "backend": jax.default_backend(), "batch": args.batch}
        with open(CONSTANTS_PATH, "w") as f:
            json.dump(consts, f, indent=1, sort_keys=True)
        print(json.dumps({"updated": CONSTANTS_PATH,
                          "config": args.config,
                          "flops_per_sample": round(fps, 1)}), flush=True)


if __name__ == "__main__":
    main()
