#!/usr/bin/env python
"""CPU-oracle throughput per config (VERDICT r2 #6).

Times reference_cpu.golden.run_chain — the literal NumPy replication of the
reference signal chain (gr-RXOFDM/python/synch_and_chan_est.py work() math) —
for each benchmark config, so every TPU Msamples/s number has an honest
same-machine denominator instead of reusing the loopback64-only 1.01 Msps.

Pure NumPy: safe to run alongside nothing else on CPU; never touches the TPU.
Prints one JSON line per config: {"config":..., "oracle_msps":..., "reps":...}.

--update-constants (VERDICT r4 #6): additionally writes the measured
oracle_msps + a fingerprint of the config fields and the reference_cpu
sources into bench_constants.json, the generated file bench.py validates at
run time (no hand-pasted integrity numbers).
"""

import json
import os
import sys
import time

# Never grab the TPU tunnel: the axon site hook overrides JAX_PLATFORMS, so
# the env var alone is decoration — flip the config flag too, in case any
# import below ever transitively pulls in jax (golden.py is pure NumPy today).
os.environ.setdefault("JAX_PLATFORMS", "cpu")
try:
    import jax
    jax.config.update("jax_platforms", "cpu")
except ImportError:
    pass

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 1)[0])

from lte_gnu_radio_code_tpu.reference_cpu import golden
from lte_gnu_radio_code_tpu.utils.params import GOLDEN64, LTE1024, LTE2048


def _update_constants(name, cfg, oracle_msps):
    from bench import CONSTANTS_PATH, oracle_fingerprint
    try:
        with open(CONSTANTS_PATH) as f:
            consts = json.load(f)
    except FileNotFoundError:
        consts = {}
    entry = consts.setdefault(name, {})
    entry["oracle_msps"] = oracle_msps
    entry["oracle_fingerprint"] = oracle_fingerprint(cfg)
    with open(CONSTANTS_PATH, "w") as f:
        json.dump(consts, f, indent=1, sort_keys=True)
    print(json.dumps({"updated": CONSTANTS_PATH, "config": name,
                      "oracle_msps": oracle_msps}), flush=True)


def main():
    args = sys.argv[1:]
    update = "--update-constants" in args
    args = [a for a in args if a != "--update-constants"]
    which = args or ["loopback64", "lte1024", "lte2048"]
    cfgs = {"loopback64": GOLDEN64, "lte1024": LTE1024, "lte2048": LTE2048}
    for name in which:
        cfg = cfgs[name]
        n_samples = cfg.frame_len + cfg.nfft - 1
        rng = np.random.default_rng(0)
        bits = rng.integers(0, 2, cfg.num_bits)
        golden.run_chain(cfg, bits)          # warm (allocators, caches)
        times = []
        reps = 0
        t_start = time.perf_counter()
        while reps < 3 or (time.perf_counter() - t_start < 60 and reps < 9):
            t0 = time.perf_counter()
            r = golden.run_chain(cfg, bits)
            times.append(time.perf_counter() - t0)
            reps += 1
        assert r["ber"] == 0.0, f"oracle BER nonzero for {name}"
        med = float(np.median(times))
        oracle_msps = round(n_samples / med / 1e6, 4)
        print(json.dumps({
            "config": name, "oracle_msps": oracle_msps,
            "n_samples": n_samples, "reps": reps,
            "median_s": round(med, 4),
            "spread_pct": round(100 * (max(times) - min(times)) / med, 1),
        }), flush=True)
        if update:
            _update_constants(name, cfg, oracle_msps)


if __name__ == "__main__":
    main()
