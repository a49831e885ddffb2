#!/usr/bin/env python
"""D2H-synced full-chain throughput: REAL sustained numbers on a tunnel
whose completion events lie.

Method (validated in BASELINE.md "Measurement integrity"): the tunnel's
`block_until_ready` can return without awaiting the device, so pure
dispatch-loop timing measures RPC turnaround.  But device execution is
in-order, and a device->host fetch of dispatch K's output cannot return
until dispatches 1..K have all finished — so `K enqueues + one D2H` is a
true end-to-end segment.  The FIRST D2H in a process carries a large
one-time penalty (~minutes observed), so it is sacrificed before timing;
subsequent segments run at full speed (calibration: a chained-matmul
probe measured 177 TFLOP/s this way, 90% of the v5e bf16 peak, where the
event-based timing implied an impossible 16,000+).

Per segment the fetched ber/found arrays are ALSO the verification —
correctness and timing come from the same bytes.

Usage: bench_synced.py [batch] [loopback64|lte1024|lte2048]
Prints one JSON line like bench.py.
"""

import functools
import json
import sys
import time

import numpy as np

import jax

sys.path.insert(0, __file__.rsplit("/", 1)[0])

# reuse bench.py's cache config, step function and oracle table
from bench import ORACLE_MSPS, bench_step, emit_and_exit, try_d2h

import jax.numpy as jnp

from lte_gnu_radio_code_tpu.models import rxofdm
from lte_gnu_radio_code_tpu.ops import channel as chan_ops
from lte_gnu_radio_code_tpu.utils.params import GOLDEN64


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    which = sys.argv[2] if len(sys.argv) > 2 else "loopback64"
    if which == "loopback64":
        cfg, label = GOLDEN64, "ofdm_chain loopback config, NFFT 64, QPSK"
    else:
        from lte_gnu_radio_code_tpu.utils.params import LTE1024, LTE2048
        cfg = {"lte1024": LTE1024, "lte2048": LTE2048}[which]
        label = f"LTE-scale NFFT {cfg.nfft}, QPSK"
    n_samples = cfg.frame_len + cfg.nfft - 1
    n_trials, num_patterns = rxofdm.plan_rx(cfg, n_samples)
    h = chan_ops.channel_taps("Fading")
    step = jax.jit(jax.vmap(functools.partial(
        bench_step, cfg, h, n_trials, num_patterns)))

    rng = np.random.default_rng(0)
    bits = jnp.asarray(rng.integers(0, 2, (batch, cfg.num_bits),
                                    dtype=np.int32))
    seeds = jnp.arange(batch, dtype=jnp.int32)

    ber, found = step(bits, seeds)          # compile + warm
    jax.block_until_ready(found)

    # sacrificial first D2H (one-time penalty; also the correctness check)
    t0 = time.perf_counter()
    found_h = try_d2h(found, timeout_s=300.0)
    first_d2h_s = time.perf_counter() - t0
    if found_h is None:
        emit_and_exit({"metric": f"D2H-synced chain throughput ({label})",
                       "error": "D2H unavailable (tunnel regression); "
                                "use bench.py's dispatch-rate form"})
    assert found_h.sum() == batch, "sync lock failed in bench"

    # segment sizing: double K until a segment takes >= 1 s
    k = 4
    while True:
        t0 = time.perf_counter()
        for _ in range(k):
            ber, found = step(bits, seeds)
        ber_h = np.asarray(ber)             # D2H == real completion barrier
        dt = time.perf_counter() - t0
        if dt >= 1.0 or k >= 8192:
            break
        k *= 2

    rep_msps = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(k):
            ber, found = step(bits, seeds)
        ber_h = np.asarray(ber)
        dt = time.perf_counter() - t0
        rep_msps.append(k * batch * n_samples / dt / 1e6)
    assert ber_h.max() == 0.0, "nonzero BER in bench"

    msps = float(np.median(rep_msps))
    spread = 100.0 * (max(rep_msps) - min(rep_msps)) / msps
    emit_and_exit({
        "metric": f"D2H-synced full chain throughput ({label})",
        "value": round(msps, 3),
        "unit": "Msamples/s/chip",
        "vs_baseline": round(msps / ORACLE_MSPS[which], 2),
        "reps": len(rep_msps),
        "dispatches_per_segment": k,
        "spread_pct": round(spread, 1),
        "rep_msps": [round(v, 1) for v in rep_msps],
        "first_d2h_s": round(first_d2h_s, 1),
        "verify": "ok: all locks found, BER 0 (fetched bytes ARE the "
                  "completion barrier)",
    })


if __name__ == "__main__":
    main()
