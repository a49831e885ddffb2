#!/usr/bin/env python
"""Timing-validity probe: is block_until_ready actually awaiting completion?

A scan of K dependent [4096 x 4096] matmuls has an undeniable FLOP cost:
K * 2 * 4096^3.  At K=16 that is 2.2 TFLOP -> >= 11.2 ms/call at the v5e
bf16 peak (197 TFLOP/s), >= 44.7 ms/call at the f32 rate (~1/4).  If the
tunnel reports such calls "complete" in ~RPC latency (tens of us), the
ready-event path is lying and every wall-clock number above the RPC floor
is a dispatch-rate measurement, not a compute measurement.

Prints one JSON line per dtype with us/call and the implied TFLOP/s.
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def probe(dtype, k=16, n=4096, reps=8):
    x = jnp.asarray(np.random.default_rng(0).standard_normal((n, n)) * 0.01,
                    dtype)

    @jax.jit
    def f(x):
        def body(c, _):
            c = c @ x
            return c, ()
        c, _ = jax.lax.scan(body, x, None, length=k)
        return c.sum()

    jax.block_until_ready(f(x))          # compile + warm
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(f(x))
        times.append(time.perf_counter() - t0)
    med = float(np.median(times))
    flops = k * 2 * n ** 3
    print(json.dumps({
        "probe": f"chained matmul x{k}, {n}x{n}, {jnp.dtype(dtype).name}",
        "us_per_call_median": round(med * 1e6, 1),
        "rep_us": [round(t * 1e6, 1) for t in times],
        "implied_tflops": round(flops / med / 1e12, 1),
        "bf16_peak_tflops": 197,
        "verdict": ("TIMING-REAL" if flops / med / 1e12 < 250
                    else "TIMING-BOGUS (exceeds physical peak)"),
    }), flush=True)


if __name__ == "__main__":
    for dt in [jnp.bfloat16, jnp.float32]:
        probe(dt)
