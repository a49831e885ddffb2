#!/usr/bin/env python
"""Scaling-efficiency harness (BASELINE.md target: >= 80% from 1 chip ->
1 host -> 2+ hosts, time-block sharding with halo exchange).

Measures the time-sharded RX throughput at t in {1, 2, 4, ...} shards over
whatever devices exist and prints per-shard-count throughput + efficiency
vs linear scaling of the t=1 number.  Runs unchanged on:

  * the 8-virtual-device CPU mesh (--virtual 8) — validates the harness and
    the sharding program today (virtual devices share the same cores, so
    the printed efficiency is NOT a hardware statement there), and
  * real multi-chip hardware when available — the same program's collectives
    then ride ICI and the efficiency is the real BASELINE metric.

Output: one JSON line per shard count + a summary line.
"""

import json
import os
import sys
import time


def _parse():
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default="lte1024",
                   choices=["loopback64", "lte1024", "lte2048"])
    p.add_argument("--symbols", type=int, default=256,
                   help="frame length in OFDM symbols (bigger = more work "
                        "per shard)")
    p.add_argument("--shards", type=int, nargs="*", default=None,
                   help="shard counts to measure (default: 1,2,4,.. up to "
                        "device count)")
    p.add_argument("--virtual", type=int, default=0,
                   help="force N virtual CPU devices (for hosts without "
                        "multi-chip hardware)")
    p.add_argument("--seconds", type=float, default=3.0)
    return p.parse_args()


def main():
    args = _parse()
    if args.virtual:
        os.environ["JAX_PLATFORMS"] = "cpu"
        flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
                 if "host_platform_device_count" not in f]
        os.environ["XLA_FLAGS"] = " ".join(
            flags + [f"--xla_force_host_platform_device_count={args.virtual}"])

    import numpy as np

    import jax
    import jax.numpy as jnp

    if args.virtual:
        jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, __file__.rsplit("/", 1)[0])

    from lte_gnu_radio_code_tpu.models import rxofdm
    from lte_gnu_radio_code_tpu.parallel import mesh as meshmod
    from lte_gnu_radio_code_tpu.parallel import sharded
    from lte_gnu_radio_code_tpu.reference_cpu import golden as G
    from lte_gnu_radio_code_tpu.utils.params import (GOLDEN64, LTE1024,
                                                     LTE2048, OFDMConfig)

    base = {"loopback64": GOLDEN64, "lte1024": LTE1024,
            "lte2048": LTE2048}[args.config]
    pattern = base.pattern_len
    nsym = (args.symbols // pattern) * pattern
    cfg = OFDMConfig(**{**base.__dict__, "num_ofdm_symb": nsym}).validate()

    ndev = len(jax.devices())
    shard_counts = args.shards or [t for t in (1, 2, 4, 8, 16, 32)
                                   if t <= ndev]

    # one deterministic faded frame, generated on host once
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, cfg.num_bits)
    tx = G.tx_frame(cfg, bits)
    rx = G.apply_channel(tx, G.channel_taps("Fading")).astype(np.complex64)
    n = len(rx)

    results = []
    for t in shard_counts:
        if cfg.frame_len // t < sharded.halo_size(cfg):
            print(json.dumps({"metric": f"t={t}",
                              "note": "skipped: shard smaller than halo"}))
            continue
        mesh = meshmod.time_mesh(t)
        run = sharded.make_sharded_rx(cfg, n, mesh)
        x = jnp.asarray(rx)
        r = jax.block_until_ready(run(x))           # compile + warm
        assert bool(np.asarray(r.found)), "sync lock failed"
        for _ in range(3):
            jax.block_until_ready(run(x))
        iters, t0 = 0, time.perf_counter()
        while time.perf_counter() - t0 < args.seconds or iters < 3:
            jax.block_until_ready(run(x))
            iters += 1
        dt = (time.perf_counter() - t0) / iters
        msps = n / dt / 1e6
        results.append((t, msps))
        base_msps = results[0][1]
        eff = msps / (base_msps * t / results[0][0])
        print(json.dumps({
            "metric": f"time-sharded RX throughput, {args.config} "
                      f"({nsym} symbols), t={t}",
            "value": round(msps, 2), "unit": "Msamples/s",
            "efficiency_vs_linear": round(eff, 3),
            "devices": ndev,
            "backend": jax.default_backend(),
        }))

    if len(results) > 1:
        t_max, m_max = results[-1]
        print(json.dumps({
            "metric": f"scaling efficiency {results[0][0]}->{t_max} shards",
            "value": round(m_max / (results[0][1] * t_max / results[0][0]), 3),
            "unit": "fraction of linear",
            "note": ("virtual CPU mesh — harness validation only"
                     if args.virtual or jax.default_backend() == "cpu"
                     else "real hardware"),
        }))


if __name__ == "__main__":
    main()
