#!/usr/bin/env python
"""Streaming-mode throughput on the chip (VERDICT r2 #2).

The reference's actual operating shape is continuous streaming — the RX
thread's work() called forever (gr-RXOFDM/python/synch_and_chan_est.py:140).
Our chunked receivers (runtime/stream.py) pay one host dispatch per push();
this bench measures the sustained Msamples/s through push() as a function of
chunk size, to place the dispatch-overhead floor next to the batched
whole-buffer numbers in BASELINE.md.

One (receiver, config, chunk_len) per process (tunnel: one executable per
process).  Usage: bench_streaming.py RECEIVER {loopback64|lte1024} CHUNK
where RECEIVER is reacq | legacy | reacq_manyK | legacy_manyK (K = chunks
per dispatch through push_many's lax.scan — the dispatch-amortised form).

Tunnel rules honoured: the IQ stream is generated ON DEVICE from real-tensor
host inputs (complex H2D unsupported); chunks are pre-sliced device arrays;
no D2H happens until after the timed region.
"""

import functools
import json
import os
import sys
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 1)[0])

from lte_gnu_radio_code_tpu.models import txofdm
from lte_gnu_radio_code_tpu.ops import channel as chan_ops
from lte_gnu_radio_code_tpu.runtime import stream
from lte_gnu_radio_code_tpu.utils.params import GOLDEN64, LTE1024, LTE2048

CONFIGS = {"loopback64": GOLDEN64, "lte1024": LTE1024, "lte2048": LTE2048}


def main():
    which_rx = sys.argv[1] if len(sys.argv) > 1 else "reacq"
    which = sys.argv[2] if len(sys.argv) > 2 else "loopback64"
    chunk_len = int(sys.argv[3]) if len(sys.argv) > 3 else 4095
    cfg = CONFIGS[which]
    import re
    m = re.match(r"^(reacq|legacy)(?:_batch(\d+))?(?:_many(\d+))?$", which_rx)
    assert m, f"bad receiver spec {which_rx!r}"
    which_rx = m.group(1)
    nb = int(m.group(2) or 0)         # streams per dispatch (vmap)
    many = int(m.group(3) or 0)       # chunks per dispatch (scan)

    # --- device-side stream generation: a few back-to-back TX frames through
    # the Fading channel + AWGN, built inside one jit from real host tensors.
    n_frames = max(2, (4 * chunk_len) // cfg.frame_len + 1)
    h = chan_ops.channel_taps("Fading")

    def gen(bits, seed):
        key = jax.random.fold_in(jax.random.PRNGKey(7), seed)
        tx = jax.vmap(functools.partial(txofdm.tx_frame, cfg))(bits)
        flat = tx.reshape(-1)
        rx_clean = chan_ops.apply_channel(flat, h, max_impulse=cfg.nfft)
        sig_pow = jnp.mean(jnp.abs(flat - jnp.mean(flat)) ** 2)
        return chan_ops.awgn(cfg, rx_clean, key, sig_pow)

    rng = np.random.default_rng(0)
    bits = jnp.asarray(
        rng.integers(0, 2, (n_frames, cfg.num_bits), dtype=np.int32))
    sig = jax.block_until_ready(jax.jit(gen)(bits, jnp.int32(0)))

    n_chunks = sig.shape[0] // chunk_len
    assert n_chunks >= 2, "stream shorter than two chunks"
    chunks = [jax.block_until_ready(
        jax.lax.slice(sig, (i * chunk_len,), ((i + 1) * chunk_len,)))
        for i in range(n_chunks)]

    if nb:
        assert which_rx == "reacq", "batch mode: reacq only"
        rx = stream.BatchReacqStreamingRx(cfg, chunk_len, batch=nb)
        # every stream carries the same IQ (content doesn't affect timing);
        # broadcast on device
        bcast = jax.jit(lambda c: jnp.broadcast_to(c, (nb, chunk_len)) + 0)
        chunks = [jax.block_until_ready(bcast(c)) for c in chunks]
    elif which_rx == "reacq":
        rx = stream.ReacqStreamingRx(cfg, chunk_len)
    else:
        rx = stream.LegacyStreamingRx(cfg, chunk_len, fo_range=(0.0,))

    if many:
        # pre-staged [K, chunk_len] groups, cycled through push_many
        n_groups = max(2, n_chunks // many)
        groups = [jax.block_until_ready(jnp.stack(
            [chunks[(g * many + j) % n_chunks] for j in range(many)]))
            for g in range(n_groups)]

    # compile + warm (first push compiles the chunk step)
    if many:
        rx.push_many(groups[0])
    else:
        for c in chunks[:3]:
            rx.push(c)
    jax.block_until_ready(rx.state.base)

    # --- 1. verification fetch FIRST (round 4): the sacrificial first D2H
    # pays the tunnel's one-time penalty while the device backlog is only
    # the warmup pushes.  (Fetching after the dispatch-rate loop has to
    # drain tens of thousands of enqueued chunks and times out.)  The int32
    # cast runs on device — the tunnel cannot D2H bool arrays.
    from bench import emit_and_exit, try_d2h
    any_det = jax.jit(lambda s: s.astype(jnp.int32))(rx.state.any_det)
    det_h = try_d2h(any_det, timeout_s=600.0)
    if det_h is not None:
        assert int(det_h.min()) == 1, "no detection in stream bench"
        verify = "ok: detections present"
    else:
        verify = ("skipped: tunnel D2H unavailable (dispatch fine; "
                  "stream==batch pinned by tests on the same program)")

    # --- 2. D2H-synced segments (the HEADLINE): K pushes + one fetched
    # state scalar per segment — the fetched bytes ARE the completion
    # barrier, so this is sustained completed compute (conservative: it
    # includes the tunnel's degraded post-fetch dispatch overhead).
    synced_msps = None
    if det_h is not None:
        to1 = jax.jit(lambda s: s.reshape(1))
        synced = []
        for _ in range(3):
            pushes, t0 = 0, time.perf_counter()
            while time.perf_counter() - t0 < 1.5 or pushes < 8:
                if many:
                    rx.push_many(groups[pushes % n_groups])
                else:
                    rx.push(chunks[pushes % n_chunks])
                pushes += 1
            np.asarray(to1(rx.state.base))          # completion barrier
            dt = time.perf_counter() - t0
            synced.append(
                pushes * chunk_len * max(1, many) * max(1, nb) / dt / 1e6)
        synced_msps = float(np.median(synced))

    # --- 3. dispatch-rate loop LAST (supplementary; wall clock does not
    # prove completion on this tunnel, so it is bounded/capped below and
    # nothing is fetched after it).
    rep_msps = []
    for _ in range(5):
        pushes, t0 = 0, time.perf_counter()
        while time.perf_counter() - t0 < 1.5 or pushes < 8:
            if many:
                rx.push_many(groups[pushes % n_groups])
                pushes += 1
            else:
                rx.push(chunks[pushes % n_chunks])
                pushes += 1
        jax.block_until_ready(rx.state.base)
        dt = time.perf_counter() - t0
        rep_msps.append(
            pushes * chunk_len * max(1, many) * max(1, nb) / dt / 1e6)

    from bench import bound_msps
    bnd = bound_msps(which)
    msps = float(np.median(rep_msps))
    spread = 100.0 * (max(rep_msps) - min(rep_msps)) / msps
    capped = msps > 1.1 * bnd
    label = which_rx + (f"_batch{nb}" if nb else "") + \
        (f"_many{many}" if many else "")
    # the PRIMARY value is the D2H-synced segment rate when the fetch path
    # works (completed compute, conservatively including the tunnel's
    # degraded post-fetch dispatch); the pre-fetch dispatch rate is
    # supplementary and capped at the bound (round-4 integrity rules)
    value = synced_msps if synced_msps is not None else \
        (min(msps, bnd) if capped else msps)
    emit_and_exit({
        "metric": f"streaming RX throughput ({label}, {which}, "
                  f"chunk {chunk_len})",
        "value": round(value, 3),
        "value_is": ("D2H-synced sustained rate" if synced_msps is not None
                     else "dispatch rate (UNVERIFIED; D2H unavailable)"),
        "raw_dispatch_msps": round(msps, 3),
        "unit": "Msamples/s/chip",
        "us_per_dispatch": round(
            chunk_len * max(1, many) * max(1, nb) / msps, 1),
        "reps": len(rep_msps),
        "spread_pct": round(spread, 1),
        "rep_msps": [round(v, 1) for v in rep_msps],
        # the bound is the FULL-CHAIN cost-model bf16 bound (bench.py) — a
        # strict lower bound on the RX-only ceiling, so capped=true still
        # only fires on genuinely impossible rates
        "bound_msps_full_chain": round(bnd, 1),
        "fraction_of_bound": round(msps / bnd, 4),
        "capped": bool(capped),
        "synced_msps": None if synced_msps is None else round(synced_msps, 3),
        "verify": verify,
    })


if __name__ == "__main__":
    main()
