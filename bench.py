#!/usr/bin/env python
"""Benchmark: full TX -> multipath channel -> AWGN -> RX chain throughput.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Msamples/s/chip", "vs_baseline": N}

Baseline: the CPU reference oracle (reference_cpu/golden.py, a literal NumPy
replication of the reference signal chain) measured on this machine by
bench_oracle.py — see ORACLE_MSPS below and the per-config oracle rows in
BASELINE.md.  The reference system's own design rate for the loopback config
is 0.96 Msps (SystemModel.py:37).

TPU notes: the axon tunnel supports complex compute but NOT complex
host<->device transfers, so the bench transfers only real tensors; all IQ
stays device-resident (exactly how the real pipeline should run anyway).
"""

import functools
import json
import os
import sys
import threading
import time

import numpy as np

import jax

# Persistent compilation cache: the full-chain AOT compile takes ~13 min
# through the axon tunnel; warm runs (CI, the driver) hit this cache instead.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 1)[0])

from lte_gnu_radio_code_tpu.models import chain, rxofdm, txofdm
from lte_gnu_radio_code_tpu.ops import channel as chan_ops
from lte_gnu_radio_code_tpu.utils.params import GOLDEN64

# CPU reference oracle throughput per config, measured on this machine by
# bench_oracle.py (median of >=3 reps; BASELINE.md "oracle" rows).  Each TPU
# number is divided by ITS OWN config's oracle, not the loopback64 one.
ORACLE_MSPS = {"loopback64": 1.09, "lte1024": 2.1, "lte2048": 2.2}


def try_d2h(x, timeout_s=45.0):
    """Device->host fetch that tolerates a wedged tunnel transfer path.

    Observed 2026-08-21: the axon tunnel's D2H direction can hang FOREVER
    (even np.asarray of a fresh f32[4]), while H2D, compile, and dispatch all
    work.  Benches therefore verify through this guard: the transfer runs in
    a daemon thread; on timeout the caller reports verification as skipped
    and must leave the process via os._exit (the blocked thread never
    returns, and the PJRT client destructor would hang a normal exit).
    Returns np.ndarray, or None if the transfer hung."""
    box = {}

    def work():
        try:
            box["v"] = np.asarray(x)
        except Exception as e:          # pragma: no cover - transport errors
            box["e"] = e

    t = threading.Thread(target=work, daemon=True)
    t.start()
    t.join(timeout_s)
    return box.get("v")


def emit_and_exit(payload: dict):
    """Print the one benchmark JSON line and leave via os._exit(0) so a
    daemon thread blocked in a wedged D2H cannot hang process teardown."""
    print(json.dumps(payload))
    sys.stdout.flush()
    os._exit(0)


def timing_probe():
    """Self-check that block_until_ready really awaits device completion.

    A scan of 16 dependent 4096x4096 matmuls costs 2.2 TFLOP — >= 11 ms at
    the v5e bf16 peak (197 TFLOP/s).  If the tunnel reports it complete in
    ~RPC latency, wall-clock 'throughput' is a dispatch rate, not a compute
    rate (observed 2026-08-21: implied 4000-31000 TFLOP/s).  Runs AFTER the
    timed region (it is a second executable, which itself perturbs tunnel
    dispatch).  Returns a dict for the bench JSON line."""
    import jax.numpy as jnp
    x = jnp.asarray(np.random.default_rng(0).standard_normal((4096, 4096)),
                    jnp.bfloat16) * 0.01

    @jax.jit
    def f(x):
        c, _ = jax.lax.scan(lambda c, _: (c @ x, ()), x, None, length=16)
        return c.sum()

    jax.block_until_ready(f(x))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(f(x))
        ts.append(time.perf_counter() - t0)
    tflops = 16 * 2 * 4096 ** 3 / float(np.median(ts)) / 1e12
    return {"implied_tflops": round(tflops, 1),
            "trustworthy": bool(tflops < 250)}


def bench_step(cfg, h, n_trials, num_patterns, bits, seed):
    """One frame end-to-end; returns only real scalars (transfer-safe)."""
    key = jax.random.fold_in(jax.random.PRNGKey(0), seed)
    tx = txofdm.tx_frame(cfg, bits)
    rx_clean = chan_ops.apply_channel(tx, h, max_impulse=cfg.nfft)
    sig_pow = jnp.mean(jnp.abs(tx - jnp.mean(tx)) ** 2)
    rx = chan_ops.awgn(cfg, rx_clean, key, sig_pow)
    r = rxofdm.rx_frame(cfg, rx, n_trials, num_patterns)
    nb = min(r.hard_bits.shape[0], bits.shape[0])
    ber = jnp.mean((r.hard_bits[:nb] != bits[:nb]).astype(jnp.float32))
    return ber, r.found.astype(jnp.int32)


def main():
    # optional args: [batch] [config: loopback64|lte1024|lte2048]
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
    # keep h as a NumPy constant: it is baked into the jitted program at
    # trace time (eager complex device_put is unsupported on the tunnel)
    h = chan_ops.channel_taps("Fading")
    step = jax.jit(jax.vmap(functools.partial(
        bench_step, cfg, h, n_trials, num_patterns)))

    rng = np.random.default_rng(0)
    # dtype conversion on host: the axon tunnel lacks int64 transfer/convert
    bits = jnp.asarray(rng.integers(0, 2, (batch, cfg.num_bits), dtype=np.int32))
    seeds = jnp.arange(batch, dtype=jnp.int32)

    # Compile + warm.  IMPORTANT: no host<->device transfer and no other
    # executable may run before/during the timed loop — on the axon tunnel a
    # single D2H copy (or any second program) permanently switches dispatch
    # into a ~43 ms/call slow path, under-reporting throughput ~500x.  All
    # verification happens AFTER timing.
    ber, found = jax.block_until_ready(step(bits, seeds))
    for _ in range(5):
        jax.block_until_ready(step(bits, seeds))

    # >=5 independent timed reps; report the median with spread (VERDICT r2
    # weak #4: single-run headlines swung +-14% run-to-run through the
    # tunnel — median-of-5 with stated spread is the robust form).
    rep_msps = []
    for _ in range(5):
        iters, t0 = 0, time.perf_counter()
        while time.perf_counter() - t0 < 1.5 or iters < 3:
            jax.block_until_ready(step(bits, seeds))
            iters += 1
        dt = (time.perf_counter() - t0) / iters
        rep_msps.append(batch * n_samples / dt / 1e6)

    # The timing-integrity probe runs BEFORE the D2H verification attempt:
    # a hung D2H poisons the tunnel connection, so any RPC issued after it
    # (e.g. the probe's compile) would hang the process forever.
    probe = timing_probe()

    # correctness (host numpy only — after the timed region).  D2H can hang
    # on a degraded tunnel; verify through the guard and report the outcome
    # rather than hanging the bench (the same program is pinned bit-exact by
    # tests/test_tpu_pipeline.py / test_reference_cpu.py on every run).
    found_h = try_d2h(found)
    ber_h = try_d2h(ber) if found_h is not None else None
    if ber_h is not None:
        assert found_h.sum() == batch, "sync lock failed in bench"
        assert ber_h.max() == 0.0, "nonzero BER in bench"
        verify = "ok: all locks found, BER 0"
    else:
        verify = ("skipped: tunnel D2H unavailable (compute/dispatch fine; "
                  "bit-exactness pinned by tests on the same program)")

    msps = float(np.median(rep_msps))
    spread = 100.0 * (max(rep_msps) - min(rep_msps)) / msps
    baseline = ORACLE_MSPS[which]
    emit_and_exit({
        "metric": f"full TX->fading->AWGN->RX chain throughput ({label})",
        "value": round(msps, 3),
        "unit": "Msamples/s/chip",
        "vs_baseline": round(msps / baseline, 2),
        "reps": len(rep_msps),
        "spread_pct": round(spread, 1),
        "rep_msps": [round(v, 1) for v in rep_msps],
        "verify": verify,
        "timing_probe": probe,
    })


if __name__ == "__main__":
    main()
