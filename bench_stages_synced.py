#!/usr/bin/env python
"""Stage-isolated VERIFIED device-compute timing (round 4).

The round-3/4 D2H-synced measurements revealed that the full-chain program's
verified sustained rate (~38 Msps at lte1024) sits far below its XLA
cost-model bf16 bound (~23.5 Gsps), while the chained-matmul calibration
measures 84-94% of the v5e bf16 peak with the same method.  Either one chain
stage executes pathologically slowly on this backend, or the cost model's
view of the lowering is wrong.  This bench answers WHICH stage, with the
same fold-R + fetch-scalar method as bench_compute.py: each stage is folded
R times into one dispatch via lax.scan (carrying a data dependence so the
scan cannot be elided), and the fetched output is the completion barrier.

Each stage runs in its OWN subprocess (a second executable in a process
permanently degrades the tunnel dispatch path — BASELINE.md).

Usage:
  bench_stages_synced.py driver [config] [R]      # spawn all stages
  bench_stages_synced.py <stage> [config] [R]     # one stage, one process
Stages: awgn tx chan sync spectra corr lock eq llr chain fft matmul
"""

import functools
import json
import os
import subprocess
import sys
import time

import numpy as np

import jax

# The axon site hook overrides JAX_PLATFORMS; honour an explicit CPU request
# (used by the smoke test) through the config flag, which it cannot override.
if os.environ.get("BENCH_STAGES_CPU"):
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp
from jax import lax

sys.path.insert(0, __file__.rsplit("/", 1)[0])

from lte_gnu_radio_code_tpu.models import rxofdm, txofdm
from lte_gnu_radio_code_tpu.ops import channel as chan_ops
from lte_gnu_radio_code_tpu.ops import modulation, sync
from lte_gnu_radio_code_tpu.utils.params import GOLDEN64

STAGES = ["awgn", "tx", "txmap", "txgrid", "txifft", "txfourstep",
          "txfused", "chan",
          "sync", "spectra", "corr", "lock", "eq", "llr", "chain", "rxonly",
          "syncconv",
          "syncpallas", "txpallas", "fft", "matmul"]


def get_cfg(which):
    if which == "loopback64":
        return GOLDEN64
    from lte_gnu_radio_code_tpu.utils.params import LTE1024, LTE2048
    return {"lte1024": LTE1024, "lte2048": LTE2048}[which]


def host_grids(cfg, bits_h):
    """Resource grids as NUMPY constants, computed on the CPU backend.

    An eager resource_grid on the TPU backend would need a complex D2H to
    read back, which the axon tunnel cannot do (it raises UNIMPLEMENTED) —
    pin the eager ops to the CPU device instead."""
    from lte_gnu_radio_code_tpu.ops import ofdm as ofdm_ops
    with jax.default_device(jax.devices("cpu")[0]):
        return np.stack([
            np.asarray(ofdm_ops.resource_grid(
                cfg, modulation.bits_to_symbols(
                    bits_h[i], cfg.modulation).reshape(
                        cfg.num_data_symb, cfg.num_data_only_bins)))
            for i in range(bits_h.shape[0])])


def build(stage, which, batch, r_iters):
    """Returns (fn(carry_inputs) -> small real array, n_samples_per_rep,
    work_label)."""
    cfg = get_cfg(which)
    n_samples = cfg.frame_len + cfg.nfft - 1
    n_trials, num_patterns = rxofdm.plan_rx(cfg, n_samples)
    h = chan_ops.channel_taps("Fading")
    rng = np.random.default_rng(0)
    bits_h = rng.integers(0, 2, (batch, cfg.num_bits), dtype=np.int32)

    # a fixed received buffer for the RX-side stages, built on host once.
    # All fixed operands stay NUMPY arrays closed over by the jitted fn —
    # they trace into the executable as host-side constants.  (Device
    # arrays would need a D2H to embed, which the axon tunnel cannot do
    # for complex dtypes.)
    from lte_gnu_radio_code_tpu.reference_cpu import golden as G
    from lte_gnu_radio_code_tpu.utils.params import used_bins
    rx_h = np.stack([
        G.awgn(cfg,
               G.apply_channel(G.tx_frame(cfg, bits_h[i]), h,
                               max_impulse=cfg.nfft),
               np.random.default_rng(i + 1), 1.0)
        for i in range(batch)]).astype(np.complex64)

    _, synch_bins = used_bins(cfg.nfft, cfg.num_synch_bins)
    synch_bins = list(synch_bins)

    def np_spectra(x):
        """Host-side twin of sync.sync_spectra (precursor only)."""
        starts = cfg.cp_len + cfg.stride * np.arange(n_trials)
        offs = (np.arange(cfg.m_synch) * cfg.rx_b_len)[:, None] + \
            np.arange(cfg.nfft)[None, :]
        win = x[starts[:, None, None] + offs[None]]
        f = np.fft.fft(win, cfg.nfft, axis=-1)[..., synch_bins]
        s = f.reshape(n_trials, -1)
        power = np.sum(np.abs(s) ** 2, axis=-1, keepdims=True)
        return (s * np.sqrt(s.shape[-1] / power)).astype(np.complex64)

    def np_corr_abs(s):
        """Host-side twin of |sync.sync_correlate_ifft| (precursor only)."""
        zc = G.zc_for_config(cfg)
        prod = (s * np.conj(zc)[None]).reshape(
            s.shape[0], cfg.m_synch, cfg.num_synch_bins)
        q = prod.sum(axis=1)
        y = np.zeros((s.shape[0], cfg.nfft), complex)
        y[:, synch_bins] = q
        return np.abs(cfg.nfft * np.fft.ifft(y, axis=-1)
                      [:, : cfg.cp_len + 1]).astype(np.float32)

    def scan_over(body, init_xs):
        """Fold r_iters executions of body into one dispatch; the scalar
        output depends on every iteration (sum), so nothing can be elided."""
        def f(_unused):
            def step(acc, i):
                return acc + body(i), ()
            acc, _ = lax.scan(step, jnp.float32(0.0),
                              jnp.arange(r_iters, dtype=jnp.int32))
            return acc.reshape(1)
        return f

    bits = jnp.asarray(bits_h)

    if stage == "chain":
        from bench import bench_step

        def body(i):
            ber, found = jax.vmap(functools.partial(
                bench_step, cfg, h, n_trials, num_patterns))(
                    bits, i * batch + jnp.arange(batch, dtype=jnp.int32))
            return jnp.sum(ber) + jnp.sum(found.astype(jnp.float32))
        return scan_over(body, None), batch * n_samples, "full chain"

    if stage == "rxonly":
        # the receiver-deployment shape: IQ in -> bits out, nothing else
        # (no TX/channel/AWGN simulation) — Pallas sync + Pallas demod
        bits_ref = jnp.asarray(bits_h)

        def body(i):
            def one(x, b):
                r = rxofdm.rx_frame(cfg, x, n_trials, num_patterns,
                                    fast="pallas", eq="pallas")
                nb = min(r.hard_bits.shape[0], b.shape[0])
                ber = jnp.mean((r.hard_bits[:nb] != b[:nb]
                                ).astype(jnp.float32))
                return ber + 0.0 * i, r.found.astype(jnp.float32)
            ber, found = jax.vmap(one)(jnp.asarray(rx_h) * (1.0 + 0.0 * i),
                                       bits_ref)
            return jnp.sum(ber) + jnp.sum(found)
        return scan_over(body, None), batch * n_samples, \
            "RX ONLY (samples in -> bits out; Pallas sync + Pallas demod)"

    if stage == "awgn":
        def body(i):
            key = jax.random.fold_in(jax.random.PRNGKey(0), i)
            keys = jax.random.split(key, batch)
            z = jax.vmap(lambda k: chan_ops.awgn(
                cfg, jnp.zeros(n_samples, jnp.complex64), k, 1.0))(keys)
            return jnp.sum(z.real) + jnp.sum(z.imag)
        return scan_over(body, None), batch * n_samples, "PRNG+AWGN only"

    if stage == "tx":
        def body(i):
            t = jax.vmap(lambda b: txofdm.tx_frame(cfg, b))(
                jnp.bitwise_xor(bits, i & 1))
            return jnp.sum(t.real) + jnp.sum(t.imag)
        return scan_over(body, None), batch * n_samples, "TX modulate only"

    if stage == "txmap":
        def body(i):
            pts = jax.vmap(lambda b: modulation.bits_to_symbols(
                b, cfg.modulation))(jnp.bitwise_xor(bits, i & 1))
            return jnp.sum(pts.real) + jnp.sum(pts.imag)
        return scan_over(body, None), batch * n_samples, \
            "TX bits_to_symbols only"

    if stage == "txgrid":
        from lte_gnu_radio_code_tpu.ops import ofdm as ofdm_ops
        with jax.default_device(jax.devices("cpu")[0]):
            pts0 = np.stack([
                np.asarray(modulation.bits_to_symbols(bits_h[i],
                                                      cfg.modulation))
                for i in range(batch)]).reshape(
                    batch, cfg.num_data_symb, cfg.num_data_only_bins)

        def body(i):
            g = jax.vmap(lambda p: ofdm_ops.resource_grid(
                cfg, p * (1.0 + 0.0 * i)))(pts0)
            return jnp.sum(g.real) + jnp.sum(g.imag)
        return scan_over(body, None), batch * n_samples, \
            "TX resource_grid scatter only"

    if stage == "txifft":
        from lte_gnu_radio_code_tpu.ops import ofdm as ofdm_ops
        grid0 = host_grids(cfg, bits_h)

        def body(i):
            t = jax.vmap(lambda g: ofdm_ops.modulate(
                cfg, g * (1.0 + 0.0 * i)))(grid0)
            return jnp.sum(t.real) + jnp.sum(t.imag)
        return scan_over(body, None), batch * n_samples, \
            "TX ifft+cp+norm only"

    if stage == "txfourstep":
        from lte_gnu_radio_code_tpu.ops import ofdm as ofdm_ops
        grid0 = host_grids(cfg, bits_h)

        def body(i):
            t = jax.vmap(lambda g: ofdm_ops.modulate_fourstep(
                cfg, g * (1.0 + 0.0 * i)))(grid0)
            return jnp.sum(t.real) + jnp.sum(t.imag)
        return scan_over(body, None), batch * n_samples, \
            "TX four-step IDFT (two MXU matmul rounds) + cp + norm"

    if stage == "txfused":
        # whole TX (map + modulate), grid-free batched form
        def body(i):
            t = txofdm.tx_frames(cfg, jnp.bitwise_xor(bits, i & 1),
                                 path="fused")
            return jnp.sum(t.real) + jnp.sum(t.imag)
        return scan_over(body, None), batch * n_samples, \
            "TX fused grid-free (bits -> bins-restricted IDFT kernel + " \
            "const synch rows)"

    if stage == "chan":
        tx0 = np.stack([G.tx_frame(cfg, bits_h[i])
                        for i in range(batch)]).astype(np.complex64)

        def body(i):
            y = jax.vmap(lambda s: chan_ops.apply_channel(
                s * (1.0 + 0.0 * i), h, max_impulse=cfg.nfft))(tx0)
            return jnp.sum(y.real) + jnp.sum(y.imag)
        return scan_over(body, None), batch * n_samples, "channel conv only"

    rx = rx_h                           # numpy constant, traced in

    if stage == "spectra":
        def body(i):
            s = jax.vmap(lambda x: sync.sync_spectra(
                cfg, x * (1.0 + 0.0 * i), n_trials))(rx)
            return jnp.sum(s.real) + jnp.sum(s.imag)
        return scan_over(body, None), batch * n_samples, \
            "sync_spectra (trial gather + batched FFT + norm)"

    if stage == "corr":
        s0 = np.stack([np_spectra(rx_h[i]) for i in range(batch)])

        def body(i):
            c = jax.vmap(lambda s: sync.sync_correlate_ifft(
                cfg, s * (1.0 + 0.0 * i)))(s0)
            return jnp.sum(c.real) + jnp.sum(c.imag)
        return scan_over(body, None), batch * n_samples, \
            "IFFT delay correlation only"

    if stage == "lock":
        c0 = np.stack([np_corr_abs(np_spectra(rx_h[i]))
                       for i in range(batch)])

        def body(i):
            outs = jax.vmap(lambda c: sync.first_lock(
                cfg, c * (1.0 + 0.0 * i)))(c0)
            return jnp.sum(outs[2]) + jnp.sum(outs[0].astype(jnp.float32))
        return scan_over(body, None), batch * n_samples, \
            "first_lock gate/argmax only"

    if stage == "sync":
        def body(i):
            def one(x):
                s = sync.sync_spectra(cfg, x, n_trials)
                corr = jnp.abs(sync.sync_correlate_ifft(cfg, s))
                ptr, didx, peak, found, first = sync.first_lock(cfg, corr)
                _, chan_full, _ = sync.estimate_channel(cfg, s[first], didx)
                return peak + jnp.sum(jnp.abs(chan_full))
            return jnp.sum(jax.vmap(one)(rx * (1.0 + 0.0 * i)))
        return scan_over(body, None), batch * n_samples, \
            "full sync stage (spectra+corr+lock+chanest)"

    if stage == "eq":
        def body(i):
            def one(x):
                s = sync.sync_spectra(cfg, x, n_trials)
                corr = jnp.abs(sync.sync_correlate_ifft(cfg, s))
                ptr, didx, peak, found, first = sync.first_lock(cfg, corr)
                _, chan_full, _ = sync.estimate_channel(cfg, s[first], didx)
                ph = sync.equalize_data_symbols(cfg, x, ptr, didx, chan_full,
                                                num_patterns)
                return jnp.sum(ph.real) + jnp.sum(ph.imag)
            return jnp.sum(jax.vmap(one)(rx * (1.0 + 0.0 * i)))
        return scan_over(body, None), batch * n_samples, \
            "sync + equalize_data_symbols"

    if stage == "llr":
        # oracle phasors as a host-side constant demap input (timing target
        # is the LLR op only, so the exact phasor provenance is irrelevant)
        ph0 = np.stack([G.rx_frame(cfg, rx_h[i])[0]
                        for i in range(batch)]).astype(np.complex64)

        def body(i):
            hard, l0, l1 = jax.vmap(modulation.qpsk_llr)(
                ph0 * (1.0 + 0.0 * i))
            return (jnp.sum(l0) + jnp.sum(l1) +
                    jnp.sum(hard.astype(jnp.float32)))
        return scan_over(body, None), batch * n_samples, "qpsk_llr only"

    if stage == "syncconv":
        from lte_gnu_radio_code_tpu.ops import fast_sync

        def body(i):
            c = fast_sync.sync_corr_abs_fast(
                cfg, rx * (1.0 + 0.0 * i), n_trials)
            return jnp.sum(c)
        return scan_over(body, None), batch * n_samples, \
            "conv-bank sync search (whole search, MXU strided conv)"

    if stage == "syncpallas":
        from lte_gnu_radio_code_tpu.pallas_kernels import sync_search

        def body(i):
            c = jax.vmap(lambda x: sync_search.sync_corr_abs(
                cfg, x, n_trials,
                interpret=jax.default_backend() != "tpu"))(
                    rx * (1.0 + 0.0 * i))
            return jnp.sum(c)
        return scan_over(body, None), batch * n_samples, \
            "Pallas fused sync search"

    if stage == "txpallas":
        from lte_gnu_radio_code_tpu.pallas_kernels import ofdm_mod
        grid0 = host_grids(cfg, bits_h)
        interp = jax.default_backend() != "tpu"
        # flatten batch x symbols into the kernel's row axis (the kernel
        # normalises per row, so this is exact; avoids vmap-of-pallas_call,
        # which this backend cannot lower)
        gflat = grid0.reshape(-1, cfg.nfft)

        def body(i):
            tr, ti = ofdm_mod.modulate_planar(
                cfg, jnp.real(gflat) * (1.0 + 0.0 * i),
                jnp.imag(gflat) * (1.0 + 0.0 * i), interpret=interp)
            return jnp.sum(tr) + jnp.sum(ti)
        return scan_over(body, None), batch * n_samples, \
            "TX Pallas DFT-matmul modulate (ifft+cp+norm fused)"

    if stage == "fft":
        nfft = cfg.nfft
        rows = batch * (n_samples // nfft)
        x0 = ((rng.standard_normal((rows, nfft)) +
               1j * rng.standard_normal((rows, nfft))) / nfft
              ).astype(np.complex64)

        def body(i):
            f = jnp.fft.fft(x0 * (1.0 + 0.0 * i), nfft, axis=-1)
            return jnp.sum(f.real) + jnp.sum(f.imag)
        return scan_over(body, None), rows * nfft, \
            f"raw batched {nfft}-pt FFT [{rows}, {nfft}]"

    if stage == "matmul":
        a0 = (rng.standard_normal((4096, 4096)) * 0.01
              ).astype(jnp.bfloat16)

        def f(_unused):
            def step(c, _):
                return (c @ a0).astype(jnp.bfloat16), ()
            c, _ = lax.scan(step, jnp.asarray(a0), None, length=r_iters)
            return jnp.sum(c.astype(jnp.float32)).reshape(1)
        # "samples" = matmul FLOPs / 1e3 so the Msps output is GFLOP/s
        return f, 2 * 4096 ** 3 // 1000, \
            "bf16 4096^3 chained matmul calibration (value==GFLOP/s)"

    raise SystemExit(f"unknown stage {stage}")


def run_stage(stage, which, batch, r_iters):
    fn, n_per_rep, label = build(stage, which, batch, r_iters)
    jfn = jax.jit(fn)
    out = jfn(0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    first = np.asarray(out)[0]               # sacrificial first fetch
    first_d2h = time.perf_counter() - t0
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        v = np.asarray(jfn(0))[0]
        reps.append(time.perf_counter() - t0)
    assert np.isfinite(v)
    dt = float(np.median(reps))
    print(json.dumps({
        "stage": stage, "label": label, "config": which,
        "R": r_iters, "batch": batch,
        "msps_verified": round(r_iters * n_per_rep / dt / 1e6, 2),
        "sec_per_dispatch": round(dt, 3),
        "usec_per_rep_unit": round(dt / r_iters * 1e6, 1),
        "first_d2h_s": round(first_d2h, 1),
        "rep_s": [round(t, 3) for t in reps],
    }), flush=True)


def main():
    if len(sys.argv) < 2:
        raise SystemExit(__doc__)
    what = sys.argv[1]
    which = sys.argv[2] if len(sys.argv) > 2 else "lte1024"
    r_iters = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    batch = 16
    if what == "driver":
        for st in STAGES:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), st, which,
                 str(r_iters)], capture_output=True, text=True, timeout=1800)
            for line in r.stdout.splitlines():
                if line.startswith("{"):
                    print(line, flush=True)
            if r.returncode:
                print(json.dumps({"stage": st, "error":
                                  r.stderr.strip()[-400:]}), flush=True)
        return
    run_stage(what, which, batch, r_iters)
    os._exit(0)


if __name__ == "__main__":
    main()
