#!/usr/bin/env python
"""Pallas-vs-XLA kernel shootout (VERDICT r1 weak #2).

Times ONE (kernel, config) combination per process invocation — the axon
TPU tunnel permanently degrades dispatch (~43 ms/call) once a second
executable runs in the same process, so each timed variant must be its own
process.  Drive all combos with:

  for k in sync_pallas sync_convbank sync_exact ofdm_mod_pallas \
           ofdm_mod_xla equalize_pallas equalize_xla; do
    for c in loopback64 lte1024 lte2048; do python bench_kernels.py $k $c; done
  done

Prints one JSON line: {"kernel":..., "config":..., "value": us/call,
"throughput_msps": ..., "shapes": ...}.
"""

import functools
import json
import os
import sys
import time

import numpy as np

import jax

# the axon site hook overrides JAX_PLATFORMS; honour an explicit CPU
# request through the config flag (smoke tests)
if os.environ.get("BENCH_CPU"):
    jax.config.update("jax_platforms", "cpu")

# persistent compile cache (same as bench.py): warm repeats skip the
# ~minutes-long tunnel compile
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 1)[0])

from lte_gnu_radio_code_tpu.models import rxofdm
from lte_gnu_radio_code_tpu.utils.params import GOLDEN64, LTE1024, LTE2048

CONFIGS = {"loopback64": GOLDEN64, "lte1024": LTE1024, "lte2048": LTE2048}


def build(kernel: str, cfg):
    """Returns (jitted fn, args, samples_per_call).  All inputs are built
    device-side from real tensors (tunnel-safe)."""
    n = cfg.frame_len + cfg.nfft - 1
    rng = np.random.default_rng(0)
    # real-tensor host input; complexify on device inside the jit
    xr = jnp.asarray(rng.standard_normal(n), jnp.float32)
    xi = jnp.asarray(rng.standard_normal(n), jnp.float32)
    from lte_gnu_radio_code_tpu.ops import sync

    n_trials = sync.n_trials_for(cfg, n)

    if kernel.startswith("sync"):
        if kernel == "sync_pallas":
            from lte_gnu_radio_code_tpu.pallas_kernels import sync_search

            def f(xr, xi):
                x = xr + 1j * xi
                return jnp.sum(sync_search.sync_corr_abs(cfg, x, n_trials))
        elif kernel == "sync_convbank":
            from lte_gnu_radio_code_tpu.ops import fast_sync

            def f(xr, xi):
                x = xr + 1j * xi
                return jnp.sum(fast_sync.sync_corr_abs_fast(cfg, x, n_trials))
        elif kernel == "sync_ifft":   # spectra + one IFFT per trial (default)
            def f(xr, xi):
                x = xr + 1j * xi
                s = sync.sync_spectra(cfg, x, n_trials)
                return jnp.sum(sync.corr_abs_from_spectra(cfg, s, "ifft"))
        else:  # sync_exact — batched-FFT spectra + matmul
            def f(xr, xi):
                x = xr + 1j * xi
                s = sync.sync_spectra(cfg, x, n_trials)
                return jnp.sum(jnp.abs(sync.sync_correlate(cfg, s)))
        return jax.jit(f), (xr, xi), n

    if kernel.startswith("ofdm_mod"):
        s = cfg.num_ofdm_symb
        gr = jnp.asarray(rng.standard_normal((s, cfg.nfft)), jnp.float32)
        gi = jnp.asarray(rng.standard_normal((s, cfg.nfft)), jnp.float32)
        if kernel == "ofdm_mod_pallas":
            from lte_gnu_radio_code_tpu.pallas_kernels import ofdm_mod

            def f(gr, gi):
                t = ofdm_mod.modulate(cfg, gr + 1j * gi)
                return jnp.sum(jnp.abs(t))
        else:
            from lte_gnu_radio_code_tpu.ops import ofdm

            def f(gr, gi):
                t = ofdm.modulate(cfg, gr + 1j * gi)
                return jnp.sum(jnp.abs(t))
        return jax.jit(f), (gr, gi), cfg.frame_len

    if kernel.startswith("equalize"):
        if kernel == "equalize_pallas":
            from lte_gnu_radio_code_tpu.pallas_kernels import equalize
            eq_fn = equalize.equalize_data_symbols
        else:
            eq_fn = sync.equalize_data_symbols

        def f(xr, xi):
            x = xr + 1j * xi
            chan = jnp.fft.fft(x[: cfg.nfft], cfg.nfft)
            ph = eq_fn(cfg, x, jnp.int32(cfg.cp_len), jnp.int32(1), chan,
                       cfg.num_patterns)
            return jnp.sum(jnp.abs(ph))

        return jax.jit(f), (xr, xi), cfg.frame_len

    raise SystemExit(f"unknown kernel {kernel!r}")


def main():
    kernel = sys.argv[1]
    which = sys.argv[2] if len(sys.argv) > 2 else "loopback64"
    cfg = CONFIGS[which]
    f, args, samples = build(kernel, cfg)

    out = jax.block_until_ready(f(*args))       # compile + warm
    for _ in range(5):
        jax.block_until_ready(f(*args))
    iters, t0 = 0, time.perf_counter()
    while time.perf_counter() - t0 < 3.0 or iters < 5:
        jax.block_until_ready(f(*args))
        iters += 1
    dt = (time.perf_counter() - t0) / iters

    print(json.dumps({
        "kernel": kernel, "config": which,
        "value": round(dt * 1e6, 1), "unit": "us/call",
        "throughput_msps": round(samples / dt / 1e6, 1),
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
