"""RX model — the flagship synch_and_chan_est + bit recovery as one jitted,
fully batched function (the gr-RXOFDM / gr-utsa_ofdm / offline-R10 family).

Stages (all device-resident, no host sync):
  sync_spectra -> sync_correlate (MXU matmul) -> first_lock ->
  estimate_channel -> equalize_data_symbols -> qpsk_llr

Reference: gr-RXOFDM/python/synch_and_chan_est.py:140-266,
TEST/GNU_RADIO_OFFLINE/synch_and_chan_est.py:164-293,
LEGACY/gr-ofdm-rx/python/BitRecovery.py:66-157.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import modulation, sync
from ..utils.params import OFDMConfig


class RxResult(NamedTuple):
    phasors: jnp.ndarray        # [num_data_symb, num_data_bins] equalised IQ
    hard_bits: jnp.ndarray      # [num_bits]
    llr0: jnp.ndarray
    llr1: jnp.ndarray
    lock_ptr: jnp.ndarray       # scalar int — frame pointer of the sync lock
    delay_idx: jnp.ndarray      # scalar int — winning delay hypothesis
    peak: jnp.ndarray           # correlation peak value
    found: jnp.ndarray          # bool — gate crossed anywhere
    chan_est_time: jnp.ndarray  # [nfft] estimated CIR


def rx_frame(cfg: OFDMConfig, x: jnp.ndarray, n_trials: int,
             num_patterns: int) -> RxResult:
    """Demodulate a buffer of samples.  n_trials/num_patterns are static."""
    spectra = sync.sync_spectra(cfg, x, n_trials)
    corr = jnp.abs(sync.sync_correlate(cfg, spectra))
    ptr, delay_idx, peak, found, first = sync.first_lock(cfg, corr)
    _, chan_full, cir = sync.estimate_channel(cfg, spectra[first], delay_idx)
    phasors = sync.equalize_data_symbols(
        cfg, x, ptr, delay_idx, chan_full, num_patterns)
    if cfg.modulation == "QPSK":
        hard, llr0, llr1 = modulation.qpsk_llr(phasors)
    else:
        hard, llr = modulation.maxlog_llr(phasors, cfg.modulation,
                                          1.0 / cfg.snr_linear)
        llr0, llr1 = -llr, llr
    return RxResult(phasors, hard, llr0, llr1, ptr, delay_idx, peak, found, cir)


def plan_rx(cfg: OFDMConfig, n_samples: int) -> tuple[int, int]:
    """Static (n_trials, num_patterns) for a given buffer length.

    num_patterns matches the reference's bound check: block k's last data
    symbol must fit below n_samples assuming the nominal lock at cp_len
    (the reference uses the actual lock; at most one tail block differs —
    it would demodulate garbage there anyway, exactly like the reference's
    zero rows).
    """
    n_trials = sync.n_trials_for(cfg, n_samples)
    block = cfg.pattern_len * cfg.rx_b_len
    # lock + k*block + (pattern_len-1)*rx_b_len + nfft <= n_samples
    avail = n_samples - cfg.cp_len - (cfg.pattern_len - 1) * cfg.rx_b_len - cfg.nfft
    num_patterns = max(0, min(cfg.num_patterns, avail // block + 1))
    return n_trials, num_patterns


def make_rx(cfg: OFDMConfig, n_samples: int):
    """Jitted RX for fixed buffer length."""
    n_trials, num_patterns = plan_rx(cfg, n_samples)
    return jax.jit(functools.partial(
        rx_frame, cfg, n_trials=n_trials, num_patterns=num_patterns))
