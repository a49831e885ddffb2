"""Split RX pipeline: sync-index finder and channel-estimate/demod as
separate stages — the modular two-block layout the reference sketches in
TEST/GNU_RADIO_OFFLINE/find_synch_index.py (R8) and channel_estimate.py (R9,
shipped incomplete; completed here with the R2/R10 stage-B semantics).

R8 emits the signal unchanged plus the detection table on a side port
(find_synch_index.py:113-116: out_sig [complex64, int16]); here the "ports"
are just the returned arrays.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import modulation, sync
from ..utils.params import OFDMConfig
from .rxofdm import plan_rx


class SynchIndexResult(NamedTuple):
    passthrough: jnp.ndarray   # the input signal, unchanged (port 0)
    ptrs: jnp.ndarray          # [max_det] int32 (port 1 rows: ptr)
    delays: jnp.ndarray        # [max_det] int32
    peaks: jnp.ndarray         # [max_det] float32
    count: jnp.ndarray


def find_synch_index(cfg: OFDMConfig, x: jnp.ndarray, n_trials: int,
                     max_det: int = 100) -> SynchIndexResult:
    """Stage A only: dense search + multi-detection table (R8)."""
    corr = sync.corr_abs_from_spectra(
        cfg, sync.sync_spectra(cfg, x, n_trials), "ifft")
    dmax_val = jnp.max(corr, axis=-1)
    dmax_ind = jnp.argmax(corr, axis=-1)
    ptrs, (delays, peaks), count = sync.refractory_detect(
        cfg, dmax_val, (dmax_ind, dmax_val), max_det)
    return SynchIndexResult(x, ptrs, delays,
                            peaks.astype(jnp.float32), count)


class ChanEstResult(NamedTuple):
    phasors: jnp.ndarray       # [num_patterns * nd, num_data_bins]
    hard_bits: jnp.ndarray
    chan_freq: jnp.ndarray     # [nfft]


def channel_estimate_demod(cfg: OFDMConfig, x: jnp.ndarray, lock_ptr,
                           delay_idx, num_patterns: int) -> ChanEstResult:
    """Stage B given a sync lock (R9 completed): channel estimate at the
    lock, then equalise every pattern block."""
    trial = (lock_ptr - cfg.cp_len) // max(1, cfg.stride)
    spec = sync.sync_spectrum_at(cfg, x, trial)
    _, chan_full, _ = sync.estimate_channel(cfg, spec, delay_idx)
    phasors = sync.equalize_data_symbols(cfg, x, lock_ptr, delay_idx,
                                         chan_full, num_patterns)
    hard, _, _ = modulation.qpsk_llr(phasors)
    return ChanEstResult(phasors, hard, chan_full)


def make_split_rx(cfg: OFDMConfig, n_samples: int, max_det: int = 100):
    """(find_synch_index, channel_estimate_demod) jitted pair."""
    n_trials, num_patterns = plan_rx(cfg, n_samples)
    f1 = jax.jit(functools.partial(find_synch_index, cfg, n_trials=n_trials,
                                   max_det=max_det))
    f2 = jax.jit(functools.partial(channel_estimate_demod, cfg,
                                   num_patterns=num_patterns))
    return f1, f2
