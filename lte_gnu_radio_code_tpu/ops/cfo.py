"""Carrier-frequency-offset hypothesis search and DSSS despreading ops.

The reference's CFO loop (LEGACY/gr-ofdm-rx/python/SynchEstAndFO.py:250-278)
multiplies each trial window by every CFO mixer candidate before the FFT and
keeps the (fo, delay) pair with max correlation.  Here the fo axis is just one
more batch dimension of the same batched-FFT + matmul search — the whole
(trial, fo, delay) space is evaluated in one fused pass on the MXU/VPU.

DSSS (SynchEstFOAndDSSS.py:253-262,392-398): ZC spreading code of length
``dsss``; despread = mean over chip groups of chips * conj(code).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp
from jax import lax

from ..utils.params import OFDMConfig, used_bins
from .zadoff_chu import delay_search_matrix, zadoff_chu, zc_for_config


def cfo_bank(cfg: OFDMConfig, fo_range) -> np.ndarray:
    """[F, nfft] mixer bank exp(+j*2*pi*fo/fs*n) (SynchEstAndFO.py:196)."""
    return np.exp(1j * 2 * np.pi * (1.0 / cfg.fs) *
                  np.outer(np.asarray(fo_range, np.float64),
                           np.arange(cfg.nfft))).astype(np.complex64)


def dsss_code(dsss: int, prime: int = 37) -> np.ndarray:
    """ZC spreading code (SynchEstFOAndDSSS.py:253-262)."""
    return zadoff_chu(dsss, prime, parity_even=(dsss % 2 == 0))


def sync_spectra_cfo(cfg: OFDMConfig, x: jnp.ndarray, n_trials: int,
                     bank: np.ndarray) -> jnp.ndarray:
    """Power-normalised synch-bin spectra for every (trial, fo) pair.

    Returns S [n_trials, F, m_synch*num_synch_bins].  Same window gather as
    sync_spectra, with the CFO mixer applied in time before the FFT
    (SynchEstAndFO.py:253-261).
    """
    _, synch_bins = used_bins(cfg.nfft, cfg.num_synch_bins)
    starts = cfg.cp_len + cfg.stride * np.arange(n_trials)
    offs = (np.arange(cfg.m_synch) * cfg.rx_b_len)[:, None] + \
        np.arange(cfg.nfft)[None, :]
    idx = starts[:, None, None] + offs[None, :, :]          # [p, m, nfft]
    win = x[idx]                                            # [p, m, nfft]
    mixed = win[:, None, :, :] * jnp.asarray(bank)[None, :, None, :]
    f = jnp.fft.fft(mixed, cfg.nfft, axis=-1)               # [p, F, m, nfft]
    s = f[..., np.asarray(synch_bins)]
    s = s.reshape(n_trials, bank.shape[0], -1)              # [p, F, m*L]
    power = jnp.sum(jnp.abs(s) ** 2, axis=-1, keepdims=True)
    return s * jnp.sqrt(s.shape[-1] / power)


def sync_correlate_cfo(cfg: OFDMConfig, spectra: jnp.ndarray) -> jnp.ndarray:
    """|del_mat| over the full (trial, fo, delay) search cube.

    spectra [p, F, L] -> corr [p, F, cp+1]; one batched complex matmul.
    """
    zc = jnp.asarray(zc_for_config(cfg))
    dse = jnp.asarray(delay_search_matrix(cfg))             # [cp+1, L]
    prod = spectra * jnp.conj(zc)[None, None, :]
    return jnp.einsum("pfl,dl->pfd", prod, dse,
                      precision=lax.Precision.HIGHEST)


def dsss_despread(phasors: jnp.ndarray, dsss: int) -> jnp.ndarray:
    """[..., B] equalised chips -> [..., B/dsss] despread symbols."""
    if dsss == 1:
        return phasors
    sc = jnp.asarray(dsss_code(dsss))
    shape = phasors.shape[:-1] + (phasors.shape[-1] // dsss, dsss)
    chips = phasors.reshape(shape)
    return jnp.mean(chips * jnp.conj(sc), axis=-1)
