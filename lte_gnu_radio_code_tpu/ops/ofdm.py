"""OFDM modulation ops: subcarrier resource mapping, batched IFFT + CP with
the reference's two-stage per-symbol power normalisation, and symbol FFT.

TPU-first shape discipline: everything is batched over the symbol axis
([num_symb, nfft]) so XLA lowers the FFTs as one batched kernel and fuses the
elementwise normalisation around them — the reference's per-symbol Python
loops (MultiAntennaSystem.py:189-218) become a single fused graph.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..utils.params import OFDMConfig, used_bins
from .zadoff_chu import zc_for_config


def resource_grid(cfg: OFDMConfig, data_symbols: jnp.ndarray) -> jnp.ndarray:
    """Scatter data symbols + ZC synch onto the [num_ofdm_symb, nfft] grid.

    ``data_symbols``: [num_data_symb, num_data_bins] complex.
    Synch symbols carry consecutive num_synch_bins-slices of the MM-long ZC
    (SynchSignal.py:34-38, MultiAntennaSystem.py:136-147).
    """
    _, synch_bins = used_bins(cfg.nfft, cfg.num_synch_bins)
    _, data_bins = used_bins(cfg.nfft, cfg.num_data_bins)
    pattern = np.asarray(cfg.symbol_pattern())
    data_rows = np.where(pattern == 1)[0]
    synch_rows = np.where(pattern == 0)[0]

    zc = zc_for_config(cfg)
    seg = cfg.num_synch_bins
    # synch symbol i within its pattern takes ZC slice (i mod m_synch)
    slice_idx = np.arange(len(synch_rows)) % cfg.m_synch
    zc_rows = zc.reshape(cfg.m_synch, seg)[slice_idx]       # [n_synch_rows, seg]

    if cfg.pilot_grid == "none":
        # Concat-based grid assembly (no scatter): used_bins places the
        # first half of each value vector on the NEGATIVE (tail) bins and
        # the second half on bins 1..h, so each row is
        #   [0 | second half | zero gap | first half]
        # and the full grid is a static row-permutation of the stacked
        # synch/data rows.  Identical values to the scatter form; avoids
        # the per-element scatter op on the TX hot path.
        def rows_from_vals(vals, nb):
            h = nb // 2
            s = vals.shape[0]
            zero1 = jnp.zeros((s, 1), jnp.complex64)
            gap = jnp.zeros((s, cfg.nfft - 2 * h - 1), jnp.complex64)
            v = vals.astype(jnp.complex64)
            return jnp.concatenate([zero1, v[:, h:], gap, v[:, :h]], axis=-1)

        srows = rows_from_vals(jnp.asarray(zc_rows), cfg.num_synch_bins)
        drows = rows_from_vals(data_symbols, cfg.num_data_bins)
        order = np.empty(cfg.num_ofdm_symb, np.int64)
        order[synch_rows] = np.arange(len(synch_rows))
        order[data_rows] = len(synch_rows) + np.arange(len(data_rows))
        return jnp.concatenate([srows, drows], axis=0)[order]

    grid = jnp.zeros((cfg.num_ofdm_symb, cfg.nfft), dtype=jnp.complex64)
    grid = grid.at[np.ix_(synch_rows, np.asarray(synch_bins))].set(jnp.asarray(zc_rows))
    if cfg.pilot_grid != "none":
        # scattered pilots carved out of the used bins (SDRScript.py:63-67
        # completed per BASELINE configs 2-3) — known QPSK values on the
        # pilot bins of every data symbol, data on the remaining bins
        from ..utils.params import pilot_bin_plan
        from .pilots import pilot_values
        _, p_wrapped, _, d_wrapped = pilot_bin_plan(cfg)
        grid = grid.at[np.ix_(data_rows, np.asarray(p_wrapped))].set(
            jnp.asarray(pilot_values(cfg))[None, :])
        data_bins = d_wrapped
    grid = grid.at[np.ix_(data_rows, np.asarray(data_bins))].set(
        data_symbols.astype(jnp.complex64))
    return grid


def modulate(cfg: OFDMConfig, grid: jnp.ndarray) -> jnp.ndarray:
    """Batched IFFT + CP prepend + per-symbol power normalisation.

    Replicates MultiAntennaSystem.multi_ant_symb_gen:189-218: scale each
    CP-extended symbol to unit mean energy, then divide by sqrt(np.var)
    (complex variance *with* mean subtraction, as np.var does).
    Returns the time-domain frame [num_ofdm_symb * (nfft+cp)] complex64.
    """
    x = jnp.fft.ifft(grid, cfg.nfft, axis=-1)
    t = jnp.concatenate([x[:, -cfg.cp_len:], x], axis=-1)    # [S, nfft+cp]
    n = t.shape[-1]
    energy = jnp.sum(jnp.abs(t) ** 2, axis=-1, keepdims=True)
    scale = jnp.where(energy > 1e-30, jnp.sqrt(n / energy), 1.0)
    t = t * scale
    mean = jnp.mean(t, axis=-1, keepdims=True)
    p = jnp.mean(jnp.abs(t - mean) ** 2, axis=-1, keepdims=True)
    t = t / jnp.sqrt(p)
    return t.reshape(-1).astype(jnp.complex64)


def symbol_fft(cfg: OFDMConfig, windows: jnp.ndarray) -> jnp.ndarray:
    """Batched FFT of CP-stripped symbol windows [..., nfft]."""
    return jnp.fft.fft(windows, cfg.nfft, axis=-1)
