"""Pallas TPU kernel: fused data demodulation — per-symbol DFT restricted to
the data bins (one MXU matmul against a [nfft, B] basis), per-symbol power
normalisation, timing derotation and one-tap MMSE equalisation, all in one
VMEM pass.

Replaces the stage-B chain of the reference RX (TEST/GNU_RADIO_OFFLINE/
synch_and_chan_est.py:258-284): FFT -> gather bins -> p_est -> derotate ->
eq_gain, which in XLA form costs several HBM round-trips over the symbol
tensor.  The derotation and MMSE gain are combined into a single complex
coefficient per bin before the kernel launch (they are per-frame constants
once the sync lock is known).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.params import OFDMConfig, used_bins


@functools.lru_cache(maxsize=16)
def _dft_bins_mats(nfft: int, num_bins: int):
    """[nfft, B] real/imag of e^{-j 2 pi b_k n / N} on the data bins."""
    _, bins = used_bins(nfft, num_bins)
    n = np.arange(nfft)
    v = np.exp(-2j * np.pi * np.outer(n, np.asarray(bins)) / nfft)
    return v.real.astype(np.float32), v.imag.astype(np.float32)


def _kernel(n_q, b_true, wr_ref, wi_ref, vr_ref, vi_ref, cr_ref, ci_ref,
            or_ref, oi_ref, fr_acc, fi_acc):
    """Contraction (time-sample) axis blocked through the grid, like
    pallas_kernels/ofdm_mod (round 4: the full-resident [nfft, B] DFT
    matrices were 2x9.8 MB at NFFT 2048 — over VMEM).  Step q accumulates
    the partial DFT of time slab q; normalisation + the combined
    derotation/MMSE coefficient run on the last step."""
    q = pl.program_id(0)
    wr, wi = wr_ref[:], wi_ref[:]
    vr, vi = vr_ref[:], vi_ref[:]
    pr = (jnp.dot(wr, vr, preferred_element_type=jnp.float32) -
          jnp.dot(wi, vi, preferred_element_type=jnp.float32))
    pi = (jnp.dot(wr, vi, preferred_element_type=jnp.float32) +
          jnp.dot(wi, vr, preferred_element_type=jnp.float32))

    @pl.when(q == 0)
    def _init():
        fr_acc[:] = pr
        fi_acc[:] = pi

    @pl.when(q > 0)
    def _acc():
        fr_acc[:] += pr
        fi_acc[:] += pi

    @pl.when(q == n_q - 1)
    def _finish():
        fr, fi = fr_acc[:], fi_acc[:]
        # b_true, not the lane-padded width: the padded bins are zero (they
        # contribute nothing to power) but the normalisation is over the
        # REAL bin count (synch_and_chan_est.py:269 p_est)
        power = jnp.sum(fr * fr + fi * fi, axis=1, keepdims=True)
        scale = jnp.sqrt(b_true) * jax.lax.rsqrt(jnp.maximum(power, 1e-30))
        fr = fr * scale
        fi = fi * scale
        cr, ci = cr_ref[:], ci_ref[:]
        or_ref[:] = fr * cr - fi * ci
        oi_ref[:] = fr * ci + fi * cr


def demod_windows(cfg: OFDMConfig, win: jnp.ndarray, coeff: jnp.ndarray,
                  interpret: bool = False) -> jnp.ndarray:
    """[K, nfft] complex windows + [B] complex combined coeff -> [K, B]
    equalised phasors via the fused kernel."""
    k = win.shape[0]
    b = cfg.num_data_bins
    vr, vi = _dft_bins_mats(cfg.nfft, b)
    # pad the bin axis to the f32 lane width so column tiles stay aligned
    bp = -(-b // 128) * 128
    vr = np.pad(vr, ((0, 0), (0, bp - b)))
    vi = np.pad(vi, ((0, 0), (0, bp - b)))
    coeff2 = jnp.broadcast_to(
        jnp.pad(coeff, (0, bp - b))[None, :], (k, bp))
    # contraction tile: largest power-of-two divisor of nfft keeping the two
    # [kt, bp] slabs under ~6 MB
    budget = max(128, 6 * 2 ** 20 // (2 * 4 * bp))
    kt = min(cfg.nfft, 128)
    while kt * 2 <= budget and kt * 2 <= cfg.nfft:
        kt *= 2
    n_q = -(-cfg.nfft // kt)
    assert cfg.nfft % kt == 0, (cfg.nfft, kt)
    wspec = pl.BlockSpec((k, kt), lambda q: (0, q), memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((kt, bp), lambda q: (q, 0), memory_space=pltpu.VMEM)
    fspec = pl.BlockSpec((k, bp), lambda q: (0, 0), memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((k, bp), jnp.float32)
    tr, ti = pl.pallas_call(
        functools.partial(_kernel, n_q, float(b)),
        grid=(n_q,),
        out_shape=(out_shape, out_shape),
        in_specs=[wspec, wspec, vspec, vspec, fspec, fspec],
        out_specs=(fspec, fspec),
        scratch_shapes=[pltpu.VMEM((k, bp), jnp.float32),
                        pltpu.VMEM((k, bp), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=8 * k * cfg.nfft * bp,
            bytes_accessed=4 * k * (2 * cfg.nfft + 4 * bp),
            transcendentals=0),
        interpret=interpret,
    )(win.real.astype(jnp.float32), win.imag.astype(jnp.float32),
      jnp.asarray(vr), jnp.asarray(vi),
      coeff2.real.astype(jnp.float32), coeff2.imag.astype(jnp.float32))
    return (tr[:, :b] + 1j * ti[:, :b]).astype(jnp.complex64)


def equalize_data_symbols(cfg: OFDMConfig, x: jnp.ndarray, lock_ptr,
                          delay_idx, chan_full: jnp.ndarray,
                          num_patterns: int,
                          interpret: bool = False) -> jnp.ndarray:
    """Drop-in for ops.sync.equalize_data_symbols using the fused kernel."""
    from ..ops import sync as sync_ops

    _, data_bins = used_bins(cfg.nfft, cfg.num_data_bins)
    data_bins = np.asarray(data_bins)
    m0, nd = cfg.m_synch, cfg.synch_dat[1]
    block = cfg.pattern_len * cfg.rx_b_len

    # one dynamic slice at the lock + static windows (gather-free — the
    # round-4 de-gather rule; edge padding replicates gather index-clamping)
    span = ((num_patterns - 1) * block + (m0 + nd - 1) * cfg.rx_b_len +
            cfg.nfft)
    xp = jnp.pad(x, (0, span), mode="edge")
    seg = jax.lax.dynamic_slice_in_dim(xp, lock_ptr, span, axis=0)
    rel = (np.arange(num_patterns)[:, None, None] * block +
           (m0 + np.arange(nd))[None, :, None] * cfg.rx_b_len +
           np.arange(cfg.nfft)[None, None, :]).reshape(-1, cfg.nfft)
    win = seg[jnp.asarray(rel)]                         # [K, nfft]

    rot = jnp.exp((1j * 2.0 * jnp.pi / cfg.nfft) *
                  delay_idx.astype(jnp.float32) *
                  jnp.asarray(data_bins, jnp.float32)).astype(jnp.complex64)
    eq = sync_ops.mmse_gain(chan_full[data_bins], cfg.snr_linear)
    phasors = demod_windows(cfg, win, rot * eq, interpret)
    return phasors.reshape(num_patterns * nd, cfg.num_data_bins)
