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
    derotation/MMSE coefficient run on the last step.  Round 5 adds a row
    tile grid dim (leading) so whole-batch flattened row counts fit VMEM."""
    q = pl.program_id(1)
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
    """[K, nfft] complex windows + combined coeff -> [K, B] equalised
    phasors via the fused kernel.

    coeff: [B] (one per-bin coefficient for every window — the single-lock
    batch RX shape) or [K, B] (per-ROW coefficients — the whole-batch
    flattened demod, where rows from different frames carry different
    locks/channels; round 5)."""
    k = win.shape[0]
    b = cfg.num_data_bins
    # per-call row cap: XLA stages the call's planar output pair through
    # scoped VMEM (see ofdm_mod._max_call_rows) — slab-split big flattened
    # batches host-side
    bp0 = -(-b // 128) * 128
    # 8 MiB budget: the observed staging (~14.9 KB/row at nfft 2048)
    # covers more than the two outputs, so leave headroom
    cap = max(256, (8 * 2 ** 20 // (8 * bp0)) // 128 * 128)
    if k > cap:
        outs = []
        for i in range(0, k, cap):
            c_i = coeff[i: i + cap] if coeff.ndim == 2 else coeff
            outs.append(demod_windows(cfg, win[i: i + cap], c_i, interpret))
        return jnp.concatenate(outs)
    vr, vi = _dft_bins_mats(cfg.nfft, b)
    # pad the bin axis to the f32 lane width so column tiles stay aligned
    bp = -(-b // 128) * 128
    vr = np.pad(vr, ((0, 0), (0, bp - b)))
    vi = np.pad(vi, ((0, 0), (0, bp - b)))
    if coeff.ndim == 2:
        coeff2 = jnp.pad(coeff, ((0, 0), (0, bp - b)))
    else:
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
    # row tile: keep the per-tile residents (2 scratch + 2 out + 2 coeff
    # [rt, bp] + 2 in [rt, kt]) under ~5 MiB alongside the weight slabs
    per_row = 4 * (6 * bp + 2 * kt)
    rt = max(8, (5 * 2 ** 20 // per_row) // 8 * 8)
    rt = min(rt, -(-k // 8) * 8)
    n_rt = -(-k // rt)
    kp_rows = n_rt * rt
    win_re = win.real.astype(jnp.float32)
    win_im = win.imag.astype(jnp.float32)
    c_re = coeff2.real.astype(jnp.float32)
    c_im = coeff2.imag.astype(jnp.float32)
    if kp_rows != k:
        pad = ((0, kp_rows - k), (0, 0))
        win_re, win_im = jnp.pad(win_re, pad), jnp.pad(win_im, pad)
        c_re, c_im = jnp.pad(c_re, pad), jnp.pad(c_im, pad)
    wspec = pl.BlockSpec((rt, kt), lambda i, q: (i, q),
                         memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((kt, bp), lambda i, q: (q, 0),
                         memory_space=pltpu.VMEM)
    fspec = pl.BlockSpec((rt, bp), lambda i, q: (i, 0),
                         memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((kp_rows, bp), jnp.float32)
    tr, ti = pl.pallas_call(
        functools.partial(_kernel, n_q, float(b)),
        grid=(n_rt, n_q),
        out_shape=(out_shape, out_shape),
        in_specs=[wspec, wspec, vspec, vspec, fspec, fspec],
        out_specs=(fspec, fspec),
        scratch_shapes=[pltpu.VMEM((rt, bp), jnp.float32),
                        pltpu.VMEM((rt, bp), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=8 * kp_rows * cfg.nfft * bp,
            bytes_accessed=4 * kp_rows * (2 * cfg.nfft + 4 * bp),
            transcendentals=0),
        interpret=interpret,
    )(win_re, win_im, jnp.asarray(vr), jnp.asarray(vi), c_re, c_im)
    return (tr[:k, :b] + 1j * ti[:k, :b]).astype(jnp.complex64)


def data_windows(cfg: OFDMConfig, x: jnp.ndarray, lock_ptr,
                 num_patterns: int) -> jnp.ndarray:
    """[K = num_patterns*nd, nfft] data-symbol windows at the lock.

    One dynamic slice at the lock + static windows (gather-free — the
    round-4 de-gather rule; edge padding replicates gather index-clamping).
    """
    m0, nd = cfg.m_synch, cfg.synch_dat[1]
    block = cfg.pattern_len * cfg.rx_b_len
    span = ((num_patterns - 1) * block + (m0 + nd - 1) * cfg.rx_b_len +
            cfg.nfft)
    xp = jnp.pad(x, (0, span), mode="edge")
    seg = jax.lax.dynamic_slice_in_dim(xp, lock_ptr, span, axis=0)
    rel = (np.arange(num_patterns)[:, None, None] * block +
           (m0 + np.arange(nd))[None, :, None] * cfg.rx_b_len +
           np.arange(cfg.nfft)[None, None, :]).reshape(-1, cfg.nfft)
    return seg[jnp.asarray(rel)]                        # [K, nfft]


def combined_coeff(cfg: OFDMConfig, delay_idx,
                   chan_full: jnp.ndarray) -> jnp.ndarray:
    """[B] per-bin derotation x MMSE coefficient for one frame's lock."""
    from ..ops import sync as sync_ops

    _, data_bins = used_bins(cfg.nfft, cfg.num_data_bins)
    data_bins = np.asarray(data_bins)
    rot = jnp.exp((1j * 2.0 * jnp.pi / cfg.nfft) *
                  delay_idx.astype(jnp.float32) *
                  jnp.asarray(data_bins, jnp.float32)).astype(jnp.complex64)
    return rot * sync_ops.mmse_gain(chan_full[data_bins], cfg.snr_linear)


def equalize_data_symbols(cfg: OFDMConfig, x: jnp.ndarray, lock_ptr,
                          delay_idx, chan_full: jnp.ndarray,
                          num_patterns: int,
                          interpret: bool = False) -> jnp.ndarray:
    """Drop-in for ops.sync.equalize_data_symbols using the fused kernel."""
    win = data_windows(cfg, x, lock_ptr, num_patterns)
    coeff = combined_coeff(cfg, delay_idx, chan_full)
    phasors = demod_windows(cfg, win, coeff, interpret)
    return phasors.reshape(num_patterns * cfg.synch_dat[1],
                           cfg.num_data_bins)
