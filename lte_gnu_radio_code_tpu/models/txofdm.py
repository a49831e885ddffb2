"""TX model — the gr-TXOFDM / txrx_mod transmitter as one jitted function.

bits -> constellation -> resource grid -> batched IFFT+CP+norm -> time frame.
Reference: MultiAntennaSystem.multi_ant_binary_map (:113-187) and
multi_ant_symb_gen (:189-218); streaming sources T1-T4 replay exactly this
frame from pickle files.

``path`` selects the IFFT+CP+norm implementation:
  * None / "xla"  -> ops.ofdm.modulate (backend FFT op; works everywhere,
    the library default — no TPU dependency).
  * "pallas"      -> pallas_kernels.ofdm_mod (fused DFT-matmul kernel; the
    verified winner on the TPU backend, where the FFT op runs at
    ~121 GFLOP/s while the MXU runs at 122-186 TFLOP/s — BASELINE.md).
Both paths produce the same frame to float32 tolerance and identical
downstream bit decisions (tests/test_pallas_kernels.py).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..ops import modulation, ofdm
from ..utils.params import OFDMConfig, used_bins


def _grid(cfg: OFDMConfig, bits: jnp.ndarray) -> jnp.ndarray:
    pts = modulation.bits_to_symbols(bits, cfg.modulation)
    return ofdm.resource_grid(
        cfg, pts.reshape(cfg.num_data_symb, cfg.num_data_only_bins))


def tx_frame(cfg: OFDMConfig, bits: jnp.ndarray,
             path: str | None = None) -> jnp.ndarray:
    """[cfg.num_bits] bits -> [cfg.frame_len] complex64 time samples."""
    grid = _grid(cfg, bits)
    if path == "pallas":
        from ..pallas_kernels import ofdm_mod
        return ofdm_mod.modulate(
            cfg, grid, interpret=jax.default_backend() != "tpu")
    if path == "fourstep":
        return ofdm.modulate_fourstep(cfg, grid)
    return ofdm.modulate(cfg, grid)


@functools.lru_cache(maxsize=16)
def _synch_time_rows(cfg: OFDMConfig) -> np.ndarray:
    """The m_synch distinct synch symbols as CONSTANT normalised time rows
    [m_synch, nfft+cp] (numpy, computed once at trace time).

    Synch symbols carry only the fixed ZC — their modulated time samples
    do not depend on the payload, so the fused TX path never recomputes
    them on device (math: resource_grid synch rows + ofdm.modulate)."""
    _, sb = used_bins(cfg.nfft, cfg.num_synch_bins)
    from ..ops.zadoff_chu import zc_for_config
    zc = np.asarray(zc_for_config(cfg))
    seg = cfg.num_synch_bins
    rows = []
    for m in range(cfg.m_synch):
        g = np.zeros(cfg.nfft, complex)
        g[np.asarray(sb)] = zc[m * seg:(m + 1) * seg]
        x = np.fft.ifft(g, cfg.nfft)
        t = np.concatenate([x[-cfg.cp_len:], x])
        e = float(np.sum(np.abs(t) ** 2))
        if e > 1e-30:
            t = t * np.sqrt(len(t) / e)
        t = t / np.sqrt(np.var(t))
        rows.append(t.astype(np.complex64))
    return np.stack(rows)


def _pattern_is_periodic(cfg: OFDMConfig) -> bool:
    base = [0] * cfg.m_synch + [1] * cfg.synch_dat[1]
    return list(cfg.symbol_pattern()) == base * cfg.num_patterns


def tx_frames_fused(cfg: OFDMConfig, bits: jnp.ndarray) -> jnp.ndarray:
    """GRID-FREE batched TX: bits [B, num_bits] -> frames [B, frame_len].

    The resource grid never materialises: data symbol VALUES run straight
    through the bins-restricted IDFT kernel
    (pallas_kernels/ofdm_mod.modulate_data_vals), and the synch symbols are
    trace-time constants (_synch_time_rows).  Removes the grid-assembly
    stage (~430 us/iter at lte1024 batch 16 — a pure data-movement cost)
    from the TX hot path.  Same frames as the grid paths to float32
    tolerance; requires pilot_grid == "none" and the periodic
    synch/data pattern every shipped config uses (falls back to the
    "pallas" grid path otherwise)."""
    if cfg.pilot_grid != "none" or not _pattern_is_periodic(cfg):
        return tx_frames(cfg, bits, path="pallas")
    from ..pallas_kernels import ofdm_mod
    b = bits.shape[0]
    k = cfg.num_data_bins
    n_pat, m0, nd = cfg.num_patterns, cfg.m_synch, cfg.synch_dat[1]
    _, data_bins = used_bins(cfg.nfft, k)
    pts = jax.vmap(lambda bb: modulation.bits_to_symbols(
        bb, cfg.modulation))(bits).reshape(b * cfg.num_data_symb, k)
    rows = ofdm_mod.modulate_data_vals(
        cfg, pts, tuple(int(x) for x in data_bins),
        interpret=jax.default_backend() != "tpu")   # [B*S_d, L]
    l_sym = cfg.nfft + cfg.cp_len
    d = rows.reshape(b, n_pat, nd, l_sym)
    s = jnp.broadcast_to(jnp.asarray(_synch_time_rows(cfg))[None, None],
                         (b, n_pat, m0, l_sym))
    return jnp.concatenate([s, d], axis=2).reshape(b, cfg.frame_len)


def tx_frames(cfg: OFDMConfig, bits: jnp.ndarray,
              path: str | None = None) -> jnp.ndarray:
    """Batched TX: [B, cfg.num_bits] bits -> [B, cfg.frame_len] frames.

    The pallas path flattens batch x symbols into the kernel's row axis in
    ONE call (the kernel normalises per row, so this is exact) instead of
    vmapping the kernel — the whole batch's IDFT runs as one MXU matmul
    sweep.  The "fused" path goes further: no resource grid at all
    (tx_frames_fused).  The xla/fourstep paths are a plain vmap of the
    per-frame modulator (their matmuls batch across the vmap on their
    own)."""
    if path == "fused":
        return tx_frames_fused(cfg, bits)
    if path != "pallas":
        return jax.vmap(lambda b: tx_frame(cfg, b, path))(bits)
    from ..pallas_kernels import ofdm_mod
    grids = jax.vmap(lambda b: _grid(cfg, b))(bits)     # [B, S, nfft]
    b = grids.shape[0]
    rows = ofdm_mod.modulate_rows(
        cfg, grids.reshape(b * cfg.num_ofdm_symb, cfg.nfft),
        interpret=jax.default_backend() != "tpu")
    return rows.reshape(b, cfg.frame_len)


def make_tx(cfg: OFDMConfig, path: str | None = None):
    """Jitted closure over the static config."""
    return jax.jit(functools.partial(tx_frame, cfg, path=path))
