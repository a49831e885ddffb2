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

import jax
import jax.numpy as jnp

from ..ops import modulation, ofdm
from ..utils.params import OFDMConfig


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


def tx_frames(cfg: OFDMConfig, bits: jnp.ndarray,
              path: str | None = None) -> jnp.ndarray:
    """Batched TX: [B, cfg.num_bits] bits -> [B, cfg.frame_len] frames.

    The pallas path flattens batch x symbols into the kernel's row axis in
    ONE call (the kernel normalises per row, so this is exact) instead of
    vmapping the kernel — the whole batch's IDFT runs as one MXU matmul
    sweep.  The xla/fourstep paths are a plain vmap of the per-frame
    modulator (their matmuls batch across the vmap on their own)."""
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
