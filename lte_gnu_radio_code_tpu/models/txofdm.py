"""TX model — the gr-TXOFDM / txrx_mod transmitter as one jitted function.

bits -> constellation -> resource grid -> batched IFFT+CP+norm -> time frame.
Reference: MultiAntennaSystem.multi_ant_binary_map (:113-187) and
multi_ant_symb_gen (:189-218); streaming sources T1-T4 replay exactly this
frame from pickle files.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops import modulation, ofdm
from ..utils.params import OFDMConfig


def tx_frame(cfg: OFDMConfig, bits: jnp.ndarray) -> jnp.ndarray:
    """[cfg.num_bits] bits -> [cfg.frame_len] complex64 time samples."""
    pts = modulation.bits_to_symbols(bits, cfg.modulation)
    grid = ofdm.resource_grid(
        cfg, pts.reshape(cfg.num_data_symb, cfg.num_data_only_bins))
    return ofdm.modulate(cfg, grid)


def make_tx(cfg: OFDMConfig):
    """Jitted closure over the static config."""
    return jax.jit(functools.partial(tx_frame, cfg))
