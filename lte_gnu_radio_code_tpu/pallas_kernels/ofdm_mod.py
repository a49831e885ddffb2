"""Pallas TPU kernel: fused OFDM modulator — batched IDFT (as a real matmul
on the MXU) + cyclic-prefix extension + the reference's two-stage per-symbol
power normalisation, in ONE VMEM-resident pass.

Why a kernel: the XLA path (ops/ofdm.py:modulate) runs ifft -> concat ->
norm as separate HBM-level ops; for the small NFFTs of this workload
(64..2048) the DFT-as-matmul formulation keeps the whole symbol tile in
VMEM, feeds the MXU directly, and fuses the CP copy + both normalisations
into the same pass — one HBM read of the grid, one HBM write of the frame.

Complex arithmetic is planar: the kernel takes/returns float32 re/im pairs
(which also sidesteps the axon tunnel's complex-transfer hole).

Reference math replicated: MultiAntennaSystem.multi_ant_symb_gen:189-218.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.params import OFDMConfig


@functools.lru_cache(maxsize=16)
def _idft_mats(nfft: int):
    n = np.arange(nfft)
    w = np.exp(2j * np.pi * np.outer(n, n) / nfft) / nfft   # IDFT matrix
    return (w.real.astype(np.float32), w.imag.astype(np.float32))


def _kernel(cp: int, gr_ref, gi_ref, wr_ref, wi_ref, or_ref, oi_ref):
    gr, gi = gr_ref[:], gi_ref[:]
    wr, wi = wr_ref[:], wi_ref[:]
    # batched IDFT on the MXU: x = g @ W  (complex via 4 real matmuls)
    xr = (jnp.dot(gr, wr, preferred_element_type=jnp.float32) -
          jnp.dot(gi, wi, preferred_element_type=jnp.float32))
    xi = (jnp.dot(gr, wi, preferred_element_type=jnp.float32) +
          jnp.dot(gi, wr, preferred_element_type=jnp.float32))
    nfft = xr.shape[-1]
    # CP prepend (cyclic copy) -> [T, cp + nfft]
    tr = jnp.concatenate([xr[:, nfft - cp:], xr], axis=1)
    ti = jnp.concatenate([xi[:, nfft - cp:], xi], axis=1)
    n_t = nfft + cp
    # stage 1: scale each symbol to unit mean energy
    energy = jnp.sum(tr * tr + ti * ti, axis=1, keepdims=True)
    scale = jnp.where(energy > 1e-30,
                      jax.lax.rsqrt(jnp.maximum(energy, 1e-30) / n_t), 1.0)
    tr = tr * scale
    ti = ti * scale
    # stage 2: divide by sqrt(var) (complex variance, mean-subtracted)
    mr = jnp.mean(tr, axis=1, keepdims=True)
    mi = jnp.mean(ti, axis=1, keepdims=True)
    p = jnp.mean((tr - mr) ** 2 + (ti - mi) ** 2, axis=1, keepdims=True)
    inv = jax.lax.rsqrt(jnp.maximum(p, 1e-30))
    or_ref[:] = tr * inv
    oi_ref[:] = ti * inv


def modulate_planar(cfg: OFDMConfig, grid_re: jnp.ndarray,
                    grid_im: jnp.ndarray, interpret: bool = False):
    """[S, nfft] re/im grid -> ([S, nfft+cp] re, im) time symbols."""
    s = grid_re.shape[0]
    wr, wi = _idft_mats(cfg.nfft)
    out_shape = jax.ShapeDtypeStruct((s, cfg.nfft + cfg.cp_len), jnp.float32)
    flops = 4 * 2 * s * cfg.nfft * cfg.nfft
    return pl.pallas_call(
        functools.partial(_kernel, cfg.cp_len),
        out_shape=(out_shape, out_shape),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=4 * s * (2 * cfg.nfft + 2 * (cfg.nfft + cfg.cp_len)),
            transcendentals=0),
        interpret=interpret,
    )(grid_re.astype(jnp.float32), grid_im.astype(jnp.float32),
      jnp.asarray(wr), jnp.asarray(wi))


def modulate(cfg: OFDMConfig, grid: jnp.ndarray,
             interpret: bool = False) -> jnp.ndarray:
    """Drop-in for ops.ofdm.modulate via the fused kernel."""
    tr, ti = modulate_planar(cfg, grid.real, grid.imag, interpret)
    return (tr + 1j * ti).reshape(-1).astype(jnp.complex64)
