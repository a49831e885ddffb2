"""Pallas TPU kernel: fused OFDM modulator — batched IDFT (as a real matmul
on the MXU) + cyclic-prefix extension + the reference's two-stage per-symbol
power normalisation, in ONE VMEM-resident pass.

Why a kernel: the XLA path (ops/ofdm.py:modulate) runs ifft -> concat ->
norm as separate HBM-level ops; for the small NFFTs of this workload
(64..2048) the DFT-as-matmul formulation keeps the whole symbol tile in
VMEM, feeds the MXU directly, and fuses the CP copy + both normalisations
into the same pass — one HBM read of the grid, one HBM write of the frame.

Round-4 restructure (VERDICT r3 #8): the full-resident IDFT matrices are
2*nfft^2*4 B — 33.5 MB at NFFT 2048, over the ~16 MB VMEM and the round-2/3
OOM.  The contraction (grid-column) axis is now blocked through the Pallas
grid: step q loads only the [kt, nfft] row slab of each IDFT matrix and the
matching [s, kt] grid column slice, accumulating the partial IDFT into VMEM
scratch; the CP copy + normalisations run once on the last step.  Peak VMEM
is ~2*kt*nfft*4 (weight slabs) + 2*s*nfft*4 (accumulators) + in/out tiles —
under 10 MB for every shipped config including NFFT 2048.

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


def _contraction_tile(nfft: int) -> int:
    """Largest multiple-of-128 (>= min(nfft, 128)) contraction tile keeping
    the two [kt, nfft] f32 weight slabs under ~6 MB."""
    if nfft <= 128:
        return nfft
    budget = max(128, 6 * 2 ** 20 // (2 * 4 * nfft))
    kt = 128
    while kt * 2 <= budget and kt * 2 <= nfft:   # power-of-two divisor
        kt *= 2
    return kt


def _kernel(cp: int, n_q: int, gr_ref, gi_ref, wr_ref, wi_ref,
            or_ref, oi_ref, xr_acc, xi_acc):
    q = pl.program_id(0)
    gr, gi = gr_ref[:], gi_ref[:]
    wr, wi = wr_ref[:], wi_ref[:]
    # partial batched IDFT on the MXU: x += g[:, qk] @ W[qk, :]
    pr = (jnp.dot(gr, wr, preferred_element_type=jnp.float32) -
          jnp.dot(gi, wi, preferred_element_type=jnp.float32))
    pi = (jnp.dot(gr, wi, preferred_element_type=jnp.float32) +
          jnp.dot(gi, wr, preferred_element_type=jnp.float32))

    @pl.when(q == 0)
    def _init():
        xr_acc[:] = pr
        xi_acc[:] = pi

    @pl.when(q > 0)
    def _acc():
        xr_acc[:] += pr
        xi_acc[:] += pi

    @pl.when(q == n_q - 1)
    def _finish():
        xr, xi = xr_acc[:], xi_acc[:]
        nfft = xr.shape[-1]
        # CP prepend (cyclic copy) -> [T, cp + nfft]
        tr = jnp.concatenate([xr[:, nfft - cp:], xr], axis=1)
        ti = jnp.concatenate([xi[:, nfft - cp:], xi], axis=1)
        n_t = nfft + cp
        # stage 1: scale each symbol to unit mean energy
        energy = jnp.sum(tr * tr + ti * ti, axis=1, keepdims=True)
        scale = jnp.where(energy > 1e-30,
                          jax.lax.rsqrt(jnp.maximum(energy, 1e-30) / n_t),
                          1.0)
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
    nfft = cfg.nfft
    wr, wi = _idft_mats(nfft)
    kt = _contraction_tile(nfft)
    n_q = -(-nfft // kt)
    assert nfft % kt == 0, (nfft, kt)
    out_shape = jax.ShapeDtypeStruct((s, nfft + cfg.cp_len), jnp.float32)
    flops = 4 * 2 * s * nfft * nfft
    gspec = pl.BlockSpec((s, kt), lambda q: (0, q), memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((kt, nfft), lambda q: (q, 0),
                         memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((s, nfft + cfg.cp_len), lambda q: (0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, cfg.cp_len, n_q),
        grid=(n_q,),
        out_shape=(out_shape, out_shape),
        in_specs=[gspec, gspec, wspec, wspec],
        out_specs=(ospec, ospec),
        scratch_shapes=[pltpu.VMEM((s, nfft), jnp.float32),
                        pltpu.VMEM((s, nfft), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=4 * s * (2 * nfft + 2 * (nfft + cfg.cp_len)),
            transcendentals=0),
        interpret=interpret,
    )(grid_re.astype(jnp.float32), grid_im.astype(jnp.float32),
      jnp.asarray(wr), jnp.asarray(wi))


def modulate(cfg: OFDMConfig, grid: jnp.ndarray,
             interpret: bool = False) -> jnp.ndarray:
    """Drop-in for ops.ofdm.modulate via the fused kernel."""
    tr, ti = modulate_planar(cfg, grid.real, grid.imag, interpret)
    return (tr + 1j * ti).reshape(-1).astype(jnp.complex64)
