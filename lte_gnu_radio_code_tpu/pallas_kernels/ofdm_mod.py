"""Pallas TPU kernel: fused OFDM modulator — batched IDFT (as a real matmul
on the MXU) + cyclic-prefix extension + the reference's two-stage per-symbol
power normalisation, in ONE VMEM-resident pass.

Why a kernel: the XLA path (ops/ofdm.py:modulate) runs ifft -> concat ->
norm as separate HBM-level ops, and on this backend the FFT op itself runs
at ~121 GFLOP/s algorithmic while the MXU sustains 122-186 TFLOP/s
(BASELINE.md round-4 calibration) — so the DFT-as-matmul formulation wins
despite the nfft/log(nfft) FLOP multiplier, exactly as it did for the sync
search.  The kernel keeps each symbol tile in VMEM, feeds the MXU directly,
and fuses the CP copy + both normalisations into the same pass — one HBM
read of the grid, one HBM write of the frame.

Round-4 restructure (VERDICT r3 #8): the full-resident IDFT matrices are
2*nfft^2*4 B — 33.5 MB at NFFT 2048, over the ~16 MB VMEM and the round-2/3
OOM.  The contraction (grid-column) axis is blocked through the Pallas
grid: step q loads only the [kt, nfft] row slab of each IDFT matrix and the
matching [s, kt] grid column slice, accumulating the partial IDFT into VMEM
scratch; the CP copy + normalisations run once on the last step.

Round-5 restructure (VERDICT r4 #1): the SYMBOL (row) axis is now blocked
through the grid as well, so whole-batch flattened calls (batch x symbols
rows — 2048 rows at lte1024 batch 32) fit VMEM: grid = (row tiles,
contraction tiles), with the accumulator scratch sized per row tile.  Rows
are independent (the normalisation is per symbol), so tiling the row axis
is exact.  This is what lets the verified bench chain run TX through the
kernel (BENCH_TX_PATH=pallas) instead of the backend FFT op.

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


def _row_tile(s: int, nfft: int, cp: int, kt: int) -> int:
    """Largest multiple-of-8 row tile keeping the per-tile VMEM residents
    (2 accumulators [rt, nfft] + 2 outputs [rt, nfft+cp] + 2 inputs
    [rt, kt]) under ~5 MiB.  The weight slabs (sized by _contraction_tile)
    add <= ~6 MiB on top; total stays within the ~16 MiB VMEM."""
    per_row = 4 * 2 * (nfft + (nfft + cp) + kt)
    rt = max(8, (5 * 2 ** 20 // per_row) // 8 * 8)
    return min(rt, -(-s // 8) * 8)


def _kernel(cp: int, n_q: int, gr_ref, gi_ref, wr_ref, wi_ref,
            or_ref, oi_ref, xr_acc, xi_acc):
    q = pl.program_id(1)
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


@functools.lru_cache(maxsize=16)
def _idft_bin_mats(nfft: int, bins: tuple):
    """[K, nfft] IDFT restricted to bin positions: W[k, n] =
    e^{+2pi i n b_k / N} / N.  Feeding data VALUES through this basis is
    the grid-free TX: the [S, nfft] resource-grid scatter (a pure
    data-movement stage measured at ~430 us/iter at lte1024 batch 16)
    never materialises."""
    n = np.arange(nfft)
    w = np.exp(2j * np.pi * np.outer(np.asarray(bins), n) / nfft) / nfft
    return (w.real.astype(np.float32), w.imag.astype(np.float32))


def _mod_rows_planar(cfg: OFDMConfig, in_re, in_im, wr, wi,
                     interpret: bool = False):
    """Shared row-tiled modulate kernel launch: [S, K] planar inputs
    through [K, nfft] planar weights -> [S, nfft+cp] planar time symbols
    (CP + two-stage per-symbol normalisation fused).  K is the contraction
    width (nfft for the full-grid form, padded bin count for the
    grid-free form)."""
    s, k = in_re.shape
    nfft = cfg.nfft
    kt = min(_contraction_tile(nfft), k)
    while k % kt:
        kt //= 2
    n_q = -(-k // kt)
    assert k % kt == 0, (k, kt)
    rt = _row_tile(s, nfft, cfg.cp_len, kt)
    n_rt = -(-s // rt)
    sp = n_rt * rt
    if sp != s:
        # zero row padding is exact: zero energy -> scale 1 -> zero output
        pad = ((0, sp - s), (0, 0))
        in_re = jnp.pad(in_re, pad)
        in_im = jnp.pad(in_im, pad)
    out_shape = jax.ShapeDtypeStruct((sp, nfft + cfg.cp_len), jnp.float32)
    flops = 4 * 2 * sp * k * nfft
    gspec = pl.BlockSpec((rt, kt), lambda i, q: (i, q),
                         memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((kt, nfft), lambda i, q: (q, 0),
                         memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((rt, nfft + cfg.cp_len), lambda i, q: (i, 0),
                         memory_space=pltpu.VMEM)
    tr, ti = pl.pallas_call(
        functools.partial(_kernel, cfg.cp_len, n_q),
        grid=(n_rt, n_q),
        out_shape=(out_shape, out_shape),
        in_specs=[gspec, gspec, wspec, wspec],
        out_specs=(ospec, ospec),
        scratch_shapes=[pltpu.VMEM((rt, nfft), jnp.float32),
                        pltpu.VMEM((rt, nfft), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=4 * sp * (2 * k + 2 * (nfft + cfg.cp_len)),
            transcendentals=0),
        interpret=interpret,
    )(in_re.astype(jnp.float32), in_im.astype(jnp.float32),
      jnp.asarray(wr), jnp.asarray(wi))
    return tr[:s], ti[:s]


def modulate_planar(cfg: OFDMConfig, grid_re: jnp.ndarray,
                    grid_im: jnp.ndarray, interpret: bool = False):
    """[S, nfft] re/im grid -> ([S, nfft+cp] re, im) time symbols.

    S may be any row count (batch x symbols flattened is the intended
    whole-batch shape) — rows are normalised independently, and the row
    axis is grid-tiled so arbitrary S fits VMEM."""
    wr, wi = _idft_mats(cfg.nfft)
    return _mod_rows_planar(cfg, grid_re, grid_im, wr, wi, interpret)


def modulate_data_vals(cfg: OFDMConfig, vals: jnp.ndarray, bins,
                       interpret: bool = False) -> jnp.ndarray:
    """GRID-FREE data-symbol modulate: [S_d, K] complex data VALUES (K =
    num_data_bins, in used_bins order) -> [S_d, nfft+cp] complex time
    symbols, IDFT restricted to the bin positions.  Mathematically equal
    to resource_grid + modulate for the data rows (the skipped bins are
    zero), minus the scatter/concat grid assembly entirely."""
    k = vals.shape[-1]
    kp = -(-k // 128) * 128        # lane-align the contraction width
    wr, wi = _idft_bin_mats(cfg.nfft, tuple(int(b) for b in bins))
    if kp != k:
        wr = np.pad(wr, ((0, kp - k), (0, 0)))
        wi = np.pad(wi, ((0, kp - k), (0, 0)))
        vals = jnp.pad(vals, ((0, 0), (0, kp - k)))
    tr, ti = _split_rows(
        lambda re, im: _mod_rows_planar(cfg, re, im, wr, wi, interpret),
        vals.shape[0], cfg.nfft + cfg.cp_len, vals.real, vals.imag)
    return (tr + 1j * ti).astype(jnp.complex64)


def _max_call_rows(out_lanes: int) -> int:
    """Per-call row cap: XLA has been seen staging a pallas call's whole
    [rows, nfft+cp] f32 planar OUTPUT PAIR through scoped VMEM (17.5-17.8
    MiB > the 16 MiB limit) despite the row-tiled BlockSpecs — keep each
    call's two outputs under ~12 MiB combined and split bigger flattened
    batches into row slabs host-side."""
    return max(256, (12 * 2 ** 20 // (8 * out_lanes)) // 128 * 128)


def _split_rows(fn, total_rows, out_lanes, *arrays):
    cap = _max_call_rows(out_lanes)
    if total_rows <= cap:
        return fn(*arrays)
    outs = [fn(*(a[i: i + cap] for a in arrays))
            for i in range(0, total_rows, cap)]
    return tuple(jnp.concatenate(parts) for parts in zip(*outs))


def modulate_rows(cfg: OFDMConfig, grid: jnp.ndarray,
                  interpret: bool = False) -> jnp.ndarray:
    """[S, nfft] complex grid -> [S, nfft+cp] complex time symbols."""
    tr, ti = _split_rows(
        lambda re, im: modulate_planar(cfg, re, im, interpret),
        grid.shape[0], cfg.nfft + cfg.cp_len, grid.real, grid.imag)
    return (tr + 1j * ti).astype(jnp.complex64)


def modulate(cfg: OFDMConfig, grid: jnp.ndarray,
             interpret: bool = False) -> jnp.ndarray:
    """Drop-in for ops.ofdm.modulate via the fused kernel."""
    return modulate_rows(cfg, grid, interpret).reshape(-1)
