"""Pallas TPU kernel: short-CIR multipath channel convolution in ONE pass.

The chain's channel stage convolves each frame with a <=16-tap complex CIR
(MultiAntennaSystem.rx_signal_gen:221-231 — np.convolve per frame).  The
XLA shifted-add form (ops/channel.py) materialises a padded copy per tap
(~10 elementwise HBM passes); the conv op on this backend is worse still
(BASELINE.md round-4 note).  This kernel reads the padded signal once,
forms the taps as in-VMEM lane-shifted slices, and writes the result once
— the theoretical traffic is 2 passes over the buffer instead of ~10.

Layout: planar float32 [rows, L] with the sample axis whole per row tile
(row-tiled grid; L = n + taps - 1 output samples, input padded to
n + 2*(taps-1) so every tap's slice is in range).  Tap coefficients are
Python floats closed over at trace time.

Mathematically identical to np.convolve (same ascending-tap accumulation
order as ops/channel.py's shifted-add path; float32 rounding).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(taps_ri, l_out, xr_ref, xi_ref, yr_ref, yi_ref):
    xr, xi = xr_ref[:], xi_ref[:]
    t = len(taps_ri)
    yr = jnp.zeros((xr.shape[0], l_out), jnp.float32)
    yi = jnp.zeros((xr.shape[0], l_out), jnp.float32)
    for k, (hr, hi) in enumerate(taps_ri):
        s = t - 1 - k
        xrs = xr[:, s: s + l_out]
        xis = xi[:, s: s + l_out]
        yr += hr * xrs - hi * xis
        yi += hr * xis + hi * xrs
    yr_ref[:] = yr
    yi_ref[:] = yi


def conv_frames(x: jnp.ndarray, h: np.ndarray) -> jnp.ndarray:
    """[B, n] complex frames (*) [taps] complex CIR -> [B, n+taps-1].

    h must be a concrete NumPy array (trace-time constant, <= 16 taps)."""
    assert isinstance(h, np.ndarray) and h.ndim == 1 and h.shape[0] <= 16
    b, n = x.shape
    t = h.shape[0]
    l_out = n + t - 1
    taps_ri = tuple((float(np.real(h[k])), float(np.imag(h[k])))
                    for k in range(t))
    # pad so tap k's slice [t-1-k : t-1-k+l_out] is in range; zeros outside
    xr = jnp.pad(x.real.astype(jnp.float32), ((0, 0), (t - 1, t - 1)))
    xi = jnp.pad(x.imag.astype(jnp.float32), ((0, 0), (t - 1, t - 1)))
    lp = xr.shape[1]
    # row tile: 2 planar inputs [rt, lp] + 2 outputs [rt, l_out] + the
    # accumulators under ~10 MiB
    per_row = 4 * (2 * lp + 4 * l_out)
    rt = max(1, (10 * 2 ** 20 // per_row))
    rt = min(rt, b)
    n_rt = -(-b // rt)
    bp = n_rt * rt
    if bp != b:
        xr = jnp.pad(xr, ((0, bp - b), (0, 0)))
        xi = jnp.pad(xi, ((0, bp - b), (0, 0)))
    ispec = pl.BlockSpec((rt, lp), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((rt, l_out), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((bp, l_out), jnp.float32)
    yr, yi = pl.pallas_call(
        functools.partial(_kernel, taps_ri, l_out),
        grid=(n_rt,),
        out_shape=(out_shape, out_shape),
        in_specs=[ispec, ispec],
        out_specs=(ospec, ospec),
        cost_estimate=pl.CostEstimate(
            flops=8 * bp * l_out * t,
            bytes_accessed=4 * bp * (2 * lp + 2 * l_out),
            transcendentals=0),
        interpret=jax.default_backend() != "tpu",
    )(xr, xi)
    return (yr[:b] + 1j * yi[:b]).astype(jnp.complex64)


def apply_channel_frames(x: jnp.ndarray, h: np.ndarray,
                         max_impulse: int) -> jnp.ndarray:
    """Batched drop-in for vmap(ops.channel.apply_channel): [B, n] ->
    [B, n + max_impulse - 1] (zero tail past the CIR length)."""
    y = conv_frames(x, np.asarray(h))
    n_out = x.shape[1] + max_impulse - 1
    return jnp.pad(y, ((0, 0), (0, n_out - y.shape[1])))
