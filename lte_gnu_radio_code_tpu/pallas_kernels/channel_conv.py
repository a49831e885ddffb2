"""Pallas TPU kernel: short-CIR multipath channel convolution in ONE pass.

The chain's channel stage convolves each frame with a <=16-tap complex CIR
(MultiAntennaSystem.rx_signal_gen:221-231 — np.convolve per frame).  The
XLA shifted-add form (ops/channel.py) materialises a padded copy per tap
(~10 elementwise HBM passes); the conv op on this backend is worse still
(BASELINE.md round-4 note).  This kernel reads the signal once (as
overlap-save rows), forms the taps as in-VMEM lane-shifted slices, and
writes the result once.

Layout: the [B, n] frame batch is re-rowed into overlap-save chunks
[B*nr, nc + taps - 1] (consecutive chunks overlap by taps-1 samples — a
single static-index gather pass), the kernel computes a VALID convolution
per row, and the outputs reassemble by plain reshape.  This keeps the
VMEM row tile small for ANY frame length (the flat [B, n] form needed the
whole 82k-sample axis resident — over VMEM at LTE numerology).  Tap
coefficients are Python floats closed over at trace time.

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

_NC = 16384           # output samples per overlap-save row (lane-aligned)


def _kernel(taps_ri, nc, xr_ref, xi_ref, yr_ref, yi_ref):
    xr, xi = xr_ref[:], xi_ref[:]
    t = len(taps_ri)
    yr = jnp.zeros((xr.shape[0], nc), jnp.float32)
    yi = jnp.zeros((xr.shape[0], nc), jnp.float32)
    for k, (hr, hi) in enumerate(taps_ri):
        s = t - 1 - k
        xrs = xr[:, s: s + nc]
        xis = xi[:, s: s + nc]
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
    nc = min(_NC, -(-l_out // 128) * 128)
    nr = -(-l_out // nc)
    # xp[j] = x[j - (t-1)] with zeros outside; row r needs
    # xp[r*nc : r*nc + nc + t - 1]  (y[m] = sum_k h_k xp[m + t-1 - k])
    xp_re = jnp.pad(x.real.astype(jnp.float32),
                    ((0, 0), (t - 1, nr * nc + t - 1 - n - (t - 1))))
    xp_im = jnp.pad(x.imag.astype(jnp.float32),
                    ((0, 0), (t - 1, nr * nc + t - 1 - n - (t - 1))))
    win = (np.arange(nr)[:, None] * nc +
           np.arange(nc + t - 1)[None, :])          # static overlap windows
    wr = xp_re[:, jnp.asarray(win)].reshape(b * nr, nc + t - 1)
    wi = xp_im[:, jnp.asarray(win)].reshape(b * nr, nc + t - 1)
    rows = b * nr
    # row tile: 2 in [rt, nc+t-1] + 2 out + accumulators [rt, nc] ~ 6 bufs
    per_row = 4 * (2 * (nc + t - 1) + 4 * nc)
    rt = max(1, 8 * 2 ** 20 // per_row)
    if rt >= rows:
        rt = rows                   # one tile == full array: any row count
    else:
        rt = max(8, rt // 8 * 8)
    n_rt = -(-rows // rt)
    rp = n_rt * rt
    if rp != rows:
        wr = jnp.pad(wr, ((0, rp - rows), (0, 0)))
        wi = jnp.pad(wi, ((0, rp - rows), (0, 0)))
    ispec = pl.BlockSpec((rt, nc + t - 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((rt, nc), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((rp, nc), jnp.float32)
    yr, yi = pl.pallas_call(
        functools.partial(_kernel, taps_ri, nc),
        grid=(n_rt,),
        out_shape=(out_shape, out_shape),
        in_specs=[ispec, ispec],
        out_specs=(ospec, ospec),
        cost_estimate=pl.CostEstimate(
            flops=8 * rp * nc * t,
            bytes_accessed=4 * rp * (2 * (nc + t - 1) + 2 * nc),
            transcendentals=0),
        interpret=jax.default_backend() != "tpu",
    )(wr, wi)
    y = (yr[:rows] + 1j * yi[:rows]).astype(jnp.complex64)
    return y.reshape(b, nr * nc)[:, :l_out]


def apply_channel_frames(x: jnp.ndarray, h: np.ndarray,
                         max_impulse: int) -> jnp.ndarray:
    """Batched drop-in for vmap(ops.channel.apply_channel): [B, n] ->
    [B, n + max_impulse - 1] (zero tail past the CIR length)."""
    y = conv_frames(x, np.asarray(h))
    n_out = x.shape[1] + max_impulse - 1
    return jnp.pad(y, ((0, 0), (0, n_out - y.shape[1])))
