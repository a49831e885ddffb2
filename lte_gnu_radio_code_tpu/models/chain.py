"""Full loopback chain — the TPU-native replacement for ofdm_chain.py (D1)
and SDRScript.py (D2): bits -> TX -> multipath channel -> AWGN -> RX -> bits,
as ONE jitted function.

Reference: GNU-Radio-Repositories/ofdm_chain.py:81-91 (loopback flowgraph),
txrx_mod/SDRScript.py:43-161 (offline simulation driver).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from ..ops import channel as chan_ops
from ..utils.params import OFDMConfig
from . import rxofdm, txofdm


class ChainResult(NamedTuple):
    hard_bits: jnp.ndarray
    ber: jnp.ndarray
    phasors: jnp.ndarray
    lock_ptr: jnp.ndarray
    delay_idx: jnp.ndarray
    found: jnp.ndarray


def chain_step(cfg: OFDMConfig, bits: jnp.ndarray, key: jax.Array,
               h: jnp.ndarray, n_trials: int, num_patterns: int,
               **rx_kwargs) -> ChainResult:
    tx = txofdm.tx_frame(cfg, bits)
    rx_clean = chan_ops.apply_channel(tx, h, max_impulse=cfg.nfft)
    sig_pow = jnp.mean(jnp.abs(tx - jnp.mean(tx)) ** 2)     # np.var of TX buffer
    rx = chan_ops.awgn(cfg, rx_clean, key, sig_pow)
    r = rxofdm.rx_frame(cfg, rx, n_trials, num_patterns, **rx_kwargs)
    nb = min(r.hard_bits.shape[0], bits.shape[0])
    ber = jnp.mean((r.hard_bits[:nb] != bits[:nb]).astype(jnp.float32))
    return ChainResult(r.hard_bits, ber, r.phasors, r.lock_ptr, r.delay_idx,
                       r.found)


def make_chain(cfg: OFDMConfig, **rx_kwargs):
    """Jitted full loopback for the config's canonical frame length.

    rx_kwargs forward to rx_frame (fast=, genie_h=, perfect_chan_est= — the
    genie isolation mode of TEST synch_and_chan_est.py:213-215).  When
    ``perfect_chan_est`` is requested without an explicit ``genie_h``, the
    chain's own channel taps are used."""
    n_samples = cfg.frame_len + cfg.nfft - 1                # + channel tail
    n_trials, num_patterns = rxofdm.plan_rx(cfg, n_samples)
    # NumPy constant: baked into the jitted program at trace time (the axon
    # TPU tunnel does not implement eager complex host->device transfers)
    h = chan_ops.channel_taps(
        cfg.channel if cfg.channel != "AWGN" else "Ideal")
    if rx_kwargs.get("perfect_chan_est") and "genie_h" not in rx_kwargs:
        rx_kwargs["genie_h"] = np.concatenate(
            [h, np.zeros(cfg.nfft - len(h), h.dtype)])
    return jax.jit(functools.partial(
        chain_step, cfg, h=h, n_trials=n_trials, num_patterns=num_patterns,
        **rx_kwargs))


def ber_sweep(cfg: OFDMConfig, snr_dbs, seeds=range(4)):
    """BER vs SNR sweep (BASELINE.json config 4).  Returns {snr_db: ber}."""
    out = {}
    for snr in snr_dbs:
        c = functools.partial(
            OFDMConfig, **{**cfg.__dict__, "snr_db": float(snr)})().validate()
        f = make_chain(c)
        bers = []
        for s in seeds:
            key = jax.random.PRNGKey(s)
            bits = jnp.asarray(
                np.random.default_rng(s).integers(0, 2, c.num_bits),
                dtype=jnp.int32)
            bers.append(float(f(bits, key).ber))
        out[float(snr)] = float(np.mean(bers))
    return out
