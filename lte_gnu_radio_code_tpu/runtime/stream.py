"""Streaming runtime — the TPU-native replacement for GNU Radio's
thread-per-block scheduler and ring buffers (SURVEY.md §2.8 X1-X3).

Where GNU Radio calls ``work(input_items)`` with whatever samples are
available and blocks carry sync state across calls (`time_synch_ref`,
`cor_obs`, channel estimates — synch_and_chan_est.py:76-103), here a chunked
sample stream drives ONE jitted step function with an explicit carry:

  state_{t+1}, out_t = step(state_t, chunk_t)

The carry holds the overlap-save history tail (the `M[0]*(NFFT+CP)+NFFT`
boundary samples of SURVEY.md §5), the cross-chunk refractory pointer, the
single-lock flag + channel estimate, and the next pattern-block index.  The
chunked outputs concatenate to exactly the batch RX's output (tested in
tests/test_runtime.py) — streaming is a re-batching of the same math, not a
different algorithm.

All shapes are static: every chunk processes chunk_len/stride trials and at
most chunk_len/block+2 pattern blocks.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from ..ops import modulation, sync
from ..utils.params import OFDMConfig, used_bins


class StreamState(NamedTuple):
    hist: jnp.ndarray        # [hist_len] trailing samples of previous chunks
    base: jnp.ndarray        # global sample index of the next chunk's start
    locked: jnp.ndarray      # bool — single-lock flag (R2/R10 semantics)
    lock_ptr: jnp.ndarray    # global lock pointer
    delay_idx: jnp.ndarray
    chan_full: jnp.ndarray   # [nfft] locked channel estimate
    next_k: jnp.ndarray      # next pattern-block index to demodulate
    last_det_ptr: jnp.ndarray  # refractory reference across chunks


class ChunkOut(NamedTuple):
    phasors: jnp.ndarray     # [kmax, nd, num_data_bins]
    block_ids: jnp.ndarray   # [kmax] global pattern-block index (or -1)
    valid: jnp.ndarray       # [kmax] bool
    found: jnp.ndarray       # bool — locked as of end of this chunk
    lock_ptr: jnp.ndarray


def hist_len_for(cfg: OFDMConfig) -> int:
    """Max window reach beyond a trial/block start — the halo rule."""
    sync_reach = cfg.cp_len + cfg.m_synch * cfg.rx_b_len + cfg.nfft
    data_reach = cfg.pattern_len * cfg.rx_b_len + cfg.nfft
    return max(sync_reach, data_reach)


def init_state(cfg: OFDMConfig, chunk_len: int) -> StreamState:
    h = hist_len_for(cfg)
    return StreamState(
        hist=jnp.zeros(h, jnp.complex64),
        base=jnp.int32(0),
        locked=jnp.bool_(False),
        lock_ptr=jnp.int32(0),
        delay_idx=jnp.int32(0),
        chan_full=jnp.zeros(cfg.nfft, jnp.complex64),
        next_k=jnp.int32(0),
        last_det_ptr=jnp.int32(0),
    )


def stream_step(cfg: OFDMConfig, state: StreamState, chunk: jnp.ndarray,
                num_patterns_total: int) -> tuple[StreamState, ChunkOut]:
    chunk_len = chunk.shape[0]
    hist_len = hist_len_for(cfg)
    assert chunk_len % max(1, cfg.stride) == 0, "chunk must be stride-aligned"
    ext = jnp.concatenate([state.hist, chunk])     # covers [base-hist, base+chunk)
    ext_start = state.base - hist_len              # global coord of ext[0]

    # -- sync search over the trials that became fully readable this chunk --
    # trial start offsets (global) s in [base - hist_len + cp, ...): each
    # chunk advances by chunk_len, so process chunk_len/stride trials whose
    # windows end inside ext.
    t_per = chunk_len // max(1, cfg.stride)
    spectra = sync.sync_spectra(cfg, ext, t_per)   # local offsets cp + j*stride
    corr = jnp.abs(sync.sync_correlate(cfg, spectra))
    dmax_val = jnp.max(corr, axis=-1)
    dmax_ind = jnp.argmax(corr, axis=-1)
    gate = cfg.detection_gate * cfg.m_synch * cfg.num_synch_bins
    local_ptrs = cfg.cp_len + cfg.stride * jnp.arange(t_per)
    global_ptrs = (ext_start + local_ptrs).astype(jnp.int32)
    # batch RX never evaluates trials before cp (sync.sync_spectra's first
    # window); mask them so the stream locks identically
    crossing = (dmax_val > gate) & (global_ptrs >= cfg.cp_len)

    # first un-refractory crossing while not locked (single-lock semantics)
    refractory = 2 * cfg.cp_len + cfg.nfft
    ok = crossing & ((global_ptrs - state.last_det_ptr > refractory) |
                     (state.last_det_ptr == 0))
    any_new = jnp.any(ok) & ~state.locked
    first_j = jnp.argmax(ok)
    new_lock_ptr = global_ptrs[first_j]
    new_delay = dmax_ind[first_j]
    _, new_chan, _ = sync.estimate_channel(cfg, spectra[first_j], new_delay)

    locked = state.locked | any_new
    lock_ptr = jnp.where(any_new, new_lock_ptr, state.lock_ptr)
    delay_idx = jnp.where(any_new, new_delay, state.delay_idx)
    chan_full = jnp.where(any_new, new_chan, state.chan_full)
    last_det = jnp.where(any_new, new_lock_ptr, state.last_det_ptr)

    # -- data demod: pattern blocks whose full window is inside ext ---------
    _, data_bins = used_bins(cfg.nfft, cfg.num_data_bins)
    data_bins = np.asarray(data_bins)
    m0, nd = cfg.m_synch, cfg.synch_dat[1]
    block = cfg.pattern_len * cfg.rx_b_len
    kmax = chunk_len // block + 2

    k = jnp.where(locked, jnp.where(any_new, 0, state.next_k), 0) \
        + jnp.arange(kmax)
    b_k = lock_ptr + k * block
    # readable iff the last sample needed is below base+chunk_len and the
    # first is at/after ext_start
    last_need = b_k + (m0 + nd - 1) * cfg.rx_b_len + cfg.nfft
    readable = (last_need <= state.base + chunk_len) & (b_k >= ext_start)
    valid = locked & readable & (k < num_patterns_total)

    rel = jnp.where(valid, b_k - ext_start, 0)
    start = rel[:, None] + (m0 + jnp.arange(nd))[None, :] * cfg.rx_b_len
    idx = start[..., None] + jnp.arange(cfg.nfft)[None, None, :]
    f = jnp.fft.fft(ext[idx], cfg.nfft, axis=-1)
    fd = f[..., data_bins]
    power = jnp.sum(jnp.abs(fd) ** 2, axis=-1, keepdims=True)
    fd = fd * jnp.sqrt(fd.shape[-1] / jnp.maximum(power, 1e-30))
    rot = jnp.exp((1j * 2.0 * jnp.pi / cfg.nfft) *
                  delay_idx.astype(jnp.float32) *
                  jnp.asarray(data_bins, jnp.float32))
    eq = sync.mmse_gain(chan_full[data_bins], cfg.snr_linear)
    phasors = fd * rot[None, None, :] * eq[None, None, :] * valid[:, None, None]

    n_done = jnp.sum(valid.astype(jnp.int32))
    next_k = jnp.where(locked, jnp.where(any_new, 0, state.next_k) + n_done,
                       0)

    new_state = StreamState(
        hist=ext[-hist_len:],
        base=state.base + chunk_len,
        locked=locked, lock_ptr=lock_ptr, delay_idx=delay_idx,
        chan_full=chan_full, next_k=next_k, last_det_ptr=last_det)
    out = ChunkOut(phasors=phasors,
                   block_ids=jnp.where(valid, k, -1),
                   valid=valid, found=locked, lock_ptr=lock_ptr)
    return new_state, out


class StreamingRx:
    """Host-side driver holding the jitted step + device-resident state.

    The GNU Radio analog: one sync_block whose work() is `step`, with the
    scheduler loop replaced by `push(chunk)` calls.
    """

    def __init__(self, cfg: OFDMConfig, chunk_len: int,
                 num_patterns_total: int | None = None):
        if num_patterns_total is None:
            num_patterns_total = cfg.num_patterns
        self.cfg = cfg
        self.chunk_len = chunk_len
        self.state = init_state(cfg, chunk_len)
        self._step = jax.jit(functools.partial(
            stream_step, cfg, num_patterns_total=num_patterns_total))

    def push(self, chunk) -> ChunkOut:
        chunk = jnp.asarray(chunk, jnp.complex64)
        assert chunk.shape[0] == self.chunk_len
        self.state, out = self._step(self.state, chunk)
        return out

    def finish(self) -> ChunkOut:
        """Flush: push zeros so trailing blocks inside the history resolve."""
        return self.push(jnp.zeros(self.chunk_len, jnp.complex64))

    # -- checkpoint/resume (SURVEY.md §5: pickle persistence, done as npz) --
    def save_state(self, path) -> None:
        """Persist the carry so a stream can resume in a new process.
        Complex fields stored planar (re/im) — transfer-safe everywhere."""
        s = self.state
        np.savez_compressed(
            path,
            hist_re=np.asarray(s.hist.real), hist_im=np.asarray(s.hist.imag),
            base=np.asarray(s.base), locked=np.asarray(s.locked),
            lock_ptr=np.asarray(s.lock_ptr),
            delay_idx=np.asarray(s.delay_idx),
            chan_re=np.asarray(s.chan_full.real),
            chan_im=np.asarray(s.chan_full.imag),
            next_k=np.asarray(s.next_k),
            last_det_ptr=np.asarray(s.last_det_ptr))

    def load_state(self, path) -> None:
        with np.load(path) as z:
            self.state = StreamState(
                hist=jnp.asarray(z["hist_re"] + 1j * z["hist_im"],
                                 jnp.complex64),
                base=jnp.int32(z["base"]),
                locked=jnp.bool_(z["locked"]),
                lock_ptr=jnp.int32(z["lock_ptr"]),
                delay_idx=jnp.int32(z["delay_idx"]),
                chan_full=jnp.asarray(z["chan_re"] + 1j * z["chan_im"],
                                      jnp.complex64),
                next_k=jnp.int32(z["next_k"]),
                last_det_ptr=jnp.int32(z["last_det_ptr"]))
