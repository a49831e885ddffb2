"""Sharded continuous streaming — the composition of the time-axis sharded
RX (parallel/sharded.py) with the multi-detection stream carry
(runtime/stream.py): every chunk of an endless stream is itself sharded over
the mesh's "t" axis, and detections are deduplicated across BOTH chunk edges
(the carried refractory state) and shard edges (a trial-ordered global scan
over all-gathered peaks).

Per chunk, inside one shard_map:

  1. each shard receives its LEFT neighbour's trailing ``lag`` samples via
     ``lax.ppermute`` (shard 0 takes the stream carry's history instead), so
     every trial's full pattern reach — sync windows and its data symbols —
     is local,
  2. each shard runs the dense conv-bank correlation on its own trials,
  3. per-trial peaks are ``all_gather``-ed in global trial order (a few KB)
     and the refractory scan runs replicated, continuing the carried
     (last_det_ptr, any_det) — identical acceptance to one global scan over
     the unsharded, unchunked stream,
  4. each shard demodulates the detections whose windows it owns; the fixed
     [det_max] tables merge with ``psum``.

Result: chunked + sharded == the single-device batch rx_detections,
bit-for-bit, for any chunk size and shard count (tests/test_stream_rx.py).

This is the SURVEY.md §5 "sequence scaling story": the halo rule of
synch_and_chan_est.py:147 applied across both chunk and shard boundaries.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..models import stream_rx
from ..ops import sync
from ..runtime.stream import ReacqChunkOut, ReacqState, reacq_init, reacq_lag
from ..utils.params import OFDMConfig


def _body(cfg: OFDMConfig, hist, x_local, base, real_end, last_det_ptr,
          any_det, n_real, *, axis: str, n_shards: int, det_max: int, fast):
    lag = reacq_lag(cfg)
    l_loc = x_local.shape[0]
    assert lag <= l_loc, (
        f"shard chunk ({l_loc}) smaller than the stream lag ({lag}); "
        "use a larger chunk or fewer shards")
    stride = max(1, cfg.stride)
    i = lax.axis_index(axis)

    # -- 1. left-halo exchange (shard 0 uses the carried history) ----------
    perm = [(s, (s + 1) % n_shards) for s in range(n_shards)]
    left = lax.ppermute(x_local[-lag:], axis, perm)
    left = jnp.where(i == 0, hist, left)
    ext_i = jnp.concatenate([left, x_local])

    # -- 2. local dense search ---------------------------------------------
    t_loc = l_loc // stride
    dmax_val, dmax_ind = stream_rx.detect_trials(cfg, ext_i, t_loc, fast)
    local_ptrs = (cfg.cp_len + stride * jnp.arange(t_loc)).astype(jnp.int32)
    my_start = base + i * l_loc - lag               # global coord of ext_i[0]
    global_ptrs = my_start + local_ptrs

    # -- 3. global trial-ordered refractory scan ----------------------------
    vals = lax.all_gather(dmax_val, axis, tiled=True)
    inds = lax.all_gather(dmax_ind, axis, tiled=True)
    gptrs = lax.all_gather(global_ptrs, axis, tiled=True)
    gate = cfg.detection_gate * cfg.m_synch * cfg.num_synch_bins
    crossing = (vals > gate) & (gptrs >= cfg.cp_len)
    g_det, (delays, peaks), count, (last_ptr, any_det1) = \
        sync.refractory_table(
            cfg, crossing, (inds, vals.astype(jnp.float32)), det_max,
            base - lag + cfg.cp_len, last_det_ptr, any_det)
    valid = jnp.arange(det_max) < count

    # -- 4. per-shard demod of owned detections, psum merge -----------------
    trial_idx = (g_det - (base - lag) - cfg.cp_len) // stride
    owner = trial_idx // t_loc
    mine = valid & (owner == i)
    ptr_rel = jnp.where(mine, g_det - my_start, 0)
    real_end1 = real_end + n_real
    chans_i, ph_i, ok_i = stream_rx.demod_detections(
        cfg, ext_i, ptr_rel, delays, mine, real_end1 - my_start)
    chans = lax.psum(chans_i, axis)
    phasors = lax.psum(ph_i, axis)
    demod_ok = lax.psum(ok_i.astype(jnp.int32), axis) > 0
    hard = stream_rx.hard_decide(cfg, phasors)

    hist_new = lax.psum(
        jnp.where(i == n_shards - 1, x_local[-lag:],
                  jnp.zeros(lag, jnp.complex64)), axis)

    new_state = ReacqState(hist=hist_new, base=base + n_shards * l_loc,
                           real_end=real_end1, last_det_ptr=last_ptr,
                           any_det=any_det1)
    out = ReacqChunkOut(ptrs=jnp.where(valid, g_det, -1), delays=delays,
                        peaks=peaks, valid=valid, demod_ok=demod_ok,
                        chans=chans, phasors=phasors, hard_bits=hard)
    return new_state, out


def make_sharded_reacq_step(cfg: OFDMConfig, chunk_len: int, mesh: Mesh,
                            axis: str = "t", det_max: int | None = None,
                            fast=None):
    """Jitted sharded chunk step: (state, chunk [chunk_len], n_real) ->
    (state, ReacqChunkOut).  chunk is sharded over ``axis``; state and
    outputs are replicated."""
    n_shards = mesh.shape[axis]
    assert chunk_len % (n_shards * max(1, cfg.stride)) == 0, (
        "chunk_len must be a multiple of n_shards * stride")
    if det_max is None:
        det_max = chunk_len // (2 * cfg.cp_len + cfg.nfft) + 1

    body = functools.partial(_body, cfg, axis=axis, n_shards=n_shards,
                             det_max=det_max, fast=fast)
    state_spec = ReacqState(*([P()] * 5))
    out_spec = ReacqChunkOut(*([P()] * 8))
    fn = shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(axis), P(), P(), P(), P(), P()),
        out_specs=(state_spec, out_spec), check_vma=False)

    @jax.jit
    def step(state: ReacqState, chunk, n_real):
        return fn(state.hist, chunk, state.base, state.real_end,
                  state.last_det_ptr, state.any_det, n_real)

    return step, det_max


class ShardedReacqStreamingRx:
    """Host driver: the ReacqStreamingRx semantics with every chunk
    time-sharded over the mesh."""

    def __init__(self, cfg: OFDMConfig, chunk_len: int, mesh: Mesh,
                 axis: str = "t", fast=None):
        self.cfg = cfg
        self.chunk_len = chunk_len
        self.mesh = mesh
        self._step, self.det_max = make_sharded_reacq_step(
            cfg, chunk_len, mesh, axis, fast=fast)
        self.state = reacq_init(cfg)
        self._many = {}

    def push(self, chunk, n_real: int | None = None) -> ReacqChunkOut:
        chunk = jnp.asarray(chunk, jnp.complex64)
        assert chunk.shape[0] == self.chunk_len
        if n_real is None:
            n_real = self.chunk_len
        self.state, out = self._step(self.state, chunk, jnp.int32(n_real))
        return out

    def push_many(self, chunks) -> ReacqChunkOut:
        """K sharded work() calls in ONE dispatch: lax.scan over the
        shard_map'd chunk step (see runtime.stream._push_many) — the
        sharded twin is bit-identical to K sequential push() calls."""
        chunks = jnp.asarray(chunks, jnp.complex64)
        assert chunks.ndim == 2 and chunks.shape[1] == self.chunk_len
        k = chunks.shape[0]
        if k not in self._many:
            step, n = self._step, self.chunk_len
            self._many[k] = jax.jit(lambda st, ch: jax.lax.scan(
                lambda s, c: step(s, c, jnp.int32(n)), st, ch))
        self.state, outs = self._many[k](self.state, chunks)
        return outs

    def finish(self) -> list[ReacqChunkOut]:
        outs = []
        flushed = 0
        while flushed < reacq_lag(self.cfg):
            outs.append(self.push(
                jnp.zeros(self.chunk_len, jnp.complex64), n_real=0))
            flushed += self.chunk_len
        return outs


# ---------------------------------------------------------------------------
# Sharded streaming for the legacy CFO/DSSS receiver (R4/R5)
# ---------------------------------------------------------------------------
#
# Same composition as above with the CFO-hypothesis search in place of the
# conv-bank: each shard scans the fo axis over its own trials
# (ops/cfo.py:cfo_search_scan), the (peak, delay, fo) triples all_gather in
# global trial order, the refractory scan runs replicated, and each shard
# demodulates (channel estimate + one CFO-re-mixed data symbol) the
# detections whose trials it owns.  Chunked + sharded == the single-device
# batch rx_frame_cfo, bit-for-bit (tests/test_stream_legacy.py).

from ..runtime.stream import (LegacyChunkOut, LegacyStreamState, legacy_init,
                              legacy_lag)


def _legacy_body(cfg: OFDMConfig, hist, x_local, base, real_end,
                 last_det_ptr, any_det, n_real, *, axis: str, n_shards: int,
                 det_max: int, bank, dsss: int):
    from ..ops import cfo as cfo_ops
    from ..utils.params import used_bins

    lag = legacy_lag(cfg)
    l_loc = x_local.shape[0]
    assert lag <= l_loc, (
        f"shard chunk ({l_loc}) smaller than the stream lag ({lag}); "
        "use a larger chunk or fewer shards")
    stride = max(1, cfg.stride)
    i = lax.axis_index(axis)

    # 1. left-halo exchange (shard 0 uses the carried history)
    perm = [(s, (s + 1) % n_shards) for s in range(n_shards)]
    left = lax.ppermute(x_local[-lag:], axis, perm)
    left = jnp.where(i == 0, hist, left)
    ext_i = jnp.concatenate([left, x_local])

    # 2. local CFO x delay search (fo axis lax.scan-ed)
    t_loc = l_loc // stride
    dmax_val, delay_win, fo_win = cfo_ops.cfo_search_scan(cfg, ext_i, t_loc,
                                                          bank)
    local_ptrs = (cfg.cp_len + stride * jnp.arange(t_loc)).astype(jnp.int32)
    my_start = base + i * l_loc - lag               # global coord of ext_i[0]
    global_ptrs = my_start + local_ptrs

    # 3. global trial-ordered refractory scan
    vals = lax.all_gather(dmax_val, axis, tiled=True)
    dlys = lax.all_gather(delay_win, axis, tiled=True)
    fos = lax.all_gather(fo_win, axis, tiled=True)
    gptrs = lax.all_gather(global_ptrs, axis, tiled=True)
    gate = cfg.detection_gate * cfg.m_synch * cfg.num_synch_bins
    crossing = (vals > gate) & (gptrs >= cfg.cp_len)
    g_det, (delays, fo_sel, peaks), count, (last_ptr, any_det1) = \
        sync.refractory_table(
            cfg, crossing, (dlys, fos, vals.astype(jnp.float32)), det_max,
            base - lag + cfg.cp_len, last_det_ptr, any_det)
    valid = jnp.arange(det_max) < count
    fo_sel = fo_sel.astype(jnp.int32)

    # 4. per-shard demod of owned detections, psum merge
    trial_idx = (g_det - (base - lag) - cfg.cp_len) // stride
    owner = trial_idx // t_loc
    mine = valid & (owner == i)
    ptr_rel = jnp.where(mine, g_det - my_start, 0)
    real_end1 = real_end + n_real

    det_spec = cfo_ops.spectra_at_detections(cfg, ext_i, ptr_rel, fo_sel,
                                             bank)
    _, chans_i, _ = jax.vmap(
        lambda s, d: sync.estimate_channel(cfg, s, d))(det_spec, delays)
    chans_i = chans_i * mine[:, None]

    _, data_bins = used_bins(cfg.nfft, cfg.num_data_bins)
    data_bins = np.asarray(data_bins)
    ok_i = mine & (g_det + cfg.m_synch * cfg.rx_b_len + cfg.nfft <= real_end1)
    start = jnp.where(ok_i, ptr_rel + cfg.m_synch * cfg.rx_b_len, 0)
    win = cfo_ops.windows_at(ext_i, start, np.arange(cfg.nfft)) * \
        cfo_ops.bank_select(bank, fo_sel)
    f = jnp.fft.fft(win, cfg.nfft, axis=-1)
    fd = f[:, data_bins]
    power = jnp.sum(jnp.abs(fd) ** 2, axis=-1, keepdims=True)
    fd = fd * jnp.sqrt(fd.shape[-1] / jnp.maximum(power, 1e-30))
    rot = jnp.exp((1j * 2.0 * jnp.pi / cfg.nfft) *
                  delays[:, None].astype(jnp.float32) *
                  jnp.asarray(data_bins, jnp.float32)[None, :])
    eq = sync.mmse_gain(chans_i[:, data_bins], cfg.snr_linear)
    ph_i = fd * rot * eq * ok_i[:, None]

    chans = lax.psum(chans_i, axis)
    phasors = lax.psum(ph_i, axis)
    demod_ok = lax.psum(ok_i.astype(jnp.int32), axis) > 0
    despread = cfo_ops.dsss_despread(phasors, dsss)

    hist_new = lax.psum(
        jnp.where(i == n_shards - 1, x_local[-lag:],
                  jnp.zeros(lag, jnp.complex64)), axis)
    new_state = LegacyStreamState(
        hist=hist_new, base=base + n_shards * l_loc, real_end=real_end1,
        last_det_ptr=last_ptr, any_det=any_det1)
    out = LegacyChunkOut(
        ptrs=jnp.where(valid, g_det, -1), delays=delays, peaks=peaks,
        fo_idx=fo_sel, valid=valid, demod_ok=demod_ok, chans=chans,
        phasors=phasors, despread=despread)
    return new_state, out


def make_sharded_legacy_step(cfg: OFDMConfig, chunk_len: int, mesh: Mesh,
                             axis: str = "t", det_max: int | None = None,
                             fo_range=(0.0,), dsss: int = 1):
    """Jitted sharded legacy chunk step (chunk sharded over ``axis``)."""
    from ..ops import cfo as cfo_ops

    n_shards = mesh.shape[axis]
    assert chunk_len % (n_shards * max(1, cfg.stride)) == 0, (
        "chunk_len must be a multiple of n_shards * stride")
    if det_max is None:
        det_max = chunk_len // (2 * cfg.cp_len + cfg.nfft) + 1

    body = functools.partial(
        _legacy_body, cfg, axis=axis, n_shards=n_shards, det_max=det_max,
        bank=cfo_ops.cfo_bank(cfg, fo_range), dsss=dsss)
    state_spec = LegacyStreamState(*([P()] * 5))
    out_spec = LegacyChunkOut(*([P()] * 9))
    fn = shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(axis), P(), P(), P(), P(), P()),
        out_specs=(state_spec, out_spec), check_vma=False)

    @jax.jit
    def step(state: LegacyStreamState, chunk, n_real):
        return fn(state.hist, chunk, state.base, state.real_end,
                  state.last_det_ptr, state.any_det, n_real)

    return step, det_max


class ShardedLegacyStreamingRx:
    """Host driver: LegacyStreamingRx semantics with every chunk
    time-sharded over the mesh."""

    def __init__(self, cfg: OFDMConfig, chunk_len: int, mesh: Mesh,
                 axis: str = "t", fo_range=(0.0,), dsss: int = 1):
        self.cfg = cfg
        self.chunk_len = chunk_len
        self.mesh = mesh
        self._step, self.det_max = make_sharded_legacy_step(
            cfg, chunk_len, mesh, axis, fo_range=fo_range, dsss=dsss)
        self.state = legacy_init(cfg)
        self._many = {}

    def push_many(self, chunks) -> LegacyChunkOut:
        """K sharded work() calls in ONE dispatch — see
        ShardedReacqStreamingRx.push_many."""
        chunks = jnp.asarray(chunks, jnp.complex64)
        assert chunks.ndim == 2 and chunks.shape[1] == self.chunk_len
        k = chunks.shape[0]
        if k not in self._many:
            step, n = self._step, self.chunk_len
            self._many[k] = jax.jit(lambda st, ch: jax.lax.scan(
                lambda s, c: step(s, c, jnp.int32(n)), st, ch))
        self.state, outs = self._many[k](self.state, chunks)
        return outs

    def push(self, chunk, n_real: int | None = None) -> LegacyChunkOut:
        chunk = jnp.asarray(chunk, jnp.complex64)
        assert chunk.shape[0] == self.chunk_len
        if n_real is None:
            n_real = self.chunk_len
        self.state, out = self._step(self.state, chunk, jnp.int32(n_real))
        return out

    def finish(self) -> list[LegacyChunkOut]:
        outs = []
        flushed = 0
        while flushed < legacy_lag(self.cfg):
            outs.append(self.push(
                jnp.zeros(self.chunk_len, jnp.complex64), n_real=0))
            flushed += self.chunk_len
        return outs
