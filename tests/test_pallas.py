"""Pallas kernels (interpret mode on CPU; real-TPU runs are exercised by
bench/driver).  Each kernel must match its XLA-path op."""

import numpy as np
import jax.numpy as jnp
import pytest

from lte_gnu_radio_code_tpu.models import rxofdm
from lte_gnu_radio_code_tpu.ops import modulation, ofdm, sync
from lte_gnu_radio_code_tpu.pallas_kernels import equalize as pk_eq
from lte_gnu_radio_code_tpu.pallas_kernels import ofdm_mod as pk_mod
from lte_gnu_radio_code_tpu.reference_cpu import golden as G
from lte_gnu_radio_code_tpu.utils.params import GOLDEN64, OFDMConfig


def _grid(cfg, seed=0):
    rng = np.random.default_rng(seed)
    bits = jnp.asarray(rng.integers(0, 2, cfg.num_bits, dtype=np.int32))
    pts = modulation.bits_to_symbols(bits, cfg.modulation)
    return ofdm.resource_grid(
        cfg, pts.reshape(cfg.num_data_symb, cfg.num_data_bins))


@pytest.mark.parametrize("nfft,cp", [(64, 16), (256, 64),
                                      (1024, 256), (2048, 512)])
def test_pallas_modulate_matches_xla(nfft, cp):
    cfg = OFDMConfig(nfft=nfft, cp_len=cp, num_ofdm_symb=16,
                     num_data_bins=nfft - 4, num_synch_bins=nfft - 2
                     ).validate()
    grid = _grid(cfg)
    ref = np.asarray(ofdm.modulate(cfg, grid))
    out = np.asarray(pk_mod.modulate(cfg, grid, interpret=True))
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_pallas_equalize_matches_xla():
    cfg = GOLDEN64
    bits = np.random.default_rng(0).integers(0, 2, cfg.num_bits)
    tx = G.tx_frame(cfg, bits)
    rx = G.apply_channel(tx, G.channel_taps("Fading"), max_impulse=64)
    x = jnp.asarray(rx, jnp.complex64)
    r = rxofdm.make_rx(cfg, len(rx))(x)

    ref = np.asarray(sync.equalize_data_symbols(
        cfg, x, r.lock_ptr, r.delay_idx,
        jnp.fft.fft(r.chan_est_time, cfg.nfft), cfg.num_patterns))
    out = np.asarray(pk_eq.equalize_data_symbols(
        cfg, x, r.lock_ptr, r.delay_idx,
        jnp.fft.fft(r.chan_est_time, cfg.nfft), cfg.num_patterns,
        interpret=True))
    np.testing.assert_allclose(out, ref, atol=2e-4)
    hard_ref, _, _ = modulation.qpsk_llr(jnp.asarray(ref))
    hard_out, _, _ = modulation.qpsk_llr(jnp.asarray(out))
    np.testing.assert_array_equal(np.asarray(hard_out), np.asarray(hard_ref))


@pytest.mark.parametrize("stride", [1, 15])
def test_pallas_sync_search_matches_conv_bank(stride):
    import dataclasses

    from lte_gnu_radio_code_tpu.ops import fast_sync
    from lte_gnu_radio_code_tpu.pallas_kernels import sync_search

    cfg = dataclasses.replace(GOLDEN64, stride=stride).validate()
    bits = np.random.default_rng(2).integers(0, 2, cfg.num_bits)
    tx = G.tx_frame(cfg, bits)
    rx = G.apply_channel(tx, G.channel_taps("Fading"), max_impulse=64)
    x = jnp.asarray(rx, jnp.complex64)
    n_trials, _ = rxofdm.plan_rx(cfg, len(rx))
    ref = np.asarray(fast_sync.sync_corr_abs_fast(cfg, x, n_trials))
    out = np.asarray(sync_search.sync_corr_abs(cfg, x, n_trials,
                                               interpret=True))
    np.testing.assert_allclose(out, ref, atol=2e-3)


@pytest.mark.parametrize("nfft,dense", [(1024, False), (2048, False),
                                        (1024, True)])
def test_pallas_sync_search_lte_scale_blocked(nfft, dense):
    """LTE-numerology shapes through the VMEM-column-blocked kernel
    (VERDICT r2 #4): the strided flagship grid at NFFT 1024/2048 and the
    dense stride-1 utsa grid at NFFT 1024 — the round-2 17-MB-weights OOM
    shape — must all run and match the conv-bank.  Tiny symbol count keeps
    interpret-mode CPU time sane; the shapes (klen_ext, G*(cp+1)) are the
    real ones."""
    import dataclasses

    from lte_gnu_radio_code_tpu.ops import fast_sync
    from lte_gnu_radio_code_tpu.pallas_kernels import sync_search
    from lte_gnu_radio_code_tpu.utils.params import LTE1024, LTE2048

    base = LTE1024 if nfft == 1024 else LTE2048
    cfg = dataclasses.replace(base, num_ofdm_symb=8,
                              stride=1 if dense else base.stride).validate()
    bits = np.random.default_rng(5).integers(0, 2, cfg.num_bits)
    tx = G.tx_frame(cfg, bits)
    rx = G.apply_channel(tx, G.channel_taps("Fading"), max_impulse=cfg.nfft)
    x = jnp.asarray(rx, jnp.complex64)
    n_trials, _ = rxofdm.plan_rx(cfg, len(rx))
    ref = np.asarray(fast_sync.sync_corr_abs_fast(cfg, x, n_trials))
    out = np.asarray(sync_search.sync_corr_abs(cfg, x, n_trials,
                                               interpret=True))
    np.testing.assert_allclose(out, ref, atol=3e-3, rtol=2e-4)


def test_pallas_sync_search_rx_end_to_end():
    cfg = GOLDEN64
    bits = np.random.default_rng(3).integers(0, 2, cfg.num_bits)
    tx = G.tx_frame(cfg, bits)
    rx = G.apply_channel(tx, G.channel_taps("Fading"), max_impulse=64)
    x = jnp.asarray(rx, jnp.complex64)
    r_ref = rxofdm.make_rx(cfg, len(rx), fast=True)(x)
    r_pal = rxofdm.make_rx(cfg, len(rx), fast="pallas")(x)
    assert bool(r_pal.found)
    assert int(r_pal.lock_ptr) == int(r_ref.lock_ptr)
    assert int(r_pal.delay_idx) == int(r_ref.delay_idx)
    np.testing.assert_array_equal(np.asarray(r_pal.hard_bits),
                                  np.asarray(r_ref.hard_bits))
    assert np.mean(np.asarray(r_pal.hard_bits)[:cfg.num_bits] != bits) == 0.0


def test_pallas_modulate_end_to_end_demodulates():
    cfg = GOLDEN64
    bits = np.random.default_rng(1).integers(0, 2, cfg.num_bits)
    grid = _grid(cfg, seed=1)
    tx = np.asarray(pk_mod.modulate(cfg, grid, interpret=True))
    rx = G.apply_channel(tx.astype(np.complex128), G.channel_taps("Fading"),
                         max_impulse=64)
    ph, tsr, _ = G.rx_frame(cfg, rx)
    hard, _, _ = G.bit_recovery(ph)
    assert np.mean(hard[:cfg.num_bits] != bits) == 0.0


def test_rx_frame_pallas_eq_path_decisions_match():
    """rx_frame(eq='pallas') (the bench chain's demod path) produces the
    same lock and hard bits as the XLA equalizer path on the same buffer."""
    import jax.numpy as jnp
    from lte_gnu_radio_code_tpu.models import rxofdm

    cfg = GOLDEN64
    bits = np.random.default_rng(5).integers(0, 2, cfg.num_bits)
    tx = G.tx_frame(cfg, bits)
    rx = G.apply_channel(tx, G.channel_taps("Fading"), max_impulse=64)
    rx = G.awgn(cfg, rx, np.random.default_rng(6), np.var(tx))
    a = rxofdm.make_rx(cfg, len(rx))(jnp.asarray(rx, jnp.complex64))
    b = rxofdm.make_rx(cfg, len(rx), eq="pallas")(
        jnp.asarray(rx, jnp.complex64))
    assert int(a.lock_ptr) == int(b.lock_ptr)
    assert int(a.delay_idx) == int(b.delay_idx)
    np.testing.assert_array_equal(np.asarray(a.hard_bits),
                                  np.asarray(b.hard_bits))
    np.testing.assert_allclose(np.asarray(a.phasors), np.asarray(b.phasors),
                               atol=3e-5)


def test_tx_frames_pallas_batched_row_tiled_matches_xla():
    """Whole-batch flattened TX through the kernel (batch x symbols rows,
    row-axis grid tiling — round 5) == per-frame XLA modulate."""
    import dataclasses

    from lte_gnu_radio_code_tpu.models import txofdm
    cfg = dataclasses.replace(
        OFDMConfig(nfft=256, cp_len=64, num_data_bins=252,
                   num_synch_bins=254, num_ofdm_symb=20)).validate()
    rng = np.random.default_rng(3)
    bits = jnp.asarray(rng.integers(0, 2, (3, cfg.num_bits), dtype=np.int32))
    ref = np.asarray(txofdm.tx_frames(cfg, bits, path=None))
    out = np.asarray(txofdm.tx_frames(cfg, bits, path="pallas"))
    assert out.shape == ref.shape == (3, cfg.frame_len)
    np.testing.assert_allclose(out, ref, atol=3e-5)


def test_tx_frames_pallas_row_tile_nondividing():
    """Row count NOT a multiple of the row tile exercises the zero-row
    padding path (exactness of pad-then-slice)."""
    from lte_gnu_radio_code_tpu.models import txofdm
    from lte_gnu_radio_code_tpu.pallas_kernels import ofdm_mod
    cfg = GOLDEN64
    grid = _grid(cfg)
    # force a tiny row tile by monkeypatched budget? no — instead call with
    # a row count that is not 8-aligned: 5 rows of the 240-symbol grid
    sub = grid[:5]
    ref = np.asarray(ofdm.modulate(cfg, sub).reshape(5, -1))
    out = np.asarray(ofdm_mod.modulate_rows(cfg, sub, interpret=True))
    np.testing.assert_allclose(out, ref, atol=2e-5)


@pytest.mark.parametrize("nfft", [64, 256, 1024, 2048])
def test_idft_fourstep_matches_ifft(nfft):
    """Two-matmul-round Cooley-Tukey IDFT == jnp.fft.ifft (f32 tolerance)."""
    rng = np.random.default_rng(nfft)
    x = (rng.standard_normal((6, nfft)) + 1j * rng.standard_normal((6, nfft))
         ).astype(np.complex64)
    ref = np.asarray(jnp.fft.ifft(jnp.asarray(x), nfft, axis=-1))
    out = np.asarray(ofdm.idft_fourstep(nfft, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=5e-6)


def test_tx_fourstep_path_matches_xla():
    from lte_gnu_radio_code_tpu.models import txofdm
    cfg = GOLDEN64
    rng = np.random.default_rng(4)
    bits = jnp.asarray(rng.integers(0, 2, (2, cfg.num_bits), dtype=np.int32))
    ref = np.asarray(txofdm.tx_frames(cfg, bits, path=None))
    out = np.asarray(txofdm.tx_frames(cfg, bits, path="fourstep"))
    np.testing.assert_allclose(out, ref, atol=3e-5)


def test_tx_frames_fused_gridfree_matches_xla():
    """Grid-free fused TX (bins-restricted IDFT kernel + constant synch
    rows) == the grid-based XLA modulator, batched."""
    from lte_gnu_radio_code_tpu.models import txofdm
    cfg = GOLDEN64
    rng = np.random.default_rng(5)
    bits = jnp.asarray(rng.integers(0, 2, (2, cfg.num_bits), dtype=np.int32))
    ref = np.asarray(txofdm.tx_frames(cfg, bits, path=None))
    out = np.asarray(txofdm.tx_frames(cfg, bits, path="fused"))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=3e-5)


def test_rx_frames_batch_matches_per_frame_pallas():
    """Whole-batch flattened demod (rx_frames_batch) == vmapped per-frame
    pallas RX, hard bits identical; BER 0 vs transmitted bits."""
    from lte_gnu_radio_code_tpu.models import rxofdm
    cfg = GOLDEN64
    rng = np.random.default_rng(7)
    xs, bs = [], []
    for _ in range(2):
        bits = rng.integers(0, 2, cfg.num_bits)
        tx = G.tx_frame(cfg, bits)
        rx = G.apply_channel(tx, G.channel_taps("Fading"),
                             max_impulse=cfg.nfft)
        rx = G.awgn(cfg, rx, rng, np.var(tx))
        xs.append(rx.astype(np.complex64))
        bs.append(bits)
    xs = jnp.asarray(np.stack(xs))
    n_trials, num_patterns = rxofdm.plan_rx(cfg, xs.shape[1])
    hard, found, ptr = rxofdm.rx_frames_batch(cfg, xs, n_trials,
                                              num_patterns)
    assert bool(np.asarray(found).all())
    import jax
    ref = jax.vmap(lambda x: rxofdm.rx_frame(
        cfg, x, n_trials, num_patterns, fast="pallas",
        eq="pallas").hard_bits)(xs)
    np.testing.assert_array_equal(np.asarray(hard), np.asarray(ref))
    for i in range(2):
        nb = min(hard.shape[1], len(bs[i]))
        assert int((np.asarray(hard[i, :nb]) != bs[i][:nb]).sum()) == 0


def test_channel_conv_kernel_matches_shifted_add():
    """One-pass Pallas channel conv == ops.channel.apply_channel (the
    shifted-add XLA form), batched, to float32 tolerance."""
    from lte_gnu_radio_code_tpu.ops import channel as chan_ops
    from lte_gnu_radio_code_tpu.pallas_kernels import channel_conv
    rng = np.random.default_rng(9)
    x = (rng.standard_normal((3, 2000)) + 1j * rng.standard_normal((3, 2000))
         ).astype(np.complex64)
    h = chan_ops.channel_taps("Fading")
    ref = np.stack([np.asarray(chan_ops.apply_channel(
        jnp.asarray(x[i]), h, max_impulse=64)) for i in range(3)])
    out = np.asarray(channel_conv.apply_channel_frames(
        jnp.asarray(x), np.asarray(h), 64))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=1e-5)
