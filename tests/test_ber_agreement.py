"""BER-vs-SNR statistical agreement (BASELINE.md target: 'BER vs SNR matches
CPU reference sweep'; VERDICT r1 weak #4).

Three layers:
  * mid-SNR QPSK waterfall over Fading: TPU chain vs the CPU oracle chain,
    mean BER per point within sampling error (different noise realisations,
    so the comparison is statistical; tests/test_stream_rx.py and the
    same-buffer tests elsewhere cover bit-exactness),
  * QAM16/QAM64 over the Ideal channel with the genie channel estimate vs
    the closed-form Gray-QAM AWGN BER,
  * the shipped configs/qam64_sweep.json driven end-to-end (config 4).
"""

import json
import math
import pathlib

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lte_gnu_radio_code_tpu.models import chain
from lte_gnu_radio_code_tpu.reference_cpu import golden as G
from lte_gnu_radio_code_tpu.utils.params import OFDMConfig


def _qfunc(x):
    return 0.5 * math.erfc(x / math.sqrt(2))


def _snr_per_bin(cfg):
    """Per-bin Es/N0 implied by the 'Digital' SNR convention.

    Time noise var = (rx_b_len / (B*bpb)) * P_sig * 10^(-snr/10)
    (MultiAntennaSystem.additive_noise:243-246 with P_sig ~ 1 after the TX
    unit-power normalisation); after the NFFT FFT and with the symbol energy
    spread over B bins, SNR_bin = (nfft*bpb/rx_b_len) * 10^(snr/10)."""
    return (cfg.nfft * cfg.bits_per_bin / cfg.rx_b_len) * \
        10 ** (cfg.snr_db / 10)


def _gray_qam_ber(m, snr):
    """Nearest-neighbour Gray square-QAM BER over AWGN."""
    k = math.log2(m)
    return (4 / k) * (1 - 1 / math.sqrt(m)) * \
        _qfunc(math.sqrt(3 * snr / (m - 1)))


@pytest.mark.parametrize("snr_db", [4.0, 8.0, 12.0])
def test_qpsk_fading_curve_matches_oracle(snr_db):
    cfg = OFDMConfig(snr_db=snr_db).validate()
    f = chain.make_chain(cfg)
    frames = 6
    tb, ob = [], []
    for i in range(frames):
        bits = np.random.default_rng(i).integers(0, 2, cfg.num_bits,
                                                 dtype=np.int32)
        tb.append(float(f(jnp.asarray(bits), jax.random.PRNGKey(i)).ber))
        ob.append(G.run_chain(cfg, seed=i)["ber"])
    t, o = np.mean(tb), np.mean(ob)
    se = math.sqrt(np.var(tb) / frames + np.var(ob) / frames) + 2e-4
    assert abs(t - o) < 4 * se, (snr_db, t, o, se)
    assert o > 0, "point must sit in the waterfall to be informative"


@pytest.mark.parametrize("mod,m,snr_db", [
    ("QAM16", 16, 8.0), ("QAM16", 16, 10.0),
    ("QAM64", 64, 13.0), ("QAM64", 64, 14.0),
])
def test_qam_matches_closed_form(mod, m, snr_db):
    """Genie channel estimate isolates EQ+demap; measured BER within 2x of
    the closed-form value in the waterfall (residual excess comes from the
    reference's per-symbol TX normalisation and the RX power normalisation,
    both noise-coupled)."""
    cfg = OFDMConfig(snr_db=snr_db, modulation=mod, channel="Ideal").validate()
    f = chain.make_chain(cfg, perfect_chan_est=True)
    bers = []
    for i in range(6):
        bits = np.random.default_rng(i).integers(0, 2, cfg.num_bits,
                                                 dtype=np.int32)
        bers.append(float(f(jnp.asarray(bits), jax.random.PRNGKey(i)).ber))
    measured = float(np.mean(bers))
    theory = _gray_qam_ber(m, _snr_per_bin(cfg))
    assert theory > 1e-4, "pick waterfall points"
    assert 0.6 * theory < measured < 2.0 * theory, (measured, theory)


def test_qam64_sweep_config_end_to_end():
    """configs/qam64_sweep.json (BASELINE config 4): the 64-QAM one-tap-EQ
    sweep runs and its BER falls monotonically with SNR."""
    cfgd = json.loads(
        (pathlib.Path(__file__).parents[1] / "configs" /
         "qam64_sweep.json").read_text())
    assert cfgd["modulation"] == "QAM64"
    bers = []
    for snr in [14.0, 20.0, 26.0]:
        cfg = OFDMConfig(**{**cfgd, "synch_dat": tuple(cfgd["synch_dat"]),
                            "snr_db": snr}).validate()
        f = chain.make_chain(cfg)
        b = [float(f(jnp.asarray(
            np.random.default_rng(i).integers(0, 2, cfg.num_bits,
                                              dtype=np.int32)),
            jax.random.PRNGKey(i)).ber) for i in range(3)]
        bers.append(float(np.mean(b)))
    assert bers[0] > bers[1] > bers[2], bers
    assert bers[0] > 1e-3 and bers[2] < 0.5 * bers[0]
