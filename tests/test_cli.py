"""CLI apps (D1-D4 replacements) — driven through their main() entrypoints."""

import json

import numpy as np
import pytest

from lte_gnu_radio_code_tpu.cli import ber_sweep, ofdm_chain, pls_demo, rx_file
from lte_gnu_radio_code_tpu.io import pickles as io
from lte_gnu_radio_code_tpu.reference_cpu import golden as G
from lte_gnu_radio_code_tpu.utils.params import (CFO_CASES, GOLDEN64,
                                                 config_from_case)


def test_ofdm_chain_loopback_default():
    out = ofdm_chain.main(["--num-ofdm-symb", "48"])
    assert out["found"] and out["ber"] == 0.0


def test_ofdm_chain_on_reference_pickle():
    ref = "/root/reference/GNU-Radio-Repositories/TEST/GNU_RADIO_OFFLINE"
    try:
        out = ofdm_chain.main([
            "--tx-pickle",
            f"{ref}/Data/tx_data_offline_chan_type_Fading_SNR_100.pckl",
            "--bits-pickle",
            f"{ref}/Data/tx_bit_data_chan_type_Fading_SNR_100.pckl"])
    except FileNotFoundError:
        pytest.skip("reference not mounted")
    assert out["found"] and out["lock_ptr"] == 16 and out["ber"] == 0.0


def test_ofdm_chain_qam64():
    out = ofdm_chain.main(["--num-ofdm-symb", "48", "--modulation", "QAM64",
                           "--channel", "Ideal", "--snr", "60"])
    assert out["ber"] == 0.0


def test_ber_sweep_monotone():
    rows = ber_sweep.main(["--snrs", "4", "10", "30", "--frames", "2",
                           "--num-ofdm-symb", "48"])
    bers = [r["ber"] for r in rows]
    assert bers[0] >= bers[-1]
    assert bers[-1] == 0.0


def test_pls_demo():
    rows = pls_demo.main(["--iters", "2"])
    assert all(r["bit_errors"] == 0 for r in rows)


def test_rx_file_cfo_case(tmp_path):
    cfg = config_from_case(CFO_CASES, 0, snr_db=1e8)
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, cfg.num_bits)
    tx = G.tx_frame(cfg, bits)
    rx = G.apply_channel(tx, G.channel_taps("Fading"), max_impulse=cfg.nfft)
    io.save_pickle_iq(tmp_path / "iq.pckl", rx)
    out = rx_file.main([str(tmp_path / "iq.pckl"), "--case", "0"])
    assert out["detections"] >= cfg.num_patterns - 1


def test_config_files_load():
    import pathlib

    from lte_gnu_radio_code_tpu.utils.params import OFDMConfig
    for f in pathlib.Path("configs").glob("*.json"):
        kw = json.load(open(f))
        kw["synch_dat"] = tuple(kw["synch_dat"])
        cfg = OFDMConfig(**kw).validate()
        assert cfg.nfft >= 64


def test_ofdm_chain_stream_mode_replayed_vectors(ref_vectors):
    """The D1 loopback's real topology: the shipped TX vector replayed
    continuously through the multi-detection streaming receiver — every
    pattern block of every replay re-detected (timing shifts 63 samples per
    replay due to the channel tail), zero bit errors."""
    import pathlib

    from lte_gnu_radio_code_tpu.cli import ofdm_chain

    base = pathlib.Path(
        "/root/reference/GNU-Radio-Repositories/TEST/GNU_RADIO_OFFLINE/Data")
    out = ofdm_chain.main([
        "--stream", "960", "--repeat", "3",
        "--tx-pickle", str(base / "tx_data_offline_chan_type_Fading_SNR_100.pckl"),
        "--bits-pickle", str(base / "tx_bit_data_chan_type_Fading_SNR_100.pckl"),
        "--json"])
    assert out["detections"] == 180
    assert out["ber"] == 0.0
