"""The canonical loopback app — replaces GNU-Radio-Repositories/ofdm_chain.py
(D1: TXOFDM pickle source -> RXOFDM synch_and_chan_est -> null sink, Qt app).

Modes:
  * default: full synthetic loopback (bits -> TX -> channel -> AWGN -> RX)
  * --tx-pickle: stream a recorded/pickled IQ buffer through the RX instead
    (the reference's actual topology; works with the shipped reference
    vectors, e.g. Data/tx_data_offline_chan_type_Fading_SNR_100.pckl)

Parameters mirror the GRC block params (ofdm_chain.grc: nfft 64, cp_len 16,
num_data_bins 60, num_ofdm_symb, num_synch_bins, snr, synch_dat [1,3]).
"""

from __future__ import annotations

import argparse
import json

import numpy as np

import jax
import jax.numpy as jnp


def build_config(args):
    from ..utils.params import OFDMConfig
    return OFDMConfig(
        nfft=args.nfft, cp_len=args.cp_len, num_ofdm_symb=args.num_ofdm_symb,
        synch_dat=tuple(args.synch_dat), num_data_bins=args.num_data_bins,
        num_synch_bins=args.nfft - 2, snr_db=args.snr,
        detection_gate=args.gate, channel=args.channel,
        modulation=args.modulation, pilot_grid=args.pilot_grid,
        pilot_spacing=args.pilot_spacing,
        ref_sigs=args.ref_sigs).validate()


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--nfft", type=int, default=64)
    p.add_argument("--cp-len", type=int, default=16)
    p.add_argument("--num-ofdm-symb", type=int, default=240)
    p.add_argument("--synch-dat", type=int, nargs=2, default=[1, 3])
    p.add_argument("--num-data-bins", type=int, default=60)
    p.add_argument("--snr", type=float, default=100.0)
    p.add_argument("--gate", type=float, default=0.7)
    p.add_argument("--channel", default="Fading",
                   choices=["Ideal", "IMT1", "IMT16", "Fading", "AWGN"])
    p.add_argument("--modulation", default="QPSK",
                   choices=["BPSK", "QPSK", "QAM16", "QAM64"])
    p.add_argument("--pilot-grid", default="none",
                   choices=["none", "lte", "random"],
                   help="scattered-pilot grid + pilot chan-est (ops/pilots)")
    p.add_argument("--pilot-spacing", type=int, default=4)
    p.add_argument("--ref-sigs", type=float, default=0.0,
                   help="pilot bin fraction for --pilot-grid random "
                        "(the reference's ref_sigs, SystemModel.py:30)")
    p.add_argument("--tx-pickle", help="stream this IQ pickle through the RX")
    p.add_argument("--bits-pickle", help="ground-truth bits for BER")
    p.add_argument("--stream", type=int, default=0, metavar="CHUNK_LEN",
                   help="run the CONTINUOUS multi-detection receiver "
                        "(gr-RXOFDM work()-forever semantics: channel "
                        "refreshed per detection) in chunks of this many "
                        "samples instead of one batch call")
    p.add_argument("--repeat", type=int, default=1,
                   help="with --stream: replay the input this many times "
                        "(the D1 loopback's endless TX replay)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--diag-dir", help="write channel-est/soft-bit dumps here")
    p.add_argument("--json", action="store_true", help="machine-readable out")
    args = p.parse_args(argv)

    cfg = build_config(args)
    from ..models import chain, rxofdm
    from ..utils import diagnostics as diag

    if args.stream:
        from ..runtime.stream import ReacqStreamingRx

        if args.tx_pickle:
            from ..io.pickles import load_pickle_iq
            sig = load_pickle_iq(args.tx_pickle).ravel()
        else:
            from ..reference_cpu import golden as G
            rng = np.random.default_rng(args.seed)
            bits = rng.integers(0, 2, cfg.num_bits)
            sig = G.apply_channel(G.tx_frame(cfg, bits),
                                  G.channel_taps(cfg.channel))
        sig = np.tile(sig, args.repeat)
        chunk = args.stream
        srx = ReacqStreamingRx(cfg, chunk)
        buf = np.zeros(-(-len(sig) // chunk) * chunk, np.complex64)
        buf[: len(sig)] = sig
        outs = [srx.push(buf[i : i + chunk],
                         n_real=max(0, min(chunk, len(sig) - i)))
                for i in range(0, len(buf), chunk)]
        outs.extend(srx.finish())
        valid = [np.asarray(o.valid) for o in outs]
        ptrs = np.concatenate([np.asarray(o.ptrs)[v]
                               for o, v in zip(outs, valid)])
        hard = np.concatenate([np.asarray(o.hard_bits)[v]
                               for o, v in zip(outs, valid)])
        out = {"mode": "stream", "chunk_len": chunk,
               "chunks": len(outs), "detections": int(len(ptrs)),
               "first_ptrs": ptrs[:5].tolist()}
        if args.bits_pickle:
            from ..io.pickles import load_pickle_iq as lp
            gt = np.tile(lp(args.bits_pickle).ravel(), args.repeat)
            h = hard.ravel()[: len(gt)]
            out["ber"] = float(np.mean(h != gt[: len(h)]))
        if args.json:
            print(json.dumps(out))
        else:
            for k, v in out.items():
                print(f"{k}: {v}")
        return out

    if args.tx_pickle:
        from ..io.pickles import load_pickle_iq
        rx = load_pickle_iq(args.tx_pickle).ravel()
        r = rxofdm.make_rx(cfg, len(rx))(jnp.asarray(rx, jnp.complex64))
        out = {"found": bool(r.found), "lock_ptr": int(r.lock_ptr),
               "delay_idx": int(r.delay_idx)}
        if args.bits_pickle:
            from ..io.pickles import load_pickle_iq as lp
            bits = lp(args.bits_pickle).ravel()
            hard = np.asarray(r.hard_bits)[:len(bits)]
            out["ber"] = float(np.mean(hard != bits))
        result = r
    else:
        bits = jnp.asarray(np.random.default_rng(args.seed).integers(
            0, 2, cfg.num_bits, dtype=np.int32))
        c = chain.make_chain(cfg)(bits, jax.random.PRNGKey(args.seed))
        out = {"found": bool(c.found), "lock_ptr": int(c.lock_ptr),
               "delay_idx": int(c.delay_idx), "ber": float(c.ber)}
        result = c

    if args.diag_dir:
        if hasattr(result, "chan_est_time"):
            diag.dump_channel_estimate(args.diag_dir, "chan_est_",
                                       result.chan_est_time)
        diag.iq_scatter(result.phasors,
                        save_to=f"{args.diag_dir}/iq_scatter.png")

    if args.json:
        print(json.dumps(out))
    else:
        for k, v in out.items():
            print(f"{k}: {v}")
    return out


if __name__ == "__main__":
    main()
