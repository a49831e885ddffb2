"""PLS key-exchange demo — replaces TEST/GNU_RADIO_OFFLINE/topblock.py's
pls=True path (D3): drives the 3-state Alice/Bob machine through a 2x2
channel and reports key-bit errors."""

from __future__ import annotations

import argparse
import json

import numpy as np

import jax
import jax.numpy as jnp


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--key-bits", type=int, default=8,
                   help="pvt_info_length (topblock.py:83)")
    p.add_argument("--channel", default="ones",
                   choices=["ones", "symmetric", "dispersive"])
    p.add_argument("--snr", type=float, default=None,
                   help="add AWGN at this SNR (dB); default noise-free")
    p.add_argument("--iters", type=int, default=5,
                   help="exchange repetitions (topblock.py:87)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--json", action="store_true")
    args = p.parse_args(argv)

    from ..models import pls as M
    from ..utils.params import PLSConfig

    cfg = PLSConfig(pvt_info_len=args.key_bits)
    rng = np.random.default_rng(args.seed)
    if args.channel == "ones":
        h = None
    elif args.channel == "symmetric":
        h = rng.standard_normal((2, 2, 1)) + 1j * rng.standard_normal((2, 2, 1))
        h[1, 0] = h[0, 1]
    else:
        h = rng.standard_normal((2, 2, 3)) + 1j * rng.standard_normal((2, 2, 3))
        h[1, 0] = h[0, 1]

    results = []
    for it in range(args.iters):
        key_bits = jnp.asarray(
            rng.integers(0, 2, cfg.pvt_info_len, dtype=np.int32))
        bits, err = M.key_exchange(cfg, key_bits,
                                   jax.random.PRNGKey(args.seed + it),
                                   h=h, snr_db=args.snr)
        results.append({"iter": it, "bit_errors": int(err),
                        "key": np.asarray(key_bits).tolist(),
                        "recovered": np.asarray(bits).tolist()})
        if not args.json:
            print(f"iter {it}: {int(err)} bit errors "
                  f"(key {np.asarray(key_bits).tolist()} -> "
                  f"{np.asarray(bits).tolist()})")
    if args.json:
        print(json.dumps(results))
    return results


if __name__ == "__main__":
    main()
