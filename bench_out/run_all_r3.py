#!/usr/bin/env python
"""Round-3 master perf sweep: runs every TPU benchmark sequentially, one
subprocess (= one TPU program stream) at a time, parsing results as it goes.

Order is by evidential priority (VERDICT r2 next-round list):
  1. full-chain bench.py for loopback64 / lte1024 / lte2048  (weak #1)
  2. bench_roofline.py for all three, --measured from step 1  (weak #2)
  3. sync-kernel shootout conv-bank vs exact at the strided grid (weak #3)
  4. streaming-mode throughput, 2 receivers x 2 configs x chunk sizes (#2)

Writes bench_out/r3_sweep.log (append, line-buffered) and
bench_out/r3_summary.json (rewritten after every step).
"""

import json
import pathlib
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
LOG = REPO / "bench_out" / "r3_sweep.log"
SUMMARY = REPO / "bench_out" / "r3_summary.json"

results = {}


def log(msg):
    with open(LOG, "a") as f:
        f.write(msg + "\n")


def run(tag, args, timeout=2400, tries=2):
    """Timeouts are sized for a HEALTHY tunnel (compiles are minutes, cached
    repeats are seconds); a wedged tunnel RPC shows up as a timeout and gets
    ONE retry — the persistent compile cache makes the redo cheap (observed
    2026-08-21: a bench process finished its compile, wrote the cache entry,
    then hung forever in a tunnel RPC; the rerun compiled in 0.6 s)."""
    parsed = None
    for attempt in range(tries):
        log(f"=== {tag} === ({time.strftime('%H:%M:%S')}"
            f"{', retry' if attempt else ''})")
        t0 = time.time()
        try:
            p = subprocess.run([sys.executable] + args, cwd=REPO,
                               timeout=timeout, capture_output=True, text=True)
            out, err, code = p.stdout, p.stderr, p.returncode
        except subprocess.TimeoutExpired as e:
            out = (e.stdout or b"").decode() if isinstance(e.stdout, bytes) \
                else (e.stdout or "")
            err, code = "TIMEOUT", -1
        dt = time.time() - t0
        log(out.strip())
        log(f"exit={code} wall={dt:.0f}s")
        if err and code != 0:
            log("stderr tail: " + err.strip()[-2000:])
        for line in out.strip().splitlines():
            try:
                parsed = json.loads(line)
            except (json.JSONDecodeError, ValueError):
                continue
        results[tag] = {"parsed": parsed, "exit": code, "wall_s": round(dt)}
        SUMMARY.write_text(json.dumps(results, indent=1))
        if code == 0:
            break
    return parsed


def main():
    log(f"##### round-3 sweep started {time.strftime('%F %T')} #####")

    measured = {}
    for c in ["loopback64", "lte1024", "lte2048"]:
        r = run(f"chain:{c}", ["bench.py", "16", c])
        if r and "value" in r:
            measured[c] = r["value"]

    for c in ["loopback64", "lte1024", "lte2048"]:
        args = ["bench_roofline.py", c]
        if c in measured:
            args += ["--measured", str(measured[c])]
        run(f"roofline:{c}", args)

    for k in ["sync_convbank", "sync_exact"]:
        for c in ["lte1024", "lte2048", "loopback64"]:
            run(f"shootout:{k}:{c}", ["bench_kernels.py", k, c])

    for rx, c, chunk in [("reacq", "loopback64", 4095),
                         ("reacq", "loopback64", 65536),
                         ("reacq", "lte1024", 4080),
                         ("reacq", "lte1024", 65280),
                         ("legacy", "loopback64", 4095),
                         ("legacy", "lte1024", 65280)]:
        run(f"stream:{rx}:{c}:{chunk}",
            ["bench_streaming.py", rx, c, str(chunk)])

    log(f"##### SWEEP DONE {time.strftime('%F %T')} #####")


if __name__ == "__main__":
    main()
