#!/usr/bin/env python
"""Round-3 follow-up #2: push_many (dispatch-amortised) streaming benches.
Waits for run_followup_r3.py's DONE marker, then runs each combo in its own
process.  Records the dispatch-overhead story: push() vs push_many(K)."""

import json
import pathlib
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
LOG = REPO / "bench_out" / "r3_followup2.log"
SUMMARY = REPO / "bench_out" / "r3_followup2_summary.json"
PREV_LOG = REPO / "bench_out" / "r3_followup.log"

results = {}


def log(msg):
    with open(LOG, "a") as f:
        f.write(msg + "\n")


def prev_running():
    try:
        subprocess.run(["pgrep", "-f", "run_followup_r3.py"], check=True,
                       capture_output=True)
        return True
    except subprocess.CalledProcessError:
        return False


def run(tag, args, timeout=1800, tries=2):
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
    while True:
        text = PREV_LOG.read_text() if PREV_LOG.exists() else ""
        if "FOLLOW-UP DONE" in text:
            break
        if not prev_running():
            log("follow-up #1 gone without DONE marker; proceeding")
            break
        time.sleep(120)

    log(f"##### round-3 follow-up #2 started {time.strftime('%F %T')} #####")
    for rx, c, chunk in [("reacq_many16", "loopback64", 4095),
                         ("reacq_many64", "loopback64", 4095),
                         ("reacq_many16", "lte1024", 4080),
                         ("reacq_many16", "lte1024", 65280),
                         ("legacy_many16", "loopback64", 4095),
                         ("reacq_batch16_many16", "loopback64", 4095),
                         ("reacq_batch16_many16", "lte1024", 4080)]:
        run(f"stream:{rx}:{c}:{chunk}",
            ["bench_streaming.py", rx, c, str(chunk)])
    log(f"##### FOLLOW-UP2 DONE {time.strftime('%F %T')} #####")


if __name__ == "__main__":
    main()
