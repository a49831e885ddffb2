#!/usr/bin/env python
"""Round-3 follow-up queue: waits for the main sweep (run_all_r3.py) to
finish, then runs the work that depends on code written after its launch:

  1. sync_pallas shootout at all three configs (the VMEM-column-blocked
     kernel, VERDICT r2 #4 — LTE cells were the round-2 OOM hole)
  2. per-stage rooflines (VERDICT r2 #8) for the stages the shootout just
     timed — compiles are warm by then, --measured wired from the shootout

One TPU process at a time, same discipline as the main sweep.
"""

import json
import pathlib
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
LOG = REPO / "bench_out" / "r3_followup.log"
SUMMARY = REPO / "bench_out" / "r3_followup_summary.json"
MAIN_LOG = REPO / "bench_out" / "r3_sweep.log"

results = {}


def log(msg):
    with open(LOG, "a") as f:
        f.write(msg + "\n")


def main_sweep_running():
    try:
        subprocess.run(["pgrep", "-f", "run_all_r3.py"], check=True,
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
        text = MAIN_LOG.read_text() if MAIN_LOG.exists() else ""
        if "SWEEP DONE" in text:
            break
        if not main_sweep_running():
            log("main sweep process gone without DONE marker; proceeding")
            break
        time.sleep(120)

    log(f"##### round-3 follow-up started {time.strftime('%F %T')} #####")

    shootout_us = {}
    for c in ["loopback64", "lte1024", "lte2048"]:
        r = run(f"shootout:sync_pallas:{c}",
                ["bench_kernels.py", "sync_pallas", c])
        if r and "value" in r:
            shootout_us[("sync_pallas", c)] = r["value"]

    # per-stage rooflines; pull measured us/call from the main sweep's
    # summary where that combo already ran
    main_summary = {}
    ms_path = REPO / "bench_out" / "r3_summary.json"
    if ms_path.exists():
        main_summary = json.loads(ms_path.read_text())
    for k in ["sync_convbank", "sync_pallas", "ofdm_mod_xla", "equalize_xla"]:
        for c in ["loopback64", "lte1024", "lte2048"]:
            args = ["bench_roofline_stages.py", k, c]
            us = shootout_us.get((k, c))
            if us is None:
                ent = main_summary.get(f"shootout:{k}:{c}", {})
                if ent.get("parsed") and "value" in ent["parsed"]:
                    us = ent["parsed"]["value"]
            if us is not None:
                args += ["--measured", str(us)]
            run(f"stage_roofline:{k}:{c}", args)

    log(f"##### FOLLOW-UP DONE {time.strftime('%F %T')} #####")


if __name__ == "__main__":
    main()
