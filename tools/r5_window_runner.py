#!/usr/bin/env python3
"""Round-5 probe-gated perf evidence runner (VERDICT r4 'Next round' #1).

Polls tools/host_probe.py; when the host is in the healthy band
(mean1 <= 0.62 s, slowdown(8) <= 1.15), fires in order:
  1. an adjacent probe + `python bench.py` at sf0.1 local[32], writing
     BENCH_CLEAN_WINDOW.json = {"probe_before":..., "probe_after":...,
     "bench": <the JSON line>} so the probe is measured adjacent to the
     committed run (fixes the r4 bench-artifact bookkeeping note);
  2. one 2:8 scaling pair at 3M docs via tools/bench_scaling.py
     (appends to BENCH_SCALING_RUNS.jsonl as usual).

Runs each step at most once; exits when both are done or the deadline
passes. Safe to re-run: skips a step whose artifact already exists.

Usage: python3 tools/r5_window_runner.py [--max-minutes 300]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = "/root/repo"
MEAN1_MAX = 0.62
SLOW8_MAX = 1.15
OUT = os.path.join(REPO, "BENCH_CLEAN_WINDOW.json")


def probe() -> dict | None:
    try:
        r = subprocess.run(
            [sys.executable, f"{REPO}/tools/host_probe.py"],
            capture_output=True, text=True, timeout=180,
        )
        return json.loads(r.stdout.strip().splitlines()[-1])
    except Exception as e:  # noqa: BLE001
        print(f"probe failed: {e}", flush=True)
        return None


def healthy(p: dict | None) -> bool:
    return bool(p) and p["1"]["mean_s"] <= MEAN1_MAX and p["8"]["slowdown"] <= SLOW8_MAX


def run_bench(p_before: dict) -> None:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR="/root/testdata/sf0.1",
               SPARK_GRAFT_CPUS="32")
    r = subprocess.run([sys.executable, f"{REPO}/bench.py"], cwd=REPO,
                       capture_output=True, text=True, timeout=1800, env=env)
    lines = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
    p_after = probe()
    rec = {"probe_before": p_before, "probe_after": p_after,
           "bench": json.loads(lines[-1]) if lines else None,
           "rc": r.returncode, "ts": time.strftime("%Y-%m-%dT%H:%M:%S")}
    with open(OUT, "w") as f:
        json.dump(rec, f, indent=1)
    print(f"clean-window bench done rc={r.returncode} -> {OUT}", flush=True)


def run_pair() -> None:
    r = subprocess.run(
        [sys.executable, f"{REPO}/tools/bench_scaling.py",
         "--n-docs", "3000000", "--pairs", "2:8"],
        cwd=REPO, timeout=5400,
    )
    print(f"scaling pair rc={r.returncode}", flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-minutes", type=float, default=300)
    ap.add_argument("--poll-seconds", type=float, default=240)
    args = ap.parse_args()
    bench_done = os.path.exists(OUT)
    pair_done = False
    deadline = time.time() + args.max_minutes * 60
    while time.time() < deadline and not (bench_done and pair_done):
        p = probe()
        if p:
            print(f"probe mean1={p['1']['mean_s']} slow8={p['8']['slowdown']}",
                  flush=True)
        if healthy(p):
            if not bench_done:
                run_bench(p)
                bench_done = True
            if not pair_done:
                run_pair()
                pair_done = True
            continue
        time.sleep(args.poll_seconds)
    print(f"runner exit: bench_done={bench_done} pair_done={pair_done}", flush=True)


if __name__ == "__main__":
    main()
