#!/usr/bin/env python3
"""Probe-gated scaling run: poll tools/host_probe.py until the host is
healthy (near-historical single-thread speed AND no parallel tax), then
fire ONE 3M-doc 2:8 scaling pair via tools/bench_scaling.py and exit.

The north-rule scaling criterion needs a clean host: the probe separates
"the build scales" from "the VM is co-tenanted". Healthy windows on this
host have shown mean_s(1) ~0.4-0.6 s and slowdown(8) ~1.0; degraded
windows show 1.0-27 s and slowdown 1.5+. Thresholds below sit just
inside the healthy band.

Usage: python3 tools/scaling_window_watch.py [--max-minutes 240]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time

REPO = "/root/repo"
MEAN1_MAX = 0.62   # healthy single-thread probe mean (s)
SLOW8_MAX = 1.15   # healthy 8-thread constant-work slowdown


def probe() -> dict | None:
    try:
        r = subprocess.run(
            [sys.executable, f"{REPO}/tools/host_probe.py"],
            capture_output=True, text=True, timeout=180,
        )
        line = r.stdout.strip().splitlines()[-1]
        return json.loads(line)
    except Exception as e:  # noqa: BLE001 - keep polling on any probe hiccup
        print(f"probe failed: {e}", flush=True)
        return None


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-minutes", type=float, default=240)
    ap.add_argument("--poll-seconds", type=float, default=300)
    args = ap.parse_args()
    deadline = time.time() + args.max_minutes * 60
    while time.time() < deadline:
        p = probe()
        if p:
            m1 = p["1"]["mean_s"]
            s8 = p["8"]["slowdown"]
            print(f"probe mean1={m1} slow8={s8}", flush=True)
            if m1 <= MEAN1_MAX and s8 <= SLOW8_MAX:
                print("healthy window -> firing 3M 2:8 pair", flush=True)
                r = subprocess.run(
                    [sys.executable, f"{REPO}/tools/bench_scaling.py",
                     "--n-docs", "3000000", "--pairs", "2:8"],
                    cwd=REPO, timeout=3600,
                )
                print(f"scaling run rc={r.returncode}", flush=True)
                return
        time.sleep(args.poll_seconds)
    print("no healthy window before deadline", flush=True)


if __name__ == "__main__":
    main()
