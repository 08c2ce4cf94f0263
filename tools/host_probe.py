"""Constant-work-per-process host probe (no Spark): each worker streams
numpy arrays + regex-splits strings for a FIXED amount of work; the
per-process slowdown at concurrency n measures the machine's shared
memory-subsystem ceiling, independent of our code. Efficiency ceiling
for N:4N = (4N/slow(4N)) / (N/slow(N)) / 4.

Usage: python tools/host_probe.py [n1 n2 ...]   (default 1 2 8)
"""
import json
import multiprocessing as mp
import sys
import time


def work(_):
    import numpy as np

    a = np.arange(12_000_000, dtype=np.float64)
    s = ("word%d " % 7) * 120_000
    t0 = time.time()
    acc = 0.0
    for _i in range(12):
        acc += float((a * 1.0001).sum())
        acc += len(s.split(" "))
    return time.time() - t0


def measure(n: int) -> float:
    with mp.Pool(n) as pool:
        ts = pool.map(work, range(n))
    return sum(ts) / len(ts)


if __name__ == "__main__":
    levels = [int(x) for x in sys.argv[1:]] or [1, 2, 8]
    base = None
    out = {}
    for n in levels:
        t = measure(n)
        if base is None:
            base = t
        out[n] = {"mean_s": round(t, 3), "slowdown": round(t / base, 3)}
        print(n, out[n], flush=True)
    print(json.dumps(out))
