"""Scaling-efficiency study (BASELINE.json north_rule: >=0.8 indexing-
throughput scaling efficiency from N to 4N executors).

No real multi-node cluster exists in this sandbox, so the two cluster
sizes are evidenced as two parallelism levels of the SAME job on the SAME
input: local[N] vs local[4N], each in its own fresh JVM (fresh executor
pool, no warm caches). Efficiency = (thr_4N / thr_N) / 4.

Usage: python tools/bench_scaling.py [--n-docs 200000] [--pairs 2:8,8:32]
Writes BENCH_SCALING.md (raw numbers; BENCH.md is curated by hand) and
prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def ensure_corpus(n_docs: int, path: str) -> None:
    if os.path.exists(path):
        return
    sys.path.insert(0, REPO)
    from lucene_solr_spark.corpus import make_corpus

    t = time.time()
    pdf = make_corpus(n_docs, seed=11)
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    # 64 input splits so every parallelism level can use all cores
    n_parts = 64
    step = (len(pdf) + n_parts - 1) // n_parts
    for i in range(n_parts):
        chunk = pdf.iloc[i * step : (i + 1) * step]
        if len(chunk):
            pq.write_table(pa.Table.from_pandas(chunk), f"{path}/part-{i:03d}.parquet")
    print(f"corpus: {n_docs} docs -> {path} in {time.time()-t:.1f}s", file=sys.stderr)


def measure(cpus: int, corpus: str) -> dict:
    out = os.path.join(tempfile.gettempdir(), f"lss_scale_idx_{cpus}")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "scale_worker.py"),
         "--cpus", str(cpus), "--corpus", corpus, "--out", out],
        capture_output=True, text=True, timeout=3600,
    )
    if r.returncode != 0:
        raise RuntimeError(f"worker local[{cpus}] failed:\n{r.stderr[-3000:]}")
    line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=200_000)
    ap.add_argument("--pairs", default="8:32", help="comma list of N:4N pairs")
    ap.add_argument("--corpus", default=None)
    args = ap.parse_args()

    corpus = args.corpus or os.path.join(
        tempfile.gettempdir(), f"lss_scale_corpus_{args.n_docs}"
    )
    ensure_corpus(args.n_docs, corpus)

    levels = sorted({int(x) for pair in args.pairs.split(",") for x in pair.split(":")})
    results = {}
    for cpus in levels:
        results[cpus] = measure(cpus, corpus)
        print(f"local[{cpus}]: {results[cpus]}", file=sys.stderr)

    pairs_out = []
    for pair in args.pairs.split(","):
        lo, hi = (int(x) for x in pair.split(":"))
        thr_lo, thr_hi = results[lo]["files_per_sec"], results[hi]["files_per_sec"]
        eff = (thr_hi / thr_lo) / (hi / lo)
        pairs_out.append(
            {"n": lo, "four_n": hi, "thr_n": thr_lo, "thr_4n": thr_hi,
             "speedup": round(thr_hi / thr_lo, 3), "efficiency": round(eff, 3)}
        )

    out = {
        "metric": "index-build scaling efficiency (local[N] vs local[4N], fresh JVMs)",
        "n_docs": args.n_docs,
        "levels": results,
        "pairs": pairs_out,
    }
    print(json.dumps(out))
    _write_bench_md(out)


def _write_bench_md(out: dict) -> None:
    """Append the run to a machine log next to the curated report.

    BENCH_SCALING.md is a hand-maintained multi-run narrative (it keeps
    every run plus host-state context); overwriting it from here once
    clobbered that history, so the tool now only appends one JSON line
    per run to BENCH_SCALING_RUNS.jsonl and leaves the report to be
    edited deliberately."""
    with open(os.path.join(REPO, "BENCH_SCALING_RUNS.jsonl"), "a") as f:
        f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
