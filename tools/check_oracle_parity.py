"""Replicates the driver's correctness gate locally: run every queries()
entry on Spark AND its oracle_sql() in DuckDB at a given sf dir, compare
row count, column names, and order-insensitive values.

Usage: python3 tools/check_oracle_parity.py [sf_dir] [name_filter...]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "nan"
                else:
                    v = round(v, 9)
            vals.append(repr(v))
        out.append(tuple(vals))
    return sorted(out), [cols[i] for i in order]


def main():
    import duckdb

    import __spark_entry__ as e
    from lucene_solr_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filter = sys.argv[2:]
    # lazy oracles (data-dependent literals) must resolve against the
    # same dir the views point at
    import os

    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir

    spark = get_spark("parity", cpus=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = e.queries()
    oracles = e.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if name_filter and not any(f in name for f in name_filter):
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
        except Exception as ex:
            failures.append((name, f"SPARK ERROR: {ex}"))
            print(f"FAIL {name}: spark error {str(ex)[:200]}")
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows-only ({len(srows)} rows) — no oracle")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as ex:
            failures.append((name, f"DUCKDB ERROR: {ex}"))
            print(f"FAIL {name}: duckdb error {str(ex)[:200]}")
            continue
        sn, sc = normalize(srows, scols)
        on, oc = normalize(orows, ocols)
        if [c.lower() for c in sc] != [c.lower() for c in oc]:
            failures.append((name, f"schema {sc} vs {oc}"))
            print(f"FAIL {name}: schema {sc} vs {oc}")
        elif len(sn) != len(on):
            failures.append((name, f"rowcount {len(sn)} vs {len(on)}"))
            print(f"FAIL {name}: rowcount {len(sn)} vs {len(on)}")
        elif sn != on:
            diff = [(a, b) for a, b in zip(sn, on) if a != b][:3]
            failures.append((name, f"values differ, e.g. {diff}"))
            print(f"FAIL {name}: values differ, e.g. {diff}")
        else:
            print(f"PASS {name} ({len(sn)} rows)")
    print(f"\n{len(failures)} failures" if failures else "\nALL PASS")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
