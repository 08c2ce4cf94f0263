"""Large-star/small-star connected components (ops/pipeline.py
_cc_large_small_star): correctness vs a union-find oracle and the
logarithmic-round guarantee that motivated replacing r2's plain
min-label propagation (O(diameter) rounds on chains)."""

from __future__ import annotations

import math
import random

import lucene_solr_spark.ops.pipeline as P


def _keepers(spark, edges, force_distributed=True):
    from pyspark.sql import functions as F

    if force_distributed:
        # exercise the large-star/small-star scale path, not the
        # small-graph driver union-find fallback
        saved, P.CC_DRIVER_MAX = P.CC_DRIVER_MAX, -1
    try:
        df = spark.createDataFrame(edges, "a long, b long")
        stars = P._cc_large_small_star(df)
        nodes = df.select("a").unionByName(df.select(F.col("b").alias("a"))).distinct()
        lbl = stars.groupBy("a").agg(F.min("b").alias("k"))
        rows = (
            nodes.join(lbl, "a", "left")
            .select("a", F.coalesce("k", F.col("a")).alias("k"))
            .collect()
        )
    finally:
        if force_distributed:
            P.CC_DRIVER_MAX = saved
    return {int(r["a"]): int(r["k"]) for r in rows}


def _union_find(edges):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min label per component
    comp: dict[int, int] = {}
    for n in list(parent):
        r = find(n)
        comp[r] = min(comp.get(r, r), n)
    return {n: comp[find(n)] for n in parent}


def test_chain_converges_logarithmically(spark):
    """A 200-node chain of near-dups: plain propagation needs ~200
    rounds; large-star/small-star must stay within a small multiple of
    log2(n)."""
    n = 200
    edges = [(i, i + 1) for i in range(n - 1)]
    keepers = _keepers(spark, edges)
    assert keepers == {i: 0 for i in range(n)}
    bound = 4 * math.ceil(math.log2(n)) + 4
    assert P.LAST_CC_ROUNDS <= bound, (P.LAST_CC_ROUNDS, bound)
    # and far below the linear round count the old algorithm needed
    assert P.LAST_CC_ROUNDS < n // 4


def test_random_graph_matches_union_find(spark):
    rng = random.Random(7)
    nodes = list(range(0, 400, 3))  # sparse ids (not dense) on purpose
    edges = [
        (rng.choice(nodes), rng.choice(nodes))
        for _ in range(150)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    assert _keepers(spark, edges) == _union_find(edges)


def test_empty_and_singleton_pairs(spark):
    assert _keepers(spark, [(5, 5)]) == {5: 5}


def test_driver_fallback_matches_distributed(spark):
    """Below CC_DRIVER_MAX the collapse runs driver-side union-find —
    results must be identical to the distributed star rounds."""
    import random

    rng = random.Random(11)
    nodes = list(range(0, 300, 2))
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(120)]
    edges = [(a, b) for a, b in edges if a != b]
    fast = _keepers(spark, edges, force_distributed=False)
    slow = _keepers(spark, edges, force_distributed=True)
    assert fast == slow == _union_find(edges)
