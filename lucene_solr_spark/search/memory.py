"""MemoryIndex analog: a single-document in-RAM index + percolation.

Reference: lucene/memory/src/java/org/apache/lucene/index/memory/
MemoryIndex.java — its javadoc names the use case: "prospective search"
/ percolation: analyze ONE document into a RAM index, then run many
pre-built queries against it cheaply (MemoryIndex.search(Query) returns
the float score, 0 for no match), with index stats drawn from that
single document exactly as a 1-doc corpus would provide.

The in-memory postings structure is the engine's control-oracle index
(search/oracle.py) built over one document, so every query shape the
oracle evaluates — MUST/SHOULD/MUST_NOT, minShouldMatch, DisjunctionMax,
exact/sloppy phrases, MultiPhrase, span-near — works against a
MemoryIndex with the SAME bit-exact float32 scoring as the distributed
engine.

`percolate` is the distributed face: queries are parsed once on the
driver, shipped in the closure, and every partition evaluates its
documents against all of them inside one Arrow stage — zero shuffle,
no driver involvement per doc. Per-document work is inherent to
percolation (the reference builds a MemoryIndex per doc too); the stage
is embarrassingly parallel, so at 100 TB it scales with executors.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

from ..analysis.tokenizer import analyze
from .engine import BooleanSpec
from .oracle import build_oracle_index, oracle_topk_spec


class MemoryIndex:
    """One analyzed document, queryable many times (MemoryIndex.java)."""

    def __init__(self, text: str):
        self._idx = build_oracle_index([(0, text or "")])

    def score(self, spec: BooleanSpec) -> float:
        """MemoryIndex.search(Query): the doc's score under `spec` with
        this single-doc index's own stats (docCount=1), 0.0 = no match."""
        hits = oracle_topk_spec(self._idx, spec, k=1)
        return float(hits[0][1]) if hits else 0.0

    def search(self, query: str, mode: str = "or") -> float:
        terms = tuple(analyze(query))
        spec = BooleanSpec(must=terms) if mode == "and" else BooleanSpec(should=terms)
        return self.score(spec)

    def percolate(self, specs: dict[str, BooleanSpec]) -> dict[str, float]:
        """Registered-query matching for this doc: {name: score} for every
        spec the doc matches."""
        out = {}
        for name, spec in specs.items():
            hits = oracle_topk_spec(self._idx, spec, k=1)
            if hits:
                out[name] = float(hits[0][1])
        return out


def percolate(
    df: DataFrame,
    specs: dict[str, BooleanSpec],
    content_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Percolate every document of `df` against the registered queries:
    -> DataFrame(id_col long, query string, score float) with one row per
    (doc, matching query). Queries are parsed driver-side ONCE; the match
    work runs in a single zero-shuffle Arrow stage."""
    items = sorted(specs.items())

    def run(batches):
        for pdf in batches:
            ids, names, scores = [], [], []
            for did, txt in zip(pdf[id_col], pdf[content_col]):
                for name, score in MemoryIndex(txt).percolate(dict(items)).items():
                    ids.append(did)
                    names.append(name)
                    scores.append(score)
            yield pd.DataFrame({id_col: ids, "query": names, "score": scores})

    return df.select(id_col, content_col).mapInPandas(
        run, f"{id_col} long, query string, score float"
    )
