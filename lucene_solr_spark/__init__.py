"""lucene_solr_spark — a PySpark-native inverted-index + BM25 engine.

A from-scratch re-creation of the query/data-processing capabilities of
Lucene/Solr (reference: /root/reference, Lucene 7.0.0-SNAPSHOT) expressed
Spark-first: DataFrame/SQL plans, vectorized pandas/Arrow UDFs for the
analysis + posting-codec hot paths, and explicit partitioning for the
index build (per-partition segments -> salted term/doc-range merge).

Nothing here is a port: the reference tells us WHAT to compute
(tokenization semantics, BM25 math, top-k tie-breaks, posting-block
layout invariants); the HOW is idiomatic PySpark.
"""

__version__ = "0.1.0"
