"""spark-submit entry point: build the index over a documents parquet dir and
run a smoke BM25 query. The package arrives via --py-files (north rule)."""
import argparse
import json

from pyspark.sql import SparkSession


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()
    spark = SparkSession.builder.appName("lss-submit").getOrCreate()
    from lucene_solr_spark.index.builder import build_index
    from lucene_solr_spark.search.engine import IndexSearcher

    src = spark.read.parquet(args.corpus + "/documents.parquet")
    build_index(
        spark, src, out_dir=args.out, content_col="text", doc_id_col="doc_id",
        meta_cols=["lang", "source"], range_size=512, fingerprint=f"submit:{args.corpus}",
    )
    s = IndexSearcher(spark, args.out)
    hits = [(r["doc_id"], float(r["score"])) for r in s.topk("spark merge", k=5).collect()]
    print(json.dumps({"indexed_docs": s.doc_count, "top5": hits}))
    spark.stop()


if __name__ == "__main__":
    main()
