#!/usr/bin/env bash
# North-rule packaging: run the index build via spark-submit --py-files on a
# (multi-)executor cluster. On a real cluster swap --master for yarn/k8s.
#   tools/submit_job.sh [corpus_parquet_dir] [out_index_dir] [cores]
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
CORPUS="${1:-/root/testdata/sf0.01}"
OUT="${2:-/tmp/lss_submit_idx}"
CORES="${3:-8}"
ZIP="$(mktemp -d)/lucene_solr_spark.zip"
(cd "$REPO" && python -c "
import shutil, sys
shutil.make_archive('${ZIP%.zip}', 'zip', '.', 'lucene_solr_spark')
print('packaged', '$ZIP')
")
exec spark-submit \
  --master "local[$CORES]" \
  --conf spark.sql.shuffle.partitions="$((CORES * 2))" \
  --py-files "$ZIP" \
  "$REPO/tools/submit_entry.py" --corpus "$CORPUS" --out "$OUT"
