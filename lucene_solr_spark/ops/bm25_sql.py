"""ANSI-SQL rendering of the Lucene BM25 pipeline over the `documents` table.

Two uses:
  * oracle_sql() strings for the driver's DuckDB comparison, and
  * an equivalent Catalyst-only (spark.sql) execution path — evidence that
    the reference's relational layer (SQLHandler, SURVEY.md §2.8) is a strict
    subset of Spark SQL.

The norm byte quantization (SmallFloat.floatToByte315 of 1/sqrt(dl)) is not
expressible in portable SQL, but it is a monotone step function of the
integer field length, so we embed it as a <=256-row (dl_lo, dl_hi, dnorm)
lookup generated from the bit-exact Python port — identical quantization on
both sides; scores then differ only by f32-vs-f64 arithmetic on identical
rational inputs, which the rank-only output absorbs.

The `documents` testdata is pure lowercase space-separated words, so the
analysis chain reduces exactly to split-on-space + stop filter (verified by
tests against the real tokenizer).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from ..analysis.smallfloat import NORM_TABLE, encode_norm
from ..analysis.tokenizer import ENGLISH_STOP_WORDS, analyze

K1 = 1.2
B = 0.75
MAX_DL = 1 << 20


@lru_cache(maxsize=1)
def norm_lut_rows() -> list[tuple[int, int, float]]:
    """(dl_lo, dl_hi, decoded_norm) ranges covering dl in [0, MAX_DL]."""
    dl = np.arange(0, MAX_DL + 1, dtype=np.int64)
    bytes_ = encode_norm(dl)
    dnorm = NORM_TABLE[bytes_].astype(np.float64)
    cuts = np.flatnonzero(np.diff(bytes_.astype(np.int32))) + 1
    starts = np.concatenate(([0], cuts))
    ends = np.concatenate((cuts - 1, [MAX_DL]))
    return [(int(s), int(e), float(dnorm[s])) for s, e in zip(starts, ends)]


def norm_lut_values_sql() -> str:
    rows = ",".join(f"({lo},{hi},{v!r})" for lo, hi, v in norm_lut_rows())
    return f"(VALUES {rows})"


def stoplist_sql() -> str:
    return "(" + ",".join(f"'{w}'" for w in sorted(ENGLISH_STOP_WORDS)) + ")"


def bm25_topk_sql(query: str, k: int = 10, mode: str = "or") -> str:
    """Full BM25 top-k as one SQL string over `documents(doc_id, text)`.

    Output: (doc_id BIGINT, rank INT) — rank 1..k by score DESC, doc_id ASC
    (HitQueue tie-break). Rank-only output is robust to f32/f64 rounding.
    """
    terms = analyze(query)
    if not terms:
        return f"SELECT CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS INTEGER) AS rank WHERE 1=0"
    uniq = sorted(set(terms))
    clause = {t: terms.count(t) for t in uniq}
    terms_in = ",".join(f"'{t}'" for t in uniq)
    clause_vals = ",".join(f"('{t}',{c})" for t, c in clause.items())
    having = (
        f"HAVING count(DISTINCT tf.term) = {len(uniq)}" if mode == "and" else ""
    )
    return f"""
WITH tok AS (
  SELECT d.doc_id, t.tok AS term
  FROM documents d, unnest(string_split(d.text, ' ')) AS t(tok)
  WHERE t.tok <> '' AND t.tok NOT IN {stoplist_sql()}
),
dl AS (
  SELECT d.doc_id, CAST(COALESCE(c.cnt, 0) AS BIGINT) AS dl
  FROM documents d
  LEFT JOIN (SELECT doc_id, count(*) AS cnt FROM tok GROUP BY doc_id) c USING (doc_id)
),
stats AS (
  SELECT CAST(count(*) AS DOUBLE) AS n, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl
),
norm_lut(dl_lo, dl_hi, dnorm) AS (SELECT * FROM {norm_lut_values_sql()}),
clauses(term, clause_n) AS (VALUES {clause_vals}),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
  FROM tok WHERE term IN ({terms_in}) GROUP BY doc_id, term
),
dfs AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         sum(
           ln(1 + (s.n - dfs.df + 0.5) / (dfs.df + 0.5)) * ({K1} + 1) * c.clause_n
           * tf.tf / (tf.tf + {K1} * ((1 - {B}) + {B} * lut.dnorm / s.avgdl))
         ) AS score
  FROM tf
  JOIN dfs USING (term)
  JOIN clauses c USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id
  JOIN norm_lut lut ON dl.dl BETWEEN lut.dl_lo AND lut.dl_hi
  CROSS JOIN stats s
  GROUP BY tf.doc_id
  {having}
)
SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INTEGER) AS rank
FROM scored
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""
