#!/usr/bin/env python3
"""Generate the sf1 documents/embeddings side-lane (driver testdata stops
at sf0.1; this synthesizes the sf1-equivalent: 500k documents, 20k
64-dim embeddings — the histogram-family falsification corpus from
PLANS.md round 12/13).

Same lattice rule as gen_sf1_lane.py: every synthetic id MUST be
hash-derived (`hash(i) % N`), never linear-congruential — a multiplier
map steps ids by a constant inside any modulo-derived group, and when
that stride is ≡ 0 (mod a downstream sample modulus) whole groups
collapse to one distinct sample and threshold rollups silently zero out.

Score spread matters for the calibrate/MAD rows — and it is a TRAP:
a doc made of ONE repeated word 'wN' has alpha-ratio exactly
2/(2+digitlen(N)) regardless of repeat count, so the corpus collapses
to ~a dozen distinct quality scores, the pooled histogram is tiny, and
the broadcast-non-equi broken-plan experiment measures +10% instead of
the quadratic blowup (observed round 13). Each doc therefore mixes
hash-varied words of different digit lengths: the per-doc alpha ratio
becomes a near-unique rational and the micro-quantized score histogram
is corpus-sized — the regime where a broadcast non-equi pooled-position
lookup degenerates to a BroadcastNestedLoopJoin.

Usage: python3 tools/gen_sf1_docs.py [outdir] [vocab]
  outdir  default /tmp/sf1_docs13
  vocab   omitted → the legacy 997-word flat vocab (the histogram lane);
          an integer V → a ZIPF-ish vocab of V distinct words (rank
          drawn log-uniformly, P(rank) ~ 1/rank): the realistic
          retrieval regime where most words are rare, so a query batch's
          term set actually PRUNES the BM25 postings (the 997-word lane
          cannot show that win by construction — every term is a head
          term matching ~everything).
"""
import os
import sys

import duckdb

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1_docs13"
vocab = int(sys.argv[2]) if len(sys.argv) > 2 else None
os.makedirs(out, exist_ok=True)

if vocab is None:
    word = "'w' || CAST(hash(i * 131 + j) % 997 AS VARCHAR)"
else:
    # inverse-CDF of a log-uniform rank ≈ Zipf(1): u in [0,1) →
    # rank = floor(exp(u·lnV)) in [1, V); head ranks dominate
    word = ("'w' || CAST(CAST(floor(exp((CAST(hash(i * 131 + j) % 100000 "
            f"AS DOUBLE) / 100000.0) * ln({vocab}.0))) AS BIGINT) AS VARCHAR)")

text_expr = f"""array_to_string(list_transform(
      range(0, CAST(1 + hash(i * 13 + 9) % 120 AS INTEGER)),
      j -> {word}), ' ')
      || ' ' || repeat('z', CAST(hash(i * 7 + 2) % 211 AS INTEGER))
      || repeat('7', CAST(hash(i * 19 + 4) % 97 AS INTEGER))"""

duckdb.sql(f"""
COPY (
  SELECT
    CAST(hash(i) % 281474976710656 AS BIGINT) AS doc_id,
    'lang' || CAST(hash(i * 5 + 1) % 5 AS VARCHAR) AS lang,
    'src' || CAST(hash(i * 11 + 3) % 20 AS VARCHAR) AS source,
    CAST(len({text_expr}) AS BIGINT) AS n_chars,
    {text_expr} AS text
  FROM range(0, 500000) t(i)
) TO '{out}/documents.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 20000)
""")
# ROW_GROUP_SIZE 20000: DuckDB's default ~122k-row groups leave a 500k-doc
# file with ~4 groups, capping Spark's scan parallelism at 4 tasks — the
# single-threaded score-evaluation residual PLANS.md round 12 measured.
# 25 groups let the regex-heavy score scans fan out (production corpora
# are always multi-file; the lane should not be scan-skewed).

duckdb.sql(f"""
COPY (
  SELECT
    CAST(hash(i) % 1099511627776 AS BIGINT) AS vec_id,
    list_transform(range(0, 64), j ->
      CAST((CAST(hash(i * 64 + j) % 2000 AS BIGINT) - 1000) / 1000.0
        AS FLOAT)) AS embedding,
    CAST(hash(i * 17 + 5) % 10 AS INTEGER) AS label
  FROM range(0, 20000) t(i)
) TO '{out}/embeddings.parquet' (FORMAT PARQUET)
""")

nd, = duckdb.sql(f"SELECT count(*) FROM '{out}/documents.parquet'").fetchone()
ne, = duckdb.sql(f"SELECT count(*) FROM '{out}/embeddings.parquet'").fetchone()
ns, = duckdb.sql(
    f"SELECT count(DISTINCT doc_id) FROM '{out}/documents.parquet'").fetchone()
print(f"wrote {out}: {nd} documents ({ns} distinct ids), {ne} embeddings")
