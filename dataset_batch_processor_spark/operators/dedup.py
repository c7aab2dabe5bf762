"""Deduplication suite for large-scale training-data pipelines.

The reference's only dedup is exact line dedup
(/root/reference/modules/other_tasks.py:100-125 — textops.dedup_lines
covers parity). This module adds the document-level dedup family a
100 TB text pipeline needs:

- exact:   md5-hash groupBy — one shuffle on the hash.
- MinHash: shingle → K minhashes → LSH band buckets → candidate-pair
           join. The band-bucket join replaces the O(n²) pairwise
           comparison with a shuffle on bucket keys; only same-bucket
           pairs are compared. At scale this is a plain shuffle join
           whose key cardinality grows with the corpus, so no
           broadcast requirement and no single hot key (bucket sizes
           are bounded by band collision probability).
- n-gram Jaccard verification of LSH candidates (exact set overlap,
  computed only for candidate pairs — the standard verify step).
- SimHash: 16-bit signatures; near-identical docs get equal/adjacent
  signatures.

All hashing is md5-based so the DuckDB oracle computes bit-identical
values (see functions/text.py). Every operator is declarative SQL —
JVM-side, whole-stage codegen, no Python UDFs.

Fixed parameters for the oracle-checked queries: shingle width 8,
stride 4, K=8 minhash permutations, 4 bands × 2 rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .. import catalog

SHINGLE_W = 8
SHINGLE_STRIDE = 4
NUM_HASHES = 8
BAND_ROWS = 2  # -> 4 bands

# ---------------------------------------------------------------- exact

EXACT_SPARK = """
SELECT md5(text) AS text_md5,
       min(doc_id) AS canonical_doc_id,
       count(*) AS n_copies
FROM documents
GROUP BY md5(text)
"""

EXACT_DUCK = EXACT_SPARK  # dialect-identical


# ------------------------------------------------------------ CTE pieces
# Character-shingle SET per doc: substr(text, p, W) at p = 1, 1+S, ...
# Spark and DuckDB differ only in explode vs unnest spelling.

_SHINGLES_SPARK = f"""shingles AS (
  SELECT DISTINCT doc_id, substr(text, p, {SHINGLE_W}) AS shingle
  FROM documents
  LATERAL VIEW explode(sequence(1, greatest(length(text) - {SHINGLE_W} + 1, 1), {SHINGLE_STRIDE})) t AS p
  WHERE length(text) >= {SHINGLE_W}
)"""

_SHINGLES_DUCK = f"""shingles AS (
  SELECT DISTINCT doc_id, substr(text, CAST(p AS INT), {SHINGLE_W}) AS shingle
  FROM documents,
       LATERAL (SELECT unnest(generate_series(1, len(text) - {SHINGLE_W} + 1,
                {SHINGLE_STRIDE})) AS p)
  WHERE len(text) >= {SHINGLE_W}
)"""

# K minhashes per doc: min over the shingle set of md5("k:shingle").
# DuckDB's generate_series yields BIGINT; cast k to INT to match
# Spark's sequence(int, int) element type.

_SIGS_SPARK = f"""sigs AS (
  SELECT doc_id, k, min(md5(concat(CAST(k AS STRING), ':', shingle))) AS minhash
  FROM shingles
  LATERAL VIEW explode(sequence(0, {NUM_HASHES - 1})) t AS k
  GROUP BY doc_id, k
)"""

_SIGS_DUCK = f"""sigs AS (
  SELECT doc_id, CAST(k AS INT) AS k,
         min(md5(concat(k, ':', shingle))) AS minhash
  FROM shingles,
       LATERAL (SELECT unnest(generate_series(0, {NUM_HASHES - 1})) AS k)
  GROUP BY doc_id, CAST(k AS INT)
)"""

# LSH band buckets: hash the ordered (k=minhash) slice of the
# signature per band. The bucket string differs in glue between
# engines, which is irrelevant: only bucket EQUALITY within one
# engine decides pair membership, and both glue schemes are
# collision-free for fixed k ordering.

_BANDS_SPARK = f"""bands AS (
  SELECT doc_id, CAST(floor(k / {BAND_ROWS}) AS INT) AS band,
         md5(concat_ws(',', sort_array(
             collect_list(concat(CAST(k AS STRING), '=', minhash))))) AS bucket
  FROM sigs
  GROUP BY doc_id, CAST(floor(k / {BAND_ROWS}) AS INT)
)"""

_BANDS_DUCK = f"""bands AS (
  SELECT doc_id, CAST(floor(k / {BAND_ROWS}) AS INT) AS band,
         md5(string_agg(concat(k, '=', minhash), ','
                        ORDER BY concat(k, '=', minhash))) AS bucket
  FROM sigs
  GROUP BY doc_id, CAST(floor(k / {BAND_ROWS}) AS INT)
)"""

_PAIRS_BODY = """
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a JOIN bands b
  ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
"""

# ------------------------------------------------------------- statements

MINHASH_SPARK = f"WITH {_SHINGLES_SPARK},\n{_SIGS_SPARK}\nSELECT doc_id, k, minhash FROM sigs"
MINHASH_DUCK = f"WITH {_SHINGLES_DUCK},\n{_SIGS_DUCK}\nSELECT doc_id, k, minhash FROM sigs"

LSH_PAIRS_SPARK = (
    f"WITH {_SHINGLES_SPARK},\n{_SIGS_SPARK},\n{_BANDS_SPARK}\n{_PAIRS_BODY}"
)
LSH_PAIRS_DUCK = f"WITH {_SHINGLES_DUCK},\n{_SIGS_DUCK},\n{_BANDS_DUCK}\n{_PAIRS_BODY}"

_JACCARD_BODY = """
sizes AS (
  SELECT doc_id, count(*) AS n_shingles FROM shingles GROUP BY doc_id
),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
),
inter AS (
  SELECT p.doc_a, p.doc_b, count(*) AS n_inter
  FROM pairs p
  JOIN shingles sa ON sa.doc_id = p.doc_a
  JOIN shingles sb ON sb.doc_id = p.doc_b AND sb.shingle = sa.shingle
  GROUP BY p.doc_a, p.doc_b
)
SELECT i.doc_a, i.doc_b, i.n_inter,
       za.n_shingles + zb.n_shingles - i.n_inter AS n_union,
       CAST(i.n_inter AS DOUBLE) / (za.n_shingles + zb.n_shingles - i.n_inter)
           AS jaccard
FROM inter i
JOIN sizes za ON za.doc_id = i.doc_a
JOIN sizes zb ON zb.doc_id = i.doc_b
"""

JACCARD_SPARK = (
    f"WITH {_SHINGLES_SPARK},\n{_SIGS_SPARK},\n{_BANDS_SPARK},\n{_JACCARD_BODY}"
)
JACCARD_DUCK = (
    f"WITH {_SHINGLES_DUCK},\n{_SIGS_DUCK},\n{_BANDS_DUCK},\n{_JACCARD_BODY}"
)

# ---------------------------------------------------------------- simhash
# 16-bit SimHash over the distinct-token set. Token hash = 60-bit
# md5-prefix int (functions/text.py). Bit b of the signature is 1 iff
# the ±1 votes of all token-hash bits at position b sum positive.
# Integer arithmetic only; bit extraction via exact power-of-two
# integer division (pow(2,b) is exact in double for b<=15, and the
# DataFrame-API shift functions don't take column shift amounts).

SIMHASH_SPARK = """
WITH toks AS (
  SELECT DISTINCT doc_id, token
  FROM (
    SELECT doc_id, explode(split(text, ' ')) AS token FROM documents
  ) WHERE length(token) > 0
),
th AS (
  SELECT doc_id,
         CAST(conv(substr(md5(token), 1, 15), 16, 10) AS BIGINT) AS h
  FROM toks
),
bits AS (
  SELECT doc_id, b,
         sum(2 * ((h DIV CAST(pow(2, b) AS BIGINT)) % 2) - 1) AS s
  FROM th
  LATERAL VIEW explode(sequence(0, 15)) t AS b
  GROUP BY doc_id, b
)
SELECT doc_id,
       CAST(sum(CASE WHEN s > 0 THEN CAST(pow(2, b) AS BIGINT) ELSE 0 END)
            AS BIGINT) AS simhash
FROM bits GROUP BY doc_id
"""

SIMHASH_DUCK = """
WITH toks AS (
  SELECT DISTINCT doc_id, token
  FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
  ) WHERE length(token) > 0
),
th AS (
  SELECT doc_id,
         CAST(concat('0x', substr(md5(token), 1, 15)) AS BIGINT) AS h
  FROM toks
),
bits AS (
  SELECT doc_id, CAST(b AS INT) AS b,
         sum(2 * ((h // CAST(pow(2, b) AS BIGINT)) % 2) - 1) AS s
  FROM th, LATERAL (SELECT unnest(generate_series(0, 15)) AS b)
  GROUP BY doc_id, CAST(b AS INT)
)
SELECT doc_id,
       CAST(sum(CASE WHEN s > 0 THEN CAST(pow(2, b) AS BIGINT) ELSE 0 END)
            AS BIGINT) AS simhash
FROM bits GROUP BY doc_id
"""


def _run(sql: str):
    def f(spark: SparkSession, sf_dir: str) -> DataFrame:
        catalog.load_table(spark, sf_dir, "documents").createOrReplaceTempView(
            "documents"
        )
        return spark.sql(sql)

    return f


QUERIES = {
    "dedup_exact_docs": _run(EXACT_SPARK),
    "minhash_signatures": _run(MINHASH_SPARK),
    "minhash_lsh_pairs": _run(LSH_PAIRS_SPARK),
    "minhash_jaccard_verify": _run(JACCARD_SPARK),
    "simhash_signatures": _run(SIMHASH_SPARK),
}

ORACLES = {
    "dedup_exact_docs": EXACT_DUCK,
    "minhash_signatures": MINHASH_DUCK,
    "minhash_lsh_pairs": LSH_PAIRS_DUCK,
    "minhash_jaccard_verify": JACCARD_DUCK,
    "simhash_signatures": SIMHASH_DUCK,
}
