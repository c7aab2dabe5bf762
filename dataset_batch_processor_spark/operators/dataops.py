"""Dataset-operations surface: snapshot diffing and integrity audits.

Ops a large-scale data platform runs around the analytics, not inside
them (no counterpart in the reference, which mutates folders in
place — SURVEY.md §2.9; this is the immutable-snapshot replacement
for "did my batch job change what I think it changed"):

- ``docs_snapshot_diff``: content-hash diff of two corpus snapshots —
  the review artifact for a curation run (what got added / removed /
  rewritten). Both engines synthesize snapshot B from the fixture
  with the same deterministic mutation so the driver hash gate can
  pin the diff logic itself.
- ``fk_integrity_audit``: orphan counts per foreign-key edge
  (lineitem→orders, orders→customer). Zero rows of violations is the
  EXPECTED answer on consistent data — the audit proves the zero.

Scale:
- The diff is one FULL OUTER equi-join on the snapshot key with
  md5-hash comparison — hash shuffle both sides on doc_id, map-side
  hashing, no skew risk beyond the key itself.
- Each FK audit is a LEFT ANTI join (child side keeps its
  partitioning; parent key set broadcasts when dim-sized, AQE
  decides) followed by a count — the counts collapse map-side.
"""

from __future__ import annotations

from .sqlrun import _run

# Snapshot B = deterministic mutation of the fixture corpus:
#   - doc_id % 17 == 0 -> row deleted
#   - doc_id % 13 == 0 (and not deleted) -> text rewritten
#   - every doc_id % 19 == 0 re-enters as a NEW doc (doc_id + 10^6)
# The CASE order (delete wins over change) is identical in both
# dialects, so the diff is exactly reproducible.

_DIFF_CORE = """
WITH snap_b AS (
  SELECT doc_id,
         CASE WHEN doc_id % 13 = 0 THEN concat(text, ' [rev2]')
              ELSE text END AS text
  FROM documents WHERE doc_id % 17 <> 0
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, concat('new: ', text) AS text
  FROM documents WHERE doc_id % 19 = 0
),
a AS (SELECT doc_id, md5(text) AS h FROM documents),
b AS (SELECT doc_id, md5(text) AS h FROM snap_b),
joined AS (
  SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
         CASE WHEN b.doc_id IS NULL THEN 'removed'
              WHEN a.doc_id IS NULL THEN 'added'
              WHEN a.h <> b.h THEN 'changed'
              ELSE 'unchanged' END AS status
  FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
)
SELECT doc_id, status FROM joined
WHERE status <> 'unchanged'
ORDER BY doc_id
"""

_FK_CORE = """
SELECT 'lineitem.l_orderkey -> orders.o_orderkey' AS fk_edge,
       (SELECT count(*) FROM lineitem) AS n_child,
       (SELECT count(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = l.l_orderkey)) AS n_orphans
UNION ALL
SELECT 'orders.o_custkey -> customer.c_custkey' AS fk_edge,
       (SELECT count(*) FROM orders) AS n_child,
       (SELECT count(*) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = o.o_custkey)) AS n_orphans
ORDER BY fk_edge
"""

QUERIES = {
    "docs_snapshot_diff": _run(_DIFF_CORE, ("documents",)),
    "fk_integrity_audit": _run(_FK_CORE, ("lineitem", "orders", "customer")),
}
ORACLES = {
    "docs_snapshot_diff": _DIFF_CORE,
    "fk_integrity_audit": _FK_CORE,
}


# --------------------------------------------------- PII column audit
# Schema-level privacy triage — "which columns of this table carry
# PII-shaped values?" — the audit every governed lakehouse runs
# before granting a dataset to training (the column-classifier idea
# behind Glue/Purview/DLP scanners, expressed as one Spark pass).
# For each candidate string column: hit rates (integer ppm) for the
# email / formatted-phone / long-digit-run shapes (textclean.py's
# RE2-compatible patterns), classified by a fixed priority when the
# rate crosses PII_CLASS_PPM. ONE aggregation row over the table
# (every count map-side combined), then a stack() to one row per
# column — the scan cost is a single pass regardless of column count.
#
# The gated fixture synthesizes four columns with KNOWN shapes from
# the customer table (clean segment, digit-run name, synthetic email
# and phone), so a misclassification cannot hash green.

from .textclean import DIGITS_RE, EMAIL_RE

PHONE_RE = "[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}"
PII_CLASS_PPM = 500_000

_PII_FAMS = (("email", EMAIL_RE), ("phone", PHONE_RE), ("digits", DIGITS_RE))


def pii_column_audit(df, columns):
    """One row per audited column: hit ppm per PII family + class."""
    from pyspark.sql import functions as F

    aggs = [F.count(F.lit(1)).cast("long").alias("_n")]
    for c in columns:
        for fam, pat in _PII_FAMS:
            aggs.append(
                F.sum(F.col(c).rlike(pat).cast("long")).alias(f"{c}__{fam}")
            )
    one = df.agg(*aggs)
    stacked = ", ".join(
        f"'{c}', {c}__email, {c}__phone, {c}__digits" for c in columns
    )
    return one.selectExpr(
        "_n",
        f"stack({len(columns)}, {stacked}) AS "
        "(column, _email, _phone, _digits)",
    ).selectExpr(
        "column",
        "CAST(_n AS BIGINT) AS n_rows",
        "_email * 1000000 DIV _n AS email_ppm",
        "_phone * 1000000 DIV _n AS phone_ppm",
        "_digits * 1000000 DIV _n AS digits_ppm",
        f"""CASE WHEN _email * 1000000 DIV _n >= {PII_CLASS_PPM} THEN 'email'
             WHEN _phone * 1000000 DIV _n >= {PII_CLASS_PPM} THEN 'phone'
             WHEN _digits * 1000000 DIV _n >= {PII_CLASS_PPM} THEN 'digits'
             ELSE 'clean' END AS pii_class""",
    )


_PII_FIXTURE = """
SELECT c_name AS name,
       'user' || c_custkey || '@example.com' AS contact,
       '12-345-678-' || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
         AS phone,
       c_mktsegment AS segment
FROM customer
"""

_PII_COLS = ("name", "contact", "phone", "segment")


def _q_pii_column_audit(spark, sf_dir):
    from .. import catalog

    catalog.load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "customer"
    )
    fixture = spark.sql(_PII_FIXTURE.replace("AS VARCHAR", "AS STRING"))
    return pii_column_audit(fixture, _PII_COLS)


def _pii_duck() -> str:
    fams = {"email": EMAIL_RE, "phone": PHONE_RE, "digits": DIGITS_RE}
    per_col = []
    for c in _PII_COLS:
        counts = {
            fam: (
                f"count(*) FILTER (WHERE regexp_matches({c}, '{pat}'))"
                f" * 1000000 // count(*)"
            )
            for fam, pat in fams.items()
        }
        per_col.append(
            f"""SELECT '{c}' AS column,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST({counts['email']} AS BIGINT) AS email_ppm,
       CAST({counts['phone']} AS BIGINT) AS phone_ppm,
       CAST({counts['digits']} AS BIGINT) AS digits_ppm,
       CASE WHEN {counts['email']} >= {PII_CLASS_PPM} THEN 'email'
            WHEN {counts['phone']} >= {PII_CLASS_PPM} THEN 'phone'
            WHEN {counts['digits']} >= {PII_CLASS_PPM} THEN 'digits'
            ELSE 'clean' END AS pii_class
FROM fixture"""
        )
    return (
        f"WITH fixture AS ({_PII_FIXTURE})\n"
        + "\nUNION ALL\n".join(per_col)
    )


QUERIES["pii_column_audit"] = _q_pii_column_audit
ORACLES["pii_column_audit"] = _pii_duck()


# ------------------------------------------- snapshot drift (round 9)
# Distribution drift between two corpus snapshots — the audit a
# pipeline runs before accepting a refreshed crawl: has the length
# profile of any source shifted? Metric: TOTAL VARIATION distance in
# ppm between the snapshots' per-source n_chars-bucket histograms.
# TV (= half the L1 between the two ppm-normalized histograms) is the
# repo's exact-arithmetic stand-in for PSI/KL, which the no-ln rule
# forbids: per-bucket shares are integer trunc divisions
# (cnt * 10^6 DIV snapshot_total), the |a - b| sum is integer, and
# the final DIV 2 is exact — bit-identical on both engines by
# construction. Snapshots are the deterministic doc_id parity split
# (the docs_snapshot_diff convention). 100-TB posture: two
# map-side-combined groupBys on (source, bucket) — key space is
# sources x 8 buckets — plus a sources-sized join; nothing
# corpus-sized shuffles twice.

_DRIFT_CORE = """
WITH bucketed AS (
  SELECT source,
         CAST(doc_id % 2 AS INT) AS snap,
         CAST(least(n_chars DIV 64, 7) AS INT) AS bucket
  FROM documents
),
hist AS (
  SELECT source, snap, bucket, CAST(count(*) AS BIGINT) AS cnt
  FROM bucketed GROUP BY source, snap, bucket
),
tot AS (
  SELECT source, snap, CAST(sum(cnt) AS BIGINT) AS n
  FROM hist GROUP BY source, snap
),
shares AS (
  SELECT h.source, h.bucket,
         CAST(sum(CASE WHEN h.snap = 0
                       THEN h.cnt * 1000000 DIV t.n ELSE 0 END)
              AS BIGINT) AS a_ppm,
         CAST(sum(CASE WHEN h.snap = 1
                       THEN h.cnt * 1000000 DIV t.n ELSE 0 END)
              AS BIGINT) AS b_ppm
  FROM hist h JOIN tot t ON t.source = h.source AND t.snap = h.snap
  GROUP BY h.source, h.bucket
)
SELECT source,
       CAST(count(*) AS INT) AS n_buckets,
       CAST(sum(abs(a_ppm - b_ppm)) DIV 2 AS BIGINT) AS tv_ppm,
       CAST(max(abs(a_ppm - b_ppm)) AS BIGINT) AS max_bucket_gap_ppm
FROM shares
GROUP BY source
ORDER BY source
"""

QUERIES["docs_snapshot_drift"] = _run(_DRIFT_CORE, ("documents",))
ORACLES["docs_snapshot_drift"] = _DRIFT_CORE.replace(
    " DIV ", " // "
)
