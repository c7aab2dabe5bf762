"""Inter-annotator agreement statistics (round 14).

A preference/RLHF data pipeline audits its LABELS, not just its
texts: before a reward model trains on pairwise judgments, the
pipeline reports how well annotators agree — chance-corrected, since
raw percent agreement flatters skewed label distributions. This is
the batch formulation of that audit: Cohen's kappa (Cohen 1960,
public formulation) over two binary annotators, computed in ONE
map-side-combinable aggregation (four confusion cells + two
marginals), then closed-form integer arithmetic.

Fixture contract: the corpus ships no annotation columns, so the two
annotators are DETERMINISTIC md5-derived votes (the house pseudo-draw
idiom, ':aga'/':agb' salts). Annotator A votes 1 with ~60% rate;
annotator B copies A but flips with ~20% rate — so agreement is high
but imperfect and kappa is strongly positive (real-panel shape). A
deployment swaps the two vote expressions for its label columns; the
aggregate and the kappa arithmetic are label-source-independent.

Integer determinism: kappa = (po - pe) / (1 - pe) over rates is
algebraically (n*agree - pesum) / (n*n - pesum) with
pesum = na1*nb1 + na0*nb0 — ONE division. Quantized to ppm with the
corpusstats._scaled_div int64-safe split (numerator <= denominator by
kappa <= 1; the fixture construction keeps the numerator positive, so
the trunc-vs-floor negative-division divergence between dialects is
never reached — a CASE pins 0 if a real dataset drove it negative).

Scale: one narrow scan, one 1-row aggregate. Nothing else. int64
ledger bound: the exact-count formulation forms n*n AND _scaled_div
multiplies that n²-scale numerator/remainder by 1000 for the ppm
split, so exactness holds to n²·1000 < 2^63, i.e. n < ~9.6e7 docs
(ADVICE r14 — the earlier ~3e9 claim ignored the ×1000). A corpus
beyond that precomputes po/pe as ppm rates first (two rounded
divisions, 1-ulp looser) or lifts the division to DECIMAL(38,0) —
noted here because the module's aggregate is otherwise scale-free.
"""

from __future__ import annotations

from .corpusstats import _scaled_div
from .sqlrun import _run


def _votes(dialect: str) -> tuple[str, str]:
    if dialect == "spark":
        ha = ("CAST(conv(substr(md5(concat(CAST(doc_id AS STRING), ':aga')),"
              " 1, 7), 16, 10) AS BIGINT)")
        hb = ("CAST(conv(substr(md5(concat(CAST(doc_id AS STRING), ':agb')),"
              " 1, 7), 16, 10) AS BIGINT)")
    else:
        ha = ("CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR),"
              " ':aga')), 1, 7)) AS BIGINT)")
        hb = ("CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR),"
              " ':agb')), 1, 7)) AS BIGINT)")
    a = f"CASE WHEN {ha} % 100 < 60 THEN 1 ELSE 0 END"
    flip = f"CASE WHEN {hb} % 100 < 20 THEN 1 ELSE 0 END"
    return a, flip


def _kappa_sql(dialect: str) -> str:
    div = "DIV" if dialect == "spark" else "//"
    a, flip = _votes(dialect)
    kappa_num = "n * n_agree - (na1 * nb1 + na0 * nb0)"
    kappa_den = "n * n - (na1 * nb1 + na0 * nb0)"
    return f"""
WITH votes AS (
  SELECT doc_id, ann_a,
         CASE WHEN flip = 1 THEN 1 - ann_a ELSE ann_a END AS ann_b
  FROM (SELECT doc_id, {a} AS ann_a, {flip} AS flip FROM documents) v
),
cells AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN ann_a = 1 AND ann_b = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS n11,
         CAST(sum(CASE WHEN ann_a = 1 AND ann_b = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS n10,
         CAST(sum(CASE WHEN ann_a = 0 AND ann_b = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS n01,
         CAST(sum(CASE WHEN ann_a = 0 AND ann_b = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS n00
  FROM votes
),
marg AS (
  SELECT n, n11, n10, n01, n00,
         n11 + n00 AS n_agree,
         n11 + n10 AS na1, n01 + n00 AS na0,
         n11 + n01 AS nb1, n10 + n00 AS nb0
  FROM cells
)
SELECT n AS n_docs, n11, n10, n01, n00,
       CAST(n_agree AS BIGINT) AS n_agree,
       CAST({_scaled_div("n_agree", 1000, 1000, "n", div)} AS BIGINT)
           AS po_ppm,
       CAST({_scaled_div("na1 * nb1 + na0 * nb0", 1000, 1000, "n * n", div)}
            AS BIGINT) AS pe_ppm,
       CAST(CASE WHEN {kappa_num} <= 0 THEN 0 ELSE
            {_scaled_div(f"({kappa_num})", 1000, 1000,
                         f"({kappa_den})", div)} END AS BIGINT)
           AS kappa_ppm
FROM marg
"""


QUERIES = {
    "docs_annotator_agreement": _run(_kappa_sql("spark"), ("documents",)),
}
ORACLES = {
    "docs_annotator_agreement": _kappa_sql("duck"),
}
