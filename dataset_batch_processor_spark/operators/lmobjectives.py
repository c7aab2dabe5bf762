"""LM-objective data transforms: T5 span corruption and FIM.

The last mile of a pre-training pipeline turns clean documents into
OBJECTIVE-SHAPED examples. Two standard transforms, each driven by
seeded hashes so the "random" choices are deterministic, replayable,
and identical in both engines:

- **Span corruption** (Raffel et al. 2020 §3.1.4, the T5 denoising
  objective): mask ~15% of tokens, merge adjacent masked tokens into
  spans, replace each span with a numbered sentinel in the input and
  emit ``sentinel + original tokens`` as the target. The mask
  decision per (doc, position) is an md5-derived integer mod test —
  the same 28-bit-hex-prefix idiom the MinHash shingle hash uses.

- **FIM** (Bavarian et al. 2022 "Efficient Training of Language
  Models to Fill in the Middle"): two seeded-hash cut points split
  the character stream into prefix/middle/suffix, re-emitted in PSM
  order ``<PRE> p <SUF> s <MID> m``. Pure substr arithmetic.

Both are narrow per-row transforms at corpus scale (the span mask
needs one per-doc window for the lag/cumsum — state bounded by one
document, the lmscore.py posture); nothing shuffles on anything
wider than doc_id. No floats anywhere — hash mod tests and integer
positions only, so the gate is exact by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .. import catalog

MASK_DEN = 20  # mask a token when hash % 20 < 3  (15%)
MASK_NUM = 3

# dialect-shared scoring core: everything after the tokenizing CTE.
_SPAN_BODY = f"""
marked AS (
  SELECT doc_id, pos, token,
         ({{h}} % {MASK_DEN}) < {MASK_NUM} AS m
  FROM toks
),
spans AS (
  SELECT doc_id, pos, token, m,
         m AND NOT lag(m, 1, FALSE)
               OVER (PARTITION BY doc_id ORDER BY pos) AS s
  FROM marked
),
numbered AS (
  SELECT doc_id, pos, token, m, s,
         sum(CASE WHEN s THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY pos) AS k
  FROM spans
),
pieces AS (
  SELECT doc_id, pos, m, s,
         CASE WHEN NOT m THEN token
              WHEN s THEN '<extra_id_' || (k - 1) || '>'
              ELSE NULL END AS in_piece,
         CASE WHEN m AND s
                THEN '<extra_id_' || (k - 1) || '>' || ' ' || token
              WHEN m THEN token
              ELSE NULL END AS tgt_piece
  FROM numbered
)
"""

SPAN_CORRUPTION_SPARK = (
    """
WITH toks AS (
  SELECT doc_id, pos, token
  FROM documents
  LATERAL VIEW posexplode(split(text, ' ')) t AS pos, token
),
"""
    + _SPAN_BODY.format(
        h="CAST(conv(substr(md5(concat(doc_id, ':', pos)), 1, 7), 16, 10)"
        " AS BIGINT)"
    )
    + """
SELECT doc_id,
       CAST(count(*) AS INT) AS n_tokens,
       CAST(sum(CASE WHEN m THEN 1 ELSE 0 END) AS INT) AS n_masked,
       CAST(sum(CASE WHEN s THEN 1 ELSE 0 END) AS INT) AS n_spans,
       md5(array_join(
         filter(transform(array_sort(collect_list(struct(pos, in_piece))),
                          x -> x.in_piece),
                p -> p IS NOT NULL), ' ')) AS inputs_md5,
       md5(array_join(
         filter(transform(array_sort(collect_list(struct(pos, tgt_piece))),
                          x -> x.tgt_piece),
                p -> p IS NOT NULL), ' ')) AS targets_md5
FROM pieces
GROUP BY doc_id
"""
)

SPAN_CORRUPTION_DUCK = (
    """
WITH toks AS (
  SELECT doc_id,
         generate_subscripts(string_split(text, ' '), 1) - 1 AS pos,
         unnest(string_split(text, ' ')) AS token
  FROM documents
),
"""
    + _SPAN_BODY.format(
        h="CAST(concat('0x', substr(md5(concat(doc_id, ':', pos)), 1, 7))"
        " AS BIGINT)"
    )
    + """
SELECT doc_id,
       CAST(count(*) AS INT) AS n_tokens,
       CAST(sum(CASE WHEN m THEN 1 ELSE 0 END) AS INT) AS n_masked,
       CAST(sum(CASE WHEN s THEN 1 ELSE 0 END) AS INT) AS n_spans,
       md5(coalesce(array_to_string(
         list(in_piece ORDER BY pos) FILTER (in_piece IS NOT NULL),
         ' '), '')) AS inputs_md5,
       md5(coalesce(array_to_string(
         list(tgt_piece ORDER BY pos) FILTER (tgt_piece IS NOT NULL),
         ' '), '')) AS targets_md5
FROM pieces
GROUP BY doc_id
"""
)


def _q_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    catalog.load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents"
    )
    return spark.sql(SPAN_CORRUPTION_SPARK)


# ----------------------------------------------------------------- FIM

# cut points from two independent seeded hashes: c1 uniform over
# [0, L], c2 uniform over [c1, L] — both pure integer mod, so prefix/
# middle/suffix tile the document exactly (len checks in the output).
_FIM_CORE = """
SELECT doc_id,
       CAST(c1 AS INT) AS cut1,
       CAST(c2 AS INT) AS cut2,
       CAST(length(text) AS INT) AS n_chars,
       md5('<PRE> ' || substr(text, 1, c1)
           || ' <SUF> ' || substr(text, c2 + 1)
           || ' <MID> ' || substr(text, c1 + 1, c2 - c1)) AS fim_md5
FROM (
  SELECT doc_id, text, c1,
         c1 + ({h2} % (length(text) - c1 + 1)) AS c2
  FROM (
    SELECT doc_id, text,
           {h1} % (length(text) + 1) AS c1
    FROM documents
  )
)
"""

FIM_SPARK = _FIM_CORE.format(
    h1="CAST(conv(substr(md5(concat(doc_id, ':a')), 1, 7), 16, 10) AS BIGINT)",
    h2="CAST(conv(substr(md5(concat(doc_id, ':b')), 1, 7), 16, 10) AS BIGINT)",
)
FIM_DUCK = _FIM_CORE.format(
    h1="CAST(concat('0x', substr(md5(concat(doc_id, ':a')), 1, 7)) AS BIGINT)",
    h2="CAST(concat('0x', substr(md5(concat(doc_id, ':b')), 1, 7)) AS BIGINT)",
)


def _q_fim_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    catalog.load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents"
    )
    return spark.sql(FIM_SPARK)


# ---------------------------------------------- UL2 mixture of denoisers
# Tay et al. 2022 "UL2: Unifying Language Learning Paradigms": one
# corpus, three denoisers — R (regular T5-rate span corruption), X
# (extreme 50% corruption), S (sequential / prefix-LM, cast as a single
# contiguous tail span) — with a paradigm token prefixed to the input.
# Deterministic instantiation: the denoiser per doc is a seeded hash
# mod 4 (R twice, S, X — R-heavy like the paper's mixture), the S cut
# point is a second seeded hash uniform over the middle half
# [n/4, 3n/4], and R/X reuse the gated span machinery verbatim with
# mask rates 3/20 and 10/20. Casting S as "mask every pos >= cut"
# makes all three paradigms flow through ONE spans->numbered->pieces
# chain, so the sentinel numbering and target assembly are shared with
# (and pinned by) docs_span_corruption.
#
# Scale: identical to span corruption — token explode, one doc-keyed
# lag/cumsum window, plus a doc-grain length join. Nothing wider than
# doc_id shuffles; no floats anywhere.

X_NUM = 10  # X-denoiser masks at 10/20 = 50%

_UL2_BODY = f"""
dlen AS (
  SELECT doc_id, count(*) AS n_toks FROM toks GROUP BY doc_id
),
meta AS (
  SELECT doc_id, n_toks,
         CASE {{hm}} % 4 WHEN 2 THEN 'S' WHEN 3 THEN 'X' ELSE 'R' END
             AS mode,
         n_toks {{div}} 4 + {{hc}} % (n_toks {{div}} 2 + 1) AS cut
  FROM dlen
),
marked AS (
  SELECT t.doc_id AS doc_id, t.pos, t.token, m.mode,
         CASE m.mode
           WHEN 'S' THEN t.pos >= m.cut
           WHEN 'X' THEN ({{h}} % {MASK_DEN}) < {X_NUM}
           ELSE ({{h}} % {MASK_DEN}) < {MASK_NUM} END AS m
  FROM toks t JOIN meta m ON t.doc_id = m.doc_id
),
spans AS (
  SELECT doc_id, pos, token, mode, m,
         m AND NOT lag(m, 1, FALSE)
               OVER (PARTITION BY doc_id ORDER BY pos) AS s
  FROM marked
),
numbered AS (
  SELECT doc_id, pos, token, mode, m, s,
         sum(CASE WHEN s THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY pos) AS k
  FROM spans
),
pieces AS (
  SELECT doc_id, pos, mode, m, s,
         CASE WHEN NOT m THEN token
              WHEN s THEN '<extra_id_' || (k - 1) || '>'
              ELSE NULL END AS in_piece,
         CASE WHEN m AND s
                THEN '<extra_id_' || (k - 1) || '>' || ' ' || token
              WHEN m THEN token
              ELSE NULL END AS tgt_piece
  FROM numbered
)
"""


def _h_ul2(engine: str, seed: str) -> str:
    if engine == "spark":
        return (f"CAST(conv(substr(md5(concat(doc_id, '{seed}')), 1, 7),"
                " 16, 10) AS BIGINT)")
    return (f"CAST(concat('0x', substr(md5(concat(doc_id, '{seed}')), 1, 7))"
            " AS BIGINT)")


def _ul2_sql(engine: str, tail: str) -> str:
    if engine == "spark":
        toks = """toks AS (
  SELECT doc_id, pos, token
  FROM documents
  LATERAL VIEW posexplode(split(text, ' ')) t AS pos, token
)"""
        h = ("CAST(conv(substr(md5(concat(doc_id, ':', pos)), 1, 7), 16, 10)"
             " AS BIGINT)")
        div = "DIV"
    else:
        toks = """toks AS (
  SELECT doc_id,
         generate_subscripts(string_split(text, ' '), 1) - 1 AS pos,
         unnest(string_split(text, ' ')) AS token
  FROM documents
)"""
        h = ("CAST(concat('0x', substr(md5(concat(doc_id, ':', pos)), 1, 7))"
             " AS BIGINT)")
        div = "//"
    body = _UL2_BODY.format(
        # the mask hash evaluates inside the toks-x-meta join, where
        # bare doc_id is ambiguous — qualify it with the toks alias
        h=h.replace("concat(doc_id,", "concat(t.doc_id,"),
        hm=_h_ul2(engine, ":ul2m"),
        hc=_h_ul2(engine, ":ul2c"),
        div=div,
    )
    return f"WITH {toks},{body}" + tail.format(div=div)


# per-doc example shape: paradigm token folded into the inputs hash,
# same ordered-join md5 idiom as docs_span_corruption.
_UL2_DOC_TAIL_SPARK = """
SELECT doc_id, max(mode) AS mode,
       CAST(count(*) AS INT) AS n_tokens,
       CAST(sum(CASE WHEN m THEN 1 ELSE 0 END) AS INT) AS n_masked,
       CAST(sum(CASE WHEN s THEN 1 ELSE 0 END) AS INT) AS n_spans,
       md5('[' || max(mode) || '] ' || array_join(
         filter(transform(array_sort(collect_list(struct(pos, in_piece))),
                          x -> x.in_piece),
                p -> p IS NOT NULL), ' ')) AS inputs_md5,
       md5(array_join(
         filter(transform(array_sort(collect_list(struct(pos, tgt_piece))),
                          x -> x.tgt_piece),
                p -> p IS NOT NULL), ' ')) AS targets_md5
FROM pieces
GROUP BY doc_id
"""

_UL2_DOC_TAIL_DUCK = """
SELECT doc_id, max(mode) AS mode,
       CAST(count(*) AS INT) AS n_tokens,
       CAST(sum(CASE WHEN m THEN 1 ELSE 0 END) AS INT) AS n_masked,
       CAST(sum(CASE WHEN s THEN 1 ELSE 0 END) AS INT) AS n_spans,
       md5('[' || max(mode) || '] ' || coalesce(array_to_string(
         list(in_piece ORDER BY pos) FILTER (in_piece IS NOT NULL),
         ' '), '')) AS inputs_md5,
       md5(coalesce(array_to_string(
         list(tgt_piece ORDER BY pos) FILTER (tgt_piece IS NOT NULL),
         ' '), '')) AS targets_md5
FROM pieces
GROUP BY doc_id
"""

# mixture composition card: the UL2 knob an operator actually tunes —
# per paradigm the doc share and realized corruption rate in ppm.
_UL2_CARD_TAIL = """
, per_doc AS (
  SELECT doc_id, max(mode) AS mode,
         count(*) AS n_tokens,
         sum(CASE WHEN m THEN 1 ELSE 0 END) AS n_masked,
         sum(CASE WHEN s THEN 1 ELSE 0 END) AS n_spans
  FROM pieces
  GROUP BY doc_id
)
SELECT mode,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       CAST(sum(n_masked) * 1000000 {div} sum(n_tokens) AS BIGINT)
           AS mask_ppm,
       CAST(sum(n_spans) * 1000 {div} count(*) AS BIGINT)
           AS spans_per_doc_ppt
FROM per_doc GROUP BY mode
"""

UL2_DOC_SPARK = _ul2_sql("spark", _UL2_DOC_TAIL_SPARK)
UL2_DOC_DUCK = _ul2_sql("duck", _UL2_DOC_TAIL_DUCK)
UL2_CARD_SPARK = _ul2_sql("spark", _UL2_CARD_TAIL)
UL2_CARD_DUCK = _ul2_sql("duck", _UL2_CARD_TAIL)


def _q_ul2(sql: str):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        catalog.load_table(spark, sf_dir, "documents").createOrReplaceTempView(
            "documents"
        )
        return spark.sql(sql)

    return q


QUERIES = {
    "docs_span_corruption": _q_span_corruption,
    "docs_fim_transform": _q_fim_transform,
    "docs_ul2_denoiser_mix": _q_ul2(UL2_DOC_SPARK),
    "docs_ul2_mix_card": _q_ul2(UL2_CARD_SPARK),
}
ORACLES = {
    "docs_span_corruption": SPAN_CORRUPTION_DUCK,
    "docs_fim_transform": FIM_DUCK,
    "docs_ul2_denoiser_mix": UL2_DOC_DUCK,
    "docs_ul2_mix_card": UL2_CARD_DUCK,
}
