"""Text cleaning / normalization for training-data pipelines.

Extension surface (the reference has no cleaning beyond line dedup):
the standard pre-training scrub passes — strip markup, unescape HTML
entities, mask PII-shaped spans (emails, URLs, long digit runs),
normalize whitespace — each as a composable Column function built
ONLY from JVM-side regexp/translate primitives (no Python UDFs: these
run over every byte of a 100 TB corpus, so they must stay inside
whole-stage codegen).

Regex dialect: patterns restricted to the RE2-compatible subset (no
lookarounds, no backrefs) so the DuckDB oracle evaluates the very
same pattern; Spark's regexp_replace is global by default and
DuckDB's takes the 'g' flag (applied in the oracle SQL).

The oracled query wraps each fixture document in deterministic
markup + synthetic PII (both engines construct the identical input in
SQL), so every transformation actually fires on every row.
"""

from __future__ import annotations

import pandas as pd  # noqa: F401 — module-level so pandas_udf
# type-hint strings ("pd.Series") resolve (vector.py convention)

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog

HTML_TAG_RE = "<[^>]*>"
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+"
URL_RE = "https?://[^ \\t\\n]+"
DIGITS_RE = "[0-9][0-9][0-9][0-9][0-9]+"  # 5+ digit runs
WS_RE = "[ \\t\\n\\r]+"

_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
             ("&#39;", "'"), ("&amp;", "&")]  # &amp; LAST (double-escapes)


def strip_html(c: Column) -> Column:
    """Drop tags (replaced by a space so words don't fuse)."""
    return F.regexp_replace(c, HTML_TAG_RE, " ")


def unescape_entities(c: Column) -> Column:
    for ent, ch in _ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return c


def scrub_pii(c: Column) -> Column:
    """Mask email addresses, URLs, and 5+-digit runs."""
    c = F.regexp_replace(c, EMAIL_RE, "<EMAIL>")
    c = F.regexp_replace(c, URL_RE, "<URL>")
    return F.regexp_replace(c, DIGITS_RE, "<NUM>")


def normalize_whitespace(c: Column) -> Column:
    return F.trim(F.regexp_replace(c, WS_RE, " "))


def clean_text(c: Column) -> Column:
    """The full scrub chain in canonical order: markup out first (so
    entity text inside attributes dies with the tag), then entities,
    then PII masks, then whitespace."""
    return normalize_whitespace(scrub_pii(unescape_entities(strip_html(c))))


# -------------------------------------------------------------- queries

# deterministic synthetic wrapper: markup + one email + one URL + a
# long number, all derived from doc_id so both engines build the same
# bytes. || concatenation is dialect-shared.
_WRAP = (
    "'<p class=\"x\">' || text || '</p> &amp; contact: user' || doc_id"
    " || '@example.com or https://ex.org/d/' || doc_id"
    " || ' ref 1234567' || doc_id"
)


def _q_clean_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = catalog.load_table(spark, sf_dir, "documents")
    wrapped = F.expr(_WRAP).alias("raw")
    base = docs.select("doc_id", "text", wrapped)
    cleaned = clean_text(F.col("raw"))
    return base.select(
        "doc_id",
        F.md5(cleaned).alias("clean_md5"),
        F.length("raw").alias("len_raw"),
        F.length(cleaned).alias("len_clean"),
        F.size(F.regexp_extract_all("raw", F.lit(EMAIL_RE), F.lit(0))).alias(
            "n_emails"
        ),
        F.size(F.regexp_extract_all("raw", F.lit(URL_RE), F.lit(0))).alias(
            "n_urls"
        ),
    )


CLEAN_PII_DUCK = f"""
WITH raws AS (
  SELECT doc_id, {_WRAP} AS raw FROM documents
),
cleaned AS (
  SELECT doc_id, raw,
         trim(regexp_replace(
           regexp_replace(
             regexp_replace(
               regexp_replace(
                 replace(replace(replace(replace(replace(
                   regexp_replace(raw, '{HTML_TAG_RE}', ' ', 'g'),
                   '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
                   '&#39;', chr(39)), '&amp;', '&'),
                 '{EMAIL_RE}', '<EMAIL>', 'g'),
               '{URL_RE}', '<URL>', 'g'),
             '{DIGITS_RE}', '<NUM>', 'g'),
           '{WS_RE}', ' ', 'g')) AS clean
  FROM raws
)
SELECT doc_id,
       md5(clean) AS clean_md5,
       CAST(length(raw) AS INT) AS len_raw,
       CAST(length(clean) AS INT) AS len_clean,
       CAST(len(regexp_extract_all(raw, '{EMAIL_RE}')) AS INT) AS n_emails,
       CAST(len(regexp_extract_all(raw, '{URL_RE}')) AS INT) AS n_urls
FROM cleaned
"""

QUERIES = {"docs_clean_pii": _q_clean_pii}
ORACLES = {"docs_clean_pii": CLEAN_PII_DUCK}


# ------------------------------------- within-document paragraph dedup

# C4-style within-page repetition removal (Raffel et al. 2020 drop
# repeated lines inside a page; RefinedWeb keeps the same pass):
# split on the paragraph separator, keep only FIRST occurrences in
# page order, rejoin. Order-preserving dedup as a pure array
# expression — no shuffle, no Python: the indexed-lambda filter keeps
# element i iff its first occurrence IS position i. Quadratic in the
# paragraph count of one document (bounded small), constant per row
# at corpus scale.


def dedup_paragraphs(c: Column, sep: str = "\n") -> Column:
    """First-occurrence-preserving paragraph dedup of one text column."""
    paras = F.split(c, sep)
    kept = F.filter(
        paras,
        lambda x, i: F.array_position(paras, x) == i + 1,  # i is 0-based
    )
    return F.array_join(kept, sep)


# Fixture input with a GUARANTEED repeat: first-half ¶ second-half ¶
# first-half again — the pass must drop exactly the third paragraph.
_PARA_WRAP = (
    "substr(text, 1, CAST(floor(length(text) / 2) AS INT))"
    " || chr(10) || substr(text, CAST(floor(length(text) / 2) AS INT) + 1)"
    " || chr(10) || substr(text, 1, CAST(floor(length(text) / 2) AS INT))"
)


def _q_intradoc_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = catalog.load_table(spark, sf_dir, "documents")
    base = docs.select("doc_id", F.expr(_PARA_WRAP).alias("raw"))
    deduped = dedup_paragraphs(F.col("raw"))
    return base.select(
        "doc_id",
        F.size(F.split("raw", "\n")).cast("int").alias("n_paras"),
        F.size(F.split(deduped, "\n")).cast("int").alias("n_kept"),
        (F.length("raw") - F.length(deduped)).cast("long").alias(
            "removed_chars"
        ),
        F.md5(deduped).alias("clean_md5"),
    )


INTRADOC_DEDUP_DUCK = f"""
WITH raws AS (
  SELECT doc_id, {_PARA_WRAP} AS raw FROM documents
),
arrs AS (
  SELECT doc_id, raw, string_split(raw, chr(10)) AS paras FROM raws
),
kept AS (
  SELECT doc_id, raw, paras,
         list_filter(paras,
           (x, i) -> list_position(paras, x) = i) AS keep
  FROM arrs
)
SELECT doc_id,
       CAST(len(paras) AS INT) AS n_paras,
       CAST(len(keep) AS INT) AS n_kept,
       CAST(length(raw) - length(array_to_string(keep, chr(10)))
            AS BIGINT) AS removed_chars,
       md5(array_to_string(keep, chr(10))) AS clean_md5
FROM kept
"""

QUERIES["docs_intradoc_dedup"] = _q_intradoc_dedup
ORACLES["docs_intradoc_dedup"] = INTRADOC_DEDUP_DUCK


# --------------------------------- cross-document repeated-line removal

# CCNet-style corpus-global line dedup (Wenzek et al. 2020 drop lines
# duplicated across the crawl — the boilerplate-removal pass that
# precedes their LM filtering; distinct from the WITHIN-document C4
# pass above): every occurrence of any line whose corpus-wide count
# reaches CROSSDOC_T is removed from every document.
#
# Shape at 100 TB: one explode, one count shuffle keyed by a FIXED
# 16-hex digest of the line (narrow shuffle rows — the full line
# text never rides the count shuffle; md5 here for DuckDB parity,
# xxhash64 in the production path per the CMS convention), one
# anti-join of the lines against the over-threshold digest list
# (AQE picks broadcast when the droplist is small, shuffle otherwise
# — both correct), one per-doc regroup. Nothing is ever quadratic.
#
# Fixture wrapper (both engines build identical bytes): a corpus-wide
# boilerplate line (count 500 — dropped), the doc's words in 4-word
# body chunks (mostly unique — kept, with a handful of natural
# ~31-word-vocabulary collisions staying under threshold), and a
# per-source footer line (count 25 — dropped), so every drop
# frequency band actually fires.

CROSSDOC_T = 5
CROSSDOC_CHUNK = 4
_BOILER = "boilerplate accept cookies terms"

_CROSS_RAW_SPARK = f"""
'{_BOILER}' || chr(10) ||
array_join(
  transform(
    sequence(0, (size(split(text, ' ')) + {CROSSDOC_CHUNK - 1})
                 DIV {CROSSDOC_CHUNK} - 1),
    i -> array_join(
      slice(split(text, ' '), i * {CROSSDOC_CHUNK} + 1, {CROSSDOC_CHUNK}),
      ' ')),
  chr(10))
|| chr(10) || 'footer ' || source
"""

_CROSS_RAW_DUCK = f"""
'{_BOILER}' || chr(10) ||
array_to_string(
  list_transform(
    range(0, (len(string_split(text, ' ')) + {CROSSDOC_CHUNK - 1})
              // {CROSSDOC_CHUNK}),
    i -> array_to_string(
      list_slice(string_split(text, ' '),
                 i * {CROSSDOC_CHUNK} + 1,
                 i * {CROSSDOC_CHUNK} + {CROSSDOC_CHUNK}),
      ' ')),
  chr(10))
|| chr(10) || 'footer ' || source
"""


def _q_crossdoc_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = catalog.load_table(spark, sf_dir, "documents")
    raws = docs.select("doc_id", F.expr(_CROSS_RAW_SPARK).alias("raw"))
    paras = raws.select(
        "doc_id",
        F.posexplode(F.split("raw", "\n")).alias("pos", "para"),
    ).withColumn("pkey", F.substring(F.md5("para"), 1, 16))
    droplist = (
        paras.groupBy("pkey")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= CROSSDOC_T)
        .select("pkey")
    )
    kept = paras.join(droplist, "pkey", "left_anti")
    per_doc = kept.groupBy("doc_id").agg(
        F.count("*").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "para"))),
                lambda s: s["para"],
            ),
            "\n",
        ).alias("kept_text"),
    )
    return raws.join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.size(F.split("raw", "\n")).cast("int").alias("n_paras"),
        F.coalesce("n_kept", F.lit(0)).cast("int").alias("n_kept"),
        (
            F.length("raw") - F.length(F.coalesce("kept_text", F.lit("")))
        ).cast("long").alias("removed_chars"),
        F.md5(F.coalesce("kept_text", F.lit(""))).alias("clean_md5"),
    )


CROSSDOC_DEDUP_DUCK = f"""
WITH raws AS MATERIALIZED (
  SELECT doc_id, {_CROSS_RAW_DUCK} AS raw FROM documents
),
paras AS MATERIALIZED (
  SELECT r.doc_id, u.pos, string_split(r.raw, chr(10))[u.pos] AS para,
         substr(md5(string_split(r.raw, chr(10))[u.pos]), 1, 16) AS pkey
  FROM raws r,
       LATERAL (SELECT unnest(generate_series(
                  1, len(string_split(r.raw, chr(10))))) AS pos) u
),
droplist AS MATERIALIZED (
  SELECT pkey FROM paras GROUP BY pkey HAVING count(*) >= {CROSSDOC_T}
),
kept AS MATERIALIZED (
  SELECT p.doc_id, p.pos, p.para
  FROM paras p LEFT JOIN droplist d ON p.pkey = d.pkey
  WHERE d.pkey IS NULL
),
per_doc AS MATERIALIZED (
  SELECT doc_id, count(*) AS n_kept,
         array_to_string(list(para ORDER BY pos), chr(10)) AS kept_text
  FROM kept GROUP BY doc_id
)
SELECT r.doc_id,
       CAST(len(string_split(r.raw, chr(10))) AS INT) AS n_paras,
       CAST(coalesce(k.n_kept, 0) AS INT) AS n_kept,
       CAST(length(r.raw) - length(coalesce(k.kept_text, ''))
            AS BIGINT) AS removed_chars,
       md5(coalesce(k.kept_text, '')) AS clean_md5
FROM raws r LEFT JOIN per_doc k ON r.doc_id = k.doc_id
"""

QUERIES["docs_crossdoc_line_dedup"] = _q_crossdoc_line_dedup
ORACLES["docs_crossdoc_line_dedup"] = CROSSDOC_DEDUP_DUCK


# ------------------------------------------ Unicode NFC + accent strip

# Every multilingual pipeline normalizes Unicode before tokenizing
# (byte-level dedup and hashing see 'e'+U+0301 and U+00E9 as
# different documents otherwise). Spark has no built-in normalizer,
# so the kernel is the honest path: an Arrow-batched pandas UDF over
# Python's unicodedata — a zero-shuffle CPU-parallel map (the
# sanctioned non-JVM-expressible shape; a JVM ICU UDF would be the
# drop-in production upgrade). Accent stripping is NFD + drop
# combining marks. The DuckDB oracle runs utf8proc's nfc_normalize /
# strip_accents over the same bytes — two INDEPENDENT Unicode
# implementations agreeing on the md5 of every output string is the
# gate. The planted suffix covers composition (e+U+0301 -> U+00E9),
# singleton replacement (U+212B Angstrom -> U+00C5), a ligature and
# U+00DF (NFC-invariant — this is NFC, not NFKC), and a decomposed
# umlaut.

PLANTED_UNICODE = (
    " e\u0301 \u212b \ufb01 u\u0308 stra\u00dfe"
)


def _q_unicode_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def nfc(s: pd.Series) -> pd.Series:
        import unicodedata

        return s.map(lambda t: unicodedata.normalize("NFC", t))

    @pandas_udf("string")
    def strip_marks(s: pd.Series) -> pd.Series:
        import unicodedata

        return s.map(
            lambda t: "".join(
                c
                for c in unicodedata.normalize("NFD", t)
                if not unicodedata.combining(c)
            )
        )

    docs = catalog.load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id", F.concat("text", F.lit(PLANTED_UNICODE)).alias("raw")
    )
    n = nfc(F.col("raw"))
    return base.select(
        "doc_id",
        F.length("raw").cast("int").alias("len_raw"),
        F.length(n).cast("int").alias("len_nfc"),
        F.md5(n).alias("nfc_md5"),
        F.md5(strip_marks(F.col("raw"))).alias("stripped_md5"),
        (n != F.col("raw")).alias("changed"),
    )


UNICODE_NORMALIZE_DUCK = f"""
SELECT doc_id,
       CAST(length(raw) AS INT) AS len_raw,
       CAST(length(nfc_normalize(raw)) AS INT) AS len_nfc,
       md5(nfc_normalize(raw)) AS nfc_md5,
       md5(strip_accents(raw)) AS stripped_md5,
       nfc_normalize(raw) != raw AS changed
FROM (
  SELECT doc_id, text || '{PLANTED_UNICODE}' AS raw FROM documents
)
"""

QUERIES["docs_unicode_normalize"] = _q_unicode_normalize
ORACLES["docs_unicode_normalize"] = UNICODE_NORMALIZE_DUCK


# --------------------------------------- homoglyph skeleton (round 9)
# Confusable-character audit (UTS #39 skeleton, curated subset): web
# text uses Cyrillic/Greek lookalikes to evade blocklists and spoof
# brands ("pаypаl" with U+0430); a cleaning pipeline maps confusables
# to their ASCII skeleton and flags the documents that changed. The
# mapping is a LITERAL from/to table embedded in one dual-dialect SQL
# text — translate() is 1:1 in both engines, and translate(raw, FROM,
# '') DELETES matched chars in both, so the changed-char count is an
# exact length difference. The fixture corpus is ASCII, so
# deterministic confusable tokens are planted by doc_id formula (the
# _UNI_PLANTED convention) to give the gate real signal. One codegen
# scan + a sources-sized groupBy — trivially scale-safe.

_CONF_FROM = "аеорсхіѕοα"   # Cyrillic a e o r s kh i dze; Greek omicron alpha
_CONF_TO = "aeopcxisoa"

_HOMOGLYPH_CORE = f"""
WITH d AS (
  SELECT source,
         text || CASE WHEN doc_id % 7 = 2 THEN ' pаypаl'
                      WHEN doc_id % 7 = 5 THEN ' gооgle сom'
                      ELSE '' END AS raw
  FROM documents
),
sk AS (
  SELECT source, raw,
         translate(raw, '{_CONF_FROM}', '{_CONF_TO}') AS skel,
         length(raw) - length(translate(raw, '{_CONF_FROM}', '')) AS n_conf
  FROM d
)
SELECT source,
       count(*) AS n_docs,
       CAST(sum(CASE WHEN skel <> raw THEN 1 ELSE 0 END) AS BIGINT)
           AS n_flagged_docs,
       CAST(sum(n_conf) AS BIGINT) AS n_confusable_chars
FROM sk
GROUP BY source
ORDER BY source
"""

from .sqlrun import _run as _run_sql  # noqa: E402

QUERIES["docs_homoglyph_skeleton"] = _run_sql(_HOMOGLYPH_CORE, ("documents",))
ORACLES["docs_homoglyph_skeleton"] = _HOMOGLYPH_CORE


# ------------------------------- evasion-resistant dedup (round 9)
# Adversarial near-dup evasion: a scraper republishes a page with
# Cyrillic lookalikes and doctored whitespace, and raw exact-hash
# dedup misses it. Normalize-then-hash closes the hole: skeleton
# (the homoglyph table above) -> lower -> collapse runs of
# whitespace -> trim, then group on md5 of the normalized form.
# Fixture docs are clean, so evasive twins are PLANTED (doc_id % 11
# = 3 gets a twin at doc_id + 10^9 with 'o'->U+043E and trailing
# spaces — raw text differs, normalized text is identical), and the
# gate proves: raw hashing catches none of the twins, normalized
# hashing catches every one. Counts per source, exact integers. The
# only dialect split is the whitespace regexp_replace ('g' flag is
# explicit in DuckDB, implicit in Spark).


def _evasion_sql(engine: str) -> str:
    # WS_RE, not \s: Java \s includes U+000B (vertical tab), RE2 \s
    # does not — the shared class keeps h_norm engine-identical on any
    # input (the module's RE2-subset convention)
    ws = (f"regexp_replace(raw, '{WS_RE}', ' ')" if engine == "spark"
          else f"regexp_replace(raw, '{WS_RE}', ' ', 'g')")
    return f"""
WITH corpus AS (
  SELECT doc_id, source, text AS raw FROM documents
  UNION ALL
  SELECT -(doc_id + 1) AS doc_id, source,
         translate(text, 'o', 'о') || '  ' AS raw
  FROM documents WHERE doc_id % 11 = 3  -- negative twin ids: disjoint
                                        -- from real ids at ANY corpus
                                        -- size (a fixed offset would
                                        -- collide past 1e9 docs)
),
hashed AS (
  SELECT doc_id, source,
         md5(raw) AS h_raw,
         md5(trim(lower(translate({ws},
             '{_CONF_FROM}', '{_CONF_TO}')))) AS h_norm
  FROM corpus
),
raw_canon AS (
  SELECT h_raw, min(doc_id) AS keep FROM hashed GROUP BY h_raw
),
norm_canon AS (
  SELECT h_norm, min(doc_id) AS keep FROM hashed GROUP BY h_norm
)
SELECT h.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN h.doc_id <> r.keep THEN 1 ELSE 0 END)
            AS BIGINT) AS raw_dup_victims,
       CAST(sum(CASE WHEN h.doc_id <> n.keep THEN 1 ELSE 0 END)
            AS BIGINT) AS norm_dup_victims,
       CAST(sum(CASE WHEN h.doc_id <> n.keep AND h.doc_id = r.keep
                THEN 1 ELSE 0 END) AS BIGINT) AS evasions_caught
FROM hashed h
JOIN raw_canon r ON r.h_raw = h.h_raw
JOIN norm_canon n ON n.h_norm = h.h_norm
GROUP BY h.source
ORDER BY h.source
"""


QUERIES["docs_evasion_resistant_dedup"] = _run_sql(
    _evasion_sql("spark"), ("documents",)
)
ORACLES["docs_evasion_resistant_dedup"] = _evasion_sql("duck")
