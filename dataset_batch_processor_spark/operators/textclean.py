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
