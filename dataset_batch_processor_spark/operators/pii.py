"""PII census and redaction audit over the document corpus (round 15).

Every production training-data pipeline runs a PII pass before
release (the C4/Dolma/RefinedWeb preprocessing stance, public).
textclean.docs_clean_pii is this repo's TRANSFORM (one combined
masking chain inside a larger scrub); this module is the AUDIT
surface around such a transform: a per-source per-TYPE census
(emails / phones / IPs — the numbers a data card publishes), typed
placeholder redaction, and the re-scan fixed-point proof — after one
redaction pass a second scan must find ZERO matches, the property
that makes a release gate mechanical rather than trust-based.

Planted fixtures (the canary.py precedent): the synthetic corpus
contains no organic PII, so deterministic PII is planted IN-QUERY
from doc_id arithmetic — identical literal text on both engines —
giving the gate non-trivial positives while leaving /root/testdata
untouched. Plant slices overlap (a doc can carry an email AND a
phone), so the rollup exercises multi-type documents too.

Pattern parity: the regexes use only class/quantifier syntax shared
by Java regex (Spark) and RE2 (DuckDB) — no backrefs, no lookaround.
Counting is ``size(regexp_extract_all(...))`` on Spark and
``len(regexp_extract_all(...))`` on DuckDB; replacement is
``regexp_replace`` (Spark replaces all matches by default; DuckDB
needs the explicit ``'g'`` flag — a classic silent-mismatch trap,
pinned by the re-scan-zero gate column).

Scale: both queries are one narrow projection + one bounded rollup —
per-row regex work in whole-stage codegen, no joins, no shuffles
beyond the |sources|-sized aggregate. At 100 TB the scan cost is the
regex engine itself; everything here parallelizes embarrassingly.
"""

from __future__ import annotations

from .sqlrun import _run

# plant slices (deliberately overlapping moduli)
EMAIL_MOD, EMAIL_REM = 11, 3
PHONE_MOD, PHONE_REM = 13, 5
IP_MOD, IP_REM = 17, 2

# bracket classes instead of backslash escapes ([.] not \.) — Spark
# SQL string literals consume backslashes, DuckDB's don't; bracket
# syntax is identical in Java regex and RE2 and needs no escaping
EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9.-]+[.][a-z][a-z]+"
PHONE_RE = "[+]1-[0-9]{3}-[0-9]{3}-[0-9]{4}"
IP_RE = "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}"


def _planted_core(dialect: str) -> str:
    """CTE ``planted(doc_id, source, text)``: the corpus with
    deterministic doc_id-derived PII appended to fixed slices."""
    div = "DIV" if dialect == "spark" else "//"
    s = "STRING" if dialect == "spark" else "VARCHAR"
    email = (
        f"CASE WHEN doc_id % {EMAIL_MOD} = {EMAIL_REM} THEN"
        f" concat(' contact user', CAST(doc_id AS {s}), '@example',"
        f" CAST(doc_id % 7 AS {s}), '.org') ELSE '' END"
    )
    phone = (
        f"CASE WHEN doc_id % {PHONE_MOD} = {PHONE_REM} THEN"
        f" concat(' call +1-555-', lpad(CAST(doc_id % 1000 AS {s}),"
        f" 3, '0'), '-', lpad(CAST(doc_id % 10000 AS {s}), 4, '0'))"
        f" ELSE '' END"
    )
    ip = (
        f"CASE WHEN doc_id % {IP_MOD} = {IP_REM} THEN"
        f" concat(' host 10.', CAST(doc_id % 256 AS {s}), '.',"
        f" CAST((doc_id {div} 256) % 256 AS {s}), '.',"
        f" CAST(doc_id % 100 AS {s})) ELSE '' END"
    )
    return f"""planted AS (
  SELECT doc_id, source,
         concat(text, {email}, {phone}, {ip}) AS text
  FROM documents
)"""


def _counts_cols(dialect: str, col: str = "text") -> dict[str, str]:
    # Spark's regexp_extract_all defaults to GROUP 1 (and errors on a
    # group-free pattern); both engines accept an explicit group 0
    n, g = ("size", ", 0") if dialect == "spark" else ("len", ", 0")
    return {
        "email": f"{n}(regexp_extract_all({col}, '{EMAIL_RE}'{g}))",
        "phone": f"{n}(regexp_extract_all({col}, '{PHONE_RE}'{g}))",
        "ip": f"{n}(regexp_extract_all({col}, '{IP_RE}'{g}))",
    }


def _scan_sql(dialect: str) -> str:
    """Per-source PII census: docs carrying each type, total matches,
    and the data-card ppm rate."""
    div = "DIV" if dialect == "spark" else "//"
    c = _counts_cols(dialect)
    return f"""
WITH {_planted_core(dialect)},
per_doc AS (
  SELECT doc_id, source,
         CAST({c['email']} AS INT) AS n_email,
         CAST({c['phone']} AS INT) AS n_phone,
         CAST({c['ip']} AS INT) AS n_ip
  FROM planted
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN n_email > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS docs_with_email,
       CAST(sum(CASE WHEN n_phone > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS docs_with_phone,
       CAST(sum(CASE WHEN n_ip > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS docs_with_ip,
       CAST(sum(n_email + n_phone + n_ip) AS BIGINT) AS n_matches,
       CAST(sum(CASE WHEN n_email + n_phone + n_ip > 0 THEN 1 ELSE 0 END)
            * 1000000 {div} count(*) AS BIGINT) AS pii_doc_ppm
FROM per_doc
GROUP BY source
ORDER BY source
"""


def _redact_sql(dialect: str) -> str:
    """Redaction audit: per doc, the redaction count, the md5 of the
    redacted text (pins the exact replacement bytes), and the
    re-scan count over the REDACTED text — the gate proves it is 0
    everywhere, i.e. redaction reaches a fixed point in one pass.
    Order matters: emails first (an email contains no phone/ip match
    here, but the fixed order makes the composition deterministic)."""
    g = "" if dialect == "spark" else ", 'g'"
    c = _counts_cols(dialect, col="red")
    return f"""
WITH {_planted_core(dialect)},
redacted AS (
  SELECT doc_id, source,
         regexp_replace(regexp_replace(regexp_replace(text,
             '{EMAIL_RE}', '<EMAIL>'{g}),
             '{PHONE_RE}', '<PHONE>'{g}),
             '{IP_RE}', '<IP>'{g}) AS red,
         text
  FROM planted
)
SELECT doc_id,
       CAST(length(text) - length(red) AS INT) AS chars_removed,
       CAST({c['email']} + {c['phone']} + {c['ip']} AS INT)
           AS rescan_matches,
       md5(red) AS redacted_md5
FROM redacted
ORDER BY doc_id
"""


# --------------------------------------- structured-data privacy card
# The TABULAR sibling of the document census: k-anonymity (Sweeney
# 2002, public) and l-diversity (Machanavalkjhala et al. 2007) over
# the customer table. Quasi-identifiers = (nation, market segment,
# in-debt flag) — the columns a released dataset would plausibly
# keep; sensitive attribute = the exact account balance. The card a
# release gate reads: how many rows sit in equivalence classes
# smaller than k (linkable), how many are singletons (unique —
# directly re-identifiable), and the worst-class sensitive-value
# diversity (l). One groupBy over the QI tuple + one card-sized
# rollup — map-side combinable, |classes|-sized intermediate, no
# joins; trivially parallel at any scale.

K_ANON = 5


def _k_anon_sql(dialect: str) -> str:
    div = "DIV" if dialect == "spark" else "//"
    return f"""
WITH classes AS (
  SELECT c_nationkey,
         c_mktsegment,
         CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END AS in_debt,
         CAST(count(*) AS BIGINT) AS class_size,
         CAST(count(DISTINCT c_acctbal) AS BIGINT) AS l_div
  FROM customer
  GROUP BY 1, 2, 3
)
SELECT CAST(sum(class_size) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_classes,
       CAST(min(class_size) AS BIGINT) AS min_class_size,
       CAST(sum(CASE WHEN class_size < {K_ANON} THEN class_size ELSE 0 END)
            AS BIGINT) AS k{K_ANON}_violating_rows,
       CAST(sum(CASE WHEN class_size = 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS singleton_rows,
       CAST(sum(CASE WHEN class_size = 1 THEN 1 ELSE 0 END) * 1000000
            {div} sum(class_size) AS BIGINT) AS reident_risk_ppm,
       CAST(min(l_div) AS BIGINT) AS min_l_diversity,
       CAST(sum(CASE WHEN l_div < 2 THEN class_size ELSE 0 END)
            AS BIGINT) AS l2_violating_rows
FROM classes
"""


QUERIES = {
    "docs_pii_scan": _run(_scan_sql("spark"), ("documents",)),
    "docs_pii_redact": _run(_redact_sql("spark"), ("documents",)),
    "customer_k_anonymity": _run(_k_anon_sql("spark"), ("customer",)),
}
ORACLES = {
    "docs_pii_scan": _scan_sql("duck"),
    "docs_pii_redact": _redact_sql("duck"),
    "customer_k_anonymity": _k_anon_sql("duck"),
}
