"""Byte-pair encoding: distributed merge training + exact ranked
application (Sennrich et al. 2016, "Neural Machine Translation of
Rare Words with Subword Units" — the tokenizer-construction step of
every LLM data pipeline; relational2.py's ``docs_bpe_tokens`` is the
regex estimate, this module is the real algorithm).

Representation is the whole trick: a word is encoded as its symbols
each wrapped in ``_`` delimiters — ``low`` -> ``_l__o__w__</w>_`` —
so applying merge rule (a, b) is literally
``replace(s, '_a__b_', '_ab_')``:

- the pattern carries BOTH symbols' own delimiters, so it can never
  match inside a longer symbol ("ab" renders as ``_ab_``; its tail
  never borrows a delimiter);
- plain ``replace`` is non-overlapping and left-to-right in Spark
  and DuckDB alike, which IS the leftmost-first order BPE specifies,
  and a replacement cannot re-enable the same rule to its left
  (the output is a new symbol);
- consecutive runs work because each symbol owns its delimiters
  (``_b__b__b__b_`` -> ``_bb__bb_`` in one pass).

That makes ranked-merge application a fold of scalar ``replace``
calls — whole-stage-codegen JVM expressions on the Spark side, and
the DuckDB oracle replays the identical chain, so the driver's hash
gate covers real subword tokenization end to end
(``docs_bpe_subword_tokens``).

Training (``bpe_train``) is the classic frequency loop run
DISTRIBUTED: the word-frequency table stays a DataFrame, each
iteration counts adjacent symbol pairs weighted by word frequency
(explode of zipped array slices — one shuffle per iteration,
shuffle size bounded by the distinct-symbol-pair vocabulary, not the
corpus) and collects exactly ONE row (the argmax pair, ties broken
lexicographically for determinism). n_merges iterations = n_merges
bounded jobs; at 100 TB you train on a word-frequency table sampled
or aggregated once (word counts are the only corpus-sized pass) —
the iteration cost is independent of corpus size from there on,
which is why this shape survives scale. Training is iterative
driver-side argmax and therefore not SQL-expressible; it is pinned
by golden tests against an independent single-process reference
implementation instead of an oracle row (same policy as trained
k-means IVF, similarity.py).

FIXED_MERGES below is the output of ``bpe_train`` on the sf0.001
documents fixture (16 merges, lowercase [a-z]+ words, ``</w>``
end-of-word marker) — pinned as data so the APPLICATION query stays
deterministic and oracle-checkable while training evolves freely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog

#: bpe_train(documents @ sf0.001, n_merges=16) — see module docstring
FIXED_MERGES: tuple[tuple[str, str], ...] = (
    ("e", "r"),
    ("e", "</w>"),
    ("n", "</w>"),
    ("o", "r"),
    ("t", "</w>"),
    ("er", "</w>"),
    ("o", "w"),
    ("ow", "</w>"),
    ("l", "u"),
    ("i", "n"),
    ("y", "</w>"),
    ("a", "r"),
    ("p", "ar"),
    ("g", "</w>"),
    ("a", "s"),
    ("h", "</w>"),
)

WORD_RE = "[a-z]+"


def _fold_merges(expr: str, merges) -> str:
    """Wrap ``expr`` (a delimiter-encoded word string) in the ranked
    replace chain. Identical text works in both dialects."""
    for a, b in merges:
        expr = f"replace({expr}, '_{a}__{b}_', '_{a}{b}_')"
    return expr


def _spark_sql(merges) -> str:
    enc = "'_' || concat_ws('__', regexp_extract_all(w, '.', 0)) || '__</w>_'"
    applied = _fold_merges(enc, merges)
    n_tok = f"CAST((length({applied}) - length(replace({applied}, '__', ''))) / 2 + 1 AS BIGINT)"
    return f"""
SELECT doc_id,
       CAST(size(words) AS BIGINT) AS n_words,
       CAST(aggregate(words, 0L, (acc, w) -> acc + length(w) + 1) AS BIGINT)
           AS n_char_symbols,
       CAST(aggregate(transform(words, w -> {n_tok}), 0L, (acc, x) -> acc + x)
           AS BIGINT) AS n_subword_tokens
FROM (
  SELECT doc_id, regexp_extract_all(lower(text), '{WORD_RE}', 0) AS words
  FROM documents
)
"""


def _duck_sql(merges) -> str:
    enc = "'_' || array_to_string(string_split(w, ''), '__') || '__</w>_'"
    applied = _fold_merges(enc, merges)
    n_tok = f"(length({applied}) - length(replace({applied}, '__', ''))) / 2 + 1"
    return f"""
SELECT doc_id,
       CAST(len(words) AS BIGINT) AS n_words,
       CAST(coalesce(list_sum(list_transform(words, w -> length(w) + 1)), 0)
            AS BIGINT) AS n_char_symbols,
       CAST(coalesce(list_sum(list_transform(words, w -> {n_tok})), 0)
            AS BIGINT) AS n_subword_tokens
FROM (
  SELECT doc_id, regexp_extract_all(lower(text), '{WORD_RE}') AS words
  FROM documents
)
"""


def _q_subword_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    catalog.load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_spark_sql(FIXED_MERGES))


# ------------------------------------------------------- training


def bpe_train(docs: DataFrame, n_merges: int = 16, text_col: str = "text"):
    """Learn ``n_merges`` ranked merge rules from a document corpus.

    Returns [(a, b, pair_count), ...] in merge order. One corpus-wide
    pass builds the word-frequency table; every iteration after that
    works on the (distinct words x symbols) table only.
    """
    words = (
        docs.select(
            F.explode(
                F.expr(f"regexp_extract_all(lower({text_col}), '{WORD_RE}', 0)")
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
        .withColumn(
            "enc",
            F.expr("'_' || concat_ws('__', regexp_extract_all(w, '.', 0)) || '__</w>_'"),
        )
        .select("enc", "freq")
    )
    # iterations run over this small table many times: materialize the
    # base once (it is tiny — the distinct-word vocabulary)
    words = words.cache()
    merges: list[tuple[str, str, int]] = []
    try:
        for _ in range(n_merges):
            cur = words
            for a, b in ((m[0], m[1]) for m in merges):
                cur = cur.withColumn(
                    "enc", F.expr(f"replace(enc, '_{a}__{b}_', '_{a}{b}_')")
                )
            syms = cur.withColumn(
                "syms", F.expr("split(trim(BOTH '_' FROM enc), '__')")
            )
            pairs = syms.select(
                F.explode(
                    F.arrays_zip(
                        F.expr("slice(syms, 1, size(syms) - 1)"),
                        F.expr("slice(syms, 2, size(syms) - 1)"),
                    )
                ).alias("p"),
                "freq",
            ).select(
                F.col("p")["0"].alias("a"), F.col("p")["1"].alias("b"), "freq"
            )
            top = (
                pairs.groupBy("a", "b")
                .agg(F.sum("freq").alias("cnt"))
                .orderBy(F.desc("cnt"), "a", "b")
                .limit(1)
                .collect()
            )
            if not top:
                break
            r = top[0]
            merges.append((r["a"], r["b"], int(r["cnt"])))
    finally:
        words.unpersist()
    return merges


def bpe_apply_tokens(word: str, merges) -> list[str]:
    """Single-process reference application (tests + small tools):
    same delimiter-string semantics as the SQL fold."""
    enc = "_" + "__".join(list(word) + ["</w>"]) + "_"
    for a, b in ((m[0], m[1]) for m in merges):
        enc = enc.replace(f"_{a}__{b}_", f"_{a}{b}_")
    return enc.strip("_").split("__")


QUERIES = {"docs_bpe_subword_tokens": _q_subword_tokens}
ORACLES = {"docs_bpe_subword_tokens": _duck_sql(FIXED_MERGES)}
