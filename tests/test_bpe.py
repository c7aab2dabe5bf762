"""BPE: distributed training against an independent single-process
reference (golden merges), delimiter-string application semantics
(leftmost-first, consecutive runs, no cross-symbol matches), and
train->apply composition. The application QUERY is proven by the
driver oracle (docs_bpe_subword_tokens); the training QUERY by the
unrolled-CTE replay (docs_bpe_train_merges) — here both the Spark
loop and the DuckDB replay are additionally pinned against an
independent single-process reference trainer."""

from __future__ import annotations

import re
from collections import Counter

import pytest

from dataset_batch_processor_spark.operators import bpe


def _reference_train(word_freqs: dict[str, int], n_merges: int):
    """Independent implementation: dict-of-spaced-strings with
    boundary-safe regex replacement (classic formulation)."""
    vocab = {" ".join(list(w) + ["</w>"]): f for w, f in word_freqs.items()}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for seq, f in vocab.items():
            syms = seq.split(" ")
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        (a, b), cnt = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((a, b, cnt))
        pat = re.compile(r"(?<!\S)" + re.escape(a) + " " + re.escape(b) + r"(?!\S)")
        vocab = {pat.sub(a + b, seq): f for seq, f in vocab.items()}
    return merges


def test_apply_leftmost_and_runs():
    # consecutive identical symbols merge leftmost-first
    assert bpe.bpe_apply_tokens("bbbb", [("b", "b")]) == ["bb", "bb", "</w>"]
    assert bpe.bpe_apply_tokens("bbb", [("b", "b")]) == ["bb", "b", "</w>"]
    # a later rule sees the merged symbols of earlier rules
    assert bpe.bpe_apply_tokens("bbbb", [("b", "b"), ("bb", "bb")]) == [
        "bbbb",
        "</w>",
    ]
    # merged symbols never match inside longer symbols: rule (b, c)
    # must not fire across the "ab" boundary of a previous merge
    assert bpe.bpe_apply_tokens("abc", [("a", "b"), ("b", "c")]) == [
        "ab",
        "c",
        "</w>",
    ]


def test_fixed_merges_match_reference_training():
    """FIXED_MERGES is pinned as the reference trainer's output on the
    sf0.001 fixture — recomputed here from the same corpus."""
    import duckdb

    texts = [
        r[0]
        for r in duckdb.sql(
            "select text from '/root/testdata/sf0.001/documents.parquet'"
        ).fetchall()
    ]
    freqs = Counter()
    for t in texts:
        freqs.update(re.findall(r"[a-z]+", t.lower()))
    ref = _reference_train(freqs, len(bpe.FIXED_MERGES))
    assert tuple((a, b) for a, b, _ in ref) == bpe.FIXED_MERGES


def test_distributed_train_matches_reference(spark):
    docs = spark.createDataFrame(
        [(1, "low lower lowest"), (2, "new newer newest"), (3, "low new")],
        "doc_id long, text string",
    )
    got = bpe.bpe_train(docs, n_merges=8)
    freqs = Counter()
    for _, t in [(1, "low lower lowest"), (2, "new newer newest"), (3, "low new")]:
        freqs.update(re.findall(r"[a-z]+", t.lower()))
    ref = _reference_train(freqs, 8)
    assert got == ref


def test_unrolled_oracle_matches_reference_training():
    """The DuckDB unrolled-CTE training replay must reproduce the
    reference trainer's merges AND counts on an independent corpus
    (not the fixture — so the oracle generalizes, not memorizes)."""
    import duckdb

    texts = ["low low lower lowest", "new newer newest", "wide wider low"]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in enumerate(texts))
        + ") AS t(doc_id, text)"
    )
    n = 6
    got = con.execute(bpe._train_merges_duck(n)).fetchall()
    freqs = Counter()
    for t in texts:
        freqs.update(re.findall(r"[a-z]+", t.lower()))
    ref = _reference_train(freqs, n)
    assert [(a, b, cnt) for _, a, b, _, cnt in got] == ref
    assert [r[0] for r in got] == list(range(1, n + 1))
    assert [m for _, _, _, m, _ in got] == [a + b for a, b, _ in ref]


def test_sql_apply_matches_python_apply(spark):
    """The Spark SQL replace-fold must tokenize exactly like the
    reference single-process application for every fixture word."""
    words = ["lower", "parts", "grow", "hasty", "bbbb", "xyzzy"]
    docs = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "doc_id long, text string"
    )
    docs.createOrReplaceTempView("documents")
    rows = {
        r["doc_id"]: r["n_subword_tokens"]
        for r in spark.sql(bpe._spark_sql(bpe.FIXED_MERGES)).collect()
    }
    for i, w in enumerate(words):
        assert rows[i] == len(bpe.bpe_apply_tokens(w, bpe.FIXED_MERGES))


def test_apply_property_vs_reference_random():
    """Property: for random words and random merge tables, the
    delimiter-string application equals an independent regex-based
    BPE apply (boundary-safe lookaround replacement)."""
    import random

    def ref_apply(word, merges):
        seq = " ".join(list(word) + ["</w>"])
        for a, b in merges:
            pat = re.compile(
                r"(?<!\S)" + re.escape(a) + " " + re.escape(b) + r"(?!\S)"
            )
            seq = pat.sub(a + b, seq)
        return seq.split(" ")

    rng = random.Random(123)
    alphabet = "abcd"
    for _ in range(300):
        word = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 12)))
        # random merge table: grow symbols from the alphabet
        symbols = list(alphabet) + ["</w>"]
        merges = []
        for _ in range(rng.randint(0, 6)):
            a, b = rng.choice(symbols), rng.choice(symbols)
            merges.append((a, b))
            symbols.append(a + b)
        assert bpe.bpe_apply_tokens(word, merges) == ref_apply(word, merges), (
            word,
            merges,
        )


def test_wordpiece_greedy_semantics():
    from dataset_batch_processor_spark.operators.bpe import (
        WORDPIECE_VOCAB,
        wordpiece_word,
    )

    # longest match wins over chains of shorter ones
    assert wordpiece_word("table") == ["table"]          # not tab + ##le
    assert wordpiece_word("valuetable") == ["value", "##ta", "##ble"]
    # continuation entries only match mid-word
    assert wordpiece_word("le") == ["l", "##e"]          # '##le' can't start
    # any failed step voids the WHOLE word
    assert wordpiece_word("zq7") == ["[UNK]"]
    assert wordpiece_word("ab7cd") == ["[UNK]"]
    # char fallback bounds token count at word length
    assert len(wordpiece_word("customer")) == 8
    # vocab is duplicate-free (the oracle's longest-match tie-break
    # relies on body uniqueness per (is_cont, blen) match)
    assert len(set(WORDPIECE_VOCAB)) == len(WORDPIECE_VOCAB)


def test_wordpiece_oracle_matches_kernel_on_synthetic_corpus():
    """The unrolled DuckDB greedy chain must reproduce the Python
    kernel on a corpus it was not tuned for."""
    import duckdb

    from dataset_batch_processor_spark.operators import bpe

    texts = ["value valuetable zq7", "the window stream quer customer"]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in enumerate(texts))
        + ") AS t(doc_id, text)"
    )
    rows = {
        r[0]: r[1:]
        for r in con.execute(bpe._wordpiece_duck()).fetchall()
    }
    import hashlib

    for i, t in enumerate(texts):
        words = [w for w in (t + bpe._WP_PLANTED).split(" ") if w]
        toks = []
        unk = 0
        for w in words:
            wt = bpe.wordpiece_word(w)
            toks.extend(wt)
            unk += wt == ["[UNK]"]
        md5 = hashlib.md5(" ".join(toks).encode()).hexdigest()
        assert rows[i] == (len(words), len(toks), unk, md5), (i, rows[i])


# ---------------------- persisted artifact + frozen apply (round 11)


def test_frozen_apply_matches_in_session_trainer(spark):
    """VERDICT r10 missing #3 'Done' criterion: tokens from the
    persisted merges are byte-identical to applying the in-session
    trainer's output with the reference Python fold."""
    from dataset_batch_processor_spark import catalog

    sf = "/root/testdata/sf0.001"
    docs = catalog.load_table(spark, sf, "documents")
    # v2 artifact (ADVICE r11): the frozen tokenizer trains on the
    # corpus MINUS the arriving batch it is later applied to
    merges = bpe.bpe_train(
        docs.filter(
            f"doc_id % {bpe.NEW_BATCH_MOD} <> {bpe.NEW_BATCH_RESIDUE}"
        ),
        bpe.N_TRAIN_MERGES,
    )
    got = {
        r["w"]: (r["tokenizer_version"], r["tokens"], r["n_tokens"])
        for r in bpe.QUERIES["docs_bpe_frozen_apply"](spark, sf).collect()
    }
    new_words = {
        w
        for (text,) in docs.filter(
            f"doc_id % {bpe.NEW_BATCH_MOD} = {bpe.NEW_BATCH_RESIDUE}"
        ).select("text").collect()
        for w in re.findall("[a-z]+", text.lower())
    }
    assert set(got) == new_words
    for w in new_words:
        toks = bpe.bpe_apply_tokens(w, merges)
        assert got[w] == (bpe.TOKENIZER_VERSION, " ".join(toks), len(toks)), w
    # the learned merges genuinely fire on the new batch — at least
    # one word tokenizes into fewer pieces than chars+1
    assert any(
        n < len(w) + 1 for w, (_, _, n) in got.items() if len(w) > 1
    )


def test_frozen_apply_never_retrains(spark, monkeypatch):
    """After the artifact is materialized, the apply path must not
    touch the trainer (the 'frozen tokenizer over a growing corpus'
    contract): poison bpe_train and re-run."""
    sf = "/root/testdata/sf0.001"
    bpe.bpe_merges_artifact(spark, sf).count()  # ensure materialized

    def boom(*a, **kw):
        raise AssertionError("frozen apply retrained the tokenizer")

    monkeypatch.setattr(bpe, "bpe_train", boom)
    out = bpe.QUERIES["docs_bpe_frozen_apply"](spark, sf)
    assert out.count() > 0


def test_artifact_is_versioned(spark):
    art = bpe.bpe_merges_artifact(spark, "/root/testdata/sf0.001")
    assert set(art.columns) == {
        "tokenizer_version", "merge_rank", "lhs", "rhs", "merged",
        "pair_count",
    }
    rows = art.collect()
    assert len(rows) == bpe.N_TRAIN_MERGES
    assert {r["tokenizer_version"] for r in rows} == {bpe.TOKENIZER_VERSION}


def test_tokenizer_staleness_matches_python(spark):
    """Staleness rows vs an independent Python replay at distinct-word
    grain with the in-session-trained merges."""
    import re as _re

    from dataset_batch_processor_spark import catalog

    sf = "/root/testdata/sf0.001"
    docs = catalog.load_table(spark, sf, "documents")
    merges = bpe.bpe_train(
        docs.filter(
            f"doc_id % {bpe.NEW_BATCH_MOD} <> {bpe.NEW_BATCH_RESIDUE}"
        ),
        bpe.N_TRAIN_MERGES,
    )
    by_batch = {"train": set(), "newbatch": set()}
    for doc_id, text in docs.select("doc_id", "text").collect():
        b = (
            "newbatch"
            if doc_id % bpe.NEW_BATCH_MOD == bpe.NEW_BATCH_RESIDUE
            else "train"
        )
        by_batch[b].update(_re.findall("[a-z]+", text.lower()))
    got = {
        r["batch"]: r
        for r in bpe.QUERIES["docs_tokenizer_staleness"](
            spark, sf
        ).collect()
    }
    for b, words in by_batch.items():
        toks = {w: bpe.bpe_apply_tokens(w, merges) for w in words}
        n_unmerged = sum(
            1 for w, t in toks.items() if len(t) == len(w) + 1
        )
        total_tokens = sum(len(t) for t in toks.values())
        total_chars = sum(len(w) for w in words)
        r = got[b]
        assert r["n_words"] == len(words), b
        assert r["n_unmerged_words"] == n_unmerged, b
        assert r["unmerged_ppm"] == n_unmerged * 1_000_000 // len(words)
        assert r["total_tokens"] == total_tokens, b
        assert r["total_chars"] == total_chars, b
        assert r["tokens_per_char_ppm"] == (
            total_tokens * 1_000_000 // total_chars
        ), b
