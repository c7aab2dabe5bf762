"""Winnowing fingerprints: Python replay of the selection chain and
the Schleimer et al. guarantee (a shared run of >= W+K-1 tokens
yields >= 1 shared selected fingerprint)."""

from __future__ import annotations

import hashlib
import sys

sys.path.insert(0, "/root/repo")

from dataset_batch_processor_spark import catalog
from dataset_batch_processor_spark.operators import winnow


def _py_fps(text: str) -> set[int]:
    k, w = winnow.WINNOW_K, winnow.WINNOW_W
    toks = text.split(" ")
    if len(toks) < k:
        return set()
    grams = [
        " ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)
    ]
    hs = [
        int(hashlib.md5(g.encode()).hexdigest()[:7], 16) for g in grams
    ]
    n_win = max(len(hs) - w + 1, 1)
    return {min(hs[j:j + w]) for j in range(n_win)}


def test_fingerprint_card_matches_python_replay(spark, sf_dir):
    docs = catalog.load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("documents")
    got = {
        r.doc_id: (r.n_fps, r.min_fp, r.max_fp)
        for r in spark.sql(winnow._fp_card_sql("spark")).collect()
    }
    texts = {r.doc_id: r.text for r in docs.collect()}
    exp = {
        d: (len(f), min(f), max(f))
        for d, f in ((d, _py_fps(t)) for d, t in texts.items())
        if f
    }
    assert got == exp


def test_density_is_winnowed(spark, sf_dir):
    """Selected fingerprints must be well under the gram count —
    winnowing keeps ~2/(W+1) of gram hashes, never all of them for a
    doc with more grams than one window."""
    docs = catalog.load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("documents")
    rows = spark.sql(winnow._fp_card_sql("spark")).collect()
    assert rows
    long_docs = [r for r in rows if r.n_grams >= 3 * winnow.WINNOW_W]
    assert long_docs, "fixture should contain docs with many grams"
    assert all(r.n_fps < r.n_grams for r in long_docs)


def test_shared_run_guarantee_produces_pair(spark):
    """Two docs sharing a contiguous run of W+K-1 tokens share at
    least one selected fingerprint (the winnowing guarantee); with
    two disjoint shared runs they clear the MIN_SHARED pair gate."""
    k, w = winnow.WINNOW_K, winnow.WINNOW_W
    run1 = " ".join(f"shared{i}" for i in range(w + k - 1))
    run2 = " ".join(f"also{i}" for i in range(w + k - 1))
    a = f"alpha beta {run1} gamma delta {run2} epsilon"
    b = f"one two three {run1} four five six seven {run2} eight"
    c = "totally different words everywhere nothing matches here at all"
    df = spark.createDataFrame(
        [(1, a), (2, b), (3, c)], "doc_id long, text string"
    )
    df.createOrReplaceTempView("documents")
    pairs = {
        (r.doc_a, r.doc_b): r.n_shared
        for r in spark.sql(winnow._pairs_sql("spark")).collect()
    }
    assert (1, 2) in pairs
    assert pairs[(1, 2)] >= 2
    assert all(3 not in p for p in pairs)
