"""One-permutation-hashing MinHash (operators/dedup.py OPH section).

Pins: (1) the Spark signatures match an independent pure-Python
reimplementation of OPH + rotation densification on crafted docs;
(2) the densification rotation direction and +t*OPH_C hop offsets on
a doc whose shingles occupy exactly one bin; (3) the signature build
is a single shuffle (one groupBy exchange, densification is codegen).
The sf-fixture values themselves are driver-oracled
(minhash_oph_signatures / minhash_oph_pairs).
"""
from __future__ import annotations

import hashlib

from dataset_batch_processor_spark import catalog
from dataset_batch_processor_spark.operators.dedup import (
    OPH_C,
    OPH_K,
    SHINGLE_STRIDE,
    SHINGLE_W,
    oph_signatures_df,
)
from dataset_batch_processor_spark.plans import explain


def _py_oph(text: str) -> list[int] | None:
    """Independent reimplementation: shingle -> 28-bit md5 hash ->
    bin h % K, value h DIV K, min per bin, rotation densification."""
    if len(text) < SHINGLE_W:
        return None
    shingles = {
        text[p : p + SHINGLE_W]
        for p in range(0, max(len(text) - SHINGLE_W + 1, 1), SHINGLE_STRIDE)
    }
    bins: dict[int, int] = {}
    for s in shingles:
        h = int(hashlib.md5(s.encode()).hexdigest()[:7], 16)
        j, v = h % OPH_K, h // OPH_K
        bins[j] = min(bins.get(j, v), v)
    sig = []
    for j in range(OPH_K):
        for t in range(OPH_K):
            src = (j + t) % OPH_K
            if src in bins:
                sig.append(bins[src] + t * OPH_C)
                break
    return sig


def test_oph_matches_independent_reimplementation(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy dog!",
        "pack my box with five dozen liquor jugs",
        "aaaaaaaaaaaaaaaaaaaaaaaa",
        "exactly8",  # single shingle
        "short",  # below shingle width -> excluded
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: [r[f"oph_{j}"] for j in range(OPH_K)]
        for r in oph_signatures_df(docs).collect()
    }
    want = {i: _py_oph(t) for i, t in enumerate(texts) if _py_oph(t)}
    assert got == want


def test_oph_densification_rotation_from_single_bin(spark):
    # one shingle -> one occupied bin j0; every other signature slot j
    # must borrow it at +t*OPH_C where t = (j0 - j) mod K.
    text = "exactly8"
    h = int(hashlib.md5(text.encode()).hexdigest()[:7], 16)
    j0, v = h % OPH_K, h // OPH_K
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = oph_signatures_df(docs).collect()[0]
    for j in range(OPH_K):
        t = (j0 - j) % OPH_K
        assert row[f"oph_{j}"] == v + t * OPH_C


def test_oph_signature_build_two_level_shuffles(spark, sf_dir):
    """Round 9: the two-level build (one min per shingle on the
    (doc_id, bin) key, then the K-wide pivot over docs x K rows) is
    exactly two exchanges — the second one operates on an index-sized
    table, never on shingles (see SCALE.md round-9 study A for the
    measured story)."""
    docs = catalog.load_table(spark, sf_dir, "documents")
    assert explain.count_exchanges(oph_signatures_df(docs)) == 2
