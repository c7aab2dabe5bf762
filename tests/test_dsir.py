"""DSIR importance-weighted selection: weight-table invariants, the
target-enrichment property the method exists for, and the
deterministic top-N cut."""

from __future__ import annotations

from pyspark.sql import functions as F

from dataset_batch_processor_spark import catalog
from dataset_batch_processor_spark.operators import dsir


def _docs(spark, sf_dir):
    return catalog.load_table(spark, sf_dir, "documents")


def test_weight_table_bounded_and_positive(spark, sf_dir):
    w = dsir.dsir_bucket_weights(_docs(spark, sf_dir)).collect()
    assert 0 < len(w) <= dsir.N_BUCKETS
    assert all(r.ratio_ppm > 0 for r in w)  # add-one smoothing
    assert all(0 <= r.bucket < dsir.N_BUCKETS for r in w)


def test_scores_cover_every_doc(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    scores = dsir.dsir_scores(docs)
    assert scores.count() == docs.count()
    bad = scores.filter(
        (F.col("n_tokens") <= 0) | (F.col("dsir_score_ppm") <= 0)
    )
    assert bad.count() == 0


def test_selection_enriches_target_lang(spark, sf_dir):
    """The whole point of DSIR: the selected slice must be more
    target-like than the raw corpus."""
    docs = _docs(spark, sf_dir)
    n = docs.count()
    n_t = docs.filter(F.col("lang") == dsir.TARGET_LANG).count()
    sel = dsir.dsir_select(docs).collect()
    sel_t = sum(1 for r in sel if r.lang == dsir.TARGET_LANG)
    assert len(sel) == dsir.TOP_N
    # strict enrichment: sel_t/len(sel) > n_t/n as a cross-multiply
    assert sel_t * n > n_t * len(sel)


def test_topn_cut_deterministic(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    a = [(r.doc_id, r.dsir_score_ppm) for r in dsir.dsir_select(docs).collect()]
    b = [(r.doc_id, r.dsir_score_ppm) for r in dsir.dsir_select(docs).collect()]
    assert a == b
    # descending by score, doc_id breaks ties
    for (d0, s0), (d1, s1) in zip(a, a[1:]):
        assert s0 > s1 or (s0 == s1 and d0 < d1)


def test_bigram_selection_also_enriches_target(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    n = docs.count()
    n_t = docs.filter(F.col("lang") == dsir.TARGET_LANG).count()
    sel = dsir.dsir_select(docs, n=2).collect()
    sel_t = sum(1 for r in sel if r.lang == dsir.TARGET_LANG)
    assert len(sel) == dsir.TOP_N
    assert sel_t * n > n_t * len(sel)


def test_bigram_gram_count_is_tokens_minus_one(spark):
    df = spark.createDataFrame(
        [(1, "en", "a b c d"), (2, "en", "x")], "doc_id long, lang string, text string"
    )
    rows = dsir._bucketed_tokens(df, n=2).groupBy("doc_id").count().collect()
    counts = {r.doc_id: r["count"] for r in rows}
    assert counts == {1: 3}  # 4 tokens -> 3 bigrams; 1-token doc drops
