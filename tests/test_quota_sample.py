"""Per-source quota sample: exact bottom-k semantics, tournament ==
one-level equivalence, growth-stability, and the no-funnel plan."""

from __future__ import annotations

import hashlib

import duckdb

from dataset_batch_processor_spark import catalog
from dataset_batch_processor_spark.operators import curation
from dataset_batch_processor_spark.plans import explain

SF = "/root/testdata/sf0.001"


def _draw(source: str, doc_id: int) -> int:
    return int(
        hashlib.md5(f"{source}#{doc_id}".encode()).hexdigest()[:15], 16
    )


def _python_bottom_k(rows, k=curation.QUOTA_K):
    by_src: dict = {}
    for doc_id, source in rows:
        by_src.setdefault(source, []).append((_draw(source, doc_id), doc_id))
    out = {}
    for src, ds in by_src.items():
        ds.sort()
        out[src] = [d for _, d in ds[:k]]
    return out


def test_quota_sample_matches_python_bottom_k(spark):
    rows = [
        (r["doc_id"], r["source"])
        for r in catalog.load_table(spark, SF, "documents")
        .select("doc_id", "source").collect()
    ]
    exp = _python_bottom_k(rows)
    got: dict = {}
    for r in curation.QUERIES["docs_quota_sample"](spark, SF).orderBy(
        "source", "sample_rank"
    ).collect():
        got.setdefault(r["source"], []).append(r["doc_id"])
    assert got == exp
    # every source fills its quota (fixture sources hold >= K docs)
    assert all(len(v) == curation.QUOTA_K for v in got.values())


def test_quota_sample_stable_under_corpus_growth(spark):
    """The reservoir property rate-samples lack: a kept doc's draw
    never changes when OTHER docs arrive — adding rows can only evict
    from the bottom, so the sample of a subset is a superset-filter."""
    rows = [
        (r["doc_id"], r["source"])
        for r in catalog.load_table(spark, SF, "documents")
        .select("doc_id", "source").collect()
    ]
    full = _python_bottom_k(rows)
    half = _python_bottom_k([r for r in rows if r[0] % 2 == 0])
    hits = 0
    for src, kept in full.items():
        kept_even = [d for d in kept if d % 2 == 0]
        if not kept_even:  # source had no even docs at all
            continue
        # the full-corpus picks that survive the subset are exactly a
        # PREFIX of the subset's sample: a draw inside the global
        # bottom-k dominates every smaller rival there too
        assert half[src][: len(kept_even)] == kept_even, src
        hits += 1
    assert hits > 0


def test_quota_sample_plan_two_level_no_funnel(spark):
    catalog.load_table(spark, SF, "documents").createOrReplaceTempView(
        "documents"
    )
    plan = explain.formatted_plan(spark.sql(curation.QUOTA_SAMPLE_SPARK))
    assert "SinglePartition" not in plan, plan
    # both window levels keyed: (source, bucket) then (source)
    assert plan.count("Window") >= 2, plan


def test_oracle_is_the_one_level_spelling():
    """Structural independence: the oracle computes the straight
    global bottom-k, so the gate proves the tournament's equivalence."""
    assert "lvl1" not in curation.QUOTA_SAMPLE_DUCK
    assert f"% {curation._QUOTA_BUCKETS}" not in curation.QUOTA_SAMPLE_DUCK
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM"
        f" read_parquet('{SF}/documents.parquet')"
    )
    n = con.execute(
        f"SELECT count(*) FROM ({curation.QUOTA_SAMPLE_DUCK})"
    ).fetchone()[0]
    con.close()
    assert n > 0


def test_shuffle_resume_slice_consistent_with_epoch_shuffle():
    """The resume slice IS rows [S*B, (S+K)*B) of the gated epoch
    shuffle order — no drift between the two permutations."""
    import duckdb

    from dataset_batch_processor_spark.operators import curation as cur

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    full = con.execute(cur.EPOCH_SHUFFLE_DUCK).fetchall()
    got = con.execute(cur.SHUFFLE_RESUME_DUCK).fetchall()
    con.close()
    lo = cur.RESUME_STEP * cur.RESUME_BATCH
    hi = (cur.RESUME_STEP + cur.RESUME_NBATCH) * cur.RESUME_BATCH
    want = full[lo:hi]
    assert len(got) == cur.RESUME_NBATCH * cur.RESUME_BATCH
    for i, (step, pos_in_batch, doc_id, shard) in enumerate(got):
        assert step == (lo + i) // cur.RESUME_BATCH
        assert pos_in_batch == (lo + i) % cur.RESUME_BATCH
        assert doc_id == want[i][0]
        assert shard == want[i][1]
