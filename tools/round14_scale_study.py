"""Round-14 scale studies (VERDICT r13 items 3, 7, 8).

A) sign-LSH plane-count knob MEASURED (item 3): the r13 addendum
   recorded the fixed-P quadratic (P=8: 6.4/10.3/40/467 s at
   1/4/16/64x) and ASSERTED that P = O(log n) restores the 1x
   per-bucket regime. This study re-runs 16x and 64x with P=8 and
   P=16 on the SAME host window and records wall time, per-bucket
   occupancy (mean/max docs per non-empty bucket), and result rows —
   the measured row the assertion owed. TWO fanout flavors, because
   the lever matters: "plain" duplicates text verbatim (the r13
   rows' lever — identical texts give identical vectors, so copy
   multiplicity sets a bucket-density floor NO plane count can
   spread); "variant" prefixes each copy with a distinct tag
   (distinct-content growth, the honest corpus-growth model, where
   P = O(log n) can actually restore per-bucket density).

B) fixed-|Q| ANN growth (item 8): the gated panels (doc_id % 50)
   GROW with the corpus, so the r13 curves conflate corpus growth
   with query-set growth. query_mod = 50 * mult holds |Q| fixed (the
   serving shape) for both the exact brute force and the P=8 LSH.

C) production-hash END-TO-END chain delta (item 7): the full
   signatures -> bands -> capped pairs -> exact verify -> components
   -> canonical chain, md5 vs xxhash64, at 1/16/64x. The fanout here
   PREFIXES each copy with a distinct 8-char tag: plain fanout
   duplicates text verbatim, which manufactures mult-sized J=1
   cliques and a pair graph quadratic in mult — an artifact of the
   lever, not a property of the chain. The prefix (phase-shifting
   the stride-4 shingling) keeps cross-copy similarity low, so the
   natural near-dup structure replicates once per copy and the pair
   graph grows linearly; the chain's own +2^40 planting still
   supplies the J=1 population.

Usage: python tools/round14_scale_study.py [A|B|C|D] (default: ABC;
run D separately after the round-14 families land)
Run ALONE — never concurrently with bench/pytest (house rule).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from studylib import fanout_table  # noqa: E402

from dataset_batch_processor_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _fanout_sf_dir(spark, mult: int) -> str:
    """Materialized fanout corpus as a scratch sf-dir so the gated
    query callables run UNMODIFIED (the r13 study-C pattern)."""
    from dataset_batch_processor_spark.matcache import scratch_dir

    d = scratch_dir(f"dbp_r14_sf_{mult}_")
    fanout_table(spark, SF_DIR, "documents", "doc_id", mult).write.mode(
        "overwrite"
    ).parquet(os.path.join(d, "documents.parquet"))
    return d


def _bucket_occupancy(spark, sf_dir: str, planes: int) -> tuple:
    """(n_nonempty_buckets, mean_docs, max_docs) for the sign-LSH
    bucket table at plane count ``planes`` — the density the P knob
    exists to control. Reuses the gated SQL's own WITH chain cut at
    the bucket stage, so the probe can never drift from the query."""
    from dataset_batch_processor_spark import catalog
    from dataset_batch_processor_spark.operators import embed

    catalog.load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents"
    )
    body = embed._embed_lsh_sql("spark", planes)
    marker = "q AS ("
    assert marker in body, "gated SQL changed shape; update the probe"
    prefix = body[: body.index(marker)].rstrip().rstrip(",")
    row = spark.sql(
        prefix
        + "\nSELECT count(*) AS nb, avg(n) AS mean_n, max(n) AS max_n "
        "FROM (SELECT bucket, count(*) AS n FROM buckets GROUP BY bucket)"
    ).collect()[0]
    return (row.nb, round(float(row.mean_n), 1), row.max_n)


def _variant_fanout_sf_dir(spark, mult: int) -> str:
    from dataset_batch_processor_spark.matcache import scratch_dir

    d = scratch_dir(f"dbp_r14_vsf_{mult}_")
    _variant_fanout_docs(spark, mult).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    return d


def study_a(spark) -> None:
    from dataset_batch_processor_spark.operators import embed

    print("## A: sign-LSH plane knob P=8 vs P=16 (gated growing panel)")
    print("| flavor | mult | n_docs | P | buckets | mean/bucket "
          "| max/bucket | wall s | rows |")
    print("|---|---|---|---|---|---|---|---|---|")
    for flavor, mk in (("plain", _fanout_sf_dir),
                       ("variant", _variant_fanout_sf_dir)):
        for mult in (1, 16, 64):
            d = mk(spark, mult)
            n = spark.read.parquet(
                os.path.join(d, "documents.parquet")
            ).count()
            for planes in (8, 16):
                if mult == 1 and planes == 16:
                    continue  # 1x rows are the P=8 density baseline
                nb, mean_n, max_n = _bucket_occupancy(spark, d, planes)
                t0 = time.time()
                rows = embed.embed_ann_lsh_df(
                    spark, d, planes=planes
                ).count()
                wall = time.time() - t0
                print(
                    f"| {flavor} | {mult} | {n} | {planes} | {nb} "
                    f"| {mean_n} | {max_n} | {wall:.1f} | {rows} |",
                    flush=True,
                )
                spark.catalog.clearCache()


def study_b(spark) -> None:
    from pyspark.sql import functions as F

    from dataset_batch_processor_spark.operators import embed

    print("## B: fixed-|Q| ANN growth (query_mod = 50 * mult)")
    print("| mult | n_docs | |Q| | exact s | lsh P=8 s |")
    print("|---|---|---|---|---|")
    for mult in (1, 4, 16, 64):
        d = _fanout_sf_dir(spark, mult)
        n = spark.read.parquet(os.path.join(d, "documents.parquet")).count()
        qmod = embed.EMBED_ANN_QUERY_MOD * mult
        # |Q| comes straight from the fanout table — building (and
        # counting) the exact ANN result a second time just to read
        # its query_id cardinality doubled the exact-arm cost and
        # mixed cache effects into the timed run (ADVICE r14).
        nq = (
            spark.read.parquet(os.path.join(d, "documents.parquet"))
            .filter(F.col("doc_id") % qmod == 0)
            .count()
        )
        t0 = time.time()
        embed.embed_ann_topk_df(spark, d, query_mod=qmod).count()
        exact_s = time.time() - t0
        t0 = time.time()
        embed.embed_ann_lsh_df(spark, d, query_mod=qmod).count()
        lsh_s = time.time() - t0
        print(
            f"| {mult} | {n} | {nq} | {exact_s:.1f} | {lsh_s:.1f} |",
            flush=True,
        )
        spark.catalog.clearCache()


def _variant_fanout_docs(spark, mult: int):
    """Fanout with a per-copy 8-char prefix so copies of one base doc
    are NOT near-duplicates of each other (see module docstring)."""
    from pyspark.sql import functions as F

    docs = fanout_table(spark, SF_DIR, "documents", "doc_id", mult)
    return docs.select(
        "doc_id",
        F.expr(
            f"concat(lpad(CAST(doc_id % {mult} AS STRING), 7, 'x'), "
            "' ', text)"
        ).alias("text"),
    )


def study_c(spark) -> None:
    from dataset_batch_processor_spark.operators import dedup

    print("## C: production-hash END-TO-END chain (md5 vs xxhash64)")
    print("| mult | n_docs (planted) | md5 s | xxhash64 s | speedup "
          "| labels |")
    print("|---|---|---|---|---|---|")
    for mult in (1, 16, 64):
        planted = dedup.plant_exact_copies(
            _variant_fanout_docs(spark, mult)
        ).localCheckpoint()
        n = planted.count()
        t0 = time.time()
        dedup.prodhash_chain_labels_df(
            planted, production_hash=False
        ).count()
        md5_s = time.time() - t0
        t0 = time.time()
        labels = dedup.prodhash_chain_labels_df(
            planted, production_hash=True
        ).count()
        xx_s = time.time() - t0
        print(
            f"| {mult} | {n} | {md5_s:.1f} | {xx_s:.1f} "
            f"| {md5_s / xx_s:.2f}x | {labels} |",
            flush=True,
        )
        spark.catalog.clearCache()


def study_d(spark) -> None:
    """Growth curves for the round-14 gated families, run UNMODIFIED
    over fanout sf-dirs (the r13 study-C pattern). The prodhash chain
    is excluded here — plain fanout duplicates text verbatim, which
    manufactures quadratic J=1 cliques; study C measures the chain on
    the variant fanout instead."""
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    names = [
        "docs_source_vocab_overlap",
        "docs_ngram_novelty",
        "docs_annotator_agreement",
        "docs_window_chunks",
    ]
    print("## D: round-14 family growth (fanout sf-dirs, queries "
          "unmodified)")
    print("| mult | n_docs | " + " | ".join(n.replace("docs_", "")
                                            for n in names) + " |")
    print("|" + "---|" * (len(names) + 2))
    for mult in (1, 4, 16, 64):
        d = _fanout_sf_dir(spark, mult)
        n = spark.read.parquet(os.path.join(d, "documents.parquet")).count()
        cells = []
        for name in names:
            t0 = time.time()
            qs[name](spark, d).count()
            cells.append(f"{time.time() - t0:.2f}")
            spark.catalog.clearCache()
        print(f"| {mult} | {n} | " + " | ".join(cells) + " |", flush=True)


def run_one(spark, flavor: str, mult: int, planes: int) -> None:
    """One bounded study-A measurement, printed as a table row —
    invoked per-subprocess so the shell can `timeout` a run that the
    fixed-P quadratic makes infeasible (a DNF is recorded as the
    finding, not waited out)."""
    from dataset_batch_processor_spark.operators import embed

    spark.range(1000).repartition(8).count()  # shuffle-path warmup
    mk = _fanout_sf_dir if flavor == "plain" else _variant_fanout_sf_dir
    d = mk(spark, mult)
    n = spark.read.parquet(os.path.join(d, "documents.parquet")).count()
    nb, mean_n, max_n = _bucket_occupancy(spark, d, planes)
    t0 = time.time()
    rows = embed.embed_ann_lsh_df(spark, d, planes=planes).count()
    wall = time.time() - t0
    print(
        f"| {flavor} | {mult} | {n} | {planes} | {nb} | {mean_n} "
        f"| {max_n} | {wall:.1f} | {rows} |",
        flush=True,
    )


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "one":
        spark = get_spark("round14-scale-study-one")
        run_one(spark, sys.argv[2], int(sys.argv[3]), int(sys.argv[4]))
        return
    which = sys.argv[1] if len(sys.argv) > 1 else "ABC"
    spark = get_spark("round14-scale-study")
    # warm codegen/shuffle so the first measured row is not JVM start
    from dataset_batch_processor_spark.operators import embed

    embed.embed_ann_lsh_df(spark, SF_DIR).count()
    if "A" in which:
        study_a(spark)
    if "B" in which:
        study_b(spark)
    if "C" in which:
        study_c(spark)
    if "D" in which:
        study_d(spark)


if __name__ == "__main__":
    main()
