"""Round-9 growth study for the late-round-8 families (VERDICT r8
next #3): measured curves, not postures.

A. OPH vs K-perm MinHash signature build at production widths — the
   O(1)-per-shingle claim. Both builds share one shingle scan + one
   groupBy(doc_id) shuffle; the K-perm map side pays K affine mins
   per shingle, OPH pays one modulo + one min. Measured at K=8 (the
   gated width) and K=64 (production) over 1x/4x/16x corpus fanout.
B. k-center coreset iteration wall vs corpus size — K full scans are
   inherent to Gonzalez; the claim is per-iteration wall grows
   linearly with the corpus and K stays the multiplier.
C. Perceptron epoch scan cost vs corpus size — one codegen scan
   collecting 6 ints per epoch; wall should track the narrow scan.
D. Banding-sweep truth-panel size vs precision: recall estimates and
   the chooser's pick across panel strides, against the full
   all-pairs truth — how small can the panel go before the chosen
   banding moves.

Usage: python tools/round9_scale_study.py
Prints markdown tables + one JSON line.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from dataset_batch_processor_spark import catalog, matcache
from dataset_batch_processor_spark.operators import coreset, dedup, perceptron
from dataset_batch_processor_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.01"
RESULTS: dict = {}


def _fanout_docs(spark, mult: int):
    from studylib import fanout_table

    return fanout_table(spark, SF_DIR, "documents", "doc_id", mult)


def _fanout_emb(spark, mult: int):
    from studylib import fanout_table

    return fanout_table(spark, SF_DIR, "embeddings", "vec_id", mult)


def _perms(k: int):
    return [
        ((dedup._md5int(f"a{j}") % (dedup.MERSENNE_P - 1)) + 1,
         dedup._md5int(f"b{j}") % dedup.MERSENNE_P)
        for j in range(k)
    ]


def _kperm_sigs(docs, k: int):
    sh = dedup.shingle_sets(docs, distinct=False)
    aggs = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % dedup.MERSENNE_P).alias(
            f"mh_{j}"
        )
        for j, (a, b) in enumerate(_perms(k))
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def _oph_sigs_onelevel(docs, k: int):
    """The ORIGINAL r8 one-level build: K conditional-min buffers per
    shingle + the K-squared coalesce ladder — kept to document why it
    was replaced (O(K) per shingle in practice; codegen blowup at
    K=64)."""
    c = 1 << 25
    sh = dedup.shingle_sets(docs, distinct=False).select(
        "doc_id",
        (F.col("h") % k).alias("bin"),
        F.expr(f"h DIV {k}").alias("val"),
    )
    binmins = sh.groupBy("doc_id").agg(*[
        F.min(F.when(F.col("bin") == j, F.col("val"))).alias(f"b_{j}")
        for j in range(k)
    ])
    sig_cols = [
        F.coalesce(*[
            F.col(f"b_{(j + t) % k}") + F.lit(t * c) for t in range(k)
        ]).alias(f"oph_{j}")
        for j in range(k)
    ]
    return binmins.select("doc_id", *sig_cols)


def _oph_sigs(docs, k: int):
    """The round-9 two-level build (mirrors dedup.oph_signatures_df):
    one min per shingle on the (doc_id, bin) key, wide pivot +
    densification over the docs-x-K-row table."""
    c = 1 << 25
    sh = dedup.shingle_sets(docs, distinct=False).select(
        "doc_id",
        (F.col("h") % k).alias("bin"),
        F.expr(f"h DIV {k}").alias("val"),
    )
    binmin = sh.groupBy("doc_id", "bin").agg(F.min("val").alias("v"))
    binmins = binmin.groupBy("doc_id").agg(*[
        F.min(F.when(F.col("bin") == j, F.col("v"))).alias(f"b_{j}")
        for j in range(k)
    ])
    sig_cols = [
        F.coalesce(*[
            F.col(f"b_{(j + t) % k}") + F.lit(t * c) for t in range(k)
        ]).alias(f"oph_{j}")
        for j in range(k)
    ]
    return binmins.select("doc_id", *sig_cols)


def study_a(spark):
    print("\n## A. OPH vs K-perm signature build (wall s, 2-run best)\n")
    print("| mult | n_docs | K | kperm_s | oph_s | oph_r8_onelevel_s | kperm/oph |")
    print("|---|---|---|---|---|---|---|")
    rows = []
    for mult in (1, 4, 16):
        docs = _fanout_docs(spark, mult).persist()
        n = docs.count()
        for k in (8, 64):
            walls = {}
            for name, fn in (("kperm", _kperm_sigs), ("oph", _oph_sigs),
                             ("oph_r8", _oph_sigs_onelevel)):
                best = float("inf")
                for _ in range(2):
                    t0 = time.time()
                    fn(docs, k).count()
                    best = min(best, time.time() - t0)
                walls[name] = round(best, 2)
            ratio = round(walls["kperm"] / max(walls["oph"], 1e-9), 2)
            print(f"| {mult}x | {n} | {k} | {walls['kperm']} | "
                  f"{walls['oph']} | {walls['oph_r8']} | {ratio} |")
            rows.append({"mult": mult, "n_docs": n, "k": k, **walls,
                         "ratio": ratio})
        docs.unpersist()
    RESULTS["oph_vs_kperm"] = rows


def study_b(spark):
    print("\n## B. k-center coreset wall vs corpus (K=8 iterations)\n")
    print("| mult | n_vecs | total_s | s_per_iter |")
    print("|---|---|---|---|")
    rows = []
    for mult in (1, 4, 16):
        emb = _fanout_emb(spark, mult).persist()
        n = emb.count()
        t0 = time.time()
        sels = coreset.kcenter_greedy(emb, k=coreset.K_CENTERS)
        wall = time.time() - t0
        per = round(wall / coreset.K_CENTERS, 2)
        print(f"| {mult}x | {n} | {wall:.2f} | {per} |")
        rows.append({"mult": mult, "n_vecs": n, "total_s": round(wall, 2),
                     "s_per_iter": per, "n_selected": len(sels)})
        emb.unpersist()
    RESULTS["coreset"] = rows


def study_c(spark):
    print("\n## C. Perceptron epoch scan wall vs corpus\n")
    print("| mult | n_docs | feats_build_s | epoch_scan_s |")
    print("|---|---|---|---|")
    rows = []
    w = [1000, 10, -1, -1, -1]  # arbitrary fixed weights for the scan
    for mult in (1, 4, 16):
        docs = _fanout_docs(spark, mult)
        t0 = time.time()
        feats = perceptron.features_df(docs).persist()
        feats.count()
        build = time.time() - t0
        train = feats.filter("is_train")
        t0 = time.time()
        train.filter(
            F.col("y") * perceptron._margin_col(w) <= 0
        ).agg(
            F.count(F.lit(1)).alias("nerr"),
            *[
                F.coalesce(F.sum(F.col("y") * F.col(f"f{d}")), F.lit(0))
                .alias(f"d{d}")
                for d in range(perceptron.P_DIMS)
            ],
        ).collect()
        scan = time.time() - t0
        n = feats.count()
        print(f"| {mult}x | {n} | {build:.2f} | {scan:.2f} |")
        rows.append({"mult": mult, "n_docs": n,
                     "feats_build_s": round(build, 2),
                     "epoch_scan_s": round(scan, 2)})
        feats.unpersist()
    RESULTS["perceptron"] = rows


def study_d(spark):
    """Panel-size sweep at sf0.1 (5000 docs): full truth (mod 1,
    quadratic) vs strided panels; per-config recall and the chooser's
    pick. The production question: how small a panel still picks the
    same banding."""
    sf = "/root/testdata/sf0.1"
    print("\n## D. Banding-sweep truth-panel size vs precision (sf0.1)\n")
    print("| panel_mod | panel_docs | truth_pairs | wall_s | "
          "recalls (8x1,4x2,2x4,1x8) | chosen |")
    print("|---|---|---|---|---|---|")
    docs = catalog.load_table(spark, sf, "documents")
    sigs = dedup.minhash_signatures_df(docs).persist()
    sigs.count()
    rows = []
    for mod in (1, 2, 5, 10, 20):
        matcache.invalidate_exact("jaccard_truth")
        t0 = time.time()
        truth = dedup.jaccard_truth(spark, sf, panel_mod=mod).persist()
        n_true = truth.count()
        panel_docs = docs.filter(dedup._in_panel("doc_id", mod)).count()
        recs = []
        report_rows = []
        for b, r in dedup.SWEEP_CONFIGS:
            bands = dedup._bands_config_df(sigs, b, r)
            cand = dedup._bucket_pairs(bands)
            if mod > 1:
                cand = cand.filter(
                    dedup._in_panel("doc_a", mod)
                    & dedup._in_panel("doc_b", mod)
                )
            n_cand = cand.count()
            n_det = cand.join(truth, ["doc_a", "doc_b"]).count()
            recs.append(round(n_det / max(n_true, 1), 4))
            report_rows.append({
                "n_bands": b, "band_rows": r,
                "n_detected": n_det, "n_candidates": n_cand,
            })
        wall = time.time() - t0
        chosen = dedup.choose_banding(report_rows)
        truth.unpersist()
        print(f"| {mod} | {panel_docs} | {n_true} | {wall:.1f} | "
              f"{recs} | {chosen} |")
        rows.append({"panel_mod": mod, "panel_docs": panel_docs,
                     "truth_pairs": n_true, "wall_s": round(wall, 1),
                     "recalls": recs, "chosen": list(chosen)})
    sigs.unpersist()
    matcache.invalidate_exact("jaccard_truth")
    RESULTS["banding_panel"] = rows


def main():
    spark = get_spark("round9_scale_study")
    study_a(spark)
    study_b(spark)
    study_c(spark)
    study_d(spark)
    print("\n" + json.dumps(RESULTS, separators=(",", ":")))


if __name__ == "__main__":
    main()
