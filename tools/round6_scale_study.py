"""Round-6 amplified-scale studies (VERDICT r5 items 5 & 8).

Three measurements that validate scale claims BEFORE a real 100× run,
results folded into SCALE.md:

1. **Adaptive-LSH candidate growth** at n = 10^6..10^8 iid synthetic
   vectors: candidate pairs under `adaptive_n_planes(n)` vs the fixed
   8-plane fixture setting. Candidate pairs are counted EXACTLY from
   the bucket histogram (sum of C(b,2)) — no pair join needed, so the
   measurement reaches 10^8 on one box. Vectors are generated inside
   the kernel from vec_id (seeded per batch), so nothing corpus-sized
   crosses Arrow except the 12-byte (vec_id, bucket) rows.
2. **TARGET_BUCKET sweep** at n = 10^7: target 16 / 64 / 256 →
   plane count, candidate pairs, pairs-per-vector. Validates the
   TARGET_BUCKET = 64 default.
3. **SemDeDup max_cluster_size sweep** on the planted-dup amplified
   corpus: cluster-pair bound sum(C(c_i,2)) and survivors wall for
   cap 32 / 64 / 128 — the block-then-verify cost curve.
4. **Triangle orientation fan-out** on a synthetic power-law graph:
   max/mean wedge fan-out, id-ordered vs (degree,id)-ordered — the
   sqrt(m) bound behind round 6's orientation change, measured.

Usage: python tools/round6_scale_study.py [max_n_exp]
  max_n_exp: largest 10^x for study 1 (default 8; use 7 for a quick run)
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from dataset_batch_processor_spark.operators.similarity import (
    TARGET_BUCKET,
    adaptive_n_planes,
    hyperplane_matrix,
)
from dataset_batch_processor_spark.session import get_spark


def timed(fn):
    t0 = time.time()
    out = fn()
    return out, round(time.time() - t0, 1)


def synthetic_buckets(spark, n: int, n_planes: int):
    """(bucket) for n iid standard-gaussian 64-dim vectors, generated
    and signed inside the kernel — one GEMM per Arrow batch."""
    import numpy as np
    import pandas as pd

    P = hyperplane_matrix(n_planes)
    w = 2 ** np.arange(n_planes, dtype=np.int64)

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            if len(ids) == 0:
                continue
            rng = np.random.default_rng(int(ids[0]) + 1)
            E = rng.standard_normal((len(ids), P.shape[1]))
            sig = ((E @ P.T) > 0).astype(np.int64) @ w
            yield pd.DataFrame({"bucket": sig})

    par = spark.sparkContext.defaultParallelism * 4
    return spark.range(n).repartition(par).mapInPandas(
        gen, schema="bucket long"
    )


def candidate_pairs_from_buckets(buckets) -> tuple[int, int]:
    """Exact LSH candidate-pair count: sum over buckets of C(b, 2),
    plus the occupied-bucket count."""
    row = (
        buckets.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("b"))
        .agg(
            F.sum(F.expr("b * (b - 1) DIV 2")).alias("pairs"),
            F.count(F.lit(1)).alias("n_buckets"),
        )
        .collect()[0]
    )
    return int(row["pairs"]), int(row["n_buckets"])


def study_adaptive_growth(spark, max_exp: int) -> None:
    for exp in range(6, max_exp + 1):
        n = 10 ** exp
        for label, p in (
            ("adaptive", adaptive_n_planes(n)),
            ("fixed8", 8),
        ):
            if label == "fixed8" and n > 10**7:
                # the fixed-plane candidate count at 10^8 is n^2/2^8 ≈
                # 2e13 pairs — the histogram still computes it exactly,
                # but there is no information in materializing the
                # blowup twice; report 10^6/10^7 and extrapolate
                continue
            (pairs, nb), dt = timed(
                lambda p=p: candidate_pairs_from_buckets(
                    synthetic_buckets(spark, n, p)
                )
            )
            print(json.dumps({
                "exp": "lsh_candidate_growth", "n": n, "planes": p,
                "mode": label, "cand_pairs": pairs,
                "pairs_per_vector": round(pairs / n, 2),
                "occupied_buckets": nb, "wall_s": dt,
            }), flush=True)


def study_target_bucket(spark, n: int = 10**7) -> None:
    for tb in (16, 64, 256):
        p = adaptive_n_planes(n, target_bucket=tb)
        (pairs, nb), dt = timed(
            lambda p=p: candidate_pairs_from_buckets(
                synthetic_buckets(spark, n, p)
            )
        )
        print(json.dumps({
            "exp": "target_bucket_sweep", "n": n, "target_bucket": tb,
            "planes": p, "cand_pairs": pairs,
            "pairs_per_vector": round(pairs / n, 2), "wall_s": dt,
        }), flush=True)


def study_semdedup_cap(spark) -> None:
    """Cap sweep at 10^6 planted-dup vectors, production posture:
    assignment via the GEMM kernel (persisted-table stand-in), the
    cluster pairwise join bounded by max_cluster_size. pair_bound is
    the even-split block bound sum over clusters of
    nsplit * C(ceil(c/nsplit), 2) — the quantity the cap is supposed
    to keep sub-quadratic."""
    from dataset_batch_processor_spark.operators import semdedup
    from dataset_batch_processor_spark.operators.similarity import (
        ivf_assign_gemm,
    )
    from tools.round2_scale_study import amplified_emb

    emb = amplified_emb(spark, 500).persist()  # 10^6 planted-dup vecs
    n = emb.count()
    assign = ivf_assign_gemm(emb, centroid_mod=997).persist()
    assign.count()
    sizes = assign.groupBy("centroid_id").agg(
        F.count(F.lit(1)).alias("c")
    )
    for cap in (0, 32, 64, 128):
        if cap:
            bound_expr = (
                "CAST(ceil(c / CAST({cap} AS DOUBLE)) AS BIGINT) * "
                "(CAST(ceil(c / ceil(c / CAST({cap} AS DOUBLE))) AS BIGINT)"
                " * (CAST(ceil(c / ceil(c / CAST({cap} AS DOUBLE))) AS"
                " BIGINT) - 1) DIV 2)"
            ).format(cap=cap)
        else:
            bound_expr = "c * (c - 1) DIV 2"
        bound = sizes.agg(F.sum(F.expr(bound_expr))).collect()[0][0]
        if cap:
            surv, dt = timed(
                lambda cap=cap: semdedup.semdedup_survivors(
                    emb, eps=0.95, max_cluster_size=cap,
                    vectorized=True, assignments=assign,
                ).count()
            )
        else:
            surv, dt = None, None  # uncapped join would materialize
            # the full planted-dup blowup; its bound is the point
        print(json.dumps({
            "exp": "semdedup_cap_sweep", "n": n, "cap": cap,
            "pair_bound": int(bound), "survivors": surv, "wall_s": dt,
        }), flush=True)


def study_triangle_fanout(spark) -> None:
    """Star graph with the hub at a MIDDLE id — the id-ordering worst
    case: half the hub's edges point in, half out, so the wedge join
    materializes (d/2)^2 paths through the hub. (A hub at the lowest
    or highest id is id-ordering's lucky case — all edges one way,
    zero wedges — which is exactly why id-ordering is fragile: the
    cost depends on where the hub's id landed.) Degree-ordering
    points every hub edge INTO the hub regardless of ids, so hub
    wedges vanish deterministically. Small cliques supply the real
    triangles."""
    from dataset_batch_processor_spark.operators.dedup import (
        orient_edges_by_degree,
    )

    n_spokes = 4_000
    hub = n_spokes // 2
    edges = [(min(hub, s), max(hub, s))
             for s in range(n_spokes + 1) if s != hub]
    for base in range(0, n_spokes - 4, 100):
        ids = [i for i in range(base, base + 5) if i != hub][:4]
        for i in range(4):
            for j in range(i + 1, 4):
                edges.append((ids[i], ids[j]))
    edges = sorted(set(edges))
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long").persist()
    m = pairs.count()

    def wedges(e, lo, hi):
        l1 = e.select(F.col(lo).alias("a"), F.col(hi).alias("b"))
        l2 = e.select(F.col(lo).alias("b2"), F.col(hi).alias("c"))
        return l1.join(l2, F.col("b") == F.col("b2")).count()

    id_ordered = pairs  # doc_a < doc_b; mid-id hub = the worst case
    w_id, dt_id = timed(lambda: wedges(id_ordered, "doc_a", "doc_b"))
    oriented = orient_edges_by_degree(pairs).persist()
    w_deg, dt_deg = timed(lambda: wedges(oriented, "lo", "hi"))
    print(json.dumps({
        "exp": "triangle_wedge_fanout", "edges": m,
        "wedges_id_ordered": w_id, "wedges_degree_ordered": w_deg,
        "reduction_factor": round(w_id / max(1, w_deg), 1),
        "wall_id_s": dt_id, "wall_deg_s": dt_deg,
    }), flush=True)


def main() -> None:
    max_exp = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    spark = get_spark("round6_scale_study")
    study_triangle_fanout(spark)
    study_semdedup_cap(spark)
    study_target_bucket(spark)
    study_adaptive_growth(spark, max_exp)


if __name__ == "__main__":
    main()
