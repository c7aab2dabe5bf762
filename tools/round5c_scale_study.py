"""Amplified measurements for the round-5c operators (CMS, histogram
sketch, dup-graph triangles). Results fold into SCALE.md.

Usage: python tools/round5c_scale_study.py [event_factor]
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from dataset_batch_processor_spark.session import get_spark
from tools.round2_scale_study import timed

SF = "/root/testdata/sf0.1"


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    spark = get_spark("round5c_scale_study")

    # amplified events: factor x 100k rows, user space widened so
    # heavy-hitter structure stays realistic
    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "user_id", "value"
    )
    reps = spark.range(factor).select(F.col("id").alias("rep"))
    big = ev.crossJoin(F.broadcast(reps)).select(
        (F.col("user_id") + F.col("rep") % 7 * 1000).alias("user_id"),
        (F.col("value") + (F.col("rep") % 5).cast("double")).alias("value"),
    ).persist()
    n = big.count()

    from dataset_batch_processor_spark.operators import cms, histsketch

    _, dt_cms = timed(lambda: cms.cms_partial(big).count())
    print(json.dumps({
        "exp": "cms_grid_build", "n_events": n, "wall_s": dt_cms,
        "events_per_s": round(n / dt_cms),
    }))

    _, dt_xxh = timed(
        lambda: cms.cms_partial(big, production_hash=True).count()
    )
    print(json.dumps({
        "exp": "cms_grid_build_xxhash", "n_events": n, "wall_s": dt_xxh,
        "events_per_s": round(n / dt_xxh),
    }))

    _, dt_hist = timed(lambda: histsketch.hist_partial(big).count())
    print(json.dumps({
        "exp": "hist_build", "n_events": n, "wall_s": dt_hist,
        "events_per_s": round(n / dt_hist),
    }))
    big.unpersist()

    # triangles over the sf0.1 dup graph (the realistic-density edge
    # list the round-4 studies use)
    from dataset_batch_processor_spark import catalog
    from dataset_batch_processor_spark.operators import dedup

    docs = catalog.load_table(spark, SF, "documents")
    pairs = dedup.lsh_pairs_df(docs).persist()
    m = pairs.count()
    e1 = pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    e2 = pairs.select(F.col("doc_a").alias("b2"), F.col("doc_b").alias("c"))
    e3 = pairs.select(F.col("doc_a").alias("a3"), F.col("doc_b").alias("c3"))
    tri = (
        e1.join(e2, F.col("b") == F.col("b2"))
        .join(e3, (F.col("a") == F.col("a3")) & (F.col("c") == F.col("c3")))
    )
    t, dt_tri = timed(tri.count)
    print(json.dumps({
        "exp": "triangle_join", "n_edges": m, "n_triangles": t,
        "wall_s": dt_tri,
    }))


if __name__ == "__main__":
    main()
