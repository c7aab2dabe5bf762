"""Round-8 salt-count sweep (VERDICT r7 next#7).

The hot-tenant salted join (sources/storage.py,
lineitem_hot_tenant_salted_join) runs with n_salts=16 at the
fixture's measured skew factor (~50: one tenant owns ~half the probe
rows). Is 16 right? This study measures the join+agg wall at
n_salts in {1, 2, 4, 8, 16, 32, 64} over the sf0.1 fixture and
reports, per salt count:

- wall (median of reps) for the full salted join + per-tenant agg
- the hot key's theoretical per-reducer rows (hot_rows / n_salts)
- small-side replication rows (dim_rows * n_salts)

n_salts=1 is the plain-join degenerate (all hot rows in one reducer)
— the baseline the mitigation is judged against. The knee is where
wall stops improving: past it, extra salts only replicate the dim
side and shrink already-small partitions.

Usage: python tools/round8_scale_study.py [sf_dir] [reps]
Prints a markdown table (fold into SCALE.md) + one JSON line.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from dataset_batch_processor_spark.session import get_spark
from dataset_batch_processor_spark.sources.storage import (
    _TENANT,
    join_skew_report,
    salted_join,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("round8-salt-sweep")

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    probe = li.select(
        F.expr(_TENANT.format(k="l_partkey")).cast("bigint").alias("tenant"),
        F.col("l_quantity").cast("bigint").alias("qty"),
    )
    dim = part.groupBy(
        F.expr(_TENANT.format(k="p_partkey")).cast("bigint").alias("tenant")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_parts"))

    probe.count()  # warm the scans so rep 1 of the sweep isn't cold I/O
    dim_rows = dim.count()
    report = join_skew_report(probe, "tenant", dim)
    hot_rows = int(report["max_key_rows"])
    print(
        f"# fixture: {report['total']} probe rows, "
        f"{report['n_keys']} tenants, hot tenant {hot_rows} rows, "
        f"skew factor {report['max_skew_factor']:.1f}, dim {dim_rows} rows",
        file=sys.stderr,
    )

    rows = []
    for n_salts in (1, 2, 4, 8, 16, 32, 64):
        walls = []
        for _ in range(reps):
            t0 = time.time()
            joined = salted_join(probe, dim, "tenant", n_salts=n_salts)
            (
                joined.groupBy("tenant")
                .agg(
                    F.count(F.lit(1)).alias("li_rows"),
                    F.sum("qty").alias("sum_qty"),
                    F.max("n_parts").alias("n_parts"),
                )
                .count()
            )
            walls.append(time.time() - t0)
        walls.sort()
        wall = walls[len(walls) // 2]
        rows.append(
            {
                "n_salts": n_salts,
                "wall_s": round(wall, 3),
                "spread": [round(walls[0], 3), round(walls[-1], 3)],
                "hot_rows_per_reducer": hot_rows // n_salts,
                "dim_replicated_rows": dim_rows * n_salts,
            }
        )
        print(
            f"# n_salts={n_salts}: {wall:.2f}s "
            f"(hot/reducer {hot_rows // n_salts}, "
            f"dim×{n_salts}={dim_rows * n_salts})",
            file=sys.stderr,
        )

    print("| n_salts | wall (median) | hot rows/reducer | dim rows replicated |")
    print("|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['n_salts']} | {r['wall_s']} s | "
            f"{r['hot_rows_per_reducer']:,} | "
            f"{r['dim_replicated_rows']:,} |"
        )
    print(json.dumps({"fixture": report, "dim_rows": dim_rows,
                      "sweep": rows}))


if __name__ == "__main__":
    main()
