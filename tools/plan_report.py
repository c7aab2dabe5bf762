"""Plan + timing sweep over every driver query.

Usage: python tools/plan_report.py [sf_dir]

Prints one line per query: wall seconds, rows, shuffle-exchange count,
broadcast-join count — the at-a-glance health check for plan
regressions (a query whose exchange count jumps is a scale bug even
if correctness stays green).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    import __spark_entry__ as m
    from dataset_batch_processor_spark.plans import explain
    from dataset_batch_processor_spark.session import get_spark

    spark = get_spark("plan_report")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()  # warm

    rows_out = []
    for name, fn in m.queries().items():
        t0 = time.time()
        df = fn(spark, sf_dir)
        n = df.count()
        dt = time.time() - t0
        ex = explain.count_exchanges(df)
        bc = explain.broadcast_join_count(df)
        rows_out.append((dt, name, n, ex, bc))
        print(f"{dt:6.2f}s  {name:32s} rows={n:<9d} exchanges={ex:<2d} broadcasts={bc}")
    rows_out.sort(reverse=True)
    print("\nslowest five:")
    for dt, name, n, ex, bc in rows_out[:5]:
        print(f"  {dt:6.2f}s  {name}")


if __name__ == "__main__":
    main()
