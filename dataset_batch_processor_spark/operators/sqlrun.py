"""Shared dual-dialect SQL query runner.

``_run(sql, tables)`` returns a driver-contract callable that
registers the named parquet tables as temp views and runs the Spark
SQL text — the house pattern for every dialect-parallel query whose
DuckDB oracle is (near-)identical SQL. Lived in the old relational2
module; round 9 moved it here when the numbered relational waves were
regrouped by theme (tpch/events/windows/setops)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .. import catalog


def _run(sql: str, tables: tuple[str, ...], fanout: tuple[str, ...] = ()):
    """``fanout`` names tables registered through catalog.fanout —
    for queries whose scan feeds a CPU-bound single-stage chain that
    the one-row-group fixture layout would otherwise serialize
    (guide §2.5; applied per measured call site)."""
    def f(spark: SparkSession, sf_dir: str) -> DataFrame:
        for t in tables:
            df = catalog.load_table(spark, sf_dir, t)
            if t in fanout:
                df = catalog.fanout(df)
            df.createOrReplaceTempView(t)
        return spark.sql(sql)

    return f
