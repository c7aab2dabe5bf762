"""SparkSession factory tuned for this engine.

Local testing runs on local[N]; the same configuration scales to a
multi-executor cluster because nothing here is local-mode-specific:
AQE handles runtime re-planning (skew joins, partition coalescing),
shuffle partitions default to the core count, and Arrow is enabled
for the pandas-UDF slow path.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "dataset_batch_processor_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with scale-aware defaults.

    - AQE on: runtime partition coalescing + skew-join splitting, the
      first line of defense against skewed keys at 100 TB.
    - shuffle.partitions sized to cores locally; on a real cluster
      AQE's coalescing makes the initial number less critical.
    - Arrow on: all pandas UDFs move data in columnar batches.
    - UTC session timezone so timestamp semantics are stable.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # parallelismFirst stays at its default (true): measured here,
        # coalescing to the 64MB advisory size (false) sped the
        # iterative tiny-shuffle operators ~15% but cost 2x on
        # CPU-bound mid-size shuffles (jaccard verify, gram joins) by
        # shrinking their post-shuffle parallelism.
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        # static conf: managed-table warehouse for bucketed tables
        # (sources/storage.py); keep it session-unique under tmp
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get(
                "SPARK_GRAFT_WAREHOUSE",
                tempfile.mkdtemp(prefix="dbp_warehouse_"),
            ),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
