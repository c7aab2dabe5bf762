"""Shared scale-study helpers (review r12 #7: four round studies
carried byte-near-identical fanout implementations — a fix applied
to one would silently desync the others' measured corpora)."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from dataset_batch_processor_spark import catalog


def fanout_table(spark, sf_dir: str, table: str, id_col: str, mult: int):
    """``mult`` disjoint copies of the table with remapped unique ids
    (id' = id * mult + m) — the corpus-growth lever every round study
    measures against."""
    df = catalog.load_table(spark, sf_dir, table)
    if mult == 1:
        return df
    return (
        df.crossJoin(
            F.broadcast(spark.range(mult).withColumnRenamed("id", "_m"))
        )
        .withColumn(id_col, F.col(id_col) * mult + F.col("_m"))
        .drop("_m")
    )
