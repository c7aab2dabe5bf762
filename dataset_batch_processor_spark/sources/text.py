"""Line-oriented and whole-file text sources — SURVEY.md §2.1 (S6-S9).

The reference's implicit read order (``for line in infile``,
/root/reference/modules/other_tasks.py:85-87) becomes an explicit
``line_no`` column; the memory-unsafe ``readlines`` variant (S8,
other_tasks.py:108-109) disappears because Spark streams partitions.

Exact-byte identity note (SURVEY.md §1.4): ``spark.read.text`` strips
the trailing newline, so a final unterminated line and an identical
terminated line would collide. When byte parity matters the reader
attaches ``is_terminated`` recovered from the raw file length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import scalar


def read_lines(spark: SparkSession, path: str, glob: str | None = None) -> DataFrame:
    """S7: line-oriented read with explicit order.

    Output: (input_file, line_no, value). line_no is per-file,
    0-based. Ordering within a file: (split byte offset, monotonic id
    within the split) — the byte offset matters because Spark
    bin-packs splits by size, so a large file's splits are NOT
    guaranteed to appear in ascending partition order; the monotonic
    id alone would interleave them wrongly.

    Scale note: the window partitions BY FILE, so the shuffle key is
    the filename — parallelism = number of files, which matches the
    reference's file-at-a-time semantics. For single-huge-file
    inputs prefer zipWithIndex-style offset assignment (textops.
    attach_global_row_number on a synthetic single file id).
    """
    reader = spark.read
    if glob:
        # F1-style suffix predicate pushed into the file listing
        # (the reference's merge scans only *.txt: other_tasks.py:8-10)
        reader = reader.option("pathGlobFilter", glob)
    raw = (
        reader.text(path)
        .withColumn("input_file", F.element_at(F.split(F.input_file_name(), "/"), -1))
        .withColumn("_block", F.expr("input_file_block_start()"))
        .withColumn("_mono", F.monotonically_increasing_id())
    )
    w = Window.partitionBy("input_file").orderBy("_block", "_mono")
    return raw.select(
        "input_file",
        (F.row_number().over(w) - 1).cast("long").alias("line_no"),
        F.col("value"),
    )


def read_whole_files(spark: SparkSession, path: str, glob: str | None = None) -> DataFrame:
    """S6: one row per file, entire content as a single string
    (``open(path).read()``, other_tasks.py:16-19)."""
    reader = spark.read
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return (
        reader.text(path, wholetext=True)
        .withColumn("input_file", F.element_at(F.split(F.input_file_name(), "/"), -1))
        .select("input_file", F.col("value").alias("content"))
    )


def load_caption_dictionary(spark: SparkSession, path: str) -> DataFrame:
    """S9: Unified_Caps.txt loader (caption_manager.py:5-12): strip,
    drop empties, keep file order as the MRU order (first = most
    recent). Output: (caption, mru_seq) where lower seq = more recent."""
    lines = read_lines(spark, path)
    return (
        lines.select(
            scalar.normalize_caption(F.col("value")).alias("caption"),
            F.col("line_no").alias("mru_seq"),
        )
        .filter(scalar.is_nonempty_caption(F.col("caption")))
        .groupBy("caption")
        .agg(F.min("mru_seq").alias("mru_seq"))
    )


def read_lines_exact(spark: SparkSession, path: str) -> DataFrame:
    """S7 with EXACT-BYTE identity (SURVEY.md §1.4): the reference's
    dedup treats the trailing newline as part of line identity
    (``if line not in seen`` over raw readlines), so a final
    unterminated line differs from an identical terminated one.
    ``spark.read.text`` strips newlines, losing that bit — recover it
    from the whole-file read: every line except an unterminated final
    one is terminated.

    Output: (input_file, line_no, value, is_terminated). Exact-byte
    identity = (value, is_terminated).

    Scale note: wholetext materializes each file in one task — right
    for the reference's many-small-files shape; for huge single files
    use read_lines + a tail check on raw bytes instead.
    """
    whole = read_whole_files(spark, path)
    split = whole.select(
        "input_file",
        F.split("content", "\n", -1).alias("parts"),
        F.col("content").endswith("\n").alias("_ends_nl"),
    )
    # split on \n: a terminated file yields a trailing "" element —
    # drop it; every kept line i is terminated unless it is the last
    # kept line of an unterminated file.
    lines = split.select(
        "input_file",
        F.posexplode(
            F.when(
                F.col("_ends_nl"), F.slice("parts", 1, F.size("parts") - 1)
            ).otherwise(F.col("parts"))
        ).alias("line_no", "value"),
        F.col("_ends_nl"),
        F.size(
            F.when(
                F.col("_ends_nl"), F.slice("parts", 1, F.size("parts") - 1)
            ).otherwise(F.col("parts"))
        ).alias("_n"),
    )
    return (
        lines
        # empty file: readlines() yields no lines, but split("") = [""]
        # would fabricate one — drop that fabricated empty row
        .filter(~((F.col("_n") == 1) & (F.col("value") == "") & ~F.col("_ends_nl")))
        .select(
            "input_file",
            F.col("line_no").cast("long"),
            "value",
            (F.col("_ends_nl") | (F.col("line_no") < F.col("_n") - 1)).alias(
                "is_terminated"
            ),
        )
    )
