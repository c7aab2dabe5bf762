"""Structured Streaming surface.

The reference has no streaming (SURVEY.md §2.8): its only incremental
behaviors are line-at-a-time file iteration and a cooperative cancel
flag. This module is the pure extension the north star asks for — the
same operators, incrementally:

- **file-watch mode**: ``readStream`` over a landing directory (text
  or binary) — the streaming analogue of the reference's folder scan
  (S1). New files become new micro-batch rows; the batch operators
  (routing, tiling geometry, dedup) apply unchanged because they are
  DataFrame -> DataFrame.
- **windowed rollup**: event-time tumbling windows with a watermark
  for late data — the streaming form of relational.events_hourly.
- **stateful dedup**: ``dropDuplicatesWithinWatermark`` keyed on the
  line hash — the streaming form of A4 exact dedup with bounded
  state (the watermark bounds the dedup state store, which is what
  makes it viable on an unbounded 100 TB/day stream).

Tests drive these with ``trigger(availableNow=True)`` so they run as
bounded jobs against the fixture directories.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import DataStreamWriter


def watch_text_folder(spark: SparkSession, path: str) -> DataFrame:
    """Streaming S1/S7: each new text file's lines become rows."""
    return (
        spark.readStream.format("text")
        .load(path)
        .withColumn(
            "input_file", F.element_at(F.split(F.input_file_name(), "/"), -1)
        )
    )


def watch_binary_folder(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """Streaming binary ingestion for image payloads. (File streams
    require an explicit schema; binaryFile's is fixed.)"""
    schema = (
        "path string, modificationTime timestamp, length long, content binary"
    )
    return (
        spark.readStream.format("binaryFile")
        .schema(schema)
        .option("pathGlobFilter", glob)
        .load(path)
    )


def hourly_rollup(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming form of relational.events_hourly: tumbling 1-hour
    event-time windows, late data admitted up to the watermark.

    State note: the watermark lets Spark evict window state once the
    event-time frontier passes window_end + watermark — without it,
    state grows without bound."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(25,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def streaming_dedup_lines(lines: DataFrame, ts_col: str = "ts",
                          watermark: str = "1 hour") -> DataFrame:
    """Streaming A4: exact dedup with bounded state. Identity is the
    md5 of the line (matching the batch operator's exact-content
    identity, SURVEY.md §1.4); duplicates arriving within the
    watermark horizon are dropped."""
    return (
        lines.withColumn("line_hash", F.md5(F.col("value")))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["line_hash"])
    )


def session_rollup(events: DataFrame, gap: str = "30 minutes",
                   watermark: str = "2 hours") -> DataFrame:
    """Streaming sessionization: event-time SESSION windows per user —
    a session closes after ``gap`` of inactivity. The streaming form
    of events.events_sessionize; state is bounded by the
    watermark (late events beyond it are dropped, open sessions
    finalize once the watermark passes their gap)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), F.col("user_id"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(25,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def enrich_with_dim(stream: DataFrame, dim: DataFrame, on: str) -> DataFrame:
    """Stream-static enrichment: join each micro-batch against a
    (small) static dimension. The dim side is broadcast, so the
    stream never shuffles — the standard caption/metadata-lookup
    pattern (streaming analogue of J1's basename join). The static
    side is re-resolved per micro-batch, so an updated dim table is
    picked up without restarting the query."""
    return stream.join(F.broadcast(dim), on, "left")


def start_parquet_sink(df: DataFrame, out_path: str, checkpoint: str,
                       available_now: bool = True) -> DataStreamWriter:
    """Standard streaming sink: append-mode parquet with a checkpoint
    (exactly-once per micro-batch). availableNow=True drains what's
    there and stops — the bounded-backfill trigger."""
    w = (
        df.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    return w.trigger(availableNow=True) if available_now else w
