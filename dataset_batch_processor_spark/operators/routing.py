"""Routing filters — SURVEY.md §2.4 (F2-F4) + crop report (K6) + auto-crop (P2/P3).

The reference *moves files between folders* to route them
(/root/reference/modules/filter_crop.py:27-67). Spark data is
immutable, so routing is a derived ``route`` column; a routed write
is ``partitionBy("route")`` — one scan, no mutation, and at scale the
two routes are complementary partitions of one dataset rather than
two filesystem states.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import scalar

ROUTE_OK = "ok"
ROUTE_INCOMPATIBLE = "incompatible"


def route_images(
    images: DataFrame,
    tile_size: int = 1024,
    overlap_ratio: float = 0.5,
) -> DataFrame:
    """F2 ∨ F3 → two-way routing split (F4), with the K6 recommended-crop
    report columns on every row.

    The reference writes a .txt report only for moved (incompatible)
    images (filter_crop.py:15-25); here rec_w/rec_h are computed for
    all rows (they equal width/height for too-small images by P2) and
    the report exporter filters on route.
    """
    scalar.validate_overlap(overlap_ratio)
    w, h = F.col("width"), F.col("height")
    step = scalar.step_size(tile_size, overlap_ratio)
    incompatible = scalar.too_small(w, h, tile_size) | scalar.not_tileable(
        w, h, tile_size, step
    )
    rec_w, rec_h = scalar.recommended_crop(w, h, tile_size, step)
    return images.select(
        "image_id",
        "basename",
        "ext",
        "width",
        "height",
        F.when(incompatible, F.lit(ROUTE_INCOMPATIBLE))
        .otherwise(F.lit(ROUTE_OK))
        .alias("route"),
        rec_w.alias("rec_w"),
        rec_h.alias("rec_h"),
    )


def route_images_sql(images_cte: str, tile_size: int, overlap_ratio: float) -> str:
    step = int(tile_size - int(overlap_ratio * tile_size))
    return f"""
WITH {images_cte}
SELECT image_id, basename, ext, width, height,
       CASE WHEN (width < {tile_size} OR height < {tile_size})
              OR ((width - {tile_size}) % {step}) <> 0
              OR ((height - {tile_size}) % {step}) <> 0
            THEN 'incompatible' ELSE 'ok' END AS route,
       CASE WHEN width < {tile_size} OR height < {tile_size} THEN width
            ELSE CAST(least(floor((width - {tile_size}) / {step}) * {step}
                 + {tile_size}, width) AS INT) END AS rec_w,
       CASE WHEN width < {tile_size} OR height < {tile_size} THEN height
            ELSE CAST(least(floor((height - {tile_size}) / {step}) * {step}
                 + {tile_size}, height) AS INT) END AS rec_h
FROM images_meta
"""


def route_counts(routed: DataFrame) -> DataFrame:
    """A1 run counters: moved_count / kept_count as groupBy(route).count()
    (the reference's imperative counters at filter_crop.py:33,52,61,67)."""
    return routed.groupBy("route").agg(F.count("*").alias("n_images"))


def auto_crop(routed: DataFrame, tile_size: int = 1024, overlap_ratio: float = 0.5) -> DataFrame:
    """Auto-crop stage (/root/reference/modules/filter_crop.py:69-103):
    center-crop every *incompatible* image to its recommended dims
    (P2 + P3). Geometry only — pixel crop happens in the multimodal
    layer. Images already compatible are not re-cropped (the reference
    scans only the incompatible folder).

    The reference pipeline is stateful across two button clicks via
    the filesystem (SURVEY.md §3.2); here it is one DataFrame chain.
    """
    inc = routed.filter(F.col("route") == ROUTE_INCOMPATIBLE)
    w, h = F.col("width"), F.col("height")
    new_w, new_h = F.col("rec_w"), F.col("rec_h")
    left, top, right, bottom = scalar.center_crop_box(w, h, new_w, new_h)
    return inc.select(
        "image_id",
        "basename",
        "width",
        "height",
        new_w.alias("new_w"),
        new_h.alias("new_h"),
        left.alias("crop_left"),
        top.alias("crop_top"),
        right.alias("crop_right"),
        bottom.alias("crop_bottom"),
    )


def auto_crop_sql(images_cte: str, tile_size: int, overlap_ratio: float) -> str:
    step = int(tile_size - int(overlap_ratio * tile_size))
    return f"""
WITH {images_cte},
routed AS (
  SELECT *,
       CASE WHEN (width < {tile_size} OR height < {tile_size})
              OR ((width - {tile_size}) % {step}) <> 0
              OR ((height - {tile_size}) % {step}) <> 0
            THEN 'incompatible' ELSE 'ok' END AS route,
       CASE WHEN width < {tile_size} OR height < {tile_size} THEN width
            ELSE CAST(least(floor((width - {tile_size}) / {step}) * {step}
                 + {tile_size}, width) AS INT) END AS rec_w,
       CASE WHEN width < {tile_size} OR height < {tile_size} THEN height
            ELSE CAST(least(floor((height - {tile_size}) / {step}) * {step}
                 + {tile_size}, height) AS INT) END AS rec_h
  FROM images_meta
)
SELECT image_id, basename, width, height,
       rec_w AS new_w, rec_h AS new_h,
       CAST(floor((width - rec_w) / 2) AS INT)  AS crop_left,
       CAST(floor((height - rec_h) / 2) AS INT) AS crop_top,
       CAST(floor((width - rec_w) / 2) + rec_w AS INT)  AS crop_right,
       CAST(floor((height - rec_h) / 2) + rec_h AS INT) AS crop_bottom
FROM routed WHERE route = 'incompatible'
"""
