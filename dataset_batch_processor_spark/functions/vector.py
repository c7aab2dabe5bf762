"""Vector expression library for embedding similarity.

Dot products and cosine similarity over ``array<float>`` columns,
computed JVM-side with higher-order functions (zip_with + aggregate)
— no Python in the hot path. Elements are cast to double before
accumulation; accumulation is sequential in index order, which both
Spark and an index-ordered DuckDB formulation reproduce exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    sq = F.aggregate(
        a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
    )
    return F.sqrt(sq)


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
