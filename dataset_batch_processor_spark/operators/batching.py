"""Length-bucketed padded-batch planner (round 13).

The FFD/ICLM packers (ffdpack.py, icp.py) serve TRAINING: documents
are concatenated into fixed token windows. Inference and evaluation
batch differently — rows are PADDED to a common length, so the
scheduler's cost model is ``rows x padded_length`` and the waste is
the padding. The standard production answer (HF ``group_by_length``,
vLLM/TGI length-bucketed admission, the classic bucketing in
seq2seq) is: bucket by power-of-two length, size each bucket's batch
as ``budget / bucket_cap``, and report the padding waste the choice
costs.

This module is that planner as one map-side-combinable aggregation:

- cap = next power of two >= n_chars, floored at MIN_CAP (padding
  granularity) — computed by BINARY DIGIT COUNT (``bin()`` /
  ``printf('%b')``), the corpusstats idiom, so there is no float
  log2 boundary risk;
- batch_size = BATCH_BUDGET DIV cap (>= 1);
- n_batches = ceil-div of the bucket's doc count;
- waste_ppm = (padded - real) / padded as an exact integer ppm via
  the ``_scaled_div`` int64-safe share division (padded counts reach
  ~1e14 at 100 TB; a naive ``*1_000_000`` would overflow BIGINT).

Scale shape: ONE narrow scan + ONE groupBy over <= ~20 cap keys —
no window, no join, no per-doc rank (the per-bucket batch indices a
runner needs are ``row_number DIV batch_size`` over the bucket, but
the PLAN needs only counts, so the corpus-sized rank pass is not
paid here). Reference parity: the reference has no batching planner;
this extends the packer family the same way K7/K10 extended sinks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .. import catalog
from .corpusstats import _scaled_div

BATCH_BUDGET = 16_384  # chars per padded batch (rows x cap <= budget)
MIN_CAP = 64           # padding granularity floor


def _plan_sql(engine: str) -> str:
    if engine == "spark":
        div = "DIV"
        bits = "length(bin(n_chars - 1))"
        shl = "shiftleft(CAST(1 AS BIGINT), {b})"
    else:
        div = "//"
        bits = "length(printf('%b', n_chars - 1))"
        shl = "CAST(1 AS BIGINT) << ({b})"
    cap = (
        f"greatest({MIN_CAP}, CASE WHEN n_chars <= 1 THEN 1 ELSE "
        + shl.format(b=f"CAST({bits} AS INT)")
        + " END)"
    )
    waste = "(CAST(count(*) AS BIGINT) * cap - sum(n_chars))"
    padded = "(CAST(count(*) AS BIGINT) * cap)"
    return f"""
WITH capped AS (
  SELECT CAST({cap} AS BIGINT) AS cap, n_chars
  FROM documents
  WHERE n_chars > 0
)
SELECT cap,
       CAST(greatest({BATCH_BUDGET} {div} cap, 1) AS INT) AS batch_size,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST((count(*) + greatest({BATCH_BUDGET} {div} cap, 1) - 1)
            {div} greatest({BATCH_BUDGET} {div} cap, 1) AS BIGINT)
           AS n_batches,
       CAST(sum(n_chars) AS BIGINT) AS real_chars,
       CAST(count(*) * cap AS BIGINT) AS padded_chars,
       CAST({_scaled_div(waste, 1000, 1000, padded, div)} AS BIGINT)
           AS waste_ppm
FROM capped
GROUP BY cap
ORDER BY cap
"""


PADDED_BATCH_SPARK = _plan_sql("spark")
PADDED_BATCH_DUCK = _plan_sql("duck")


def _q_padded_batch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    catalog.load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents"
    )
    return spark.sql(PADDED_BATCH_SPARK)


QUERIES = {"docs_padded_batch_plan": _q_padded_batch_plan}
ORACLES = {"docs_padded_batch_plan": PADDED_BATCH_DUCK}
