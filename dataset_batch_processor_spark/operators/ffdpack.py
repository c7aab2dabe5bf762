"""First-fit-decreasing sequence packing over length-bucketed docs.

VERDICT r11 next #2: the packing fill-rate report (chat.py:971) was
built to decide "whether a smarter packer (FFD) would pay for
itself", but no FFD packer existed to compare against. This module
gates one: classic first-fit-decreasing bin packing (Johnson 1973,
11/9-OPT guarantee) of WHOLE documents into ``SEQ_BUDGET``-token
training sequences — the non-straddling layout an SFT trainer wants
when cross-document attention contamination matters — plus a
three-way fill-rate comparison (ffd vs the gated contiguous
concat-and-split packer vs the unpacked pad-to-budget baseline) so
the utilization delta is a committed number.

Why FFD is exactly computable at 100 TB: docs are first padded up to
``FFD_GRAN``-token length buckets (standard length-bucketed batching),
so there are at most ``SEQ_BUDGET / FFD_GRAN`` = 16 distinct item
sizes. FFD processes sizes in decreasing order, and for a batch of
IDENTICAL items first-fit hammers one bin until its remaining
capacity drops below the item size before touching the next, so the
whole trajectory is computable from the 16-row length HISTOGRAM —
never the corpus — over a run-list state: bins in creation order
collapse to runs of equal remaining capacity, each round consumes
eligible runs front-to-back in closed form and splits at most one
run, so the state stays under ``4 * rounds + 2`` runs. The driver
trajectory (the DoReMi/BT/BPE k-row pattern) emits rank->bin
SEGMENTS: item with rank r (by doc_id) inside its length class maps
to ``first_id + (r - lo) DIV cap``. Segments are O(rounds * runs)
(< 1k rows at any corpus size), broadcast-joined against the ranked
corpus, and ranks come from the W1 scalable prefix sum — so the
corpus-sized side never funnels through a single task and the only
driver traffic is the 16-row histogram.

The DuckDB oracle unrolls the same 16 rounds as a fixed MATERIALIZED
CTE chain (the BPE/BT unrolled-trajectory shape) and ranks docs with
the plain one-level ``row_number() OVER (PARTITION BY blen)``
spelling, so the hash gate proves the distributed prefix-sum ranking
and the Python trajectory reproduce the textbook sequential FFD.

Reference parity: the reference has no packer; this extends its
"units of training data" posture (tiling.py's grid explode) to the
token-budget dimension. All arithmetic is integer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog
from .chat import (
    CHAT_DOC_LENS_SPARK,
    SEQ_BUDGET,
    _DOC_LENS_TAIL,
    _TOKS_DUCK,
    _TURNS_DUCK,
    _pack_duck,
)

FFD_GRAN = 16  # length-bucket granularity, tokens


def ffd_segments(
    hist: dict[int, int], budget: int = SEQ_BUDGET, gran: int = FFD_GRAN,
) -> tuple[list[tuple[int, int, int, int, int]], int]:
    """Exact FFD trajectory over a bucket-length histogram.

    ``hist`` maps bucket length (multiple of ``gran``, <= ``budget``)
    to item count. Returns ``(segments, n_bins)`` where each segment
    ``(blen, lo, hi, first_id, cap)`` assigns the items of class
    ``blen`` with class-local rank r in [lo, hi) to bin
    ``first_id + (r - lo) // cap``. Bin ids are 1-based in creation
    order — exactly the ids sequential first-fit-decreasing would
    assign (tests/test_ffdpack.py proves this against a per-item
    brute-force FFD under hypothesis).

    State: ``runs`` = [(first_id, rem, nb)] — maximal groups of
    consecutively-created bins sharing remaining capacity ``rem``;
    ids inside a run are contiguous, so splits preserve contiguity.
    """
    runs: list[tuple[int, int, int]] = []
    total_bins = 0
    segs: list[tuple[int, int, int, int, int]] = []
    for L in range(budget, 0, -gran):
        n = hist.get(L, 0)
        new_runs: list[tuple[int, int, int]] = []
        absorbed = 0
        for fid, rem, nb in runs:
            if rem >= L and absorbed < n:
                cap = rem // L
                asg = min(n - absorbed, nb * cap)
                segs.append((L, absorbed, absorbed + asg, fid, cap))
                absorbed += asg
                fb, pr = divmod(asg, cap)
                if fb:
                    new_runs.append((fid, rem % L, fb))
                if pr:
                    new_runs.append((fid + fb, rem - pr * L, 1))
                rest = nb - fb - (1 if pr else 0)
                if rest:
                    new_runs.append((fid + fb + (1 if pr else 0), rem, rest))
            else:
                new_runs.append((fid, rem, nb))
        if absorbed < n:  # open new bins, each filled to budget//L
            leftover = n - absorbed
            capb = budget // L
            nf, prr = divmod(leftover, capb)
            segs.append((L, absorbed, n, total_bins + 1, capb))
            if nf:
                new_runs.append((total_bins + 1, budget % L, nf))
            if prr:
                new_runs.append((total_bins + 1 + nf, budget - prr * L, 1))
            total_bins += nf + (1 if prr else 0)
        runs = new_runs
        assert len(runs) <= 4 * (budget // gran) + 2  # run-list bound
    return segs, total_bins


def _blen_expr(div: str) -> str:
    g, b = FFD_GRAN, SEQ_BUDGET
    return f"least(((doc_len + {g - 1}) {div} {g}) * {g}, {b})"


# ------------------------------------------------ Spark (distributed)


def _q_ffd_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .chat import run_with_mat_turns

    # turns chain from the session-materialized table (round 15)
    return ffd_assign(
        spark, lens=run_with_mat_turns(spark, sf_dir, CHAT_DOC_LENS_SPARK)
    )


def ffd_assign(spark: SparkSession, lens: DataFrame | None = None) -> DataFrame:
    """(doc_id, blen, bin_id): whole-doc FFD assignment over the
    CURRENT ``documents`` view (the datacard view seam — the scale
    study fans the view out without reloading the parquet). The
    corpus side is a prefix-sum rank + a broadcast segment join; the
    only collect is the <=16-row length histogram. Callers that
    already derived the (doc_id, doc_len) table pass it via ``lens``
    so the tokenize chain is paid once (review r12 #6)."""
    from .textops import exclusive_prefix_sum

    if lens is None:
        lens = spark.sql(CHAT_DOC_LENS_SPARK)
    blens = lens.select(
        "doc_id", F.expr(_blen_expr("DIV")).cast("bigint").alias("blen")
    )
    hist = {
        int(r["blen"]): int(r["n"])
        for r in blens.groupBy("blen").agg(
            F.count("*").alias("n")
        ).collect()  # <= 16 rows: one per length bucket, never corpus-sized
    }
    if not hist:  # empty corpus: empty assignment, not a VALUES parse
        return spark.createDataFrame(
            [], "doc_id BIGINT, blen BIGINT, bin_id BIGINT"
        )
    segs, _ = ffd_segments(hist)
    # shift segments into GLOBAL (blen ASC, doc_id ASC) rank space so
    # the Spark side needs no per-class window at all
    off = {}
    acc = 0
    for b in sorted(hist):
        off[b] = acc
        acc += hist[b]
    rows = ",".join(
        f"({blen},{off[blen] + lo},{off[blen] + hi},{fid},{cap})"
        for blen, lo, hi, fid, cap in segs
    )
    ranked = exclusive_prefix_sum(
        blens.withColumn("_one", F.lit(1)), ["blen", "doc_id"], "_one", "_g"
    )
    ranked.createOrReplaceTempView("ffd_ranked")
    return spark.sql(f"""
WITH segs AS (
  SELECT * FROM VALUES {rows} AS t(blen, glo, ghi, first_id, cap)
)
SELECT d.doc_id, CAST(d.blen AS BIGINT) AS blen,
       CAST(s.first_id + (d._g - s.glo) DIV s.cap AS BIGINT) AS bin_id
FROM ffd_ranked d
JOIN segs s ON d.blen = s.blen AND d._g >= s.glo AND d._g < s.ghi
""")


# --------------------------------------------- DuckDB unrolled oracle


def _round_sql(t: int, L: int, prev: str) -> str:
    """One FFD round: consume eligible runs front-to-back in closed
    form, split at most one, append new bins. All literals (L, caps)
    are baked at generation time; only ``nl`` (this length's item
    count) comes from the histogram."""
    p = f"{t:02d}"
    b = SEQ_BUDGET
    capb = b // L
    return f"""r{p}n AS MATERIALIZED (
  SELECT CAST(coalesce((SELECT n FROM lhist WHERE blen = {L}), 0)
              AS BIGINT) AS nl),
r{p}e AS MATERIALIZED (
  SELECT pos, fid, rem, nb, rem // {L} AS cap,
         CAST(sum(nb * (rem // {L})) OVER (ORDER BY pos) AS BIGINT) AS cum
  FROM {prev} WHERE rem >= {L}),
r{p}a AS MATERIALIZED (
  SELECT e.pos, e.fid, e.rem, e.nb, e.cap,
         least(n.nl, e.cum - e.nb * e.cap) AS lo,
         least(greatest(n.nl - (e.cum - e.nb * e.cap), 0),
               e.nb * e.cap) AS asg
  FROM r{p}e e, r{p}n n),
r{p}t AS MATERIALIZED (
  SELECT CAST(coalesce((SELECT sum(nb) FROM {prev}), 0) AS BIGINT) AS tb,
         CAST(coalesce((SELECT max(cum) FROM r{p}e), 0) AS BIGINT) AS capsum),
r{p}s AS MATERIALIZED (
  SELECT CAST({L} AS BIGINT) AS blen, lo, lo + asg AS hi,
         fid AS first_id, CAST(cap AS BIGINT) AS cap
  FROM r{p}a WHERE asg > 0
  UNION ALL
  SELECT CAST({L} AS BIGINT), t.capsum, n.nl, t.tb + 1,
         CAST({capb} AS BIGINT)
  FROM r{p}n n, r{p}t t WHERE n.nl > t.capsum),
runs_{p} AS MATERIALIZED (
  SELECT CAST(row_number() OVER (ORDER BY pos, pc) AS BIGINT) AS pos,
         CAST(fid AS BIGINT) AS fid, CAST(rem AS BIGINT) AS rem,
         CAST(nb AS BIGINT) AS nb
  FROM (
    SELECT pos, 0 AS pc, fid, rem % {L} AS rem, asg // cap AS nb FROM r{p}a
    UNION ALL
    SELECT pos, 1, fid + asg // cap, rem - (asg % cap) * {L},
           CASE WHEN asg % cap > 0 THEN 1 ELSE 0 END FROM r{p}a
    UNION ALL
    SELECT pos, 2,
           fid + asg // cap + CASE WHEN asg % cap > 0 THEN 1 ELSE 0 END,
           rem, nb - asg // cap - CASE WHEN asg % cap > 0 THEN 1 ELSE 0 END
    FROM r{p}a
    UNION ALL
    SELECT pos, 0, fid, rem, nb FROM {prev} WHERE rem < {L}
    UNION ALL
    SELECT CAST(1000000 AS BIGINT), 0, t.tb + 1, CAST({b % L} AS BIGINT),
           greatest(n.nl - t.capsum, 0) // {capb}
    FROM r{p}n n, r{p}t t
    UNION ALL
    SELECT CAST(1000000 AS BIGINT), 1,
           t.tb + 1 + greatest(n.nl - t.capsum, 0) // {capb},
           CAST({b} AS BIGINT) - (greatest(n.nl - t.capsum, 0) % {capb}) * {L},
           CASE WHEN greatest(n.nl - t.capsum, 0) % {capb} > 0
                THEN 1 ELSE 0 END
    FROM r{p}n n, r{p}t t
  ) WHERE nb > 0)"""


def _ffd_duck_body() -> str:
    """doc_blens + lhist + the 16 unrolled rounds + segs; callers add
    the doc_lens source chain and a final SELECT."""
    rounds = list(range(SEQ_BUDGET, 0, -FFD_GRAN))
    parts = [
        f"""doc_blens AS MATERIALIZED (
  SELECT doc_id, CAST({_blen_expr('//')} AS BIGINT) AS blen
  FROM doc_lens),
lhist AS MATERIALIZED (
  SELECT blen, CAST(count(*) AS BIGINT) AS n FROM doc_blens GROUP BY blen),
runs_00(pos, fid, rem, nb) AS MATERIALIZED (
  SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT),
         CAST(0 AS BIGINT) WHERE 1 = 0)"""
    ]
    prev = "runs_00"
    for t, L in enumerate(rounds, 1):
        parts.append(_round_sql(t, L, prev))
        prev = f"runs_{t:02d}"
    union = "\n  UNION ALL\n  ".join(
        f"SELECT * FROM r{t:02d}s" for t in range(1, len(rounds) + 1)
    )
    parts.append(f"segs AS MATERIALIZED (\n  {union})")
    return ",\n".join(parts)


FFD_PACK_DUCK = f"""WITH {_TOKS_DUCK},
{_TURNS_DUCK},
doc_lens AS MATERIALIZED ({_DOC_LENS_TAIL}),
{_ffd_duck_body()},
ranked AS (
  SELECT doc_id, blen,
         CAST(row_number() OVER (PARTITION BY blen ORDER BY doc_id) - 1
              AS BIGINT) AS r
  FROM doc_blens)
SELECT d.doc_id, CAST(d.blen AS BIGINT) AS blen,
       CAST(s.first_id + (d.r - s.lo) // s.cap AS BIGINT) AS bin_id
FROM ranked d
JOIN segs s ON d.blen = s.blen AND d.r >= s.lo AND d.r < s.hi
"""


# ------------------------------------------------ fill-rate comparison
# Utilization measured in REAL content tokens per sequence (padding
# waste counts against ffd and padded alike); docs longer than the
# budget count their truncated ``least(doc_len, B)`` tokens in every
# packer, so all three rows total identically except the contiguous
# packer, which straddles instead of truncating.

_FILL_CMP_TAIL = f"""
, ffd_bins AS (
  SELECT a.bin_id,
         CAST(sum(least(l.doc_len, {SEQ_BUDGET})) AS BIGINT) AS tokens_used
  FROM ffd_asgn a JOIN {{dl}} l ON a.doc_id = l.doc_id
  GROUP BY a.bin_id
),
unioned AS (
  SELECT 'ffd' AS packer, tokens_used FROM ffd_bins
  UNION ALL
  SELECT 'padded', CAST(least(doc_len, {SEQ_BUDGET}) AS BIGINT)
  FROM {{dl}}
  UNION ALL
  SELECT 'contiguous', CAST(tokens_used AS BIGINT) FROM {{ps}}
)
SELECT packer,
       CAST(tokens_used * 10 {{div}} {SEQ_BUDGET} AS INT) AS fill_decile,
       CAST(count(*) AS BIGINT) AS n_seqs,
       CAST(min(tokens_used) AS BIGINT) AS min_tokens,
       CAST(max(tokens_used) AS BIGINT) AS max_tokens,
       CAST(sum(tokens_used) AS BIGINT) AS tokens
FROM unioned GROUP BY 1, 2
"""


def _q_ffd_fill_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .chat import _q_chat_pack_sequences

    catalog.load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents"
    )
    # one tokenize pass serves the assignment AND the report's real
    # token sums (review r12 #6: three independently registered views
    # each re-derived the toks->turns->doc_lens chain); the turns
    # chain itself comes from the session-materialized table (r15)
    from .chat import run_with_mat_turns

    lens = run_with_mat_turns(
        spark, sf_dir, CHAT_DOC_LENS_SPARK
    ).localCheckpoint()
    ffd_assign(spark, lens).createOrReplaceTempView("ffd_asgn")
    lens.createOrReplaceTempView("doc_lens")
    _q_chat_pack_sequences(spark, sf_dir).createOrReplaceTempView(
        "packed_seqs"
    )
    return spark.sql(
        "WITH _x AS (SELECT 1)"
        + _FILL_CMP_TAIL.format(div="DIV", dl="doc_lens", ps="packed_seqs")
    )


# Multi-family oracle: each family's full WITH chain rides inside a
# parenthesized subquery (the SFT-card CTE-collision convention). The
# OUTER names must not collide with any name the nested chains define
# internally (doc_lens/packed_seqs live inside both subqueries;
# DuckDB's nested-WITH name resolution trips a recursive-CTE internal
# error on the collision), hence dl_cmp/ps_cmp.
FFD_FILL_DUCK = f"""WITH
ffd_asgn AS MATERIALIZED ({FFD_PACK_DUCK}),
dl_cmp AS MATERIALIZED (
  WITH {_TOKS_DUCK},
  {_TURNS_DUCK}
  {_DOC_LENS_TAIL}),
ps_cmp AS MATERIALIZED ({_pack_duck()})
SELECT * FROM (
  WITH _x AS (SELECT 1)
  {_FILL_CMP_TAIL.format(div='//', dl='dl_cmp', ps='ps_cmp')}
)
"""


QUERIES = {
    "docs_ffd_pack_sequences": _q_ffd_pack,
    "docs_ffd_fill_report": _q_ffd_fill_report,
}
ORACLES = {
    "docs_ffd_pack_sequences": FFD_PACK_DUCK,
    "docs_ffd_fill_report": FFD_FILL_DUCK,
}
