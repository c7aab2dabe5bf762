"""Data-recipe planner: per-source token quotas and epoch counts for
a fixed training budget under a target mixture.

The budgeting step every pretraining run does before launch (public
anchors: Hoffmann et al. 2022 — pick total training tokens first;
Muennighoff et al. 2023 "Scaling Data-Constrained Language Models" —
repeating a source up to ~4 epochs is nearly as good as fresh data,
beyond that returns decay sharply; mT5/XLM-R temperature sampling as
the target mixture): given the corpus's per-source token tallies and
the alpha=1/2 temperature mixture the house already gates
(corpusstats.TEMP_MIXTURE_*, the sqrt-snap no-pow idiom), compute
for each source

    quota_tokens = budget * weight_ppm DIV 1e6   (its slice)
    epochs_ppm   = quota_tokens * 1e6 DIV n_tokens (repetition factor)
    repeat_risk  = epochs_ppm > 4e6               (the 4-epoch cliff)

with budget = EPOCH_X * total corpus tokens (the data-constrained
regime where the recipe matters — a budget under 1x would make every
row a subsample). All integer arithmetic end to end — exact gate.

Fixture convention: the synthetic corpus's 20 sources are nearly
uniform, so the natural grain never approaches the cliff — the gated
output therefore carries a second PLANTED-SKEW grain (the
chatvalidate planted-defect convention): docs resliced 72/25/3 into
head/mid/tail_rare, where temperature upsampling pushes the rare
slice past 4 epochs and the flag must fire (pinned in
tests/test_recipe.py), while head/mid stay under it.

Scale: identical to the mixture chains — one per-source aggregation
(map-side combined), a 1-row broadcast total, a sources-sized output.
Driver traffic: zero.
"""

from __future__ import annotations

EPOCH_X = 2          # budget = EPOCH_X * total corpus tokens
REPEAT_CLIFF_PPM = 4_000_000   # Muennighoff et al.: ~4 epochs

#: planted 72/25/3 reslice; disjoint CASE arms (doc_id%32=0 implies
#: doc_id%4=0, so the 'mid' arm can't shadow the rare one)
_SKEW_GRP = ("CASE WHEN doc_id % 32 = 0 THEN 'tail_rare' "
             "WHEN doc_id % 4 = 1 THEN 'mid' ELSE 'head' END")


def _recipe_sql(engine: str, grain: str = "source",
                grp: str = "source") -> str:
    from .bpe import _ppm_split

    div = "DIV" if engine == "spark" else "//"
    ntok = (
        "size(split(text, ' '))" if engine == "spark"
        else "len(string_split(text, ' '))"
    )
    # int64-safe at the documented 100-TB posture (review r12 #2):
    # quota never forms total*EPOCH_X*weight_ppm (~4e19 at 2e13
    # tokens) — it splits the budget at the ppm boundary first; the
    # epochs ratio rides bpe._ppm_split (floor(t*1e6/w) without
    # forming t*1e6). Spark with ANSI off would otherwise WRAP
    # silently while DuckDB promotes to hugeint — a production wrong
    # answer the fixture scale never exercises.
    epochs = _ppm_split("quota_tokens", "greatest(n_tokens, 1)", div)
    return f"""
WITH sized AS (
  SELECT {grp} AS source, {ntok} AS ntok FROM documents
),
tot AS (SELECT CAST(sum(ntok) AS BIGINT) AS total FROM sized),
shares AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(ntok) AS BIGINT) AS n_tokens,
         CAST((CAST(sum(ntok) AS BIGINT) * 1000000) {div} total AS BIGINT)
             AS token_ppm
  FROM sized CROSS JOIN tot
  GROUP BY source, total
),
rooted AS (
  SELECT *,
         CAST(floor(sqrt(token_ppm * 1000000) + 0.5) AS BIGINT) AS s
  FROM shares
),
norm AS (SELECT CAST(sum(s) AS BIGINT) AS z FROM rooted),
weighted AS (
  SELECT source, n_docs, n_tokens, token_ppm,
         CAST(s * 1000000 {div} z AS BIGINT) AS weight_ppm
  FROM rooted CROSS JOIN norm
),
quotas AS (
  SELECT w.source, w.n_docs, w.n_tokens, w.token_ppm, w.weight_ppm,
         CAST((t.total * {EPOCH_X} {div} 1000000) * w.weight_ppm
              + (t.total * {EPOCH_X} % 1000000) * w.weight_ppm
                {div} 1000000 AS BIGINT) AS quota_tokens
  FROM weighted w CROSS JOIN tot t
)
SELECT '{grain}' AS grain,
       source, n_docs, n_tokens, token_ppm, weight_ppm, quota_tokens,
       CAST({epochs} AS BIGINT) AS epochs_ppm,
       {epochs} > {REPEAT_CLIFF_PPM} AS repeat_risk
FROM quotas
"""


def _full_sql(engine: str) -> str:
    """Natural per-source grain UNION the planted-skew probe grain —
    two independent parenthesized chains (the SFT-card CTE-collision
    convention)."""
    return (
        f"SELECT * FROM ({_recipe_sql(engine)})\n"
        "UNION ALL\n"
        f"SELECT * FROM ("
        f"{_recipe_sql(engine, 'skew_probe', _SKEW_GRP)})"
    )


RECIPE_SPARK = _full_sql("spark")
RECIPE_DUCK = _full_sql("duck")


def _q_recipe(spark, sf_dir):
    from .. import catalog

    catalog.load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents"
    )
    return spark.sql(RECIPE_SPARK)


QUERIES = {"docs_data_recipe": _q_recipe}
ORACLES = {"docs_data_recipe": RECIPE_DUCK}
