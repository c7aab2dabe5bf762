"""Data-recipe planner: independent Python replay of the exact
integer budgeting math, and the planted skew probe's 4-epoch cliff."""

from __future__ import annotations

import math

import duckdb

from dataset_batch_processor_spark.operators import recipe

SF = "/root/testdata/sf0.001"


def _docs():
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, source, text FROM"
        f" read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    con.close()
    return rows


def _replay(groups):
    """groups: {grp: [ntok, ...]} -> {grp: recipe row tuple}."""
    n_tok = {g: sum(v) for g, v in groups.items()}
    total = sum(n_tok.values())
    token_ppm = {g: n_tok[g] * 1_000_000 // total for g in groups}
    s = {
        g: int(math.floor(math.sqrt(token_ppm[g] * 1_000_000) + 0.5))
        for g in groups
    }
    z = sum(s.values())
    out = {}
    for g in groups:
        w = s[g] * 1_000_000 // z
        quota = total * recipe.EPOCH_X * w // 1_000_000
        epochs = quota * 1_000_000 // max(n_tok[g], 1)
        out[g] = (
            len(groups[g]), n_tok[g], token_ppm[g], w, quota, epochs,
            epochs > recipe.REPEAT_CLIFF_PPM,
        )
    return out


def test_recipe_matches_python_replay(spark):
    rows = _docs()
    by_source = {}
    by_skew = {}
    for doc_id, source, text in rows:
        ntok = len(text.split(" "))
        by_source.setdefault(source, []).append(ntok)
        grp = (
            "tail_rare" if doc_id % 32 == 0
            else "mid" if doc_id % 4 == 1 else "head"
        )
        by_skew.setdefault(grp, []).append(ntok)
    exp = {
        **{("source", g): v for g, v in _replay(by_source).items()},
        **{("skew_probe", g): v for g, v in _replay(by_skew).items()},
    }
    got = {
        (r["grain"], r["source"]): (
            r["n_docs"], r["n_tokens"], r["token_ppm"], r["weight_ppm"],
            r["quota_tokens"], r["epochs_ppm"], r["repeat_risk"],
        )
        for r in recipe._q_recipe(spark, SF).collect()
    }
    assert got == exp
    # the planted 72/25/3 reslice exercises the cliff: temperature
    # upsampling pushes ONLY the rare slice past 4 epochs
    assert got[("skew_probe", "tail_rare")][6] is True
    assert got[("skew_probe", "head")][6] is False
    assert got[("skew_probe", "mid")][6] is False
    # quotas are conserved within integer truncation: the recipe never
    # hands out more than the budget
    for grain in ("source", "skew_probe"):
        tot_tokens = sum(v[1] for (g, _s), v in exp.items() if g == grain)
        quota_sum = sum(v[4] for (g, _s), v in exp.items() if g == grain)
        assert quota_sum <= recipe.EPOCH_X * tot_tokens
