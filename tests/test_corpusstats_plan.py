"""Long-context upsampling plan: Python replay + conservation laws."""

from __future__ import annotations

import duckdb

from dataset_batch_processor_spark.operators import corpusstats as cs

SF = "/root/testdata/sf0.001"


def _duck(sql: str):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM"
        f" read_parquet('{SF}/documents.parquet')"
    )
    out = con.execute(sql).fetchall()
    con.close()
    return out


def test_longctx_plan_matches_python_replay():
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT n_chars FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    con.close()
    buckets: dict[int, list[int]] = {}
    for (n,) in rows:
        buckets.setdefault(n.bit_length() - 1, []).append(n)
    t_all = sum(n for b in buckets.values() for n in b)
    t_long = sum(
        n for k, b in buckets.items() if k >= cs.LONGCTX_B for n in b
    )
    nat_long_ppm = t_long * 1_000_000 // t_all
    T = cs.LONGCTX_TARGET_PPM

    got = {r[0]: r[1:] for r in _duck(cs.LONGCTX_PLAN_DUCK)}
    assert set(got) == set(buckets)
    for k, members in buckets.items():
        n_docs, nat_toks, nat_ppm, target_ppm, repeat_ppm = got[k]
        assert n_docs == len(members)
        assert nat_toks == sum(members)
        assert nat_ppm == nat_toks * 1_000_000 // t_all
        if k >= cs.LONGCTX_B:
            assert target_ppm == T * nat_toks // max(t_long, 1)
            assert repeat_ppm == T * 1_000_000 // max(nat_long_ppm, 1)
        else:
            assert target_ppm == (1_000_000 - T) * nat_toks // max(
                t_all - t_long, 1
            )
            assert repeat_ppm == (1_000_000 - T) * 1_000_000 // max(
                1_000_000 - nat_long_ppm, 1
            )


def test_longctx_plan_conservation():
    rows = _duck(cs.LONGCTX_PLAN_DUCK)
    n_buckets = len(rows)
    nat = sum(r[3] for r in rows)
    tgt = sum(r[4] for r in rows)
    # ppm totals conserve up to one truncation per bucket
    assert 1_000_000 - n_buckets <= nat <= 1_000_000
    assert 1_000_000 - n_buckets <= tgt <= 1_000_000
    # the fixture upsamples long docs by >1x and downsamples short
    long_rows = [r for r in rows if r[0] >= cs.LONGCTX_B]
    short_rows = [r for r in rows if r[0] < cs.LONGCTX_B]
    assert long_rows and short_rows
    assert all(r[5] > 1_000_000 for r in long_rows)
    assert all(r[5] < 1_000_000 for r in short_rows)
    # realized token mass under the plan reproduces the budget to
    # within ppm truncation: sum(natural_tokens * repeat_ppm) ~ t_all
    t_all = sum(r[2] for r in rows)
    realized = sum(r[2] * r[5] for r in rows) // 1_000_000
    assert abs(realized - t_all) <= t_all // 1000 + n_buckets


def test_scaled_div_decomposition_is_exact():
    """_scaled_div must equal floor(t*m_hi*m_lo/w) for every input in
    the int64-safe envelope — property-checked against arbitrary-
    precision Python."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from hypothesis import assume

    @settings(max_examples=300, deadline=None)
    @given(
        # w up to 9.2e15 probes the w*m_lo and t*m_hi edges of the
        # documented envelope (9.2e18 < 2^63) instead of stopping short
        t=st.integers(min_value=0, max_value=9_200_000_000_000_000),
        m_hi=st.sampled_from([400, 600, 1000]),
        w=st.integers(min_value=1, max_value=9_200_000_000_000_000),
    )
    def check(t, m_hi, w):
        # share semantics: every call site divides a part by its whole
        assume(t <= w)
        # literals type as INT32 in DuckDB; the real queries feed
        # BIGINT columns, so the probe casts to match
        sql = cs._scaled_div(
            f"CAST({t} AS BIGINT)", m_hi, 1000,
            f"CAST({w} AS BIGINT)", "//",
        )
        got = duckdb.sql(f"SELECT {sql} AS v").fetchone()[0]
        assert got == t * m_hi * 1000 // w

    check()
