"""Deterministic HLL sketch: Python replay, both estimator branches,
register-merge associativity, accuracy band."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from dataset_batch_processor_spark import catalog
from dataset_batch_processor_spark.operators import hll

SF = "/root/testdata/sf0.001"


def _vals(docs):
    out = []
    for doc_id, text, source in docs:
        for t in text.split(" "):
            if t:
                out.append((source, "token", t))
        if len(text) >= hll.SHINGLE_W:
            for p in range(0, len(text) - hll.SHINGLE_W + 1, 4):
                out.append((source, "shingle", text[p:p + hll.SHINGLE_W]))
    return out


def _py_hll(values) -> dict:
    """(source, grain) -> (n_exact, estimate) via the module's exact
    integer recipe."""
    regs: dict = {}
    exact: dict = {}
    for source, grain, v in values:
        key = (source, grain)
        exact.setdefault(key, set()).add(v)
        h = int(hashlib.md5(v.encode()).hexdigest()[:15], 16)
        reg = h % hll.HLL_M
        w = h // hll.HLL_M
        rho = hll.RHO_CAP if w == 0 else (w & -w).bit_length()
        r = regs.setdefault(key, {})
        r[reg] = max(r.get(reg, 0), rho)
    out = {}
    for key, r in regs.items():
        sum_inv = sum(
            hll.INV_SCALE // (1 << r[j]) if j in r else hll.INV_SCALE
            for j in range(hll.HLL_M)
        )
        raw = hll.HLL_M * hll.HLL_M * hll.INV_SCALE // max(sum_inv, 1)
        est = (raw // 1_000_000) * hll.ALPHA_PPM + (
            (raw % 1_000_000) * hll.ALPHA_PPM
        ) // 1_000_000
        n_zero = hll.HLL_M - len(r)
        if est <= 5 * hll.HLL_M // 2 and n_zero > 0:
            ln_ppm = round(math.log(hll.HLL_M / n_zero) * 1_000_000)
            est = hll.HLL_M * ln_ppm // 1_000_000
        out[key] = (len(exact[key]), est)
    return out


def test_hll_python_replay(spark):
    docs = [
        (r.doc_id, r.text, r.source)
        for r in catalog.load_table(spark, SF, "documents")
        .select("doc_id", "text", "source")
        .collect()
    ]
    expect = _py_hll(_vals(docs))
    got = {
        (r.source, r.grain): (r.n_exact, r.hll_estimate)
        for r in hll._q_hll_distinct_tokens(spark, SF).collect()
    }
    assert got == expect
    # both branches exercised on the fixture
    grains = {g for (_s, g) in got}
    assert grains == {"token", "shingle"}


def test_hll_register_merge_associative(spark):
    """max-merge of per-shard register tables == the one-pass table."""
    docs = catalog.load_table(spark, SF, "documents").select(
        "doc_id", "text", "source"
    )
    full = {
        (r.source, r.grain, r.reg): r.m_j
        for r in hll.hll_partial(docs).collect()
    }
    merged: dict = {}
    for part in range(3):
        shard = hll.hll_partial(docs.filter(F.col("doc_id") % 3 == part))
        for r in shard.collect():
            k = (r.source, r.grain, r.reg)
            merged[k] = max(merged.get(k, 0), r.m_j)
    assert merged == full


def test_hll_accuracy_band(spark):
    """The shingle grain (raw-HLL branch) lands inside a generous
    4/sqrt(m) relative-error band on the fixture."""
    rows = hll._q_hll_distinct_tokens(spark, SF).collect()
    band = 4.0 / math.sqrt(hll.HLL_M)
    for r in rows:
        if r.grain == "shingle" and r.n_exact >= 5 * hll.HLL_M // 2:
            assert abs(r.err_ppm) <= band * 1_000_000, r
