"""Round-13 query family replays + plan pins.

Each gated query gets an independent plain-Python reimplementation
checked against the Spark result (the house replay rule), plus a
plan-shape pin where the query has joins/windows."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from dataset_batch_processor_spark import catalog
from dataset_batch_processor_spark.operators import (
    batching,
    corpusstats,
    decontam,
    dedup,
    rlvr,
)


def _docs(spark, sf_dir):
    return {
        r.doc_id: (r.text, r.source, r.n_chars)
        for r in catalog.load_table(spark, sf_dir, "documents")
        .select("doc_id", "text", "source", "n_chars")
        .collect()
    }


# ------------------------------------------------- padded batch plan


def test_padded_batch_plan_replay(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    buckets: dict[int, list[int]] = {}
    for _id, (_t, _s, n) in docs.items():
        if n <= 0:
            continue
        cap = max(batching.MIN_CAP,
                  1 if n <= 1 else 1 << (n - 1).bit_length())
        buckets.setdefault(cap, []).append(n)
    expect = {}
    for cap, lens in buckets.items():
        bs = max(batching.BATCH_BUDGET // cap, 1)
        n_docs = len(lens)
        real = sum(lens)
        padded = n_docs * cap
        expect[cap] = (
            bs,
            n_docs,
            (n_docs + bs - 1) // bs,
            real,
            padded,
            (padded - real) * 1_000_000 // padded,
        )
    got = {
        r.cap: (r.batch_size, r.n_docs, r.n_batches, r.real_chars,
                r.padded_chars, r.waste_ppm)
        for r in batching._q_padded_batch_plan(spark, sf_dir).collect()
    }
    assert got == expect
    for cap, (_bs, _nd, _nb, real, padded, waste) in expect.items():
        assert 0 <= waste < 1_000_000 and padded >= real


# --------------------------------------------------- fuzzy decontam


def _shingles(text: str) -> set:
    w, s = dedup.SHINGLE_W, dedup.SHINGLE_STRIDE
    if len(text) < w:
        return set()
    return {text[p:p + w] for p in range(0, len(text) - w + 1, s)}


def _mh(shingles: set) -> list:
    hs = [int(hashlib.md5(x.encode()).hexdigest()[:7], 16)
          for x in shingles]
    return [
        min((a * h + b) % dedup.MERSENNE_P for h in hs)
        for a, b in dedup.PERMS
    ]


def _bands(sig: list) -> set:
    out = set()
    for band in range(dedup.N_BANDS):
        vals = sig[band * dedup.BAND_ROWS:(band + 1) * dedup.BAND_ROWS]
        key = ",".join([str(band)] + [str(v) for v in vals])
        out.add((band, hashlib.md5(key.encode()).hexdigest()))
    return out


def test_fuzzy_decontam_replay(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    sh = {d: _shingles(t) for d, (t, _s, _n) in docs.items()}
    bands = {d: _bands(_mh(s)) for d, s in sh.items() if s}
    # mirror the engine-side hot-bucket cap (applied on the FULL
    # bands table, before the eval/train split) — r13 ADVICE parity
    members: dict = {}
    for d, bs in bands.items():
        for b in bs:
            members.setdefault(b, set()).add(d)
    hot = {b for b, m in members.items()
           if len(m) > decontam.FUZZY_BUCKET_CAP}
    bands = {d: bs - hot for d, bs in bands.items()}
    ev = {d for d in bands if d % decontam.EVAL_MOD == 0}
    tr = {d for d in bands if d % decontam.EVAL_MOD != 0}
    expect = {}
    for t in tr:
        for e in ev:
            if not (bands[t] & bands[e]):
                continue
            inter = len(sh[t] & sh[e])
            if inter == 0:
                continue
            cont = inter * 1_000_000 // len(sh[e])
            expect[(t, e)] = (inter, len(sh[e]), cont,
                              1 if cont >= 500_000 else 0)
    got = {
        (r.doc_id, r.eval_doc_id): (r.n_inter, r.n_eval_shingles,
                                    r.containment_ppm, r.flagged)
        for r in decontam._q_fuzzy_decontam(spark, sf_dir).collect()
    }
    assert got == expect
    assert any(v[3] == 1 for v in got.values()) or len(got) == 0


def test_fuzzy_decontam_cap_drops_hot_bucket_and_none_restores(spark):
    """The hot-bucket cap must actually drop candidates when a bucket
    exceeds it (identical docs collide in every band), and cap=None
    must restore full recall — the governance escape hatch."""
    import pandas as pd

    text = "identical boilerplate text repeated across many documents!"
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": list(range(6)),
                "text": [text] * 6,
                "lang": ["en"] * 6,
                "source": ["s"] * 6,
            }
        )
    )
    capped = decontam.fuzzy_decontam_df(docs, cap=5).collect()
    assert capped == []  # every bucket holds all 6 docs -> dropped
    full = decontam.fuzzy_decontam_df(docs, cap=None).collect()
    # doc 0 is the eval doc (0 % EVAL_MOD == 0); all 5 train docs
    # fully contain it
    assert {(r.doc_id, r.eval_doc_id) for r in full} == {
        (d, 0) for d in range(1, 6)
    }
    assert all(
        r.containment_ppm == 1_000_000 and r.flagged == 1 for r in full
    )


def test_fuzzy_decontam_plan_broadcasts_eval_side(spark, sf_dir):
    plan = (
        decontam._q_fuzzy_decontam(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ------------------------------------------------- rollout diversity


def test_rollout_diversity_replay(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    expect = {}
    for d, (t, _s, _n) in docs.items():
        bigrams = []
        for r in range(rlvr.N_ROLLOUTS):
            hr = int(
                hashlib.md5(f"{d}:v{r}".encode()).hexdigest()[:7], 16
            )
            start = hr % max(len(t) - (rlvr.RESP_CHARS - 1), 1)
            resp = t[start:start + rlvr.RESP_CHARS]
            toks = [x for x in resp.split(" ") if x]
            bigrams += [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        if bigrams:
            expect[d] = (
                len(bigrams),
                len(set(bigrams)),
                len(set(bigrams)) * 1_000_000 // len(bigrams),
            )
    got = {
        r.doc_id: (r.n_bigrams, r.n_distinct_bigrams, r.diversity_ppm)
        for r in rlvr.QUERIES["docs_rollout_diversity"](
            spark, sf_dir
        ).collect()
    }
    assert got == expect


# ------------------------------------------- source length outliers


def test_source_length_outliers_replay(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    by_src: dict[str, list[int]] = {}
    for _d, (_t, s, n) in docs.items():
        by_src.setdefault(s, []).append(n)

    def lower_median(vals: list) -> int:
        vals = sorted(vals)
        return vals[(len(vals) + 1) // 2 - 1]

    expect = {}
    for s, lens in by_src.items():
        med = lower_median(lens)
        mad = lower_median([abs(x - med) for x in lens])
        out = sum(1 for x in lens if abs(x - med) > 5 * mad)
        expect[s] = (len(lens), med, mad, out)
    got = {
        r.source: (r.n_docs, r.median_chars, r.mad_chars, r.n_outliers)
        for r in corpusstats._q_source_length_outliers(
            spark, sf_dir
        ).collect()
    }
    assert got == expect


# --------------------------------------------- mixture interleave


def test_mixture_interleave_replay_and_fairness(spark, sf_dir):
    from dataset_batch_processor_spark.operators import curation

    docs = _docs(spark, sf_dir)
    draws = {
        d: int(hashlib.md5(f"{d}:mix".encode()).hexdigest()[:15], 16)
        for d in docs
    }
    by_src: dict[str, list[int]] = {}
    for d, (_t, s, _n) in docs.items():
        by_src.setdefault(s, []).append(d)
    n_tot = len(docs)
    keyed = []
    share = {}
    for s, ds in by_src.items():
        share[s] = max(len(ds) * 1_000_000 // n_tot, 1)
        for r, d in enumerate(
            sorted(ds, key=lambda x: (draws[x], x)), start=1
        ):
            keyed.append((r * 1_000_000 // share[s], s, r, d))
    keyed.sort()
    expect = {
        pos: (d, s, r, k)
        for pos, (k, s, r, d) in enumerate(keyed, start=1)
    }
    got = {
        r.serve_pos: (r.doc_id, r.source, r.src_rank, r.k)
        for r in curation._q_mixture_interleave(spark, sf_dir).collect()
    }
    assert got == expect
    # fairness: every prefix holds each source near its share
    seen: dict[str, int] = {}
    worst = 0.0
    for pos in range(1, len(expect) + 1):
        _d, s, _r, _k = expect[pos]
        seen[s] = seen.get(s, 0) + 1
        for src, cnt in seen.items():
            ideal = pos * share[src] / 1_000_000
            worst = max(worst, abs(cnt - ideal))
    assert worst <= len(by_src) + 1, worst


# --------------------------------------------- IVF cluster card


def test_ivf_cluster_card_replay(spark, sf_dir):
    import numpy as np

    from dataset_batch_processor_spark.operators import similarity

    emb, ids, Cn = similarity._trained_index(spark, sf_dir)
    vecs = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in emb.select("vec_id", "embedding").collect()
    }
    C_fx = np.rint(Cn * 1000000.0).astype(np.int64)
    Sc = np.sum(C_fx * C_fx, axis=1)
    agg: dict[int, list] = {}
    for vid, v in vecs.items():
        v_fx = np.floor(v * 1000000.0 + 0.5).astype(np.int64)
        s = int(np.sum(v_fx * v_fx))
        cos = np.floor(
            (v_fx @ C_fx.T).astype(np.float64)
            / (math.sqrt(s) * np.sqrt(Sc.astype(np.float64)))
            * 1000000.0 + 0.5
        ).astype(np.int64)
        j = int(np.argmax(cos))  # ties -> first (lowest cid)
        cid = int(ids[j])
        a = agg.setdefault(cid, [0, None, None, 0])
        a[0] += 1
        a[1] = vid if a[1] is None else min(a[1], vid)
        a[2] = vid if a[2] is None else max(a[2], vid)
        a[3] += int(cos[j])
    expect = {
        cid: (n, lo, hi, s // n) for cid, (n, lo, hi, s) in agg.items()
    }
    got = {
        r.centroid_id: (r.n_vecs, r.min_vec_id, r.max_vec_id,
                        r.mean_cos_fx)
        for r in similarity._q_ivf_cluster_card(spark, sf_dir).collect()
    }
    assert got == expect
