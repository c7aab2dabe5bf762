"""FFD packer: the histogram-trajectory must BE textbook sequential
first-fit-decreasing (hypothesis, vs a per-item brute force), the
distributed assignment must respect capacity and cover every doc, and
the committed fill-report deltas (VERDICT r11 next #2) are pinned."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from dataset_batch_processor_spark.operators import ffdpack
from dataset_batch_processor_spark.operators.chat import SEQ_BUDGET

SF = "/root/testdata/sf0.001"


def brute_ffd(items: list[int], budget: int = SEQ_BUDGET):
    """Per-item first-fit over bins in creation order — the textbook
    algorithm the trajectory claims to reproduce from the histogram."""
    bins: list[int] = []
    out: list[int] = []
    for length in items:
        for i, rem in enumerate(bins):
            if rem >= length:
                bins[i] -= length
                out.append(i + 1)
                break
        else:
            bins.append(budget - length)
            out.append(len(bins))
    return out, bins


@st.composite
def _hists(draw):
    lengths = list(range(ffdpack.FFD_GRAN, SEQ_BUDGET + 1, ffdpack.FFD_GRAN))
    chosen = draw(
        st.lists(st.sampled_from(lengths), min_size=1, unique=True)
    )
    return {
        length: draw(st.integers(min_value=1, max_value=40))
        for length in chosen
    }


@given(_hists())
@settings(max_examples=300, deadline=None)
def test_trajectory_is_exact_ffd(hist):
    segs, n_bins = ffdpack.ffd_segments(hist)
    items = []
    for length in sorted(hist, reverse=True):
        items += [length] * hist[length]
    expect, bins = brute_ffd(items)
    got = []
    for length in sorted(hist, reverse=True):
        for r in range(hist[length]):
            matches = [
                fid + (r - lo) // cap
                for (blen, lo, hi, fid, cap) in segs
                if blen == length and lo <= r < hi
            ]
            assert len(matches) == 1  # segments partition rank space
            got.append(matches[0])
    assert got == expect
    assert n_bins == len(bins)


def test_assignment_invariants(spark):
    asgn = ffdpack._q_ffd_pack(spark, SF).collect()
    by_doc = {}
    fill = {}
    for r in asgn:
        assert r["doc_id"] not in by_doc  # each doc packed exactly once
        by_doc[r["doc_id"]] = r["bin_id"]
        assert 16 <= r["blen"] <= SEQ_BUDGET and r["blen"] % 16 == 0
        fill[r["bin_id"]] = fill.get(r["bin_id"], 0) + r["blen"]
    # capacity respected in PADDED units (the binding constraint)
    assert all(v <= SEQ_BUDGET for v in fill.values())
    # bin ids dense 1..n (creation order)
    assert sorted(fill) == list(range(1, len(fill) + 1))


def test_fill_report_committed_deltas(spark):
    rows = ffdpack._q_ffd_fill_report(spark, SF).collect()
    by = {}
    for r in rows:
        by.setdefault(r["packer"], {})[r["fill_decile"]] = r
    ffd, pad, cont = by["ffd"], by["padded"], by["contiguous"]
    tokens = {
        p: sum(r["tokens"] for r in d.values()) for p, d in by.items()
    }
    n_seqs = {
        p: sum(r["n_seqs"] for r in d.values()) for p, d in by.items()
    }
    # same corpus tokens through every packer (no doc exceeds the
    # budget at this sf, so truncation never fires)
    assert tokens["ffd"] == tokens["padded"] == tokens["contiguous"]
    # the committed utilization delta: contiguous (straddling lower
    # bound) <= ffd < padded
    assert n_seqs["contiguous"] <= n_seqs["ffd"] < n_seqs["padded"]
    # FFD's tail dominates: its worst bin is no emptier than the
    # contiguous packer's straddle tail, and every low decile holds
    # no more sequences than the padded baseline's
    assert min(ffd) >= min(cont)
    assert min(ffd) >= 7  # measured: worst FFD bin is >=70% full
    cum_f = cum_p = 0
    for d in range(0, 10):
        cum_f += ffd[d]["n_seqs"] if d in ffd else 0
        cum_p += pad[d]["n_seqs"] if d in pad else 0
        assert cum_f <= cum_p


def test_ffd_plan_no_corpus_window(spark):
    """The assignment rides the range-partitioned prefix sum and a
    broadcast segment join — no unpartitioned corpus-sized window
    (the `_pid` totals window is the documented k-row funnel)."""
    import re

    from dataset_batch_processor_spark.plans import explain

    plan = explain.formatted_plan(ffdpack._q_ffd_pack(spark, SF))
    bad = [
        m.group(1)
        for m in re.finditer(r"windowspecdefinition\(([^,)]*)", plan)
        if re.search(r"\s(ASC|DESC)\b", m.group(1))
        and not m.group(1).startswith("_pid")
    ]
    assert bad == [], plan
    assert "CartesianProduct" not in plan, plan
