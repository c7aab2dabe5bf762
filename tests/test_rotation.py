"""The driver re-verifies ~50 queries per round in dict-insertion
order; ``_prioritize`` decides that window. These tests pin that the
window is COMPUTED FROM the committed CORRECTNESS artifacts (VERDICT
r6 wrong#2: the hand-maintained table could silently go stale) and
that it equals {never-verified} ∪ stalest-greens, in that order."""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod

REPO = os.path.dirname(os.path.abspath(entrymod.__file__))


def _fold_artifacts() -> dict[str, int]:
    """Independent re-implementation of the fold (glob order differs
    on purpose: max() must make order irrelevant)."""
    out: dict[str, int] = {}
    paths = sorted(
        glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")), reverse=True
    )
    for path in paths:
        rnd = int(re.search(r"CORRECTNESS_r(\d+)\.json$", path).group(1))
        with open(path) as fh:
            rows = json.load(fh)
        for name, r in rows.items():
            if r.get("err"):
                continue
            ok = r["hash_match"] if r.get("hash_match") is not None else r["rows_match"]
            if ok:
                out[name] = max(out.get(name, 0), rnd)
    return out


def test_last_verified_equals_artifact_fold():
    assert entrymod._LAST_VERIFIED == _fold_artifacts()


def test_loader_absorbs_r6_window_the_hand_table_missed():
    """The preserved r6 hand table + the r6 artifact's greens must
    equal the loader's view restricted to rounds <= 6 — i.e. the
    loader is exactly 'hand table, refreshed', with the refresh now
    mechanical. (Guards the loader against a parsing regression that
    would quietly shrink the verified set.)"""
    with open(os.path.join(REPO, "CORRECTNESS_r06.json")) as fh:
        r6 = json.load(fh)
    expected = dict(entrymod._R6_HAND_TABLE)
    for name, r in r6.items():
        ok = r["hash_match"] if r.get("hash_match") is not None else r["rows_match"]
        if ok and not r.get("err"):
            expected[name] = 6
    restricted = {
        k: v for k, v in entrymod._LAST_VERIFIED.items() if v <= 6
    }
    # queries first greened AFTER r6 are outside the hand table's era
    expected = {k: v for k, v in expected.items() if k in restricted}
    assert restricted == expected


def test_prioritize_window_is_never_verified_then_stalest():
    qs = entrymod.queries()
    ordered = list(entrymod._prioritize(qs))
    assert set(ordered) == set(qs)
    lv = entrymod._LAST_VERIFIED
    never = [k for k in qs if k not in lv]
    stale_sorted = sorted((k for k in qs if k in lv), key=lambda k: (lv[k], k))
    assert ordered == never + stale_sorted
    # and the window the driver actually takes (first 50) is exactly
    # the never-verified names plus the stalest greens filling up
    window = ordered[:50]
    assert window == (never + stale_sorted)[:50]
