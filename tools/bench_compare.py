"""Bench regression tripwire (VERDICT r6 next#6).

With median-of-3 headline timings in place, round-over-round deltas
under ~1.5x are host noise (recorded spreads reach 1.75x on the
noisiest queries); anything past that deserves a mechanical flag
instead of eyeballing 200 numbers. This tool diffs two bench
artifacts per-query and reports ONLY moves beyond the threshold,
annotated with each side's recorded [min, median, max] spread when
present, so a flagged move can be judged against its own noise floor.

Accepted artifact shapes (auto-detected):
  - BENCH_DETAIL.json       — {"queries": {...}, "spread": {...}, ...}
  - driver BENCH_r{N}.json  — {"parsed": {"queries": {...}, ...}, ...}

Usage:
    python tools/bench_compare.py OLD.json NEW.json [threshold]
    # prior round's detail straight from git:
    git show <ref>:BENCH_DETAIL.json > /tmp/old.json
    python tools/bench_compare.py /tmp/old.json BENCH_DETAIL.json \
        > BENCH_COMPARE_r7.md

Exit code 0 always — the report is for the round ledger; gating on
host-noisy timings would make every round flaky.
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> tuple[dict[str, float], dict[str, list[float]], dict]:
    with open(path) as fh:
        doc = json.load(fh)
    if "parsed" in doc and isinstance(doc["parsed"], dict):
        doc = doc["parsed"]
    queries = doc.get("queries") or {}
    spread = doc.get("spread") or {}
    return queries, spread, doc


def fmt_spread(spread: dict, name: str) -> str:
    s = spread.get(name)
    if not s:
        return "—"
    return "[" + ", ".join(f"{v:.2f}" for v in s) + "]"


def main() -> None:
    argv = list(sys.argv[1:])
    c8_path = None
    if "--c8" in argv:
        i = argv.index("--c8")
        c8_path = argv[i + 1]
        del argv[i:i + 2]
    if len(argv) < 2:
        sys.exit(__doc__)
    old_path, new_path = argv[0], argv[1]
    threshold = float(argv[2]) if len(argv) > 2 else 1.5
    old_q, old_s, old_doc = load(old_path)
    new_q, new_s, new_doc = load(new_path)

    # Host-regime calibration ratio (round 14): both artifacts carry
    # the fixed pure-codegen calibration_s when produced by r14+
    # bench.py. cal_ratio > 1 means the NEW host window was that much
    # slower on constant work; per-query ratios divided by it read as
    # code-driven moves.
    cal_ratio = None
    if old_doc.get("calibration_s") and new_doc.get("calibration_s"):
        cal_ratio = new_doc["calibration_s"] / old_doc["calibration_s"]

    flagged: list[tuple[float, str, float, float]] = []
    floor = 0.2  # below this many seconds, ratios are pure jitter
    for name in sorted(set(old_q) & set(new_q)):
        a, b = old_q[name], new_q[name]
        if max(a, b) < floor:
            continue
        ratio = b / a if a > 0 else float("inf")
        if ratio > threshold or ratio < 1.0 / threshold:
            flagged.append((max(ratio, 1.0 / ratio), name, a, b))
    flagged.sort(reverse=True)

    added = sorted(set(new_q) - set(old_q))
    removed = sorted(set(old_q) - set(new_q))

    print(f"# Bench compare: {old_path} -> {new_path}")
    print()
    print(
        f"Threshold {threshold}x either direction; queries with both "
        f"sides under {floor}s skipped (pure jitter). "
        f"{len(set(old_q) & set(new_q))} common, "
        f"{len(added)} added, {len(removed)} removed."
    )
    for key, label in (("headline_total", "headline_total"),
                       ("value", "metric value"),
                       ("all_total", "all_total")):
        if key in old_doc and key in new_doc:
            print(f"- {label}: {old_doc[key]} -> {new_doc[key]}")
    if cal_ratio is not None:
        print(
            f"- host calibration: {old_doc['calibration_s']}s -> "
            f"{new_doc['calibration_s']}s (host-regime ratio "
            f"{cal_ratio:.2f}x; 'norm' column = ratio / {cal_ratio:.2f})"
        )
    else:
        print(
            "- host calibration: not present on both sides — raw "
            "ratios include any host-regime shift"
        )
    print()
    # Round 15 (VERDICT r14 next #3): bench.py now re-measures every
    # in-session mover at 5 reps and records the outcome in
    # "requeue"; annotate each flagged row so a move that already
    # survived a same-session repeat reads as confirmed, not as one
    # more row to hand-adjudicate.
    requeue = new_doc.get("requeue") or {}
    if requeue:
        n_conf = sum(1 for v in requeue.values() if v.get("confirmed"))
        print(
            f"- in-session requeue: {len(requeue)} movers re-measured "
            f"at 5 reps by bench.py; {n_conf} confirmed, "
            f"{len(requeue) - n_conf} absorbed (values below are the "
            f"re-measured trimmed means)"
        )
        print()
    if not flagged:
        print(f"**No per-query move beyond {threshold}x.**")
    else:
        print(f"## Moves beyond {threshold}x ({len(flagged)})")
        print()
        norm_hdr = " norm |" if cal_ratio is not None else ""
        rq_hdr = " requeue |" if requeue else ""
        print("| query | old s | new s | ratio |" + norm_hdr
              + " old spread | new spread |" + rq_hdr)
        print("|---|---|---|---|" + ("---|" if cal_ratio is not None else "")
              + "---|---|" + ("---|" if requeue else ""))
        for _, name, a, b in flagged:
            norm_cell = (
                f" {b / a / cal_ratio:.2f}x |" if cal_ratio is not None
                else ""
            )
            rq = requeue.get(name)
            rq_cell = ""
            if requeue:
                if rq:
                    tag = "confirmed" if rq.get("confirmed") else "absorbed"
                    rq_cell = f" {tag} (first {rq['first']:.2f}s) |"
                else:
                    rq_cell = " — |"
            print(
                f"| {name} | {a:.3f} | {b:.3f} | {b / a:.2f}x |"
                + norm_cell
                + f" {fmt_spread(old_s, name)} | {fmt_spread(new_s, name)} |"
                + rq_cell
            )
    if added:
        print()
        print(f"New queries (no prior medians): {', '.join(added)}")
    if removed:
        print()
        print(f"Removed queries: {', '.join(removed)}")

    # Round 16 (VERDICT r15 next #8): the $SPARK_GRAFT_CPUS scaling
    # check, in-repo. With --c8 pointing at a same-HEAD 8-core detail,
    # list every query the 32-core run LOSES by >1.3x — at sf0.1 the
    # suite is fixed-overhead-bound, so an inversion marks a stage
    # whose parallelism is mis-sized (32 tasks of overhead on tiny
    # data, Arrow batch fragmentation), not a scale defect.
    if c8_path:
        c8_q, _, c8_doc = load(c8_path)
        inv: list[tuple[float, str, float, float]] = []
        for name in sorted(set(new_q) & set(c8_q)):
            a8, a32 = c8_q[name], new_q[name]
            if max(a8, a32) < floor or a8 <= 0:
                continue
            if a32 / a8 > 1.3:
                inv.append((a32 / a8, name, a8, a32))
        inv.sort(reverse=True)
        print()
        print(f"## 32-core vs 8-core scaling ({c8_path})")
        print()
        tot8 = sum(c8_q.values())
        tot32 = sum(v for k, v in new_q.items() if k in c8_q)
        print(
            f"- common-query totals: 8-core {tot8:.1f}s, 32-core "
            f"{tot32:.1f}s ({tot32 / tot8:.2f}x); queries where "
            f"32 cores lose by >1.3x: {len(inv)}"
        )
        if inv:
            print()
            print("| query | 8-core s | 32-core s | 32c/8c |")
            print("|---|---|---|---|")
            for r, name, a8, a32 in inv[:25]:
                print(f"| {name} | {a8:.3f} | {a32:.3f} | {r:.2f}x |")


if __name__ == "__main__":
    main()
