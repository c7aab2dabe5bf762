"""One-off survey: dump every BroadcastNestedLoopJoin build-side
subtree across the registry at sf0.001 (input for the audit's BNLJ
guard design — r14 verdict item 6)."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from dataset_batch_processor_spark.plans import explain  # noqa: E402


def tree_section(plan: str) -> list[str]:
    lines = plan.splitlines()
    out = []
    started = False
    for ln in lines:
        if ln.startswith("== Physical Plan =="):
            started = True
            continue
        if started:
            if not ln.strip():
                break
            out.append(ln)
    return out


def node_depth(line: str) -> int:
    # tree lines look like "   :- * Filter (3)" / "+- BroadcastExchange (5)"
    i = 0
    while i < len(line) and line[i] in " :+-*":
        i += 1
    return i


def bnlj_subtrees(plan: str) -> list[list[str]]:
    lines = tree_section(plan)
    out = []
    for idx, ln in enumerate(lines):
        if "BroadcastNestedLoopJoin" in ln:
            d = node_depth(ln)
            sub = [ln]
            for nxt in lines[idx + 1:]:
                if node_depth(nxt) <= d:
                    break
                sub.append(nxt)
            out.append(sub)
    return out


def main() -> None:
    from dataset_batch_processor_spark.session import get_spark

    spark = get_spark("bnlj-survey", shuffle_partitions=8)
    import __spark_entry__ as entrymod

    sf_dir = "/root/testdata/sf0.001"
    hits = 0
    for name, fn in entrymod.queries().items():
        try:
            plan = explain.formatted_plan(fn(spark, sf_dir))
        except Exception as e:
            print(f"### {name}: BUILD-ERROR {type(e).__name__}: {e}")
            continue
        subs = bnlj_subtrees(plan)
        if subs:
            hits += 1
            print(f"### {name}")
            for sub in subs:
                print("\n".join(sub))
                print("---")
    print(f"TOTAL queries with BNLJ: {hits}")


if __name__ == "__main__":
    main()
