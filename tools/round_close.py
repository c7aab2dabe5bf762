"""Mechanical round-close sequence (round 9, VERDICT r8 next #1).

Round 8 committed a VERIFY_FULL mirror captured BEFORE its last code
fix (recording a FAIL that was already cured) and registered queries
after the mirror ran (no artifact row at all). The cure is ordering:
the full-surface verify must be the LAST thing that runs before the
closing commit, mechanically. This script is that order:

    python tools/round_close.py <round-number>

1. full pytest (must be green)
2. full-surface oracle verify at sf0.01 -> VERIFY_FULL_r{N}.json
   (also folds VERIFY_LEDGER.json, so the tripwire test stays green)
3. uncontended bench.py at sf0.1 -> prints the headline JSON
4. tools/bench_compare.py vs the prior committed BENCH_DETAIL.json

It STOPS on the first failure and never commits — the operator
reviews, then commits VERIFY_FULL_r{N}.json + VERIFY_LEDGER.json +
BENCH_COMPARE_r{N}.md as the final snapshot commit. If ANY code
change lands after this ran, run it again.
"""

from __future__ import annotations

import subprocess
import sys

REPO = "/root/repo"


def run(desc: str, cmd: list[str], **kw) -> None:
    print(f"\n=== {desc}: {' '.join(cmd)}", flush=True)
    r = subprocess.run(cmd, cwd=REPO, **kw)
    if r.returncode != 0:
        sys.exit(f"round_close: step failed ({desc}) — fix, then rerun "
                 f"this script from the top")


def sync_readme_count() -> None:
    """Rewrite README.md's ``N driver queries`` figure from the live
    registry (VERDICT r10 wrong #2: the count was typed by hand and
    drifted 285 vs 290; derived numbers don't drift). The tripwire
    test pins README == len(queries()) so a close that skips this
    step fails pytest."""
    import re

    sys.path.insert(0, REPO)
    import __spark_entry__ as entrymod

    n_q = len(entrymod.queries())
    path = f"{REPO}/README.md"
    with open(path) as fh:
        text = fh.read()
    new, n_sub = re.subn(
        r"entry\(\) \+ \d+ driver queries",
        f"entry() + {n_q} driver queries",
        text,
    )
    if n_sub != 1:
        sys.exit("round_close: README.md lost the 'N driver queries' "
                 "line — restore it before closing")
    if new != text:
        with open(path, "w") as fh:
            fh.write(new)
        print(f"=== README.md query count rewritten to {n_q}", flush=True)


def main() -> None:
    if len(sys.argv) != 2 or not sys.argv[1].isdigit():
        sys.exit("usage: python tools/round_close.py <round-number>")
    n = int(sys.argv[1])
    sync_readme_count()
    # snapshot the last COMMITTED bench detail before bench.py
    # overwrites the working-tree copy (memory: a smoke run or driver
    # rewrite in the tree must not poison the comparison baseline)
    prev = subprocess.run(
        ["git", "show", "HEAD:BENCH_DETAIL.json"], cwd=REPO,
        capture_output=True, text=True,
    )
    with open(f"{REPO}/.bench_detail_prev.json", "w") as fh:
        fh.write(prev.stdout if prev.returncode == 0 else "{}")
    run("pytest", [sys.executable, "-m", "pytest", "tests/", "-x", "-q"])
    run(
        "full oracle verify",
        [sys.executable, "tools/verify_oracle.py", "--json",
         f"VERIFY_FULL_r{n}.json", "/root/testdata/sf0.01"],
    )
    run("bench (sf0.1, uncontended)", [sys.executable, "bench.py"])
    with open(f"{REPO}/BENCH_COMPARE_r{n}.md", "w") as out:
        run(
            "bench compare",
            [sys.executable, "tools/bench_compare.py",
             ".bench_detail_prev.json", "BENCH_DETAIL.json"],
            stdout=out,
        )
    print(
        f"\nround_close: all green. Commit VERIFY_FULL_r{n}.json, "
        f"VERIFY_LEDGER.json, BENCH_DETAIL.json, BENCH_COMPARE_r{n}.md "
        f"as the snapshot commit. Re-run this script if any code "
        f"changes after it."
    )


if __name__ == "__main__":
    main()
