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
5. stages + commits the snapshot artifacts it regenerated and FAILS
   if any bench/verify artifact is still newer than HEAD afterwards
   (round 12, VERDICT r11 wrong #2 / next #5: the close leaves
   ``git status`` clean for these files, mechanically)

It STOPS on the first failure; only the all-green path commits. If
ANY code change lands after this ran, run it again.
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
    # Round 16 (VERDICT r15 next #8): same-HEAD 8-core bench so the
    # scaling inversions land in the compare report in-repo, not only
    # in the driver's own c8 run. reps=1 keeps it one pass (and
    # disables the mover requeue, which would otherwise compare c8
    # timings against the c32 detail and re-measure 40 movers); the
    # c32 detail is saved around it because bench.py overwrites
    # BENCH_DETAIL.json unconditionally.
    import os
    import shutil

    shutil.copyfile(f"{REPO}/BENCH_DETAIL.json",
                    f"{REPO}/.bench_detail_c32.json")
    env8 = dict(os.environ, SPARK_GRAFT_CPUS="8",
                SPARK_GRAFT_BENCH_REPS="1")
    run("bench (sf0.1, 8 cores)", [sys.executable, "bench.py"], env=env8)
    shutil.copyfile(f"{REPO}/BENCH_DETAIL.json",
                    f"{REPO}/BENCH_C8_DETAIL_r{n}.json")
    shutil.copyfile(f"{REPO}/.bench_detail_c32.json",
                    f"{REPO}/BENCH_DETAIL.json")
    with open(f"{REPO}/BENCH_COMPARE_r{n}.md", "w") as out:
        run(
            "bench compare",
            [sys.executable, "tools/bench_compare.py",
             ".bench_detail_prev.json", "BENCH_DETAIL.json",
             "--c8", f"BENCH_C8_DETAIL_r{n}.json"],
            stdout=out,
        )
    commit_snapshot(n)
    print(
        f"\nround_close: all green and the r{n} snapshot is committed. "
        f"Re-run this script if any code changes after it."
    )


def _head_is_published() -> bool:
    """True when HEAD is already contained in its upstream — amending
    it would rewrite published history and the next push would fail
    non-fast-forward (r13 ADVICE). No upstream configured -> not
    published -> amend is safe."""
    has_upstream = subprocess.run(
        ["git", "rev-parse", "--abbrev-ref", "@{u}"],
        cwd=REPO, capture_output=True,
    )
    if has_upstream.returncode != 0:
        return False
    return (
        subprocess.run(
            ["git", "merge-base", "--is-ancestor", "HEAD", "@{u}"],
            cwd=REPO, capture_output=True,
        ).returncode
        == 0
    )


def commit_snapshot(n: int) -> None:
    """Stage + commit the artifacts this close regenerated, plus any
    driver-written BENCH_r*/CORRECTNESS_r* still untracked from an
    earlier window, then ASSERT the tree holds no bench/verify
    artifact newer than HEAD (VERDICT r11 wrong #2: round 11's final
    bench swap sat unstaged while the snapshot commit pointed at the
    contended run — the close must leave `git status` clean for these
    files, mechanically)."""
    import glob as _glob
    import os

    paths = [
        f"VERIFY_FULL_r{n}.json", "VERIFY_LEDGER.json",
        "BENCH_DETAIL.json", f"BENCH_C8_DETAIL_r{n}.json",
        f"BENCH_COMPARE_r{n}.md", "README.md",
    ]
    for pat in ("BENCH_r*.json", "CORRECTNESS_r*.json"):
        paths += [
            os.path.basename(p)
            for p in _glob.glob(os.path.join(REPO, pat))
        ]
    # pathspec-limited commit (review r12 #1): a bare `git commit`
    # would sweep any pre-staged unrelated WIP into the snapshot
    subprocess.run(["git", "add", "--"] + paths, cwd=REPO, check=True)
    staged = subprocess.run(
        ["git", "diff", "--cached", "--quiet", "--"] + paths, cwd=REPO
    )
    if staged.returncode != 0:
        # squash-on-reclose (VERDICT r12 wrong #4): a re-run after a
        # post-close fix used to STACK a second identical-message
        # snapshot commit (r12 left three). If HEAD already is this
        # round's close snapshot, amend it in place instead — one
        # close commit per round, whatever the rerun count.
        msg = f"Round-{n} close: verify + bench snapshot artifacts"
        head_msg = subprocess.run(
            ["git", "log", "-1", "--format=%s"], cwd=REPO,
            capture_output=True, text=True, check=True,
        ).stdout.strip()
        cmd = ["git", "commit", "-m", msg]
        if head_msg == msg and not _head_is_published():
            cmd.insert(2, "--amend")
        run("snapshot commit", cmd + ["--"] + paths)
    dirty = subprocess.run(
        ["git", "status", "--porcelain", "--",
         "BENCH_*.json", "BENCH_DETAIL.json", "CORRECTNESS_*.json",
         "VERIFY_*.json"],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout.strip()
    if dirty:
        sys.exit(
            "round_close: bench/verify artifacts newer than HEAD after "
            f"the snapshot commit — resolve and rerun:\n{dirty}"
        )


if __name__ == "__main__":
    main()
