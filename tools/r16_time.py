"""Round-16 A/B timer: median-of-N wall for named queries over warm
session artifacts (same warmup as bench.py via r15_profile.warmup).

Usage:
    python tools/r16_time.py [sf_dir] query [query ...]
    SPARK_GRAFT_R16_REPS=5 python tools/r16_time.py ...

Prints one JSON line {query: median_seconds} — the same-session stash
A/B protocol from OPTIMIZATION_r15.md (cross-run bench deltas are
±25% host noise; medians over one warm session are comparable).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from dataset_batch_processor_spark.session import get_spark
from r15_profile import warmup  # noqa: E402  (tools dir on path)

DERIVED_CACHED = {
    "emb_ivf_topk": "anntopk_ivf",
    "emb_ann_lsh_topk": "anntopk_lsh",
    "emb_ann_multiprobe_topk": "anntopk_lsh_multiprobe",
    "emb_pq_topk": "anntopk_pq",
    "emb_ivfpq_topk": "anntopk_ivfpq",
}


def main() -> None:
    argv = sys.argv[1:]
    sf_dir = argv[0] if argv and "/" in argv[0] else "/root/testdata/sf0.1"
    names = argv[1:] if argv and "/" in argv[0] else argv
    reps = int(os.environ.get("SPARK_GRAFT_R16_REPS", "3"))
    spark = get_spark("r16_time")
    qs = entrymod.queries()
    warmup(spark, sf_dir)
    from dataset_batch_processor_spark import matcache

    out: dict[str, float] = {}
    for name in names:
        fn = qs[name]
        runs = []
        for _ in range(reps):
            if name in DERIVED_CACHED:
                matcache.invalidate_exact(DERIVED_CACHED[name])
            t0 = time.time()
            fn(spark, sf_dir).count()
            runs.append(time.time() - t0)
            spark.catalog.clearCache()
        runs.sort()
        out[name] = round(runs[len(runs) // 2], 3)
        print(f"# {name}: {out[name]} {[round(r, 2) for r in runs]}",
              file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
