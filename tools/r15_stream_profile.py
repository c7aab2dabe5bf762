"""Split each streaming twin's wall into (a) staged-fixture build
(session-cached after the first), (b) the streaming drain
(readStream -> foreachBatch/awaitTermination), and (c) the read-back
merge query — so round-15b knows whether the remaining twin cost is
micro-batch machinery or the drained SQL itself.

Usage: python tools/r15_stream_profile.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from dataset_batch_processor_spark.session import get_spark

DEFAULT = [
    "events_stream_join_pairs",
    "docs_incremental_lsh_pairs",
    "docs_stream_turn_admission",
    "docs_stream_hll_card",
    "docs_stream_conv_validation",
    "docs_stream_quality_admission",
    "events_stream_sessions",
    "events_cms_streaming_counters",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:] or DEFAULT
    spark = get_spark("r15-stream-profile")
    qs = entrymod.queries()
    rows = []
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"profile:{name}")
        # rep 1: cold (stages the fixture); rep 2: warm (drain only)
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        cold = time.time() - t0
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        warm = time.time() - t0
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        warm2 = time.time() - t0
        rows.append((name, cold, warm, warm2))
        print(
            f"{name:38s} cold {cold:6.2f}  warm {warm:6.2f}  warm2 {warm2:6.2f}",
            flush=True,
        )
    with open("/tmp/r15_stream_profile.json", "w") as fh:
        json.dump(
            [
                {"name": n, "cold": c, "warm": w, "warm2": w2}
                for n, c, w, w2 in rows
            ],
            fh,
            indent=1,
        )
    spark.stop()


if __name__ == "__main__":
    main()
