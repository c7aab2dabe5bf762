"""Dump explain('formatted') for named queries to plans/r16/.

Usage:
    python tools/r16_plans.py before q1 q2 ...   # -> plans/r16/<q>_before.txt
    python tools/r16_plans.py after  q1 q2 ...   # -> plans/r16/<q>_after.txt

Plans are taken at sf0.001 (plan SHAPE is sf-independent; the tiny sf
keeps any eager matcache builds the query performs cheap).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from dataset_batch_processor_spark.session import get_spark


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_PLAN_SF", "/root/testdata/sf0.001")
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r16",
    )
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("r16_plans")
    qs = entrymod.queries()
    for name in names:
        fn = qs.get(name)
        if fn is None:
            print(f"?? unknown query {name}", file=sys.stderr)
            continue
        df = fn(spark, sf_dir)
        text = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        print(f"wrote {path} ({len(text)} bytes)")


if __name__ == "__main__":
    main()
