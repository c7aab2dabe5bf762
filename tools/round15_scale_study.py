"""Round-15 family growth study.

Measures the round-15 gated queries at 1/4/16/64x plain fanout
(studylib.fanout_table — disjoint copies with remapped doc_ids),
gated callables run UNMODIFIED against materialized fanout sf-dirs
(the r13 study-C pattern). Families:

* winnowing — fingerprint extraction is per-row (expect linear);
  overlap pairs are a fingerprint equi-join; PLAIN fanout multiplies
  every fingerprint's document frequency by mult, so hot-fp pruning
  (FP_DOC_CAP=64) starts dropping shared fingerprints at high mult —
  the measured pair count records where the cap bites, exactly the
  honest-capping stance of the LSH families.
* pii — pure per-row regex + a |sources|-sized rollup (expect
  linear with a small constant).
* classifier rank metrics — training (12 epochs x one codegen scan)
  + one attach_rank pass; per-mult training is re-run (the cache
  keys on sf_dir), so the measured wall is the honest train+rank
  cost at that corpus size.

Usage: python tools/round15_scale_study.py [mults...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dataset_batch_processor_spark.session import get_spark
from studylib import fanout_table

SF_DIR = "/root/testdata/sf0.01"


def _fanout_sf_dir(spark, mult: int) -> str:
    from dataset_batch_processor_spark.matcache import scratch_dir

    d = scratch_dir(f"dbp_r15_sf_{mult}_")
    fanout_table(spark, SF_DIR, "documents", "doc_id", mult).write.mode(
        "overwrite"
    ).parquet(os.path.join(d, "documents.parquet"))
    return d


def main() -> None:
    mults = [int(m) for m in sys.argv[1:]] or [1, 4, 16, 64]
    spark = get_spark("round15-scale-study")
    from dataset_batch_processor_spark.operators import (
        perceptron,
        pii,
        winnow,
    )

    queries = {
        "winnow_fps": winnow.QUERIES["docs_winnow_fingerprints"],
        "winnow_pairs": winnow.QUERIES["docs_winnow_overlap_pairs"],
        "pii_scan": pii.QUERIES["docs_pii_scan"],
        "pii_redact": pii.QUERIES["docs_pii_redact"],
        "clf_auc": perceptron._q_rank_auc,
        "clf_decile": perceptron._q_decile_lift,
    }
    # warm codegen so the first measured row is not JVM start
    queries["winnow_fps"](spark, SF_DIR).count()
    print("| mult | n_docs | " + " | ".join(queries) + " | winnow_pair_rows |")
    print("|---" * (len(queries) + 3) + "|")
    for mult in mults:
        d = _fanout_sf_dir(spark, mult)
        from dataset_batch_processor_spark import catalog

        n_docs = catalog.load_table(spark, d, "documents").count()
        cells, pair_rows = [], None
        for name, fn in queries.items():
            t0 = time.time()
            n = fn(spark, d).count()
            cells.append(f"{time.time() - t0:.2f}")
            if name == "winnow_pairs":
                pair_rows = n
        print(
            f"| {mult} | {n_docs} | " + " | ".join(cells)
            + f" | {pair_rows} |", flush=True,
        )


if __name__ == "__main__":
    main()
