"""Dataset-operations surface: snapshot diffing and integrity audits.

Ops a large-scale data platform runs around the analytics, not inside
them (no counterpart in the reference, which mutates folders in
place — SURVEY.md §2.9; this is the immutable-snapshot replacement
for "did my batch job change what I think it changed"):

- ``docs_snapshot_diff``: content-hash diff of two corpus snapshots —
  the review artifact for a curation run (what got added / removed /
  rewritten). Both engines synthesize snapshot B from the fixture
  with the same deterministic mutation so the driver hash gate can
  pin the diff logic itself.
- ``fk_integrity_audit``: orphan counts per foreign-key edge
  (lineitem→orders, orders→customer). Zero rows of violations is the
  EXPECTED answer on consistent data — the audit proves the zero.

Scale:
- The diff is one FULL OUTER equi-join on the snapshot key with
  md5-hash comparison — hash shuffle both sides on doc_id, map-side
  hashing, no skew risk beyond the key itself.
- Each FK audit is a LEFT ANTI join (child side keeps its
  partitioning; parent key set broadcasts when dim-sized, AQE
  decides) followed by a count — the counts collapse map-side.
"""

from __future__ import annotations

from .relational2 import _run

# Snapshot B = deterministic mutation of the fixture corpus:
#   - doc_id % 17 == 0 -> row deleted
#   - doc_id % 13 == 0 (and not deleted) -> text rewritten
#   - every doc_id % 19 == 0 re-enters as a NEW doc (doc_id + 10^6)
# The CASE order (delete wins over change) is identical in both
# dialects, so the diff is exactly reproducible.

_DIFF_CORE = """
WITH snap_b AS (
  SELECT doc_id,
         CASE WHEN doc_id % 13 = 0 THEN concat(text, ' [rev2]')
              ELSE text END AS text
  FROM documents WHERE doc_id % 17 <> 0
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, concat('new: ', text) AS text
  FROM documents WHERE doc_id % 19 = 0
),
a AS (SELECT doc_id, md5(text) AS h FROM documents),
b AS (SELECT doc_id, md5(text) AS h FROM snap_b),
joined AS (
  SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
         CASE WHEN b.doc_id IS NULL THEN 'removed'
              WHEN a.doc_id IS NULL THEN 'added'
              WHEN a.h <> b.h THEN 'changed'
              ELSE 'unchanged' END AS status
  FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
)
SELECT doc_id, status FROM joined
WHERE status <> 'unchanged'
ORDER BY doc_id
"""

_FK_CORE = """
SELECT 'lineitem.l_orderkey -> orders.o_orderkey' AS fk_edge,
       (SELECT count(*) FROM lineitem) AS n_child,
       (SELECT count(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = l.l_orderkey)) AS n_orphans
UNION ALL
SELECT 'orders.o_custkey -> customer.c_custkey' AS fk_edge,
       (SELECT count(*) FROM orders) AS n_child,
       (SELECT count(*) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = o.o_custkey)) AS n_orphans
ORDER BY fk_edge
"""

QUERIES = {
    "docs_snapshot_diff": _run(_DIFF_CORE, ("documents",)),
    "fk_integrity_audit": _run(_FK_CORE, ("lineitem", "orders", "customer")),
}
ORACLES = {
    "docs_snapshot_diff": _DIFF_CORE,
    "fk_integrity_audit": _FK_CORE,
}
