"""Sliding-window chunking with overlap (round 14).

RAG/embedding prep chunks documents into FIXED-SIZE token windows
with overlap (the LangChain/LlamaIndex "recursive splitter" default
shape, public formulation): window W tokens, stride S < W, last
window partial. Distinct from the repo's other chunkers — K4
split_chunks is record-count file splitting, docs_cdc_chunks is
content-defined boundaries, docs_sequence_packing packs whole docs —
this one OVERLAPS windows (retrieval recall at chunk borders) and
keys every chunk with a stable content address.

Determinism: tokenization is the house space-split; window starts
are 1 + k*S for k = 0..ceil((ntok-W)/S); the chunk id is
(doc_id, chunk_no) and the content address is md5 of the re-joined
window text — byte-stable on both engines, and the property a chunk
STORE needs (re-chunking an unchanged doc re-derives identical
addresses, so upserts are no-ops — the K10/caption-MRU stance).

Scale: one narrow scan, one per-doc explode of ceil(ntok/S) window
indexes (output ~ (W/S)x input tokens — the overlap factor, 1.33x at
the 32/24 default), zero shuffles, zero joins. The explode count
derives from size(w) so Catalyst keeps everything in one codegen
stage.
"""

from __future__ import annotations

from .sqlrun import _run

CHUNK_W = 32   # window size, tokens
CHUNK_S = 24   # stride, tokens (overlap = W - S = 8)


def _chunks_core(dialect: str) -> str:
    """The shared WITH-chain prefix (``t``, ``pos``, ``chunks``) both
    the chunk listing and the chunk-dedup rollup compose."""
    if dialect == "spark":
        t = ("SELECT doc_id, split(text, ' ') AS w FROM documents "
             "WHERE length(text) > 0")
        ks = (f"explode(sequence(0, greatest(CAST(ceil((size(w) - {CHUNK_W})"
              f" / {CHUNK_S}) AS INT), 0)))")
        pos = f"SELECT doc_id, w, size(w) AS ntok, {ks} AS k FROM t"
        win = f"slice(w, 1 + k * {CHUNK_S}, {CHUNK_W})"
        joined = f"array_join({win}, ' ')"
        nwin = f"size({win})"
    else:
        t = ("SELECT doc_id, string_split(text, ' ') AS w FROM documents "
             "WHERE length(text) > 0")
        ks = (f"unnest(generate_series(0, greatest(CAST(ceil("
              f"(len(w) - {CHUNK_W}) / {CHUNK_S}) AS INT), 0)))")
        pos = f"SELECT doc_id, w, len(w) AS ntok, {ks} AS k FROM t"
        win = (f"list_slice(w, 1 + k * {CHUNK_S}, "
               f"least(k * {CHUNK_S} + {CHUNK_W}, len(w)))")
        joined = f"array_to_string({win}, ' ')"
        nwin = f"len({win})"
    return f"""t AS ({t}),
pos AS ({pos}),
chunks AS (
  SELECT doc_id,
         CAST(k AS INT) AS chunk_no,
         CAST(1 + k * {CHUNK_S} AS INT) AS start_tok,
         CAST({nwin} AS INT) AS chunk_tokens,
         md5({joined}) AS chunk_md5
  FROM pos
  WHERE 1 + k * {CHUNK_S} <= ntok
)"""


def _chunks_sql(dialect: str) -> str:
    return f"""
WITH {_chunks_core(dialect)}
SELECT * FROM chunks
ORDER BY doc_id, chunk_no
"""


# ------------------------------------------------- chunk-store dedup
# RAG-store redundancy audit (round 14, composition of the chunker
# with the exact-dedup stance): per doc, the share of its windows
# whose content address appears MORE THAN ONCE corpus-wide — the
# fraction of the doc a dedup'd chunk store would not pay for again.
# One groupBy on chunk_md5 (map-side combine) + one join back on the
# address — the A4/dedup shuffle shape over the chunk table.


def _chunk_dedup_sql(dialect: str) -> str:
    div = "DIV" if dialect == "spark" else "//"
    return f"""
WITH {_chunks_core(dialect)},
freq AS (SELECT chunk_md5, count(*) AS c FROM chunks GROUP BY chunk_md5)
SELECT doc_id,
       count(*) AS n_chunks,
       CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_dup_chunks,
       CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) * 1000000 {div}
            count(*) AS BIGINT) AS redundancy_ppm
FROM chunks JOIN freq USING (chunk_md5)
GROUP BY doc_id
ORDER BY doc_id
"""


QUERIES = {
    "docs_window_chunks": _run(_chunks_sql("spark"), ("documents",)),
    "docs_chunk_dedup": _run(_chunk_dedup_sql("spark"), ("documents",)),
}
ORACLES = {
    "docs_window_chunks": _chunks_sql("duck"),
    "docs_chunk_dedup": _chunk_dedup_sql("duck"),
}
