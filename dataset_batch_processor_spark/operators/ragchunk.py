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


def _chunks_sql(dialect: str) -> str:
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
    return f"""
WITH t AS ({t}),
pos AS ({pos})
SELECT doc_id,
       CAST(k AS INT) AS chunk_no,
       CAST(1 + k * {CHUNK_S} AS INT) AS start_tok,
       CAST({nwin} AS INT) AS chunk_tokens,
       md5({joined}) AS chunk_md5
FROM pos
WHERE 1 + k * {CHUNK_S} <= ntok
ORDER BY doc_id, chunk_no
"""


QUERIES = {
    "docs_window_chunks": _run(_chunks_sql("spark"), ("documents",)),
}
ORACLES = {
    "docs_window_chunks": _chunks_sql("duck"),
}
