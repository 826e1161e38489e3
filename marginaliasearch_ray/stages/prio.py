"""Priority reverse-index build stages.

Reference: REVERSE_PRIO construction (IndexConstructorMain.java:154-185;
PrioPreindex / PrioDocIdsTransformer) — posting lists restricted to
journal entries whose term metadata carries any WordFlags bit, doc ids
compressed with the 2-bit-opcode Elias gamma/delta stream
(functions/prio_codec.py, bit-exact).

Code-corpus flag semantics (stages/tokenize.py): Title / UrlPath /
UrlDomain membership plus the early-mention Subjects bit (first
occurrence within the first 8 tokens), so the priority lists mean
"documents where this term is structurally prominent".
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.prio_codec import encode_prio_doc_ids_fast as encode_prio_doc_ids
from .reverse import term_bucket


def explode_flagged(batch: pa.Table, num_buckets: int) -> pa.Table:
    """journal batch -> (part, bucket, term_id, combined_id) rows for
    postings whose term meta has any flag bit in the low byte."""
    tid_col = batch["term_ids"].combine_chunks()
    parents = pc.list_parent_indices(tid_col)
    flat_tid = pc.list_flatten(tid_col).to_numpy(zero_copy_only=False)
    flat_meta = pc.list_flatten(batch["term_meta"].combine_chunks()).to_numpy(
        zero_copy_only=False
    )
    combined = pc.take(batch["combined_id"], parents).to_numpy(zero_copy_only=False)
    part = pc.take(batch["part"], parents).to_numpy(zero_copy_only=False)

    flagged = (flat_meta & 0xFF) != 0
    flat_tid = flat_tid[flagged]
    combined = combined[flagged]
    part = part[flagged]
    bucket = term_bucket(flat_tid, num_buckets)
    return pa.table(
        {
            "part": pa.array(part, pa.int32()),
            "bucket": pa.array(bucket, pa.int32()),
            "term_id": pa.array(flat_tid, pa.int64()),
            "combined_id": pa.array(combined, pa.int64()),
        }
    )


_EMPTY_PRIO = {
    "part": pa.array([], pa.int32()),
    "bucket": pa.array([], pa.int32()),
    "term_id": pa.array([], pa.int64()),
    "df": pa.array([], pa.int64()),
    "docs": pa.array([], pa.binary()),
}


def encode_prio_batch_runs(batch: pa.Table, num_buckets: int) -> pa.Table:
    """Per-batch combiner (the prio analog of EncodeBatchRuns): flagged
    postings are grouped by (part, term) and gamma/delta-encoded INSIDE
    the batch, so the prio shuffle moves compressed runs — never raw
    (term, doc) rows — restoring the build's 'raw postings never shuffle'
    invariant (VERDICT r1 'what's wrong' item 8)."""
    rows = explode_flagged(batch, num_buckets)
    if len(rows) == 0:
        return pa.table(_EMPTY_PRIO)
    part = rows["part"].to_numpy(zero_copy_only=False)
    tids = rows["term_id"].to_numpy(zero_copy_only=False)
    docs = rows["combined_id"].to_numpy(zero_copy_only=False)
    order = np.lexsort((docs, tids, part))
    part_s, tids_s, docs_s = part[order], tids[order], docs[order]
    seg = np.ones(len(order), dtype=bool)
    seg[1:] = (part_s[1:] != part_s[:-1]) | (tids_s[1:] != tids_s[:-1])
    starts = np.flatnonzero(seg)
    bounds = np.append(starts, len(order))
    blobs = [
        encode_prio_doc_ids(docs_s[bounds[k] : bounds[k + 1]])
        for k in range(len(starts))
    ]
    # (term, doc) pairs are unique within a journal batch, so run df is
    # exactly the run length
    dfs = np.diff(bounds)
    return pa.table(
        {
            "part": pa.array(part_s[starts], pa.int32()),
            "bucket": pa.array(term_bucket(tids_s[starts], num_buckets), pa.int32()),
            "term_id": pa.array(tids_s[starts], pa.int64()),
            "df": pa.array(dfs, pa.int64()),
            "docs": pa.array(blobs, pa.binary()),
        }
    )


def merge_prio_group(group: pa.Table) -> pa.Table:
    """One (part, bucket) group of encoded runs -> one posting row per
    term: decode each term's runs, sorted-union the doc ids, re-encode.
    Mirrors PrioPreindex merge semantics (distinct docs, ascending)."""
    from ..functions.prio_codec import decode_prio_doc_ids

    if len(group) == 0:
        return pa.table(_EMPTY_PRIO)
    tids = group["term_id"].to_numpy(zero_copy_only=False)
    order = np.argsort(tids, kind="stable")
    tids_s = tids[order]
    blob_col = group["docs"].combine_chunks()
    uniq, starts = np.unique(tids_s, return_index=True)
    bounds = np.append(starts, len(tids_s))
    part = group["part"][0].as_py()
    bucket = group["bucket"][0].as_py()
    blobs, dfs = [], []
    for k in range(len(uniq)):
        runs = [
            decode_prio_doc_ids(memoryview(blob_col[int(order[i])].as_buffer()))
            for i in range(int(bounds[k]), int(bounds[k + 1]))
        ]
        all_docs = np.unique(np.concatenate(runs)) if len(runs) > 1 else runs[0]
        blobs.append(encode_prio_doc_ids(all_docs))
        dfs.append(int(len(all_docs)))
    n = len(uniq)
    return pa.table(
        {
            "part": pa.array(np.full(n, part, dtype=np.int32), pa.int32()),
            "bucket": pa.array(np.full(n, bucket, dtype=np.int32), pa.int32()),
            "term_id": pa.array(uniq, pa.int64()),
            "df": pa.array(dfs, pa.int64()),
            "docs": pa.array(blobs, pa.binary()),
        }
    )


def encode_prio_group(group: pa.Table) -> pa.Table:
    """One (part, bucket) group -> one prio posting row per term.
    Doc ids sorted rank-major; duplicate elision inside the codec."""
    if len(group) == 0:
        return pa.table(
            {
                "part": pa.array([], pa.int32()),
                "bucket": pa.array([], pa.int32()),
                "term_id": pa.array([], pa.int64()),
                "df": pa.array([], pa.int64()),
                "docs": pa.array([], pa.binary()),
            }
        )
    tids = group["term_id"].to_numpy(zero_copy_only=False)
    docs = group["combined_id"].to_numpy(zero_copy_only=False)
    order = np.lexsort((docs, tids))
    tids_s, docs_s = tids[order], docs[order]
    uniq, starts = np.unique(tids_s, return_index=True)
    bounds = np.append(starts, len(tids_s))
    part = group["part"][0].as_py()
    bucket = group["bucket"][0].as_py()
    blobs = [
        encode_prio_doc_ids(docs_s[bounds[k] : bounds[k + 1]])
        for k in range(len(uniq))
    ]
    dfs = [
        int(len(np.unique(docs_s[bounds[k] : bounds[k + 1]])))
        for k in range(len(uniq))
    ]
    n = len(uniq)
    return pa.table(
        {
            "part": pa.array(np.full(n, part, dtype=np.int32), pa.int32()),
            "bucket": pa.array(np.full(n, bucket, dtype=np.int32), pa.int32()),
            "term_id": pa.array(uniq, pa.int64()),
            "df": pa.array(dfs, pa.int64()),
            "docs": pa.array(blobs, pa.binary()),
        }
    )
