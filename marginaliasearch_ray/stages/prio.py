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
