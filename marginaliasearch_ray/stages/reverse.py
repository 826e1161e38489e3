"""Reverse (inverted) index construction stages.

Reference shape (SURVEY.md §3.1): journal -> FullPreindex (word segments +
sorted doc runs) -> pairwise merge -> finalize (skiplist + btree).  Ray
shape: journal Dataset -> vectorized explode (map_batches) ->
``groupby(part, bucket, salt)`` -> per-term sort/dedup/delta-varint encode
(one vectorized pass per group) -> ``groupby(part, bucket)`` merge of
salted runs (k-way, stateful MergeWorker actor pool) -> immutable
per-partition Parquet segments.

Skew handling (explicit, per north rule): ultra-high-df terms are salted
by document hash into ``num_salts`` sub-runs so no single group in the
big shuffle exceeds ~|postings(term)|/num_salts rows; the MergeWorker
stage re-merges the sorted sub-runs (sorted-merge, first-wins dedup —
mirrors FullPreindex.merge:191-195 / PrioDocIdsTransformer:119-121
duplicate elision).  ``bucket = mix(term_id) % num_buckets`` bounds group
size and gives the shuffle a stable key cardinality of
P x num_buckets x num_salts.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.codecs import (
    decode_counts,
    decode_doc_ids,
    decode_varints,
    encode_counts,
    encode_doc_ids,
    encode_varints,
)

GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def term_bucket(term_ids: np.ndarray, num_buckets: int) -> np.ndarray:
    """Cheap avalanche mix of the (already murmur-derived) term id."""
    x = term_ids.astype(np.uint64) * GOLDEN
    return ((x >> np.uint64(33)) % np.uint64(num_buckets)).astype(np.int32)


class ExplodePostings:
    """journal batch -> posting rows (vectorized, zero-copy pyarrow
    flatten).  Salts postings of terms in the broadcast hot set."""

    def __init__(self, hot_terms_ref, num_buckets: int, num_salts: int):
        import ray

        hot = (
            ray.get(hot_terms_ref) if hasattr(hot_terms_ref, "hex") else hot_terms_ref
        )
        self.hot = np.asarray(sorted(hot), dtype=np.int64)
        self.num_buckets = num_buckets
        self.num_salts = num_salts

    def __call__(self, batch: pa.Table) -> pa.Table:
        tid_col = batch["term_ids"].combine_chunks()
        parents = pc.list_parent_indices(tid_col)
        flat_tid = pc.list_flatten(tid_col).to_numpy(zero_copy_only=False)
        combined = pc.take(batch["combined_id"], parents).to_numpy(
            zero_copy_only=False
        )
        part = pc.take(batch["part"], parents)
        tf = pc.list_flatten(batch["term_tfs"].combine_chunks())
        meta = pc.list_flatten(batch["term_meta"].combine_chunks())
        positions = pc.list_flatten(batch["term_positions"].combine_chunks())

        bucket = term_bucket(flat_tid, self.num_buckets)
        if len(self.hot) and self.num_salts > 1:
            is_hot = np.isin(flat_tid, self.hot)
            salt = np.where(
                is_hot, (combined % self.num_salts).astype(np.int32), np.int32(0)
            )
        else:
            salt = np.zeros(len(flat_tid), dtype=np.int32)

        return pa.table(
            {
                "part": part,
                "bucket": pa.array(bucket, pa.int32()),
                "salt": pa.array(salt, pa.int32()),
                "term_id": pa.array(flat_tid, pa.int64()),
                "combined_id": pa.array(combined, pa.int64()),
                "tf": tf,
                "meta": meta,
                "positions": positions,
            }
        )


def _encode_positions_blob(pos_lists: list[np.ndarray]) -> bytes:
    """Concatenated VarintCodedSequence streams (count+1 header + deltas)
    in doc order, encoded in ONE vectorized varint pass."""
    chunks = []
    for p in pos_lists:
        p = np.asarray(p, dtype=np.int64)
        head = np.array([len(p) + 1], dtype=np.int64)
        if len(p):
            deltas = np.diff(p, prepend=np.int64(0))
            chunks.append(np.concatenate([head, deltas]))
        else:
            chunks.append(head)
    return encode_varints(np.concatenate(chunks)) if chunks else b""


def encode_run_group(group: pa.Table) -> pa.Table:
    """One (part, bucket, salt) group: encode each term's sorted posting
    run.  Fully vectorized: one lexsort, one first-wins dedup mask, and
    ONE varint pass each for the doc/tf/position streams of every term in
    the group (encode_stream_blob); the per-term loop only slices bytes.

    Doc order is rank-major combined-id order, mirroring
    FullPreindexDocuments.construct:92-99; duplicate (term, doc) elision
    mirrors FullPreindex.merge:191-195.
    """
    from ..functions.codecs import encode_stream_blob

    if len(group) == 0:
        return _empty_run_table()

    tids = group["term_id"].to_numpy(zero_copy_only=False)
    docs = group["combined_id"].to_numpy(zero_copy_only=False)
    order = np.lexsort((docs, tids))

    tids_s = tids[order]
    docs_s = docs[order]
    # first-wins dedup of duplicate (term, doc) pairs (stable lexsort
    # keeps original order within ties)
    keep = np.ones(len(tids_s), dtype=bool)
    keep[1:] = (tids_s[1:] != tids_s[:-1]) | (docs_s[1:] != docs_s[:-1])
    order = order[keep]
    tids_s = tids_s[keep]
    docs_s = docs_s[keep]
    tfs_s = group["tf"].to_numpy(zero_copy_only=False)[order]
    metas_s = group["meta"].to_numpy(zero_copy_only=False)[order].astype(np.int64)

    pos_col = group["positions"].combine_chunks()
    pos_off = np.asarray(pos_col.offsets).astype(np.int64)
    pos_vals = np.asarray(pos_col.values).astype(np.int64)

    n = len(tids_s)
    uniq, starts = np.unique(tids_s, return_index=True)
    bounds = np.append(starts, n)
    dfs = np.diff(bounds)
    is_term_start = np.zeros(n, dtype=bool)
    is_term_start[starts] = True

    # --- doc-id streams: per-term [df+1, deltas...] with prev = -1
    doc_deltas = np.empty(n, dtype=np.int64)
    doc_deltas[0] = docs_s[0] + 1
    doc_deltas[1:] = docs_s[1:] - docs_s[:-1]
    doc_deltas[starts] = docs_s[starts] + 1
    docs_blob, docs_off = encode_stream_blob(doc_deltas, dfs)

    # --- tf streams: per-term [df+1, raw tfs...]
    tfs_blob, tfs_off = encode_stream_blob(tfs_s, dfs)

    # --- metas: raw little-endian int64, sliced per term
    metas_bytes = metas_s.tobytes()

    # --- position streams: per-POSTING [len+1, deltas...], then sliced
    # per term across its postings' consecutive streams
    L = pos_off[order + 1] - pos_off[order]
    starts_flat = pos_off[order]
    tot = int(L.sum())
    gi = np.repeat(starts_flat - (np.cumsum(L) - L), L) + np.arange(tot)
    flat = pos_vals[gi]
    row_start = np.cumsum(L) - L
    pdeltas = np.empty(tot, dtype=np.int64)
    if tot:
        pdeltas[0] = flat[0]
        pdeltas[1:] = flat[1:] - flat[:-1]
        nonempty = L > 0
        pdeltas[row_start[nonempty]] = flat[row_start[nonempty]]
    pos_blob, pos_stream_off = encode_stream_blob(pdeltas, L)
    # byte boundary of each term = start of its first posting's stream
    term_pos_off = pos_stream_off[bounds]

    part = group["part"][0].as_py()
    bucket = group["bucket"][0].as_py()
    salt = group["salt"][0].as_py()
    k = len(uniq)

    return pa.table(
        {
            "part": pa.array(np.full(k, part, dtype=np.int32), pa.int32()),
            "bucket": pa.array(np.full(k, bucket, dtype=np.int32), pa.int32()),
            "salt": pa.array(np.full(k, salt, dtype=np.int32), pa.int32()),
            "term_id": pa.array(uniq, pa.int64()),
            "df": pa.array(dfs, pa.int64()),
            "docs": pa.array(
                [docs_blob[docs_off[i] : docs_off[i + 1]] for i in range(k)],
                pa.binary(),
            ),
            "tfs": pa.array(
                [tfs_blob[tfs_off[i] : tfs_off[i + 1]] for i in range(k)],
                pa.binary(),
            ),
            "metas": pa.array(
                [
                    metas_bytes[8 * int(bounds[i]) : 8 * int(bounds[i + 1])]
                    for i in range(k)
                ],
                pa.binary(),
            ),
            "positions": pa.array(
                [pos_blob[term_pos_off[i] : term_pos_off[i + 1]] for i in range(k)],
                pa.binary(),
            ),
        }
    )


def _run_fields():
    return [
        ("part", pa.int32()),
        ("bucket", pa.int32()),
        ("salt", pa.int32()),
        ("term_id", pa.int64()),
        ("df", pa.int64()),
        ("docs", pa.binary()),
        ("tfs", pa.binary()),
        ("metas", pa.binary()),
        ("positions", pa.binary()),
    ]


def _run_table(out: dict) -> pa.Table:
    return pa.table(
        {name: pa.array(out[name], typ) for name, typ in _run_fields()}
    )


def _empty_run_table() -> pa.Table:
    return pa.table(
        {name: pa.array([], typ) for name, typ in _run_fields()}
    )


def split_positions_blob(blob: bytes, df: int) -> list[np.ndarray]:
    """Decode a concatenated positions blob back to per-doc position
    arrays (one vectorized varint pass + header walk)."""
    vals = decode_varints(blob).astype(np.int64)
    out = []
    i = 0
    for _ in range(df):
        cnt = int(vals[i]) - 1
        out.append(np.cumsum(vals[i + 1 : i + 1 + cnt]))
        i += 1 + cnt
    return out


class MergeWorker:
    """Stateful merge stage: one (part, bucket) group holds every salted
    run of its terms; runs with the same term id are k-way sorted-merged
    (runs are disjoint and individually sorted, so merge = concat +
    stable argsort on doc id) with first-wins dedup.  Mirrors
    FullPreindex.merge:131-201 / mergeSegments:255-274 in semantics.

    Implemented as a callable class so the actor pool reuses scratch
    buffers and accumulates per-worker merge metrics (lineage)."""

    def __init__(self):
        self.groups_merged = 0
        self.runs_merged = 0

    def __call__(self, group: pa.Table) -> pa.Table:
        tids = group["term_id"].to_numpy(zero_copy_only=False)
        uniq, starts, counts = np.unique(tids, return_index=True, return_counts=True)

        # fast path: every term has exactly one run — strip the salt column
        if len(uniq) == len(tids):
            self.groups_merged += 1
            return group.drop_columns(["salt"])

        order = np.argsort(tids, kind="stable")
        out = {
            "part": [],
            "bucket": [],
            "term_id": [],
            "df": [],
            "docs": [],
            "tfs": [],
            "metas": [],
            "positions": [],
        }
        part = group["part"][0].as_py()
        bucket = group["bucket"][0].as_py()
        docs_col = group["docs"]
        tfs_col = group["tfs"]
        metas_col = group["metas"]
        pos_col = group["positions"]
        dfs = group["df"].to_numpy(zero_copy_only=False)

        pos_in_sorted = 0
        for k in range(len(uniq)):
            nruns = int(counts[k])
            rows = [int(order[pos_in_sorted + j]) for j in range(nruns)]
            pos_in_sorted += nruns
            if nruns == 1:
                r = rows[0]
                out["docs"].append(docs_col[r].as_py())
                out["tfs"].append(tfs_col[r].as_py())
                out["metas"].append(metas_col[r].as_py())
                out["positions"].append(pos_col[r].as_py())
                out["df"].append(int(dfs[r]))
            else:
                self.runs_merged += nruns
                d_all, t_all, m_all, p_all = [], [], [], []
                for r in rows:
                    df_r = int(dfs[r])
                    d_all.append(decode_doc_ids(docs_col[r].as_py()))
                    t_all.append(decode_counts(tfs_col[r].as_py()))
                    m_all.append(
                        np.frombuffer(metas_col[r].as_py(), dtype="<i8")
                    )
                    p_all.extend(split_positions_blob(pos_col[r].as_py(), df_r))
                d = np.concatenate(d_all)
                t = np.concatenate(t_all)
                m = np.concatenate(m_all)
                o = np.argsort(d, kind="stable")
                d, t, m = d[o], t[o], m[o]
                p_sorted = [p_all[j] for j in o]
                keep = np.ones(len(d), dtype=bool)
                keep[1:] = d[1:] != d[:-1]
                idx = np.flatnonzero(keep)
                out["docs"].append(encode_doc_ids(d[idx]))
                out["tfs"].append(encode_counts(t[idx]))
                out["metas"].append(m[idx].astype(np.int64).tobytes())
                out["positions"].append(
                    _encode_positions_blob([p_sorted[int(j)] for j in idx])
                )
                out["df"].append(int(len(idx)))
            out["part"].append(part)
            out["bucket"].append(bucket)
            out["term_id"].append(int(uniq[k]))

        self.groups_merged += 1
        fields = [(n, t) for n, t in _run_fields() if n != "salt"]
        return pa.table({name: pa.array(out[name], typ) for name, typ in fields})
