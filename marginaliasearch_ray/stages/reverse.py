"""Reverse (inverted) index construction stages.

Reference shape (SURVEY.md §3.1): journal pages -> FullPreindex (word
segments + sorted doc runs, one per page) -> merge -> finalize.  Ray
shape mirrors it exactly:

  journal -> map_batches(EncodeBatchRuns)      # page-construct analog:
      explode + sort + delta-varint encode ENTIRELY within the batch;
      only compressed runs ever enter a shuffle
  -> groupby(part, bucket, salt) MergeWorker   # salted partial merge
  -> groupby(part, bucket)      MergeWorker    # final k-way merge
  -> write_parquet(partition_cols=[part])      # immutable segments

Skew handling (explicit, per north rule): runs of broadcast hot
(high-df) terms are salted by first doc id into ``num_salts`` groups so
an ultra-common term's many runs merge in parallel before the final
merge; ``bucket = mix(term_id) % num_buckets`` spreads the term space
across merge workers and bounds group size.  Merge is sorted-merge with
first-wins dedup (FullPreindex.merge:191-195 / PrioDocIdsTransformer
:119-121 duplicate elision).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.codecs import decode_varints

GOLDEN = np.uint64(0x9E3779B97F4A7C15)

# Postings per block for the block-max side index (see add_block_stats).
POSTING_BLOCK = 128


def term_bucket(term_ids: np.ndarray, num_buckets: int) -> np.ndarray:
    """Cheap avalanche mix of the (already murmur-derived) term id."""
    x = term_ids.astype(np.uint64) * GOLDEN
    return ((x >> np.uint64(33)) % np.uint64(num_buckets)).astype(np.int32)


class EncodeBatchRuns:
    """journal batch -> encoded posting RUNS, one row per
    (part, bucket, term) present in the batch.

    This is the combiner that makes the reverse build scale: the raw
    (term, doc, tf, meta, positions) posting rows never enter a shuffle —
    each batch is exploded, sorted and varint-encoded locally (the
    FullPreindex page-construct analog, FullPreindex.java:45-57), and only
    the compressed runs move in the subsequent merge groupby.

    Skew handling: runs of broadcast hot (high-df) terms are salted by
    their first doc id so one ultra-common term's many runs merge in
    ``num_salts`` parallel groups before the final merge.
    """

    def __init__(self, hot_terms_ref, num_buckets: int, num_salts: int):
        import ray

        hot = (
            ray.get(hot_terms_ref) if hasattr(hot_terms_ref, "hex") else hot_terms_ref
        )
        self.hot = np.asarray(sorted(hot), dtype=np.int64)
        self.num_buckets = num_buckets
        self.num_salts = num_salts

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.codecs import encode_stream_blob

        tid_col = batch["term_ids"].combine_chunks()
        parents = pc.list_parent_indices(tid_col)
        tids = pc.list_flatten(tid_col).to_numpy(zero_copy_only=False)
        if len(tids) == 0:
            return _empty_run_table()
        docs = pc.take(batch["combined_id"], parents).to_numpy(zero_copy_only=False)
        parts = pc.take(batch["part"], parents).to_numpy(zero_copy_only=False)
        tfs = pc.list_flatten(batch["term_tfs"].combine_chunks()).to_numpy(
            zero_copy_only=False
        )
        metas = pc.list_flatten(batch["term_meta"].combine_chunks()).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        pos_col = pc.list_flatten(batch["term_positions"].combine_chunks())
        pos_off = np.asarray(pos_col.offsets).astype(np.int64)
        pos_vals = np.asarray(pos_col.values).astype(np.int64)

        buckets = term_bucket(tids, self.num_buckets)

        order = np.lexsort((docs, tids, buckets, parts))
        parts_s = parts[order]
        buckets_s = buckets[order]
        tids_s = tids[order]
        docs_s = docs[order]
        tfs_s = tfs[order]
        metas_s = metas[order]

        n = len(tids_s)
        run_start = np.ones(n, dtype=bool)
        run_start[1:] = (
            (parts_s[1:] != parts_s[:-1])
            | (buckets_s[1:] != buckets_s[:-1])
            | (tids_s[1:] != tids_s[:-1])
        )
        starts = np.flatnonzero(run_start)
        bounds = np.append(starts, n)
        dfs = np.diff(bounds)

        # doc-id streams (prev = -1 at run starts)
        doc_deltas = np.empty(n, dtype=np.int64)
        doc_deltas[0] = docs_s[0] + 1
        doc_deltas[1:] = docs_s[1:] - docs_s[:-1]
        doc_deltas[starts] = docs_s[starts] + 1
        docs_blob, docs_off = encode_stream_blob(doc_deltas, dfs)

        tfs_blob, tfs_off = encode_stream_blob(tfs_s, dfs)
        metas_bytes = metas_s.tobytes()

        # per-posting position streams, sliced per run
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
        run_pos_off = pos_stream_off[bounds]

        run_tids = tids_s[starts]
        if len(self.hot) and self.num_salts > 1:
            is_hot = np.isin(run_tids, self.hot)
            salt = np.where(
                is_hot,
                (docs_s[starts] % self.num_salts).astype(np.int32),
                np.int32(0),
            )
        else:
            salt = np.zeros(len(starts), dtype=np.int32)

        k = len(starts)
        pos_cnts = pa.ListArray.from_arrays(
            pa.array(bounds.astype(np.int32)), pa.array(L.astype(np.int32))
        )
        return pa.table(
            {
                "part": pa.array(parts_s[starts].astype(np.int32), pa.int32()),
                "bucket": pa.array(buckets_s[starts], pa.int32()),
                "salt": pa.array(salt, pa.int32()),
                "term_id": pa.array(run_tids, pa.int64()),
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
                    [pos_blob[run_pos_off[i] : run_pos_off[i + 1]] for i in range(k)],
                    pa.binary(),
                ),
                "pos_cnts": pos_cnts,
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
        ("pos_cnts", pa.list_(pa.int32())),
    ]



def _empty_run_table() -> pa.Table:
    return pa.table(
        {name: pa.array([], typ) for name, typ in _run_fields()}
    )



def flat_positions_by_counts(
    blob, cnts: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Decode a grouped positions blob to ONE flat absolute-position array
    plus ragged offsets (posting i owns ``flat[offsets[i]:offsets[i+1]]``).
    The flat layout is what the vectorized query path consumes — no
    per-posting Python list materialization."""
    cnts = np.asarray(cnts, dtype=np.int64)
    vals = decode_varints(blob).astype(np.int64)
    nvals = cnts + 1
    hdr = np.cumsum(nvals) - nvals
    mask = np.ones(len(vals), dtype=bool)
    mask[hdr] = False
    payload = vals[mask]
    g = np.cumsum(payload)
    start = np.cumsum(cnts) - cnts
    nonempty = cnts > 0
    base = np.zeros(len(cnts), dtype=np.int64)
    base[nonempty] = g[start[nonempty]] - payload[start[nonempty]]
    abs_pos = g - np.repeat(base, cnts)
    offsets = np.concatenate([[0], np.cumsum(cnts)]).astype(np.int64)
    return abs_pos, offsets


def split_positions_by_counts(blob, cnts: np.ndarray) -> list[np.ndarray]:
    """Like split_positions_blob but with known per-posting counts — no
    header walk, fully vectorized (cumsum + np.split)."""
    abs_pos, offsets = flat_positions_by_counts(blob, cnts)
    return np.split(abs_pos, offsets[1:-1])



def _binary_buffers(col: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(joined bytes, per-cell byte offsets) of a binary array — zero-copy
    views of the Arrow buffers, no per-cell Python bytes objects."""
    n = len(col)
    off = np.frombuffer(col.buffers()[1], dtype=np.int32)[
        col.offset : col.offset + n + 1
    ].astype(np.int64)
    data = np.frombuffer(col.buffers()[2], dtype=np.uint8)[off[0] : off[-1]]
    return data, off - off[0]


def add_block_stats(batch: pa.Table, block: int = POSTING_BLOCK) -> pa.Table:
    """Append per-term BLOCK-MAX side columns to merged posting rows — the
    block-max WAND auxiliary index (Ding & Suel, "Faster Top-k Document
    Retrieval Using Block-Max Indexes", SIGIR'11), adapted to the
    delta+varint posting blobs:

      blk_last    list<int64>  last doc id of each ``block``-posting block
      blk_maxtf   list<int32>  max term frequency within the block
      blk_boff    list<int64>  byte offset of the block's first doc delta
                               inside the ``docs`` blob
      blk_tf_boff list<int64>  same for the ``tfs`` blob

    Terms with df <= ``block`` get empty lists (no overhead for the rare
    tail).  The posting blobs themselves are UNCHANGED — byte-identical to
    the non-block build — because a block can be decoded standalone: its
    first delta is relative to the previous block's ``blk_last`` (or -1
    for block 0, matching encode_doc_ids' prev=-1 convention), so the
    query side can decode ONLY the blocks that may contain candidates and
    skip the rest (query.py _Segment.postings_subset), or early-terminate
    a top-k scan when a block's BM25 upper bound (from blk_maxtf) falls
    below the running threshold.

    Runs as a stateless map_batches stage after the final merge; cost is
    one extra vectorized decode pass over the finished segments.
    """
    n = batch.num_rows
    empty = pa.array([[]] * n, pa.list_(pa.int64()))
    if n == 0 or block <= 0:
        return (
            batch.append_column("blk_last", empty)
            .append_column(
                "blk_maxtf", pa.array([[]] * n, pa.list_(pa.int32()))
            )
            .append_column("blk_boff", empty)
            .append_column("blk_tf_boff", empty)
        )
    dfs = batch["df"].to_numpy(zero_copy_only=False).astype(np.int64)

    docs_data, docs_cell_off = _binary_buffers(batch["docs"].combine_chunks())
    tfs_data, tfs_cell_off = _binary_buffers(batch["tfs"].combine_chunks())

    # decode every stream in one pass; value i's byte start = byte_pos[i]
    docs_vals = decode_varints(docs_data).astype(np.int64)
    tfs_vals = decode_varints(tfs_data).astype(np.int64)
    from ..functions.codecs import _varint_widths

    dw = _varint_widths(docs_vals.astype(np.uint64))
    tw = _varint_widths(tfs_vals.astype(np.uint64))
    docs_byte_pos = np.cumsum(dw) - dw
    tfs_byte_pos = np.cumsum(tw) - tw

    nvals = dfs + 1  # [count+1 header, payload...]
    val_start = np.cumsum(nvals) - nvals
    hdr = np.zeros(len(docs_vals), dtype=bool)
    hdr[val_start] = True
    deltas = docs_vals[~hdr]
    tf_payload = tfs_vals[~hdr]
    pay_start = np.cumsum(dfs) - dfs
    g = np.cumsum(deltas)
    base = np.repeat(g[pay_start] - deltas[pay_start], dfs)
    docs_flat = g - base - 1  # absolute doc ids, all terms concatenated

    # blocks over EVERY term (so reduceat segments partition the payload
    # exactly); only terms with df > block emit their blocks
    nb_all = (dfs + block - 1) // block
    tob = np.repeat(np.arange(n), nb_all)  # term of block
    starts_b = np.cumsum(nb_all) - nb_all
    bix = np.arange(len(tob)) - np.repeat(starts_b, nb_all)  # block# in term
    s_post = bix * block  # first posting index (within term)
    e_post = np.minimum(s_post + block, dfs[tob]) - 1  # last posting index

    blk_last_all = docs_flat[pay_start[tob] + e_post]
    blk_maxtf_all = np.maximum.reduceat(tf_payload, pay_start[tob] + s_post)
    # byte offset of delta s within the term's blob (value index of delta
    # s is val_start + 1 + s; subtract the term's blob start byte)
    v_idx = val_start[tob] + 1 + s_post
    blk_boff_all = docs_byte_pos[v_idx] - docs_cell_off[tob]
    blk_tf_boff_all = tfs_byte_pos[v_idx] - tfs_cell_off[tob]

    eligible = dfs > block
    keep = eligible[tob]
    nb_emit = np.where(eligible, nb_all, 0)
    offs = pa.array(
        np.concatenate([[0], np.cumsum(nb_emit)]).astype(np.int32)
    )

    def _list(vals: np.ndarray, typ) -> pa.ListArray:
        return pa.ListArray.from_arrays(offs, pa.array(vals[keep], typ))

    return (
        batch.append_column("blk_last", _list(blk_last_all, pa.int64()))
        .append_column(
            "blk_maxtf", _list(blk_maxtf_all.astype(np.int32), pa.int32())
        )
        .append_column("blk_boff", _list(blk_boff_all, pa.int64()))
        .append_column("blk_tf_boff", _list(blk_tf_boff_all, pa.int64()))
    )


# Max runs of one term a single merge step consumes; beyond it the term's
# runs merge in a tree of fanin-sized partial merges (hierarchical merge
# for ultra-hot terms: bounds the working set any one step decodes).
MERGE_FANIN = 256


def merge_runs_tree(group: pa.Table, fanin: int = MERGE_FANIN) -> pa.Table:
    """Hierarchical k-way merge: while any term has more than ``fanin``
    runs, consecutive fanin-sized slices of its runs merge into partial
    runs, preserving run order (stable) so first-wins dedup — and hence
    the final posting bytes — are IDENTICAL to a single-pass merge.

    The cross-task analog is the salted pre-merge (groupby
    (part,bucket,salt) before (part,bucket)); this bounds the in-task
    fan-in on top of it.  Mirrors FullPreindex.mergeSegments' associative
    merge semantics (FullPreindex.java:255-274)."""
    done: list[pa.Table] = []
    tbl = group
    while True:
        tids = tbl["term_id"].to_numpy(zero_copy_only=False)
        if len(tids) == 0:
            break
        uniq, counts = np.unique(tids, return_counts=True)
        if int(counts.max()) <= fanin:
            done.append(MergeWorker()(tbl))
            break
        # split finished (<= fanin runs) terms out so each level only
        # re-merges the still-hot terms
        hot_terms = uniq[counts > fanin]
        is_hot = np.isin(tids, hot_terms)
        cold = tbl.filter(pa.array(~is_hot))
        if len(cold):
            done.append(MergeWorker()(cold))
        tbl = tbl.filter(pa.array(is_hot))
        tids = tids[is_hot]
        _, counts = np.unique(tids, return_counts=True)
        order = np.argsort(tids, kind="stable")
        starts = np.cumsum(counts) - counts
        occ = np.arange(len(tids)) - np.repeat(starts, counts)
        chunk = occ // fanin
        parts = []
        for c in range(int(chunk.max()) + 1):
            sub = tbl.take(pa.array(order[chunk == c]))
            parts.append(MergeWorker()(sub))
        tbl = pa.concat_tables(parts)
    if not done:
        return MergeWorker()(group)
    out = pa.concat_tables(done) if len(done) > 1 else done[0]
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
        from ..functions.codecs import encode_stream_blob

        tids = group["term_id"].to_numpy(zero_copy_only=False)
        uniq, counts = np.unique(tids, return_counts=True)
        drop = [c for c in ("salt",) if c in group.column_names]
        self.groups_merged += 1

        # fast path: every term has exactly one run
        if len(uniq) == len(tids):
            return group.drop_columns(drop)

        # vectorized passthrough for single-run terms
        multi_terms = uniq[counts > 1]
        is_multi = np.isin(tids, multi_terms)
        single_tbl = group.filter(pa.array(~is_multi)).drop_columns(drop)
        multi = group.filter(pa.array(is_multi))

        # order runs by term so each term's runs are adjacent (stable:
        # earlier runs win dedup ties, FullPreindex.merge:191-195)
        m_tids = multi["term_id"].to_numpy(zero_copy_only=False)
        run_order = np.argsort(m_tids, kind="stable")
        multi = multi.take(pa.array(run_order))
        m_tids = m_tids[run_order]
        dfs = multi["df"].to_numpy(zero_copy_only=False).astype(np.int64)
        self.runs_merged += len(m_tids)

        # ---- decode every run in a few vectorized passes ----------------
        docs_vals = decode_varints(
            b"".join(multi["docs"].to_pylist())
        ).astype(np.int64)
        nvals = dfs + 1
        val_start = np.cumsum(nvals) - nvals
        hdr_mask = np.zeros(len(docs_vals), dtype=bool)
        hdr_mask[val_start] = True
        deltas = docs_vals[~hdr_mask]
        P = len(deltas)
        post_start = np.cumsum(dfs) - dfs
        g = np.cumsum(deltas)
        base = np.repeat(g[post_start] - deltas[post_start], dfs)
        docs_flat = g - base - 1

        tf_vals = decode_varints(
            b"".join(multi["tfs"].to_pylist())
        ).astype(np.int64)
        tfs_flat = tf_vals[~hdr_mask]

        metas_flat = np.frombuffer(b"".join(multi["metas"].to_pylist()), dtype="<i8")

        # positions: per-posting streams [cnt+1, deltas...]; the payload is
        # reorder-invariant, so merging gathers payload slices by posting
        pc_col = multi["pos_cnts"].combine_chunks()
        pos_cnts_flat = np.asarray(pc_col.values).astype(np.int64)
        pos_vals = decode_varints(
            b"".join(multi["positions"].to_pylist())
        ).astype(np.int64)
        pval_n = pos_cnts_flat + 1
        pval_start = np.cumsum(pval_n) - pval_n
        phdr = np.zeros(len(pos_vals), dtype=bool)
        phdr[pval_start] = True
        pos_payload = pos_vals[~phdr]
        pay_start = np.cumsum(pos_cnts_flat) - pos_cnts_flat

        terms_flat = np.repeat(m_tids, dfs)

        # ---- merge: sort (term, doc), first-wins dedup ------------------
        o = np.lexsort((docs_flat, terms_flat))
        t_m = terms_flat[o]
        d_m = docs_flat[o]
        keep = np.ones(P, dtype=bool)
        keep[1:] = (t_m[1:] != t_m[:-1]) | (d_m[1:] != d_m[:-1])
        o = o[keep]
        t_m = t_m[keep]
        d_m = d_m[keep]
        tf_m = tfs_flat[o]
        me_m = metas_flat[o]
        cnt_m = pos_cnts_flat[o]

        u3, starts3 = np.unique(t_m, return_index=True)
        bounds3 = np.append(starts3, len(t_m))
        df_m = np.diff(bounds3)
        k = len(u3)

        dd = np.empty(len(d_m), dtype=np.int64)
        dd[0] = d_m[0] + 1
        dd[1:] = d_m[1:] - d_m[:-1]
        dd[starts3] = d_m[starts3] + 1
        docs_blob, docs_off = encode_stream_blob(dd, df_m)
        tfs_blob, tfs_off = encode_stream_blob(tf_m, df_m)
        metas_bytes = me_m.astype("<i8").tobytes()

        tot = int(cnt_m.sum())
        gi = np.repeat(
            pay_start[o] - (np.cumsum(cnt_m) - cnt_m), cnt_m
        ) + np.arange(tot)
        new_payload = pos_payload[gi]
        pos_blob, pos_off2 = encode_stream_blob(new_payload, cnt_m)
        term_pos_off = pos_off2[bounds3]
        pos_cnts_out = pa.ListArray.from_arrays(
            pa.array(bounds3.astype(np.int32)), pa.array(cnt_m.astype(np.int32))
        )

        part = group["part"][0].as_py()
        bucket = group["bucket"][0].as_py()
        merged_tbl = pa.table(
            {
                "part": pa.array(np.full(k, part, dtype=np.int32), pa.int32()),
                "bucket": pa.array(np.full(k, bucket, dtype=np.int32), pa.int32()),
                "term_id": pa.array(u3, pa.int64()),
                "df": pa.array(df_m, pa.int64()),
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
                        metas_bytes[8 * int(bounds3[i]) : 8 * int(bounds3[i + 1])]
                        for i in range(k)
                    ],
                    pa.binary(),
                ),
                "positions": pa.array(
                    [
                        pos_blob[term_pos_off[i] : term_pos_off[i + 1]]
                        for i in range(k)
                    ],
                    pa.binary(),
                ),
                "pos_cnts": pos_cnts_out,
            }
        )
        return pa.concat_tables(
            [single_tbl.select(merged_tbl.column_names), merged_tbl]
        )

def strip_posting_tombstones(
    batch: pa.Table,
    tomb: np.ndarray,
    affected_terms: np.ndarray | None = None,
    block: int | None = None,
) -> pa.Table:
    """Remove tombstoned doc ids from MERGED posting rows in place — the
    blob-level compaction kernel: instead of re-running the reverse build
    from a merged journal, a prior segment's finished posting rows are
    rewritten directly, and only the rows that actually contain a
    tombstoned posting are decoded + re-encoded (everything else passes
    through zero-copy).

    ``tomb`` is the sorted union of combined ids tombstoned against this
    segment by later deltas; ``affected_terms`` (sorted) is an optional
    prefilter — the union of the later deltas' df-correction term ids,
    which by construction (delta.py _corr_partial walks the tombstoned
    journal rows' term lists) is EXACTLY the set of terms whose posting
    lists contain a tombstoned doc, so rows outside it skip even the
    docs-blob decode.

    Mirrors what the reference's merge achieves by omission (stale
    journal pages simply aren't fed to FullPreindex); here the stale
    postings are already baked into finished blobs, so they are cut out.
    Blob bytes after the cut are byte-identical to a from-scratch encode
    of the surviving postings (delta coding is order-deterministic).
    """
    from ..functions.codecs import encode_stream_blob
    from ..pipelines.query import _membership

    n = batch.num_rows
    if n == 0 or len(tomb) == 0:
        return batch
    blk = [c for c in batch.column_names if c.startswith("blk_")]
    if blk and block is None:
        # legacy flow: a downstream add_block_stats recomputes for all rows
        batch = batch.drop_columns(blk)
        blk = []
    keep_cols = batch.column_names
    tids = batch["term_id"].to_numpy(zero_copy_only=False)
    if affected_terms is not None:
        cand_mask = _membership(tids, affected_terms)
        if not cand_mask.any():
            return batch
        passthrough = batch.filter(pa.array(~cand_mask))
        work = batch.filter(pa.array(cand_mask))
    else:
        passthrough = None
        work = batch

    # ---- detect: decode ONLY the docs blobs of candidate rows ----------
    dfs = work["df"].to_numpy(zero_copy_only=False).astype(np.int64)
    docs_data, _ = _binary_buffers(work["docs"].combine_chunks())
    docs_vals = decode_varints(docs_data).astype(np.int64)
    nvals = dfs + 1
    val_start = np.cumsum(nvals) - nvals
    hdr = np.zeros(len(docs_vals), dtype=bool)
    hdr[val_start] = True
    deltas = docs_vals[~hdr]
    pay_start = np.cumsum(dfs) - dfs
    g = np.cumsum(deltas)
    base = np.repeat(g[pay_start] - deltas[pay_start], dfs)
    docs_flat = g - base - 1
    hit = _membership(docs_flat, tomb)
    row_of = np.repeat(np.arange(len(work)), dfs)
    row_hit = np.zeros(len(work), dtype=bool)
    row_hit[row_of[hit]] = True
    clean = work.filter(pa.array(~row_hit))
    parts = [t for t in (passthrough, clean) if t is not None and len(t)]
    if not row_hit.any():
        return batch

    # ---- rewrite: full decode of the affected rows only ----------------
    aff = work.filter(pa.array(row_hit))
    a_dfs = dfs[row_hit]
    post_keep = ~hit[row_hit[row_of]]  # per-posting keep, affected rows
    a_docs = docs_flat[row_hit[row_of]]
    a_row = np.repeat(np.arange(len(aff)), a_dfs)

    tfs_data, _ = _binary_buffers(aff["tfs"].combine_chunks())
    tfs_vals = decode_varints(tfs_data).astype(np.int64)
    a_nvals = a_dfs + 1
    a_val_start = np.cumsum(a_nvals) - a_nvals
    a_hdr = np.zeros(len(tfs_vals), dtype=bool)
    a_hdr[a_val_start] = True
    tfs_flat = tfs_vals[~a_hdr]

    metas_data, _ = _binary_buffers(aff["metas"].combine_chunks())
    metas_flat = np.frombuffer(metas_data.tobytes(), dtype="<i8")

    pc_col = aff["pos_cnts"].combine_chunks()
    pos_cnts_flat = np.asarray(pc_col.values).astype(np.int64)
    pos_data, _ = _binary_buffers(aff["positions"].combine_chunks())
    pos_vals = decode_varints(pos_data).astype(np.int64)
    pval_n = pos_cnts_flat + 1
    pval_start = np.cumsum(pval_n) - pval_n
    phdr = np.zeros(len(pos_vals), dtype=bool)
    phdr[pval_start] = True
    pos_payload = pos_vals[~phdr]

    new_dfs = np.bincount(a_row[post_keep], minlength=len(aff)).astype(np.int64)
    nz = new_dfs > 0  # rows whose every posting was tombstoned vanish
    k_docs = a_docs[post_keep]
    k_tfs = tfs_flat[post_keep]
    k_metas = metas_flat[post_keep]
    k_cnts = pos_cnts_flat[post_keep]
    out_dfs = new_dfs[nz]
    k = len(out_dfs)
    if k:
        starts = np.cumsum(out_dfs) - out_dfs
        dd = np.empty(len(k_docs), dtype=np.int64)
        dd[0] = k_docs[0] + 1
        dd[1:] = k_docs[1:] - k_docs[:-1]
        dd[starts] = k_docs[starts] + 1
        docs_blob, docs_off = encode_stream_blob(dd, out_dfs)
        tfs_blob, tfs_off = encode_stream_blob(k_tfs, out_dfs)
        metas_bytes = k_metas.astype("<i8").tobytes()
        # per-posting position streams are self-contained: gather payload
        # slices of the kept postings, re-emit headers via the encoder
        ppay_start = np.cumsum(pos_cnts_flat) - pos_cnts_flat
        tot = int(k_cnts.sum())
        gi = np.repeat(
            ppay_start[post_keep] - (np.cumsum(k_cnts) - k_cnts), k_cnts
        ) + np.arange(tot)
        pos_blob, pos_off = encode_stream_blob(pos_payload[gi], k_cnts)
        bounds = np.append(starts, len(k_docs))
        term_pos_off = pos_off[bounds]
        cols: dict = {}
        if "part" in aff.column_names:
            cols["part"] = aff["part"].filter(pa.array(nz))
        cols.update(
            {
                "bucket": aff["bucket"].filter(pa.array(nz)),
                "term_id": aff["term_id"].filter(pa.array(nz)),
                "df": pa.array(out_dfs, pa.int64()),
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
                "pos_cnts": pa.ListArray.from_arrays(
                    pa.array(bounds.astype(np.int32)),
                    pa.array(k_cnts.astype(np.int32)),
                ),
            }
        )
        out = pa.table(cols)
        if blk:
            # ``block`` mode: untouched rows kept their blk_* side
            # columns; recompute ONLY the rewritten rows' (the blob
            # changed, so last-doc/maxtf/offsets did too)
            out = add_block_stats(
                out.select([c for c in keep_cols if not c.startswith("blk_")]),
                block=block,
            )
        parts.append(out.select(keep_cols))
    if not parts:
        return batch.slice(0, 0)
    return pa.concat_tables(parts) if len(parts) > 1 else parts[0]
