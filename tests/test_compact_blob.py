"""Blob-level compaction strip kernels: cutting tombstoned postings out
of FINISHED posting rows must be byte-identical to re-encoding the
surviving postings from scratch (delta/varint and gamma/delta coding are
order-deterministic), for both the full reverse index and the prio
index.  Mirrors the reference's merge-by-omission semantics
(FullPreindex.java merge: stale journal pages simply aren't fed in; here
the stale postings are already baked into blobs, so they are cut out)."""

import numpy as np
import pyarrow as pa
import pytest

from marginaliasearch_ray.functions import idcodec
from marginaliasearch_ray.stages.prio import (
    encode_prio_batch_runs,
    merge_prio_group,
    strip_prio_tombstones,
)
from marginaliasearch_ray.stages.reverse import (
    EncodeBatchRuns,
    MergeWorker,
    add_block_stats,
    strip_posting_tombstones,
)

NTERM = 40


def _journal_batch(doc_ids):
    """Deterministic per-doc content so a filtered corpus re-encode is
    comparable to a strip of the full encode."""
    term_ids, tfs, metas, poss = [], [], [], []
    for d in doc_ids:
        r = np.random.default_rng(int(d) & 0x7FFFFFFF)
        k = int(r.integers(3, 12))
        ts = np.sort(r.choice(np.arange(1, NTERM + 1) * 1000, size=k, replace=False))
        term_ids.append(ts.tolist())
        tfs.append(r.integers(1, 5, size=k).tolist())
        metas.append([int(m) for m in r.integers(0, 2**20, size=k)])
        poss.append(
            [
                np.sort(
                    r.choice(np.arange(1, 300), size=int(r.integers(1, 6)), replace=False)
                ).tolist()
                for _ in range(k)
            ]
        )
    return pa.table(
        {
            "part": pa.array([0] * len(doc_ids), pa.int32()),
            "combined_id": pa.array(doc_ids, pa.int64()),
            "term_ids": pa.array(term_ids, pa.list_(pa.int64())),
            "term_tfs": pa.array(tfs, pa.list_(pa.int64())),
            "term_meta": pa.array(metas, pa.list_(pa.int64())),
            "term_positions": pa.array(poss, pa.list_(pa.list_(pa.int64()))),
        }
    )


def _canon(t: pa.Table) -> dict:
    t = t.sort_by("term_id")
    return {c: t[c].to_pylist() for c in t.column_names}


@pytest.fixture(scope="module")
def full_index():
    rng = np.random.default_rng(7)
    all_docs = np.sort(rng.choice(np.arange(1, 10_000), size=200, replace=False))
    batch = _journal_batch(all_docs)
    enc = EncodeBatchRuns(set(), 1, 1)
    full = MergeWorker()(enc(batch))
    tomb = np.sort(rng.choice(all_docs, size=30, replace=False)).astype(np.int64)
    expect = MergeWorker()(enc(_journal_batch(all_docs[~np.isin(all_docs, tomb)])))
    return batch, all_docs, full, tomb, expect


def _affected_terms(batch, tomb):
    tid, doc = [], []
    for d, ts in zip(batch["combined_id"].to_pylist(), batch["term_ids"].to_pylist()):
        for t in ts:
            tid.append(t)
            doc.append(d)
    tid, doc = np.array(tid), np.array(doc)
    return np.unique(tid[np.isin(doc, tomb)])


def test_strip_postings_byte_identity(full_index):
    batch, all_docs, full, tomb, expect = full_index
    got = _canon(strip_posting_tombstones(full, tomb))
    want = _canon(expect)
    assert got.keys() == want.keys()
    for c in got:
        assert got[c] == want[c], c


def test_strip_postings_affected_term_prefilter(full_index):
    batch, all_docs, full, tomb, expect = full_index
    aff = _affected_terms(batch, tomb)
    got = _canon(strip_posting_tombstones(full, tomb, affected_terms=aff))
    want = _canon(expect)
    for c in got:
        assert got[c] == want[c], c


def test_strip_postings_edges(full_index):
    batch, all_docs, full, tomb, _ = full_index
    # no tombstone hits: passthrough (minus blk_* side columns)
    full_blk = add_block_stats(full, block=8)
    miss = strip_posting_tombstones(full_blk, np.array([10**9], dtype=np.int64))
    assert _canon(miss) == _canon(full)
    # every doc tombstoned: everything vanishes
    assert len(strip_posting_tombstones(full, all_docs.astype(np.int64))) == 0
    # empty tombstone set: identity
    assert strip_posting_tombstones(full, np.empty(0, np.int64)) is full


def _prio_journal(doc_ids):
    term_ids, metas = [], []
    for d in doc_ids:
        r = np.random.default_rng(int(d) & 0x7FFFFFFF)
        k = int(r.integers(3, 10))
        ts = np.sort(r.choice(np.arange(1, 30) * 1000, size=k, replace=False))
        term_ids.append(ts.tolist())
        metas.append([int(m) for m in r.integers(0, 2, size=k) * 3])
    return pa.table(
        {
            "part": pa.array([0] * len(doc_ids), pa.int32()),
            "combined_id": pa.array(doc_ids, pa.int64()),
            "term_ids": pa.array(term_ids, pa.list_(pa.int64())),
            "term_meta": pa.array(metas, pa.list_(pa.int64())),
        }
    )


def test_strip_prio_byte_identity():
    rng = np.random.default_rng(3)
    ids = np.unique(
        np.array(
            [
                int(idcodec.encode_id_with_rank(int(a), int(b), int(c)))
                for a, b, c in zip(
                    rng.integers(0, 5, 150),
                    rng.integers(0, 40, 150),
                    rng.integers(0, 50, 150),
                )
            ]
        )
    )
    batch = _prio_journal(ids)
    full = merge_prio_group(encode_prio_batch_runs(batch, 1))
    tomb = np.sort(rng.choice(ids, size=25, replace=False)).astype(np.int64)
    expect = merge_prio_group(
        encode_prio_batch_runs(_prio_journal(ids[~np.isin(ids, tomb)]), 1)
    )
    got = _canon(strip_prio_tombstones(full, tomb))
    want = _canon(expect)
    for c in got:
        assert got[c] == want[c], c
    # prio-affected prefilter: terms with a tombstoned FLAGGED posting
    tid, doc, fl = [], [], []
    for d, ts, ms in zip(
        batch["combined_id"].to_pylist(),
        batch["term_ids"].to_pylist(),
        batch["term_meta"].to_pylist(),
    ):
        for t, m in zip(ts, ms):
            tid.append(t)
            doc.append(d)
            fl.append((m & 0xFF) != 0)
    tid, doc, fl = map(np.array, (tid, doc, fl))
    aff = np.unique(tid[np.isin(doc, tomb) & fl])
    got2 = _canon(strip_prio_tombstones(full, tomb, affected_terms=aff))
    for c in got2:
        assert got2[c] == want[c], c
    # full-vanish and identity edges
    assert len(strip_prio_tombstones(full, ids.astype(np.int64))) == 0
    assert strip_prio_tombstones(full, np.empty(0, np.int64)) is full
