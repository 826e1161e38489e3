"""MergeWorker vectorized k-way merge vs a naive reference merge over
randomized runs (mirrors the reference's merge semantics tests)."""

import random

import numpy as np
import pyarrow as pa

from marginaliasearch_ray.functions.codecs import (
    decode_counts,
    decode_doc_ids,
)
from marginaliasearch_ray.stages.reverse import (
    MergeWorker,
    split_positions_by_counts,
)
from marginaliasearch_ray.functions.codecs import encode_stream_blob


def make_run(part, bucket, salt, term_id, postings):
    """postings: list of (doc, tf, meta, positions[list])"""
    postings = sorted(postings, key=lambda x: x[0])
    docs = np.array([p[0] for p in postings], dtype=np.int64)
    dd = np.diff(docs, prepend=np.int64(-1))
    docs_blob, _ = encode_stream_blob(dd, np.array([len(docs)]))
    tfs_blob, _ = encode_stream_blob(
        np.array([p[1] for p in postings], dtype=np.int64), np.array([len(docs)])
    )
    metas = np.array([p[2] for p in postings], dtype="<i8").tobytes()
    pos_payload = []
    cnts = []
    for p in postings:
        pos = np.asarray(p[3], dtype=np.int64)
        cnts.append(len(pos))
        if len(pos):
            pos_payload.append(np.diff(pos, prepend=np.int64(0)))
    payload = (
        np.concatenate(pos_payload) if pos_payload else np.array([], dtype=np.int64)
    )
    pos_blob, _ = encode_stream_blob(payload, np.array(cnts, dtype=np.int64))
    return {
        "part": part,
        "bucket": bucket,
        "salt": salt,
        "term_id": term_id,
        "df": len(docs),
        "docs": docs_blob,
        "tfs": tfs_blob,
        "metas": metas,
        "positions": pos_blob,
        "pos_cnts": cnts,
    }


def to_table(rows):
    return pa.table(
        {
            "part": pa.array([r["part"] for r in rows], pa.int32()),
            "bucket": pa.array([r["bucket"] for r in rows], pa.int32()),
            "salt": pa.array([r["salt"] for r in rows], pa.int32()),
            "term_id": pa.array([r["term_id"] for r in rows], pa.int64()),
            "df": pa.array([r["df"] for r in rows], pa.int64()),
            "docs": pa.array([r["docs"] for r in rows], pa.binary()),
            "tfs": pa.array([r["tfs"] for r in rows], pa.binary()),
            "metas": pa.array([r["metas"] for r in rows], pa.binary()),
            "positions": pa.array([r["positions"] for r in rows], pa.binary()),
            "pos_cnts": pa.array([r["pos_cnts"] for r in rows], pa.list_(pa.int32())),
        }
    )


def decode_term(tbl, term_id):
    i = tbl["term_id"].to_pylist().index(term_id)
    df = tbl["df"][i].as_py()
    docs = decode_doc_ids(tbl["docs"][i].as_py())
    tfs = decode_counts(tbl["tfs"][i].as_py())
    metas = np.frombuffer(tbl["metas"][i].as_py(), dtype="<i8")
    cnts = np.asarray(tbl["pos_cnts"][i].as_py(), dtype=np.int64)
    pos = split_positions_by_counts(tbl["positions"][i].as_py(), cnts)
    assert df == len(docs) == len(tfs) == len(metas) == len(pos)
    return docs, tfs, metas, [p.tolist() for p in pos]


def test_merge_randomized_runs():
    rng = random.Random(17)
    truth: dict[int, dict[int, tuple]] = {}
    rows = []
    for term in [100, 200, 300]:
        n_runs = rng.randrange(2, 6)
        truth[term] = {}
        used_docs: set[int] = set()
        for s in range(n_runs):
            postings = []
            for _ in range(rng.randrange(1, 30)):
                doc = rng.randrange(0, 5000)
                if doc in used_docs:
                    continue
                used_docs.add(doc)
                tf = rng.randrange(1, 20)
                meta = rng.randrange(0, 1 << 40)
                npos = rng.randrange(0, 6)
                pos = sorted(rng.sample(range(1, 1000), npos))
                postings.append((doc, tf, meta, pos))
                truth[term][doc] = (tf, meta, pos)
            if postings:
                rows.append(make_run(0, 3, s, term, postings))
    # one single-run term for the passthrough path
    rows.append(make_run(0, 3, 0, 999, [(7, 2, 11, [1, 5])]))
    truth[999] = {7: (2, 11, [1, 5])}

    out = MergeWorker()(to_table(rows))
    assert "salt" not in out.column_names
    for term, docs_map in truth.items():
        docs, tfs, metas, pos = decode_term(out, term)
        assert docs.tolist() == sorted(docs_map)
        for j, d in enumerate(docs.tolist()):
            tf, meta, p = docs_map[d]
            assert tfs[j] == tf
            assert metas[j] == meta
            assert pos[j] == p


def test_merge_duplicate_first_wins():
    r1 = make_run(0, 1, 0, 42, [(5, 1, 111, [1])])
    r2 = make_run(0, 1, 1, 42, [(5, 9, 222, [2]), (6, 3, 333, [3])])
    extra = make_run(0, 1, 0, 43, [(1, 1, 1, [])])
    out = MergeWorker()(to_table([r1, r2, extra]))
    docs, tfs, metas, pos = decode_term(out, 42)
    assert docs.tolist() == [5, 6]
    assert tfs.tolist() == [1, 3]  # first run wins for doc 5
    assert metas.tolist() == [111, 333]
    assert pos == [[1], [3]]


def test_hierarchical_merge_byte_identical():
    """A term with thousands of runs merged through the fanin tree must
    produce byte-identical posting rows to the single-pass merge."""
    from marginaliasearch_ray.stages.reverse import merge_runs_tree

    rng = random.Random(7)
    rows = []
    # hot term: 2000 runs of 1-3 postings each, overlapping doc ids so
    # first-wins dedup actually engages across runs
    for r in range(2000):
        postings = [
            (rng.randrange(0, 5000), rng.randrange(1, 9), rng.randrange(0, 255),
             sorted(rng.sample(range(1, 200), rng.randrange(1, 4))))
            for _ in range(rng.randrange(1, 4))
        ]
        # unique docs within a run
        seen, uniq_p = set(), []
        for p in postings:
            if p[0] not in seen:
                seen.add(p[0])
                uniq_p.append(p)
        rows.append(make_run(0, 0, r % 4, 42, uniq_p))
    # a couple of normal terms
    for t in (7, 9):
        rows.append(make_run(0, 0, 0, t, [(1, 2, 3, [4, 8]), (5, 1, 0, [2])]))
    tbl = to_table(rows)

    single = MergeWorker()(tbl)
    tree = merge_runs_tree(tbl, fanin=8)

    s = single.sort_by("term_id")
    t = tree.sort_by("term_id")
    assert s.column_names == t.column_names
    for col in s.column_names:
        assert s[col].to_pylist() == t[col].to_pylist(), col
