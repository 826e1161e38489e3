"""Incrementally-maintained vector store (similarity.build_vector_store /
append_vector_store / vector_store_topk): generations route through the
base's FROZEN centroids/planes, the newest generation of a vec_id wins,
and probe-bucket top-k equals an independent numpy oracle computed over
the corpus-with-replacement — the delta-segment contract
(pipelines/delta.py) applied to embeddings."""

import numpy as np
import pyarrow as pa
import pytest

from marginaliasearch_ray.pipelines.similarity import (
    _lsh_planes,
    append_vector_store,
    build_vector_store,
    compact_vector_store,
    vector_store_topk,
)


def _emb_table(ids, mat):
    return pa.table(
        {
            "vec_id": pa.array(list(ids), pa.int64()),
            "embedding": pa.array(
                [list(map(float, r)) for r in mat], pa.list_(pa.float64())
            ),
        }
    )


def _expected_ivf(current, cents, q, k, nprobe):
    ids = np.array(sorted(current), dtype=np.int64)
    mat = np.array([current[i] for i in ids], dtype=np.float64)
    matn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    bucket = np.argmax(matn @ cents.T, axis=1)
    probe = set(
        np.argsort(-(cents @ (q / np.linalg.norm(q))))[:nprobe].tolist()
    )
    keep = np.array([b in probe for b in bucket])
    ids, mat = ids[keep], mat[keep]
    cos = np.round(
        (mat @ q) / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q)), 6
    )
    order = np.lexsort((ids, -cos))[:k]
    return [(int(ids[i]), float(cos[i])) for i in order]


def _expected_lsh(current, q, k, n_planes):
    ids = np.array(sorted(current), dtype=np.int64)
    mat = np.array([current[i] for i in ids], dtype=np.float64)
    planes = _lsh_planes(mat.shape[1], n_planes)

    def sig_of(v):  # little-endian bit int over ALL planes
        bits = (v @ planes > 0).astype(int)
        return int(sum(b << i for i, b in enumerate(bits)))

    sig = np.array([sig_of(r) for r in mat])
    qsig = sig_of(q)
    probe = {qsig} | {qsig ^ (1 << i) for i in range(n_planes)}
    keep = np.array([s in probe for s in sig])
    ids, mat = ids[keep], mat[keep]
    cos = np.round(
        (mat @ q) / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q)), 6
    )
    order = np.lexsort((ids, -cos))[:k]
    return [(int(ids[i]), float(cos[i])) for i in order]


def _got(ds):
    return [(r["vec_id"], r["cos_r"]) for r in ds.take_all()]


@pytest.fixture(scope="module")
def vecs():
    rng = np.random.RandomState(7)
    return rng.standard_normal((60, 8))


def test_ivf_store_append_newest_wins(ray_session, tmp_path, vecs):
    out = str(tmp_path / "vs_ivf")
    base_ids = list(range(40))
    build_vector_store(
        _emb_table(base_ids, vecs[:40]), out, kind="ivf", n_centroids=8
    )
    # frozen centroids = first 8 base vectors, normalized
    cents = vecs[:8] / np.linalg.norm(vecs[:8], axis=1, keepdims=True)

    # gen 1: 16 fresh vectors + 2 updates (negated)
    g1_ids = list(range(40, 56)) + [3, 10]
    g1_mat = np.vstack([vecs[40:56], -vecs[[3, 10]]])
    r = append_vector_store(out, _emb_table(g1_ids, g1_mat))
    assert r == {"generation": 1, "n_vectors": 18}

    # gen 2: 4 fresh + re-update id 3 (offset) + update a gen-1 id (41)
    g2_ids = list(range(56, 60)) + [3, 41]
    g2_mat = np.vstack([vecs[56:60], [vecs[3] + 1.0], [-vecs[41]]])
    append_vector_store(out, _emb_table(g2_ids, g2_mat))

    current = {i: vecs[i] for i in range(60)}
    current[10] = -vecs[10]
    current[3] = vecs[3] + 1.0
    current[41] = -vecs[41]

    q = vecs[0]
    got = _got(vector_store_topk(out, q, k=10, nprobe=3))
    assert got == _expected_ivf(current, cents, q, 10, 3)

    # a second query vector probes different buckets
    q2 = vecs[45]
    got2 = _got(vector_store_topk(out, q2, k=7, nprobe=2))
    assert got2 == _expected_ivf(current, cents, q2, 7, 2)

    # compaction folds the chain into one generation: stale copies are
    # physically dropped, buckets stay as assigned, queries unchanged
    import json
    import os

    r = compact_vector_store(out)
    assert r["generations_folded"] == 3
    assert r["n_vectors"] == 60  # 60 live ids, stale copies purged
    assert json.load(open(os.path.join(out, "store.json")))["generations"] == 1
    assert not os.path.isdir(os.path.join(out, "gen_0001"))
    assert _got(vector_store_topk(out, q, k=10, nprobe=3)) == got
    assert _got(vector_store_topk(out, q2, k=7, nprobe=2)) == got2
    # and the compacted store accepts further generations
    append_vector_store(out, _emb_table([60], vecs[[20]] + 0.5))
    current[60] = vecs[20] + 0.5
    assert _got(vector_store_topk(out, q, k=10, nprobe=3)) == _expected_ivf(
        current, cents, q, 10, 3
    )


def test_lsh_store_append(ray_session, tmp_path, vecs):
    out = str(tmp_path / "vs_lsh")
    build_vector_store(
        _emb_table(range(40), vecs[:40]), out, kind="lsh", n_planes=6
    )
    append_vector_store(
        out,
        _emb_table(
            list(range(40, 60)) + [5], np.vstack([vecs[40:60], -vecs[[5]]])
        ),
    )
    current = {i: vecs[i] for i in range(60)}
    current[5] = -vecs[5]
    q = vecs[2]
    got = _got(vector_store_topk(out, q, k=10))
    assert got == _expected_lsh(current, q, 10, 6)


def test_append_rejects_duplicate_ids(ray_session, tmp_path, vecs):
    out = str(tmp_path / "vs_dup")
    build_vector_store(
        _emb_table(range(20), vecs[:20]), out, kind="ivf", n_centroids=4
    )
    with pytest.raises(ValueError, match="duplicate vec_ids"):
        append_vector_store(out, _emb_table([20, 20], vecs[20:22]))


def test_crashed_append_is_ignored_then_overwritten(
    ray_session, tmp_path, vecs
):
    """A generation dir without a store.json reference (crash before the
    manifest-last commit) is invisible to queries and cleared by the next
    append."""
    import os
    import shutil

    out = str(tmp_path / "vs_crash")
    build_vector_store(
        _emb_table(range(20), vecs[:20]), out, kind="ivf", n_centroids=4
    )
    cents = vecs[:4] / np.linalg.norm(vecs[:4], axis=1, keepdims=True)
    # simulate a crashed append: gen dir present, manifest not bumped
    append_vector_store(out, _emb_table([99], vecs[[40]]))
    meta_path = os.path.join(out, "store.json")
    import json

    meta = json.load(open(meta_path))
    meta["gens"] = ["gen_0000"]
    meta["generations"] = 1
    json.dump(meta, open(meta_path, "w"))
    assert os.path.isdir(os.path.join(out, "gen_0001"))

    current = {i: vecs[i] for i in range(20)}
    q = vecs[1]
    got = _got(vector_store_topk(out, q, k=5, nprobe=2))
    assert got == _expected_ivf(current, cents, q, 5, 2)

    # next append reclaims the orphan dir and commits cleanly
    append_vector_store(out, _emb_table([21], vecs[[21]]))
    current[21] = vecs[21]
    got = _got(vector_store_topk(out, q, k=5, nprobe=2))
    assert got == _expected_ivf(current, cents, q, 5, 2)
    shutil.rmtree(out)


def test_verify_vector_store_fsck(ray_session, tmp_path, vecs):
    """verify_vector_store: clean store passes; tampering (dropped bucket
    file, ids.parquet disagreement, out-of-range bucket) is reported;
    orphan generation dirs are noted but not failures."""
    import glob
    import os
    import shutil

    from marginaliasearch_ray.state.verify import verify_vector_store

    out = str(tmp_path / "vs_fsck")
    build_vector_store(
        _emb_table(range(30), vecs[:30]), out, kind="ivf", n_centroids=4
    )
    append_vector_store(out, _emb_table([30, 31, 5], vecs[[30, 31, 5]]))

    res = verify_vector_store(out)
    assert res["ok"], res["problems"]
    assert res["checked"]["live_vectors"] == 32
    assert res["checked"]["per_generation_vectors"] == [30, 3]

    # orphan generation (crashed append): noted, not a failure
    os.makedirs(os.path.join(out, "gen_0002", "bucket=0"), exist_ok=True)
    res = verify_vector_store(out)
    assert res["ok"] and res["checked"]["orphan_generations"] == ["gen_0002"]
    shutil.rmtree(os.path.join(out, "gen_0002"))

    # out-of-range bucket for a 4-centroid ivf store
    bad = os.path.join(out, "gen_0001", "bucket=9")
    os.makedirs(bad)
    res = verify_vector_store(out)
    assert not res["ok"] and any("out of range" in s for s in res["problems"])
    shutil.rmtree(bad)

    # drop one bucket file from gen 1 -> ids.parquet disagrees
    victim = sorted(
        glob.glob(os.path.join(out, "gen_0001", "bucket=*", "*.parquet"))
    )[0]
    backup = victim + ".bak"
    os.rename(victim, backup)
    res = verify_vector_store(out)
    assert not res["ok"] and any(
        "ids.parquet disagrees" in s for s in res["problems"]
    )
    os.rename(backup, victim)

    # truncated parquet reported, not raised
    with open(victim, "r+b") as f:
        f.truncate(10)
    res = verify_vector_store(out)
    assert not res["ok"] and any("unreadable" in s for s in res["problems"])


def test_empty_append_is_a_noop(ray_session, tmp_path, vecs):
    """An ingest cycle with nothing new never commits an empty
    generation."""
    import json
    import os

    out = str(tmp_path / "vs_empty")
    build_vector_store(
        _emb_table(range(10), vecs[:10]), out, kind="ivf", n_centroids=4
    )
    r = append_vector_store(out, _emb_table([], vecs[:0]))
    assert r == {"generation": None, "n_vectors": 0}
    meta = json.load(open(os.path.join(out, "store.json")))
    assert meta["gens"] == ["gen_0000"]
    # and the store still serves
    got = _got(vector_store_topk(out, vecs[1], k=3, nprobe=2))
    assert len(got) == 3


def test_build_rejects_duplicate_ids(ray_session, tmp_path, vecs):
    out = str(tmp_path / "vs_basedup")
    with pytest.raises(ValueError, match="duplicate vec_ids"):
        build_vector_store(
            _emb_table([0, 1, 1], vecs[:3]), out, kind="ivf", n_centroids=2
        )


def test_lsh_store_wide_planes(ray_session, tmp_path, vecs):
    """n_planes > 8 must route through ALL signature bytes — the full
    12-bit Hamming-1 probe set finds what an 8-bit truncation would
    drop."""
    out = str(tmp_path / "vs_lsh12")
    build_vector_store(
        _emb_table(range(40), vecs[:40]), out, kind="lsh", n_planes=12
    )
    append_vector_store(out, _emb_table(range(40, 60), vecs[40:60]))
    current = {i: vecs[i] for i in range(60)}
    q = vecs[3]
    got = _got(vector_store_topk(out, q, k=10))
    assert got == _expected_lsh(current, q, 10, 12)
    # int32 bucket cap enforced
    with pytest.raises(ValueError, match="n_planes"):
        build_vector_store(
            _emb_table(range(5), vecs[:5]), str(tmp_path / "vs_bad"),
            kind="lsh", n_planes=30,
        )


def test_maintain_vector_store_policies(ray_session, tmp_path, vecs):
    """Length trigger folds a long chain; stale-fraction trigger folds a
    churn-heavy short chain; an under-threshold chain is untouched."""
    from marginaliasearch_ray.pipelines.similarity import (
        maintain_vector_store,
    )

    out = str(tmp_path / "vs_maint")
    build_vector_store(
        _emb_table(range(20), vecs[:20]), out, kind="ivf", n_centroids=4
    )
    # fresh-only appends: under both thresholds -> no-op
    append_vector_store(out, _emb_table([20, 21], vecs[20:22]))
    r = maintain_vector_store(out, max_generations=4)
    assert r == {"folded": False, "reason": "under thresholds",
                 "stale_rows": 0}

    # churn: re-ingest half the base -> stale fraction over 0.25
    append_vector_store(out, _emb_table(range(10), -vecs[:10]))
    r = maintain_vector_store(out, max_generations=4)
    assert r["folded"] and r["reason"] == "stale_frac"
    assert r["n_vectors"] == 22  # live ids after fold

    # length: three more appends on the fold -> > max_generations
    for j in range(3):
        append_vector_store(out, _emb_table([30 + j], vecs[[30 + j]]))
    r = maintain_vector_store(out, max_generations=3)
    assert r["folded"] and r["reason"] == "length"
    assert r["n_vectors"] == 25


def test_vector_store_random_churn_property(ray_session, tmp_path, vecs):
    """Randomized generations (fresh + update mix) against the
    newest-wins numpy oracle, with a mid-sequence compaction — the
    hypothesis-style fuzz for the store lifecycle (seeded, 3 scenarios
    to keep Dataset round trips affordable)."""
    rng = np.random.RandomState(123)
    dim = 8
    for trial in range(3):
        out = str(tmp_path / f"vs_prop{trial}")
        pool = rng.standard_normal((200, dim))
        nbase = int(rng.randint(10, 40))
        current = {i: pool[i] for i in range(nbase)}
        build_vector_store(
            _emb_table(sorted(current), [current[i] for i in sorted(current)]),
            out, kind="ivf", n_centroids=4,
        )
        cents = pool[:4] / np.linalg.norm(pool[:4], axis=1, keepdims=True)
        next_id = nbase
        for gen in range(int(rng.randint(1, 4))):
            n_fresh = int(rng.randint(0, 6))
            fresh = list(range(next_id, next_id + n_fresh))
            next_id += n_fresh
            n_upd = int(rng.randint(0, min(5, len(current))))
            upd = list(
                rng.choice(sorted(current), size=n_upd, replace=False)
            )
            ids = fresh + [int(u) for u in upd]
            if not ids:
                continue
            mats = []
            for i in ids:
                v = pool[i % 200] + rng.standard_normal(dim) * 0.1
                mats.append(v)
                current[int(i)] = v
            append_vector_store(out, _emb_table(ids, np.array(mats)))
            if gen == 1:
                compact_vector_store(out)
        q = pool[int(rng.randint(0, 200))]
        got = _got(vector_store_topk(out, q, k=8, nprobe=2))
        assert got == _expected_ivf(current, cents, q, 8, 2), (
            f"trial {trial} diverged from the newest-wins oracle"
        )
