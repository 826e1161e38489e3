"""Training-data ops vs inline DuckDB oracles at sf0.001, plus the
multimodal feature-stage plumbing."""

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def entrymod(ray_session):
    import __ray_entry__ as e

    return e


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ["documents", "embeddings", "events"]:
        c.execute(
            f"create view {t} as select * from read_parquet('{SF}/{t}.parquet')"
        )
    return c


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def check(mine, con, sql):
    if not isinstance(mine, pd.DataFrame):
        mine = mine.to_pandas()
    want = con.execute(sql).fetchdf()
    a, b = canon(mine), canon(want)
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b)
    for c in a.columns:
        va, vb = a[c].to_numpy(), b[c].to_numpy()
        if va.dtype.kind == "f":
            assert np.allclose(va, vb.astype(float), atol=1e-9, rtol=0), c
        else:
            assert (va == vb).all(), c


@pytest.mark.parametrize(
    "name",
    [
        "term_df_top100",
        "exact_dedup",
        "lang_id",
        "quality_scores",
        "ngram_jaccard_pairs",
        "ann_cosine_top10",
        "embedding_top_pairs",
        "events_tumbling_1h",
        "events_sessions",
    ],
)
def test_op_matches_oracle(entrymod, con, name):
    mine = entrymod.queries()[name](SF)
    check(mine, con, entrymod.oracle_sql()[name])


def test_simhash_deterministic(entrymod):
    a = entrymod.queries()["simhash64"](SF).to_pandas().sort_values("doc_id")
    b = entrymod.queries()["simhash64"](SF).to_pandas().sort_values("doc_id")
    assert (a["simhash"].to_numpy() == b["simhash"].to_numpy()).all()
    assert a["simhash"].nunique() > 400  # 64-bit fingerprints mostly distinct


def test_lsh_ann_subset_of_bruteforce(entrymod, con):
    approx = entrymod.queries()["lsh_ann_topk"](SF).to_pandas()
    exact = con.execute(entrymod.oracle_sql()["ann_cosine_top10"]).fetchdf()
    # approximate: every returned row must carry the true rounded cosine
    truth = dict(zip(exact["vec_id"], exact["cos_r"]))
    for _, r in approx.iterrows():
        if r["vec_id"] in truth:
            assert abs(truth[r["vec_id"]] - r["cos_r"]) < 1e-9


def test_ivf_ann_subset_of_bruteforce(entrymod, con):
    approx = entrymod.queries()["ivf_ann_topk"](SF).to_pandas()
    exact = con.execute(entrymod.oracle_sql()["ann_cosine_top10"]).fetchdf()
    truth = dict(zip(exact["vec_id"], exact["cos_r"]))
    assert len(approx) > 0
    for _, r in approx.iterrows():
        if r["vec_id"] in truth:
            assert abs(truth[r["vec_id"]] - r["cos_r"]) < 1e-9


def test_multimodal_feature_stage(ray_session):
    import ray.data

    from marginaliasearch_ray.pipelines.multimodal import (
        FEATURE_DIM,
        MediaFeatureStage,
        extract_media_features,
        synth_media_table,
    )

    media = synth_media_table(n=24)
    out = extract_media_features(ray.data.from_arrow(media)).take_all()
    assert len(out) == 24
    for r in out:
        assert len(r["feature"]) == FEATURE_DIM
        assert all(0.0 <= v <= 1.0 for v in r["feature"])
    # deterministic across actors and direct calls
    direct = MediaFeatureStage()._fake_features(media["payload"][0].as_py())
    got = next(r for r in out if r["media_id"] == 0)["feature"]
    assert np.allclose(direct, got)
    # the real-decoder path is stubbed behind NotImplementedError
    with pytest.raises(NotImplementedError):
        MediaFeatureStage(decoder="pil")


def test_frame_sample_stage_fanout(ray_session):
    """Frame sampling fans one video row out to n_frames frame rows with
    deterministic chunking; non-video rows are dropped."""
    import ray.data

    from marginaliasearch_ray.pipelines.multimodal import (
        FrameSampleStage,
        sample_video_frames,
        synth_media_table,
    )

    media = synth_media_table(12)
    out = sample_video_frames(
        ray.data.from_arrow(media), n_frames=4
    ).to_pandas()
    n_videos = sum(1 for k in media["kind"].to_pylist() if k == "video")
    assert len(out) == 4 * n_videos
    assert set(out["frame_no"]) == {0, 1, 2, 3}
    # deterministic: same input -> same chunks
    stage = FrameSampleStage(n_frames=4)
    again = stage(media)
    assert again["frame"].to_pylist() == stage(media)["frame"].to_pylist()


def test_verify_pairs_batched_matches_per_pair(ray_session):
    """The batched dense-rank intersection in _verify_pairs must equal a
    per-pair np.intersect1d Jaccard on random ragged sets."""
    import pyarrow as pa
    import ray.data

    from marginaliasearch_ray.pipelines import textops

    rng = np.random.RandomState(7)
    # small value universe -> real overlaps; a few giant values exercise
    # the full-range int64 path
    sets = {
        i: np.unique(
            np.concatenate(
                [
                    rng.randint(0, 60, size=rng.randint(0, 40)),
                    rng.randint(-(2**62), 2**62, size=2),
                ]
            )
        ).astype(np.int64)
        for i in range(30)
    }
    sets[11] = np.empty(0, dtype=np.int64)  # one empty side
    pairs = [(a, b) for a in range(30) for b in range(a + 1, 30) if (a + b) % 3 == 0]
    sets_tbl = pa.table(
        {
            "doc_id": pa.array(list(sets), pa.int64()),
            "sh": pa.array(
                [sets[i].astype(np.int64).tobytes() for i in sets], pa.binary()
            ),
            "n_sh": pa.array([len(sets[i]) for i in sets], pa.int64()),
        }
    )
    cand = pa.table(
        {
            "doc_a": pa.array([p[0] for p in pairs], pa.int64()),
            "doc_b": pa.array([p[1] for p in pairs], pa.int64()),
        }
    )
    thr = 0.05
    got = (
        textops._verify_pairs(
            ray.data.from_arrow(cand), ray.data.from_arrow(sets_tbl), thr
        )
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    want = []
    for a, b in pairs:
        sa, sb = sets[a], sets[b]
        if len(sa) == 0 or len(sb) == 0:
            continue
        inter = len(np.intersect1d(sa, sb, assume_unique=True))
        j = inter / (len(sa) + len(sb) - inter)
        if j >= thr:
            want.append((a, b, round(j, 6)))
    want.sort()
    assert len(got) == len(want)
    for row, (a, b, j) in zip(got.itertuples(index=False), want):
        assert (row.doc_a, row.doc_b) == (a, b)
        assert abs(row.jaccard_r - j) < 1e-9


def test_strict_exact_raises_on_hot_group():
    """strict_exact turns the lossy hot-shingle chain degrade into a loud
    failure (the oracle stays exact all-pairs, so silent divergence is
    worse than an error)."""
    import pyarrow as pa

    from marginaliasearch_ray.pipelines import textops

    hot = pa.table(
        {
            "doc_id": pa.array(
                range(textops.STOP_SHINGLE_DF + 2), pa.int64()
            ),
            "shingle": pa.array(
                [1] * (textops.STOP_SHINGLE_DF + 2), pa.int64()
            ),
        }
    )
    with pytest.raises(RuntimeError, match="chain regime"):
        textops._pairs_of_group_strict(hot)
    # the default path still chains
    out = textops._pairs_of_group(hot)
    assert len(out) == textops.STOP_SHINGLE_DF + 1


@pytest.fixture(scope="module")
def planted_sf(tmp_path_factory):
    """A synthetic sf dir whose embeddings contain planted near-duplicate
    clusters (cos >= ~0.95) over random background vectors."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("planted_sf")
    rng = np.random.RandomState(42)
    dim, n_bg, n_clusters, dup_per = 64, 200, 10, 4
    rows = [rng.standard_normal(dim) for _ in range(n_bg)]
    for _ in range(n_clusters):
        base = rng.standard_normal(dim)
        base /= np.linalg.norm(base)
        for _ in range(dup_per):
            rows.append(base + 0.02 * rng.standard_normal(dim))
    tbl = pa.table(
        {
            "vec_id": pa.array(range(len(rows)), pa.int64()),
            "embedding": pa.array(
                [r.astype(np.float32).tolist() for r in rows],
                pa.list_(pa.float32()),
            ),
            "label": pa.array([i % 5 for i in range(len(rows))], pa.int64()),
        }
    )
    pq.write_table(tbl, str(d / "embeddings.parquet"))
    return str(d)


def test_embedding_near_dup_bucketed_exact_in_dedup_regime(
    ray_session, planted_sf
):
    """In the true near-duplicate regime (cos >= 0.9) the LSH-bucketed
    pair generation must find exactly the same pairs as the exact blocked
    all-pairs form, with identical rounded cosines."""
    from marginaliasearch_ray.pipelines import similarity as S

    exact = (
        S.embedding_near_dup_pairs(planted_sf, threshold=0.9)
        .to_pandas()
        .sort_values(["vec_a", "vec_b"])
        .reset_index(drop=True)
    )
    buck = (
        S.embedding_near_dup_bucketed(planted_sf, threshold=0.9)
        .to_pandas()
        .sort_values(["vec_a", "vec_b"])
        .reset_index(drop=True)
    )
    assert len(exact) >= 40  # the planted clusters are found at all
    assert len(buck) == len(exact)
    assert (buck["vec_a"].to_numpy() == exact["vec_a"].to_numpy()).all()
    assert (buck["vec_b"].to_numpy() == exact["vec_b"].to_numpy()).all()
    assert np.allclose(buck["cos_r"], exact["cos_r"], atol=1e-9)


def test_blocked_pairs_match_bruteforce(ray_session, planted_sf):
    """The block-pair decomposition must reproduce a numpy brute-force
    all-pairs cosine exactly (values and pair set)."""
    import pyarrow.parquet as pq

    from marginaliasearch_ray.pipelines import similarity as S

    t = pq.read_table(f"{planted_sf}/embeddings.parquet")
    ids = t["vec_id"].to_numpy()
    mat = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    matn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sim = np.round(matn @ matn.T, 6)
    ai, bi = np.triu_indices(len(ids), k=1)
    keep = sim[ai, bi] >= 0.5
    want = sorted(zip(ids[ai[keep]], ids[bi[keep]], sim[ai, bi][keep]))
    got = (
        S.embedding_near_dup_pairs(planted_sf, threshold=0.5, num_blocks=3)
        .to_pandas()
        .sort_values(["vec_a", "vec_b"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    for row, (a, b, s) in zip(got.itertuples(index=False), want):
        assert (row.vec_a, row.vec_b) == (a, b)
        assert abs(row.cos_r - s) < 1e-9


def test_words_tfidf_reference_semantics(ray_session):
    """words_tfidf matches a literal port of WordsTfIdfCounts.getTermValue
    (WordsTfIdfCounts.java:103-127) on a tiny corpus with underscore
    terms, dict-absent parts (freq clamp) and repeated tokens."""
    import math

    import pyarrow as pa
    import ray.data

    from marginaliasearch_ray.functions.wordpattern import tokenize
    from marginaliasearch_ray.pipelines import textops

    contents = [
        "alpha alpha beta customer_key alpha",
        "alpha gamma customer key",
        "beta beta zeta_qux beta qux customer_key",
    ]
    tbl = pa.table(
        {
            "repo": pa.array(["r"] * 3),
            "path": pa.array([f"p{i}" for i in range(3)]),
            "lang": pa.array(["py"] * 3),
            "content": pa.array(contents),
            "ordinal": pa.array([10, 11, 12], pa.int64()),
        }
    )
    out = (
        textops.words_tfidf(ray.data.from_arrow(tbl))
        .to_pandas()
        .set_index(["doc_id", "term"])["tfidf"]
        .to_dict()
    )

    toks = [tokenize(c) for c in contents]
    n_docs = float(len(contents))
    df: dict[str, int] = {}
    for ts in toks:
        for t in set(ts):
            df[t] = df.get(t, 0) + 1

    def value(part, cnt, maxv):
        freq = max(df.get(part, 0), 1)
        return (0.1 + 0.9 * cnt / maxv) * math.log(freq / n_docs)

    expected = {}
    for i, ts in enumerate(toks):
        counts: dict[str, int] = {}
        for t in ts:
            counts[t] = counts.get(t, 0) + 1
        maxv = max(counts.values())
        for t, cnt in counts.items():
            parts = [p for p in t.split("_") if p]
            v = sum(value(p, cnt, maxv) for p in parts) / len(parts)
            expected[(10 + i, t)] = int(-v * 75)

    assert out == expected


def test_session_windows_bucket_boundary_merge(ray_session, tmp_path):
    """Sessions that cross the coarse-bucket boundary (pass 1 splits
    them) must be stitched back exactly by the pass-2 summary merge —
    including a chain spanning three buckets."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from marginaliasearch_ray.pipelines.events import session_windows

    gap_s, coarse_mult = 100, 4  # bucket width 400 s
    # user 1: events every 50 s straddling bucket edges 400 and 800 —
    # one session spanning three buckets (0..1000)
    ts1 = np.arange(0, 1001, 50, dtype=np.int64)
    # user 2: a session ending exactly gap before a bucket edge and one
    # starting at the edge (gap == 100 -> still ONE session: 300->400),
    # plus a separate later session (gap exceeded)
    ts2 = np.array([250, 300, 400, 450, 900], dtype=np.int64)
    ts = np.concatenate([ts1, ts2]) * 1_000_000
    uid = np.concatenate(
        [np.full(len(ts1), 1, np.int64), np.full(len(ts2), 2, np.int64)]
    )
    pq.write_table(
        pa.table(
            {
                "user_id": pa.array(uid, pa.int64()),
                "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    got = (
        session_windows(str(tmp_path), gap_s=gap_s, coarse_mult=coarse_mult)
        .to_pandas()
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )
    rows = [
        (
            int(r.user_id),
            int(r.session_start.value // 10**9),
            int(r.session_end.value // 10**9),
            int(r.n_events),
        )
        for r in got.itertuples()
    ]
    assert rows == [
        (1, 0, 1000, len(ts1)),
        (2, 250, 450, 4),
        (2, 900, 900, 1),
    ]


def test_sample_per_key_two_level_topn(ray_session):
    """Stratified sample == brute-force smallest (sha256, ordinal) per
    key, across batch boundaries, with a key smaller than n and hash
    ties (duplicate contents) broken by ordinal."""
    import hashlib

    import pyarrow as pa
    import ray.data

    from marginaliasearch_ray.pipelines.textops import sample_per_key

    rows = []
    for i in range(200):
        # 'big' has 180 rows (> n), 'tiny' only 20 (< n); every 10th
        # content is a duplicate to force hash ties
        key = "big" if i % 10 else "tiny"
        content = f"doc body {i if i % 7 else 'dup'}"
        rows.append((key, content, i))
    t = pa.table(
        {
            "lang": pa.array([r[0] for r in rows], pa.string()),
            "content": pa.array([r[1] for r in rows], pa.string()),
            "ordinal": pa.array([r[2] for r in rows], pa.int32()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(7)  # force multi-batch
    got = sorted(
        (r["lang"], r["doc_id"])
        for r in sample_per_key(ds, key="lang", n=15).take_all()
    )

    def brute(key):
        members = [
            (hashlib.sha256(c.encode()).hexdigest(), i)
            for k, c, i in rows
            if k == key
        ]
        return [(key, i) for _, i in sorted(members)[:15]]

    want = sorted(brute("big") + brute("tiny"))
    assert got == want
