"""Block-max side index (add_block_stats) + pruned execution.

The pruned path must be EXACTLY result-identical to the exhaustive path
(the driver hash-compares `bm25_pruned` against the same SQL oracle as
`bm25_single`), while provably decoding fewer blocks.  Reference anchor:
the north star's block-max WAND top-k requirement; algorithmic shape from
Ding & Suel, SIGIR'11 (public literature, not reference code).
"""

import numpy as np
import pyarrow as pa
import pytest

from marginaliasearch_ray.functions.codecs import (
    decode_varints,
    encode_counts,
    encode_doc_ids,
)
from marginaliasearch_ray.pipelines.build_index import BuildConfig, build_index
from marginaliasearch_ray.pipelines.query import IndexSearch
from marginaliasearch_ray.sources.corpus import synthesize_corpus
from marginaliasearch_ray.stages.reverse import add_block_stats


def _run_table(terms):
    rows = {"term_id": [], "df": [], "docs": [], "tfs": []}
    for tid, docs, tfs in terms:
        rows["term_id"].append(tid)
        rows["df"].append(len(docs))
        rows["docs"].append(encode_doc_ids(np.asarray(docs, dtype=np.int64)))
        rows["tfs"].append(encode_counts(np.asarray(tfs, dtype=np.int64)))
    n = len(rows["term_id"])
    return pa.table(
        {
            "term_id": pa.array(rows["term_id"], pa.int64()),
            "df": pa.array(rows["df"], pa.int64()),
            "docs": pa.array(rows["docs"], pa.binary()),
            "tfs": pa.array(rows["tfs"], pa.binary()),
            "metas": pa.array([b""] * n, pa.binary()),
            "positions": pa.array([b""] * n, pa.binary()),
            "pos_cnts": pa.array([[]] * n, pa.list_(pa.int32())),
        }
    )


def test_block_stats_roundtrip():
    """Every block decodes standalone (prev blk_last as delta base) and
    reproduces the exact posting slice; terms at or under the block size
    get no entries."""
    rng = np.random.default_rng(0)
    terms = []
    for tid, n in [(1, 3), (2, 300), (3, 129), (4, 128), (5, 1000)]:
        docs = np.sort(rng.choice(10**7, size=n, replace=False))
        tfs = rng.integers(1, 50, size=n)
        terms.append((tid, docs, tfs))
    out = add_block_stats(_run_table(terms), block=128)
    for i, (tid, docs, tfs) in enumerate(terms):
        n = len(docs)
        bl = out["blk_last"][i].as_py()
        mt = out["blk_maxtf"][i].as_py()
        boff = out["blk_boff"][i].as_py()
        tboff = out["blk_tf_boff"][i].as_py()
        if n <= 128:
            assert bl == [] and mt == [] and boff == []
            continue
        nb = (n + 127) // 128
        assert len(bl) == len(mt) == len(boff) == len(tboff) == nb
        assert bl == [int(docs[min((b + 1) * 128, n) - 1]) for b in range(nb)]
        assert mt == [int(tfs[b * 128 : (b + 1) * 128].max()) for b in range(nb)]
        doc_blob = out["docs"][i].as_py()
        tf_blob = out["tfs"][i].as_py()
        for b in range(nb):
            dend = boff[b + 1] if b + 1 < nb else len(doc_blob)
            tend = tboff[b + 1] if b + 1 < nb else len(tf_blob)
            deltas = decode_varints(doc_blob[boff[b] : dend]).astype(np.int64)
            base = bl[b - 1] if b > 0 else -1
            np.testing.assert_array_equal(
                base + np.cumsum(deltas), docs[b * 128 : (b + 1) * 128]
            )
            np.testing.assert_array_equal(
                decode_varints(tf_blob[tboff[b] : tend]).astype(np.int64),
                tfs[b * 128 : (b + 1) * 128],
            )


def test_block_stats_empty_batch():
    out = add_block_stats(_run_table([]).slice(0, 0), block=128)
    assert out.num_rows == 0 and "blk_last" in out.column_names


@pytest.fixture(scope="module")
def block_index(ray_session, tmp_path_factory):
    """2000-doc corpus indexed with 16-posting blocks: hot terms span
    dozens of blocks per part, so both skip mechanisms (candidate-block
    retain pruning and top-k early termination) have room to act."""
    import ray.data

    corpus = synthesize_corpus(n_repos=20, files_per_repo=100, seed=3)
    out = str(tmp_path_factory.mktemp("blockidx"))
    build_index(
        ray.data.from_arrow(corpus),
        out,
        BuildConfig(
            num_parts=2, num_buckets=8, hot_df_threshold=300, posting_block=16
        ),
    )
    return out


QUERIES = [
    ("license", {}),
    ("the", {}),
    ("import copyright", {}),
    ("parse_tree license", {}),
    ("license size>30", {}),
    ("the -license", {}),
    ("license (import | copyright)", {}),
    ("the repo:org0000/repo0000", {}),
    ("license ?import", {}),
    ('"license import"', {}),
    ("import year>2000", {}),
    ("the rank<255", {}),
    # pure-OR top-k: MaxScore + block-max candidate discovery
    ("the | license", {}),
    ("license | copyright | import", {}),
    ("the | license size>30", {}),
    ("the | license -copyright", {}),
    # multi-term conjunction: block-max AND (driver = rarest term)
    ("the license", {}),
    ("the import copyright", {}),
    ("the license size>30", {}),
]


def test_pruned_matches_exhaustive(block_index):
    """Result tables (ids, rounded scores, order, tie-breaks) identical
    with pruning on, across filters/groups/phrases/priority shapes."""
    idx = IndexSearch(block_index, use_actors=False)
    for q, kw in QUERIES:
        a = idx.search(q, k=10, **kw)
        b = idx.search(q, k=10, pruned=True, **kw)
        assert a.equals(b), f"pruned result diverged for {q!r}"
        assert len(a) > 0, f"vacuous comparison for {q!r}"


def test_pruned_actually_skips(block_index):
    """The pruned run must decode strictly fewer blocks than exist —
    otherwise the flag is a no-op and the perf claim is vacuous."""
    idx = IndexSearch(block_index, use_actors=False)
    segs = [s.seg for s in idx.searchers]
    for s in segs:
        s.blocks_decoded = s.blocks_skipped = 0
    idx.search("the", k=10, pruned=True)  # hottest term, top-k early exit
    idx.search("parse_tree license", k=10, pruned=True)  # rare drives hot
    decoded = sum(s.blocks_decoded for s in segs)
    skipped = sum(s.blocks_skipped for s in segs)
    assert decoded > 0
    assert skipped > 0, (decoded, skipped)


def test_pruned_or_skips(block_index):
    """Pure-OR discovery must skip blocks of the lower-bound member once
    the threshold fills from the higher-bound one."""
    idx = IndexSearch(block_index, use_actors=False)
    segs = [s.seg for s in idx.searchers]
    for s in segs:
        s.blocks_decoded = s.blocks_skipped = 0
        s._decoded.clear()  # defeat the full-decode cache between tests
    idx.search("the | license | import", k=3, pruned=True)
    decoded = sum(s.blocks_decoded for s in segs)
    skipped = sum(s.blocks_skipped for s in segs)
    assert decoded > 0
    assert skipped > 0, (decoded, skipped)


def test_pruned_conj_skips(block_index):
    """Block-max AND must early-terminate: with a hot driver and a small
    k, low-bound driver blocks stay undecoded."""
    idx = IndexSearch(block_index, use_actors=False)
    segs = [s.seg for s in idx.searchers]
    for s in segs:
        s.blocks_decoded = s.blocks_skipped = 0
        s._decoded.clear()
    idx.search("the license", k=3, pruned=True)
    decoded = sum(s.blocks_decoded for s in segs)
    skipped = sum(s.blocks_skipped for s in segs)
    assert decoded > 0
    assert skipped > 0, (decoded, skipped)


def test_pruned_fuzz(block_index):
    """Randomized conjunction / disjunction / exclusion mixes over the
    fixture vocabulary: pruned and exhaustive must stay byte-identical
    for every shape and k."""
    vocab = [
        "the", "license", "import", "copyright", "a", "return", "def",
        "parse_tree", "for", "data",
    ]
    rng = np.random.default_rng(11)
    idx = IndexSearch(block_index, use_actors=False)
    nonvacuous = 0
    for _ in range(40):
        n = int(rng.integers(1, 4))
        terms = list(rng.choice(vocab, size=n, replace=False))
        shape = int(rng.integers(0, 3))
        if shape == 0:
            q = " ".join(terms)  # conjunction
        elif shape == 1:
            q = " | ".join(terms)  # pure OR
        else:
            q = " ".join(terms)
            ex = rng.choice([v for v in vocab if v not in terms])
            q += f" -{ex}"
        k = int(rng.integers(1, 15))
        a = idx.search(q, k=k)
        b = idx.search(q, k=k, pruned=True)
        assert a.equals(b), f"pruned diverged for {q!r} k={k}"
        nonvacuous += len(a) > 0
    assert nonvacuous >= 20


def test_pruned_on_blockless_index(ray_session, tmp_path_factory):
    """pruned=True on an index built without block stats silently runs
    exhaustive (back-compat with pre-v10 segments)."""
    import ray.data

    corpus = synthesize_corpus(n_repos=4, files_per_repo=10, seed=5)
    out = str(tmp_path_factory.mktemp("noblk"))
    build_index(
        ray.data.from_arrow(corpus),
        out,
        BuildConfig(num_parts=2, num_buckets=8, posting_block=0),
    )
    idx = IndexSearch(out, use_actors=False)
    assert not idx.searchers[0].seg.has_blocks
    a = idx.search("license", k=5)
    b = idx.search("license", k=5, pruned=True)
    assert a.equals(b) and len(a) > 0


def test_pruned_conj_bulk_fallback(ray_session, tmp_path_factory):
    """Two head terms co-occurring in EVERY doc: no block is skippable,
    so the adaptive bulk fallback must engage (found as a 5.5x pruned
    regression vs exhaustive at 3.84M docs) — the chunked scan bails to
    one vectorized pass and the result stays byte-identical."""
    import ray.data

    rows = {
        "repo": [], "path": [], "commit": [], "lang": [], "content": [],
        "ordinal": [],
    }
    for r in range(4):
        for f in range(120):
            rows["repo"].append(f"org0000/repo{r:04d}")
            rows["path"].append(f"src/f{f:04d}.py")
            rows["commit"].append("c" * 8)
            rows["lang"].append("python")
            rows["ordinal"].append(f)
            # both hot terms in every doc, tf varied so scores differ
            rows["content"].append(
                "alpha " * (1 + (f % 7)) + "beta " * (1 + (f * 3) % 5)
                + f"uniq{r}_{f}"
            )
    corpus = pa.table(rows)
    out = str(tmp_path_factory.mktemp("bulkidx"))
    build_index(
        ray.data.from_arrow(corpus),
        out,
        BuildConfig(num_parts=1, num_buckets=4, posting_block=16),
    )
    idx = IndexSearch(out, use_actors=False)
    seg = idx.searchers[0].seg
    seg.blocks_decoded = seg.blocks_skipped = 0
    seg._decoded.clear()
    a = idx.search("alpha beta", k=5)
    b = idx.search("alpha beta", k=5, pruned=True)
    assert a.equals(b) and len(a) == 5
    # every driver block held a top-K-competitive candidate: nothing
    # was skippable, which is exactly the shape the fallback bounds
    assert seg.blocks_decoded > 0
