"""Anchor regions: URL words + external link texts in virtual position
regions after the body (DocumentPositionMapper.mapPositionsAndExtract
SimpleKeywords:23-46, mapUrlWordPositions:111-143, mapLinkTextPositions
:146-199).  Position arithmetic, sqrt-attenuated repetition, spans, and
the body-only invariants (size, quality distinct, Subjects gate) are
pinned against hand-computed values.
"""

import numpy as np
import pyarrow as pa
import pytest

from marginaliasearch_ray.functions.murmur import hash_nearly_ascii
from marginaliasearch_ray.stages.docids import DomainRegistry
from marginaliasearch_ray.stages.tokenize import (
    SPAN_LINKTEXT,
    SPAN_URL,
    TokenizeStage,
)


def _batch(content="alpha beta alpha", path="src/mod.py",
           lt_texts=None, lt_counts=None):
    cols = {
        "repo": pa.array(["org/r"]),
        "path": pa.array([path]),
        "commit": pa.array(["c" * 40]),
        "lang": pa.array(["py"]),
        "content": pa.array([content]),
        "ordinal": pa.array([0], pa.int32()),
    }
    if lt_texts is not None:
        cols["lt_texts"] = pa.array([lt_texts], pa.list_(pa.string()))
        cols["lt_counts"] = pa.array([lt_counts], pa.list_(pa.int64()))
    return pa.table(cols)


def _row(out):
    tids = out["term_ids"][0].as_py()
    tfs = out["term_tfs"][0].as_py()
    pos = out["term_positions"][0].as_py()
    return dict(zip(tids, zip(tfs, pos)))


def test_anchor_positions_exact():
    """Body L=3; URL words at L+4.. (7,8,9); first link token at L+7+u
    (13); reps = floor(sqrt(9)) = 3 with +2 padding between repetitions."""
    stage = TokenizeStage(DomainRegistry(["org/r"], num_parts=1),
                          anchor_regions=True)
    out = stage(_batch(lt_texts=["nav one"], lt_counts=[9]))
    by = _row(out)

    tf, pos = by[hash_nearly_ascii("alpha")]
    assert (tf, pos) == (2, [1, 3])
    # URL region: tokenize('src mod py') -> positions 7, 8, 9
    assert by[hash_nearly_ascii("src")] == (1, [7])
    assert by[hash_nearly_ascii("mod")] == (1, [8])
    assert by[hash_nearly_ascii("py")] == (1, [9])
    # link text 'nav one' repeated 3x: nav at 13, 17, 21; one at 14, 18, 22
    assert by[hash_nearly_ascii("nav")] == (3, [13, 17, 21])
    assert by[hash_nearly_ascii("one")] == (3, [14, 18, 22])
    # size stays body-only
    assert out["size"][0].as_py() == 3

    codes = out["span_codes"][0].as_py()
    spans = out["spans"][0].as_py()
    span_of = dict(zip(codes, spans))
    assert span_of[SPAN_URL] == [7, 10]
    assert span_of[SPAN_LINKTEXT] == [13, 15, 17, 19, 21, 23]


def test_anchor_repetition_attenuation():
    """reps = (int) max(1, min(sqrt(count), 12)): cnt=1 -> 1, cnt=3 -> 1,
    cnt=4 -> 2, cnt=200 -> 12 (capped)."""
    stage = TokenizeStage(DomainRegistry(["org/r"], num_parts=1),
                          anchor_regions=True)
    for cnt, reps in [(1, 1), (3, 1), (4, 2), (145, 12), (20000, 12)]:
        out = stage(_batch(lt_texts=["navword"], lt_counts=[cnt]))
        tf, _pos = _row(out)[hash_nearly_ascii("navword")]
        assert tf == reps, (cnt, tf, reps)


def test_anchor_body_occurrence_merges():
    """A term in body AND link text: one segment, body positions first,
    anchor positions after, tf = total."""
    stage = TokenizeStage(DomainRegistry(["org/r"], num_parts=1),
                          anchor_regions=True)
    out = stage(_batch(content="nav beta", lt_texts=["nav"], lt_counts=[4]))
    # L=2, u=3 (src mod py): first link pos = 2+7+3 = 12; rep2 at 15
    assert _row(out)[hash_nearly_ascii("nav")] == (3, [1, 12, 15])


def test_anchor_off_is_byte_identical():
    """anchor_regions=False ignores lt columns and matches the default
    stage output exactly."""
    reg = DomainRegistry(["org/r"], num_parts=1)
    plain = TokenizeStage(reg)(_batch())
    off = TokenizeStage(reg, anchor_regions=False)(
        _batch(lt_texts=["nav"], lt_counts=[5])
    )
    assert plain.equals(off)


def test_anchor_quality_and_sizes_body_only():
    """Quality's distinct-token ratio ignores anchor terms: the packed doc
    meta is identical with and without link texts."""
    reg = DomainRegistry(["org/r"], num_parts=1)
    base = TokenizeStage(reg, anchor_regions=True)(_batch())
    with_links = TokenizeStage(reg, anchor_regions=True)(
        _batch(lt_texts=["xyz abc"], lt_counts=[100])
    )
    assert base["document_meta"][0].as_py() == with_links["document_meta"][0].as_py()
    assert base["size"][0].as_py() == with_links["size"][0].as_py()


def test_anchor_null_lt_columns():
    """Null lt entries (left-join misses) behave as no-links docs."""
    stage = TokenizeStage(DomainRegistry(["org/r"], num_parts=1),
                          anchor_regions=True)
    cols = _batch().to_pydict()
    cols["lt_texts"] = [None]
    cols["lt_counts"] = [None]
    out = stage(pa.table({
        **{k: pa.array(v) if k != "ordinal" else pa.array(v, pa.int32())
           for k, v in cols.items() if k not in ("lt_texts", "lt_counts")},
        "lt_texts": pa.array([None], pa.list_(pa.string())),
        "lt_counts": pa.array([None], pa.list_(pa.int64())),
    }))
    by = _row(out)
    # URL region still maps (anchor_regions covers it), no link region
    assert by[hash_nearly_ascii("src")] == (1, [7])
    assert hash_nearly_ascii("nav") not in by
    assert SPAN_LINKTEXT not in out["span_codes"][0].as_py()


@pytest.mark.usefixtures("ray_session")
def test_attach_link_texts_join_and_build(tmp_path):
    """End-to-end: link table aggregated + left-joined, anchor index
    built, a linktext-only term searchable with tf = repetitions."""
    import ray.data

    from marginaliasearch_ray.pipelines.build_index import (
        BuildConfig,
        attach_link_texts,
        build_index,
    )
    from marginaliasearch_ray.pipelines.query import IndexSearch
    from marginaliasearch_ray.sources.corpus import synthesize_corpus

    corpus = synthesize_corpus(n_repos=3, files_per_repo=6)
    repos = corpus["repo"].to_pylist()
    paths = corpus["path"].to_pylist()
    # every 3rd doc gets the anchor text 'navterm <k>' with cnt = 9+k
    link_rows = {"repo": [], "path": [], "text": [], "cnt": []}
    expected = {}
    for j in range(0, len(repos), 3):
        link_rows["repo"].append(repos[j])
        link_rows["path"].append(paths[j])
        link_rows["text"].append(f"navterm extra{j % 2}")
        link_rows["cnt"].append(9 + j)
        expected[(repos[j], paths[j])] = int(np.sqrt(9 + j))
    # one EXACT-case doc: a width-1 link text on an otherwise unlinked doc
    link_rows["repo"].append(repos[1])
    link_rows["path"].append(paths[1])
    link_rows["text"].append("navterm")
    link_rows["cnt"].append(25)
    exact_reps = 5
    link_ds = ray.data.from_arrow(pa.table(link_rows))
    corpus_ds = ray.data.from_arrow(corpus)

    joined = attach_link_texts(corpus_ds, link_ds, num_partitions=4)
    jt = joined.to_arrow_refs()
    got = pa.concat_tables(
        [ray.get(r) for r in jt], promote_options="default"
    )
    assert got.num_rows == corpus.num_rows
    hit = {
        (r, p): t
        for r, p, t in zip(
            got["repo"].to_pylist(), got["path"].to_pylist(),
            got["lt_texts"].to_pylist(),
        )
        if t is not None
    }
    assert set(hit) == set(expected) | {(repos[1], paths[1])}

    link_dir = str(tmp_path / "links.parquet")
    pa.parquet.write_table(pa.table(link_rows), link_dir)
    out = str(tmp_path / "idx")
    build_index(
        corpus_ds,
        out,
        BuildConfig(num_parts=2, num_buckets=4, anchor_regions=True,
                    link_texts_dir=link_dir),
    )
    idx = IndexSearch(out, use_actors=False)
    res = idx.search("navterm", k=50)
    # every linked doc matches; tf equals the repetition count, which the
    # BM25 scorer saturates — verify the match set at least
    assert res.num_rows == len(expected) + 1  # +1: the exact-case doc

    # single-word EXTERNAL_LINKTEXT verbatim branch (IndexResultRanking
    # Service.java:470-481): score delta vs the no-verbatim run is
    # weight * (1.5 * exact + 0.5 * partial) — 'navterm extraX' texts are
    # width-2 spans (partial, one per repetition), the width-1 'navterm'
    # text is exact
    resv = idx.search("navterm", k=50, verbatim_tag_weight=2.0)
    s0 = dict(zip(res["combined_id"].to_pylist(), res["score_r"].to_pylist()))
    s1 = dict(zip(resv["combined_id"].to_pylist(), resv["score_r"].to_pylist()))
    deltas = sorted(round(s1[d] - s0[d], 6) for d in s0)
    want = sorted(
        [round(2.0 * 0.5 * r, 6) for r in expected.values()]
        + [round(2.0 * 1.5 * exact_reps, 6)]
    )
    assert deltas == want

    # multi-word DOC_URL classification (_group_tag_score w_url): the
    # 'src mod0' phrase matches once inside each f%5==0 doc's URL span
    # (url tokens [src, modN, file_NNN, ext]) — weight 0.75, att 1.0
    r0 = idx.search("src mod0", k=100)
    rv = idx.search("src mod0", k=100, verbatim_tag_weight=2.0)
    assert r0.num_rows == 6  # 2 files per repo x 3 repos hit mod0
    u0 = dict(zip(r0["combined_id"].to_pylist(), r0["score_r"].to_pylist()))
    uv = dict(zip(rv["combined_id"].to_pylist(), rv["score_r"].to_pylist()))
    want_u = 2.0 * 0.75 * 2 * (1.0 + np.log1p(1.0))
    assert all(
        abs((uv[d] - u0[d]) - want_u) < 2e-6 for d in u0
    ), sorted(round(uv[d] - u0[d], 6) for d in u0)

    # quoted-phrase adjacency works on injected positions: the phrase
    # '"navterm extra0"' exists only in link-text repetitions (j%2==0
    # docs); '"extra0 navterm"' (reversed) never does
    ph = idx.search('"navterm extra0"', k=50)
    n_extra0 = sum(1 for j in range(0, len(repos), 3) if j % 2 == 0)
    assert ph.num_rows == n_extra0
    assert idx.search('"extra0 navterm"', k=50).num_rows == 0


def test_anchor_positions_randomized_vs_naive_model():
    """25 random (body, path, texts, counts) documents vs an independent
    per-token reimplementation of the position arithmetic — a different
    code path from the vectorized stage (scalar loop, explicit pos
    counter), so a shared bug cannot hide."""
    import math
    import random

    from marginaliasearch_ray.functions.wordpattern import tokenize

    rng = random.Random(7)
    stage = TokenizeStage(DomainRegistry(["org/r"], num_parts=1),
                          anchor_regions=True)
    vocab = ["alpha", "beta", "gamma", "x1", "y2", "nav"]
    paths = ["a/b.py", "deep/path/with.many.parts.js", "f.c", "one_token"]
    for _trial in range(25):
        body = " ".join(rng.choices(vocab, k=rng.randrange(0, 12)))
        path = rng.choice(paths)
        n_texts = rng.randrange(0, 3)
        texts = [
            " ".join(rng.choices(vocab, k=rng.randrange(1, 4)))
            for _ in range(n_texts)
        ]
        cnts = [rng.randrange(1, 300) for _ in texts]

        # naive scalar model of DocumentPositionMapper
        want: dict[str, list[int]] = {}

        def rec(w, p):
            want.setdefault(w, []).append(p)

        pos = 0
        for w in tokenize(body):
            pos += 1
            rec(w, pos)
        pos += 1  # mapDocumentPositions' trailing pos++
        pos += 2  # padding
        for w in tokenize(path.replace("/", " ").replace(".", " ")):
            pos += 1
            rec(w, pos)
        pos += 1  # mapUrlWordPositions' trailing pos++
        pos += 2  # padding
        for text, cnt in zip(texts, cnts):
            toks = tokenize(text)
            if not toks:
                continue
            for _ in range(int(max(1.0, min(math.sqrt(cnt), 12.0)))):
                for w in toks:
                    pos += 1
                    rec(w, pos)
                pos += 2

        out = stage(
            _batch(content=body, path=path,
                   lt_texts=texts if texts else None,
                   lt_counts=cnts if texts else None)
        )
        got = _row(out)
        for w, plist in want.items():
            tf, ppos = got[hash_nearly_ascii(w)]
            assert (tf, ppos) == (len(plist), plist), (body, path, texts, w)


@pytest.mark.usefixtures("ray_session")
def test_link_store_mode_is_byte_identical_to_join_mode(tmp_path):
    """The bucketed-side-store ingestion (corpus never re-shuffles) and
    the corpus left-join produce IDENTICAL journals; the store resolves
    misses, multi-text keys, and FIFO eviction correctly."""
    import pyarrow.parquet as pq
    import ray.data

    from marginaliasearch_ray.pipelines.build_index import (
        BuildConfig,
        build_index,
        build_link_store,
    )
    from marginaliasearch_ray.sources.corpus import synthesize_corpus
    from marginaliasearch_ray.stages.tokenize import LinkStoreLookup

    corpus = synthesize_corpus(n_repos=3, files_per_repo=5)
    repos = corpus["repo"].to_pylist()
    paths = corpus["path"].to_pylist()
    link_rows = {"repo": [], "path": [], "text": [], "cnt": []}
    for j in range(0, len(repos), 2):
        for t in range(1 + j % 2):  # some keys get two texts
            link_rows["repo"].append(repos[j])
            link_rows["path"].append(paths[j])
            link_rows["text"].append(f"storenav t{t}")
            link_rows["cnt"].append(4 + j + t)
    link_dir = str(tmp_path / "links.parquet")
    pq.write_table(pa.table(link_rows), link_dir)

    outs = {}
    for mode in ("join", "store"):
        out = str(tmp_path / f"idx_{mode}")
        build_index(
            ray.data.from_arrow(corpus), out,
            BuildConfig(num_parts=2, num_buckets=4, anchor_regions=True,
                        link_texts_dir=link_dir, link_texts_mode=mode,
                        link_store_cache_buckets=2),
        )
        t = pq.read_table(f"{out}/journal")
        o = np.argsort(t["combined_id"].to_numpy(zero_copy_only=False))
        outs[mode] = t.take(pa.array(o))
    assert outs["join"].equals(outs["store"])

    # direct lookup unit: hit with both texts (sorted), miss, cache cap
    lk = LinkStoreLookup(str(tmp_path / "idx_store" / "link_store"),
                         cache_buckets=2)
    j = 2  # a key with two texts (j % 2 == 0? j=2 -> 1 text; j=1 absent)
    hit = lk.get(repos[0], paths[0])
    assert hit == (["storenav t0"], [4])
    assert lk.get(repos[1], paths[1]) is None
    # probe several keys to exercise FIFO eviction without breakage
    for j in range(0, len(repos), 2):
        got = lk.get(repos[j], paths[j])
        n_texts = 1 + j % 2
        assert got is not None and len(got[0]) == n_texts, j


def test_link_store_lookup_collision_run(tmp_path):
    """Two different (repo, path) keys sharing one 64-bit hash resolve
    exactly: the lookup scans the equal-key run comparing the stored
    strings (hand-written store + a forced constant hash — real
    collisions are 2^-64)."""
    import json
    import os

    import pyarrow.parquet as pq

    from marginaliasearch_ray.stages.tokenize import LinkStoreLookup

    store = str(tmp_path / "store")
    os.makedirs(os.path.join(store, "bucket=5"))
    pq.write_table(
        pa.table(
            {
                "key": pa.array([77, 77], pa.int64()),
                "repo": pa.array(["org/a", "org/b"]),
                "path": pa.array(["x.py", "x.py"]),
                "lt_texts_pk": pa.array(["alpha", "beta\x1fgamma"]),
                "lt_counts_pk": pa.array(["9", "4,16"]),
            }
        ),
        os.path.join(store, "bucket=5", "part.parquet"),
    )
    with open(os.path.join(store, "_store.json"), "w") as f:
        json.dump({"num_buckets": 8}, f)
    lk = LinkStoreLookup(store)
    lk._hash = lambda s: 77  # force every key into the colliding run
    assert lk.get("org/a", "x.py") == (["alpha"], [9])
    assert lk.get("org/b", "x.py") == (["beta", "gamma"], [4, 16])
    assert lk.get("org/c", "x.py") is None  # same hash, no stored match


@pytest.mark.usefixtures("ray_session")
def test_extract_link_texts_from_corpus(tmp_path):
    """Corpus-derived anchor extraction: 'see <repo>/<path>' references
    yield (target, stripped-line-text) observations counted corpus-wide,
    and the result feeds attach_link_texts/build unchanged."""
    import ray.data

    from marginaliasearch_ray.pipelines.build_index import (
        BuildConfig,
        build_index,
        extract_link_texts,
    )
    from marginaliasearch_ray.pipelines.query import IndexSearch

    target = "org/core"
    tpath = "src/parser.py"
    docs = []
    # 3 docs reference the same target with the same anchor line text,
    # 1 with a different text, 1 has no reference
    for i in range(3):
        docs.append(
            f"filler line {i}\n// blazing parser, see {target}/{tpath}\nmore"
        )
    docs.append(f"# other mention ref: {target}/{tpath}\nrest")
    docs.append("nothing to see here at all")
    corpus = pa.table(
        {
            "repo": pa.array(["org/core", "org/a", "org/b", "org/c", "org/d"]),
            "path": pa.array([tpath, "x.py", "y.py", "z.py", "w.py"]),
            "commit": pa.array(["c" * 40] * 5),
            "lang": pa.array(["py"] * 5),
            "content": pa.array(
                ["def parse(): pass  # body of the target"] + docs[:4]
            ),
            "ordinal": pa.array(list(range(5)), pa.int32()),
        }
    )
    corpus_ds = ray.data.from_arrow(corpus)
    link_ds = extract_link_texts(corpus_ds)
    rows = {
        (r["repo"], r["path"], r["text"]): r["cnt"]
        for r in link_ds.take_all()
    }
    assert rows == {
        (target, tpath, "blazing parser,"): 3,
        (target, tpath, "other mention"): 1,
    }

    link_dir = str(tmp_path / "xlinks.parquet")
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "repo": pa.array([k[0] for k in rows], pa.string()),
                "path": pa.array([k[1] for k in rows], pa.string()),
                "text": pa.array([k[2] for k in rows], pa.string()),
                "cnt": pa.array(list(rows.values()), pa.int64()),
            }
        ),
        link_dir,
    )
    out = str(tmp_path / "xidx")
    build_index(
        corpus_ds, out,
        BuildConfig(num_parts=1, num_buckets=4, anchor_regions=True,
                    link_texts_dir=link_dir),
    )
    idx = IndexSearch(out, use_actors=False)
    # 'blazing' lives in the 3 referrers' bodies AND — via the extracted
    # anchor text — in the TARGET doc's linktext region: 4 matches, and
    # the target (ordinal 0) is only reachable through the injection
    res = idx.search("blazing", k=10)
    assert res.num_rows == 4
    assert 0 in set(res["doc_id"].to_pylist())


@pytest.mark.usefixtures("ray_session")
def test_delta_inherits_anchor_regions(tmp_path):
    """A delta over an anchor-enabled base tokenizes with anchor regions
    even when the caller's cfg says otherwise (same normalization as
    num_parts): the updated doc's URL tokens stay searchable through the
    chain, and the delta's journal manifest records the flag."""
    import ray.data

    from marginaliasearch_ray.pipelines.build_index import (
        BuildConfig,
        build_index,
    )
    from marginaliasearch_ray.pipelines.delta import build_delta_index
    from marginaliasearch_ray.pipelines.query import IndexSearch
    from marginaliasearch_ray.sources.corpus import synthesize_corpus
    from marginaliasearch_ray.state import manifest as mf

    corpus = synthesize_corpus(n_repos=2, files_per_repo=4)
    base = str(tmp_path / "base")
    build_index(
        ray.data.from_arrow(corpus), base,
        BuildConfig(num_parts=2, num_buckets=4, anchor_regions=True),
    )
    # update one existing doc (same repo/path/ordinal, new content)
    delta = corpus.slice(0, 1).set_column(
        corpus.schema.get_field_index("content"), "content",
        pa.array(["totally fresh delta body"], pa.string()),
    )
    ddir = str(tmp_path / "delta")
    build_delta_index(
        ray.data.from_arrow(delta), [base], ddir,
        BuildConfig(num_parts=2, num_buckets=4),  # anchor flag omitted
    )
    assert mf.read_manifest(ddir, "journal")["anchor_regions"] is True
    s = IndexSearch([base, ddir], use_actors=False)
    # 'src' is a URL token of every path; the updated doc must still
    # match via its (re-tokenized) URL region, not its old base copy
    res = s.search("src fresh", k=20)
    assert res.num_rows == 1
