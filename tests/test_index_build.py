"""End-to-end: synth corpus -> build_index -> posting-list + search parity
with a brute-force oracle (mirrors the reference's integration tests,
IndexQueryServiceIntegrationSmokeTest.java:105-150, and the SURVEY §5
oracle plan)."""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from marginaliasearch_ray.functions import bm25, idcodec
from marginaliasearch_ray.functions.codecs import decode_doc_ids, decode_counts
from marginaliasearch_ray.functions.murmur import hash_nearly_ascii
from marginaliasearch_ray.functions.wordpattern import tokenize
from marginaliasearch_ray.pipelines.build_index import BuildConfig, build_index
from marginaliasearch_ray.pipelines.query import IndexSearch, SearcherLogic, compile_query
from marginaliasearch_ray.sources.corpus import synthesize_corpus
from marginaliasearch_ray.stages.docids import DomainRegistry

NUM_PARTS = 3


@pytest.fixture(scope="session")
def corpus_table():
    return synthesize_corpus(n_repos=6, files_per_repo=12, seed=7)


@pytest.fixture(scope="session")
def index_dir(ray_session, corpus_table, tmp_path_factory):
    import ray.data

    out = str(tmp_path_factory.mktemp("index"))
    # exercise the full scale path: salted pre-merge + final merge as a
    # stateful actor pool
    # posting_block=8: the 72-doc corpus still earns block-max entries, so
    # every parity test below also validates the blocked segment format
    cfg = BuildConfig(num_parts=NUM_PARTS, num_buckets=8, num_salts=2,
                      hot_df_threshold=20, premerge_salted=True,
                      merge_concurrency=2, posting_block=8)
    build_index(ray.data.from_arrow(corpus_table), out, cfg)
    return out


@pytest.fixture(scope="session")
def oracle(corpus_table):
    """Brute-force in-memory oracle with identical formulas."""
    repos = corpus_table["repo"].to_pylist()
    paths = corpus_table["path"].to_pylist()
    contents = corpus_table["content"].to_pylist()
    ordinals = corpus_table["ordinal"].to_pylist()
    reg = DomainRegistry(repos, NUM_PARTS)
    docs = []
    for i in range(len(repos)):
        dom, rank, part = reg.lookup(repos[i])
        cid = int(idcodec.encode_id_with_rank(rank, dom, ordinals[i]))
        toks = tokenize(contents[i])
        docs.append(
            {
                "repo": repos[i],
                "path": paths[i],
                "cid": cid,
                "ordinal": ordinals[i],
                "toks": toks,
                "tf": {},
            }
        )
        for t in toks:
            docs[-1]["tf"][t] = docs[-1]["tf"].get(t, 0) + 1
    return {"docs": docs, "registry": reg}


def oracle_search(oracle, query, k=10):
    cq = compile_query(query)
    docs = oracle["docs"]
    n = len(docs)
    df = {}
    for t in set(cq.include) | set(cq.exclude):
        df[t] = sum(1 for d in docs if t in d["tf"])
    out = []
    for d in docs:
        if not cq.include or any(t not in d["tf"] for t in cq.include):
            continue
        if any(t in d["tf"] for t in cq.exclude):
            continue
        if cq.repo is not None and d["repo"] != cq.repo:
            continue
        ok = True
        for phrase in cq.phrases:
            if len(phrase) < 2:
                continue
            hits = False
            toks = d["toks"]
            for s in range(len(toks) - len(phrase) + 1):
                if toks[s : s + len(phrase)] == phrase:
                    hits = True
                    break
            if not hits:
                ok = False
                break
        if not ok:
            continue
        score = 0.0
        for t in cq.include:
            score += float(
                bm25.bm25_term_score(n, df[t], d["tf"][t], len(d["toks"]))
            )
        out.append((round(score, 6), d["ordinal"], d["cid"]))
    out.sort(key=lambda x: (-x[0], x[1]))
    return out[:k]


def test_journal_sha_invariant(index_dir, corpus_table):
    import hashlib

    j = pq.read_table(os.path.join(index_dir, "journal"),
                      columns=["repo", "path", "data_hash"])
    got = {(r, p): h for r, p, h in zip(j["repo"].to_pylist(),
                                        j["path"].to_pylist(),
                                        j["data_hash"].to_pylist())}
    for r, p, c in zip(corpus_table["repo"].to_pylist(),
                       corpus_table["path"].to_pylist(),
                       corpus_table["content"].to_pylist()):
        assert got[(r, p)] == hashlib.sha256(c.encode()).hexdigest()
    assert len(got) == corpus_table.num_rows


def test_posting_lists_match_bruteforce(index_dir, oracle):
    # mirrors FullReverseIndexReaderTest exact-array assertions
    segs = [SearcherLogic(index_dir, p).seg for p in range(NUM_PARTS)]
    for term in ["license", "uniq_0_1_token", "parse_tree", "nosuchterm_xyz"]:
        tid = hash_nearly_ascii(term)
        got = np.sort(np.concatenate([s.postings(tid)[0] for s in segs]))
        want = np.sort(
            np.array(
                [d["cid"] for d in oracle["docs"] if term in d["tf"]],
                dtype=np.int64,
            )
        )
        assert got.tolist() == want.tolist(), term
        # tfs match too
        for s in segs:
            docs, tfs = s.postings(tid)
            by_cid = {d["cid"]: d["tf"].get(term, 0) for d in oracle["docs"]}
            for c, tf in zip(docs.tolist(), tfs.tolist()):
                assert tf == by_cid[c]


def test_forward_sorted_and_complete(index_dir, oracle):
    total = 0
    for p in range(NUM_PARTS):
        part_dir = os.path.join(index_dir, "forward", f"part={p}")
        if not os.path.isdir(part_dir):
            continue
        t = pq.read_table(part_dir, columns=["combined_id", "size"])
        ids = t["combined_id"].to_numpy()
        total += len(ids)
    assert total == len(oracle["docs"])


def test_search_parity_with_oracle(index_dir, oracle, ray_session):
    idx = IndexSearch(index_dir, use_actors=False)
    queries = [
        "license",
        "parse_tree",
        "license import",
        "parse tree -license",
        "uniq_0_1_token",
        '"parse_tree parse_tree"',
        "license repo:org0000/repo0000",
        "nosuchterm_xyz",
        "license -license",
    ]
    for q in queries:
        got = idx.search(q, k=10)
        want = oracle_search(oracle, q, k=10)
        got_pairs = list(zip(got["doc_id"].to_pylist(), got["score_r"].to_pylist()))
        want_pairs = [(w[1], w[0]) for w in want]
        assert got_pairs == want_pairs, q


def test_search_with_actor_pool(index_dir, oracle, ray_session):
    idx = IndexSearch(index_dir, use_actors=True)
    try:
        got = idx.search("license import", k=5)
        want = oracle_search(oracle, "license import", k=5)
        assert got["doc_id"].to_pylist() == [w[1] for w in want]
    finally:
        idx.shutdown()


def test_spans_recorded(index_dir):
    import os

    j = pq.read_table(
        os.path.join(index_dir, "journal"),
        columns=["span_codes", "spans", "size"],
    )
    codes = j["span_codes"].to_pylist()
    spans = j["spans"].to_pylist()
    sizes = j["size"].to_pylist()
    assert any(b"c" in (c or b"") for c in codes)  # synthetic corpus has // comments
    for c, sp, sz in zip(codes, spans, sizes):
        for code, pairs in zip(c or b"", sp):
            assert len(pairs) % 2 == 0
            for i in range(0, len(pairs), 2):
                assert 1 <= pairs[i] < pairs[i + 1] <= sz + 1
            if code == ord("h"):
                assert pairs[1] - pairs[0] <= 16


def test_query_expansion_variants(index_dir, oracle, ray_session):
    from marginaliasearch_ray.pipelines.query import expand_term

    variants = set(expand_term("parse.tree"))
    assert variants == {"parse.tree", "parse_tree", "parsetree", "parse-tree"}
    idx = IndexSearch(index_dir, use_actors=False)
    exp = idx.search("parse.tree", k=1000, expand=True)
    want = {
        d["ordinal"]
        for d in oracle["docs"]
        if any(v in d["tf"] for v in variants)
    }
    assert set(exp["doc_id"].to_pylist()) == want
    assert len(want) > 0  # the synthetic vocab contains several variants
    plain = idx.search("parse.tree", k=1000)
    assert plain.num_rows <= exp.num_rows


def test_dedup_by_hash_and_domain_cap(index_dir, ray_session):
    idx = IndexSearch(index_dir, use_actors=False)
    t = idx.search("license", k=20, dedup_by_hash=True, decorate=True)
    hashes = t["data_hash"].to_pylist()
    assert len(hashes) == len(set(hashes)) > 0  # corpus has dup contents
    t2 = idx.search("license", k=20, domain_cap=1)
    doms = [int(idcodec.get_domain_id(c)) for c in t2["combined_id"].to_pylist()]
    assert len(doms) == len(set(doms)) > 0
    # without the cap there are more results than domains
    t3 = idx.search("license", k=20)
    assert t3.num_rows > t2.num_rows


def test_ngram_segmentation_expansion(index_dir, oracle, ray_session):
    # the synthetic vocab contains joined identifiers like merge_buffer;
    # with expand=True the query "merge buffer" must also match docs that
    # only contain a joined variant
    idx = IndexSearch(index_dir, use_actors=False)
    joined_variants = {"merge_buffer", "mergebuffer", "merge-buffer", "merge.buffer"}
    present = {
        v
        for v in joined_variants
        if any(v in d["tf"] for d in oracle["docs"])
    }
    assert present  # vocab guarantees at least merge_buffer exists
    exp = idx.search("merge buffer", k=1000, expand=True)
    want = {
        d["ordinal"]
        for d in oracle["docs"]
        if (
            ("merge" in d["tf"] or any(v in d["tf"] for v in present))
            and ("buffer" in d["tf"] or any(v in d["tf"] for v in present))
        )
    }
    assert set(exp["doc_id"].to_pylist()) == want
    plain = idx.search("merge buffer", k=1000)
    assert plain.num_rows <= exp.num_rows


def test_rank_bonus_component(index_dir, oracle, ray_session):
    from marginaliasearch_ray.functions import metadata as md
    from marginaliasearch_ray.stages.docids import repo_rank

    idx = IndexSearch(index_dir, use_actors=False)
    base = idx.search("license", k=50)
    boosted = idx.search("license", k=50, rank_bonus_weight=1.0)
    base_scores = dict(
        zip(base["combined_id"].to_pylist(), base["score_r"].to_pylist())
    )
    repo_of = {d["cid"]: d["repo"] for d in oracle["docs"]}
    checked = 0
    for cid, s in zip(
        boosted["combined_id"].to_pylist(), boosted["score_r"].to_pylist()
    ):
        if cid in base_scores:
            # rank field = repo_rank << 2 (tokenize packs 6-bit rank into
            # the 8-bit DocumentMetadata rank slot)
            want = base_scores[cid] + (255 - (repo_rank(repo_of[cid]) << 2)) / 100.0
            assert abs(s - want) < 1e-5, cid
            checked += 1
    assert checked > 0


def test_search_budget_truncates(index_dir, ray_session):
    idx = IndexSearch(index_dir, use_actors=False)
    full = idx.search('"license import"', k=100)
    trunc = idx.search('"license import"', k=100, budget_s=0.0)
    assert trunc.num_rows <= full.num_rows
    # default budget is infinite -> identical to full
    again = idx.search('"license import"', k=100)
    assert again.to_pylist() == full.to_pylist()


def test_segment_level_resume(index_dir, ray_session, corpus_table):
    """North-rule resumability: a failed reverse build restarts from the
    last committed segment — only the missing partition is rebuilt."""
    import os
    import shutil

    import ray.data

    from marginaliasearch_ray.state import manifest as mfst

    # simulate a crash that lost part 1's segment mid-reverse
    shutil.rmtree(os.path.join(index_dir, "postings", "part=1"))
    os.remove(mfst.manifest_path(index_dir, "reverse_part_1"))
    os.remove(mfst.manifest_path(index_dir, "reverse"))

    untouched = os.path.join(index_dir, "postings", "part=0")
    mtime_before = max(
        os.path.getmtime(os.path.join(untouched, f))
        for f in os.listdir(untouched)
    )

    build_index(ray.data.from_arrow(corpus_table), index_dir,
                BuildConfig(num_parts=NUM_PARTS, num_buckets=8, num_salts=2,
                            hot_df_threshold=20, premerge_salted=True,
                            merge_concurrency=2))

    # part 1 rebuilt, part 0 untouched
    assert os.path.isdir(os.path.join(index_dir, "postings", "part=1"))
    mtime_after = max(
        os.path.getmtime(os.path.join(untouched, f))
        for f in os.listdir(untouched)
    )
    assert mtime_after == mtime_before
    # queries still correct after the segment-level resume
    idx = IndexSearch(index_dir, use_actors=False)
    assert idx.search("license", k=5).num_rows == 5


def test_resume_skips_committed_phases(index_dir, ray_session, corpus_table):
    import time
    import ray.data

    t0 = time.time()
    build_index(ray.data.from_arrow(corpus_table), index_dir,
                BuildConfig(num_parts=NUM_PARTS, num_buckets=8, num_salts=2,
                            hot_df_threshold=20))
    assert time.time() - t0 < 5  # all phases skipped via manifests


def test_ngram_triple_segmentation(ray_session, tmp_path_factory):
    """A window of THREE adjacent query terms joined in the corpus
    (fast_table_scan) must be matched by `fast table scan` with
    expand=True (multi-length segment probe, longest-first)."""
    import pyarrow as pa

    from marginaliasearch_ray.pipelines.build_index import BuildConfig, build_index
    from marginaliasearch_ray.pipelines.query import IndexSearch
    import ray.data

    docs = [
        ("org/a", "src/x.py", "fast table scan in words", 0),
        ("org/a", "src/y.py", "only fast_table_scan here", 1),
        ("org/a", "src/z.py", "unrelated words entirely", 2),
        ("org/a", "src/w.py", "fast but no table here", 3),
    ]
    tbl = pa.table(
        {
            "repo": pa.array([d[0] for d in docs]),
            "path": pa.array([d[1] for d in docs]),
            "commit": pa.array(["c" * 40] * len(docs)),
            "lang": pa.array(["py"] * len(docs)),
            "content": pa.array([d[2] for d in docs]),
            "ordinal": pa.array([d[3] for d in docs], pa.int32()),
        }
    )
    out = str(tmp_path_factory.mktemp("triseg"))
    build_index(ray.data.from_arrow(tbl), out, BuildConfig(num_parts=1, num_buckets=4))
    idx = IndexSearch(out, use_actors=False)
    plain = set(idx.search("fast table scan", k=10)["doc_id"].to_pylist())
    exp = set(
        idx.search("fast table scan", k=10, expand=True)["doc_id"].to_pylist()
    )
    assert plain == {0}
    assert exp == {0, 1}  # joined-identifier doc admitted via the probe


def test_advice_term_filters_but_does_not_score(ray_session, tmp_path_factory):
    """generator:-style advice terms must FILTER candidates to documents
    carrying the keyword, while contributing nothing to the score (here
    the keyword appears in the body; the build also injects synthetic
    site:/generator: keywords per doc — see
    test_expansion_strategies_admit_variant_docs)."""
    import pyarrow as pa
    import ray.data

    from marginaliasearch_ray.pipelines.build_index import BuildConfig, build_index
    from marginaliasearch_ray.pipelines.query import IndexSearch

    docs = [
        ("org/a", "a.py", "customer data and more customer words", 0),
        ("org/a", "b.py", "customer with generator:wiki marker", 1),
        ("org/a", "c.py", "generator:wiki but no c-word", 2),
    ]
    tbl = pa.table(
        {
            "repo": pa.array([d[0] for d in docs]),
            "path": pa.array([d[1] for d in docs]),
            "commit": pa.array(["c" * 40] * len(docs)),
            "lang": pa.array(["py"] * len(docs)),
            "content": pa.array([d[2] for d in docs]),
            "ordinal": pa.array([d[3] for d in docs], pa.int32()),
        }
    )
    out = str(tmp_path_factory.mktemp("advice"))
    build_index(ray.data.from_arrow(tbl), out, BuildConfig(num_parts=1, num_buckets=4))
    idx = IndexSearch(out, use_actors=False)

    plain = idx.search("customer", k=10)
    assert set(plain["doc_id"].to_pylist()) == {0, 1}
    advised = idx.search("customer generator:wiki", k=10)
    assert advised["doc_id"].to_pylist() == [1]
    # unscored: the advised doc keeps its plain-query score
    plain_scores = dict(
        zip(plain["doc_id"].to_pylist(), plain["score_r"].to_pylist())
    )
    assert advised["score_r"][0].as_py() == plain_scores[1]


def test_expansion_strategies_admit_variant_docs(ray_session, tmp_path_factory):
    """Positive end-to-end evidence for every QueryExpansion strategy: on a
    corpus that actually contains the variant tokens, each expansion flag
    must admit documents the plain query misses (QueryFactoryTest.java
    expansion smoke cases; the driver's word-salad corpus can only exercise
    a subset of these non-vacuously)."""
    import pyarrow as pa
    import ray.data

    from marginaliasearch_ray.pipelines.build_index import BuildConfig, build_index
    from marginaliasearch_ray.pipelines.query import IndexSearch

    docs = [
        ("org/a", "a.py", "customer merge data", 0),
        ("org/a", "b.py", "customer merges often", 1),
        ("org/a", "c.py", "customer fast_table here", 2),
        # ordinal 3 -> the build injects the synthetic generator:wiki keyword
        ("org/a", "d.py", "customer fast table split", 3),
        ("org/a", "e.py", "customer mp-3 encoder", 4),
        ("org/a", "f.py", "customer wiki things", 5),
        ("org/a", "g.py", "customer plain words", 6),
    ]
    tbl = pa.table(
        {
            "repo": pa.array([d[0] for d in docs]),
            "path": pa.array([d[1] for d in docs]),
            "commit": pa.array(["c" * 40] * len(docs)),
            "lang": pa.array(["py"] * len(docs)),
            "content": pa.array([d[2] for d in docs]),
            "ordinal": pa.array([d[3] for d in docs], pa.int32()),
        }
    )
    out = str(tmp_path_factory.mktemp("expansion"))
    build_index(ray.data.from_arrow(tbl), out, BuildConfig(num_parts=1, num_buckets=4))
    idx = IndexSearch(out, use_actors=False)

    def ids(q, **kw):
        return set(idx.search(q, k=10, **kw)["doc_id"].to_pylist())

    # nounPluralFormsEN: 'merges' also matches the singular form
    assert ids("customer merges") == {1}
    assert ids("customer merges", expand_plural=True) == {0, 1}
    # separator expansion: joined identifier also matches the segmented
    # word pair (and vice versa every joined separator variant)
    assert ids("customer fast_table") == {2}
    assert ids("customer fast_table", expand=True) == {2, 3}
    # splitWordNum: 'mp3' also matches the dashed identifier
    assert ids("customer mp3") == set()
    assert ids("customer mp3", expand_wordnum=True) == {4}
    # categoryKeywords: 'wiki' also matches the synthetic generator:wiki
    # keyword injected at build time (ordinal % 7 == 3)
    assert ids("customer wiki") == {5}
    assert ids("customer wiki", expand_category=True) == {3, 5}
    # site: advice keyword injected at build time filters by repo
    assert ids("customer site:org/a") == {0, 1, 2, 3, 4, 5, 6}


def test_multiplicative_priority_normalize(index_dir, oracle):
    """Reference-exact final composition (IndexResultRankingService.java:
    145-158): score = normalize(Σscores * exp(priorityTermAdjustment/5),
    penalty) with adj = 1.0 per present ?term + 1.0 per ?org: domain
    match.  Recompose the expected value from the raw-score and
    plain-normalized runs and check the multiplicative run matches."""
    import math

    idx = IndexSearch(index_dir, use_actors=False)

    def by_key(t):
        # ordinals repeat across repos in this fixture; key by (repo, path)
        return {
            (r, p): s
            for r, p, s in zip(
                t["repo"].to_pylist(),
                t["path"].to_pylist(),
                t["score_r"].to_pylist(),
            )
        }

    raw = by_key(idx.search("license", k=1000, decorate=True))
    norm = by_key(
        idx.search("license", k=1000, normalize_score=True, decorate=True)
    )
    mult_t = idx.search(
        "license ?import ?org:org0000",
        k=1000,
        normalize_score=True,
        multiplicative_priority=True,
        decorate=True,
    )
    got = by_key(mult_t)
    docs_by = {(d["repo"], d["path"]): d for d in oracle["docs"]}
    raw_by, norm_by = raw, norm
    assert set(got) == set(raw_by) == set(norm_by)
    n_boosted = 0
    for key, r in raw_by.items():
        # recover the normalize penalty from the plain-normalized run:
        # norm = sqrt((501 + 20p) / (1 + r))  =>  20p = norm^2*(1+r) - 501
        p20 = norm_by[key] ** 2 * (1.0 + r) - 501.0
        d = docs_by[key]
        adj = (1.0 if "import" in d["tf"] else 0.0) + (
            1.0 if d["repo"].startswith("org0000") else 0.0
        )
        n_boosted += adj > 0
        want = math.sqrt((501.0 + p20) / (1.0 + r * math.exp(adj / 5.0)))
        assert abs(got[key] - want) < 1e-4, (key, got[key], want, adj)
    # the fixture corpus must actually exercise the boost
    assert n_boosted > 0
    # lower-is-better: ascending order end-to-end
    scores = mult_t["score_r"].to_pylist()
    assert scores == sorted(scores)


def test_parallel_parts_identical_postings(
    ray_session, corpus_table, index_dir, tmp_path_factory
):
    """cfg.parallel_parts=2 (concurrent per-part reverse builds from
    driver threads) must produce byte-identical posting segments to the
    sequential path and commit every per-part manifest."""
    import ray.data
    import pyarrow.dataset as pads

    from marginaliasearch_ray.state import manifest as mf

    out = str(tmp_path_factory.mktemp("index_pp"))
    cfg = BuildConfig(num_parts=NUM_PARTS, num_buckets=8, num_salts=2,
                      hot_df_threshold=20, premerge_salted=True,
                      parallel_parts=2)
    build_index(ray.data.from_arrow(corpus_table), out, cfg)

    for p in range(NUM_PARTS):
        assert mf.is_committed(out, f"reverse_part_{p}")
        a = (
            pads.dataset(os.path.join(index_dir, "postings", f"part={p}"))
            .to_table()
            .sort_by("term_id")
        )
        b = (
            pads.dataset(os.path.join(out, "postings", f"part={p}"))
            .to_table()
            .sort_by("term_id")
        )
        assert a.column("term_id").equals(b.column("term_id"))
        assert a.column("df").equals(b.column("df"))
        assert a.column("docs").to_pylist() == b.column("docs").to_pylist()


def _comment_spans_of(content):
    from marginaliasearch_ray.stages.tokenize import (
        SPAN_COMMENT,
        tokenize_with_spans,
    )

    toks, codes, spans = tokenize_with_spans(content)
    pairs = []
    for code, flat in zip(codes, spans):
        if code == SPAN_COMMENT:
            pairs = [(flat[j], flat[j + 1]) for j in range(0, len(flat), 2)]
    return toks, pairs


def test_heading_bonus_matches_bruteforce(index_dir, oracle, corpus_table):
    """getProximitiyFac:394-400 on the comment-span heading analog: the
    score delta vs the no-bonus run is w * obs exactly when the total
    comment-span observation count equals the keyword count and the
    comment field is short (< 64 tokens)."""
    idx = IndexSearch(index_dir, use_actors=False)
    terms = ["license", "import"]
    qstr = " ".join(terms)
    w = 1.0
    plain = idx.search(qstr, k=1000, decorate=True)
    boosted = idx.search(qstr, k=1000, decorate=True, heading_bonus_weight=w)

    def by_key(t):
        return {
            (r, p): s
            for r, p, s in zip(
                t["repo"].to_pylist(),
                t["path"].to_pylist(),
                t["score_r"].to_pylist(),
            )
        }

    pl, bo = by_key(plain), by_key(boosted)
    assert set(pl) == set(bo)
    contents = {
        (r, p): c
        for r, p, c in zip(
            corpus_table["repo"].to_pylist(),
            corpus_table["path"].to_pylist(),
            corpus_table["content"].to_pylist(),
        )
    }
    n_hit = 0
    for key, s0 in pl.items():
        toks, pairs = _comment_spans_of(contents[key])
        clen = sum(e - s for s, e in pairs)
        obs = sum(
            1
            for i, t in enumerate(toks, start=1)
            if t in terms and any(s <= i < e for s, e in pairs)
        )
        want = w * obs if (obs == len(terms) and clen < 64) else 0.0
        n_hit += want > 0
        assert abs((bo[key] - s0) - want) < 1e-4, (key, bo[key] - s0, want)
    assert n_hit > 0  # the fixture corpus must actually exercise the bonus


def test_positions_mask_matches_bruteforce(index_dir, oracle, corpus_table):
    """calculatePositionsMask: bit floor(sqrt(p)) per full-group
    adjacency start, first 64, vs a brute-force scan of the corpus."""
    import math

    idx = IndexSearch(index_dir, use_actors=False)
    terms = ["rank_token", "import"]
    t = idx.search(
        " ".join(terms), k=1000, decorate=True, positions_mask=True
    )
    contents = {
        (r, p): c
        for r, p, c in zip(
            corpus_table["repo"].to_pylist(),
            corpus_table["path"].to_pylist(),
            corpus_table["content"].to_pylist(),
        )
    }
    n_nonzero = 0
    for r, p, got in zip(
        t["repo"].to_pylist(),
        t["path"].to_pylist(),
        t["positions_mask"].to_pylist(),
    ):
        toks = tokenize(contents[(r, p)])
        starts = [
            i
            for i in range(1, len(toks) - len(terms) + 2)
            if all(toks[i - 1 + j] == terms[j] for j in range(len(terms)))
        ]
        mask = 0
        for s in starts[:64]:
            bit = int(math.isqrt(s))
            mask |= 1 << (bit & 63)
            if bit >= 64:
                break
        assert got == mask, ((r, p), got, mask)
        n_nonzero += mask != 0
    assert n_nonzero > 0


def test_mask_from_keys_java_wrap_semantics():
    """Java-exact over-64 behavior of the vectorized mask kernel
    (IndexResultRankingService.java:265-278): with positions > 4096
    (bit >= 64), `1L << bit` wraps (& 63) and the loop stops AFTER
    processing the first over-64 element.  Reference loop ported
    literally below; vectors chosen so wrap and stop both fire."""
    import numpy as np

    from marginaliasearch_ray.pipelines.query import _POS_SHIFT, _mask_from_keys

    def java_mask(positions):
        result, bit = 0, 0
        for p in positions[:64]:  # findIntersections(..., 64) limit
            if bit >= 64:
                break
            bit = int(np.sqrt(p))
            result |= (1 << (bit & 63)) & 0xFFFFFFFFFFFFFFFF
        return result

    cases = [
        [1, 9, 100],                      # all under: plain bits 1,3,10
        [4095, 4096, 4097],               # 4096 -> bit 64 wraps to 0, stops
        [25, 5000, 36, 49],               # stop after 5000; 36/49 excluded
        [4225, 10],                       # first element already over
        [16640, 17030],                   # bits 129,130 wrap to 1,2; stop at 129
        list(range(1, 200)),              # >64 intersections: rank cap
        [3969, 4096],                     # boundary pair: 63 then wrapped 0
    ]
    n = len(cases)
    keys = []
    for ci, positions in enumerate(cases):
        for p in positions:
            keys.append(ci * int(_POS_SHIFT) + p)
    got = _mask_from_keys(np.sort(np.array(keys, dtype=np.int64)), n)
    for ci, positions in enumerate(cases):
        want = java_mask(sorted(positions))
        assert int(got[ci]) == want, (ci, positions, int(got[ci]), want)


def test_explain_factor_decomposition(index_dir, oracle, ray_session):
    """search(explain=True) — the DebugRankingFactors surface
    (DebugRankingFactors.java:10-40, IndexResultRankingService.java:
    173-177,334-338): the fx_* score factors must sum to score_r for the
    additive composition, the ranking must be identical to the
    explain-off twin, and the documentParam fields must match the packed
    metadata decodes."""
    from marginaliasearch_ray.functions.wordpattern import tokenize as _tok
    from marginaliasearch_ray.pipelines.query import (
        FX_PARAM_COLS,
        FX_SCORE_COLS,
    )

    s = IndexSearch(index_dir, use_actors=False)
    kw = dict(
        k=10,
        first_position_weight=1.0,
        proximity_weight=1.0,
        verbatim_weight=1.0,
        flags_weight=1.0,
        document_bonus_weight=1.0,
    )
    t_on = s.search("license import ?treeread", explain=True, **kw)
    t_off = s.search("license import ?treeread", **kw)
    assert t_on["combined_id"].to_pylist() == t_off["combined_id"].to_pylist()
    assert t_on["score_r"].to_pylist() == t_off["score_r"].to_pylist()
    for col in FX_SCORE_COLS + FX_PARAM_COLS:
        assert col in t_on.column_names
        assert col not in t_off.column_names

    total = np.zeros(t_on.num_rows)
    for col in FX_SCORE_COLS:
        total += np.asarray(t_on[col].to_pylist())
    assert np.allclose(np.round(total, 5),
                       np.round(np.asarray(t_on["score_r"].to_pylist()), 5))

    # the enabled components must actually attribute something somewhere
    assert any(v > 0 for v in t_on["fx_bm25"].to_pylist())

    # documentParam fields vs a from-scratch decode of the corpus
    by_cid = {d["cid"]: d for d in oracle["docs"]}
    for row in t_on.to_pylist():
        d = by_cid[row["combined_id"]]
        n_tok = len(d["toks"])
        assert row["fx_size"] == 5 * min(255, max(1, n_tok // 5))
        assert 0 <= row["fx_asl"] <= 3
        assert 0 <= row["fx_quality"] <= 15
        assert row["fx_year"] == 1996 + d["ordinal"] % 30
        assert row["fx_rank"] % 4 == 0  # 6-bit repo rank << 2

    # priority factor: the ?term contributes to fx_priority only
    hit = [r for r in t_on.to_pylist()
           if "treeread" in by_cid[r["combined_id"]]["tf"]]
    miss = [r for r in t_on.to_pylist()
            if "treeread" not in by_cid[r["combined_id"]]["tf"]]
    assert all(r["fx_priority"] > 0 for r in hit)
    assert all(r["fx_priority"] == 0 for r in miss)

    # non-additive compositions still explain (score_r is the transformed
    # value; factors stay the pre-transform deltas)
    t_norm = s.search(
        "license import ?treeread", explain=True, normalize_score=True,
        multiplicative_priority=True, **kw
    )
    for col in FX_SCORE_COLS:
        assert np.isfinite(t_norm[col].to_pylist()).all()
    s.shutdown()
