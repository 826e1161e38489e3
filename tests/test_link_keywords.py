"""Synthetic links:<dst> external-link keywords
(HtmlDocumentProcessorPlugin.createLinkKeywords:308-323) and the
backlink / site-to-site link searches they power
(SearchOperator.doBacklinkSearch:103-115, doLinkSearch:117-128).

The corpus has org/repo domain names so the links:<top-domain> variant
is distinct from links:<repo>.  A scalar twin of the ring derivation
(pipelines/ranking.link_edges contract) computes every doc's expected
target set independently."""

import pyarrow as pa
import pytest

from marginaliasearch_ray.pipelines.build_index import BuildConfig, build_index
from marginaliasearch_ray.pipelines.query import IndexSearch, compile_query

REPOS = [f"org{i % 3}/repo{i}" for i in range(6)]
N_DOCS = 60


def _content(ordn: int) -> str:
    words = ["alpha", "beta", "gamma", "delta"]
    return " ".join(words[(ordn * 7 + k) % 4] for k in range(5 + ordn % 17))


def _corpus() -> pa.Table:
    rows = {"repo": [], "path": [], "commit": [], "lang": [], "content": [],
            "ordinal": []}
    for ordn in range(N_DOCS):
        rows["repo"].append(REPOS[ordn % 6])
        rows["path"].append(f"f_{ordn}.py")
        rows["commit"].append("0" * 40)
        rows["lang"].append("py")
        rows["content"].append(_content(ordn))
        rows["ordinal"].append(ordn)
    return pa.table(
        {
            "repo": pa.array(rows["repo"], pa.string()),
            "path": pa.array(rows["path"], pa.string()),
            "commit": pa.array(rows["commit"], pa.string()),
            "lang": pa.array(rows["lang"], pa.string()),
            "content": pa.array(rows["content"], pa.string()),
            "ordinal": pa.array(rows["ordinal"], pa.int32()),
        }
    )


def _expected_keywords(ordn: int) -> set:
    """Scalar twin of the TokenizeStage injection: ring targets over the
    sorted repo list, self-links dropped, repo + top-domain forms."""
    repos = sorted(set(REPOS))
    s = repos.index(REPOS[ordn % 6])
    n = len(repos)
    nc = len(_content(ordn))
    out = set()
    for j in (1, 2):
        t = (s + 1 + (ordn * 7 + 13 * j + nc) % (1 + s % 7)) % n
        if t == s:
            continue
        out.add(f"links:{repos[t]}")
        out.add(f"links:{repos[t].split('/', 1)[0]}")
    return out


@pytest.fixture(scope="module")
def links_index(ray_session, tmp_path_factory):
    import ray.data

    out = str(tmp_path_factory.mktemp("linkkw_idx"))
    build_index(
        ray.data.from_arrow(_corpus()),
        out,
        BuildConfig(num_parts=2, num_buckets=4, num_salts=1,
                    hot_df_threshold=1000, link_keywords=True),
    )
    return IndexSearch(out, use_actors=False), out


def test_parser_routes_links_to_include():
    cq = compile_query("alpha links:org0/repo0 repo:org1/repo1")
    assert "links:org0/repo0" in cq.include
    assert cq.repo == "org1/repo1"
    # scored like an ordinary term, NOT an advice term
    assert "links:org0/repo0" not in cq.advice


def test_per_doc_membership_matches_scalar_twin(links_index):
    ix, _ = links_index
    # membership per keyword: exactly the docs whose scalar twin set
    # contains it
    all_kws = set()
    for ordn in range(N_DOCS):
        all_kws |= _expected_keywords(ordn)
    assert all_kws, "derivation produced no keywords"
    for kw in sorted(all_kws):
        got = set(ix.search(kw, k=N_DOCS + 10)["doc_id"].to_pylist())
        want = {o for o in range(N_DOCS) if kw in _expected_keywords(o)}
        assert got == want, f"{kw}: {got ^ want}"


def test_topdomain_variant_is_distinct(links_index):
    ix, _ = links_index
    # links:org0 matches the union of links:org0/repo0 + links:org0/repo3
    top = set(ix.search("links:org0", k=100)["doc_id"].to_pylist())
    union = set()
    for r in ("org0/repo0", "org0/repo3"):
        union |= set(ix.search(f"links:{r}", k=100)["doc_id"].to_pylist())
    assert top == union and top


def test_link_search_repo_restriction(links_index):
    ix, _ = links_index
    kw = "links:org0/repo3"
    src = "org0/repo0"
    both = set(ix.search(f"repo:{src} {kw}", k=100)["doc_id"].to_pylist())
    want = {
        o for o in range(N_DOCS)
        if REPOS[o % 6] == src and kw in _expected_keywords(o)
    }
    assert both == want


def test_edge_set_parity_with_link_graph(links_index, ray_session):
    """The per-doc keyword sets cover exactly ranking.link_edges' (src,
    dst) pairs (presence; the keyword Set dedups the parallel duplicate
    targets link_edges counts in its weight)."""
    import ray.data

    from marginaliasearch_ray.pipelines import ranking

    ix, _ = links_index
    docs = pa.table(
        {
            "doc_id": pa.array(list(range(N_DOCS)), pa.int64()),
            "source": pa.array([REPOS[o % 6] for o in range(N_DOCS)],
                               pa.string()),
            "n_chars": pa.array([len(_content(o)) for o in range(N_DOCS)],
                                pa.int64()),
        }
    )
    edges = ranking.link_edges(ray.data.from_arrow(docs))
    expected_pairs = {(r["src"], r["dst"]) for r in edges.to_pylist()}
    got_pairs = set()
    for src in sorted(set(REPOS)):
        for dst in sorted(set(REPOS)):
            if src == dst:
                continue
            n = ix.search(f"repo:{src} links:{dst}", k=100).num_rows
            if n:
                got_pairs.add((src, dst))
    assert got_pairs == expected_pairs


def test_manifest_records_link_keywords(links_index):
    _, out = links_index
    from marginaliasearch_ray.state import manifest as mf

    assert mf.read_manifest(out, "journal")["link_keywords"] is True


def test_crosstalk_directions(links_index):
    """SearchCrosstalkService.crosstalk:66-84 — both link directions in
    one view; an edgeless direction is legitimately empty."""
    ix, _ = links_index
    # find a pair with at least one direction populated
    a, b = "org0/repo0", "org0/repo3"
    t = ix.crosstalk(a, b)
    ab = {r["doc_id"] for r in t.to_pylist() if r["direction"] == "a_to_b"}
    ba = {r["doc_id"] for r in t.to_pylist() if r["direction"] == "b_to_a"}
    want_ab = {
        o for o in range(N_DOCS)
        if REPOS[o % 6] == a and f"links:{b}" in _expected_keywords(o)
    }
    want_ba = {
        o for o in range(N_DOCS)
        if REPOS[o % 6] == b and f"links:{a}" in _expected_keywords(o)
    }
    assert ab == want_ab and ba == want_ba
    assert t.num_rows == len(want_ab) + len(want_ba)


def test_delta_inherits_link_keywords(links_index, tmp_path, ray_session):
    """A delta over a link-keyword base injects links: terms for its
    fresh documents too (manifest inheritance) — updated docs must not
    fall out of backlink queries."""
    import ray.data

    from marginaliasearch_ray.pipelines.delta import build_delta_index
    from marginaliasearch_ray.state import manifest as mf

    ix, base = links_index
    # rewrite doc 0 (repo org0/repo0) with new content
    delta = pa.table(
        {
            "repo": pa.array([REPOS[0]], pa.string()),
            "path": pa.array(["f_0.py"], pa.string()),
            "commit": pa.array(["1" * 40], pa.string()),
            "lang": pa.array(["py"], pa.string()),
            "content": pa.array([_content(0) + " freshword"], pa.string()),
            "ordinal": pa.array([0], pa.int32()),
        }
    )
    ddir = str(tmp_path / "delta")
    # cfg WITHOUT link_keywords: the base manifest must force it on
    from marginaliasearch_ray.pipelines.build_index import BuildConfig

    build_delta_index(
        ray.data.from_arrow(delta), [base], ddir,
        BuildConfig(num_parts=2, num_buckets=4, num_salts=1,
                    hot_df_threshold=1000),
    )
    assert mf.read_manifest(ddir, "journal")["link_keywords"] is True

    from marginaliasearch_ray.pipelines.query import IndexSearch

    chain = IndexSearch([base, ddir], use_actors=False)
    # doc 0's links: keywords still present via the DELTA segment
    for kw in _expected_keywords(0):
        assert 0 in set(
            chain.search(kw, k=N_DOCS + 10)["doc_id"].to_pylist()
        ), kw
    # and the fresh body term resolves to the updated doc
    assert set(chain.search("freshword", k=5)["doc_id"].to_pylist()) == {0}


def test_compaction_preserves_link_keywords(links_index, tmp_path,
                                            ray_session):
    """compact_segments rebuilds from the merged journal, whose rows
    already CARRY the injected links: terms — no re-tokenize, keywords
    survive the fold byte-for-byte."""
    from marginaliasearch_ray.pipelines.build_index import BuildConfig
    from marginaliasearch_ray.pipelines.delta import compact_segments
    from marginaliasearch_ray.pipelines.query import IndexSearch

    ix, base = links_index
    out = str(tmp_path / "compacted")
    compact_segments(
        [base], out,
        BuildConfig(num_parts=2, num_buckets=4, num_salts=1,
                    hot_df_threshold=1000),
    )
    cix = IndexSearch(out, use_actors=False)
    kw = sorted(_expected_keywords(0))[0]
    before = set(ix.search(kw, k=N_DOCS + 10)["doc_id"].to_pylist())
    after = set(cix.search(kw, k=N_DOCS + 10)["doc_id"].to_pylist())
    assert before == after and before
