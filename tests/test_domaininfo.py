"""Domain-info card tests: page counts, distinct link counts, rank
display, node affinity, and the single-domain lookup — each checked
against an independent brute-force twin (DomainInformationService /
DbUpdateRanks semantics)."""

import numpy as np
import pyarrow as pa
import pytest

from marginaliasearch_ray.functions.wordpattern import tokenize
from marginaliasearch_ray.pipelines import domaininfo, ranking


def _docs():
    # 4 domains; includes a null text, an empty text, and a text with no
    # admissible keywords so known > fetched > indexed somewhere
    rows = [
        (1, "alpha", "customer merge table", 20),
        (2, "alpha", "", 0),
        (3, "alpha", None, 0),
        (4, "beta", "scan filter window", 18),
        (5, "beta", "... ---", 7),  # strips to no admitted keyword
        (6, "gamma", "sort join hash", 14),
        (7, "delta", "group order value", 17),
        (8, "delta", "big small fast", 14),
    ]
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "source": pa.array([r[1] for r in rows], pa.string()),
            "text": pa.array([r[2] for r in rows], pa.string()),
            "n_chars": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


@pytest.fixture(scope="module")
def info():
    import ray.data

    ds = ray.data.from_arrow(_docs())
    return domaininfo.domain_info(
        ds, num_parts=3, rank_depth=2,
        pagerank_kwargs={"max_iterations": 10, "tolerance": 0.0},
    )


def test_page_counts(info):
    t = _docs()
    by_dom = {}
    for i in range(len(t)):
        d = t["source"][i].as_py()
        txt = t["text"][i].as_py()
        k, f, ix = by_dom.get(d, (0, 0, 0))
        by_dom[d] = (
            k + 1,
            f + (txt is not None and txt != ""),
            ix + (txt is not None and len(tokenize(txt)) > 0),
        )
    doms = info["domain"].to_pylist()
    assert doms == sorted(by_dom)
    for i, d in enumerate(doms):
        k, f, ix = by_dom[d]
        assert info["pages_known"][i].as_py() == k
        assert info["pages_fetched"][i].as_py() == f
        assert info["pages_indexed"][i].as_py() == ix
        assert k >= f >= ix
    # the fixture exercises every strict inequality somewhere
    assert any(info["pages_known"][i].as_py() > info["pages_fetched"][i].as_py()
               for i in range(len(doms)))
    assert any(info["pages_fetched"][i].as_py() > info["pages_indexed"][i].as_py()
               for i in range(len(doms)))


def _brute_edges():
    """Independent replica of the link_edges ring rule."""
    t = _docs()
    repos = sorted(set(t["source"].to_pylist()))
    n = len(repos)
    pairs = set()
    for i in range(len(t)):
        s = repos.index(t["source"][i].as_py())
        doc_id = t["doc_id"][i].as_py()
        n_chars = t["n_chars"][i].as_py()
        for j in (1, 2):
            d = (s + 1 + (doc_id * 7 + 13 * j + n_chars) % (1 + s % 7)) % n
            if d != s:
                pairs.add((repos[s], repos[d]))
    return pairs


def test_link_counts(info):
    pairs = _brute_edges()
    doms = info["domain"].to_pylist()
    for i, d in enumerate(doms):
        assert info["incoming_links"][i].as_py() == sum(
            1 for _s, dd in pairs if dd == d
        )
        assert info["outgoing_links"][i].as_py() == sum(
            1 for ss, _d in pairs if ss == d
        )


def test_ranking_display(info):
    # recompute positions independently and apply DbUpdateRanks + the
    # Math.round display formula; rank_depth=2 leaves 2 domains ranked
    import ray.data

    ds = ray.data.from_arrow(_docs())
    repos = ranking.corpus_repos(ds)
    edges = ranking.link_edges(ds, repos)
    scores = ranking.pagerank(
        edges, repos, max_iterations=10, tolerance=0.0
    )
    pos = {r: p for r, _s, p in ranking.rank_positions(repos, scores, 2)}
    assert len(pos) == 2
    doms = info["domain"].to_pylist()
    for i, d in enumerate(doms):
        rank = pos[d] / 2 if d in pos else 1.0
        assert info["ranking"][i].as_py() == int(
            np.floor(100.0 * (1.0 - rank) + 0.5)
        )
    # ranked domains show >0, unranked show exactly 0
    shown = {d: info["ranking"][i].as_py() for i, d in enumerate(doms)}
    assert sorted(v for v in shown.values() if v > 0) == [50, 100]
    assert sum(1 for v in shown.values() if v == 0) == len(doms) - 2


def test_node_affinity_and_suggest(info):
    doms = info["domain"].to_pylist()
    for i in range(len(doms)):
        assert info["node_affinity"][i].as_py() == i % 3
        # every fixture domain has fetched pages
        assert info["suggest_for_crawling"][i].as_py() is False


def test_lookup(info):
    row = domaininfo.domain_info_for(info, "beta")
    assert row is not None and row["domain"] == "beta"
    assert row["pages_known"] == 2 and row["pages_indexed"] == 1
    assert domaininfo.domain_info_for(info, "nosuch") is None
