"""Domain ranking: PageRank / personalized PageRank parity with a direct
per-vertex transliteration of the reference's iteration
(domainranking/jgrapht/PersonalizedPageRank.java:281-372 and the stock
jgrapht PageRank loop it was modified from), DomainRankings scaling
(DomainRankings.java:85-96), RankingSearchSet ordering, the distributed
link-edge extraction, and the rank_overrides -> DocIdRewriter injection
(ForwardIndexConverter.java:104-110)."""

import numpy as np
import pyarrow as pa
import pytest

from marginaliasearch_ray.pipelines.ranking import (
    domain_rankings,
    link_edges,
    pagerank,
    rank_positions,
    ranking_search_set,
    rankings_to_overrides,
    scale_rank,
)


def _java_twin(
    vertices,
    edge_list,
    *,
    damping=0.85,
    max_iterations=100,
    tolerance=1e-4,
    influence=None,
    weighted=False,
    undirected=False,
):
    """Independent per-vertex loop transliteration of the Java iteration
    (kept deliberately scalar/naive so a vectorization bug in the real
    implementation cannot hide in a shared kernel)."""
    if undirected:
        edge_list = edge_list + [(d, s, w) for s, d, w in edge_list]
    n = len(vertices)
    idx = {v: i for i, v in enumerate(vertices)}
    out_deg = [0] * n
    w_sum = [0.0] * n
    in_adj = [[] for _ in range(n)]  # (src, weight)
    for s, dst, w in edge_list:
        si, di = idx[s], idx[dst]
        out_deg[si] += 1
        w_sum[si] += w
        in_adj[di].append((si, w))
    infl = set()
    m = 0
    if influence:
        m = len(set(influence))
        infl = {idx[v] for v in set(influence) if v in idx}

    def tele(cur):
        r = 0.0
        for v in infl:
            r += (1.0 - damping) if out_deg[v] > 0 else cur[v]
        return r / m

    cur = [1.0 / n] * n
    max_change = tolerance
    iters = max_iterations
    while iters > 0 and max_change >= tolerance:
        if influence:
            r = tele(cur)
        else:
            r = 0.0
            for i in range(n):
                r += (1.0 - damping) * cur[i] if out_deg[i] > 0 else cur[i]
            r /= n
        nxt = [0.0] * n
        max_change = 0.0
        for i in range(n):
            contribution = 0.0
            for (w_i, ew) in in_adj[i]:
                if weighted:
                    contribution += damping * cur[w_i] * ew / w_sum[w_i]
                else:
                    contribution += damping * cur[w_i] / out_deg[w_i]
            if influence:
                nxt[i] = (r if i in infl else 0.0) + contribution
            else:
                nxt[i] = r + contribution
            max_change = max(max_change, abs(nxt[i] - cur[i]))
        cur = nxt
        iters -= 1
    if influence:
        r = tele(cur)
        cur = [cur[i] - (r if i in infl else 0.0) for i in range(n)]
    return np.asarray(cur)


def _edges_table(edge_list):
    return pa.table(
        {
            "src": pa.array([e[0] for e in edge_list], pa.string()),
            "dst": pa.array([e[1] for e in edge_list], pa.string()),
            "weight": pa.array([e[2] for e in edge_list], pa.int64()),
        }
    )


# a small irregular graph with a dangling vertex (f has no out-edges) and
# an isolated vertex (g has no edges at all)
VERTS = ["a", "b", "c", "d", "e", "f", "g"]
EDGES = [
    ("a", "b", 3),
    ("a", "c", 1),
    ("b", "c", 2),
    ("c", "a", 5),
    ("c", "d", 1),
    ("d", "e", 1),
    ("e", "f", 4),
    ("b", "f", 1),
]


@pytest.mark.parametrize("weighted", [False, True])
@pytest.mark.parametrize("undirected", [False, True])
def test_pagerank_matches_java_twin(weighted, undirected):
    got = pagerank(
        _edges_table(EDGES),
        VERTS,
        weighted=weighted,
        undirected=undirected,
    )
    want = _java_twin(
        VERTS, EDGES, weighted=weighted, undirected=undirected
    )
    assert np.allclose(got, want, atol=1e-12)
    # dangling/isolated handling keeps total mass finite and positive
    assert np.all(got > 0)


@pytest.mark.parametrize(
    "influence",
    [["a"], ["a", "d"], ["f"], ["f", "g"], ["a", "a", "d"]],
    ids=["one", "two", "dangling", "dangling+isolated", "dup-names"],
)
def test_personalized_matches_java_twin(influence):
    got = pagerank(_edges_table(EDGES), VERTS, influence=influence)
    want = _java_twin(VERTS, EDGES, influence=influence)
    assert np.allclose(got, want, atol=1e-12)
    # the final tele subtraction ran: influence vertices do not keep the
    # raw teleport mass (scores differ from the plain variant)
    plain = pagerank(_edges_table(EDGES), VERTS)
    assert not np.allclose(got, plain)


def test_fixed_iteration_mode_and_tolerance_stop():
    # tolerance=0 runs exactly max_iterations (the SQL-oracle mode)
    g5 = pagerank(_edges_table(EDGES), VERTS, max_iterations=5, tolerance=0.0)
    w5 = _java_twin(VERTS, EDGES, max_iterations=5, tolerance=0.0)
    assert np.allclose(g5, w5, atol=1e-14)
    # a huge tolerance stops after ONE iteration (maxChange starts == tol,
    # the while runs once, then maxChange < tol), matching the twin
    g1 = pagerank(_edges_table(EDGES), VERTS, tolerance=1e9)
    w1 = _java_twin(VERTS, EDGES, tolerance=1e9)
    assert np.allclose(g1, w1, atol=1e-14)
    one = pagerank(_edges_table(EDGES), VERTS, max_iterations=1, tolerance=0.0)
    assert np.allclose(g1, one, atol=1e-14)
    with pytest.raises(ValueError):
        pagerank(_edges_table(EDGES), VERTS, max_iterations=0)
    with pytest.raises(ValueError):
        pagerank(_edges_table(EDGES), VERTS, damping=1.5)
    with pytest.raises(ValueError):
        pagerank(_edges_table(EDGES), VERTS, tolerance=-1.0)


def test_rank_positions_scaling_and_search_set():
    verts = ["x", "y", "z", "w"]
    scores = np.array([0.25, 0.25, 0.4, 0.1])
    rows = rank_positions(verts, scores, 3)
    # ties on the rounded score break by vertex name ascending
    assert rows == [("z", 0.4, 0), ("x", 0.25, 1), ("y", 0.25, 2)]
    # DomainRankings.scaleRank: clamp(255/mmr * pos, 1, 255), short cast
    assert scale_rank(0, 20) == 1
    assert scale_rank(1, 20) == 12  # trunc(12.75)
    assert scale_rank(19, 20) == 242
    assert scale_rank(100, 20) == 255
    assert scale_rank(0) == 1 and scale_rank(49_999) == 254
    dr = domain_rankings(verts, scores, 2, max_meaningful_rank=4)
    assert dr == {"z": 1, "x": 63}
    ov = rankings_to_overrides({"z": 1, "x": 255})
    assert ov == {"z": 0, "x": 63}
    assert ranking_search_set(verts, scores, 3) == ["x", "y", "z"]


def test_link_edges_distributed_matches_local(ray_session):
    import ray.data

    t = pa.table(
        {
            "doc_id": pa.array(range(200), pa.int64()),
            "source": pa.array(
                [f"r{str(i % 5)}" for i in range(200)], pa.string()
            ),
            "n_chars": pa.array([17 * i % 101 for i in range(200)], pa.int64()),
        }
    )
    repos = sorted(set(t["source"].to_pylist()))
    got = link_edges(
        ray.data.from_arrow(t).repartition(7), repos
    ).to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)

    # local recompute of the documented derivation
    n = len(repos)
    idx = {r: i for i, r in enumerate(repos)}
    agg = {}
    for did, src, nc in zip(
        t["doc_id"].to_pylist(),
        t["source"].to_pylist(),
        t["n_chars"].to_pylist(),
    ):
        s = idx[src]
        for j in (1, 2):
            d = (s + 1 + (did * 7 + 13 * j + nc) % (1 + s % 7)) % n
            if d != s:
                agg[(repos[s], repos[d])] = agg.get((repos[s], repos[d]), 0) + 1
    want = sorted((s, d, w) for (s, d), w in agg.items())
    assert list(zip(got["src"], got["dst"], got["weight"])) == want

    # invert flips every edge
    inv = link_edges(ray.data.from_arrow(t), repos, invert=True).to_pandas()
    assert sorted(zip(inv["dst"], inv["src"], inv["weight"])) == want


def test_rank_overrides_injection(ray_session, tmp_path):
    """BuildConfig.rank_overrides feeds PageRank-derived DomainRankings
    into the combined ids + packed doc metadata (the DbUpdateRanks /
    DocIdRewriter flow); verified through search(explain=True)'s decoded
    fx_rank."""
    import ray.data

    from marginaliasearch_ray.pipelines.build_index import (
        BuildConfig,
        build_index,
    )
    from marginaliasearch_ray.pipelines.query import IndexSearch
    from marginaliasearch_ray.sources.corpus import synthesize_corpus

    corpus = synthesize_corpus(n_repos=4, files_per_repo=6, seed=11)
    repos = sorted(set(corpus["repo"].to_pylist()))
    scores = pagerank(
        _edges_table(
            [(repos[0], repos[1], 2), (repos[1], repos[2], 1),
             (repos[2], repos[0], 1), (repos[3], repos[0], 3)]
        ),
        repos,
    )
    rankings = domain_rankings(repos, scores, len(repos),
                               max_meaningful_rank=len(repos))
    overrides = rankings_to_overrides(rankings)
    assert len(set(overrides.values())) > 1  # distinct injected ranks

    out = str(tmp_path / "ranked_idx")
    build_index(
        ray.data.from_arrow(corpus),
        out,
        BuildConfig(num_parts=2, num_buckets=4, rank_overrides=overrides),
    )
    s = IndexSearch(out, use_actors=False)
    t = s.search("license", k=24, explain=True, decorate=True)
    assert t.num_rows > 0
    for row in t.to_pylist():
        # metadata.decode_rank returns the packed byte = 6-bit rank << 2
        assert row["fx_rank"] == 4 * overrides[row["repo"]]
    s.shutdown()


def test_connectivity_sets_all_classes():
    """ConnectivitySets.recalculate (:55-137): every class reachable,
    first-match priority, hot threshold boundary, emulateRankData values
    (DomainSetConnectivity.java rank values)."""
    from marginaliasearch_ray.pipelines.ranking import (
        connectivity_rank_data,
        connectivity_sets,
    )

    # seeds s1, s2.  With hot_threshold=2:
    #  bh: s1->bh, bh->s2, s2->bh  (reach+linking, count 3 -> BIDI_HOT)
    #  rh: s1->rh, s2->rh          (reach only, count 2   -> REACHABLE_HOT)
    #  lh: lh->s1, lh->s2          (linking only, count 2 -> LINKING_HOT)
    #  bi: s1->bi, bi->s1 would count 2 -> need count < 2?  impossible for
    #      BIDI (two directed edges to/from the seed = count 2) unless the
    #      threshold is higher — so test BIDI with hot_threshold=3
    #  re: s1->re                  (count 1 -> REACHABLE)
    #  li: li->s2                  (count 1 -> LINKING)
    #  un: no seed adjacency       -> UNREACHABLE
    verts = ["s1", "s2", "bh", "rh", "lh", "bi", "re", "li", "un"]
    edges = _edges_table(
        [
            ("s1", "bh", 1), ("bh", "s2", 1), ("s2", "bh", 1),
            ("s1", "rh", 1), ("s2", "rh", 1),
            ("lh", "s1", 1), ("lh", "s2", 1),
            ("s1", "bi", 1), ("bi", "s1", 1),
            ("s1", "re", 1),
            ("li", "s2", 1),
            ("un", "re", 1),  # non-seed adjacency never counts
            ("s1", "s2", 1),  # seed-to-seed stays DIRECT
        ]
    )
    got = connectivity_sets(edges, verts, ["s1", "s2"], hot_threshold=2)
    assert got == {
        "s1": "DIRECT", "s2": "DIRECT", "bh": "BIDI_HOT",
        "rh": "REACHABLE_HOT", "lh": "LINKING_HOT", "bi": "BIDI_HOT",
        "re": "REACHABLE", "li": "LINKING", "un": "UNREACHABLE",
    }
    # raise the bar: bi (count 2) drops to plain BIDI, rh/lh drop too
    got3 = connectivity_sets(edges, verts, ["s1", "s2"], hot_threshold=3)
    assert got3["bi"] == "BIDI" and got3["bh"] == "BIDI_HOT"
    assert got3["rh"] == "REACHABLE" and got3["lh"] == "LINKING"

    ranks = connectivity_rank_data(got3)
    assert ranks["s1"] == 0 and ranks["bh"] == 16 and ranks["bi"] == 64
    assert ranks["re"] == 80 and ranks["li"] == 96 and ranks["un"] == 255
