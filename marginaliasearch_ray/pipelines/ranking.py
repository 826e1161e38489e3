"""Domain ranking: PageRank / personalized PageRank over a domain link
graph, DomainRankings position scaling, and RankingSearchSet id sets.

Reference semantics (all under ``code/index/java/nu/marginalia/``):

- ``domainranking/PageRankDomainRanker.java:34-58`` — run (personalized)
  PageRank over a GraphSource, sort scores descending, keep the top
  ``resultCount`` vertices, and hand each its ordinal position.
- ``domainranking/jgrapht/PersonalizedPageRank.java:281-372`` — the
  vendored jgrapht iteration the reference ships (damping 0.85, max 100
  iterations, tolerance 1e-4): per iteration a teleport term ``r`` is
  computed from the CURRENT scores, every vertex's next score is
  ``r_if_influenced + Σ_in d * cur[w] / outdeg[w]``, and after
  convergence the influence teleport is subtracted back out.  The
  non-personalized path uses stock jgrapht ``PageRank`` (same loop with
  the teleport spread uniformly: ``r = Σ((1-d)*s_i if outdeg_i>0 else
  s_i) / n`` added to EVERY vertex).
- ``domainranking/data/LinkGraphSource.java`` /
  ``InvertedLinkGraphSource.java`` — directed unweighted simple graphs
  (parallel edges collapse); ``SimilarityGraphSource.java`` — undirected
  weighted.
- ``index/searchset/DomainRankings.java:85-96`` — the ranked POSITION is
  scaled to a 1..255 byte (``255/50_000 * position``, clamped), default
  255 for unranked domains; this is the rank injected into document
  metadata at index construction (``ForwardIndexConverter.java:104-110``)
  and into the combined id (``IndexConstructorMain`` DocIdRewriter).
- ``index/searchset/RankingSearchSet.java:72-87`` — the top-N domain ids
  as a search restriction set (empty set = allow everything).

Ray-Data-first decomposition: edge EXTRACTION is the 100-TB-scale stage
(one pass over the corpus, per-batch partial (src, dst, weight)
combiners, then a (src, dst) groupby — raw documents never shuffle);
the eigenvector iteration runs on the driver over the AGGREGATED domain
graph with vectorized numpy, mirroring the reference, which also holds
the domain graph in one process's RAM (domain cardinality is 5-6 orders
of magnitude below document cardinality; ~10^7 domains x ~10^8 edges is
a few GB of int arrays).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

DAMPING_DEFAULT = 0.85  # PersonalizedPageRank.DAMPING_FACTOR_DEFAULT
MAX_ITERATIONS_DEFAULT = 100  # PersonalizedPageRank.MAX_ITERATIONS_DEFAULT
TOLERANCE_DEFAULT = 1e-4  # PersonalizedPageRank.TOLERANCE_DEFAULT

# DomainRankings.java:23-26
MAX_MEANINGFUL_RANK = 50_000
MAX_RANK_VALUE = 255
MIN_RANK_VALUE = 1


def _edge_partial(batch: pa.Table, repos: list[str], n_targets: int,
                  invert: bool) -> pa.Table:
    """Per-batch combiner: derive this batch's synthetic out-links and
    pre-aggregate them to (src, dst, weight) partial counts — the batch
    leaves the task as at most |repos|^2 rows, never as raw documents."""
    idx = {r: i for i, r in enumerate(repos)}
    n = len(repos)
    doc_id = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    n_chars = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
    src = np.array(
        [idx[s] for s in batch["source"].to_pylist()], dtype=np.int64
    )
    srcs = []
    dsts = []
    for j in range(1, n_targets + 1):
        # ring successor at a document-dependent offset, with a per-repo
        # reach of 1 + (src_idx % 7): out-degrees vary 1..7 across repos,
        # so the graph stays SPARSE and irregular at every corpus scale
        # (a naive (hash % n) target saturates to the complete graph once
        # docs >> n^2, making PageRank uniform and the test vacuous)
        dst = (src + 1 + (doc_id * 7 + 13 * j + n_chars) % (1 + src % 7)) % n
        keep = dst != src  # LinkGraphSource never records self-links
        srcs.append(src[keep])
        dsts.append(dst[keep])
    s = np.concatenate(srcs) if srcs else np.empty(0, np.int64)
    d = np.concatenate(dsts) if dsts else np.empty(0, np.int64)
    if invert:  # InvertedLinkGraphSource.java:41 — flip every edge
        s, d = d, s
    pair = s * n + d
    uniq, cnt = np.unique(pair, return_counts=True)
    rs = [repos[int(p) // n] for p in uniq]
    rd = [repos[int(p) % n] for p in uniq]
    return pa.table(
        {
            "src": pa.array(rs, pa.string()),
            "dst": pa.array(rd, pa.string()),
            "weight": pa.array(cnt, pa.int64()),
        }
    )


def corpus_repos(ds) -> list[str]:
    """Sorted distinct source/repo names — the graph's vertex set
    (AbstractGraphSource.addVertices: every known domain is a vertex even
    if no link touches it).  One tiny distinct shuffle; the result is the
    small side broadcast everywhere else."""
    names = ds.select_columns(["source"]).unique("source")
    return sorted(str(x) for x in names)


def link_edges(ds, repos: list[str] | None = None, *, n_targets: int = 2,
               invert: bool = False) -> pa.Table:
    """Aggregated (src, dst, weight) domain link edges from a documents
    dataset with (doc_id, source, n_chars) columns.

    The sandbox has no crawl-derived link table (the reference reads one
    from its link-graph service, LinkGraphSource.java:30-40), so edges
    are DERIVED deterministically: each document links its repo (index
    ``s`` in the sorted repo list) to the ring successor
    ``(s + 1 + (doc_id*7 + 13*j + n_chars) % (1 + s % 7)) % n`` for
    j = 1..``n_targets``, self-links dropped.  Deterministic, purely
    column-arithmetic, and exactly replicable in SQL — the driver oracle
    recomputes it.  ``weight`` is the number of documents contributing
    the edge; the unweighted PageRank path ignores it (DefaultDirected-
    Graph collapses parallel edges), the weighted path consumes it.
    """
    if repos is None:
        repos = corpus_repos(ds)
    from ray.data.aggregate import Sum

    partials = ds.select_columns(["doc_id", "source", "n_chars"]).map_batches(
        _edge_partial,
        batch_format="pyarrow",
        fn_kwargs={"repos": repos, "n_targets": n_targets, "invert": invert},
    )
    agg = partials.groupby(["src", "dst"]).aggregate(
        Sum("weight", alias_name="weight")
    )
    rows = agg.take_all()  # |domains|^2-bounded: the in-RAM domain graph
    return pa.table(
        {
            "src": pa.array([r["src"] for r in rows], pa.string()),
            "dst": pa.array([r["dst"] for r in rows], pa.string()),
            "weight": pa.array([int(r["weight"]) for r in rows], pa.int64()),
        }
    )


def pagerank(
    edges: pa.Table,
    vertices: list[str],
    *,
    damping: float = DAMPING_DEFAULT,
    max_iterations: int = MAX_ITERATIONS_DEFAULT,
    tolerance: float = TOLERANCE_DEFAULT,
    influence: list[str] | None = None,
    weighted: bool = False,
    undirected: bool = False,
) -> np.ndarray:
    """Scores aligned with ``vertices``.  Vectorized replica of the
    reference's iteration (PersonalizedPageRank.java:281-372 and the
    stock jgrapht PageRank it was modified from):

    - standard:     next_i = r + d * Σ_{(w,i) in E} cur_w / outdeg_w
                    with r = Σ_w ((1-d)*cur_w if outdeg_w>0 else cur_w)/n
    - personalized: r = Σ_{v in influence} ((1-d) if outdeg_v>0 else
                    cur_v) / |influence|, added only to influence
                    vertices; after the loop the final teleport is
                    subtracted back out (:307-311).

    ``tolerance=0`` runs exactly ``max_iterations`` iterations (the Java
    ctor rejects non-positive tolerance — this extension exists so a
    fixed-iteration SQL oracle can replicate the result bit-for-bit).
    ``weighted`` divides by in-weight sums instead of out-degrees
    (runWeighted, :314-349); ``undirected`` symmetrizes the edge list
    first (SimilarityGraphSource's undirected weighted graph).
    """
    if max_iterations <= 0:
        raise ValueError("Maximum iterations must be positive")
    if not 0.0 <= damping <= 1.0:
        raise ValueError("Damping factor not valid")
    if tolerance < 0.0:
        raise ValueError("Tolerance not valid, must be non-negative")
    n = len(vertices)
    if n == 0:
        return np.empty(0, dtype=np.float64)
    idx = {v: i for i, v in enumerate(vertices)}
    src = np.array([idx[s] for s in edges["src"].to_pylist()], dtype=np.int64)
    dst = np.array([idx[s] for s in edges["dst"].to_pylist()], dtype=np.int64)
    w = edges["weight"].to_numpy(zero_copy_only=False).astype(np.float64)
    if undirected:
        # one jgrapht undirected edge behaves as both directions with the
        # same weight; degree counts each incident edge once per endpoint
        src, dst = np.concatenate([src, dst]), np.concatenate([dst, src])
        w = np.concatenate([w, w])
    d = float(damping)

    outdeg = np.bincount(src, minlength=n).astype(np.float64)
    if weighted:
        wsum = np.bincount(src, weights=w, minlength=n)
        edge_norm = w / np.maximum(wsum[src], 1.0)
    else:
        edge_norm = 1.0 / np.maximum(outdeg[src], 1.0)

    infl = None
    if influence:
        infl = np.zeros(n, dtype=bool)
        m = 0
        seen = set()
        for v in influence:
            if v in seen:
                continue
            seen.add(v)
            m += 1  # teleProp divides by influenceSet.size() (:364)
            if v in idx:
                infl[idx[v]] = True

        def tele(cur: np.ndarray) -> float:
            return float(
                np.where(outdeg[infl] > 0, 1.0 - d, cur[infl]).sum() / m
            )

    cur = np.full(n, 1.0 / n, dtype=np.float64)
    max_change = tolerance  # first iteration always runs (:283-286)
    iters = max_iterations
    while iters > 0 and max_change >= tolerance:
        contrib = d * np.bincount(
            dst, weights=cur[src] * edge_norm, minlength=n
        )
        if infl is not None:
            nxt = np.where(infl, tele(cur), 0.0) + contrib
        else:
            r = (
                np.where(outdeg > 0, (1.0 - d) * cur, cur).sum() / n
            )
            nxt = r + contrib
        max_change = float(np.abs(nxt - cur).max())
        cur = nxt
        iters -= 1
    if infl is not None:
        # remove influence factor from the scores (:307-311)
        cur = cur - np.where(infl, tele(cur), 0.0)
    return cur


def rank_positions(
    vertices: list[str], scores: np.ndarray, depth: int
) -> list[tuple[str, float, int]]:
    """Top-``depth`` (vertex, round(score, 6), position) by score
    descending — PageRankDomainRanker.calculate:45-57's sorted/limit/
    ordinal-accumulate.  Java's comparator orders by -score only (tie
    order falls to HashMap iteration, nondeterministic); both this and
    the SQL oracle pin ties to vertex-name ascending, on the ROUNDED
    score so the two float pipelines cannot disagree about ordering."""
    sc = np.round(np.asarray(scores, dtype=np.float64), 6)
    order = sorted(range(len(vertices)), key=lambda i: (-sc[i], vertices[i]))
    return [
        (vertices[i], float(sc[i]), pos)
        for pos, i in enumerate(order[: max(depth, 0)])
    ]


def scale_rank(position: int,
               max_meaningful_rank: int = MAX_MEANINGFUL_RANK) -> int:
    """DomainRankings.scaleRank:85-88 — position scaled into 1..255
    (double multiply, clamp, truncating short cast).  The reference pins
    MAX_MEANINGFUL_RANK=50_000; it is a parameter here because a corpus
    with 20 repos scales every position to 1 at that constant."""
    scaled = (MAX_RANK_VALUE / max_meaningful_rank) * position
    return int(min(float(MAX_RANK_VALUE), max(float(MIN_RANK_VALUE), scaled)))


def domain_rankings(
    vertices: list[str],
    scores: np.ndarray,
    depth: int,
    max_meaningful_rank: int = MAX_MEANINGFUL_RANK,
) -> dict[str, int]:
    """repo -> scaled 1..255 rank for the top-``depth`` ranked repos —
    the DomainRankings table (unranked repos default to 255 at lookup,
    DomainRankings.getRanking:90-92)."""
    return {
        repo: scale_rank(pos, max_meaningful_rank)
        for repo, _score, pos in rank_positions(vertices, scores, depth)
    }


def rankings_to_overrides(rankings: dict[str, int]) -> dict[str, int]:
    """DomainRankings byte (1..255) -> the 6-bit rank injected into
    combined ids and packed document metadata (UrlIdCodec keeps 6 rank
    bits; IndexConstructorMain's DocIdRewriter).  Feed the result to
    ``BuildConfig.rank_overrides`` to build an index whose document
    ranks come from PageRank instead of the synthetic default."""
    return {repo: min(63, int(v) >> 2) for repo, v in rankings.items()}


# connectivity classification (index/searchset/connectivity/
# DomainSetConnectivity.java:3-20 — names -> emulateRankData rank values;
# ordinal order is the on-disk contract, priority order is the
# putIfAbsent sequence in ConnectivitySets.recalculate:126-137)
CONNECTIVITY_RANK = {
    "DIRECT": 0,
    "BIDI_HOT": 16,
    "REACHABLE_HOT": 32,
    "LINKING_HOT": 48,
    "BIDI": 64,
    "REACHABLE": 80,
    "LINKING": 96,
    "UNREACHABLE": 255,
}
HOT_LINK_COUNT = 5  # ConnectivitySets.recalculate:121-123


def connectivity_sets(
    edges: pa.Table,
    vertices: list[str],
    seed: list[str],
    hot_threshold: int = HOT_LINK_COUNT,
) -> dict[str, str]:
    """Classify every vertex by one-hop connectivity to a seed set —
    ConnectivitySets.recalculate:55-137.  Semantics (the reference's
    variable names are swapped; behavior is):

    - REACHABLE: out-neighbors of the seed (minus the seed itself)
    - LINKING:   in-neighbors of the seed (minus the seed itself)
    - BIDI:      both
    - *_HOT:     the same with seed-adjacency count >= ``hot_threshold``
      (one count per (seed, direction) adjacency, :100-105)
    - DIRECT:    seed members; everything else UNREACHABLE

    First matching class in DIRECT > BIDI_HOT > REACHABLE_HOT >
    LINKING_HOT > BIDI > REACHABLE > LINKING order wins (:126-137).
    """
    sset = set(seed)
    src = edges["src"].to_pylist()
    dst = edges["dst"].to_pylist()
    reach: set[str] = set()
    linking: set[str] = set()
    count: dict[str, int] = {}
    for s, t in zip(src, dst):
        if s in sset:
            reach.add(t)
            count[t] = count.get(t, 0) + 1
        if t in sset:
            linking.add(s)
            count[s] = count.get(s, 0) + 1
    reach -= sset
    linking -= sset
    out = {}
    for v in vertices:
        hot = count.get(v, 0) >= hot_threshold
        if v in sset:
            c = "DIRECT"
        elif v in reach and v in linking and hot:
            c = "BIDI_HOT"
        elif v in reach and hot:
            c = "REACHABLE_HOT"
        elif v in linking and hot:
            c = "LINKING_HOT"
        elif v in reach and v in linking:
            c = "BIDI"
        elif v in reach:
            c = "REACHABLE"
        elif v in linking:
            c = "LINKING"
        else:
            c = "UNREACHABLE"
        out[v] = c
    return out


def connectivity_rank_data(classes: dict[str, str]) -> dict[str, int]:
    """class map -> repo rank values (ConnectivityView.emulateRankData:
    35-41) — SearchSetsService.updateMainDomainRankings prefers this over
    PageRank when connectivity data exists (:195-199).  The 0..255 values
    compose with rankings_to_overrides for id-codec injection."""
    return {v: CONNECTIVITY_RANK[c] for v, c in classes.items()}


def ranking_search_set(
    vertices: list[str], scores: np.ndarray, depth: int
) -> list[str]:
    """The top-``depth`` repos as a sorted search-restriction set
    (RankingSearchSet.java:30-38 sorts its id set; pass as
    ``IndexSearch.search(filter_spec={"repos": ...})``, the contains()
    restriction of :72-82)."""
    return sorted(r for r, _s, _p in rank_positions(vertices, scores, depth))
