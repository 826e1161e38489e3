"""Domain information service: per-domain aggregate info cards.

Reference semantics (``code/functions/domain-info``):

- ``DomainInformationService.java:44-178`` — one row per domain joining
  EC_DOMAIN with DOMAIN_METADATA (KNOWN_URLS / GOOD_URLS / VISITED_URLS),
  the link-graph counts, and the rank display value
  ``Math.round(100.0 * (1.0 - RANK))`` (:100), with
  ``suggestForCrawling = pagesVisited == 0 && !inCrawlQueue`` (:170).
- ``DbUpdateRanks.java:29-43`` — EC_DOMAIN.RANK is the ranked POSITION
  divided by ``rankMax`` (the number of ranked domains, i.e. the
  PageRank result depth); every domain outside the ranking keeps the
  reset value RANK = 1, so its display value is 0.
- ``PartitionLinkGraphService.java:92-105`` / ``DomainLinks.java`` —
  incoming/outgoing link counts are DISTINCT (source, dest) domain
  pairs: countSources(d) / countDestinations(d).
- ``DomainRegistry`` (stages/docids.py) assigns ``NODE_AFFINITY``:
  domain_id = ordinal in the sorted domain list, part = id % num_parts.

Out of scope, declared not faked: IP/ASN/geo columns (GeoIpDictionary —
crawl infrastructure), DOMAIN_AVAILABILITY_INFORMATION ping data and
DOMAIN_SECURITY_INFORMATION SSL data (populated by the live ping
daemon), the CRAWL_QUEUE probe (no crawler in a corpus-only engine —
``in_crawl_queue`` is uniformly false, which folds suggestForCrawling
to ``pages_fetched == 0``), and EC_DOMAIN.STATE (crawler lifecycle).

Field analogs over the corpus (known >= fetched >= indexed, mirroring
KNOWN >= VISITED >= GOOD):

- ``pages_known``   — all corpus rows for the domain (discovered urls).
- ``pages_fetched`` — rows with non-null, non-empty ``text`` (the crawl
  actually retrieved content).
- ``pages_indexed`` — rows whose text yields at least one admitted
  keyword under the index tokenizer (the document made it into the
  index, GOOD_URLS' "processed OK" criterion).

Ray-Data-first decomposition: the per-domain page counts are the
100-TB-scale stage — ONE streaming map_batches pass emitting per-batch
partial (domain, known, fetched, indexed) rows (raw documents never
shuffle; at most |domains-in-batch| rows leave each task), folded by a
fixed-cardinality groupby(domain) sum.  Link counts reuse the
aggregated (src, dst, weight) edge table from ``ranking.link_edges``
(|domains|^2-bounded) and the PageRank positions come from
``ranking.pagerank`` over that same aggregated graph — both established
driver-side-over-small-data patterns.  The final assembly joins
|domains| rows with vectorized searchsorted lookups.

NOTE: ``domain_info`` consumes ``docs_ds`` twice (page-count pass +
edge-extraction pass).  Pass a read-backed Dataset (``read_parquet``),
not an expensive lazy transform chain — the delta-ingest double-consume
lesson (pipelines/delta.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.wordpattern import tokenize
from . import ranking


def _doc_stats_partial(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: (domain, known, fetched, indexed) partial
    counts — the batch leaves the task as at most |domains-in-batch|
    rows, never as raw documents."""
    src = np.asarray(batch["source"].to_pylist(), dtype=object)
    texts = batch["text"].to_pylist()  # None for null slots
    fetched = np.array(
        [t is not None and t != "" for t in texts], dtype=np.int64
    )
    indexed = np.array(
        [t is not None and bool(tokenize(t)) for t in texts],
        dtype=np.int64,
    )
    doms, inv = np.unique(src, return_inverse=True)
    known = np.bincount(inv, minlength=len(doms)).astype(np.int64)
    return pa.table(
        {
            "domain": pa.array(list(doms), pa.string()),
            "known": pa.array(known, pa.int64()),
            "fetched": pa.array(
                np.bincount(inv, weights=fetched, minlength=len(doms))
                .astype(np.int64),
                pa.int64(),
            ),
            "indexed": pa.array(
                np.bincount(inv, weights=indexed, minlength=len(doms))
                .astype(np.int64),
                pa.int64(),
            ),
        }
    )


def domain_doc_stats(docs_ds) -> pa.Table:
    """Per-domain (domain, pages_known, pages_fetched, pages_indexed) —
    the DOMAIN_METADATA analog, computed in one streaming pass."""
    from ray.data.aggregate import Sum

    partials = docs_ds.select_columns(["source", "text"]).map_batches(
        _doc_stats_partial, batch_format="pyarrow"
    )
    agg = partials.groupby("domain").aggregate(
        Sum("known", alias_name="pages_known"),
        Sum("fetched", alias_name="pages_fetched"),
        Sum("indexed", alias_name="pages_indexed"),
    )
    rows = agg.take_all()  # |domains|-bounded
    rows.sort(key=lambda r: r["domain"])
    return pa.table(
        {
            "domain": pa.array([r["domain"] for r in rows], pa.string()),
            "pages_known": pa.array(
                [int(r["pages_known"]) for r in rows], pa.int64()
            ),
            "pages_fetched": pa.array(
                [int(r["pages_fetched"]) for r in rows], pa.int64()
            ),
            "pages_indexed": pa.array(
                [int(r["pages_indexed"]) for r in rows], pa.int64()
            ),
        }
    )


def _distinct_counts(
    keys: np.ndarray, domains: np.ndarray
) -> np.ndarray:
    """Count of edge-table rows per domain, aligned with ``domains``
    (sorted).  The edge table is already DISTINCT on (src, dst), so a
    plain row count per key IS countSources/countDestinations."""
    out = np.zeros(len(domains), dtype=np.int64)
    if len(keys):
        uniq, cnt = np.unique(keys, return_counts=True)
        ix = np.searchsorted(domains, uniq)
        ok = (ix < len(domains)) & (domains[np.minimum(ix, len(domains) - 1)] == uniq)
        out[ix[ok]] = cnt[ok]
    return out


def domain_info(
    docs_ds,
    *,
    num_parts: int = 4,
    edges: pa.Table | None = None,
    rank_positions: list[tuple[str, float, int]] | None = None,
    rank_depth: int = ranking.MAX_MEANINGFUL_RANK,
    pagerank_kwargs: dict | None = None,
) -> pa.Table:
    """One info row per domain, sorted by domain name.

    Columns: domain, node_affinity, pages_known, pages_fetched,
    pages_indexed, incoming_links, outgoing_links, ranking (the
    ``round(100 * (1 - RANK))`` display value), suggest_for_crawling.

    ``edges`` / ``rank_positions`` accept precomputed results (the
    aggregated link table and PageRankDomainRanker output); by default
    both are derived from ``docs_ds`` with the reference-default
    PageRank parameters (override via ``pagerank_kwargs``, e.g. the
    oracle's fixed-iteration pins).
    """
    stats = domain_doc_stats(docs_ds)
    domains = np.asarray(stats["domain"].to_pylist(), dtype=object)
    repos = [str(d) for d in domains]

    if edges is None:
        edges = ranking.link_edges(docs_ds, repos)
    if rank_positions is None:
        scores = ranking.pagerank(edges, repos, **(pagerank_kwargs or {}))
        rank_positions = ranking.rank_positions(repos, scores, rank_depth)

    incoming = _distinct_counts(
        np.asarray(edges["dst"].to_pylist(), dtype=object), domains
    )
    outgoing = _distinct_counts(
        np.asarray(edges["src"].to_pylist(), dtype=object), domains
    )

    # DbUpdateRanks: RANK = position / rankMax for ranked domains, the
    # reset value 1 otherwise; display = Math.round(100 * (1 - RANK)).
    rank_max = len(rank_positions)
    rank = np.ones(len(domains), dtype=np.float64)
    for repo, _score, pos in rank_positions:
        ix = np.searchsorted(domains, repo)
        if ix < len(domains) and domains[ix] == repo:
            rank[ix] = pos / rank_max
    display = np.floor(100.0 * (1.0 - rank) + 0.5).astype(np.int64)

    fetched = np.asarray(stats["pages_fetched"], dtype=np.int64)
    return pa.table(
        {
            "domain": stats["domain"],
            # DomainRegistry: domain_id = sorted ordinal, part = id % N
            "node_affinity": pa.array(
                np.arange(len(domains), dtype=np.int64) % num_parts,
                pa.int64(),
            ),
            "pages_known": stats["pages_known"],
            "pages_fetched": stats["pages_fetched"],
            "pages_indexed": stats["pages_indexed"],
            "incoming_links": pa.array(incoming, pa.int64()),
            "outgoing_links": pa.array(outgoing, pa.int64()),
            "ranking": pa.array(display, pa.int64()),
            "suggest_for_crawling": pa.array(fetched == 0, pa.bool_()),
        }
    )


def domain_info_for(info: pa.Table, domain: str) -> dict | None:
    """Single-domain lookup over a computed info table — the
    ``domainInfo(domainId)`` service shape.  Returns None for unknown
    domains (Optional.empty)."""
    doms = np.asarray(info["domain"].to_pylist(), dtype=object)
    ix = int(np.searchsorted(doms, domain))
    if ix >= len(doms) or doms[ix] != domain:
        return None
    return {name: info[name][ix].as_py() for name in info.column_names}
