"""Domain browse: random exploration + similar-cosine neighbor browse.

Reference semantics (``code/features-search/random-websites``):

- ``DbBrowseDomainsRandom.java:27-63`` — a random sample of the curated
  domain set (ORDER BY RAND() LIMIT count), INDEXED flag attached,
  blacklisted domains dropped while filling.
- ``DbBrowseDomainsSimilarCosine.java:27-68`` — the neighbors of a
  domain from the adjacency view ordered by RELATEDNESS DESC, an INNER
  JOIN on DATA_DOMAIN_SCREENSHOT (only domains WITH a screenshot are
  browseable), blacklist filtered while filling to ``count``.

Determinism: ORDER BY RAND() is replaced by ordering on
``sha256("{seed}:{domain}")`` — a fixed seed gives a stable,
SQL-replicable shuffle (DuckDB's sha256 produces the identical key),
the analog of the curated EC_RANDOM_DOMAINS rotation.  The screenshot
join is served by the domain blob store (``pipelines/blobstore.py``) —
``has()`` point probes, one row group per query.

Both functions are |domains|-bounded serve-path operations over
already-aggregated tables (the corpus never moves); the heavy inputs
(the adjacency table, the blob store, the per-domain indexed flags)
are the build-side products of their own pipelines.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

from .adjacencies import (
    _EMPTY_NEIGHBORS,
    _as_table,
    _bidirectional_neighbors,
    _relatedness_map,
)


def shuffle_key(seed: int, domain: str) -> str:
    """Deterministic RAND() stand-in: sha256 hex of "{seed}:{domain}"
    — replicated by DuckDB's sha256 in the oracle."""
    return hashlib.sha256(f"{seed}:{domain}".encode()).hexdigest()


def random_browse(
    domains,
    k: int,
    seed: int,
    *,
    exclude=(),
    indexed: set | None = None,
) -> pa.Table:
    """(domain, indexed) rows — DbBrowseDomainsRandom.getRandomDomains:
    seeded-shuffle order, blacklist dropped while filling, LIMIT k.
    ``indexed``: the set of domains with indexed pages (None = all)."""
    ex = set(exclude)
    picked = sorted(
        (str(d) for d in domains if str(d) not in ex),
        key=lambda d: shuffle_key(seed, d),
    )[: max(k, 0)]
    return pa.table(
        {
            "domain": pa.array(picked, pa.string()),
            "indexed": pa.array(
                [indexed is None or d in indexed for d in picked],
                pa.bool_(),
            ),
        }
    )


def similar_browse(
    neighbors,
    domain: str,
    k: int,
    *,
    has=None,
    exclude=(),
    indexed: set | None = None,
) -> pa.Table:
    """(neighbor, relatedness, indexed) rows — the similar-cosine
    browse: bidirectional adjacency of ``domain`` over the stored
    neighbor table, relatedness DESC (name ASC tie pin — the reference
    leaves SQL ties unspecified), ``has(neighbor)`` required (the
    screenshot INNER JOIN), blacklist dropped while filling, LIMIT k.

    ``has``: a predicate such as ``DomainBlobStore.has`` (None = all).
    Relatedness is the stored ``Math.round(100·val)`` service value."""
    neighbors = _as_table(neighbors, _EMPTY_NEIGHBORS)
    rel = _relatedness_map(neighbors)
    ex = set(exclude)
    picked = [
        n for n in _bidirectional_neighbors(neighbors, domain, rel)
        if n not in ex and (has is None or has(n))
    ][: max(k, 0)]
    return pa.table(
        {
            "neighbor": pa.array(picked, pa.string()),
            "relatedness": pa.array(
                [
                    rel.get((min(domain, n), max(domain, n)), 0.0)
                    for n in picked
                ],
                pa.float64(),
            ),
            "indexed": pa.array(
                [indexed is None or n in indexed for n in picked],
                pa.bool_(),
            ),
        }
    )
