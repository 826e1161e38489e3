"""Domain (repo) registry + rank assignment + combined-id construction.

Reference semantics:
- domain -> int id registry: code/processes/loading-process/java/nu/
  marginalia/loading/domains/DomainLoaderService.java (DB-backed registry;
  ours is a deterministic groupby + sorted enumeration).
- 6-bit domain rank injected into the id at index-construction time:
  DocIdRewriter / IndexConstructorMain.java:210-218; rank source is
  DomainRankings (PageRank-derived).  For the code corpus, rank is a
  deterministic hash of the repo name (no link graph at synth time),
  fixed here so build and oracle agree.

The registry is a small table: build once with a groupby, broadcast with
``ray.put``, look up inside map_batches — never a shuffle join.
"""

from __future__ import annotations

import numpy as np

from ..functions.murmur import hash_nearly_ascii


def repo_rank(repo: str) -> int:
    """Deterministic 6-bit rank for a repo (0 = best) — a positional
    weighted character sum mod 64, chosen so a DuckDB oracle can compute
    the identical value (`list_sum([unicode(s[i]) * i ...]) % 64`); the
    reference's rank source is PageRank-derived DomainRankings, which has
    no meaning for a synthetic corpus without a link graph."""
    return sum(ord(c) * (i + 1) for i, c in enumerate(repo)) % 64


class DomainRegistry:
    """repo -> (domain_id, rank, part).  domain_id is the rank of the repo
    name in sorted order (deterministic, like the reference's insertion-
    order DB ids but reproducible); part = domain_id % num_parts keeps a
    repo's documents in one shared-nothing index partition."""

    def __init__(
        self,
        repos: list[str],
        num_parts: int,
        rank_overrides: dict[str, int] | None = None,
    ):
        """``rank_overrides``: repo -> 6-bit rank (0..63) injected instead
        of the synthetic default — the DomainRankings path (a PageRank
        result fed to the DocIdRewriter, IndexConstructorMain.java:210-218
        / ForwardIndexConverter.java:104-110).  See
        pipelines/ranking.rankings_to_overrides."""
        self.num_parts = num_parts
        self.repos = sorted(set(repos))
        ov = rank_overrides or {}
        self._rank_overrides = dict(ov)
        self._map = {
            r: (i, int(ov.get(r, repo_rank(r))), i % num_parts)
            for i, r in enumerate(self.repos)
        }

    @classmethod
    def from_mapping(
        cls, mapping: dict[str, tuple[int, int, int]], num_parts: int
    ) -> "DomainRegistry":
        """Registry with a PRESET repo -> (domain_id, rank, part) mapping —
        delta builds extend the base segment's registry so every repo keeps
        its base domain id (the reference's registry is likewise insertion-
        stable: DB autoincrement ids, DomainLoaderService)."""
        reg = cls.__new__(cls)
        reg.num_parts = num_parts
        reg._map = dict(mapping)
        reg.repos = sorted(reg._map)
        reg._rank_overrides = {}
        return reg

    def extended(self, new_repos, num_parts: int | None = None) -> "DomainRegistry":
        """Copy with unseen repos appended after the current max domain id
        (sorted for determinism); existing repos keep their ids."""
        num_parts = num_parts or self.num_parts
        mapping = dict(self._map)
        ov = getattr(self, "_rank_overrides", {})
        nxt = 1 + max((v[0] for v in mapping.values()), default=-1)
        for r in sorted(set(new_repos) - set(mapping)):
            mapping[r] = (nxt, int(ov.get(r, repo_rank(r))), nxt % num_parts)
            nxt += 1
        return DomainRegistry.from_mapping(mapping, num_parts)

    def lookup(self, repo: str) -> tuple[int, int, int]:
        return self._map[repo]

    def lookup_many(self, repos) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        n = len(repos)
        dom = np.empty(n, dtype=np.int64)
        rank = np.empty(n, dtype=np.int64)
        part = np.empty(n, dtype=np.int32)
        m = self._map
        for i, r in enumerate(repos):
            d, rk, p = m[r]
            dom[i] = d
            rank[i] = rk
            part[i] = p
        return dom, rank, part

    def domain_of(self, repo: str) -> int:
        return self._map[repo][0]

    def __len__(self) -> int:
        return len(self.repos)


def build_domain_registry(
    corpus_ds, num_parts: int, rank_overrides: dict[str, int] | None = None
) -> DomainRegistry:
    """One small shuffle: distinct repo names.  The result is tiny (one
    row per repo) and is broadcast to all tokenize actors."""
    repos = corpus_ds.select_columns(["repo"]).unique("repo")
    return DomainRegistry(list(repos), num_parts, rank_overrides)
