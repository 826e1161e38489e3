"""In-memory domain-link repository — the link-graph partition
service's serving-side store.

Reference: the DomainLinks interface (code/functions/link-graph/
partition/java/nu/marginalia/linkgraph/DomainLinks.java:10-36) and its
file-backed implementation (impl/FileDomainLinks.java): the whole
source→destination pair set is loaded into memory from one file,
queried as findDestinations / findSources (+ counts) / forEach, and
replaced wholesale by ``switchInput`` — which, per the interface
contract, deletes the provided file after the swap.

The store here loads an aggregated (src, dst, weight) Parquet edge
table (the ring-derived link graph the ranking/adjacency pipelines
produce) and keeps two sorted views — (src, dst) for destinations,
(dst, src) for sources — so every lookup is a searchsorted range scan,
never a table pass.  At 100-TB scale the domain graph is
|domains|²-bounded, not corpus-bounded, so a per-node in-memory copy
is the right shape (the reference makes the same call).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_EMPTY = pa.table(
    {"other": pa.array([], pa.string()), "weight": pa.array([], pa.int64())}
)


class DomainLinksDB:
    """Loaded-once, swap-on-switch domain link store."""

    def __init__(self, path: str | None = None):
        self._fwd_src = np.array([], dtype=object)
        self._fwd_dst = np.array([], dtype=object)
        self._fwd_w = np.array([], dtype=np.int64)
        self._rev_src = np.array([], dtype=object)
        self._rev_dst = np.array([], dtype=object)
        self._rev_w = np.array([], dtype=np.int64)
        if path is not None:
            self._load(path)

    def _load(self, path: str) -> None:
        t = pq.read_table(path, columns=["src", "dst", "weight"])
        src = np.asarray(t["src"].to_pylist(), dtype=object)
        dst = np.asarray(t["dst"].to_pylist(), dtype=object)
        w = t["weight"].to_numpy(zero_copy_only=False).astype(np.int64)
        fo = np.lexsort((dst, src))
        self._fwd_src, self._fwd_dst, self._fwd_w = src[fo], dst[fo], w[fo]
        ro = np.lexsort((src, dst))
        self._rev_src, self._rev_dst, self._rev_w = src[ro], dst[ro], w[ro]

    def switch_input(self, path: str) -> None:
        """Replace the in-memory db with ``path``'s contents, then delete
        the provided file (DomainLinks.switchInput:11-14 contract)."""
        self._load(path)
        os.remove(path)

    def _range(self, keys: np.ndarray, key: str) -> tuple[int, int]:
        lo = int(np.searchsorted(keys, key, side="left"))
        hi = int(np.searchsorted(keys, key, side="right"))
        return lo, hi

    def find_destinations(self, source: str) -> pa.Table:
        """(other, weight) rows, destination-sorted
        (findDestinations:16-17)."""
        lo, hi = self._range(self._fwd_src, source)
        if lo == hi:
            return _EMPTY
        return pa.table(
            {
                "other": pa.array(list(self._fwd_dst[lo:hi]), pa.string()),
                "weight": pa.array(self._fwd_w[lo:hi], pa.int64()),
            }
        )

    def count_destinations(self, source: str) -> int:
        lo, hi = self._range(self._fwd_src, source)
        return hi - lo

    def find_sources(self, dest: str) -> pa.Table:
        """(other, weight) rows, source-sorted (findSources:22-23)."""
        lo, hi = self._range(self._rev_dst, dest)
        if lo == hi:
            return _EMPTY
        return pa.table(
            {
                "other": pa.array(list(self._rev_src[lo:hi]), pa.string()),
                "weight": pa.array(self._rev_w[lo:hi], pa.int64()),
            }
        )

    def count_sources(self, dest: str) -> int:
        lo, hi = self._range(self._rev_dst, dest)
        return hi - lo

    def for_each(self):
        """Iterate (src, dst, weight) pairs (forEach:29-30), src-major."""
        for s, d, w in zip(self._fwd_src, self._fwd_dst, self._fwd_w):
            yield str(s), str(d), int(w)

    def __len__(self) -> int:
        return len(self._fwd_src)
