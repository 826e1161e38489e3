"""Domain-keyed blob store: favicon / screenshot serving analog.

Reference semantics:

- ``FaviconGrpcService.java:29-47`` — getFavicon(domain) returns
  (content_type, image bytes) from a crawl-populated store, or an empty
  response for unknown domains.
- ``ScreenshotService.java:32-49`` — hasScreenshot(domain) probe plus a
  (CONTENT_TYPE, DATA) blob fetch from DATA_DOMAIN_SCREENSHOT.

Both are bulk-written-once, point-looked-up-at-serve-time blob tables.
The Ray-Data re-expression:

- **Build** is a Dataset pass: one (domain, content_type, data) row per
  domain, globally sorted by domain and written as Parquet with SMALL
  row groups, so the file's per-row-group min/max statistics form a
  sparse index over the key space.
- **Serve** is a point lookup that reads parquet METADATA once (a few
  KB however large the store), binary-searches the row-group [min, max]
  ranges, and decodes ONLY the one row group that can hold the key —
  at 10^7 domains a lookup touches a ~256-row group, not the store.
  This is the same pruned-read discipline the posting blobs use.

The actual image bytes are crawl products the sandbox cannot fetch; the
bundled generator emits a DECLARED-FAKE deterministic payload (the
sha256 digest of the domain name) so the store mechanics — bulk sorted
write, pruned point reads, content-type round-trip — are real and
oracle-checkable (DuckDB's sha256 replicates the payload exactly),
while the payload itself is honest about not being an image.  Swap
``synth_favicon`` for a real fetcher column to serve real icons.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

FAVICON_CONTENT_TYPE = "image/png"  # the reference's dominant type
_ROW_GROUP_ROWS = 256  # small groups => tight min/max pruning


def synth_favicon(domain: str) -> tuple[str, bytes]:
    """Deterministic DECLARED-FAKE payload: sha256(domain) digest.
    Not an image — a stand-in the oracle can replicate in SQL."""
    return FAVICON_CONTENT_TYPE, hashlib.sha256(domain.encode()).digest()


def _favicon_batch(batch: pa.Table) -> pa.Table:
    doms = batch["domain"].to_pylist()
    pairs = [synth_favicon(d) for d in doms]
    return pa.table(
        {
            "domain": pa.array(doms, pa.string()),
            "content_type": pa.array([c for c, _b in pairs], pa.string()),
            "data": pa.array([b for _c, b in pairs], pa.binary()),
        }
    )


def build_favicon_store(docs_ds, out_path: str) -> int:
    """Bulk-build the blob store from a documents Dataset: one row per
    distinct domain (``source`` column), synth payloads, globally
    sorted, small row groups.  Returns the row count.

    The distinct + sort shuffles only |domains| rows (the corpus never
    moves); the final write is a single driver-side pq.write_table
    because a blob store's key order must be GLOBAL for the row-group
    binary search — at 10^7 domains x ~1 KB icons this is a few GB,
    still one node's work; shard by hash(domain) prefix into multiple
    stores when it outgrows that.
    """
    doms = docs_ds.select_columns(["source"]).unique("source") or []
    table = _favicon_batch(
        pa.table(
            {
                "domain": pa.array(
                    sorted(str(d) for d in doms), pa.string()
                )
            }
        )
    )
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    pq.write_table(table, out_path, row_group_size=_ROW_GROUP_ROWS)
    return len(table)


class DomainBlobStore:
    """Point-lookup reader: parquet metadata once, one row group per
    get().  The FaviconClient / ScreenshotService serve path."""

    def __init__(self, path: str):
        self.path = path
        self._file = pq.ParquetFile(path)
        md = self._file.metadata
        col = {c: i for i, c in enumerate(md.schema.names)}["domain"]
        mins, maxs, groups = [], [], []
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(col).statistics
            if st is None or not st.has_min_max:
                continue  # a 0-row store writes one stats-less group
            mins.append(st.min)
            maxs.append(st.max)
            groups.append(g)
        self._mins = np.array(mins, dtype=object)
        self._maxs = np.array(maxs, dtype=object)
        self._groups = groups

    def _group_for(self, domain: str) -> int | None:
        # last group whose min <= domain; verify domain <= its max
        ix = int(np.searchsorted(self._mins, domain, side="right")) - 1
        if ix < 0 or domain > self._maxs[ix]:
            return None
        return self._groups[ix]

    def get(self, domain: str) -> tuple[str, bytes] | None:
        """(content_type, data) or None — FaviconGrpcService.getFavicon
        shape.  Reads exactly one row group."""
        g = self._group_for(domain)
        if g is None:
            return None
        tbl = self._file.read_row_group(g, columns=["domain",
                                                    "content_type", "data"])
        doms = np.asarray(tbl["domain"].to_pylist(), dtype=object)
        ix = int(np.searchsorted(doms, domain))
        if ix >= len(doms) or doms[ix] != domain:
            return None
        return (
            tbl["content_type"][ix].as_py(),
            tbl["data"][ix].as_py(),
        )

    def has(self, domain: str) -> bool:
        """ScreenshotService.hasScreenshot probe."""
        return self.get(domain) is not None

    def __len__(self) -> int:
        return self._file.metadata.num_rows
