"""Declared Arrow schemas per logical table, asserted at stage boundaries.

Mirrors the reference's fixed, declared-in-code schema discipline
(SlopTable column declarations — IndexJournalPage.java:17-30,
SlopDocumentRecord.java:25-46); no runtime schema inference.
"""

from __future__ import annotations

import pyarrow as pa

# Driver-mandated corpus input shape (BASELINE.json input_hint), plus an
# optional pre-assigned per-repo ordinal.
CORPUS_SCHEMA = pa.schema(
    [
        ("repo", pa.string()),
        ("path", pa.string()),
        ("commit", pa.string()),
        ("lang", pa.string()),
        ("content", pa.string()),
    ]
)

# Journal = indexing input, one row per document (IndexJournalPage.java:17-30
# analog), denormalized with the docdb decoration columns
# (DocdbUrlDetail.java:5-17 analog) so that doc-meta is a projection.
JOURNAL_SCHEMA = pa.schema(
    [
        ("part", pa.int32()),  # hash(repo) % P — shared-nothing index partition
        ("combined_id", pa.int64()),  # rank<<57 | domain<<26 | ordinal
        ("document_meta", pa.int64()),
        ("features", pa.int32()),
        ("size", pa.int32()),  # doc length in admitted tokens
        ("lang", pa.string()),
        ("term_ids", pa.list_(pa.int64())),
        ("term_tfs", pa.list_(pa.int32())),  # uncapped occurrence counts
        ("term_meta", pa.list_(pa.int64())),  # low byte WordFlags | pos bitmask
        ("term_positions", pa.list_(pa.list_(pa.int32()))),  # capped at 512
        ("span_codes", pa.binary()),  # one tag byte per span list ('c','h')
        ("spans", pa.list_(pa.list_(pa.int32()))),  # [start,end) pairs per tag
        # docdb decoration / invariant columns
        ("repo", pa.string()),
        ("path", pa.string()),
        ("commit", pa.string()),
        ("title", pa.string()),
        ("description", pa.string()),
        ("data_hash", pa.string()),  # sha256(content) hex — per-row invariant
    ]
)

# Reverse-index posting rows after the explode stage.
POSTING_ROW_SCHEMA = pa.schema(
    [
        ("part", pa.int32()),
        ("bucket", pa.int32()),  # hash bucket of term_id — bounds group size
        ("salt", pa.int32()),  # doc-hash salt for skewed high-df terms
        ("term_id", pa.int64()),
        ("combined_id", pa.int64()),
        ("tf", pa.int32()),
        ("meta", pa.int64()),
        ("positions", pa.list_(pa.int32())),
    ]
)

# Encoded posting-list runs / final segments.
SEGMENT_SCHEMA = pa.schema(
    [
        ("part", pa.int32()),
        ("term_id", pa.int64()),
        ("df", pa.int64()),
        ("docs", pa.binary()),  # delta+varint combined ids
        ("tfs", pa.binary()),  # varint counts
        ("metas", pa.binary()),  # raw little-endian int64s
        ("positions", pa.binary()),  # concatenated varint sequences, doc order
    ]
)

FORWARD_SCHEMA = pa.schema(
    [
        ("part", pa.int32()),
        ("combined_id", pa.int64()),
        ("document_meta", pa.int64()),
        ("features", pa.int32()),
        ("size", pa.int32()),
    ]
)


def assert_schema(table: pa.Table, schema: pa.Schema, where: str) -> None:
    missing = set(schema.names) - set(table.schema.names)
    if missing:
        raise ValueError(f"{where}: missing columns {sorted(missing)}")
