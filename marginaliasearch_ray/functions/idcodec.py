"""Combined document-id codec — bit-exact with the reference.

Reference: code/common/model/java/nu/marginalia/model/id/UrlIdCodec.java:26-99.

Layout: ``[1 unused | rank:6b <<57 | domainId:31b <<26 | ordinal:26b]``.
Sorting by combined id sorts by (rank, domain, ordinal): rank-major order
clusters a domain's documents into a contiguous id range, which turns
"documents of repo R" filters into range predicates on sorted posting
lists (UrlIdCodec.java:3-7; ForwardIndexReader.java:106-125).

Mapping for the source-code corpus: repo -> domain, file -> ordinal.
All ops are vectorized numpy int64 bit math.
"""

from __future__ import annotations

import numpy as np

RANK_MASK = np.int64(0xFE00_0000_0000_0000 - (1 << 64))  # sign-preserving
DOCORD_MASK = 0x03FF_FFFF
DOMAIN_MASK = 0x7FFF_FFFF


def encode_id(domain_id, ordinal) -> np.ndarray:
    """encodeId(domainId, ordinal) — UrlIdCodec.java:37-45."""
    d = np.asarray(domain_id, dtype=np.int64) & DOMAIN_MASK
    o = np.asarray(ordinal, dtype=np.int64) & DOCORD_MASK
    return (d << 26) | o


def encode_id_with_rank(rank, domain_id, ordinal) -> np.ndarray:
    """encodeId(rank, domainId, ordinal) — UrlIdCodec.java:48-58."""
    r = np.asarray(rank, dtype=np.int64) & 0x3F
    return (r << 57) | encode_id(domain_id, ordinal)


def add_rank_float(rank_f, url_id) -> np.ndarray:
    """addRank(float rank in [0,1], urlId) — UrlIdCodec.java:64-71;
    quantizes to 6 bits, clamped to [0, 63]."""
    rank_part = (np.asarray(rank_f, dtype=np.float64) * 64).astype(np.int64)
    rank_part = np.clip(rank_part, 0, 63)
    ids = np.asarray(url_id, dtype=np.int64)
    return (ids & ~RANK_MASK) | (rank_part << 57)


def get_domain_id(combined_id) -> np.ndarray:
    ids = np.asarray(combined_id, dtype=np.int64)
    return ((ids >> 26) & DOMAIN_MASK).astype(np.int64)


def get_ordinal(combined_id) -> np.ndarray:
    return np.asarray(combined_id, dtype=np.int64) & DOCORD_MASK


def get_rank(combined_id) -> np.ndarray:
    # Java uses >>> (logical); ids here never have the sign bit set.
    return (np.asarray(combined_id, dtype=np.int64) >> 57) & 0x3F


def remove_rank(combined_id) -> np.ndarray:
    """removeRank — UrlIdCodec.java:90-92."""
    return np.asarray(combined_id, dtype=np.int64) & ~RANK_MASK


def domain_id_range(rank, domain_id) -> tuple[int, int]:
    """[lo, hi) combined-id range covering every ordinal of a domain at a
    given rank — the rank-encoded-id-base trick
    (ForwardIndexReader.getRankEncodedDocumentIdBase:106-125)."""
    lo = int(encode_id_with_rank(rank, domain_id, 0))
    return lo, lo + (1 << 26)
