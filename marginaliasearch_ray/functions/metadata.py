"""Bit-packed document / term metadata — bit-exact with the reference.

Reference:
- DocumentMetadata packing: code/common/model/java/nu/marginalia/model/idx/
  DocumentMetadata.java:46-67 (masks/shifts), :113-124 (encode),
  :130-160 (field decoders).
- WordFlags: code/common/model/java/nu/marginalia/model/idx/WordFlags.java:6-43
  (bit = 1 << ordinal).
- Term-meta position bitmask: code/functions/language-processing/java/nu/
  marginalia/keyword/model/DocumentKeywordsBuilder.java:144-159 — one bit
  per 256-word window mod 56, with half-window smearing, stored in bits
  8..63 of the term meta; low byte is the WordFlags byte.

All vectorized numpy int64 ops.
"""

from __future__ import annotations

from enum import IntFlag

import numpy as np


class WordFlags(IntFlag):
    """WordFlags.java:6-39 — bit = 1 << ordinal."""

    TITLE = 1 << 0
    SUBJECTS = 1 << 1
    NAMES_WORDS = 1 << 2
    SYNTHETIC = 1 << 3
    SITE = 1 << 4
    SITE_ADJACENT = 1 << 5
    URL_PATH = 1 << 6
    URL_DOMAIN = 1 << 7
    EXTERNAL_LINK = 1 << 8  # note: overflows the stored byte exactly as in Java


class DocumentFlags(IntFlag):
    """DocumentFlags.java:5-14 — bit = 1 << ordinal; the low byte of the
    packed document meta."""

    JAVASCRIPT = 1 << 0
    PLAIN_TEXT = 1 << 1
    GENERATOR_DOCS = 1 << 2
    GENERATOR_FORUM = 1 << 3
    GENERATOR_WIKI = 1 << 4
    SIDELOADED = 1 << 5
    PDF_FILE = 1 << 6


class HtmlFeature(IntFlag):
    """HtmlFeature.java:5-40 — bit = 1 << ordinal (first 32 are the
    encoded FEATURES bitmask); only the subset this engine derives is
    listed, at the reference ordinals."""

    MEDIA = 1 << 0
    JS = 1 << 1
    AFFILIATE_LINK = 1 << 2
    TRACKING = 1 << 3
    TRACKING_ADTECH = 1 << 4
    KEBAB_CASE_URL = 1 << 5
    LONG_URL = 1 << 6
    COOKIES = 1 << 10
    CATEGORY_FOOD = 1 << 11
    ADVERTISEMENT = 1 << 12
    PDF = 1 << 15
    POPOVER = 1 << 16
    CONSENT = 1 << 17
    SHORT_DOCUMENT = 1 << 18


# HtmlFeature.getKeyword() — the synthetic keyword each feature injects
HTML_FEATURE_KEYWORD = {
    HtmlFeature.MEDIA: "special:media",
    HtmlFeature.JS: "special:scripts",
    HtmlFeature.AFFILIATE_LINK: "special:affiliate",
    HtmlFeature.TRACKING: "special:tracking",
    HtmlFeature.TRACKING_ADTECH: "special:adtech",
    HtmlFeature.KEBAB_CASE_URL: "special:kcurl",
    HtmlFeature.LONG_URL: "special:longurl",
    HtmlFeature.COOKIES: "special:cookies",
    HtmlFeature.CATEGORY_FOOD: "category:food",
    HtmlFeature.ADVERTISEMENT: "special:ads",
    HtmlFeature.PDF: "format:pdf",
    HtmlFeature.POPOVER: "special:popover",
    HtmlFeature.CONSENT: "special:consent",
    HtmlFeature.SHORT_DOCUMENT: "special:shorty",
}


# DocumentMetadata.java:46-67
ASL_SHIFT, ASL_MASK = 56, 0x03
RANK_SHIFT, RANK_MASK = 48, 0xFF
ENC_DOMAIN_SIZE_SHIFT, ENC_DOMAIN_SIZE_MASK = 40, 0xFF
ENC_DOMAIN_SIZE_MULTIPLIER = 5
TOPOLOGY_SHIFT, TOPOLOGY_MASK = 32, 0xFF
YEAR_SHIFT, YEAR_MASK = 24, 0xFF
SETS_SHIFT, SETS_MASK = 16, 0xF
QUALITY_SHIFT, QUALITY_MASK = 8, 0xF

POSITIONS_BITMASK_WINDOW_SIZE = 256  # DocumentKeywordsBuilder.java:33
MAX_WORD_LENGTH = 64  # DocumentKeywordsBuilder.java:30
MAX_POSITIONS_PER_WORD = 512  # DocumentKeywordsBuilder.java:31
MAX_SPANS_PER_TYPE = 8192  # DocumentKeywordsBuilder.java:32


def _clamp(v, mask):
    return np.minimum(np.int64(mask), np.maximum(np.int64(0), np.asarray(v, dtype=np.int64)))


def encode_document_meta(avg_sent_length=0, rank=0, enc_domain_size=0, topology=0,
                         year=0, sets=0, quality=0, flags=0) -> np.ndarray:
    """DocumentMetadata.encode() — DocumentMetadata.java:113-124."""
    ret = np.asarray(flags, dtype=np.int64) & 0xFF
    ret = ret | (_clamp(quality, QUALITY_MASK) << QUALITY_SHIFT)
    ret = ret | (_clamp(sets, SETS_MASK) << SETS_SHIFT)
    ret = ret | (_clamp(year, YEAR_MASK) << YEAR_SHIFT)
    ret = ret | (_clamp(topology, TOPOLOGY_MASK) << TOPOLOGY_SHIFT)
    ret = ret | (_clamp(enc_domain_size, ENC_DOMAIN_SIZE_MASK) << ENC_DOMAIN_SIZE_SHIFT)
    ret = ret | (_clamp(rank, RANK_MASK) << RANK_SHIFT)
    ret = ret | (_clamp(avg_sent_length, ASL_MASK) << ASL_SHIFT)
    return ret


def decode_quality(meta) -> np.ndarray:
    return (np.asarray(meta, dtype=np.int64) >> QUALITY_SHIFT) & QUALITY_MASK


def decode_asl(meta) -> np.ndarray:
    """decodeAvgSentenceLength — DocumentMetadata.java:138-140."""
    return (np.asarray(meta, dtype=np.int64) >> ASL_SHIFT) & ASL_MASK


def decode_topology(meta) -> np.ndarray:
    return (np.asarray(meta, dtype=np.int64) >> TOPOLOGY_SHIFT) & TOPOLOGY_MASK


def decode_year_byte(meta) -> np.ndarray:
    return (np.asarray(meta, dtype=np.int64) >> YEAR_SHIFT) & YEAR_MASK


def decode_rank(meta) -> np.ndarray:
    return (np.asarray(meta, dtype=np.int64) >> RANK_SHIFT) & RANK_MASK


def decode_size(meta) -> np.ndarray:
    """decodeSize — ENC_DOMAIN_SIZE_MULTIPLIER * encDomainSize."""
    enc = (np.asarray(meta, dtype=np.int64) >> ENC_DOMAIN_SIZE_SHIFT) & ENC_DOMAIN_SIZE_MASK
    return ENC_DOMAIN_SIZE_MULTIPLIER * enc


def encode_domain_size(size) -> np.ndarray:
    """withSizeAndTopology's encSize = min(255, max(1, size/5))."""
    s = np.asarray(size, dtype=np.int64) // ENC_DOMAIN_SIZE_MULTIPLIER
    return np.minimum(np.int64(ENC_DOMAIN_SIZE_MASK), np.maximum(np.int64(1), s))


# PubDate.java:12-15 — MIN_YEAR fixed, MAX_YEAR host-clock-derived in the
# reference; pinned here so engine and oracle agree across runs
PUBDATE_MIN_YEAR = 1995
PUBDATE_MAX_YEAR = 2027
PUBDATE_ENCODING_OFFSET = PUBDATE_MIN_YEAR + 1  # PubDate.java:48

# PrototypeRankingParameters.java:10-27 sensible defaults
SHORT_DOCUMENT_THRESHOLD = 2000
SHORT_DOCUMENT_PENALTY = 2.0
DOMAIN_RANK_BONUS = 1.0 / 100.0
QUALITY_PENALTY = 1.0 / 15.0
SHORT_SENTENCE_THRESHOLD = 2
SHORT_SENTENCE_PENALTY = 5.0
TEMPORAL_BIAS_WEIGHT = 5.0


def flags_penalty(
    features: np.ndarray, doc_flags: np.ndarray, size: np.ndarray
) -> np.ndarray:
    """flagsPenalty — IndexResultRankingService.java:633-683, vectorized.

    features==0 short-circuits to 0 (the index-service path without
    feature flags).  Generator-flagged documents (docs/forum/wiki) skip
    the large-site escalation: largeSiteFactor stays 1 and the
    KEBAB/LONG_URL url-shape penalties never apply.  The return is
    ``(int) -penalty`` — truncated toward zero like the Java cast."""
    f = np.asarray(features, dtype=np.int64)
    d = np.asarray(doc_flags, dtype=np.int64)
    size = np.asarray(size, dtype=np.float64)

    def has(bit):
        return ((f & int(bit)) != 0).astype(np.float64)

    is_gen = (
        d
        & int(
            DocumentFlags.GENERATOR_DOCS
            | DocumentFlags.GENERATOR_FORUM
            | DocumentFlags.GENERATOR_WIKI
        )
    ) != 0
    big = (~is_gen) & (size > 400)
    factor = np.where(big, 2.0, 1.0)
    penalty = np.where(
        big,
        np.where(
            has(HtmlFeature.KEBAB_CASE_URL) > 0,
            5.0,
            np.where(has(HtmlFeature.LONG_URL) > 0, 5.0, 0.0),
        ),
        0.0,
    )
    penalty = penalty + factor * (
        7.5 * has(HtmlFeature.ADVERTISEMENT)
        + 2.5 * has(HtmlFeature.CONSENT)
        + 2.5 * has(HtmlFeature.POPOVER)
        + 5.0 * has(HtmlFeature.TRACKING_ADTECH)
        + 5.0 * has(HtmlFeature.AFFILIATE_LINK)
        + 2.5 * has(HtmlFeature.COOKIES)
        + 2.5 * has(HtmlFeature.TRACKING)
        + 5.0 * has(HtmlFeature.SHORT_DOCUMENT)
    )
    out = -np.trunc(penalty)
    return np.where(f == 0, 0.0, out)


def document_bonus(
    meta: np.ndarray,
    length: np.ndarray,
    temporal_bias: str = "none",
    features: np.ndarray | None = None,
) -> np.ndarray:
    """calculateDocumentBonus — IndexResultRankingService.java:281-358 with
    the PrototypeRankingParameters defaults.  Connectivity is UNKNOWN
    (penalty 0), matching the reference's index-service path.
    ``length`` is the document token count (docSize).  ``features``
    (the per-doc HtmlFeature bitmask) adds the flagsPenalty component;
    None or all-zero reproduces the featureless short-circuit."""
    m = np.asarray(meta, dtype=np.int64)
    length = np.asarray(length, dtype=np.float64)
    asl = decode_asl(m).astype(np.float64)
    quality = decode_quality(m).astype(np.float64)
    rank = decode_rank(m).astype(np.float64)
    topology = decode_topology(m).astype(np.float64)
    size = decode_size(m).astype(np.float64)
    size = np.where(size == 0, 10_000.0, size)

    asl_penalty = np.where(
        asl >= SHORT_SENTENCE_THRESHOLD, 0.0, -SHORT_SENTENCE_PENALTY
    )
    doclen_penalty = np.where(
        length > SHORT_DOCUMENT_THRESHOLD, 0.0, -SHORT_DOCUMENT_PENALTY
    )
    quality_penalty = np.where(
        (size < 400) & (quality < 5), 0.0, -quality * QUALITY_PENALTY
    )
    ranking_bonus = (255.0 - rank) * DOMAIN_RANK_BONUS
    topology_bonus = 0.2 * np.log1p(topology)
    if temporal_bias == "recent":
        year = PUBDATE_ENCODING_OFFSET + decode_year_byte(m).astype(np.float64)
        temporal = -np.abs(year - PUBDATE_MAX_YEAR) * TEMPORAL_BIAS_WEIGHT
    elif temporal_bias == "old":
        year = PUBDATE_ENCODING_OFFSET + decode_year_byte(m).astype(np.float64)
        temporal = -np.abs(year - PUBDATE_MIN_YEAR) * TEMPORAL_BIAS_WEIGHT
    else:
        temporal = np.zeros(len(m), dtype=np.float64)
    fp = (
        flags_penalty(features, m & 0xFF, size)
        if features is not None
        else np.zeros(len(m), dtype=np.float64)
    )
    return (
        asl_penalty
        + doclen_penalty
        + quality_penalty
        + ranking_bonus
        + topology_bonus
        + temporal
        + fp
    )


def normalize_score(value: np.ndarray, penalty: np.ndarray) -> np.ndarray:
    """IndexResultRankingService.normalize:690-695 — maps to ~0..15 where
    LOWER is better: sqrt((1 + 500 + 20*penalty) / (1 + value))."""
    v = np.maximum(np.asarray(value, dtype=np.float64), 0.0)
    return np.sqrt((1.0 + 500.0 + 20.0 * np.asarray(penalty, dtype=np.float64)) / (1.0 + v))


def position_bitmask(positions: np.ndarray) -> int:
    """calculatePositionMask — DocumentKeywordsBuilder.java:144-159.

    Bits 8..63 of the term meta: bit (pos/256)%56 set, plus the
    half-window-smeared bit ((pos+128)/256)%56.
    """
    if len(positions) == 0:
        return 0
    p = np.asarray(positions, dtype=np.int64)
    w = POSITIONS_BITMASK_WINDOW_SIZE
    bits = np.concatenate([(p // w) % 56, ((p + w // 2) // w) % 56])
    mask = np.int64(0)
    for b in np.unique(bits):
        mask |= np.int64(1) << np.int64(8 + int(b))
    return int(mask)


def make_term_meta(flags: int, positions: np.ndarray) -> int:
    """Term meta word: low byte = WordFlags byte, bits 8..63 = coarse
    position bitmask (IndexJournalPage termMetadata semantics)."""
    return (int(flags) & 0xFF) | position_bitmask(positions)
