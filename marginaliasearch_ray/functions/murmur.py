"""Faithful port of Marginalia's keyword hash.

Reference: third-party/commons-codec/src/main/java/nu/marginalia/hash/
MurmurHash3_128.java:85-175 (hash64 over CharSequence), :269-278
(getLittleEndianLong — low byte of each UTF-16 code unit, little-endian),
:290-297 (fmix64), :174 (non-standard 128->64 fold ``h1 ^ h2``); seed
selection per code/functions/language-processing/java/nu/marginalia/
language/keywords/KeywordHasher.java:15-19 — the default ``AsciiIsh``
variant seeds with Java ``String.hashCode()`` and consumes only the low
byte of each UTF-16 code unit.

Term-id parity with the reference requires this exact function; the low
byte / hashCode-seed semantics are load-bearing for non-ASCII tokens.

Pure integer math on Python ints masked to 64 bits.  The hot path hashes
each *unique* token once per actor via ``KeywordHashCache``.
"""

from __future__ import annotations

import numpy as np

_M64 = (1 << 64) - 1

C1 = 0x87C37B91114253D5
C2 = 0x4CF5AD432745937F
R1 = 31
R2 = 27
R3 = 33
M = 5
N1 = 0x52DCE729
N2 = 0x38495AB5
DEFAULT_SEED = 104729


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _fmix64(h: int) -> int:
    h ^= h >> 33
    h = (h * 0xFF51AFD7ED558CCD) & _M64
    h ^= h >> 33
    h = (h * 0xC4CEB9FE1A85EC53) & _M64
    h ^= h >> 33
    return h


def _to_signed64(x: int) -> int:
    x &= _M64
    return x - (1 << 64) if x >= (1 << 63) else x


def java_string_hashcode(s: str) -> int:
    """Java String.hashCode(): h = 31*h + c over UTF-16 code units, int32
    wraparound; returns a signed 32-bit int."""
    h = 0
    for cu in np.frombuffer(s.encode("utf-16-le"), dtype="<u2"):
        h = (31 * h + int(cu)) & 0xFFFFFFFF
    return h - (1 << 32) if h >= (1 << 31) else h


def _hash64_lowbytes(units: np.ndarray, seed: int) -> int:
    """MurmurHash3_128 body over the low bytes of UTF-16 code units,
    folded to 64 bits via h1^h2.  ``seed`` is sign-extended to 64 bits
    exactly as Java's ``long h1 = seed`` does."""
    data = (units & 0xFF).astype(np.uint8)
    length = len(data)
    h1 = seed & _M64
    h2 = seed & _M64
    nblocks = length >> 4

    if nblocks:
        blocks = np.frombuffer(data[: nblocks * 16].tobytes(), dtype="<u8")
        for i in range(nblocks):
            k1 = int(blocks[2 * i])
            k2 = int(blocks[2 * i + 1])
            k1 = (k1 * C1) & _M64
            k1 = _rotl64(k1, R1)
            k1 = (k1 * C2) & _M64
            h1 ^= k1
            h1 = _rotl64(h1, R2)
            h1 = (h1 + h2) & _M64
            h1 = (h1 * M + N1) & _M64
            k2 = (k2 * C2) & _M64
            k2 = _rotl64(k2, R3)
            k2 = (k2 * C1) & _M64
            h2 ^= k2
            h2 = _rotl64(h2, R1)
            h2 = (h2 + h1) & _M64
            h2 = (h2 * M + N2) & _M64

    # tail (MurmurHash3_128.java:118-165)
    index = nblocks << 4
    tail = data[index:]
    rem = len(tail)
    k1 = 0
    k2 = 0
    if rem > 8:
        for j in range(rem - 1, 7, -1):
            k2 ^= int(tail[j]) << (8 * (j - 8))
        k2 = (k2 * C2) & _M64
        k2 = _rotl64(k2, R3)
        k2 = (k2 * C1) & _M64
        h2 ^= k2
    if rem > 0:
        for j in range(min(rem, 8) - 1, -1, -1):
            k1 ^= int(tail[j]) << (8 * j)
        k1 = (k1 * C1) & _M64
        k1 = _rotl64(k1, R1)
        k1 = (k1 * C2) & _M64
        h1 ^= k1

    h1 ^= length
    h2 ^= length
    h1 = (h1 + h2) & _M64
    h2 = (h2 + h1) & _M64
    h1 = _fmix64(h1)
    h2 = _fmix64(h2)
    h1 = (h1 + h2) & _M64
    h2 = (h2 + h1) & _M64
    return _to_signed64(h1 ^ h2)


def hash_nearly_ascii(s: str) -> int:
    """Default keyword hash (KeywordHasher.AsciiIsh): Murmur3_128 over
    low bytes seeded with Java String.hashCode(), folded to 64 bits."""
    units = np.frombuffer(s.encode("utf-16-le"), dtype="<u2")
    return _hash64_lowbytes(units, java_string_hashcode(s))


def hash_utf8_variant(s: str) -> int:
    """The ``hashUtf8`` variant (fixed seed 104729) — selected by the
    reference when ``system.noFlattenUnicode`` is set."""
    units = np.frombuffer(s.encode("utf-16-le"), dtype="<u2")
    return _hash64_lowbytes(units, DEFAULT_SEED)


def hash_keyword(s: str) -> int:
    """hashKeyword with default system configuration (AsciiIsh)."""
    return hash_nearly_ascii(s)


class KeywordHashCache:
    """Per-actor memoizing wrapper: token vocabulary is Zipfian, so
    hashing each unique token once amortizes the pure-Python hash to
    near-zero cost per occurrence."""

    def __init__(self, max_size: int = 1 << 20):
        self._cache: dict[str, int] = {}
        self._max_size = max_size

    def hash_many(self, tokens) -> np.ndarray:
        cache = self._cache
        out = np.empty(len(tokens), dtype=np.int64)
        for i, t in enumerate(tokens):
            h = cache.get(t)
            if h is None:
                h = hash_nearly_ascii(t)
                if len(cache) < self._max_size:
                    cache[t] = h
            out[i] = h
        return out
