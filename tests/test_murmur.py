"""Cross-check the murmur port against an independent transcription of the
canonical MurmurHash3 x64 128 algorithm (public domain, Austin Appleby),
plus Java String.hashCode() parity vectors."""

import random
import struct

import numpy as np

from marginaliasearch_ray.functions.murmur import (
    _hash64_lowbytes,
    hash_keyword,
    hash_nearly_ascii,
    hash_utf8_variant,
    java_string_hashcode,
    KeywordHashCache,
)

M64 = (1 << 64) - 1


def rotl(x, r):
    return ((x << r) | (x >> (64 - r))) & M64


def fmix(k):
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & M64
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & M64
    k ^= k >> 33
    return k


def canonical_x64_128(data: bytes, seed: int):
    """Independent transcription of MurmurHash3_x64_128 (canonical C++),
    byte-oriented, tail processed low-to-high with fallthrough order."""
    length = len(data)
    h1 = seed & M64
    h2 = seed & M64
    c1 = 0x87C37B91114253D5
    c2 = 0x4CF5AD432745937F
    nblocks = length // 16
    for i in range(nblocks):
        k1, k2 = struct.unpack_from("<QQ", data, i * 16)
        k1 = (k1 * c1) & M64
        k1 = rotl(k1, 31)
        k1 = (k1 * c2) & M64
        h1 ^= k1
        h1 = rotl(h1, 27)
        h1 = (h1 + h2) & M64
        h1 = (h1 * 5 + 0x52DCE729) & M64
        k2 = (k2 * c2) & M64
        k2 = rotl(k2, 33)
        k2 = (k2 * c1) & M64
        h2 ^= k2
        h2 = rotl(h2, 31)
        h2 = (h2 + h1) & M64
        h2 = (h2 * 5 + 0x38495AB5) & M64
    tail = data[nblocks * 16 :]
    k1 = k2 = 0
    for i in range(len(tail) - 1, 7, -1):
        k2 ^= tail[i] << ((i - 8) * 8)
    if len(tail) > 8:
        k2 = (k2 * c2) & M64
        k2 = rotl(k2, 33)
        k2 = (k2 * c1) & M64
        h2 ^= k2
    for i in range(min(len(tail), 8) - 1, -1, -1):
        k1 ^= tail[i] << (i * 8)
    if len(tail) > 0:
        k1 = (k1 * c1) & M64
        k1 = rotl(k1, 31)
        k1 = (k1 * c2) & M64
        h1 ^= k1
    h1 ^= length
    h2 ^= length
    h1 = (h1 + h2) & M64
    h2 = (h2 + h1) & M64
    h1 = fmix(h1)
    h2 = fmix(h2)
    h1 = (h1 + h2) & M64
    h2 = (h2 + h1) & M64
    return h1, h2


def fold_signed(h1, h2):
    v = (h1 ^ h2) & M64
    return v - (1 << 64) if v >= (1 << 63) else v


def test_against_canonical_ascii():
    rng = random.Random(7)
    for _ in range(300):
        n = rng.randrange(0, 64)
        s = "".join(chr(rng.randrange(32, 127)) for _ in range(n))
        seed = rng.randrange(-(1 << 31), 1 << 31)
        units = np.frombuffer(s.encode("utf-16-le"), dtype="<u2")
        got = _hash64_lowbytes(units, seed)
        want = fold_signed(*canonical_x64_128(s.encode("ascii"), seed))
        assert got == want, (s, seed)


def test_low_byte_semantics_non_ascii():
    # MurmurHash3_128.java:118-165 consumes charAt(i) & 0xff — the hash of
    # a non-ASCII string equals the canonical hash of its UTF-16 code
    # units' low bytes, seeded with String.hashCode().
    s = "héllo_wörld_π"
    units = np.frombuffer(s.encode("utf-16-le"), dtype="<u2")
    low = bytes(int(u) & 0xFF for u in units)
    seed = java_string_hashcode(s)
    assert hash_nearly_ascii(s) == fold_signed(*canonical_x64_128(low, seed))


def test_java_string_hashcode_vectors():
    # Published Java values.
    assert java_string_hashcode("") == 0
    assert java_string_hashcode("a") == 97
    assert java_string_hashcode("abc") == 96354
    assert java_string_hashcode("hello") == 99162322
    # the famous Integer.MIN_VALUE hash
    assert java_string_hashcode("polygenelubricants") == -2147483648


def test_variants_and_cache():
    assert hash_keyword("import") == hash_nearly_ascii("import")
    assert hash_utf8_variant("import") == fold_signed(
        *canonical_x64_128(b"import", 104729)
    )
    cache = KeywordHashCache()
    toks = ["foo", "bar", "foo", "baz"]
    out = cache.hash_many(toks)
    assert out[0] == out[2] == hash_nearly_ascii("foo")
    assert out.dtype == np.int64


def test_determinism_and_spread():
    hs = {hash_keyword(w) for w in ("a", "b", "ab", "ba", "license", "import")}
    assert len(hs) == 6
