"""Wire codecs for posting lists and position sequences.

Reference: code/libraries/coded-sequence/java/nu/marginalia/sequence/
VarintCodedSequence.java:32-130 — strictly-increasing values stored as a
delta chain prefixed with ``count+1``, each delta coded as big-endian
7-bit varint groups (continuation bit 0x80 on every byte except the
last).  This module reproduces that format bit-for-bit for values
< 2**28 and generalizes the identical scheme to 64-bit values for
posting-list doc-id deltas (the reference stores doc ids as raw longs in
its skiplist, SkipListWriter.java:23-110; the north star asks for
delta+varint compression, so we apply the varint scheme to doc ids too).

Streams:

- position sequence (per term-doc): exact VarintCodedSequence format —
  ``varint(count+1)`` then varint deltas of strictly-increasing 1-based
  positions (VarintCodedSequence.generate:32-53).
- doc-id sequence (per term): ``varint(count+1)`` then varint deltas with
  prev initialized to -1 so that doc id 0 is representable (documented
  divergence: the reference never delta-codes doc id 0).
- tf sequence (per term): ``varint(count+1)`` then raw varints (no delta;
  tfs are >= 1 but not monotone).

Decoders are vectorized numpy (terminator-scan + scatter-add), O(bytes);
encoders are vectorized over whole arrays with a bounded per-byte-width
loop.
"""

from __future__ import annotations

import numpy as np

_THRESHOLDS = [1 << (7 * k) for k in range(1, 10)]  # widths 2..10 bytes


def _varint_widths(values: np.ndarray) -> np.ndarray:
    """Bytes needed per value under the 7-bit big-endian scheme."""
    v = values.astype(np.uint64)
    nb = np.ones(len(v), dtype=np.int64)
    for t in _THRESHOLDS:
        nb += (v >= np.uint64(t)).astype(np.int64)
    return nb


def encode_varints(values: np.ndarray) -> bytes:
    """Concatenated big-endian 7-bit varints (VarintCodedSequence.encodeValue
    semantics, generalized to uint64)."""
    v = np.asarray(values, dtype=np.uint64)
    if len(v) == 0:
        return b""
    nb = _varint_widths(v)
    ends = np.cumsum(nb)  # index one past each value's last byte
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    # byte j-from-last holds (v >> 7j) & 0x7F; continuation bit on j > 0
    for j in range(10):
        mask = nb > j
        if not mask.any():
            break
        pos = ends[mask] - 1 - j
        byte = ((v[mask] >> np.uint64(7 * j)) & np.uint64(0x7F)).astype(np.uint8)
        if j > 0:
            byte |= 0x80
        out[pos] = byte
    return out.tobytes()


def decode_varints(buf: bytes | np.ndarray) -> np.ndarray:
    """Decode a concatenated varint stream to uint64 values (vectorized)."""
    b = np.frombuffer(buf, dtype=np.uint8) if isinstance(buf, (bytes, bytearray, memoryview)) else buf
    if len(b) == 0:
        return np.empty(0, dtype=np.uint64)
    is_term = (b & 0x80) == 0
    term_idx = np.flatnonzero(is_term)
    n = len(term_idx)
    # group id of each byte = index of its terminating value
    g = np.cumsum(is_term) - is_term  # for byte i: number of terminals before i
    shifts = np.uint64(7) * (term_idx[g] - np.arange(len(b))).astype(np.uint64)
    vals = np.zeros(n, dtype=np.uint64)
    np.add.at(vals, g, (b & np.uint64(0x7F)).astype(np.uint64) << shifts)
    return vals


def encode_sequence(values: np.ndarray) -> bytes:
    """VarintCodedSequence.generate:32-53 — strictly-increasing positive
    ints; stream = varint(count+1) + varint deltas."""
    v = np.asarray(values, dtype=np.int64)
    if len(v):
        deltas = np.diff(v, prepend=np.int64(0))
        if (deltas <= 0).any():
            raise ValueError("values must be strictly increasing and > 0")
    else:
        deltas = v
    head = np.array([len(v) + 1], dtype=np.int64)
    return encode_varints(np.concatenate([head, deltas]))


def decode_sequence(buf: bytes) -> np.ndarray:
    vals = decode_varints(buf).astype(np.int64)
    if len(vals) == 0:
        return vals
    n = int(vals[0]) - 1
    return np.cumsum(vals[1 : 1 + n])


def encode_doc_ids(doc_ids: np.ndarray) -> bytes:
    """Posting-list doc ids: strictly increasing int64 >= 0; deltas with
    prev = -1 so id 0 round-trips."""
    v = np.asarray(doc_ids, dtype=np.int64)
    if len(v):
        deltas = np.diff(v, prepend=np.int64(-1))
        if (deltas <= 0).any():
            raise ValueError("doc ids must be strictly increasing")
    else:
        deltas = v
    head = np.array([len(v) + 1], dtype=np.int64)
    return encode_varints(np.concatenate([head, deltas]))


def decode_doc_ids(buf: bytes) -> np.ndarray:
    vals = decode_varints(buf).astype(np.int64)
    if len(vals) == 0:
        return vals
    n = int(vals[0]) - 1
    return np.cumsum(vals[1 : 1 + n]) - 1


def encode_counts(counts: np.ndarray) -> bytes:
    """Non-monotone positive ints (term frequencies): varint(count+1) +
    raw varints."""
    v = np.asarray(counts, dtype=np.int64)
    head = np.array([len(v) + 1], dtype=np.int64)
    return encode_varints(np.concatenate([head, v]))


def decode_counts(buf: bytes) -> np.ndarray:
    vals = decode_varints(buf).astype(np.int64)
    if len(vals) == 0:
        return vals
    n = int(vals[0]) - 1
    return vals[1 : 1 + n]


def encode_stream_blob(
    values: np.ndarray, lengths: np.ndarray
) -> tuple[bytes, np.ndarray]:
    """Encode many ``[len+1, v1..vk]`` varint streams in ONE vectorized
    pass.  ``values`` is the concatenation of all stream payloads (already
    delta-coded by the caller), ``lengths`` the per-stream payload length.

    Returns (blob, byte_offsets) where byte_offsets has ``len(lengths)+1``
    entries and stream i occupies ``blob[byte_offsets[i]:byte_offsets[i+1]]``
    — callers can also slice across consecutive streams to build grouped
    blobs without re-encoding.
    """
    lengths = np.asarray(lengths, dtype=np.int64)
    n = len(lengths)
    if n == 0:
        return b"", np.zeros(1, dtype=np.int64)
    tot = int(lengths.sum())
    start_pos = np.cumsum(lengths) - lengths
    hdr_idx = start_pos + np.arange(n)
    comb = np.empty(n + tot, dtype=np.int64)
    comb[hdr_idx] = lengths + 1
    mask = np.ones(n + tot, dtype=bool)
    mask[hdr_idx] = False
    comb[mask] = values
    widths = _varint_widths(comb.astype(np.uint64))
    ends = np.cumsum(widths)
    blob = encode_varints(comb)
    byte_offsets = np.empty(n + 1, dtype=np.int64)
    byte_offsets[0] = 0
    if n > 1:
        byte_offsets[1:n] = ends[hdr_idx[1:] - 1]
    byte_offsets[n] = ends[-1] if len(ends) else 0
    return blob, byte_offsets


def decode_many_sequences(bufs) -> list[np.ndarray]:
    """Decode a batch of position sequences in one vectorized pass by
    concatenating buffers (each stream is self-delimiting via its count
    prefix only if parsed sequentially, so we decode the concatenation
    and re-split by the count headers)."""
    if not bufs:
        return []
    joined = b"".join(bufs)
    vals = decode_varints(joined).astype(np.int64)
    out = []
    i = 0
    for _ in range(len(bufs)):
        n = int(vals[i]) - 1
        out.append(np.cumsum(vals[i + 1 : i + 1 + n]))
        i += 1 + n
    return out
