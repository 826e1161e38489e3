"""Elias-gamma position-sequence codec — the reference's LEGACY positions
wire format, bit-exact.

Reference:
- GammaCodedSequence: code/libraries/coded-sequence/java/nu/marginalia/
  sequence/GammaCodedSequence.java:148-186 — a strictly-increasing
  positive sequence stored as ``gamma(count+1)`` followed by
  ``gamma(delta)`` per element, MSB-first, trimmed to the meaningful
  byte count (BitWriter.finishLastByte, io/BitWriter.java:118-137).
- Iterator mirror: GammaCodedSequence.EliasGammaSequenceIterator
  (GammaCodedSequence.java:202-263) and readCount (:224-229).
- Bit packing: io/BitWriter.java:49-106 (putBits/putGamma over
  big-endian 64-bit words) and io/BitReader.java:53-121 (get /
  takeWhileZero) — the byte stream is equivalent to plain MSB-first
  bit order, which is what this module reads and writes.

The reference replaced this codec with VarintCodedSequence (our
``functions.codecs``) but keeps the gamma classes as the legacy format;
this module plays the same role: segments written by
``pipelines.transcode.transcode_positions(..., codec="gamma")`` store
each posting's position list as one byte-aligned GammaCodedSequence,
``query._Segment`` detects the codec from the segment manifest, and the
transcoder migrates legacy segments back to the varint hot format.

Scale note: gamma decode is bit-serial by construction (each codeword's
width is only known once the previous one is parsed), so
``flat_gamma_positions_by_counts`` walks codeword boundaries in a
Python loop (O(1) per codeword via a precomputed set-bit index) and
then extracts all values in one vectorized pass.  The decode happens at
most once per (term, segment, query) behind ``positions_flat``'s cache;
the varint codec remains the default serving format.
"""

from __future__ import annotations

import numpy as np

from .prio_codec import _bit_length

__all__ = [
    "encode_gamma_sequence",
    "decode_gamma_sequence",
    "gamma_value_count",
    "encode_gamma_blob",
    "gamma_blob_payload",
    "flat_gamma_positions_by_counts",
]


def _pack_codewords(comb: np.ndarray, start_bit: np.ndarray, total_bytes: int) -> bytes:
    """Scatter codewords into an MSB-first bit array and pack to bytes.

    ``comb[i]`` (positive, < 2**63) occupies ``2*bit_length-1`` bits at
    ``start_bit[i]``: the gamma code's leading zeros are implicit (the
    output array starts zeroed), only the value's own bits are set.
    """
    if total_bytes == 0:
        return b""
    bl = _bit_length(comb)
    w = 2 * bl - 1
    # K x 64 bit matrix of each codeword's value, MSB-first: column c is
    # bit (63 - c); its target position is start + w - 1 - (63 - c)
    bitmat = np.unpackbits(
        comb.astype(">u8").view(np.uint8).reshape(-1, 8), axis=1
    )
    target = (start_bit + w - 64)[:, None] + np.arange(64, dtype=np.int64)
    mask = bitmat.astype(bool)
    out = np.zeros(total_bytes * 8, dtype=np.uint8)
    out[target[mask]] = 1
    return np.packbits(out).tobytes()


def encode_gamma_sequence(values: np.ndarray) -> bytes:
    """GammaCodedSequence.encode:148-186 — strictly-increasing positive
    ints; bit stream = gamma(count+1) + gamma(deltas), zero-padded to the
    meaningful byte boundary."""
    v = np.asarray(values, dtype=np.int64)
    if len(v):
        deltas = np.diff(v, prepend=np.int64(0))
        if (deltas <= 0).any():
            raise ValueError("values must be strictly increasing and > 0")
    else:
        deltas = v
    comb = np.concatenate([[np.int64(len(v) + 1)], deltas])
    w = 2 * _bit_length(comb) - 1
    start_bit = np.cumsum(w) - w
    total_bytes = int((w.sum() + 7) // 8)
    return _pack_codewords(comb, start_bit, total_bytes)


class _BitCursor:
    """Sequential gamma-codeword reader over an unpacked bit array.

    Mirrors BitReader.takeWhileZero + get (io/BitReader.java:97-137): the
    set-bit index makes each zero-run scan O(log n) instead of bit-serial.
    """

    __slots__ = ("bits", "ones", "pos", "nbits")

    def __init__(self, buf):
        if isinstance(buf, np.ndarray) and buf.dtype == np.uint8:
            arr = buf
        else:
            arr = np.frombuffer(buf, dtype=np.uint8)
        self.bits = np.unpackbits(arr)
        self.ones = np.flatnonzero(self.bits)
        self.pos = 0
        self.nbits = len(self.bits)

    def boundaries(self, n: int) -> tuple[np.ndarray, np.ndarray]:
        """Parse ``n`` consecutive gamma codewords starting at ``pos``;
        returns (delimiter-one positions, widths).  Advances ``pos``."""
        ones = self.ones
        starts = np.empty(n, dtype=np.int64)
        bls = np.empty(n, dtype=np.int64)
        p = self.pos
        for k in range(n):
            si = np.searchsorted(ones, p)
            if si >= len(ones):
                raise ValueError("truncated gamma stream")
            o = int(ones[si])
            bl = o - p + 1
            starts[k] = o
            bls[k] = bl
            p = o + bl
        if p > self.nbits:
            raise ValueError("truncated gamma stream")
        self.pos = p
        return starts, bls

    def align_byte(self) -> None:
        self.pos = (self.pos + 7) & ~7


def _extract_values(bits: np.ndarray, starts: np.ndarray, bls: np.ndarray) -> np.ndarray:
    """Vectorized value extraction: codeword k's value is the ``bls[k]``
    bits of ``bits`` starting at the delimiter one ``starts[k]``."""
    if len(starts) == 0:
        return np.empty(0, dtype=np.int64)
    wmax = int(bls.max())
    if wmax > 63:
        raise ValueError("gamma codeword wider than 63 bits")
    padded = np.concatenate([bits, np.zeros(wmax, dtype=np.uint8)])
    win = padded[starts[:, None] + np.arange(wmax, dtype=np.int64)[None, :]]
    weights = np.left_shift(
        np.uint64(1), np.arange(wmax - 1, -1, -1, dtype=np.uint64)
    )
    full = (win.astype(np.uint64) * weights).sum(axis=1, dtype=np.uint64)
    return (full >> (np.uint64(wmax) - bls.astype(np.uint64))).astype(np.int64)


def decode_gamma_sequence(buf: bytes, offset: int = 0) -> np.ndarray:
    """EliasGammaSequenceIterator mirror (GammaCodedSequence.java:202-263):
    count prefix then cumulative deltas, each value shifted by ``offset``
    (offsetIterator semantics, :84-89)."""
    if len(buf) == 0:
        return np.empty(0, dtype=np.int64)
    cur = _BitCursor(buf)
    hs, hb = cur.boundaries(1)
    n = int(_extract_values(cur.bits, hs, hb)[0]) - 1
    if n <= 0:
        return np.empty(0, dtype=np.int64)
    starts, bls = cur.boundaries(n)
    deltas = _extract_values(cur.bits, starts, bls)
    return np.cumsum(deltas) + np.int64(offset)


def gamma_value_count(buf: bytes) -> int:
    """EliasGammaSequenceIterator.readCount:224-229 (zero for an empty
    buffer, GammaCodedSequence.valueCount:141-146)."""
    if len(buf) == 0:
        return 0
    cur = _BitCursor(buf)
    hs, hb = cur.boundaries(1)
    return int(_extract_values(cur.bits, hs, hb)[0]) - 1


def encode_gamma_blob(
    values: np.ndarray, lengths: np.ndarray
) -> tuple[bytes, np.ndarray]:
    """Encode many delta streams as byte-aligned GammaCodedSequences in
    one vectorized pass — the gamma twin of ``codecs.encode_stream_blob``.

    ``values`` is the concatenation of all stream payloads (already
    delta-coded, strictly positive), ``lengths`` the per-stream payload
    length.  Returns (blob, byte_offsets): stream i occupies
    ``blob[byte_offsets[i]:byte_offsets[i+1]]`` and that slice is a
    wire-exact standalone GammaCodedSequence.
    """
    lengths = np.asarray(lengths, dtype=np.int64)
    n = len(lengths)
    if n == 0:
        return b"", np.zeros(1, dtype=np.int64)
    values = np.asarray(values, dtype=np.int64)
    if len(values) and (values <= 0).any():
        raise ValueError("gamma payloads must be strictly positive")
    tot = int(lengths.sum())
    start_pos = np.cumsum(lengths) - lengths
    hdr_idx = start_pos + np.arange(n)
    comb = np.empty(n + tot, dtype=np.int64)
    comb[hdr_idx] = lengths + 1
    mask = np.ones(n + tot, dtype=bool)
    mask[hdr_idx] = False
    comb[mask] = values
    w = 2 * _bit_length(comb) - 1
    # per-stream bit totals -> byte-aligned stream starts
    stream_bits = np.add.reduceat(w, hdr_idx)
    stream_bytes = (stream_bits + 7) // 8
    byte_offsets = np.concatenate([[0], np.cumsum(stream_bytes)]).astype(np.int64)
    cw = np.cumsum(w) - w
    base = np.repeat(cw[hdr_idx], lengths + 1)
    start_bit = np.repeat(byte_offsets[:-1] * 8, lengths + 1) + (cw - base)
    blob = _pack_codewords(comb, start_bit, int(byte_offsets[-1]))
    return blob, byte_offsets


def gamma_blob_payload(blob, cnts: np.ndarray) -> np.ndarray:
    """Decode the concatenated payload DELTAS of a blob of byte-aligned
    GammaCodedSequences (stream i holds ``cnts[i]`` values); count
    prefixes are validated against ``cnts``.  Shared by the query-side
    positions decode and the gamma->varint transcoder (which re-encodes
    the deltas verbatim)."""
    cnts = np.asarray(cnts, dtype=np.int64)
    if len(cnts) == 0:
        return np.empty(0, dtype=np.int64)
    if isinstance(blob, np.ndarray):
        blob = blob.tobytes()
    cur = _BitCursor(blob)
    k_tot = int((cnts + 1).sum())
    starts = np.empty(k_tot, dtype=np.int64)
    bls = np.empty(k_tot, dtype=np.int64)
    j = 0
    for c in cnts:
        s, b = cur.boundaries(int(c) + 1)
        starts[j : j + int(c) + 1] = s
        bls[j : j + int(c) + 1] = b
        j += int(c) + 1
        cur.align_byte()
    vals = _extract_values(cur.bits, starts, bls)
    nvals = cnts + 1
    hdr = np.cumsum(nvals) - nvals
    if not np.array_equal(vals[hdr], cnts + 1):
        raise ValueError("gamma stream count prefixes disagree with pos_cnts")
    keep = np.ones(k_tot, dtype=bool)
    keep[hdr] = False
    return vals[keep]


def flat_gamma_positions_by_counts(
    blob, cnts: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Gamma twin of ``stages.reverse.flat_positions_by_counts``: decode a
    term's concatenated per-posting GammaCodedSequences (posting i holds
    ``cnts[i]`` positions) to one flat absolute-position array plus ragged
    offsets."""
    cnts = np.asarray(cnts, dtype=np.int64)
    offsets = np.concatenate([[0], np.cumsum(cnts)]).astype(np.int64)
    if len(cnts) == 0:
        return np.empty(0, dtype=np.int64), offsets
    payload = gamma_blob_payload(blob, cnts)
    g = np.cumsum(payload)
    start = np.cumsum(cnts) - cnts
    nonempty = cnts > 0
    base = np.zeros(len(cnts), dtype=np.int64)
    base[nonempty] = g[start[nonempty]] - payload[start[nonempty]]
    abs_pos = g - np.repeat(base, cnts)
    return abs_pos, offsets
