"""Priority-index doc-id stream codec — bit-exact with the reference.

Reference:
- BitWriter: code/libraries/coded-sequence/java/nu/marginalia/sequence/io/
  BitWriter.java:49-106 — MSB-first bit packing into big-endian 64-bit
  words; putGamma = (bits-1 zeros, value in ``bits`` bits); putDelta =
  gamma(bits) + value bits.
- Encoder: code/index/java/nu/marginalia/index/reverse/construction/prio/
  PrioDocIdsTransformer.java:64-127 — header ``0b11`` + 30-bit distinct
  count + raw (rank:7, domain:31, ordinal:26) first id; then per id:
  ``0b10`` gamma(rank delta) + raw domain/ordinal on rank change,
  ``0b01`` delta(domain delta) + delta(ordinal+1) on domain change,
  ``0b00`` gamma(ordinal delta) within a domain; duplicate ids elided
  (:119-121).
- Decoder mirror: PrioIndexEntrySource.java:58-112.
"""

from __future__ import annotations

import numpy as np

from . import idcodec


class BitWriter:
    """MSB-first bit writer over big-endian 64-bit words (BitWriter.java)."""

    def __init__(self):
        self.words: list[int] = []
        self.current = 0
        self.bitpos = 0  # bits used in current word

    def put_bits(self, value: int, width: int) -> None:
        value &= (1 << width) - 1 if width < 64 else ~0
        rem = 64 - self.bitpos
        if rem < width:
            self.current = ((self.current << rem) | (value >> (width - rem))) & (
                (1 << 64) - 1
            )
            self.words.append(self.current)
            self.current = value & ((1 << (width - rem)) - 1)
            self.bitpos = width - rem
        else:
            self.current = ((self.current << width) | value) & ((1 << 64) - 1)
            self.bitpos += width

    def put_gamma(self, value: int) -> None:
        assert value > 0
        bits = value.bit_length()
        if bits > 1:
            self.put_bits(0, bits - 1)
        self.put_bits(value, bits)

    def put_delta(self, value: int) -> None:
        assert value > 0
        bits = value.bit_length()
        self.put_gamma(bits)
        self.put_bits(value, bits)

    def finish(self) -> bytes:
        words = list(self.words)
        if self.bitpos:
            words.append((self.current << (64 - self.bitpos)) & ((1 << 64) - 1))
        return b"".join(w.to_bytes(8, "big") for w in words)


class BitReader:
    def __init__(self, buf: bytes):
        n = len(buf) // 8
        self.words = [
            int.from_bytes(buf[8 * i : 8 * i + 8], "big") for i in range(n)
        ]
        self.word_idx = 0
        self.bitpos = 0

    def get_bits(self, width: int) -> int:
        out = 0
        need = width
        while need:
            avail = 64 - self.bitpos
            take = min(avail, need)
            w = self.words[self.word_idx]
            chunk = (w >> (avail - take)) & ((1 << take) - 1)
            out = (out << take) | chunk
            self.bitpos += take
            need -= take
            if self.bitpos == 64:
                self.word_idx += 1
                self.bitpos = 0
        return out

    def get_gamma(self) -> int:
        zeros = 0
        while self.get_bits(1) == 0:
            zeros += 1
        if zeros == 0:
            return 1
        rest = self.get_bits(zeros)
        return (1 << zeros) | rest

    def get_delta(self) -> int:
        bits = self.get_gamma()
        if bits == 0:
            return 0
        val = self.get_bits(bits)
        return val


def encode_prio_doc_ids(doc_ids: np.ndarray) -> bytes:
    """Sorted (rank-major) combined ids -> prio bit stream
    (PrioDocIdsTransformer.java:64-127).  Duplicates elided."""
    ids = np.asarray(doc_ids, dtype=np.int64)
    if len(ids) == 0:
        raise ValueError("Empty range")  # reference: IllegalStateException
    distinct = 1 + int(np.count_nonzero(ids[1:] != ids[:-1]))

    w = BitWriter()
    w.put_bits(3, 2)
    w.put_bits(distinct, 30)

    rank = int(idcodec.get_rank(ids[0]))
    dom = int(idcodec.get_domain_id(ids[0]))
    ordn = int(idcodec.get_ordinal(ids[0]))
    w.put_bits(rank, 7)
    w.put_bits(dom, 31)
    w.put_bits(ordn, 26)

    prev_rank, prev_dom, prev_ord = rank, dom, ordn
    for i in range(1, len(ids)):
        nid = int(ids[i])
        r = int(idcodec.get_rank(nid))
        d = int(idcodec.get_domain_id(nid))
        o = int(idcodec.get_ordinal(nid))
        if r != prev_rank:
            w.put_bits(0b10, 2)
            w.put_gamma(r - prev_rank)
            w.put_bits(d, 31)
            w.put_bits(o, 26)
        elif d != prev_dom:
            w.put_bits(0b01, 2)
            w.put_delta(d - prev_dom)
            w.put_delta(1 + o)
        elif o != prev_ord:
            w.put_bits(0b00, 2)
            w.put_gamma(o - prev_ord)
        # else: duplicate id, silently elided (:119-121)
        prev_rank, prev_dom, prev_ord = r, d, o
    return w.finish()


def decode_prio_doc_ids(buf: bytes) -> np.ndarray:
    """Mirror of PrioIndexEntrySource.java:58-112."""
    r = BitReader(buf)
    header = r.get_bits(2)
    if header != 0b11:
        raise ValueError(f"bad prio header {header:#b}")
    count = r.get_bits(30)
    rank = r.get_bits(7)
    dom = r.get_bits(31)
    ordn = r.get_bits(26)
    out = np.empty(count, dtype=np.int64)
    out[0] = int(idcodec.encode_id_with_rank(rank, dom, ordn))
    for i in range(1, count):
        op = r.get_bits(2)
        if op == 0b10:
            rank += r.get_gamma()
            dom = r.get_bits(31)
            ordn = r.get_bits(26)
        elif op == 0b01:
            dom += r.get_delta()
            ordn = r.get_delta() - 1
        elif op == 0b00:
            ordn += r.get_gamma()
        else:
            raise ValueError(f"unexpected opcode {op:#b} at entry {i}")
        out[i] = int(idcodec.encode_id_with_rank(rank, dom, ordn))
    return out
