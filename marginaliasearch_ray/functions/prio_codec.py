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


def _bit_length(v: np.ndarray) -> np.ndarray:
    """Vectorized bit_length for positive int64 values."""
    out = np.zeros(len(v), dtype=np.int64)
    x = v.astype(np.uint64).copy()
    while (x > 0).any():
        out += (x > 0).astype(np.int64)
        x >>= np.uint64(1)
    return out


def encode_prio_doc_ids_fast(doc_ids: np.ndarray) -> bytes:
    """Vectorized encoder producing byte-identical output to
    ``encode_prio_doc_ids``.

    Each id emits at most three (value, width) bit fields (gamma(v) is a
    single field: bit_length(v)-1 leading zeros then v — i.e. v written
    in 2*bit_length(v)-1 bits; delta(v) is gamma(bits) + v in bits).
    The field stream is bit-packed with vectorized word scatter."""
    ids = np.asarray(doc_ids, dtype=np.int64)
    if len(ids) == 0:
        raise ValueError("Empty range")
    keep = np.ones(len(ids), dtype=bool)
    keep[1:] = ids[1:] != ids[:-1]
    ids = ids[keep]
    n = len(ids)

    rank = ((ids >> 57) & 0x3F).astype(np.int64)
    dom = ((ids >> 26) & 0x7FFF_FFFF).astype(np.int64)
    ordn = (ids & 0x03FF_FFFF).astype(np.int64)

    # fields: 5 header fields + up to 4 fields per subsequent id
    vals_list = [
        np.array([3, n, rank[0], dom[0], ordn[0]], dtype=np.int64)
    ]
    widths_list = [np.array([2, 30, 7, 31, 26], dtype=np.int64)]

    if n > 1:
        r, d, o = rank[1:], dom[1:], ordn[1:]
        pr, pd, po = rank[:-1], dom[:-1], ordn[:-1]
        m = n - 1
        case_a = r != pr
        case_b = (~case_a) & (d != pd)
        case_c = (~case_a) & (~case_b)
        rd = np.where(case_a, r - pr, 1)
        bl = _bit_length(rd)
        dd = np.where(case_b, d - pd, 1)
        od1 = np.where(case_b, 1 + o, 1)
        bl_dd = _bit_length(dd)
        bl_od = _bit_length(od1)

        V6 = np.zeros((m, 6), dtype=np.int64)
        W6 = np.zeros((m, 6), dtype=np.int64)
        V6[:, 0] = np.where(case_a, 0b10, np.where(case_b, 0b01, 0b00))
        W6[:, 0] = 2
        # case A fields
        V6[case_a, 1] = rd[case_a]
        W6[case_a, 1] = (2 * bl - 1)[case_a]
        V6[case_a, 2] = d[case_a]
        W6[case_a, 2] = 31
        V6[case_a, 3] = o[case_a]
        W6[case_a, 3] = 26
        # case B fields: gamma(bl_dd), dd(bl_dd bits), gamma(bl_od), od1
        V6[case_b, 1] = bl_dd[case_b]
        W6[case_b, 1] = (2 * _bit_length(bl_dd) - 1)[case_b]
        V6[case_b, 2] = dd[case_b]
        W6[case_b, 2] = bl_dd[case_b]
        V6[case_b, 3] = bl_od[case_b]
        W6[case_b, 3] = (2 * _bit_length(bl_od) - 1)[case_b]
        V6[case_b, 4] = od1[case_b]
        W6[case_b, 4] = bl_od[case_b]
        # case C: gamma(ord delta); encoder skips ord==prev (handled by
        # dedup above, so delta > 0 always)
        odd = np.where(case_c, o - po, 1)
        bl_c = _bit_length(odd)
        V6[case_c, 1] = odd[case_c]
        W6[case_c, 1] = (2 * bl_c - 1)[case_c]

        flat_v = V6.reshape(-1)
        flat_w = W6.reshape(-1)
        used = flat_w > 0
        vals_list.append(flat_v[used])
        widths_list.append(flat_w[used])

    vals = np.concatenate(vals_list).astype(np.uint64)
    widths = np.concatenate(widths_list).astype(np.int64)

    # bit-pack MSB-first into big-endian 64-bit words
    ends = np.cumsum(widths)
    starts = ends - widths
    total_bits = int(ends[-1])
    n_words = (total_bits + 63) // 64
    words = np.zeros(n_words, dtype=np.uint64)

    wi = starts // 64
    bit_in = starts % 64
    fits = bit_in + widths <= 64
    # same-word part
    shift = (64 - bit_in - widths).astype(np.int64)
    np.bitwise_or.at(
        words, wi[fits], (vals[fits] << shift[fits].astype(np.uint64))
    )
    # split across two words
    sp = ~fits
    if sp.any():
        left_bits = 64 - bit_in[sp]
        right_bits = widths[sp] - left_bits
        np.bitwise_or.at(
            words, wi[sp], vals[sp] >> right_bits.astype(np.uint64)
        )
        mask = (np.uint64(1) << right_bits.astype(np.uint64)) - np.uint64(1)
        np.bitwise_or.at(
            words,
            wi[sp] + 1,
            (vals[sp] & mask) << (np.uint64(64) - right_bits.astype(np.uint64)),
        )
    return words.byteswap().tobytes()


def encode_prio_doc_ids_multi(
    ids: np.ndarray, bounds: np.ndarray
) -> list[bytes]:
    """Encode MANY terms' posting lists in one vectorized pass.

    ``ids`` is the concatenation of every term's sorted, de-duplicated
    combined ids; ``bounds`` (len T+1) marks the term boundaries.  Output
    is byte-identical to ``encode_prio_doc_ids`` applied per slice — the
    field streams of all terms are packed into one 64-bit-word scatter
    (each term starting on a fresh word), then sliced per term.  This
    removes the per-term Python call the merge stage otherwise pays for
    vocabularies of short posting lists."""
    ids = np.asarray(ids, dtype=np.int64)
    bounds = np.asarray(bounds, dtype=np.int64)
    T = len(bounds) - 1
    N = len(ids)
    if T == 0:
        return []
    if np.any(np.diff(bounds) <= 0):
        raise ValueError("Empty range")  # reference: IllegalStateException
    run_len = np.diff(bounds)
    elem_term = np.repeat(np.arange(T, dtype=np.int64), run_len)
    starts = np.zeros(N, dtype=bool)
    starts[bounds[:-1]] = True

    rank = ((ids >> 57) & 0x3F).astype(np.int64)
    dom = ((ids >> 26) & 0x7FFF_FFFF).astype(np.int64)
    ordn = (ids & 0x03FF_FFFF).astype(np.int64)
    pr = np.empty(N, dtype=np.int64)
    pd_ = np.empty(N, dtype=np.int64)
    po = np.empty(N, dtype=np.int64)
    pr[0] = pd_[0] = po[0] = 0
    pr[1:], pd_[1:], po[1:] = rank[:-1], dom[:-1], ordn[:-1]

    # per-id field matrix: run starts use 5 header fields, others up to
    # 5 opcode+payload fields (same layout as encode_prio_doc_ids_fast)
    V = np.zeros((N, 6), dtype=np.int64)
    W = np.zeros((N, 6), dtype=np.int64)
    V[starts, 0] = 3
    W[starts, 0] = 2
    V[bounds[:-1], 1] = run_len
    W[starts, 1] = 30
    V[starts, 2] = rank[starts]
    W[starts, 2] = 7
    V[starts, 3] = dom[starts]
    W[starts, 3] = 31
    V[starts, 4] = ordn[starts]
    W[starts, 4] = 26

    ns = ~starts
    if ns.any():
        case_a = ns & (rank != pr)
        case_b = ns & (rank == pr) & (dom != pd_)
        case_c = ns & (rank == pr) & (dom == pd_)
        V[ns, 0] = np.where(case_a, 0b10, np.where(case_b, 0b01, 0b00))[ns]
        W[ns, 0] = 2
        rd = np.where(case_a, rank - pr, 1)
        bl = _bit_length(rd)
        V[case_a, 1] = rd[case_a]
        W[case_a, 1] = (2 * bl - 1)[case_a]
        V[case_a, 2] = dom[case_a]
        W[case_a, 2] = 31
        V[case_a, 3] = ordn[case_a]
        W[case_a, 3] = 26
        dd = np.where(case_b, dom - pd_, 1)
        od1 = np.where(case_b, 1 + ordn, 1)
        bl_dd = _bit_length(dd)
        bl_od = _bit_length(od1)
        V[case_b, 1] = bl_dd[case_b]
        W[case_b, 1] = (2 * _bit_length(bl_dd) - 1)[case_b]
        V[case_b, 2] = dd[case_b]
        W[case_b, 2] = bl_dd[case_b]
        V[case_b, 3] = bl_od[case_b]
        W[case_b, 3] = (2 * _bit_length(bl_od) - 1)[case_b]
        V[case_b, 4] = od1[case_b]
        W[case_b, 4] = bl_od[case_b]
        odd = np.where(case_c, ordn - po, 1)
        bl_c = _bit_length(odd)
        V[case_c, 1] = odd[case_c]
        W[case_c, 1] = (2 * bl_c - 1)[case_c]

    flat_v = V.reshape(-1)
    flat_w = W.reshape(-1)
    used = flat_w > 0
    fv = flat_v[used].astype(np.uint64)
    fw = flat_w[used].astype(np.int64)
    fterm = np.repeat(elem_term, 6)[used]

    # per-term bit totals -> word-aligned per-term offsets
    tbits = np.bincount(fterm, weights=fw, minlength=T).astype(np.int64)
    twords = (tbits + 63) // 64
    word_off = np.concatenate([[0], np.cumsum(twords)])
    term_bit_base = np.concatenate([[0], np.cumsum(tbits)])[:-1]
    ends = np.cumsum(fw)
    gstart = (ends - fw) - term_bit_base[fterm] + word_off[:-1][fterm] * 64

    words = np.zeros(int(word_off[-1]), dtype=np.uint64)
    wi = gstart // 64
    bit_in = gstart % 64
    fits = bit_in + fw <= 64
    shift = (64 - bit_in - fw).astype(np.int64)
    np.bitwise_or.at(words, wi[fits], fv[fits] << shift[fits].astype(np.uint64))
    sp = ~fits
    if sp.any():
        left_bits = 64 - bit_in[sp]
        right_bits = fw[sp] - left_bits
        np.bitwise_or.at(words, wi[sp], fv[sp] >> right_bits.astype(np.uint64))
        mask = (np.uint64(1) << right_bits.astype(np.uint64)) - np.uint64(1)
        np.bitwise_or.at(
            words,
            wi[sp] + 1,
            (fv[sp] & mask) << (np.uint64(64) - right_bits.astype(np.uint64)),
        )
    wb = words.byteswap()
    return [
        wb[word_off[k] : word_off[k + 1]].tobytes() for k in range(T)
    ]


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
