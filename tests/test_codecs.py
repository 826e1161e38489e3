import random

import numpy as np
import pytest

from marginaliasearch_ray.functions.codecs import (
    decode_counts,
    decode_doc_ids,
    decode_many_sequences,
    decode_sequence,
    decode_varints,
    encode_counts,
    encode_doc_ids,
    encode_sequence,
    encode_varints,
)


def naive_varint(value: int) -> bytes:
    """Literal transcription of VarintCodedSequence.encodeValue:110-130
    (big-endian 7-bit groups, continuation on leading bytes)."""
    if value < (1 << 7):
        return bytes([value])
    if value < (1 << 14):
        return bytes([(value >> 7) | 0x80, value & 0x7F])
    if value < (1 << 21):
        return bytes([(value >> 14) | 0x80, ((value >> 7) & 0x7F) | 0x80, value & 0x7F])
    if value < (1 << 28):
        return bytes(
            [
                (value >> 21) | 0x80,
                ((value >> 14) & 0x7F) | 0x80,
                ((value >> 7) & 0x7F) | 0x80,
                value & 0x7F,
            ]
        )
    raise ValueError


def test_wire_format_matches_reference_encoder():
    rng = random.Random(3)
    vals = [0, 1, 127, 128, 129, 16383, 16384, (1 << 21) - 1, 1 << 21, (1 << 28) - 1]
    vals += [rng.randrange(0, 1 << 28) for _ in range(200)]
    got = encode_varints(np.array(vals, dtype=np.int64))
    want = b"".join(naive_varint(v) for v in vals)
    assert got == want


def test_sequence_format_matches_reference_generate():
    # VarintCodedSequence.generate: stream = varint(count+1) + varint deltas
    vals = [1, 3, 5, 1000]
    got = encode_sequence(np.array(vals))
    deltas = [1, 2, 2, 995]
    want = naive_varint(len(vals) + 1) + b"".join(naive_varint(d) for d in deltas)
    assert got == want
    assert decode_sequence(got).tolist() == vals


def test_sequence_rejects_non_increasing():
    with pytest.raises(ValueError):
        encode_sequence(np.array([1, 1]))
    with pytest.raises(ValueError):
        encode_sequence(np.array([0, 1]))  # positions are 1-based, > 0


def test_varint_roundtrip_64bit():
    rng = random.Random(5)
    vals = [rng.randrange(0, 1 << 62) for _ in range(500)] + [0, 1, (1 << 62) - 1]
    arr = np.array(vals, dtype=np.int64)
    assert decode_varints(encode_varints(arr)).astype(np.int64).tolist() == vals


def test_doc_ids_roundtrip_including_zero():
    ids = np.array([0, 1, 2, 1 << 40, (1 << 40) + 5], dtype=np.int64)
    assert decode_doc_ids(encode_doc_ids(ids)).tolist() == ids.tolist()
    assert decode_doc_ids(encode_doc_ids(np.array([], dtype=np.int64))).tolist() == []


def test_counts_roundtrip():
    c = np.array([1, 512, 3, 1], dtype=np.int64)
    assert decode_counts(encode_counts(c)).tolist() == c.tolist()


def test_decode_many_sequences():
    seqs = [np.array([1, 3, 5]), np.array([2]), np.array([], dtype=np.int64), np.array([7, 8])]
    bufs = [encode_sequence(s) for s in seqs]
    out = decode_many_sequences(bufs)
    for got, want in zip(out, seqs):
        assert got.tolist() == want.tolist()


def test_fuzz_roundtrip_sequences():
    rng = random.Random(11)
    for _ in range(100):
        n = rng.randrange(0, 512)
        vals = np.cumsum(np.array([rng.randrange(1, 1000) for _ in range(n)], dtype=np.int64))
        assert decode_sequence(encode_sequence(vals)).tolist() == vals.tolist()
