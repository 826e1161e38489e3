"""Prio doc-id stream codec round trips (mirrors
PrioDocIdsTransformerTest: rank/domain/ordinal boundary crossings and
duplicate elision)."""

import random

import numpy as np
import pytest

from marginaliasearch_ray.functions import idcodec
from marginaliasearch_ray.functions.prio_codec import (
    BitReader,
    BitWriter,
    decode_prio_doc_ids,
    encode_prio_doc_ids,
)


def enc(rank, dom, ordn):
    return int(idcodec.encode_id_with_rank(rank, dom, ordn))


def test_bitwriter_roundtrip():
    w = BitWriter()
    w.put_bits(3, 2)
    w.put_bits(123456, 30)
    w.put_gamma(1)
    w.put_gamma(77)
    w.put_delta(1)
    w.put_delta(100000)
    w.put_bits((1 << 31) - 1, 31)
    buf = w.finish()
    r = BitReader(buf)
    assert r.get_bits(2) == 3
    assert r.get_bits(30) == 123456
    assert r.get_gamma() == 1
    assert r.get_gamma() == 77
    assert r.get_delta() == 1
    assert r.get_delta() == 100000
    assert r.get_bits(31) == (1 << 31) - 1


def test_same_domain_ordinal_deltas():
    ids = [enc(0, 5, 1), enc(0, 5, 2), enc(0, 5, 100)]
    out = decode_prio_doc_ids(encode_prio_doc_ids(np.array(ids)))
    assert out.tolist() == ids


def test_domain_and_rank_boundaries():
    ids = [
        enc(0, 1, 0),
        enc(0, 1, (1 << 26) - 1),  # max ordinal
        enc(0, 2, 0),  # new domain, ordinal 0 (delta-coded as 1+0)
        enc(0, (1 << 31) - 1, 5),  # max domain
        enc(3, 0, 0),  # rank bump resets domain/ordinal raw
        enc(63, (1 << 31) - 1, (1 << 26) - 1),  # all max
    ]
    out = decode_prio_doc_ids(encode_prio_doc_ids(np.array(ids)))
    assert out.tolist() == ids


def test_duplicate_elision():
    ids = [enc(0, 5, 1), enc(0, 5, 1), enc(0, 5, 2), enc(0, 5, 2)]
    out = decode_prio_doc_ids(encode_prio_doc_ids(np.array(ids)))
    assert out.tolist() == [enc(0, 5, 1), enc(0, 5, 2)]


def test_single_id():
    ids = [enc(7, 123, 456)]
    out = decode_prio_doc_ids(encode_prio_doc_ids(np.array(ids)))
    assert out.tolist() == ids


def test_empty_raises():
    with pytest.raises(ValueError):
        encode_prio_doc_ids(np.array([], dtype=np.int64))


def test_fast_encoder_byte_identical():
    from marginaliasearch_ray.functions.prio_codec import encode_prio_doc_ids_fast

    rng = random.Random(23)
    for trial in range(40):
        n = rng.randrange(1, 300)
        tuples = sorted(
            {
                (rng.randrange(0, 8), rng.randrange(0, 100), rng.randrange(0, 5000))
                for _ in range(n)
            }
        )
        ids = np.array([enc(*t) for t in tuples], dtype=np.int64)
        # inject duplicates sometimes
        if trial % 3 == 0:
            ids = np.sort(np.concatenate([ids, ids[:3]]))
        slow = encode_prio_doc_ids(ids)
        fast = encode_prio_doc_ids_fast(ids)
        assert fast == slow, trial
        assert decode_prio_doc_ids(fast).tolist() == sorted(
            set(int(x) for x in ids)
        )


def test_fuzz_roundtrip():
    rng = random.Random(13)
    for _ in range(30):
        n = rng.randrange(1, 200)
        tuples = sorted(
            {
                (rng.randrange(0, 4), rng.randrange(0, 50), rng.randrange(0, 1000))
                for _ in range(n)
            }
        )
        ids = [enc(*t) for t in tuples]
        out = decode_prio_doc_ids(encode_prio_doc_ids(np.array(ids)))
        assert out.tolist() == ids


def test_multi_encoder_byte_identity():
    """encode_prio_doc_ids_multi packs many terms in one scatter pass and
    must match the per-term encoder byte for byte."""
    from marginaliasearch_ray.functions.prio_codec import (
        encode_prio_doc_ids_multi,
    )

    rng = random.Random(29)
    for trial in range(20):
        runs = []
        for _ in range(rng.randrange(1, 30)):
            n = rng.randrange(1, 40)
            tuples = sorted(
                {
                    (
                        rng.randrange(0, 8),
                        rng.randrange(0, 200),
                        rng.randrange(0, 5000),
                    )
                    for _ in range(n)
                }
            )
            runs.append(np.array([enc(*t) for t in tuples], dtype=np.int64))
        flat = np.concatenate(runs)
        bounds = np.concatenate([[0], np.cumsum([len(r) for r in runs])])
        multi = encode_prio_doc_ids_multi(flat, bounds)
        assert len(multi) == len(runs)
        for blob, ids in zip(multi, runs):
            assert blob == encode_prio_doc_ids(ids), trial
            assert decode_prio_doc_ids(blob).tolist() == ids.tolist()


def test_multi_encoder_empty_run_rejected():
    from marginaliasearch_ray.functions.prio_codec import (
        encode_prio_doc_ids_multi,
    )

    assert encode_prio_doc_ids_multi(np.array([], dtype=np.int64), np.array([0])) == []
    import pytest

    with pytest.raises(ValueError):
        encode_prio_doc_ids_multi(
            np.array([enc(0, 1, 2)], dtype=np.int64), np.array([0, 1, 1])
        )
