"""Elias-gamma legacy positions codec + segment transcoding.

Wire-exactness is pinned three ways: hand-computed bit vectors, the
reference's own test vectors (coded-sequence/test/.../
EliasGammaSequenceIteratorTest.java:18-100 — testCodec / testCodecEmpty /
valueCount / testCodec2 / fuzzTestCodec), and a cross-check against the
independently-written prio_codec.BitWriter (same BitWriter.java wire).
End-to-end: a segment transcoded to gamma serves position-dependent
queries result-identically, transcodes back value-identically, and
still passes the fsck.
"""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from marginaliasearch_ray.functions.codecs import encode_stream_blob
from marginaliasearch_ray.functions.gamma_seq import (
    decode_gamma_sequence,
    encode_gamma_blob,
    encode_gamma_sequence,
    flat_gamma_positions_by_counts,
    gamma_blob_payload,
    gamma_value_count,
)
from marginaliasearch_ray.functions.prio_codec import BitWriter
from marginaliasearch_ray.stages.reverse import flat_positions_by_counts


def _arr(vals):
    return np.asarray(vals, dtype=np.int64)


# ---------------------------------------------------------------- unit


def test_reference_vector_codec():
    """EliasGammaSequenceIteratorTest.testCodec: [1,3,5,16,32,64]."""
    b = encode_gamma_sequence(_arr([1, 3, 5, 16, 32, 64]))
    assert decode_gamma_sequence(b).tolist() == [1, 3, 5, 16, 32, 64]
    assert gamma_value_count(b) == 6


def test_reference_vector_empty():
    """testCodecEmpty + valueCount: empty sequence is gamma(1) = one set
    bit = the byte 0x80."""
    b = encode_gamma_sequence(_arr([]))
    assert b == b"\x80"
    assert decode_gamma_sequence(b).tolist() == []
    assert gamma_value_count(b) == 0
    assert decode_gamma_sequence(b"").tolist() == []
    assert gamma_value_count(b"") == 0


def test_reference_vector_256():
    """testCodec2: [1, 256] (a >8-bit delta crossing a byte boundary)."""
    b = encode_gamma_sequence(_arr([1, 256]))
    assert decode_gamma_sequence(b).tolist() == [1, 256]


def test_reference_fuzz_pairs():
    """fuzzTestCodec: 1000 random [1, 1+rand(1,511)] pairs."""
    rng = np.random.default_rng(7)
    for _ in range(1000):
        seq = [1, 1 + int(rng.integers(1, 512))]
        b = encode_gamma_sequence(_arr(seq))
        assert decode_gamma_sequence(b).tolist() == seq


def test_hand_computed_bits():
    """Wire bytes computed by hand from the gamma definition: values
    [1,3,5,16,32,64] -> codewords 7,1,2,2,11,16,32 -> the exact 5-byte
    MSB-first stream."""
    bits = (
        "00111"  # gamma(7): count+1
        "1"  # gamma(1)
        "010"  # gamma(2)
        "010"  # gamma(2)
        "0001011"  # gamma(11)
        "000010000"  # gamma(16)
        "00000100000"  # gamma(32)
    )
    padded = bits.ljust((len(bits) + 7) // 8 * 8, "0")
    manual = bytes(int(padded[i : i + 8], 2) for i in range(0, len(padded), 8))
    assert encode_gamma_sequence(_arr([1, 3, 5, 16, 32, 64])) == manual


def test_offset_iterator_semantics():
    """offsetIterator (GammaCodedSequence.java:84-89): constant shift."""
    b = encode_gamma_sequence(_arr([2, 9, 40]))
    assert decode_gamma_sequence(b, offset=5).tolist() == [7, 14, 45]
    assert decode_gamma_sequence(b, offset=-1).tolist() == [1, 8, 39]


def test_cross_check_against_prio_bitwriter():
    """The independently-written prio-codec BitWriter shares the wire
    format: emitting the same gamma codewords must produce the same bit
    stream (BitWriter pads to whole 64-bit words; the sequence codec
    trims to meaningful bytes)."""
    rng = np.random.default_rng(11)
    for _ in range(50):
        n = int(rng.integers(0, 20))
        vals = np.cumsum(rng.integers(1, 1000, size=n)).astype(np.int64)
        b = encode_gamma_sequence(vals)
        w = BitWriter()
        w.put_gamma(n + 1)
        prev = 0
        for v in vals.tolist():
            w.put_gamma(v - prev)
            prev = v
        padded = w.finish()
        assert padded[: len(b)] == b
        assert all(x == 0 for x in padded[len(b) :])


def test_truncated_stream_raises():
    b = encode_gamma_sequence(_arr([1, 3, 5, 10**7]))
    with pytest.raises(ValueError, match="truncated"):
        decode_gamma_sequence(b[:-2])


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=1, max_value=2**31 - 1), min_size=0, max_size=60)
)
def test_roundtrip_property(deltas):
    vals = np.cumsum(np.asarray(deltas, dtype=np.int64))
    b = encode_gamma_sequence(vals)
    assert decode_gamma_sequence(b).tolist() == vals.tolist()
    assert gamma_value_count(b) == len(vals)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(min_value=1, max_value=10**6), min_size=0, max_size=12),
        min_size=0,
        max_size=20,
    )
)
def test_blob_slices_are_standalone_sequences(streams):
    """encode_gamma_blob stream i's byte slice must BE the standalone
    GammaCodedSequence of that stream's cumulative values, and the flat
    decode must agree with the varint twin on the same payload."""
    lens = _arr([len(s) for s in streams])
    payload = _arr([d for s in streams for d in s])
    blob, bo = encode_gamma_blob(payload, lens)
    for i, s in enumerate(streams):
        assert blob[bo[i] : bo[i + 1]] == encode_gamma_sequence(
            np.cumsum(_arr(s))
        )
    assert gamma_blob_payload(blob, lens).tolist() == payload.tolist()
    flat_g, offs_g = flat_gamma_positions_by_counts(blob, lens)
    vblob, _ = encode_stream_blob(payload, lens)
    flat_v, offs_v = flat_positions_by_counts(vblob, lens)
    assert flat_g.tolist() == flat_v.tolist()
    assert offs_g.tolist() == offs_v.tolist()


def test_count_prefix_validation():
    """Wrong per-posting counts must fail loudly, not mis-decode — either
    the count-prefix check or the truncation guard fires depending on
    where the misaligned walk falls off."""
    blob, _ = encode_gamma_blob(_arr([1, 2, 3]), _arr([2, 1]))
    with pytest.raises(ValueError, match="count prefixes|truncated"):
        flat_gamma_positions_by_counts(blob, _arr([1, 2]))
    with pytest.raises(ValueError, match="count prefixes|truncated"):
        flat_gamma_positions_by_counts(blob, _arr([3, 0]))


# ---------------------------------------------------- segment transcode


@pytest.fixture(scope="module")
def varint_index(ray_session, tmp_path_factory):
    import ray.data

    from marginaliasearch_ray.pipelines.build_index import (
        BuildConfig,
        build_index,
    )
    from marginaliasearch_ray.sources.corpus import synthesize_corpus

    corpus = synthesize_corpus(n_repos=8, files_per_repo=40, seed=9)
    out = str(tmp_path_factory.mktemp("gseg") / "base")
    build_index(
        ray.data.from_arrow(corpus),
        out,
        BuildConfig(num_parts=2, num_buckets=8, posting_block=16),
    )
    return out


@pytest.fixture(scope="module")
def gamma_index(varint_index, tmp_path_factory):
    from marginaliasearch_ray.pipelines.transcode import transcode_positions

    out = str(tmp_path_factory.mktemp("gseg2") / "gamma")
    return transcode_positions(varint_index, out, codec="gamma")


POSITION_QUERIES = [
    ('"license import"', {}),
    ("license import", {}),
    ("import copyright", {"explain": True}),
    ("license (import | return)", {}),
]


def test_gamma_segment_serves_identically(varint_index, gamma_index):
    """Position-dependent scoring (phrase, proximity, verbatim,
    first-position via explain) over the gamma segment must be
    result-identical to the varint original."""
    from marginaliasearch_ray.pipelines.query import IndexSearch

    a = IndexSearch(varint_index, use_actors=False)
    b = IndexSearch(gamma_index, use_actors=False)
    assert all(s.seg.pos_codec == "varint" for s in a.searchers)
    assert all(s.seg.pos_codec == "gamma" for s in b.searchers)
    for q, kw in POSITION_QUERIES:
        ra = a.search(q, k=10, **kw)
        rb = b.search(q, k=10, **kw)
        assert ra.equals(rb), f"gamma segment diverged for {q!r}"
        assert len(ra) > 0, f"vacuous comparison for {q!r}"
    # positions_mask is the finest-grained positions consumer
    ma = a.search("license import", k=5, positions_mask=True)
    mb = b.search("license import", k=5, positions_mask=True)
    assert ma.equals(mb)


def test_transcode_roundtrip_value_identical(
    varint_index, gamma_index, tmp_path_factory
):
    """gamma -> varint restores postings tables value-identically
    (modulo row order, which serving sorts by term_id anyway)."""
    import os

    from marginaliasearch_ray.pipelines.transcode import (
        positions_codec,
        transcode_positions,
    )

    back = str(tmp_path_factory.mktemp("gseg3") / "back")
    transcode_positions(gamma_index, back, codec="varint")
    assert positions_codec(back) == "varint"
    cols = ["term_id", "df", "docs", "tfs", "metas", "positions", "pos_cnts"]
    for part in (0, 1):
        o = pq.read_table(
            os.path.join(varint_index, "postings", f"part={part}"), columns=cols
        ).sort_by("term_id")
        n = pq.read_table(
            os.path.join(back, "postings", f"part={part}"), columns=cols
        ).sort_by("term_id")
        assert o.equals(n), f"part {part} diverged after round-trip"


def test_transcoded_segment_passes_fsck(gamma_index):
    from marginaliasearch_ray.state.verify import verify_segment

    res = verify_segment(gamma_index)
    assert res["ok"], res["problems"]


def test_blob_merge_guard_on_gamma(gamma_index, varint_index, tmp_path_factory):
    from marginaliasearch_ray.pipelines.delta import compact_segments

    out = str(tmp_path_factory.mktemp("gseg4") / "cmp")
    with pytest.raises(ValueError, match="varint positions"):
        compact_segments([gamma_index], out, blob_merge=True)


def test_transcode_same_codec_rejected(varint_index, tmp_path_factory):
    from marginaliasearch_ray.pipelines.transcode import transcode_positions

    out = str(tmp_path_factory.mktemp("gseg5") / "x")
    with pytest.raises(ValueError, match="already stores"):
        transcode_positions(varint_index, out, codec="varint")
