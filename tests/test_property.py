"""Property-based tests (hypothesis) for the wire codecs and the token
admission equivalence — the randomized-fuzz discipline the reference
applies to its skiplist (SkipListFuzzTests) applied to our codecs."""

import numpy as np
from hypothesis import given, settings, strategies as st

from marginaliasearch_ray.functions import idcodec
from marginaliasearch_ray.functions.codecs import (
    decode_doc_ids,
    decode_sequence,
    decode_varints,
    encode_doc_ids,
    encode_sequence,
    encode_stream_blob,
    encode_varints,
)
from marginaliasearch_ray.functions.prio_codec import (
    decode_prio_doc_ids,
    encode_prio_doc_ids,
    encode_prio_doc_ids_fast,
)
from marginaliasearch_ray.functions.wordpattern import (
    admit_word,
    matches_word_pattern,
)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=(1 << 62) - 1), max_size=200))
def test_varint_roundtrip(vals):
    arr = np.array(vals, dtype=np.int64)
    assert decode_varints(encode_varints(arr)).astype(np.int64).tolist() == vals


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.integers(min_value=1, max_value=1 << 20), min_size=0, max_size=300
    )
)
def test_sequence_roundtrip(deltas):
    vals = np.cumsum(np.array(deltas, dtype=np.int64))
    assert decode_sequence(encode_sequence(vals)).tolist() == vals.tolist()


@settings(max_examples=200, deadline=None)
@given(
    st.sets(
        st.integers(min_value=0, max_value=(1 << 57) - 1), min_size=0, max_size=200
    )
)
def test_doc_ids_roundtrip(ids):
    arr = np.array(sorted(ids), dtype=np.int64)
    assert decode_doc_ids(encode_doc_ids(arr)).tolist() == arr.tolist()


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=1 << 30), max_size=20),
        min_size=1,
        max_size=50,
    )
)
def test_stream_blob_boundaries(streams):
    values = np.array([v for s in streams for v in s], dtype=np.int64)
    lengths = np.array([len(s) for s in streams], dtype=np.int64)
    blob, offs = encode_stream_blob(values, lengths)
    assert len(offs) == len(streams) + 1
    assert offs[0] == 0 and offs[-1] == len(blob)
    # each slice independently decodes to [len+1, payload...]
    for i, s in enumerate(streams):
        vals = decode_varints(blob[offs[i] : offs[i + 1]]).astype(np.int64)
        assert vals[0] == len(s) + 1
        assert vals[1 : 1 + len(s)].tolist() == s


@settings(max_examples=100, deadline=None)
@given(
    st.sets(
        st.tuples(
            st.integers(min_value=0, max_value=63),
            st.integers(min_value=0, max_value=(1 << 31) - 1),
            st.integers(min_value=0, max_value=(1 << 26) - 1),
        ),
        min_size=1,
        max_size=100,
    )
)
def test_prio_codec_roundtrip_and_fast_identity(tuples):
    ids = np.array(
        sorted(int(idcodec.encode_id_with_rank(r, d, o)) for r, d, o in tuples),
        dtype=np.int64,
    )
    slow = encode_prio_doc_ids(ids)
    fast = encode_prio_doc_ids_fast(ids)
    assert fast == slow
    assert decode_prio_doc_ids(fast).tolist() == ids.tolist()


@settings(max_examples=500, deadline=None)
@given(st.text(alphabet="ab1.-_/:+*@#", max_size=20))
def test_word_pattern_regex_equivalence(s):
    assert admit_word(s) == matches_word_pattern(s)
