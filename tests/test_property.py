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


# --- randomized fuzz of the nested-tree evaluator vs brute force -----------

from marginaliasearch_ray.functions import bm25 as _bm25


class _FuzzSeg:
    def __init__(self, postings):
        # postings: {term_id: {doc_id: tf}}
        self._p = {}
        for t, m in postings.items():
            ids = np.array(sorted(m), dtype=np.int64)
            tfs = np.array([m[d] for d in sorted(m)], dtype=np.int64)
            self._p[t] = (ids, tfs)

    def postings(self, t):
        return self._p.get(
            t, (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
        )


def _brute_bool(tree, doc_terms):
    kind = tree[0]
    if kind == "word":
        return tree[1] in doc_terms
    parts = [_brute_bool(p, doc_terms) for p in tree[1]]
    if not parts:
        return False
    return all(parts) if kind == "and" else any(parts)


def _brute_score(tree, doc_tf, n_docs, df, size):
    kind = tree[0]
    if kind == "word":
        t = tree[1]
        if t not in doc_tf:
            return 0.0
        return float(
            _bm25.bm25_term_score(
                n_docs, df.get(t, 0), np.array([float(doc_tf[t])]),
                np.array([float(size)]),
            )[0]
        )
    parts = [_brute_score(p, doc_tf, n_docs, df, size) for p in tree[1]]
    if not parts:
        return 0.0
    return sum(parts) if kind == "and" else max(parts)


@settings(max_examples=80, deadline=None)
@given(st.data())
def test_tree_eval_fuzz(data):
    from marginaliasearch_ray.pipelines import query as qmod

    V = data.draw(st.integers(min_value=3, max_value=6))
    N = data.draw(st.integers(min_value=1, max_value=25))
    docs = {}
    for d in range(N):
        terms = data.draw(
            st.sets(st.integers(1, V), min_size=0, max_size=V), label=f"doc{d}"
        )
        docs[d] = {
            t: data.draw(st.integers(1, 5), label=f"tf{d}_{t}") for t in terms
        }

    def gen_tree(depth):
        if depth == 0 or data.draw(st.booleans()):
            return ("word", data.draw(st.integers(1, V)))
        kind = data.draw(st.sampled_from(["and", "or"]))
        n = data.draw(st.integers(1, 3))
        return (kind, [gen_tree(depth - 1) for _ in range(n)])

    tree = gen_tree(2)

    postings = {}
    for d, tf in docs.items():
        for t, c in tf.items():
            postings.setdefault(t, {})[d] = c
    seg = _FuzzSeg(postings)
    df = {t: len(m) for t, m in postings.items()}
    sizes_of = {d: max(1, sum(tf.values())) for d, tf in docs.items()}

    got_docs = qmod._tree_docs(seg, tree).tolist()
    want_docs = sorted(d for d in docs if _brute_bool(tree, set(docs[d])))
    assert got_docs == want_docs

    if want_docs:
        cand = np.array(want_docs, dtype=np.int64)
        sizes = np.array([float(sizes_of[d]) for d in want_docs])
        got = qmod._tree_score(seg, tree, cand, sizes, df, N)
        want = [
            _brute_score(tree, docs[d], N, df, sizes_of[d]) for d in want_docs
        ]
        assert np.allclose(got, want)


@settings(max_examples=80, deadline=None)
@given(st.data())
def test_min_distance_k_fuzz(data):
    import itertools

    from marginaliasearch_ray.pipelines import query as qmod

    k = data.draw(st.integers(min_value=2, max_value=4))
    n_cand = data.draw(st.integers(min_value=1, max_value=6))
    term_lists = []
    for j in range(k):
        per_cand = []
        for c in range(n_cand):
            per_cand.append(
                sorted(
                    data.draw(
                        st.sets(
                            st.integers(1, 40), min_size=1, max_size=5
                        ),
                        label=f"pos{j}_{c}",
                    )
                )
            )
        term_lists.append(per_cand)

    term_pos, rows = [], []
    for j in range(k):
        flat = np.concatenate(
            [np.asarray(p, dtype=np.int64) for p in term_lists[j]]
        )
        offs = np.concatenate(
            [[0], np.cumsum([len(p) for p in term_lists[j]])]
        ).astype(np.int64)
        term_pos.append((flat, offs))
        rows.append(np.arange(n_cand, dtype=np.int64))
    sel = np.arange(n_cand, dtype=np.int64)
    got = qmod._min_distance_k(term_pos, rows, sel, n_cand)

    for c in range(n_cand):
        best = 1 << 40
        for combo in itertools.product(
            *[[p - j for p in term_lists[j][c]] for j in range(k)]
        ):
            best = min(best, max(combo) - min(combo))
        assert got[c] == best, (c, got[c], best)
