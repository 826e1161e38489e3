"""Nested compiled query trees — mirrors the reference's
CompiledQueryParserTest (code/functions/search-query/api/test/nu/marginalia/
api/searchquery/model/compiled/CompiledQueryParserTest.java) plus the
intMaxSum aggregate shape over the tree."""

import numpy as np
import pytest

from marginaliasearch_ray.pipelines.query import (
    _flatten_tree,
    compile_query,
    parse_cq_tree,
    tree_map_words,
    tree_words,
)


def w(x):
    return ("word", x)


def And(*parts):
    return ("and", list(parts))


def Or(*parts):
    return ("or", list(parts))


EMPTY = ("or", [])


class TestParserShapes:
    def test_empty(self):
        assert parse_cq_tree("") == EMPTY
        assert parse_cq_tree("( )") == EMPTY
        assert parse_cq_tree("( | )") == EMPTY
        assert parse_cq_tree("| ( | ) |") == EMPTY

    def test_single_word(self):
        assert parse_cq_tree("foo") == w("foo")

    def test_and_two_words(self):
        assert parse_cq_tree("foo bar") == And(w("foo"), w("bar"))

    def test_or_two_words(self):
        assert parse_cq_tree("foo | bar") == Or(w("foo"), w("bar"))

    def test_or_and_words(self):
        assert parse_cq_tree("foo | bar baz") == Or(
            w("foo"), And(w("bar"), w("baz"))
        )

    def test_and_and_or_and_and_words(self):
        assert parse_cq_tree("foo foobar | bar baz") == Or(
            And(w("foo"), w("foobar")), And(w("bar"), w("baz"))
        )

    def test_complex1(self):
        assert parse_cq_tree("foo ( bar | baz ) quux") == And(
            w("foo"), Or(w("bar"), w("baz")), w("quux")
        )

    def test_complex2(self):
        assert parse_cq_tree("( ( ( a ) b ) c ) d") == And(
            And(And(w("a"), w("b")), w("c")), w("d")
        )

    def test_nested_collapse(self):
        assert parse_cq_tree("( ( ( a ) ) )") == w("a")

    def test_unpadded_parens(self):
        assert parse_cq_tree("a (b | c)") == And(w("a"), Or(w("b"), w("c")))

    def test_mismatched_raises(self):
        with pytest.raises(ValueError):
            parse_cq_tree("( a")
        with pytest.raises(ValueError):
            parse_cq_tree("a )")


class TestFlatten:
    def test_flat_and(self):
        inc, grps = _flatten_tree(parse_cq_tree("a b c"))
        assert inc == ["a", "b", "c"] and grps == []

    def test_single_group(self):
        inc, grps = _flatten_tree(parse_cq_tree("a ( b | c )"))
        assert inc == ["a"] and grps == [["b", "c"]]

    def test_nested_not_flat(self):
        assert _flatten_tree(parse_cq_tree("a ( b | c d )")) is None
        assert _flatten_tree(parse_cq_tree("a b | c")) is None


class TestCompileIntegration:
    def test_flat_group_still_classic(self):
        cq = compile_query("customer (merge | sort)")
        assert cq.tree is None
        assert cq.include == ["customer"]
        assert cq.groups == [["merge", "sort"]]

    def test_nested_goes_tree(self):
        cq = compile_query("customer ( merge | sort ( table | scan ) )")
        assert cq.tree is not None
        assert sorted(set(tree_words(cq.tree))) == [
            "customer", "merge", "scan", "sort", "table",
        ]

    def test_tree_ids_maps_words(self):
        cq = compile_query("a b | c")
        ids = cq.tree_ids()
        assert ids is not None
        id_words = tree_words(ids)
        assert all(isinstance(x, int) for x in id_words)


def _max_sum(node, val):
    """intMaxSum reference shape: sum over AND, max over OR."""
    if node[0] == "word":
        return val(node[1])
    parts = [_max_sum(p, val) for p in node[1]]
    if not parts:
        return 0.0
    return sum(parts) if node[0] == "and" else max(parts)


def test_tree_score_matches_pure_aggregate():
    """_tree_score over a 1-candidate segment == the scalar aggregate."""
    from marginaliasearch_ray.pipelines import query as qmod

    tree = tree_map_words(
        parse_cq_tree("a ( b | c d )"), {"a": 1, "b": 2, "c": 3, "d": 4}.get
    )

    class FakeSeg:
        def postings(self, t):
            # doc 7 contains terms 1,3,4 (a, c, d) with tf = t
            if t in (1, 3, 4):
                return (
                    np.array([7], dtype=np.int64),
                    np.array([t], dtype=np.int64),
                )
            return (
                np.empty(0, dtype=np.int64),
                np.empty(0, dtype=np.int64),
            )

    cand = np.array([7], dtype=np.int64)
    sizes = np.array([100.0])
    gdf = {1: 5, 2: 5, 3: 5, 4: 5}
    got = qmod._tree_score(FakeSeg(), tree, cand, sizes, gdf, 100)

    from marginaliasearch_ray.functions.bm25 import bm25_term_score

    def val(t):
        if t in (1, 3, 4):
            return float(
                bm25_term_score(100, 5, np.array([float(t)]), sizes)[0]
            )
        return 0.0

    want = _max_sum(tree, val)
    assert np.isclose(got[0], want)

    docs = qmod._tree_docs(FakeSeg(), tree)
    assert docs.tolist() == [7]  # a present AND (b OR (c AND d))


def test_min_distance_k_negative_offsets():
    """A term occurring at a position <= its term index must not bleed
    into the previous candidate's key band (regression: offset bias)."""
    import itertools

    from marginaliasearch_ray.pipelines import query as qmod

    term_lists = [
        [[1], [2]],
        [[100], [3]],
        [[200], [1]],  # candidate 1 holds term 2 at position 1
    ]
    term_pos, rows = [], []
    for j, per_cand in enumerate(term_lists):
        flat = np.concatenate([np.asarray(p, dtype=np.int64) for p in per_cand])
        offs = np.concatenate(
            [[0], np.cumsum([len(p) for p in per_cand])]
        ).astype(np.int64)
        term_pos.append((flat, offs))
        rows.append(np.arange(len(per_cand), dtype=np.int64))
    sel = np.array([0, 1], dtype=np.int64)
    got = qmod._min_distance_k(term_pos, rows, sel, 2)

    def brute(ci):
        best = 1 << 40
        for c in itertools.product(
            *[[p - j for p in term_lists[j][ci]] for j in range(3)]
        ):
            best = min(best, max(c) - min(c))
        return best

    assert got.tolist() == [brute(0), brute(1)]


def test_advice_terms_parse_and_plan():
    """Advisory-prefix tokens become required-but-unscored terms."""
    cq = compile_query("customer generator:wiki -scan")
    assert cq.advice == ["generator:wiki"]
    assert cq.include == ["customer"]
    assert cq.exclude == ["scan"]
    assert len(cq.advice_ids) == 1
