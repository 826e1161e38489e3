"""SymSpell spell correction: the true-DL distance port, the
symmetric-delete index against a brute-force twin, and the SpellChecker
result contract."""

import random
import string

import pyarrow as pa
import pytest

from marginaliasearch_ray.pipelines import spell


def test_damerau_levenshtein_vectors():
    dl = spell.damerau_levenshtein
    assert dl("", "") == 0
    assert dl("abc", "abc") == 0
    assert dl("abc", "ab") == 1
    assert dl("abc", "abcd") == 1
    assert dl("abc", "axc") == 1
    assert dl("bank", "bnak") == 1  # adjacent transpose
    # TRUE DL (the H-matrix SymSpell vendors): a transpose may interact
    # with a later insert — OSA would say 3 here
    assert dl("ca", "abc") == 2
    assert dl("kitten", "sitting") == 3


def test_dl_matches_duckdb_on_random_pairs():
    """DuckDB's damerau_levenshtein is the oracle's distance — it must
    agree with the engine port everywhere, not just on our corpus."""
    import duckdb

    rng = random.Random(41)
    con = duckdb.connect()
    for _ in range(300):
        a = "".join(
            rng.choice("abcd") for _ in range(rng.randrange(0, 7))
        )
        b = "".join(
            rng.choice("abcd") for _ in range(rng.randrange(0, 7))
        )
        want = con.execute(
            "select damerau_levenshtein(?, ?)", [a, b]
        ).fetchone()[0]
        assert spell.damerau_levenshtein(a, b) == want, (a, b)


def test_word_deletes():
    assert spell.word_deletes("ab", 2) == {"a", "b"}
    assert spell.word_deletes("a", 2) == set()  # length-1: no deletes
    d1 = spell.word_deletes("abc", 1)
    assert d1 == {"ab", "ac", "bc"}
    d2 = spell.word_deletes("abc", 2)
    assert d2 == {"ab", "ac", "bc", "a", "b", "c"}


def _index_from(words_counts):
    t = pa.table(
        {
            "term": pa.array([w for w, _ in words_counts], pa.string()),
            "cnt": pa.array([c for _, c in words_counts], pa.int64()),
        }
    )
    return spell.SpellIndex.build(t)


def _brute(words_counts, word, max_dist=2):
    scored = [
        (t, c, spell.damerau_levenshtein(word, t))
        for t, c in words_counts
    ]
    scored = [r for r in scored if r[2] <= max_dist]
    if not scored:
        return []
    dmin = min(d for _t, _c, d in scored)
    kept = [r for r in scored if r[2] == dmin]
    kept.sort(key=lambda r: (-r[1], r[0]))
    return kept


def test_index_matches_brute_force_random(ray_session):
    rng = random.Random(17)
    words = sorted(
        {
            "".join(
                rng.choice(string.ascii_lowercase[:6])
                for _ in range(rng.randrange(2, 8))
            )
            for _ in range(60)
        }
    )
    wc = [(w, rng.randrange(1, 100)) for w in words]
    idx = _index_from(wc)
    for _ in range(80):
        probe = "".join(
            rng.choice(string.ascii_lowercase[:6])
            for _ in range(rng.randrange(1, 8))
        )
        assert idx.correct(probe) == _brute(wc, probe), probe


def test_exact_match_is_distance_zero(ray_session):
    idx = _index_from([("table", 5), ("tables", 9)])
    # an exact dictionary hit is the ONLY minimal-distance suggestion
    assert idx.correct("table") == [("table", 5, 0)]


def test_min_distance_set_and_count_order(ray_session):
    idx = _index_from([("slow", 3), ("row", 7), ("sort", 9)])
    # sow: slow (insert l) and row (replace s->r) both at distance 1;
    # sort is at 2 and must be excluded; count desc pins row first
    assert idx.correct("sow") == [("row", 7, 1), ("slow", 3, 1)]


def test_overlong_input_early_exit(ray_session):
    idx = _index_from([("ab", 1)])
    # input.length - 2 > maxlength (SymSpell.Lookup:232)
    assert idx.correct("abcde") == []
    assert idx.correct("abcd") == [("ab", 1, 2)]


def test_save_load_roundtrip(ray_session, tmp_path):
    wc = [("merge", 4), ("mege", 1)]
    idx = _index_from(wc)
    idx.save(str(tmp_path / "sp"))
    idx2 = spell.SpellIndex.load(str(tmp_path / "sp"))
    assert idx2.correct("mrege") == idx.correct("mrege")
    assert idx2.correct("mrege")[0][0] == "merge"  # transpose, dist 1


def test_empty_dictionary_builds_empty_index(ray_session):
    """A corpus with no word runs must yield an empty index, not an
    ArrowInvalid from pa.concat_tables on zero batches."""
    import ray.data

    docs = ray.data.from_arrow(
        pa.table({"text": pa.array(["!!! ???", ""], pa.string())})
    )
    idx = spell.SpellIndex.build(spell.spell_dictionary(docs))
    assert len(idx.words) == 0
    assert idx.correct("anything") == []


def test_spell_dictionary_counts(ray_session):
    import ray.data

    docs = ray.data.from_arrow(
        pa.table(
            {
                "text": pa.array(
                    ["Foo bar2 foo_baz", "foo BAR"], pa.string()
                )
            }
        )
    )
    rows = {
        r["term"]: r["cnt"]
        for r in spell.spell_dictionary(docs).take_all()
    }
    # parseWords: lowercased [a-z0-9_-]+ runs (Java's [\w-[\d_]] is a
    # class UNION) — digits/underscores/hyphens stay inside tokens
    assert rows == {"foo": 2, "bar2": 1, "foo_baz": 1, "bar": 1}
