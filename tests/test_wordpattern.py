import random

import duckdb

from marginaliasearch_ray.functions.wordpattern import (
    admit_word,
    matches_word_pattern,
    sql_tokenize_expr,
    tokenize,
)


def test_port_basic_cases():
    # DocumentPositionMapper.matchesWordPattern:201-260 semantics
    assert matches_word_pattern("hello")
    assert matches_word_pattern("foo.bar")
    assert matches_word_pattern("a-b_c.d")
    assert matches_word_pattern("x" * 15)
    assert not matches_word_pattern("x" * 16)  # first run capped at 15
    # Java quirk: 1-2 trailing separators are accepted (the i==len check
    # sits at the top of the next group iteration)
    assert matches_word_pattern("a.")
    assert matches_word_pattern("a..")
    assert not matches_word_pattern("a...")
    assert not matches_word_pattern("a" + ".b" * 8 + ".")  # no trailing sep after 8th group
    assert matches_word_pattern("a" + ".b" * 7 + ".")
    assert not matches_word_pattern(".a")  # leading separator
    assert not matches_word_pattern("a---b")  # 3 separators
    assert matches_word_pattern("a--b")  # 2 separators ok
    assert not matches_word_pattern("")
    assert not matches_word_pattern("a" * 49)
    assert not matches_word_pattern("a,b")
    # 8 joined groups ok, 9 not
    assert matches_word_pattern("a" + ".b" * 8)
    assert not matches_word_pattern("a" + ".b" * 9)
    # group run capped at 10
    assert matches_word_pattern("a." + "b" * 10)
    assert not matches_word_pattern("a." + "b" * 11)


def test_regex_equivalent_to_port_ascii():
    rng = random.Random(42)
    alphabet = "ab1.-_/:+*@#"
    for _ in range(5000):
        n = rng.randrange(0, 20)
        s = "".join(rng.choice(alphabet) for _ in range(n))
        assert admit_word(s) == matches_word_pattern(s), repr(s)


def test_tokenize_code_like():
    text = "def foo_bar(x):\n    return x.y + BAZ_QUX  # end."
    toks = tokenize(text)
    assert toks == ["def", "foo_bar", "x", "return", "x.y", "baz_qux", "end"]


def test_tokenize_matches_duckdb_sql():
    texts = [
        "def foo_bar(x): return x.y + BAZ-QUX",
        "License: MIT.  import os, sys; a---b x" + "y" * 60,
        "",
        "a.b.c.d.e.f.g.h.i.j.k  weird..token  ..lead trail..",
        "mixed CASE and 123 numbers_42",
    ]
    con = duckdb.connect()
    expr = sql_tokenize_expr("t")
    for text in texts:
        (got,) = con.execute(f"select {expr} from (select ? as t)", [text]).fetchone()
        assert (got or []) == tokenize(text), repr(text)
