"""Facet counting over the full match set (per-domain result counting
of IndexQueryExecution:159-178 generalized): exact counts grouped by
repo / year, verified against brute-force sets on the divisor corpus."""

import pyarrow as pa
import pytest

from marginaliasearch_ray.pipelines.build_index import BuildConfig, build_index
from marginaliasearch_ray.pipelines.query import IndexSearch

N_DOCS = 96
MAX_WORD = 24


def _divisor_corpus() -> pa.Table:
    rows = {"repo": [], "path": [], "commit": [], "lang": [], "content": [],
            "ordinal": []}
    for i in range(1, N_DOCS + 1):
        words = [f"w{j}" for j in range(1, MAX_WORD + 1) if i % j == 0]
        rows["repo"].append(f"repo{i % 4}")
        rows["path"].append(f"doc_{i}.txt")
        rows["commit"].append("0" * 40)
        rows["lang"].append("py" if i % 3 else "js")
        rows["content"].append(" ".join(words))
        rows["ordinal"].append(i)
    return pa.table(
        {
            "repo": pa.array(rows["repo"], pa.string()),
            "path": pa.array(rows["path"], pa.string()),
            "commit": pa.array(rows["commit"], pa.string()),
            "lang": pa.array(rows["lang"], pa.string()),
            "content": pa.array(rows["content"], pa.string()),
            "ordinal": pa.array(rows["ordinal"], pa.int32()),
        }
    )


def _matching(include, exclude=()):
    out = set()
    for i in range(1, N_DOCS + 1):
        divs = {f"w{j}" for j in range(1, MAX_WORD + 1) if i % j == 0}
        if all(t in divs for t in include) and not any(
            t in divs for t in exclude
        ):
            out.add(i)
    return out


def _expected_facets(matching, key_of, k=20):
    agg: dict = {}
    for i in matching:
        key = key_of(i)
        agg[key] = agg.get(key, 0) + 1
    return sorted(agg.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


@pytest.fixture(scope="module")
def facet_index(ray_session, tmp_path_factory):
    import ray.data

    out = str(tmp_path_factory.mktemp("facet_idx"))
    build_index(
        ray.data.from_arrow(_divisor_corpus()),
        out,
        BuildConfig(
            num_parts=2, num_buckets=4, num_salts=1, hot_df_threshold=1000
        ),
    )
    return IndexSearch(out, use_actors=False)


def test_facet_repo_counts(facet_index):
    t = facet_index.facets("w2", by="repo")
    got = list(zip(t["repo"].to_pylist(), t["n"].to_pylist()))
    want = _expected_facets(_matching(["w2"]), lambda i: f"repo{i % 4}")
    assert got == want


def test_facet_repo_with_exclude(facet_index):
    t = facet_index.facets("w3 -w4", by="repo")
    got = list(zip(t["repo"].to_pylist(), t["n"].to_pylist()))
    want = _expected_facets(
        _matching(["w3"], exclude=["w4"]), lambda i: f"repo{i % 4}"
    )
    assert got == want


def test_facet_year_counts(facet_index):
    t = facet_index.facets("w2 w3", by="year")
    got = list(zip(t["year"].to_pylist(), t["n"].to_pylist()))
    want = _expected_facets(
        _matching(["w2", "w3"]), lambda i: 1996 + i % 30
    )
    assert got == want


def test_facet_lang_counts(facet_index):
    t = facet_index.facets("w2", by="lang")
    got = list(zip(t["lang"].to_pylist(), t["n"].to_pylist()))
    want = _expected_facets(
        _matching(["w2"]), lambda i: "py" if i % 3 else "js"
    )
    assert got == want


def test_facet_k_truncation(facet_index):
    t = facet_index.facets("w1", by="year", k=5)
    assert t.num_rows == 5
    full = _expected_facets(_matching(["w1"]), lambda i: 1996 + i % 30, k=5)
    got = list(zip(t["year"].to_pylist(), t["n"].to_pylist()))
    assert got == full


def test_facet_no_hits_and_unknown_repo(facet_index):
    t = facet_index.facets("nosuchword", by="repo")
    assert t.num_rows == 0
    assert t.column_names == ["repo", "n"]
    t2 = facet_index.facets("w2 repo:doesnotexist", by="repo")
    assert t2.num_rows == 0


def test_search_with_facets_matches_separate_calls(facet_index):
    # one fan-out == search() + facets() run separately
    for q, by in (("w2", "repo"), ("w3 -w4", "year"), ("w2 w3", "lang")):
        res, fac = facet_index.search_with_facets(q, by=by, k=10)
        assert res.to_pylist() == facet_index.search(q, k=10).to_pylist()
        assert fac.to_pylist() == facet_index.facets(q, by=by).to_pylist()
    # no-hit query still returns the tuple shape
    res, fac = facet_index.search_with_facets("nosuchword", by="repo")
    assert res.num_rows == 0 and fac.num_rows == 0


def test_facet_invalid_key_and_negative_k(facet_index):
    # typo'd key raises on the DRIVER, before any fan-out
    with pytest.raises(ValueError, match="unknown facet key"):
        facet_index.facets("w2", by="repos")
    with pytest.raises(ValueError, match="unknown facet key"):
        facet_index.search_with_facets("w2", by="yearz")
    # negative k clamps to empty instead of negative-slice surprises
    assert facet_index.facets("w2", by="repo", k=-1).num_rows == 0


def test_facet_matches_count(facet_index):
    # sum of facet counts == the count_only total for the same query
    t = facet_index.facets("w2", by="repo", k=1000)
    assert sum(t["n"].to_pylist()) == facet_index.count("w2")
