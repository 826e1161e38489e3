"""Mirror of the reference's integration smoke test
(IndexQueryServiceIntegrationSmokeTest.java:105-150): documents whose
words are small integers, queries like "2 3 5 -4" asserted against
exactly computed ordinal sets."""

import pyarrow as pa
import pytest

from marginaliasearch_ray.pipelines.build_index import BuildConfig, build_index
from marginaliasearch_ray.pipelines.query import IndexSearch

N_DOCS = 128
MAX_WORD = 32


def _divisor_corpus() -> pa.Table:
    rows = {"repo": [], "path": [], "commit": [], "lang": [], "content": [],
            "ordinal": []}
    for i in range(1, N_DOCS + 1):
        words = [f"w{j}" for j in range(1, MAX_WORD + 1) if i % j == 0]
        rows["repo"].append(f"repo{i % 4}")
        rows["path"].append(f"doc_{i}.txt")
        rows["commit"].append("0" * 40)
        rows["lang"].append("py")
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


@pytest.fixture(scope="module")
def smoke_index(ray_session, tmp_path_factory):
    import ray.data

    out = str(tmp_path_factory.mktemp("smoke_idx"))
    build_index(
        ray.data.from_arrow(_divisor_corpus()),
        out,
        BuildConfig(num_parts=2, num_buckets=4, num_salts=1, hot_df_threshold=1000),
    )
    return IndexSearch(out, use_actors=False)


def expected(include, exclude=()):
    out = set()
    for i in range(1, N_DOCS + 1):
        divs = {j for j in range(1, MAX_WORD + 1) if i % j == 0}
        if all(t in divs for t in include) and not any(t in divs for t in exclude):
            out.add(i)
    return out


def test_conjunction(smoke_index):
    got = smoke_index.search("w2 w3 w5", k=200)
    assert set(got["doc_id"].to_pylist()) == expected({2, 3, 5})
    assert expected({2, 3, 5}) == {30, 60, 90, 120}


def test_exclusion(smoke_index):
    got = smoke_index.search("w2 w3 w5 -w4", k=200)
    assert set(got["doc_id"].to_pylist()) == expected({2, 3, 5}, {4})
    assert expected({2, 3, 5}, {4}) == {30, 90}


def test_single_rare_term(smoke_index):
    got = smoke_index.search("w31", k=200)
    assert set(got["doc_id"].to_pylist()) == {31, 62, 93, 124}


def test_no_hits(smoke_index):
    assert smoke_index.search("w2 -w2", k=10).num_rows == 0
    assert smoke_index.search("nosuchword", k=10).num_rows == 0


def test_ranking_prefers_shorter_docs(smoke_index):
    # equal tf=1 everywhere: BM25 length normalization must rank the
    # shortest matching document first; doc 30 has more divisors (longer)
    # than doc 90? both contain w2 w3 w5; tie-break deterministic
    got = smoke_index.search("w2 w3 w5", k=4)
    docs = got["doc_id"].to_pylist()
    assert sorted(docs) == [30, 60, 90, 120]
    lens = {i: len([j for j in range(1, MAX_WORD + 1) if i % j == 0])
            for i in docs}
    scores = dict(zip(docs, got["score_r"].to_pylist()))
    # shorter doc => strictly higher score for identical tf
    ordered = sorted(docs, key=lambda d: (lens[d], d))
    assert docs[0] == ordered[0]
    assert scores[ordered[0]] >= scores[ordered[-1]]
