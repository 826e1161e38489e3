"""ArtifactKeywords parity (ArtifactKeywords.java:12-48 +
ArtifactKeywordsTest.java:18-27): mail-like tokens inject synthetic
discovery keywords (full address, domain with/without '@', user part),
minus the ignore lists, merged putIfAbsent into the document's keyword
set (DocumentKeywordsBuilder.java:185-191)."""

import pyarrow as pa
import pytest

from marginaliasearch_ray.functions.wordpattern import (
    artifact_keywords,
    tokenize,
)
from marginaliasearch_ray.pipelines.build_index import (
    BuildConfig,
    build_index,
    read_journal,
)
from marginaliasearch_ray.pipelines.query import IndexSearch


def test_reference_vectors():
    # ArtifactKeywordsTest.java:21-26
    words = artifact_keywords(tokenize("Hello I'm <vlofgren@marginalia.nu>, what's up?"))
    assert "vlofgren" in words
    assert "marginalia.nu" in words
    assert "@marginalia.nu" in words
    assert "vlofgren@marginalia.nu" in words


def test_ignore_lists():
    # ignored domain: full address + user survive, domain forms don't
    words = artifact_keywords(["bob@gmail.com"])
    assert words == ["bob", "bob@gmail.com"]
    # ignored user: full address + domain forms survive, user doesn't
    words = artifact_keywords(["root@kernel.org"])
    assert words == ["@kernel.org", "kernel.org", "root@kernel.org"]
    # both ignored: only the full address
    assert artifact_keywords(["admin@paypal.com"]) == ["admin@paypal.com"]


def test_non_mail_tokens_ignored():
    assert artifact_keywords(["a@b.c", "tiny@x", "plain", "a.b/c:d"]) == []
    # exactly 6 chars is NOT skipped (only < 6 is, ArtifactKeywords.java:25)
    assert artifact_keywords(["a@b.cd"]) == ["@b.cd", "a", "a@b.cd", "b.cd"]


DOCS = [
    ("doc_a", "Hello vlofgren@marginalia.nu says parse tree"),
    ("doc_b", "contact bob@gmail.com and noreply@dev.example.org please"),
    ("doc_c", "plain parse tree doc with no addresses"),
    # putIfAbsent: 'site.net' is already a body term of doc_d
    ("doc_d", "site.net dev@site.net here site.net"),
]


@pytest.fixture(scope="module")
def artifact_index(ray_session, tmp_path_factory):
    import ray.data

    rows = {
        "repo": [f"repo{i % 2}" for i in range(len(DOCS))],
        "path": [f"{name}.txt" for name, _ in DOCS],
        "commit": ["0" * 40] * len(DOCS),
        "lang": ["py"] * len(DOCS),
        "content": [text for _, text in DOCS],
        "ordinal": list(range(1, len(DOCS) + 1)),
    }
    table = pa.table(
        {
            "repo": pa.array(rows["repo"], pa.string()),
            "path": pa.array(rows["path"], pa.string()),
            "commit": pa.array(rows["commit"], pa.string()),
            "lang": pa.array(rows["lang"], pa.string()),
            "content": pa.array(rows["content"], pa.string()),
            "ordinal": pa.array(rows["ordinal"], pa.int32()),
        }
    )
    out = str(tmp_path_factory.mktemp("artifact_idx"))
    build_index(
        ray.data.from_arrow(table),
        out,
        BuildConfig(num_parts=1, num_buckets=2, num_salts=1, hot_df_threshold=1000),
    )
    return out, IndexSearch(out, use_actors=False)


def _ords(search, q):
    got = search.search(q, k=50)
    return set(got["doc_id"].to_pylist())


def test_artifact_terms_searchable(artifact_index):
    _, search = artifact_index
    # user part / domain / full address, none of which are body tokens
    assert _ords(search, "vlofgren") == {1}
    assert _ords(search, "marginalia.nu") == {1}
    assert _ords(search, "vlofgren@marginalia.nu") == {1}
    assert _ords(search, "dev.example.org") == {2}
    assert _ords(search, "bob") == {2}


def test_ignored_forms_not_indexed(artifact_index):
    _, search = artifact_index
    # gmail.com is an ignored domain; noreply an ignored user
    assert _ords(search, "gmail.com") == set()
    assert _ords(search, "noreply") == set()
    # the full addresses themselves are always discoverable
    assert _ords(search, "bob@gmail.com") == {2}
    assert _ords(search, "noreply@dev.example.org") == {2}


def test_put_if_absent_no_duplicate_terms(artifact_index):
    out, search = artifact_index
    # body term 'site.net' stays a single segment with its body tf
    assert _ords(search, "site.net") == {4}
    assert _ords(search, "dev") == {4}
    journal = read_journal(out, "reverse").take_all()
    for row in journal:
        tids = row["term_ids"]
        assert len(tids) == len(set(tids)), "duplicate term in journal row"
