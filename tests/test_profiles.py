"""Search-filter spec parsing + named profiles
(SearchFilterParser.java:21-310, SearchProfile.java:8-48) and their
composition onto the query engine."""

import pyarrow as pa
import pytest

from marginaliasearch_ray.pipelines import profiles as pf
from marginaliasearch_ray.pipelines.build_index import BuildConfig, build_index
from marginaliasearch_ray.pipelines.query import IndexSearch


def test_parse_reference_payloads():
    for pid, xml in pf.PROFILE_FILTERS.items():
        spec = pf.parse_filter(xml, identifier=pid)
        assert spec.identifier == pid
    docs = pf.parse_filter(pf.PROFILE_FILTERS["docs"])
    assert docs.terms_require == ["generator:docs"]
    vintage = pf.parse_filter(pf.PROFILE_FILTERS["vintage"])
    assert vintage.terms_promote == [("format:html123", 1.0), ("js:false", 1.0)]
    assert vintage.temporal_bias == "OLD" and vintage.year == ("<", 2003)
    modern = pf.parse_filter(pf.PROFILE_FILTERS["modern"])
    assert modern.search_set == "SMALLWEB"
    assert modern.size == ("<", 500) and modern.year == (">", 2015)
    food = pf.parse_filter(pf.PROFILE_FILTERS["food"])
    assert food.terms_exclude == ["special:ads"]


def test_type_limit_is_ignored_like_the_reference():
    # small-web.xml carries a 'type' limit the reference parser never
    # reads (parseSpecificationLimit extracts year/size/quality/rank)
    spec = pf.parse_filter(pf.PROFILE_FILTERS["modern"])
    assert not hasattr(spec, "type")


def test_roundtrip_render_parse():
    spec = pf.SearchFilterSpec(
        identifier="x",
        terms_require=["generator:docs", "alpha"],
        terms_exclude=["beta"],
        terms_promote=[("gamma", 2.0)],
        domains_exclude=["org0/bad"],
        domains_promote=[("org1/good", 1.0)],
        year=("<", 2003),
        size=(">", 10),
        temporal_bias="OLD",
        query_strategy="REQUIRE_FIELD_TITLE",
    )
    back = pf.parse_filter(pf.render_to_xml(spec), identifier="x")
    assert back == spec


def test_constraints():
    too_many = " ".join(f"t{i}" for i in range(7))
    with pytest.raises(pf.SearchFilterParserException, match="term requirem"):
        pf.parse_filter(f"<filter><terms-require>{too_many}"
                        "</terms-require></filter>")
    doms = "\n".join(f"d{i}.example" for i in range(26))
    with pytest.raises(pf.SearchFilterParserException, match="domain requir"):
        pf.parse_filter(f"<filter><domains-include>{doms}"
                        "</domains-include></filter>")
    with pytest.raises(pf.SearchFilterParserException, match="both"):
        pf.parse_filter("<filter><search-set>X</search-set>"
                        "<domains-include>a.b</domains-include></filter>")
    with pytest.raises(pf.SearchFilterParserException, match="temporal"):
        pf.parse_filter("<filter><temporal-bias>SOON</temporal-bias>"
                        "</filter>")
    with pytest.raises(pf.SearchFilterParserException, match="strategy"):
        pf.parse_filter("<filter><query-strategy>BOGUS</query-strategy>"
                        "</filter>")


def test_profile_fallback():
    assert pf.get_search_profile(None) == "corpo"
    assert pf.get_search_profile("nope") == "corpo"
    assert pf.get_search_profile("vintage") == "vintage"


def _corpus() -> pa.Table:
    rows = {"repo": [], "path": [], "commit": [], "lang": [], "content": [],
            "ordinal": []}
    for ordn in range(28):
        repo = f"org{ordn % 2}/repo{ordn % 4}"
        rows["repo"].append(repo)
        rows["path"].append(f"f_{ordn}.py")
        rows["commit"].append("0" * 40)
        rows["lang"].append("py")
        rows["content"].append(f"widget common w{ordn} filler text")
        rows["ordinal"].append(ordn)
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
def prof_index(ray_session, tmp_path_factory):
    import ray.data

    out = str(tmp_path_factory.mktemp("prof_idx"))
    build_index(
        ray.data.from_arrow(_corpus()),
        out,
        BuildConfig(num_parts=2, num_buckets=4, num_salts=1,
                    hot_df_threshold=1000),
    )
    return IndexSearch(out, use_actors=False)


def test_wiki_profile_filters(prof_index):
    # generator:wiki fires on ordinal % 7 == 3 -> docs 3, 10, 17, 24
    t = pf.search_with_profile(prof_index, "widget", "wiki", k=30)
    assert set(t["doc_id"].to_pylist()) == {3, 10, 17, 24}
    # docs profile = the complement
    t2 = pf.search_with_profile(prof_index, "widget", "docs", k=30)
    assert set(t2["doc_id"].to_pylist()) == set(range(28)) - {3, 10, 17, 24}
    # a profile requiring an absent keyword matches nothing
    t3 = pf.search_with_profile(prof_index, "widget", "tilde", k=30)
    assert t3.num_rows == 0


def test_domains_exclude_and_wildcard(prof_index):
    spec = pf.parse_filter(
        "<filter><domains-exclude>*.org0</domains-exclude></filter>"
    )
    t = pf.apply_spec(prof_index, "widget", spec, k=30)
    # all org0/* repos rejected -> only odd ordinals (org1) remain
    assert set(t["doc_id"].to_pylist()) == {o for o in range(28) if o % 2}
    spec2 = pf.parse_filter(
        "<filter><domains-include>org1/repo1</domains-include></filter>"
    )
    t2 = pf.apply_spec(prof_index, "widget", spec2, k=30)
    assert set(t2["doc_id"].to_pylist()) == {o for o in range(28)
                                            if o % 4 == 1}


def test_domains_promote_boosts(prof_index):
    spec = pf.parse_filter(
        '<filter><domains-promote amount="1.0">org1/repo1'
        "</domains-promote></filter>"
    )
    t = pf.apply_spec(prof_index, "widget", spec, k=30)
    base = pf.apply_spec(
        prof_index, "widget", pf.SearchFilterSpec(), k=30
    )
    boost = dict(zip(t["doc_id"].to_pylist(), t["score_r"].to_pylist()))
    plain = dict(zip(base["doc_id"].to_pylist(), base["score_r"].to_pylist()))
    for o in range(28):
        if o % 4 == 1:
            assert boost[o] > plain[o]
        else:
            assert boost[o] == plain[o]


def test_unresolvable_search_set_raises(prof_index):
    with pytest.raises(ValueError, match="unresolvable search set"):
        pf.search_with_profile(prof_index, "widget", "default")
    t = pf.search_with_profile(
        prof_index, "widget", "default",
        search_sets={"POPULAR": ["org0/repo0"]}, k=30,
    )
    assert set(t["doc_id"].to_pylist()) == {o for o in range(28)
                                            if o % 4 == 0}


def test_filter_store_crud(tmp_path):
    store = pf.FilterStore(str(tmp_path / "filters"))
    store.load_default_configs()
    assert sorted(store.get_filter_ids("SYSTEM")) == \
        sorted(pf.PROFILE_FILTERS)
    spec = store.get_filter("SYSTEM", "vintage")
    assert spec is not None and spec.temporal_bias == "OLD"
    # per-user custom filter with validate-on-save
    store.save_filter("alice", "mine",
                      "<filter><terms-require>generator:docs"
                      "</terms-require></filter>")
    assert store.get_filter_ids("alice") == ["mine"]
    assert store.get_filter("bob", "mine") is None, "per-user isolation"
    with pytest.raises(pf.SearchFilterParserException):
        store.save_filter("alice", "bad", "<nope/>")
    assert "bad" not in store.get_filter_ids("alice")
    # REPLACE INTO: same (user, name) overwrites
    store.save_filter("alice", "mine",
                      "<filter><terms-require>generator:wiki"
                      "</terms-require></filter>")
    assert store.get_filter("alice", "mine").terms_require == \
        ["generator:wiki"]
    assert store.get_filter_ids("alice") == ["mine"]
    # stored-but-corrupted reads as absent, raw definition still visible
    import os
    p = store._path("alice", "mine")
    with open(p, "w") as f:
        f.write("garbage not xml")
    assert store.get_filter("alice", "mine") is None
    assert store.get_filter_definition("alice", "mine") == "garbage not xml"
