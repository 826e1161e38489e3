"""QueryStrategy REQUIRE_FIELD_* filtering (qs= token →
meetsQueryStrategyRequirements, IndexResultRankingService.java:226-260):
every scored keyword must carry the strategy's WordFlags bit in a
result document, evaluated as booleanAggregate over the compiled query
(AND terms all required, OR groups any member)."""

import pyarrow as pa
import pytest

from marginaliasearch_ray.pipelines.build_index import BuildConfig, build_index
from marginaliasearch_ray.pipelines.query import (
    IndexSearch,
    compile_query,
)


def _corpus() -> pa.Table:
    rows = {"repo": [], "path": [], "commit": [], "lang": [], "content": [],
            "ordinal": []}

    def add(repo, path, content, ordn):
        rows["repo"].append(repo)
        rows["path"].append(path)
        rows["commit"].append("0" * 40)
        rows["lang"].append("py")
        rows["content"].append(content)
        rows["ordinal"].append(ordn)

    # the query term 'widget' appears in every doc's body; flags differ:
    late = "f1 f2 f3 f4 f5 f6 f7 f8 f9 f10 f11 f12 f13 f14 f15 f16 f17 "
    # 1: term in the filename -> Title + UrlPath
    add("orgA/plain", "src/widget.py", late + "widget gadget", 1)
    # 2: term in the path directory only -> UrlPath, no Title
    add("orgA/plain", "widget/util.py", late + "widget gadget", 2)
    # 3: term in the repo name -> UrlDomain
    add("orgB/widget", "src/misc.py", late + "widget gadget", 3)
    # 4: term only in the body, late -> no flags
    add("orgA/plain", "src/other.py", late + "widget gadget", 4)
    # 5: early mention -> Subjects (gate cleared thanks to the filler)
    add("orgA/plain", "src/early.py", "widget " + late + "gadget", 5)
    # 6: gadget-only doc so OR-group tests have an asymmetric member
    add("orgA/plain", "src/solo.py", late + "gadget widget2", 6)
    # filler: pushes widget's df/N down so the Subjects tf-idf admission
    # gate (active in every build_index build via the stats dict) clears
    # 100 for doc 5's early mention
    for i in range(100):
        add("orgF/filler", f"f/f_{i}.py", f"pad{i} junk{i} extra{i}", 50 + i)
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
def strat_index(ray_session, tmp_path_factory):
    import ray.data

    out = str(tmp_path_factory.mktemp("strat_idx"))
    build_index(
        ray.data.from_arrow(_corpus()),
        out,
        BuildConfig(num_parts=2, num_buckets=4, num_salts=1,
                    hot_df_threshold=1000),
    )
    return IndexSearch(out, use_actors=False)


def _ids(tbl):
    return set(tbl["doc_id"].to_pylist())


def test_parser_qs_token():
    cq = compile_query("widget qs=REQUIRE_FIELD_TITLE")
    assert cq.query_strategy == "REQUIRE_FIELD_TITLE"
    assert cq.include == ["widget"]


def test_auto_is_noop(strat_index):
    base = _ids(strat_index.search("widget", k=10))
    assert base == {1, 2, 3, 4, 5}
    assert _ids(strat_index.search("widget qs=AUTO", k=10)) == base
    assert _ids(
        strat_index.search("widget", k=10, query_strategy="SENTENCE")
    ) == base


def test_require_title(strat_index):
    assert _ids(strat_index.search("widget qs=REQUIRE_FIELD_TITLE", k=10)) \
        == {1}


def test_require_url(strat_index):
    # UrlPath fires for filename AND directory tokens
    assert _ids(strat_index.search("widget qs=REQUIRE_FIELD_URL", k=10)) \
        == {1, 2}


def test_require_domain(strat_index):
    assert _ids(strat_index.search("widget qs=REQUIRE_FIELD_DOMAIN", k=10)) \
        == {3}


def test_require_subject(strat_index):
    # early mention + the tf-idf admission gate (rare term, high tf-idf)
    assert _ids(strat_index.search("widget qs=REQUIRE_FIELD_SUBJECT", k=10)) \
        == {5}


def test_site_and_link_never_match(strat_index):
    # SITE is never assigned by the flag extractors; LINK's bit
    # overflows the byte-wide flags field (the Java quirk, replicated)
    assert strat_index.search("widget qs=REQUIRE_FIELD_SITE", k=10) \
        .num_rows == 0
    assert strat_index.search("widget qs=REQUIRE_FIELD_LINK", k=10) \
        .num_rows == 0


def test_or_group_any_member(strat_index):
    # (widget | widget2) with REQUIRE_FIELD_TITLE: doc 1 qualifies via
    # widget's Title flag; doc 6 (widget2-only, no flags) does not
    got = _ids(
        strat_index.search("(widget | widget2) qs=REQUIRE_FIELD_TITLE", k=10)
    )
    assert got == {1}


def test_unknown_strategy_raises(strat_index):
    with pytest.raises(ValueError, match="unknown query strategy"):
        strat_index.search("widget qs=BOGUS")


def test_pruned_path_applies_strategy(strat_index):
    plain = strat_index.search("widget qs=REQUIRE_FIELD_URL", k=10)
    pruned = strat_index.search("widget qs=REQUIRE_FIELD_URL", k=10,
                                pruned=True)
    assert _ids(plain) == _ids(pruned) == {1, 2}


def test_set_token_restricts_and_validates(strat_index):
    sets = {"MINE": ["orgA/plain"], "EMPTY": []}
    t = strat_index.search("widget set:mine", k=10, search_sets=sets)
    assert set(t["doc_id"].to_pylist()) == {1, 2, 4, 5}  # orgA/plain docs
    with pytest.raises(ValueError, match="Unknown search set"):
        strat_index.search("widget set:nope", k=10, search_sets=sets)
    # intersection with an explicit filter-spec repo list
    t2 = strat_index.search(
        "widget set:mine", k=10, search_sets=sets,
        filter_spec={"repos": ["orgA/plain", "orgB/widget"]},
    )
    assert set(t2["doc_id"].to_pylist()) == {1, 2, 4, 5}
    t3 = strat_index.search(
        "widget set:mine", k=10, search_sets=sets,
        filter_spec={"repos": ["orgB/widget"]},
    )
    assert t3.num_rows == 0  # empty intersection


def test_advice_only_query_promotes(strat_index):
    """promoteNonRankingTerms (SearchQuery.java:218-226): a query with no
    ranking terms scores its advice keyword instead of matching nothing."""
    got = _ids(strat_index.search("generator:wiki", k=120))
    want = {o for o in list(range(1, 7)) + list(range(50, 150)) if o % 7 == 3}
    assert got == want and got


def test_bare_site_query_enumerates_domain(strat_index):
    """A bare repo: query gains the site:<repo> dummy keyword
    (QueryFactory.java:141-147) and enumerates the domain's documents."""
    got = _ids(strat_index.search("repo:orgF/filler", k=200))
    assert got == set(range(50, 150))
    # an advice term alongside repo: stays advisory but is promoted too
    got2 = _ids(strat_index.search("repo:orgA/plain", k=20))
    assert got2 == {1, 2, 4, 5, 6}


def test_nsfw_tier_filter(strat_index):
    """NsfwDomainFilter.isBlocked:64-74 — tier T blocks the union of
    blocklists at levels <= T; tier 0 disables."""
    lists = {1: ["orgA/plain"], 2: ["orgB/widget"]}
    base = _ids(strat_index.search("widget", k=10))
    assert base == {1, 2, 3, 4, 5}
    t0 = _ids(strat_index.search("widget", k=10, nsfw_tier=0,
                                 nsfw_blocklists=lists))
    assert t0 == base
    t1 = _ids(strat_index.search("widget", k=10, nsfw_tier=1,
                                 nsfw_blocklists=lists))
    assert t1 == {3}  # orgA/plain blocked; orgB/widget (tier 2) survives
    t2 = _ids(strat_index.search("widget", k=10, nsfw_tier=2,
                                 nsfw_blocklists=lists))
    assert t2 == set()
