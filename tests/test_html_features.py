"""HtmlFeature bits + DocumentFlags + flagsPenalty
(HtmlFeature.java:5-40, DocumentFlags.java:5-14,
IndexResultRankingService.flagsPenalty:633-683) and the special:*
synthetic keywords they inject (BuildConfig.html_features)."""

import numpy as np
import pyarrow as pa
import pytest

from marginaliasearch_ray.functions.metadata import (
    DocumentFlags,
    HtmlFeature,
    flags_penalty,
)
from marginaliasearch_ray.pipelines.build_index import BuildConfig, build_index
from marginaliasearch_ray.pipelines.query import IndexSearch


def _fp(features, doc_flags, size):
    return float(
        flags_penalty(
            np.array([features], dtype=np.int64),
            np.array([doc_flags], dtype=np.int64),
            np.array([size], dtype=np.float64),
        )[0]
    )


def test_flags_penalty_scalar_vectors():
    gen = int(DocumentFlags.GENERATOR_DOCS)
    # featureFlags == 0 short-circuits regardless of anything else
    assert _fp(0, 0, 10_000) == 0.0
    # single-bit penalties on a generator site (factor 1), Java
    # (int) truncation toward zero
    assert _fp(int(HtmlFeature.ADVERTISEMENT), gen, 100) == -7.0   # 7.5
    assert _fp(int(HtmlFeature.CONSENT), gen, 100) == -2.0         # 2.5
    assert _fp(int(HtmlFeature.TRACKING_ADTECH), gen, 100) == -5.0
    assert _fp(int(HtmlFeature.SHORT_DOCUMENT), gen, 100) == -5.0
    # JS carries no penalty but defeats the ==0 short-circuit
    assert _fp(int(HtmlFeature.JS), gen, 100) == 0.0
    # non-generator large site: factor 2 + url-shape penalty
    ads = int(HtmlFeature.ADVERTISEMENT)
    assert _fp(ads, 0, 500) == -15.0                    # 7.5 * 2
    assert _fp(ads | int(HtmlFeature.KEBAB_CASE_URL), 0, 500) == -20.0
    # small non-generator site: factor stays 1, no url-shape penalty
    assert _fp(ads | int(HtmlFeature.KEBAB_CASE_URL), 0, 100) == -7.0
    # combined truncation: 7.5 + 2.5 = 10.0 exactly
    assert _fp(ads | int(HtmlFeature.CONSENT), gen, 100) == -10.0


def _corpus() -> pa.Table:
    rows = {"repo": [], "path": [], "commit": [], "lang": [], "content": [],
            "ordinal": []}
    for ordn in range(70):
        rows["repo"].append(f"org{ordn % 2}/r{ordn % 2}")
        rows["path"].append(f"f_{ordn}.py")
        rows["commit"].append("0" * 40)
        rows["lang"].append("js" if ordn % 4 == 0 else "py")
        rows["content"].append(
            "alpha beta " + " ".join(f"w{k}" for k in range(5 + ordn % 40))
        )
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
def feats_index(ray_session, tmp_path_factory):
    import ray.data

    out = str(tmp_path_factory.mktemp("feats_idx"))
    build_index(
        ray.data.from_arrow(_corpus()),
        out,
        BuildConfig(num_parts=2, num_buckets=4, num_salts=1,
                    hot_df_threshold=1000, html_features=True),
    )
    return IndexSearch(out, use_actors=False)


def test_special_keywords_searchable(feats_index):
    ads = set(feats_index.search("special:ads", k=70)["doc_id"].to_pylist())
    assert ads == {o for o in range(70) if o % 11 == 5}
    js = set(
        feats_index.search("special:scripts", k=70)["doc_id"].to_pylist()
    )
    assert js == {o for o in range(70) if o % 4 == 0}
    # conjunction with a body term works like any other keyword
    both = set(
        feats_index.search("alpha special:tracking", k=70)["doc_id"]
        .to_pylist()
    )
    assert both == {o for o in range(70) if o % 13 == 2}


def test_penalty_applies_in_document_bonus(feats_index):
    t = feats_index.search("alpha", k=70, document_bonus_weight=1.0)
    scores = dict(zip(t["doc_id"].to_pylist(), t["score_r"].to_pylist()))
    # docs 5 and 16 carry ADVERTISEMENT (-7); compare against feature-free
    # twins with identical length (ordinal % 40 equal => same content
    # shape): 5 vs 45 differs only in ads/cookies bits... use the exact
    # penalty delta instead: rebuild the expectation from flags_penalty
    from marginaliasearch_ray.functions.metadata import HtmlFeature as HF

    def feats_of(o):
        f = 0
        if o % 4 == 0:
            f |= int(HF.JS)
        if o % 11 == 5:
            f |= int(HF.ADVERTISEMENT)
        if o % 13 == 2:
            f |= int(HF.TRACKING)
        if o % 29 == 7:
            f |= int(HF.TRACKING_ADTECH)
        if o % 31 == 9:
            f |= int(HF.AFFILIATE_LINK)
        if o % 17 == 3:
            f |= int(HF.CONSENT)
        if o % 19 == 4:
            f |= int(HF.POPOVER)
        if o % 13 == 5:
            f |= int(HF.COOKIES)
        if (7 + o % 40) < 20:
            f |= int(HF.SHORT_DOCUMENT)
        return f

    gen = int(DocumentFlags.GENERATOR_DOCS)
    # doc pairs with the same content length (o and o+40 share o%40) let
    # the penalty difference show up as an exact score difference
    for a, b in ((5, 45), (7, 47), (9, 49)):
        pa_ = _fp(feats_of(a), gen, 100)
        pb_ = _fp(feats_of(b), gen, 100)
        assert scores[a] - scores[b] == pytest.approx(pa_ - pb_, abs=1e-6)


def test_default_build_is_featureless(ray_session, tmp_path_factory):
    import ray.data

    out = str(tmp_path_factory.mktemp("plain_idx"))
    build_index(
        ray.data.from_arrow(_corpus()),
        out,
        BuildConfig(num_parts=2, num_buckets=4, num_salts=1,
                    hot_df_threshold=1000),
    )
    ix = IndexSearch(out, use_actors=False)
    assert ix.search("special:ads", k=5).num_rows == 0
    seg = ix.searchers[0].seg
    assert int(np.abs(seg.fwd_features).sum()) == 0
    assert int(np.abs(seg.fwd_meta & 0xFF).sum()) == 0


def test_combined_build_options(ray_session, tmp_path_factory):
    """html_features + link_keywords + anchor_regions in ONE build: each
    synthetic-keyword family coexists (injection order must not corrupt
    the per-doc segment layout) and stays searchable."""
    import ray.data

    out = str(tmp_path_factory.mktemp("combo_idx"))
    build_index(
        ray.data.from_arrow(_corpus()),
        out,
        BuildConfig(num_parts=2, num_buckets=4, num_salts=1,
                    hot_df_threshold=1000, html_features=True,
                    link_keywords=True, anchor_regions=True),
    )
    ix = IndexSearch(out, use_actors=False)
    # feature keywords
    ads = set(ix.search("special:ads", k=70)["doc_id"].to_pylist())
    assert ads == {o for o in range(70) if o % 11 == 5}
    # link keywords: every doc links somewhere, so some links: term with
    # hits exists; check a specific derived pair via the scalar formula
    repos = sorted({f"org{o % 2}/r{o % 2}" for o in range(70)})
    s0 = repos.index("org0/r0")
    span = 1 + s0 % 7
    expect = set()
    for o in range(70):
        if o % 2 != 0:
            continue
        nc = len("alpha beta " + " ".join(f"w{k}" for k in range(5 + o % 40)))
        for j in (1, 2):
            t = (s0 + 1 + (o * 7 + 13 * j + nc) % span) % len(repos)
            if t != s0:
                expect.add((o, repos[t]))
    for dst in {d for _o, d in expect}:
        got = set(
            ix.search(f"repo:org0/r0 links:{dst}", k=70)["doc_id"]
            .to_pylist()
        )
        assert got == {o for o, d in expect if d == dst}
    # anchor regions: URL words (path tokens) become searchable terms
    got = ix.search("f_3", k=5)
    assert got.num_rows == 1 and got["doc_id"][0].as_py() == 3
    # body search still exact
    assert ix.search("alpha", k=100).num_rows == 70


def test_delta_inherits_html_features(feats_index, tmp_path, ray_session):
    """A delta over a feature-enabled base derives feature bits +
    special:* keywords for its fresh documents (manifest inheritance)."""
    import pyarrow as pa
    import ray.data

    from marginaliasearch_ray.pipelines.delta import build_delta_index
    from marginaliasearch_ray.state import manifest as mf

    # the fixture's base dir is recoverable from the searcher state
    base = feats_index.segment_dirs[0]
    # rewrite doc 5 (ADVERTISEMENT: 5 % 11 == 5) with fresh content
    delta = pa.table(
        {
            "repo": pa.array(["org1/r1"], pa.string()),
            "path": pa.array(["f_5.py"], pa.string()),
            "commit": pa.array(["1" * 40], pa.string()),
            "lang": pa.array(["py"], pa.string()),
            "content": pa.array(["alpha freshfeat words here"], pa.string()),
            "ordinal": pa.array([5], pa.int32()),
        }
    )
    ddir = str(tmp_path / "fdelta")
    from marginaliasearch_ray.pipelines.build_index import BuildConfig

    build_delta_index(
        ray.data.from_arrow(delta), [base], ddir,
        BuildConfig(num_parts=2, num_buckets=4, num_salts=1,
                    hot_df_threshold=1000),  # html_features NOT set here
    )
    assert mf.read_manifest(ddir, "journal")["html_features"] is True

    from marginaliasearch_ray.pipelines.query import IndexSearch

    chain = IndexSearch([base, ddir], use_actors=False)
    # the rewritten doc keeps its ordinal-derived special:ads keyword
    assert 5 in set(
        chain.search("special:ads", k=100)["doc_id"].to_pylist()
    )
    assert set(chain.search("freshfeat", k=5)["doc_id"].to_pylist()) == {5}


def test_format_keyword(feats_index):
    """format:<lang> rides the feature family: the converter's
    document-format keyword (format:pdf / format:plain analog)."""
    js = set(
        feats_index.search("format:js", k=70)["doc_id"].to_pylist()
    )
    assert js == {o for o in range(70) if o % 4 == 0}
    py = set(
        feats_index.search("alpha format:py", k=70)["doc_id"].to_pylist()
    )
    assert py == {o for o in range(70) if o % 4 != 0}
