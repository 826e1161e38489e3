"""Delta segments + compaction: a base index plus a delta built over
updated/new documents must score EXACTLY like one index rebuilt over the
corpus-with-replacement (pipelines.delta docstring contract; reference
analog: the live-capture secondary index next to the immutable main
index, SURVEY.md §2.9).

Fixture geometry: corpus v1 (6 repos x 12 files) -> base segment; 15 of
those docs get new content + one brand-new repo (4 files) -> delta
segment; the merged corpus (v1 with replacements + new repo) -> the
reference full rebuild.  With no new repos the registries coincide, so
chain-vs-rebuild parity is exact down to combined ids and scores."""

import os

import numpy as np
import pyarrow as pa
import pytest

from marginaliasearch_ray.pipelines.build_index import BuildConfig, build_index
from marginaliasearch_ray.pipelines.delta import (
    build_delta_index,
    compact_segments,
    load_registry,
)
from marginaliasearch_ray.pipelines.query import IndexSearch, _Segment
from marginaliasearch_ray.sources.corpus import synthesize_corpus
from marginaliasearch_ray.state import manifest as mf

CFG = dict(num_parts=3, num_buckets=8, hot_df_threshold=20, posting_block=8)

UPDATED = 15  # docs whose content changes between v1 and the delta

QUERIES = [
    dict(query="return value"),
    dict(query="return -unsafe"),
    dict(query='"static void"'),
    dict(query="parse", flags_weight=1.0),
    dict(query="table lang:py"),
    dict(query="return value", normalize_score=True, document_bonus_weight=1.0),
    dict(query="buffer size", verbatim_weight=1.0, proximity_weight=1.0),
]


def _mutate(content: str, i: int) -> str:
    # drop the doc's unique-token lines, add fresh tokens -> dfs change
    lines = [l for l in content.splitlines() if "uniq_" not in l]
    lines.append(f"freshly updated delta_token_{i} return")
    return "\n".join(lines)


@pytest.fixture(scope="module")
def corpora():
    v1 = synthesize_corpus(n_repos=6, files_per_repo=12, seed=11)
    cols = {c: v1[c].to_pylist() for c in v1.column_names}
    n = len(cols["repo"])
    upd = list(range(0, n, max(1, n // UPDATED)))[:UPDATED]
    delta = {c: [cols[c][i] for i in upd] for c in cols}
    delta["content"] = [_mutate(c, i) for i, c in enumerate(delta["content"])]
    merged = {c: list(cols[c]) for c in cols}
    for j, i in enumerate(upd):
        merged["content"][i] = delta["content"][j]
    return (
        v1,
        pa.table({c: pa.array(delta[c], v1.schema.field(c).type) for c in cols}),
        pa.table({c: pa.array(merged[c], v1.schema.field(c).type) for c in cols}),
    )


@pytest.fixture(scope="module")
def chain(ray_session, corpora, tmp_path_factory):
    import ray.data

    v1, delta, merged = corpora
    base = str(tmp_path_factory.mktemp("seg_base"))
    ddir = str(tmp_path_factory.mktemp("seg_delta"))
    ref = str(tmp_path_factory.mktemp("seg_ref"))
    cfg = BuildConfig(**CFG)
    build_index(ray.data.from_arrow(v1), base, cfg)
    build_delta_index(ray.data.from_arrow(delta), [base], ddir, cfg)
    build_index(ray.data.from_arrow(merged), ref, cfg)
    return base, ddir, ref


def _rows(tbl) -> list[tuple]:
    return list(
        zip(
            tbl["combined_id"].to_pylist(),
            [round(s, 9) for s in tbl["score_r"].to_pylist()],
        )
    )


def test_tombstones_recorded(chain):
    base, ddir, _ = chain
    dman = mf.read_manifest(ddir, "delta")
    assert dman["tombstones"][os.path.abspath(base)] == UPDATED


def test_chain_matches_full_rebuild(chain):
    base, ddir, ref = chain
    s_chain = IndexSearch([base, ddir], use_actors=False)
    s_ref = IndexSearch(ref, use_actors=False)
    assert s_chain.total_docs == s_ref.total_docs
    for q in QUERIES:
        got = _rows(s_chain.search(k=20, **q))
        want = _rows(s_ref.search(k=20, **q))
        assert got == want, q


def test_chain_count_and_filter_spec(chain):
    """count_only and filter_spec compose with segment suppression the
    same way scoring does: chain == full rebuild."""
    base, ddir, ref = chain
    s_chain = IndexSearch([base, ddir], use_actors=False)
    s_ref = IndexSearch(ref, use_actors=False)
    for q in ("return", "return value", "delta_token_0", "buffer -return"):
        assert s_chain.count(q) == s_ref.count(q), q
    spec = {"require": ["value"], "exclude": ["buffer"], "promote": ["size"]}
    got = _rows(s_chain.search("return", k=20, filter_spec=spec))
    want = _rows(s_ref.search("return", k=20, filter_spec=spec))
    assert got == want


def test_chain_facets_match_full_rebuild(chain):
    """Facet counting composes with segment suppression: chain facets ==
    facets over the rebuilt corpus-with-replacement (tombstoned copies
    never counted, delta copies counted once)."""
    base, ddir, ref = chain
    s_chain = IndexSearch([base, ddir], use_actors=False)
    s_ref = IndexSearch(ref, use_actors=False)
    for q in ("return", "return value", "delta_token_0", "buffer -return"):
        for by in ("repo", "year", "lang"):
            got = s_chain.facets(q, by=by, k=100).to_pylist()
            want = s_ref.facets(q, by=by, k=100).to_pylist()
            assert got == want, (q, by)


def test_updated_doc_content_wins(chain):
    base, ddir, _ = chain
    s = IndexSearch([base, ddir], use_actors=False)
    # a token that exists only in the delta's rewritten content
    got = s.search("delta_token_0", k=5, decorate=True)
    assert got.num_rows == 1
    # and a token dropped by the rewrite scores identically to the full
    # rebuild (the stale posting is tombstoned; a dup-pool copy of the
    # content may legitimately still match)
    _base, _d, ref = chain
    s_ref = IndexSearch(ref, use_actors=False)
    assert _rows(s.search("uniq_0_0_token", k=5)) == _rows(
        s_ref.search("uniq_0_0_token", k=5)
    )


def test_suppressed_segment_state(chain):
    base, ddir, _ = chain
    seg = _Segment(base, 0, suppress=((ddir, 0),))
    assert seg.tomb is not None and len(seg.tomb) > 0
    assert not seg.has_blocks  # block-max disabled under suppression
    plain = _Segment(base, 0)
    assert plain.has_blocks  # ... but only under suppression


def test_new_repo_in_delta(ray_session, corpora, tmp_path_factory):
    """Delta adding a NEW repo: ids diverge from a fresh rebuild (append-
    only registry vs resorted), so parity is checked on decorated
    (repo, path, score) rows."""
    import ray.data

    v1, delta, merged = corpora
    extra = synthesize_corpus(n_repos=7, files_per_repo=4, seed=23)
    mask = [r == "org0000/repo0006" for r in extra["repo"].to_pylist()]
    extra = extra.filter(pa.array(mask))
    assert extra.num_rows == 4
    delta2 = pa.concat_tables([delta, extra])
    merged2 = pa.concat_tables([merged, extra])

    base = str(tmp_path_factory.mktemp("nseg_base"))
    ddir = str(tmp_path_factory.mktemp("nseg_delta"))
    ref = str(tmp_path_factory.mktemp("nseg_ref"))
    cfg = BuildConfig(**CFG)
    build_index(ray.data.from_arrow(v1), base, cfg)
    build_delta_index(ray.data.from_arrow(delta2), [base], ddir, cfg)
    build_index(ray.data.from_arrow(merged2), ref, cfg)

    reg = load_registry(ddir)
    base_reg = load_registry(base)
    for r in base_reg.repos:  # ids stable for every pre-existing repo
        assert reg.lookup(r) == base_reg.lookup(r)

    s_chain = IndexSearch([base, ddir], use_actors=False)
    s_ref = IndexSearch(ref, use_actors=False)
    assert s_chain.total_docs == s_ref.total_docs
    # document_bonus is excluded: its synthetic topology byte derives from
    # the domain id, and ids for NEW repos are assignment-order-dependent
    # (append-only chain vs resorted rebuild -- reference autoincrement
    # ids have the same property), so that one bonus legitimately differs
    for q in (q for q in QUERIES if not q.get("document_bonus_weight")):
        got = s_chain.search(k=20, decorate=True, **q)
        want = s_ref.search(k=20, decorate=True, **q)
        key = lambda t: sorted(
            zip(
                t["repo"].to_pylist(),
                t["path"].to_pylist(),
                [round(s, 9) for s in t["score_r"].to_pylist()],
            )
        )
        assert key(got) == key(want), q


def test_two_delta_chain(ray_session, corpora, chain, tmp_path_factory):
    """A second delta over [base, delta1], re-updating docs that delta1
    already replaced PLUS untouched base docs: tombstones against each
    prior must stay disjoint (no df double-subtraction) and the 3-segment
    chain must still exactly match a full rebuild."""
    import ray.data

    v1, delta, merged = corpora
    base, d1, _ = chain
    cols = {c: merged[c].to_pylist() for c in merged.column_names}
    n = len(cols["repo"])
    # rows 0 and 4 were updated by delta1; 1..3 come straight from base
    upd2 = [0, 1, 2, 3, 4]
    delta2 = {c: [cols[c][i] for i in upd2] for c in cols}
    delta2["content"] = [
        c + f"\nsecond wave delta2_token_{i}" for i, c in enumerate(delta2["content"])
    ]
    merged2 = {c: list(cols[c]) for c in cols}
    for j, i in enumerate(upd2):
        merged2["content"][i] = delta2["content"][j]
    t_delta2 = pa.table(
        {c: pa.array(delta2[c], merged.schema.field(c).type) for c in cols}
    )
    t_merged2 = pa.table(
        {c: pa.array(merged2[c], merged.schema.field(c).type) for c in cols}
    )

    d2 = str(tmp_path_factory.mktemp("seg_delta2"))
    ref2 = str(tmp_path_factory.mktemp("seg_ref2"))
    cfg = BuildConfig(**CFG)
    build_delta_index(ray.data.from_arrow(t_delta2), [base, d1], d2, cfg)
    build_index(ray.data.from_arrow(t_merged2), ref2, cfg)

    dman = mf.read_manifest(d2, "delta")
    # delta1 already tombstoned rows 0 and 4 in base; delta2 must only
    # tombstone the 3 untouched base rows there, and rows 0+4 in delta1
    assert dman["tombstones"][os.path.abspath(base)] == 3
    assert dman["tombstones"][os.path.abspath(d1)] == 2

    s_chain = IndexSearch([base, d1, d2], use_actors=False)
    s_ref = IndexSearch(ref2, use_actors=False)
    assert s_chain.total_docs == s_ref.total_docs
    for q in QUERIES + [dict(query="delta2_token_0"), dict(query="delta_token_0")]:
        got = _rows(s_chain.search(k=20, **q))
        want = _rows(s_ref.search(k=20, **q))
        assert got == want, q

    out = str(tmp_path_factory.mktemp("seg_compact3"))
    compact_segments([base, d1, d2], out, cfg)
    s_c = IndexSearch(out, use_actors=False)
    for q in QUERIES:
        assert _rows(s_c.search(k=20, **q)) == _rows(s_ref.search(k=20, **q)), q

    # a reordered prior chain must fail LOUDLY (tombstone dirs resolve
    # positionally), before any corpus read
    with pytest.raises(ValueError, match="consistent chain"):
        build_delta_index(None, [d1, base], str(tmp_path_factory.mktemp("x")))


def test_delta_resume(ray_session, corpora, chain, tmp_path_factory):
    """North-rule resumability on the delta path: a crash after the
    segment phases but before the tombstone pass resumes WITHOUT
    rebuilding the segment, and regenerates identical tombstones."""
    import shutil

    import ray.data

    from marginaliasearch_ray.pipelines.delta import (
        correction_dir,
        tombstone_dir,
    )

    _v1, delta, _merged = corpora
    base, _d1, _ref = chain
    d2 = str(tmp_path_factory.mktemp("seg_delta_resume"))
    cfg = BuildConfig(**CFG)
    build_delta_index(ray.data.from_arrow(delta), [base], d2, cfg)
    tomb0 = mf.read_manifest(d2, "delta")["tombstones"]

    # crash simulation: the delta phase's outputs are lost
    shutil.rmtree(tombstone_dir(d2, 0))
    shutil.rmtree(correction_dir(d2, 0))
    os.remove(mf.manifest_path(d2, "delta"))
    seg = os.path.join(d2, "postings", "part=0")
    mtime_before = max(
        os.path.getmtime(os.path.join(seg, f)) for f in os.listdir(seg)
    )

    build_delta_index(ray.data.from_arrow(delta), [base], d2, cfg)
    # segment phases resumed (untouched), tombstones regenerated equal
    mtime_after = max(
        os.path.getmtime(os.path.join(seg, f)) for f in os.listdir(seg)
    )
    assert mtime_after == mtime_before
    assert mf.read_manifest(d2, "delta")["tombstones"] == tomb0


def test_compaction(chain, tmp_path_factory):
    base, ddir, ref = chain
    out = str(tmp_path_factory.mktemp("seg_compact"))
    compact_segments([base, ddir], out, BuildConfig(**CFG))
    s_c = IndexSearch(out, use_actors=False)
    s_ref = IndexSearch(ref, use_actors=False)
    assert s_c.total_docs == s_ref.total_docs
    for q in QUERIES:
        assert _rows(s_c.search(k=20, **q)) == _rows(s_ref.search(k=20, **q)), q
    # compaction restores block-max pruning on the folded segment
    seg = _Segment(out, 0)
    assert seg.has_blocks
    pruned = s_c.search("return value", k=20, pruned=True)
    assert _rows(pruned) == _rows(s_ref.search("return value", k=20))


def test_compaction_rejects_bad_chain(chain, tmp_path_factory):
    """A reordered or base-less segment list must be refused: positional
    tombstone dirs and the registry/stats copies assume base-first
    prefix order (compact_segments chain validation)."""
    base, ddir, _ = chain
    out = str(tmp_path_factory.mktemp("seg_badchain"))
    with pytest.raises(ValueError, match="chain"):
        compact_segments([ddir, base], out, BuildConfig(**CFG))
    with pytest.raises(ValueError, match="chain"):
        compact_segments([ddir], out, BuildConfig(**CFG))


def test_compaction_rejects_plain_segment_after_base(chain, tmp_path_factory):
    base, _, ref = chain
    out = str(tmp_path_factory.mktemp("seg_badchain2"))
    with pytest.raises(ValueError, match="delta manifest"):
        compact_segments([base, ref], out, BuildConfig(**CFG))


def test_delta_id_collision_different_path_raises(
    ray_session, corpora, chain, tmp_path_factory
):
    """A delta doc that reuses an existing (repo, ordinal) under a NEW
    path would silently tombstone the unrelated base document; the
    correction scan must detect the identity mismatch and raise."""
    import ray.data

    v1, _, _ = corpora
    base, _, _ = chain
    bad = pa.table(
        {
            "repo": v1["repo"][:1],
            "path": pa.array(["totally/new_file.py"], pa.string()),
            "commit": v1["commit"][:1],
            "lang": v1["lang"][:1],
            "content": pa.array(["fresh content return value"], pa.string()),
            "ordinal": v1["ordinal"][:1],  # reuses an existing doc's ordinal
        }
    )
    bdir = str(tmp_path_factory.mktemp("seg_badid"))
    with pytest.raises((ValueError, Exception)) as ei:
        build_delta_index(
            ray.data.from_arrow(bad), [base], bdir, BuildConfig(**CFG)
        )
    assert "collision" in str(ei.value) or "collision" in repr(ei.value)


@pytest.fixture(scope="module")
def churn_chain(ray_session, corpora, tmp_path_factory):
    """base + five overlapping churn-delta waves, plus the full rebuild
    of the final corpus and the probe query set (shared by the churn
    parity test and the chain-maintenance tests)."""
    import ray.data

    v1, _, _ = corpora
    cfg = BuildConfig(**CFG)
    cols = {c: v1[c].to_pylist() for c in v1.column_names}
    n = len(cols["repo"])

    base = str(tmp_path_factory.mktemp("churn_base"))
    build_index(ray.data.from_arrow(v1), base, cfg)

    running = {c: list(cols[c]) for c in cols}
    chain_dirs = [base]
    for w in range(5):
        # overlapping sliding window: waves w and w+1 share half
        upd = [(w * 4 + j) % n for j in range(8)]
        delta = {c: [running[c][i] for i in upd] for c in cols}
        delta["content"] = [
            c + f"\nchurn wave{w} churn_token_{w}_{j}"
            for j, c in enumerate(delta["content"])
        ]
        for j, i in enumerate(upd):
            running["content"][i] = delta["content"][j]
        t_delta = pa.table(
            {c: pa.array(delta[c], v1.schema.field(c).type) for c in cols}
        )
        ddir = str(tmp_path_factory.mktemp(f"churn_d{w}"))
        build_delta_index(
            ray.data.from_arrow(t_delta), list(chain_dirs), ddir, cfg
        )
        chain_dirs.append(ddir)

    ref = str(tmp_path_factory.mktemp("churn_ref"))
    t_final = pa.table(
        {c: pa.array(running[c], v1.schema.field(c).type) for c in cols}
    )
    build_index(ray.data.from_arrow(t_final), ref, cfg)

    probes = QUERIES + [
        dict(query="churn_token_4_0"),  # newest wave wins
        dict(query="churn_token_0_0"),  # oldest wave: survives only where
        # later waves did not re-update the doc
    ]
    return chain_dirs, ref, probes


def test_five_delta_churn_chain(churn_chain, tmp_path_factory):
    """Churn contract: five overlapping delta waves (every doc in the
    update window is re-updated by the NEXT wave too, and some docs are
    touched by four waves) must keep the chain value-identical to a full
    rebuild of the final corpus, and compaction must fold the whole
    chain back to the same answers."""
    chain_dirs, ref, probes = churn_chain
    cfg = BuildConfig(**CFG)

    s_chain = IndexSearch(chain_dirs, use_actors=False)
    s_ref = IndexSearch(ref, use_actors=False)
    assert s_chain.total_docs == s_ref.total_docs
    for q in probes:
        assert _rows(s_chain.search(k=20, **q)) == _rows(
            s_ref.search(k=20, **q)
        ), q

    out = str(tmp_path_factory.mktemp("churn_compact"))
    compact_segments(list(chain_dirs), out, cfg)
    s_c = IndexSearch(out, use_actors=False)
    for q in probes:
        assert _rows(s_c.search(k=20, **q)) == _rows(
            s_ref.search(k=20, **q)
        ), q


def test_compaction_blob_merge(chain, tmp_path_factory):
    """Blob-level compaction (strip finished posting blobs + k-way blob
    merge, no journal re-encode) must produce BYTE-IDENTICAL artifacts
    to the journal-rebuild compaction path, and score like the full
    rebuild."""
    import pyarrow.dataset as pads

    base, ddir, ref = chain
    cfg = BuildConfig(**CFG)
    out_r = str(tmp_path_factory.mktemp("seg_compact_rebuild"))
    out_b = str(tmp_path_factory.mktemp("seg_compact_blob"))
    compact_segments([base, ddir], out_r, cfg)
    compact_segments([base, ddir], out_b, cfg, blob_merge=True)

    def canon(root, sub, keys):
        d = os.path.join(root, sub)
        t = pads.dataset(d, partitioning="hive").to_table()
        t = t.sort_by([(k, "ascending") for k in keys])
        return {c: t[c].to_pylist() for c in sorted(t.column_names)}

    for sub, keys in (
        ("postings", ["part", "bucket", "term_id"]),
        ("postings_prio", ["part", "bucket", "term_id"]),
        ("forward", ["part", "combined_id"]),
    ):
        a = canon(out_r, sub, keys)
        b = canon(out_b, sub, keys)
        assert a.keys() == b.keys(), sub
        for c in a:
            assert a[c] == b[c], (sub, c)

    s_b = IndexSearch(out_b, use_actors=False)
    s_ref = IndexSearch(ref, use_actors=False)
    assert s_b.total_docs == s_ref.total_docs
    for q in QUERIES:
        assert _rows(s_b.search(k=20, **q)) == _rows(s_ref.search(k=20, **q)), q
    assert _Segment(out_b, 0).has_blocks
    pruned = s_b.search("return value", k=20, pruned=True)
    assert _rows(pruned) == _rows(s_ref.search("return value", k=20))


@pytest.fixture(scope="module")
def delete_chain(chain, corpora, tmp_path_factory):
    """[base, update-delta, delete-delta] purging one whole repo (whose
    docs include UPDATED copies living in the delta) plus one single
    (repo, path) document of another repo — and the reference rebuild
    over the merged corpus minus the purged docs."""
    import ray.data

    from marginaliasearch_ray.pipelines.build_index import BuildConfig, build_index
    from marginaliasearch_ray.pipelines.delta import build_delete_delta

    base, ddir, _ = chain
    _, _, merged = corpora
    purge_repo = "org0001/repo0001"
    cols = {c: merged[c].to_pylist() for c in merged.column_names}
    pair_idx = next(
        i for i, r in enumerate(cols["repo"]) if r == "org0002/repo0002"
    )
    pair = (cols["repo"][pair_idx], cols["path"][pair_idx])

    ddel = str(tmp_path_factory.mktemp("seg_del"))
    man = build_delete_delta(
        [base, ddir], ddel, repos=[purge_repo], paths=[pair]
    )

    keep = [
        i
        for i in range(len(cols["repo"]))
        if cols["repo"][i] != purge_repo
        and (cols["repo"][i], cols["path"][i]) != pair
    ]
    filtered = pa.table(
        {
            c: pa.array(
                [cols[c][i] for i in keep], merged.schema.field(c).type
            )
            for c in merged.column_names
        }
    )
    ref = str(tmp_path_factory.mktemp("seg_ref_del"))
    # a purge must NOT reassign the surviving repos' domain ids (the
    # registry is append-only), so the reference rebuild reuses the
    # chain's registry — ids then coincide exactly
    build_index(
        ray.data.from_arrow(filtered),
        ref,
        BuildConfig(**CFG),
        registry=load_registry(ddel),
    )
    return base, ddir, ddel, ref, man, len(keep)


def test_delete_delta_manifest(delete_chain, corpora):
    base, ddir, ddel, _, man, _ = delete_chain
    _, _, merged = corpora
    assert man["delete_only"] and man["n_docs"] == 0
    # every live copy is tombstoned exactly once: base copies not already
    # replaced + the replaced copies living in the update delta
    cols = {c: merged[c].to_pylist() for c in merged.column_names}
    n_purged = sum(1 for r in cols["repo"] if r == "org0001/repo0001") + 1
    assert (
        man["tombstones"][os.path.abspath(base)]
        + man["tombstones"][os.path.abspath(ddir)]
        == man["purged_ids"]
    )
    assert man["purged_ids"] == n_purged


def test_delete_chain_matches_filtered_rebuild(delete_chain):
    base, ddir, ddel, ref, _, n_keep = delete_chain
    s_c = IndexSearch([base, ddir, ddel], use_actors=False)
    s_ref = IndexSearch(ref, use_actors=False)
    assert s_c.total_docs == s_ref.total_docs == n_keep
    for q in QUERIES:
        assert _rows(s_c.search(k=20, **q)) == _rows(
            s_ref.search(k=20, **q)
        ), q
    # purged-repo filter returns nothing through the chain
    assert s_c.search("return repo:org0001/repo0001", k=20).num_rows == 0


def test_delete_chain_compaction_both_paths(
    delete_chain, tmp_path_factory
):
    """Compacting [base, delta, delete-delta] physically drops the
    purged docs on BOTH compaction paths and keeps serving parity."""
    base, ddir, ddel, ref, _, n_keep = delete_chain
    cfg = BuildConfig(**CFG)
    s_ref = IndexSearch(ref, use_actors=False)
    for blob in (False, True):
        out = str(
            tmp_path_factory.mktemp(f"seg_del_compact_{'blob' if blob else 'rebuild'}")
        )
        compact_segments([base, ddir, ddel], out, cfg, blob_merge=blob)
        assert mf.read_manifest(out, "root")["n_docs"] == n_keep
        s = IndexSearch(out, use_actors=False)
        for q in QUERIES:
            assert _rows(s.search(k=20, **q)) == _rows(
                s_ref.search(k=20, **q)
            ), (blob, q)
        assert s.search("return repo:org0001/repo0001", k=20).num_rows == 0


def test_update_delta_after_delete(delete_chain, corpora, tmp_path_factory):
    """The chain stays extensible after a delete: an update delta built
    on [base, delta, delete] scores like a rebuild over the filtered
    corpus with the new replacements."""
    import ray.data

    from marginaliasearch_ray.pipelines.build_index import build_index
    from marginaliasearch_ray.pipelines.delta import build_delta_index

    base, ddir, ddel, _, _, _ = delete_chain
    _, _, merged = corpora
    cols = {c: merged[c].to_pylist() for c in merged.column_names}
    upd = [
        i
        for i in range(len(cols["repo"]))
        if cols["repo"][i] == "org0000/repo0000"
    ][:3]
    d2 = {c: [cols[c][i] for i in upd] for c in cols}
    d2["content"] = [c + "\npostdelete refresh_token" for c in d2["content"]]
    d2_tbl = pa.table(
        {c: pa.array(d2[c], merged.schema.field(c).type) for c in cols}
    )

    ddir2 = str(tmp_path_factory.mktemp("seg_delta2"))
    build_delta_index(
        ray.data.from_arrow(d2_tbl), [base, ddir, ddel], ddir2, BuildConfig(**CFG)
    )

    keep_rows = {
        c: [
            (d2["content"][upd.index(i)] if c == "content" and i in upd else cols[c][i])
            for i in range(len(cols["repo"]))
            if cols["repo"][i] != "org0001/repo0001"
            and (cols["repo"][i], cols["path"][i])
            != next(
                (cols["repo"][j], cols["path"][j])
                for j in range(len(cols["repo"]))
                if cols["repo"][j] == "org0002/repo0002"
            )
        ]
        for c in cols
    }
    from marginaliasearch_ray.pipelines.delta import load_registry as _lr

    ref2 = str(tmp_path_factory.mktemp("seg_ref_del2"))
    build_index(
        ray.data.from_arrow(
            pa.table(
                {
                    c: pa.array(keep_rows[c], merged.schema.field(c).type)
                    for c in cols
                }
            )
        ),
        ref2,
        BuildConfig(**CFG),
        registry=_lr(ddel),
    )
    s_c = IndexSearch([base, ddir, ddel, ddir2], use_actors=False)
    s_ref = IndexSearch(ref2, use_actors=False)
    assert s_c.total_docs == s_ref.total_docs
    for q in QUERIES + [dict(query="refresh_token")]:
        assert _rows(s_c.search(k=20, **q)) == _rows(
            s_ref.search(k=20, **q)
        ), q


def test_maintain_chain_tiered(churn_chain, tmp_path_factory):
    """Length-triggered tiered maintenance: fold the oldest 4 of 6
    segments and REBASE the newest two deltas onto the fold — serving
    stays value-identical to the full rebuild, the published pointer
    flips atomically, and a no-trigger call is a no-op."""
    from marginaliasearch_ray.pipelines.delta import maintain_chain

    chain_dirs, ref, probes = churn_chain
    cfg = BuildConfig(**CFG)
    out_root = str(tmp_path_factory.mktemp("maint"))
    chain_path = os.path.join(out_root, "CHAIN.json")

    new_chain = maintain_chain(
        chain_dirs, out_root, cfg, max_segments=3, chain_path=chain_path
    )
    assert len(new_chain) == 3
    assert mf.read_chain(chain_path) == new_chain
    # the rebased deltas carry their lineage
    d3 = mf.read_manifest(new_chain[1], "delta")
    assert d3["prior_dirs"] == [new_chain[0]]
    assert d3["rebased_from"] == os.path.abspath(chain_dirs[4])
    d4 = mf.read_manifest(new_chain[2], "delta")
    assert d4["prior_dirs"] == new_chain[:2]

    s = IndexSearch.from_chain(chain_path, use_actors=False)
    s_ref = IndexSearch(ref, use_actors=False)
    assert s.total_docs == s_ref.total_docs
    for q in probes:
        assert _rows(s.search(k=20, **q)) == _rows(s_ref.search(k=20, **q)), q

    # no trigger -> unchanged
    again = maintain_chain(
        new_chain, str(tmp_path_factory.mktemp("maint_noop")), cfg,
        max_segments=3,
    )
    assert again == [os.path.abspath(d) for d in new_chain]

    # garbage trigger -> full fold to one segment, same answers
    full = maintain_chain(
        new_chain, str(tmp_path_factory.mktemp("maint_full")), cfg,
        max_segments=10, max_tombstone_frac=1e-6,
    )
    assert len(full) == 1
    s_f = IndexSearch(full, use_actors=False)
    assert s_f.total_docs == s_ref.total_docs
    for q in probes:
        assert _rows(s_f.search(k=20, **q)) == _rows(
            s_ref.search(k=20, **q)
        ), q


def test_index_switch_reload(chain, tmp_path_factory):
    """StatefulIndex.switchIndex analog: a handle opened from a pointer
    file swaps to the new chain when the pointer flips (maybe_reload),
    and the swapped-in chain answers identically (chain vs full-rebuild
    parity)."""
    base, ddir, ref = chain
    ptr = str(tmp_path_factory.mktemp("switch") / "CURRENT.json")
    mf.publish_chain([base, ddir], ptr)
    idx = IndexSearch.from_chain(ptr, use_actors=False)
    before = _rows(idx.search("return value", k=10))
    assert idx.maybe_reload() is False  # pointer unchanged -> no-op

    mf.publish_chain([ref], ptr)  # atomic flip to the rebuilt segment
    assert idx.maybe_reload() is True
    assert idx.segment_dirs == [os.path.abspath(ref)]
    assert _rows(idx.search("return value", k=10)) == before
    assert idx.maybe_reload() is False

    # a handle not opened from a pointer can't reload
    bare = IndexSearch(ref, use_actors=False)
    with pytest.raises(ValueError, match="from_chain"):
        bare.maybe_reload()


def test_subscription_feed(chain, corpora):
    """Front-page subscription feed (SearchFrontPageService:59-80
    analog): the NEWEST segment's documents of the subscribed repos
    only, doc-id ordered."""
    from marginaliasearch_ray.pipelines.query import IndexSearch

    base, ddir, _ref = chain
    _v1, delta, _merged = corpora
    ix = IndexSearch([base, ddir], use_actors=False)
    subs = sorted(set(delta["repo"].to_pylist()))[:2]
    feed = ix.subscription_feed(subs, k=1000)
    want = sorted(
        (r, o)
        for r, o in zip(
            delta["repo"].to_pylist(), delta["ordinal"].to_pylist()
        )
        if r in subs
    )
    got = list(zip(feed["repo"].to_pylist(), feed["doc_id"].to_pylist()))
    assert sorted(got) == want and want
    # doc-id ordered
    assert feed["doc_id"].to_pylist() == sorted(feed["doc_id"].to_pylist())
    # an unsubscribed-everything feed is empty
    assert ix.subscription_feed(["nope/none"]).num_rows == 0
