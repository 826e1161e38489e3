"""Serving resilience + ranking-params bundle: a killed searcher actor
is respawned over the same immutable segment files and the query answers
identically; RankingParams splats into search() like the reference's
RpcResultRankingParameters message."""

import pytest

from marginaliasearch_ray.pipelines.build_index import BuildConfig, build_index
from marginaliasearch_ray.pipelines.query import IndexSearch, RankingParams
from marginaliasearch_ray.sources.corpus import synthesize_corpus


@pytest.fixture(scope="module")
def small_index(ray_session, tmp_path_factory):
    import ray.data

    out = str(tmp_path_factory.mktemp("resil_idx"))
    build_index(
        ray.data.from_arrow(synthesize_corpus(4, 12, seed=9)),
        out,
        BuildConfig(num_parts=2, num_buckets=4),
    )
    return out


def test_actor_death_respawn(small_index):
    import ray

    idx = IndexSearch(small_index, use_actors=True)
    before = idx.search("license import", k=5)
    assert before.num_rows > 0
    ray.kill(idx.searchers[0])
    after = idx.search("license import", k=5)
    assert after.to_pylist() == before.to_pylist()
    idx.shutdown()


def test_search_many_matches_serial(small_index):
    """Concurrent batch serving (maxSimultaneousQueries=8 analog,
    IndexQueryExecution.java:55-56) returns bit-identical results to
    serial search() calls, in input order, including under a dead-actor
    respawn racing the in-flight batch."""
    import ray

    idx = IndexSearch(small_index, use_actors=True)
    batch = [
        "license import",
        ("merge_buffer -license", {}),
        ('"license import"', {"k": 3}),
        ("copyright return", {"verbatim_weight": 1.0, "k": 5}),
        ("parse_tree visitor", {"normalize_score": True}),
    ] * 3
    serial = [
        idx.search(q) if isinstance(q, str) else idx.search(q[0], **q[1])
        for q in batch
    ]
    conc = idx.search_many(batch, max_in_flight=8)
    assert [t.to_pylist() for t in conc] == [t.to_pylist() for t in serial]
    # a killed actor mid-pool doesn't poison the batch path
    ray.kill(idx.searchers[-1])
    conc2 = idx.search_many(batch[:5], max_in_flight=4)
    assert [t.to_pylist() for t in conc2] == [
        t.to_pylist() for t in serial[:5]
    ]
    idx.shutdown()


def test_batch_eval_matches_serial(small_index):
    """batch_eval (queries Dataset map_batches against the shared
    searcher actor pool) returns, per qid, exactly the serial search()
    rows — full order parity including score columns."""
    import ray.data

    idx = IndexSearch(small_index, use_actors=True)
    queries = [
        "license import",
        "merge_buffer -license",
        '"license import"',
        "copyright return",
        "parse_tree visitor",
        "no_such_token_anywhere",
    ]
    qds = ray.data.from_items(
        [{"qid": i, "query": s} for i, s in enumerate(queries)]
    )
    out = idx.batch_eval(
        qds, k=5, eval_concurrency=2, eval_batch_size=2
    ).to_pandas()
    for i, s in enumerate(queries):
        got = (
            out[out["qid"] == i]
            .drop(columns=["qid"])
            .reset_index(drop=True)
        )
        want = idx.search(s, k=5).to_pandas()
        assert got.equals(want), s
    # extra kwargs thread through to every query in the set
    out_v = idx.batch_eval(
        qds, k=5, eval_concurrency=2, verbatim_weight=1.0
    ).to_pandas()
    want_v = idx.search("copyright return", k=5, verbatim_weight=1.0)
    got_v = (
        out_v[out_v["qid"] == 3]
        .drop(columns=["qid"])
        .reset_index(drop=True)
    )
    assert got_v.equals(want_v.to_pandas())
    idx.shutdown()


def test_local_handle_refuses_pickle(small_index):
    """A use_actors=False handle holds full in-process segment state —
    shipping it to workers must fail loudly, not serialize gigabytes."""
    import pickle

    idx = IndexSearch(small_index, use_actors=False)
    with pytest.raises(TypeError, match="cannot be pickled"):
        pickle.dumps(idx)


def test_ranking_params_bundle(small_index):
    idx = IndexSearch(small_index, use_actors=False)
    params = RankingParams(verbatim_weight=1.0, proximity_weight=0.5,
                           flags_weight=1.0)
    a = idx.search("license import", k=5, **params.kwargs())
    b = idx.search("license import", k=5, verbatim_weight=1.0,
                   proximity_weight=0.5, flags_weight=1.0)
    assert a.to_pylist() == b.to_pylist()
    # and the bundle genuinely changes scores vs the bare query
    bare = idx.search("license import", k=5)
    assert a["score_r"].to_pylist() != bare["score_r"].to_pylist()


def test_replicas_identical_and_distributed(small_index):
    """replicas=2 spawns two actors per (segment, part), fan-outs
    round-robin across them, and every answer is identical to the
    single-replica handle (segments are immutable — replicas need no
    coordination)."""
    idx1 = IndexSearch(small_index, use_actors=True)
    idx2 = IndexSearch(small_index, use_actors=True, replicas=2)
    assert all(len(rs) == 2 for rs in idx2._replica_sets)
    # distinct actor handles per replica slot
    for rs in idx2._replica_sets:
        assert rs[0] != rs[1]
    for q in ["license import", "merge_buffer -license", '"license import"']:
        a = idx1.search(q, k=5)
        # consecutive searches hit different replicas (the rr counter
        # advances per fan-out) — both must equal the primary answer
        b1 = idx2.search(q, k=5)
        b2 = idx2.search(q, k=5)
        assert a.to_pylist() == b1.to_pylist() == b2.to_pylist()
    idx1.shutdown()
    idx2.shutdown()


def test_replica_death_respawn(small_index):
    """A killed replica is respawned by the retry path and queries keep
    answering identically."""
    import ray

    idx = IndexSearch(small_index, use_actors=True, replicas=2)
    before = idx.search("license import", k=5)
    # kill one replica in every set (both the primary slot and the
    # second slot across different parts, to exercise both branches)
    ray.kill(idx._replica_sets[0][1])
    ray.kill(idx._replica_sets[-1][0])
    after = [idx.search("license import", k=5) for _ in range(4)]
    for t in after:
        assert t.to_pylist() == before.to_pylist()
    idx.shutdown()
