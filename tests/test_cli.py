"""The `ray job submit` surface: python -m marginaliasearch_ray
build/delta/query/compact driven in-process (main() reuses the session's
Ray and leaves it running)."""

import json

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from marginaliasearch_ray.__main__ import main
from marginaliasearch_ray.sources.corpus import synthesize_corpus, write_corpus


@pytest.fixture(scope="module")
def cli_dirs(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    corpus = str(root / "corpus.parquet")
    write_corpus(synthesize_corpus(4, 10, seed=3), corpus)
    t = pq.read_table(corpus).slice(0, 6)
    t = t.set_column(
        t.schema.get_field_index("content"),
        "content",
        pc.binary_join_element_wise(
            t["content"], pa.array([" clifresh"] * len(t)), ""
        ),
    )
    delta = str(root / "delta.parquet")
    pq.write_table(t, delta)
    return root, corpus, delta


def _run(args, capsys) -> list[str]:
    assert main(args) == 0
    return [l for l in capsys.readouterr().out.splitlines() if l.strip()]


def test_cli_roundtrip(cli_dirs, capsys):
    import ray

    root, corpus, delta = cli_dirs
    common = ["--num-parts", "2", "--num-buckets", "4"]
    out = _run(
        ["build", "--corpus", corpus, "--out", str(root / "base"), *common],
        capsys,
    )
    assert json.loads(out[-1])["n_docs"] == 40
    out = _run(
        ["delta", "--corpus", delta, "--prior", str(root / "base"),
         "--out", str(root / "d1"), *common],
        capsys,
    )
    assert sum(json.loads(out[-1])["tombstones"].values()) == 6
    out = _run(
        ["query", "--index", str(root / "base"), "--index", str(root / "d1"),
         "-k", "3", "clifresh"],
        capsys,
    )
    rows = [json.loads(l) for l in out]
    assert len(rows) == 3 and all("score_r" in r for r in rows)
    out = _run(
        ["compact", "--segment", str(root / "base"),
         "--segment", str(root / "d1"), "--out", str(root / "c"), *common],
        capsys,
    )
    assert json.loads(out[-1])["n_docs"] == 40
    # index-switch analog: publish the chain pointer, query through it,
    # then flip it to the compacted segment — same results both ways
    chain = str(root / "CURRENT.json")
    _run(["publish", "--segment", str(root / "base"),
          "--segment", str(root / "d1"), "--chain", chain], capsys)
    via_chain = [
        json.loads(l)
        for l in _run(["query", "--chain", chain, "-k", "3", "clifresh"], capsys)
    ]
    assert [r["combined_id"] for r in via_chain] == [
        r["combined_id"] for r in rows
    ]
    _run(["publish", "--segment", str(root / "c"), "--chain", chain], capsys)
    flipped = [
        json.loads(l)
        for l in _run(["query", "--chain", chain, "-k", "3", "clifresh"], capsys)
    ]
    assert [(r["combined_id"], r["score_r"]) for r in flipped] == [
        (r["combined_id"], r["score_r"]) for r in rows
    ]
    # batch mode: concurrent search_many over a query file, one JSON
    # object per input query, results identical to the serial query
    qfile = root / "queries.txt"
    qfile.write_text("clifresh\nclifresh\n")
    out = _run(
        ["query", "--chain", chain, "-k", "3", "--batch", str(qfile)],
        capsys,
    )
    batched = [json.loads(l) for l in out]
    assert [r["query"] for r in batched] == ["clifresh", "clifresh"]
    for r in batched:
        assert [x["combined_id"] for x in r["results"]] == [
            x["combined_id"] for x in flipped
        ]
    # the CLI must not have torn down the session fixture's Ray
    assert ray.is_initialized()


def test_cli_delete_and_maintain(cli_dirs, capsys):
    """delete (tombstone-only purge) and maintain (tiered fold + pointer
    republish) through the job CLI."""
    import os

    root, corpus, delta = cli_dirs
    common = ["--num-parts", "2", "--num-buckets", "4"]
    # purge one whole repo from [base, d1] (both built by the roundtrip
    # test, module-scoped fixture order guarantees they exist)
    # purge the LAST repo — the clifresh delta updated docs of the first
    # one, and those must survive the purge for the final query check
    repo = pq.read_table(corpus)["repo"].to_pylist()[-1]
    out = _run(
        ["delete", "--prior", str(root / "base"), "--prior", str(root / "d1"),
         "--out", str(root / "del1"), "--repo", repo],
        capsys,
    )
    man = json.loads(out[-1])
    assert man["delete_only"] and man["purged_ids"] == 10
    out = _run(
        ["query", "--index", str(root / "base"), "--index", str(root / "d1"),
         "--index", str(root / "del1"), "--count", f"repo:{repo} file"],
        capsys,
    )
    assert json.loads(out[-1])["n"] == 0

    # maintain: 3 segments > max 2 -> fold [base, d1], rebase del1
    chain = str(root / "MAINT.json")
    _run(["publish", "--segment", str(root / "base"),
          "--segment", str(root / "d1"), "--segment", str(root / "del1"),
          "--chain", chain], capsys)
    out = _run(
        ["maintain", "--chain", chain, "--out-root", str(root / "gen1"),
         "--max-segments", "2", *common],
        capsys,
    )
    res = json.loads(out[-1])
    assert res["folded"] and len(res["chain"]) == 2
    out = _run(
        ["query", "--chain", chain, "--count", f"repo:{repo} file"], capsys
    )
    assert json.loads(out[-1])["n"] == 0
    out = _run(["query", "--chain", chain, "-k", "3", "clifresh"], capsys)
    assert len(out) == 3


def test_cli_vecstore_lifecycle(ray_session, tmp_path, capsys):
    """vecstore build/append/topk/compact round trip; topk results are
    stable across the compaction fold."""
    import numpy as np

    rng = np.random.RandomState(11)
    mat = rng.standard_normal((30, 6))

    def emb(path, ids, m):
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array(list(ids), pa.int64()),
                    "embedding": pa.array(
                        [list(map(float, r)) for r in m],
                        pa.list_(pa.float64()),
                    ),
                }
            ),
            path,
        )

    base = str(tmp_path / "base.parquet")
    delta = str(tmp_path / "delta.parquet")
    emb(base, range(20), mat[:20])
    emb(delta, list(range(20, 30)) + [4], np.vstack([mat[20:30], -mat[[4]]]))
    store = str(tmp_path / "store")

    out = _run(["vecstore", "build", "--store", store, "--embeddings", base,
                "--kind", "ivf", "--n-centroids", "4"], capsys)
    assert json.loads(out[-1])["generations"] == 1
    out = _run(["vecstore", "append", "--store", store,
                "--embeddings", delta], capsys)
    assert json.loads(out[-1]) == {"generation": 1, "n_vectors": 11}
    topk = [
        json.loads(l)
        for l in _run(["vecstore", "topk", "--store", store, "--embeddings",
                       base, "--vec-id", "0", "-k", "5", "--nprobe", "2"],
                      capsys)
    ]
    assert len(topk) == 5 and topk[0]["vec_id"] == 0
    out = _run(["vecstore", "compact", "--store", store], capsys)
    assert json.loads(out[-1]) == {"generations_folded": 2, "n_vectors": 30}
    topk2 = [
        json.loads(l)
        for l in _run(["vecstore", "topk", "--store", store, "--embeddings",
                       base, "--vec-id", "0", "-k", "5", "--nprobe", "2"],
                      capsys)
    ]
    assert topk2 == topk


def test_cli_stats(cli_dirs, capsys):
    """stats surfaces the committed manifests' lineage + metrics without
    a Ray session (pure file op), for single segments and chains."""
    root, _corpus, _delta = cli_dirs
    out = _run(["stats", "--segment", str(root / "base"),
                "--segment", str(root / "d1")], capsys)
    segs = json.loads(out[-1])
    assert len(segs) == 2
    base, d1 = segs
    assert base["n_docs"] == 40 and base["num_parts"] == 2
    assert set(base["phases"]) >= {"journal", "stats", "forward",
                                   "reverse", "prio"}
    jl = base["phases"]["journal"]
    assert sum(jl["per_part_docs"].values()) == 40 and jl["bytes"] > 0
    # the delta records its tombstones + priors
    assert "delta" in d1["phases"]
    assert sum(d1["phases"]["delta"]["tombstones"].values()) == 6


def test_cli_stats_relocated_segment(cli_dirs, tmp_path, capsys):
    """stats rebases the manifests' build-time paths onto the segment's
    CURRENT location, so a copied/rsynced segment reports real sizes."""
    import shutil

    root, _corpus, _delta = cli_dirs
    moved = str(tmp_path / "relocated_base")
    shutil.copytree(str(root / "base"), moved)
    out = _run(["stats", "--segment", moved], capsys)
    seg = json.loads(out[-1])[0]
    jl = seg["phases"]["journal"]
    assert jl["bytes"] > 0 and "missing_files" not in jl


def test_cli_batch_count(cli_dirs, capsys):
    """query --batch --count prints one {query, n} per input line."""
    root, _corpus, _delta = cli_dirs
    qfile = root / "count_queries.txt"
    qfile.write_text("clifresh\nreturn\n")
    out = _run(
        ["query", "--index", str(root / "base"), "--index", str(root / "d1"),
         "--count", "--batch", str(qfile)],
        capsys,
    )
    rows = [json.loads(l) for l in out]
    assert [r["query"] for r in rows] == ["clifresh", "return"]
    assert rows[0]["n"] == 6 and rows[1]["n"] > 0


def test_cli_facet(cli_dirs, capsys):
    """query --facet prints (key, n) rows ordered n DESC, key ASC; the
    chain facet equals the sum over the same base+delta candidates."""
    root, _corpus, _delta = cli_dirs
    out = _run(
        ["query", "--index", str(root / "base"), "--index", str(root / "d1"),
         "--facet", "repo", "clifresh"],
        capsys,
    )
    rows = [json.loads(l) for l in out]
    assert sum(r["n"] for r in rows) == 6
    assert rows == sorted(rows, key=lambda r: (-r["n"], r["repo"]))


def test_cli_serve_facet(cli_dirs, capsys, monkeypatch):
    """serve answers a facet request line."""
    import sys as _sys

    from marginaliasearch_ray.state import manifest as mf

    root, _corpus, _delta = cli_dirs
    chain = str(root / "SERVE_FACET.json")
    mf.publish_chain([str(root / "base"), str(root / "d1")], chain)

    class Lines:
        def __iter__(self):
            yield '{"query": "clifresh", "facet": "repo", "facet_k": 2}\n'
            # malformed requests must get error replies, not kill serve
            yield '{"query": "clifresh", "facet": "repos"}\n'
            yield '{"facet": "repo"}\n'
            yield '{"query": "clifresh", "count": true}\n'

    monkeypatch.setattr(_sys, "stdin", Lines())
    out = _run(["serve", "--chain", chain], capsys)
    rows = [json.loads(l) for l in out]
    assert len(rows[0]["facets"]) <= 2
    assert all({"repo", "n"} <= set(f) for f in rows[0]["facets"])
    assert "unknown facet key" in rows[1]["error"]
    assert "error" in rows[2]
    assert rows[3]["n"] == 6  # loop survived the bad requests


def test_cli_serve_follows_pointer_flip(cli_dirs, capsys, monkeypatch):
    """serve answers stdin queries and picks up a chain-pointer flip
    BETWEEN queries (the long-running StatefulIndex switch story): the
    same query re-asked after the flip answers from the new chain, and
    a reloaded event is emitted."""
    import io
    import sys as _sys

    from marginaliasearch_ray.state import manifest as mf

    root, _corpus, _delta = cli_dirs
    chain = str(root / "SERVE.json")
    mf.publish_chain([str(root / "base"), str(root / "d1")], chain)

    class FlippingStdin:
        """Yields 3 query lines, republishing the pointer to the
        compacted segment after the first one."""

        def __iter__(self):
            yield "clifresh\n"
            mf.publish_chain([str(root / "c")], chain)
            yield '{"query": "clifresh", "k": 3}\n'
            yield '{"query": "clifresh", "count": true}\n'

    monkeypatch.setattr(_sys, "stdin", FlippingStdin())
    out = _run(["serve", "--chain", chain, "-k", "3"], capsys)
    rows = [json.loads(l) for l in out]
    assert [r["combined_id"] for r in rows[0]["results"]] == [
        r["combined_id"] for r in rows[2]["results"]
    ]
    assert rows[1] == {"event": "reloaded",
                       "segments": [str(root / "c")]}
    assert rows[3]["n"] == 6


def test_cli_rank(ray_session, tmp_path, capsys):
    """`rank` — the SearchSetsService.recalculate analog: NDJSON rank
    rows over a documents-shaped parquet + a RankingSearchSet file."""
    import numpy as np

    docs = pa.table(
        {
            "doc_id": pa.array(range(60), pa.int64()),
            "source": pa.array(
                [f"r{str(i % 6)}" for i in range(60)], pa.string()
            ),
            "n_chars": pa.array([13 * i % 47 for i in range(60)], pa.int64()),
        }
    )
    path = str(tmp_path / "docs.parquet")
    pq.write_table(docs, path)
    set_file = str(tmp_path / "set.txt")
    out = _run(
        ["rank", "--documents", path, "--depth", "4",
         "--max-meaningful-rank", "6", "--iters", "15",
         "--tolerance", "0", "--search-set", set_file],
        capsys,
    )
    rows = [json.loads(l) for l in out]
    assert [r["pos"] for r in rows] == [0, 1, 2, 3]
    prs = [r["pr"] for r in rows]
    assert prs == sorted(prs, reverse=True) and len(set(prs)) > 1
    assert rows[0]["rank_scaled"] == 1
    assert rows[1]["rank_scaled"] == int(255 / 6)
    with open(set_file) as f:
        names = [l.strip() for l in f]
    assert names == sorted(r["repo"] for r in rows)

    # numpy twin over the same derivation
    from marginaliasearch_ray.pipelines.ranking import (
        link_edges,
        pagerank,
        rank_positions,
    )
    import ray.data

    repos = sorted(set(docs["source"].to_pylist()))
    edges = link_edges(ray.data.from_arrow(docs), repos)
    scores = pagerank(edges, repos, max_iterations=15, tolerance=0.0)
    want = rank_positions(repos, scores, 4)
    assert [(r["repo"], r["pr"], r["pos"]) for r in rows] == want


def test_cli_adjacency(ray_session, tmp_path, capsys):
    """`adjacency` — neighbors NDJSON matches the pipeline; similar/
    linking decorate the subject domain's rows."""
    docs = pa.table(
        {
            "doc_id": pa.array(range(80), pa.int64()),
            "source": pa.array(
                [f"r{str(i % 8)}" for i in range(80)], pa.string()
            ),
            "n_chars": pa.array([13 * i % 47 for i in range(80)], pa.int64()),
        }
    )
    path = str(tmp_path / "docs.parquet")
    pq.write_table(docs, path)
    out = _run(
        ["adjacency", "neighbors", "--documents", path,
         "--min-card", "2", "--threshold", "0.1"],
        capsys,
    )
    rows = [json.loads(l) for l in out]
    assert rows and all(r["relatedness"] > 0.1 for r in rows)
    doms = {r["domain"] for r in rows}
    subject = sorted(doms)[0]
    out2 = _run(
        ["adjacency", "similar", "--documents", path, "--min-card", "2",
         "--threshold", "0.1", "--domain", subject, "--count", "3"],
        capsys,
    )
    srows = [json.loads(l) for l in out2]
    assert 0 < len(srows) <= 3
    assert {"neighbor", "relatedness", "rank", "link_type"} <= set(srows[0])
    out3 = _run(
        ["adjacency", "linking", "--documents", path, "--min-card", "2",
         "--threshold", "0.1", "--domain", subject],
        capsys,
    )
    lrows = [json.loads(l) for l in out3]
    assert lrows and all(
        r["link_type"] in {"FOWARD", "BACKWARD", "BIDIRECTIONAL", "NONE"}
        for r in lrows
    )


def test_cli_spell(ray_session, tmp_path, capsys):
    """`spell build/correct` — SymSpell index lifecycle."""
    docs = pa.table(
        {"text": pa.array(["merge table query", "merge sort row"] * 3)}
    )
    path = str(tmp_path / "docs.parquet")
    pq.write_table(docs, path)
    idx = str(tmp_path / "spellix")
    out = _run(["spell", "build", "--documents", path, "--index", idx],
               capsys)
    meta = json.loads(out[-1])
    assert meta["words"] == 5 and meta["keys"] > meta["words"]
    out2 = _run(
        ["spell", "correct", "mrege", "tabel", "zzz", "--index", idx],
        capsys,
    )
    rows = {json.loads(l)["input"]: json.loads(l) for l in out2}
    assert rows["mrege"]["suggestions"][0]["term"] == "merge"
    assert rows["mrege"]["suggestions"][0]["dist"] == 1
    assert rows["tabel"]["suggestions"][0]["term"] == "table"
    assert rows["zzz"]["suggestions"] == []


def test_cli_clustered_and_positions(cli_dirs, capsys):
    """--clustered (display pipeline) and --positions (braille punch
    cards) on the query command."""
    root, corpus, delta = cli_dirs
    out = _run(
        ["query", "--index", str(root / "base"), "--clustered", "license"],
        capsys,
    )
    rows = [json.loads(l) for l in out]
    assert rows and all(
        set(r) == {"cluster_rank", "member_rank", "repo", "doc_id", "score_r"}
        for r in rows
    )
    assert rows[0]["cluster_rank"] == 1 and rows[0]["member_rank"] == 1
    out2 = _run(
        ["query", "--index", str(root / "base"), "--positions", "-k", "2",
         "license"],
        capsys,
    )
    rows2 = [json.loads(l) for l in out2]
    assert rows2 and all(
        len(r["positions"]) == 8
        and all(0x2800 <= ord(c) <= 0x28FF for c in r["positions"])
        and "positions_mask" in r
        for r in rows2
    )


def test_cli_serve_clustered(cli_dirs, capsys, monkeypatch):
    """serve answers a clustered display request line."""
    import sys as _sys

    from marginaliasearch_ray.state import manifest as mf

    root, _corpus, _delta = cli_dirs
    chain = str(root / "SERVE_CLUSTER.json")
    mf.publish_chain([str(root / "base")], chain)

    class Lines:
        def __iter__(self):
            yield '{"query": "license", "clustered": true}\n'

    monkeypatch.setattr(_sys, "stdin", Lines())
    out = _run(["serve", "--chain", chain], capsys)
    rows = [json.loads(l) for l in out]
    clusters = rows[0]["clusters"]
    assert clusters and clusters[0]["cluster_rank"] == 1
    assert all(
        {"cluster_rank", "member_rank", "repo", "doc_id", "score_r"}
        <= set(c)
        for c in clusters
    )


def test_cli_profile(cli_dirs, capsys):
    """--profile applies a named filter; --search-set resolves set names."""
    root, _corpus, _delta = cli_dirs
    # wiki profile: generator:wiki fires on ordinal % 7 == 3
    out = _run(
        ["query", "--index", str(root / "base"), "--profile", "wiki",
         "-k", "40", "license"],
        capsys,
    )
    rows = [json.loads(l) for l in out]
    assert rows and all(r["doc_id"] % 7 == 3 for r in rows)
    # default profile needs the POPULAR set resolved
    out2 = _run(
        ["query", "--index", str(root / "base"), "--profile", "default",
         "--search-set", "POPULAR=org0000/repo0000", "-k", "40", "license"],
        capsys,
    )
    rows2 = [json.loads(l) for l in out2]
    assert rows2


def test_cli_serve_profile(cli_dirs, capsys, monkeypatch):
    """serve answers a profile request line."""
    import sys as _sys

    from marginaliasearch_ray.state import manifest as mf

    root, _corpus, _delta = cli_dirs
    chain = str(root / "SERVE_PROFILE.json")
    mf.publish_chain([str(root / "base")], chain)

    class Lines:
        def __iter__(self):
            yield '{"query": "license", "profile": "wiki", "k": 40}\n'

    monkeypatch.setattr(_sys, "stdin", Lines())
    out = _run(["serve", "--chain", chain], capsys)
    rows = json.loads(out[0])["results"]
    assert rows and all(r["doc_id"] % 7 == 3 for r in rows)
