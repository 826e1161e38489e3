"""Search-service result post-processing: UrlDeduplicator +
SearchResultClusterer.byDomain + the ClusteredUrlDetails sibling prune
(SearchOperator.java:191-215, results/UrlDeduplicator.java:29-68,
SearchResultClusterer.java:38-52, ClusteredUrlDetails.java:29-66).

The corpus is built so every branch fires: superficial (path, title)
dedup including the registered-but-dropped blocker ordering, exact
content-hash dedup, the per-domain cap's always-increment counting,
the near-tie sibling prune, the Title-flag protection, and the
worse-than-limit score-branch keep.  The filler corpus is sized so the
four-term conjunction's normalized scores land BELOW the reference's
4.0 score-limit cap for strong matches (prune active) and above it for
tf=1 matches (score-branch keep)."""

import pyarrow as pa
import pytest

from marginaliasearch_ray.pipelines.build_index import BuildConfig, build_index
from marginaliasearch_ray.pipelines.query import IndexSearch

QUERY = "zqalpha zqbravo zqcharl zqdelta"
TERMS = QUERY.split()


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

    hit = " ".join(TERMS)
    # the query terms first appear after token 16 (EARLY_MENTION_POS), so
    # no Subjects flag fires; filenames are flag-free except zqalpha.py
    late = " ".join(f"fill{i}" for i in range(1, 19)) + " "

    def doc(reps, pad):
        return late + (hit + " ") * reps + "pad " * pad

    # repoA ranking (normalized score ascending = presentation order):
    # best(1) < tie(2) < zqalpha(3) < mid1(5) << weak(4) < blocked(7)
    add("orgA/repoA", "src/best.py", doc(40, 0), 1)
    # near-tie sibling, no protecting flag -> PRUNED
    add("orgA/repoA", "src/tie.py", doc(30, 0), 2)
    # near-tie sibling, query term in the filename -> Title flag -> KEPT
    add("orgA/repoA", "src/zqalpha.py", doc(24, 0), 3)
    # weak sibling: tf=1, padded long -> normalized score over the 4.0
    # limit -> KEPT by the score branch
    add("orgA/repoA", "src/weak.py", doc(1, 60), 4)
    # another strong unflagged sibling (also pruned), saturating the
    # domain cap of 5 together with docs 1-4 ...
    add("orgA/repoA", "src/mid1.py", doc(9, 0), 5)
    # ... so this 6th repoA hit is dropped by the cap, but its
    # (path, title) is REGISTERED by the superficial check first
    add("orgA/repoA", "src/blocked.py", doc(1, 420), 7)

    # repoB: its weakest hit shares (path, title) with repoA's
    # cap-dropped doc and ranks below it -> removed by the superficial
    # set even though the blocker itself was never displayed
    add("orgB/repoB", "src/blocked.py", doc(1, 650), 8)
    # exact duplicate content of repoA's best -> content-hash dedup
    add("orgB/repoB", "src/dupe.py", doc(40, 0), 9)
    # a genuine second-cluster hit that survives everything
    add("orgB/repoB", "src/ok.py", doc(8, 0), 10)

    # filler corpus: drives the idf up so the four-term conjunction's
    # normalized scores drop under the reference's 4.0 score-limit cap
    for i in range(900):
        add(f"orgF/filler{i % 20}", f"f/f_{i}.py",
            f"pad{i} fill common words here nothing special {i}", 100 + i)

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
def cluster_index(ray_session, tmp_path_factory):
    import ray.data

    out = str(tmp_path_factory.mktemp("cluster_idx"))
    build_index(
        ray.data.from_arrow(_corpus()),
        out,
        BuildConfig(num_parts=2, num_buckets=4, num_salts=1,
                    hot_df_threshold=10_000),
    )
    return IndexSearch(out, use_actors=False)


def _rows(tbl):
    return list(
        zip(
            tbl["cluster_rank"].to_pylist(),
            tbl["member_rank"].to_pylist(),
            tbl["repo"].to_pylist(),
            tbl["doc_id"].to_pylist(),
            tbl["score_r"].to_pylist(),
        )
    )


def test_flags_or_column(cluster_index):
    res = cluster_index.search(
        QUERY, k=20, normalize_score=True, decorate=True, collect_flags=True
    )
    flags = dict(zip(res["doc_id"].to_pylist(), res["flags_or"].to_pylist()))
    # zqalpha is a token of src/zqalpha.py's filename and path: Title
    # (bit 0) and UrlPath (bit 6)
    assert flags[3] & 1, "Title flag missing on the filename-term doc"
    assert flags[3] & (1 << 6), "UrlPath flag missing"
    # the near-tie doc has the terms only in its body
    assert flags[2] == 0
    # presentation order sanity for everything the assertions below rely
    # on: strong docs under the 4.0 cap, weak docs above it, blocked
    # after weak, repoB's blocked after repoA's
    score = dict(zip(res["doc_id"].to_pylist(), res["score_r"].to_pylist()))
    assert score[1] < score[2] < score[3] < score[5] < 4.0
    assert 4.0 < score[4] < score[7] < score[8]


def test_clustered_display(cluster_index):
    tbl = cluster_index.search_clustered(QUERY)
    rows = _rows(tbl)
    shown = {r[3] for r in rows}

    # cluster 1 = repoA: best first, pruned near-ties gone, Title-flagged
    # near-tie kept, weak sibling kept by the score branch
    assert (1, 1, "orgA/repoA", 1) == rows[0][:4]
    assert 2 not in shown, "unprotected near-tie sibling must be pruned"
    assert 5 not in shown, "unprotected near-tie sibling must be pruned"
    assert 3 in shown, "Title-flagged near-tie sibling must survive"
    assert 4 in shown, "worse-than-limit sibling survives via score branch"

    # dedup behavior
    assert 9 not in shown, "exact content duplicate must be hash-deduped"
    assert 7 not in shown, "6th same-domain hit is over the cap"
    assert 8 not in shown, (
        "(path,title) was registered by the cap-dropped blocker; the "
        "later sighting must still be superficially deduped"
    )
    assert 10 in shown, "repoB's clean hit survives as its cluster's first"

    # repoB's cluster comes after repoA's: cluster order follows the
    # BEST member, even though repoA's last shown member scores worse
    # than repoB's best
    b = next(r for r in rows if r[3] == 10)
    assert b[0] == 2 and b[1] == 1 and b[2] == "orgB/repoB"

    # structural invariants: contiguous cluster ranks, member_rank
    # restarts at 1, presentation order within a cluster
    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r[0], []).append(r)
    assert sorted(by_cluster) == list(range(1, len(by_cluster) + 1))
    for members in by_cluster.values():
        assert [m[1] for m in members] == list(range(1, len(members) + 1))
        scores = [m[4] for m in members]
        assert scores[0] == min(scores)


def test_cluster_total_limit(cluster_index):
    tbl = cluster_index.search_clustered("pad", total=3)
    assert max(tbl["cluster_rank"].to_pylist() or [0]) <= 3


def test_site_query_noop_clustering(cluster_index):
    """repo: queries lift the per-domain cap (QueryFactory.java:170-175)
    and cluster noOp — one cluster per result, no cluster-total limit."""
    t = cluster_index.search_clustered("zqalpha repo:orgA/repoA", total=2)
    # 6 repoA docs match; cap would have kept 5 and byDomain would have
    # folded them into ONE cluster — noOp emits one cluster per result
    # and ignores the total
    assert t.num_rows == 6
    assert t["cluster_rank"].to_pylist() == list(range(1, 7))
    assert t["member_rank"].to_pylist() == [1] * 6
    scores = t["score_r"].to_pylist()
    assert scores == sorted(scores)
