"""Compaction-path benchmark: journal-rebuild vs blob-level merge.

Builds the synthetic source-code corpus (default 600x1600 = 960k docs,
matching BASELINE.md's at-scale samples), a base index, and ONE delta
over ~3.2% churned docs — then folds [base, delta] into a single
segment both ways:

  * ``compact_segments(..., blob_merge=False)`` — merge journals minus
    tombstones, re-run the derived phases (tokenize skipped; r3 measured
    0.57x a full rebuild at 960k docs), and
  * ``compact_segments(..., blob_merge=True)`` — strip finished posting
    blobs of tombstoned ids and k-way merge the blobs per (part, bucket);
    the journal is never re-encoded.

Asserts both serve identical results on a mixed query set, then prints
one JSON line with the timings and the blob/rebuild ratio.

Usage: python tools/compact_bench.py [repos files [num_cpus]]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    repos = int(sys.argv[1]) if len(sys.argv) > 1 else 600
    files = int(sys.argv[2]) if len(sys.argv) > 2 else 1600
    ncpu = (
        int(sys.argv[3])
        if len(sys.argv) > 3
        else int(os.environ.get("RAY_GRAFT_CPUS", "16"))
    )

    import ray

    ray.init(
        address="local",
        num_cpus=ncpu,
        include_dashboard=False,
        logging_level="ERROR",
    )
    import pyarrow as pa
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False

    from marginaliasearch_ray.pipelines.build_index import (
        BuildConfig,
        build_index,
    )
    from marginaliasearch_ray.pipelines.delta import (
        build_delta_index,
        compact_segments,
    )
    from marginaliasearch_ray.pipelines.query import IndexSearch
    from marginaliasearch_ray.sources.corpus import (
        synthesize_corpus,
        write_corpus,
    )

    corpus_path = f"/tmp/msray_bench_corpus_{repos}x{files}.parquet"
    if not os.path.exists(corpus_path):
        write_corpus(synthesize_corpus(repos, files, seed=42), corpus_path)
    n_docs = repos * files

    cfg = BuildConfig(
        num_parts=8,
        num_buckets=32,
        num_salts=4,
        hot_df_threshold=2000,
        segment_commits=False,
    )

    # scratch root keyed by corpus size so a smoke run can never clobber
    # (and silently substitute for) an at-scale base
    root = f"/tmp/msray_compact_bench_{repos}x{files}"
    # MSRAY_COMPACT_REUSE=1 keeps the (expensive) base+delta builds from a
    # previous run and re-times only the compaction legs
    if os.environ.get("MSRAY_COMPACT_REUSE") == "1":
        for leg in ("compact_rebuild", "compact_blob"):
            shutil.rmtree(os.path.join(root, leg), ignore_errors=True)
    else:
        shutil.rmtree(root, ignore_errors=True)
    base = os.path.join(root, "base")
    timings: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.time()
        out = fn()
        timings[name] = round(time.time() - t0, 3)
        return out

    timed(
        "base_build",
        lambda: build_index(rd.read_parquet(corpus_path), base, cfg),
    )
    from marginaliasearch_ray.state import manifest as mf

    built = int(mf.read_manifest(base, "root")["n_docs"])
    assert built == n_docs, f"stale base: {built} docs != expected {n_docs}"

    # ~3.2% churn: every 31st ordinal gets appended content (the delta
    # REPLACES those docs, tombstoning their base postings)
    def delta_corpus():
        def mutate(batch: pa.Table) -> pa.Table:
            ords = batch["ordinal"].to_numpy(zero_copy_only=False)
            sel = batch.filter(pa.array(ords % 31 == 0))
            content = pa.array(
                [c + "\nchurn compactbench" for c in sel["content"].to_pylist()],
                pa.string(),
            )
            return sel.set_column(
                sel.schema.get_field_index("content"), "content", content
            )

        return rd.read_parquet(corpus_path).map_batches(
            mutate, batch_format="pyarrow"
        )

    ddir = os.path.join(root, "delta")
    timed("delta_build", lambda: build_delta_index(delta_corpus(), [base], ddir, cfg))

    out_r = os.path.join(root, "compact_rebuild")
    out_b = os.path.join(root, "compact_blob")
    timed("compact_rebuild", lambda: compact_segments([base, ddir], out_r, cfg))
    timed(
        "compact_blob",
        lambda: compact_segments([base, ddir], out_b, cfg, blob_merge=True),
    )

    queries = [
        "customer merge",
        "return value",
        "compactbench",
        "table scan",
        '"merge sort"',
        "index -compactbench",
    ]
    s_r = IndexSearch(out_r, use_actors=False)
    s_b = IndexSearch(out_b, use_actors=False)
    assert s_r.total_docs == s_b.total_docs

    def rows(t):
        return sorted(
            zip(
                t["doc_id"].to_pylist(),
                [round(v, 9) for v in t["score_r"].to_pylist()],
            )
        )

    for q in queries:
        a = rows(s_r.search(q, k=20))
        b = rows(s_b.search(q, k=20))
        assert a == b, (q, a[:3], b[:3])
        # blob path must also restore block-max pruned execution
        p = rows(s_b.search(q, k=20, pruned=True))
        assert p == a, ("pruned", q)

    # ---- delete-only fold: the blob path's home turf -----------------
    # a tombstone-only delta holds no postings, so NO term appears in two
    # segments: hot sets are empty and the whole index streams through
    # the strip with zero shuffle, vs the rebuild path re-encoding
    # everything from the merged journal.
    from marginaliasearch_ray.pipelines.delta import build_delete_delta

    purge = [f"org{r % 3:04d}/repo{r:04d}" for r in range(0, repos, 31)]
    deldir = os.path.join(root, "delete")
    out_dr = os.path.join(root, "delcompact_rebuild")
    out_db = os.path.join(root, "delcompact_blob")
    for d in (deldir, out_dr, out_db):
        shutil.rmtree(d, ignore_errors=True)
    timed(
        "delete_build",
        lambda: build_delete_delta([base], deldir, repos=purge),
    )
    timed(
        "delcompact_rebuild",
        lambda: compact_segments([base, deldir], out_dr, cfg),
    )
    timed(
        "delcompact_blob",
        lambda: compact_segments([base, deldir], out_db, cfg, blob_merge=True),
    )
    s_dr = IndexSearch(out_dr, use_actors=False)
    s_db = IndexSearch(out_db, use_actors=False)
    assert s_dr.total_docs == s_db.total_docs
    for q in queries[:4]:
        assert rows(s_dr.search(q, k=20)) == rows(s_db.search(q, k=20)), q

    print(
        json.dumps(
            {
                "metric": "compaction path cost: blob merge vs journal rebuild",
                "docs": n_docs,
                "num_cpus": ncpu,
                "delta_docs_pct": round(100 / 31, 2),
                **timings,
                "blob_vs_rebuild": round(
                    timings["compact_blob"] / timings["compact_rebuild"], 3
                ),
                "delete_blob_vs_rebuild": round(
                    timings["delcompact_blob"]
                    / timings["delcompact_rebuild"],
                    3,
                ),
                "blob_vs_full_build": round(
                    timings["compact_blob"] / timings["base_build"], 3
                ),
                "serving": "identical (6-query set, exhaustive + pruned)",
            }
        )
    )
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
