"""Scale-up stress point: the 960k-doc scaling corpus x4 (~3.84M docs,
~2.3 GB of content) built + queried at 32 CPUs in one fresh Ray session.

Purpose (BASELINE.md records the history): evidence that index-build
docs/s holds past RAM-comfortable scale — the journal + postings phases
push multiple corpus-sized datasets through a 37 GiB object store, so
this run exercises spilling — and that query latency over the bigger
segment stays flat.  Corpus synthesis is parallelized as one Ray task
per repo-range chunk (each chunk gets a distinct repo namespace prefix
and its own seed), cached under /tmp between runs.

Usage: python tools/stress_scale.py            (prints one JSON line)
Env:   MSRAY_STRESS_CHUNKS / _REPOS / _FILES, RAY_GRAFT_CPUS
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import ray  # noqa: E402

CHUNKS = int(os.environ.get("MSRAY_STRESS_CHUNKS", "8"))
REPOS_PER_CHUNK = int(os.environ.get("MSRAY_STRESS_REPOS", "150"))
FILES = int(os.environ.get("MSRAY_STRESS_FILES", "3200"))
NCPU = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

QUERY_SAMPLE = [
    "license import",
    "copyright return",
    "import -copyright",
    '"license import"',
    "license (import | copyright)",
]


def main() -> None:
    ray.init(
        address="local",
        num_cpus=NCPU,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False

    from marginaliasearch_ray.pipelines.build_index import (
        BuildConfig,
        build_index,
    )
    from marginaliasearch_ray.pipelines.query import IndexSearch
    from marginaliasearch_ray.sources.corpus import synthesize_corpus

    n_docs = CHUNKS * REPOS_PER_CHUNK * FILES
    corpus_dir = (
        f"/tmp/msray_stress_corpus_{CHUNKS}x{REPOS_PER_CHUNK}x{FILES}"
    )

    @ray.remote
    def synth_chunk(i: int) -> str:
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        t = synthesize_corpus(REPOS_PER_CHUNK, FILES, seed=42 + i)
        repo = pc.binary_join_element_wise(
            pa.array([f"c{i:02d}/"] * len(t), pa.string()), t["repo"], ""
        )
        t = t.set_column(t.schema.get_field_index("repo"), "repo", repo)
        out = os.path.join(corpus_dir, f"chunk_{i:02d}.parquet")
        pq.write_table(t, out)
        return out

    synth_s = None
    if (
        not os.path.isdir(corpus_dir)
        or len(os.listdir(corpus_dir)) != CHUNKS
    ):
        shutil.rmtree(corpus_dir, ignore_errors=True)
        os.makedirs(corpus_dir, exist_ok=True)
        t0 = time.time()
        ray.get([synth_chunk.remote(i) for i in range(CHUNKS)])
        synth_s = round(time.time() - t0, 1)
        print(f"synth: {synth_s}s for {n_docs} docs", file=sys.stderr)

    out_dir = "/tmp/msray_stress_index"
    shutil.rmtree(out_dir, ignore_errors=True)
    # the scaling bench's config (bench.py build_synth), same rationale
    cfg = BuildConfig(
        num_parts=8,
        num_buckets=32,
        num_salts=4,
        hot_df_threshold=2000,
        segment_commits=False,
    )
    t0 = time.time()
    build_index(rd.read_parquet(corpus_dir), out_dir, cfg)
    build_s = time.time() - t0

    idx = IndexSearch(out_dir, use_actors=True)
    idx.search("license", k=1)  # warm the actor pool
    lat = []
    t0 = time.time()
    nq = 0
    for _ in range(4):
        for q in QUERY_SAMPLE:
            tq = time.perf_counter()
            idx.search(q, k=10)
            lat.append((time.perf_counter() - tq) * 1000.0)
            nq += 1
    q_per_s = nq / (time.time() - t0)
    idx.shutdown()

    import numpy as np

    seg_bytes = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _dn, fns in os.walk(out_dir)
        for f in fns
    )
    ray.shutdown()
    print(
        json.dumps(
            {
                "metric": "stress scale-up: 3.84M-doc build + query sample",
                "n_docs": n_docs,
                "num_cpus": NCPU,
                "synth_sec": synth_s,
                "build_sec": round(build_s, 1),
                "build_docs_per_s": round(n_docs / build_s, 1),
                "query_per_s": round(q_per_s, 1),
                "query_p50_ms": round(float(np.percentile(lat, 50)), 1),
                "query_p90_ms": round(float(np.percentile(lat, 90)), 1),
                "segment_bytes": seg_bytes,
            }
        )
    )


if __name__ == "__main__":
    main()
