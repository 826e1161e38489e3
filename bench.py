"""Benchmark harness.

Runs the headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) under ray.init(num_cpus=$RAY_GRAFT_CPUS, default 32)
and prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "num_cpus": N, ...extras}

--scaling: runs the same bench twice in fresh processes (8 then 32 CPUs)
on identical input and prints throughputs at both plus the scaling
efficiency (sandbox stand-in for the N vs 4N node-cluster criterion).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

SYNTH_REPOS = int(os.environ.get("MSRAY_BENCH_REPOS", "150"))
SYNTH_FILES = int(os.environ.get("MSRAY_BENCH_FILES", "100"))
SYNTH_ONLY = os.environ.get("MSRAY_SYNTH_ONLY", "") == "1"


def _synth_corpus_path() -> str:
    path = f"/tmp/msray_bench_corpus_{SYNTH_REPOS}x{SYNTH_FILES}.parquet"
    if not os.path.exists(path):
        from marginaliasearch_ray.sources.corpus import synthesize_corpus, write_corpus

        write_corpus(synthesize_corpus(SYNTH_REPOS, SYNTH_FILES, seed=42), path)
    return path


def run_bench() -> dict:
    import ray
    import ray.data

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    ray.data.DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e
    from marginaliasearch_ray.pipelines import events as events_ops
    from marginaliasearch_ray.pipelines import similarity, textops
    from marginaliasearch_ray.pipelines.build_index import build_index
    from marginaliasearch_ray.pipelines.query import IndexSearch
    from marginaliasearch_ray.sources.corpus import documents_corpus_dataset

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.time()
        out = fn()
        timings[name] = round(time.time() - t0, 3)
        return out

    # warm the page cache so we measure compute+shuffle, not first disk read
    for t in ("documents", "embeddings", "events"):
        with open(f"{SF_DIR}/{t}.parquet", "rb") as f:
            f.read()

    # 1) index build over the sf documents corpus (fresh)
    if not SYNTH_ONLY:
        sf_index = e._index_dir_for(SF_DIR)
        shutil.rmtree(sf_index, ignore_errors=True)
        timed(
            "index_build_sf",
            lambda: build_index(
                documents_corpus_dataset(SF_DIR), sf_index, e._build_cfg()
            ),
        )

    # 1b) incremental ingest: delta segment (~1/31 of the corpus, updated
    # content) against the freshly built base — the cost must track the
    # DELTA size, not the corpus size (pipelines.delta), and chain
    # queries (base + tombstone suppression + delta) must stay serving-
    # speed.  This is the live-ingest path a 100 TB deployment runs
    # between compactions.
    if not SYNTH_ONLY:
        from marginaliasearch_ray.pipelines.delta import build_delta_index

        ddir = "/tmp/msray_bench_delta"
        shutil.rmtree(ddir, ignore_errors=True)
        dman = timed(
            "delta_ingest",
            lambda: build_delta_index(
                e._delta_corpus(SF_DIR), [sf_index], ddir, e._build_cfg()
            ),
        )
        extras["delta_docs"] = int(dman["n_docs"])
        extras["delta_ingest_docs_per_s"] = round(
            int(dman["n_docs"]) / timings["delta_ingest"], 1
        )
        chain = IndexSearch([sf_index, ddir], use_actors=True)
        chain.search("customer", k=1)  # warm the 2x-parts actor pool
        chain_qs = ["customer merge", "deltafresh scan", "scan -deltafresh"]

        def run_chain():
            n = 0
            for _ in range(5):
                for q in chain_qs:
                    chain.search(q, k=10)
                    n += 1
            return n

        nc = timed("query_chain", run_chain)
        extras["chain_queries_per_s"] = round(nc / timings["query_chain"], 1)
        chain.shutdown()

        # 1c) fold the chain back into one segment via BLOB-level
        # compaction (strip tombstoned ids from finished posting blobs +
        # k-way blob merge — the journal is never re-tokenized or
        # re-encoded).  At 960k docs this is the cheap leg of the
        # periodic ingest/compact cycle (see BASELINE.md); here it is a
        # regression canary.
        from marginaliasearch_ray.pipelines.delta import compact_segments

        cdir = "/tmp/msray_bench_compact"
        shutil.rmtree(cdir, ignore_errors=True)
        timed(
            "compact_blob",
            lambda: compact_segments(
                [sf_index, ddir], cdir, e._build_cfg(), blob_merge=True
            ),
        )
        folded = IndexSearch(cdir, use_actors=False)
        unfolded = IndexSearch([sf_index, ddir], use_actors=False)
        for q in chain_qs:
            got = folded.search(q, k=10)
            want = unfolded.search(q, k=10)
            assert got["doc_id"].to_pylist() == want["doc_id"].to_pylist(), q

        # 1d) anchor-region build (round 5): the same corpus with URL-word
        # + link-text virtual regions — the attach_link_texts join plus
        # the extended tokenize; the delta vs index_build_sf is the
        # anchor feature's cost.  Plus linktext query serving incl. the
        # EXTERNAL_LINKTEXT verbatim branches.
        import dataclasses as _dc

        import pyarrow.parquet as _pq

        adir = "/tmp/msray_bench_anchor"
        shutil.rmtree(adir, ignore_errors=True)
        os.makedirs(adir, exist_ok=True)
        links = os.path.join(adir, "links.parquet")
        _pq.write_table(e._link_texts_table(SF_DIR), links)
        acfg = _dc.replace(
            e._build_cfg(), anchor_regions=True, link_texts_dir=links
        )
        timed(
            "index_build_anchor",
            lambda: build_index(documents_corpus_dataset(SF_DIR), adir, acfg),
        )
        aidx = IndexSearch(adir, use_actors=False)

        def run_linktext():
            n = 0
            for _ in range(5):
                for q in ("nav", "nav src3", "nav -customer"):
                    aidx.search(q, k=10, verbatim_tag_weight=1.0)
                    n += 1
            return n

        nl = timed("query_linktext", run_linktext)
        extras["linktext_queries_per_s"] = round(
            nl / timings["query_linktext"], 1
        )

    # 2) index build over the deterministic synthetic source-code corpus
    synth_path = _synth_corpus_path()
    synth_out = "/tmp/msray_bench_index"
    shutil.rmtree(synth_out, ignore_errors=True)
    n_docs = SYNTH_REPOS * SYNTH_FILES

    def build_synth():
        import ray.data as rd

        from marginaliasearch_ray.pipelines.build_index import BuildConfig

        # segment_commits off: at benchmark scale (seconds per part) the
        # per-part execution overhead distorts throughput; at real scale
        # (minutes per part) it is negligible and stays on
        cfg = BuildConfig(
            num_parts=8, num_buckets=32, num_salts=4, hot_df_threshold=2000,
            segment_commits=False,
        )
        return build_index(rd.read_parquet(synth_path), synth_out, cfg)

    timed("index_build_synth", build_synth)
    extras["synth_docs"] = n_docs
    extras["synth_build_docs_per_s"] = round(n_docs / timings["index_build_synth"], 1)

    if SYNTH_ONLY:
        ray.shutdown()
        return {
            "metric": "synthetic index build (scaling mode)",
            "value": round(sum(timings.values()), 3),
            "unit": "sec",
            "queries": timings,
            "sf": SF_DIR,
            "num_cpus": NUM_CPUS,
            **extras,
        }

    # 3) query throughput on the synthetic index
    idx = IndexSearch(synth_out, use_actors=True)
    qset = [
        "license import",
        "parse_tree visitor",
        "merge_buffer -license",
        '"license import"',
        "copyright return the",
        "uniq_3_7_token",
    ]

    def run_queries():
        n = 0
        for _ in range(5):
            for q in qset:
                idx.search(q, k=10)
                n += 1
        return n

    nq = timed("query_set", run_queries)
    extras["queries_per_s"] = round(nq / timings["query_set"], 1)

    # 3b) candidate-heavy scenarios exercising the vectorized phrase /
    # verbatim / proximity verification (hot terms -> ~n_docs candidates)
    hot_scenarios = [
        ('"license import" the', {}),
        ("license import", {"verbatim_weight": 1.0, "proximity_weight": 0.5}),
        ("copyright the", {"head_tf_weight": 0.5, "first_position_weight": 2.5}),
    ]

    def run_hot():
        for _ in range(3):
            for q, kw in hot_scenarios:
                idx.search(q, k=10, **kw)
        return 3 * len(hot_scenarios)

    nh = timed("query_hot_phrase", run_hot)
    extras["hot_queries_per_s"] = round(nh / timings["query_hot_phrase"], 1)

    # 3b') block-max pruned execution (exact; add_block_stats side index).
    # Neutral at this corpus size — queries are fan-out-bound — recorded
    # as a regression canary; the 960k-doc measurement (1.37x, 90% blocks
    # skipped) lives in BASELINE.md.
    def run_pruned():
        n = 0
        for _ in range(5):
            for q in qset:
                idx.search(q, k=10, pruned=True)
                n += 1
        return n

    np_ = timed("query_set_pruned", run_pruned)
    extras["pruned_queries_per_s"] = round(np_ / timings["query_set_pruned"], 1)

    # 3b'') concurrent serving: same query set through search_many with 8
    # in flight (maxSimultaneousQueries=8, IndexQueryExecution.java:55-56).
    # Results are identical to the serial path (pytest).  NOTE: at this
    # corpus size warm queries are sub-5 ms and LOCAL, so the driver
    # thread is the bottleneck and concurrency measures ~0.7-0.9x warm
    # serial — the API pays off when fan-out latency is real (multi-node
    # RTTs, hundreds of partition actors, cold segments), not here; the
    # line is a regression canary for the thread-safe path.
    def run_concurrent():
        n = 0
        for _ in range(5):
            idx.search_many([(q, {"k": 10}) for q in qset], max_in_flight=8)
            n += len(qset)
        return n

    nc = timed("query_set_concurrent", run_concurrent)
    extras["concurrent_queries_per_s"] = round(
        nc / timings["query_set_concurrent"], 1
    )

    # 3b'''') batched query evaluation as a Ray Dataset (batch_eval):
    # the reference-query-set evaluator path — the same warm query set
    # streamed through the evaluator actor pool (which shares the
    # searcher actors), one row per (qid, result doc).  Comparable to
    # query_set_concurrent: same queries, Dataset pipeline instead of
    # driver threads.
    def run_batch_eval():
        import pyarrow as _pa
        import ray.data as _rd

        reps = 20
        qtbl = _pa.table(
            {
                "qid": _pa.array(range(reps * len(qset)), _pa.int64()),
                "query": _pa.array(
                    [qset[i % len(qset)] for i in range(reps * len(qset))],
                    _pa.string(),
                ),
            }
        )
        out = idx.batch_eval(
            _rd.from_arrow(qtbl), k=10, eval_concurrency=4
        ).materialize()
        return reps * len(qset)

    nb = timed("batch_query_eval", run_batch_eval)
    extras["batch_eval_queries_per_s"] = round(
        nb / timings["batch_query_eval"], 1
    )

    # 3b''') facet counting (exhaustive candidates + per-partition
    # (key, count) partials): heavier than top-k by design — the full
    # match set is counted, never scored or shipped
    def run_facets():
        n = 0
        for _ in range(3):
            for q in ("license import", "copyright the", "merge_buffer"):
                for by in ("repo", "year"):
                    idx.facets(q, by=by)
                    n += 1
        return n

    nf = timed("facet_set", run_facets)
    extras["facet_queries_per_s"] = round(nf / timings["facet_set"], 1)

    # 3b''') search-service display pipeline: top-100 normalized fetch +
    # UrlDeduplicator + byDomain clustering + sibling prune per query
    def run_display():
        n = 0
        for _ in range(3):
            for q in ("license import", "copyright the", "merge_buffer"):
                idx.search_clustered(q)
                n += 1
        return n

    nd = timed("query_display", run_display)
    extras["display_queries_per_s"] = round(nd / timings["query_display"], 1)

    # 3c) per-query latency percentiles (PerfTestMain.java:44-67,150-199
    # protocol: warmup pass, then a timed run, percentiles over
    # individual query latencies)
    import numpy as _np

    lat: list[float] = []
    for q, kw in [(q, {}) for q in qset] + hot_scenarios:  # warmup
        idx.search(q, k=10, **kw)
    for _ in range(8):
        for q, kw in [(q, {}) for q in qset] + hot_scenarios:
            t0 = time.perf_counter()
            idx.search(q, k=10, **kw)
            lat.append((time.perf_counter() - t0) * 1000.0)
    p = _np.percentile(lat, [1, 10, 50, 90, 99])
    extras["latency_ms"] = {
        "p1": round(float(p[0]), 2),
        "p10": round(float(p[1]), 2),
        "p50": round(float(p[2]), 2),
        "p90": round(float(p[3]), 2),
        "p99": round(float(p[4]), 2),
        "n": len(lat),
    }
    idx.shutdown()

    # 4) training-data ops at sf scale
    timed(
        "dedup_minhash",
        lambda: textops.minhash_lsh_pairs(
            documents_corpus_dataset(SF_DIR), 0.5
        ).materialize(),
    )
    timed(
        "term_df",
        lambda: textops.term_df_top(
            documents_corpus_dataset(SF_DIR), 100
        ).materialize(),
    )
    timed("ann_topk", lambda: similarity.ann_topk(SF_DIR, 0, 10).materialize())
    timed(
        "events_window",
        lambda: events_ops.tumbling_window(SF_DIR, 3600).materialize(),
    )

    # domain ranking: distributed edge extraction + driver iteration
    edges_box = {}

    def _pagerank_and_stash():
        import ray.data

        from marginaliasearch_ray.pipelines import ranking

        ds = ray.data.read_parquet(
            os.path.join(SF_DIR, "documents.parquet"),
            columns=["doc_id", "source", "n_chars"],
        )
        repos = ranking.corpus_repos(ds)
        edges_box["edges"] = ranking.link_edges(ds, repos)
        return ranking.pagerank(edges_box["edges"], repos)

    timed("pagerank", _pagerank_and_stash)

    # co-citation adjacency over the already-extracted domain graph
    # (by-member pair decomposition; sf-scale min_card/threshold)
    def _adjacency():
        from marginaliasearch_ray.pipelines import adjacencies

        return adjacencies.domain_neighbors(
            edges_box["edges"], min_card=3, threshold=0.35
        ).materialize()

    timed("adjacency", _adjacency)

    ray.shutdown()

    return {
        "metric": "marginalia-ray headline pipelines (index build + BM25 query + text ops)",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        **extras,
    }


def _host_control(nworkers: int, total_iters: int = 480_000_000) -> float:
    """Pure-CPU multiprocessing throughput (iters/s) at ``nworkers`` in a
    fresh subprocess — an engine-free probe of the SAME window the engine
    legs run in, so hypervisor steal can be factored out of the scaling
    ratio (this shared VM swings identical code 3-9x across windows; see
    BASELINE.md's variance note)."""
    code = (
        "import multiprocessing as mp, sys, time\n"
        "def w(n):\n"
        "    s = 0\n"
        "    for i in range(n):\n"
        "        s += i * i\n"
        "    return s\n"
        "if __name__ == '__main__':\n"
        "    nw = int(sys.argv[1]); total = int(sys.argv[2])\n"
        "    per = total // nw\n"
        "    with mp.Pool(nw) as p:\n"
        "        p.map(w, [1000] * nw)  # warm the workers\n"
        "        t0 = time.time()\n"
        "        p.map(w, [per] * nw)\n"
        "        dt = time.time() - t0\n"
        "    print(total / dt)\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code, str(nworkers), str(total_iters)],
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    return float(out.strip())


def run_scaling() -> dict:
    # Scaling defaults to the 960k-doc corpus: per-phase fixed pipeline
    # latencies (~20 s per build regardless of size) dominate small
    # corpora and understate the ratio — at 480k docs the same code
    # measures ~0.7-0.8, at 960k 0.85-0.88 (see BASELINE.md).
    scale_repos = os.environ.get("MSRAY_BENCH_REPOS", "600")
    scale_files = os.environ.get("MSRAY_BENCH_FILES", "1600")

    def run(ncpu: int) -> dict:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            MSRAY_SYNTH_ONLY="1",
            MSRAY_BENCH_REPOS=scale_repos,
            MSRAY_BENCH_FILES=scale_files,
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    # Default 4 -> 16: this host shows heavy steal time and a pure-CPU
    # multiprocessing control only reaches 0.70 efficiency from 8->32
    # CPUs (16->32 is 1.47x), so 8/32 measures the box, not the engine.
    # See BASELINE.md for the control numbers.
    lo = int(os.environ.get("MSRAY_SCALE_LO", "4"))
    hi = int(os.environ.get("MSRAY_SCALE_HI", "16"))
    # Host control brackets each engine leg (steal windows shift on the
    # scale of minutes, and the engine legs run for minutes): each leg's
    # control is the mean of a probe run immediately BEFORE and
    # immediately AFTER that leg, so it samples the same window.
    ctl_lo_1 = _host_control(lo)
    r_lo = run(lo)
    ctl_lo_2 = _host_control(lo)
    ctl_hi_1 = _host_control(hi)
    r_hi = run(hi)
    ctl_hi_2 = _host_control(hi)
    ctl_lo = (ctl_lo_1 + ctl_lo_2) / 2
    ctl_hi = (ctl_hi_1 + ctl_hi_2) / 2
    # throughput on the synthetic index build — the shuffle-heavy core
    thr_lo = r_lo["synth_build_docs_per_s"]
    thr_hi = r_hi["synth_build_docs_per_s"]
    eff = (thr_hi / thr_lo) / (hi / lo)
    host_eff = (ctl_hi / ctl_lo) / (hi / lo)
    return {
        "metric": "scaling efficiency (synthetic index build docs/s)",
        "cpus_lo": lo,
        "cpus_hi": hi,
        "docs_per_s_lo": thr_lo,
        "docs_per_s_hi": thr_hi,
        "total_sec_lo": r_lo["value"],
        "total_sec_hi": r_hi["value"],
        "scaling_efficiency": round(eff, 3),
        # same-window pure-CPU control: what a steal-free box would call
        # 1.0 reads as host_control_efficiency here; the engine's
        # window-corrected ratio is scaling_efficiency / this value
        "host_control_efficiency": round(host_eff, 3),
        "scaling_efficiency_vs_host": round(eff / host_eff, 3) if host_eff else None,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
