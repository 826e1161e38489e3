"""Anchor-region overhead probe at scale: build the 960k-doc synthetic
corpus three ways — plain, anchor via the bucketed link STORE
(default), and anchor via the corpus JOIN — with a link-text side
table covering 1/3 of the docs, and report docs/s for each plus
linktext query serving.  The deltas vs the plain build are each
ingestion mode's cost at a corpus size where the join is a real
shuffle (measured numbers in BASELINE.md).

Usage: python tools/anchor_probe.py [repos files cpus]
(defaults 1200 800 32 — the scaling-bench corpus shape)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    repos = int(sys.argv[1]) if len(sys.argv) > 1 else 1200
    files = int(sys.argv[2]) if len(sys.argv) > 2 else 800
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    import ray

    ray.init(
        address="local",
        num_cpus=cpus,
        include_dashboard=False,
        logging_level="ERROR",
    )
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from marginaliasearch_ray.pipelines.build_index import (
        BuildConfig,
        build_index,
    )
    from marginaliasearch_ray.pipelines.query import IndexSearch
    from marginaliasearch_ray.sources.corpus import synthesize_corpus

    corpus_path = f"/tmp/msray_bench_corpus_{repos}x{files}.parquet"
    if not os.path.exists(corpus_path):
        t0 = time.time()
        pq.write_table(synthesize_corpus(repos, files, seed=42), corpus_path)
        print(f"# synthesized {repos * files} docs in {time.time()-t0:.1f}s",
              file=sys.stderr)

    # link table: every 3rd file of every repo gets one anchor text
    meta = pq.read_table(corpus_path, columns=["repo", "path"])
    rs = np.asarray(meta["repo"].to_pylist(), dtype=object)
    ps = np.asarray(meta["path"].to_pylist(), dtype=object)
    sel = np.arange(len(rs)) % 3 == 0
    rs, ps = rs[sel], ps[sel]
    links_path = "/tmp/msray_anchor_probe_links.parquet"
    pq.write_table(
        pa.table(
            {
                "repo": pa.array(rs, pa.string()),
                "path": pa.array(ps, pa.string()),
                "text": pa.array(
                    [f"navprobe {r.split('/', 1)[0]}" for r in rs],
                    pa.string(),
                ),
                "cnt": pa.array(
                    (np.arange(len(rs)) % 150 + 1), pa.int64()
                ),
            }
        ),
        links_path,
    )

    cfg = BuildConfig(
        num_parts=8, num_buckets=32, num_salts=4, hot_df_threshold=2000,
        segment_commits=False,
    )
    n_docs = repos * files
    out: dict = {"docs": n_docs, "num_cpus": cpus,
                 "linked_docs": int(sel.sum())}

    plain_dir = "/tmp/msray_anchor_probe_plain"
    shutil.rmtree(plain_dir, ignore_errors=True)
    t0 = time.time()
    build_index(rd.read_parquet(corpus_path), plain_dir, cfg)
    out["plain_build_s"] = round(time.time() - t0, 1)
    out["plain_docs_per_s"] = round(n_docs / out["plain_build_s"], 1)

    import dataclasses

    anchor_dir = ""
    for mode in ("store", "join"):
        anchor_dir = f"/tmp/msray_anchor_probe_{mode}"
        shutil.rmtree(anchor_dir, ignore_errors=True)
        acfg = dataclasses.replace(
            cfg, anchor_regions=True, link_texts_dir=links_path,
            link_texts_mode=mode,
        )
        t0 = time.time()
        build_index(rd.read_parquet(corpus_path), anchor_dir, acfg)
        out[f"anchor_{mode}_build_s"] = round(time.time() - t0, 1)
        out[f"anchor_{mode}_docs_per_s"] = round(
            n_docs / out[f"anchor_{mode}_build_s"], 1
        )
        out[f"anchor_{mode}_overhead_x"] = round(
            out[f"anchor_{mode}_build_s"] / out["plain_build_s"], 3
        )

    idx = IndexSearch(anchor_dir, use_actors=True)
    idx.search("navprobe", k=1)  # warm
    qs = ["navprobe", "navprobe org0000", "navprobe -license"]
    t0 = time.time()
    n = 0
    for _ in range(10):
        for q in qs:
            idx.search(q, k=10, verbatim_tag_weight=1.0)
            n += 1
    out["linktext_queries_per_s"] = round(n / (time.time() - t0), 1)
    idx.shutdown()

    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
