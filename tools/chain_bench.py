"""Serving cost of delta-segment chains vs chain length, and what
compaction buys back (VERDICT r3 item 7: the serving-cost story for the
periodic-ingest contract).

Builds the sf base index plus 5 overlapping churn deltas (each wave
re-updates half of the previous wave's docs), then measures WARM
per-query latency with the chain opened at lengths 1..6 and over the
compacted segment.  Prints one JSON line.

Usage: python tools/chain_bench.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    import pyarrow.compute as pc
    import ray.data

    import __ray_entry__ as e
    from marginaliasearch_ray.pipelines.delta import (
        build_delta_index,
        compact_segments,
    )
    from marginaliasearch_ray.pipelines.query import IndexSearch
    from marginaliasearch_ray.sources.corpus import documents_corpus_dataset

    ray.data.DataContext.get_current().enable_progress_bars = False

    e._index_for(sf_dir)  # ensure the base index is built
    base = e._index_dir_for(sf_dir)

    cfg = e._build_cfg()
    chain = [base]
    t_build = []
    for w in range(5):
        # sliding residue window: wave w updates residues {2w..2w+3} mod
        # 116 (~3.4% of docs), so waves w and w+1 SHARE half their docs —
        # the overlapping-churn regime exercises the already-tombstoned
        # dedup (a doc's stale copy must be tombstoned exactly once)
        mod = 116
        res_set = [(2 * w + i) % mod for i in range(4)]

        def wave_corpus(mod=mod, res_set=tuple(res_set), w=w):
            def mutate(batch):
                import numpy as np
                import pyarrow as pa

                ords = batch["ordinal"].to_numpy(zero_copy_only=False)
                keep = pa.array(np.isin(ords % mod, res_set))
                sel = batch.filter(keep)
                content = pa.array(
                    [
                        c + f"\nchurn wave{w} churnbench_{w}"
                        for c in sel["content"].to_pylist()
                    ],
                    pa.string(),
                )
                return sel.set_column(
                    sel.schema.get_field_index("content"), "content", content
                )

            return documents_corpus_dataset(sf_dir).map_batches(
                mutate, batch_format="pyarrow"
            )

        ddir = f"/tmp/msray_chain_bench/d{w}"
        t0 = time.time()
        build_delta_index(wave_corpus(), list(chain), ddir, cfg)
        t_build.append(round(time.time() - t0, 3))
        chain.append(ddir)

    queries = ["customer merge", "return value", "churnbench_4", "table scan"]
    lat: dict[str, float] = {}

    def warm_lat(dirs) -> float:
        idx = IndexSearch(dirs, use_actors=False)
        for q in queries:  # warm: segment decode + lexicon mmaps
            idx.search(q, k=10)
        t0 = time.time()
        reps = 5
        for _ in range(reps):
            for q in queries:
                idx.search(q, k=10)
        return round((time.time() - t0) / (reps * len(queries)) * 1000, 2)

    for L in range(1, len(chain) + 1):
        lat[f"chain_len_{L}_ms"] = warm_lat(chain[:L])

    cdir = "/tmp/msray_chain_bench/compacted"
    t0 = time.time()
    compact_segments(list(chain), cdir, cfg)
    t_compact = round(time.time() - t0, 3)
    lat["compacted_ms"] = warm_lat([cdir])

    out = {
        "metric": "delta-chain serving cost vs chain length (warm ms/query)",
        "sf": sf_dir,
        "delta_build_s": t_build,
        "compact_s": t_compact,
        **lat,
        "overhead_6_vs_1": round(
            lat["chain_len_6_ms"] / lat["chain_len_1_ms"], 2
        ),
        "compact_recovery": round(
            lat["compacted_ms"] / lat["chain_len_1_ms"], 2
        ),
    }
    print(json.dumps(out))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
