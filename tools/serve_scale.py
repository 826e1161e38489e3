"""Query-SERVING scaling evidence: the same index and query workload at
two CPU widths in fresh processes, with searcher REPLICAS sized to the
width (width/num_parts replicas per partition).

A partition searcher actor is single-threaded, so a fixed actor pool
caps serving throughput at num_parts CPUs of scoring no matter how many
clients pile on — the narrow leg runs 1 replica (num_parts actors), the
wide leg runs width/num_parts replicas.  This is exactly how a
read-heavy deployment scales QPS with the cluster instead of with the
partition count (the build-side twin is bench.py --scaling).  Pure-CPU
host controls bracket each leg so hypervisor steal can be factored out,
same protocol as bench.py.

Usage: python tools/serve_scale.py <index_dir> [lo_cpus] [hi_cpus]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "license import",
    "copyright return",
    "import -copyright",
    '"license import"',
    "license (import | copyright)",
    "parse_tree visitor",
    "merge_buffer",
    "license | copyright",
    "the license size>30",
    "import year>2000",
    "copyright ?license",
    "the rank<255",
]
REPS = 40

_LEG = r"""
import sys, time, json
sys.path.insert(0, {repo!r})
import ray
ray.init(address="local", num_cpus={cpus}, include_dashboard=False,
         logging_level="ERROR")
from marginaliasearch_ray.pipelines.query import IndexSearch
idx = IndexSearch({index_dir!r}, use_actors=True, replicas={replicas})
queries = {queries!r}
for q in queries:  # warm: segment load + df caches
    idx.search(q, k=10, pruned=True)
batch = [(q, {{"k": 10, "pruned": True}}) for q in queries] * {reps}
t0 = time.perf_counter()
out = idx.search_many(batch, max_in_flight={in_flight})
dt = time.perf_counter() - t0
n = sum(t.num_rows for t in out)
idx.shutdown()
ray.shutdown()
print(json.dumps({{"qps": len(batch) / dt, "sec": dt, "rows": n}}))
"""


def run_leg(index_dir: str, cpus: int, num_parts: int) -> dict:
    replicas = max(1, cpus // num_parts)
    code = _LEG.format(
        repo=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        cpus=cpus,
        index_dir=index_dir,
        replicas=replicas,
        queries=QUERIES,
        reps=REPS,
        in_flight=2 * max(1, cpus // 2),
    )
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        check=True,
        env=env,
    ).stdout
    leg = json.loads(out.strip().splitlines()[-1])
    leg["replicas"] = replicas
    return leg


def main() -> int:
    import pyarrow.parquet as _  # noqa: F401 (import check before legs)

    from bench import _host_control
    from marginaliasearch_ray.state import manifest as mf

    index_dir = sys.argv[1]
    lo = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    hi = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    num_parts = int(mf.read_manifest(index_dir, "root")["num_parts"])

    # bracketing controls: mean of a probe immediately before and after
    # each leg, as in bench.py --scaling
    ctl_lo_1 = _host_control(lo)
    leg_lo = run_leg(index_dir, lo, num_parts)
    ctl_lo_2 = _host_control(lo)
    ctl_hi_1 = _host_control(hi)
    leg_hi = run_leg(index_dir, hi, num_parts)
    ctl_hi_2 = _host_control(hi)

    ratio = hi / lo
    eff = (leg_hi["qps"] / leg_lo["qps"]) / ratio
    ctl_lo = (ctl_lo_1 + ctl_lo_2) / 2
    ctl_hi = (ctl_hi_1 + ctl_hi_2) / 2
    host_eff = (ctl_hi / ctl_lo) / ratio
    print(
        json.dumps(
            {
                "metric": "serving scaling efficiency (queries/s, "
                "replicas sized to width)",
                "index_dir": index_dir,
                "num_parts": num_parts,
                "cpus_lo": lo,
                "cpus_hi": hi,
                "replicas_lo": leg_lo["replicas"],
                "replicas_hi": leg_hi["replicas"],
                "qps_lo": round(leg_lo["qps"], 1),
                "qps_hi": round(leg_hi["qps"], 1),
                "n_queries": len(QUERIES) * REPS,
                "scaling_efficiency": round(eff, 3),
                "host_control_efficiency": round(host_eff, 3),
                "scaling_efficiency_vs_host": (
                    round(eff / host_eff, 3) if host_eff else None
                ),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
