"""Seeded sample-of-domains export (SampleDataExporter.java:36-100
analog): count-bounded pool, deterministic shuffle pick, per-domain
parquet parcels + manifest, resume semantics."""

import os

import pyarrow as pa
import pytest

from marginaliasearch_ray.pipelines.browse import shuffle_key
from marginaliasearch_ray.pipelines.textops import export_sample

DOMS = {
    "org0/tiny": 1,      # below min_docs -> never in the pool
    "org0/small": 3,
    "org1/mid": 5,
    "org1/big": 8,
    "org2/huge": 30,     # above max_docs=10 -> never in the pool
    "org2/ok": 4,
}


def _corpus() -> pa.Table:
    rows = {"repo": [], "path": [], "commit": [], "lang": [], "content": [],
            "ordinal": []}
    ordn = 0
    for repo, n in DOMS.items():
        for i in range(n):
            rows["repo"].append(repo)
            rows["path"].append(f"f_{i}.py")
            rows["commit"].append("0" * 40)
            rows["lang"].append("py")
            rows["content"].append(f"{repo} doc {i} words here")
            rows["ordinal"].append(ordn)
            ordn += 1
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


def _expected_pick(size, seed, min_docs=2, max_docs=10):
    pool = [r for r, n in DOMS.items() if min_docs <= n <= max_docs]
    return sorted(pool, key=lambda d: shuffle_key(seed, d))[:size]


@pytest.fixture(scope="module")
def corpus_ds(ray_session):
    import ray.data

    return ray.data.from_arrow(_corpus())


def test_pool_bounds_and_seeded_pick(corpus_ds, tmp_path):
    out = str(tmp_path / "sample")
    t = export_sample(corpus_ds, out, size=3, max_docs=10, seed=7)
    picked = _expected_pick(3, 7)
    assert t["repo"].to_pylist() == sorted(picked)
    got = dict(zip(t["repo"].to_pylist(), t["n_docs"].to_pylist()))
    assert got == {r: DOMS[r] for r in picked}
    # out-of-bounds domains never appear regardless of seed/size
    big = export_sample(corpus_ds, str(tmp_path / "all"), size=99,
                        max_docs=10, seed=7)
    assert "org0/tiny" not in big["repo"].to_pylist()
    assert "org2/huge" not in big["repo"].to_pylist()


def test_per_domain_parcels_and_manifest(corpus_ds, tmp_path):
    from marginaliasearch_ray.state import manifest as mf

    out = str(tmp_path / "parcels")
    export_sample(corpus_ds, out, size=2, max_docs=10, seed=1, name="demo")
    man = mf.read_manifest(out, "export")
    assert man["type"] == "CRAWL_DATA" and man["description"] == "demo"
    assert man["domains"] == _expected_pick(2, 1)
    # one directory per picked domain (dom=<pick index>)
    doms = {d for d in os.listdir(out) if d.startswith("dom=")}
    assert doms == {"dom=0", "dom=1"}


def test_resume_skips_committed_export(corpus_ds, tmp_path):
    out = str(tmp_path / "resume")
    t1 = export_sample(corpus_ds, out, size=2, max_docs=10, seed=3)
    files = {
        f: os.path.getmtime(os.path.join(root, f))
        for root, _d, fs in os.walk(out) for f in fs
    }
    t2 = export_sample(corpus_ds, out, size=2, max_docs=10, seed=3)
    files2 = {
        f: os.path.getmtime(os.path.join(root, f))
        for root, _d, fs in os.walk(out) for f in fs
    }
    assert t1.equals(t2)
    assert files == files2, "committed export must not rewrite"


def test_uncommitted_partial_is_cleared(corpus_ds, tmp_path):
    out = str(tmp_path / "crashed")
    os.makedirs(os.path.join(out, "dom=0"))
    with open(os.path.join(out, "dom=0", "junk.parquet"), "w") as f:
        f.write("partial garbage")  # crash mid-write, no manifest
    t = export_sample(corpus_ds, out, size=2, max_docs=10, seed=3)
    assert t.num_rows == 2  # junk cleared, clean export succeeded
