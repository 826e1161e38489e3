"""Segment/chain integrity verification (state.verify — fsck for the
index): a freshly built segment audits clean; every tampering mode the
manifests were designed to catch is caught."""

import json
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from marginaliasearch_ray.pipelines.build_index import BuildConfig, build_index
from marginaliasearch_ray.pipelines.delta import build_delta_index
from marginaliasearch_ray.sources.corpus import synthesize_corpus
from marginaliasearch_ray.state.verify import verify_chain, verify_segment

CFG = dict(num_parts=2, num_buckets=4, hot_df_threshold=20)


@pytest.fixture(scope="module")
def seg(ray_session, tmp_path_factory):
    import ray.data

    v1 = synthesize_corpus(n_repos=4, files_per_repo=10, seed=7)
    base = str(tmp_path_factory.mktemp("vseg_base"))
    ddir = str(tmp_path_factory.mktemp("vseg_delta"))
    cfg = BuildConfig(**CFG)
    build_index(ray.data.from_arrow(v1), base, cfg)
    delta = v1.slice(0, 5)
    delta = delta.set_column(
        delta.schema.get_field_index("content"),
        "content",
        pa.array([c + " vfresh" for c in delta["content"].to_pylist()]),
    )
    build_delta_index(ray.data.from_arrow(delta), [base], ddir, cfg)
    return base, ddir


def _copy(src, dst_root, name):
    dst = os.path.join(str(dst_root), name)
    shutil.copytree(src, dst)
    return dst


def test_clean_segment_verifies(seg):
    base, ddir = seg
    res = verify_segment(base, deep=True)
    assert res["ok"], res["problems"]
    res_d = verify_segment(ddir, deep=True)
    assert res_d["ok"], res_d["problems"]
    chain = verify_chain([base, ddir], deep=False)
    assert chain["ok"], chain["problems"]
    assert chain["live_docs"] == 40


def test_missing_file_detected(seg, tmp_path):
    base, _ = seg
    c = _copy(base, tmp_path, "missing")
    victim = json.load(open(os.path.join(c, "forward", "_manifest.json")))[
        "files"
    ][0]
    rel = os.path.relpath(victim, json.load(
        open(os.path.join(c, "root", "_manifest.json"))
    )["out_dir"])
    os.remove(os.path.join(c, rel))
    res = verify_segment(c)
    assert not res["ok"]
    assert any("recorded file missing" in p for p in res["problems"])


def test_stray_file_detected(seg, tmp_path):
    base, _ = seg
    c = _copy(base, tmp_path, "stray")
    pq.write_table(
        pa.table({"x": pa.array([1])}),
        os.path.join(c, "postings", "part=0", "leftover.parquet"),
    )
    res = verify_segment(c)
    assert not res["ok"]
    assert any("STRAY" in p for p in res["problems"])


def test_content_corruption_detected_deep(seg, tmp_path):
    """A bit-flip in the journal (same row count, different content)
    passes every shallow check but fails the deep sha-XOR rollup."""
    base, _ = seg
    c = _copy(base, tmp_path, "corrupt")
    root = json.load(open(os.path.join(c, "root", "_manifest.json")))
    f = json.load(open(os.path.join(c, "journal", "_manifest.json")))[
        "files"
    ][0]
    f = os.path.join(c, os.path.relpath(f, root["out_dir"]))
    t = pq.read_table(f)
    i = t.schema.get_field_index("data_hash")
    h = t["data_hash"].to_pylist()
    h[0] = ("0" * 64) if h[0] != "0" * 64 else ("f" * 64)
    t = t.set_column(i, "data_hash", pa.array(h, t.schema.field(i).type))
    pq.write_table(t, f)
    assert verify_segment(c)["ok"]  # shallow cannot see it
    res = verify_segment(c, deep=True)
    assert not res["ok"]
    assert any("rollup mismatch" in p for p in res["problems"])


def test_tombstone_tampering_detected(seg, tmp_path):
    base, ddir = seg
    c = _copy(ddir, tmp_path, "tomb")
    td = os.path.join(c, "tombstones", "prior=0")
    part = next(
        os.path.join(r, fn)
        for r, _d, fns in os.walk(td)
        for fn in fns
        if fn.endswith(".parquet")
    )
    t = pq.read_table(part)
    pq.write_table(t.slice(0, max(0, t.num_rows - 1)), part)
    res = verify_segment(c)
    assert not res["ok"]
    assert any("tombstones against prior[0]" in p for p in res["problems"])


def test_chain_mismatch_detected(seg, tmp_path):
    base, ddir = seg
    res = verify_chain([ddir, base])  # wrong order
    assert not res["ok"]
    assert any(
        "chain" in p or "delta manifest" in p for p in res["problems"]
    )
    # and a chain listing the delta without its recorded base prefix
    res2 = verify_chain([ddir])
    assert not res2["ok"]
    assert any("starts at a DELTA" in p for p in res2["problems"])


def test_cli_verify(seg, capsys):
    from marginaliasearch_ray.__main__ import main

    base, ddir = seg
    assert main(["verify", "--segment", base, "--segment", ddir]) == 0
    out = json.loads(
        [l for l in capsys.readouterr().out.splitlines() if l.strip()][-1]
    )
    assert out["ok"] and out["live_docs"] == 40


def test_compacted_segment_deep_verifies(seg, tmp_path):
    """Compacted segments record the same per-part sha-XOR lineage a
    fresh build does — the deep audit contract holds across folds."""
    from marginaliasearch_ray.pipelines.delta import compact_segments

    base, ddir = seg
    out = str(tmp_path / "c")
    compact_segments([base, ddir], out, BuildConfig(**CFG))
    res = verify_segment(out, deep=True)
    assert res["ok"], res["problems"]


def test_relocated_chain_verifies(seg, tmp_path):
    """A chain rsynced wholesale (relative layout preserved) audits
    clean at its new location: recorded prior paths are rebased with the
    same prefix transform verify_segment applies to file lists."""
    base, ddir = seg
    common = os.path.commonpath([base, ddir])
    new_root = str(tmp_path / "restore")
    nb = os.path.join(new_root, os.path.relpath(base, common))
    nd = os.path.join(new_root, os.path.relpath(ddir, common))
    shutil.copytree(base, nb)
    shutil.copytree(ddir, nd)
    res = verify_chain([nb, nd])
    assert res["ok"], res["problems"]
    # a genuinely wrong prefix still fails after rebasing
    res2 = verify_chain([nd, nb])
    assert not res2["ok"]


def test_crashed_delete_delta_detected(seg, tmp_path):
    """A delete delta that crashed after laying tombstones but before
    its delta manifest committed must NOT pass fsck (the root manifest
    with delete_only=True commits first)."""
    from marginaliasearch_ray.pipelines.delta import build_delete_delta

    base, _ = seg
    ddir = str(tmp_path / "del")
    build_delete_delta([base], ddir, repos=["org0000/repo0000"])
    assert verify_segment(ddir)["ok"]
    os.remove(os.path.join(ddir, "delta", "_manifest.json"))
    res = verify_segment(ddir)
    assert not res["ok"]
    assert any("phase manifest missing: delta" in p for p in res["problems"])
    assert any("crashed delta attempt" in p for p in res["problems"])


def test_corrupt_tombstone_reported_not_raised(seg, tmp_path):
    """Truncated/corrupt parquet is a reported problem, not a crash —
    the verifier's 'never raises on an integrity failure' contract."""
    base, ddir = seg
    c = _copy(ddir, tmp_path, "corrupt")
    part = next(
        os.path.join(r, fn)
        for r, _d, fns in os.walk(os.path.join(c, "tombstones"))
        for fn in fns
        if fn.endswith(".parquet")
    )
    with open(part, "wb") as f:
        f.write(b"PAR1garbage-not-a-footer")
    res = verify_segment(c)
    assert not res["ok"]
    assert any("unreadable" in p for p in res["problems"])


def test_corrupt_journal_deep_reported_not_raised(seg, tmp_path):
    base, _ = seg
    c = _copy(base, tmp_path, "jcorrupt")
    part = next(
        os.path.join(r, fn)
        for r, _d, fns in os.walk(os.path.join(c, "journal"))
        for fn in fns
        if fn.endswith(".parquet")
    )
    with open(part, "wb") as f:
        f.write(b"PAR1garbage-not-a-footer")
    res = verify_segment(c, deep=True)
    assert not res["ok"]
    assert any("unreadable" in p or "missing" in p for p in res["problems"])


def test_lang_index_audited(seg, tmp_path):
    """lang_index (serve-time state for lang: filters) is covered by the
    journal manifest's lang_files record: a missing file and a stray
    file are both flagged."""
    base, _ = seg
    c = _copy(base, tmp_path, "langmiss")
    part = next(
        os.path.join(r, fn)
        for r, _d, fns in os.walk(os.path.join(c, "lang_index"))
        for fn in fns
        if fn.endswith(".parquet")
    )
    os.remove(part)
    res = verify_segment(c)
    assert not res["ok"]
    assert any(
        "lang_index: recorded file missing" in p for p in res["problems"]
    )

    c2 = _copy(base, tmp_path, "langstray")
    stray = os.path.join(c2, "lang_index", "stray.parquet")
    pq.write_table(pa.table({"x": [1]}), stray)
    res2 = verify_segment(c2)
    assert not res2["ok"]
    assert any("lang_index: STRAY" in p for p in res2["problems"])


def test_cli_shallow_verify_needs_no_ray(seg, monkeypatch, capsys):
    """Shallow (non --deep) verify is a pure file/pyarrow op and must not
    start a Ray session — it has to work on a recovery box with no
    reachable cluster."""
    import marginaliasearch_ray.__main__ as cli

    def boom(_args):
        raise AssertionError("shallow verify must not init Ray")

    monkeypatch.setattr(cli, "_init_ray", boom)
    base, ddir = seg
    assert cli.main(["verify", "--segment", base, "--segment", ddir]) == 0
    out = json.loads(
        [l for l in capsys.readouterr().out.splitlines() if l.strip()][-1]
    )
    assert out["ok"]
