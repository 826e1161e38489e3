"""Segment integrity verification — fsck for the index.

The build phases record per-partition lineage (file lists, doc counts,
sha256(content) XOR rollups) in their manifests precisely so that a
segment can later be AUDITED without trusting anything but the manifest
bytes: after a node loss, a partial rsync, a bit-flipped disk or a
crashed build attempt, ``verify_segment`` answers "is this segment
exactly what its build committed?".

Reference analog: the work-log discipline of BatchingWorkLogImpl (a
resumed run must see exactly the recorded artifacts) plus the
insertion-stable registry invariants; re-expressed over Parquet +
manifest files.

Shallow checks (metadata + cheap columnar reads):
  * every required phase manifest is committed;
  * every file a manifest recorded exists, and no STRAY parquet sits in
    a phase dir (a crashed attempt's leftovers would be silently read
    by the append-discipline sinks);
  * doc counts agree across root/journal/forward manifests;
  * reverse per-part posting counts match a recomputed sum(df);
  * delta segments: recorded per-prior tombstone counts match the
    tombstone tables on disk; tombstone/correction parquet WITHOUT a
    committed delta manifest (a crashed delta attempt) is flagged;
  * the per-language id index (lang_index) matches the journal
    manifest's recorded file list, when the manifest records one.

Deep check (``deep=True``): recompute the journal's per-part
sha256-XOR rollup DISTRIBUTED (the same ``_lineage_rollup`` kernel the
build used) and compare — this catches content corruption, not just
missing files.

Relocation-safe: recorded paths are rebased from the build-time
``out_dir`` onto the segment's current location, and ``verify_chain``
accepts a chain whose recorded prior paths match after the same
prefix transform (a chain rsynced wholesale verifies clean).
Unreadable (truncated/corrupt) parquet is reported as a problem, never
raised — the "never raises on an integrity failure" contract includes
integrity failures of the files themselves.
"""

from __future__ import annotations

import os

from . import manifest as mf

_PHASES_WITH_FILES = ("journal", "forward", "reverse", "prio")
_PHASE_DIRS = {
    "journal": "journal",
    "forward": "forward",
    "reverse": "postings",
    "prio": "postings_prio",
}


def _rebase(path: str, recorded_root: str, actual_root: str) -> str:
    rel = os.path.relpath(path, recorded_root)
    return os.path.normpath(os.path.join(actual_root, rel))


def verify_segment(segment_dir: str, deep: bool = False) -> dict:
    """Audit one segment against its own manifests.  Returns
    ``{"ok": bool, "problems": [...], "checked": {...}}`` — never
    raises on an integrity failure (the caller decides severity)."""
    segment_dir = os.path.abspath(segment_dir)
    problems: list[str] = []
    checked: dict = {"segment": segment_dir, "deep": deep}

    if not mf.is_committed(segment_dir, "root"):
        return {
            "ok": False,
            "problems": ["root manifest missing — not a finished segment"],
            "checked": checked,
        }
    root = mf.read_manifest(segment_dir, "root")
    recorded_root = os.path.abspath(root.get("out_dir", segment_dir))
    n_docs = int(root["n_docs"])
    delete_only = bool(root.get("delete_only", False))
    checked["n_docs"] = n_docs

    # delete-only segments commit the delta manifest LAST (after the
    # tombstones are laid) — its absence means a crashed build attempt,
    # not a finished segment
    required = ("stats", "delta") if delete_only else (
        "journal", "stats", "forward", "reverse", "prio"
    )
    for phase in required:
        if not mf.is_committed(segment_dir, phase):
            problems.append(f"phase manifest missing: {phase}")
    if not os.path.exists(os.path.join(segment_dir, "registry.parquet")):
        problems.append("registry.parquet missing")
    # tombstone/correction parquet without a committed delta manifest is
    # always a crashed delta attempt (update AND delete deltas commit the
    # delta manifest after laying them; re-runs rmtree + rewrite)
    if not mf.is_committed(segment_dir, "delta"):
        for d in ("tombstones", "df_correction"):
            if mf.list_phase_files(segment_dir, d):
                problems.append(
                    f"{d}/ parquet present without a committed delta "
                    "manifest (crashed delta attempt leftovers)"
                )

    # recorded files exist; no strays next to them
    def _check_files(label: str, recorded_paths, phase_dir: str) -> int:
        recorded = {
            _rebase(f, recorded_root, segment_dir) for f in recorded_paths
        }
        for f in sorted(recorded):
            if not os.path.exists(f):
                problems.append(f"{label}: recorded file missing: {f}")
        actual = set(mf.list_phase_files(segment_dir, phase_dir))
        for f in sorted(actual - recorded):
            problems.append(
                f"{label}: STRAY parquet not in the committed manifest "
                f"(crashed attempt leftovers?): {f}"
            )
        return len(recorded)

    n_files = 0
    for phase in _PHASES_WITH_FILES:
        if not mf.is_committed(segment_dir, phase):
            continue
        man = mf.read_manifest(segment_dir, phase)
        n_files += _check_files(phase, man.get("files", []), _PHASE_DIRS[phase])
        if phase == "journal" and "lang_files" in man:
            # the per-language id index serves lang: filters — audited
            # when the manifest records it (pre-r4 manifests don't;
            # absence is "not auditable", not a failure)
            n_files += _check_files(
                "lang_index", man["lang_files"], "lang_index"
            )
    checked["files"] = n_files

    # doc-count arithmetic across phases
    if not delete_only and mf.is_committed(segment_dir, "journal"):
        jman = mf.read_manifest(segment_dir, "journal")
        if "per_part_lineage" in jman:
            j_docs = sum(
                int(v["docs"]) for v in jman["per_part_lineage"].values()
            )
            if j_docs != n_docs:
                problems.append(
                    f"journal lineage docs {j_docs} != root n_docs {n_docs}"
                )
        if mf.is_committed(segment_dir, "forward"):
            fman = mf.read_manifest(segment_dir, "forward")
            f_docs = sum(
                int(v) for v in fman.get("per_part_docs", {}).values()
            )
            if f_docs != n_docs:
                problems.append(
                    f"forward docs {f_docs} != root n_docs {n_docs}"
                )

    # reverse: recomputed per-part sum(df) vs the committed counts
    if not delete_only and mf.is_committed(segment_dir, "reverse"):
        import numpy as np
        import pyarrow.dataset as pads

        rman = mf.read_manifest(segment_dir, "reverse")
        for p, want in rman.get("per_part_postings", {}).items():
            d = os.path.join(segment_dir, "postings", f"part={p}")
            if not os.path.isdir(d):
                problems.append(f"reverse: postings part={p} dir missing")
                continue
            try:
                got = int(
                    np.sum(
                        pads.dataset(d)
                        .to_table(columns=["df"])["df"]
                        .to_numpy(zero_copy_only=False)
                    )
                )
            except Exception as exc:  # stray foreign-schema file etc.
                problems.append(
                    f"reverse part={p}: postings unreadable ({exc})"
                )
                continue
            if got != int(want):
                problems.append(
                    f"reverse part={p}: sum(df) {got} != committed {want}"
                )

    # delta segments: per-prior tombstone counts vs the tables on disk
    if mf.is_committed(segment_dir, "delta"):
        import pyarrow.dataset as pads

        from ..pipelines.delta import tombstone_dir

        dman = mf.read_manifest(segment_dir, "delta")
        checked["delta"] = True
        for j, prior in enumerate(dman.get("prior_dirs", [])):
            want = int(dman.get("tombstones", {}).get(prior, 0))
            td = tombstone_dir(segment_dir, j)
            try:
                got = (
                    pads.dataset(td, partitioning="hive").count_rows()
                    if os.path.isdir(td)
                    else 0
                )
            except Exception as exc:  # truncated/corrupt parquet
                problems.append(
                    f"delta: tombstones against prior[{j}] unreadable ({exc})"
                )
                continue
            if got != want:
                problems.append(
                    f"delta: tombstones against prior[{j}] = {got} rows "
                    f"on disk != {want} committed"
                )

    # deep: recompute the journal content-hash rollup distributed
    if deep and not delete_only and mf.is_committed(segment_dir, "journal"):
        from ..pipelines.build_index import _lineage_rollup

        jman = mf.read_manifest(segment_dir, "journal")
        if "per_part_lineage" not in jman:
            problems.append(
                "deep: journal manifest has no per_part_lineage rollup "
                "(pre-r4 compacted segment?) — content audit impossible"
            )
            return {"ok": not problems, "problems": problems, "checked": checked}
        want = jman["per_part_lineage"]
        try:
            got = _lineage_rollup(os.path.join(segment_dir, "journal"))
        except Exception as exc:  # truncated/corrupt parquet
            problems.append(f"deep: journal unreadable ({exc})")
            return {"ok": not problems, "problems": problems, "checked": checked}
        checked["deep_rollup_parts"] = len(got)
        for p in sorted(set(want) | set(got)):
            w, g = want.get(p), got.get(p)
            if w is None or g is None:
                problems.append(f"deep: part {p} present on one side only")
            elif int(w["sha_rollup_xor"]) != int(g["sha_rollup_xor"]) or int(
                w["docs"]
            ) != int(g["docs"]):
                problems.append(
                    f"deep: part {p} journal rollup mismatch — content "
                    f"differs from what the build committed "
                    f"(docs {w['docs']}->{g['docs']}, xor "
                    f"{w['sha_rollup_xor']}!={g['sha_rollup_xor']})"
                )

    return {"ok": not problems, "problems": problems, "checked": checked}


def _rebased_priors(delta_dir: str, recorded: list[str]) -> list[str]:
    """Map build-time prior paths onto the chain's current location: a
    chain rsynced wholesale keeps its segments' relative layout, so the
    recorded-out_dir -> actual-dir prefix transform of the DELTA applies
    to its priors too.  Returns the recorded list unchanged when the
    delta has no usable out_dir record."""
    if not mf.is_committed(delta_dir, "root"):
        return recorded
    rec_self = mf.read_manifest(delta_dir, "root").get("out_dir")
    if not rec_self:
        return recorded
    rec_parent = os.path.dirname(os.path.abspath(rec_self))
    act_parent = os.path.dirname(os.path.abspath(delta_dir))
    return [
        os.path.normpath(
            os.path.join(act_parent, os.path.relpath(p, rec_parent))
        )
        for p in recorded
    ]


def verify_chain(segment_dirs: list[str], deep: bool = False) -> dict:
    """Audit a serving chain: every segment individually, the chain
    prefix contract (each delta built against exactly the dirs before
    it), and the doc-count arithmetic the chain open relies on."""
    segment_dirs = [os.path.abspath(d) for d in segment_dirs]
    problems: list[str] = []
    segments = {}
    for d in segment_dirs:
        segments[d] = verify_segment(d, deep=deep)
        problems += [f"{d}: {p}" for p in segments[d]["problems"]]

    total, tombed = 0, 0
    for k, dk in enumerate(segment_dirs):
        if mf.is_committed(dk, "root"):
            total += int(mf.read_manifest(dk, "root")["n_docs"])
        if k == 0:
            if mf.is_committed(dk, "delta") and mf.read_manifest(
                dk, "delta"
            ).get("prior_dirs"):
                problems.append(
                    f"{dk}: chain starts at a DELTA segment (its recorded "
                    "priors are not in the list)"
                )
            continue
        if not mf.is_committed(dk, "delta"):
            problems.append(f"{dk}: non-base segment without delta manifest")
            continue
        dman = mf.read_manifest(dk, "delta")
        rec = [os.path.abspath(p) for p in dman.get("prior_dirs", [])]
        if rec != segment_dirs[:k] and _rebased_priors(
            dk, rec
        ) != segment_dirs[:k]:
            problems.append(
                f"{dk}: chain mismatch — built against {rec}, listed "
                f"after {segment_dirs[:k]}"
            )
        tombed += sum(int(v) for v in dman.get("tombstones", {}).values())
    live = total - tombed
    if live < 0:
        problems.append(f"negative live doc count: {total} - {tombed}")
    return {
        "ok": not problems,
        "problems": problems,
        "total_docs": total,
        "tombstoned": tombed,
        "live_docs": live,
        "segments": segments,
    }


def verify_vector_store(store_dir: str) -> dict:
    """Fsck for the incremental vector store (pipelines.similarity
    build/append/compact): store.json is the manifest of record, each
    committed generation's ids.parquet must equal the vec_ids actually
    sitting in its bucket files (sorted, unique), buckets must be valid
    for the store kind, and IVF centroids must match n_centroids.
    Generation dirs NOT referenced by store.json (a crashed append's
    leftovers) are reported under ``checked['orphan_generations']`` but
    are not failures — the manifest-last protocol makes them invisible
    to readers and the next append reclaims them.  Ray-free: metadata +
    single-column parquet reads only, usable on a recovery box."""
    import glob
    import json as _json
    import re as _re

    import numpy as np
    import pyarrow.parquet as pq

    store_dir = os.path.abspath(store_dir)
    problems: list[str] = []
    checked: dict = {"store": store_dir}

    meta_path = os.path.join(store_dir, "store.json")
    if not os.path.exists(meta_path):
        return {
            "ok": False,
            "problems": ["store.json missing — not a vector store"],
            "checked": checked,
        }
    try:
        meta = _json.load(open(meta_path))
    except Exception as exc:  # noqa: BLE001
        return {
            "ok": False,
            "problems": [f"store.json unreadable: {exc}"],
            "checked": checked,
        }
    kind = meta.get("kind")
    gens = list(meta.get("gens", []))
    ngen = len(gens)
    checked.update({"kind": kind, "generations": ngen, "gens": gens})
    if kind not in ("ivf", "lsh"):
        problems.append(f"unknown store kind {kind!r}")
    if ngen < 1:
        problems.append("no committed generations")
    if int(meta.get("generations", -1)) != ngen:
        problems.append(
            f"store.json generations={meta.get('generations')} disagrees "
            f"with its gens list ({ngen} entries)"
        )

    max_bucket = None
    if kind == "ivf":
        cpath = os.path.join(store_dir, "centroids.parquet")
        try:
            ncent = pq.ParquetFile(cpath).metadata.num_rows
            if ncent != int(meta.get("n_centroids", -1)):
                problems.append(
                    f"centroids.parquet has {ncent} rows, store.json says "
                    f"{meta.get('n_centroids')}"
                )
            max_bucket = ncent
        except Exception as exc:  # noqa: BLE001 — corrupt parquet
            problems.append(f"centroids.parquet unreadable: {exc}")
    elif kind == "lsh":
        max_bucket = 1 << int(meta.get("n_planes", 0))

    def _gen_vec_ids(gdir: str) -> np.ndarray | None:
        ids = []
        for f in sorted(
            glob.glob(os.path.join(gdir, "bucket=*", "*.parquet"))
        ):
            try:
                ids.append(
                    pq.read_table(f, columns=["vec_id"])["vec_id"]
                    .to_numpy(zero_copy_only=False)
                )
            except Exception as exc:  # noqa: BLE001
                problems.append(f"{f}: unreadable ({exc})")
                return None
        return (
            np.concatenate(ids)
            if ids
            else np.empty(0, dtype=np.int64)
        )

    per_gen: list[int] = []
    newest: dict[int, int] = {}
    for g, gname in enumerate(gens):
        gdir = os.path.join(store_dir, gname)
        if not os.path.isdir(gdir):
            problems.append(f"{gname} missing")
            per_gen.append(0)
            continue
        if max_bucket is not None:
            for bdir in glob.glob(os.path.join(gdir, "bucket=*")):
                b = int(bdir.rsplit("=", 1)[1])
                if not 0 <= b < max_bucket:
                    problems.append(
                        f"{gname}: bucket {b} out of range for "
                        f"{kind} store (max {max_bucket - 1})"
                    )
        actual = _gen_vec_ids(gdir)
        if actual is None:
            per_gen.append(0)
            continue
        per_gen.append(len(actual))
        s = np.sort(actual)
        if len(s) != len(np.unique(s)):
            problems.append(f"{gname}: duplicate vec_ids inside one generation")
        if g >= 1:
            ipath = os.path.join(gdir, "ids.parquet")
            try:
                rec = pq.read_table(ipath)["vec_id"].to_numpy(
                    zero_copy_only=False
                )
            except Exception as exc:  # noqa: BLE001
                problems.append(f"{gname}/ids.parquet unreadable: {exc}")
                rec = None
            if rec is not None and not np.array_equal(np.sort(rec), s):
                problems.append(
                    f"{gname}: ids.parquet disagrees with bucket files "
                    f"({len(rec)} recorded vs {len(s)} actual)"
                )
        for i in s.tolist():
            newest[i] = g

    checked["per_generation_vectors"] = per_gen
    checked["live_vectors"] = len(newest)

    # any gen_* dir the manifest does not reference is a crash leftover
    # (uncommitted append or superseded pre-compaction dirs) — invisible
    # to readers, reclaimed by later maintenance, reported not failed
    orphans = sorted(
        d
        for d in os.listdir(store_dir)
        if _re.fullmatch(r"gen_\w+", d) and d not in gens
    )
    checked["orphan_generations"] = orphans

    return {"ok": not problems, "problems": problems, "checked": checked}
