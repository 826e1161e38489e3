"""Incremental (delta) index segments + compaction.

Reference analog: the live-capture side maintains a SMALL SECONDARY
index over freshly crawled documents next to the immutable main index
(code/processes/live-crawling-process/ — SURVEY.md §2.9 notes it), and
the main index itself is only ever replaced wholesale via the versioned
index switch (StatefulIndex.java:46-96).  This module re-expresses that
as Lucene-style segment composition, the idiomatic shape for a
100 TB-scale engine where full rebuilds per ingest are unaffordable:

- ``build_delta_index``: index NEW/UPDATED documents as a self-contained
  segment (same on-disk format as the base — every phase of
  ``build_index`` reused) whose registry EXTENDS the base registry
  (ids stay stable, like the reference's insertion-stable DB registry)
  and whose keyword extraction loads the base's published
  term-frequency dict (the reference's TermFrequencyDict is a static
  artifact loaded per process, DocumentKeywordExtractor.java:45 — not
  regenerated per ingest).  Updated documents (same repo+path => same
  combined id — VALIDATED during the correction scan, since the ordinal
  is caller-supplied) produce TOMBSTONES against each prior segment plus
  per-term document-frequency corrections, so multi-segment BM25 is
  value-identical to a full rebuild over the corpus-with-replacement.
- ``IndexSearch([base, delta, ...])`` (pipelines.query) searches the
  chain: prior segments suppress tombstoned postings, df/doc-count
  combine across segments.
- ``compact_segments``: fold a chain back into one segment by merging
  journals (minus tombstoned rows) and re-running the derived phases —
  the periodic background merge that restores block-max pruning on the
  previously-tombstoned bases.

Scale notes: a delta is assumed SMALL relative to its priors (the
live-crawl contract); its id set is broadcast once via ``ray.put`` and
every prior-segment scan (tombstone detection over ``forward``,
df corrections over ``journal``) streams distributed with per-batch
partials — nothing materializes a prior segment on the driver.
"""

from __future__ import annotations

import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..stages.docids import DomainRegistry
from ..state import manifest as mf
from .build_index import (
    BuildConfig,
    _cast_part,
    _lineage_rollup,
    build_index,
)


def load_registry(index_dir: str) -> DomainRegistry:
    """Rebuild the DomainRegistry from a segment's registry.parquet."""
    root = mf.read_manifest(index_dir, "root")
    t = pq.read_table(os.path.join(index_dir, "registry.parquet"))
    mapping = {
        r["repo"]: (int(r["domain_id"]), int(r["rank"]), int(r["part"]))
        for r in t.to_pylist()
    }
    return DomainRegistry.from_mapping(mapping, int(root["num_parts"]))


def tombstone_dir(delta_dir: str, prior_idx: int) -> str:
    return os.path.join(delta_dir, "tombstones", f"prior={prior_idx}")


def correction_dir(delta_dir: str, prior_idx: int) -> str:
    return os.path.join(delta_dir, "df_correction", f"prior={prior_idx}")


# per-worker cache of the broadcast tombstone-id array (ray.get is
# zero-copy from plasma, but the sort check + searchsorted setup is
# worth keeping warm across tasks)
_TOMB_CACHE: dict = {}


def _tomb_ids(ref) -> np.ndarray:
    key = ref.hex() if hasattr(ref, "hex") else id(ref)
    ids = _TOMB_CACHE.get(key)
    if ids is None:
        import ray

        if len(_TOMB_CACHE) > 8:  # a few live refs (ids + path map), no leak
            _TOMB_CACHE.clear()
        ids = ray.get(ref) if hasattr(ref, "hex") else ref
        _TOMB_CACHE[key] = ids
    return ids


# the exactness-critical sorted-set semi-join lives in ONE place
from .query import _membership  # noqa: E402


def _tomb_filter_batch(batch: pa.Table, *, ids_ref) -> pa.Table:
    """Keep only rows whose combined_id IS in the broadcast delta id set
    (tombstone detection over a prior segment's forward index)."""
    tomb = _tomb_ids(ids_ref)
    cid = batch["combined_id"].to_numpy(zero_copy_only=False)
    mask = _membership(cid, tomb)
    return batch.filter(pa.array(mask))


def _corr_partial(batch: pa.Table, *, ids_ref, paths_ref=None) -> pa.Table:
    """Per-batch df-correction partial over a prior segment's journal:
    for rows being tombstoned, count per (part, term) how many stale
    documents contain the term (df) and how many carry a flagged posting
    (prio df, same low-byte predicate as stages.prio.explode_flagged).

    When ``paths_ref`` (the delta's sorted combined_id -> repo/path
    table) is given, every colliding row's identity is VALIDATED: the
    update contract is same repo+path => same combined id, and the
    ordinal inside the id is caller-supplied — a delta that reuses an
    unrelated base document's ordinal would otherwise silently tombstone
    that document and subtract its df corrections."""
    tomb = _tomb_ids(ids_ref)
    cid = batch["combined_id"].to_numpy(zero_copy_only=False)
    mask = _membership(cid, tomb)
    if not mask.any():
        return pa.table(
            {
                "part": pa.array([], pa.int32()),
                "term_id": pa.array([], pa.int64()),
                "cnt": pa.array([], pa.int64()),
                "prio_cnt": pa.array([], pa.int64()),
            }
        )
    sel = batch.filter(pa.array(mask))
    if paths_ref is not None:
        ptab = _tomb_ids(paths_ref)
        vcid = ptab["combined_id"].to_numpy(zero_copy_only=False)
        scid = sel["combined_id"].to_numpy(zero_copy_only=False)
        take = pa.array(np.searchsorted(vcid, scid), pa.int64())
        ok = pc.and_(
            pc.equal(ptab["repo"].take(take), sel["repo"].combine_chunks()),
            pc.equal(ptab["path"].take(take), sel["path"].combine_chunks()),
        )
        if not pc.min(ok).as_py():
            bad = int(np.flatnonzero(~ok.to_numpy(zero_copy_only=False))[0])
            raise ValueError(
                "delta id collision with a DIFFERENT document: combined_id "
                f"{int(scid[bad])} is "
                f"{ptab['repo'].take(take)[bad].as_py()!r}/"
                f"{ptab['path'].take(take)[bad].as_py()!r} in the delta but "
                f"{sel['repo'][bad].as_py()!r}/{sel['path'][bad].as_py()!r} "
                "in the prior segment; the caller-supplied ordinal reuses "
                "an unrelated document's id (update contract: same "
                "repo+path => same combined id)"
            )
        sel = sel.drop_columns(["repo", "path"])
    parts = pc.cast(sel["part"], pa.int32()).to_numpy(zero_copy_only=False)
    tids_col = sel["term_ids"].combine_chunks()
    flat_tid = pc.list_flatten(tids_col).to_numpy(zero_copy_only=False)
    flat_meta = pc.list_flatten(sel["term_meta"].combine_chunks()).to_numpy(
        zero_copy_only=False
    )
    lens = pc.list_value_length(tids_col).to_numpy(zero_copy_only=False)
    flat_part = np.repeat(parts, lens)
    flagged = (flat_meta & 0xFF) != 0
    out = {"part": [], "term_id": [], "cnt": [], "prio_cnt": []}
    for p in np.unique(flat_part):
        m = flat_part == p
        uniq, inv = np.unique(flat_tid[m], return_inverse=True)
        cnt = np.bincount(inv)
        pcnt = np.bincount(inv, weights=flagged[m].astype(np.int64)).astype(
            np.int64
        )
        out["part"].extend([int(p)] * len(uniq))
        out["term_id"].extend(uniq.tolist())
        out["cnt"].extend(cnt.tolist())
        out["prio_cnt"].extend(pcnt.tolist())
    return pa.table(
        {
            "part": pa.array(out["part"], pa.int32()),
            "term_id": pa.array(out["term_id"], pa.int64()),
            "cnt": pa.array(out["cnt"], pa.int64()),
            "prio_cnt": pa.array(out["prio_cnt"], pa.int64()),
        }
    )


def _merge_corr_group(group: pa.Table) -> pa.Table:
    """One part's correction partials -> final per-term correction rows."""
    tid = group["term_id"].to_numpy(zero_copy_only=False)
    uniq, inv = np.unique(tid, return_inverse=True)
    cnt = np.bincount(
        inv, weights=group["cnt"].to_numpy(zero_copy_only=False)
    ).astype(np.int64)
    pcnt = np.bincount(
        inv, weights=group["prio_cnt"].to_numpy(zero_copy_only=False)
    ).astype(np.int64)
    part = group["part"].to_numpy(zero_copy_only=False)[0]
    return pa.table(
        {
            "part": pa.array([int(part)] * len(uniq), pa.int32()),
            "term_id": pa.array(uniq, pa.int64()),
            "cnt": pa.array(cnt, pa.int64()),
            "prio_cnt": pa.array(pcnt, pa.int64()),
        }
    )


def _validate_chain(dirs: list[str], strict: bool = False) -> None:
    """Chain-prefix validation shared by build_delta_index /
    build_delete_delta / compact_segments (IndexSearch enforces the same
    contract read-side): every segment that is itself a delta must have
    been built against exactly the dirs listed before it — the tombstone
    dirs are resolved positionally, and a reordered or truncated chain
    would silently mis-aim them.  ``strict`` additionally requires every
    non-base segment to BE a committed delta (compaction's contract)."""
    for k, dk in enumerate(dirs):
        if mf.is_committed(dk, "delta"):
            rec = [
                os.path.abspath(d)
                for d in mf.read_manifest(dk, "delta").get("prior_dirs", [])
            ]
            if rec != dirs[:k]:
                raise ValueError(
                    f"segment list is not a consistent chain: {dk} was "
                    f"built against {rec}, but is listed after {dirs[:k]}"
                )
        elif strict and k > 0:
            raise ValueError(
                f"non-base segment {dk} has no delta manifest — is the "
                "chain ordered base-first?"
            )


def _lay_tombstones(
    delta_dir: str,
    prior_dirs: list[str],
    delta_ids: np.ndarray,
    paths_ref=None,
) -> dict[str, int]:
    """Scan each prior segment for ids in ``delta_ids`` and lay per-prior
    tombstone tables + per-term df corrections under ``delta_dir``.
    Shared by update deltas (``paths_ref`` carries the delta's id ->
    repo/path map for collision validation) and delete deltas (no new
    documents, so no identity to validate).  Returns per-prior tombstone
    counts."""
    import ray
    import ray.data as rd

    n_tomb: dict[str, int] = {}
    for j, prior in enumerate(prior_dirs):
        # doc-less priors (delete-only deltas) hold no postings to
        # tombstone
        if not os.path.isdir(os.path.join(prior, "forward")):
            n_tomb[prior] = 0
            continue
        # ids ALREADY tombstoned against this prior by the deltas
        # between it and us (chain prefix property: prior_dirs[k]'s
        # own prior list is prior_dirs[:k], so its tombstones against
        # `prior` live at index j) — re-tombstoning them would
        # double-subtract the df corrections
        already = [
            pq.read_table(
                tombstone_dir(prior_dirs[k], j), columns=["combined_id"]
            )["combined_id"].to_numpy(zero_copy_only=False)
            for k in range(j + 1, len(prior_dirs))
            if os.path.isdir(tombstone_dir(prior_dirs[k], j))
        ]
        eff_ids = (
            np.setdiff1d(delta_ids, np.concatenate(already))
            if already
            else delta_ids
        )
        ids_ref = ray.put(eff_ids)
        # id-set predicate pushed into the parquet scans: row groups
        # whose combined_id stats exclude the whole delta never load,
        # and late materialization skips the heavy journal columns
        # for non-matching rows.  Combined ids are domain-major, so a
        # real ingest (fresh docs of a few domains) clusters into few
        # row groups — the scan cost tracks the TOUCHED id ranges,
        # not the corpus.  The in-task membership checks stay as the
        # exactness guarantee.
        id_filter = pc.field("combined_id").isin(pa.array(eff_ids))
        tomb_ds = (
            rd.read_parquet(
                os.path.join(prior, "forward"),
                columns=["part", "combined_id"],
                filter=id_filter,
            )
            .map_batches(_cast_part, batch_format="pyarrow")
            .map_batches(
                _tomb_filter_batch,
                fn_kwargs={"ids_ref": ids_ref},
                batch_format="pyarrow",
            )
            .materialize()
        )
        cnt = tomb_ds.count()
        n_tomb[prior] = int(cnt)
        if cnt:
            tomb_ds.write_parquet(
                tombstone_dir(delta_dir, j), partition_cols=["part"]
            )
            columns = ["part", "combined_id", "term_ids", "term_meta"]
            if paths_ref is not None:
                columns += ["repo", "path"]
            corr = (
                rd.read_parquet(
                    os.path.join(prior, "journal"),
                    columns=columns,
                    filter=id_filter,
                )
                .map_batches(_cast_part, batch_format="pyarrow")
                .map_batches(
                    _corr_partial,
                    fn_kwargs={"ids_ref": ids_ref, "paths_ref": paths_ref},
                    batch_format="pyarrow",
                )
                .groupby("part")
                .map_groups(_merge_corr_group, batch_format="pyarrow")
            )
            corr.write_parquet(
                correction_dir(delta_dir, j), partition_cols=["part"]
            )
    return n_tomb


def build_delta_index(
    delta_corpus_ds,
    prior_dirs: list[str],
    delta_dir: str,
    cfg: BuildConfig | None = None,
) -> dict:
    """Build a delta segment over NEW or UPDATED documents.

    The delta reuses every phase of ``build_index`` (same on-disk
    format, so the query side needs no special casing) with two
    overrides: the registry extends the LAST prior segment's registry
    (ids stable, new repos appended), and keyword extraction loads the
    FIRST prior's published term-frequency dict.  After the build, each
    prior segment is scanned (distributed, projection-pushdown reads)
    for ids the delta replaces; those become per-prior tombstone tables
    plus per-term df corrections so multi-segment scoring equals a full
    rebuild over the corpus-with-replacement.
    """
    import ray
    import ray.data as rd

    cfg = cfg or BuildConfig()
    prior_dirs = [os.path.abspath(d) for d in prior_dirs]
    base_dir = prior_dirs[0]
    last_dir = prior_dirs[-1]

    _validate_chain(prior_dirs)

    # the delta MUST partition like its base: the extended registry
    # assigns parts modulo the base's num_parts, and a smaller cfg value
    # would silently build postings for only a prefix of the parts
    # (documents in the rest would vanish from the chain while their
    # base copies are tombstoned)
    base_parts = int(mf.read_manifest(base_dir, "root")["num_parts"])
    if cfg.num_parts != base_parts:
        from dataclasses import replace

        cfg = replace(cfg, num_parts=base_parts)
    # the delta must tokenize with the base's journal semantics: an
    # anchor/link-keyword/feature-enabled base expects the same derived
    # terms in every segment of the chain, or updated documents silently
    # fall out of those query families (pre-flag manifests lack the
    # keys -> False).  One manifest read covers all three flags.
    base_jman = mf.read_manifest(base_dir, "journal")
    inherited = {
        name: bool(base_jman.get(name, False))
        for name in ("anchor_regions", "link_keywords", "html_features")
    }
    if any(getattr(cfg, k) != v for k, v in inherited.items()):
        from dataclasses import replace

        cfg = replace(cfg, **inherited)

    if not mf.is_committed(delta_dir, "root"):
        # materialize the delta corpus ONCE: it is delta-sized by the
        # live-ingest contract, and the registry probe + journal phase
        # would otherwise each re-execute the caller's (possibly
        # corpus-sized, e.g. full-scan-and-filter) input pipeline —
        # measured 2 extra full-corpus passes at 960k docs
        delta_corpus_ds = delta_corpus_ds.materialize()
        reg = load_registry(last_dir)
        repos = delta_corpus_ds.select_columns(["repo"]).unique("repo")
        reg = reg.extended(list(repos))
        base_stats = mf.read_manifest(base_dir, "stats")
        # inherit the base's stats phase instead of recomputing it: the
        # delta tokenizes against the base's PUBLISHED tf dict anyway,
        # and the base's hot-term set (corpus-df skew) is the right
        # merge-balancing signal for the delta's reverse build — a
        # delta-local df scan would both waste a full corpus pass and
        # mis-rank hotness
        if not mf.is_committed(delta_dir, "stats"):
            mf.commit_manifest(
                delta_dir,
                "stats",
                {**base_stats, "inherited_from": base_dir},
            )
        build_index(
            delta_corpus_ds,
            delta_dir,
            cfg,
            registry=reg,
            tfdict_dir=os.path.join(base_dir, "stats"),
            tfdict_doc_count=int(base_stats["doc_count"]),
        )

    if not mf.is_committed(delta_dir, "delta"):
        t0 = time.time()
        # resume idempotence: the phase commits ONE manifest at the end,
        # so any tombstone/correction files from a crashed earlier
        # attempt are garbage — Ray's parquet sink APPENDS, and appending
        # to them would double-count the df corrections
        import shutil

        shutil.rmtree(os.path.join(delta_dir, "tombstones"), ignore_errors=True)
        shutil.rmtree(
            os.path.join(delta_dir, "df_correction"), ignore_errors=True
        )
        # the delta's own id set: small by the live-ingest contract —
        # collected once, broadcast to every prior-segment scan task
        delta_ids = np.sort(
            pq.read_table(
                os.path.join(delta_dir, "forward"), columns=["combined_id"]
            )["combined_id"].to_numpy(zero_copy_only=False)
        )
        # delta-sized identity map for collision validation in the
        # correction scan (see _corr_partial)
        paths_ref = ray.put(
            pq.read_table(
                os.path.join(delta_dir, "journal"),
                columns=["combined_id", "repo", "path"],
            ).sort_by("combined_id")
        )
        n_tomb = _lay_tombstones(delta_dir, prior_dirs, delta_ids, paths_ref)
        mf.commit_manifest(
            delta_dir,
            "delta",
            {
                "prior_dirs": prior_dirs,
                "tombstones": n_tomb,
                "n_docs": mf.read_manifest(delta_dir, "root")["n_docs"],
                "seconds": round(time.time() - t0, 3),
            },
        )
    return mf.read_manifest(delta_dir, "delta")


def _purge_match_batch(batch: pa.Table, *, spec_ref) -> pa.Table:
    """Rows of a prior journal matching the purge spec -> (part,
    combined_id).  Whole-repo purges match on repo; path purges match on
    the NUL-joined (repo, path) key (NUL cannot appear in either)."""
    full_repos, pair_keys = _tomb_ids(spec_ref)
    if full_repos:
        mask = pc.is_in(
            batch["repo"], value_set=pa.array(full_repos, pa.string())
        )
    else:
        mask = pa.array(np.zeros(batch.num_rows, dtype=bool))
    if pair_keys:
        key = pc.binary_join_element_wise(
            batch["repo"], batch["path"], "\x00"
        )
        mask = pc.or_(
            mask, pc.is_in(key, value_set=pa.array(pair_keys, pa.string()))
        )
    return batch.select(["part", "combined_id"]).filter(mask)


def build_delete_delta(
    prior_dirs: list[str],
    delta_dir: str,
    repos: list[str] | None = None,
    paths: list[tuple[str, str]] | None = None,
    allow_empty: bool = False,
) -> dict:
    """Tombstone-ONLY delta: physically purge documents from a chain
    without reindexing anything (the domain-blacklist / takedown story —
    the reference suppresses blacklisted domains at query time and drops
    them physically on the next crawl cycle; this is the physical half,
    chain-native).

    The segment carries NO documents — only per-prior tombstones + df
    corrections, resolved from a purge spec:

      * ``repos`` — purge EVERY document of these repos, and/or
      * ``paths`` — purge individual ``(repo, path)`` documents.

    The spec resolves against every prior's journal with repo-pushdown
    projection reads (the caller never needs to know ids), including
    documents REPLACED into later update deltas.  After the build,
    ``IndexSearch([*prior_dirs, delete_dir])`` scores exactly like a
    rebuild over the corpus minus the purged docs (df corrections
    subtract the purged postings), and ``compact_segments`` — journal or
    blob path — physically drops them.
    """
    import shutil

    import ray
    import ray.data as rd

    if not repos and not paths:
        raise ValueError("delete delta needs a non-empty purge spec")
    prior_dirs = [os.path.abspath(d) for d in prior_dirs]
    _validate_chain(prior_dirs)
    if mf.is_committed(delta_dir, "delta"):
        return mf.read_manifest(delta_dir, "delta")

    t0 = time.time()
    full_repos = sorted(set(repos or []))
    pair_keys = sorted({f"{r}\x00{p}" for r, p in (paths or [])})
    touched_repos = sorted(
        set(full_repos) | {k.split("\x00", 1)[0] for k in pair_keys}
    )
    base_parts = int(mf.read_manifest(prior_dirs[0], "root")["num_parts"])

    # resolve the spec -> combined ids across every prior that holds
    # documents (delete-only priors have no journal).  repo pushdown
    # prunes the scans to the touched repos' row groups; ids are
    # purge-sized by contract, so a driver-side union is fine.
    spec_ref = ray.put((full_repos, pair_keys))
    repo_filter = pc.field("repo").isin(pa.array(touched_repos, pa.string()))
    resolved = None
    for prior in prior_dirs:
        if not os.path.isdir(os.path.join(prior, "journal")):
            continue
        seg = rd.read_parquet(
            os.path.join(prior, "journal"),
            columns=["part", "combined_id", "repo", "path"],
            filter=repo_filter,
        ).map_batches(_cast_part, batch_format="pyarrow").map_batches(
            _purge_match_batch,
            fn_kwargs={"spec_ref": spec_ref},
            batch_format="pyarrow",
        )
        resolved = seg if resolved is None else resolved.union(seg)
    chunks = [
        b["combined_id"].to_numpy(zero_copy_only=False)
        for b in resolved.iter_batches(batch_format="pyarrow")
    ]
    delta_ids = (
        np.unique(np.concatenate(chunks))
        if chunks
        else np.array([], dtype=np.int64)
    )
    if len(delta_ids) == 0 and not allow_empty:
        # the takedown use case must fail LOUDLY on a typo'd repo/path —
        # a committed no-op delete reads as "purge done" while every
        # intended document keeps serving
        raise ValueError(
            f"purge spec matched no documents (repos={full_repos}, "
            f"{len(pair_keys)} paths); pass allow_empty=True if a no-op "
            "delete is intended"
        )

    # segment skeleton: a doc-less delta is still a first-class chain
    # member — root/stats manifests + the registry superset copy, so
    # chain opens, later deltas and compaction treat it uniformly
    os.makedirs(delta_dir, exist_ok=True)
    # resume idempotence: the delta manifest commits LAST; partial
    # tombstone/correction parquet from a crashed attempt would be
    # appended to
    shutil.rmtree(os.path.join(delta_dir, "tombstones"), ignore_errors=True)
    shutil.rmtree(os.path.join(delta_dir, "df_correction"), ignore_errors=True)
    shutil.copyfile(
        os.path.join(prior_dirs[-1], "registry.parquet"),
        os.path.join(delta_dir, "registry.parquet"),
    )
    if not mf.is_committed(delta_dir, "stats"):
        mf.commit_manifest(
            delta_dir,
            "stats",
            {
                **mf.read_manifest(prior_dirs[0], "stats"),
                "inherited_from": prior_dirs[0],
            },
        )
    if not mf.is_committed(delta_dir, "root"):
        mf.commit_manifest(
            delta_dir,
            "root",
            {
                "n_docs": 0,
                "num_parts": base_parts,
                "out_dir": delta_dir,
                "delete_only": True,
            },
        )

    n_tomb = _lay_tombstones(delta_dir, prior_dirs, delta_ids, None)
    mf.commit_manifest(
        delta_dir,
        "delta",
        {
            "prior_dirs": prior_dirs,
            "tombstones": n_tomb,
            "n_docs": 0,
            "delete_only": True,
            "purge_repos": full_repos,
            "purge_paths": len(pair_keys),
            "purged_ids": int(len(delta_ids)),
            "seconds": round(time.time() - t0, 3),
        },
    )
    return mf.read_manifest(delta_dir, "delta")


def _strip_tomb(batch: pa.Table, *, ids_ref) -> pa.Table:
    tomb = _tomb_ids(ids_ref)
    cid = batch["combined_id"].to_numpy(zero_copy_only=False)
    return batch.filter(pa.array(~_membership(cid, tomb)))


def _strip_postings_batch(
    batch: pa.Table, *, tomb_ref=None, aff_ref=None, block=None
) -> pa.Table:
    """Blob-level strip over a prior segment's finished posting rows.
    With ``block`` set, untouched rows KEEP their blk_* block-max side
    columns (zero decode) and only rewritten rows recompute them; with
    ``block=None`` the blk_* columns drop (legacy flow — a downstream
    add_block_stats recomputes for every row)."""
    from ..stages.reverse import strip_posting_tombstones

    if block is None:
        blk = [c for c in batch.column_names if c.startswith("blk_")]
        if blk:
            batch = batch.drop_columns(blk)
    if tomb_ref is None:
        return batch
    aff = _tomb_ids(aff_ref) if aff_ref is not None else None
    tomb = _tomb_ids(tomb_ref)
    if isinstance(aff, dict):  # per-part prefilter
        return _per_part(
            batch,
            lambda sub, p: strip_posting_tombstones(
                sub, tomb, aff.get(p, _EMPTY_TIDS), block=block
            ),
        )
    return strip_posting_tombstones(batch, tomb, aff, block=block)


_EMPTY_TIDS = np.array([], dtype=np.int64)


def _per_part(batch: pa.Table, fn) -> pa.Table:
    """Apply ``fn(sub_batch, part)`` per part value (batches from hive
    reads are near-always single-part, so this is one call)."""
    parts = batch["part"].to_numpy(zero_copy_only=False)
    uniq = np.unique(parts)
    if len(uniq) <= 1:
        return fn(batch, int(uniq[0])) if len(uniq) else batch
    outs = [fn(batch.filter(pa.array(parts == p)), int(p)) for p in uniq]
    return pa.concat_tables(outs)


def _split_hot(batch: pa.Table, *, hot_ref, keep_hot: bool) -> pa.Table:
    """Route posting rows by term temperature: ``hot`` terms (present in
    >= 2 segments) must co-locate and k-way merge; everything else
    passes through the compaction WITHOUT the all-to-all sort."""
    hot_by_part = _tomb_ids(hot_ref)
    parts = batch["part"].to_numpy(zero_copy_only=False)
    tids = batch["term_id"].to_numpy(zero_copy_only=False)
    mask = np.zeros(len(tids), dtype=bool)
    for p in np.unique(parts):
        hp = hot_by_part.get(int(p))
        if hp is not None and len(hp):
            sel = parts == p
            mask[sel] = _membership(tids[sel], hp)
    if not keep_hot:
        mask = ~mask
    return batch.filter(pa.array(mask))


def _strip_prio_batch(batch: pa.Table, *, tomb_ref=None, aff_ref=None) -> pa.Table:
    from ..stages.prio import strip_prio_tombstones

    if tomb_ref is None:
        return batch
    aff = _tomb_ids(aff_ref) if aff_ref is not None else None
    tomb = _tomb_ids(tomb_ref)
    if isinstance(aff, dict):  # per-part prefilter
        return _per_part(
            batch,
            lambda sub, p: strip_prio_tombstones(
                sub, tomb, aff.get(p, _EMPTY_TIDS)
            ),
        )
    return strip_prio_tombstones(batch, tomb, aff)


def compact_segments(
    segment_dirs: list[str],
    out_dir: str,
    cfg: BuildConfig | None = None,
    blob_merge: bool = False,
) -> dict:
    """Fold a segment chain into ONE fresh segment.

    The merged journal = every segment's journal minus the rows
    tombstoned by later segments (streamed, distributed); the derived
    phases (forward/reverse/prio) then rebuild from it via the standard
    ``build_index`` machinery (journal + stats pre-committed).  The
    published term-frequency dict (stats) carries over from the FIRST
    segment — the reference regenerates its TermFrequencyDict in a
    separate offline batch (TermFrequencyExporter), never inline with an
    ingest.  Compaction restores block-max pruning on previously-
    tombstoned bases and resets the suppression chain.

    ``blob_merge=True`` switches the derived phases to BLOB-LEVEL
    merging (the Lucene tiered-merge shape): instead of re-encoding the
    reverse/prio indexes from the merged journal, each segment's
    FINISHED posting rows are reused directly — tombstoned postings are
    cut out of the priors' compressed blobs (strip kernels in
    stages.reverse / stages.prio, byte-identical re-encode of only the
    affected rows, prefiltered by the recorded df-correction term sets),
    then rows k-way merge per (part, bucket) where single-segment terms
    pass through zero-copy.  Decode/re-encode work is DELTA-sized, not
    corpus-sized; output postings are byte-identical to the rebuild
    path.  Requires every segment built with the same num_buckets.
    """
    import ray
    import ray.data as rd

    cfg = cfg or BuildConfig()
    segment_dirs = [os.path.abspath(d) for d in segment_dirs]
    # a reordered or partial list would silently mis-aim the positional
    # tombstone dirs (stale duplicates survive into the merged journal)
    # and copy the wrong registry/stats (segment_dirs[-1]/[0] are assumed
    # newest-delta/base below)
    _validate_chain(segment_dirs, strict=True)
    os.makedirs(out_dir, exist_ok=True)

    # gather, per segment, the union of tombstoned ids laid down by later
    # segments (id arrays are delta-sized: small), plus — for the blob
    # path — the corrected term ids PER PART (exactly the terms whose
    # posting lists contain a tombstoned doc in that part; combined ids
    # are domain-major, so a purged/updated repo's corrections cluster
    # into its home part and the other parts' strips skip the decode)
    tomb_for: dict[str, list[np.ndarray]] = {d: [] for d in segment_dirs}
    corr_for: dict[str, list[pa.Table]] = {d: [] for d in segment_dirs}
    for k, dk in enumerate(segment_dirs):
        if not mf.is_committed(dk, "delta"):
            continue
        dman = mf.read_manifest(dk, "delta")
        for j, prior in enumerate(dman.get("prior_dirs", [])):
            td = tombstone_dir(dk, j)
            if prior in tomb_for and os.path.isdir(td):
                tomb_for[prior].append(
                    pq.read_table(td, columns=["combined_id"])[
                        "combined_id"
                    ].to_numpy(zero_copy_only=False)
                )
            cd = correction_dir(dk, j)
            if blob_merge and prior in corr_for and os.path.isdir(cd):
                corr_for[prior].append(
                    _read_hive(cd, ["part", "term_id", "prio_cnt"])
                )

    if not mf.is_committed(out_dir, "journal"):
        t0 = time.time()
        # resume idempotence: a crash between the parquet writes and the
        # manifest commit leaves partial dirs the APPEND sink would
        # double on re-run
        import shutil

        shutil.rmtree(os.path.join(out_dir, "journal"), ignore_errors=True)
        shutil.rmtree(os.path.join(out_dir, "lang_index"), ignore_errors=True)
        merged = None
        for d in segment_dirs:
            if not os.path.isdir(os.path.join(d, "journal")):
                continue  # delete-only delta: contributes tombstones only
            seg = rd.read_parquet(os.path.join(d, "journal")).map_batches(
                _cast_part, batch_format="pyarrow"
            )
            tombs = tomb_for[d]
            if tombs:
                ids_ref = ray.put(np.unique(np.concatenate(tombs)))
                seg = seg.map_batches(
                    _strip_tomb,
                    fn_kwargs={"ids_ref": ids_ref},
                    batch_format="pyarrow",
                )
            merged = seg if merged is None else merged.union(seg)
        merged.write_parquet(
            os.path.join(out_dir, "journal"), partition_cols=["part"]
        )
        rd.read_parquet(
            os.path.join(out_dir, "journal"),
            columns=["part", "lang", "combined_id"],
        ).map_batches(_cast_part, batch_format="pyarrow").write_parquet(
            os.path.join(out_dir, "lang_index"), partition_cols=["part", "lang"]
        )
        import shutil

        # registry: the LAST segment's is the superset (append-only chain)
        shutil.copyfile(
            os.path.join(segment_dirs[-1], "registry.parquet"),
            os.path.join(out_dir, "registry.parquet"),
        )
        import pyarrow.dataset as pads

        n_docs = pads.dataset(os.path.join(out_dir, "journal")).count_rows()
        # region/keyword semantics carry across compaction (the merged
        # journal holds already-derived rows) — one manifest read
        base_jman = mf.read_manifest(segment_dirs[0], "journal")
        mf.commit_manifest(
            out_dir,
            "journal",
            {
                "n_docs": n_docs,
                "num_parts": mf.read_manifest(segment_dirs[0], "root")[
                    "num_parts"
                ],
                **{
                    name: bool(base_jman.get(name, False))
                    for name in (
                        "anchor_regions",
                        "link_keywords",
                        "html_features",
                    )
                },
                # same per-part sha256-XOR lineage a fresh build records
                # (the verifier's deep audit + trace-back contract holds
                # across compactions)
                "per_part_lineage": _lineage_rollup(
                    os.path.join(out_dir, "journal")
                ),
                "compacted_from": segment_dirs,
                "seconds": round(time.time() - t0, 3),
                "files": mf.list_phase_files(out_dir, "journal"),
                "lang_files": mf.list_phase_files(out_dir, "lang_index"),
            },
        )

    if not mf.is_committed(out_dir, "stats"):
        import shutil

        src = os.path.join(segment_dirs[0], "stats")
        dst = os.path.join(out_dir, "stats")
        os.makedirs(dst, exist_ok=True)
        for fn in os.listdir(src):
            if fn.endswith(".parquet"):
                shutil.copyfile(os.path.join(src, fn), os.path.join(dst, fn))
        base_stats = mf.read_manifest(segment_dirs[0], "stats")
        mf.commit_manifest(out_dir, "stats", base_stats)

    if blob_merge:
        _blob_merge_phases(segment_dirs, out_dir, cfg, tomb_for, corr_for)

    return build_index(None, out_dir, cfg)


def _aff_by_part(
    tables: list[pa.Table], prio: bool = False
) -> dict[int, np.ndarray]:
    """Corrected-term prefilter per part: {part -> sorted term ids}."""
    cat = pa.concat_tables(tables)
    part = cat["part"].to_numpy(zero_copy_only=False)
    tid = cat["term_id"].to_numpy(zero_copy_only=False)
    if prio:
        m = cat["prio_cnt"].to_numpy(zero_copy_only=False) > 0
        part, tid = part[m], tid[m]
    return {int(p): np.unique(tid[part == p]) for p in np.unique(part)}


def _blob_merge_phases(
    segment_dirs: list[str],
    out_dir: str,
    cfg: BuildConfig,
    tomb_for: dict[str, list[np.ndarray]],
    corr_for: dict[str, list[pa.Table]],
) -> None:
    """Pre-commit forward/reverse/prio for a blob-level compaction: every
    phase streams each segment's FINISHED artifacts through a tombstone
    strip and a (part, bucket)-grouped k-way merge — no journal
    re-tokenize/re-encode.  build_index then skips the committed phases
    and only stamps the root manifest."""
    import functools
    import time as _time

    import pyarrow.dataset as pads
    import ray
    import ray.data as rd

    from ..stages.reverse import add_block_stats, merge_runs_tree
    from ..stages.prio import merge_prio_segments
    from .build_index import _clear_dir

    # blob merging composes rows ACROSS segments per (part, bucket): the
    # bucket function must agree, or a term's rows land in different
    # groups and survive as duplicates
    doc_segments = [
        d for d in segment_dirs if mf.is_committed(d, "reverse")
    ]  # delete-only deltas hold no blobs; their tombstones are in tomb_for
    buckets_seen = {
        d: mf.read_manifest(d, "reverse").get("num_buckets")
        for d in doc_segments
    }
    if len(set(buckets_seen.values())) != 1:
        raise ValueError(
            "blob_merge requires every segment built with the same "
            f"num_buckets; got {buckets_seen} — use blob_merge=False"
        )
    # the strip/merge kernels decode varint position streams in place; a
    # legacy gamma segment must be transcoded back to the hot format first
    from .transcode import positions_codec

    gamma_segs = [d for d in doc_segments if positions_codec(d) != "varint"]
    if gamma_segs:
        raise ValueError(
            "blob_merge requires varint positions; transcode these "
            f"segments first (pipelines.transcode): {gamma_segs}"
        )
    num_parts = int(mf.read_manifest(segment_dirs[0], "root")["num_parts"])

    # broadcast the per-segment tombstone unions + per-part affected-term
    # sets once
    refs: dict[str, tuple] = {}
    for d in segment_dirs:
        if tomb_for[d]:
            tomb = np.unique(np.concatenate(tomb_for[d]))
            aff = _aff_by_part(corr_for[d]) if corr_for[d] else None
            paff = (
                _aff_by_part(corr_for[d], prio=True) if corr_for[d] else None
            )
            refs[d] = (
                ray.put(tomb),
                ray.put(aff) if aff is not None else None,
                ray.put(paff) if paff is not None else None,
            )

    def _read_stripped(
        sub: str, kind: str, block: int | None = None, split=None
    ):
        ds = None
        for d in doc_segments:
            tomb_ref, aff_ref, paff_ref = refs.get(d, (None, None, None))
            seg = rd.read_parquet(os.path.join(d, sub)).map_batches(
                _cast_part, batch_format="pyarrow"
            )
            if split is not None:
                # temperature routing BEFORE the strip (membership on
                # (part, term_id) only — no blob decode), so each row's
                # strip runs exactly once across the two passes
                seg = seg.map_batches(
                    _split_hot,
                    fn_kwargs={"hot_ref": split[0], "keep_hot": split[1]},
                    batch_format="pyarrow",
                )
            if kind == "forward":
                if tomb_ref is not None:
                    seg = seg.map_batches(
                        _strip_tomb,
                        fn_kwargs={"ids_ref": tomb_ref},
                        batch_format="pyarrow",
                    )
            else:
                fn = (
                    _strip_postings_batch
                    if kind == "reverse"
                    else _strip_prio_batch
                )
                kw = {
                    "tomb_ref": tomb_ref,
                    "aff_ref": aff_ref if kind == "reverse" else paff_ref,
                }
                if kind == "reverse":
                    kw["block"] = block
                seg = seg.map_batches(
                    fn,
                    fn_kwargs=kw,
                    batch_format="pyarrow",
                )
            ds = seg if ds is None else ds.union(seg)
        return ds

    if not mf.is_committed(out_dir, "forward"):
        t0 = _time.time()
        fwd = (
            _read_stripped("forward", "forward")
            .groupby("part")
            .map_groups(
                lambda t: t.sort_by("combined_id"), batch_format="pyarrow"
            )
        )
        _clear_dir(os.path.join(out_dir, "forward"))
        fwd.write_parquet(os.path.join(out_dir, "forward"), partition_cols=["part"])
        per_part = {}
        for p in range(num_parts):
            d = os.path.join(out_dir, "forward", f"part={p}")
            if os.path.isdir(d):
                per_part[str(p)] = pads.dataset(d).count_rows()
        mf.commit_manifest(
            out_dir,
            "forward",
            {
                "per_part_docs": per_part,
                "seconds": round(_time.time() - t0, 3),
                "files": mf.list_phase_files(out_dir, "forward"),
                "lineage": {"blob_merged_from": segment_dirs},
            },
        )

    if not mf.is_committed(out_dir, "reverse"):
        t0 = _time.time()
        # temperature split: a term needs the (part, bucket) all-to-all
        # sort + k-way merge ONLY if it appears in >= 2 segments.  At a
        # few-% churn that is a minority of rows AND of bytes, so the
        # cold majority streams straight to the output — tombstones
        # stripped in place, blk_* block-max columns preserved (the 960k
        # measurement of the sort-everything variant was 1.7x the
        # journal-rebuild path; this split is what makes blob merge
        # cheaper).  Hot sets are vocabulary-sized per part (term_id-only
        # columnar scans), broadcast once.
        hot_by_part: dict[int, np.ndarray] = {}
        for p in range(num_parts):
            if len(doc_segments) <= 1:
                hot_by_part[p] = _EMPTY_TIDS  # nothing can appear twice
                continue
            arrs = []
            for d in doc_segments:
                pdir = os.path.join(d, "postings", f"part={p}")
                if os.path.isdir(pdir):
                    arrs.append(
                        pq.read_table(pdir, columns=["term_id"])[
                            "term_id"
                        ].to_numpy(zero_copy_only=False)
                    )
            if len(arrs) <= 1:
                hot_by_part[p] = _EMPTY_TIDS
                continue
            uniq, counts = np.unique(np.concatenate(arrs), return_counts=True)
            hot_by_part[p] = uniq[counts > 1]
        hot_ref = ray.put(hot_by_part)
        block = cfg.posting_block or None
        any_hot = any(len(v) for v in hot_by_part.values())

        _clear_dir(os.path.join(out_dir, "postings"))
        cold = _read_stripped(
            "postings", "reverse", block=block, split=(hot_ref, False)
        )
        cold.write_parquet(
            os.path.join(out_dir, "postings"), partition_cols=["part"]
        )
        if any_hot:
            # hot rows lose their blk_* columns inside the strip
            # (block=None) — the re-merge invalidates them and
            # add_block_stats recomputes after
            hot = _read_stripped(
                "postings", "reverse", block=None, split=(hot_ref, True)
            )
            merged = hot.groupby(["part", "bucket"]).map_groups(
                merge_runs_tree, batch_format="pyarrow"
            )
            if block:
                merged = merged.map_batches(
                    functools.partial(add_block_stats, block=block),
                    batch_format="pyarrow",
                )
            merged.write_parquet(
                os.path.join(out_dir, "postings"), partition_cols=["part"]
            )
        for p in range(num_parts):
            d = os.path.join(out_dir, "postings", f"part={p}")
            if not os.path.isdir(d):
                continue
            seg_tbl = pads.dataset(d).to_table(columns=["df"])
            mf.commit_manifest(
                out_dir,
                f"reverse_part_{p}",
                {
                    "part": p,
                    "postings": int(
                        np.sum(seg_tbl["df"].to_numpy(zero_copy_only=False))
                    ),
                    "terms": seg_tbl.num_rows,
                },
            )
        per_part = {
            str(p): mf.read_manifest(out_dir, f"reverse_part_{p}")["postings"]
            for p in range(num_parts)
            if mf.is_committed(out_dir, f"reverse_part_{p}")
        }
        mf.commit_manifest(
            out_dir,
            "reverse",
            {
                "per_part_postings": per_part,
                "num_buckets": next(iter(buckets_seen.values())),
                "num_salts": cfg.num_salts,
                "hot_terms": 0,
                "seconds": round(_time.time() - t0, 3),
                "files": mf.list_phase_files(out_dir, "postings"),
                "lineage": {"blob_merged_from": segment_dirs},
            },
        )

    if not mf.is_committed(out_dir, "prio"):
        t0 = _time.time()
        prio = _read_stripped("postings_prio", "prio")
        if len(doc_segments) > 1:
            prio = prio.groupby(["part", "bucket"]).map_groups(
                merge_prio_segments, batch_format="pyarrow"
            )
        # single doc segment (delete-only fold): no term can appear
        # twice, so the merge is a guaranteed pass-through — skip the
        # all-to-all entirely
        _clear_dir(os.path.join(out_dir, "postings_prio"))
        prio.write_parquet(
            os.path.join(out_dir, "postings_prio"), partition_cols=["part"]
        )
        mf.commit_manifest(
            out_dir,
            "prio",
            {
                "seconds": round(_time.time() - t0, 3),
                "files": mf.list_phase_files(out_dir, "postings_prio"),
                "lineage": {"blob_merged_from": segment_dirs},
            },
        )


def _link_tree(src: str, dst: str) -> None:
    """Hardlink-copy a segment content tree (immutable files; falls back
    to a byte copy across filesystems)."""
    import shutil

    def _ln(a, b):
        try:
            os.link(a, b)
        except OSError:
            shutil.copyfile(a, b)

    if os.path.isfile(src):
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        _ln(src, dst)
    else:
        shutil.copytree(src, dst, copy_function=_ln, dirs_exist_ok=True)


def _read_hive(dir_: str, columns: list[str]) -> pa.Table:
    import pyarrow.dataset as pads

    t = pads.dataset(dir_, partitioning="hive").to_table(columns=columns)
    if "part" in columns:
        t = t.set_column(
            t.schema.get_field_index("part"),
            "part",
            pc.cast(t["part"], pa.int32()),
        )
    return t


def rebase_delta(
    delta_dir: str,
    new_dir: str,
    new_prior_dirs: list[str],
    collapse_k: int,
) -> str:
    """Rewrite a delta segment's LINEAGE after its oldest ``collapse_k``
    priors were folded (compact_segments) into ``new_prior_dirs[0]``.

    Content (journal/forward/postings/registry/manifests) is identical
    and delta-sized — files hardlink into ``new_dir``.  Tombstones the
    delta had laid against the folded priors merge into ONE table
    against the folded base (their id sets are disjoint: the
    already-tombstoned contract lays each replaced id against exactly
    one prior, and the fold keeps exactly that live-or-stale copy), and
    their df corrections sum per (part, term).  Tombstones against the
    surviving priors shift position: old index j >= collapse_k -> new
    index j - collapse_k + 1 (the caller rebases those priors too, in
    chain order).
    """
    import pyarrow.parquet as _pq

    old = mf.read_manifest(delta_dir, "delta")
    old_priors = [os.path.abspath(d) for d in old["prior_dirs"]]
    n = len(old_priors)
    if not (1 <= collapse_k <= n):
        raise ValueError(f"collapse_k {collapse_k} out of range for {n} priors")
    if len(new_prior_dirs) != n - collapse_k + 1:
        raise ValueError(
            f"new_prior_dirs must have {n - collapse_k + 1} entries "
            f"(folded base + {n - collapse_k} rebased priors), got "
            f"{len(new_prior_dirs)}"
        )
    new_prior_dirs = [os.path.abspath(d) for d in new_prior_dirs]
    if mf.is_committed(new_dir, "delta"):
        return new_dir

    # resume idempotence: the delta manifest commits LAST; a crashed
    # attempt leaves partial hardlinks (os.link would EEXIST) and partial
    # tombstone/correction parquet (write_to_dataset APPENDS -> doubled
    # df corrections), so start clean
    import shutil as _sh

    if os.path.exists(new_dir):
        _sh.rmtree(new_dir)
    os.makedirs(new_dir, exist_ok=True)
    skip = {"tombstones", "df_correction", "delta"}
    for name in os.listdir(delta_dir):
        if name in skip:
            continue
        _link_tree(
            os.path.join(delta_dir, name), os.path.join(new_dir, name)
        )

    # folded prefix -> one tombstone table + one summed correction table
    # against new index 0
    tomb_prefix = [
        _read_hive(tombstone_dir(delta_dir, j), ["part", "combined_id"])
        for j in range(collapse_k)
        if os.path.isdir(tombstone_dir(delta_dir, j))
    ]
    n_tomb: dict[str, int] = {d: 0 for d in new_prior_dirs}
    if tomb_prefix:
        merged = pa.concat_tables(tomb_prefix)
        n_tomb[new_prior_dirs[0]] = merged.num_rows
        _pq.write_to_dataset(
            merged, tombstone_dir(new_dir, 0), partition_cols=["part"]
        )
    corr_prefix = [
        _read_hive(
            correction_dir(delta_dir, j),
            ["part", "term_id", "cnt", "prio_cnt"],
        )
        for j in range(collapse_k)
        if os.path.isdir(correction_dir(delta_dir, j))
    ]
    if corr_prefix:
        cat = pa.concat_tables(corr_prefix)
        summed = pa.TableGroupBy(cat, ["part", "term_id"]).aggregate(
            [("cnt", "sum"), ("prio_cnt", "sum")]
        )
        summed = summed.rename_columns(
            ["part", "term_id", "cnt", "prio_cnt"]
        )
        summed = summed.set_column(
            summed.schema.get_field_index("cnt"),
            "cnt",
            pc.cast(summed["cnt"], pa.int64()),
        ).set_column(
            summed.schema.get_field_index("prio_cnt"),
            "prio_cnt",
            pc.cast(summed["prio_cnt"], pa.int64()),
        )
        _pq.write_to_dataset(
            summed, correction_dir(new_dir, 0), partition_cols=["part"]
        )

    # surviving priors shift positionally
    for j in range(collapse_k, n):
        nj = j - collapse_k + 1
        if os.path.isdir(tombstone_dir(delta_dir, j)):
            _link_tree(tombstone_dir(delta_dir, j), tombstone_dir(new_dir, nj))
            n_tomb[new_prior_dirs[nj]] = int(
                old["tombstones"].get(old_priors[j], 0)
            )
        if os.path.isdir(correction_dir(delta_dir, j)):
            _link_tree(
                correction_dir(delta_dir, j), correction_dir(new_dir, nj)
            )

    payload = {
        k: v
        for k, v in old.items()
        if k not in ("prior_dirs", "tombstones", "phase", "committed_at")
    }
    payload.update(
        {
            "prior_dirs": new_prior_dirs,
            "tombstones": n_tomb,
            "rebased_from": os.path.abspath(delta_dir),
            "collapsed_priors": old_priors[:collapse_k],
        }
    )
    mf.commit_manifest(new_dir, "delta", payload)
    return new_dir


def maintain_chain(
    chain: list[str],
    out_root: str,
    cfg: BuildConfig | None = None,
    *,
    max_segments: int = 4,
    max_tombstone_frac: float = 0.25,
    blob_merge: bool | str = "auto",
    chain_path: str | None = None,
) -> list[str]:
    """Tiered chain maintenance (the Lucene TieredMergePolicy /
    IndexFreezer shape): bound serving cost under continuous ingest by
    folding the OLDEST segments and REBASING the newer deltas onto the
    fold — newly ingested segments never re-merge until they age into
    the prefix.

    Triggers (checked in order):
      * length  — ``len(chain) > max_segments``: fold the oldest
        ``len - max_segments + 1`` segments into one, keeping exactly
        ``max_segments`` serving segments;
      * garbage — tombstoned docs > ``max_tombstone_frac`` of total:
        fold the ENTIRE chain (full compaction reclaims the postings).

    No trigger -> the input chain returns unchanged (cheap to call on a
    schedule).  ``blob_merge="auto"`` picks the fold path by what the
    960k-doc interleaved A/B measurements showed (tools/compact_bench.py,
    BASELINE.md): an UPDATE fold re-encodes the head terms either way
    and the journal-rebuild encode is the faster of the two (blob
    1.27x), while a DELETE-ONLY fold has no cross-segment vocabulary at
    all and the blob path runs shuffle-free (0.50-0.76x) — so auto uses
    blobs iff every folded non-base segment is delete-only.  Rebases are
    metadata-sized (hardlinked content,
    delta-sized tombstone/correction rewrites), every step is
    resume-idempotent (phase manifests), and ``chain_path`` atomically
    publishes the new chain on completion (state.manifest.publish_chain
    — serving flips in one rename)."""
    chain = [os.path.abspath(d) for d in chain]
    _validate_chain(chain, strict=True)
    n = len(chain)

    total = sum(
        int(mf.read_manifest(d, "root")["n_docs"]) for d in chain
    )
    tombed = 0
    for d in chain[1:]:
        dman = mf.read_manifest(d, "delta")
        tombed += sum(int(v) for v in dman.get("tombstones", {}).values())

    if n > max_segments:
        collapse_k = n - max_segments + 1
    elif total and tombed / total > max_tombstone_frac:
        collapse_k = n
    else:
        return chain
    if collapse_k < 2:
        return chain

    cfg = cfg or BuildConfig()
    if blob_merge == "auto":
        # measured policy (tools/compact_bench.py interleaved A/B medians
        # at 960k docs, BASELINE.md): UPDATE folds re-encode the head
        # terms either way and the journal-rebuild encode wins (blob
        # 1.27x); DELETE-only folds skip the vocabulary co-location
        # entirely and blobs win at both measured churn levels (0.50x at
        # a 0.17% one-repo purge, 0.76x at a 3.2% 19-repo purge)
        blob_merge = all(
            mf.read_manifest(d, "delta").get("delete_only", False)
            for d in chain[1:collapse_k]
        )
    # generation-stamped output dir: deterministic for THIS input chain
    # (a crashed maintenance resumes its committed phases), distinct for
    # the NEXT round — reusing literal subdir names under out_root would
    # let a second round find the previous round's committed manifests,
    # skip every phase, and silently publish a chain missing the newly
    # folded deltas' documents
    import hashlib as _hl

    gen = _hl.sha1(
        ("|".join(chain) + f"@{collapse_k}").encode()
    ).hexdigest()[:12]
    gen_root = os.path.join(out_root, f"gen_{gen}")
    folded = os.path.join(gen_root, "base")
    compact_segments(chain[:collapse_k], folded, cfg, blob_merge=blob_merge)
    new_chain = [folded]
    for j in range(collapse_k, n):
        nd = os.path.join(gen_root, f"delta_{j - collapse_k}")
        rebase_delta(chain[j], nd, list(new_chain), collapse_k)
        new_chain.append(nd)
    if chain_path:
        mf.publish_chain(new_chain, chain_path)
    return new_chain
