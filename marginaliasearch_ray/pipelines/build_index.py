"""End-to-end index construction pipeline.

Phases (each immutable + manifest-committed, skipped on restart —
SURVEY.md §3.1 / §4 resumability):

  journal  corpus -> tokenize/extract/hash (stateless tasks, per-worker
           cached stage state) -> partitioned
           Parquet journal (IndexJournal analog, denormalized with the
           docdb decoration columns)
  stats    partial per-batch term counts (stateless tasks) -> bucket
           groupby + vectorized bincount merge -> global document-
           frequency table (word-lexicon analog) + hot term set for
           shuffle salting
  forward  journal projection -> per-part sort by combined id -> Parquet
           (ForwardIndexConverter analog, SURVEY.md §2.1 S9)
  reverse  per-batch run encoding (combiner; raw postings never shuffle)
           -> salted merge groupby -> final merge groupby (stateful
           MergeWorker pools) -> per-partition posting segments
           (FullPreindex construct/merge/finalize analog)
  prio     flagged-postings explode -> groupby merge -> Elias gamma/delta
           compressed priority posting lists

Scale notes: every stage is a streaming Dataset transform; nothing
materializes the corpus.  The all-to-all exchanges move only
pre-aggregated data: vocabulary-sized df partials and varint-compressed
posting runs — never raw (term, doc, position) rows.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..stages.docids import DomainRegistry, build_domain_registry
from ..stages.reverse import EncodeBatchRuns, MergeWorker, term_bucket
from ..stages.tokenize import TokenizeStage
from ..state import manifest as mf


@dataclass
class BuildConfig:
    num_parts: int = 4
    num_buckets: int = 32
    num_salts: int = 4
    hot_df_threshold: int = 5000  # salt terms with df above this
    tokenize_batch_size: int = 256
    # Parallelism hint for the corpus repartition (tokenize fan-out);
    # defaults to ncpu-2.  Tokenize itself runs as stateless tasks with
    # per-worker cached stage state — a reserved actor pool measured
    # ~20% slower (ramp-up + read/write starvation on a mixed pipeline).
    tokenize_concurrency: int | None = None
    # Salted pre-merge: REQUIRED at the scale where one hot term's postings
    # exceed a merge task's memory (1e12 docs: 'the' alone is ~TBs) — the
    # salt splits that term's k-way merge into num_salts parallel partial
    # merges.  At benchmark scales a single merge pass is faster (one
    # shuffle of the compressed runs instead of two), so this defaults off.
    premerge_salted: bool = False
    # Final merge runs as elastic stateless tasks by default (the streaming
    # executor spreads them over every free CPU; a reserved actor pool
    # measured ~2x slower at 16 CPUs because it idles through the encode
    # stage).  Set merge_concurrency to force a stateful MergeWorker actor
    # pool of that size instead.
    merge_concurrency: int | None = None
    # Segment-granular commits: build and commit the reverse index one
    # partition at a time so a failed build restarts from the last
    # committed segment.  At real scale each part takes minutes and the
    # per-part execution overhead (~1-2 s) vanishes; at benchmark scale it
    # distorts throughput, so benchmarks may disable it and fall back to
    # phase-granular commits (one pipeline over all parts).
    segment_commits: bool = True
    # Concurrent per-part reverse builds (segment_commits path): each
    # part's pipeline runs from its own driver thread; Ray's streaming
    # executors share the CPU pool.  >1 overlaps one part's merge tail
    # with the next part's read/encode, recovering the fixed per-part
    # pipeline latency the sequential loop pays (verified deadlock-free
    # at 4 CPUs on ray 2.49 — the ray 2.4x-era concurrent-execution
    # deadlock no longer reproduces).  Resume granularity is unchanged:
    # every part still commits its own manifest.
    parallel_parts: int = 1
    # Overlap the three journal-derived phases (forward / reverse / prio)
    # from driver threads once the journal is committed — they share no
    # state and each commits its own manifest.  Measured SLOWER at bench
    # scale (15k docs / 16 CPUs, alternating A/B: 47.5 vs 42.9 s and 31.9
    # vs 25.8 s): three concurrent shuffles oversubscribe the CPU pool by
    # more than the light phases' fixed latency saves.  Kept as an opt-in
    # for cluster topologies where the phases' shuffles land on disjoint
    # resources; default off.
    parallel_phases: bool = False
    # Per-lang document-processor plugin map ({lang: registered processor
    # name} — stages.tokenize.DOC_PROCESSORS; SURVEY §2.10's
    # AbstractDocumentProcessorPlugin seam).  Unmapped langs use the code
    # processor, so the default build is byte-identical.
    doc_processors: dict = field(default_factory=dict)
    # Anchor regions (DocumentPositionMapper.mapPositionsAndExtract
    # SimpleKeywords:23-46): index URL words (path tokens) and external
    # link texts in virtual position regions after the document body.
    # Off by default — the indexed term set then stays body+synthetic.
    # link_texts_dir points at a (repo, path, text, cnt) Parquet table
    # (the converting process's anchor-text side input, LinkTexts);
    # it is aggregated per (repo, path) and LEFT-JOINED onto the corpus
    # before tokenize (a hash shuffle co-partitioning the side input
    # with the corpus — the 100-TB-safe shape; there is no broadcast
    # path because real anchor tables scale with the corpus).  Requires
    # anchor_regions=True.  Chains: a delta over an anchor-enabled base
    # must set the same flags (journal manifest records them).
    anchor_regions: bool = False
    link_texts_dir: str | None = None
    # External-link keywords (HtmlDocumentProcessorPlugin.createLink
    # Keywords:308-323): every document gets synthetic ``links:<dst>``
    # terms (plus the ``links:<top-domain>`` variant — the org part of
    # an org/repo name) for each of its outgoing-link target domains,
    # powering backlink search ("links:x") and site-to-site link search
    # ("repo:a links:b") exactly like the reference's doBacklinkSearch /
    # doLinkSearch.  The sandbox has no crawl-derived per-document link
    # set, so targets come from the same deterministic ring derivation
    # the link-graph/PageRank pipelines use (pipelines/ranking.
    # link_edges) — the per-doc keyword set covers exactly that edge
    # table's (src, dst) pairs (the keyword set dedups a doc's parallel
    # duplicate targets, like the reference's Set; link_edges counts
    # them in its weight).  Off by default: the indexed term set then
    # stays unchanged for every pre-existing oracle.
    link_keywords: bool = False
    # HtmlFeature bitmask + DocumentFlags byte + special:* keywords
    # (HtmlFeature.java:5-40, DocumentFlags.java:5-14, flagsPenalty
    # IndexResultRankingService.java:633-683).  Crawler-only signals
    # derive from doc-ordinal arithmetic (the generator: precedent),
    # content-derivable ones from lang/path/length.  Off by default:
    # features stay 0 and the flags byte stays 0, so every
    # pre-existing oracle and the flagsPenalty short-circuit hold.
    html_features: bool = False
    # How link texts reach the tokenizer:
    #  - "store" (default): the link table ALONE shuffles into a bucketed
    #    sorted side store (build_link_store); tokenize actors lazily
    #    read + cache only the buckets their batches touch.  The corpus
    #    never re-shuffles — at 960k docs / 320k linked the store-mode
    #    build measured WITHIN WINDOW NOISE of the plain build (0.81x in
    #    its window) while join mode measured 1.24-1.75x across windows
    #    (tools/anchor_probe.py; BASELINE.md).
    #  - "join": left-join the aggregated link table onto the corpus
    #    (attach_link_texts).  Simple, but moves every corpus row
    #    through a hash shuffle — only right when the corpus is about
    #    to shuffle anyway.
    link_texts_mode: str = "store"
    # Store geometry: corpus batches carry RANDOM keys, so every batch
    # touches ~min(batch_size, num_buckets) buckets — the cache MUST
    # cover num_buckets or lookups thrash into a parquet read per doc
    # (measured: a 256-bucket store behind a 64-bucket cache stalled the
    # 960k journal phase indefinitely).  Defaults keep cache >= buckets:
    # each actor reads each bucket at most once, then serves from RAM.
    # At real scale raise BOTH so one bucket stays worker-RAM-sized; the
    # aggregate side store must fit a worker's heap once hot — the same
    # property the reference's converting-process atags side input has.
    link_store_buckets: int = 64
    link_store_cache_buckets: int = 256
    # Block-max side index (add_block_stats): posting lists longer than
    # this gain per-block (last doc, max tf, byte offset) entries so the
    # query side can decode only candidate-bearing blocks and
    # early-terminate plain top-k scans (block-max WAND).  0 disables.
    posting_block: int = 128
    extra_journal: dict = field(default_factory=dict)
    # repo -> 6-bit rank (0..63) to inject into combined ids and packed
    # document metadata instead of the synthetic default — the
    # DomainRankings path (PageRank positions scaled + >>2, see
    # pipelines/ranking.rankings_to_overrides; ForwardIndexConverter.java
    # :104-110 / IndexConstructorMain DocIdRewriter).  None = the
    # deterministic repo_rank hash the oracles replicate.
    rank_overrides: dict | None = None


def _clear_dir(path: str) -> None:
    """Crash-resume idempotence: phase outputs commit their manifest
    AFTER the parquet write and Ray's sink APPENDS, so a re-run of an
    uncommitted phase must clear the stale partial files first."""
    import shutil

    shutil.rmtree(path, ignore_errors=True)


def _journal_columns(kind: str) -> list[str]:
    if kind == "forward":
        return ["part", "combined_id", "document_meta", "features", "size"]
    if kind == "reverse":
        return [
            "part",
            "combined_id",
            "term_ids",
            "term_tfs",
            "term_meta",
            "term_positions",
        ]
    if kind == "docmeta":
        return [
            "part",
            "combined_id",
            "repo",
            "path",
            "commit",
            "lang",
            "size",
            "title",
            "description",
            "data_hash",
        ]
    raise ValueError(kind)


# Per-worker cached TfDictStage: the stats pass runs as STATELESS tasks
# (elastic over every free CPU — an actor pool measured ~1.8x slower here
# because ramp-up and batch shipping dominate the short phase), while the
# murmur hash cache still persists across tasks via the worker process.
_TFDICT_STAGE = None


def _tfdict_partial(batch: pa.Table, *, stats_buckets: int) -> pa.Table:
    global _TFDICT_STAGE
    if _TFDICT_STAGE is None:
        from ..stages.tokenize import TfDictStage

        _TFDICT_STAGE = TfDictStage()
    out = _TFDICT_STAGE(batch)
    sb = term_bucket(
        out["term_id"].to_numpy(zero_copy_only=False), stats_buckets
    )
    return out.append_column("sbucket", pa.array(sb, pa.int32()))


# Per-worker cached TokenizeStage (same rationale as _tfdict_partial):
# the journal pass runs as stateless tasks so read/tokenize/write share
# every CPU elastically; the stage state (registry, tf dict, hash+token
# caches) is constructed once per worker process and reused across tasks.
_TOKENIZE_CACHE: dict = {}


def _tokenize_task(
    batch: pa.Table, *, reg_ref, tfdict_dir, doc_count, doc_processors=None,
    anchor_regions=False, link_store_dir=None, link_store_cache=64,
    link_keywords=False, html_features=False,
) -> pa.Table:
    key = (
        reg_ref.hex() if hasattr(reg_ref, "hex") else id(reg_ref),
        tfdict_dir,
        tuple(sorted((doc_processors or {}).items())),
        bool(anchor_regions),
        link_store_dir,
        bool(link_keywords),
        bool(html_features),
    )
    st = _TOKENIZE_CACHE.get(key)
    if st is None:
        _TOKENIZE_CACHE.clear()  # one live stage per worker
        st = TokenizeStage(
            reg_ref, tfdict_dir, doc_count, doc_processors, anchor_regions,
            link_store_dir, link_store_cache, link_keywords, html_features,
        )
        _TOKENIZE_CACHE[key] = st
    return st(batch)


# Ray's hash-shuffle join rejects list-typed non-key columns, so the
# aggregated texts/counts travel through the join packed into scalar
# strings (US-separated) and are unpacked into list columns right after.
_LT_SEP = "\x1f"


def _lt_agg_group(group: pa.Table) -> pa.Table:
    """One (repo, path) group of link-text rows -> a single row with
    packed text/count strings, ordered by text for deterministic
    journals."""
    texts = group["text"].to_pylist()
    cnts = group["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    o = np.argsort(np.asarray(texts, dtype=object))
    return pa.table(
        {
            "repo": group["repo"].slice(0, 1),
            "path": group["path"].slice(0, 1),
            "lt_texts_pk": pa.array(
                [_LT_SEP.join(texts[j] for j in o)], pa.string()
            ),
            "lt_counts_pk": pa.array(
                [",".join(str(int(c)) for c in cnts[o])], pa.string()
            ),
        }
    )


def _lt_unpack(batch: pa.Table) -> pa.Table:
    """Packed join payload -> lt_texts (list<string>) / lt_counts
    (list<int64>) columns; join misses stay null."""
    tp = batch["lt_texts_pk"].to_pylist()
    cp = batch["lt_counts_pk"].to_pylist()
    texts = [t.split(_LT_SEP) if t is not None else None for t in tp]
    cnts = [
        [int(x) for x in c.split(",")] if c is not None else None for c in cp
    ]
    out = batch.drop_columns(["lt_texts_pk", "lt_counts_pk"])
    out = out.append_column(
        "lt_texts", pa.array(texts, pa.list_(pa.string()))
    )
    return out.append_column(
        "lt_counts", pa.array(cnts, pa.list_(pa.int64()))
    )


_LINK_REF_RE = None  # compiled per worker in _extract_links_batch


def _extract_links_batch(batch: pa.Table, *, pattern: str) -> pa.Table:
    """Per-batch anchor extraction: each ``pattern`` match names a target
    (repo[, path]); the anchor TEXT is the match's line with the
    reference stripped (the code analog of a link's display text).
    Compiled-regex scan per document — the stage is stateless, the regex
    cached per worker process."""
    import re

    global _LINK_REF_RE
    if _LINK_REF_RE is None or _LINK_REF_RE.pattern != pattern:
        _LINK_REF_RE = re.compile(pattern, re.MULTILINE)
    repos_out: list[str] = []
    paths_out: list[str] = []
    texts_out: list[str] = []
    for content in batch["content"].to_pylist():
        for m in _LINK_REF_RE.finditer(content):
            target = m.group(1)
            parts = target.split("/")
            if len(parts) < 2:
                continue
            repo = "/".join(parts[:2])
            path = "/".join(parts[2:])
            line_start = content.rfind("\n", 0, m.start()) + 1
            line_end = content.find("\n", m.end())
            if line_end == -1:
                line_end = len(content)
            line = content[line_start:m.start()] + content[m.end():line_end]
            text = line.strip().lstrip("/#*- ").strip()
            if not text:
                continue
            repos_out.append(repo)
            paths_out.append(path)
            texts_out.append(text)
    return pa.table(
        {
            "repo": pa.array(repos_out, pa.string()),
            "path": pa.array(paths_out, pa.string()),
            "text": pa.array(texts_out, pa.string()),
        }
    )


def extract_link_texts(
    corpus_ds,
    pattern: str = r"(?:see|ref):?\s+(\S+/\S+/\S+)",
):
    """Corpus-derived anchor-text side table — the analog of the
    reference's atags ingestion (the converting process reads anchor
    texts from a side file keyed by URL; here the corpus itself is
    scanned for cross-document references).  Each ``pattern`` match in a
    document contributes one (target repo, target path, anchor text)
    observation; identical observations are counted corpus-wide
    (groupby) into the ``cnt`` the tokenizer's sqrt-attenuated
    repetition consumes.

    Returns a Dataset in ``attach_link_texts``'s input shape
    (repo, path, text, cnt).  Streaming: a stateless regex map over
    content batches, then an observation-cardinality groupby — raw
    documents never shuffle."""
    import functools

    from ray.data.aggregate import Count

    counted = (
        corpus_ds.select_columns(["content"])
        .map_batches(
            functools.partial(_extract_links_batch, pattern=pattern),
            batch_format="pyarrow",
        )
        .groupby(["repo", "path", "text"])
        .aggregate(Count(alias_name="cnt"))
    )

    def cast_cnt(batch: pa.Table) -> pa.Table:
        i = batch.schema.get_field_index("cnt")
        return batch.set_column(i, "cnt", pc.cast(batch["cnt"], pa.int64()))

    return counted.map_batches(cast_cnt, batch_format="pyarrow")


def build_link_store(
    link_ds, store_dir: str, num_buckets: int = 64
) -> dict:
    """Shuffle the LINK TABLE ALONE into a bucketed side store the
    tokenize actors read with pruning — the 100-TB shape for anchor
    ingestion (the corpus never re-shuffles; only the anchor table,
    ~1% of corpus scale, moves).  Layout: parquet partitioned by
    ``bucket = link_key(repo, path) % num_buckets``, one aggregated row
    per (repo, path) with the packed text/count payload; a ``_store.json``
    records num_buckets.  Lookup: stages.tokenize.LinkStoreLookup."""
    import json

    from ..functions.murmur import hash_nearly_ascii

    def keyed(batch: pa.Table) -> pa.Table:
        keys = np.fromiter(
            (
                hash_nearly_ascii(f"{r}\x1f{p}")
                for r, p in zip(
                    batch["repo"].to_pylist(), batch["path"].to_pylist()
                )
            ),
            dtype=np.int64,
            count=len(batch),
        )
        bucket = (keys % num_buckets + num_buckets) % num_buckets
        return batch.append_column(
            "key", pa.array(keys, pa.int64())
        ).append_column("bucket", pa.array(bucket.astype(np.int32), pa.int32()))

    def bucket_agg(group: pa.Table) -> pa.Table:
        # ONE vectorized pass per bucket (a per-(repo, path) map_groups
        # measured ~30 s at 320k keys — Ray group dispatch per
        # single-row group): lexsort by (key, repo, path, text), pack
        # each key run into the store row.  One block (= one parquet
        # file) per bucket, rows key-sorted — a bucket load is a single
        # file read; without that the partitioned write scattered each
        # bucket over one file per upstream task (~0.9 s per open).
        keys = group["key"].to_numpy(zero_copy_only=False)
        repos = np.asarray(group["repo"].to_pylist(), dtype=object)
        paths = np.asarray(group["path"].to_pylist(), dtype=object)
        texts = np.asarray(group["text"].to_pylist(), dtype=object)
        cnts = group["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
        o = np.lexsort((texts, paths, repos, keys))
        k, r, p, t, c = keys[o], repos[o], paths[o], texts[o], cnts[o]
        new = np.ones(len(k), dtype=bool)
        if len(k) > 1:
            new[1:] = (
                (k[1:] != k[:-1]) | (r[1:] != r[:-1]) | (p[1:] != p[:-1])
            )
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(k))
        return pa.table(
            {
                "repo": pa.array(r[starts], pa.string()),
                "path": pa.array(p[starts], pa.string()),
                "lt_texts_pk": pa.array(
                    [_LT_SEP.join(t[s:e]) for s, e in zip(starts, ends)],
                    pa.string(),
                ),
                "lt_counts_pk": pa.array(
                    [
                        ",".join(str(int(x)) for x in c[s:e])
                        for s, e in zip(starts, ends)
                    ],
                    pa.string(),
                ),
                "key": pa.array(k[starts], pa.int64()),
                "bucket": group["bucket"].take(
                    pa.array(o[starts].astype(np.int64))
                ),
            }
        )

    _clear_dir(store_dir)
    (
        link_ds.map_batches(keyed, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_agg, batch_format="pyarrow")
        .write_parquet(store_dir, partition_cols=["bucket"])
    )
    meta = {"num_buckets": num_buckets}
    with open(os.path.join(store_dir, "_store.json"), "w") as f:
        json.dump(meta, f)
    return meta


def attach_link_texts(corpus_ds, link_ds, num_partitions: int = 64):
    """LEFT-JOIN per-(repo, path) anchor texts onto the corpus as
    ``lt_texts``/``lt_counts`` list columns — the converting process's
    LinkTexts side input (DocumentKeywordExtractor.extractKeywords takes
    LinkTexts per document; the loader reads them from an anchor-text
    side file keyed by URL).  ``link_ds`` rows: (repo, path, text, cnt).

    Scale shape: the side input is aggregated per key (small vs the raw
    anchor stream), then hash-co-partitioned with the corpus — one
    shuffle, no broadcast of a corpus-scaled table.  Docs without anchors
    get null lists (TokenizeStage treats null as absent)."""
    agg = link_ds.groupby(["repo", "path"]).map_groups(
        _lt_agg_group, batch_format="pyarrow"
    )
    return corpus_ds.join(
        agg,
        join_type="left_outer",
        num_partitions=num_partitions,
        on=("repo", "path"),
    ).map_batches(_lt_unpack, batch_format="pyarrow")


def _merge_df_group(group: pa.Table, *, num_buckets: int) -> pa.Table:
    """One stats bucket of per-batch df partials -> final per-term rows
    (vectorized bincount sum — Ray's per-key Sum aggregate measured ~3x
    slower on vocabulary-sized keys)."""
    tid = group["term_id"].to_numpy(zero_copy_only=False)
    uniq, inv = np.unique(tid, return_inverse=True)
    df = np.bincount(
        inv, weights=group["cnt"].to_numpy(zero_copy_only=False)
    ).astype(np.int64)
    bdf = np.bincount(
        inv, weights=group["body"].to_numpy(zero_copy_only=False)
    ).astype(np.int64)
    return pa.table(
        {
            "term_id": pa.array(uniq, pa.int64()),
            "df": pa.array(df, pa.int64()),
            "body_df": pa.array(bdf, pa.int64()),
            "bucket": pa.array(term_bucket(uniq, num_buckets), pa.int32()),
        }
    )


def _premerge_runs(group: pa.Table) -> pa.Table:
    """Stateless-task wrapper around the k-way run merge — elastic
    scheduling across all free CPUs.  Ultra-hot terms (> MERGE_FANIN runs)
    merge hierarchically; output bytes are identical to a single pass."""
    from ..stages.reverse import merge_runs_tree

    return merge_runs_tree(group)


def _pin_fsspec_http_import() -> None:
    """Make Ray's per-read ``from fsspec.implementations.http import
    HTTPFileSystem`` probe thread-safe.  When aiohttp is absent that
    module's body raises on EVERY import attempt (failed imports are
    evicted from sys.modules), and two driver threads resolving paths
    concurrently can observe each other's partially-initialized module —
    surfacing as ``ImportError: cannot import name 'HTTPFileSystem'``,
    which Ray's ``except ModuleNotFoundError`` does not catch.  Pin a
    stub module with a placeholder class (never instantiated — Ray only
    isinstance-checks against it) so the probe becomes deterministic."""
    try:
        import fsspec.implementations.http  # noqa: F401
    except Exception:
        import sys
        import types

        stub = types.ModuleType("fsspec.implementations.http")

        class HTTPFileSystem:  # placeholder for isinstance checks only
            pass

        stub.HTTPFileSystem = HTTPFileSystem
        sys.modules["fsspec.implementations.http"] = stub


def _cast_part(batch: pa.Table) -> pa.Table:
    """Hive partition values are read back as strings; restore int32."""
    i = batch.schema.get_field_index("part")
    return batch.set_column(i, "part", pc.cast(batch["part"], pa.int32()))


def _hex16_to_i64(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Vectorized decode of the first 16 hex chars of each string to the
    signed int64 with the same bit pattern as ``int(h[:16], 16) - 2**63``
    (the historical manifest rollup value)."""
    s = np.asarray(col.to_pylist(), dtype="S16")  # truncates to 16 chars
    if not len(s):
        return np.empty(0, dtype=np.int64)
    nib = s.view(np.uint8).reshape(len(s), 16).astype(np.uint64)
    nib = np.where(nib >= ord("a"), nib - ord("a") + 10, nib - ord("0"))
    shifts = np.arange(60, -1, -4, dtype=np.uint64)
    vals = (nib << shifts).sum(axis=1, dtype=np.uint64)
    # x - 2**63 (two's complement) == flip the top bit, reinterpret signed
    return (vals ^ np.uint64(1 << 63)).view(np.int64)


def _lineage_partial(batch: pa.Table) -> pa.Table:
    parts = pc.cast(batch["part"], pa.int64()).to_numpy(zero_copy_only=False)
    signed = _hex16_to_i64(batch["data_hash"])
    out_p, out_x, out_n = [], [], []
    for p in np.unique(parts):
        m = parts == p
        out_p.append(int(p))
        out_x.append(int(np.bitwise_xor.reduce(signed[m])))
        out_n.append(int(m.sum()))
    return pa.table(
        {
            "part": pa.array(out_p, pa.int64()),
            "xor_p": pa.array(out_x, pa.int64()),
            "docs": pa.array(out_n, pa.int64()),
        }
    )


def _lineage_rollup(journal_dir: str) -> dict:
    """Distributed XOR rollup: map_batches partials (one row per part per
    batch), then a driver combine of the already-aggregated partial rows
    (#batches x #parts rows — a small result, not a per-row read)."""
    import ray.data as _rd

    partials = (
        _rd.read_parquet(journal_dir, columns=["part", "data_hash"])
        .map_batches(_lineage_partial, batch_format="pyarrow")
        .take_all()
    )
    lineage: dict[str, dict] = {}
    for r in partials:
        ent = lineage.setdefault(
            str(int(r["part"])), {"docs": 0, "sha_rollup_xor": 0}
        )
        ent["docs"] += int(r["docs"])
        ent["sha_rollup_xor"] ^= int(r["xor_p"])
    return lineage


def read_journal(out_dir: str, kind: str):
    import ray.data

    return ray.data.read_parquet(
        os.path.join(out_dir, "journal"), columns=_journal_columns(kind)
    ).map_batches(_cast_part, batch_format="pyarrow")


def build_index(
    corpus_ds,
    out_dir: str,
    cfg: BuildConfig | None = None,
    registry: "DomainRegistry | None" = None,
    tfdict_dir: str | None = None,
    tfdict_doc_count: int | None = None,
) -> dict:
    """Run all phases (resuming past committed ones).  Returns the root
    manifest dict.

    ``registry`` presets the domain registry instead of deriving it from
    the corpus (delta builds extend the base segment's registry so ids
    stay stable).  ``tfdict_dir``/``tfdict_doc_count`` point keyword
    extraction at an EXTERNAL published term-frequency dict (the
    reference's TermFrequencyDict is likewise a static artifact loaded
    per process, DocumentKeywordExtractor.java:45 — not regenerated per
    ingest).  ``corpus_ds`` may be None only when the journal and stats
    phases are already committed (compaction re-runs the derived phases
    over a pre-merged journal)."""
    import ray

    cfg = cfg or BuildConfig()
    os.makedirs(out_dir, exist_ok=True)

    ncpu = int(ray.cluster_resources().get("CPU", 4))
    max_pool = cfg.tokenize_concurrency or max(2, ncpu - 2)

    if corpus_ds is None:
        if not (mf.is_committed(out_dir, "journal") and mf.is_committed(out_dir, "stats")):
            raise ValueError(
                "corpus_ds=None requires committed journal + stats phases"
            )
        corpus_raw = None
    else:
        # keep an un-repartitioned handle: tiny aggregations over one column
        # (the domain registry) read it with projection pushdown instead of
        # paying the full-corpus repartition
        corpus_raw = corpus_ds
        # single-file corpora arrive as a handful of blocks; split so the
        # tokenize tasks actually fan out (repartition without shuffle)
        corpus_ds = corpus_ds.repartition(max_pool * 2)

    # ---- phase: stats (corpus term-frequency dict) ----------------------
    # Built BEFORE the journal: the reference's TermFrequencyDict is an
    # input artifact of keyword extraction (loaded per process,
    # DocumentKeywordExtractor.java:45) produced by a separate corpus
    # pass (TermFrequencyExporter.java:101-130).  The journal's Subjects
    # tf-idf gate needs it, and hot terms are now known before the
    # reverse build in every configuration (previously only with
    # premerge_salted).
    if not mf.is_committed(out_dir, "stats"):
        t_phase = time.time()
        import functools

        n_corpus_docs = corpus_ds.count()

        # merge granularity finer than the posting buckets so the df merge
        # parallelizes beyond num_buckets tasks at cluster scale (each
        # group stays vocabulary/stats_buckets-sized)
        stats_buckets = cfg.num_buckets * 8
        df_ds = (
            corpus_ds.map_batches(
                _tfdict_partial,
                fn_kwargs={"stats_buckets": stats_buckets},
                batch_size=cfg.tokenize_batch_size * 16,
                batch_format="pyarrow",
            )
            .groupby("sbucket")
            .map_groups(
                functools.partial(
                    _merge_df_group, num_buckets=cfg.num_buckets
                ),
                batch_format="pyarrow",
            )
            .materialize()  # vocabulary-sized; reused for write + hot scan
        )
        _clear_dir(os.path.join(out_dir, "stats"))
        df_ds.write_parquet(os.path.join(out_dir, "stats"))
        hot_terms = [
            r["term_id"]
            for r in df_ds.filter(expr=f"df >= {cfg.hot_df_threshold}")
            .select_columns(["term_id"])
            .take_all()
        ]
        mf.commit_manifest(
            out_dir,
            "stats",
            {
                "hot_terms": hot_terms,
                "hot_df_threshold": cfg.hot_df_threshold,
                "num_buckets": cfg.num_buckets,
                "doc_count": n_corpus_docs,
                "seconds": round(time.time() - t_phase, 3),
            },
        )

    # ---- phase: journal -------------------------------------------------
    if not mf.is_committed(out_dir, "journal"):
        t_phase = time.time()
        if registry is None:
            registry = build_domain_registry(
                corpus_raw, cfg.num_parts, cfg.rank_overrides
            )
        reg_ref = ray.put(registry)
        journal_in = corpus_ds
        link_store_dir = None
        if cfg.link_texts_dir is not None:
            if not cfg.anchor_regions:
                raise ValueError(
                    "link_texts_dir requires anchor_regions=True"
                )
            import ray.data as _rdl

            if cfg.link_texts_mode == "join":
                journal_in = attach_link_texts(
                    corpus_ds,
                    _rdl.read_parquet(cfg.link_texts_dir),
                    num_partitions=max_pool * 2,
                )
            elif cfg.link_texts_mode == "store":
                link_store_dir = os.path.join(out_dir, "link_store")
                if not mf.is_committed(out_dir, "link_store"):
                    meta = build_link_store(
                        _rdl.read_parquet(cfg.link_texts_dir),
                        link_store_dir,
                        num_buckets=cfg.link_store_buckets,
                    )
                    mf.commit_manifest(out_dir, "link_store", meta)
            else:
                raise ValueError(
                    f"unknown link_texts_mode {cfg.link_texts_mode!r}"
                    " (expected 'store' or 'join')"
                )
        journal = journal_in.map_batches(
            _tokenize_task,
            fn_kwargs={
                "reg_ref": reg_ref,
                "tfdict_dir": tfdict_dir or os.path.join(out_dir, "stats"),
                "doc_count": (
                    tfdict_doc_count
                    if tfdict_doc_count is not None
                    else mf.read_manifest(out_dir, "stats")["doc_count"]
                ),
                "doc_processors": cfg.doc_processors,
                "anchor_regions": cfg.anchor_regions,
                "link_store_dir": link_store_dir,
                "link_store_cache": cfg.link_store_cache_buckets,
                "link_keywords": cfg.link_keywords,
                "html_features": cfg.html_features,
            },
            batch_size=cfg.tokenize_batch_size,
            batch_format="pyarrow",
        )
        _clear_dir(os.path.join(out_dir, "journal"))
        _clear_dir(os.path.join(out_dir, "lang_index"))
        journal.write_parquet(
            os.path.join(out_dir, "journal"), partition_cols=["part"]
        )
        # per-language id index (IndexJournal keeps one journal dir per
        # language, IndexJournal.java:15-17,28-34): a lang: query filter
        # reads ONLY its language's dirs.  Kept as a separate 2-column
        # index instead of sub-partitioning the journal itself — nesting
        # lang under part quintupled the journal file count and slowed
        # every downstream journal scan ~25% (measured at 480k docs)
        import ray.data as _rd

        _rd.read_parquet(
            os.path.join(out_dir, "journal"), columns=["part", "lang", "combined_id"]
        ).map_batches(_cast_part, batch_format="pyarrow").write_parquet(
            os.path.join(out_dir, "lang_index"), partition_cols=["part", "lang"]
        )
        # registry table for query-time repo filters / decoration
        reg_table = pa.table(
            {
                "repo": pa.array(registry.repos, pa.string()),
                # lookup, not range(): extended delta registries keep the
                # base segment's ids, which aren't sorted-order positions
                "domain_id": pa.array(
                    [registry.lookup(r)[0] for r in registry.repos], pa.int64()
                ),
                "rank": pa.array(
                    [registry.lookup(r)[1] for r in registry.repos], pa.int64()
                ),
                "part": pa.array(
                    [registry.lookup(r)[2] for r in registry.repos], pa.int32()
                ),
            }
        )
        import pyarrow.parquet as pq

        pq.write_table(reg_table, os.path.join(out_dir, "registry.parquet"))

        # row count from parquet footers — no data read
        import pyarrow.dataset as pads

        n_docs = pads.dataset(os.path.join(out_dir, "journal")).count_rows()

        # per-partition lineage: doc counts + an order-independent sha256
        # rollup (XOR of the leading 8 bytes of each row's content hash) so
        # a segment can be traced back to the exact corpus rows it covers.
        # Computed DISTRIBUTED: per-batch partial XOR/count rows (one row
        # per part per batch) combine on the driver — only the tiny partial
        # table ever leaves the cluster, never the per-row hash column.
        lineage = _lineage_rollup(os.path.join(out_dir, "journal"))
        mf.commit_manifest(
            out_dir,
            "journal",
            {
                "n_docs": n_docs,
                "n_repos": len(registry.repos),
                "num_parts": cfg.num_parts,
                "anchor_regions": cfg.anchor_regions,
                "link_keywords": cfg.link_keywords,
                "html_features": cfg.html_features,
                "per_part_lineage": lineage,
                "seconds": round(time.time() - t_phase, 3),
                "files": mf.list_phase_files(out_dir, "journal"),
                # the per-language id index is serve-time state too —
                # recorded here so the fsck can audit it (absent in
                # pre-r4 manifests; the verifier treats absence as
                # "not auditable", not as a failure)
                "lang_files": mf.list_phase_files(out_dir, "lang_index"),
            },
        )

    journal_manifest = mf.read_manifest(out_dir, "journal")
    num_parts = journal_manifest["num_parts"]


    # ---- phase: forward -------------------------------------------------
    def _phase_forward() -> None:
        if mf.is_committed(out_dir, "forward"):
            return
        t_phase = time.time()
        fwd = (
            read_journal(out_dir, "forward")
            .groupby("part")
            .map_groups(
                lambda t: t.sort_by("combined_id"), batch_format="pyarrow"
            )
        )
        _clear_dir(os.path.join(out_dir, "forward"))
        fwd.write_parquet(os.path.join(out_dir, "forward"), partition_cols=["part"])
        import pyarrow.dataset as pads

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
                "seconds": round(time.time() - t_phase, 3),
                "files": mf.list_phase_files(out_dir, "forward"),
            },
        )

    # ---- phase: reverse -------------------------------------------------
    # Built per PARTITION with an individual manifest per segment: a
    # failed build restarts from the last committed segment (north-rule
    # resumability at segment granularity, not just phase granularity).
    # Each part's build is itself fully parallel; on a cluster, parts >>
    # nodes so the outer loop costs no parallelism.
    def _phase_reverse() -> None:
        if mf.is_committed(out_dir, "reverse"):
            return
        t_phase = time.time()
        hot_set = (
            set(mf.read_manifest(out_dir, "stats")["hot_terms"])
            if mf.is_committed(out_dir, "stats")
            else set()
        )
        encoder = EncodeBatchRuns(hot_set, cfg.num_buckets, cfg.num_salts)
        import pyarrow.dataset as pads
        import ray.data as rd

        def _build_part(p: int) -> None:
            part_phase = f"reverse_part_{p}"
            jdir = os.path.join(out_dir, "journal", f"part={p}")
            if mf.is_committed(out_dir, part_phase) or not os.path.isdir(jdir):
                return
            t_part = time.time()

            def _with_part(batch: pa.Table, *, _p=p) -> pa.Table:
                return batch.add_column(
                    0, "part", pa.array([_p] * len(batch), pa.int32())
                )

            # combiner: encode runs inside each batch; only compressed
            # runs enter the merge shuffle (FullPreindex page-construct
            # -> merge shape); big batches => fewer runs per common term
            runs = (
                rd.read_parquet(
                    jdir,
                    columns=[
                        "combined_id", "term_ids", "term_tfs",
                        "term_meta", "term_positions",
                    ],
                )
                .map_batches(_with_part, batch_format="pyarrow")
                .map_batches(
                    encoder,
                    batch_size=cfg.tokenize_batch_size * 32,
                    batch_format="pyarrow",
                )
            )
            if cfg.premerge_salted:
                runs = runs.groupby(["part", "bucket", "salt"]).map_groups(
                    _premerge_runs, batch_format="pyarrow"
                )
            if cfg.merge_concurrency:
                merged = runs.groupby(["part", "bucket"]).map_groups(
                    MergeWorker,
                    batch_format="pyarrow",
                    concurrency=cfg.merge_concurrency,
                )
            else:
                merged = runs.groupby(["part", "bucket"]).map_groups(
                    _premerge_runs, batch_format="pyarrow"
                )
            if cfg.posting_block:
                import functools as _ft

                from ..stages.reverse import add_block_stats

                merged = merged.map_batches(
                    _ft.partial(add_block_stats, block=cfg.posting_block),
                    batch_format="pyarrow",
                )
            seg_dir = os.path.join(out_dir, "postings", f"part={p}")
            _clear_dir(seg_dir)
            merged.drop_columns(["part"]).write_parquet(seg_dir)
            seg_tbl = pads.dataset(seg_dir).to_table(columns=["df"])
            mf.commit_manifest(
                out_dir,
                part_phase,
                {
                    "part": p,
                    "postings": int(
                        np.sum(seg_tbl["df"].to_numpy(zero_copy_only=False))
                    ),
                    "terms": seg_tbl.num_rows,
                    "seconds": round(time.time() - t_part, 3),
                    "lineage": {"journal_dir": jdir},
                },
            )

        if cfg.segment_commits:
            # per-part builds, committed individually so a failed build
            # restarts from the last committed segment; optionally
            # overlapped from driver threads (cfg.parallel_parts)
            if cfg.parallel_parts > 1:
                from concurrent.futures import ThreadPoolExecutor

                _pin_fsspec_http_import()
                with ThreadPoolExecutor(
                    max_workers=cfg.parallel_parts
                ) as ex:
                    list(ex.map(_build_part, range(num_parts)))
            else:
                for p in range(num_parts):
                    _build_part(p)
        else:
            # phase-granular: one pipeline over every part (faster at
            # benchmark scale; resume granularity = whole phase)
            runs_all = read_journal(out_dir, "reverse").map_batches(
                encoder,
                batch_size=cfg.tokenize_batch_size * 32,
                batch_format="pyarrow",
            )
            if cfg.premerge_salted:
                runs_all = runs_all.groupby(
                    ["part", "bucket", "salt"]
                ).map_groups(_premerge_runs, batch_format="pyarrow")
            merged_all = runs_all.groupby(["part", "bucket"]).map_groups(
                _premerge_runs, batch_format="pyarrow"
            )
            if cfg.posting_block:
                import functools as _ft

                from ..stages.reverse import add_block_stats

                merged_all = merged_all.map_batches(
                    _ft.partial(add_block_stats, block=cfg.posting_block),
                    batch_format="pyarrow",
                )
            _clear_dir(os.path.join(out_dir, "postings"))
            merged_all.write_parquet(
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
                "num_buckets": cfg.num_buckets,
                "num_salts": cfg.num_salts,
                "hot_terms": len(hot_set),
                "seconds": round(time.time() - t_phase, 3),
                "files": mf.list_phase_files(out_dir, "postings"),
                "lineage": {
                    "journal_files": journal_manifest.get("files", []),
                },
            },
        )

    # ---- phase: prio (flagged-postings reverse index, gamma/delta) ------
    def _phase_prio() -> None:
        if mf.is_committed(out_dir, "prio"):
            return
        t_phase = time.time()
        from ..stages.prio import encode_prio_batch_runs, merge_prio_group

        # combiner first: only gamma/delta-compressed runs shuffle (same
        # invariant as the full reverse build)
        prio = (
            read_journal(out_dir, "reverse")
            .select_columns(["part", "combined_id", "term_ids", "term_meta"])
            .map_batches(
                lambda b: encode_prio_batch_runs(b, cfg.num_buckets),
                batch_size=cfg.tokenize_batch_size * 32,
                batch_format="pyarrow",
            )
            .groupby(["part", "bucket"])
            .map_groups(merge_prio_group, batch_format="pyarrow")
        )
        _clear_dir(os.path.join(out_dir, "postings_prio"))
        prio.write_parquet(
            os.path.join(out_dir, "postings_prio"), partition_cols=["part"]
        )
        mf.commit_manifest(
            out_dir,
            "prio",
            {
                "seconds": round(time.time() - t_phase, 3),
                "files": mf.list_phase_files(out_dir, "postings_prio"),
            },
        )

    # forward / reverse / prio all derive independently from the committed
    # journal, so they overlap from driver threads (Ray's streaming
    # executors share the CPU pool; same thread pattern as parallel_parts)
    # — the light forward/prio pipelines ride inside the reverse phase's
    # wall time instead of adding their fixed latencies.  Each phase still
    # checks and commits its own manifest: resume granularity unchanged.
    derived = [_phase_forward, _phase_reverse, _phase_prio]
    if cfg.parallel_phases:
        from concurrent.futures import ThreadPoolExecutor

        _pin_fsspec_http_import()
        with ThreadPoolExecutor(max_workers=len(derived)) as ex:
            # list() re-raises the first phase failure
            list(ex.map(lambda f: f(), derived))
    else:
        for f in derived:
            f()

    root = {
        "n_docs": journal_manifest["n_docs"],
        "num_parts": num_parts,
        "out_dir": out_dir,
    }
    mf.commit_manifest(out_dir, "root", root)
    return root
