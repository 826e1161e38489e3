"""End-to-end index construction pipeline.

Phases (each immutable + manifest-committed, skipped on restart —
SURVEY.md §3.1 / §4 resumability):

  journal  corpus -> tokenize/extract/hash (actor pool) -> partitioned
           Parquet journal (IndexJournal analog, denormalized with the
           docdb decoration columns)
  stats    partial per-batch term counts -> groupby(term_id).sum ->
           global document-frequency table (word-lexicon analog) + hot
           term set for shuffle salting
  forward  journal projection -> per-part sort by combined id -> Parquet
           (ForwardIndexConverter analog, SURVEY.md §2.1 S9)
  reverse  explode -> groupby(part,bucket,salt) encode -> merge-worker
           actor pool -> per-partition posting segments (FullPreindex
           construct/merge/finalize analog)

Scale notes: every stage is a streaming Dataset transform; nothing
materializes the corpus.  The only all-to-all exchanges are the stats
groupby (over per-batch partial counts, vocabulary-sized), the forward
per-part sort, and the reverse groupby (salted; encoded-run second hop
moves compressed blobs only).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..stages.docids import DomainRegistry, build_domain_registry
from ..stages.reverse import ExplodePostings, MergeWorker, encode_run_group, term_bucket
from ..stages.tokenize import TokenizeStage
from ..state import manifest as mf


@dataclass
class BuildConfig:
    num_parts: int = 4
    num_buckets: int = 32
    num_salts: int = 4
    hot_df_threshold: int = 5000  # salt terms with df above this
    tokenize_batch_size: int = 256
    tokenize_concurrency: int | None = None  # None -> stateless tasks sizing
    merge_concurrency: int | None = None
    extra_journal: dict = field(default_factory=dict)


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


def _cast_part(batch: pa.Table) -> pa.Table:
    """Hive partition values are read back as strings; restore int32."""
    i = batch.schema.get_field_index("part")
    return batch.set_column(i, "part", pc.cast(batch["part"], pa.int32()))


def read_journal(out_dir: str, kind: str):
    import ray.data

    return ray.data.read_parquet(
        os.path.join(out_dir, "journal"), columns=_journal_columns(kind)
    ).map_batches(_cast_part, batch_format="pyarrow")


def build_index(corpus_ds, out_dir: str, cfg: BuildConfig | None = None) -> dict:
    """Run all phases (resuming past committed ones).  Returns the root
    manifest dict."""
    import ray

    cfg = cfg or BuildConfig()
    os.makedirs(out_dir, exist_ok=True)

    # actor-pool sizing: leave headroom for the read/write stages so the
    # pipeline doesn't serialize (ray_guide: pool that reserves every CPU
    # starves the other stages)
    # Autoscaling pools (min 1) so a pool never reserves every CPU and
    # starves the interleaved read/sort/write task stages into deadlock.
    ncpu = int(ray.cluster_resources().get("CPU", 4))
    pool = cfg.tokenize_concurrency or (1, max(2, ncpu - 2))
    merge_pool = cfg.merge_concurrency or (1, max(2, ncpu // 2))

    max_pool = pool if isinstance(pool, int) else pool[1]

    # ---- phase: journal -------------------------------------------------
    if not mf.is_committed(out_dir, "journal"):
        t_phase = time.time()
        registry = build_domain_registry(corpus_ds, cfg.num_parts)
        reg_ref = ray.put(registry)
        # single-file corpora arrive as a handful of blocks; split so the
        # tokenize pool actually fans out (repartition without shuffle)
        corpus_ds = corpus_ds.repartition(max_pool * 2)
        journal = corpus_ds.map_batches(
            TokenizeStage,
            fn_constructor_args=(reg_ref,),
            batch_size=cfg.tokenize_batch_size,
            batch_format="pyarrow",
            concurrency=pool,
        )
        journal.write_parquet(
            os.path.join(out_dir, "journal"), partition_cols=["part"]
        )
        # registry table for query-time repo filters / decoration
        reg_table = pa.table(
            {
                "repo": pa.array(registry.repos, pa.string()),
                "domain_id": pa.array(range(len(registry.repos)), pa.int64()),
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

        import ray.data as rd

        n_docs = rd.read_parquet(
            os.path.join(out_dir, "journal"), columns=["combined_id"]
        ).count()
        mf.commit_manifest(
            out_dir,
            "journal",
            {
                "n_docs": n_docs,
                "n_repos": len(registry.repos),
                "num_parts": cfg.num_parts,
                "seconds": round(time.time() - t_phase, 3),
                "files": mf.list_phase_files(out_dir, "journal"),
            },
        )

    journal_manifest = mf.read_manifest(out_dir, "journal")
    num_parts = journal_manifest["num_parts"]

    # ---- phase: stats (global df + hot terms) ---------------------------
    if not mf.is_committed(out_dir, "stats"):
        t_phase = time.time()
        js = read_journal(out_dir, "reverse")

        def partial_df(batch: pa.Table) -> pa.Table:
            flat = pc.list_flatten(batch["term_ids"].combine_chunks()).to_numpy(
                zero_copy_only=False
            )
            uniq, counts = np.unique(flat, return_counts=True)
            return pa.table(
                {
                    "term_id": pa.array(uniq, pa.int64()),
                    "cnt": pa.array(counts, pa.int64()),
                }
            )

        from ray.data.aggregate import Sum

        df_ds = (
            js.select_columns(["term_ids"])
            .map_batches(partial_df, batch_format="pyarrow")
            .groupby("term_id")
            .aggregate(Sum("cnt", alias_name="df"))
        )

        def add_bucket(batch: pa.Table) -> pa.Table:
            b = term_bucket(
                batch["term_id"].to_numpy(zero_copy_only=False), cfg.num_buckets
            )
            return batch.append_column("bucket", pa.array(b, pa.int32()))

        df_ds.map_batches(add_bucket, batch_format="pyarrow").write_parquet(
            os.path.join(out_dir, "stats"), partition_cols=["bucket"]
        )

        import ray.data as rd

        hot = rd.read_parquet(os.path.join(out_dir, "stats")).filter(
            expr=f"df >= {cfg.hot_df_threshold}"
        )
        hot_terms = [r["term_id"] for r in hot.select_columns(["term_id"]).take_all()]
        mf.commit_manifest(
            out_dir,
            "stats",
            {
                "hot_terms": hot_terms,
                "hot_df_threshold": cfg.hot_df_threshold,
                "num_buckets": cfg.num_buckets,
                "seconds": round(time.time() - t_phase, 3),
            },
        )

    stats_manifest = mf.read_manifest(out_dir, "stats")

    # ---- phase: forward -------------------------------------------------
    if not mf.is_committed(out_dir, "forward"):
        t_phase = time.time()
        fwd = (
            read_journal(out_dir, "forward")
            .groupby("part")
            .map_groups(
                lambda t: t.sort_by("combined_id"), batch_format="pyarrow"
            )
        )
        fwd.write_parquet(os.path.join(out_dir, "forward"), partition_cols=["part"])
        import ray.data as rd

        counts = (
            rd.read_parquet(os.path.join(out_dir, "forward"), columns=["part"])
            .groupby("part")
            .count()
            .take_all()
        )
        mf.commit_manifest(
            out_dir,
            "forward",
            {
                "per_part_docs": {str(r["part"]): r["count()"] for r in counts},
                "seconds": round(time.time() - t_phase, 3),
                "files": mf.list_phase_files(out_dir, "forward"),
            },
        )

    # ---- phase: reverse -------------------------------------------------
    if not mf.is_committed(out_dir, "reverse"):
        t_phase = time.time()
        hot_ref = __import__("ray").put(set(stats_manifest["hot_terms"]))
        runs = (
            read_journal(out_dir, "reverse")
            .map_batches(
                ExplodePostings,
                fn_constructor_args=(hot_ref, cfg.num_buckets, cfg.num_salts),
                batch_format="pyarrow",
                concurrency=pool,
            )
            .groupby(["part", "bucket", "salt"])
            .map_groups(encode_run_group, batch_format="pyarrow")
        )
        merged = runs.groupby(["part", "bucket"]).map_groups(
            MergeWorker,
            batch_format="pyarrow",
            concurrency=merge_pool,
        )
        merged.write_parquet(
            os.path.join(out_dir, "postings"), partition_cols=["part"]
        )
        import ray.data as rd

        from ray.data.aggregate import Sum

        seg = rd.read_parquet(os.path.join(out_dir, "postings"), columns=["part", "df"])
        per_part = (
            seg.groupby("part").aggregate(Sum("df", alias_name="postings")).take_all()
        )
        mf.commit_manifest(
            out_dir,
            "reverse",
            {
                "per_part_postings": {
                    str(r["part"]): r["postings"] for r in per_part
                },
                "num_buckets": cfg.num_buckets,
                "num_salts": cfg.num_salts,
                "hot_terms": len(stats_manifest["hot_terms"]),
                "seconds": round(time.time() - t_phase, 3),
                "files": mf.list_phase_files(out_dir, "postings"),
                "lineage": {
                    "journal_files": journal_manifest.get("files", []),
                },
            },
        )

    root = {
        "n_docs": journal_manifest["n_docs"],
        "num_parts": num_parts,
        "out_dir": out_dir,
    }
    mf.commit_manifest(out_dir, "root", root)
    return root
