"""Tokenize/keyword-extract stage: corpus rows -> journal rows.

This collapses the reference's converting+loading chain (SentenceExtractor
-> DocumentKeywordExtractor -> DocumentKeywordsBuilder ->
IndexJournalSlopWriter.put, SURVEY.md §3.3) into one ``map_batches``
actor-pool stage over Arrow batches:

- token admission: functions/wordpattern.py (DocumentPositionMapper.java:
  201-260 semantics);
- 1-based strictly-increasing positions per term, capped at 512 per
  term-doc (DocumentKeywordsBuilder.java:31); tf kept uncapped alongside;
- term ids: murmur keyword hash (IndexJournalSlopWriter.java:70-75);
- WordFlags for the code corpus (SURVEY.md §2.2 M5 mapping): Title for
  terms appearing in the filename, UrlPath for path tokens, UrlDomain for
  repo-name tokens — assigned to *body* terms only (divergence from the
  reference, which also injects synthetic non-body keywords; keeping the
  indexed term set = body tokens makes the DuckDB correctness oracle
  exactly expressible);
- term meta: flags byte | coarse position bitmask
  (DocumentKeywordsBuilder.java:144-159);
- combined id: rank<<57 | domain<<26 | ordinal (UrlIdCodec), rank injected
  at build time like DocIdRewriter (IndexConstructorMain.java:210-218);
- sha256(content) recorded per row (data_hash) — the end-to-end invariant.

Stateful setup (regexes, hash cache, broadcast registry) happens once per
actor in ``__init__``; per-batch work is numpy-vectorized per document.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ..functions.metadata import (
    MAX_POSITIONS_PER_WORD,
    WordFlags,
    encode_document_meta,
    position_bitmask,
)
from ..functions.murmur import KeywordHashCache
from ..functions.wordpattern import tokenize
from ..functions import idcodec


class TokenizeStage:
    """Callable class for ``ds.map_batches(TokenizeStage, fn_constructor_args=
    (registry_ref,), concurrency=N, batch_size=B, batch_format="pyarrow")``."""

    def __init__(self, registry_ref):
        import ray

        self.registry = (
            ray.get(registry_ref) if hasattr(registry_ref, "hex") else registry_ref
        )
        self.cache = KeywordHashCache()
        self._key_tokens_cache: dict[str, frozenset] = {}

    def _tokens_of(self, s: str) -> frozenset:
        out = self._key_tokens_cache.get(s)
        if out is None:
            out = frozenset(tokenize(s.replace("/", " ").replace(".", " ")))
            if len(self._key_tokens_cache) < 1 << 16:
                self._key_tokens_cache[s] = out
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        repos = batch["repo"].to_pylist()
        paths = batch["path"].to_pylist()
        commits = batch["commit"].to_pylist()
        langs = batch["lang"].to_pylist()
        contents = batch["content"].to_pylist()
        ordinals = batch["ordinal"].to_pylist()

        n = len(repos)
        dom, rank, part = self.registry.lookup_many(repos)
        combined = idcodec.encode_id_with_rank(rank, dom, np.asarray(ordinals))

        sizes = np.zeros(n, dtype=np.int32)
        doc_meta = np.zeros(n, dtype=np.int64)
        term_ids_col: list[list[int]] = []
        term_tfs_col: list[list[int]] = []
        term_meta_col: list[list[int]] = []
        term_pos_col: list[list[list[int]]] = []
        titles: list[str] = []
        descriptions: list[str] = []
        hashes: list[str] = []

        for i in range(n):
            content = contents[i]
            toks = tokenize(content)
            sizes[i] = len(toks)
            hashes.append(hashlib.sha256(content.encode("utf-8")).hexdigest())
            filename = paths[i].rsplit("/", 1)[-1]
            titles.append(filename)
            first_line = content.split("\n", 1)[0]
            descriptions.append(first_line[:128])

            if toks:
                arr = np.asarray(toks)
                uniq, inv, counts = np.unique(
                    arr, return_inverse=True, return_counts=True
                )
                order = np.argsort(inv, kind="stable")
                positions_sorted = (order + 1).astype(np.int32)
                splits = np.cumsum(counts)[:-1]
                pos_lists = np.split(positions_sorted, splits)

                tids = self.cache.hash_many(uniq.tolist())

                title_set = self._tokens_of(filename)
                path_set = self._tokens_of(paths[i])
                repo_set = self._tokens_of(repos[i])
                flags = np.zeros(len(uniq), dtype=np.int64)
                for j, w in enumerate(uniq.tolist()):
                    f = 0
                    if w in title_set:
                        f |= WordFlags.TITLE
                    if w in path_set:
                        f |= WordFlags.URL_PATH
                    if w in repo_set:
                        f |= WordFlags.URL_DOMAIN
                    flags[j] = f

                metas = []
                plists = []
                for j in range(len(uniq)):
                    p = pos_lists[j][:MAX_POSITIONS_PER_WORD]
                    metas.append(int(flags[j]) & 0xFF | position_bitmask(p))
                    plists.append(p.tolist())

                term_ids_col.append(tids.tolist())
                term_tfs_col.append(counts.astype(np.int32).tolist())
                term_meta_col.append(metas)
                term_pos_col.append(plists)
            else:
                term_ids_col.append([])
                term_tfs_col.append([])
                term_meta_col.append([])
                term_pos_col.append([])

            # doc-level metadata: rank in bits 48-55 (ForwardIndexConverter
            # injects DomainRankings there, ForwardIndexConverter.java:104-109);
            # enc size from document length.
            doc_meta[i] = int(
                encode_document_meta(
                    rank=int(rank[i]) << 2,  # 6-bit rank scaled into the 8-bit field
                    enc_domain_size=max(1, int(sizes[i]) // 5),
                    year=0,
                    quality=0,
                    flags=0,
                )
            )

        return pa.table(
            {
                "part": pa.array(part, pa.int32()),
                "combined_id": pa.array(combined, pa.int64()),
                "document_meta": pa.array(doc_meta, pa.int64()),
                "features": pa.array(np.zeros(n, dtype=np.int32), pa.int32()),
                "size": pa.array(sizes, pa.int32()),
                "lang": pa.array(langs, pa.string()),
                "term_ids": pa.array(term_ids_col, pa.list_(pa.int64())),
                "term_tfs": pa.array(term_tfs_col, pa.list_(pa.int32())),
                "term_meta": pa.array(term_meta_col, pa.list_(pa.int64())),
                "term_positions": pa.array(
                    term_pos_col, pa.list_(pa.list_(pa.int32()))
                ),
                "repo": pa.array(repos, pa.string()),
                "path": pa.array(paths, pa.string()),
                "commit": pa.array(commits, pa.string()),
                "title": pa.array(titles, pa.string()),
                "description": pa.array(descriptions, pa.string()),
                "data_hash": pa.array(hashes, pa.string()),
            }
        )
