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
  repo-name tokens — assigned to *body* terms by default; with
  ``anchor_regions=True`` the reference's full position map applies
  (DocumentPositionMapper.mapPositionsAndExtractSimpleKeywords:23-46):
  URL words and external link texts are indexed in virtual position
  regions after the body with their own span tags, so path tokens and
  anchor texts become searchable terms exactly as in the reference
  (oracle: bm25_linktext);
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
    POSITIONS_BITMASK_WINDOW_SIZE,
    WordFlags,
    encode_document_meta,
)
from ..functions.murmur import KeywordHashCache
from ..functions.wordpattern import artifact_keywords, name_like_tokens, tokenize
from ..functions import idcodec


# Subjects candidate rule: first occurrence inside the head span (the
# code-corpus structural analog of the reference's noun-grammar candidate
# pattern, SubjectLikeKeywords.java:32-46); admission additionally
# requires the tf-idf gate (see TokenizeStage._subjects_gate)
EARLY_MENTION_POS = 16

# Span tags for the code corpus (HtmlTag analog, IndexSpansWriter/
# SpansCodec S8): 'c' = comment lines, 'h' = head (first 16 tokens),
# 'u' = DOC_URL region, 'a' = EXTERNAL_LINKTEXT region (anchor texts).
SPAN_COMMENT = ord("c")
SPAN_HEAD = ord("h")
SPAN_URL = ord("u")
SPAN_LINKTEXT = ord("a")
HEAD_SPAN_TOKENS = 16
# Link-text repetition attenuation: (int) Math.max(1, min(sqrt(count), 12))
# (DocumentPositionMapper.mapLinkTextPositions, DocumentPositionMapper
# .java:165 — "a really big link has thousands of repetitions, attenuate
# with math")
MAX_LINKTEXT_REPS = 12
MAX_SPAN_POINTS = 8192  # DocumentKeywordsBuilder.java:32
_COMMENT_PREFIXES = ("//", "#", "--", "*", "/*")


def _is_comment_line(line: str) -> bool:
    return line.lstrip().startswith(_COMMENT_PREFIXES)


def _line_span_tokenize(
    content: str, span_pred
) -> tuple[list[str], list[int], list[list[int]]]:
    """Shared processor core: tokenize line-by-line (identical token
    stream — newlines always separate tokens), marking lines where
    ``span_pred`` fires as comment/heading-analog spans (flattened
    [start, end) 1-based pairs).

    (A single-finditer whole-document variant was measured ~25% SLOWER —
    re.findall's C-level string list beats per-match objects — so the
    per-line findall stays.)"""
    toks: list[str] = []
    comment_pairs: list[int] = []
    pos = 1
    for line in content.split("\n"):
        lt = tokenize(line)
        if lt and span_pred(line):
            comment_pairs.extend((pos, pos + len(lt)))
        toks.extend(lt)
        pos += len(lt)
    codes: list[int] = []
    spans: list[list[int]] = []
    if comment_pairs:
        codes.append(SPAN_COMMENT)
        spans.append(comment_pairs[: 2 * 8192])  # MAX_SPANS_PER_TYPE cap
    if toks:
        codes.append(SPAN_HEAD)
        spans.append([1, min(len(toks), HEAD_SPAN_TOKENS) + 1])
    return toks, codes, spans


def tokenize_with_spans(content: str) -> tuple[list[str], list[int], list[list[int]]]:
    """Code processor: comment-prefixed lines become comment spans."""
    return _line_span_tokenize(content, _is_comment_line)


def plaintext_with_spans(
    content: str,
) -> tuple[list[str], list[int], list[list[int]]]:
    """PlainText processor: one token stream, a head span, NO comment
    detection (prose has no comment syntax — '#'/'//' prefixes are
    content, not markup)."""
    toks = tokenize(content)
    codes: list[int] = []
    spans: list[list[int]] = []
    if toks:
        codes.append(SPAN_HEAD)
        spans.append([1, min(len(toks), HEAD_SPAN_TOKENS) + 1])
    return toks, codes, spans


def markdown_with_spans(
    content: str,
) -> tuple[list[str], list[int], list[list[int]]]:
    """Markdown processor: ATX heading lines ('#'-prefixed) become the
    heading-analog spans (the role comment lines play for code); other
    comment-like prefixes ('//', '--', '*') are prose."""
    return _line_span_tokenize(
        content, lambda line: line.lstrip().startswith("#")
    )


# Document-processor plugin registry (AbstractDocumentProcessorPlugin with
# Html/PlainText/Pdf implementations, code/processes/converting-process/
# .../processor/plugin/*.java; SURVEY §2.10): a processor maps content ->
# (tokens, span codes, spans).  The tokenize stage picks one per document
# by ``lang`` via BuildConfig.doc_processors ({lang: processor_name});
# unmapped langs use the code processor, so defaults are byte-identical
# to the pre-registry engine.
DOC_PROCESSORS: dict = {}


def register_processor(name: str, fn) -> None:
    DOC_PROCESSORS[name] = fn


register_processor("code", tokenize_with_spans)
register_processor("plaintext", plaintext_with_spans)
register_processor("markdown", markdown_with_spans)


class LinkStoreLookup:
    """Pruned reader over a bucketed link-text side store
    (build_index.build_link_store): an actor resolves a batch's
    (repo, path) keys by loading ONLY the buckets those keys hash to,
    FIFO-caching up to ``cache_buckets`` bucket tables (a re-read is the
    only eviction cost).  Hash collisions are resolved exactly by
    comparing the stored repo/path strings along the equal-key run."""

    def __init__(self, store_dir: str, cache_buckets: int = 256):
        import json
        import os

        from ..functions.murmur import hash_nearly_ascii

        self.store_dir = store_dir
        with open(os.path.join(store_dir, "_store.json")) as f:
            self.num_buckets = int(json.load(f)["num_buckets"])
        # cache < num_buckets thrashes into a parquet read per lookup
        # under random key order — warn-by-construction: floor at
        # num_buckets unless the caller explicitly wants eviction
        self.cache_buckets = max(1, int(cache_buckets))
        self._hash = hash_nearly_ascii
        self._cache: dict[int, tuple] = {}  # bucket -> (keys, rows)

    def _bucket(self, b: int):
        hit = self._cache.get(b)
        if hit is not None:
            return hit
        import os

        import pyarrow.dataset as pads

        d = os.path.join(self.store_dir, f"bucket={b}")
        if os.path.isdir(d):
            t = pads.dataset(d).to_table(
                columns=["key", "repo", "path", "lt_texts_pk", "lt_counts_pk"]
            )
            keys = t["key"].to_numpy(zero_copy_only=False).astype(np.int64)
            o = np.argsort(keys, kind="mergesort")
            rows = (
                keys[o],
                np.asarray(t["repo"].to_pylist(), dtype=object)[o],
                np.asarray(t["path"].to_pylist(), dtype=object)[o],
                np.asarray(t["lt_texts_pk"].to_pylist(), dtype=object)[o],
                np.asarray(t["lt_counts_pk"].to_pylist(), dtype=object)[o],
            )
        else:
            rows = (
                np.empty(0, dtype=np.int64),
                np.empty(0, dtype=object),
                np.empty(0, dtype=object),
                np.empty(0, dtype=object),
                np.empty(0, dtype=object),
            )
        if len(self._cache) >= self.cache_buckets:
            self._cache.pop(next(iter(self._cache)))  # FIFO
        self._cache[b] = rows
        return rows

    def get(self, repo: str, path: str):
        """(texts, counts) lists for one document, or None."""
        key = self._hash(f"{repo}\x1f{path}")
        b = int((key % self.num_buckets + self.num_buckets) % self.num_buckets)
        keys, repos, paths, tpk, cpk = self._bucket(b)
        i = int(np.searchsorted(keys, key))
        while i < len(keys) and keys[i] == key:
            if repos[i] == repo and paths[i] == path:
                return (
                    tpk[i].split("\x1f"),
                    [int(x) for x in cpk[i].split(",")],
                )
            i += 1
        return None


class TfDictStage:
    """Corpus term-document-frequency partials — the regenerated
    TermFrequencyDict (TermFrequencyExporter.java:101-130: per-document
    distinct-term sets summed into doc counts).  One row per distinct
    batch term with two partial counts: ``cnt`` counts documents that
    contain the term in the body OR as one of the journal's synthetic
    keywords (so hot-term salting sees site:/generator:/artifact terms
    exactly as the reverse build will), ``body`` counts body-only
    documents — the Subjects tf-idf gate uses body counts, matching the
    reference dict (built from raw crawl text, no synthetics)."""

    def __init__(self):
        from collections import Counter  # noqa: F401  (used per call)

        self.cache = KeywordHashCache()

    def __call__(self, batch: pa.Table) -> pa.Table:
        from collections import Counter

        c_all: Counter = Counter()
        c_body: Counter = Counter()
        for repo, ordinal, content in zip(
            batch["repo"].to_pylist(),
            batch["ordinal"].to_pylist(),
            batch["content"].to_pylist(),
        ):
            body = set(tokenize(content))
            syn = {
                f"site:{repo}",
                "generator:wiki" if ordinal % 7 == 3 else "generator:docs",
            }
            if "@" in content:
                syn.update(artifact_keywords(list(body)))
            c_body.update(body)
            c_all.update(body | syn)
        terms = list(c_all.keys())
        return pa.table(
            {
                "term_id": pa.array(self.cache.hash_many(terms), pa.int64()),
                "cnt": pa.array([c_all[t] for t in terms], pa.int64()),
                "body": pa.array(
                    [c_body.get(t, 0) for t in terms], pa.int64()
                ),
            }
        )


class TokenizeStage:
    """Callable class for ``ds.map_batches(TokenizeStage, fn_constructor_args=
    (registry_ref, tfdict_dir, dict_doc_count), concurrency=N, batch_size=B,
    batch_format="pyarrow")``.

    ``tfdict_dir`` points at the stats-phase term-frequency table; each
    actor loads it once in ``__init__`` — the reference's
    TermFrequencyDict is likewise loaded fully per extractor process
    (DocumentKeywordExtractor.java:45).  When provided, the Subjects flag
    is gated on the reference's tf-idf admission (see ``_subjects_gate``);
    without it (bare test construction) the early-mention candidate flag
    is stored ungated."""

    def __init__(self, registry_ref, tfdict_dir: str | None = None,
                 dict_doc_count: int = 0,
                 doc_processors: dict[str, str] | None = None,
                 anchor_regions: bool = False,
                 link_store_dir: str | None = None,
                 link_store_cache: int = 64,
                 link_keywords: bool = False,
                 html_features: bool = False):
        import ray

        # anchor regions (DocumentPositionMapper.mapPositionsAndExtract
        # SimpleKeywords:23-46): after the body, +2 padding, then URL
        # words (path tokens, DOC_URL span), +2 padding, then external
        # link texts repeated max(1, min(sqrt(count), 12)) times with +2
        # padding between repetitions (EXTERNAL_LINKTEXT spans).  Off by
        # default: the indexed term set then stays body+synthetic, which
        # every pre-existing oracle replicates.  Link texts arrive as
        # optional corpus columns lt_texts (list<string>) / lt_counts
        # (list<int64>) — see build_index.attach_link_texts — or, the
        # scale path, per-key pruned reads from a bucketed side store
        # (build_link_store + LinkStoreLookup; the corpus never
        # re-shuffles).
        self.anchor_regions = bool(anchor_regions)
        self.link_store = (
            LinkStoreLookup(link_store_dir, link_store_cache)
            if link_store_dir is not None
            else None
        )
        # links:<dst> external-link keywords (HtmlDocumentProcessor
        # Plugin.createLinkKeywords:308-323): per-doc targets from the
        # deterministic ring derivation shared with the link-graph
        # pipelines (pipelines/ranking.link_edges).  ``s`` must be the
        # repo's index in the SORTED repo list even for delta registries
        # whose insertion-stable domain ids diverge from sorted order.
        self.link_keywords = bool(link_keywords)
        # HtmlFeature bitmask + DocumentFlags byte + special:* keywords
        # (HtmlFeature.java:5-40, DocumentFlags.java:5-14).  The corpus
        # has no crawler, so the crawler-only signals derive from doc
        # ordinal arithmetic (the generator: precedent) and the content-
        # derivable ones from lang/path/length — all SQL-replicable.
        self.html_features = bool(html_features)

        self.registry = (
            ray.get(registry_ref) if hasattr(registry_ref, "hex") else registry_ref
        )
        self._lk_index = (
            {r: i for i, r in enumerate(self.registry.repos)}
            if self.link_keywords
            else None
        )
        # per-lang document processors (SURVEY §2.10 plugin seam);
        # unmapped langs fall back to the code processor.  Names resolve
        # against THIS worker process's registry: a processor registered
        # via register_processor() only on the driver does not exist
        # here — fail with the fix spelled out instead of a bare KeyError
        self.processors = {}
        for lang, name in (doc_processors or {}).items():
            if name not in DOC_PROCESSORS:
                raise ValueError(
                    f"unknown doc processor {name!r} for lang {lang!r} in "
                    f"this worker process (registered: "
                    f"{sorted(DOC_PROCESSORS)}). register_processor() "
                    "must run at import time of a module shipped to "
                    "workers (e.g. the module defining the processor), "
                    "not ad hoc on the driver."
                )
            self.processors[lang] = DOC_PROCESSORS[name]
        self.cache = KeywordHashCache()
        self._key_tokens_cache: dict[str, frozenset] = {}
        self.dict_ids: np.ndarray | None = None
        self.dict_df: np.ndarray | None = None
        self.dict_doc_count = float(max(dict_doc_count, 1))
        if tfdict_dir is not None:
            import pyarrow.dataset as pads

            t = pads.dataset(tfdict_dir).to_table(
                columns=["term_id", "body_df"]
            )
            ids = t["term_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            bdf = t["body_df"].to_numpy(zero_copy_only=False).astype(np.int64)
            o = np.argsort(ids)
            self.dict_ids = ids[o]
            self.dict_df = bdf[o]

    def _lookup_body_df(self, strs: list[str]) -> np.ndarray:
        """Dict doc-frequency per term string (0 when absent)."""
        if len(self.dict_ids) == 0:
            return np.zeros(len(strs), dtype=np.int64)
        h = np.asarray(self.cache.hash_many(strs), dtype=np.int64)
        ix = np.searchsorted(self.dict_ids, h)
        safe = np.minimum(ix, len(self.dict_ids) - 1)
        return np.where(self.dict_ids[safe] == h, self.dict_df[safe], 0)

    def _subjects_gate(self, uniq_batch, seg_doc, seg_term, counts, n_docs):
        """SubjectLikeKeywords admission (SubjectLikeKeywords.java:48-60):
        a subject candidate keeps its flag iff the term's tf-idf value is
        >= 100.  The value is WordsTfIdfCounts.getTermValue
        (WordsTfIdfCounts.java:103-127): ``trunc(-75 * (0.1 +
        0.9*tf/maxtf) * mean over '_'-parts of ln(max(freq,1)/N))``; for
        '_'-joined terms the gate instead averages the *parts'* own
        in-document map values with Java integer division, absent part ->
        0 (SubjectLikeKeywords.getTermTfIdf:71-88).  Fully vectorized:
        parts resolved against the batch vocabulary, (doc, part) map
        lookups as one searchsorted over the sorted (doc, term) segment
        keys."""
        import pyarrow.compute as pc

        V = len(uniq_batch)
        # parts per unique batch term (empty parts dropped, as
        # StringUtils.split does)
        sp = pc.split_pattern(pa.array(uniq_batch), "_")
        flat = pc.list_flatten(sp)
        par = pc.list_parent_indices(sp)
        keep = pc.not_equal(flat, "")
        flat = flat.filter(keep)
        par = par.filter(keep).to_numpy(zero_copy_only=False).astype(np.int64)
        flat_list = flat.to_pylist()
        pcnt = np.zeros(V, dtype=np.int64)
        np.add.at(pcnt, par, 1)
        poff = np.concatenate([[0], np.cumsum(pcnt)])

        # mean ln(max(freq,1)/N) per unique term over its parts
        dfp = self._lookup_body_df(flat_list).astype(np.float64)
        lnp = np.log(np.maximum(dfp, 1.0) / self.dict_doc_count)
        sums = np.zeros(V, dtype=np.float64)
        np.add.at(sums, par, lnp)
        mlnf = sums / np.maximum(pcnt, 1)

        # per-doc max tf (maxValue, WordsTfIdfCounts.java:92-101)
        maxtf = np.ones(n_docs, dtype=np.int64)
        np.maximum.at(maxtf, seg_doc, counts)
        w = 0.1 + 0.9 * counts / maxtf[seg_doc]
        seg_v = np.trunc(-75.0 * w * mlnf[seg_term]).astype(np.int64)
        gate = seg_v >= 100

        # '_' terms: integer-average the parts' own (doc, part) values
        has_us = np.char.find(uniq_batch, "_") >= 0
        us_ix = np.flatnonzero(has_us[seg_term])
        if us_ix.size:
            t_u = seg_term[us_ix]
            d_u = seg_doc[us_ix]
            cnts = pcnt[t_u]
            n_flat = int(cnts.sum())
            rep = np.repeat(np.arange(us_ix.size), cnts)
            fstart = np.repeat(poff[t_u], cnts)
            within = np.arange(n_flat) - np.repeat(
                np.cumsum(cnts) - cnts, cnts
            )
            part_strs = np.asarray(flat_list, dtype=object).astype(
                uniq_batch.dtype
            )[fstart + within]
            p_ix = np.searchsorted(uniq_batch, part_strs)
            p_safe = np.minimum(p_ix, V - 1)
            p_ok = uniq_batch[p_safe] == part_strs
            seg_key = seg_doc * V + seg_term  # sorted: segs are (doc, term)-ordered
            q_key = np.repeat(d_u, cnts) * V + p_safe
            s_ix = np.searchsorted(seg_key, q_key)
            s_safe = np.minimum(s_ix, seg_key.size - 1)
            s_ok = p_ok & (seg_key[s_safe] == q_key)
            vals = np.where(s_ok, seg_v[s_safe], 0)
            vsum = np.zeros(us_ix.size, dtype=np.int64)
            np.add.at(vsum, rep, vals)
            gate[us_ix] = (vsum // cnts) >= 100
        return gate

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

        # --- tokenize every doc; collect one flat token stream per batch
        tok_lists: list[list[str]] = []
        titles: list[str] = []
        descriptions: list[str] = []
        hashes: list[str] = []
        span_codes_col: list[bytes] = []
        spans_col: list[list[list[int]]] = []
        for i in range(n):
            content = contents[i]
            proc = self.processors.get(langs[i], tokenize_with_spans)
            toks_i, codes_i, spans_i = proc(content)
            tok_lists.append(toks_i)
            span_codes_col.append(bytes(codes_i))
            spans_col.append(spans_i)
            hashes.append(hashlib.sha256(content.encode("utf-8")).hexdigest())
            titles.append(paths[i].rsplit("/", 1)[-1])
            descriptions.append(content.split("\n", 1)[0][:128])

        lengths = np.array([len(t) for t in tok_lists], dtype=np.int64)
        sizes = lengths.astype(np.int32)

        feats = np.zeros(n, dtype=np.int64)
        doc_flags = np.zeros(n, dtype=np.int64)
        feat_kws: list[list[str]] | None = None
        if self.html_features:
            from ..functions.metadata import (
                HTML_FEATURE_KEYWORD,
                DocumentFlags,
                HtmlFeature,
            )

            ordn = np.asarray(ordinals, dtype=np.int64)
            larr = np.asarray(langs, dtype=object)
            feats |= (larr == "js").astype(np.int64) * int(HtmlFeature.JS)
            feats |= (
                np.array(["-" in p for p in paths]).astype(np.int64)
                * int(HtmlFeature.KEBAB_CASE_URL)
            )
            feats |= (ordn % 11 == 5) * int(HtmlFeature.ADVERTISEMENT)
            feats |= (ordn % 13 == 2) * int(HtmlFeature.TRACKING)
            feats |= (ordn % 29 == 7) * int(HtmlFeature.TRACKING_ADTECH)
            feats |= (ordn % 31 == 9) * int(HtmlFeature.AFFILIATE_LINK)
            feats |= (ordn % 17 == 3) * int(HtmlFeature.CONSENT)
            feats |= (ordn % 19 == 4) * int(HtmlFeature.POPOVER)
            feats |= (ordn % 13 == 5) * int(HtmlFeature.COOKIES)
            feats |= (lengths < 20) * int(HtmlFeature.SHORT_DOCUMENT)
            doc_flags = np.where(
                ordn % 7 == 3,
                np.int64(DocumentFlags.GENERATOR_WIKI),
                np.int64(DocumentFlags.GENERATOR_DOCS),
            )
            doc_flags |= (larr == "js").astype(np.int64) * int(
                DocumentFlags.JAVASCRIPT
            )
            doc_flags |= (larr == "md").astype(np.int64) * int(
                DocumentFlags.PLAIN_TEXT
            )
            # format:<lang> rides the feature family too: the converter
            # publishes the document format as a format: keyword
            # (HtmlFeature PDF -> format:pdf; the code corpus's format
            # IS the language)
            feat_kws = [
                [
                    kw
                    for bit, kw in HTML_FEATURE_KEYWORD.items()
                    if feats[i] & int(bit)
                ]
                + [f"format:{langs[i]}"]
                for i in range(n)
            ]
        total_body = int(lengths.sum())
        doc_starts = np.cumsum(lengths) - lengths

        # --- anchor regions (URL words + link texts) appended AFTER the
        # body stream with explicit non-contiguous positions.  Within a
        # (doc, term) group the stable lexsort below keeps body
        # occurrences first and anchor occurrences after — positions stay
        # strictly increasing because every anchor position > body length.
        ext_toks: list[str] = []
        ext_pos: list[int] = []
        ext_doc: list[int] = []
        ext_sets: list[set] | None = None
        if self.anchor_regions:
            import math

            ext_sets = [set() for _ in range(n)]
            cols = batch.column_names
            lt_texts_col = (
                batch["lt_texts"].to_pylist() if "lt_texts" in cols else None
            )
            lt_counts_col = (
                batch["lt_counts"].to_pylist() if "lt_counts" in cols else None
            )
            for i in range(n):
                L = len(tok_lists[i])
                # mapDocumentPositions returns L+1; then +2 padding
                p = L + 3
                url_toks = tokenize(
                    paths[i].replace("/", " ").replace(".", " ")
                )
                if url_toks:
                    u_start = p + 1
                    for w in url_toks:
                        p += 1
                        ext_toks.append(w)
                        ext_pos.append(p)
                        ext_doc.append(i)
                        ext_sets[i].add(w)
                    span_codes_col[i] += bytes([SPAN_URL])
                    spans_col[i].append([u_start, p + 1])
                # post-loop pos++ (unconditional in the reference), +2 pad
                p += 3
                if lt_texts_col is not None:
                    texts = lt_texts_col[i]
                    cnts = lt_counts_col[i] if texts else None
                elif self.link_store is not None:
                    hit = self.link_store.get(repos[i], paths[i])
                    texts, cnts = hit if hit is not None else (None, None)
                else:
                    texts = cnts = None
                if texts:
                    a_pairs: list[int] = []
                    for text, cnt in zip(texts, cnts):
                        t_toks = tokenize(text)
                        if not t_toks:
                            continue  # no admissible tokens: skip (the
                            # reference would still advance pos per raw
                            # word; ours numbers admitted tokens only,
                            # consistently with the body stream)
                        reps = int(max(1.0, min(math.sqrt(cnt), 12.0)))
                        for _rep in range(reps):
                            r_start = p + 1
                            for w in t_toks:
                                p += 1
                                ext_toks.append(w)
                                ext_pos.append(p)
                                ext_doc.append(i)
                                ext_sets[i].add(w)
                            a_pairs.extend((r_start, p + 1))
                            p += 2  # padding between repetitions
                    if a_pairs:
                        span_codes_col[i] += bytes([SPAN_LINKTEXT])
                        spans_col[i].append(a_pairs[:MAX_SPAN_POINTS])

        total = total_body + len(ext_toks)

        if total:
            flat = np.asarray(
                [w for toks in tok_lists for w in toks] + ext_toks,
                dtype=object,
            ).astype("U48")
            # ONE unique per batch — docs share a Zipfian vocabulary
            uniq_batch, inv = np.unique(flat, return_inverse=True)
            tids_uniq = self.cache.hash_many(uniq_batch.tolist())

            doc_idx = np.repeat(np.arange(n, dtype=np.int64), lengths)
            pos_in_doc = (np.arange(total_body, dtype=np.int64) -
                          np.repeat(doc_starts, lengths) + 1)
            if ext_toks:
                doc_idx = np.concatenate(
                    [doc_idx, np.asarray(ext_doc, dtype=np.int64)]
                )
                pos_in_doc = np.concatenate(
                    [pos_in_doc, np.asarray(ext_pos, dtype=np.int64)]
                )

            # group occurrences by (doc, term); stable sort keeps positions
            # strictly increasing within each segment
            order = np.lexsort((inv, doc_idx))
            d_s = doc_idx[order]
            t_s = inv[order]
            p_s = pos_in_doc[order]

            seg_start = np.ones(total, dtype=bool)
            seg_start[1:] = (d_s[1:] != d_s[:-1]) | (t_s[1:] != t_s[:-1])
            starts = np.flatnonzero(seg_start)
            counts = np.diff(np.append(starts, total))
            seg_doc = d_s[starts]
            seg_term = t_s[starts]

            # positions cap (DocumentKeywordsBuilder.java:31): drop
            # occurrences ranked >= 512 within their segment
            rank_in_seg = np.arange(total, dtype=np.int64) - np.repeat(
                starts, counts
            )
            keep = rank_in_seg < MAX_POSITIONS_PER_WORD
            pos_vals = p_s[keep].astype(np.int32)
            counts_capped = np.minimum(counts, MAX_POSITIONS_PER_WORD)

            # coarse position bitmask over the capped positions
            # (calculatePositionMask:144-159), OR-reduced per segment
            pk = p_s[keep]
            w = POSITIONS_BITMASK_WINDOW_SIZE
            pm = (
                np.int64(1) << (8 + (pk // w) % 56)
            ) | (np.int64(1) << (8 + ((pk + w // 2) // w) % 56))
            seg_starts_capped = np.cumsum(counts_capped) - counts_capped
            seg_mask = np.bitwise_or.reduceat(pm, seg_starts_capped)

            # WordFlags per segment: membership of the term string in the
            # doc's filename/path/repo token sets, plus the early-mention
            # Subjects bit (first occurrence within the first 8 tokens —
            # this engine's code-corpus analog of the reference's
            # SubjectLikeKeywords prominence flag)
            seg_flags = np.zeros(len(starts), dtype=np.int64)
            first_pos = p_s[starts]
            # body-only occurrence counts per segment (== counts when no
            # anchor regions): the reference's subject candidates and
            # tf-idf admission are computed from the body dld, never from
            # URL/link-text words (WordsTfIdfCounts is dld-derived)
            if ext_toks:
                is_body = (p_s <= lengths[d_s]).astype(np.int64)
                counts_body = np.add.reduceat(is_body, starts)
            else:
                counts_body = counts
            early = (first_pos <= EARLY_MENTION_POS) & (
                first_pos <= lengths[seg_doc]
            )
            if self.dict_ids is not None:
                # reference admission: a subject candidate keeps the flag
                # only when its tf-idf clears 100 (SubjectLikeKeywords)
                early = early & self._subjects_gate(
                    uniq_batch, seg_doc, seg_term, counts_body, n
                )
            seg_flags |= early * np.int64(WordFlags.SUBJECTS)
            seg_words = uniq_batch[seg_term]
            doc_seg_bounds = np.flatnonzero(
                np.diff(np.append(-1, seg_doc)) != 0
            )
            doc_seg_bounds = np.append(doc_seg_bounds, len(starts))
            for bi in range(len(doc_seg_bounds) - 1):
                a, b = doc_seg_bounds[bi], doc_seg_bounds[bi + 1]
                d = int(seg_doc[a])
                words = seg_words[a:b]
                f = np.zeros(b - a, dtype=np.int64)
                ts = self._tokens_of(titles[d])
                ps = self._tokens_of(paths[d])
                rs = self._tokens_of(repos[d])
                ns = name_like_tokens(contents[d])
                if ts:
                    f |= np.isin(words, list(ts)) * np.int64(WordFlags.TITLE)
                if ps:
                    f |= np.isin(words, list(ps)) * np.int64(WordFlags.URL_PATH)
                if rs:
                    f |= np.isin(words, list(rs)) * np.int64(WordFlags.URL_DOMAIN)
                if ns:
                    f |= np.isin(words, list(ns)) * np.int64(
                        WordFlags.NAMES_WORDS
                    )
                seg_flags[a:b] |= f

            seg_meta = (seg_flags & 0xFF) | seg_mask
            seg_tids = tids_uniq[seg_term]

        else:
            seg_doc = np.array([], dtype=np.int64)
            seg_tids = np.array([], dtype=np.int64)
            counts = np.array([], dtype=np.int64)
            counts_body = np.array([], dtype=np.int64)
            seg_meta = np.array([], dtype=np.int64)
            counts_capped = np.array([], dtype=np.int64)
            pos_vals = np.array([], dtype=np.int32)

        # --- synthetic keywords (DocumentKeywordExtractor's injected
        # non-body keywords: site:<domain>, a generator classification,
        # and mail-like artifact keywords,
        # DocumentKeywordExtractor.java:36-72 extractKeywords →
        # addAllSyntheticTerms(artifactKeywords);
        # flags=SYNTHETIC, tf=1, no positions, excluded from doc size).
        # The generator class is a deterministic function of the ordinal so
        # DuckDB oracles can recompute membership (doc_id % 7 = 3 → wiki).
        # Artifact keywords follow DocumentKeywordsBuilder.putIfAbsent
        # (addAllSyntheticTerms, DocumentKeywordsBuilder.java:185-191): a
        # keyword already present as a body term keeps its body tf/meta and
        # is NOT re-added as a synthetic segment.
        syn_flat: list[str] = []
        syn_counts = np.empty(n, dtype=np.int64)
        for i in range(n):
            syn_flat.append(f"site:{repos[i]}")
            syn_flat.append(
                "generator:wiki" if ordinals[i] % 7 == 3 else "generator:docs"
            )
            k_syn = 2
            if feat_kws is not None:
                # one synthetic special:*/category:/format: keyword per
                # set feature bit (HtmlFeature.getKeyword)
                syn_flat.extend(feat_kws[i])
                k_syn += len(feat_kws[i])
            if self.link_keywords:
                # links:<dst> + links:<top-domain> per outgoing-link
                # target (createLinkKeywords:311-314; a Set in the
                # reference, so duplicate targets and coinciding forms
                # dedup); self-links dropped, same ring derivation as
                # ranking.link_edges — the keyword set covers that edge
                # table's (src, dst) pairs, deduping the parallel
                # duplicates link_edges counts in its weight
                s = self._lk_index[repos[i]]
                nrep = len(self.registry.repos)
                span = 1 + s % 7
                nc = len(contents[i])
                seen_lk: set[str] = set()
                for j in (1, 2):
                    t = (s + 1 + (ordinals[i] * 7 + 13 * j + nc) % span) % nrep
                    if t == s:
                        continue
                    rt = self.registry.repos[t]
                    for kw in (f"links:{rt}", f"links:{rt.split('/', 1)[0]}"):
                        if kw not in seen_lk:
                            seen_lk.add(kw)
                            syn_flat.append(kw)
                            k_syn += 1
            if "@" in contents[i]:
                # putIfAbsent is against the full keyword set — body plus
                # any anchor-region terms (DocumentKeywordsBuilder:185-191)
                body = set(tok_lists[i])
                if ext_sets is not None:
                    body |= ext_sets[i]
                arts = [
                    a for a in artifact_keywords(tok_lists[i]) if a not in body
                ]
                syn_flat.extend(arts)
                k_syn += len(arts)
            syn_counts[i] = k_syn
        n_syn = len(syn_flat)
        syn_tids = self.cache.hash_many(syn_flat)
        syn_doc = np.repeat(np.arange(n, dtype=np.int64), syn_counts)
        # stable sort keeps body segments (and their position order) first
        # within each doc, so the flat pos_vals stream is unchanged
        order2 = np.argsort(
            np.concatenate([seg_doc, syn_doc]), kind="stable"
        )
        all_tids = np.concatenate([seg_tids, syn_tids])[order2]
        all_tf = np.concatenate(
            [counts, np.ones(n_syn, dtype=np.int64)]
        )[order2]
        all_meta = np.concatenate(
            [seg_meta, np.full(n_syn, int(WordFlags.SYNTHETIC), dtype=np.int64)]
        )[order2]
        all_pcnt = np.concatenate(
            [counts_capped, np.zeros(n_syn, dtype=np.int64)]
        )[order2]

        # per-doc segment counts -> list offsets
        segs_per_doc = syn_counts.copy()
        np.add.at(segs_per_doc, seg_doc, 1)
        doc_offsets = np.concatenate(
            [[0], np.cumsum(segs_per_doc)]
        ).astype(np.int32)
        pos_offsets = np.concatenate(
            [[0], np.cumsum(all_pcnt)]
        ).astype(np.int32)

        term_ids_arr = pa.ListArray.from_arrays(
            pa.array(doc_offsets), pa.array(all_tids, pa.int64())
        )
        term_tfs_arr = pa.ListArray.from_arrays(
            pa.array(doc_offsets), pa.array(all_tf.astype(np.int32), pa.int32())
        )
        term_meta_arr = pa.ListArray.from_arrays(
            pa.array(doc_offsets), pa.array(all_meta, pa.int64())
        )
        inner = pa.ListArray.from_arrays(
            pa.array(pos_offsets), pa.array(pos_vals, pa.int32())
        )
        term_pos_arr = pa.ListArray.from_arrays(pa.array(doc_offsets), inner)

        # doc-level metadata (DocumentMetadata packing): rank in bits 48-55
        # (ForwardIndexConverter.java:104-109), plus the document-bonus
        # fields, each derived deterministically so a DuckDB oracle can
        # recompute them from the documents view:
        # - asl: avg tokens per line, clamped to the 2-bit field
        # - quality: repetitiveness penalty 0..15 (16 * dup-token ratio)
        # - topology: domain id low byte (per-domain connectivity stand-in)
        # - year byte: ordinal % 30 (synthetic corpus has no pub dates)
        n_lines = np.array(
            [content.count("\n") + 1 for content in contents], dtype=np.int64
        )
        lengths64 = sizes.astype(np.int64)
        asl = np.minimum(3, lengths64 // np.maximum(n_lines, 1))
        distinct = np.zeros(n, dtype=np.int64)
        if total:
            # distinct BODY terms: quality (dup-token ratio) is a property
            # of the document text, not of injected anchor regions
            np.add.at(distinct, seg_doc[counts_body > 0], 1)
        quality = np.where(
            lengths64 > 0,
            np.minimum(15, (16 * (lengths64 - distinct)) // np.maximum(lengths64, 1)),
            0,
        )
        doc_meta = encode_document_meta(
            avg_sent_length=asl,
            rank=rank << 2,
            enc_domain_size=np.maximum(1, lengths64 // 5),
            topology=dom & 0xFF,
            year=np.asarray(ordinals, dtype=np.int64) % 30,
            quality=quality,
            flags=doc_flags,
        )

        return pa.table(
            {
                "part": pa.array(part, pa.int32()),
                "combined_id": pa.array(combined, pa.int64()),
                "document_meta": pa.array(doc_meta, pa.int64()),
                "features": pa.array(feats.astype(np.int32), pa.int32()),
                "size": pa.array(sizes, pa.int32()),
                "lang": pa.array(langs, pa.string()),
                "term_ids": term_ids_arr,
                "term_tfs": term_tfs_arr,
                "term_meta": term_meta_arr,
                "term_positions": term_pos_arr,
                "span_codes": pa.array(span_codes_col, pa.binary()),
                "spans": pa.array(spans_col, pa.list_(pa.list_(pa.int32()))),
                "repo": pa.array(repos, pa.string()),
                "path": pa.array(paths, pa.string()),
                "commit": pa.array(commits, pa.string()),
                "title": pa.array(titles, pa.string()),
                "description": pa.array(descriptions, pa.string()),
                "data_hash": pa.array(hashes, pa.string()),
            }
        )
