"""Typeahead suggestions: the assistant service's prefix-search
completion API over a corpus-derived scored dictionary.

Reference semantics (``/root/reference/``):

- ``code/services-core/assistant-service/java/nu/marginalia/assistant/
  suggest/Suggestions.java`` — two suggestion dictionaries are loaded
  (files of ``count,phrase`` lines; :38-89): entries kept when
  ``cnt > 1`` (:55), surrounding quotes stripped (:59-61), trailing
  periods stripped (:64-66), link-extraction junk dropped
  (``click here`` / ``new window`` / ``click to`` / ``share `` —
  :69-76), and ``length > 3`` (:78).  ``getSuggestions(count, word)``
  lowercases, strips leading spaces, returns nothing under
  ``MIN_SUGGEST_LENGTH = 3`` (:24,92-101); results from both
  structures are merged, sorted score-descending and deduplicated by
  word (:104-131; ties are hash-iteration order — we pin word-asc,
  and the cross-structure dedup keeps the higher score).
- ``PrefixSearchStructure.java`` — every word is indexed under its
  1..8-char prefixes (:49-56), its 9..16-char prefixes (:58-65), and,
  for multi-word entries, ``"t:" + term`` prefixes to depth 8 for each
  space-separated term of length >= 2 (:67-80).  ``getTopCompletions``
  (:99-158): direct bucket for prefixes <= 8; the long index for
  9..16; longer prefixes probe the 16-char bucket and filter
  candidates by the full prefix (:132-141); a ``t:`` prefix switches
  to the term index (:106-111).  All paths return the top-k by score
  (:159-282).

The reference's query-time scan caps (1000 candidates / 100 matches,
:338-343,:360) are load-shedding, not semantics.  The CONTRACT this
module implements and the SQL oracle checks is::

    suggest(prefix, k) = top-k by (score desc, word asc) of
        { word in dict : word startswith prefix }           (normal)
        { word in dict : ' ' in word and any space-separated
          term of word startswith prefix }                  ("t:")

with ``dict`` = per-word max score across both structures, exact for
``k <= top_k_cap`` (buckets deeper than SHORT_PREFIX_LENGTH are kept
uncapped, mirroring the reference's uncapped TIntArrayList buckets —
they are near-unique by 9+ chars).

Ray-Data-first decomposition: the dictionary is the spell module's
per-batch partial counts + vocabulary groupby (one pass emits unigrams
AND adjacent-bigram phrases — the two reference dictionary files'
analog); the prefix index is a distributed fan-out (word -> its <= 8+8
prefix keys + t: term keys) with per-batch partial top-cap combiners
before a ``groupby(prefix)`` re-rank, so no bucket's full posting ever
converges on one worker beyond the cap.  Serving is vectorized
searchsorted probes over sorted (prefix, score desc, word) arrays.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .spell import parse_words

MIN_SUGGEST_LENGTH = 3  # Suggestions.java:24
SHORT_PREFIX_LENGTH = 8  # PrefixSearchStructure.java:19
MAX_INDEXED_PREFIX_LENGTH = 16  # PrefixSearchStructure.java:20
TOP_K_CAP = 64  # exactness bound for served k (our scale knob)

# Suggestions.loadSuggestions:69-76 — junk dropped during load
_JUNK_PREFIXES = ("click here", "share ")
_JUNK_SUBSTRINGS = ("new window", "click to")


def clean_suggestion(word: str, cnt: int) -> str | None:
    """Suggestions.loadSuggestions:55-80 cleaning for one entry; None
    when the entry is dropped."""
    if cnt <= 1:
        return None
    if word.startswith('"') and word.endswith('"') and len(word) >= 2:
        word = word[1:-1]
    while word.endswith("."):
        word = word[:-1]
    for p in _JUNK_PREFIXES:
        if word.startswith(p):
            return None
    for s in _JUNK_SUBSTRINGS:
        if s in word:
            return None
    if len(word) <= 3:
        return None
    return word


def suggest_dictionary(corpus_ds, text_column: str = "text"):
    """(word, score) Dataset: lowercased unigram terms AND adjacent
    bigram phrases ("a b") with occurrence counts — the two reference
    suggestion files' corpus-derived analog, one tokenize pass.  The
    loadSuggestions cleaning (cnt > 1, len > 3, junk filters) applies
    to both; score = per-word max across the two sources (the merge
    dedup keeps the higher-scored copy, Suggestions.java:120-127)."""
    from ray.data.aggregate import Max, Sum

    def _partial(batch: pa.Table) -> pa.Table:
        grams: list[str] = []
        for t in batch[text_column].to_pylist():
            toks = parse_words(t or "")
            grams.extend(toks)
            grams.extend(
                f"{a} {b}" for a, b in zip(toks, toks[1:])
            )
        if not grams:
            return pa.table(
                {"word": pa.array([], pa.string()),
                 "cnt": pa.array([], pa.int64())}
            )
        uniq, cnt = np.unique(
            np.asarray(grams, dtype=object), return_counts=True
        )
        return pa.table(
            {
                "word": pa.array(uniq.tolist(), pa.string()),
                "cnt": pa.array(cnt, pa.int64()),
            }
        )

    def _clean(batch: pa.Table) -> pa.Table:
        words, scores = [], []
        cnts = batch["cnt"].to_numpy(zero_copy_only=False)
        for w, c in zip(batch["word"].to_pylist(), cnts):
            kept = clean_suggestion(str(w), int(c))
            if kept is not None:
                words.append(kept)
                scores.append(int(c))
        return pa.table(
            {
                "word": pa.array(words, pa.string()),
                "score": pa.array(scores, pa.int64()),
            }
        )

    return (
        corpus_ds.select_columns([text_column])
        .map_batches(_partial, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .map_batches(_clean, batch_format="pyarrow")
        # cleaning can re-alias entries (quote/period strips);
        # per-word max = the reference's cross-structure merge dedup
        .groupby("word")
        .aggregate(Max("score", alias_name="score"))
    )


def _prefix_rows(
    words: list[str], scores: np.ndarray
) -> tuple[list[str], list[str], list[int]]:
    """Fan one (word, score) batch out to its index rows — the
    indexPrefix:49-80 key set."""
    pfx: list[str] = []
    out_w: list[str] = []
    out_s: list[int] = []
    for w, s in zip(words, scores):
        s = int(s)
        keys: set[str] = set()
        for i in range(1, min(len(w), MAX_INDEXED_PREFIX_LENGTH) + 1):
            keys.add(w[:i])
        if " " in w:
            # duplicate terms in a phrase are deduped here (Java keeps
            # the duplicate bucket entries and dedups at query merge;
            # one row per (prefix, word) is the same served contract
            # and keeps cap slots meaningful)
            for term in w.split():
                if len(term) >= 2:
                    for i in range(
                        1, min(len(term), SHORT_PREFIX_LENGTH) + 1
                    ):
                        keys.add("t:" + term[:i])
        for key in keys:
            pfx.append(key)
            out_w.append(w)
            out_s.append(s)
    return pfx, out_w, out_s


def _cap_bucket_rows(
    pfx: np.ndarray, words: np.ndarray, scores: np.ndarray, cap: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Sort rows by (prefix asc, score desc, word asc) and keep the
    first ``cap`` per bucket — EXCEPT the two filter-candidate bucket
    families, which stay whole so the filtered paths remain exact:
    normal keys of exactly MAX_INDEXED_PREFIX_LENGTH chars (probed and
    filtered for >16-char queries) and ``t:`` keys at full term depth
    ("t:" + 8 chars, filtered for term prefixes > 8).  Every other
    bucket is only ever served directly, where cap >= k keeps the
    top-k exact.  Deep buckets are near-unique, so leaving them
    uncapped costs O(vocab) rows, not O(vocab * cap)."""
    if len(pfx) == 0:
        return pfx, words, scores
    order = np.lexsort((words, -scores, pfx))
    pfx, words, scores = pfx[order], words[order], scores[order]
    starts = np.flatnonzero(
        np.concatenate(([True], pfx[1:] != pfx[:-1]))
    )
    group_id = np.cumsum(
        np.concatenate(([0], (pfx[1:] != pfx[:-1]).astype(np.int64)))
    )
    rank = np.arange(len(pfx)) - starts[group_id]
    plen = np.fromiter((len(p) for p in pfx), dtype=np.int64,
                       count=len(pfx))
    is_term = np.fromiter(
        (p.startswith("t:") for p in pfx), dtype=bool, count=len(pfx)
    )
    keep_whole = (
        (~is_term) & (plen == MAX_INDEXED_PREFIX_LENGTH)
    ) | (is_term & (plen == SHORT_PREFIX_LENGTH + 2))
    keep = keep_whole | (rank < cap)
    return pfx[keep], words[keep], scores[keep]


def build_suggest_index(dictionary, top_k_cap: int = TOP_K_CAP):
    """Distributed prefix-index build: fan-out + per-batch partial
    top-cap combiner + groupby(prefix) re-rank.  Returns a pyarrow
    Table (prefix, word, score) sorted by (prefix, score desc, word) —
    vocabulary-scale, the serving small side."""
    import ray.data

    if isinstance(dictionary, pa.Table):
        dictionary = ray.data.from_arrow(dictionary)

    def _fanout(batch: pa.Table) -> pa.Table:
        words = [str(w) for w in batch["word"].to_pylist()]
        scores = batch["score"].to_numpy(zero_copy_only=False)
        pfx, w, s = _prefix_rows(words, scores)
        p, w, s = _cap_bucket_rows(
            np.asarray(pfx, dtype=object),
            np.asarray(w, dtype=object),
            np.asarray(s, dtype=np.int64),
            top_k_cap,
        )
        return pa.table(
            {
                "prefix": pa.array(p.tolist(), pa.string()),
                "word": pa.array(w.tolist(), pa.string()),
                "score": pa.array(s, pa.int64()),
            }
        )

    def _rerank(group: pa.Table) -> pa.Table:
        p = np.asarray(group["prefix"].to_pylist(), dtype=object)
        w = np.asarray(group["word"].to_pylist(), dtype=object)
        s = group["score"].to_numpy(zero_copy_only=False)
        p, w, s = _cap_bucket_rows(p, w, s, top_k_cap)
        return pa.table(
            {
                "prefix": pa.array(p.tolist(), pa.string()),
                "word": pa.array(w.tolist(), pa.string()),
                "score": pa.array(s, pa.int64()),
            }
        )

    parts = list(
        dictionary.map_batches(_fanout, batch_format="pyarrow")
        .groupby("prefix")
        .map_groups(_rerank, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    )
    if not parts:
        return pa.table(
            {
                "prefix": pa.array([], pa.string()),
                "word": pa.array([], pa.string()),
                "score": pa.array([], pa.int64()),
            }
        )
    tab = pa.concat_tables(parts)
    p = np.asarray(tab["prefix"].to_pylist(), dtype=object)
    w = np.asarray(tab["word"].to_pylist(), dtype=object)
    s = tab["score"].to_numpy(zero_copy_only=False)
    order = np.lexsort((w, -s, p))
    return pa.table(
        {
            "prefix": pa.array(p[order].tolist(), pa.string()),
            "word": pa.array(w[order].tolist(), pa.string()),
            "score": pa.array(s[order], pa.int64()),
        }
    )


class SuggestIndex:
    """Serving handle over the built (prefix, word, score) table —
    sorted arrays + searchsorted probes (the Suggestions service holds
    the same structures in RAM)."""

    def __init__(self, table: pa.Table):
        self.prefixes = np.asarray(
            table["prefix"].to_pylist(), dtype=object
        )
        self.words = np.asarray(table["word"].to_pylist(), dtype=object)
        self.scores = table["score"].to_numpy(zero_copy_only=False)

    @classmethod
    def build(cls, dictionary, top_k_cap: int = TOP_K_CAP):
        return cls(build_suggest_index(dictionary, top_k_cap))

    def save(self, path: str) -> None:
        import pyarrow.parquet as pq

        pq.write_table(
            pa.table(
                {
                    "prefix": pa.array(self.prefixes.tolist(), pa.string()),
                    "word": pa.array(self.words.tolist(), pa.string()),
                    "score": pa.array(self.scores, pa.int64()),
                }
            ),
            f"{path}.suggest.parquet",
        )

    @classmethod
    def load(cls, path: str) -> "SuggestIndex":
        import pyarrow.parquet as pq

        return cls(pq.read_table(f"{path}.suggest.parquet"))

    def _bucket(self, key: str) -> tuple[np.ndarray, np.ndarray]:
        lo = np.searchsorted(self.prefixes, key, side="left")
        hi = np.searchsorted(self.prefixes, key, side="right")
        return self.words[lo:hi], self.scores[lo:hi]

    def suggest(self, search_word: str, k: int = 10):
        """[(word, score)] — getSuggestions:92-101 +
        getTopCompletions:99-158 dispatch; rows come back already
        (score desc, word asc) from the index sort."""
        p = search_word.lower().lstrip(" ")
        # the length gate applies to the WHOLE search word INCLUDING a
        # "t:" marker (getSuggestionsForKeyword re-checks after strip/
        # lower, :104-110); only getTopCompletions strips "t:", so
        # "t:ab" is a valid 2-char term search
        if len(p) < MIN_SUGGEST_LENGTH:
            return []
        term_search = p.startswith("t:") and len(p) > 2
        if term_search:
            p = p[2:]
        if term_search:
            key = "t:" + p[:SHORT_PREFIX_LENGTH]
            w, s = self._bucket(key)
            if len(p) > SHORT_PREFIX_LENGTH:
                keep = np.fromiter(
                    (
                        any(t.startswith(p) for t in word.split())
                        for word in w
                    ),
                    dtype=bool,
                    count=len(w),
                )
                w, s = w[keep], s[keep]
        elif len(p) <= MAX_INDEXED_PREFIX_LENGTH:
            w, s = self._bucket(p)
        else:
            w, s = self._bucket(p[:MAX_INDEXED_PREFIX_LENGTH])
            keep = np.fromiter(
                (word.startswith(p) for word in w),
                dtype=bool,
                count=len(w),
            )
            w, s = w[keep], s[keep]
        out = []
        seen = set()
        for word, score in zip(w, s):
            if word not in seen:
                seen.add(word)
                out.append((str(word), int(score)))
            if len(out) >= k:
                break
        return out

    def suggest_many(self, inputs: list[str], k: int = 10) -> pa.Table:
        """(input, word, score) rows for every input."""
        ins, words, scores = [], [], []
        for q in inputs:
            for word, score in self.suggest(q, k):
                ins.append(q)
                words.append(word)
                scores.append(score)
        return pa.table(
            {
                "input": pa.array(ins, pa.string()),
                "word": pa.array(words, pa.string()),
                "score": pa.array(scores, pa.int64()),
            }
        )
