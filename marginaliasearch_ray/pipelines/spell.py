"""Spell correction: the assistant's SymSpell symmetric-delete checker
over a corpus-derived frequency dictionary.

Reference semantics (``/root/reference/``):

- ``code/functions/math/java/nu/marginalia/functions/math/dict/
  SpellChecker.java:19-21`` — ``correct(word)`` = SymSpell suggestions
  sorted by edit distance ascending (stable over the lookup's
  count-descending order).
- ``third-party/symspell/src/main/java/symspell/SymSpell.java`` — the
  vendored engine: ``editDistanceMax=2``, ``verbose=1`` (all
  suggestions of the smallest edit distance, :36-40); dictionary terms
  come from ``parseWords`` = lowercased runs of ``[\\w-[\\d_]]+``
  (:77-88).  NOTE: Java character classes treat nested ``[...]`` as
  UNION (class subtraction is .NET syntax), so the class is
  ``\\w ∪ '-' ∪ \\d ∪ '_'`` — i.e. ``[a-z0-9_-]+`` after lowering;
  digits, underscores and hyphens stay INSIDE tokens (verified by
  compiling the pattern in Java: "foo-bar abc123 under_score" →
  [foo-bar][abc123][under_score]); the index maps every delete variant
  (depth <= 2, ``Edits:210-227``) of every dictionary word back to the
  word; ``Lookup:229-384`` explores delete variants of the INPUT in
  BFS order with min-distance pruning and scores candidates with TRUE
  Damerau-Levenshtein distance (the H-matrix with the DA table,
  ``DamerauLevenshteinDistance:397-438`` — transpositions may span
  later edits, unlike optimal-string-alignment); the early-exit
  ``input.length() - editDistanceMax > maxlength`` (:232) returns
  nothing for over-long inputs.

The pruning in ``Lookup`` is an optimization, not a semantics change
(every term at the final minimal distance is reachable through a
delete chain of depth <= that distance, which the pruner never skips),
so the CONTRACT this module implements and the SQL oracle checks is:

    suggestions(input) = { term in dictionary :
                           DL(input, term) = d_min and d_min <= 2 }

ordered count-descending (Java breaks count ties in discovery order —
nondeterministic hash iteration; we pin term-ascending).

Ray-Data-first decomposition: the dictionary build is one tokenizing
``map_batches`` with per-batch partial counts + a vocabulary-sized
``groupby(term)`` (raw documents never shuffle); the deletes index is a
distributed flat-map over the vocabulary (``Σ len²`` keys per term)
collected to sorted arrays — the vocabulary is the in-RAM small side,
exactly the reference's assumption (its TermFrequencyDict and the
whole SymSpell index live in one process's heap).  Lookups are
vectorized ``searchsorted`` probes over the sorted key array.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

EDIT_DISTANCE_MAX = 2  # SymSpell.java:36
# parseWords over lowered text (:83): Java [\w-[\d_]]+ = \w ∪ - ∪ \d ∪ _
_WORD_RE = re.compile(r"[a-z0-9_-]+")


def parse_words(text: str) -> list[str]:
    return _WORD_RE.findall(text.lower())


def word_deletes(word: str, max_dist: int = EDIT_DISTANCE_MAX) -> set[str]:
    """All delete variants of ``word`` with 1..max_dist characters
    removed — SymSpell.Edits:210-227 (words of length 1 produce none)."""
    out: set[str] = set()
    frontier = {word}
    for _ in range(max_dist):
        nxt = set()
        for w in frontier:
            if len(w) <= 1:  # Edits only recurses while length > 1
                continue
            for i in range(len(w)):
                d = w[:i] + w[i + 1:]
                if d not in out:
                    out.add(d)
                    nxt.add(d)
        frontier = nxt
    return out


def damerau_levenshtein(a: str, b: str) -> int:
    """TRUE Damerau-Levenshtein distance — a faithful port of the
    H-matrix algorithm SymSpell vendors (:397-438), transpositions
    allowed to interact with other edits (('ca','abc') == 2, where
    optimal-string-alignment would say 3)."""
    if a == b:
        return 0
    inf = len(a) + len(b) + 1
    h = np.zeros((len(a) + 2, len(b) + 2), dtype=np.int64)
    h[0, :] = inf
    h[:, 0] = inf
    h[1, 1:] = np.arange(len(b) + 1)
    h[1:, 1] = np.arange(len(a) + 1)
    da: dict[str, int] = {}
    for ch in a:
        da.setdefault(ch, 0)
    for ch in b:
        da.setdefault(ch, 0)
    for i in range(1, len(a) + 1):
        db = 0
        for j in range(1, len(b) + 1):
            i1 = da[b[j - 1]]
            j1 = db
            d = 1
            if a[i - 1] == b[j - 1]:
                d = 0
                db = j
            h[i + 1, j + 1] = min(
                h[i, j] + d,
                h[i + 1, j] + 1,
                h[i, j + 1] + 1,
                h[i1, j1] + (i - i1 - 1) + 1 + (j - j1 - 1),
            )
        da[a[i - 1]] = i
    return int(h[len(a) + 1, len(b) + 1])


def spell_dictionary(corpus_ds, text_column: str = "text"):
    """(term, cnt) frequency dictionary from a documents Dataset — the
    CreateDictionary corpus pass (:176-195) as per-batch partial counts
    + a vocabulary-sized groupby."""
    from ray.data.aggregate import Sum

    def _partial(batch: pa.Table) -> pa.Table:
        terms: list[str] = []
        for t in batch[text_column].to_pylist():
            terms.extend(parse_words(t or ""))
        if not terms:
            return pa.table(
                {"term": pa.array([], pa.string()),
                 "cnt": pa.array([], pa.int64())}
            )
        uniq, cnt = np.unique(np.asarray(terms, dtype=object),
                              return_counts=True)
        return pa.table(
            {
                "term": pa.array(uniq.tolist(), pa.string()),
                "cnt": pa.array(cnt, pa.int64()),
            }
        )

    return (
        corpus_ds.select_columns([text_column])
        .map_batches(_partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("cnt", alias_name="cnt"))
    )


class SpellIndex:
    """The symmetric-delete index: every delete variant (and the word
    itself) maps back to the dictionary words that produce it.  Held as
    sorted key / word-id arrays for vectorized searchsorted probes —
    the vocabulary-scale in-RAM small side."""

    def __init__(self, words: list[str], counts: np.ndarray,
                 keys: np.ndarray, key_word_ids: np.ndarray):
        self.words = np.asarray(words, dtype=object)
        self.counts = np.asarray(counts, dtype=np.int64)
        self.keys = keys
        self.key_word_ids = key_word_ids
        self.maxlength = max((len(w) for w in words), default=0)

    @classmethod
    def build(cls, dictionary, max_dist: int = EDIT_DISTANCE_MAX):
        """``dictionary``: Dataset or pyarrow Table with (term, cnt).
        The delete fan-out runs distributed (flat-map over vocabulary
        batches); the collected pairs are vocabulary-bounded."""
        import ray.data

        if isinstance(dictionary, pa.Table):
            dictionary = ray.data.from_arrow(dictionary)
        else:
            # Both the fan-out and the dtab collection below consume the
            # dictionary; without this the lazy upstream (full corpus
            # tokenize + vocabulary groupby) would execute twice.
            dictionary = dictionary.materialize()

        def _fanout(batch: pa.Table) -> pa.Table:
            keys, terms = [], []
            for t in batch["term"].to_pylist():
                keys.append(t)  # the word maps to itself
                terms.append(t)
                for d in word_deletes(t, max_dist):
                    keys.append(d)
                    terms.append(t)
            return pa.table(
                {
                    "key": pa.array(keys, pa.string()),
                    "term": pa.array(terms, pa.string()),
                }
            )

        pairs = dictionary.map_batches(_fanout, batch_format="pyarrow")
        empty_pairs = pa.table(
            {"key": pa.array([], pa.string()),
             "term": pa.array([], pa.string())}
        )
        empty_dict = pa.table(
            {"term": pa.array([], pa.string()),
             "cnt": pa.array([], pa.int64())}
        )
        # concat_tables rejects zero inputs — an empty corpus (no word
        # runs at all) must yield an empty index, not a crash
        pbatches = list(pairs.iter_batches(batch_format="pyarrow"))
        ptab = pa.concat_tables(pbatches) if pbatches else empty_pairs
        dbatches = list(dictionary.iter_batches(batch_format="pyarrow"))
        dtab = (
            pa.concat_tables(dbatches).select(["term", "cnt"])
            if dbatches
            else empty_dict
        )
        words = [str(w) for w in dtab["term"].to_pylist()]
        order = np.argsort(np.asarray(words, dtype=object))
        words_sorted = [words[i] for i in order]
        counts_sorted = dtab["cnt"].to_numpy(zero_copy_only=False)[order]
        wid = {w: i for i, w in enumerate(words_sorted)}
        pkeys = np.asarray(ptab["key"].to_pylist(), dtype=object)
        pids = np.fromiter(
            (wid[t] for t in ptab["term"].to_pylist()),
            dtype=np.int64,
            count=ptab.num_rows,
        )
        korder = np.argsort(pkeys, kind="stable")
        return cls(
            words_sorted, counts_sorted, pkeys[korder], pids[korder]
        )

    def save(self, path: str) -> None:
        import pyarrow.parquet as pq

        pq.write_table(
            pa.table(
                {
                    "key": pa.array(self.keys.tolist(), pa.string()),
                    "word_id": pa.array(self.key_word_ids, pa.int64()),
                }
            ),
            f"{path}.keys.parquet",
        )
        pq.write_table(
            pa.table(
                {
                    "word": pa.array(self.words.tolist(), pa.string()),
                    "cnt": pa.array(self.counts, pa.int64()),
                }
            ),
            f"{path}.words.parquet",
        )

    @classmethod
    def load(cls, path: str) -> "SpellIndex":
        import pyarrow.parquet as pq

        kt = pq.read_table(f"{path}.keys.parquet")
        wt = pq.read_table(f"{path}.words.parquet")
        return cls(
            [str(w) for w in wt["word"].to_pylist()],
            wt["cnt"].to_numpy(zero_copy_only=False),
            np.asarray(kt["key"].to_pylist(), dtype=object),
            kt["word_id"].to_numpy(zero_copy_only=False),
        )

    def _candidate_ids(self, probes: list[str]) -> np.ndarray:
        if len(self.keys) == 0 or not probes:
            return np.empty(0, dtype=np.int64)
        p = np.asarray(probes, dtype=object)
        lo = np.searchsorted(self.keys, p, side="left")
        hi = np.searchsorted(self.keys, p, side="right")
        ids = [self.key_word_ids[a:b] for a, b in zip(lo, hi)]
        return np.unique(np.concatenate(ids)) if ids else np.empty(
            0, dtype=np.int64
        )

    def correct(
        self, word: str, max_dist: int = EDIT_DISTANCE_MAX
    ) -> list[tuple[str, int, int]]:
        """All dictionary terms at the minimal true-DL distance
        (<= max_dist) from ``word``: [(term, count, distance)] ordered
        count desc, term asc.  Over-long inputs return nothing
        (SymSpell.Lookup:232)."""
        word = word.lower()
        if len(word) - max_dist > self.maxlength:
            return []
        probes = [word, *word_deletes(word, max_dist)]
        out = []
        for wi in self._candidate_ids(probes):
            term = str(self.words[wi])
            d = damerau_levenshtein(word, term)
            if d <= max_dist:
                out.append((term, int(self.counts[wi]), d))
        if not out:
            return []
        dmin = min(d for _t, _c, d in out)
        kept = [r for r in out if r[2] == dmin]
        kept.sort(key=lambda r: (-r[1], r[0]))
        return kept

    def correct_many(
        self, words: list[str], max_dist: int = EDIT_DISTANCE_MAX
    ) -> pa.Table:
        """(input, term, cnt, dist) rows for every input word."""
        ins, terms, cnts, dists = [], [], [], []
        for w in words:
            for term, cnt, d in self.correct(w, max_dist):
                ins.append(w)
                terms.append(term)
                cnts.append(cnt)
                dists.append(d)
        return pa.table(
            {
                "input": pa.array(ins, pa.string()),
                "term": pa.array(terms, pa.string()),
                "cnt": pa.array(cnts, pa.int64()),
                "dist": pa.array(dists, pa.int64()),
            }
        )
