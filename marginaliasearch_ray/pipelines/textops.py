"""Training-data text operators over the corpus: term statistics, exact
and near deduplication, language id, quality scoring, fingerprinting.

All operators are streaming Dataset pipelines over the corpus shape
(repo, path, lang, content, ordinal).  Where an operator is checked by a
DuckDB oracle, the implementation and the SQL share one token/shingle
definition (functions/wordpattern.py) and one rounding rule (6 dp).

Reference anchors: TermFrequencyDict build (TermFrequencyDict.java:26-104
— ST1, regenerated from the corpus as a groupby-count), dataHash dedup
(IndexQueryExecution.java:512-524 — D2), EasyLSH near-dup family
(code/libraries/easy-lsh/) generalized to MinHash-LSH / SimHash /
n-gram-Jaccard as first-class pipeline operators.
"""

from __future__ import annotations

import hashlib
from collections import Counter

import numpy as np
import pyarrow as pa

from ..functions.murmur import hash_nearly_ascii
from ..functions.wordpattern import tokenize

# ---------------------------------------------------------------------------
# term statistics (TermFrequencyDict analog)


def term_df(corpus_ds):
    """(term, df) — number of documents containing each term.  Partial
    per-batch counts (pre-aggregation) feed a vocabulary-sized groupby."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch["content"].to_pylist():
            c.update(set(tokenize(t)))
        return pa.table(
            {
                "term": pa.array(list(c.keys()), pa.string()),
                "cnt": pa.array(list(c.values()), pa.int64()),
            }
        )

    return (
        corpus_ds.select_columns(["content"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("cnt", alias_name="df"))
    )


def term_df_top(corpus_ds, k: int = 100):
    return term_df(corpus_ds).sort(["df", "term"], descending=[True, False]).limit(k)


def doc_term_tf(corpus_ds):
    """(doc_id, term, tf) rows — ONE tokenize pass shared by the df
    aggregate and the per-doc tf side of the tf-idf join."""

    def rows(batch: pa.Table) -> pa.Table:
        out_doc: list[int] = []
        out_term: list[str] = []
        out_tf: list[int] = []
        for d, t in zip(batch["ordinal"].to_pylist(), batch["content"].to_pylist()):
            c = Counter(tokenize(t))
            out_doc.extend([int(d)] * len(c))
            out_term.extend(c.keys())
            out_tf.extend(c.values())
        return pa.table(
            {
                "doc_id": pa.array(out_doc, pa.int64()),
                "term": pa.array(out_term, pa.string()),
                "tf": pa.array(out_tf, pa.int64()),
            }
        )

    return corpus_ds.select_columns(["content", "ordinal"]).map_batches(
        rows, batch_format="pyarrow"
    )


def _tf_checkpoint(corpus_ds) -> str:
    """One tokenize pass into (doc_id, term, tf) rows, checkpointed to
    Parquet scratch — the corpus-sized dataset feeds a df groupby AND a
    join side, and a ``.materialize()`` would pin it in the object store
    for the pipeline's lifetime (same reasoning as
    ``_shingle_checkpoint``).  Consumers re-read it lazily."""
    import tempfile

    out = tempfile.mkdtemp(prefix="msray_tf_", dir="/tmp")
    doc_term_tf(corpus_ds).write_parquet(out)
    return out


def important_words(corpus_ds, k: int = 6, num_partitions: int = 8):
    """(doc_id, term, tfidf_r) — per-document top-k terms by tf-idf
    (DocumentKeywordExtractor.getImportantWords:92-109 analog: score by
    tf-idf, deterministic tie-break on the term, take k).

    Fully distributed: one tokenize pass into (doc_id, term, tf) rows,
    df from a groupby over the same rows, a hash-partitioned join on the
    term (the vocabulary never reaches the driver), then a per-doc
    vectorized top-k.  idf is the BM25 idf so the engine and oracle share
    one formula.
    """
    from ray.data.aggregate import Count

    from ..functions import bm25

    import ray.data as rd

    n_docs = corpus_ds.count()
    tf_ds = rd.read_parquet(_tf_checkpoint(corpus_ds))
    df_ds = tf_ds.groupby("term").aggregate(Count(alias_name="df"))
    joined = tf_ds.join(
        df_ds, join_type="inner", num_partitions=num_partitions, on=("term",)
    )

    def topk(group: pa.Table, *, k=k, n_docs=n_docs) -> pa.Table:
        terms = np.asarray(group["term"].to_pylist())
        tfs = group["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        dfs = group["df"].to_numpy(zero_copy_only=False).astype(np.float64)
        s = np.round(tfs * bm25.idf(n_docs, dfs), 6)
        order = np.lexsort((terms, -s))[:k]
        return pa.table(
            {
                "doc_id": group["doc_id"].take(order),
                "term": pa.array(terms[order], pa.string()),
                "tfidf_r": pa.array(s[order], pa.float64()),
            }
        )

    return joined.groupby("doc_id").map_groups(topk, batch_format="pyarrow")


def words_tfidf(corpus_ds, num_partitions: int = 8):
    """(doc_id, term, tfidf) — the reference's per-document tf-idf value
    for every admitted term (WordsTfIdfCounts.getTermValue,
    WordsTfIdfCounts.java:103-127): ``value(part, cnt, maxCnt) =
    (0.1 + 0.9*cnt/maxCnt) * ln(freq_part / docCount)``, a term with
    '_'-joined parts averages ``value`` over its nonempty parts (the
    whole term's cnt, each part's own dict freq), and the published
    integer is ``trunc(-75 * value)`` (normalizeValue, :118-120).
    ``freq`` = number of corpus documents containing the part
    (TermFrequencyExporter.java:106-118 per-doc set semantics), clamped
    to >= 1 (:123-126); ``docCount`` = corpus size.

    Fully distributed: one tokenize pass into (doc_id, term, tf) rows
    (shared with the df groupby), '_'-parts exploded and left-joined with
    the df table on the part (absent part -> freq 1), ``mean ln(freq/N)``
    re-aggregated per (doc_id, term), then a doc_id join against the
    per-doc max tf.  The vocabulary never reaches the driver."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Max, Mean

    import ray.data as rd

    n_docs = corpus_ds.count()
    tf_ds = rd.read_parquet(_tf_checkpoint(corpus_ds))
    df_ds = tf_ds.groupby("term").aggregate(Count(alias_name="df"))

    def rename_part(batch: pa.Table) -> pa.Table:
        return pa.table({"part": batch["term"], "df": batch["df"]})

    df_ds = df_ds.map_batches(rename_part, batch_format="pyarrow")
    mx_ds = tf_ds.groupby("doc_id").aggregate(Max("tf", alias_name="max_tf"))

    def explode_parts(batch: pa.Table) -> pa.Table:
        terms = batch["term"].combine_chunks()
        sp = pc.split_pattern(terms, "_")
        flat = pc.list_flatten(sp)
        par = pc.list_parent_indices(sp)
        # StringUtils.split drops empty strings (leading/trailing/double
        # '_'); a token always has a leading alnum run, so every term
        # keeps at least one part
        keep = pc.not_equal(flat, "")
        flat = flat.filter(keep)
        par = par.filter(keep)
        return pa.table(
            {
                "doc_id": batch["doc_id"].take(par),
                "term": terms.take(par),
                "tf": batch["tf"].take(par),
                "part": flat,
            }
        )

    parts_ds = tf_ds.map_batches(explode_parts, batch_format="pyarrow")
    j = parts_ds.join(
        df_ds, join_type="left_outer", num_partitions=num_partitions,
        on=("part",),
    )

    def lnf(batch: pa.Table, *, n_docs=n_docs) -> pa.Table:
        freq = np.maximum(
            pc.fill_null(batch["df"], 1).to_numpy(zero_copy_only=False), 1
        ).astype(np.float64)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "term": batch["term"],
                "tf": batch["tf"],
                "lnf": pa.array(np.log(freq / float(n_docs)), pa.float64()),
            }
        )

    g = (
        j.map_batches(lnf, batch_format="pyarrow")
        .groupby(["doc_id", "term"])
        .aggregate(Mean("lnf", alias_name="mlnf"), Max("tf", alias_name="tf"))
    )
    j2 = g.join(
        mx_ds, join_type="inner", num_partitions=num_partitions,
        on=("doc_id",),
    )

    def finish(batch: pa.Table) -> pa.Table:
        tf = batch["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        mx = batch["max_tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        mlnf = batch["mlnf"].to_numpy(zero_copy_only=False)
        v = -75.0 * (0.1 + 0.9 * tf / mx) * mlnf
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "term": batch["term"],
                "tfidf": pa.array(np.trunc(v).astype(np.int64), pa.int64()),
            }
        )

    return j2.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# exact dedup (hash-partitioned, first doc per content hash)


def exact_dedup(corpus_ds):
    """(data_hash, doc_id) — the minimum ordinal per sha256(content);
    groupby on the hash is the distributed hash-partition + per-group
    first pattern."""
    from ray.data.aggregate import Min

    def with_hash(batch: pa.Table) -> pa.Table:
        hs = [
            hashlib.sha256(t.encode("utf-8")).hexdigest()
            for t in batch["content"].to_pylist()
        ]
        return pa.table(
            {
                "data_hash": pa.array(hs, pa.string()),
                "ordinal": batch["ordinal"],
            }
        )

    return (
        corpus_ds.select_columns(["content", "ordinal"])
        .map_batches(with_hash, batch_format="pyarrow")
        .groupby("data_hash")
        .aggregate(Min("ordinal", alias_name="doc_id"))
    )


def _topn_per_key(keys: np.ndarray, hs: np.ndarray, ords: np.ndarray,
                  n: int) -> np.ndarray:
    """Indices of the n smallest (hash, ordinal) rows per key —
    vectorized group-rank over one lexsort."""
    if len(keys) == 0:
        return np.empty(0, dtype=np.int64)
    order = np.lexsort((ords, hs, keys))
    ks = keys[order]
    new_grp = np.r_[True, ks[1:] != ks[:-1]]
    grp_id = np.cumsum(new_grp) - 1
    starts = np.flatnonzero(new_grp)
    rank = np.arange(len(ks)) - starts[grp_id]
    return order[rank < n]


def sample_per_key(corpus_ds, key: str = "lang", n: int = 50):
    """Stratified deterministic sample — balanced data mixing for
    training pipelines: the n docs with the smallest (sha256(content),
    ordinal) per key.  Two-level top-n: each batch keeps at most n rows
    per key it contains (combiner), then a per-key group merge re-ranks
    the partials — raw documents never shuffle and no group ever holds
    more than n rows per upstream batch."""

    def partial(batch: pa.Table) -> pa.Table:
        ks = np.asarray(batch[key].to_pylist(), dtype=str)
        hs = np.asarray(
            [
                hashlib.sha256(t.encode("utf-8")).hexdigest()
                for t in batch["content"].to_pylist()
            ],
            dtype=str,
        )
        ords = batch["ordinal"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        sel = _topn_per_key(ks, hs, ords, n)
        return pa.table(
            {
                key: pa.array(ks[sel].tolist(), pa.string()),
                "h": pa.array(hs[sel].tolist(), pa.string()),
                "doc_id": pa.array(ords[sel], pa.int64()),
            }
        )

    def final(group: pa.Table) -> pa.Table:
        ks = np.asarray(group[key].to_pylist(), dtype=str)
        hs = np.asarray(group["h"].to_pylist(), dtype=str)
        ords = group["doc_id"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        sel = _topn_per_key(ks, hs, ords, n)
        return pa.table(
            {
                key: pa.array(ks[sel].tolist(), pa.string()),
                "doc_id": pa.array(ords[sel], pa.int64()),
            }
        )

    return (
        corpus_ds.select_columns([key, "content", "ordinal"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(key)
        .map_groups(final, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# language id + quality scoring (SQL-expressible heuristics)

LANG_MARKERS: list[tuple[str, tuple[str, ...]]] = [
    ("de", ("und", "der", "das", "nicht")),
    ("en", ("the", "a", "of", "to")),
    ("es", ("el", "los", "una", "y")),
    ("fr", ("le", "les", "une", "est")),
]

STOPWORDS = ("the", "a", "of", "to", "and", "in")


def lang_id(corpus_ds):
    """(doc_id, lang_pred) — argmax of per-language marker-token counts,
    first language in LANG_MARKERS order wins ties; 'und' when no marker
    occurs.  Deliberately simple so the oracle SQL mirrors it exactly."""

    def pred(batch: pa.Table) -> pa.Table:
        out = []
        for t in batch["content"].to_pylist():
            toks = tokenize(t)
            best_lang, best_n = "und", 0
            for lang, markers in LANG_MARKERS:
                n = sum(1 for w in toks if w in markers)
                if n > best_n:
                    best_lang, best_n = lang, n
            out.append(best_lang)
        return pa.table(
            {
                "doc_id": batch["ordinal"].cast(pa.int64()),
                "lang_pred": pa.array(out, pa.string()),
            }
        )

    return corpus_ds.select_columns(["content", "ordinal"]).map_batches(
        pred, batch_format="pyarrow"
    )


def quality_scores(corpus_ds):
    """(doc_id, n_tokens, uniq_ratio_r, stop_ratio_r) — simple quality
    signals, rounded to 6 dp."""

    def score(batch: pa.Table) -> pa.Table:
        n_toks, uniq_r, stop_r = [], [], []
        for t in batch["content"].to_pylist():
            toks = tokenize(t)
            n = len(toks)
            n_toks.append(n)
            if n:
                uniq_r.append(round(len(set(toks)) / n, 6))
                stop_r.append(round(sum(1 for w in toks if w in STOPWORDS) / n, 6))
            else:
                uniq_r.append(0.0)
                stop_r.append(0.0)
        return pa.table(
            {
                "doc_id": batch["ordinal"].cast(pa.int64()),
                "n_tokens": pa.array(n_toks, pa.int64()),
                "uniq_ratio_r": pa.array(uniq_r, pa.float64()),
                "stop_ratio_r": pa.array(stop_r, pa.float64()),
            }
        )

    return corpus_ds.select_columns(["content", "ordinal"]).map_batches(
        score, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# fingerprints

def simhash64(corpus_ds):
    """(doc_id, simhash) — 64-bit SimHash over tokens weighted by tf,
    bit-hash = keyword murmur hash.  Deterministic; exact SQL oracle
    since round 5 (per-token hash tabulated as a literal table, bit
    votes replicated in HUGEINT arithmetic — see
    ``__ray_entry__._simhash_sql``)."""

    def fp(batch: pa.Table) -> pa.Table:
        out = []
        for t in batch["content"].to_pylist():
            c = Counter(tokenize(t))
            acc = np.zeros(64, dtype=np.int64)
            for w, tf in c.items():
                h = np.uint64(hash_nearly_ascii(w) & ((1 << 64) - 1))
                bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
                acc += np.where(bits.astype(bool), tf, -tf)
            sh = 0
            for b in range(64):
                if acc[b] > 0:
                    sh |= 1 << b
            out.append(sh - (1 << 64) if sh >= (1 << 63) else sh)
        return pa.table(
            {
                "doc_id": batch["ordinal"].cast(pa.int64()),
                "simhash": pa.array(out, pa.int64()),
            }
        )

    return corpus_ds.select_columns(["content", "ordinal"]).map_batches(
        fp, batch_format="pyarrow"
    )


def token_counts(corpus_ds):
    """(doc_id, ws_tokens, word_tokens) — whitespace-split token count vs
    the admission-filtered wordpattern token count (the 'BPE-ish regex'
    counting a training pipeline budgets with)."""

    def count(batch: pa.Table) -> pa.Table:
        ws, wp = [], []
        for t in batch["content"].to_pylist():
            ws.append(len(t.split()))
            wp.append(len(tokenize(t)))
        return pa.table(
            {
                "doc_id": batch["ordinal"].cast(pa.int64()),
                "ws_tokens": pa.array(ws, pa.int64()),
                "word_tokens": pa.array(wp, pa.int64()),
            }
        )

    return corpus_ds.select_columns(["content", "ordinal"]).map_batches(
        count, batch_format="pyarrow"
    )


# PII-ish feature patterns (RE2 syntax — shared verbatim by the
# pyarrow.compute kernel and the DuckDB oracle, both RE2-backed)
PII_PATTERNS: dict[str, str] = {
    "emails": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "urls": r"https?://[A-Za-z0-9./_%+#?&=-]+",
    "ipv4s": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def pii_counts(corpus_ds):
    """(doc_id, emails, urls, ipv4s) — per-document counts of PII-ish
    patterns a training-data pipeline filters or redacts on.  Fully
    vectorized: one ``pyarrow.compute.count_substring_regex`` kernel per
    pattern over the Arrow string column (no Python row loop)."""
    import pyarrow.compute as pc

    def count(batch: pa.Table) -> pa.Table:
        cols = {"doc_id": batch["ordinal"].cast(pa.int64())}
        for name, pat in PII_PATTERNS.items():
            cols[name] = pc.count_substring_regex(
                batch["content"], pat
            ).cast(pa.int64())
        return pa.table(cols)

    return corpus_ds.select_columns(["content", "ordinal"]).map_batches(
        count, batch_format="pyarrow"
    )


def export_shards(corpus_ds, out_dir: str, num_shards: int = 16):
    """Dedup + deterministic sharded export — the OUTPUT stage of a
    training-data pipeline: exact-dedup by sha256(content) (min doc_id
    wins), assign ``shard = doc_id % num_shards``, write one parquet
    directory per shard (never one giant file), and return the per-shard
    summary (shard, n_docs, n_bytes) read back from the written files.

    Commit protocol (the index phases' pattern): the write lands first,
    then an ``export`` manifest is committed; a crash mid-write leaves NO
    manifest, so readers and re-runs can tell a partial export from a
    complete one.  A re-run over a committed ``out_dir`` skips the write
    entirely (resume); it clears uncommitted partial output before
    rewriting.  The manifest marks completeness, not input identity —
    use a fresh ``out_dir`` for a different corpus.

    Streaming end-to-end: the dedup is a hash-partitioned groupby on the
    content hash, the winner row is chosen inside each group, and the
    write is Ray Data's partitioned parquet sink."""
    import shutil

    from ..state import manifest as mf

    def with_hash(batch: pa.Table) -> pa.Table:
        hs = [
            hashlib.sha256(t.encode("utf-8")).hexdigest()
            for t in batch["content"].to_pylist()
        ]
        return pa.table(
            {
                "data_hash": pa.array(hs, pa.string()),
                "ordinal": batch["ordinal"].cast(pa.int64()),
                "content": batch["content"],
            }
        )

    def first_wins(group: pa.Table) -> pa.Table:
        i = int(
            np.argmin(group["ordinal"].to_numpy(zero_copy_only=False))
        )
        row = group.slice(i, 1)
        doc_id = row["ordinal"].cast(pa.int64())
        return pa.table(
            {
                "doc_id": doc_id,
                "shard": pc_mod(doc_id, num_shards),
                "data_hash": row["data_hash"],
                "n_bytes": pa.array(
                    [len(row["content"][0].as_py().encode("utf-8"))],
                    pa.int64(),
                ),
                "content": row["content"],
            }
        )

    if not mf.is_committed(out_dir, "export"):
        shutil.rmtree(out_dir, ignore_errors=True)  # uncommitted partials
        (
            corpus_ds.select_columns(["content", "ordinal"])
            .map_batches(with_hash, batch_format="pyarrow")
            .groupby("data_hash")
            .map_groups(first_wins, batch_format="pyarrow")
            .write_parquet(out_dir, partition_cols=["shard"])
        )
        mf.commit_manifest(
            out_dir,
            "export",
            {"num_shards": num_shards, "files": mf.list_phase_files(out_dir, "")},
        )
    import ray.data as rd

    summary = (
        rd.read_parquet(out_dir, columns=["shard", "n_bytes"])
        .map_batches(
            lambda b: pa.table(
                {
                    "shard": pc_cast_i64(b["shard"]),
                    "n_bytes": b["n_bytes"],
                }
            ),
            batch_format="pyarrow",
        )
        .groupby("shard")
        .map_groups(
            lambda g: pa.table(
                {
                    "shard": g["shard"].slice(0, 1),
                    "n_docs": pa.array([len(g)], pa.int64()),
                    "n_bytes": pa.array(
                        [
                            int(
                                np.sum(
                                    g["n_bytes"].to_numpy(
                                        zero_copy_only=False
                                    )
                                )
                            )
                        ],
                        pa.int64(),
                    ),
                }
            ),
            batch_format="pyarrow",
        )
    )
    return summary


def export_sample(
    corpus_ds,
    out_dir: str,
    size: int = 4,
    min_docs: int = 2,
    max_docs: int = 5000,
    seed: int = 0,
    name: str = "sample",
):
    """Seeded sample-of-domains export — the SampleDataExporter analog
    (code/processes/export-task-process/.../SampleDataExporter.java:
    36-100): domains whose document counts land in [min_docs, max_docs]
    enter the pool (the reference skips too-small / too-big crawl-log
    parcels), a seeded shuffle picks ``size`` of them
    (Collections.shuffle → the browse pipelines' deterministic
    sha256("{seed}:{domain}") order so the oracle can replay the pick),
    and the picked domains' documents are written one parquet directory
    per domain (``dom=<pick index>``, the tar-of-parcels analog —
    resumable per domain, never one giant file) plus a committed
    manifest {"description": name, "type": "CRAWL_DATA"} mirroring the
    reference's manifest.json.

    Returns the per-domain (repo, n_docs) summary read back from the
    WRITTEN files, repo-sorted.  Re-runs over a committed ``out_dir``
    skip the write; uncommitted partials are cleared first (the
    export_shards commit protocol)."""
    import shutil

    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    from ..state import manifest as mf
    from .browse import shuffle_key

    if not mf.is_committed(out_dir, "export"):
        shutil.rmtree(out_dir, ignore_errors=True)  # uncommitted partials
        counts = (
            corpus_ds.select_columns(["repo"]).groupby("repo").count()
        ).take_all()  # |domains|-bounded: the in-RAM domain list
        pool = [
            r["repo"]
            for r in counts
            if min_docs <= int(r["count()"]) <= max_docs
        ]
        picked = sorted(pool, key=lambda d: shuffle_key(seed, d))[:size]
        dom_of = {r: i for i, r in enumerate(picked)}
        dom_ref = ray.put(dom_of)

        def pick(batch: pa.Table) -> pa.Table:
            m = ray.get(dom_ref)
            keep = pc.is_in(
                batch["repo"], value_set=pa.array(list(m), pa.string())
            )
            sub = batch.filter(keep)
            doms = [m[r] for r in sub["repo"].to_pylist()]
            return sub.append_column("dom", pa.array(doms, pa.int64()))

        (
            corpus_ds.map_batches(pick, batch_format="pyarrow")
            .write_parquet(out_dir, partition_cols=["dom"])
        )
        mf.commit_manifest(
            out_dir,
            "export",
            {
                "description": name,
                "type": "CRAWL_DATA",
                "seed": seed,
                "domains": picked,
                "files": mf.list_phase_files(out_dir, ""),
            },
        )

    summary = (
        rd.read_parquet(out_dir, columns=["repo"])
        .groupby("repo")
        .count()
    ).take_all()
    return pa.table(
        {
            "repo": pa.array(sorted(r["repo"] for r in summary), pa.string()),
            "n_docs": pa.array(
                [
                    int(r["count()"])
                    for r in sorted(summary, key=lambda r: r["repo"])
                ],
                pa.int64(),
            ),
        }
    )


def pc_mod(arr: pa.ChunkedArray | pa.Array, m: int) -> pa.Array:
    vals = (
        arr.to_numpy(zero_copy_only=False)
        if not isinstance(arr, pa.ChunkedArray)
        else arr.combine_chunks().to_numpy(zero_copy_only=False)
    )
    return pa.array(vals % m, pa.int64())


def pc_cast_i64(arr) -> pa.Array:
    import pyarrow.compute as pc

    return pc.cast(arr, pa.int64())


def artifact_terms(corpus_ds):
    """(doc_id, keyword) — one row per artifact keyword the document's
    token stream yields (ArtifactKeywords.java:20-44: mail-like tokens
    expand to full address + domain forms + user part, minus the ignore
    lists).  The same extractor the journal stage injects as synthetic
    keywords; exposed standalone so the driver oracle exercises it over a
    corpus that actually contains mail-like tokens."""
    from ..functions.wordpattern import artifact_keywords

    def extract(batch: pa.Table) -> pa.Table:
        doc_ids: list[int] = []
        kws: list[str] = []
        for did, t in zip(
            batch["ordinal"].to_pylist(), batch["content"].to_pylist()
        ):
            for kw in artifact_keywords(tokenize(t)):
                doc_ids.append(did)
                kws.append(kw)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "keyword": pa.array(kws, pa.string()),
            }
        )

    return corpus_ds.select_columns(["content", "ordinal"]).map_batches(
        extract, batch_format="pyarrow"
    )


# Winnowing fingerprint parameters (Schleimer et al., "Winnowing: Local
# Algorithms for Document Fingerprinting", SIGMOD 2003): k-gram rolling
# hashes, min per w-window.  The hash is a positional char polynomial so
# a DuckDB oracle can recompute it exactly (murmur is not SQL-expressible).
WINNOW_K = 3
WINNOW_W = 4
_WINNOW_TOK_P = 1_000_003
_WINNOW_B = 131
_WINNOW_P = 1_000_000_007


def _tokval(w: str) -> int:
    return sum(ord(c) * (i + 1) for i, c in enumerate(w)) % _WINNOW_TOK_P


def winnow_fingerprints(corpus_ds, k: int = WINNOW_K, w: int = WINNOW_W):
    """(doc_id, fp) — distinct winnowing fingerprints per document:
    k-gram rolling hashes over token values, minimum per sliding window
    of w hashes.  Deterministic, SQL-reproducible document fingerprinting
    (rolling-hash family)."""
    from numpy.lib.stride_tricks import sliding_window_view

    assert k == 3, "rolling hash unrolled for k=3"

    def fp(batch: pa.Table) -> pa.Table:
        out_doc, out_fp = [], []
        # per-batch token-value cache: Zipfian vocab makes most lookups hits
        cache: dict[str, int] = {}
        for d, t in zip(batch["ordinal"].to_pylist(), batch["content"].to_pylist()):
            toks = tokenize(t)
            if len(toks) < k + w - 1:
                continue
            def tv_of(x: str) -> int:
                v = cache.get(x)
                if v is None:  # 'or' would recompute hash-0 tokens forever
                    v = cache[x] = _tokval(x)
                return v

            tv = np.fromiter(
                (tv_of(x) for x in toks), dtype=np.int64, count=len(toks)
            )
            kh = (
                tv[:-2] * (_WINNOW_B * _WINNOW_B) + tv[1:-1] * _WINNOW_B + tv[2:]
            ) % _WINNOW_P
            mins = np.unique(sliding_window_view(kh, w).min(axis=1))
            out_doc.extend([int(d)] * len(mins))
            out_fp.extend(mins.tolist())
        return pa.table(
            {
                "doc_id": pa.array(out_doc, pa.int64()),
                "fp": pa.array(out_fp, pa.int64()),
            }
        )

    return corpus_ds.select_columns(["content", "ordinal"]).map_batches(
        fp, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# near-dup: n-gram shingle Jaccard (exact) and MinHash-LSH (scale path)

SHINGLE_N = 3


def shingles_of(toks: list[str]) -> set[str]:
    return {
        " ".join(toks[i : i + SHINGLE_N]) for i in range(len(toks) - SHINGLE_N + 1)
    }


# A shingle (or LSH band bucket) shared by more than this many documents
# emits an O(n) doc-id CHAIN instead of O(n^2) all-pairs (stop-shingle
# rule: one hot shingle — a license header — would otherwise explode).
# The chain preserves connectivity for clusters of true NEAR-DUPLICATES
# (consecutive members of an all-alike group verify at ~1.0 Jaccard), but
# it is still lossy in general: chain-adjacent docs of a hot-but-diverse
# group can fail verification, so a pair whose every shared shingle is
# hot may go unreported and components may split.  Hot groups are logged
# per task.
STOP_SHINGLE_DF = 1024


def shingle_sets(corpus_ds):
    """(doc_id, sh: sorted unique shingle hashes, n_sh) — the per-document
    shingle-set Dataset every near-dup verifier joins against (no
    driver-side materialization)."""

    def rows(batch: pa.Table) -> pa.Table:
        ids, shs, ns = [], [], []
        for d, t in zip(batch["ordinal"].to_pylist(), batch["content"].to_pylist()):
            h = np.sort(
                np.fromiter(
                    (hash_nearly_ascii(s) for s in shingles_of(tokenize(t))),
                    dtype=np.int64,
                )
            )
            ids.append(int(d))
            # packed as a binary blob: Acero hash joins reject list-typed
            # payload columns, binary passes through untouched
            shs.append(h.tobytes())
            ns.append(len(h))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "sh": pa.array(shs, pa.binary()),
                "n_sh": pa.array(ns, pa.int64()),
            }
        )

    return corpus_ds.select_columns(["content", "ordinal"]).map_batches(
        rows, batch_format="pyarrow"
    )


def _shingle_checkpoint(corpus_ds) -> str:
    """ONE tokenize+shingle pass, checkpointed to Parquet scratch.

    The per-document shingle-set dataset feeds candidate generation AND
    both verification join sides, so it must be reusable without
    re-tokenizing the corpus.  A ``.materialize()`` would pin a
    corpus-sized derived dataset in the object store for the whole
    pipeline lifetime (a full second copy at 100 TB, all of it churning
    through spill); the Parquet checkpoint streams to disk once and each
    consumer re-reads just the columns it needs via projection pushdown.
    Returns the checkpoint directory (scratch under /tmp; callers'
    datasets stay lazy over it, so it is not deleted here)."""
    import tempfile

    out = tempfile.mkdtemp(prefix="msray_shingles_", dir="/tmp")
    shingle_sets(corpus_ds).write_parquet(out)
    return out


def _read_sets(ckpt_dir: str):
    import ray.data as rd

    return rd.read_parquet(ckpt_dir, columns=["doc_id", "sh"])


def _explode_sets(batch: pa.Table) -> pa.Table:
    """(doc_id, sh blob) rows -> exploded (doc_id, shingle) rows — one
    vectorized decode, no re-tokenization of the corpus."""
    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    blobs = batch["sh"].to_pylist()
    lens = np.array([len(b) // 8 for b in blobs], dtype=np.int64)
    flat = (
        np.frombuffer(b"".join(blobs), dtype=np.int64)
        if lens.sum()
        else np.empty(0, dtype=np.int64)
    )
    return pa.table(
        {
            "doc_id": pa.array(np.repeat(ids, lens), pa.int64()),
            "shingle": pa.array(flat, pa.int64()),
        }
    )


def _verify_pairs(cand_pairs, sets_ds, threshold: float, num_partitions: int = 8):
    """Distributed exact verification: join candidate pairs with each
    side's shingle set (two hash-partitioned joins), then compute the true
    Jaccard per pair with sorted-array intersections — the whole corpus
    never leaves the cluster."""

    def a_side(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_a": batch["doc_id"], "sh_a": batch["sh"]})

    def b_side(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_b": batch["doc_id"], "sh_b": batch["sh"]})

    joined = cand_pairs.join(
        sets_ds.map_batches(a_side, batch_format="pyarrow"),
        join_type="inner",
        num_partitions=num_partitions,
        on=("doc_a",),
    ).join(
        sets_ds.map_batches(b_side, batch_format="pyarrow"),
        join_type="inner",
        num_partitions=num_partitions,
        on=("doc_b",),
    )

    def verify(batch: pa.Table, *, threshold=threshold) -> pa.Table:
        # Batched intersection counts: dense-rank every shingle value in
        # the batch, compose (pair_idx, rank) into one int64 key, one
        # stable sort — adjacent equal keys from opposite sides are the
        # intersections (values are unique within each side, so a key
        # occurs at most twice).  No per-pair Python loop.
        n = len(batch)
        if n == 0:
            return pa.table(
                {
                    "doc_a": pa.array([], pa.int64()),
                    "doc_b": pa.array([], pa.int64()),
                    "jaccard_r": pa.array([], pa.float64()),
                }
            )
        blobs_a = batch["sh_a"].to_pylist()
        blobs_b = batch["sh_b"].to_pylist()
        la = np.array([len(x) // 8 for x in blobs_a], dtype=np.int64)
        lb = np.array([len(x) // 8 for x in blobs_b], dtype=np.int64)
        va = np.frombuffer(b"".join(blobs_a), dtype=np.int64)
        vb = np.frombuffer(b"".join(blobs_b), dtype=np.int64)
        allv = np.concatenate([va, vb])
        allp = np.concatenate([np.repeat(np.arange(n), la), np.repeat(np.arange(n), lb)])
        side = np.concatenate(
            [np.zeros(len(va), np.int8), np.ones(len(vb), np.int8)]
        )
        inter = np.zeros(n, dtype=np.int64)
        if len(allv):
            uniq, inv = np.unique(allv, return_inverse=True)
            # pair_idx * (#distinct values + 1) + rank: pairs-per-batch x
            # distinct-shingles-per-batch stays far below 2**63
            key = allp * np.int64(len(uniq) + 1) + inv
            order = np.argsort(key, kind="stable")
            k_s = key[order]
            s_s = side[order]
            match = (k_s[1:] == k_s[:-1]) & (s_s[1:] != s_s[:-1])
            np.add.at(inter, allp[order][1:][match], 1)
        union = la + lb - inter
        with np.errstate(invalid="ignore", divide="ignore"):
            j = np.where(union > 0, inter / np.maximum(union, 1), 0.0)
        keep = (la > 0) & (lb > 0) & (j >= threshold)
        return pa.table(
            {
                "doc_a": batch["doc_a"].combine_chunks().take(np.flatnonzero(keep)),
                "doc_b": batch["doc_b"].combine_chunks().take(np.flatnonzero(keep)),
                "jaccard_r": pa.array(np.round(j[keep], 6), pa.float64()),
            }
        )

    return joined.map_batches(verify, batch_format="pyarrow")


def ngram_jaccard_pairs(corpus_ds, threshold: float = 0.5, strict_exact: bool = False):
    """(doc_a, doc_b, jaccard_r) — pairs with 3-gram shingle Jaccard >=
    threshold; EXACT whenever no shingle exceeds STOP_SHINGLE_DF (hot
    shingles degrade to a connectivity chain — see the constant's note).
    ``strict_exact=True`` (the oracle-checked driver path) raises instead
    of chaining so regime divergence fails loudly.

    Distributed shape: explode (shingle, doc) -> groupby(shingle) ->
    per-group candidate pairs (df-capped by STOP_SHINGLE_DF) -> distinct
    pairs -> exact verification via two hash-partitioned joins against the
    per-doc shingle sets.  No driver-side materialization anywhere; pair
    volume is bounded per shingle.
    """
    from ray.data.aggregate import Count

    # ONE tokenize+shingle pass, checkpointed to Parquet (see
    # _shingle_checkpoint): candidate generation and both verification
    # join sides re-read it with pruned columns instead of pinning a
    # corpus-sized materialization in the object store
    ckpt = _shingle_checkpoint(corpus_ds)
    sets_ds = _read_sets(ckpt)

    def add_coarse(batch: pa.Table) -> pa.Table:
        g = batch["shingle"].to_numpy(zero_copy_only=False) % COARSE_GROUPS
        return batch.append_column("gb", pa.array(g, pa.int32()))

    import functools

    candidates = (
        sets_ds.map_batches(_explode_sets, batch_format="pyarrow")
        .map_batches(add_coarse, batch_format="pyarrow")
        .groupby("gb")  # coarse: every contained shingle bucket pairs
        .map_groups(   # in ONE vectorized call (see COARSE_GROUPS note)
            functools.partial(_shingle_pairs_multi, strict=strict_exact),
            batch_format="pyarrow",
        )
        .groupby(["doc_a", "doc_b"])
        .aggregate(Count(alias_name="nsh"))
        .select_columns(["doc_a", "doc_b"])
    )
    return _verify_pairs(candidates, sets_ds, threshold)


# Candidate generation groups by a COARSE hash of the bucket key (this
# many groups per groupby) and emits every contained bucket's pairs in
# one vectorized call — grouping by the raw bucket key instead would
# dispatch a Python map_groups call per bucket (hundreds of thousands of
# near-singleton buckets; measured ~2x the whole pipeline's cost at
# bench scale).  Scale note: a coarse group holds (#rows / COARSE)
# rows; raise COARSE proportionally on a large cluster.
COARSE_GROUPS = 256


def _pairs_of_buckets_impl(
    key_cols: list[np.ndarray], docs: np.ndarray, label: str, strict: bool
) -> pa.Table:
    """All-pairs (df-capped, hot buckets degrade to chains) for MANY
    buckets at once.  ``key_cols`` identify each row's bucket; pairs are
    emitted per bucket with one lexsort + a loop over DISTINCT bucket
    sizes (equal-size buckets share one triu gather)."""
    empty = pa.table(
        {
            "doc_a": pa.array([], pa.int64()),
            "doc_b": pa.array([], pa.int64()),
        }
    )
    if len(docs) == 0:
        return empty
    order = np.lexsort((docs, *reversed(key_cols)))
    d_s = docs[order]
    k_s = [k[order] for k in key_cols]
    keep = np.ones(len(d_s), dtype=bool)  # distinct (bucket, doc)
    diff_key = np.zeros(len(d_s) - 1, dtype=bool)
    for k in k_s:
        diff_key |= k[1:] != k[:-1]
    keep[1:] = diff_key | (d_s[1:] != d_s[:-1])
    d_s = d_s[keep]
    # bucket boundaries on the deduped rows
    k_d = [k[keep] for k in k_s]
    newb = np.ones(len(d_s), dtype=bool)
    acc = np.zeros(max(len(d_s) - 1, 0), dtype=bool)
    for k in k_d:
        acc |= k[1:] != k[:-1]
    newb[1:] = acc
    starts = np.flatnonzero(newb)
    sizes = np.diff(np.append(starts, len(d_s)))

    out_a: list[np.ndarray] = []
    out_b: list[np.ndarray] = []
    hot = sizes > STOP_SHINGLE_DF
    if hot.any():
        if strict:
            # oracle-checked runs fail LOUDLY instead of silently
            # diverging from the exact all-pairs oracle (the chain regime
            # is lossy; an exact-vs-chain mismatch must not surface as a
            # value diff)
            raise RuntimeError(
                f"hot {label} with {int(sizes[hot].max())} docs exceeds"
                f" STOP_SHINGLE_DF={STOP_SHINGLE_DF}: the engine would"
                " enter the lossy chain regime while the exact oracle"
                " stays all-pairs; rerun with strict_exact=False to"
                " accept the documented chain degrade"
            )
        for s0, sz in zip(starts[hot], sizes[hot]):
            # stop rule: O(n) connectivity chain instead of O(n^2) pairs
            print(
                f"[near-dup] hot {label} with {sz} docs"
                f" (> {STOP_SHINGLE_DF}): emitting an O(n) chain of"
                f" candidate pairs instead of all pairs"
            )
            out_a.append(d_s[s0 : s0 + sz - 1])
            out_b.append(d_s[s0 + 1 : s0 + sz])
    ok = (~hot) & (sizes >= 2)
    for sz in np.unique(sizes[ok]):
        sel = starts[ok & (sizes == sz)]
        mat = d_s[sel[:, None] + np.arange(sz)]
        ai, bi = np.triu_indices(int(sz), k=1)
        out_a.append(mat[:, ai].ravel())
        out_b.append(mat[:, bi].ravel())
    if not out_a:
        return empty
    return pa.table(
        {
            "doc_a": pa.array(np.concatenate(out_a), pa.int64()),
            "doc_b": pa.array(np.concatenate(out_b), pa.int64()),
        }
    )


def _shingle_pairs_multi(group: pa.Table, strict: bool = False) -> pa.Table:
    return _pairs_of_buckets_impl(
        [group["shingle"].to_numpy(zero_copy_only=False)],
        group["doc_id"].to_numpy(zero_copy_only=False),
        "shingle",
        strict,
    )


def _band_pairs_multi(group: pa.Table, strict: bool = False) -> pa.Table:
    return _pairs_of_buckets_impl(
        [
            group["band"].to_numpy(zero_copy_only=False),
            group["bh"].to_numpy(zero_copy_only=False),
        ],
        group["doc_id"].to_numpy(zero_copy_only=False),
        "LSH band bucket",
        strict,
    )


def _pairs_of_group(group: pa.Table) -> pa.Table:
    return _shingle_pairs_multi(group)


def _pairs_of_group_strict(group: pa.Table) -> pa.Table:
    return _shingle_pairs_multi(group, strict=True)


def near_dup_components(
    corpus_ds,
    threshold: float = 0.5,
    max_rounds: int = 16,
    strict_exact: bool = False,
    num_partitions: int | None = None,
):
    """(doc_id, component) — connected components over the exact
    near-dup pair graph (shingle Jaccard >= threshold), computed with
    iterative min-label propagation: each round joins labels across
    edges and takes the per-node min (groupby), until a fixpoint.
    Rounds are bounded by the graph diameter; each round is one shuffle.
    Singleton documents are their own component."""
    import pyarrow.compute as pc
    import ray
    import ray.data
    from ray.data.aggregate import Min

    if num_partitions is None:
        # the per-round label join repartitions the corpus-cardinality
        # label table — size it to the cluster, not a constant (a fixed 4
        # would serialize the shuffle at scale)
        num_partitions = max(8, int(ray.cluster_resources().get("CPU", 8)))

    pairs = ngram_jaccard_pairs(
        corpus_ds, threshold, strict_exact=strict_exact
    ).materialize()
    # undirected edge list, both directions
    def both_dirs(batch: pa.Table) -> pa.Table:
        a = batch["doc_a"]
        b = batch["doc_b"]
        return pa.table(
            {
                "src": pa.concat_arrays([a.combine_chunks(), b.combine_chunks()]),
                "dst": pa.concat_arrays([b.combine_chunks(), a.combine_chunks()]),
            }
        )

    edges = pairs.map_batches(both_dirs, batch_format="pyarrow").materialize()

    def ids_only(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["ordinal"].cast(pa.int64()),
                "component": batch["ordinal"].cast(pa.int64()),
            }
        )

    labels = (
        corpus_ds.select_columns(["ordinal"])
        .map_batches(ids_only, batch_format="pyarrow")
        .materialize()
    )

    for _ in range(max_rounds):
        # propagate: neighbor labels flow across edges, then per-node min
        prev = labels
        joined = edges.join(
            labels.map_batches(
                lambda b: b.rename_columns(["src", "label"]),
                batch_format="pyarrow",
            ),
            join_type="inner",
            num_partitions=num_partitions,
            on=("src",),
        )
        candidate = joined.map_batches(
            lambda b: pa.table(
                {"doc_id": b["dst"], "component": b["label"]}
            ),
            batch_format="pyarrow",
        )
        labels = (
            labels.union(candidate)
            .groupby("doc_id")
            .aggregate(Min("component", alias_name="component"))
            .materialize()
        )
        # fixpoint check: label sums decrease monotonically, so equal
        # sums mean convergence (a scalar aggregate, not a materialize)
        from ray.data.aggregate import Sum as _Sum

        s_prev = prev.aggregate(_Sum("component"))["sum(component)"]
        s_new = labels.aggregate(_Sum("component"))["sum(component)"]
        if s_prev == s_new:
            break
    return labels


# MinHash-LSH --------------------------------------------------------------

NUM_PERM = 128
LSH_BANDS = 64  # 64 bands x 2 rows: P(candidate | j) = 1-(1-j^2)^64
# Mersenne prime 2^31-1: keeps a*x+b products within uint64 (no modmul needed)
_MERS_P = (1 << 31) - 1


def _perm_coeffs(seed: int = 1234) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERS_P, size=NUM_PERM, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, _MERS_P, size=NUM_PERM, dtype=np.int64).astype(np.uint64)
    return a, b


def minhash_signatures(corpus_ds):
    """(doc_id, sig: list<int64>) — 128-perm MinHash over 3-gram shingle
    hashes (universal hashing a*x+b mod 2^61-1, vectorized)."""
    a, b = _perm_coeffs()

    def sig(batch: pa.Table) -> pa.Table:
        ids, sigs = [], []
        for d, t in zip(batch["ordinal"].to_pylist(), batch["content"].to_pylist()):
            sh = shingles_of(tokenize(t))
            ids.append(int(d))
            if not sh:
                sigs.append([0] * NUM_PERM)
                continue
            x = np.array(
                [hash_nearly_ascii(s) for s in sh], dtype=np.int64
            ).astype(np.uint64)[:, None]
            # (a*x + b) mod p with x,a,b < 2^31: products fit in uint64
            xr = x % np.uint64(_MERS_P)
            vals = (xr * a + b) % np.uint64(_MERS_P)
            sigs.append(vals.min(axis=0).astype(np.int64).tolist())
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "sig": pa.array(sigs, pa.list_(pa.int64())),
            }
        )

    return corpus_ds.select_columns(["content", "ordinal"]).map_batches(
        sig, batch_format="pyarrow"
    )


def minhash_lsh_pairs(
    corpus_ds, threshold: float = 0.5, strict_exact: bool = False
):
    """(doc_a, doc_b, jaccard_r) — MinHash-LSH candidates (banding) with
    exact shingle-Jaccard verification.  With 64 bands x 2 rows the miss
    probability at j=0.5 is (1-0.25)^64 ~ 1e-8, so the verified output
    matches the exact ngram_jaccard_pairs oracle in practice — except for
    band buckets larger than STOP_SHINGLE_DF, which degrade to an O(n)
    connectivity chain like the exact pipeline (``strict_exact=True``
    raises instead, so oracle-checked runs fail loudly)."""
    from ray.data.aggregate import Count

    rows_per_band = NUM_PERM // LSH_BANDS
    a, b = _perm_coeffs()

    # ONE tokenize+shingle pass, checkpointed to Parquet (see
    # _shingle_checkpoint): signatures derive from the compact
    # shingle-hash blobs, which also serve both verification join sides
    ckpt = _shingle_checkpoint(corpus_ds)
    sets_ds = _read_sets(ckpt)

    def band_rows(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        n = len(ids)
        sig = np.zeros((n, NUM_PERM), dtype=np.int64)
        for i, blob in enumerate(batch["sh"].to_pylist()):
            if not blob:
                continue
            x = np.frombuffer(blob, dtype=np.int64).astype(np.uint64)[:, None]
            xr = x % np.uint64(_MERS_P)
            sig[i] = ((xr * a + b) % np.uint64(_MERS_P)).min(axis=0).astype(
                np.int64
            )
        sig = sig.reshape(n, LSH_BANDS, rows_per_band)
        bh = np.zeros((n, LSH_BANDS), dtype=np.int64)
        for r in range(rows_per_band):
            bh = bh * np.int64(1000003) + sig[:, :, r]
        band_id = np.tile(np.arange(LSH_BANDS, dtype=np.int64), n)
        flat_bh = bh.reshape(-1)
        coarse = (flat_bh * np.int64(1000003) + band_id) % COARSE_GROUPS
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, LSH_BANDS), pa.int64()),
                "band": pa.array(band_id, pa.int64()),
                "bh": pa.array(flat_bh, pa.int64()),
                "gb": pa.array(coarse, pa.int32()),
            }
        )

    import functools

    candidates = (
        sets_ds.map_batches(band_rows, batch_format="pyarrow")
        .groupby("gb")  # coarse: every contained (band, bh) bucket pairs
        .map_groups(   # in ONE vectorized call (see COARSE_GROUPS note)
            functools.partial(_band_pairs_multi, strict=strict_exact),
            batch_format="pyarrow",
        )
        .groupby(["doc_a", "doc_b"])
        .aggregate(Count(alias_name="nbands"))
        .select_columns(["doc_a", "doc_b"])
    )
    return _verify_pairs(candidates, sets_ds, threshold)
