"""Corpus sources: deterministic synthetic source-code corpus (FIXTURES.md
F1) and the adapter that derives a corpus from the driver's ``documents``
test table.

The synthetic generator exists for unit tests and throughput benchmarks;
the documents adapter exists so that driver correctness oracles can be
expressed as DuckDB SQL over the pre-registered ``documents`` view.
"""

from __future__ import annotations

import hashlib
import random

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

LANGS = ["py", "java", "js", "c", "md"]
LANG_WEIGHTS = [0.35, 0.2, 0.2, 0.15, 0.1]

# deliberately ultra-high-df terms to exercise skew/salting
HOT_TERMS = ["license", "import", "copyright", "the", "return"]


def _make_vocab(rng: random.Random, n: int = 2000) -> list[str]:
    stems = [
        "parse", "tree", "node", "visit", "token", "index", "query", "merge",
        "hash", "score", "rank", "batch", "shard", "span", "term", "doc",
        "read", "write", "buffer", "stream", "cache", "pool", "lock", "queue",
    ]
    vocab = []
    for i in range(n):
        a = rng.choice(stems)
        b = rng.choice(stems)
        style = i % 4
        if style == 0:
            vocab.append(f"{a}_{b}")
        elif style == 1:
            vocab.append(f"{a}{b.capitalize()}".lower())
        elif style == 2:
            vocab.append(f"{a}.{b}")
        else:
            vocab.append(f"{a}{i % 97}")
    return vocab


def synthesize_corpus(
    n_repos: int = 8,
    files_per_repo: int = 25,
    seed: int = 42,
    dup_fraction: float = 0.05,
    non_ascii_fraction: float = 0.02,
) -> pa.Table:
    """Deterministic synthetic (repo, path, commit, lang, content [, ordinal])
    table with a Zipf-ish term distribution, hot skew terms, per-file
    unique rare terms (df=1 posting lists), duplicated content across
    repos (content-hash dedup), and a non-ASCII sprinkle."""
    rng = random.Random(seed)
    vocab = _make_vocab(rng)
    zipf_w = [1.0 / (i + 1) for i in range(len(vocab))]

    rows = {k: [] for k in ("repo", "path", "commit", "lang", "content", "ordinal")}
    dup_pool: list[str] = []
    for r in range(n_repos):
        repo = f"org{r % 3:04d}/repo{r:04d}"
        for f in range(files_per_repo):
            lang = rng.choices(LANGS, LANG_WEIGHTS)[0]
            path = f"src/mod{f % 5}/file_{f:03d}.{lang}"
            commit = hashlib.sha1(f"{repo}@{seed}".encode()).hexdigest() * 2
            commit = commit[:40]

            if dup_pool and rng.random() < dup_fraction:
                content = rng.choice(dup_pool)
            else:
                n_lines = rng.randrange(5, 30)
                lines = [f"// {rng.choice(HOT_TERMS)} {rng.choice(HOT_TERMS)}"]
                for _ in range(n_lines):
                    words = rng.choices(vocab, zipf_w, k=rng.randrange(3, 9))
                    if rng.random() < 0.6:
                        words.insert(0, rng.choice(HOT_TERMS))
                    lines.append(" ".join(words))
                # per-file unique identifier -> a guaranteed df=1 term
                lines.append(f"uniq_{r}_{f}_token")
                if rng.random() < non_ascii_fraction:
                    lines.append("naïve_schlüssel π_value")
                content = "\n".join(lines)
                if rng.random() < 0.3:
                    dup_pool.append(content)

            rows["repo"].append(repo)
            rows["path"].append(path)
            rows["commit"].append(commit)
            rows["lang"].append(lang)
            rows["content"].append(content)
            rows["ordinal"].append(f)

    return pa.table(
        {
            "repo": pa.array(rows["repo"], pa.string()),
            "path": pa.array(rows["path"], pa.string()),
            "commit": pa.array(rows["commit"], pa.string()),
            "lang": pa.array(rows["lang"], pa.string()),
            "content": pa.array(rows["content"], pa.string()),
            "ordinal": pa.array(rows["ordinal"], pa.int32()),
        }
    )


def write_corpus(table: pa.Table, path: str) -> str:
    pq.write_table(table, path)
    return path


def documents_corpus_dataset(sf_dir: str):
    """Corpus Dataset derived from the driver's documents table:
    repo := source, path := 'doc_<doc_id>', lang := lang, content := text,
    ordinal := doc_id (globally unique, < 2^26 at test scales).

    The mapping is pure column arithmetic so DuckDB oracles can recreate
    it exactly from the ``documents`` view.
    """
    import pyarrow.compute as pc
    import ray.data

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang", "source"]
    )

    def adapt(batch: pa.Table) -> pa.Table:
        doc_id = batch["doc_id"]
        commit = pc.utf8_rpad(pc.cast(doc_id, pa.string()), 40, padding="0")
        return pa.table(
            {
                "repo": batch["source"],
                "path": pc.binary_join_element_wise(
                    pa.array(["doc_"] * len(batch), pa.string()),
                    pc.cast(doc_id, pa.string()),
                    "",
                ),
                "commit": commit,
                "lang": batch["lang"],
                "content": batch["text"],
                "ordinal": pc.cast(doc_id, pa.int32()),
            }
        )

    return ds.map_batches(adapt, batch_format="pyarrow")
