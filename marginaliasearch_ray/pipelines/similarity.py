"""Similarity search over embedding columns (list<float>).

- ``ann_topk``: brute-force cosine top-k against a broadcast query matrix
  (numpy matmul per batch) — the exact baseline.
- ``top_similar_pairs``: all-pairs blocked cosine (each batch multiplied
  against the broadcast normalized matrix) with a global top-k — exact.
- ``lsh_ann_topk``: random-hyperplane LSH bucketing as the 10^12-row
  scale path (bucket by sign pattern, search only matching buckets) —
  approximate, so it carries no SQL oracle.

All math is float64 (embeddings are float32 on disk; cast up exactly) so
that DuckDB's ``list_cosine_similarity(a::DOUBLE[], b::DOUBLE[])``
reproduces the rounded values.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _batch_matrix(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = batch["vec_id"].to_numpy(zero_copy_only=False)
    col = batch["embedding"].combine_chunks()
    off = np.asarray(col.offsets)
    vals = np.asarray(col.values, dtype=np.float64)
    dim = off[1] - off[0]
    mat = vals[off[0] : off[-1]].reshape(len(ids), int(dim))
    return ids, mat


def _cosine(mat: np.ndarray, q: np.ndarray) -> np.ndarray:
    num = mat @ q
    den = np.linalg.norm(mat, axis=1) * np.linalg.norm(q)
    return num / den


def query_vector(sf_dir: str, vec_id: int = 0) -> np.ndarray:
    import pyarrow.parquet as pq
    import pyarrow.compute as pc

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    row = t.filter(pc.equal(t["vec_id"], vec_id))
    return np.asarray(row["embedding"][0].as_py(), dtype=np.float64)


def ann_topk(sf_dir: str, vec_id: int = 0, k: int = 10):
    """(vec_id, cos_r) — top-k by cosine vs the query vector, rounded 6dp,
    ties broken by vec_id.  Per-batch top-k then a tiny global sort."""
    import ray
    import ray.data

    q = query_vector(sf_dir, vec_id)
    q_ref = ray.put(q)

    def score(batch: pa.Table) -> pa.Table:
        qv = ray.get(q_ref)
        ids, mat = _batch_matrix(batch)
        cos = np.round(_cosine(mat, qv), 6)
        top = np.lexsort((ids, -cos))[: k]
        return pa.table(
            {
                "vec_id": pa.array(ids[top], pa.int64()),
                "cos_r": pa.array(cos[top], pa.float64()),
            }
        )

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return (
        ds.map_batches(score, batch_format="pyarrow")
        .sort(["cos_r", "vec_id"], descending=[True, False])
        .limit(k)
    )


def top_similar_pairs(sf_dir: str, k: int = 20):
    """(vec_a, vec_b, cos_r) — the k most-similar distinct pairs (a < b).
    Each batch is multiplied against the full normalized matrix
    (broadcast once with ray.put, loaded per task)."""
    import ray
    import ray.data
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    all_ids, all_mat = _batch_matrix(t)
    norm = all_mat / np.linalg.norm(all_mat, axis=1, keepdims=True)
    ref = ray.put((all_ids, norm))

    def pairs(batch: pa.Table) -> pa.Table:
        ids_all, nm = ray.get(ref)
        ids, mat = _batch_matrix(batch)
        matn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        sim = matn @ nm.T  # |batch| x N
        a = np.repeat(ids, len(ids_all))
        b = np.tile(ids_all, len(ids))
        s = sim.reshape(-1)
        keep = a < b
        a, b, s = a[keep], b[keep], s[keep]
        top = np.lexsort((b, a, -np.round(s, 6)))[: k]
        return pa.table(
            {
                "vec_a": pa.array(a[top], pa.int64()),
                "vec_b": pa.array(b[top], pa.int64()),
                "cos_r": pa.array(np.round(s[top], 6), pa.float64()),
            }
        )

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return (
        ds.map_batches(pairs, batch_format="pyarrow")
        .sort(["cos_r", "vec_a", "vec_b"], descending=[True, False, False])
        .limit(k)
    )


def ivf_ann_topk(
    sf_dir: str,
    vec_id: int = 0,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
):
    """IVF-flat variant (the other 10^12-row scale path): vectors are
    bucketed by nearest centroid (deterministic centroids: the first
    ``n_centroids`` embeddings, normalized); the query scans only its
    ``nprobe`` nearest buckets.  Approximate — rows-only check."""
    import pyarrow.parquet as pq
    import ray
    import ray.data

    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    ids0, mat0 = _batch_matrix(t.slice(0, n_centroids))
    cents = mat0 / np.linalg.norm(mat0, axis=1, keepdims=True)
    q = query_vector(sf_dir, vec_id)
    probe = set(
        np.argsort(-(cents @ (q / np.linalg.norm(q))))[:nprobe].tolist()
    )
    ref = ray.put((q, cents, probe))

    def score(batch: pa.Table) -> pa.Table:
        qv, cc, pr = ray.get(ref)
        ids, mat = _batch_matrix(batch)
        matn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        assign = np.argmax(matn @ cc.T, axis=1)
        keep = np.isin(assign, list(pr))
        ids, mat = ids[keep], mat[keep]
        if len(ids) == 0:
            return pa.table(
                {"vec_id": pa.array([], pa.int64()), "cos_r": pa.array([], pa.float64())}
            )
        cos = np.round(_cosine(mat, qv), 6)
        top = np.lexsort((ids, -cos))[:k]
        return pa.table(
            {
                "vec_id": pa.array(ids[top], pa.int64()),
                "cos_r": pa.array(cos[top], pa.float64()),
            }
        )

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return (
        ds.map_batches(score, batch_format="pyarrow")
        .sort(["cos_r", "vec_id"], descending=[True, False])
        .limit(k)
    )


def ann_topk_per_label(sf_dir: str, vec_id: int = 0, k: int = 3):
    """(label, vec_id, cos_r) — top-k by cosine vs the query vector WITHIN
    each label group (grouped similarity search: per-batch partial top-k
    per label, then a final per-label groupby top-k)."""
    import pandas as pd
    import ray
    import ray.data

    q = query_vector(sf_dir, vec_id)
    q_ref = ray.put(q)

    def score(batch: pa.Table) -> pa.Table:
        qv = ray.get(q_ref)
        ids, mat = _batch_matrix(batch)
        cos = np.round(_cosine(mat, qv), 6)
        return pa.table(
            {
                "label": batch["label"].cast(pa.int64()),
                "vec_id": pa.array(ids, pa.int64()),
                "cos_r": pa.array(cos, pa.float64()),
            }
        )

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(
            ["cos_r", "vec_id"], ascending=[False, True]
        ).head(k)

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding", "label"]
    )
    return (
        ds.map_batches(score, batch_format="pyarrow")
        .groupby("label")
        .map_groups(topk, batch_format="pandas")
    )


def lsh_ann_topk(sf_dir: str, vec_id: int = 0, k: int = 10, n_planes: int = 8):
    """Random-hyperplane LSH variant: bucket vectors by sign pattern
    against ``n_planes`` fixed hyperplanes; the query searches only its
    own bucket plus Hamming-1 neighbors.  Approximate (recall < 1) —
    rows-only check; exists to demonstrate the scale path where the
    brute-force matmul becomes infeasible."""
    import ray
    import ray.data

    q = query_vector(sf_dir, vec_id)
    rng = np.random.RandomState(99)
    planes = rng.standard_normal((64, n_planes))
    qsig = int(
        np.packbits((q @ planes > 0).astype(np.uint8), bitorder="little")[0]
    )
    ok_sigs = {qsig} | {qsig ^ (1 << i) for i in range(n_planes)}
    refs = ray.put((q, planes, ok_sigs))

    def score(batch: pa.Table) -> pa.Table:
        qv, pl, sigs = ray.get(refs)
        ids, mat = _batch_matrix(batch)
        sig = np.packbits((mat @ pl > 0).astype(np.uint8), axis=1, bitorder="little")[
            :, 0
        ]
        keep = np.isin(sig, list(sigs))
        ids, mat = ids[keep], mat[keep]
        if len(ids) == 0:
            return pa.table(
                {"vec_id": pa.array([], pa.int64()), "cos_r": pa.array([], pa.float64())}
            )
        cos = np.round(_cosine(mat, qv), 6)
        top = np.lexsort((ids, -cos))[: k]
        return pa.table(
            {
                "vec_id": pa.array(ids[top], pa.int64()),
                "cos_r": pa.array(cos[top], pa.float64()),
            }
        )

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return (
        ds.map_batches(score, batch_format="pyarrow")
        .sort(["cos_r", "vec_id"], descending=[True, False])
        .limit(k)
    )
