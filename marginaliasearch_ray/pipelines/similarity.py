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

    # predicate pushdown: only row groups whose stats admit vec_id load
    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "==", vec_id)],
    )
    return np.asarray(t["embedding"][0].as_py(), dtype=np.float64)


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


def embedding_near_dup_pairs(sf_dir: str, threshold: float = 0.45):
    """(vec_a, vec_b, cos_r) — ALL pairs (a < b) with cosine >= threshold:
    embedding-space near-duplicate detection.  Exact blocked form (each
    batch against the broadcast normalized matrix); the bucketed stores
    (build_lsh_index / build_ivf_index) are the 10^12-row path where
    candidate pairs come from shared buckets instead."""
    import pyarrow.parquet as pq
    import ray
    import ray.data

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    all_ids, all_mat = _batch_matrix(t)
    norm = all_mat / np.linalg.norm(all_mat, axis=1, keepdims=True)
    ref = ray.put((all_ids, norm))

    def pairs(batch: pa.Table, *, threshold=threshold) -> pa.Table:
        ids_all, nm = ray.get(ref)
        ids, mat = _batch_matrix(batch)
        matn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        sim = np.round(matn @ nm.T, 6)
        a = np.repeat(ids, len(ids_all))
        b = np.tile(ids_all, len(ids))
        s = sim.reshape(-1)
        keep = (a < b) & (s >= threshold)
        return pa.table(
            {
                "vec_a": pa.array(a[keep], pa.int64()),
                "vec_b": pa.array(b[keep], pa.int64()),
                "cos_r": pa.array(s[keep], pa.float64()),
            }
        )

    return ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).map_batches(pairs, batch_format="pyarrow")


# --- bucket-partitioned ANN storage ----------------------------------------
# One-time pipelines write the embeddings Parquet partitioned by IVF
# centroid / LSH signature; queries then READ only their probe partitions —
# IO pruning, not just compute pruning.  Partitioned-by-bucket output is
# also the resumability unit (a crashed build leaves whole bucket dirs).

ANN_FORMAT_VERSION = 1
LSH_SEED = 99


def _ann_cache_dir(sf_dir: str) -> str:
    import hashlib
    import os

    # mtime+size of the source file in the tag: regenerated embeddings at
    # the same path can never serve a stale bucketed store
    st = os.stat(os.path.join(sf_dir, "embeddings.parquet"))
    tag = hashlib.sha1(
        f"{os.path.abspath(sf_dir)}@ann{ANN_FORMAT_VERSION}"
        f"@{st.st_mtime_ns}@{st.st_size}".encode()
    ).hexdigest()[:12]
    return os.path.join("/tmp/msray_ann_cache", tag)


def _commit_ann_dir(tmp: str, out: str, sf_dir: str) -> None:
    """Atomic publish: a crashed build leaves only the .building dir, so a
    rerun never appends duplicate vector files into live bucket dirs.
    Also records the source path and evicts stale tags of the same source
    (the content-keyed tag would otherwise orphan a full vector-store
    copy every time the embeddings file is regenerated)."""
    import os
    import shutil

    shutil.rmtree(out, ignore_errors=True)
    os.rename(tmp, out)
    tag_dir = os.path.dirname(out)
    src_path = os.path.abspath(sf_dir)
    with open(os.path.join(tag_dir, "SOURCE"), "w") as f:
        f.write(src_path)
    root = os.path.dirname(tag_dir)
    for other in os.listdir(root):
        od = os.path.join(root, other)
        if od == tag_dir or not os.path.isdir(od):
            continue
        marker = os.path.join(od, "SOURCE")
        try:
            if open(marker).read() == src_path:
                shutil.rmtree(od, ignore_errors=True)
        except OSError:
            continue


def build_ivf_index(sf_dir: str, n_centroids: int = 16) -> str:
    """Write embeddings partitioned by nearest-centroid bucket.  Centroids
    are the first ``n_centroids`` vectors (read from the FIRST batch only,
    never the whole table on the driver), normalized, stored beside the
    buckets.  Returns the index directory; idempotent via a _DONE marker."""
    import os

    import pyarrow.parquet as pq
    import ray
    import ray.data

    out = os.path.join(_ann_cache_dir(sf_dir), f"ivf{n_centroids}")
    if os.path.exists(os.path.join(out, "_DONE")):
        return out
    tmp = out + ".building"
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)

    pf = pq.ParquetFile(f"{sf_dir}/embeddings.parquet")
    first = next(
        pf.iter_batches(batch_size=n_centroids, columns=["vec_id", "embedding"])
    )
    _, mat0 = _batch_matrix(pa.Table.from_batches([first]))
    cents = mat0 / np.linalg.norm(mat0, axis=1, keepdims=True)

    os.makedirs(tmp, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "centroid": pa.array(range(len(cents)), pa.int32()),
                "vec": pa.array(cents.tolist(), pa.list_(pa.float64())),
            }
        ),
        os.path.join(tmp, "centroids.parquet"),
    )

    ref = ray.put(cents)

    def assign(batch: pa.Table) -> pa.Table:
        cc = ray.get(ref)
        _, mat = _batch_matrix(batch)
        matn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        bucket = np.argmax(matn @ cc.T, axis=1).astype(np.int32)
        return batch.append_column("bucket", pa.array(bucket, pa.int32()))

    ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).map_batches(assign, batch_format="pyarrow").write_parquet(
        os.path.join(tmp, "vectors"), partition_cols=["bucket"]
    )
    open(os.path.join(tmp, "_DONE"), "w").close()
    _commit_ann_dir(tmp, out, sf_dir)
    return out


def _bucket_files(idx: str, buckets) -> list[str]:
    """Parquet files of the probe buckets only (read_parquet wants files,
    not hive dirs, when given an explicit list)."""
    import glob
    import os

    out: list[str] = []
    for b in buckets:
        out.extend(
            sorted(glob.glob(os.path.join(idx, "vectors", f"bucket={b}", "*.parquet")))
        )
    return out


def ivf_ann_topk(
    sf_dir: str,
    vec_id: int = 0,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
):
    """IVF-flat over the bucket-partitioned store: the query loads the
    tiny centroid table, picks its ``nprobe`` nearest buckets, and READS
    ONLY those partition directories (a strict subset of the files).
    Approximate — rows-only check."""
    import os

    import pyarrow.parquet as pq
    import ray
    import ray.data

    idx = build_ivf_index(sf_dir, n_centroids)
    ct = pq.read_table(os.path.join(idx, "centroids.parquet"))
    cents = np.array(ct["vec"].to_pylist(), dtype=np.float64)
    q = query_vector(sf_dir, vec_id)
    probe = np.argsort(-(cents @ (q / np.linalg.norm(q))))[:nprobe].tolist()
    paths = _bucket_files(idx, probe)
    if not paths:
        return ray.data.from_arrow(
            pa.table(
                {"vec_id": pa.array([], pa.int64()), "cos_r": pa.array([], pa.float64())}
            )
        )
    q_ref = ray.put(q)

    def score(batch: pa.Table) -> pa.Table:
        qv = ray.get(q_ref)
        ids, mat = _batch_matrix(batch)
        cos = np.round(_cosine(mat, qv), 6)
        top = np.lexsort((ids, -cos))[:k]
        return pa.table(
            {
                "vec_id": pa.array(ids[top], pa.int64()),
                "cos_r": pa.array(cos[top], pa.float64()),
            }
        )

    return (
        ray.data.read_parquet(paths, columns=["vec_id", "embedding"])
        .map_batches(score, batch_format="pyarrow")
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


def _lsh_planes(dim: int, n_planes: int) -> np.ndarray:
    return np.random.RandomState(LSH_SEED).standard_normal((dim, n_planes))


def build_lsh_index(sf_dir: str, n_planes: int = 8) -> str:
    """Write embeddings partitioned by random-hyperplane sign signature.
    Idempotent (_DONE marker); one dir per signature bucket."""
    import os

    import ray
    import ray.data

    out = os.path.join(_ann_cache_dir(sf_dir), f"lsh{n_planes}")
    if os.path.exists(os.path.join(out, "_DONE")):
        return out
    tmp = out + ".building"
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)

    def assign(batch: pa.Table) -> pa.Table:
        _, mat = _batch_matrix(batch)
        pl = _lsh_planes(mat.shape[1], n_planes)
        sig = np.packbits(
            (mat @ pl > 0).astype(np.uint8), axis=1, bitorder="little"
        )[:, 0].astype(np.int32)
        return batch.append_column("bucket", pa.array(sig, pa.int32()))

    ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).map_batches(assign, batch_format="pyarrow").write_parquet(
        os.path.join(tmp, "vectors"), partition_cols=["bucket"]
    )
    open(os.path.join(tmp, "_DONE"), "w").close()
    _commit_ann_dir(tmp, out, sf_dir)
    return out


def lsh_ann_topk(sf_dir: str, vec_id: int = 0, k: int = 10, n_planes: int = 8):
    """Random-hyperplane LSH over the bucket-partitioned store: the query
    reads ONLY its own signature's partition dir plus the Hamming-1
    neighbor dirs.  Approximate (recall < 1) — rows-only check."""
    import os

    import ray
    import ray.data

    idx = build_lsh_index(sf_dir, n_planes)
    q = query_vector(sf_dir, vec_id)
    planes = _lsh_planes(len(q), n_planes)
    qsig = int(
        np.packbits((q @ planes > 0).astype(np.uint8), bitorder="little")[0]
    )
    ok_sigs = {qsig} | {qsig ^ (1 << i) for i in range(n_planes)}
    paths = _bucket_files(idx, sorted(ok_sigs))
    if not paths:
        return ray.data.from_arrow(
            pa.table(
                {"vec_id": pa.array([], pa.int64()), "cos_r": pa.array([], pa.float64())}
            )
        )
    q_ref = ray.put(q)

    def score(batch: pa.Table) -> pa.Table:
        qv = ray.get(q_ref)
        ids, mat = _batch_matrix(batch)
        cos = np.round(_cosine(mat, qv), 6)
        top = np.lexsort((ids, -cos))[:k]
        return pa.table(
            {
                "vec_id": pa.array(ids[top], pa.int64()),
                "cos_r": pa.array(cos[top], pa.float64()),
            }
        )

    return (
        ray.data.read_parquet(paths, columns=["vec_id", "embedding"])
        .map_batches(score, batch_format="pyarrow")
        .sort(["cos_r", "vec_id"], descending=[True, False])
        .limit(k)
    )
