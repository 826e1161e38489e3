"""Similarity search over embedding columns (list<float>).

- ``ann_topk``: brute-force cosine top-k against a broadcast query matrix
  (numpy matmul per batch) — the exact baseline.
- ``top_similar_pairs``: all-pairs blocked cosine (each batch multiplied
  against the broadcast normalized matrix) with a global top-k — exact.
- ``lsh_ann_topk``: random-hyperplane LSH bucketing as the 10^12-row
  scale path (bucket by sign pattern, search only matching buckets) —
  approximate but deterministic, with an exact SQL oracle that inlines
  the fixed-seed planes.
- ``build_vector_store`` / ``append_vector_store`` /
  ``vector_store_topk``: an explicit incrementally-maintained bucket
  store — new/updated vectors land as generations routed through the
  base's frozen centroids/planes, newest generation of a vec_id wins
  (the delta-segment contract of pipelines/delta.py on the embedding
  side).

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


# --- distributed exact all-pairs (block-pair decomposition) -----------------
# Every unordered block pair (i, j) becomes one group: a vector in block i
# is replicated to the B groups {pk(i, j) : j}, so group (i, j) holds both
# blocks and computes exactly the cross (or, for i == j, within-block)
# pairs.  Total similarity compute is unchanged (it is exact all-pairs),
# but nothing is ever read onto the driver or broadcast whole — the
# replication factor is B and each group is 2N/B vectors, so B is chosen
# so a group fits a worker's heap (B ~ sqrt of the N*d / worker-mem ratio
# at real scale).


def _emb_block_rows(batch: pa.Table, *, num_blocks: int) -> pa.Table:
    """Replicate each vector row to every unordered block pair involving
    its block; the embedding travels as a float64 binary blob (groupby
    shuffles binary untouched)."""
    ids, mat = _batch_matrix(batch)
    blk = (ids % num_blocks).astype(np.int64)
    blobs = [row.tobytes() for row in mat]
    tables = []
    for j in range(num_blocks):
        lo = np.minimum(blk, j)
        hi = np.maximum(blk, j)
        tables.append(
            pa.table(
                {
                    "pk": pa.array(lo * num_blocks + hi, pa.int64()),
                    "vec_id": pa.array(ids, pa.int64()),
                    "blk": pa.array(blk, pa.int64()),
                    "eb": pa.array(blobs, pa.binary()),
                }
            )
        )
    return pa.concat_tables(tables)


def _group_matrix(group: pa.Table, rows: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(ids, float64 matrix) of the selected rows.  The eb blobs are
    gathered straight from the Arrow binary buffers (the
    reverse._binary_buffers offset technique): one zero-copy reshape over
    the values buffer plus one vectorized row take — no per-row as_py()
    loop in the block-pair hot path."""
    ids = group["vec_id"].to_numpy(zero_copy_only=False)[rows]
    if len(rows) == 0:
        return ids, np.empty((0, 0))
    col = group["eb"].combine_chunks()
    n = len(col)
    off = np.frombuffer(col.buffers()[1], dtype=np.int32)[
        col.offset : col.offset + n + 1
    ].astype(np.int64)
    width = int(off[1] - off[0])  # fixed dim*8 float64 blobs by construction
    data = np.frombuffer(col.buffers()[2], dtype=np.uint8)[off[0] : off[-1]]
    # uniform widths -> the values buffer is a dense (n, width) grid; the
    # fancy row take copies only the selected cells (fresh aligned array)
    mat = data.reshape(n, width)[rows].view(np.float64)
    return ids, mat


def _block_pair_sims(
    group: pa.Table, num_blocks: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """All (a < b, rounded cosine) pairs owned by this block-pair group."""
    pk = int(group["pk"][0].as_py())
    i, j = divmod(pk, num_blocks)
    blk = group["blk"].to_numpy(zero_copy_only=False)
    if i == j:
        rows = np.flatnonzero(blk == i)
        ids, mat = _group_matrix(group, rows)
        if len(ids) < 2:
            return (np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0))
        matn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        sim = np.round(matn @ matn.T, 6)
        ai, bi = np.triu_indices(len(ids), k=1)
        a, b = ids[ai], ids[bi]
        s = sim[ai, bi]
    else:
        ra = np.flatnonzero(blk == i)
        rb = np.flatnonzero(blk == j)
        ids_a, ma = _group_matrix(group, ra)
        ids_b, mb = _group_matrix(group, rb)
        if len(ids_a) == 0 or len(ids_b) == 0:
            return (np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0))
        man = ma / np.linalg.norm(ma, axis=1, keepdims=True)
        mbn = mb / np.linalg.norm(mb, axis=1, keepdims=True)
        sim = np.round(man @ mbn.T, 6)
        a = np.repeat(ids_a, len(ids_b))
        b = np.tile(ids_b, len(ids_a))
        s = sim.reshape(-1)
    lo = np.minimum(a, b)
    hi = np.maximum(a, b)
    return lo, hi, s


def _blocked_pair_groups(sf_dir: str, num_blocks: int):
    import functools

    import ray.data

    return (
        ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        .map_batches(
            functools.partial(_emb_block_rows, num_blocks=num_blocks),
            batch_format="pyarrow",
        )
        .groupby("pk")
    )


def _topk_of_group(group: pa.Table, *, num_blocks: int, k: int) -> pa.Table:
    a, b, s = _block_pair_sims(group, num_blocks)
    top = np.lexsort((b, a, -s))[:k]
    return pa.table(
        {
            "vec_a": pa.array(a[top], pa.int64()),
            "vec_b": pa.array(b[top], pa.int64()),
            "cos_r": pa.array(s[top], pa.float64()),
        }
    )


def _thresholded_of_group(
    group: pa.Table, *, num_blocks: int, threshold: float
) -> pa.Table:
    a, b, s = _block_pair_sims(group, num_blocks)
    keep = s >= threshold
    return pa.table(
        {
            "vec_a": pa.array(a[keep], pa.int64()),
            "vec_b": pa.array(b[keep], pa.int64()),
            "cos_r": pa.array(s[keep], pa.float64()),
        }
    )


def top_similar_pairs(sf_dir: str, k: int = 20, num_blocks: int = 4):
    """(vec_a, vec_b, cos_r) — the k most-similar distinct pairs (a < b).
    Exact: block-pair decomposition (per-group partial top-k, tiny global
    sort) — no driver read, no whole-matrix broadcast."""
    import functools

    return (
        _blocked_pair_groups(sf_dir, num_blocks)
        .map_groups(
            functools.partial(_topk_of_group, num_blocks=num_blocks, k=k),
            batch_format="pyarrow",
        )
        .sort(["cos_r", "vec_a", "vec_b"], descending=[True, False, False])
        .limit(k)
    )


def embedding_near_dup_pairs(
    sf_dir: str, threshold: float = 0.45, num_blocks: int = 4
):
    """(vec_a, vec_b, cos_r) — ALL pairs (a < b) with cosine >= threshold:
    embedding-space near-duplicate detection.  Exact block-pair
    decomposition (O(N^2) compute, no driver materialization); for the
    10^12-row path that prunes compute as well, see
    ``embedding_near_dup_bucketed``."""
    import functools

    return _blocked_pair_groups(sf_dir, num_blocks).map_groups(
        functools.partial(
            _thresholded_of_group, num_blocks=num_blocks, threshold=threshold
        ),
        batch_format="pyarrow",
    )


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


def _staging_dir(out: str) -> str:
    """Per-builder unique staging dir: two concurrent processes building
    the same tag each write their own tmp tree, so the loser can never
    interleave files into (or clobber) the winner's published store."""
    import os
    import uuid

    return f"{out}.building.{os.getpid()}.{uuid.uuid4().hex[:8]}"


def _commit_ann_dir(tmp: str, out: str, sf_dir: str) -> None:
    """Atomic publish: a crashed build leaves only the .building dir, so a
    rerun never appends duplicate vector files into live bucket dirs.
    If another builder already published (_DONE exists), this builder's
    staging tree is discarded instead of replacing the live store.
    Also records the source path and evicts stale tags of the same source
    (the content-keyed tag would otherwise orphan a full vector-store
    copy every time the embeddings file is regenerated)."""
    import os
    import shutil

    if os.path.exists(os.path.join(out, "_DONE")):
        shutil.rmtree(tmp, ignore_errors=True)
        return
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
    tmp = _staging_dir(out)

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
    Approximate but deterministic (centroids = first 16 vectors), so the
    driver oracle replicates the assignment/probe/score exactly in SQL."""
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

    def topk(g: pa.Table) -> pa.Table:
        cos = g["cos_r"].to_numpy(zero_copy_only=False)
        ids = g["vec_id"].to_numpy(zero_copy_only=False)
        sel = np.lexsort((ids, -cos))[:k]
        return g.take(pa.array(sel, pa.int64()))

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding", "label"]
    )
    return (
        ds.map_batches(score, batch_format="pyarrow")
        .groupby("label")
        .map_groups(topk, batch_format="pyarrow")
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
    tmp = _staging_dir(out)
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


def _neardup_probe_rows(batch: pa.Table, *, n_planes: int) -> pa.Table:
    """One row per (vector, probe bucket): its own signature plus every
    Hamming-1 neighbor.  Two vectors then share a probe bucket iff their
    signatures differ in <= 2 bits — the candidate radius."""
    import pyarrow.compute as pc

    ids, mat = _batch_matrix(batch)
    sig = pc.cast(batch["bucket"], pa.int64()).to_numpy(zero_copy_only=False)
    blobs = [row.tobytes() for row in mat]
    base = pa.table(
        {
            "probe": pa.array(sig, pa.int64()),
            "vec_id": pa.array(ids, pa.int64()),
            "eb": pa.array(blobs, pa.binary()),
        }
    )
    tables = [base]
    for bit in range(n_planes):
        tables.append(
            pa.table(
                {
                    "probe": pa.array(sig ^ (1 << bit), pa.int64()),
                    "vec_id": base["vec_id"],
                    "eb": base["eb"],
                }
            )
        )
    return pa.concat_tables(tables)


def _neardup_bucket_pairs(group: pa.Table, *, threshold: float) -> pa.Table:
    """Exact cosine over the pairs co-located in one probe bucket; the
    same pair may surface in several buckets (identical rounded value) —
    deduped downstream."""
    rows = np.arange(len(group))
    ids, mat = _group_matrix(group, rows)
    empty = pa.table(
        {
            "vec_a": pa.array([], pa.int64()),
            "vec_b": pa.array([], pa.int64()),
            "cos_r": pa.array([], pa.float64()),
        }
    )
    # a vector probes its own signature + Hamming-1, so it can appear
    # twice in one bucket group — collapse to unique ids first
    uniq, first = np.unique(ids, return_index=True)
    if len(uniq) < 2:
        return empty
    mat = mat[first]
    matn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sim = np.round(matn @ matn.T, 6)
    ai, bi = np.triu_indices(len(uniq), k=1)
    s = sim[ai, bi]
    keep = s >= threshold
    return pa.table(
        {
            "vec_a": pa.array(uniq[ai[keep]], pa.int64()),
            "vec_b": pa.array(uniq[bi[keep]], pa.int64()),
            "cos_r": pa.array(s[keep], pa.float64()),
        }
    )


def embedding_near_dup_bucketed(
    sf_dir: str, threshold: float = 0.45, n_planes: int = 8
):
    """(vec_a, vec_b, cos_r) — near-dup pairs from the bucket-partitioned
    LSH store: candidates are pairs whose sign signatures differ in <= 2
    bits (own bucket + Hamming-1 probes on both sides), verified with the
    exact rounded cosine.  Compute is pruned from O(N^2) to the bucket
    neighborhoods; every emitted pair carries the exact value (a strict
    subset of ``embedding_near_dup_pairs``), but a pair at signature
    distance >= 3 is missed, so recall depends on the regime: ~1.0 for
    true near-duplicates (cos >= ~0.9, the dedup use case — pytest-proven
    on planted duplicates), low for weak-similarity thresholds like 0.45
    (measured 62/144 at sf0.1 — random-projection LSH cannot prune a
    cos ~0.5 neighborhood in 64-d).  Deterministic given the fixed-seed
    planes: the driver oracle replicates the signature-distance <= 2
    candidate set and exact verify in SQL."""
    import functools
    import os

    import ray.data
    from ray.data.aggregate import Max

    idx = build_lsh_index(sf_dir, n_planes)
    return (
        ray.data.read_parquet(os.path.join(idx, "vectors"))
        .map_batches(
            functools.partial(_neardup_probe_rows, n_planes=n_planes),
            batch_format="pyarrow",
        )
        .groupby("probe")
        .map_groups(
            functools.partial(_neardup_bucket_pairs, threshold=threshold),
            batch_format="pyarrow",
        )
        .groupby(["vec_a", "vec_b"])
        .aggregate(Max("cos_r", alias_name="cos_r"))
    )


def lsh_ann_topk(sf_dir: str, vec_id: int = 0, k: int = 10, n_planes: int = 8):
    """Random-hyperplane LSH over the bucket-partitioned store: the query
    reads ONLY its own signature's partition dir plus the Hamming-1
    neighbor dirs.  Approximate (recall < 1) but deterministic given the
    fixed-seed planes, so the driver oracle replicates the sign
    signatures and Hamming-1 probe set exactly in SQL."""
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


# ---------------------------------------------------------------------------
# Incrementally-maintained vector store — the delta-segment contract
# (pipelines/delta.py) applied to the embedding side.  At 100 TB the
# bucket-partitioned vector files cannot be rebuilt per ingest any more
# than posting lists can: new/updated vectors land as a GENERATION
# (bucket-assigned with the store's FROZEN centroids/planes, so probe
# routing stays consistent), and the newest generation of a vec_id wins
# — later generations' delta-sized id sets suppress earlier copies at
# query time, exactly like delta tombstones suppress prior posting rows.

VECTOR_STORE_VERSION = 2  # v2: store.json carries the gens list (atomic compaction)


def _store_meta_path(out: str) -> str:
    import os

    return os.path.join(out, "store.json")


def _read_store_meta(out: str) -> dict:
    import json

    with open(_store_meta_path(out)) as f:
        return json.load(f)


def _write_store_meta(out: str, meta: dict) -> None:
    """Manifest-last commit: store.json's ``gens`` list IS the store —
    a crashed build/append/compact leaves generation dirs the manifest
    never references; readers ignore them, ``verify_vector_store``
    reports them as orphans, and maintenance reclaims them."""
    import json
    import os

    tmp = _store_meta_path(out) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, _store_meta_path(out))


MAX_LSH_PLANES = 24  # signature must fit the int32 bucket column


def _lsh_sigs(mat: np.ndarray, n_planes: int) -> np.ndarray:
    """Little-endian sign signatures over the fixed-seed planes — ALL
    signature bytes combined, so n_planes in (8, 24] works (packbits
    byte 0 alone would silently truncate routing to 8 planes while the
    Hamming-1 probe flips the full bit range)."""
    bits = np.packbits(
        (mat @ _lsh_planes(mat.shape[1], n_planes) > 0).astype(np.uint8),
        axis=1,
        bitorder="little",
    ).astype(np.int64)
    return (bits * (1 << (8 * np.arange(bits.shape[1])))).sum(axis=1)


def _assign_fn(meta: dict, cents: np.ndarray | None):
    """Bucket assignment closure under the store's frozen parameters —
    identical math to build_ivf_index/build_lsh_index."""
    if meta["kind"] == "ivf":

        def assign(batch: pa.Table) -> pa.Table:
            _, mat = _batch_matrix(batch)
            matn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
            bucket = np.argmax(matn @ cents.T, axis=1).astype(np.int32)
            return batch.append_column("bucket", pa.array(bucket, pa.int32()))

    else:  # lsh

        n_planes = int(meta["n_planes"])

        def assign(batch: pa.Table) -> pa.Table:
            _, mat = _batch_matrix(batch)
            sig = _lsh_sigs(mat, n_planes).astype(np.int32)
            return batch.append_column("bucket", pa.array(sig, pa.int32()))

    return assign


def _store_centroids(out: str) -> np.ndarray | None:
    import os

    import pyarrow.parquet as pq

    p = os.path.join(out, "centroids.parquet")
    if not os.path.exists(p):
        return None
    ct = pq.read_table(p)
    return np.array(ct["vec"].to_pylist(), dtype=np.float64)


def _to_vec_dataset(src):
    """(vec_id, embedding) rows from a pyarrow Table, a parquet path, or
    a ray Dataset — appends stay streaming for large deltas."""
    import ray.data

    if isinstance(src, pa.Table):
        return ray.data.from_arrow(src.select(["vec_id", "embedding"]))
    if isinstance(src, str):
        return ray.data.read_parquet(src, columns=["vec_id", "embedding"])
    return src.select_columns(["vec_id", "embedding"])


def build_vector_store(
    src,
    out: str,
    kind: str = "ivf",
    n_centroids: int = 16,
    n_planes: int = 8,
) -> dict:
    """Generation 0 of an explicit (non-cache) vector store at ``out``.
    IVF centroids are the first ``n_centroids`` vectors of ``src`` (read
    from the first batch only), normalized and FROZEN in the store —
    appends route through them unchanged so bucket probing stays
    consistent across generations."""
    import os
    import shutil

    import pyarrow.parquet as pq

    ds = _to_vec_dataset(src)
    if kind == "lsh" and not 1 <= n_planes <= MAX_LSH_PLANES:
        raise ValueError(
            f"n_planes must be in [1, {MAX_LSH_PLANES}] (int32 buckets)"
        )
    # newest-wins needs unique identities inside a generation; the base
    # is checked distributed (ids-only groupby), appends check their
    # delta-sized id set on the driver
    dup = (
        ds.select_columns(["vec_id"])
        .groupby("vec_id")
        .count()
        # Arrow kernel, not a per-row Python filter: the count table has
        # one row per DISTINCT vec_id, which at store scale is the full
        # id cardinality
        .map_batches(
            lambda t: t.filter(pa.compute.greater(t["count()"], 1)),
            batch_format="pyarrow",
        )
        .take(1)
    )
    if dup:
        raise ValueError(
            f"base contains duplicate vec_ids (e.g. {dup[0]['vec_id']})"
        )
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)

    cents = None
    if kind == "ivf":
        first = ds.limit(n_centroids).take_all()
        mat0 = np.array(
            [r["embedding"] for r in first], dtype=np.float64
        )
        cents = mat0 / np.linalg.norm(mat0, axis=1, keepdims=True)
        pq.write_table(
            pa.table(
                {
                    "centroid": pa.array(range(len(cents)), pa.int32()),
                    "vec": pa.array(cents.tolist(), pa.list_(pa.float64())),
                }
            ),
            os.path.join(out, "centroids.parquet"),
        )
    elif kind != "lsh":
        raise ValueError(f"unknown vector-store kind {kind!r}")

    meta = {
        "version": VECTOR_STORE_VERSION,
        "kind": kind,
        "n_centroids": n_centroids,
        "n_planes": n_planes,
        # gens is the list of COMMITTED generation dir names, oldest
        # first — the manifest of record; generations = len(gens)
        "gens": [],
        "generations": 0,
    }
    ds.map_batches(
        _assign_fn(meta, cents), batch_format="pyarrow"
    ).write_parquet(os.path.join(out, "gen_0000"), partition_cols=["bucket"])
    meta["gens"] = ["gen_0000"]
    meta["generations"] = 1
    _write_store_meta(out, meta)
    return meta


def append_vector_store(out: str, src) -> dict:
    """Ingest new/updated vectors as the next generation.  The newest
    generation of a vec_id wins: the generation records its own
    (delta-sized) sorted id set in ``ids.parquet`` and queries drop
    matching ids from every earlier generation — fresh ids suppress
    nothing, updated ids suppress exactly their stale copies (the
    combined-id tombstone rule of pipelines/delta.py)."""
    import os
    import shutil

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    meta = _read_store_meta(out)
    gens = list(meta["gens"])
    gname = f"gen_{len(gens):04d}"
    gdir = os.path.join(out, gname)
    shutil.rmtree(gdir, ignore_errors=True)  # uncommitted crash leftover

    ds = _to_vec_dataset(src)
    cents = _store_centroids(out)
    ds.map_batches(
        _assign_fn(meta, cents), batch_format="pyarrow"
    ).write_parquet(gdir, partition_cols=["bucket"])

    # delta-sized id set, one column-pruned pass over what was written
    import glob

    files = sorted(glob.glob(os.path.join(gdir, "**", "*.parquet"), recursive=True))
    if not files:
        # empty delta (an ingest cycle with nothing new): no-op, never
        # commit an empty generation
        shutil.rmtree(gdir, ignore_errors=True)
        return {"generation": None, "n_vectors": 0}
    ids = pa.concat_tables(
        [pq.read_table(f, columns=["vec_id"]) for f in files]
    )
    ids = ids.sort_by("vec_id")
    n = ids.num_rows
    if n and pc.any(
        pc.equal(ids["vec_id"].slice(1), ids["vec_id"].slice(0, n - 1))
    ).as_py():
        raise ValueError("append batch contains duplicate vec_ids")
    pq.write_table(ids, os.path.join(gdir, "ids.parquet"))

    meta["gens"] = gens + [gname]
    meta["generations"] = len(meta["gens"])
    _write_store_meta(out, meta)
    return {"generation": len(gens), "n_vectors": n}


def vector_store_topk(
    out: str,
    q: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
):
    """Top-k by cosine over the store's probe buckets across ALL
    generations, newest-wins.  Probe routing (IVF nearest-``nprobe``
    centroids / LSH Hamming-1 signatures) uses the frozen store
    parameters; suppression sets are delta-sized broadcast arrays."""
    import os

    import pyarrow.parquet as pq
    import ray
    import ray.data

    meta = _read_store_meta(out)
    gens = list(meta["gens"])
    ngen = len(gens)
    if meta["kind"] == "ivf":
        cents = _store_centroids(out)
        probe = np.argsort(-(cents @ (q / np.linalg.norm(q))))[
            : nprobe
        ].tolist()
    else:
        n_planes = int(meta["n_planes"])
        qsig = int(_lsh_sigs(q.reshape(1, -1), n_planes)[0])
        probe = sorted({qsig} | {qsig ^ (1 << i) for i in range(n_planes)})

    # ids of generations > g suppress generation g (loaded once, tiny)
    gen_ids = [
        pq.read_table(os.path.join(out, gname, "ids.parquet"))[
            "vec_id"
        ].to_numpy(zero_copy_only=False)
        for gname in gens[1:]
    ]
    q_ref = ray.put(q)

    def score_gen(suppress: np.ndarray | None):
        def score(batch: pa.Table) -> pa.Table:
            qv = ray.get(q_ref)
            ids, mat = _batch_matrix(batch)
            if suppress is not None and len(suppress):
                keep = ~np.isin(ids, suppress)
                ids, mat = ids[keep], mat[keep]
            if not len(ids):
                return pa.table(
                    {
                        "vec_id": pa.array([], pa.int64()),
                        "cos_r": pa.array([], pa.float64()),
                    }
                )
            cos = np.round(_cosine(mat, qv), 6)
            top = np.lexsort((ids, -cos))[:k]
            return pa.table(
                {
                    "vec_id": pa.array(ids[top], pa.int64()),
                    "cos_r": pa.array(cos[top], pa.float64()),
                }
            )

        return score

    import glob

    def _gen_bucket_files(gdir: str) -> list[str]:
        files: list[str] = []
        for b in probe:
            files.extend(
                sorted(glob.glob(os.path.join(gdir, f"bucket={b}", "*.parquet")))
            )
        return files

    parts = []
    for g, gname in enumerate(gens):
        paths = _gen_bucket_files(os.path.join(out, gname))
        if not paths:
            continue
        later = (
            np.unique(np.concatenate(gen_ids[g:]))
            if g < ngen - 1 and gen_ids[g:]
            else None
        )
        parts.append(
            ray.data.read_parquet(paths, columns=["vec_id", "embedding"])
            .map_batches(score_gen(later), batch_format="pyarrow")
        )
    if not parts:
        return ray.data.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "cos_r": pa.array([], pa.float64()),
                }
            )
        )
    ds = parts[0]
    for p in parts[1:]:
        ds = ds.union(p)
    return ds.sort(["cos_r", "vec_id"], descending=[True, False]).limit(k)


def vecstore_append_topk(
    sf_dir: str, k: int = 10, n_centroids: int = 16, nprobe: int = 4
):
    """Driver-gate demo of the incremental store: generation 0 over the
    sf embeddings, then an UPDATE generation re-ingesting every
    ``vec_id % 7 == 3`` vector negated (a deterministic edit the SQL
    oracle replicates with ``list_transform(v, x -> -x)``), then IVF
    top-k for vector 0 — whose own embedding is unchanged (0 % 7 != 3).
    Updated vectors must route through the FROZEN base centroids and
    suppress their stale copies; results equal the oracle computed over
    the corpus-with-replacement."""
    import os

    import ray.data

    import shutil

    out = os.path.join(
        _ann_cache_dir(sf_dir),
        f"vstore_demo_ivf{n_centroids}_v{VECTOR_STORE_VERSION}",
    )
    done = os.path.join(out, "_DEMO_DONE")
    if not os.path.exists(done):
        # same crash/concurrency discipline as the ANN cache builders:
        # stage under a unique dir, publish with one rename
        tmp = _staging_dir(out)
        build_vector_store(
            f"{sf_dir}/embeddings.parquet", tmp, kind="ivf",
            n_centroids=n_centroids,
        )

        def negate_sel(batch: pa.Table) -> pa.Table:
            ids, mat = _batch_matrix(batch)
            keep = ids % 7 == 3
            neg = -mat[keep]
            return pa.table(
                {
                    "vec_id": pa.array(ids[keep], pa.int64()),
                    "embedding": pa.array(
                        list(neg), pa.list_(pa.float64())
                    ),
                }
            )

        delta = ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        ).map_batches(negate_sel, batch_format="pyarrow")
        append_vector_store(tmp, delta)
        open(os.path.join(tmp, "_DEMO_DONE"), "w").close()
        if os.path.exists(done):  # another builder won the race
            shutil.rmtree(tmp, ignore_errors=True)
        else:
            shutil.rmtree(out, ignore_errors=True)
            os.rename(tmp, out)
    return vector_store_topk(out, query_vector(sf_dir, 0), k=k, nprobe=nprobe)


def compact_vector_store(out: str) -> dict:
    """Fold all generations into a fresh generation 0: suppressed stale
    copies are dropped (newest vec_id wins) and each vector keeps its
    already-assigned bucket — no re-routing, no centroid drift, exactly
    like blob-level segment compaction never re-tokenizes the journal.
    Queries over the compacted store equal queries over the chain."""
    import glob
    import os
    import shutil

    import pyarrow.parquet as pq
    import ray
    import ray.data

    import uuid

    meta = _read_store_meta(out)
    gens = list(meta["gens"])
    ngen = len(gens)
    if ngen <= 1:
        return {"generations_folded": ngen, "n_vectors": None}

    gen_ids = [
        pq.read_table(os.path.join(out, gname, "ids.parquet"))[
            "vec_id"
        ].to_numpy(zero_copy_only=False)
        for gname in gens[1:]
    ]

    # the folded generation gets a FRESH name; the swap is then ONE
    # atomic store.json write (gens = [new]) — a reader or a crash at
    # any instant sees either the full old chain or the complete fold,
    # never a half-renamed layout.  Old dirs are removed only after the
    # manifest commit; a crash in between leaves them as orphans that
    # verify_vector_store reports and the next compact re-clears.
    fold = f"gen_c{uuid.uuid4().hex[:8]}"
    tmp = os.path.join(out, fold)
    parts = []
    for g, gname in enumerate(gens):
        files = sorted(
            glob.glob(os.path.join(out, gname, "bucket=*", "*.parquet"))
        )
        if not files:
            continue
        later = gen_ids[g:] if g < ngen - 1 else []
        suppress = np.unique(np.concatenate(later)) if later else None
        sup_ref = ray.put(suppress)

        def drop_stale(batch: pa.Table, _ref=sup_ref) -> pa.Table:
            # an explicit file list loses hive inference, so the bucket
            # comes back out of each row's source path
            paths = batch["path"].to_pylist()
            bucket = pa.array(
                [int(p.split("bucket=")[1].split(os.sep)[0]) for p in paths],
                pa.int32(),
            )
            batch = batch.drop_columns(["path"]).append_column(
                "bucket", bucket
            )
            sup = ray.get(_ref)
            if sup is None or not len(sup):
                return batch
            ids = batch["vec_id"].to_numpy(zero_copy_only=False)
            keep = ~np.isin(ids, sup)
            return batch.filter(pa.array(keep))

        parts.append(
            ray.data.read_parquet(
                files, columns=["vec_id", "embedding"], include_paths=True
            ).map_batches(drop_stale, batch_format="pyarrow")
        )
    ds = parts[0]
    for p in parts[1:]:
        ds = ds.union(p)
    ds.write_parquet(tmp, partition_cols=["bucket"])

    n = 0
    for f in glob.glob(os.path.join(tmp, "**", "*.parquet"), recursive=True):
        n += pq.ParquetFile(f).metadata.num_rows

    # the atomic flip, then garbage-collect the superseded dirs
    meta["gens"] = [fold]
    meta["generations"] = 1
    _write_store_meta(out, meta)
    for gname in gens:
        shutil.rmtree(os.path.join(out, gname), ignore_errors=True)
    return {"generations_folded": ngen, "n_vectors": int(n)}


def maintain_vector_store(
    out: str,
    *,
    max_generations: int = 4,
    max_stale_frac: float = 0.25,
) -> dict:
    """Scheduled maintenance for the incremental store (the
    maintain_chain shape on the embedding side): fold when the
    generation chain is long (``len(gens) > max_generations``) or when
    stale suppressed copies exceed ``max_stale_frac`` of the stored
    rows.  No trigger -> no-op, cheap to call on a schedule."""
    import os

    import pyarrow.parquet as pq

    meta = _read_store_meta(out)
    gens = list(meta["gens"])
    if len(gens) <= 1:
        return {"folded": False, "reason": "single generation"}

    if len(gens) > max_generations:
        return {"folded": True, "reason": "length", **compact_vector_store(out)}

    # stale fraction: ids re-ingested by later generations still sitting
    # in earlier ones.  Count from the delta-sized id sets alone:
    # every id in generation g's set that also appears in an EARLIER
    # generation (or the base) is one suppressed stale row.
    import glob

    base_rows = 0
    for f in glob.glob(os.path.join(out, gens[0], "bucket=*", "*.parquet")):
        base_rows += pq.ParquetFile(f).metadata.num_rows
    seen: np.ndarray | None = None
    stale = 0
    total = base_rows
    for gname in gens[1:]:
        ids = pq.read_table(os.path.join(out, gname, "ids.parquet"))[
            "vec_id"
        ].to_numpy(zero_copy_only=False)
        total += len(ids)
        if seen is None:
            # base ids load lazily, once, and only when deltas exist —
            # a single int64 column scan; delta id sets are delta-sized
            parts = []
            for f in sorted(
                glob.glob(
                    os.path.join(out, gens[0], "bucket=*", "*.parquet")
                )
            ):
                parts.append(
                    pq.read_table(f, columns=["vec_id"])["vec_id"]
                    .to_numpy(zero_copy_only=False)
                )
            seen = (
                np.unique(np.concatenate(parts))
                if parts
                else np.empty(0, dtype=np.int64)
            )
        stale += int(np.isin(ids, seen).sum())
        seen = np.union1d(seen, ids)
    if total and stale / total > max_stale_frac:
        return {
            "folded": True,
            "reason": "stale_frac",
            "stale_rows": stale,
            **compact_vector_store(out),
        }
    return {"folded": False, "reason": "under thresholds",
            "stale_rows": stale}
