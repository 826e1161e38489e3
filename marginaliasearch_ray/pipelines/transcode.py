"""Segment positions-codec migration (varint <-> Elias gamma).

The reference keeps GammaCodedSequence as its LEGACY positions wire
format (code/libraries/coded-sequence/java/nu/marginalia/sequence/
GammaCodedSequence.java:14-32), superseded by VarintCodedSequence — the
hot format this engine builds and serves by default.  This module is
the migration path between the two: ``transcode_positions`` rewrites a
committed segment's postings ``positions`` column into the other codec
(every other file hardlinks across — journal, forward, stats, prio and
block-max side columns are codec-independent), records the codec in the
``reverse`` manifest, and ``query._Segment`` routes the positions
decode accordingly.  A legacy gamma segment therefore serves queries
as-is, and transcoding it back restores the vectorized varint hot path.

Ray-Data shape: one streaming pipeline over the postings parquet
(hive-partitioned by part) — per-batch decode + re-encode is fully
vectorized (one varint decode / one gamma bit-scatter per batch, no
per-row Python), written back hive-partitioned so a segment of any
size streams through without materializing.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa

from ..functions.codecs import decode_varints, encode_stream_blob
from ..functions.gamma_seq import encode_gamma_blob, gamma_blob_payload
from ..state import manifest as mf

CODECS = ("varint", "gamma")


def positions_codec(segment_dir: str) -> str:
    """The codec of a segment's postings ``positions`` column — recorded
    by ``transcode_positions``; absent means the build default."""
    try:
        return mf.read_manifest(segment_dir, "reverse").get(
            "positions_codec", "varint"
        )
    except FileNotFoundError:
        return "varint"


def _cells(batch: pa.Table) -> tuple[np.ndarray, np.ndarray, np.ndarray, bytes]:
    """(per-posting counts, per-row posting bounds, row byte offsets,
    concatenated positions bytes) of a postings batch."""
    from ..stages.reverse import _binary_buffers

    pc_col = batch["pos_cnts"].combine_chunks()
    cnts_flat = np.asarray(pc_col.values).astype(np.int64)
    row_bounds = np.asarray(pc_col.offsets).astype(np.int64)
    data, _boff = _binary_buffers(batch["positions"].combine_chunks())
    return cnts_flat, row_bounds, _boff, data.tobytes()


def _swap_positions(batch: pa.Table, cells: list[bytes]) -> pa.Table:
    i = batch.schema.get_field_index("positions")
    return batch.set_column(i, "positions", pa.array(cells, pa.binary()))


def _to_gamma(batch: pa.Table) -> pa.Table:
    """varint -> gamma: one vectorized varint decode of the whole batch,
    one bit-scatter encode; posting streams stay aligned via pos_cnts."""
    if batch.num_rows == 0:
        return batch
    cnts_flat, row_bounds, _, data = _cells(batch)
    vals = decode_varints(data).astype(np.int64)
    nvals = cnts_flat + 1
    hdr = np.cumsum(nvals) - nvals
    keep = np.ones(len(vals), dtype=bool)
    keep[hdr] = False
    payload = vals[keep]
    blob, bo = encode_gamma_blob(payload, cnts_flat)
    cells = [
        blob[bo[row_bounds[r]] : bo[row_bounds[r + 1]]]
        for r in range(batch.num_rows)
    ]
    return _swap_positions(batch, cells)


def _to_varint(batch: pa.Table) -> pa.Table:
    """gamma -> varint: the payload deltas re-encode verbatim (both
    formats store ``count+1`` then per-posting deltas)."""
    if batch.num_rows == 0:
        return batch
    cnts_flat, row_bounds, _, data = _cells(batch)
    payload = gamma_blob_payload(data, cnts_flat)
    blob, bo = encode_stream_blob(payload, cnts_flat)
    cells = [
        blob[bo[row_bounds[r]] : bo[row_bounds[r + 1]]]
        for r in range(batch.num_rows)
    ]
    return _swap_positions(batch, cells)


def transcode_positions(
    segment_dir: str, new_dir: str, codec: str = "gamma"
) -> str:
    """Rewrite ``segment_dir``'s postings positions column into ``codec``
    under ``new_dir`` (hardlinking every codec-independent file) and
    commit a ``reverse`` manifest recording the codec + lineage.

    Resume-idempotent: the manifest commits last, so a crashed attempt
    is detected and restarted clean; a committed ``new_dir`` with the
    requested codec returns immediately.
    """
    import ray.data as rd
    import pyarrow.compute as pc

    if codec not in CODECS:
        raise ValueError(f"codec must be one of {CODECS}, got {codec!r}")
    segment_dir = os.path.abspath(segment_dir)
    new_dir = os.path.abspath(new_dir)
    cur = positions_codec(segment_dir)
    if cur == codec:
        raise ValueError(f"segment already stores {codec} positions")
    if mf.is_committed(new_dir, "reverse"):
        if positions_codec(new_dir) == codec:
            return new_dir
        raise ValueError(f"{new_dir} exists with a different codec")
    if not mf.is_committed(segment_dir, "reverse"):
        raise ValueError(f"{segment_dir} has no committed reverse phase")

    from .delta import _link_tree

    if os.path.exists(new_dir):
        shutil.rmtree(new_dir)
    os.makedirs(new_dir, exist_ok=True)
    for name in os.listdir(segment_dir):
        if name == "postings":
            continue
        _link_tree(os.path.join(segment_dir, name), os.path.join(new_dir, name))
    # drop the linked reverse manifest: it must commit LAST, rewritten
    os.remove(mf.manifest_path(new_dir, "reverse"))

    fn = _to_gamma if codec == "gamma" else _to_varint

    def _cast_part(batch: pa.Table) -> pa.Table:
        i = batch.schema.get_field_index("part")
        return batch.set_column(i, "part", pc.cast(batch["part"], pa.int32()))

    (
        rd.read_parquet(os.path.join(segment_dir, "postings"))
        .map_batches(_cast_part, batch_format="pyarrow")
        .map_batches(fn, batch_format="pyarrow")
        .write_parquet(
            os.path.join(new_dir, "postings"), partition_cols=["part"]
        )
    )

    old = mf.read_manifest(segment_dir, "reverse")
    old.pop("committed_at", None)
    old["positions_codec"] = codec
    # record file paths under the ORIGINAL root: the linked root manifest
    # still says out_dir=segment_dir, and state.verify rebases every
    # recorded path from that root onto the segment's actual location —
    # recording new_dir paths here would break that uniform transform
    old["files"] = [
        os.path.join(segment_dir, os.path.relpath(f, new_dir))
        for f in mf.list_phase_files(new_dir, "postings")
    ]
    old.setdefault("lineage", {})
    old["lineage"] = dict(old["lineage"])
    old["lineage"]["transcoded_from"] = segment_dir
    old["lineage"]["from_codec"] = cur
    mf.commit_manifest(new_dir, "reverse", old)
    return new_dir
