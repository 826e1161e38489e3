"""Windowed aggregates over the events stream table.

Ray Data has no event-time windowing; tumbling windows are expressed as
a plain groupby on (key, floor(ts / width)) — an exact, shuffle-once
mapping.  Session windows need ordered per-key state and run in two
bounded passes: sessionize within (key, coarse time bucket) groups,
then merge boundary-crossing sessions per key over the per-bucket
summaries (see session_windows for why that is exact).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def tumbling_window(sf_dir: str, width_s: int = 3600):
    """(user_id, window_start, n_events, sum_value_r) — tumbling window
    per user; window_start is the truncated timestamp."""
    import ray.data
    from ray.data.aggregate import Count, Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"]
    )

    def win(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64())  # microseconds
        w = pc.multiply(pc.divide(ts, 1_000_000 * width_s), 1_000_000 * width_s)
        return pa.table(
            {
                "user_id": batch["user_id"],
                "window_start": w.cast(pa.timestamp("us")),
                "value": batch["value"],
            }
        )

    out = (
        ds.map_batches(win, batch_format="pyarrow")
        .groupby(["user_id", "window_start"])
        .aggregate(Count(alias_name="n_events"), Sum("value", alias_name="sum_value"))
    )

    def round_val(batch: pa.Table) -> pa.Table:
        v = np.round(batch["sum_value"].to_numpy(zero_copy_only=False), 6)
        return batch.drop_columns(["sum_value"]).append_column(
            "sum_value_r", pa.array(v, pa.float64())
        )

    return out.map_batches(round_val, batch_format="pyarrow")


def sliding_window(sf_dir: str, width_s: int = 3600, step_s: int = 900):
    """(user_id, window_start, n_events, sum_value_r) — sliding windows of
    ``width_s`` advancing by ``step_s`` (width must be a multiple of step).
    Each event is exploded into its width/step member windows (vectorized
    tile), then a single groupby aggregates — the exact, shuffle-once
    mapping of sliding windows onto Ray Data."""
    import ray.data
    from ray.data.aggregate import Count, Sum

    if width_s % step_s:
        raise ValueError("width_s must be a multiple of step_s")
    nwin = width_s // step_s
    step_us = step_s * 1_000_000

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"]
    )

    def explode(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        base = ts // step_us
        n = len(ts)
        ks = np.tile(np.arange(nwin, dtype=np.int64), n)
        w = (np.repeat(base, nwin) - ks) * step_us
        return pa.table(
            {
                "user_id": pa.array(
                    np.repeat(
                        batch["user_id"].to_numpy(zero_copy_only=False), nwin
                    ),
                    pa.int64(),
                ),
                "window_start": pa.array(w, pa.int64()).cast(pa.timestamp("us")),
                "value": pa.array(
                    np.repeat(batch["value"].to_numpy(zero_copy_only=False), nwin),
                    pa.float64(),
                ),
            }
        )

    out = (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby(["user_id", "window_start"])
        .aggregate(Count(alias_name="n_events"), Sum("value", alias_name="sum_value"))
    )

    def round_val(batch: pa.Table) -> pa.Table:
        v = np.round(batch["sum_value"].to_numpy(zero_copy_only=False), 6)
        return batch.drop_columns(["sum_value"]).append_column(
            "sum_value_r", pa.array(v, pa.float64())
        )

    return out.map_batches(round_val, batch_format="pyarrow")


def session_windows(sf_dir: str, gap_s: int = 1800, coarse_mult: int = 48):
    """(user_id, session_start, session_end, n_events) — session windows
    with a max-gap rule, exact in TWO BOUNDED passes (no per-user group
    ever holds a user's full event history):

    1. sessionize within (user_id, coarse time bucket) groups — bucket
       width is ``coarse_mult * gap``, so a group holds at most one
       bucket's events of one user;
    2. merge boundary-crossing sessions per user over the per-bucket
       session SUMMARIES.  A bucket yields at most ``coarse_mult / 2``
       sessions (each session plus its following gap spans > gap), so the
       pass-2 group is bounded by time_range / gap — independent of the
       user's event count.  A power user with 10^8 events costs pass 1
       many small groups and pass 2 a few thousand summary rows.

    Merging adjacent summaries with the same ``start - prev_end <= gap``
    rule is exact because buckets partition time: sessions sorted by
    start are also sorted by end, and only time-adjacent sessions can
    chain."""
    import ray.data

    gap_us = gap_s * 1_000_000
    coarse_us = gap_us * coarse_mult

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )

    def bucketize(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64())  # microseconds
        return pa.table(
            {
                "user_id": batch["user_id"],
                "cb": pc.divide(ts, coarse_us),
                "ts": ts,
            }
        )

    def bucket_sessions(g: pa.Table) -> pa.Table:
        ts = np.sort(g["ts"].to_numpy(zero_copy_only=False))
        new = np.ones(len(ts), dtype=bool)
        new[1:] = (ts[1:] - ts[:-1]) > gap_us
        starts = np.flatnonzero(new)
        last = np.append(starts[1:], len(ts)) - 1
        uid = g["user_id"][0].as_py()
        return pa.table(
            {
                "user_id": pa.array(
                    np.full(len(starts), uid, dtype=np.int64), pa.int64()
                ),
                "s": pa.array(ts[starts], pa.int64()),
                "e": pa.array(ts[last], pa.int64()),
                "n": pa.array(last - starts + 1, pa.int64()),
            }
        )

    def merge_user(g: pa.Table) -> pa.Table:
        s = g["s"].to_numpy(zero_copy_only=False)
        e = g["e"].to_numpy(zero_copy_only=False)
        n = g["n"].to_numpy(zero_copy_only=False)
        o = np.argsort(s, kind="stable")
        s, e, n = s[o], e[o], n[o]
        new = np.ones(len(s), dtype=bool)
        new[1:] = (s[1:] - e[:-1]) > gap_us
        firsts = np.flatnonzero(new)
        lasts = np.append(firsts[1:], len(s)) - 1
        uid = g["user_id"][0].as_py()
        return pa.table(
            {
                "user_id": pa.array(
                    np.full(len(firsts), uid, dtype=np.int64), pa.int64()
                ),
                "session_start": pa.array(s[firsts], pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "session_end": pa.array(e[lasts], pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "n_events": pa.array(
                    np.add.reduceat(n, firsts), pa.int64()
                ),
            }
        )

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby(["user_id", "cb"])
        .map_groups(bucket_sessions, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(merge_user, batch_format="pyarrow")
    )
