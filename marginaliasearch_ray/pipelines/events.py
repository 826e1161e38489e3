"""Windowed aggregates over the events stream table.

Ray Data has no event-time windowing; tumbling windows are expressed as
a plain groupby on (key, floor(ts / width)) — an exact, shuffle-once
mapping.  Session windows need ordered per-key state and use
``groupby(key).map_groups`` over ts-sorted groups (ordering assumption:
one group holds all events of a key).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
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


def session_windows(sf_dir: str, gap_s: int = 1800):
    """(user_id, session_start, session_end, n_events) — session windows
    with a max-gap rule, computed per user inside map_groups over the
    ts-sorted group (stateful-window custom operator; documented
    partitioning assumption: all events of a user in one group)."""
    import ray.data

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts")
        ts = g["ts"].to_numpy()
        gaps = np.diff(ts).astype("timedelta64[us]").astype(np.int64)
        new_session = np.concatenate([[True], gaps > gap_s * 1_000_000])
        sid = np.cumsum(new_session)
        out = (
            pd.DataFrame({"ts": ts, "sid": sid})
            .groupby("sid")["ts"]
            .agg(["min", "max", "count"])
            .reset_index(drop=True)
        )
        return pd.DataFrame(
            {
                "user_id": g["user_id"].iloc[0],
                "session_start": out["min"],
                "session_end": out["max"],
                "n_events": out["count"].astype("int64"),
            }
        )

    return ds.groupby("user_id").map_groups(sessions, batch_format="pandas")
