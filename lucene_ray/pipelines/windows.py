"""Streaming-shaped operators over the `events` table (ts-ordered log).

Ray Data has no event-time windows; per the streaming guide pattern the
input is treated as a partitioned ordered log: tumbling windows become a
groupby over a derived bucket column; sessionization is
groupby(user_id).map_groups over the ts-sorted group (gap-and-island).
Counterpart of the reference's NRT/Monitor "incremental state" surface
(SURVEY §2.10) re-expressed batch-first.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _read_events(sf_dir: str, columns=("event_id", "ts", "user_id", "event_type", "value")):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/events.parquet", columns=list(columns))


def tumbling_counts(sf_dir: str, minutes: int = 60):
    """Tumbling-window aggregate: (event_type, window_start, n_events)."""
    from ray.data.aggregate import Count

    step = np.timedelta64(minutes * 60 * 1_000_000, "us")

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        ts = df["ts"].to_numpy().astype("datetime64[us]")
        win = ts.astype("int64") // int(step.astype("int64")) * int(step.astype("int64"))
        return pd.DataFrame({"event_type": df["event_type"],
                             "window_start": win.astype("datetime64[us]")})

    return (_read_events(sf_dir, columns=("ts", "event_type"))
            .map_batches(bucket, batch_format="pandas")
            .groupby(["event_type", "window_start"])
            .aggregate(Count(alias_name="n_events")))


def sessionize(sf_dir: str, gap_minutes: int = 30):
    """Session windows per user (gap > gap_minutes starts a new session):
    (user_id, session_id, n_events) — groupby(user).map_groups over ts order."""
    gap_us = gap_minutes * 60 * 1_000_000

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        new = np.ones(len(g), dtype=bool)
        new[1:] = (ts[1:] - ts[:-1]) > gap_us
        sid = np.cumsum(new)
        out = pd.DataFrame({"user_id": g["user_id"].to_numpy(), "session_id": sid})
        return (out.groupby(["user_id", "session_id"]).size()
                .rename("n_events").reset_index().astype("int64"))

    return (_read_events(sf_dir, columns=("event_id", "ts", "user_id"))
            .groupby("user_id")
            .map_groups(sessions, batch_format="pandas"))
