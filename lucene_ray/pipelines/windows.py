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


def hopping_counts(sf_dir: str, window_minutes: int = 60, hop_minutes: int = 15):
    """Hopping (sliding) window aggregate: each event belongs to
    window/hop overlapping windows — the event is exploded into its member
    windows in the batch map (vectorized np.repeat), then one groupby.
    (event_type, window_start, n_events)."""
    from ray.data.aggregate import Count

    win_us = window_minutes * 60 * 1_000_000
    hop_us = hop_minutes * 60 * 1_000_000
    n_hops = win_us // hop_us

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        # latest hop-aligned window start containing the event, then walk back
        base = ts // hop_us * hop_us
        starts = (base[:, None] - np.arange(n_hops, dtype=np.int64)[None, :] * hop_us)
        valid = starts + win_us > ts[:, None]        # event inside [start, start+win)
        et = np.repeat(df["event_type"].to_numpy(), n_hops)
        flat = starts.reshape(-1)
        keep = valid.reshape(-1)
        return pd.DataFrame({"event_type": et[keep],
                             "window_start": flat[keep].astype("datetime64[us]")})

    return (_read_events(sf_dir, columns=("ts", "event_type"))
            .map_batches(explode, batch_format="pandas")
            .groupby(["event_type", "window_start"])
            .aggregate(Count(alias_name="n_events")))


def windowed_topk_users(sf_dir: str, minutes: int = 1440, k: int = 3):
    """Windowed grouped top-k: per tumbling window, the k most active users
    (window_start, rank, user_id, n_events) — partial counts per batch, one
    groupby-sum, then a tiny per-window top-k map_groups."""
    from ray.data.aggregate import Sum

    step_us = minutes * 60 * 1_000_000

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        win = ts // step_us * step_us
        g = (pd.DataFrame({"window_start": win, "user_id": df["user_id"]})
             .groupby(["window_start", "user_id"]).size().rename("n").reset_index())
        return g

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["n", "user_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        return pd.DataFrame({
            "window_start": g["window_start"].astype("int64"),
            "rank": np.arange(1, len(g) + 1, dtype="int64"),
            "user_id": g["user_id"].astype("int64"),
            "n_events": g["n"].astype("int64"),
        })

    return (_read_events(sf_dir, columns=("ts", "user_id"))
            .map_batches(partial, batch_format="pandas")
            .groupby(["window_start", "user_id"])
            .aggregate(Sum("n", alias_name="n"))
            .groupby("window_start")
            .map_groups(topk, batch_format="pandas"))
