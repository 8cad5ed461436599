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
import pyarrow as pa


def _read_events(sf_dir: str, columns=("event_id", "ts", "user_id", "event_type", "value")):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/events.parquet", columns=list(columns))


def tumbling_counts(sf_dir: str, minutes: int = 60):
    """Tumbling-window aggregate: (event_type, window_start, n_events).
    Counts combine per batch BEFORE the exchange (map-side combiner), so
    the shuffle moves one row per (type, window) per batch instead of one
    per event — the value domain is bounded, the corpus is not."""
    from ray.data.aggregate import Sum

    step_us = minutes * 60 * 1_000_000

    def partial(t: pa.Table) -> pa.Table:
        ts = t.column("ts").to_numpy().astype("datetime64[us]").astype("int64")
        win = (ts // step_us * step_us).astype("datetime64[us]")
        g = pa.table({"event_type": t.column("event_type"),
                      "window_start": pa.array(win)}) \
            .group_by(["event_type", "window_start"]) \
            .aggregate([([], "count_all")])
        return g.rename_columns(["event_type", "window_start", "n"])

    return (_read_events(sf_dir, columns=("ts", "event_type"))
            .map_batches(partial, batch_format="pyarrow")
            .groupby(["event_type", "window_start"])
            .aggregate(Sum("n", alias_name="n_events")))


def sessionize(sf_dir: str, gap_minutes: int = 30):
    """Session windows per user (gap > gap_minutes starts a new session):
    (user_id, session_id, n_events) — groupby(user).map_groups over ts order."""
    gap_us = gap_minutes * 60 * 1_000_000

    def sessions(g: pa.Table) -> pa.Table:
        g = g.sort_by([("ts", "ascending"), ("event_id", "ascending")])
        ts = g.column("ts").to_numpy().astype("datetime64[us]").astype("int64")
        uid = g.column("user_id").to_numpy().astype(np.int64)
        new = np.ones(len(ts), dtype=bool)
        new[1:] = ((ts[1:] - ts[:-1]) > gap_us) | (uid[1:] != uid[:-1])
        sid_all = np.cumsum(new)
        # per-user session ids restart at 1 (sid minus the user's first sid +1)
        ustart = np.ones(len(ts), dtype=bool)
        ustart[1:] = uid[1:] != uid[:-1]
        base = sid_all[np.nonzero(ustart)[0]]
        sid = sid_all - np.repeat(base, np.diff(np.concatenate(
            (np.nonzero(ustart)[0], [len(ts)])))) + 1
        # session sizes via run-length over (uid, sid) boundaries
        b = np.nonzero(new)[0]
        sizes = np.diff(np.concatenate((b, [len(ts)])))
        return pa.table({"user_id": pa.array(uid[b]),
                         "session_id": pa.array(sid[b].astype(np.int64)),
                         "n_events": pa.array(sizes.astype(np.int64))})

    return (_read_events(sf_dir, columns=("event_id", "ts", "user_id"))
            .groupby("user_id")
            .map_groups(sessions, batch_format="pyarrow"))


def hopping_counts(sf_dir: str, window_minutes: int = 60, hop_minutes: int = 15):
    """Hopping (sliding) window aggregate: each event belongs to
    window/hop overlapping windows — the event is exploded into its member
    windows in the batch map (vectorized np.repeat), then one groupby.
    (event_type, window_start, n_events)."""
    from ray.data.aggregate import Sum

    win_us = window_minutes * 60 * 1_000_000
    hop_us = hop_minutes * 60 * 1_000_000
    n_hops = win_us // hop_us

    def explode_partial(t: pa.Table) -> pa.Table:
        ts = t.column("ts").to_numpy().astype("datetime64[us]").astype("int64")
        # latest hop-aligned window start containing the event, then walk back
        base = ts // hop_us * hop_us
        starts = (base[:, None] - np.arange(n_hops, dtype=np.int64)[None, :] * hop_us)
        valid = starts + win_us > ts[:, None]        # event inside [start, start+win)
        flat = starts.reshape(-1)
        keep = valid.reshape(-1)
        et = t.column("event_type")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        idx = np.repeat(np.arange(t.num_rows), n_hops)[keep]
        # combine BEFORE the exchange: the x(window/hop) explosion never
        # leaves the batch — one row per (type, window) per batch ships
        g = pa.table({"event_type": et.take(pa.array(idx)),
                      "window_start": pa.array(
                          flat[keep].astype("datetime64[us]"))}) \
            .group_by(["event_type", "window_start"]) \
            .aggregate([([], "count_all")])
        return g.rename_columns(["event_type", "window_start", "n"])

    return (_read_events(sf_dir, columns=("ts", "event_type"))
            .map_batches(explode_partial, batch_format="pyarrow")
            .groupby(["event_type", "window_start"])
            .aggregate(Sum("n", alias_name="n_events")))


def windowed_topk_users(sf_dir: str, minutes: int = 1440, k: int = 3):
    """Windowed grouped top-k: per tumbling window, the k most active users
    (window_start, rank, user_id, n_events) — partial counts per batch, one
    groupby-sum, then a tiny per-window top-k map_groups."""
    from ray.data.aggregate import Sum

    step_us = minutes * 60 * 1_000_000

    def partial(t: pa.Table) -> pa.Table:
        ts = t.column("ts").to_numpy().astype("datetime64[us]").astype("int64")
        win = ts // step_us * step_us
        g = pa.table({"window_start": pa.array(win),
                      "user_id": t.column("user_id")}) \
            .group_by(["window_start", "user_id"]).aggregate([([], "count_all")])
        return g.rename_columns(["window_start", "user_id", "n"])

    def topk(g: pa.Table) -> pa.Table:
        g = g.sort_by([("n", "descending"), ("user_id", "ascending")]).slice(0, k)
        return pa.table({
            "window_start": pa.compute.cast(g.column("window_start"), pa.int64()),
            "rank": pa.array(np.arange(1, g.num_rows + 1, dtype="int64")),
            "user_id": pa.compute.cast(g.column("user_id"), pa.int64()),
            "n_events": pa.compute.cast(g.column("n"), pa.int64()),
        })

    return (_read_events(sf_dir, columns=("ts", "user_id"))
            .map_batches(partial, batch_format="pyarrow")
            .groupby(["window_start", "user_id"])
            .aggregate(Sum("n", alias_name="n"))
            .groupby("window_start")
            .map_groups(topk, batch_format="pyarrow"))
