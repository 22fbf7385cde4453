"""Stream-shaped operators over the events table (ray_guide: Ray Data has
no event-time windows; treat the input as a partitioned log — groupby key,
sort by ts within the group, window with pandas inside map_groups).

Ordering assumption: all windows/sessions for one key fit one group; at
cluster scale the events table is hash-partitioned by key and each group is
processed whole (documented partitioning assumption, SURVEY §2.8)."""

from __future__ import annotations

import pandas as pd
import ray.data


def tumbling_window_agg(
    events: ray.data.Dataset,
    *,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    freq: str = "h",
) -> ray.data.Dataset:
    """Count + sum per (key, tumbling window). A pre-aggregation inside
    map_batches shrinks the shuffle to one row per (key, window) per block
    before the global groupby."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch[[key_col, ts_col, value_col]].copy()
        b["window_start"] = b[ts_col].dt.floor(freq)
        g = (
            b.groupby([key_col, "window_start"], as_index=False)
            .agg(n_events=(value_col, "size"), sum_value=(value_col, "sum"))
        )
        return g

    partials = events.map_batches(partial, batch_format="pandas")

    def final(group: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                key_col: [group[key_col].iloc[0]],
                "window_start": [group["window_start"].iloc[0]],
                "n_events": [int(group["n_events"].sum())],
                "sum_value": [float(group["sum_value"].sum())],
            }
        )

    return partials.groupby([key_col, "window_start"]).map_groups(
        final, batch_format="pandas"
    )


def sessionize(
    events: ray.data.Dataset,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> ray.data.Dataset:
    """Session counts per key: sort a key's events by ts, close a session
    when the gap exceeds ``gap_minutes``. Output (key, n_sessions, n_events)."""
    gap = pd.Timedelta(minutes=gap_minutes)

    def per_key(group: pd.DataFrame) -> pd.DataFrame:
        ts = group[ts_col].sort_values()
        n_sessions = int((ts.diff() > gap).sum()) + 1 if len(ts) else 0
        return pd.DataFrame(
            {
                key_col: [group[key_col].iloc[0]],
                "n_sessions": [n_sessions],
                "n_events": [len(group)],
            }
        ).astype({key_col: "int64", "n_sessions": "int64", "n_events": "int64"})

    return events.groupby(key_col).map_groups(per_key, batch_format="pandas")
