"""Stream-shaped operators over the events table (ray_guide: Ray Data has
no event-time windows; treat the input as a partitioned log — hash-bucket
by key, sort within the bucket, window with vectorized pandas).

Ordering assumption: all events of one key land in one bucket (hash
partitioning guarantees it); at cluster scale the events table would be
pre-partitioned by key hash so the bucketing shuffle is free.
"""

from __future__ import annotations

import pandas as pd
import ray.data

from .agg import bucketed_map_groups, grouped_agg


def tumbling_window_agg(
    events: ray.data.Dataset,
    *,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    freq: str = "h",
    final: str = "driver",
) -> pd.DataFrame:
    """Count + sum per (key, tumbling window). Map-side partials shrink the
    exchange to one row per (key, window) per block; the final combine is
    driver-side for modest window counts (set final='bucketed' for huge
    key x window domains)."""

    def pre(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch[[key_col, ts_col, value_col]].copy()
        b["window_start"] = b[ts_col].dt.floor(freq)
        return b

    out = grouped_agg(
        events,
        [key_col, "window_start"],
        {"n_events": (value_col, "count"), "sum_value": (value_col, "sum")},
        pre=pre,
        final=final,
    )
    if isinstance(out, pd.DataFrame):
        out["n_events"] = out["n_events"].astype("int64")
    return out


def window_over(
    ds: ray.data.Dataset,
    *,
    key_col: str,
    order_cols: list[str],
    assign,
    num_buckets: int = 32,
    empty_result: pd.DataFrame | None = None,
) -> ray.data.Dataset:
    """SQL window-function engine: ``... OVER (PARTITION BY key ORDER BY
    order_cols)`` as ONE hash-bucket shuffle on the partition key plus one
    vectorized pandas pass per bucket. ``assign(sorted_bucket, grouper)``
    receives the bucket already sorted by (key, *order_cols) and a
    ``sorted_bucket.groupby(key_col)`` grouper; it returns the output
    frame (typically the pass-through keys plus the window columns —
    cumulative sums via ``grouper[c].cumsum()``, lag via
    ``grouper[c].shift()``, ranks via ``grouper[c].rank()``).

    Scale story: the only exchange is the bucket shuffle (same key a
    downstream groupby would need anyway); each key's rows are contiguous
    in exactly one bucket, so every window family (frame-less aggregates,
    offsets, ranks) is a single O(bucket) vectorized pass. Assumes no
    single key exceeds a bucket's memory — the same per-key-fits
    assumption SQL engines make before spilling a window partition."""

    def per_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        b = bucket.sort_values([key_col, *order_cols], kind="mergesort")
        return assign(b, b.groupby(key_col, sort=False))

    return bucketed_map_groups(
        ds, key_col, per_bucket, num_buckets=num_buckets, empty_result=empty_result
    )


def sessionize(
    events: ray.data.Dataset,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> ray.data.Dataset:
    """Per-key session counts with a gap rule: hash-bucket by key (one
    shuffle on a small int), then ONE vectorized pandas pass per bucket —
    sort by (key, ts), mark gap>threshold boundaries, sum per key."""
    gap = pd.Timedelta(minutes=gap_minutes)

    def per_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        b = bucket.sort_values([key_col, ts_col], kind="mergesort")
        new_key = b[key_col] != b[key_col].shift()
        gap_break = (b[ts_col] - b[ts_col].shift() > gap) & ~new_key
        out = (
            pd.DataFrame(
                {key_col: b[key_col], "_start": (new_key | gap_break).astype("int64")}
            )
            .groupby(key_col, as_index=False)
            .agg(n_sessions=("_start", "sum"), n_events=("_start", "size"))
        )
        return out.astype({key_col: "int64", "n_sessions": "int64", "n_events": "int64"})

    return bucketed_map_groups(events, key_col, per_bucket, num_buckets=32)
