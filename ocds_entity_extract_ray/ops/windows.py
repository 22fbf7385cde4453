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


def tumbling_window_late(
    events: ray.data.Dataset,
    *,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    arrival_col: str = "arrival_seq",
    id_col: str = "event_id",
    freq: str = "h",
    lateness: pd.Timedelta = pd.Timedelta(days=14),
    num_ranges: int = 64,
    initial_watermark_us: int | None = None,
    return_high_watermark: bool = False,
) -> pd.DataFrame:
    """Tumbling windows with an allowed-lateness watermark (DROP
    semantics): an event is LATE iff its event time is more than
    ``lateness`` behind the stream's watermark at its arrival, where the
    watermark is the running max event time over ``(arrival_col, id_col)``
    order — the standard streaming rule, evaluated deterministically over
    a batch log. Late events are excluded from the window aggregates but
    COUNTED per window (``n_late``), so the output shows both what a
    drop-policy stream would emit and what it discarded.

    Values are quantized to int64 cents PER ROW (``sum_value_cents``), so
    the aggregates are summation-order independent and hash-exact against
    the SQL twin.

    Distributed shape (the two-pass prefix scan from ops/scan.py, for a
    running MAX instead of a sum): pass 1 computes one (range, max_ts) row
    per contiguous arrival range — the driver holds num_ranges rows,
    builds the exclusive prefix max, and ships the tiny dict in the stage
    closure; pass 2 co-locates each range via one bucket shuffle, sorts it,
    and combines the in-range running max with the range's prefix. The
    watermark — inherently a sequential scan — thus costs O(num_ranges)
    driver work and one shuffle of (arrival, id, key, ts, cents) rows."""
    import numpy as np

    late_us = np.int64(int(lateness / pd.Timedelta(microseconds=1)))
    # a resumed stream (ops/streaming.py) seeds the watermark from its
    # persisted state so tick N+1 continues exactly where tick N stopped;
    # the default is "before everything" (no row can be late initially)
    w0 = np.int64(-(2**62) if initial_watermark_us is None else initial_watermark_us)

    def proj(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "arr": b[arrival_col].to_numpy().astype(np.uint64),
                "eid": b[id_col].to_numpy().astype("int64"),
                "key": b[key_col].astype(str),
                # normalize to ns first: datetime64[us].astype(int64) is µs
                "ts_us": b[ts_col]
                .astype("datetime64[ns]")
                .astype("int64")
                .to_numpy()
                // 1000,
                "win": b[ts_col].dt.floor(freq).astype("datetime64[us]"),
                "cents": np.rint(b[value_col].to_numpy() * 100).astype("int64"),
            }
        )

    # return_high_watermark=True returns (frame, max event ts_us or None)
    # — the per-range max pass already computes it, so incremental ingest
    # (ops/streaming.py) need not re-execute the events pipeline for it
    proj_ds = events.map_batches(proj, batch_format="pandas").materialize()
    empty = pd.DataFrame(
        {
            "key": pd.Series(dtype="object"),
            "window_start": pd.Series(dtype="datetime64[us]"),
            "n_events": pd.Series(dtype="int64"),
            "sum_value_cents": pd.Series(dtype="int64"),
            "n_late": pd.Series(dtype="int64"),
        }
    )
    if proj_ds.count() == 0:
        return (empty, None) if return_high_watermark else empty

    span = grouped_agg(
        proj_ds.map_batches(lambda b: b.assign(_one=1), batch_format="pandas"),
        ["_one"],
        {"lo": ("arr", "min"), "hi": ("arr", "max")},
    )
    lo, hi = int(span["lo"][0]), int(span["hi"][0])
    width = max(1, (hi - lo + num_ranges) // num_ranges)

    def add_range(b: pd.DataFrame) -> pd.DataFrame:
        r = (b["arr"].to_numpy().astype(object) - lo) // width  # uint64-safe
        return b.assign(_range=np.asarray(r, dtype="int64"))

    ranged = proj_ds.map_batches(add_range, batch_format="pandas")

    # pass 1: per-range max event time -> driver exclusive prefix max
    mx = grouped_agg(ranged, ["_range"], {"mx": ("ts_us", "max")})
    mx = mx.sort_values("_range").reset_index(drop=True)
    prefix = dict(
        zip(
            mx["_range"].astype(int),
            np.maximum(
                mx["mx"].astype("int64").cummax().shift(1, fill_value=w0), w0
            ),
        )
    )

    # pass 2: per-range running max + lateness flag, pre-shrunk to window
    # partials inside the same pass
    def per_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for r, g in bucket.groupby("_range", sort=False):
            b = g.sort_values(["arr", "eid"], kind="mergesort")
            wm = np.maximum.accumulate(b["ts_us"].to_numpy())
            wm = np.maximum(wm, np.int64(prefix[int(r)]))
            late = b["ts_us"].to_numpy() < wm - late_us
            outs.append(
                pd.DataFrame(
                    {
                        "key": b["key"].to_numpy(),
                        "window_start": b["win"].to_numpy(),
                        "on_time": (~late).astype("int64"),
                        "cents_on": b["cents"].to_numpy() * (~late),
                        "is_late": late.astype("int64"),
                    }
                )
            )
        return pd.concat(outs, ignore_index=True)

    flagged = bucketed_map_groups(
        ranged,
        "_range",
        per_bucket,
        num_buckets=min(num_ranges, 32),
        empty_result=pd.DataFrame(
            {
                "key": pd.Series(dtype="object"),
                "window_start": pd.Series(dtype="datetime64[us]"),
                "on_time": pd.Series(dtype="int64"),
                "cents_on": pd.Series(dtype="int64"),
                "is_late": pd.Series(dtype="int64"),
            }
        ),
    )
    out = grouped_agg(
        flagged,
        ["key", "window_start"],
        {
            "n_events": ("on_time", "sum"),
            "sum_value_cents": ("cents_on", "sum"),
            "n_late": ("is_late", "sum"),
        },
    )
    for c in ("n_events", "sum_value_cents", "n_late"):
        out[c] = out[c].astype("int64")
    out["window_start"] = out["window_start"].astype("datetime64[us]")
    out = out.sort_values(["key", "window_start"]).reset_index(drop=True)
    if return_high_watermark:
        return out, int(mx["mx"].astype("int64").max())
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
