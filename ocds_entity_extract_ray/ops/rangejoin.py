"""Banded range (interval) join — the third temporal-join shape beside
``ops/asof.py`` (latest-earlier match) and ``ops/windows.py`` (fixed
windows): match each POINT row to every RANGE row of the same key whose
half-open interval [start, end) contains it.

Distributed shape (the standard banded interval join): explode each
range into every width-aligned bucket it overlaps, bucket each point
into its single bucket, then one hash-bucketed shuffle co-locates every
point with every range that could contain it; the exact interval
predicate is evaluated vectorized per bucket. Shuffle payload: each
range duplicated ceil(length / bucket_width) (+1 when it straddles a
boundary) times — proportional, never a cross product. Intervals of any
length are supported; pick bucket_width near the TYPICAL interval
length so the common case explodes ×≤2 and a rare long outlier pays
its own proportional cost.

Key contract: join keys may be any dtype — integer keys bucket
directly, anything else is crc32-hashed (the same route
``ops/agg._bucket_series`` uses). The combined (key, time-bucket)
bucket id deliberately wraps modulo 2^64: it only spreads groups, the
exact key re-groups inside each bucket.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from .agg import bucketed_map_groups


def range_join(
    points: ray.data.Dataset,
    ranges: ray.data.Dataset,
    *,
    key_col: str,
    point_ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    point_cols: list[str] | None = None,
    range_cols: list[str] | None = None,
    bucket_width: pd.Timedelta = pd.Timedelta(hours=1),
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Inner interval join: one output row per (point, containing range)
    pair of the same key. Output: key, point ts, point_cols, range_cols."""
    width_ns = int(bucket_width.value)
    point_cols = point_cols or []
    range_cols = range_cols or []

    def tag_points(b: pd.DataFrame) -> pd.DataFrame:
        ts = b[point_ts_col].astype("datetime64[ns]").astype("int64")
        out = pd.DataFrame(
            {
                "_k": b[key_col].to_numpy(),
                "_tb": ts // width_ns,
                "_kind": 0,
                "_ts": ts,
            }
        )
        for c in point_cols:
            out[f"p_{c}"] = b[c].to_numpy()
        return out

    def tag_ranges(b: pd.DataFrame) -> pd.DataFrame:
        s = b[start_col].astype("datetime64[ns]").astype("int64").to_numpy()
        e = b[end_col].astype("datetime64[ns]").astype("int64").to_numpy()
        first_tb = s // width_ns
        n_span = (e - 1) // width_ns - first_tb  # buckets beyond the first
        # explode each range into EVERY bucket it overlaps with ONE
        # np.repeat (work proportional to the OUTPUT row count): a
        # per-shift loop over the whole batch would cost
        # O(batch x longest_span) — one year-long outlier interval at 1h
        # width would scan the batch 8,760 times
        reps = np.maximum(n_span + 1, 0).astype(np.int64)  # [s,s) spans 0
        starts = np.cumsum(reps) - reps  # exclusive prefix sum, len-0 safe
        idx = np.repeat(np.arange(len(b)), reps)
        shift = np.arange(int(reps.sum()), dtype=np.int64) - np.repeat(starts, reps)
        out = pd.DataFrame(
            {
                "_k": b[key_col].to_numpy()[idx],
                "_tb": first_tb[idx] + shift,
                "_kind": 1,
                "_ts": s[idx],  # start rides in _ts, end in _te
                "_te": e[idx],
            }
        )
        for c in range_cols:
            out[f"r_{c}"] = b[c].to_numpy()[idx]
        return out

    p = points.map_batches(tag_points, batch_format="pandas").map_batches(
        lambda b: b.assign(_te=np.int64(0)), batch_format="pandas"
    )
    r = ranges.map_batches(tag_ranges, batch_format="pandas")
    # align columns for the union (missing side-columns become nulls)
    all_pc = [f"p_{c}" for c in point_cols]
    all_rc = [f"r_{c}" for c in range_cols]

    def align(b: pd.DataFrame) -> pd.DataFrame:
        for c in all_pc + all_rc:
            if c not in b.columns:
                b[c] = None
        return b[["_k", "_tb", "_kind", "_ts", "_te"] + all_pc + all_rc]

    u = p.map_batches(align, batch_format="pandas").union(
        r.map_batches(align, batch_format="pandas")
    )

    out_cols = [key_col, point_ts_col] + all_pc + all_rc
    empty = pd.DataFrame({c: pd.Series(dtype="object") for c in out_cols})

    def per_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        res = []
        for (_k, _tb), grp in bucket.groupby(["_k", "_tb"], sort=False):
            pts = grp[grp["_kind"] == 0]
            rgs = grp[grp["_kind"] == 1]
            if not len(pts) or not len(rgs):
                continue
            # vectorized containment: point x range within the small group
            ts = pts["_ts"].to_numpy()[:, None]
            s = rgs["_ts"].to_numpy()[None, :]
            e = rgs["_te"].to_numpy()[None, :]
            ip, ir = np.where((ts >= s) & (ts < e))
            if not len(ip):
                continue
            row = {
                key_col: pts["_k"].to_numpy()[ip],
                point_ts_col: pts["_ts"].to_numpy()[ip].astype("datetime64[ns]"),
            }
            for c in all_pc:
                row[c] = pts[c].to_numpy()[ip]
            for c in all_rc:
                row[c] = rgs[c].to_numpy()[ir]
            res.append(pd.DataFrame(row))
        if not res:
            return empty.copy()
        return pd.concat(res, ignore_index=True)

    def add_key(b: pd.DataFrame) -> pd.DataFrame:
        # bucket on (key, time-bucket) jointly so hot keys spread over time.
        # Integer keys bucket directly; any other dtype goes through crc32
        # (the _bucket_series route). uint64 wrap is fine: _jb only spreads
        # groups, per_bucket re-groups on the exact (_k, _tb).
        if pd.api.types.is_integer_dtype(b["_k"]):
            kh = b["_k"].to_numpy().astype(np.uint64)
        else:
            import zlib

            kh = (
                b["_k"]
                .astype(str)
                .map(lambda v: zlib.crc32(v.encode()))
                .to_numpy()
                .astype(np.uint64)
            )
        jb = kh * np.uint64(1_000_003) + b["_tb"].to_numpy().astype(np.uint64)
        return b.assign(_jb=jb.astype(np.int64))

    joined = bucketed_map_groups(
        u.map_batches(add_key, batch_format="pandas"),
        "_jb",
        per_bucket,
        num_buckets=num_buckets,
        empty_result=empty,
    )
    return joined
