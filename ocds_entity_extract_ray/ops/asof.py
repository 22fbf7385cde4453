"""As-of (temporal) join — a custom operator Ray Data lacks (SURVEY §2
'custom operators'): for each left row, the latest right row with the same
key and an earlier-or-equal timestamp.

Implementation (composition path): hash-bucket BOTH sides by key into one
bucket space, union, ONE sort-shuffle on the bucket int, ``pd.merge_asof``
per bucket. Partitioning assumption (documented per the brief): all rows of
one key co-locate in one bucket — guaranteed by hashing the key; bucket
count bounds skew independent of key count.
"""

from __future__ import annotations

import pandas as pd
import ray.data

from .agg import _bucket_series


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    key_col: str,
    ts_col: str,
    left_cols: list[str],
    right_cols: list[str],
    suffix: str = "_right",
    num_buckets: int = 32,
    tolerance: pd.Timedelta | None = None,
) -> ray.data.Dataset:
    """Left rows (key, ts, *left_cols) enriched with the latest right row's
    payload per key at right.ts <= left.ts; right payload columns arrive
    renamed with ``suffix``. Unmatched left rows keep nulls."""
    r_renamed = [c + suffix for c in right_cols]
    all_cols = [key_col, ts_col, "_side", "_bucket", *left_cols, *r_renamed]

    def tag_left(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch[[key_col, ts_col, *left_cols]].copy()
        b["_side"] = "l"
        b["_bucket"] = _bucket_series(b[key_col], num_buckets)
        for c in r_renamed:
            b[c] = None
        return b[all_cols]

    def tag_right(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch[[key_col, ts_col, *right_cols]].copy()
        b.columns = [key_col, ts_col, *r_renamed]
        b["_side"] = "r"
        b["_bucket"] = _bucket_series(b[key_col], num_buckets)
        for c in left_cols:
            b[c] = None
        return b[all_cols]

    lt = left.map_batches(tag_left, batch_format="pandas")
    rt = right.map_batches(tag_right, batch_format="pandas")

    def per_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        lhs = bucket[bucket["_side"] == "l"][[key_col, ts_col, *left_cols]]
        rhs = bucket[bucket["_side"] == "r"][[key_col, ts_col, *r_renamed]]
        # merge even when lhs is empty: merge_asof emits the FULL output
        # schema with inherited dtypes, keeping block schemas identical
        # across buckets (a right-only bucket must not drop *_right cols)
        lhs = lhs.sort_values(ts_col, kind="mergesort")
        rhs = rhs.sort_values(ts_col, kind="mergesort")
        return pd.merge_asof(
            lhs, rhs, on=ts_col, by=key_col, direction="backward", tolerance=tolerance
        )

    return lt.union(rt).groupby("_bucket").map_groups(per_bucket, batch_format="pandas")
