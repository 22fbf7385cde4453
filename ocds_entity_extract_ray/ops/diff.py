"""Distributed table diff — the data-validation primitive a 100 TB
engine needs for migration checks, replica verification and regression
gates: compare two keyed datasets and emit one row per differing key.

Shape: each side is projected per batch to (key, row_hash) — a uint64
SipHash of the non-key columns, ~17 bytes/row on the wire regardless of
row width — then ONE bucket shuffle co-locates each key's two hashes and
a vectorized outer merge classifies it as only_left / only_right /
changed. Equal keys are dropped in the bucketed pass, so the OUTPUT is
difference-sized even when the inputs are 100 TB.

Contract: ``key_col`` must be unique per side (snapshot semantics, the
same contract a keyed diff has anywhere); violations raise in the
bucketed pass rather than silently mis-classifying.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from .agg import bucketed_map_groups

_SIDE_LEFT = np.int8(0)
_SIDE_RIGHT = np.int8(1)


def _project(side: int, key_col: str, compare_cols: list[str] | None):
    def f(batch: pd.DataFrame) -> pd.DataFrame:
        cols = compare_cols or [c for c in batch.columns if c != key_col]
        h = pd.util.hash_pandas_object(batch[cols], index=False)
        return pd.DataFrame(
            {
                key_col: batch[key_col],
                "_h": h.to_numpy().view("int64"),
                "_side": np.full(len(batch), side, dtype=np.int8),
            }
        )

    return f


def dataset_diff(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    key_col: str,
    *,
    compare_cols: list[str] | None = None,
    num_buckets: int = 64,
    key_dtype: str = "int64",
) -> ray.data.Dataset:
    """Emit (key, status) for every key whose row differs between the two
    sides: ``only_left``, ``only_right`` or ``changed``. Keys whose rows
    are identical produce nothing."""
    lp = left.map_batches(_project(_SIDE_LEFT, key_col, compare_cols), batch_format="pandas")
    rp = right.map_batches(_project(_SIDE_RIGHT, key_col, compare_cols), batch_format="pandas")

    def per_bucket(b: pd.DataFrame) -> pd.DataFrame:
        l = b[b["_side"] == _SIDE_LEFT]
        r = b[b["_side"] == _SIDE_RIGHT]
        for side, frame in (("left", l), ("right", r)):
            if frame[key_col].duplicated().any():
                dup = frame.loc[frame[key_col].duplicated(), key_col].iloc[0]
                raise ValueError(
                    f"dataset_diff requires unique keys per side; duplicate "
                    f"{key_col}={dup!r} on the {side} side"
                )
        # nullable Int64 keeps the outer merge's missing sides from
        # upcasting the hashes to float64 — at 53-bit precision two hashes
        # within one ulp would compare equal and a changed row would
        # silently vanish from the diff
        m = l[[key_col, "_h"]].astype({"_h": "Int64"}).merge(
            r[[key_col, "_h"]].astype({"_h": "Int64"}),
            on=key_col,
            how="outer",
            suffixes=("_l", "_r"),
        )
        status = np.where(
            m["_h_l"].isna(),
            "only_right",
            np.where(m["_h_r"].isna(), "only_left", "changed"),
        )
        out = pd.DataFrame({key_col: m[key_col], "status": status})
        same = (m["_h_l"] == m["_h_r"]).fillna(False)
        return out[~same.to_numpy()]

    empty = pd.DataFrame(
        {key_col: pd.Series(dtype=key_dtype), "status": pd.Series(dtype="object")}
    )
    return bucketed_map_groups(
        lp.union(rp), key_col, per_bucket, num_buckets=num_buckets, empty_result=empty
    )
