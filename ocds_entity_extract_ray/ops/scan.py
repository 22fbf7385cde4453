"""Distributed prefix scan + deterministic document packing.

A training-data pipeline packs documents into fixed-token-budget training
sequences. The deterministic variant implemented here assigns each doc
(in global id order) ``pack_id = floor(tokens_before_doc / budget)`` —
contiguous chunking where a document belongs to the pack its START falls
in. That needs a GLOBAL prefix sum, which is inherently sequential; the
distributed shape is the classic two-pass scan:

  pass 1 (map): per-doc token counts; per-RANGE sums (one small row per
    contiguous id range) -> driver computes the K-entry prefix over range
    sums (K = num_ranges, never rows) -> broadcast offsets.
  pass 2 (map): each range, co-located via one bucketed shuffle, sorts by
    id and emits in-range cumsum + its range offset.

Nothing driver-side ever exceeds num_ranges rows; the corpus text is read
once and only (id, n_tokens) rows move through the shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from .agg import bucketed_map_groups, grouped_agg


def pack_documents(
    ds: ray.data.Dataset,
    *,
    budget: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_ranges: int = 64,
) -> ray.data.Dataset:
    """(id, n_tokens, pack_id) with pack_id = floor(prefix_tokens/budget)
    over ascending id order. Token = \\S+ run (matches the SQL twin)."""

    def counts(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                id_col: b[id_col].to_numpy().astype("int64"),
                "n_tokens": b[text_col].str.count(r"\S+").to_numpy().astype("int64"),
            }
        )

    counted = ds.map_batches(counts, batch_format="pandas").materialize()

    if counted.count() == 0:
        return ray.data.from_pandas(
            pd.DataFrame(
                {
                    id_col: pd.Series(dtype="int64"),
                    "n_tokens": pd.Series(dtype="int64"),
                    "pack_id": pd.Series(dtype="int64"),
                }
            )
        )

    # id span -> contiguous ranges (value-ordered, ids need not be dense)
    span = grouped_agg(
        counted.map_batches(lambda b: b.assign(_one=1), batch_format="pandas"),
        ["_one"],
        {"lo": (id_col, "min"), "hi": (id_col, "max")},
    )
    lo, hi = int(span["lo"][0]), int(span["hi"][0])
    width = max(1, (hi - lo + num_ranges) // num_ranges)

    def add_range(b: pd.DataFrame) -> pd.DataFrame:
        return b.assign(_range=((b[id_col] - lo) // width).astype("int64"))

    ranged = counted.map_batches(add_range, batch_format="pandas")

    # pass 1: one row per range -> K-entry driver prefix -> broadcast
    sums = grouped_agg(ranged, ["_range"], {"range_tokens": ("n_tokens", "sum")})
    sums = sums.sort_values("_range").reset_index(drop=True)
    offsets = dict(
        zip(
            sums["_range"],
            np.concatenate([[0], np.cumsum(sums["range_tokens"].to_numpy())[:-1]]),
        )
    )

    from .joins import _fetch

    ref = ray.put(offsets)

    empty = pd.DataFrame(
        {
            id_col: pd.Series(dtype="int64"),
            "n_tokens": pd.Series(dtype="int64"),
            "pack_id": pd.Series(dtype="int64"),
        }
    )

    # pass 2: in-range exclusive cumsum + range offset
    def scan_range(bucket: pd.DataFrame) -> pd.DataFrame:
        offs = _fetch(ref)
        parts = []
        for rng, grp in bucket.groupby("_range", sort=False):
            g = grp.sort_values(id_col, kind="mergesort")
            tok = g["n_tokens"].to_numpy()
            before = int(offs[rng]) + np.concatenate([[0], np.cumsum(tok)[:-1]])
            parts.append(
                pd.DataFrame(
                    {
                        id_col: g[id_col].to_numpy(),
                        "n_tokens": tok,
                        "pack_id": (before // budget).astype("int64"),
                    }
                )
            )
        return pd.concat(parts, ignore_index=True) if parts else empty.copy()

    return bucketed_map_groups(
        ranged, "_range", scan_range, num_buckets=min(num_ranges, 32),
        empty_result=empty,
    )
