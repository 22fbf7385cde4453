"""Table profiling — per-column data-quality stats (row/null counts,
exact distinct cardinality, min/max) in two distributed passes. The
ingest-validation step a 100 TB pipeline runs before trusting a new drop
of Parquet.

Pass 1 (no shuffle): every block emits ONE tiny partial row per profiled
column — null count, row count, and the block-local min/max kept in
dtype-classed columns (int64 / string / timestamp) so the driver-side
merge of the block partials compares NATIVELY (stringifying early would
sort "10" < "9"). The collected frame is O(blocks x columns), never
data-sized.

Pass 2 (one shuffle): distincts. Each column is projected to
``(col_name, value-as-string)`` rows (injective per column for the
supported dtypes, so distinct counts are preserved). Below the HLL
threshold the union is bucket-deduplicated on the value and per-column
counts summed — the shuffle carries each distinct value once per
appearance, nothing lands on the driver but the k-row result. ABOVE the
threshold (or with ``distinct_mode="hll"``) the exact exchange is
replaced by the grouped HyperLogLog sketch: fixed-size register partials
per (column, block), a tiny max-merge shuffle, ~1.6% relative error —
the only shape that survives 100 TB, where the exact pass is a
full-corpus re-exchange per profiled column.

Supported dtypes: integers, strings, datetimes. Floats are rejected —
their VARCHAR rendering is not portable across engines, which would break
the profile's SQL twin (and float min/max belongs in a numeric summary,
not a string profile).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from .agg import bucketed_map_groups, grouped_agg

_CLASSES = ("i", "s", "t")  # int64 / string / timestamp


def _class_of(s: pd.Series) -> str:
    if pd.api.types.is_integer_dtype(s):
        return "i"
    if pd.api.types.is_datetime64_any_dtype(s):
        return "t"
    if pd.api.types.is_object_dtype(s) or pd.api.types.is_string_dtype(s):
        return "s"
    raise TypeError(
        f"profile_table: unsupported dtype {s.dtype} — profile supports "
        "integer / string / datetime columns (float rendering is not "
        "portable across engines)"
    )


HLL_DEFAULT_THRESHOLD = 10_000_000


def profile_table(
    ds: ray.data.Dataset,
    columns: list[str],
    *,
    num_buckets: int = 32,
    distinct_mode: str = "auto",
    hll_threshold: int = HLL_DEFAULT_THRESHOLD,
) -> pd.DataFrame:
    """Profile ``columns`` of ``ds``: returns a tidy k-row frame
    ``(col_name, n_rows, n_nulls, n_distinct, min_value, max_value)``
    with min/max rendered as strings AFTER native-dtype comparison,
    ordered by col_name.

    ``distinct_mode`` picks pass 2: ``"exact"`` ships every (col, value)
    through one dedup shuffle; ``"hll"`` replaces it with the grouped
    HyperLogLog sketch (ops/sketches.py — fixed 2^12 B per (col, block)
    partial, NO value shuffle, ~1.6% relative error); ``"auto"``
    (default) uses the row count pass 1 already produced and switches to
    HLL above ``hll_threshold`` rows — at 100 TB the exact pass is a
    full-corpus re-exchange per profiled column, which is never the
    right default."""
    if distinct_mode not in ("auto", "exact", "hll"):
        raise ValueError(f"profile_table: unknown distinct_mode {distinct_mode!r}")

    def partials(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for col in columns:
            s = batch[col]
            cls = _class_of(s)
            nn = s.notna()
            row: dict = {
                "col_name": col,
                "cls": cls,
                "n_rows": len(s),
                "n_nulls": int((~nn).sum()),
            }
            for c in _CLASSES:
                row[f"min_{c}"] = None
                row[f"max_{c}"] = None
            if nn.any():
                vals = s[nn]
                row[f"min_{cls}"] = vals.min()
                row[f"max_{cls}"] = vals.max()
            rows.append(row)
        out = pd.DataFrame(rows)
        return out.astype(
            {"min_i": "Int64", "max_i": "Int64", "n_rows": "int64", "n_nulls": "int64"}
        )

    stats = ds.map_batches(partials, batch_format="pandas").to_pandas()

    def project(batch: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for col in columns:
            # map-side pre-dedup: a low-cardinality column ships ~k rows
            # per block instead of the block. n_distinct is defined over
            # the RENDERED string (matches the SQL twin), so deduping on
            # native values is only safe where str() is injective on
            # native equality — integer/bool dtypes. Anywhere else
            # (object can hash-collapse 1/1.0/True; float equates
            # 0.0/-0.0 which render apart) we stringify FIRST and dedup
            # the strings, or the count would shrink AND become
            # partition-dependent (equal natives in different blocks both
            # survive pre-dedup).
            s = batch[col].dropna()
            if s.dtype.kind in "iub":
                s = s.drop_duplicates().astype(str)
            else:
                s = s.astype(str).drop_duplicates()
            frames.append(pd.DataFrame({"col_name": col, "value": s.to_numpy()}))
        out = pd.concat(frames, ignore_index=True)
        return out.astype({"col_name": str, "value": str})

    total_rows = (
        int(stats.loc[stats["col_name"] == columns[0], "n_rows"].sum())
        if "col_name" in stats.columns
        else 0
    )
    use_hll = distinct_mode == "hll" or (
        distinct_mode == "auto" and total_rows > hll_threshold
    )

    kv = ds.map_batches(project, batch_format="pandas")
    if use_hll:
        from .sketches import approx_count_distinct_by

        dcounts = approx_count_distinct_by(kv, "col_name", "value")
        dcounts = dcounts.rename(columns={"approx_distinct": "n_distinct"})
    else:
        empty_kv = pd.DataFrame(
            {"col_name": pd.Series(dtype=str), "value": pd.Series(dtype=str)}
        )
        distinct_kv = bucketed_map_groups(
            kv,
            "value",
            lambda b: b.drop_duplicates(["col_name", "value"]),
            num_buckets=num_buckets,
            empty_result=empty_kv,
        )
        dcounts = grouped_agg(
            distinct_kv,
            ["col_name"],
            {"n_distinct": ("value", "count")},
            final="driver",
        )

    out_rows = []
    for col in columns:
        # a zero-block dataset yields a column-less `stats` frame — emit
        # the same all-zero row per column the SQL twin produces
        part = (
            stats[stats["col_name"] == col]
            if "col_name" in stats.columns
            else stats.iloc[0:0]
        )
        if len(part):
            cls = part["cls"].iloc[0]
            mins = part[f"min_{cls}"].dropna()
            maxs = part[f"max_{cls}"].dropna()
        else:
            mins = maxs = pd.Series(dtype="object")
        nd = (
            dcounts[dcounts["col_name"] == col]["n_distinct"]
            if "col_name" in dcounts.columns
            else pd.Series(dtype="int64")
        )
        out_rows.append(
            {
                "col_name": col,
                "n_rows": int(part["n_rows"].sum()) if len(part) else 0,
                "n_nulls": int(part["n_nulls"].sum()) if len(part) else 0,
                "n_distinct": int(nd.iloc[0]) if len(nd) else 0,
                "min_value": str(mins.min()) if len(mins) else None,
                "max_value": str(maxs.max()) if len(maxs) else None,
            }
        )
    out = pd.DataFrame(out_rows).astype(
        {"n_rows": "int64", "n_nulls": "int64", "n_distinct": "int64"}
    )
    return out.sort_values("col_name").reset_index(drop=True)


def profile_sql(table: str, columns: list[str]) -> str:
    """DuckDB twin of :func:`profile_table` over a registered view."""
    selects = [
        f"SELECT '{c}' AS col_name, COUNT(*)::BIGINT AS n_rows, "
        f"(COUNT(*) - COUNT({c}))::BIGINT AS n_nulls, "
        f"COUNT(DISTINCT {c})::BIGINT AS n_distinct, "
        f"CAST(MIN({c}) AS VARCHAR) AS min_value, "
        f"CAST(MAX({c}) AS VARCHAR) AS max_value FROM {table}"
        for c in columns
    ]
    return " UNION ALL ".join(selects) + " ORDER BY col_name"
