"""Reshape operators: unpivot/melt (the inverse of the crosstab pivot in
pipelines/relational.q_pivot_segment_priority).

Embarrassingly parallel — melting is row-local, so it is one stateless
``map_batches`` with zero shuffle, and output size is exactly
``len(value_cols)`` x input rows.
"""

from __future__ import annotations

import pandas as pd
import ray.data


def unpivot(
    ds: ray.data.Dataset,
    id_cols: list[str],
    value_cols: list[str],
    *,
    var_name: str = "metric",
    value_name: str = "value",
) -> ray.data.Dataset:
    """Melt ``value_cols`` into ``(id_cols..., var_name, value_name)``
    rows. All value columns must share a dtype (the melted column gets
    one type — same contract as SQL UNPIVOT)."""

    def melt(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.melt(
            id_vars=id_cols,
            value_vars=value_cols,
            var_name=var_name,
            value_name=value_name,
        )
        return out.astype({var_name: str})

    return ds.map_batches(melt, batch_format="pandas")


def unpivot_sql(
    inner_sql: str,
    id_cols: list[str],
    value_cols: list[str],
    *,
    var_name: str = "metric",
    value_name: str = "value",
) -> str:
    """DuckDB twin of :func:`unpivot` — UNION ALL of one SELECT per value
    column (portable ANSI shape rather than DuckDB's UNPIVOT extension)."""
    ids = ", ".join(id_cols)
    selects = [
        f"SELECT {ids}, '{c}' AS {var_name}, {c} AS {value_name} FROM src"
        for c in value_cols
    ]
    return f"WITH src AS ({inner_sql}) " + " UNION ALL ".join(selects)
