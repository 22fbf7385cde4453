"""Storage-layout operators: Z-order (Morton) keys for multi-column data
clustering.

At 100 TB the dominant cost of a selective two-column range query is how
many files its predicate touches. Sorting the corpus by the interleaved
bits of the two key columns before a partitioned write gives every output
file a tight bounding box in BOTH dimensions, so min/max parquet column
stats prune files for either predicate — the standard Delta/Iceberg
``OPTIMIZE ZORDER BY`` technique, here as a plain Dataset transform
(``zorder_key`` + ``Dataset.sort``) feeding the existing partitioned
writers.

The interleave is pure int64 bit arithmetic (shift/or/mask), so the SQL
twin (:func:`zorder_sql_expr`) computes the identical key in DuckDB —
another member of the integer-exact oracle family.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

_MASKS = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def _spread16(x: np.ndarray) -> np.ndarray:
    """Spread the low 16 bits of ``x`` onto the even bit positions of a
    32-bit lane (classic Morton magic masks)."""
    x = x.astype(np.int64) & 0xFFFF
    for shift, mask in _MASKS:
        x = (x | (x << shift)) & mask
    return x


def morton_interleave(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Morton code of (a % 2^16, b % 2^16): bits of ``a`` on even
    positions, ``b`` on odd — int64, vectorized."""
    return _spread16(a) | (_spread16(b) << 1)


def zorder_key(
    ds: ray.data.Dataset,
    col_a: str,
    col_b: str,
    *,
    out_col: str = "zkey",
) -> ray.data.Dataset:
    """Attach the Morton key of ``(col_a % 2^16, col_b % 2^16)`` —
    stateless vectorized map, zero shuffle. Follow with ``ds.sort(out_col)``
    (ONE range shuffle) and a partitioned write to cluster storage by both
    dimensions at once."""

    def add(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch[out_col] = morton_interleave(
            batch[col_a].to_numpy().astype(np.int64),
            batch[col_b].to_numpy().astype(np.int64),
        )
        return batch

    return ds.map_batches(add, batch_format="pandas")


def _spread16_sql(expr: str) -> str:
    e = f"(({expr}) & 65535)"
    for shift, mask in _MASKS:
        e = f"((({e}) | (({e}) << {shift})) & {mask})"
    return e


def zorder_sql_expr(col_a: str, col_b: str) -> str:
    """DuckDB expression computing the same Morton key as
    :func:`morton_interleave` (int64 shift/or/mask — bit-identical)."""
    return f"({_spread16_sql(col_a)} | ({_spread16_sql(col_b)} << 1))"
