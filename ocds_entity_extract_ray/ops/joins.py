"""Join operators (SURVEY §2.4 → Ray Data).

The reference's only joins are broadcast-dict lookups (J1/J2) and
intra-record provenance (J3). The generalized engine needs real relational
joins for the conformance queries:

- ``broadcast_hash_join``: small side ``ray.put`` ONCE, fetched once per
  worker process (module-level cache), pandas hash-merge per batch — no
  shuffle, the right pattern for dimension tables at any scale.
- large×large: use ``Dataset.join`` (hash-partitioned; Ray >= 2.46) with an
  explicit ``num_partitions`` sized to the cluster.
- semi/anti against a SMALL key set: ``semi_join_filter`` broadcasts the key
  set and filters inside map_batches (no shuffle at all).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray
import ray.data

def default_join_partitions(min_parts: int = 8) -> int:
    """Join/shuffle parallelism scaled to the cluster (CPU count / 4,
    floor ``min_parts``) instead of a per-box constant — the number that
    must grow with cluster width at 100 TB. /4 rather than /2: each
    partition is a HashShuffleAggregator actor whose startup is on the
    query's critical path, and measured q3/q4/q5 wall-time on this box is
    flat between 8 and 16 partitions."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", min_parts))
    except Exception:
        cpus = min_parts
    return max(min_parts, cpus // 4)


def hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    join_type: str,
    *,
    on: tuple,
    right_on: tuple | None = None,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """``Dataset.join`` with both sides coerced to ARROW blocks first:
    the join's aggregators hash block schemas for deduplication, and
    pandas block schemas are unhashable (per-worker warning spam) while
    pa.Schema hashes cleanly — and Arrow is the zero-copy format the hash
    shuffle wants anyway. Partition count defaults to cluster width."""

    def as_arrow(ds: ray.data.Dataset) -> ray.data.Dataset:
        return ds.map_batches(lambda b: b, batch_format="pyarrow", zero_copy_batch=True)

    return as_arrow(left).join(
        as_arrow(right),
        join_type,
        num_partitions=num_partitions or default_join_partitions(),
        on=on,
        right_on=right_on,
    )


_BROADCAST_CACHE: dict = {}
_BROADCAST_CACHE_MAX = 32  # bounded: long-lived workers see many broadcasts


def _fetch(ref) -> pd.DataFrame:
    key = ref.hex() if hasattr(ref, "hex") else id(ref)
    if key not in _BROADCAST_CACHE:
        if len(_BROADCAST_CACHE) >= _BROADCAST_CACHE_MAX:
            _BROADCAST_CACHE.pop(next(iter(_BROADCAST_CACHE)))  # FIFO evict
        _BROADCAST_CACHE[key] = ray.get(ref)
    return _BROADCAST_CACHE[key]


def broadcast_hash_join(
    ds: ray.data.Dataset,
    small: pa.Table | pd.DataFrame,
    left_on: list[str] | str,
    right_on: list[str] | str | None = None,
    how: str = "inner",
    suffixes: tuple = ("", "_r"),
) -> ray.data.Dataset:
    """Join a big Dataset against a small in-memory table without shuffling
    the big side. ``small`` is put in the object store once; every task
    reads it from the local object store (zero re-ship per batch)."""
    small_df = small.to_pandas() if isinstance(small, pa.Table) else small
    ref = ray.put(small_df)
    left_keys = [left_on] if isinstance(left_on, str) else list(left_on)
    right_keys = (
        left_keys
        if right_on is None
        else ([right_on] if isinstance(right_on, str) else list(right_on))
    )

    def merge(batch: pd.DataFrame) -> pd.DataFrame:
        rhs = _fetch(ref)
        return batch.merge(
            rhs, how=how, left_on=left_keys, right_on=right_keys, suffixes=suffixes
        )

    return ds.map_batches(merge, batch_format="pandas")


def semi_join_filter(
    ds: ray.data.Dataset, keys, on: str, anti: bool = False
) -> ray.data.Dataset:
    """Semi/anti join against a broadcast key set (ray_guide: 'broadcast the
    key set and filter inside map_batches')."""
    ref = ray.put(frozenset(keys))

    def flt(batch: pd.DataFrame) -> pd.DataFrame:
        keyset = _fetch(ref)
        mask = batch[on].isin(keyset)
        return batch[~mask] if anti else batch[mask]

    return ds.map_batches(flt, batch_format="pandas")
