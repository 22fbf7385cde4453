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

def default_join_partitions(min_parts: int = 4) -> int:
    """Join/shuffle parallelism scaled to the cluster (CPU count / 8,
    floor ``min_parts``) instead of a per-box constant — the number that
    must grow with cluster width at 100 TB (a 256-node/32-core cluster
    gets 1024 partitions). /8 rather than /4: each partition is a
    HashShuffleAggregator actor whose STARTUP is on the query's critical
    path; measured on this box (32 CPUs, sf0.1) the q5 join runs 1.4-1.9 s
    at 4 partitions, ~2 s at 8, 2.6 s at 16, 4 s at 32 — aggregator spawn
    and coordination dominate until per-partition data is large, so fewer,
    fuller partitions win at every scale that fits."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", min_parts))
    except Exception:
        cpus = min_parts
    return max(min_parts, cpus // 8)


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


def adaptive_hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    join_type: str,
    *,
    on: tuple,
    right_on: tuple | None = None,
    num_partitions: int | None = None,
    broadcast_max_rows: int = 4_000_000,
    force_branch: str | None = None,
) -> ray.data.Dataset:
    """Fact->dim inner join that skips the hash-shuffle exchange when the
    RIGHT side turns out small (the AQE broadcast-gate pattern, same shape
    as drop_near_dup_losers' 5M gate): materialize the right side — by
    caller contract a column-pruned dim projection — read its row count
    from block metadata, and when it is under ``broadcast_max_rows``
    ``ray.put`` it once and merge map-side. The big side never shuffles and
    the join's HashShuffleAggregator actor startup (1.4-1.9 s on this box
    even at 4 partitions, see default_join_partitions) disappears. Past the
    bound — a fact-fact join at 100 TB — it falls back to the partitioned
    ``hash_join`` on the already-materialized right (the materialization is
    then the price of the gate; it spills, never sits on the driver).

    Schema contract: BOTH branches emit left columns + right non-key
    columns (the broadcast branch renames the right keys to the left key
    names before the merge, which is exactly ``Dataset.join``'s coalesced
    output). Non-key column names must be disjoint. ``force_branch``
    ("broadcast" | "shuffle") pins a branch for parity tests; the
    ``GRAFT_ADAPTIVE_JOIN`` env var does the same process-wide (A/B
    measurement without touching call sites)."""
    import os

    from .agg import use_fast_branch

    force_branch = force_branch or os.environ.get("GRAFT_ADAPTIVE_JOIN") or None
    if join_type == "inner" and force_branch != "shuffle":
        mat = right.materialize()
        if use_fast_branch(
            force_branch,
            fast="broadcast",
            slow="shuffle",
            count=mat.count,
            cap=broadcast_max_rows,
        ):
            small = mat.to_pandas()
            right_keys = list(right_on or on)
            ren = {rk: lk for rk, lk in zip(right_keys, on) if rk != lk}
            if ren:
                small = small.rename(columns=ren)
            return broadcast_hash_join(left, small, left_on=list(on), how="inner")
        right = mat
    return hash_join(
        left, right, join_type, on=on, right_on=right_on, num_partitions=num_partitions
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
    batch_format: str = "pandas",
) -> ray.data.Dataset:
    """Join a big Dataset against a small in-memory table without shuffling
    the big side. ``small`` is put in the object store once; every task
    reads it from the local object store (zero re-ship per batch).

    ``batch_format="pyarrow"`` keeps the big side's blocks as zero-copy
    Arrow and joins with the in-process Arrow kernel (no Arrow->pandas
    round-trip per block); the pandas path remains the default for callers
    whose surrounding stages are pandas anyway. SCHEMA CAVEAT: the Arrow
    kernel COALESCES the right key columns away (pandas merge keeps both)
    and only applies ``suffixes[1]`` to right-side collisions — callers
    switching an existing site to pyarrow must not rely on the right key
    column downstream (the converted call sites select_columns anyway).

    Only ``inner`` and ``left`` are supported: a per-block right/full
    outer join would re-emit the small side's unmatched rows once PER
    BLOCK (unmatched-right emission is a global property, not a per-batch
    one). Use ``hash_join``/``full_outer_join`` when right rows must
    survive."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"broadcast_hash_join: how={how!r} unsupported — a broadcast "
            "join evaluates per block, so right/full outer would duplicate "
            "the small side's unmatched rows once per block; use hash_join "
            "or full_outer_join instead"
        )
    left_keys = [left_on] if isinstance(left_on, str) else list(left_on)
    right_keys = (
        left_keys
        if right_on is None
        else ([right_on] if isinstance(right_on, str) else list(right_on))
    )

    if batch_format == "pyarrow":
        small_tbl = (
            small if isinstance(small, pa.Table) else pa.Table.from_pandas(small)
        )
        ref_a = ray.put(small_tbl)
        join_type = {"inner": "inner", "left": "left outer"}[how]

        def merge_arrow(batch: pa.Table) -> pa.Table:
            rhs = _fetch(ref_a)
            return batch.join(
                rhs,
                keys=left_keys,
                right_keys=right_keys,
                join_type=join_type,
                right_suffix=suffixes[1],
            )

        return ds.map_batches(merge_arrow, batch_format="pyarrow", zero_copy_batch=True)

    small_df = small.to_pandas() if isinstance(small, pa.Table) else small
    # SQL NULL-key semantics: pandas merge matches NaN==NaN (the Arrow
    # path above and the shuffle hash_join both drop null keys), so a
    # nullable key column would make the adaptive broadcast/shuffle gate
    # a correctness flip. Dropping null-key rows on the small side fixes
    # both modes: inner loses the row, left keeps it with NaN fill.
    if len(small_df):
        keymask = small_df[right_keys].notna().all(axis=1)
        if not keymask.all():
            small_df = small_df[keymask]
    ref = ray.put(small_df)

    def merge(batch: pd.DataFrame) -> pd.DataFrame:
        rhs = _fetch(ref)
        return batch.merge(
            rhs, how=how, left_on=left_keys, right_on=right_keys, suffixes=suffixes
        )

    return ds.map_batches(merge, batch_format="pandas")


def detect_hot_keys(
    ds: ray.data.Dataset, col: str, *, hot_fraction: float, mg_k: int = 256
) -> tuple[frozenset, int]:
    """Find join keys whose frequency is >= ``hot_fraction`` of the rows,
    in ONE pass with a Misra–Gries sketch (O(mg_k) bytes per block on the
    wire). Returns a guaranteed SUPERSET of the true hot set (plus the
    total row count): MG undercounts by at most n/mg_k, so every key with
    approx_count + n/mg_k >= threshold is kept. Requires
    ``hot_fraction > 1/mg_k`` — below that the sketch cannot separate hot
    from cold and the superset degenerates to everything."""
    if hot_fraction <= 1.0 / mg_k:
        raise ValueError(
            f"hot_fraction={hot_fraction} must exceed 1/mg_k={1.0 / mg_k}: "
            "the Misra-Gries error bound is n/mg_k, so a smaller threshold "
            "is indistinguishable from sketch noise (raise mg_k or the "
            "threshold)"
        )
    from .sketches import heavy_hitters

    hh = heavy_hitters(ds, col, k=mg_k)
    if not len(hh):
        return frozenset(), 0
    n = int(hh["n_total"].iloc[0])
    slack = n / mg_k
    hot = hh.loc[hh["approx_count"] + slack >= hot_fraction * n, "value"]
    return frozenset(hot.tolist()), n


def skew_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    on: str,
    right_on: str | None = None,
    hot_fraction: float = 0.01,
    mg_k: int = 256,
    num_partitions: int | None = None,
    max_broadcast_rows: int = 2_000_000,
) -> ray.data.Dataset:
    """Skew-aware inner join (the north rule's 'explicit skew handling for
    head entities'): keys that dominate the left side would overload one
    hash-shuffle partition, so they are detected with a one-pass
    Misra–Gries sketch and routed around the shuffle.

    Plan (adaptive, per key):
    - sketch pass over ``left`` -> hot-key superset (``detect_hot_keys``);
    - HOT rows: the right side's hot rows (bounded by |hot| <= mg_k keys x
      rows-per-key; raises past ``max_broadcast_rows``) are ``ray.put``
      ONCE and map-side merged — hot keys never enter a shuffle, so a key
      holding 30% of the corpus costs zero partition imbalance;
    - COLD rows: ordinary hash-partitioned ``Dataset.join``, now with a
      bounded per-partition row count (< hot_fraction x n per key);
    - union of both branches, columns normalized to left-then-right order.

    Cost: left is scanned twice (sketch + join) — at 100 TB the sketch
    pass is pure map (O(mg_k) bytes/block to the driver) and is the price
    of never re-trying a blown shuffle partition. Non-key column names
    must be disjoint between the two sides."""
    rkey = right_on or on
    hot, _n = detect_hot_keys(left, on, hot_fraction=hot_fraction, mg_k=mg_k)

    # canonical output column order: left columns, then right non-key cols
    left_cols = left.schema().names
    right_cols = [c for c in right.schema().names if c != rkey]
    dup = set(left_cols) & set(right_cols)
    if dup:
        raise ValueError(f"skew_join requires disjoint non-key columns; shared: {dup}")
    out_cols = list(left_cols) + right_cols

    # Dataset.join's output naming for an identical key name on both sides
    # is version-dependent; give the right key an unambiguous temp name.
    shuffle_rkey = rkey
    def shuffle_right(ds: ray.data.Dataset) -> ray.data.Dataset:
        return ds
    if rkey == on:
        shuffle_rkey = "_skew_rkey"
        def shuffle_right(ds: ray.data.Dataset) -> ray.data.Dataset:  # noqa: F811
            return ds.map_batches(
                lambda b: b.rename_columns(
                    ["_skew_rkey" if n == rkey else n for n in b.column_names]
                ),
                batch_format="pyarrow",
            )

    if not hot:
        joined = hash_join(
            left, shuffle_right(right), "inner",
            on=(on,), right_on=(shuffle_rkey,), num_partitions=num_partitions,
        )
        return joined.map_batches(
            lambda b, cols=out_cols: b.select(cols), batch_format="pyarrow"
        )

    # the value_set Arrow array is built ONCE and broadcast; workers fetch
    # it from the local object store (not rebuilt per batch)
    hot_ref = ray.put(pa.array(list(hot)))

    # Arrow-side filters: empty ARROW outputs stay typed (an all-empty
    # pandas map output loses its schema and trips both the acero join and
    # Ray's block-size estimator on object columns).
    def split(batch: pa.Table, keep_hot: bool, col: str = on) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.is_in(batch[col], value_set=_fetch(hot_ref))
        return batch.filter(mask if keep_hot else pc.invert(mask))

    # hot branch: broadcast the right side's hot rows, map-side merge.
    # limit(cap+1) bounds what the driver ever materializes, so the guard
    # fires BEFORE an oversized hot side can OOM the driver.
    right_hot = (
        right.map_batches(
            split, fn_kwargs={"keep_hot": True, "col": rkey}, batch_format="pyarrow"
        )
        .limit(max_broadcast_rows + 1)
        .to_pandas()
    )
    if len(right_hot) > max_broadcast_rows:
        raise ValueError(
            f"hot right rows exceed max_broadcast_rows={max_broadcast_rows}; "
            "raise the cap or pre-aggregate the right side"
        )
    if len(right_hot) == 0:
        # Hot keys absent from the right side: the inner join drops them
        # anyway (and an all-empty to_pandas loses its columns, so it must
        # not reach the merge). Fall back to the unfiltered plain join —
        # the hot probe rows find an empty build side, so the skew they
        # carry costs probe streaming, not a blown build partition.
        return hash_join(
            left, shuffle_right(right), "inner",
            on=(on,), right_on=(shuffle_rkey,), num_partitions=num_partitions,
        ).map_batches(lambda b, cols=out_cols: b.select(cols), batch_format="pyarrow")
    hot_joined = broadcast_hash_join(
        left.map_batches(split, fn_kwargs={"keep_hot": True}, batch_format="pyarrow"),
        right_hot,
        left_on=on,
        right_on=rkey,
        how="inner",
    )
    if rkey != on:
        hot_joined = hot_joined.map_batches(
            lambda b: b.drop(columns=[rkey]), batch_format="pandas"
        )

    # cold branch: ordinary hash join, hot rows filtered from BOTH sides.
    # A side whose every block came out of the filter empty loses its
    # schema (Ray drops it on all-empty map output) and crashes the acero
    # join ("no match for key field") — the repo-standard guard is
    # materialize + count, and the join consumes the already-staged blocks
    # so the data moves through the object store once either way.
    norm = lambda b, cols=out_cols: b[cols]  # noqa: E731
    hot_joined = hot_joined.map_batches(norm, batch_format="pandas")
    cold_left = left.map_batches(
        split, fn_kwargs={"keep_hot": False}, batch_format="pyarrow"
    ).materialize()
    if cold_left.count() == 0:
        return hot_joined
    cold_right = shuffle_right(
        right.map_batches(
            split, fn_kwargs={"keep_hot": False, "col": rkey}, batch_format="pyarrow"
        )
    ).materialize()
    if cold_right.count() == 0:
        return hot_joined
    cold_joined = hash_join(
        cold_left,
        cold_right,
        "inner",
        on=(on,),
        right_on=(shuffle_rkey,),
        num_partitions=num_partitions,
    )
    return hot_joined.union(cold_joined.map_batches(norm, batch_format="pandas"))


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
