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

Values are RANGE-QUANTIZED onto the 16-bit lanes — ``(v * 2^16) //
(max+1)`` — never truncated mod 2^16: a mod would interleave ``v %
65536``, which scatters any column wider than 16 bits and makes the
layout WORSE than a single-column sort (locality is pytest-pinned on
24-bit data). The quantization and interleave are pure int64 arithmetic
(mul/div/shift/or/mask), so the SQL twin (:func:`zorder_sql`) computes
the identical key in DuckDB — another member of the integer-exact oracle
family.
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
    """Morton code of two 16-bit values: bits of ``a`` on even positions,
    ``b`` on odd — int64, vectorized. Callers must pre-quantize; see
    :func:`zorder_key` for the ranged entry point."""
    return _spread16(a) | (_spread16(b) << 1)


def _quant16(v: np.ndarray, vmax: int, col: str) -> np.ndarray:
    v = v.astype(np.int64)
    if vmax <= 0 or vmax >= 1 << 47:
        raise ValueError(f"zorder_key: max for {col} must be in (0, 2^47)")
    if (v < 0).any() or (v > vmax).any():
        raise ValueError(
            f"zorder_key: {col} outside [0, {vmax}] — widen the declared "
            "max; silently wrapping would scatter the layout"
        )
    return (v * 65536) // (vmax + 1)


def zorder_key(
    ds: ray.data.Dataset,
    col_a: str,
    col_b: str,
    *,
    max_a: int,
    max_b: int,
    out_col: str = "zkey",
) -> ray.data.Dataset:
    """Attach the Morton key of the two columns range-quantized onto 16
    bits each (``(v * 2^16) // (max+1)``; values outside ``[0, max]``
    raise) — stateless vectorized map, zero shuffle. Follow with
    ``ds.sort(out_col)`` (ONE range shuffle) and a partitioned write to
    cluster storage by both dimensions at once."""

    def add(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch[out_col] = morton_interleave(
            _quant16(batch[col_a].to_numpy(), max_a, col_a),
            _quant16(batch[col_b].to_numpy(), max_b, col_b),
        )
        return batch

    return ds.map_batches(add, batch_format="pandas")


def zorder_sql(
    table_sql: str,
    id_cols: list[str],
    col_a: str,
    col_b: str,
    *,
    max_a: int,
    max_b: int,
    out_col: str = "zkey",
) -> str:
    """DuckDB twin of :func:`zorder_key` as a chained CTE (one level per
    spread step, so each intermediate evaluates ONCE instead of the 2^4
    textual blow-up an inline expression would repeat). ``::BIGINT`` at
    the base keeps 32-bit input columns from overflowing the shifts."""
    ids = ", ".join(id_cols)
    parts = [
        f"WITH q0 AS (SELECT {ids}, "
        f"(({col_a})::BIGINT * 65536) // {max_a + 1} AS xa, "
        f"(({col_b})::BIGINT * 65536) // {max_b + 1} AS xb FROM {table_sql})"
    ]
    prev = "q0"
    for i, (shift, mask) in enumerate(_MASKS, start=1):
        parts.append(
            f"q{i} AS (SELECT {ids}, "
            f"((xa | (xa << {shift})) & {mask}) AS xa, "
            f"((xb | (xb << {shift})) & {mask}) AS xb FROM {prev})"
        )
        prev = f"q{i}"
    return (
        ",\n".join(parts)
        + f"\nSELECT {ids}, (xa | (xb << 1)) AS {out_col} FROM {prev}"
    )


def write_bucketed(
    ds: ray.data.Dataset,
    path: str,
    key_col: str,
    *,
    num_buckets: int,
) -> str:
    """Hash-bucketed table layout (Spark bucketing / Iceberg
    storage-partitioned tables): add ``_bucket = key % num_buckets``
    (crc32 for non-integer keys — the SAME routing as the engine's
    shuffle buckets, so a table written here is co-partitioned with any
    bucketed aggregate on the same key) and write one hive-style
    partition directory per bucket.

    The payoff is :func:`bucketed_join`: two tables written with the
    same (key domain, num_buckets) join WITHOUT ANY SHUFFLE — at 100 TB
    the dominant cost of a repeated fact×dim join is re-exchanging the
    fact table every run, and pre-bucketing amortizes that exchange into
    the ingest write."""
    import json
    import os

    from .agg import _bucket_series

    os.makedirs(path, exist_ok=True)

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        return b.assign(_bucket=_bucket_series(b[key_col], num_buckets))

    # mode="overwrite": Ray's write_parquet default is APPEND, which would
    # silently double every row on a rerun of the same layout
    ds.map_batches(add_bucket, batch_format="pandas").write_parquet(
        path, partition_cols=["_bucket"], mode="overwrite"
    )
    # layout manifest: turns bucketed_join's same-num_buckets precondition
    # into a checked one (mismatched layouts silently DROP matches)
    with open(os.path.join(path, "_bucketed_manifest.json"), "w") as f:
        json.dump({"num_buckets": num_buckets, "key_col": key_col}, f)
    return path


def bucketed_join(
    path_a: str,
    path_b: str,
    *,
    key_a: str,
    key_b: str,
    num_buckets: int,
    columns_a: "list[str] | None" = None,
    columns_b: "list[str] | None" = None,
    empty_result: "pd.DataFrame | None" = None,
) -> ray.data.Dataset:
    """ZERO-shuffle inner join of two co-bucketed tables (both written by
    :func:`write_bucketed` with the same ``num_buckets`` over the same
    key domain): bucket i of A can only match bucket i of B, so the join
    is ``num_buckets`` independent map tasks, each reading its two
    partition directories and merging in memory — no exchange, no
    driver-side data. Missing partitions (empty buckets) join empty.

    This is the storage-partitioned join: parallelism = bucket count,
    so pick num_buckets >= cluster width at write time. Paths must be on
    storage every worker can read (shared FS / object store; node-local
    /tmp only works single-node)."""
    import json
    import os

    import pyarrow.parquet as pq

    for path in (path_a, path_b):
        mf = os.path.join(path, "_bucketed_manifest.json")
        if not os.path.isfile(mf):
            raise FileNotFoundError(
                f"bucketed_join: {path!r} is not a write_bucketed layout "
                "(missing _bucketed_manifest.json) — a missing table must "
                "error, not join empty"
            )
        with open(mf) as f:
            meta = json.load(f)
        if meta["num_buckets"] != num_buckets:
            raise ValueError(
                f"bucketed_join: {path!r} was written with "
                f"num_buckets={meta['num_buckets']}, joined with "
                f"{num_buckets} — mismatched layouts silently drop matches"
            )

    work = ray.data.from_items(
        [{"bucket": b} for b in range(num_buckets)]
    ).repartition(num_buckets)

    def join_bucket(rows: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for b in rows["bucket"]:
            da = _read_bucket(path_a, int(b), columns_a)
            db = _read_bucket(path_b, int(b), columns_b)
            if da is None or db is None or not len(da) or not len(db):
                continue
            outs.append(da.merge(db, left_on=key_a, right_on=key_b))
        if not outs:
            # typed empty (when given) keeps block schemas uniform for
            # downstream stages — the usual schema-less-empty defense
            return (
                empty_result.copy() if empty_result is not None else pd.DataFrame()
            )
        return pd.concat(outs, ignore_index=True)

    def _read_bucket(path: str, b: int, cols):
        d = os.path.join(path, f"_bucket={b}")
        if not os.path.isdir(d):
            return None
        return pq.read_table(d, columns=cols).to_pandas()

    return work.map_batches(join_bucket, batch_size=1, batch_format="pandas")


def compact_parquet(
    src: str,
    dst: str,
    *,
    target_rows_per_file: int,
) -> dict:
    """Small-file compaction — the maintenance op every long-running
    ingest needs: a directory accreted from many incremental writes
    (hundreds of KB-sized files) is re-read as a stream and rewritten
    into ~``target_rows_per_file``-row files, returning
    {rows, files_before, files_after}.

    ``src`` must differ from ``dst`` (raises otherwise): in-place
    compaction would delete files a concurrent ingest adds after the
    read's file listing, and a crash between the rm and the rename
    would leave the only copy in the tmp dir — this way the source is
    genuinely untouched until the caller retires it. The destination
    swap is rename-based (tmp dir renamed into place, parent dir
    fsynced); a crash before the rename leaves dst absent, never
    half-written. No column projection parameter on purpose — a
    compaction that silently drops columns is the same defect class as
    one that drops rows.

    Scale shape: one streamed read -> write with row caps; no shuffle,
    no driver-side rows. Row-count equality before/after is asserted —
    a compaction that loses rows must fail loudly, not produce a
    smaller-but-wrong table."""
    import os
    import shutil

    if os.path.abspath(src) == os.path.abspath(dst):
        raise ValueError(
            "compact_parquet: src == dst — in-place compaction races "
            "concurrent ingest and loses crash-atomicity; write to a new "
            "directory and retire the old one after"
        )

    before = ray.data.read_parquet(src)
    # footer-metadata counts: the row-count guard costs zero data reads
    n_before = count_rows_metadata(src)
    files_before = sum(
        1 for _r, _d, fs in os.walk(src) for f in fs if f.endswith(".parquet")
    )

    tmp = dst.rstrip("/") + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    before.write_parquet(
        tmp,
        mode="overwrite",
        min_rows_per_file=target_rows_per_file,
        max_rows_per_file=target_rows_per_file,
    )
    n_after = count_rows_metadata(tmp)
    if n_after != n_before:
        shutil.rmtree(tmp, ignore_errors=True)
        raise RuntimeError(
            f"compact_parquet: row count changed {n_before} -> {n_after}; "
            "aborted, source left untouched"
        )
    shutil.rmtree(dst, ignore_errors=True)
    os.rename(tmp, dst)
    # durability for the rename itself (rename alone is not persisted
    # until the directory entry is)
    dfd = os.open(os.path.dirname(os.path.abspath(dst)) or ".", os.O_RDONLY)
    try:
        os.fsync(dfd)
    finally:
        os.close(dfd)
    files_after = sum(
        1 for _r, _d, fs in os.walk(dst) for f in fs if f.endswith(".parquet")
    )
    return {
        "rows": n_before,
        "files_before": files_before,
        "files_after": files_after,
    }


def count_rows_metadata(path: str) -> int:
    """Row count from parquet FOOTERS only — no data pages read, no Ray
    tasks: the O(files) metadata scan (parallel, like
    read_parquet_evolved's schema pass) that makes row-count guards and
    progress accounting free at 100 TB. Counts must match a full scan by
    parquet's contract (num_rows is authoritative metadata)."""
    import os
    from concurrent.futures import ThreadPoolExecutor

    import pyarrow.parquet as pq

    files = []
    for r, dirs, fs in os.walk(path):
        # match Ray's reader semantics: '_'/'.'-prefixed path components
        # (metadata dirs, hidden files) are skipped — counting files the
        # read ignores would make guards built on this mis-fire
        dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
        for f in fs:
            if f.endswith(".parquet") and not f.startswith(("_", ".")):
                files.append(os.path.join(r, f))
    if not files:
        raise FileNotFoundError(
            f"count_rows_metadata: no .parquet files under {path!r} "
            "(local filesystem only; a URI path walks to nothing)"
        )

    def one(fp: str) -> int:
        return pq.ParquetFile(fp).metadata.num_rows

    with ThreadPoolExecutor(max_workers=16) as ex:
        return int(sum(ex.map(one, files)))
