"""Two-stage aggregation helpers — the engine's answer to Ray's sort-based
``groupby().aggregate()`` being per-row-slow on large inputs (measured 38x
slower than map-side partials on q1; see BASELINE.md).

Pattern (ray_guide 'Aggregation at scale'):
1. PARTIAL: vectorized pandas groupby inside ``map_batches`` — one partial
   row per key per block; this is where 99% of rows disappear.
2. FINAL: either a driver-side combine (cardinality known small — a few
   thousand groups) or a BUCKETED distributed combine: hash the key into
   ``num_buckets`` small ints, one sort-shuffle on the int key, one Python
   call per bucket that combines the whole bucket vectorized. Same shape as
   the KG canonicalize stage, so skew is bounded by bucket count, not by
   per-key task overhead.

All group keys stay deterministic (zlib.crc32, never Python hash()).
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import ray.data

# process-wide default for bucketed_map_groups' tagging stage (callers can
# override per site); "pandas" unless measurement says otherwise
DEFAULT_TAG_FORMAT = "pandas"

_AGG_HOW = {"sum": "sum", "min": "min", "max": "max", "count": "size"}
# how a partial column re-combines in the final stage
_RECOMBINE = {"sum": "sum", "min": "min", "max": "max", "count": "sum"}


def _bucket_series(s: pd.Series, num_buckets: int) -> np.ndarray:
    if pd.api.types.is_integer_dtype(s):
        return (s.to_numpy().astype(np.int64) % num_buckets).astype(np.int32)
    return s.astype(str).map(lambda v: zlib.crc32(v.encode())).to_numpy().astype(np.int64) % num_buckets


def _bucket_arrow_column(col, num_buckets: int) -> np.ndarray:
    """Bucket ids for one Arrow column — int keys vectorize (modulo on the
    zero-copy numpy view); other types fall back to the same deterministic
    crc32 as the pandas path. Bucket ids only steer CO-LOCATION (every row
    of a key lands in exactly one bucket, which any deterministic hash
    guarantees), so pandas-vs-arrow string-repr differences for exotic key
    types cannot change results."""
    import pyarrow as pa

    if pa.types.is_integer(col.type):
        v = col.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        return (v % num_buckets).astype(np.int32)
    b = np.array(
        [zlib.crc32(str(x).encode()) for x in col.to_pylist()], dtype=np.int64
    )
    return (b % num_buckets).astype(np.int32)


def grouped_agg(
    ds: ray.data.Dataset,
    keys: list[str],
    specs: dict[str, tuple[str, str]],
    *,
    final: str = "driver",
    num_buckets: int = 64,
    pre: "callable | None" = None,
    empty_result: pd.DataFrame | None = None,
    batch_format: str = "pandas",
):
    """specs: {out_col: (in_col, 'sum'|'min'|'max'|'count')}.
    ``pre`` optionally filters/derives columns per batch (pandas in/out —
    or pa.Table in/out with batch_format='pyarrow', where the partial
    groupby runs as a zero-copy Arrow kernel: no Arrow->pandas->Arrow
    round-trip per block on the hot path).
    final='driver' returns a pandas DataFrame (for modest cardinality);
    final='bucketed' returns a Dataset (distributed combine)."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        if pre is not None:
            batch = pre(batch)
        # pandas groupby handles the empty frame and keeps the NATURAL
        # output dtypes (int64 for counts) — a special-cased float64 empty
        # would mix block schemas for the same column
        return batch.groupby(keys, as_index=False, sort=False).agg(
            **{out: (col, _AGG_HOW[how]) for out, (col, how) in specs.items()}
        )

    def partial_arrow(batch):
        import pyarrow as pa
        import pyarrow.compute as pc

        if pre is not None:
            batch = pre(batch)
        aggs = []
        for _out, (col, how) in specs.items():
            if how == "count":
                # match the pandas path's `size`: count ALL rows
                aggs.append((col, "count", pc.CountOptions(mode="all")))
            else:
                aggs.append((col, how))
        res = batch.group_by(keys).aggregate(aggs)
        # aggregate() emits keys + results (result columns in request
        # order); key position flipped across pyarrow versions, so detect
        # it before renaming positionally to the caller's output names
        if res.column_names[: len(keys)] == keys:
            res = res.rename_columns(keys + list(specs))
        else:
            res = res.rename_columns(list(specs) + keys)
        return res.select(keys + list(specs))

    if batch_format == "pyarrow":
        partials = ds.map_batches(
            partial_arrow, batch_format="pyarrow", zero_copy_batch=True
        )
    else:
        partials = ds.map_batches(partial, batch_format="pandas")
    recombine = {out: (out, _RECOMBINE[how]) for out, (_c, how) in specs.items()}

    if final == "driver":
        pdf = partials.to_pandas()
        if not len(pdf):
            # an ALL-empty Dataset to_pandas loses columns (0 blocks to
            # concat) — honor empty_result on the driver path too so
            # degenerate corpora keep the declared schema
            return empty_result.copy() if empty_result is not None else pdf
        return pdf.groupby(keys, as_index=False).agg(
            **{out: spec for out, spec in recombine.items()}
        )

    def combine_bucket(group: pd.DataFrame) -> pd.DataFrame:
        return group.groupby(keys, as_index=False).agg(
            **{out: spec for out, spec in recombine.items()}
        )

    return bucketed_map_groups(
        partials,
        keys[0],
        combine_bucket,
        num_buckets=num_buckets,
        empty_result=empty_result,
    )


def use_fast_branch(
    force: str | None, *, fast: str, slow: str, count, cap: int
) -> bool:
    """The repo-wide adaptive-gate predicate, shared so its semantics
    can't drift between call sites (exact_dedup, dedup_lines,
    signature_dup_pairs, shared_key_pairs, salient_terms,
    adaptive_hash_join): ``force`` OVERRIDES the count gate — the
    forced-branch parity tests depend on that precedence — and an
    unknown force value raises instead of silently falling through to
    the count. ``count`` may be an int or a zero-arg callable (lazy, so
    a forced branch never pays a materialize/count it doesn't need)."""
    if force == slow:
        return False
    if force == fast:
        return True
    if force is not None:
        raise ValueError(
            f"unknown force_branch {force!r}: expected {fast!r} or {slow!r}"
        )
    n = count() if callable(count) else count
    return n <= cap


def bucketed_map_groups(
    ds: ray.data.Dataset,
    key_col: str,
    fn,
    *,
    num_buckets: int = 64,
    drop_bucket: bool = True,
    empty_result: pd.DataFrame | None = None,
    tag_format: str | None = None,
) -> ray.data.Dataset:
    """Hash-bucketed alternative to ``groupby(key).map_groups``: ONE sort
    shuffle on a small int key and one Python call per BUCKET (not per key).
    ``fn`` receives the whole bucket as a DataFrame (all rows of every key
    hashed there, co-located) and must do its own per-key grouping —
    vectorized pandas, not per-group dispatch.

    Implemented as sort + ``map_batches(batch_size=None)`` (the same
    co-location guarantee ``groupby().map_groups`` relies on) so the EMPTY
    range partitions the sort can produce are replaced with the
    schema-typed ``empty_result`` frame instead of schema-less blocks
    (those trigger Ray's "RefBundle with a different schema" warning and
    can confuse downstream schema inference)."""

    import pyarrow as pa

    def add_bucket_arrow(batch: pa.Table) -> pa.Table:
        # Arrow-side tagging (``tag_format="pyarrow"``, for callers whose
        # UPSTREAM stage already emits Arrow blocks): the blocks stay
        # zero-copy into the sort exchange instead of round-tripping
        # through pandas. Callers with pandas-upstream stages should keep
        # the pandas default — forcing Arrow there ADDS a conversion.
        return batch.append_column(
            "_bucket",
            pa.array(_bucket_arrow_column(batch[key_col], num_buckets), pa.int32()),
        )

    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.assign(_bucket=_bucket_series(batch[key_col], num_buckets))

    def run(block: pd.DataFrame) -> pd.DataFrame:
        if not len(block):
            return empty_result.copy() if empty_result is not None else block
        parts = [
            fn(g.drop(columns=["_bucket"]) if drop_bucket else g)
            for _, g in block.groupby("_bucket", sort=False)
        ]
        return pd.concat(parts, ignore_index=True)

    if (tag_format or DEFAULT_TAG_FORMAT) == "pyarrow":
        tagged = ds.map_batches(
            add_bucket_arrow, batch_format="pyarrow", zero_copy_batch=True
        )
    else:
        tagged = ds.map_batches(add_bucket, batch_format="pandas")
    return tagged.sort("_bucket").map_batches(
        run, batch_size=None, batch_format="pandas"
    )


def latest_by_key(
    ds: ray.data.Dataset,
    key_col: str,
    order_cols: list[str],
    *,
    num_buckets: int = 64,
    empty_result: pd.DataFrame | None = None,
    ascending: bool = False,
) -> ray.data.Dataset:
    """Keep each key's row with the LARGEST ``order_cols`` tuple (the
    per-key argmax SQL writes as ``ROW_NUMBER() OVER (PARTITION BY key
    ORDER BY ... DESC) = 1``); ``ascending=True`` flips it to the argmin
    (FIRST_VALUE). Two-level: a per-batch argmax shrinks every
    block to <= one row per key BEFORE the bucket shuffle (so a key with a
    million versions ships one), then the bucketed pass re-argmaxes the
    survivors. ``order_cols`` must be a deterministic total order per key
    (add a unique id as the last tiebreak)."""

    def keep_latest(frame: pd.DataFrame) -> pd.DataFrame:
        srt = frame.sort_values(
            [key_col, *order_cols],
            ascending=[True] + [ascending] * len(order_cols),
            kind="mergesort",
        )
        return srt.drop_duplicates([key_col], keep="first")

    pre = ds.map_batches(keep_latest, batch_format="pandas")
    return bucketed_map_groups(
        pre, key_col, keep_latest, num_buckets=num_buckets, empty_result=empty_result
    )


def upsert_latest(
    base: ray.data.Dataset,
    delta: ray.data.Dataset,
    key_col: str,
    order_cols: list[str],
    *,
    num_buckets: int = 64,
    empty_result: pd.DataFrame | None = None,
) -> ray.data.Dataset:
    """CDC merge: apply a change log to a snapshot, latest version of each
    key wins. Pure composition — union then per-key argmax — so the cost
    is the one bucket shuffle ``latest_by_key`` already pays; at 100 TB
    both sides would be bucket-partitioned on ``key_col`` and the union
    respects it."""
    return latest_by_key(
        base.union(delta),
        key_col,
        order_cols,
        num_buckets=num_buckets,
        empty_result=empty_result,
    )


def topk_rows(
    ds: ray.data.Dataset,
    k: int,
    *,
    by: list[str],
    ascending: list[bool],
    empty: pd.DataFrame | None = None,
) -> pd.DataFrame:
    """Distributed top-k rows under a multi-column sort key: each batch
    keeps only its local k (a combiner — at most k × num_blocks candidate
    rows ever reach the driver, never the whole dataset), the driver
    finalizes. Ties beyond position k are broken by the full ``by`` list,
    so include a unique column for a deterministic result. Input rows must
    be key-distinct if duplicates shouldn't crowd out candidates."""

    def prune(b: pd.DataFrame) -> pd.DataFrame:
        return b.sort_values(by, ascending=ascending, kind="mergesort").head(k)

    cand = ds.map_batches(prune, batch_format="pandas")
    out = to_pandas_safe(cand, empty) if empty is not None else cand.to_pandas()
    return (
        out.sort_values(by, ascending=ascending, kind="mergesort")
        .head(k)
        .reset_index(drop=True)
    )


def to_pandas_safe(ds: ray.data.Dataset, empty: pd.DataFrame) -> pd.DataFrame:
    """``ds.to_pandas()`` that survives the all-empty case: a dataset whose
    blocks were all bypassed (or that has zero blocks) concatenates to a
    COLUMN-LESS frame, so downstream column access raises. ``empty`` is the
    typed schema to return instead."""
    df = ds.to_pandas()
    if df.shape[1] == 0 and len(df) == 0:
        return empty.copy()
    return df
