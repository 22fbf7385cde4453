"""Incremental KG materialization: ingest a new crawl delta by merging it
into the PERSISTED canonicalization state instead of recomputing the
world.

The reference drops its output collections and recomputes everything on
every run (`/root/reference/index.js:62-73` — `drop()` then full cursor
scan). At 100 TB that shape is unusable: a daily crawl shard is a few
permille of the corpus. This pipeline exploits the property the whole
distributed design already rests on: the SURVEY §2.5 accumulators
(A1-A7 — counter sums, min/max dates, ordered set unions, first-writer
slots with deterministic sortkeys) are associative and commutative, so
`merge_state(old, delta)` over persisted per-entity state equals a full
recompute bit-for-bit (pytest-pinned in tests/test_kg_pipeline.py).

Store layout (all partitioned by the canonicalize hash bucket, so an
update rewrites only TOUCHED partitions and a failed update resumes by
partition):

    store/
      meta.json                  {num_buckets, version}
      states/bucket=K/*.parquet  merged (key, state) rows — the mergeable
                                 canonicalization state, NOT rendered docs
      entities_raw/bucket=K/...  rendered entity rows per bucket (before
                                 the global snapshot-name repair)

Update cost: extract(delta) + one bucket shuffle over DELTA-sized
partials + a merge+render over only the buckets the delta touches —
O(delta + touched-state), never O(corpus). The export step applies the
snapshot-name repair (a broadcast/sharded map, no shuffle) over the
entity table (entity-sized, orders of magnitude below the corpus) and
re-derives triples.
"""

from __future__ import annotations

import json
import os
import shutil

import pyarrow as pa
import ray.data

from ..sources.readers import read_pages, read_records
from ..stages.canonicalize import (
    merge_bucket,
    recombine_batch,
    repair_area_parent_names,
)
from ..stages.mentions import extract_mentions
from ..stages.triples_stage import materialize_triples

_STATES = "states"
_ENTITIES_RAW = "entities_raw"
_META = "meta.json"


def _norm(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Canonical (bucket:int32, key, state) column order/types — hive
    partition reads put the partition column last and may widen its type,
    and union requires both sides to agree exactly."""

    def f(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "bucket": b["bucket"].cast(pa.int32()),
                "key": b["key"].cast(pa.string()),
                "state": b["state"].cast(pa.string()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def _merged_states(
    pages: ray.data.Dataset,
    classifier_list: dict | None,
    product_index: dict | None,
    *,
    num_buckets: int,
    concurrency=None,
    batch_size: int = 512,
    compute: str = "tasks",
) -> ray.data.Dataset:
    """pages -> fully merged (bucket, key, state): the canonicalize
    combine tree (map-side partials -> cross-batch recombine -> one
    bucket shuffle) stopping BEFORE render, so the result is mergeable
    with previously persisted state."""
    mentions = extract_mentions(
        pages,
        classifier_list,
        product_index,
        concurrency=concurrency,
        batch_size=batch_size,
        num_buckets=num_buckets,
        compute=compute,
    )
    reduced = mentions.map_batches(
        recombine_batch, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
    # recombine_batch is the merge kernel: applied to one whole bucket it
    # yields exactly one state row per entity key
    return _norm(reduced.groupby("bucket").map_groups(recombine_batch, batch_format="pyarrow"))


def _render_states(states: ray.data.Dataset) -> ray.data.Dataset:
    """Merged states -> entity rows + their bucket (for partitioned,
    partially-rewritable output). Keys are unique per bucket here, so
    merge_bucket degenerates to pure rendering."""

    def render(group: pa.Table) -> pa.Table:
        ents = merge_bucket(group)
        bucket = group["bucket"][0].as_py() if len(group) else -1
        return ents.append_column(
            "bucket", pa.array([bucket] * len(ents), pa.int32())
        )

    return states.groupby("bucket").map_groups(render, batch_format="pyarrow")


def _read_input(path: str, source: str) -> ray.data.Dataset:
    if source == "records":
        return read_records(path)
    return read_pages(path, columns=["url", "html"])


def kg_init(
    pages_path: str,
    store_dir: str,
    classifier_list: dict | None = None,
    product_index: dict | None = None,
    *,
    num_buckets: int = 64,
    concurrency=None,
    batch_size: int = 512,
    compute: str = "tasks",
    source: str = "pages",
) -> dict:
    """Bootstrap the incremental store from the initial corpus."""
    states = _merged_states(
        _read_input(pages_path, source),
        classifier_list,
        product_index,
        num_buckets=num_buckets,
        concurrency=concurrency,
        batch_size=batch_size,
        compute=compute,
    ).materialize()

    states_dir = os.path.join(store_dir, _STATES)
    raw_dir = os.path.join(store_dir, _ENTITIES_RAW)
    shutil.rmtree(states_dir, ignore_errors=True)
    shutil.rmtree(raw_dir, ignore_errors=True)
    states.write_parquet(states_dir, partition_cols=["bucket"], mode="overwrite")
    entities = _render_states(states).materialize()
    entities.write_parquet(raw_dir, partition_cols=["bucket"], mode="overwrite")

    os.makedirs(store_dir, exist_ok=True)
    with open(os.path.join(store_dir, _META), "w") as fh:
        json.dump({"num_buckets": num_buckets, "version": 1}, fh)
    return {
        "state_rows": states.count(),
        "entities": entities.count(),
        "buckets": num_buckets,
    }


def kg_update(
    delta_path: str,
    store_dir: str,
    classifier_list: dict | None = None,
    product_index: dict | None = None,
    *,
    concurrency=None,
    batch_size: int = 512,
    compute: str = "tasks",
    source: str = "pages",
) -> dict:
    """Merge one delta shard into the store, rewriting only the touched
    bucket partitions."""
    with open(os.path.join(store_dir, _META)) as fh:
        num_buckets = int(json.load(fh)["num_buckets"])

    delta = _merged_states(
        _read_input(delta_path, source),
        classifier_list,
        product_index,
        num_buckets=num_buckets,
        concurrency=concurrency,
        batch_size=batch_size,
        compute=compute,
    ).materialize()

    touched = sorted(int(b) for b in delta.unique("bucket"))
    states_dir = os.path.join(store_dir, _STATES)
    raw_dir = os.path.join(store_dir, _ENTITIES_RAW)
    old_parts = [
        (b, os.path.join(states_dir, f"bucket={b}"))
        for b in touched
        if os.path.isdir(os.path.join(states_dir, f"bucket={b}"))
    ]

    if old_parts:
        # partition-pruned read: only the touched buckets leave storage.
        # Ray's reader parses the hive `bucket=K` path segment back into a
        # column (as a string — _norm casts it)
        part_files = [
            os.path.join(d, f)
            for _, d in old_parts
            for f in sorted(os.listdir(d))
            if f.endswith(".parquet")
        ]
        old = _norm(ray.data.read_parquet(part_files))
        combined = old.union(delta)
    else:
        combined = delta

    merged = (
        combined.groupby("bucket")
        .map_groups(recombine_batch, batch_format="pyarrow")
        .materialize()
    )
    merged = _norm(merged).materialize()
    rendered = _render_states(merged).materialize()

    # atomic-enough partition swap: remove the touched partitions, then
    # append the recomputed ones (a crash between the two is repaired by
    # re-running the same update — the delta merge is idempotent)
    for b in touched:
        shutil.rmtree(os.path.join(states_dir, f"bucket={b}"), ignore_errors=True)
        shutil.rmtree(os.path.join(raw_dir, f"bucket={b}"), ignore_errors=True)
    merged.write_parquet(states_dir, partition_cols=["bucket"])
    rendered.write_parquet(raw_dir, partition_cols=["bucket"])
    return {
        "delta_state_rows": delta.count(),
        "touched_buckets": touched,
        "merged_state_rows": merged.count(),
    }


def kg_export(store_dir: str, out_dir: str, *, triple_parts: int = 32) -> dict:
    """Render the store into the standard entities + triples layout: the
    global snapshot-name repair (broadcast or sharded, entity-sized) runs
    here — once per export, not per delta."""
    raw = ray.data.read_parquet(os.path.join(store_dir, _ENTITIES_RAW))
    raw = raw.drop_columns(["bucket"]).materialize()
    final = repair_area_parent_names(raw).materialize()
    final.write_parquet(
        os.path.join(out_dir, "entities"), partition_cols=["table"], mode="overwrite"
    )
    triples = materialize_triples(final, num_parts=triple_parts)
    triples.write_parquet(
        os.path.join(out_dir, "triples"), partition_cols=["part"], mode="overwrite"
    )
    return {"entities": final.count(), "triples": triples.count()}
