"""Dataset sources: pages / records readers + parallel corpus generation.

Replaces the reference's sources (SURVEY §2.1): the Mongo record cursor
(S1, /root/reference/index.js:81-96) becomes ``ray.data.read_parquet`` with
column pruning; the product-index loader (S2, index.js:75-79) and CSV
classifier lists (S3, classify.js) become small broadcast sides.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from .synth import PAGES_SCHEMA, pages_batch, records_json_batch, records_struct_batch


def _count_files(path: str) -> int:
    if os.path.isfile(path):
        return 1
    n = 0
    for _root, _dirs, files in os.walk(path):
        n += sum(1 for f in files if f.endswith(".parquet"))
    return max(1, n)


def read_pages(
    path: str | list[str], columns: list[str] | None = None, *, num_blocks: int | None = None
) -> ray.data.Dataset:
    """Pages table (url, warc_ts, html, text, lang). Prune columns at the
    read — the KG pipeline only needs (url, html).

    Read parallelism is forced to the file count: html compresses so well
    that Ray's size-based heuristic plans ONE read task and every
    downstream stage starves behind its sequential block stream (measured
    3.5x on the mention stage)."""
    if num_blocks is None:
        num_blocks = len(path) if isinstance(path, list) else _count_files(path)
    return ray.data.read_parquet(path, columns=columns, override_num_blocks=num_blocks)


def read_records(path: str) -> ray.data.Dataset:
    """ocds_records materialization (ocid, record_json)."""
    return ray.data.read_parquet(path)


def generate_pages(
    out_dir: str, n: int, *, shard_rows: int = 2000, overwrite: bool = False
) -> str:
    """Generate the deterministic synthetic pages corpus in parallel Ray
    tasks (each shard is a pure function of its index range — seeded, no
    global RNG) and write partitioned Parquet. Idempotent: reuses an
    existing corpus of the right size."""
    marker = os.path.join(out_dir, "_COMPLETE")
    if not overwrite and os.path.exists(marker):
        with open(marker) as fh:
            if fh.read().strip() == f"{n}:v3":
                return out_dir
    os.makedirs(out_dir, exist_ok=True)

    n_shards = max(1, (n + shard_rows - 1) // shard_rows)

    def gen(batch: pa.Table) -> pa.Table:
        out = []
        for shard in batch["id"].to_pylist():
            lo = shard * shard_rows
            hi = min(n, lo + shard_rows)
            out.append(pages_batch(lo, hi))
        return pa.concat_tables(out) if out else PAGES_SCHEMA.empty_table()

    (
        # one block per shard (range() alone yields ONE block -> one task,
        # one giant output file, and parallelism 1 for every consumer)
        ray.data.range(n_shards, override_num_blocks=n_shards)
        .map_batches(gen, batch_size=1, batch_format="pyarrow")
        .write_parquet(out_dir, max_rows_per_file=shard_rows, mode="overwrite")
    )
    with open(marker, "w") as fh:
        fh.write(f"{n}:v3")
    return out_dir


def generate_records(
    out_dir: str, n: int, *, shard_rows: int = 2000, overwrite: bool = False
) -> str:
    """Same corpus, struct/JSON record materialization."""
    marker = os.path.join(out_dir, "_COMPLETE")
    if not overwrite and os.path.exists(marker):
        with open(marker) as fh:
            if fh.read().strip() == f"{n}:v3":
                return out_dir
    os.makedirs(out_dir, exist_ok=True)
    n_shards = max(1, (n + shard_rows - 1) // shard_rows)

    def gen(batch: pa.Table) -> pa.Table:
        out = []
        for shard in batch["id"].to_pylist():
            lo = shard * shard_rows
            hi = min(n, lo + shard_rows)
            out.append(records_json_batch(lo, hi))
        return pa.concat_tables(out)

    (
        ray.data.range(n_shards, override_num_blocks=n_shards)
        .map_batches(gen, batch_size=1, batch_format="pyarrow")
        .write_parquet(out_dir, max_rows_per_file=shard_rows, mode="overwrite")
    )
    with open(marker, "w") as fh:
        fh.write(f"{n}:v3")
    return out_dir


def generate_records_struct(
    out_dir: str, n: int, *, shard_rows: int = 2000, overwrite: bool = False
) -> str:
    """FIXTURES F2: struct-typed Parquet mirror of the record documents."""
    marker = os.path.join(out_dir, "_COMPLETE")
    if not overwrite and os.path.exists(marker):
        with open(marker) as fh:
            if fh.read().strip() == f"{n}:v3":
                return out_dir
    os.makedirs(out_dir, exist_ok=True)
    n_shards = max(1, (n + shard_rows - 1) // shard_rows)

    def gen(batch: pa.Table) -> pa.Table:
        out = []
        for shard in batch["id"].to_pylist():
            lo = shard * shard_rows
            hi = min(n, lo + shard_rows)
            out.append(records_struct_batch(lo, hi))
        return pa.concat_tables(out)

    (
        ray.data.range(n_shards, override_num_blocks=n_shards)
        .map_batches(gen, batch_size=1, batch_format="pyarrow")
        .write_parquet(out_dir, max_rows_per_file=shard_rows, mode="overwrite")
    )
    with open(marker, "w") as fh:
        fh.write(f"{n}:v3")
    return out_dir


def read_records_struct(path: str) -> ray.data.Dataset:
    """Struct-typed records source. The nested columns stay Arrow all the
    way to the mention stage, which converts per batch and strips nulls."""
    return ray.data.read_parquet(path, override_num_blocks=_count_files(path))


def load_small_table(path: str) -> pa.Table:
    """Driver-side load of a SMALL side (product index, classifier list) —
    broadcast to workers via actor constructor args, never shuffled."""
    return pq.read_table(path)
