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
    out_dir: str, n: int, *, shard_rows: int = 2000, overwrite: bool = False,
    start: int = 0,
) -> str:
    """Generate the deterministic synthetic pages corpus in parallel Ray
    tasks (each shard is a pure function of its index range — seeded, no
    global RNG) and write partitioned Parquet. Idempotent: reuses an
    existing corpus of the right size. ``start`` offsets the doc index
    range (docs ``start..start+n``) so a delta corpus can be disjoint
    from a base corpus."""
    marker = os.path.join(out_dir, "_COMPLETE")
    if not overwrite and os.path.exists(marker):
        with open(marker) as fh:
            if fh.read().strip() == f"{n}:{start}:v3":
                return out_dir
    os.makedirs(out_dir, exist_ok=True)

    n_shards = max(1, (n + shard_rows - 1) // shard_rows)

    def gen(batch: pa.Table) -> pa.Table:
        out = []
        for shard in batch["id"].to_pylist():
            lo = start + shard * shard_rows
            hi = min(start + n, lo + shard_rows)
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
        fh.write(f"{n}:{start}:v3")
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


def read_parquet_evolved(
    path: str,
    *,
    columns: list[str] | None = None,
    **kwargs,
) -> ray.data.Dataset:
    """read_parquet for a directory whose shards have EVOLVED schemas
    (later ingests added columns or widened types): unify the file
    schemas from footers on the driver (parallel metadata reads — a
    long-lived corpus has tens of thousands of shards, so a serial
    footer loop would add minutes of driver latency), fold in any hive
    PARTITION columns (absent from physical footers), and conform every
    block to the one unified schema with an arrow map — missing columns
    become typed nulls, widened columns cast up
    (promote_options="permissive"). Every output block has the SAME
    schema, including on mixed layouts where some shards sit outside the
    partition directories.

    Without this, Ray reads each file with its own schema and emits
    MIXED-schema blocks ("RefBundle with a different schema" warnings) —
    the same block-schema divergence that crashes Arrow's hash join
    downstream. (Passing ``schema=`` to read_parquet does NOT fill
    missing columns — the fragment scan raises on old files — so
    conformance is an explicit map over each block.)"""
    from concurrent.futures import ThreadPoolExecutor

    import pyarrow.dataset as pads

    dataset = pads.dataset(path, format="parquet", partitioning="hive")
    frags = list(dataset.get_fragments())
    with ThreadPoolExecutor(max_workers=16) as ex:
        frag_schemas = list(ex.map(lambda f: f.physical_schema, frags))
    unified = pa.unify_schemas(frag_schemas, promote_options="permissive")
    # hive partition columns: in dataset.schema but never in the footers;
    # add them to the UNIFIED schema so a mixed layout (some shards
    # outside the partition dirs) still yields one uniform block schema.
    # Typed as STRING deliberately: Ray's reader emits hive values as
    # strings, and pyarrow's inferred partition type would lossily retype
    # them (day=01 -> int 1, unrecoverable zero-padding)
    physical = set(unified.names)
    for f in dataset.schema:
        if f.name not in physical:
            unified = unified.append(pa.field(f.name, pa.string()))
    if columns is not None:
        known = set(unified.names)
        missing = [c for c in columns if c not in known]
        if missing:
            raise KeyError(
                f"read_parquet_evolved: unknown column(s) {missing}; "
                f"available: {sorted(known)}"
            )
        unified = pa.schema([unified.field(c) for c in columns])

    def conform(t: pa.Table) -> pa.Table:
        arrays = []
        for f in unified:
            if f.name in t.column_names:
                arrays.append(t[f.name].cast(f.type))
            else:
                arrays.append(pa.nulls(len(t), f.type))
        return pa.Table.from_arrays(arrays, schema=unified)

    # prune at the read where safe: a column present in EVERY file can be
    # pushed into the parquet scan; columns some files lack (or partition
    # columns) must be handled post-read
    if columns is not None:
        if all(
            all(sch.get_field_index(c) != -1 for sch in frag_schemas)
            for c in columns
        ):
            kwargs = dict(kwargs, columns=columns)
    raw = ray.data.read_parquet(path, **kwargs)
    return raw.map_batches(conform, batch_format="pyarrow", zero_copy_batch=True)
