"""Output sinks (SURVEY §2.6).

- K1 (Mongo bulk insert) -> partitioned Parquet with deterministic
  content-hash ``_id`` per doc (insert.js:37-38 parity: id computed BEFORE
  any timestamp stamping, so ids are stable across runs/parallelism).
- K2 (NDJSON stdout stream, stream.js:3-42) -> one NDJSON file per logical
  table in the reference's fixed order persons -> organizations (companies
  then institutions, one table here) -> areas -> memberships -> products;
  the '[SPLIT]' delimiter becomes the file boundary.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import ray.data

# stream.js:6-19 fixed table order; orgs == companies + institutions
TABLE_ORDER = ("persons", "orgs", "areas", "memberships", "products")


def write_ndjson_tables(
    entities: ray.data.Dataset, out_dir: str, *, date: str | None = None
) -> dict[str, int]:
    """Write the canonical entity Dataset (columns table/id/doc/_id) as one
    NDJSON file per logical table, reference order. ``date`` optionally
    stamps a run timestamp AFTER the content hash (stream.js:34-37) — pass
    an explicit value for reproducible output; default stamps nothing.

    Streaming: consumes the dataset once via iter_batches; row order inside
    a table is deterministic (sorted by entity id)."""
    os.makedirs(out_dir, exist_ok=True)
    counts: dict[str, int] = {t: 0 for t in TABLE_ORDER}

    handles = {t: open(os.path.join(out_dir, f"{t}.ndjson"), "w") for t in TABLE_ORDER}
    try:
        # per-table deterministic order without a global sort: small entity
        # table -> sort by (table, id) is a cheap shuffle on the output side
        for batch in entities.sort(["table", "id"]).iter_batches(
            batch_size=4096, batch_format="pyarrow"
        ):
            for table, doc_json, _id in zip(
                batch["table"].to_pylist(),
                batch["doc"].to_pylist(),
                batch["_id"].to_pylist(),
            ):
                doc = json.loads(doc_json)
                if date is not None and "date" not in doc:
                    doc["date"] = date
                handles[table].write(json.dumps(doc, ensure_ascii=False) + "\n")
                counts[table] += 1
    finally:
        for fh in handles.values():
            fh.close()
    return counts


def entities_table_counts(entities: ray.data.Dataset) -> dict[str, int]:
    """Per-table counts (the reference's end-of-run report, index.js:110-127)."""
    from ..ops.agg import grouped_agg

    df = grouped_agg(entities, ["table"], {"n": ("id", "count")})
    return {t: int(n) for t, n in zip(df["table"], df["n"])}


ENTITY_OUT_SCHEMA = pa.schema(
    [
        ("table", pa.string()),
        ("id", pa.string()),
        ("name", pa.string()),
        ("class0", pa.string()),
        ("doc", pa.string()),
        ("_id", pa.string()),
    ]
)
