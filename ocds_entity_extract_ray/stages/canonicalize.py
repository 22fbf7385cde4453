"""Canonicalization: the cross-document groupby (SURVEY §2.5 A1-A7).

Two-stage aggregation replaces the reference's driver-heap upserts
(/root/reference/index.js:48-55,90):

1. map-side partial combine inside the mention stage (one state row per
   key per batch — bounds any key's row count to the number of input
   blocks, which is what defuses head-entity skew: a key sighted in 10^9
   pages still arrives here as <= #blocks partials, SURVEY §7.4.3);
2. hash-bucketed final combine: ``groupby('bucket').map_groups`` where one
   Python call merges an ENTIRE bucket (a dict-merge over all its keys)
   and renders final docs — one shuffle on a small int key, no per-entity
   task overhead, bucket count configurable for cluster width.
"""

from __future__ import annotations

import json

import pyarrow as pa
import ray.data

from ..extraction.render import render_entity
from ..extraction.state import dumps_state, loads_state, merge_state
from ..functions.hashing import canonical_json

ENTITY_SCHEMA = pa.schema(
    [
        ("table", pa.string()),
        ("id", pa.string()),
        ("name", pa.string()),
        ("class0", pa.string()),
        ("doc", pa.string()),
        ("_id", pa.string()),
    ]
)


def merge_bucket(group: pa.Table) -> pa.Table:
    """Merge and render every entity key inside one hash bucket."""
    merged: dict = {}
    keys = group["key"].to_pylist()
    states = group["state"].to_pylist()
    for k, blob in zip(keys, states):
        st = loads_state(blob)
        if k in merged:
            merge_state(merged[k], st)
        else:
            merged[k] = st

    tables, ids, names, class0s, docs, hashes = [], [], [], [], [], []
    for st in merged.values():
        doc = render_entity(st)
        tables.append(st["table"])
        ids.append(st["id"])
        names.append(doc.get("name") or doc.get("description"))
        cls = doc.get("classification") or []
        class0s.append(cls[0] if cls else None)
        hashes.append(doc["_id"])
        docs.append(canonical_json(doc))
    return pa.table(
        {
            "table": pa.array(tables, pa.string()),
            "id": pa.array(ids, pa.string()),
            "name": pa.array(names, pa.string()),
            "class0": pa.array(class0s, pa.string()),
            "doc": pa.array(docs, pa.string()),
            "_id": pa.array(hashes, pa.string()),
        }
    )


def recombine_batch(batch: pa.Table) -> pa.Table:
    """Second-level map-side combine: merges partial states across emission
    batches within one large block BEFORE the shuffle (cuts exchanged rows
    ~3x and measured the final groupby from 8s to 0.6s at 80k docs)."""
    merged: dict = {}
    buckets: dict = {}
    for bucket, k, blob in zip(
        batch["bucket"].to_pylist(), batch["key"].to_pylist(), batch["state"].to_pylist()
    ):
        st = loads_state(blob)
        if k in merged:
            merge_state(merged[k], st)
        else:
            merged[k] = st
            buckets[k] = bucket
    keys = list(merged.keys())
    return pa.table(
        {
            "bucket": pa.array([buckets[k] for k in keys], pa.int32()),
            "key": pa.array(keys, pa.string()),
            "state": pa.array([dumps_state(merged[k]) for k in keys], pa.string()),
        }
    )


_REF_FIELDS = (
    ("parent_id", "parent_name"),
    ("organization_id", "organization_name"),
    ("person_id", "person_name"),
)


def _apply_name_fixes(doc: dict, fixes: dict) -> bool:
    """fixes: {name_field: canonical_name}. Returns True if doc changed."""
    from ..functions.hashing import content_hash

    touched = False
    for _rf, name_field in _REF_FIELDS:
        nm = fixes.get(name_field)
        if nm is not None and doc.get(name_field) != nm:
            doc[name_field] = nm
            touched = True
    if touched:
        doc.pop("_id", None)
        doc["_id"] = content_hash(doc)
    return touched


def repair_area_parent_names(
    entities: ray.data.Dataset, *, broadcast_max_names: int = 5_000_000
) -> ray.data.Dataset:
    """Snapshot-name repair: area docs and membership docs snapshot the
    OTHER entity's name from the record that first created the EDGE/CHILD,
    but the reference takes it from the referenced doc itself — whose name
    is fixed at creation (first-seen) in both engines, so the canonical
    entity-name map reproduces the reference exactly. Two equivalent modes
    (equality pytest-covered), auto-selected by NAME-TABLE cardinality
    (entities, not corpus):

    - <= broadcast_max_names: the {id: name} map is ray.put ONCE and read
      map-side (zero shuffles — the right shape while the entity table
      fits a worker heap);
    - above it: the SHARDED path — (row, ref_id) pairs hash-joined against
      the distributed name table, pivoted per row, left-joined back; no
      single process ever holds the name map.

    Entities must be materialized. Re-hashes _id for changed docs.
    Subclass snapshots remain the documented approximation."""
    name_ds = entities.map_batches(
        lambda t: t.filter(
            pa.compute.is_in(t["table"], value_set=pa.array(["areas", "orgs", "persons"]))
        ).select(["table", "id", "name"]),
        batch_format="pyarrow",
    )
    if name_ds.count() > broadcast_max_names:
        return _repair_sharded(entities, name_ds)

    import ray

    from ..ops.joins import _fetch

    name_rows = name_ds.to_pandas()
    # priority: persons < orgs < areas (later wins) — collisions are
    # practically impossible; membership fields reference one class each
    names: dict = {}
    for tbl in ("persons", "orgs", "areas"):
        sub = name_rows[name_rows["table"] == tbl]
        names.update(dict(zip(sub["id"], sub["name"])))
    ref = ray.put(names)

    def fix(batch: pa.Table) -> pa.Table:
        nm = _fetch(ref)
        tables = batch["table"].to_pylist()
        docs = batch["doc"].to_pylist()
        hashes = batch["_id"].to_pylist()
        changed = False
        for i, (tbl, blob) in enumerate(zip(tables, docs)):
            if tbl not in ("areas", "memberships"):
                continue
            doc = json.loads(blob)
            fixes = {
                nf: nm[doc[rf]]
                for rf, nf in _REF_FIELDS
                if doc.get(rf) is not None and doc[rf] in nm
            }
            if _apply_name_fixes(doc, fixes):
                docs[i] = canonical_json(doc)
                hashes[i] = doc["_id"]
                changed = True
        if not changed:
            return batch
        return pa.table(
            {
                "table": batch["table"],
                "id": batch["id"],
                "name": batch["name"],
                "class0": batch["class0"],
                "doc": pa.array(docs, pa.string()),
                "_id": pa.array(hashes, pa.string()),
            }
        )

    return entities.map_batches(fix, batch_format="pyarrow")


def _repair_sharded(
    entities: ray.data.Dataset, name_ds: ray.data.Dataset
) -> ray.data.Dataset:
    """The 10^12-doc shape of the snapshot-name repair: every step is a
    map_batches or a hash join; the name table is never collected."""
    import pandas as pd

    from ..ops.agg import bucketed_map_groups
    from ..ops.joins import hash_join

    prio = {"persons": 0, "orgs": 1, "areas": 2}

    def to_names(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"nid": b["id"], "nname": b["name"], "_prio": b["table"].map(prio)}
        )

    empty_names = pd.DataFrame(
        {"nid": pd.Series(dtype="object"), "nname": pd.Series(dtype="object")}
    )
    names = bucketed_map_groups(
        name_ds.map_batches(to_names, batch_format="pandas"),
        "nid",
        lambda b: b.sort_values(["nid", "_prio"], kind="mergesort")
        .drop_duplicates("nid", keep="last")[["nid", "nname"]],
        num_buckets=32,
        empty_result=empty_names,
    )

    def to_refs(b: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for tbl, eid, blob in zip(b["table"], b["id"], b["doc"]):
            if tbl not in ("areas", "memberships"):
                continue
            doc = json.loads(blob)
            for rf, nf in _REF_FIELDS:
                rid = doc.get(rf)
                if rid is not None:
                    rows.append({"rkey": f"{tbl}\x00{eid}", "nfield": nf, "rid": rid})
        out = pd.DataFrame(rows)
        if not len(out):
            out = pd.DataFrame(
                {c: pd.Series(dtype="object") for c in ("rkey", "nfield", "rid")}
            )
        return out

    refs = entities.map_batches(to_refs, batch_format="pandas")
    matched = hash_join(refs, names, "inner", on=("rid",), right_on=("nid",))

    empty_fixes = pd.DataFrame(
        {"fkey": pd.Series(dtype="object"), "fixes": pd.Series(dtype="object")}
    )

    def pivot(bucket: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for rkey, grp in bucket.groupby("rkey", sort=False):
            rows.append(
                {
                    "fkey": rkey,
                    "fixes": json.dumps(
                        dict(zip(grp["nfield"], grp["nname"])), sort_keys=True
                    ),
                }
            )
        return pd.DataFrame(rows) if rows else empty_fixes.copy()

    fixes = bucketed_map_groups(
        matched, "rkey", pivot, num_buckets=32, empty_result=empty_fixes
    )

    keyed = entities.map_batches(
        lambda b: b.assign(rkey=b["table"] + "\x00" + b["id"]), batch_format="pandas"
    )
    merged = hash_join(keyed, fixes, "left_outer", on=("rkey",), right_on=("fkey",))

    def apply(b: pd.DataFrame) -> pd.DataFrame:
        out_cols = ["table", "id", "name", "class0", "doc", "_id"]
        if not len(b):
            return pd.DataFrame({c: pd.Series(dtype="object") for c in out_cols})
        docs = b["doc"].tolist()
        hashes = b["_id"].tolist()
        for i, (blob, fx) in enumerate(zip(b["doc"], b["fixes"])):
            if not isinstance(fx, str):
                continue
            doc = json.loads(blob)
            if _apply_name_fixes(doc, json.loads(fx)):
                docs[i] = canonical_json(doc)
                hashes[i] = doc["_id"]
        out = b[["table", "id", "name", "class0"]].copy()
        out["doc"] = docs
        out["_id"] = hashes
        return out

    return merged.map_batches(apply, batch_format="pandas")


def canonicalize(mentions: ray.data.Dataset) -> ray.data.Dataset:
    """(bucket, key, state) -> entity rows. Combine tree: per-emission-batch
    partials -> cross-batch recombine (map-side) -> ONE bucket-keyed
    all-to-all -> whole-bucket merge+render."""
    # batch_size=None: recombine whole task outputs in one call (maximum
    # map-side combining) AND keep task bundling driven by the upstream
    # stage — a row-count batch_size here becomes min_rows_per_bundle for
    # the FUSED mention stage, which packed 3 read blocks per task and
    # left a third of the cores idle in the tail (ds.stats audit: 43
    # tasks / 32 cpus; 128 tasks after this change)
    reduced = mentions.map_batches(
        recombine_batch, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
    return reduced.groupby("bucket").map_groups(merge_bucket, batch_format="pyarrow")
