"""Triple materialization stage: entity rows -> (subj, pred, obj, props)
partitioned by subject hash (SURVEY §7.1 'materialize')."""

from __future__ import annotations

import json

import pyarrow as pa
import ray.data

from ..extraction.triples import entity_triples, membership_triple
from ..functions.hashing import stable_bucket

TRIPLE_SCHEMA = pa.schema(
    [
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("props", pa.string()),
        ("part", pa.int32()),
    ]
)


def triples_batch(batch: pa.Table, *, num_parts: int = 32) -> pa.Table:
    subs, preds, objs, props, parts = [], [], [], [], []
    for table, blob in zip(batch["table"].to_pylist(), batch["doc"].to_pylist()):
        doc = json.loads(blob)
        if table == "memberships":
            triples = [membership_triple(doc)]
        else:
            triples = entity_triples(table, doc)
        for s, p, o, pr in triples:
            subs.append(s)
            preds.append(p)
            objs.append(o)
            props.append(pr)
            parts.append(stable_bucket(s, num_parts))
    return pa.table(
        {
            "subj": pa.array(subs, pa.string()),
            "pred": pa.array(preds, pa.string()),
            "obj": pa.array(objs, pa.string()),
            "props": pa.array(props, pa.string()),
            "part": pa.array(parts, pa.int32()),
        }
    )


def materialize_triples(entities: ray.data.Dataset, *, num_parts: int = 32) -> ray.data.Dataset:
    return entities.map_batches(
        lambda b: triples_batch(b, num_parts=num_parts),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
