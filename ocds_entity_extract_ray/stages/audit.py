"""Page-audit stage: the reject / dead-letter channel of the flagship
pipeline.

The mention stage SKIPS what it cannot parse (garbage html, truncated
JSON-LD, non-object payloads) so one hostile page never kills a task —
but at crawl scale "skipped" must be an auditable output, not a log
line: an operator needs to know how much of a 10^12-page corpus was
dropped and WHY before trusting the KG built from the rest.

``page_audit`` classifies every page through the SAME event stream the
mention stage consumes (``stages/mentions.py:iter_page_events`` — one
parser, two consumers, zero possibility of divergence) and returns one
row per page: counts per event kind plus a first-problem ``status``.
``reject_summary`` rolls that up to (status, n_pages) — the small frame
a crawl-health dashboard reads.

Scale shape: pure map over the pages stream (same cost profile as the
mention stage's parse, no shuffle); the rollup ships 4 tiny partial rows
per block. Write the per-URL frame filtered to non-ok rows — rejects are
a small fraction of a healthy crawl, so the audit output is
reject-bounded, not corpus-bounded.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data

from .mentions import iter_page_events

AUDIT_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("n_records", pa.int64()),
        ("n_bad_json", pa.int64()),
        ("n_non_object", pa.int64()),
        ("status", pa.string()),
    ]
)

# first-problem precedence: a page with any unparseable block is
# 'bad_json' even if other blocks parsed — partial extraction still
# means data loss the operator should see
_STATUSES = ("bad_json", "non_object", "no_jsonld", "ok")


def _audit_one(url: str, html) -> tuple:
    n_rec = n_bad = n_nonobj = 0
    for kind, _ok, _record in iter_page_events(url, html):
        if kind == "record":
            n_rec += 1
        elif kind == "bad_json":
            n_bad += 1
        else:
            n_nonobj += 1
    if n_bad:
        status = "bad_json"
    elif n_nonobj:
        status = "non_object"
    elif n_rec == 0:
        status = "no_jsonld"
    else:
        status = "ok"
    return url, n_rec, n_bad, n_nonobj, status


def page_audit(pages: ray.data.Dataset) -> ray.data.Dataset:
    """pages (url, html) -> one audit row per page (AUDIT_SCHEMA)."""

    def audit_batch(batch: pa.Table) -> pa.Table:
        rows = [
            _audit_one(url, html)
            for url, html in zip(
                batch["url"].to_pylist(), batch["html"].to_pylist()
            )
        ]
        cols = list(zip(*rows)) if rows else [[], [], [], [], []]
        return pa.table(
            {
                "url": pa.array(cols[0], pa.string()),
                "n_records": pa.array(cols[1], pa.int64()),
                "n_bad_json": pa.array(cols[2], pa.int64()),
                "n_non_object": pa.array(cols[3], pa.int64()),
                "status": pa.array(cols[4], pa.string()),
            }
        )

    return pages.map_batches(audit_batch, batch_format="pyarrow", zero_copy_batch=True)


def record_audit(records: ray.data.Dataset) -> ray.data.Dataset:
    """records source (ocid, record_json) -> the same audit surface the
    pages path gets: one row per record with status ok / bad_json /
    non_object, through the SAME classifier the mention stage's records
    path skips with (stages/mentions.py:classify_record_blob)."""
    from .mentions import classify_record_blob

    def audit_batch(batch: pa.Table) -> pa.Table:
        ocids = batch["ocid"].to_pylist()
        statuses = [
            classify_record_blob(b)[0] for b in batch["record_json"].to_pylist()
        ]
        return pa.table(
            {
                "url": pa.array(ocids, pa.string()),
                "n_records": pa.array(
                    [1 if s == "ok" else 0 for s in statuses], pa.int64()
                ),
                "n_bad_json": pa.array(
                    [1 if s == "bad_json" else 0 for s in statuses], pa.int64()
                ),
                "n_non_object": pa.array(
                    [1 if s == "non_object" else 0 for s in statuses], pa.int64()
                ),
                "status": pa.array(statuses, pa.string()),
            }
        )

    return records.map_batches(
        audit_batch, batch_format="pyarrow", zero_copy_batch=True
    )


def reject_summary(audit: ray.data.Dataset) -> pd.DataFrame:
    """Audit rows -> (status, n_pages, n_records) rollup, every status
    present (zero-filled) so dashboards see explicit zeros."""
    from ..ops.agg import grouped_agg

    out = grouped_agg(
        audit,
        ["status"],
        {"n_pages": ("url", "count"), "n_records": ("n_records", "sum")},
        final="driver",
        # zero-block input concatenates column-less without this (the
        # to_pandas_safe failure mode) and the status merge would KeyError
        empty_result=pd.DataFrame(
            {
                "status": pd.Series(dtype="object"),
                "n_pages": pd.Series(dtype="int64"),
                "n_records": pd.Series(dtype="int64"),
            }
        ),
    )
    base = pd.DataFrame({"status": list(_STATUSES)})
    out = base.merge(out, on="status", how="left").fillna(0)
    out["n_pages"] = out["n_pages"].astype("int64")
    out["n_records"] = out["n_records"].astype("int64")
    return out.sort_values("status").reset_index(drop=True)
