"""The flagship KG-construction pipeline (SURVEY §7.1):

pages.parquet (url, warc_ts, html, text, lang)
  -> mention detect+link   actor-pool map_batches (broadcast classifier /
                           product index; map-side partial combine)
  -> canonicalize          hash-bucketed groupby final combine (ONE shuffle)
  -> entities              write_parquet partitioned by table + manifest
  -> triples               flat emission, subject-hash partitioned write
                           + manifest
  (-> extract_text         stateless map_batches branch, byte-identity
                           invariant; exercised by tests and text queries)

Everything streams: no take_all/to_pandas/materialize on the big path; the
only all-to-all exchange is the bucket groupby over pre-combined partials.
Stage outputs are checkpoints — a rerun over the same input skips
completed stages via manifests (state/manifest.py).
"""

from __future__ import annotations

import os
import time

import pyarrow.dataset as pads
import ray.data

from ..sources.readers import read_pages, read_records
from ..stages.canonicalize import canonicalize, repair_area_parent_names
from ..stages.mentions import extract_mentions
from ..stages.triples_stage import materialize_triples
from ..state import manifest as mf


def _metadata_row_count(path: str) -> int:
    """Row count from Parquet footers only — no Ray job, no data read."""
    frags = pads.dataset(path, format="parquet").get_fragments()
    return sum(f.metadata.num_rows if f.metadata else f.count_rows() for f in frags)


def build_entities(
    pages: ray.data.Dataset,
    classifier_list: dict | None = None,
    product_index: dict | None = None,
    *,
    concurrency=None,
    batch_size: int = 512,
    num_buckets: int = 64,
    compute: str = "tasks",
) -> ray.data.Dataset:
    mentions = extract_mentions(
        pages,
        classifier_list,
        product_index,
        concurrency=concurrency,
        batch_size=batch_size,
        num_buckets=num_buckets,
        compute=compute,
    )
    # materialize before the parent-name repair (it re-reads the small
    # entity table to build the broadcast area-name map)
    return repair_area_parent_names(canonicalize(mentions).materialize())


def run_kg(
    pages_path: str,
    out_dir: str,
    classifier_list: dict | None = None,
    product_index: dict | None = None,
    *,
    concurrency=None,
    batch_size: int = 512,
    num_buckets: int = 64,
    triple_parts: int = 32,
    resume: bool = True,
    compute: str = "tasks",
    source: str = "pages",
    audit: bool = False,
) -> dict:
    """End-to-end run with per-stage metrics. Returns the run report
    {docs, entities, triples, secs, docs_per_sec, triples_per_sec, ...}.

    ``audit=True`` (pages source) additionally runs the reject channel
    (stages/audit.py) over the input: non-ok pages land in
    ``out_dir/audit/`` as parquet and the (status, n_pages, n_records)
    rollup lands in ``report['audit']`` — one extra scan of the input,
    opt-in because a healthy recurring feed doesn't pay it every run."""
    # the resume fingerprint covers every input that shapes the OUTPUT:
    # page files (name+size+mtime) AND the classifier/product-index/source
    # config — a rerun with -x overrides or a new index recomputes
    fp = mf.input_fingerprint(
        pages_path,
        config={
            "classifier_list": classifier_list,
            "product_index": product_index,
            "source": source,
        },
    )
    entities_dir = os.path.join(out_dir, "entities")
    triples_dir = os.path.join(out_dir, "triples")

    report: dict = {"pages_path": pages_path, "out_dir": out_dir}

    t0 = time.monotonic()
    if resume and mf.is_complete(entities_dir, fp):
        report["entities_resumed"] = True
        ent_manifest = mf.read_manifest(entities_dir)
    else:
        if source == "records":
            pages = read_records(pages_path)
        else:
            pages = read_pages(pages_path, columns=["url", "html"])
        n_docs = _metadata_row_count(pages_path)
        entities = build_entities(
            pages,
            classifier_list,
            product_index,
            concurrency=concurrency,
            batch_size=batch_size,
            num_buckets=num_buckets,
            compute=compute,
        )
        entities = entities.materialize()  # entity table is tiny vs input;
        # keeping it pinned lets the triples stage chain without a re-read job
        entities.write_parquet(entities_dir, partition_cols=["table"], mode="overwrite")
        secs = time.monotonic() - t0
        ent_manifest = mf.write_manifest(
            entities_dir,
            fp,
            {"docs": n_docs, "secs": round(secs, 3), "docs_per_sec": round(n_docs / secs, 1)},
        )
        report["docs"] = n_docs
    report["entities"] = ent_manifest["total_rows"]
    report["entities_metrics"] = ent_manifest["metrics"]

    t1 = time.monotonic()
    ent_fp = mf.input_fingerprint(entities_dir)
    if resume and mf.is_complete(triples_dir, ent_fp):
        report["triples_resumed"] = True
        tri_manifest = mf.read_manifest(triples_dir)
    else:
        if report.get("entities_resumed"):
            entities_ds = ray.data.read_parquet(entities_dir)
        else:
            entities_ds = entities
        triples = materialize_triples(entities_ds, num_parts=triple_parts)
        triples.write_parquet(triples_dir, partition_cols=["part"], mode="overwrite")
        secs = time.monotonic() - t1
        tri_manifest = mf.write_manifest(
            triples_dir,
            ent_fp,
            {"secs": round(secs, 3)},
        )
    report["triples"] = tri_manifest["total_rows"]

    if audit:
        import shutil

        from ..stages.audit import page_audit, record_audit, reject_summary

        if source == "records":
            audited = record_audit(read_records(pages_path)).materialize()
        else:
            audited = page_audit(
                read_pages(pages_path, columns=["url", "html"])
            ).materialize()
        summary = reject_summary(audited)
        n_rejects = int(summary.loc[summary["status"] != "ok", "n_pages"].sum())
        # stale-output guard (the _write_segments class of bug): a clean
        # re-run must not leave a previous run's reject rows contradicting
        # the all-ok report
        rejects_dir = os.path.join(out_dir, "audit")
        shutil.rmtree(rejects_dir, ignore_errors=True)
        if n_rejects > 0:
            # reject-bounded output, not corpus-bounded; count came from
            # the summary, so this is the only pass over the filter
            audited.filter(expr="status != 'ok'").write_parquet(
                rejects_dir, mode="overwrite"
            )
        report["audit"] = {
            row["status"]: {
                "n_pages": int(row["n_pages"]),
                "n_records": int(row["n_records"]),
            }
            for _i, row in summary.iterrows()
        }

    total_secs = time.monotonic() - t0
    report["secs"] = round(total_secs, 3)
    docs = report.get("docs") or ent_manifest["metrics"].get("docs") or 0
    if docs and total_secs > 0:
        report["docs_per_sec"] = round(docs / total_secs, 1)
        report["triples_per_sec"] = round(report["triples"] / total_secs, 1)
    # per-stage throughput (north_rule: "reporting per-stage docs/sec and
    # triples/sec metrics"): the scan+extract stage in docs/sec, the
    # triple-materialize stage in triples/sec
    ent_secs = ent_manifest["metrics"].get("secs")
    tri_secs = tri_manifest["metrics"].get("secs")
    report["stages"] = {
        "entities": {
            "secs": ent_secs,
            "docs_per_sec": round(docs / ent_secs, 1) if docs and ent_secs else None,
        },
        "triples": {
            "secs": tri_secs,
            "triples_per_sec": round(report["triples"] / tri_secs, 1)
            if tri_secs
            else None,
        },
    }
    return report
