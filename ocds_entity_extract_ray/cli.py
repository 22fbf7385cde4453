"""Command-line entry point — the reference CLI surface
(/root/reference/index.js:13-42) re-expressed for the Ray engine:

  reference                      | here
  -------------------------------+------------------------------------------
  -d/-c db+collection (Mongo)    | --pages DIR or --records DIR (Parquet)
  -o stream|db                   | -o ndjson|parquet
  -x classifiers.csv (multiple)  | -x classifiers.csv (multiple, later wins)
  -t test mode (dump, no writes) | -t (per-table counts + samples, no writes)
  products_cbmei collection      | --product-index products.parquet

Examples:
  python -m ocds_entity_extract_ray --pages /data/pages --out /data/kg
  python -m ocds_entity_extract_ray --pages /data/pages -o ndjson --out /tmp/kg \\
      -x overrides.csv --num-cpus 32 --resumable
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="ocds_entity_extract_ray",
        description="Ray-Data-native KG construction (entities + triples) "
        "from Common-Crawl-style pages or OCDS-style records.",
    )
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--pages", help="pages parquet dir (url, warc_ts, html, text, lang)")
    src.add_argument("--records", help="records parquet dir (ocid, record_json | struct)")
    p.add_argument("--out", required=True, help="output directory")
    p.add_argument("-o", "--output", choices=["parquet", "ndjson"], default="parquet",
                   help="sink: partitioned parquet (default) or NDJSON tables")
    p.add_argument("-x", "--classifiers", action="append", default=[],
                   help="classifier-override CSV (repeatable; later files win)")
    p.add_argument("--product-index", help="product catalog parquet (id, name, description)")
    p.add_argument("-t", "--test", action="store_true",
                   help="test mode: print per-table counts + a sample, write nothing")
    p.add_argument("--audit", action="store_true",
                   help="also run the reject channel: non-ok pages/records -> "
                        "OUT/audit/, rollup in the report (one extra scan of "
                        "the input; --pages and --records sources)")
    p.add_argument("--resumable", action="store_true",
                   help="shard-granular checkpointing (skip completed input shards)")
    p.add_argument("--incremental", metavar="STORE_DIR",
                   help="incremental mode: merge the input as a DELTA into "
                   "the persisted state store at STORE_DIR (bootstrap it if "
                   "absent), then export entities+triples to --out")
    p.add_argument("--num-buckets", type=int, default=128)
    p.add_argument("--num-shards", type=int, default=16)
    p.add_argument("--num-cpus", type=int, default=None,
                   help="ray.init num_cpus (default: all)")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from .functions.classify import build_classifier_list
    from .pipelines.kg import build_entities, run_kg
    from .pipelines.kg_resumable import run_kg_resumable
    from .sources.readers import read_pages, read_records
    from .stages.sinks import entities_table_counts, write_ndjson_tables

    classifier_list = build_classifier_list(args.classifiers) if args.classifiers else None
    product_index: dict = {}
    if args.product_index:
        import pyarrow.parquet as pq

        for row in pq.read_table(args.product_index).to_pylist():
            product_index.setdefault(row["id"], row)

    source_path = args.pages or args.records
    reader = read_pages if args.pages else read_records
    read_kwargs = {"columns": ["url", "html"]} if args.pages else {}

    if args.test:
        # K3 parity (index.js:98-102): run, print, write nothing
        entities = build_entities(
            reader(source_path, **read_kwargs), classifier_list, product_index,
            num_buckets=args.num_buckets,
        )
        counts = entities_table_counts(entities)
        print(json.dumps({"tables": counts, "total": sum(counts.values())}, indent=1))
        for row in entities.take(3):
            print(row["table"], row["id"], row["doc"][:160])
        print("Testing complete.")
        return 0

    if args.output == "ndjson":
        entities = build_entities(
            reader(source_path, **read_kwargs), classifier_list, product_index,
            num_buckets=args.num_buckets,
        )
        counts = write_ndjson_tables(entities, args.out)
        print(json.dumps({"sink": "ndjson", "out": args.out, "tables": counts}))
        return 0

    if args.audit and (args.incremental or args.resumable):
        # refuse rather than silently drop the flag (the operator would
        # read an all-ok report that never looked)
        print(
            "error: --audit supports the plain --pages/--records run; "
            "run it as a separate pass for --incremental/--resumable",
            file=sys.stderr,
        )
        return 2
    if args.incremental:
        import os

        from .pipelines.kg_incremental import kg_export, kg_init, kg_update

        store = args.incremental
        src_kind = "records" if args.records else "pages"
        if os.path.exists(os.path.join(store, "meta.json")):
            report = kg_update(
                source_path, store, classifier_list, product_index, source=src_kind
            )
            report["mode"] = "update"
        else:
            report = kg_init(
                source_path, store, classifier_list, product_index,
                num_buckets=args.num_buckets, source=src_kind,
            )
            report["mode"] = "init"
        report.update(kg_export(store, args.out))
        print(json.dumps(report))
        return 0

    if args.resumable:
        if args.records:
            print("error: --resumable currently supports --pages sources", file=sys.stderr)
            return 2
        report = run_kg_resumable(
            source_path, args.out, classifier_list, product_index,
            num_shards=args.num_shards, num_buckets=args.num_buckets,
        )
    else:
        report = run_kg(
            source_path, args.out, classifier_list, product_index,
            num_buckets=args.num_buckets,
            source="records" if args.records else "pages",
            audit=args.audit,
        )
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
