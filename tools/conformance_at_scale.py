"""One-shot scale-up conformance check: the DISTRIBUTED pipeline vs the
sequential oracle port at a corpus size where entity collisions are dense
(default 50,000 docs — 250x the pytest conformance corpus, 10x the prior
5,000-doc re-verification). Verifies the A5/A6 first-seen semantics keep
triple P/R = 1.0 when far more sightings race for the same first-writer
slots.

Usage: python tools/conformance_at_scale.py [n_docs]
Prints one JSON line: {"docs": N, "precision": p, "recall": r,
"doc_divergence": frac, "entities": n, "triples": n}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(n_docs: int = 50_000) -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    import pyarrow.dataset as pads

    from ocds_entity_extract_ray.extraction.triples import (
        oracle_entities_by_table,
        precision_recall,
        triples_from_entities,
    )
    from ocds_entity_extract_ray.functions.classify import (
        build_classifier_list_from_text,
    )
    from ocds_entity_extract_ray.oracle.reference_extractor import run_reference
    from ocds_entity_extract_ray.pipelines.kg import run_kg
    from ocds_entity_extract_ray.sources.readers import generate_pages
    from ocds_entity_extract_ray.sources.synth import (
        classifier_csv,
        make_record,
        product_index,
    )

    clist = build_classifier_list_from_text([classifier_csv()])
    pidx = product_index()

    pages_dir = generate_pages(f"/tmp/ocds_ray_conf_{n_docs}", n_docs)
    out = tempfile.mkdtemp(prefix="ocds_ray_conf_out_")
    try:
        report = run_kg(pages_dir, out, clist, pidx, num_buckets=128)
        assert report["docs"] == n_docs, report

        ent_rows = (
            pads.dataset(out + "/entities", format="parquet", partitioning="hive")
            .to_table()
            .to_pylist()
        )
        engine_tables: dict = {}
        for r in ent_rows:
            engine_tables.setdefault(r["table"], []).append(json.loads(r["doc"]))

        records = [make_record(i) for i in range(n_docs)]
        oracle_tables = oracle_entities_by_table(
            run_reference(sorted(records, key=lambda r: r["ocid"]), clist, pidx)
        )

        for t in ("persons", "orgs", "areas", "products", "memberships"):
            o_ids = {d["id"] for d in oracle_tables[t]}
            e_ids = {d["id"] for d in engine_tables[t]}
            assert o_ids == e_ids, (t, len(o_ids ^ e_ids))

        tri_rows = (
            pads.dataset(out + "/triples", format="parquet", partitioning="hive")
            .to_table()
            .to_pylist()
        )
        engine_triples = {(r["subj"], r["pred"], r["obj"], r["props"]) for r in tri_rows}
        p, r = precision_recall(engine_triples, triples_from_entities(oracle_tables))

        # doc-level divergence (the documented A6 promotion classes)
        from tests.conftest import approx_equal

        total = mismatched = 0
        for t in ("persons", "orgs", "areas", "products", "memberships"):
            o = {d["id"]: d for d in oracle_tables[t]}
            e = {d["id"]: d for d in engine_tables[t]}
            for k in o:
                total += 1
                do = {kk: v for kk, v in o[k].items() if kk != "_id"}
                de = {kk: v for kk, v in e[k].items() if kk != "_id"}
                if not approx_equal(do, de):
                    mismatched += 1

        result = {
            "docs": n_docs,
            "precision": p,
            "recall": r,
            "doc_divergence": round(mismatched / total, 5) if total else 0.0,
            "entities": report["entities"],
            "triples": report["triples"],
        }
        print(json.dumps(result))
        return result
    finally:
        shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    import ray

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    main(n)
    ray.shutdown()
