#!/usr/bin/env python
"""Benchmark harness.

Default: run the headline KG pipeline + representative relational queries
over $GRAFT_SF_DIR (default /root/testdata/sf0.1) under
ray.init(num_cpus=$RAY_GRAFT_CPUS, default 32) and print ONE JSON line:
{"metric": ..., "value": <headline secs>, "unit": "sec",
 "queries": {...}, "sf": ..., "num_cpus": N, "docs_per_sec": ..., ...}

--scaling: run the same job twice in FRESH processes at num_cpus=8 and 32
on the same input and report both throughputs + scaling efficiency
(the sandbox protocol for the north_rule's two-cluster-size criterion).
"""

from __future__ import annotations

import json
import os
import re
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
# scaling legs measure the headline KG pipeline only (the two-cluster-size
# criterion is about the flagship job, and four full benches would take
# ~20 min of pure query re-measurement)
KG_ONLY = os.environ.get("GRAFT_KG_ONLY", "") == "1"
CORPUS_DOCS_PER_SF = 8_000_000  # sf0.1 -> 800k synthetic pages


def _sf_of(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", os.path.basename(os.path.normpath(sf_dir)))
    return float(m.group(1)) if m else 0.1


BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_top_unshipped",
    "q4_order_priority",
    "q5_nation_revenue",
    "q6_revenue",
    "q_events_tumbling",
    "q_sessions",
    "q_token_stats",
    "q_exact_dedup_stats",
    "q_ann_topk",
    "q_embedding_near_dups",
    "q_minhash_dup_pairs",
    # round-2 additions (absent from BENCH_r01; compare from r02 on)
    "q_doc_packing",
    "q_repetition",
    "q_curation",
    # round-3 additions (compare from r03 on)
    "q13_order_count_distribution",
    "q18_large_orders",
    "q_ngram_jaccard_pairs",
    "q_salient_terms",
    "q_contamination",
    "q_pivot_segment_priority",
    "q_split_counts",
    "q_fingerprint_overlap",
    "q_curation_v2",
    "q8_market_share",
    "q21_waiting_suppliers",
    "q_json_props_stats",
    "q_source_dup_profile",
    # round-3 continuation (window functions / graph / search index)
    "q_running_total",
    "q_supplier_triangles",
    "q_inverted_index",
    # round-3 continuation 2 (skew join / CDC / diff / distribution windows)
    "q_skew_join_type_weight",
    "q_latest_event_per_user",
    "q_table_diff",
    "q_funnel_view_purchase",
    "q_order_ntile",
    "q_kmeans_clusters",
    # round-3 continuation 3 (PII scrub / BFS / profile / full outer)
    "q_pii_redaction",
    "q_bfs_purchase_radius",
    "q_profile_orders",
    "q_full_outer_year_activity",
    "q_first_last_orders",
    "q_weighted_purchase_paths",
    "q_zorder_orders",
    "q_cap_docs_per_source",
    "q_unigram_surprisal",
    # round-3 continuation 4 (graph cores / link prediction / URL laundry)
    "q_kcore_parts",
    "q_link_prediction_parts",
    "q_url_domain_stats",
    "q_cohort_retention",
    "q_median_order_cents",
    "q_event_transitions",
    "q_scd2_user_value",
    "q_personalized_pagerank",
    "q_bucketed_join_segments",
    # round-4 additions (compare from r04 on)
    "q_passage_dedup",
    "q_semantic_dedup",
    "q_bm25_topk",
    "q_late_events",
    "q_gopher_quality",
    "q_bpe_merges",
    "q_ngram_char_fracs",
    "q_range_moving_sum",
    "q_iqr_outliers",
    "q_gapfill_daily_orders",
    "q_top_session_paths",
    "q_revenue_share",
    "q_url_frontier_dedup",
    # round-5 additions (compare from r05 on): the media dedup trio +
    # CCNet line dedup, C4 battery, BPE apply, LPA communities
    "q_image_dup_pairs",
    "q_audio_dup_pairs",
    "q_video_dup_pairs",
    "q_line_dedup",
    "q_c4_quality",
    "q_bpe_token_counts",
    "q_label_prop",
    "q_ann_ivf_topk",
    "q_temperature_mix",
    "q_domain_split_leakage",
    "q_bigram_lm_filter",
    "q_length_trim",
    "q_target_lm_selection",
    "q_span_dedup",
    # round-5 session-6 additions
    "q_canonical_docs",
    "q_epoch_shuffle",
    "q_streaming_window_ingest",
    "q_crawl_drift",
    "q_url_blocklist",
    "q_robots_filter",
    "q_crawl_admission",
]


def run_bench() -> dict:
    # route Ray Data's console logging through bench_logging.yaml (console
    # at ERROR; the full log incl. warnings still lands in the session's
    # ray-data.log) — see the yaml header for the two Ray-internal
    # warnings this silences. Must be set BEFORE ray.init so worker
    # processes inherit it.
    os.environ.setdefault(
        "RAY_DATA_LOGGING_CONFIG",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_logging.yaml"),
    )
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import ray.data

    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False


    from ocds_entity_extract_ray.functions.classify import build_classifier_list_from_text
    from ocds_entity_extract_ray.pipelines.kg import run_kg
    from ocds_entity_extract_ray.pipelines.relational import ROWS_ONLY_QUERIES, SQL_QUERIES
    from ocds_entity_extract_ray.sources.readers import generate_pages
    from ocds_entity_extract_ray.sources.synth import classifier_csv, product_index

    sf = _sf_of(SF_DIR)
    n_docs = max(500, int(CORPUS_DOCS_PER_SF * sf))
    from ocds_entity_extract_ray.state.paths import scratch_path, storage_root
    pages_dir = scratch_path(f"pages_{n_docs}")
    generate_pages(pages_dir, n_docs, shard_rows=max(500, n_docs // 128))

    # warm-up, untimed: (a) pull the input into the OS page cache with plain
    # driver-side byte reads (NOT a Ray read — pushing the whole corpus
    # through the object store leaves spill/GC churn that perturbs the timed
    # run), (b) a tiny pipeline run so worker processes import the modules
    for root, _dirs, files in os.walk(pages_dir):
        for f in files:
            if f.endswith(".parquet"):
                with open(os.path.join(root, f), "rb") as fh:
                    while fh.read(1 << 22):
                        pass
    clist = build_classifier_list_from_text([classifier_csv()])
    warm_dir = generate_pages(scratch_path("pages_500"), 500, shard_rows=125)
    shutil.rmtree(os.path.join(storage_root(), "ocds_ray_warm_out"), ignore_errors=True)
    run_kg(warm_dir, os.path.join(storage_root(), "ocds_ray_warm_out"), clist, product_index(), num_buckets=32, resume=False)

    # best-of-2: co-tenant load on this box spikes intermittently (observed
    # up to 2x on a single run); report both raw runs for transparency
    out_dir = os.path.join(storage_root(), "ocds_ray_bench_out")
    kg_runs = []
    for _rep in range(2):
        shutil.rmtree(out_dir, ignore_errors=True)
        t0 = time.monotonic()
        report = run_kg(
            pages_dir,
            out_dir,
            clist,
            product_index(),
            batch_size=1024,
            num_buckets=max(64, NUM_CPUS * 4),
            resume=False,
        )
        kg_runs.append(round(time.monotonic() - t0, 3))
    kg_secs = min(kg_runs)

    if KG_ONLY:
        result = {
            "metric": "kg_pipeline_secs",
            "value": round(kg_secs, 3),
            "unit": "sec",
            "queries": {"kg_pipeline": round(kg_secs, 3)},
            "kg_pipeline_runs": kg_runs,
            "sf": sf,
            "num_cpus": NUM_CPUS,
            "docs": report.get("docs"),
            "entities": report.get("entities"),
            "triples": report.get("triples"),
            "docs_per_sec": round(report.get("docs", 0) / kg_secs, 1),
            "triples_per_sec": round(report.get("triples", 0) / kg_secs, 1),
        }
        ray.shutdown()
        return result

    # the same pipeline through the ACTOR-POOL scorer stage (the
    # north-star NER/link shape: per-actor state in __init__, pool sized
    # to the node) — measured so pool sizing claims have a number
    actors_dir = os.path.join(storage_root(), "ocds_ray_bench_out_actors")
    shutil.rmtree(actors_dir, ignore_errors=True)
    t_a = time.monotonic()
    run_kg(
        pages_dir,
        actors_dir,
        clist,
        product_index(),
        batch_size=1024,
        num_buckets=max(64, NUM_CPUS * 4),
        resume=False,
        compute="actors",
        # fixed pool at 3/4 of the CPUs: actors hold their CPU permanently,
        # so a pool equal to the cluster size STARVES the upstream read
        # tasks (measured: pool=32 on 32 cpus never finishes; pool=24 is
        # the fastest stable config, beating the (8,32) autoscaling pool)
        concurrency=max(2, NUM_CPUS * 3 // 4),
    )
    kg_actor_secs = time.monotonic() - t_a

    queries: dict[str, float] = {
        "kg_pipeline": round(kg_secs, 3),
        "kg_pipeline_actors": round(kg_actor_secs, 3),
    }
    registry = {name: fn for name, (fn, _sql) in SQL_QUERIES.items()}
    registry.update(ROWS_ONLY_QUERIES)
    for name in BENCH_QUERIES:
        fn = registry[name]
        tq = time.monotonic()
        res = fn(SF_DIR)
        if hasattr(res, "count") and not hasattr(res, "columns"):
            res.count()
        queries[name] = round(time.monotonic() - tq, 3)

    # incremental materialization: measure a delta ingest against the
    # bootstrap over the same store (the O(delta + touched-state), not
    # O(corpus), claim with a number attached). Run at 1/4 of the bench
    # corpus so the extra wall-time stays modest.
    import pyarrow.parquet as pq

    from ocds_entity_extract_ray.pipelines.kg_incremental import kg_init, kg_update

    inc_docs = max(2_000, n_docs // 4)
    inc_corpus = generate_pages(
        scratch_path(f"pages_inc_{inc_docs}"),
        inc_docs,
        shard_rows=max(500, inc_docs // 64),
    )
    shard_files = sorted(
        f for f in os.listdir(inc_corpus) if f.endswith(".parquet")
    )
    init_dir = os.path.join(storage_root(), f"ocds_ray_inc_init_{inc_docs}")
    delta_dir = os.path.join(storage_root(), f"ocds_ray_inc_delta_{inc_docs}")
    for d in (init_dir, delta_dir):
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(d)
    init_docs = delta_docs = 0
    for i, f in enumerate(shard_files):
        # every 16th shard is the "new crawl" delta (~6%); doc counts come
        # from the parquet footers (the last shard is usually short, so
        # inc_docs arithmetic would misreport them)
        rows = pq.ParquetFile(os.path.join(inc_corpus, f)).metadata.num_rows
        if i % 16 == 0:
            dst, delta_docs = delta_dir, delta_docs + rows
        else:
            dst, init_docs = init_dir, init_docs + rows
        os.symlink(os.path.join(inc_corpus, f), os.path.join(dst, f))
    store = os.path.join(storage_root(), "ocds_ray_inc_store")
    shutil.rmtree(store, ignore_errors=True)
    # buckets scale with the corpus, not the CPU count: locality (an
    # update touches only the delta's buckets) only materializes when
    # buckets >> delta key count — at 100 TB this would be ~1M buckets
    inc_buckets = 1024
    t_i = time.monotonic()
    init_rep = kg_init(init_dir, store, clist, product_index(), num_buckets=inc_buckets)
    init_secs = time.monotonic() - t_i
    t_u = time.monotonic()
    upd_rep = kg_update(delta_dir, store, clist, product_index())
    upd_secs = time.monotonic() - t_u
    queries["kg_incremental_init"] = round(init_secs, 3)
    queries["kg_incremental_update"] = round(upd_secs, 3)

    # localized delta: a SMALL crawl shard (few distinct entities) should
    # touch few buckets and update in time proportional to those buckets,
    # not the store — the bucket-locality claim with a number attached
    local_dir = os.path.join(storage_root(), "ocds_ray_inc_delta_local")
    shutil.rmtree(local_dir, ignore_errors=True)
    # start beyond the inc corpus: the local delta is genuinely NEW docs
    generate_pages(local_dir, 16, shard_rows=16, start=inc_docs)
    local_docs = sum(
        pq.ParquetFile(os.path.join(local_dir, f)).metadata.num_rows
        for f in os.listdir(local_dir)
        if f.endswith(".parquet")
    )
    t_l = time.monotonic()
    local_rep = kg_update(local_dir, store, clist, product_index())
    local_secs = time.monotonic() - t_l
    queries["kg_incremental_update_local"] = round(local_secs, 3)

    result = {
        "metric": "kg_pipeline_secs (pages->entities->triples) + per-query secs",
        "value": round(kg_secs, 3),
        "unit": "sec",
        "kg_pipeline_runs": kg_runs,
        "queries": queries,
        "sf": sf,
        "num_cpus": NUM_CPUS,
        "docs": report.get("docs"),
        "entities": report.get("entities"),
        "triples": report.get("triples"),
        "docs_per_sec": round(report.get("docs", 0) / kg_secs, 1),
        "triples_per_sec": round(report.get("triples", 0) / kg_secs, 1),
        # per-stage metrics from the run's lineage manifests (the
        # north-rule's "per-stage docs/sec and triples/sec")
        "stages": report.get("stages"),
        "incremental": {
            "init_docs": init_docs,
            "delta_docs": delta_docs,
            "init_secs": round(init_secs, 3),
            "update_secs": round(upd_secs, 3),
            "update_speedup_vs_rebuild": round(init_secs / upd_secs, 2)
            if upd_secs
            else None,
            "touched_buckets": len(upd_rep.get("touched_buckets", [])),
            "num_buckets": inc_buckets,
            "entities_after": upd_rep.get("merged_state_rows"),
            "local_delta_docs": local_docs,
            "local_update_secs": round(local_secs, 3),
            "local_touched_buckets": len(local_rep.get("touched_buckets", [])),
            "local_update_speedup_vs_rebuild": round(init_secs / local_secs, 2)
            if local_secs
            else None,
        },
    }
    ray.shutdown()
    return result


def run_scaling() -> dict:
    """Same job + input at num_cpus=8 and num_cpus=32 in fresh processes."""

    def run_once(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_KG_ONLY="1")
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    def run(ncpu: int) -> dict:
        # each leg = ONE fresh process that itself runs the pipeline twice
        # and reports the best (run_bench's best-of-2): single-run noise on
        # this box is ~±20% and the efficiency ratio is hypersensitive to it
        return run_once(ncpu)

    lo_cpus, hi_cpus = 8, 32
    lo, hi = run(lo_cpus), run(hi_cpus)
    t_lo, t_hi = lo["value"], hi["value"]
    eff = (t_lo / t_hi) / (hi_cpus / lo_cpus)
    return {
        "metric": "kg_pipeline scaling efficiency (N=8 -> 4N=32 cpus, fresh processes, same input)",
        "sec_8": t_lo,
        "sec_32": t_hi,
        "docs_per_sec_8": lo["docs_per_sec"],
        "docs_per_sec_32": hi["docs_per_sec"],
        "triples_per_sec_8": lo["triples_per_sec"],
        "triples_per_sec_32": hi["triples_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "sf": lo["sf"],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
