"""Shard-granular resumable KG run (north_rule: "resumable from checkpoint
with per-partition lineage").

``run_kg`` (kg.py) checkpoints at stage granularity. This variant makes the
EXPENSIVE phase — the full scan + mention extraction over the pages corpus —
resumable at input-shard granularity:

  phase 1 (map, resumable): input files grouped into G shards; each shard
    runs read -> mention extract -> partial combine -> writes its own
    ``mentions/shard=K/`` parquet + manifest. A rerun skips every shard
    whose manifest matches its input fingerprint. Failure mid-run loses at
    most one shard's work; completed shards are never recomputed OR
    double-counted (states are written once per shard, atomically via
    manifest commit).

  phase 2 (reduce): global canonicalize over the compact mention states of
    ALL shards (orders of magnitude smaller than the corpus), then triples.
    Cheap relative to phase 1; always re-run for correctness.

At 100 TB this is the shape that matters: the petabyte scan is the thing
you cannot afford to repeat after a fault at hour 9.
"""

from __future__ import annotations

import os
import time

import ray.data

from ..sources.readers import read_pages
from ..stages.canonicalize import canonicalize, repair_area_parent_names
from ..stages.mentions import extract_mentions
from ..stages.triples_stage import materialize_triples
from ..state import manifest as mf


def _input_files(pages_path: str) -> list[str]:
    if os.path.isfile(pages_path):
        return [pages_path]
    out = []
    for root, _dirs, files in os.walk(pages_path):
        for f in sorted(files):
            if f.endswith(".parquet"):
                out.append(os.path.join(root, f))
    return sorted(out)


def run_kg_resumable(
    pages_path: str,
    out_dir: str,
    classifier_list: dict | None = None,
    product_index: dict | None = None,
    *,
    num_shards: int = 16,
    num_buckets: int = 64,
    batch_size: int = 1024,
    triple_parts: int = 32,
) -> dict:
    files = _input_files(pages_path)
    num_shards = min(num_shards, len(files))
    groups: list[list[str]] = [files[i::num_shards] for i in range(num_shards)]

    mentions_root = os.path.join(out_dir, "mentions")
    report: dict = {"shards": num_shards, "shards_resumed": 0, "shards_computed": 0}

    t0 = time.monotonic()
    shard_config = {
        "classifier_list": classifier_list,
        "product_index": product_index,
        # num_buckets shapes the shard output (the state rows' bucket col)
        "num_buckets": num_buckets,
    }
    for k, group in enumerate(groups):
        shard_dir = os.path.join(mentions_root, f"shard={k}")
        fp = {
            "files": [
                (os.path.basename(f), os.path.getsize(f), os.stat(f).st_mtime_ns)
                for f in group
            ],
            "config": mf.config_digest(shard_config),
        }
        if mf.is_complete(shard_dir, fp):
            report["shards_resumed"] += 1
            continue
        mentions = extract_mentions(
            read_pages(group, columns=["url", "html"]),
            classifier_list,
            product_index,
            batch_size=batch_size,
            num_buckets=num_buckets,
        )
        mentions.write_parquet(shard_dir, mode="overwrite")
        mf.write_manifest(shard_dir, fp, {"input_files": len(group)})
        report["shards_computed"] += 1
    report["map_secs"] = round(time.monotonic() - t0, 3)

    t1 = time.monotonic()
    # read ONLY this run's shard dirs — a previous run with more shards may
    # have left orphaned shard=K dirs that must not leak into the reduce
    import re
    import shutil

    for stale in os.listdir(mentions_root) if os.path.isdir(mentions_root) else []:
        m = re.fullmatch(r"shard=(\d+)", stale)
        # non-numeric artifacts (editor temp dirs etc.) are skipped, not fatal
        if m and int(m.group(1)) >= num_shards:
            shutil.rmtree(os.path.join(mentions_root, stale))
    state_files = []
    for k in range(num_shards):
        state_files.extend(_input_files(os.path.join(mentions_root, f"shard={k}")))
    all_states = ray.data.read_parquet(
        state_files, override_num_blocks=max(1, len(state_files))
    )
    entities = repair_area_parent_names(canonicalize(all_states).materialize()).materialize()
    entities_dir = os.path.join(out_dir, "entities")
    entities.write_parquet(entities_dir, partition_cols=["table"], mode="overwrite")
    triples = materialize_triples(entities, num_parts=triple_parts)
    triples_dir = os.path.join(out_dir, "triples")
    triples.write_parquet(triples_dir, partition_cols=["part"], mode="overwrite")
    ent_m = mf.write_manifest(entities_dir, mf.input_fingerprint(mentions_root), {})
    tri_m = mf.write_manifest(triples_dir, mf.input_fingerprint(entities_dir), {})
    report["reduce_secs"] = round(time.monotonic() - t1, 3)
    report["entities"] = ent_m["total_rows"]
    report["triples"] = tri_m["total_rows"]
    report["secs"] = round(time.monotonic() - t0, 3)
    return report
