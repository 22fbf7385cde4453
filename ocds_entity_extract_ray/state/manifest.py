"""Per-partition lineage manifests + checkpoint/resume (north_rule:
"resumable from checkpoint with per-partition lineage + metrics").

The reference has no checkpointing — it drops the output collections and
reruns from scratch (/root/reference/index.js:62-73). Here every pipeline
stage writes partitioned Parquet plus a ``_MANIFEST.json`` recording the
input fingerprint, per-partition row counts and stage metrics; a rerun
with an unchanged input fingerprint skips the completed stage entirely
(idempotent, no double counting — SURVEY §7.4.6).
"""

from __future__ import annotations

import hashlib
import json
import os

import pyarrow.dataset as pads

MANIFEST_NAME = "_MANIFEST.json"


def config_digest(config: dict | None) -> str:
    """Deterministic digest of the run configuration that shapes the
    output (classifier overrides, product index, knobs). Part of the
    resume fingerprint: a rerun into the same --out with a different
    config must RECOMPUTE, not silently return stale results."""
    if not config:
        return ""
    blob = json.dumps(config, sort_keys=True, default=str).encode("utf-8")
    return hashlib.sha256(blob).hexdigest()


def _stat_entry(full: str, rel: str) -> tuple:
    st = os.stat(full)
    # size + mtime_ns: a same-size in-place edit of an input file changes
    # the fingerprint (content hashing without reading the data)
    return (rel, st.st_size, st.st_mtime_ns)


def data_files(path: str) -> list[tuple[str, str]]:
    """(full, relative) paths of the data files under ``path`` — one file
    itself, or a recursive walk skipping ``_``/``.``-prefixed names. THE
    shared definition of 'which files count as input': both the resume
    fingerprint here and kg_incremental's journal id use it, so the two
    can never disagree about what a delta contains."""
    if os.path.isfile(path):
        return [(path, os.path.basename(path))]
    out = []
    for root, dirs, files in os.walk(path):
        # skip _/.-prefixed DIRECTORY components too (Spark _temporary /
        # _logs leftovers): Arrow/Ray parquet discovery ignores those whole
        # subtrees, and a fingerprint must cover exactly what a reader
        # consumes — or a reader-invisible write would change a delta's
        # journal id and re-merge (double-count) an already-applied delta
        dirs[:] = [d for d in dirs if not (d.startswith("_") or d.startswith("."))]
        for f in sorted(files):
            if f.startswith("_") or f.startswith("."):
                continue
            full = os.path.join(root, f)
            out.append((full, os.path.relpath(full, path)))
    out.sort(key=lambda t: t[1])
    return out


def input_fingerprint(path: str, config: dict | None = None) -> dict:
    """Cheap, deterministic fingerprint of an input directory/file:
    relative names + sizes + mtimes of data files, plus a digest of the
    output-shaping run config."""
    entries = [_stat_entry(full, rel) for full, rel in data_files(path)]
    entries.sort()
    out = {"path": os.path.abspath(path), "files": entries}
    if config is not None:
        out["config"] = config_digest(config)
    return out


def partition_counts(out_dir: str) -> dict[str, int]:
    """Row count per hive partition directory (from Parquet metadata only)."""
    counts: dict[str, int] = {}
    for root, _dirs, files in os.walk(out_dir):
        part = os.path.relpath(root, out_dir)
        for f in files:
            if not f.endswith(".parquet"):
                continue
            frag = pads.dataset(os.path.join(root, f), format="parquet")
            n = sum(fr.count_rows() for fr in frag.get_fragments())
            counts[part] = counts.get(part, 0) + n
    return counts


def write_manifest(out_dir: str, fingerprint: dict, metrics: dict | None = None) -> dict:
    manifest = {
        "input": fingerprint,
        "partitions": partition_counts(out_dir),
        "metrics": metrics or {},
    }
    manifest["total_rows"] = sum(manifest["partitions"].values())
    tmp = os.path.join(out_dir, MANIFEST_NAME + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, indent=1)
    os.replace(tmp, os.path.join(out_dir, MANIFEST_NAME))  # atomic commit
    return manifest


def read_manifest(out_dir: str) -> dict | None:
    p = os.path.join(out_dir, MANIFEST_NAME)
    if not os.path.exists(p):
        return None
    with open(p) as fh:
        return json.load(fh)


def is_complete(out_dir: str, fingerprint: dict) -> bool:
    """True iff a prior run committed this stage for the same input —
    the resume predicate."""
    m = read_manifest(out_dir)
    return bool(m and m.get("input") == json.loads(json.dumps(fingerprint)))
