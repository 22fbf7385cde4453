"""Incremental KG materialization: ingest a new crawl delta by merging it
into the PERSISTED canonicalization state instead of recomputing the
world.

The reference drops its output collections and recomputes everything on
every run (`/root/reference/index.js:62-73` — `drop()` then full cursor
scan). At 100 TB that shape is unusable: a daily crawl shard is a few
permille of the corpus. This pipeline exploits the property the whole
distributed design already rests on: the SURVEY §2.5 accumulators
(A1-A7 — counter sums, min/max dates, ordered set unions, first-writer
slots with deterministic sortkeys) are associative and commutative, so
`merge_state(old, delta)` over persisted per-entity state equals a full
recompute bit-for-bit (pytest-pinned in tests/test_kg_pipeline.py).

Store layout (all partitioned by the canonicalize hash bucket, so an
update rewrites only TOUCHED partitions and a failed update resumes by
partition):

    store/
      meta.json                  {num_buckets, version}
      states/bucket=K/*.parquet  merged (key, state) rows — the mergeable
                                 canonicalization state, NOT rendered docs
      entities_raw/bucket=K/...  rendered entity rows per bucket (before
                                 the global snapshot-name repair)

Multi-node storage contract: ``store_dir`` is an arbitrary caller path
(pytest runs the store under tmp roots; entry points resolve theirs via
``state/paths.py:storage_root`` / the ``GRAFT_STORAGE_ROOT`` env var).
On a real cluster it MUST live on a shared filesystem (NFS / Lustre /
fuse mount): the data reads/writes go through Ray's parquet IO (URI-
capable), but the crash-safe journal + per-bucket swap below rely on
POSIX renames, which bare object-store URIs don't provide.

Update cost: extract(delta) + one bucket shuffle over DELTA-sized
partials + a merge+render over only the buckets the delta touches —
O(delta + touched-state), never O(corpus). The export step applies the
snapshot-name repair (a broadcast/sharded map, no shuffle) over the
entity table (entity-sized, orders of magnitude below the corpus) and
re-derives triples.
"""

from __future__ import annotations

import json
import os
import shutil

import pyarrow as pa
import ray.data

from ..sources.readers import read_pages, read_records
from ..stages.canonicalize import (
    merge_bucket,
    recombine_batch,
    repair_area_parent_names,
)
from ..stages.mentions import extract_mentions
from ..stages.triples_stage import materialize_triples

_STATES = "states"
_ENTITIES_RAW = "entities_raw"
_META = "meta.json"
_JOURNAL = "journal"
_STAGING = "_staging"
_RETIRED = "_retired"


def _norm(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Canonical (bucket:int32, key, state) column order/types — hive
    partition reads put the partition column last and may widen its type,
    and union requires both sides to agree exactly."""

    def f(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "bucket": b["bucket"].cast(pa.int32()),
                "key": b["key"].cast(pa.string()),
                "state": b["state"].cast(pa.string()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def _tag_ord(ds: ray.data.Dataset, v: int) -> ray.data.Dataset:
    """Append a constant ``_ord`` column (0 = old store rows, 1 = delta
    rows). The groupby merge sorts on it inside each group so the
    old-before-delta first-writer order is EXPLICIT — the serialized state
    blobs' JSON field order and sortkey-tie winners must not inherit the
    exchange's internal block ordering (which Ray does not contractually
    fix for equal keys)."""

    def f(t: pa.Table) -> pa.Table:
        import numpy as np

        return t.append_column("_ord", pa.array(np.full(len(t), v, dtype=np.int64)))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def _recombine_ordered(tbl: pa.Table) -> pa.Table:
    """recombine_batch with the _ord discipline: old rows first. Each
    entity key has at most one old and one delta row, so sorting on _ord
    alone fixes every per-key merge order."""
    if "_ord" in tbl.column_names:
        tbl = tbl.sort_by([("_ord", "ascending")]).drop_columns(["_ord"])
    return recombine_batch(tbl)


def _merged_states(
    pages: ray.data.Dataset,
    classifier_list: dict | None,
    product_index: dict | None,
    *,
    num_buckets: int,
    concurrency=None,
    batch_size: int = 512,
    compute: str = "tasks",
) -> ray.data.Dataset:
    """pages -> fully merged (bucket, key, state): the canonicalize
    combine tree (map-side partials -> cross-batch recombine -> one
    bucket shuffle) stopping BEFORE render, so the result is mergeable
    with previously persisted state."""
    mentions = extract_mentions(
        pages,
        classifier_list,
        product_index,
        concurrency=concurrency,
        batch_size=batch_size,
        num_buckets=num_buckets,
        compute=compute,
    )
    reduced = mentions.map_batches(
        recombine_batch, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
    # recombine_batch is the merge kernel: applied to one whole bucket it
    # yields exactly one state row per entity key
    return _norm(reduced.groupby("bucket").map_groups(recombine_batch, batch_format="pyarrow"))


def _render_states(states: ray.data.Dataset) -> ray.data.Dataset:
    """Merged states -> entity rows + their bucket (for partitioned,
    partially-rewritable output). Keys are unique per bucket here, so
    merge_bucket degenerates to pure rendering."""

    def render(group: pa.Table) -> pa.Table:
        ents = merge_bucket(group)
        bucket = group["bucket"][0].as_py() if len(group) else -1
        return ents.append_column(
            "bucket", pa.array([bucket] * len(ents), pa.int32())
        )

    return states.groupby("bucket").map_groups(render, batch_format="pyarrow")


def _read_input(path: str, source: str) -> ray.data.Dataset:
    if source == "records":
        return read_records(path)
    return read_pages(path, columns=["url", "html"])


def kg_init(
    pages_path: str,
    store_dir: str,
    classifier_list: dict | None = None,
    product_index: dict | None = None,
    *,
    num_buckets: int = 64,
    concurrency=None,
    batch_size: int = 512,
    compute: str = "tasks",
    source: str = "pages",
) -> dict:
    """Bootstrap the incremental store from the initial corpus."""
    states = _merged_states(
        _read_input(pages_path, source),
        classifier_list,
        product_index,
        num_buckets=num_buckets,
        concurrency=concurrency,
        batch_size=batch_size,
        compute=compute,
    ).materialize()

    states_dir = os.path.join(store_dir, _STATES)
    raw_dir = os.path.join(store_dir, _ENTITIES_RAW)
    # crash-safety: INVALIDATE the store first (meta.json is the validity
    # marker every consumer routes on) and re-assert it LAST, atomically —
    # a crash anywhere in between leaves a store with no meta.json, which
    # reads as uninitialized (re-run kg_init) instead of a half-gutted
    # store that kg_update would silently merge against
    os.makedirs(store_dir, exist_ok=True)
    meta_path = os.path.join(store_dir, _META)
    if os.path.exists(meta_path):
        os.unlink(meta_path)
    shutil.rmtree(states_dir, ignore_errors=True)
    shutil.rmtree(raw_dir, ignore_errors=True)
    # a fresh store invalidates any prior update journal/staging
    shutil.rmtree(os.path.join(store_dir, _JOURNAL), ignore_errors=True)
    shutil.rmtree(os.path.join(store_dir, _STAGING), ignore_errors=True)
    shutil.rmtree(os.path.join(store_dir, _RETIRED), ignore_errors=True)
    states.write_parquet(states_dir, partition_cols=["bucket"], mode="overwrite")
    entities = _render_states(states).materialize()
    entities.write_parquet(raw_dir, partition_cols=["bucket"], mode="overwrite")

    tmp_meta = meta_path + ".tmp"
    with open(tmp_meta, "w") as fh:
        json.dump({"num_buckets": num_buckets, "version": 1}, fh)
    os.replace(tmp_meta, meta_path)
    return {
        "state_rows": states.count(),
        "entities": entities.count(),
        "buckets": num_buckets,
    }


# files up to this size are hashed IN FULL (sha256 streams ~1 GB/s, and a
# delta's bytes are read in their entirety by the merge anyway); larger
# files fall back to a sampled digest — see _file_content_digest
_FULL_HASH_MAX = 256 << 20


def _file_content_digest(path: str) -> str:
    """Content digest of one data file. Files <= ``_FULL_HASH_MAX`` get a
    FULL sha256 — no blind spots. Larger files get sha256 over (size,
    4 KiB head, 1 MiB tail, 16 evenly-spaced 1 MiB body chunks): the tail
    covers a Parquet footer (schema, row-group offsets, column stats) and
    the strided body chunks catch bulk edits, but a surgical same-size
    edit confined to an unsampled window of a >256 MiB file WOULD evade
    it — the documented residual of keeping journal-id computation O(MBs)
    on multi-GB deltas."""
    import hashlib

    size = os.path.getsize(path)
    h = hashlib.sha256(str(size).encode())
    with open(path, "rb") as fh:
        if size <= _FULL_HASH_MAX:
            for chunk in iter(lambda: fh.read(1 << 22), b""):
                h.update(chunk)
            return h.hexdigest()
        h.update(fh.read(4096))
        step = 1 << 20
        for i in range(16):
            fh.seek(4096 + (i + 1) * (size - 4096 - step) // 17)
            h.update(fh.read(step))
        fh.seek(size - step)
        h.update(fh.read(step))
    return h.hexdigest()


def _delta_id(delta_path: str, config: dict) -> str:
    """Content-addressed id of one delta application: the delta input's
    file CONTENT fingerprint (relative names + content digests —
    deliberately NOT mtime, so a byte-identical re-staged copy of an
    applied delta is still detected as already_applied instead of
    double-counting the additive accumulators, and an in-place content
    change is recomputed rather than wrongly skipped) plus the
    output-shaping config. Re-running kg_update with the same delta bytes
    yields the same id. The file set comes from the SAME helper the
    resume manifests use (state/manifest.py:data_files)."""
    import hashlib
    from concurrent.futures import ThreadPoolExecutor

    from ..state.manifest import config_digest, data_files

    files = data_files(delta_path)
    # hashlib releases the GIL on large buffers, so a thread pool keeps the
    # journal-id cost ~parallel-I/O-bound on many-file deltas instead of a
    # serial driver scan of every shard
    with ThreadPoolExecutor(max_workers=min(16, max(1, len(files)))) as ex:
        digests = list(ex.map(lambda fr: _file_content_digest(fr[0]), files))
    entries = [(rel, d) for (_full, rel), d in zip(files, digests)]
    blob = json.dumps(
        {"files": entries, "config": config_digest(config)}, sort_keys=True
    ).encode("utf-8")
    return hashlib.sha256(blob).hexdigest()[:32]


def _swap_staged(store_dir: str, delta_id: str, touched: list[int]) -> None:
    """Move the staged recomputed partitions into place, retiring the old
    ones. Resumable: every step is a directory rename keyed on existence,
    so a crash at any point is repaired by calling this again (staged dir
    present -> redo that bucket; absent -> that bucket already swapped)."""
    staging = os.path.join(store_dir, _STAGING, delta_id)
    retired = os.path.join(store_dir, _RETIRED, delta_id)
    for sub in (_STATES, _ENTITIES_RAW):
        for b in touched:
            staged = os.path.join(staging, sub, f"bucket={b}")
            if not os.path.isdir(staged):
                continue  # already swapped by a previous (crashed) attempt
            live = os.path.join(store_dir, sub, f"bucket={b}")
            if os.path.isdir(live):
                dst = os.path.join(retired, sub, f"bucket={b}")
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                os.rename(live, dst)
            os.makedirs(os.path.dirname(live), exist_ok=True)
            os.rename(staged, live)


def _cleanup_scratch(store_dir: str, delta_id: str) -> None:
    """Remove this delta's staging/retired trees, pruning the shared
    parent dirs when they end up empty."""
    for root in (_STAGING, _RETIRED):
        shutil.rmtree(os.path.join(store_dir, root, delta_id), ignore_errors=True)
        try:
            os.rmdir(os.path.join(store_dir, root))
        except OSError:
            pass  # non-empty (another delta's scratch) or already gone


def _journal_path(store_dir: str, delta_id: str) -> str:
    return os.path.join(store_dir, _JOURNAL, f"{delta_id}.json")


def _write_journal(store_dir: str, delta_id: str, entry: dict) -> None:
    path = _journal_path(store_dir, delta_id)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(entry, fh)
    os.replace(tmp, path)  # atomic: the journal is never half-written


def _journal_entries(store_dir: str) -> list[tuple[str, dict]]:
    """(delta_id, entry) for every journal record, sorted by id."""
    jdir = os.path.join(store_dir, _JOURNAL)
    out = []
    if os.path.isdir(jdir):
        for f in sorted(os.listdir(jdir)):
            if f.endswith(".json"):
                with open(os.path.join(jdir, f)) as fh:
                    out.append((f[: -len(".json")], json.load(fh)))
    return out


def kg_update(
    delta_path: str,
    store_dir: str,
    classifier_list: dict | None = None,
    product_index: dict | None = None,
    *,
    concurrency=None,
    batch_size: int = 512,
    compute: str = "tasks",
    source: str = "pages",
    timings: dict | None = None,
    delta_broadcast_max_rows: int = 200_000,
) -> dict:
    """Merge one delta shard into the store, rewriting only the touched
    bucket partitions. Pass a dict as ``timings`` to receive per-phase
    wall times (extract/merge/stage/swap) — the small-delta overhead
    breakdown BASELINE.md reports.

    Adaptive merge: a delta whose OWN merged state rows (the DELTA's, not
    delta+old — a tiny delta touching fat buckets still qualifies, and
    each task then loads its whole bucket) number <=
    ``delta_broadcast_max_rows`` takes the LOCALIZED path — one plain Ray
    task per touched bucket does read-old + merge + render + stage with
    zero shuffles (the bucket is the unit of independence, so the
    Ray-Data groupby exchange the big path uses is pure overhead here).
    Bigger deltas keep the distributed groupby path; both paths are
    byte-parity pinned by pytest.

    Crash-safe and exactly-once: the recomputed partitions are written to
    a staging directory first, a journal entry (keyed on the delta's
    content fingerprint) records the application, and only then are the
    live partitions swapped out via per-bucket renames. A crash anywhere
    is repaired by re-running the same update — before the journal entry
    the live store is untouched (recompute from scratch); after it the
    swap resumes from the staged partitions; once marked applied, a rerun
    is a detected no-op (returning the recorded report) rather than a
    second merge of the delta's additive accumulators."""
    with open(os.path.join(store_dir, _META)) as fh:
        num_buckets = int(json.load(fh)["num_buckets"])

    delta_id = _delta_id(
        delta_path,
        {
            "num_buckets": num_buckets,
            "source": source,
            "classifier_list": classifier_list,
            # full index, not just keys: changed product ATTRIBUTES must
            # also change the id (config_digest contract: different
            # config -> recompute, never already_applied)
            "product_index": product_index,
        },
    )
    jpath = _journal_path(store_dir, delta_id)
    staging = os.path.join(store_dir, _STAGING, delta_id)
    retired = os.path.join(store_dir, _RETIRED, delta_id)
    states_dir = os.path.join(store_dir, _STATES)

    if os.path.exists(jpath):
        with open(jpath) as fh:
            entry = json.load(fh)
        if entry["phase"] == "staged":
            # crashed mid-swap: finish it from the staged partitions
            _swap_staged(store_dir, delta_id, entry["report"]["touched_buckets"])
            _write_journal(store_dir, delta_id, {**entry, "phase": "applied"})
        _cleanup_scratch(store_dir, delta_id)
        if timings is not None:
            timings["path"] = "already_applied"
        return {**entry["report"], "already_applied": True}

    # Two loud refusals before any work starts:
    # 1. ANOTHER delta stuck in 'staged' (crashed mid-swap) — staging a new
    #    delta now and later resuming the stuck one would swap its
    #    PRE-CRASH partitions over this delta's contribution. Re-running
    #    the stuck delta completes its swap via the resume path above.
    # 2. The SAME delta directory already applied under a different
    #    content id — re-merging a mutated-in-place delta would
    #    double-count the additive accumulators (deltas are immutable once
    #    applied; changed/new pages belong in a new delta directory).
    real = os.path.realpath(delta_path)
    for other_id, other in _journal_entries(store_dir):
        if other_id == delta_id:
            continue
        if other.get("phase") == "staged":
            raise RuntimeError(
                f"kg_update: delta {other_id} is mid-swap (phase='staged'); "
                "re-run that delta first to complete its swap before "
                "applying a new one"
            )
        if other.get("delta_realpath") == real:
            raise RuntimeError(
                f"kg_update: delta directory {delta_path} was already applied "
                f"as {other_id} with DIFFERENT content — deltas are immutable "
                "once applied; stage changed or new pages as a NEW delta "
                "directory instead of mutating an applied one"
            )

    import time as _time

    t = _time.monotonic
    t0 = t()
    delta = _merged_states(
        _read_input(delta_path, source),
        classifier_list,
        product_index,
        num_buckets=num_buckets,
        concurrency=concurrency,
        batch_size=batch_size,
        compute=compute,
    ).materialize()
    t_extract = t()

    touched = sorted(int(b) for b in delta.unique("bucket"))
    n_delta_rows = delta.count()
    shutil.rmtree(staging, ignore_errors=True)

    if n_delta_rows <= delta_broadcast_max_rows:
        # localized-delta fast path: merge + render + stage as one wave of
        # per-bucket tasks, zero shuffles, zero Ray-Data job overhead
        # (profiled 2.4-3.6 s -> the task wave below; see BASELINE.md).
        # Byte-parity with the shuffle path is test-forced
        # (tests/test_kg_pipeline.py::test_kg_update_local_path_parity).
        merged_rows = _merge_touched_local(delta, touched, states_dir, staging)
        t_merge = t_states_write = t_render_write = t()
        report = {
            "delta_state_rows": n_delta_rows,
            "touched_buckets": touched,
            "merged_state_rows": merged_rows,
        }
    else:
        old_parts = [
            (b, os.path.join(states_dir, f"bucket={b}"))
            for b in touched
            if os.path.isdir(os.path.join(states_dir, f"bucket={b}"))
        ]

        if old_parts:
            # partition-pruned read: only the touched buckets leave storage.
            # Ray's reader parses the hive `bucket=K` path segment back into
            # a column (as a string — _norm casts it)
            part_files = [
                os.path.join(d, f)
                for _, d in old_parts
                for f in sorted(os.listdir(d))
                if f.endswith(".parquet")
            ]
            if part_files:
                old = _norm(ray.data.read_parquet(part_files))
                combined = _tag_ord(old, 0).union(_tag_ord(delta, 1))
            else:
                # touched buckets exist but are empty partitions (a previous
                # update retired their contents) — nothing old to merge
                combined = delta
        else:
            combined = delta

        # one materialized pass: merge + canonical column order fused (the
        # previous merge->materialize->norm->materialize shape paid a full
        # extra job — measurable against a small delta where fixed per-job
        # overhead dominates). rendered stays lazy: its only consumer is
        # the staging write below, so materializing it would store a copy
        # no one reads.
        merged = _norm(
            combined.groupby("bucket").map_groups(_recombine_ordered, batch_format="pyarrow")
        ).materialize()
        t_merge = t()
        rendered = _render_states(merged)

        report = {
            "delta_state_rows": n_delta_rows,
            "touched_buckets": touched,
            "merged_state_rows": merged.count(),
        }

        # stage -> journal -> swap -> mark applied
        merged.write_parquet(
            os.path.join(staging, _STATES), partition_cols=["bucket"], mode="overwrite"
        )
        t_states_write = t()
        rendered.write_parquet(
            os.path.join(staging, _ENTITIES_RAW), partition_cols=["bucket"], mode="overwrite"
        )
        t_render_write = t()
    # a touched bucket whose recompute produced zero rows must still swap
    # to an EMPTY partition (its old contents are retired), so ensure a
    # staged dir exists for every touched bucket in both sub-stores
    for sub in (_STATES, _ENTITIES_RAW):
        for b in touched:
            os.makedirs(os.path.join(staging, sub, f"bucket={b}"), exist_ok=True)
    _write_journal(
        store_dir,
        delta_id,
        {"phase": "staged", "report": report, "delta_realpath": real},
    )
    _swap_staged(store_dir, delta_id, touched)
    _write_journal(
        store_dir,
        delta_id,
        {"phase": "applied", "report": report, "delta_realpath": real},
    )
    _cleanup_scratch(store_dir, delta_id)
    if timings is not None:
        timings.update(
            {
                "path": "local" if n_delta_rows <= delta_broadcast_max_rows else "groupby",
                "extract_shuffle": round(t_extract - t0, 3),
                # local path: merge+render+stage fused into the task wave
                "old_read_merge": round(t_merge - t_extract, 3),
                "stage_states_write": round(t_states_write - t_merge, 3),
                "stage_render_write": round(t_render_write - t_states_write, 3),
                "swap_journal": round(t() - t_render_write, 3),
            }
        )
    return report


@ray.remote(num_cpus=1)
def _merge_one_bucket(
    bucket: int, old_files: list, delta_tbl: pa.Table, staging: str
) -> int:
    """One touched bucket, end to end, in ONE task: read the bucket's old
    state files, merge the delta's rows for it, render, and write both
    staged partitions. No shuffle — a bucket's merge depends on nothing
    outside the bucket. Returns the merged state row count."""
    import pyarrow.parquet as pq

    # OLD rows first, delta last — the same merge order the groupby path's
    # old.union(delta) produces, so the serialized state blobs (whose JSON
    # field order reflects first-writer insertion) come out byte-identical
    parts = [pq.read_table(f, columns=["key", "state"]) for f in old_files]
    parts.append(delta_tbl.select(["key", "state"]))
    allt = pa.concat_tables(parts)
    full = pa.table(
        {
            "bucket": pa.array([bucket] * len(allt), pa.int32()),
            "key": allt["key"].cast(pa.string()),
            "state": allt["state"].cast(pa.string()),
        }
    )
    merged = recombine_batch(full)
    sdir = os.path.join(staging, _STATES, f"bucket={bucket}")
    os.makedirs(sdir, exist_ok=True)
    pq.write_table(merged.select(["key", "state"]), os.path.join(sdir, "part-0.parquet"))
    ents = merge_bucket(merged)  # keys unique post-merge: pure render
    edir = os.path.join(staging, _ENTITIES_RAW, f"bucket={bucket}")
    os.makedirs(edir, exist_ok=True)
    pq.write_table(ents, os.path.join(edir, "part-0.parquet"))
    return len(merged)


def _merge_touched_local(
    delta: ray.data.Dataset,
    touched: list[int],
    states_dir: str,
    staging: str,
) -> int:
    """Shuffle-free merge+render+stage for a SMALL delta: one plain Ray
    task per touched bucket (profiled: the former groupby path spent
    1.3-1.9 s of a 2.2-3.5 s localized update in two Ray-Data shuffle
    jobs whose input was ~50 already-co-located buckets — pure exchange
    overhead). The delta's state rows are collected once (caller gates on
    ``delta_broadcast_max_rows``) and each bucket's slice ships to exactly
    one task; old bucket files are read inside the task. Returns the
    merged state row count."""
    delta_df = delta.to_pandas()
    refs = []
    for b, g in delta_df.groupby("bucket", sort=False):
        tbl = pa.table(
            {
                "key": pa.array(g["key"].astype(str), pa.string()),
                "state": pa.array(g["state"].astype(str), pa.string()),
            }
        )
        d = os.path.join(states_dir, f"bucket={int(b)}")
        old_files = (
            [os.path.join(d, f) for f in sorted(os.listdir(d)) if f.endswith(".parquet")]
            if os.path.isdir(d)
            else []
        )
        refs.append(_merge_one_bucket.remote(int(b), old_files, tbl, staging))
    return int(sum(ray.get(refs)))


def kg_export(store_dir: str, out_dir: str, *, triple_parts: int = 32) -> dict:
    """Render the store into the standard entities + triples layout: the
    global snapshot-name repair (broadcast or sharded, entity-sized) runs
    here — once per export, not per delta."""
    raw = ray.data.read_parquet(os.path.join(store_dir, _ENTITIES_RAW))
    raw = raw.drop_columns(["bucket"]).materialize()
    final = repair_area_parent_names(raw).materialize()
    final.write_parquet(
        os.path.join(out_dir, "entities"), partition_cols=["table"], mode="overwrite"
    )
    triples = materialize_triples(final, num_parts=triple_parts)
    triples.write_parquet(
        os.path.join(out_dir, "triples"), partition_cols=["part"], mode="overwrite"
    )
    return {"entities": final.count(), "triples": triples.count()}
