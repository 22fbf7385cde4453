"""Mention-detection stage: the stateful actor-pool map_batches.

Generalizes the reference's per-record dispatcher (extractEntities,
/root/reference/lib/extract.js:5-37) + classification cascade (M2) into a
callable CLASS for ``map_batches(..., concurrency=N)``: broadcast state
(classifier-override dict, product index — the reference's driver-heap
dicts, index.js:57,34-37) is deserialized ONCE per actor in ``__init__``,
and each ``__call__`` performs map-side partial aggregation so a batch
emits at most one state row per entity key (the first half of the
two-stage salted aggregation, SURVEY §7.3).
"""

from __future__ import annotations

import json
import logging

import pyarrow as pa
import ray.data

from ..extraction.emit import emit_record
from ..extraction.state import dumps_state, merge_state, state_key
from ..functions.hashing import stable_bucket
from ..functions.textextract import extract_jsonld_blocks_bytes

_LOG = logging.getLogger(__name__)

MENTION_SCHEMA = pa.schema(
    [("bucket", pa.int32()), ("key", pa.string()), ("state", pa.string())]
)

DEFAULT_NUM_BUCKETS = 64


class _SizeCapReached(Exception):
    pass


class _CappedSink:
    """File-like that aborts the pickler once ``cap`` bytes have passed."""

    def __init__(self, cap: int):
        self.n = 0
        self.cap = cap

    def write(self, b) -> int:
        self.n += len(b)
        if self.n > self.cap:
            raise _SizeCapReached
        return len(b)


def _pickles_under(obj, cap: int) -> bool:
    """True iff pickle(obj) is <= cap bytes — measured WITHOUT fully
    serializing large objects (the pickler is aborted at the cap)."""
    import pickle

    sink = _CappedSink(cap)
    try:
        pickle.Pickler(sink, protocol=pickle.HIGHEST_PROTOCOL).dump(obj)
    except _SizeCapReached:
        return False
    return True


def classify_record_blob(blob: str):
    """One records-source row -> ('ok', record_dict) or
    ('bad_json' | 'non_object', None) — the single classifier behind both
    the mention stage's records path and stages/audit.py:record_audit, so
    the reject accounting matches what extraction skipped (the same
    one-parser contract iter_page_events gives the pages path)."""
    try:
        record = json.loads(blob)
    except json.JSONDecodeError:
        return "bad_json", None
    if not isinstance(record, dict):
        return "non_object", None
    return "ok", record


def iter_page_events(url: str, html) -> "object":
    """One page -> a stream of parse EVENTS — the single parser behind
    both the mention stage (which consumes only the 'record' events) and
    the audit stage (stages/audit.py, which counts all of them), so the
    reject accounting can never diverge from what extraction actually
    skipped.

    Events: ('record', order_key, record_dict) for each extracted record;
    ('bad_json', None, None) for a JSON-LD block that fails to parse;
    ('non_object', None, None) for a parsed payload entry that is not an
    object. Order keys are GLOBALLY unique per record (url, url#1, ...)
    or first-writer-wins ties become merge-order-dependent."""
    n_rec = 0
    for block in extract_jsonld_blocks_bytes(html):
        try:
            payload = json.loads(block)
        except json.JSONDecodeError:
            yield ("bad_json", None, None)
            continue
        # real JSON-LD is often a top-level array; accept both
        records = payload if isinstance(payload, list) else [payload]
        for record in records:
            if not isinstance(record, dict):
                yield ("non_object", None, None)
                continue
            ok = url if n_rec == 0 else f"{url}#{n_rec}"
            n_rec += 1
            yield ("record", ok, record)


class MentionExtractor:
    """Actor-pool stage: pages batch -> partially-combined mention states."""

    def __init__(
        self,
        classifier_list=None,
        product_index=None,
        num_buckets: int = DEFAULT_NUM_BUCKETS,
    ):
        # once per actor (model-load equivalent), NOT per batch. The
        # broadcast state may arrive as ObjectRefs (the actor-pool path
        # ships refs in fn_constructor_kwargs so Ray doesn't copy the big
        # dicts into every actor's constructor args — ray#53727) — resolve
        # them here, once.
        import ray as _ray

        if isinstance(classifier_list, _ray.ObjectRef):
            classifier_list = _ray.get(classifier_list)
        if isinstance(product_index, _ray.ObjectRef):
            product_index = _ray.get(product_index)
        self.classifier_list = classifier_list
        self.product_index = product_index or {}
        self.num_buckets = num_buckets

    def _emit_from_pages(self, batch: pa.Table):
        urls = batch["url"].to_pylist()
        htmls = batch["html"].to_pylist()
        for url, html in zip(urls, htmls):
            for kind, ok, record in iter_page_events(url, html):
                if kind == "record":
                    yield from emit_record(
                        record, ok, self.classifier_list, self.product_index
                    )

    def _emit_from_records(self, batch: pa.Table):
        import hashlib

        ocids = batch["ocid"].to_pylist()
        blobs = batch["record_json"].to_pylist()
        for ocid, blob in zip(ocids, blobs):
            status, record = classify_record_blob(blob)
            if status != "ok":
                # skipped, not crashed — and ACCOUNTED: run
                # stages/audit.py:record_audit over the same source for
                # the queryable reject channel (shares this classifier)
                _LOG.warning(
                    "records source: skipping %s record (ocid=%r)", status, ocid
                )
                continue
            # ocid-less records get a content-derived (stable, unique) key
            ok = ocid or "sha:" + hashlib.sha1(blob.encode()).hexdigest()[:16]
            yield from emit_record(record, ok, self.classifier_list, self.product_index)

    def _emit_from_struct_records(self, batch: pa.Table):
        from ..sources.ocds_schema import strip_nones

        import hashlib
        import json as _json

        for row in batch.to_pylist():
            record = strip_nones(row)
            ok = record.get("ocid") or "sha:" + hashlib.sha1(
                _json.dumps(record, sort_keys=True, default=str).encode()
            ).hexdigest()[:16]
            yield from emit_record(record, ok, self.classifier_list, self.product_index)

    def __call__(self, batch: pa.Table) -> pa.Table:
        names = batch.schema.names
        if "record_json" in names:
            states = self._emit_from_records(batch)
        elif "compiledRelease" in names:
            states = self._emit_from_struct_records(batch)
        else:
            states = self._emit_from_pages(batch)
        # map-side partial combine: one merged state per key per batch
        combined: dict = {}
        for st in states:
            k = state_key(st)
            if k in combined:
                merge_state(combined[k], st)
            else:
                combined[k] = st
        keys = list(combined.keys())
        return pa.table(
            {
                "bucket": pa.array(
                    [stable_bucket(k, self.num_buckets) for k in keys], pa.int32()
                ),
                "key": pa.array(keys, pa.string()),
                "state": pa.array([dumps_state(combined[k]) for k in keys], pa.string()),
            }
        )


def extract_mentions(
    ds: ray.data.Dataset,
    classifier_list: dict | None,
    product_index: dict | None,
    *,
    concurrency: int | tuple | None = None,
    batch_size: int = 512,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
    compute: str = "tasks",
) -> ray.data.Dataset:
    """Two execution modes for the stateful stage:

    - compute='tasks' (default): broadcast state is ray.put ONCE and fetched
      once per worker process (module-level cache) — right when the state is
      a dict/lookup table: elastic task pool, zero actor-startup latency.
    - compute='actors': callable-class actor pool — right when per-worker
      setup is heavy (model load, GPU init); pass ``concurrency`` to size
      the pool. This is the north-star shape for a real NER/link scorer.
      SIZING: actors hold their CPU for the job's lifetime, so a pool
      equal to the node's CPU count starves the upstream read tasks
      (deadlock-slow); leave ~1/4 of the CPUs free — pool = 3/4 × CPUs
      measured fastest (and beat the autoscaling pool) on this workload.
    """
    if compute == "actors":
        import ray as _ray

        # Size-adaptive broadcast: small state (the common lookup-table
        # case) ships INLINE in the constructor kwargs; large state (a
        # real model/index) is put ONCE and shipped as ObjectRefs
        # resolved in __init__ rather than copied into every actor's
        # task spec. Either way Ray Data itself ray.put()s the wrapped
        # UDF bundle for actor pools, so the ray#53727 "constructor
        # arguments in the object store" notice is emitted for EVERY
        # actor-pool map_batches — it is Ray-internal and benign here
        # (the dataset plan owns the bundle for the job's lifetime).
        # size probe with an early abort: a genuinely large model/index
        # must not be fully pickled just to learn it's large (it gets
        # serialized again inside ray.put) — the capped writer stops the
        # pickler within one buffer of the threshold, whatever the entry
        # count or per-entry payload size
        small = _pickles_under((classifier_list, product_index), 65536)
        return ds.map_batches(
            MentionExtractor,
            fn_constructor_kwargs={
                "classifier_list": classifier_list
                if small
                else _ray.put(classifier_list),
                "product_index": product_index if small else _ray.put(product_index),
                "num_buckets": num_buckets,
            },
            batch_format="pyarrow",
            batch_size=batch_size,
            zero_copy_batch=True,
            concurrency=concurrency or (2, 8),
            num_cpus=1,
        )

    import ray

    from ..ops.joins import _fetch

    ref = ray.put((classifier_list, product_index or {}, num_buckets))

    def mention_task(batch: pa.Table) -> pa.Table:
        cl, pi, nb = _fetch(ref)
        return MentionExtractor(cl, pi, nb)(batch)

    kwargs = {"concurrency": concurrency} if concurrency else {}
    return ds.map_batches(
        mention_task,
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
        **kwargs,
    )
