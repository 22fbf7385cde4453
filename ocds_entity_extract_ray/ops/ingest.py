"""Continuous-ingest operators: dedupe a NEW shard of documents against
everything previously ingested, without ever re-reading the old corpus'
text.

State layout (``state_dir``): one parquet file of int64 content hashes
per ingest batch (``hashes_<n>.parquet``, schema ``{h: int64}``) — an
append-only log whose slots are claimed atomically at commit time
(write-tmp + link), so concurrent or deferred commits can never clobber a
log FILE; a failed ingest retried from scratch simply recomputes against
the log as committed so far. The state reader just globs the directory.

SINGLE-WRITER ASSUMPTION: the exactly-once guarantee is per serialized
ingest. Two ingests running CONCURRENTLY each dedup against the state
snapshot globbed at their own call time, so content overlapping between
them (or committed by one after the other's snapshot) is admitted by
BOTH and delivered downstream twice — the log stays consistent, the
survivor set does not. Run ingests for one state_dir serially (or give
concurrent sources disjoint state dirs and dedup across them downstream).
At 100 TB the state is hash-sized (8 B per unique doc), column-pruned at
the read, and the membership check is a distributed bucketed anti-join —
the delta never broadcasts and the state never lands on the driver.

The content hash is the md5-low64 of the text (the repo-wide convention:
equals DuckDB ``md5_number_lower``), so state files are portable across
engines and the dedup decision is oracle-checkable.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import ray.data

from .textstats import _h64


def _content_hashes(texts) -> np.ndarray:
    """md5-low64 per text (== DuckDB ``md5_number_lower``), stored as the
    signed-int64 VIEW of the uint64 value (values reach 2^64; the view is
    lossless and parquet-friendly)."""
    return np.array(
        [_h64((t or "").encode("utf-8")) for t in texts], dtype=np.uint64
    ).view(np.int64)


def _state_files(state_dir: str) -> list[str]:
    if not os.path.isdir(state_dir):
        return []
    return sorted(
        os.path.join(state_dir, f)
        for f in os.listdir(state_dir)
        if f.startswith("hashes_") and f.endswith(".parquet")
    )


def ingest_dedup_two_phase(
    delta: ray.data.Dataset,
    state_dir: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 32,
):
    """Two-phase variant of :func:`ingest_dedup` for exactly-once
    pipelines: returns ``(survivors, commit)`` where ``commit()`` appends
    the survivors' hashes to the state log and returns the written path.

    Contract: persist the survivor rows downstream FIRST, then call
    ``commit()``. A crash before the commit leaves the state untouched, so
    retrying the whole ingest recomputes the same survivor set (the
    caller's downstream write must tolerate being re-done). A crash after
    the commit means the downstream write already succeeded — the retry
    sees the committed hashes and yields zero survivors, which the caller
    must treat as "this ingest already completed", not as an empty batch
    to overwrite its output with. Committing BEFORE the downstream write
    (what the one-phase ``commit=True`` form does) risks silently losing
    the batch if the process dies between the two.
    """
    from .agg import bucketed_map_groups

    def add_hash(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["_h"] = _content_hashes(b[text_col])
        b["_seen"] = np.int64(0)
        return b

    hashed = delta.map_batches(add_hash, batch_format="pandas")

    files = _state_files(state_dir)
    if files:
        # pad state rows to the DELTA's exact schema (typed placeholder
        # values from a 1-row probe, discarded after the _seen filter):
        # a bucket containing only state rows must still carry the delta
        # columns, or the per-bucket dedup sort crashes / mixes schemas
        probe = hashed.limit(1).to_pandas()
        if len(probe) == 0:
            unioned = hashed  # empty delta: nothing to dedup
        else:
            proto = probe.iloc[0].to_dict()

            def pad_state(b: pd.DataFrame) -> pd.DataFrame:
                out = pd.DataFrame(
                    {c: [v] * len(b) for c, v in proto.items()}
                ).astype(probe.dtypes.to_dict())
                out["_h"] = b["h"].astype("int64").to_numpy()
                out["_seen"] = np.int64(1)
                return out

            state = ray.data.read_parquet(files).map_batches(
                pad_state, batch_format="pandas"
            )
            unioned = hashed.union(state)
    else:
        unioned = hashed

    def anti(bucket: pd.DataFrame) -> pd.DataFrame:
        seen = set(bucket.loc[bucket["_seen"] == 1, "_h"].tolist())
        fresh = bucket[bucket["_seen"] == 0]
        fresh = fresh[~fresh["_h"].isin(seen)]
        # intra-delta dedup: smallest id per new hash (deterministic)
        fresh = fresh.sort_values(["_h", id_col], kind="mergesort").drop_duplicates(
            "_h"
        )
        return fresh.drop(columns=["_seen"])

    survivors = bucketed_map_groups(
        unioned, "_h", anti, num_buckets=num_buckets
    ).materialize()

    committed: list[str] = []

    def commit_state() -> str:
        if committed:
            return committed[0]  # in-process idempotence
        os.makedirs(state_dir, exist_ok=True)
        # one file per ingest keeps the state log append-only. NOTE:
        # hash-sized on the driver for the single-file guarantee — at true
        # web scale write a per-ingest DIRECTORY of shards instead (same
        # glob reader).
        hdf = survivors.map_batches(
            lambda b: pd.DataFrame({"h": b["_h"].astype("int64")}),
            batch_format="pandas",
        ).to_pandas()
        import pyarrow as pa
        import pyarrow.parquet as pq

        # pid alone is NOT unique across threads / deferred closures in one
        # process — two concurrent commits would truncate each other's tmp
        # and silently drop one batch's hashes from the log
        import uuid

        tmp = os.path.join(
            state_dir, f".tmp_hashes_{os.getpid()}_{uuid.uuid4().hex}.parquet"
        )
        pq.write_table(pa.Table.from_pandas(hdf, preserve_index=False), tmp)
        # claim the next free log slot AT COMMIT TIME with an atomic
        # create (os.link fails on an existing target): an ingest that
        # committed while this one's commit was deferred can never be
        # clobbered, the loser just takes the next slot
        n = len(_state_files(state_dir))
        while True:
            out_path = os.path.join(state_dir, f"hashes_{n:06d}.parquet")
            try:
                os.link(tmp, out_path)
                break
            except FileExistsError:
                n += 1
        os.unlink(tmp)
        committed.append(out_path)
        return out_path

    out = survivors.map_batches(
        lambda b: b.drop(columns=["_h"]), batch_format="pandas"
    )
    return out, commit_state


def ingest_dedup(
    delta: ray.data.Dataset,
    state_dir: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 32,
    commit: bool = True,
) -> ray.data.Dataset:
    """Return the rows of ``delta`` whose text content was never seen in
    any prior ingest; duplicates WITHIN the delta keep exactly one row —
    the one with the smallest ``id_col`` (deterministic under any
    partitioning, not "first seen"). When ``commit``, the survivors'
    hashes are appended to the state as one new file.

    NOTE: the one-phase form commits the hashes as part of this call,
    i.e. BEFORE the caller has persisted the survivor rows anywhere — a
    crash between this call and the caller's downstream write loses the
    batch on retry (the retry sees the hashes as already ingested). Use
    :func:`ingest_dedup_two_phase` and call its ``commit()`` after the
    downstream write when exactly-once delivery matters.

    Shape: hash map-side (vectorized md5), ONE bucketed shuffle
    co-locating delta hashes with state hashes, per-bucket anti +
    intra-delta dedup. Output is row-identical to the input minus dupes.
    """
    out, commit_state = ingest_dedup_two_phase(
        delta,
        state_dir,
        text_col=text_col,
        id_col=id_col,
        num_buckets=num_buckets,
    )
    if commit:
        commit_state()
    return out
