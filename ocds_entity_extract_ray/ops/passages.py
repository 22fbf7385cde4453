"""Cross-document duplicated-passage removal — the RefinedWeb / Lee et
al. ("Deduplicating Training Data Makes Language Models Better") exact
substring-dedup shape, discretized to fixed word windows so it has an
exact SQL twin: split each document into consecutive
``words_per_passage``-word chunks (split on single spaces; the tail
chunk, shorter than the window, never participates), drop EVERY
occurrence of any full chunk whose exact text appears more than once in
the corpus (within- or cross-document), and reassemble the surviving
chunks in order.

Scale shape (the reason this is not "shuffle all text twice"):

1. chunking is doc-local (``map_batches``);
2. the duplicate-detection shuffle carries ONLY the 8-byte md5-low64 of
   each full chunk (``ops.textstats`` hash, bit-identical to DuckDB's
   ``md5_number_lower``) — a wordcount-shaped pre-aggregated groupby;
3. the duplicated-hash set is then applied back ADAPTIVELY:
   - if it fits (``<= broadcast_max_dups``) it is broadcast via
     ``ray.put`` and documents are cleaned in place — zero text ever
     shuffles;
   - otherwise documents explode to (doc_id, j, passage-hash) rows,
     anti-join the dup set on a bucketed merge, and reassemble with one
     text shuffle grouped by doc_id.
   Both branches produce identical output (forced-branch tested).

Hash collisions conflate two different passages into one "duplicate"
group (~2^-64 per pair); the SQL twin groups by the same hash so the
oracle agrees exactly either way.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data

from .agg import bucketed_map_groups
from .joins import _fetch
from .textstats import _h64


def _chunk_doc(text: str, w: int) -> tuple[list[str], int]:
    """All chunks of ``text`` (split on ' ') plus the count of FULL ones.
    The tail partial chunk (if any) is the last list element."""
    ws = text.split(" ")
    n_full = len(ws) // w
    chunks = [" ".join(ws[j * w : (j + 1) * w]) for j in range(n_full)]
    if len(ws) % w:
        chunks.append(" ".join(ws[n_full * w :]))
    return chunks, n_full


def _dup_hashes(docs: ray.data.Dataset, text_col: str, w: int) -> ray.data.Dataset:
    """Dataset of one ``hash`` column: md5-low64 of every full chunk that
    occurs more than once corpus-wide. Pre-aggregated per batch, then one
    slim (hash, n) groupby."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        counts: dict[int, int] = {}
        for text in batch[text_col]:
            chunks, n_full = _chunk_doc(text, w)
            for c in chunks[:n_full]:
                h = _h64(c.encode())
                counts[h] = counts.get(h, 0) + 1
        return pd.DataFrame(
            {
                "hash": pd.Series(list(counts.keys()), dtype=np.uint64),
                "n": pd.Series(list(counts.values()), dtype=np.int64),
            }
        )

    def dup_only(block: pd.DataFrame) -> pd.DataFrame:
        tot = block.groupby("hash", sort=False, as_index=False)["n"].sum()
        return tot.loc[tot["n"] > 1, ["hash"]]

    empty = pd.DataFrame({"hash": pd.Series([], dtype=np.uint64)})
    return bucketed_map_groups(
        docs.map_batches(partial, batch_format="pandas"),
        "hash",
        dup_only,
        num_buckets=64,
        empty_result=empty,
    )


def dedup_passages(
    docs: ray.data.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    words_per_passage: int = 16,
    broadcast_max_dups: int = 5_000_000,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Return one row per document: ``(id_col, n_passages, n_dropped,
    cleaned_text)``. ``n_passages`` counts all chunks including the tail
    partial; ``n_dropped`` counts removed full chunks; ``cleaned_text``
    is the surviving chunks joined by ' ' in original order, or NULL when
    nothing survives (matching SQL's all-NULL STRING_AGG)."""
    w = words_per_passage
    if w < 1:
        raise ValueError("words_per_passage must be >= 1")
    dup_ds = _dup_hashes(docs, text_col, w)

    def clean_with(dup_lookup) -> ray.data.Dataset:
        def clean(batch: pd.DataFrame) -> pd.DataFrame:
            dup = _fetch(dup_lookup) if dup_lookup is not None else frozenset()
            ids, n_pass, n_drop, cleaned = [], [], [], []
            for did, text in zip(batch[id_col], batch[text_col]):
                chunks, n_full = _chunk_doc(text, w)
                kept = [
                    c
                    for j, c in enumerate(chunks)
                    if j >= n_full or _h64(c.encode()) not in dup
                ]
                ids.append(did)
                n_pass.append(len(chunks))
                n_drop.append(len(chunks) - len(kept))
                cleaned.append(" ".join(kept) if kept else None)
            return pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype=batch[id_col].dtype),
                    "n_passages": pd.Series(n_pass, dtype=np.int64),
                    "n_dropped": pd.Series(n_drop, dtype=np.int64),
                    "cleaned_text": pd.Series(cleaned, dtype=object),
                }
            )

        return docs.map_batches(clean, batch_format="pandas")

    # adaptive application: count the dup set before deciding to collect it
    dup_mat = dup_ds.materialize()
    n_dups = dup_mat.count()
    if n_dups <= broadcast_max_dups:
        dup_set = (
            frozenset(dup_mat.to_pandas()["hash"].astype(np.uint64).tolist())
            if n_dups
            else frozenset()
        )
        return clean_with(ray.put(dup_set) if n_dups else None)

    # distributed branch: explode to hashed chunks, mark via bucketed
    # merge against the dup set, reassemble with one text shuffle by doc.
    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        rows_id, rows_j, rows_h, rows_c, rows_full = [], [], [], [], []
        for did, text in zip(batch[id_col], batch[text_col]):
            chunks, n_full = _chunk_doc(text, w)
            for j, c in enumerate(chunks):
                rows_id.append(did)
                rows_j.append(j)
                rows_h.append(_h64(c.encode()) if j < n_full else 0)
                rows_c.append(c)
                rows_full.append(j < n_full)
        return pd.DataFrame(
            {
                id_col: pd.Series(rows_id, dtype=batch[id_col].dtype),
                "_j": pd.Series(rows_j, dtype=np.int64),
                "_h": pd.Series(rows_h, dtype=np.uint64),
                "_chunk": pd.Series(rows_c, dtype=object),
                "_full": pd.Series(rows_full, dtype=bool),
            }
        )

    exploded = docs.map_batches(explode, batch_format="pandas")
    dup_marked = dup_mat.map_batches(
        lambda b: pd.DataFrame({"_h": b["hash"].astype(np.uint64), "_dup": True}),
        batch_format="pandas",
    )

    def mark_bucket(block: pd.DataFrame) -> pd.DataFrame:
        chunks_part = block[block["_dup"].isna()].drop(columns=["_dup"])
        dups_part = block.loc[block["_dup"].notna(), ["_h"]].drop_duplicates()
        out = chunks_part.merge(dups_part.assign(_dup=True), on="_h", how="left")
        out["_drop"] = out["_full"] & out["_dup"].notna()
        return out.drop(columns=["_dup"])

    chunk_rows = exploded.map_batches(
        lambda b: b.assign(_dup=pd.Series([None] * len(b), dtype=object)),
        batch_format="pandas",
    )
    dup_rows = dup_marked.map_batches(
        lambda b: pd.DataFrame(
            {
                id_col: pd.Series([0] * len(b), dtype=np.int64),
                "_j": pd.Series([0] * len(b), dtype=np.int64),
                "_h": b["_h"],
                "_chunk": pd.Series([""] * len(b), dtype=object),
                "_full": pd.Series([False] * len(b), dtype=bool),
                "_dup": pd.Series([True] * len(b), dtype=object),
            }
        ),
        batch_format="pandas",
    )
    empty_mark = pd.DataFrame(
        {
            id_col: pd.Series([], dtype=np.int64),
            "_j": pd.Series([], dtype=np.int64),
            "_h": pd.Series([], dtype=np.uint64),
            "_chunk": pd.Series([], dtype=object),
            "_full": pd.Series([], dtype=bool),
            "_drop": pd.Series([], dtype=bool),
        }
    )
    marked = bucketed_map_groups(
        chunk_rows.union(dup_rows),
        "_h",
        mark_bucket,
        num_buckets=num_buckets,
        empty_result=empty_mark,
    )

    def reassemble(block: pd.DataFrame) -> pd.DataFrame:
        out_id, n_pass, n_drop, cleaned = [], [], [], []
        for did, g in block.groupby(id_col, sort=False):
            g = g.sort_values("_j", kind="mergesort")
            kept = g.loc[~g["_drop"], "_chunk"].tolist()
            out_id.append(did)
            n_pass.append(len(g))
            n_drop.append(int(g["_drop"].sum()))
            cleaned.append(" ".join(kept) if kept else None)
        return pd.DataFrame(
            {
                id_col: pd.Series(out_id, dtype=block[id_col].dtype),
                "n_passages": pd.Series(n_pass, dtype=np.int64),
                "n_dropped": pd.Series(n_drop, dtype=np.int64),
                "cleaned_text": pd.Series(cleaned, dtype=object),
            }
        )

    empty_out = pd.DataFrame(
        {
            id_col: pd.Series([], dtype=np.int64),
            "n_passages": pd.Series([], dtype=np.int64),
            "n_dropped": pd.Series([], dtype=np.int64),
            "cleaned_text": pd.Series([], dtype=object),
        }
    )
    return bucketed_map_groups(
        marked, id_col, reassemble, num_buckets=num_buckets, empty_result=empty_out
    )


# --- sliding-window duplicated-span dedup (ExactSubstr proper) ---------------


def dedup_spans(
    docs: ray.data.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    window_words: int = 8,
    broadcast_max_dups: int = 5_000_000,
    num_buckets: int = 32,
    force_branch: str | None = None,
) -> ray.data.Dataset:
    """Sliding-window duplicated-SPAN removal — Lee et al.'s ExactSubstr
    rule at word granularity: a ``window_words``-word window is taken at
    EVERY word offset (not :func:`dedup_passages`' stride-w chunks, which
    miss duplicates that straddle a chunk boundary); any window whose
    exact text occurs more than once corpus-wide (within- or
    cross-document, multiplicity over ALL offsets) marks all w of its
    word positions, and every marked word is removed. A duplicated run
    of length >= w is thus excised wherever it sits, at any alignment —
    the map-reduce-able form of the paper's suffix-array scan. Returns
    one row per document: ``(id_col, n_words, dup_words, cleaned_text)``;
    ``cleaned_text`` is NULL when every word is covered.

    Scale shape: window hashing is doc-local; the only full-corpus
    shuffle carries ``(window-hash, doc_id, offset)`` 24 B/word rows
    (sliding windows are near-distinct, so pre-aggregating hashes buys
    nothing — this IS the ExactSubstr cost profile), and only the
    DUPLICATED occurrences come back out of the bucketed groupby
    (dup-bounded: small on a clean corpus, boilerplate pays for itself).
    They are applied adaptively: per-doc offset dict broadcast under
    ``broadcast_max_dups`` occurrences, else packed to per-doc int64
    offset blobs and LEFT-OUTER hash-joined back to the documents.
    ``force_branch`` ("broadcast" | "join") pins the apply path for
    parity tests. Hash collisions conflate two distinct windows
    (~2^-64/pair); the SQL twin groups by the same md5-low64 so the
    oracle agrees exactly either way. O(n*w) hashing per doc is the
    price of offset-exactness — keep w small (8-16) by design.

    TWO SCANS of ``docs`` (detect, then apply): a caller whose ``docs``
    is an expensive lazy chain should materialize it first, and a
    NON-DETERMINISTIC chain MUST be, or pass 1's offsets are applied to
    different documents in pass 2."""
    w = window_words
    if w < 2:
        raise ValueError("window_words must be >= 2 (1 degenerates to word dedup)")

    def occurrences(batch: pd.DataFrame) -> pd.DataFrame:
        ids, offs, hs = [], [], []
        for did, text in zip(batch[id_col], batch[text_col]):
            ws = text.split(" ")
            for i in range(len(ws) - w + 1):
                ids.append(did)
                offs.append(i)
                hs.append(_h64(" ".join(ws[i : i + w]).encode()))
        return pd.DataFrame(
            {
                "_h": pd.Series(hs, dtype=np.uint64),
                id_col: pd.Series(ids, dtype=np.int64),
                "_i": pd.Series(offs, dtype=np.int64),
            }
        )

    def per_bucket_dups(bucket: pd.DataFrame) -> pd.DataFrame:
        return bucket.loc[bucket["_h"].duplicated(keep=False), [id_col, "_i"]]

    empty = pd.DataFrame(
        {id_col: pd.Series(dtype="int64"), "_i": pd.Series(dtype="int64")}
    )
    dup_occ = bucketed_map_groups(
        docs.map_batches(occurrences, batch_format="pandas"),
        "_h",
        per_bucket_dups,
        num_buckets=num_buckets,
        empty_result=empty,
    ).materialize()
    n_dup = dup_occ.count()

    def rebuild(doc_ids, texts, drops) -> pd.DataFrame:
        """Parallel iterables: ids, texts, per-doc duplicated-offset
        collections (0-based window starts)."""
        ids_o, n_w, dup_w, cleaned = [], [], [], []
        for did, text, offsets in zip(doc_ids, texts, drops):
            ws = text.split(" ")
            n = len(ws)
            offs = np.asarray(list(offsets), dtype=np.int64)
            if offs.size:
                # interval union via a diff array: window at offset i
                # covers word positions [i, i+w)
                d = np.zeros(n + 1, dtype=np.int64)
                np.add.at(d, offs, 1)
                np.add.at(d, offs + w, -1)
                covered = np.cumsum(d[:n]) > 0
                ndw = int(covered.sum())
                kept = [wd for wd, c in zip(ws, covered) if not c]
            else:
                ndw = 0
                kept = ws  # " ".join(split) round-trips the text exactly
            ids_o.append(did)
            n_w.append(n)
            dup_w.append(ndw)
            cleaned.append(" ".join(kept) if kept else None)
        return pd.DataFrame(
            {
                id_col: pd.Series(ids_o, dtype=np.int64),
                "n_words": pd.Series(n_w, dtype=np.int64),
                "dup_words": pd.Series(dup_w, dtype=np.int64),
                "cleaned_text": pd.Series(cleaned, dtype=object),
            }
        )

    from .agg import use_fast_branch

    if use_fast_branch(
        force_branch,
        fast="broadcast",
        slow="join",
        count=n_dup,
        cap=broadcast_max_dups,
    ):
        by_doc: dict = {}
        if n_dup:
            df = dup_occ.to_pandas()
            for did, i in zip(df[id_col], df["_i"]):
                by_doc.setdefault(int(did), []).append(int(i))
        ref = ray.put(by_doc)

        def clean_bcast(batch: pd.DataFrame) -> pd.DataFrame:
            lookup = _fetch(ref)
            ids = batch[id_col]
            return rebuild(ids, batch[text_col], (lookup.get(int(d), ()) for d in ids))

        return docs.map_batches(clean_bcast, batch_format="pandas")

    from .joins import hash_join

    if not n_dup:
        # Nothing to excise. The blob side would be a ZERO-block dataset
        # (sorting an empty dataset emits no blocks at all, so its schema
        # is None) and acero rejects a schema-less join side; a map-only
        # identity rebuild is the same answer without the join.
        return docs.map_batches(
            lambda b: rebuild(b[id_col], b[text_col], ((),) * len(b)),
            batch_format="pandas",
        )

    def pack(bucket: pd.DataFrame) -> pd.DataFrame:
        rows = [
            (int(did), g["_i"].to_numpy(dtype=np.int64).tobytes())
            for did, g in bucket.groupby(id_col, sort=False)
        ]
        return pd.DataFrame(
            {
                "_sdoc": pd.Series([r[0] for r in rows], dtype=np.int64),
                "_off_blob": pd.Series([r[1] for r in rows], dtype=object),
            }
        )

    empty_pack = pd.DataFrame(
        {"_sdoc": pd.Series(dtype="int64"), "_off_blob": pd.Series(dtype=object)}
    )
    blobs = bucketed_map_groups(
        dup_occ, id_col, pack, num_buckets=num_buckets, empty_result=empty_pack
    )
    joined = hash_join(docs, blobs, "left_outer", on=(id_col,), right_on=("_sdoc",))

    def clean_joined(batch: pd.DataFrame) -> pd.DataFrame:
        def unpack(blob):
            if blob is None or (isinstance(blob, float) and pd.isna(blob)):
                return ()
            return np.frombuffer(blob, dtype=np.int64).tolist()

        return rebuild(
            batch[id_col], batch[text_col], (unpack(b) for b in batch["_off_blob"])
        )

    return joined.map_batches(clean_joined, batch_format="pandas")


# --- cross-corpus line dedup (CCNet rule) ------------------------------------


def _doc_lines(text: str, words_per_line: int | None) -> list[str]:
    """A document's lines: real newline splitting when the corpus has
    newline structure (``words_per_line=None``), else a deterministic
    reflow into consecutive ``words_per_line``-word lines (tail partial
    line INCLUDED — every word belongs to exactly one line, unlike
    passage chunking, so the reflow is invertible)."""
    if words_per_line is None:
        return (text or "").split("\n")
    ws = (text or "").split(" ")
    w = words_per_line
    n = (len(ws) + w - 1) // w
    return [" ".join(ws[j * w : (j + 1) * w]) for j in range(max(n, 1))]


def dedup_lines(
    docs: ray.data.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    words_per_line: int | None = None,
    broadcast_max_losers: int = 5_000_000,
    num_buckets: int = 32,
    force_branch: str | None = None,
) -> ray.data.Dataset:
    """CCNet-style cross-corpus LINE dedup: every line survives only at
    its globally FIRST occurrence, ordered by (doc_id, position) — the
    complement of :func:`dedup_passages`' drop-every-occurrence rule.
    Returns ``(id_col, clean_text, n_lines, n_dropped)`` per document
    that keeps at least one line (a document whose every line occurred
    earlier disappears, matching the SQL twin's WHERE rn = 1 + GROUP BY).

    Scale shape: the detection shuffle carries (line-hash, doc_id, pos)
    24 B/occurrence — never the text — and emits the LOSER occurrences
    (duplicate-bounded on a clean corpus, occurrence-bounded only on
    boilerplate-heavy crawls). Losers are applied back adaptively:
    broadcast frozenset under ``broadcast_max_losers``, else packed to
    per-doc position blobs (int64 bytes — Dataset.join rejects list
    columns) and LEFT-OUTER hash-joined back to the documents.
    ``force_branch`` ("broadcast" | "join") pins the apply path for
    parity tests. Hash collisions conflate two distinct lines (~2^-64
    per pair); the SQL twin ranks by the same md5-low64 so the oracle
    agrees exactly either way.

    TWO SCANS of ``docs`` (detect, then apply), like ``exact_dedup``:
    callers whose ``docs`` is an expensive lazy chain should materialize
    it first — and a NON-DETERMINISTIC chain (in-flight sampling or
    filtering) MUST be materialized, or pass 1's loser positions are
    applied to different documents in pass 2."""
    wpl = words_per_line

    def occurrences(batch: pd.DataFrame) -> pd.DataFrame:
        ids, poss, hs = [], [], []
        for did, text in zip(batch[id_col], batch[text_col]):
            for i, line in enumerate(_doc_lines(text, wpl)):
                ids.append(did)
                poss.append(i)
                hs.append(_h64(line.encode()))
        return pd.DataFrame(
            {
                "_h": pd.Series(hs, dtype=np.uint64),
                id_col: pd.Series(ids, dtype=np.int64),
                "_pos": pd.Series(poss, dtype=np.int64),
            }
        )

    def per_bucket_losers(bucket: pd.DataFrame) -> pd.DataFrame:
        s = bucket.sort_values([id_col, "_pos"], kind="mergesort")
        return s.loc[s.duplicated("_h", keep="first"), [id_col, "_pos"]]

    empty = pd.DataFrame(
        {id_col: pd.Series(dtype="int64"), "_pos": pd.Series(dtype="int64")}
    )
    losers = bucketed_map_groups(
        docs.map_batches(occurrences, batch_format="pandas"),
        "_h",
        per_bucket_losers,
        num_buckets=num_buckets,
        empty_result=empty,
    ).materialize()
    n_losers = losers.count()

    def rebuild(doc_ids, texts, drops) -> pd.DataFrame:
        """Parallel iterables: doc ids, texts, per-doc dropped-position
        collections."""
        ids, cleaned, n_ln, n_dr = [], [], [], []
        for did, text, drop in zip(doc_ids, texts, drops):
            lines = _doc_lines(text, wpl)
            kept = [ln for i, ln in enumerate(lines) if i not in drop]
            if not kept:
                continue
            ids.append(did)
            cleaned.append("\n".join(kept))
            n_ln.append(len(lines))
            n_dr.append(len(lines) - len(kept))
        return pd.DataFrame(
            {
                id_col: pd.Series(ids, dtype=np.int64),
                "clean_text": pd.Series(cleaned, dtype=object),
                "n_lines": pd.Series(n_ln, dtype=np.int64),
                "n_dropped": pd.Series(n_dr, dtype=np.int64),
            }
        )

    from .agg import use_fast_branch

    if use_fast_branch(
        force_branch,
        fast="broadcast",
        slow="join",
        count=n_losers,
        cap=broadcast_max_losers,
    ):
        by_doc: dict = {}
        if n_losers:
            lf = losers.to_pandas()
            for did, pos in zip(lf[id_col], lf["_pos"]):
                by_doc.setdefault(int(did), set()).add(int(pos))
        ref = ray.put(by_doc)

        def clean_bcast(batch: pd.DataFrame) -> pd.DataFrame:
            lookup = _fetch(ref)
            ids = batch[id_col]
            return rebuild(
                ids, batch[text_col], (lookup.get(int(d), ()) for d in ids)
            )

        return docs.map_batches(clean_bcast, batch_format="pandas")

    # distributed apply: per-doc dropped-position blobs, left-outer join
    from .joins import hash_join

    if not n_losers:
        # Same zero-block guard as dedup_spans: sorting an empty loser
        # set emits no blocks (schema None) and acero rejects that join
        # side; with nothing to drop the apply is a map-only identity.
        return docs.map_batches(
            lambda b: rebuild(b[id_col], b[text_col], ((),) * len(b)),
            batch_format="pandas",
        )

    def pack(bucket: pd.DataFrame) -> pd.DataFrame:
        rows = [
            (int(did), g["_pos"].to_numpy(dtype=np.int64).tobytes())
            for did, g in bucket.groupby(id_col, sort=False)
        ]
        return pd.DataFrame(
            {
                "_ldoc": pd.Series([r[0] for r in rows], dtype=np.int64),
                "_drop_blob": pd.Series([r[1] for r in rows], dtype=object),
            }
        )

    empty_pack = pd.DataFrame(
        {"_ldoc": pd.Series(dtype="int64"), "_drop_blob": pd.Series(dtype=object)}
    )
    blobs = bucketed_map_groups(
        losers, id_col, pack, num_buckets=num_buckets, empty_result=empty_pack
    )
    joined = hash_join(docs, blobs, "left_outer", on=(id_col,), right_on=("_ldoc",))

    def clean_joined(batch: pd.DataFrame) -> pd.DataFrame:
        def unpack(blob):
            if blob is None or (isinstance(blob, float) and pd.isna(blob)):
                return ()
            return set(np.frombuffer(blob, dtype=np.int64).tolist())

        return rebuild(
            batch[id_col],
            batch[text_col],
            (unpack(b) for b in batch["_drop_blob"]),
        )

    return joined.map_batches(clean_joined, batch_format="pandas")
