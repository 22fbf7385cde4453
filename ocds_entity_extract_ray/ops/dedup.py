"""Deduplication operators (exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine) — the shapes a 100 TB training-data pipeline needs.

Scale notes per operator:
- exact: content-hash per batch (vectorized) -> groupby(hash) -> per-group
  first. One shuffle on a short hash key.
- MinHash+LSH: shingle->minhash per batch -> explode to (band, band_hash)
  rows -> groupby bands -> candidate pairs -> verify true Jaccard. The
  shuffle carries only (band, band_hash, doc_id) rows — never documents;
  texts are re-joined BY ID against the (column-pruned) corpus only for
  the small candidate set in the verify step.
- SimHash: 64-bit signature per doc; bucket by rotated prefixes for
  near-neighbor candidates, verify Hamming distance.
- n-gram Jaccard: standalone near-dup operator (``ngram_jaccard_pairs``)
  — bottom-k shingle-hash sketch as a deterministic inverted index
  (candidates = docs sharing any of their k smallest shingle hashes),
  then the same exact-Jaccard verify the MinHash path uses.
- embedding cosine: see ops/similarity.py (matmul against broadcast
  normalized matrix; LSH-bucketed variant as the scale path).
"""

from __future__ import annotations

import functools
import hashlib
import logging
import re

import numpy as np
import pandas as pd
import ray.data

_WORD_RE = re.compile(r"\w+", re.UNICODE)
_LOG = logging.getLogger(__name__)

# O(g^2) guard: a degenerate hash group (boilerplate-heavy corpus where
# thousands of docs share one band/chunk value) is truncated to this many
# members (smallest ids, deterministic) instead of going quadratic in one
# task. Dropped members are logged, never silent.
DEFAULT_MAX_GROUP_SIZE = 512


def _cap_group(ids: np.ndarray, max_group_size: int, what: str) -> np.ndarray:
    """ids must be sorted. Truncate oversized candidate groups (log loudly)."""
    if len(ids) <= max_group_size:
        return ids
    _LOG.warning(
        "%s: degenerate group of %d members capped to %d (%d dropped)",
        what,
        len(ids),
        max_group_size,
        len(ids) - max_group_size,
    )
    return ids[:max_group_size]


def text_hash(t: str) -> str:
    return hashlib.sha256((t or "").encode("utf-8")).hexdigest()


def _md5_halves(texts) -> tuple[np.ndarray, np.ndarray]:
    """128-bit content identity as two int64 columns (md5 digest halves,
    little-endian — the low half equals the repo-wide md5-low64 / DuckDB
    ``md5_number_lower`` convention). 16 B/row on the wire vs ~72 B for a
    sha256 hexdigest string; 128 bits keeps the birthday bound negligible
    at 100 TB (~1e11 docs -> ~1e-17 collision odds), where a single int64
    would already expect collisions."""
    h1 = np.empty(len(texts), dtype=np.uint64)
    h2 = np.empty(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts):
        d = hashlib.md5((t or "").encode("utf-8")).digest()
        h1[i] = int.from_bytes(d[8:], "little")
        h2[i] = int.from_bytes(d[:8], "little")
    return h1.view(np.int64), h2.view(np.int64)


# --- exact dedup -------------------------------------------------------------


def exact_dedup(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    broadcast_max_losers: int = 5_000_000,
    force_branch: str | None = None,
) -> ray.data.Dataset:
    """Keep one representative (min id) per distinct text — the corpus
    text never enters a shuffle. Pass 1 ships (id, 128-bit content hash)
    16 B+8 B/row through the bucketed exchange and keeps only the LOSER
    ids (every DISTINCT id but the min per hash — duplicate-bounded, the
    same set shape as drop_near_dup_losers'). Pass 2 anti-filters the
    original dataset: broadcast frozenset under ``broadcast_max_losers``,
    distributed left_anti hash join past it (a boilerplate-heavy crawl
    can push the duplicate fraction toward half the corpus). Two scans of
    ``ds`` instead of one full-text exchange — at 100 TB the shuffle
    carries ~24 bytes/row instead of the documents themselves, so callers
    whose ``ds`` is an expensive lazy chain should materialize it first.

    ID CONTRACT: ``id_col`` is the row identity — pass 2 filters BY ID,
    so it must be unique per TEXT-carrying row. BYTE-IDENTICAL rows that
    repeat an id (a shard ingested twice) are safe: loser selection works
    on distinct (id, hash) pairs, so the min id survives with all its
    copies (collapsing those needs row identity the engine doesn't have
    without shuffling the text; re-ingest dedup is ``ops.ingest``'s job).
    But an id reused across DIFFERENT texts is undefined behavior — the
    reused id can be another text's winner and a loser at once, and
    dropping it by id deletes the text it won (id-based filtering cannot
    distinguish the two rows). ``force_branch``
    ("broadcast" | "anti_join") pins pass 2 for parity tests."""
    import ray as _ray

    from .agg import bucketed_map_groups, use_fast_branch
    from .joins import _fetch, hash_join

    def hash_block(b: pd.DataFrame) -> pd.DataFrame:
        h1, h2 = _md5_halves(b[text_col].to_numpy())
        out = pd.DataFrame({id_col: b[id_col].to_numpy(), "_h1": h1, "_h2": h2})
        # map-side pre-dedup: repeated (id, hash) rows add nothing to
        # loser selection, so a double-ingested block ships once
        return out.drop_duplicates()

    hashed = ds.map_batches(hash_block, batch_format="pandas")

    def per_bucket_losers(bucket: pd.DataFrame) -> pd.DataFrame:
        # distinct pairs FIRST: a duplicate (id, hash) pair arriving from
        # two blocks must not mark the winning id itself as a loser
        # (that would delete every copy of the text — data loss)
        u = bucket.drop_duplicates().sort_values(id_col, kind="mergesort")
        return u.loc[u.duplicated(["_h1", "_h2"], keep="first"), [id_col]]

    empty = pd.DataFrame({id_col: pd.Series(dtype="int64")})
    losers = bucketed_map_groups(
        hashed, "_h1", per_bucket_losers, num_buckets=64, empty_result=empty
    ).materialize()
    n = losers.count()
    if n == 0:
        return ds
    if use_fast_branch(
        force_branch,
        fast="broadcast",
        slow="anti_join",
        count=n,
        cap=broadcast_max_losers,
    ):
        ref = _ray.put(frozenset(losers.to_pandas()[id_col].tolist()))

        def drop(b: pd.DataFrame) -> pd.DataFrame:
            return b[~b[id_col].isin(_fetch(ref))]

        return ds.map_batches(drop, batch_format="pandas")

    loser_keys = losers.map_batches(
        lambda b: b.rename(columns={id_col: "_dup_loser"}), batch_format="pandas"
    )
    return hash_join(ds, loser_keys, "left_anti", on=(id_col,), right_on=("_dup_loser",))


def exact_dup_groups(
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """(representative id, n_copies) for texts occurring more than once.
    The text is dead after hashing, so only (id, hash) — 16 B/row — goes
    through the bucket exchange, plus a map-side pre-combine: each block
    contributes one (hash, min id, count) partial per distinct hash, so a
    boilerplate page repeated across a block costs one wire row."""
    hashed = ds.map_batches(
        lambda b: pd.DataFrame(
            {id_col: b[id_col].to_numpy(), "_h": b[text_col].map(text_hash).to_numpy()}
        )
        .groupby("_h", as_index=False)
        .agg(**{id_col: (id_col, "min"), "n_copies": (id_col, "size")}),
        batch_format="pandas",
    )

    from .agg import bucketed_map_groups

    def per_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("_h", as_index=False).agg(
            **{id_col: (id_col, "min"), "n_copies": ("n_copies", "sum")}
        )
        g = g[g["n_copies"] > 1].drop(columns=["_h"])
        return g.astype({id_col: "int64", "n_copies": "int64"})

    return bucketed_map_groups(hashed, "_h", per_bucket, num_buckets=64)


def canonical_per_duplicate(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Canonical-representative selection per exact-dup cluster: keep the
    BEST copy — longest text, min id tiebreak — and report the cluster
    size. This is the curation policy complement to ``exact_dedup``
    (keep-first-by-id): a crawl's shortest copy is usually the truncated
    one, so canonicalization keeps the longest. Returns
    (id, n_dups) for EVERY distinct text (n_dups == 1 for singletons).

    Scale shape: one bucketed exchange carrying (id, 128-bit hash,
    codepoint length) = 32 B/row; the text never moves. Per-block rows
    are pre-deduped on (id, hash) so a double-ingested shard ships (and
    counts) once; inside a bucket the distinct pass runs again before the
    argmax + count, mirroring exact_dedup's ID CONTRACT (same-id
    different-text is undefined behavior)."""
    from .agg import bucketed_map_groups

    def hash_block(b: pd.DataFrame) -> pd.DataFrame:
        texts = b[text_col].fillna("").to_numpy()
        h1, h2 = _md5_halves(texts)
        out = pd.DataFrame(
            {
                id_col: b[id_col].to_numpy(),
                "_h1": h1,
                "_h2": h2,
                "_len": np.fromiter(
                    (len(t) for t in texts), dtype=np.int64, count=len(texts)
                ),
            }
        )
        return out.drop_duplicates([id_col, "_h1", "_h2"])

    hashed = ds.map_batches(hash_block, batch_format="pandas")

    def per_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        u = bucket.drop_duplicates([id_col, "_h1", "_h2"])
        n = (
            u.groupby(["_h1", "_h2"], sort=False, as_index=False)
            .size()
            .rename(columns={"size": "n_dups"})
        )
        best = u.sort_values(
            ["_len", id_col], ascending=[False, True], kind="mergesort"
        ).drop_duplicates(["_h1", "_h2"])
        out = best.merge(n, on=["_h1", "_h2"])[[id_col, "n_dups"]]
        return out.astype({id_col: "int64", "n_dups": "int64"})

    empty = pd.DataFrame(
        {id_col: pd.Series(dtype="int64"), "n_dups": pd.Series(dtype="int64")}
    )
    return bucketed_map_groups(
        hashed, "_h1", per_bucket, num_buckets=num_buckets, empty_result=empty
    )


# --- shingling / MinHash ------------------------------------------------------


def shingles(text: str, k: int = 3) -> set:
    """Word k-shingles."""
    words = _WORD_RE.findall((text or "").lower())
    if len(words) < k:
        return {" ".join(words)} if words else set()
    return {" ".join(words[i : i + k]) for i in range(len(words) - k + 1)}


def ngram_jaccard(a: str, b: str, k: int = 3) -> float:
    sa, sb = shingles(a, k), shingles(b, k)
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter) if (sa or sb) else 0.0


_MERSENNE = (1 << 61) - 1


@functools.lru_cache(maxsize=16)
def _minhash_params(num_perm: int, seed: int = 7):
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """64-bit blake2b hashes of the word k-shingles (unordered, distinct)."""
    sh = shingles(text, k)
    if not sh:
        return np.empty(0, dtype=np.uint64)
    return np.array(
        [
            int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "big")
            for s in sh
        ],
        dtype=np.uint64,
    )


def minhash_signature(text: str, num_perm: int = 64, k: int = 3, seed: int = 7) -> np.ndarray:
    """MinHash over word-shingle 64-bit hashes, universal-hash permutations."""
    a, b = _minhash_params(num_perm, seed)
    hv = _shingle_hashes(text, k)
    if not len(hv):
        return np.full(num_perm, _MERSENNE, dtype=np.uint64)
    # (a*h + b) mod p, vectorized over shingles x permutations
    prod = (np.outer(hv % _MERSENNE, a) + b) % _MERSENNE
    return prod.min(axis=0).astype(np.uint64)


def _empty_pairs(value_col: str, value_dtype: str) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "id_a": pd.Series(dtype="int64"),
            "id_b": pd.Series(dtype="int64"),
            value_col: pd.Series(dtype=value_dtype),
        }
    )


def minhash_lsh_pairs(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    num_perm: int = 64,
    bands: int = 16,
    k: int = 3,
    threshold: float = 0.7,
    max_group_size: int = DEFAULT_MAX_GROUP_SIZE,
    verify_partitions: int = 4,
    broadcast_max_candidates: int = 10_000,
    driver_pair_limit: int | None = None,
) -> ray.data.Dataset:
    """Near-duplicate pairs via MinHash banding + exact Jaccard verify.

    shingle->minhash per batch -> explode one ROW PER BAND carrying only
    (band, band_hash, id) -> bucketed groupby on band_hash -> candidate id
    pairs (capped per group) -> dedup pairs across bands -> VERIFY: the
    corpus is map-side filtered to candidate ids (broadcast id set, no
    corpus shuffle), candidate texts are joined back onto the pairs by id —
    via ray.put broadcast when the candidate set is small
    (<= broadcast_max_candidates: zero shuffles, no aggregator actors) or
    distributed hash joins when it is not — and true n-gram Jaccard >=
    threshold is computed per pair.
    Output: (id_a, id_b, jaccard) — jaccard is the raw |A∩B|/|A∪B| double
    (identical integer operands in any engine, so oracle-comparable without
    rounding).

    Scale notes: the banding shuffle is ``bands`` rows of ~24 bytes per doc
    (never the document). The driver only ever holds pair-proportional
    state BELOW ``driver_pair_limit`` (default
    max(broadcast_max_candidates*bands, 100k)); above it the pair set is
    deduped with a bucketed shuffle, the candidate-id filter becomes a
    FIXED-SIZE Bloom sketch (no false negatives; false positives are
    dropped by the inner verify join), and the pairs stay a Dataset end to
    end — nothing on the driver scales with the corpus or the pair
    count."""
    rows_per_band = num_perm // bands

    def to_bands(batch: pd.DataFrame) -> pd.DataFrame:
        out = {"band": [], "band_hash": [], "_id": []}
        for did, text in zip(batch[id_col], batch[text_col]):
            sig = minhash_signature(text, num_perm, k)
            for band in range(bands):
                chunk = sig[band * rows_per_band : (band + 1) * rows_per_band]
                bh = hashlib.blake2b(chunk.tobytes(), digest_size=8).hexdigest()
                out["band"].append(band)
                out["band_hash"].append(bh)
                out["_id"].append(did)
        return pd.DataFrame(out).astype({"band": "int64", "_id": "int64"})

    banded = ds.map_batches(to_bands, batch_format="pandas")

    empty_ids = pd.DataFrame(
        {"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64")}
    )

    def per_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        # only band-hash groups with >1 member can produce candidates
        cand = bucket[bucket.duplicated(["band", "band_hash"], keep=False)]
        parts = []
        for (_band, _bh), grp in cand.groupby(["band", "band_hash"], sort=False):
            ids = _cap_group(
                np.sort(grp["_id"].to_numpy()), max_group_size, "minhash band"
            )
            ia, ib = np.triu_indices(len(ids), k=1)
            parts.append(pd.DataFrame({"id_a": ids[ia], "id_b": ids[ib]}))
        if not parts:
            return empty_ids.copy()
        return pd.concat(parts, ignore_index=True).astype(
            {"id_a": "int64", "id_b": "int64"}
        )

    from .agg import bucketed_map_groups

    pairs = bucketed_map_groups(
        banded, "band_hash", per_bucket, num_buckets=64, empty_result=empty_ids
    ).materialize()

    if driver_pair_limit is None:
        driver_pair_limit = max(broadcast_max_candidates * bands, 100_000)
    return _verify_candidate_pairs(
        ds,
        pairs,
        text_col,
        id_col,
        k=k,
        threshold=threshold,
        verify_partitions=verify_partitions,
        broadcast_max_candidates=broadcast_max_candidates,
        driver_pair_limit=driver_pair_limit,
    )


def _verify_candidate_pairs(
    ds: ray.data.Dataset,
    pairs: ray.data.Dataset,
    text_col: str,
    id_col: str,
    *,
    k: int,
    threshold: float,
    verify_partitions: int,
    broadcast_max_candidates: int,
    driver_pair_limit: int,
) -> ray.data.Dataset:
    """Shared verify tail for Jaccard candidate generators (MinHash bands,
    bottom-k shingle sketch): dedup candidate pairs, join texts back by id,
    keep pairs with exact n-gram Jaccard >= threshold. ``pairs`` is a
    materialized (id_a, id_b) Dataset, possibly with duplicates."""
    from .agg import bucketed_map_groups

    empty_ids = pd.DataFrame(
        {"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64")}
    )
    empty_out = _empty_pairs("jaccard", "float64")
    n_raw = pairs.count()
    if n_raw == 0:
        return ray.data.from_pandas(empty_out)

    import ray as _ray

    from .joins import _fetch

    # a pair can surface from several bands -> dedup on (id_a, id_b)
    # BEFORE the (expensive) exact verify. The raw pair count is bounded
    # by the per-group cap; when it is driver-small (the common case —
    # near-dups are rare by construction) dedup on the driver and filter
    # the corpus with the exact id set; above driver_pair_limit NOTHING
    # pair-sized touches the driver: bucketed-shuffle dedup + a fixed-size
    # Bloom sketch of the candidate ids (no false negatives; its false
    # positives ride into the verify joins and drop out there).
    use_broadcast_verify = False
    if n_raw <= driver_pair_limit:
        cand_df = (
            pairs.to_pandas().drop_duplicates(["id_a", "id_b"]).reset_index(drop=True)
        )
        cand = ray.data.from_pandas(cand_df)
        id_set = frozenset(
            np.union1d(cand_df["id_a"].to_numpy(), cand_df["id_b"].to_numpy()).tolist()
        )
        ref = _ray.put(id_set)

        def keep_candidates(batch: pd.DataFrame) -> pd.DataFrame:
            ids = _fetch(ref)
            out = batch[batch[id_col].isin(ids)][[id_col, text_col]]
            return out.astype({id_col: "int64"})

        cand_texts = ds.map_batches(keep_candidates, batch_format="pandas")
        use_broadcast_verify = len(id_set) <= broadcast_max_candidates
    else:
        from .sketches import bloom_build, bloom_semi_filter

        cand = bucketed_map_groups(
            pairs,
            "id_a",
            lambda b: b.drop_duplicates(["id_a", "id_b"]),
            num_buckets=16,
            empty_result=empty_ids,
        ).materialize()
        cand_ids = cand.map_batches(
            lambda b: pd.DataFrame(
                {"cid": np.concatenate([b["id_a"].to_numpy(), b["id_b"].to_numpy()])}
            ),
            batch_format="pandas",
        )
        bloom = bloom_build(cand_ids, "cid")
        projected = ds.map_batches(
            lambda b: b[[id_col, text_col]].astype({id_col: "int64"}),
            batch_format="pandas",
        )
        cand_texts = bloom_semi_filter(projected, bloom, id_col)

    def verify_frame(batch: pd.DataFrame) -> pd.DataFrame:
        """Exact Jaccard over (id_a, id_b, _text_a, _text_b) rows."""
        if not len(batch):
            return empty_out.copy()
        cache: dict = {}

        def sh_of(did, text):
            if did not in cache:
                cache[did] = shingles(text, k)
            return cache[did]

        jac = np.empty(len(batch), dtype=np.float64)
        for i, (ida, idb, ta, tb) in enumerate(
            zip(batch["id_a"], batch["id_b"], batch["_text_a"], batch["_text_b"])
        ):
            sa, sb = sh_of(ida, ta), sh_of(idb, tb)
            if not sa and not sb:
                jac[i] = 1.0
            else:
                inter = len(sa & sb)
                jac[i] = inter / (len(sa) + len(sb) - inter)
        out = pd.DataFrame(
            {
                "id_a": batch["id_a"].to_numpy(),
                "id_b": batch["id_b"].to_numpy(),
                "jaccard": jac,
            }
        )
        return out[out["jaccard"] >= threshold].astype(
            {"id_a": "int64", "id_b": "int64"}
        )

    if use_broadcast_verify:
        # small candidate set: ship {id: text} once via the object store
        # and verify inside map_batches over the pairs — zero shuffles
        texts_df = cand_texts.to_pandas()
        text_ref = _ray.put(dict(zip(texts_df[id_col], texts_df[text_col])))

        def verify_broadcast(batch: pd.DataFrame) -> pd.DataFrame:
            tmap = _fetch(text_ref)
            batch = batch.assign(
                _text_a=batch["id_a"].map(tmap), _text_b=batch["id_b"].map(tmap)
            )
            return verify_frame(batch)

        res = cand.map_batches(verify_broadcast, batch_format="pandas").materialize()
        if res.count() == 0:
            return ray.data.from_pandas(empty_out)
        return res

    from .joins import hash_join

    # coalesce the candidate blocks first: sparse bucketed stages can emit
    # schema-less EMPTY blocks which Arrow's hash join rejects; repartition
    # merges them into typed blocks (candidate-sized, cheap)
    cand = cand.repartition(max(2, verify_partitions))

    # hash-join texts back by id (both sides are candidate-proportional)
    j = hash_join(
        cand,
        cand_texts,
        "inner",
        num_partitions=verify_partitions,
        on=("id_a",),
        right_on=(id_col,),
    ).map_batches(
        lambda b: b.rename(columns={text_col: "_text_a"})[["id_a", "id_b", "_text_a"]],
        batch_format="pandas",
    )
    j = hash_join(
        j,
        cand_texts,
        "inner",
        num_partitions=verify_partitions,
        on=("id_b",),
        right_on=(id_col,),
    ).map_batches(
        lambda b: b.rename(columns={text_col: "_text_b"})[
            ["id_a", "id_b", "_text_a", "_text_b"]
        ],
        batch_format="pandas",
    )

    res = j.map_batches(verify_frame, batch_format="pandas").materialize()
    # all candidates refuted -> Ray's all-empty-block bypass loses the
    # schema; substitute the typed empty (result is candidate-sized, so the
    # materialize is cheap by construction)
    if res.count() == 0:
        return ray.data.from_pandas(empty_out)
    return res


def ngram_jaccard_pairs(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    k: int = 3,
    sketch_size: int = 16,
    threshold: float = 0.6,
    min_shared: int = 2,
    max_group_size: int = DEFAULT_MAX_GROUP_SIZE,
    verify_partitions: int = 4,
    broadcast_max_candidates: int = 10_000,
    driver_pair_limit: int | None = None,
) -> ray.data.Dataset:
    """Near-duplicate pairs by direct n-gram Jaccard: a bottom-k sketch
    inverted index instead of MinHash bands.

    Per doc, hash the word k-shingles and keep the ``sketch_size``
    SMALLEST hashes (a deterministic bottom-k sketch of the shingle set).
    Two docs are candidates iff their sketches share >= ``min_shared``
    hashes — a true >=t pair shares ~t*sketch_size of them in
    expectation, so the miss probability at min_shared=2 is
    P[Binom(sketch_size, t) <= 1] (~1e-5 at t=0.6, k=16), while requiring
    two co-occurrences prunes the one-boilerplate-shingle false
    candidates that dominate a single-hash inverted index (measured 269k
    -> ~300 candidates on the sf0.1 corpus). Recall 1.0 is verified vs an
    all-pairs SQL oracle on the synthetic corpora. Candidates then go
    through the SAME exact-Jaccard verify as ``minhash_lsh_pairs`` — so
    false positives are impossible and output jaccard doubles are
    oracle-comparable.

    Scale notes: the inverted-index shuffle is ``sketch_size`` rows of
    ~16 bytes per doc (hash + id), bucketed on the shingle hash with
    per-group caps against boilerplate shingles; everything downstream is
    candidate-proportional (see ``_verify_candidate_pairs``)."""

    def to_sketch(batch: pd.DataFrame) -> pd.DataFrame:
        # _n = sketch size, so the multiplicity filter can relax min_shared
        # for docs whose whole sketch is smaller than it (short texts)
        out = {"sh": [], "_id": [], "_n": []}
        for did, text in zip(batch[id_col], batch[text_col]):
            hv = _shingle_hashes(text, k)
            if not len(hv):
                # shingle-less doc: sentinel hash, mirroring the minhash
                # all-MERSENNE signature — two empty docs are Jaccard 1.0
                # by convention (both here and in the SQL oracle)
                hv = np.array([np.iinfo(np.int64).min], dtype=np.int64)
            elif len(hv) > sketch_size:
                hv = np.partition(hv, sketch_size - 1)[:sketch_size]
            n = len(hv)
            # signed view: pandas->Arrow keeps int64 exact (uint64 >= 2^63
            # would round-trip through float64)
            for h in hv.astype(np.int64):
                out["sh"].append(int(h))
                out["_id"].append(did)
                out["_n"].append(n)
        return pd.DataFrame(out).astype(
            {"sh": "int64", "_id": "int64", "_n": "int64"}
        )

    sketched = ds.map_batches(to_sketch, batch_format="pandas")

    empty_ids = pd.DataFrame(
        {"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64")}
    )

    empty_raw = empty_ids.assign(_mn=pd.Series(dtype="int64"))

    def per_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        cand = bucket[bucket.duplicated("sh", keep=False)]
        parts = []
        for _sh, grp in cand.groupby("sh", sort=False):
            g2 = grp.drop_duplicates("_id").sort_values("_id")
            ids = g2["_id"].to_numpy()
            ids = _cap_group(ids, max_group_size, "ngram sketch")
            if len(ids) < 2:
                continue
            ns = g2["_n"].to_numpy()[: len(ids)]
            ia, ib = np.triu_indices(len(ids), k=1)
            parts.append(
                pd.DataFrame(
                    {
                        "id_a": ids[ia],
                        "id_b": ids[ib],
                        "_mn": np.minimum(ns[ia], ns[ib]),
                    }
                )
            )
        if not parts:
            return empty_raw.copy()
        return pd.concat(parts, ignore_index=True).astype(
            {"id_a": "int64", "id_b": "int64", "_mn": "int64"}
        )

    from .agg import bucketed_map_groups

    pairs = bucketed_map_groups(
        sketched, "sh", per_bucket, num_buckets=64, empty_result=empty_raw
    ).materialize()

    # pair multiplicity == number of shared sketch hashes (each shingle
    # group emits a pair at most once); bucketing on id_a co-locates every
    # occurrence of an unordered pair, so the count is global. Docs whose
    # WHOLE sketch is smaller than min_shared (short/empty texts) can't
    # share min_shared hashes — relax the bar to the smaller sketch size.
    def keep_multishared(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(["id_a", "id_b"], as_index=False).agg(
            _cnt=("_mn", "size"), _mn=("_mn", "min")
        )
        need = np.minimum(min_shared, g["_mn"].to_numpy())
        return g[g["_cnt"].to_numpy() >= need][["id_a", "id_b"]].astype(
            {"id_a": "int64", "id_b": "int64"}
        )

    pairs = bucketed_map_groups(
        pairs, "id_a", keep_multishared, num_buckets=16, empty_result=empty_ids
    ).materialize()

    if driver_pair_limit is None:
        driver_pair_limit = max(broadcast_max_candidates * sketch_size, 100_000)
    return _verify_candidate_pairs(
        ds,
        pairs,
        text_col,
        id_col,
        k=k,
        threshold=threshold,
        verify_partitions=verify_partitions,
        broadcast_max_candidates=broadcast_max_candidates,
        driver_pair_limit=driver_pair_limit,
    )


def simhash_dup_pairs(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    max_hamming: int = 3,
    max_group_size: int = DEFAULT_MAX_GROUP_SIZE,
) -> ray.data.Dataset:
    """SimHash near-dup candidates: bucket by each of 4 16-bit chunks (any
    pair within Hamming distance 3 shares at least one chunk — pigeonhole —
    so for max_hamming <= 3 the candidate set is EXHAUSTIVE, not
    approximate), verify Hamming distance within bucket. Shuffle payload is
    (chunk, chunk_val, id, signature) — 8-byte signatures, never text.
    Signatures come from the VECTORIZED batch kernel
    (``textstats.simhash64_signed_batch``), whose one documented
    divergence from the scalar reference is U+0130 'İ' (Arrow simple
    vs Python full lowercase) — see the textstats engine-parity note."""
    from .textstats import simhash64_signed_batch

    with_sig = ds.map_batches(
        lambda b: pd.DataFrame(
            {
                id_col: b[id_col].to_numpy(),
                "_sig": simhash64_signed_batch(b[text_col]),
            }
        ),
        batch_format="pandas",
    )
    return signature_dup_pairs(
        with_sig,
        "_sig",
        id_col,
        max_hamming=max_hamming,
        max_group_size=max_group_size,
        what="simhash chunk",
    )


def signature_dup_pairs(
    ds: ray.data.Dataset,
    sig_col: str,
    id_col: str = "doc_id",
    *,
    max_hamming: int = 3,
    max_group_size: int = DEFAULT_MAX_GROUP_SIZE,
    what: str = "signature chunk",
    driver_combine_max_rows: int = 2_000_000,
    force_branch: str | None = None,
) -> ray.data.Dataset:
    """Near-dup pairs among 64-bit signatures (SIGNED int64 column) by
    Hamming distance: bucket on each of 4 16-bit chunks (pigeonhole —
    EXHAUSTIVE for max_hamming <= 3), verify XOR popcount within bucket.
    The shared engine behind ``simhash_dup_pairs`` (text) and
    ``multimodal.phash_dup_pairs`` (images). Shuffle payload is
    (chunk, chunk_val, id, 8-B signature) x 4 per row — never content."""

    def to_chunks(batch: pd.DataFrame) -> pd.DataFrame:
        # signed int64 storage (values >= 2^63 would silently become
        # float64 through the pandas->Arrow boundary and break XOR)
        sh_signed = batch[sig_col].to_numpy().astype(np.int64)
        sh_u = sh_signed.view(np.uint64)
        nb = len(batch)
        shifts = (16 * np.arange(4, dtype=np.uint64))[None, :]
        vals = ((sh_u[:, None] >> shifts) & np.uint64(0xFFFF)).astype(np.int64)
        return pd.DataFrame(
            {
                "chunk": np.tile(np.arange(4, dtype=np.int64), nb),
                "chunk_val": vals.reshape(-1),
                "_id": np.repeat(batch[id_col].to_numpy(), 4),
                "_sh": np.repeat(sh_signed, 4),
            }
        )

    empty_out = _empty_pairs("hamming", "int64")

    def per_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        dup_mask = bucket.duplicated(["chunk", "chunk_val"], keep=False)
        cand = bucket[dup_mask]
        out = {"id_a": [], "id_b": [], "hamming": []}
        mask = (1 << 64) - 1
        for (_c, _v), grp in cand.groupby(["chunk", "chunk_val"], sort=False):
            recs = sorted(zip(grp["_id"], (int(v) & mask for v in grp["_sh"])))
            if len(recs) > max_group_size:
                _LOG.warning(
                    "%s: degenerate group of %d members capped to %d",
                    what,
                    len(recs),
                    max_group_size,
                )
                recs = recs[:max_group_size]
            for i in range(len(recs)):
                for j in range(i + 1, len(recs)):
                    d = bin(recs[i][1] ^ recs[j][1]).count("1")
                    if d <= max_hamming:
                        out["id_a"].append(recs[i][0])
                        out["id_b"].append(recs[j][0])
                        out["hamming"].append(d)
        return pd.DataFrame(out).astype(
            {"id_a": "int64", "id_b": "int64", "hamming": "int64"}
        )

    from .agg import bucketed_map_groups, use_fast_branch

    chunked = ds.map_batches(to_chunks, batch_format="pandas")
    pairs = bucketed_map_groups(
        chunked, "chunk_val", per_bucket, num_buckets=32, empty_result=empty_out
    )
    # the same pair can surface through up to 4 chunks (with the SAME
    # hamming — it's the popcount of the same two signatures), so dedup:
    # per-block pre-combine, then driver-side when the survivors fit
    # under ``driver_combine_max_rows`` (pair-bounded, never corpus-
    # bounded), else a bucketed exchange. ``force_branch``
    # ("driver" | "bucketed") pins it for parity tests.
    def dedup_block(b: pd.DataFrame) -> pd.DataFrame:
        return b.drop_duplicates(["id_a", "id_b"])

    partials = pairs.map_batches(dedup_block, batch_format="pandas").materialize()
    n_partials = partials.count()
    if use_fast_branch(
        force_branch,
        fast="driver",
        slow="bucketed",
        count=n_partials,
        cap=driver_combine_max_rows,
    ):
        pdf = partials.to_pandas() if n_partials else empty_out
        g = dedup_block(pdf).reset_index(drop=True)
        import pyarrow as pa

        return ray.data.from_arrow(pa.Table.from_pandas(g, preserve_index=False))
    return bucketed_map_groups(
        partials,
        "id_a",
        dedup_block,
        num_buckets=16,
        empty_result=empty_out,
    )


def contamination_counts(
    ds: ray.data.Dataset,
    probe_shingles: set,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    k: int = 3,
) -> ray.data.Dataset:
    """Benchmark decontamination: per doc, how many of its word k-shingles
    appear in the probe set (the benchmark / eval corpus shingles).

    The probe set is benchmark-sized — small by definition — so it ships
    once via ray.put and the scan is a pure map (ZERO shuffles) over the
    corpus: the canonical broadcast-semi pattern. Output
    (id, n_probe_hits int64)."""
    import ray as _ray

    from .joins import _fetch

    ref = _ray.put(frozenset(probe_shingles))

    def count_hits(b: pd.DataFrame) -> pd.DataFrame:
        probe = _fetch(ref)
        hits = [
            len(shingles(t, k) & probe) for t in b[text_col]
        ]
        return pd.DataFrame({id_col: b[id_col].to_numpy(), "n_probe_hits": hits}).astype(
            {id_col: "int64", "n_probe_hits": "int64"}
        )

    return ds.map_batches(count_hits, batch_format="pandas")


def fingerprint_overlap_pairs(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    min_shared: int = 3,
    k: int = 30,
    window: int = 8,
    max_group_size: int = DEFAULT_MAX_GROUP_SIZE,
    num_buckets: int = 64,
    force_branch: str | None = None,
) -> ray.data.Dataset:
    """MOSS-style exact-substring reuse detection: pairs of docs sharing
    >= ``min_shared`` DISTINCT winnowing fingerprints (rolling k-char
    hashes, min-in-window selection — ops/textstats.py), with the shared
    count. Default k=30: a 30-char verbatim run is a strong reuse signal,
    while short grams (k=8) are cross-doc boilerplate that degenerates
    the inverted index (measured: 5.5M junk pairs at sf0.1). Shared fingerprints mean shared k-char substrings at sampled
    positions, so a high count means long verbatim reuse (quotes,
    boilerplate, plagiarized spans) even when the docs are NOT global
    near-duplicates — the detector Jaccard-style dedup misses.

    Shape: (fingerprint, id) int rows explode map-side (winnowing keeps
    ~1/window of the grams), one bucketed shuffle on the fingerprint with
    capped groups -> pair rows, one bucketed count per pair. The count is
    itself the verdict (pure ints) — no text verify join, and the SQL twin
    computes the identical integer, so the oracle is exact.
    Output: (id_a, id_b, n_shared int64)."""
    from .agg import bucketed_map_groups
    from .textstats import winnowing_fingerprints

    def to_rows(b: pd.DataFrame) -> pd.DataFrame:
        out = {"fp": [], "_id": []}
        for did, text in zip(b[id_col], b[text_col]):
            for h in set(winnowing_fingerprints(text, k=k, window=window)):
                # signed int64 view (md5-low64 values reach 2^64)
                out["fp"].append(h - (1 << 64) if h >= (1 << 63) else h)
                out["_id"].append(did)
        return pd.DataFrame(out).astype({"fp": "int64", "_id": "int64"})

    rows = ds.map_batches(to_rows, batch_format="pandas")
    return shared_key_pairs(
        rows,
        "fp",
        "_id",
        min_shared=min_shared,
        max_group_size=max_group_size,
        num_buckets=num_buckets,
        what="fingerprint",
        force_branch=force_branch,
    )


def shared_key_pairs(
    rows: ray.data.Dataset,
    key_col: str,
    id_col: str,
    *,
    min_shared: int,
    max_group_size: int = DEFAULT_MAX_GROUP_SIZE,
    num_buckets: int = 64,
    what: str = "shared key",
    driver_combine_max_rows: int = 2_000_000,
    force_branch: str | None = None,
) -> ray.data.Dataset:
    """The overlap-count pair engine: (key, id) rows — DISTINCT per id,
    the caller's contract — to (id_a, id_b, n_shared >= min_shared).
    One bucketed shuffle on the key (capped groups warn via _cap_group),
    then a per-block pair-count pre-combine; the partials (bounded by
    candidate PAIRS x blocks, never by the corpus) are summed on the
    driver when they fit under ``driver_combine_max_rows``, else through
    a second bucketed exchange — the same adaptive shape as
    drop_near_dup_losers. ``force_branch`` ("driver" | "bucketed") pins
    the final combine for parity tests. Shared by
    ``fingerprint_overlap_pairs`` (winnowing), ``multimodal``'s audio
    landmark and video frame-pHash dedup."""
    from .agg import bucketed_map_groups, use_fast_branch

    empty_pairs = pd.DataFrame(
        {"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64")}
    )

    def per_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        cand = bucket[bucket.duplicated(key_col, keep=False)]
        parts = []
        for _k, grp in cand.groupby(key_col, sort=False):
            ids = np.unique(grp[id_col].to_numpy())
            ids = _cap_group(ids, max_group_size, what)
            if len(ids) < 2:
                continue
            ia, ib = np.triu_indices(len(ids), k=1)
            parts.append(pd.DataFrame({"id_a": ids[ia], "id_b": ids[ib]}))
        if not parts:
            return empty_pairs.copy()
        return pd.concat(parts, ignore_index=True).astype(
            {"id_a": "int64", "id_b": "int64"}
        )

    pairs = bucketed_map_groups(
        rows, key_col, per_bucket, num_buckets=num_buckets, empty_result=empty_pairs
    )

    empty_out = _empty_pairs("n_shared", "int64")
    empty_partial = _empty_pairs("n_partial", "int64")

    def partial_counts(b: pd.DataFrame) -> pd.DataFrame:
        # rows are unique per (pair, key) — keys distinct per id map-side,
        # group caps aside — so the per-block group size is a partial count
        if not len(b):
            return empty_partial.copy()
        g = b.groupby(["id_a", "id_b"], as_index=False).size()
        g = g.rename(columns={"size": "n_partial"})
        return g.astype({"id_a": "int64", "id_b": "int64", "n_partial": "int64"})

    partials = pairs.map_batches(partial_counts, batch_format="pandas").materialize()
    n_partials = partials.count()

    def final_combine(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(["id_a", "id_b"], as_index=False)["n_partial"].sum()
        g = g[g["n_partial"] >= min_shared].rename(columns={"n_partial": "n_shared"})
        return g.astype({"id_a": "int64", "id_b": "int64", "n_shared": "int64"})

    if use_fast_branch(
        force_branch,
        fast="driver",
        slow="bucketed",
        count=n_partials,
        cap=driver_combine_max_rows,
    ):
        pdf = partials.to_pandas() if n_partials else empty_partial
        g = final_combine(pdf).reset_index(drop=True)
        # via Arrow so an EMPTY result keeps its typed schema (an empty
        # pandas frame through from_pandas loses its columns on to_pandas)
        import pyarrow as pa

        return ray.data.from_arrow(pa.Table.from_pandas(g, preserve_index=False))

    return bucketed_map_groups(
        partials, "id_a", final_combine, num_buckets=16, empty_result=empty_out
    )
