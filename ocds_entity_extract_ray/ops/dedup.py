"""Deduplication operators (exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine) — the shapes a 100 TB training-data pipeline needs.

Scale notes per operator:
- exact: content-hash per batch (vectorized) -> groupby(hash) -> per-group
  first. One shuffle on a short hash key.
- MinHash+LSH: shingle->minhash per batch -> explode to (band, band_hash)
  rows -> groupby bands -> candidate pairs -> verify true Jaccard. Shuffle
  carries only (band_hash, doc_id) pairs, never documents.
- SimHash: 64-bit signature per doc; bucket by rotated prefixes for
  near-neighbor candidates, verify Hamming distance.
- n-gram Jaccard: exact verification kernel used by the candidates.
- embedding cosine: see ops/similarity.py (matmul against broadcast
  normalized matrix; LSH-bucketed variant as the scale path).
"""

from __future__ import annotations

import functools
import hashlib
import re

import numpy as np
import pandas as pd
import ray.data

_WORD_RE = re.compile(r"\w+", re.UNICODE)


def text_hash(t: str) -> str:
    return hashlib.sha256((t or "").encode("utf-8")).hexdigest()


# --- exact dedup -------------------------------------------------------------


def exact_dedup(
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Keep one representative (min id) per distinct text: content-hash per
    batch, hash-bucketed shuffle, vectorized drop-duplicates per bucket
    (A7 pattern generalized to documents; one Python call per BUCKET)."""
    from .agg import bucketed_map_groups

    hashed = ds.map_batches(
        lambda b: b.assign(_h=b[text_col].map(text_hash)), batch_format="pandas"
    )

    def per_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        return (
            bucket.sort_values(id_col, kind="mergesort")
            .drop_duplicates("_h", keep="first")
            .drop(columns=["_h"])
        )

    return bucketed_map_groups(hashed, "_h", per_bucket, num_buckets=64)


def exact_dup_groups(
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """(representative id, n_copies) for texts occurring more than once."""
    hashed = ds.map_batches(
        lambda b: b[[id_col, text_col]].assign(_h=b[text_col].map(text_hash)),
        batch_format="pandas",
    )

    from .agg import bucketed_map_groups

    def per_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("_h", as_index=False).agg(
            **{id_col: (id_col, "min"), "n_copies": (id_col, "size")}
        )
        g = g[g["n_copies"] > 1].drop(columns=["_h"])
        return g.astype({id_col: "int64", "n_copies": "int64"})

    return bucketed_map_groups(hashed, "_h", per_bucket, num_buckets=64)


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


def minhash_signature(text: str, num_perm: int = 64, k: int = 3, seed: int = 7) -> np.ndarray:
    """MinHash over word-shingle 64-bit hashes, universal-hash permutations."""
    a, b = _minhash_params(num_perm, seed)
    sh = shingles(text, k)
    if not sh:
        return np.full(num_perm, _MERSENNE, dtype=np.uint64)
    hv = np.array(
        [
            int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "big")
            for s in sh
        ],
        dtype=np.uint64,
    )
    # (a*h + b) mod p, vectorized over shingles x permutations
    prod = (np.outer(hv % _MERSENNE, a) + b) % _MERSENNE
    return prod.min(axis=0).astype(np.uint64)


def minhash_lsh_pairs(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    num_perm: int = 64,
    bands: int = 16,
    k: int = 3,
    threshold: float = 0.7,
) -> ray.data.Dataset:
    """Near-duplicate pairs via MinHash banding + exact Jaccard verify.

    shingle->minhash per batch -> explode one row per band -> groupby
    (band_id, band_hash) -> candidate pairs within bucket -> verify true
    n-gram Jaccard >= threshold. Output: (id_a, id_b, jaccard).
    Texts ride along only into the verify step; at very large scale swap the
    ride-along for a re-join on id against the corpus."""
    rows_per_band = num_perm // bands

    def to_bands(batch: pd.DataFrame) -> pd.DataFrame:
        out = {"band": [], "band_hash": [], "_id": [], "_text": []}
        for did, text in zip(batch[id_col], batch[text_col]):
            sig = minhash_signature(text, num_perm, k)
            for band in range(bands):
                chunk = sig[band * rows_per_band : (band + 1) * rows_per_band]
                bh = hashlib.blake2b(chunk.tobytes(), digest_size=8).hexdigest()
                out["band"].append(band)
                out["band_hash"].append(bh)
                out["_id"].append(did)
                out["_text"].append(text)
        return pd.DataFrame(out)

    banded = ds.map_batches(to_bands, batch_format="pandas")

    def per_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        # only band-hash groups with >1 member can produce candidates
        dup_mask = bucket.duplicated(["band", "band_hash"], keep=False)
        cand = bucket[dup_mask]
        out = {"id_a": [], "id_b": [], "jaccard": []}
        for (_band, _bh), grp in cand.groupby(["band", "band_hash"], sort=False):
            ids = grp["_id"].to_numpy()
            texts = grp["_text"].to_numpy()
            order = np.argsort(ids)
            for i in range(len(order)):
                for j in range(i + 1, len(order)):
                    ia, ib = order[i], order[j]
                    jac = ngram_jaccard(texts[ia], texts[ib], k)
                    if jac >= threshold:
                        out["id_a"].append(ids[ia])
                        out["id_b"].append(ids[ib])
                        out["jaccard"].append(round(jac, 6))
        return pd.DataFrame(out).astype(
            {"id_a": "int64", "id_b": "int64", "jaccard": "float64"}
        )

    from .agg import bucketed_map_groups

    pairs = bucketed_map_groups(banded, "band_hash", per_bucket, num_buckets=64)

    # a pair can surface from several bands -> dedup on (id_a, id_b)
    def dedup_pairs(bucket: pd.DataFrame) -> pd.DataFrame:
        return bucket.drop_duplicates(["id_a", "id_b"])

    return bucketed_map_groups(pairs, "id_a", dedup_pairs, num_buckets=16)


def simhash_dup_pairs(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    max_hamming: int = 3,
) -> ray.data.Dataset:
    """SimHash near-dup candidates: bucket by each of 4 16-bit chunks (any
    pair within Hamming distance 3 shares at least one chunk), verify
    Hamming distance within bucket."""
    from .textstats import simhash64

    def to_chunks(batch: pd.DataFrame) -> pd.DataFrame:
        out = {"chunk": [], "chunk_val": [], "_id": [], "_sh": []}
        for did, text in zip(batch[id_col], batch[text_col]):
            sh = simhash64(text)
            # store as SIGNED int64 (values >= 2^63 would silently become
            # float64 through the pandas->Arrow boundary and break XOR)
            sh_signed = sh - (1 << 64) if sh >= (1 << 63) else sh
            for c in range(4):
                out["chunk"].append(c)
                out["chunk_val"].append((sh >> (16 * c)) & 0xFFFF)
                out["_id"].append(did)
                out["_sh"].append(sh_signed)
        return pd.DataFrame(out).astype({"_sh": "int64"})

    def per_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        dup_mask = bucket.duplicated(["chunk", "chunk_val"], keep=False)
        cand = bucket[dup_mask]
        out = {"id_a": [], "id_b": [], "hamming": []}
        mask = (1 << 64) - 1
        for (_c, _v), grp in cand.groupby(["chunk", "chunk_val"], sort=False):
            recs = sorted(zip(grp["_id"], (int(v) & mask for v in grp["_sh"])))
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

    from .agg import bucketed_map_groups

    chunked = ds.map_batches(to_chunks, batch_format="pandas")
    pairs = bucketed_map_groups(chunked, "chunk_val", per_bucket, num_buckets=32)
    return bucketed_map_groups(
        pairs, "id_a", lambda b: b.drop_duplicates(["id_a", "id_b"]), num_buckets=16
    )
