"""Mergeable sketches for 100 TB-scale summaries, completing the family
started by ops/quantiles.py: heavy hitters (Misra–Gries) and approximate
distinct counting (HyperLogLog). Both follow the engine's two-stage
shape — a compact per-batch summary inside map_batches, then a driver or
bucketed combine of summaries — so the shuffle carries O(k) or O(2^p)
bytes per block regardless of row count.

Error guarantees (pytest-bounded):
- Misra–Gries with k counters over-/under-counts any item by at most
  n/k after merging (summaries merge by counter addition + decrement).
  Any item with true frequency > n/k is guaranteed PRESENT.
- HyperLogLog with 2^p registers: stderr ~ 1.04/sqrt(2^p) (~1.6% at
  p=12). Register arrays merge by elementwise max — order-independent.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import ray.data


# --- Misra-Gries heavy hitters ----------------------------------------------


def _mg_summary(values, k: int) -> dict:
    counters: dict = {}
    for v in values:
        if v in counters:
            counters[v] += 1
        elif len(counters) < k:
            counters[v] = 1
        else:
            dead = []
            for key in counters:
                counters[key] -= 1
                if counters[key] == 0:
                    dead.append(key)
            for key in dead:
                del counters[key]
    return counters


def heavy_hitters(
    ds: ray.data.Dataset, col: str, *, k: int = 64
) -> pd.DataFrame:
    """Misra–Gries top candidates: (value, approx_count, n_total). Any
    value with true count > n/k is guaranteed present; approx_count
    undercounts by at most n/k."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        s = _mg_summary(batch[col].tolist(), k)
        vals = list(s.keys())
        cnts = list(s.values())
        br = [0] * len(s)
        if len(batch):
            # dedicated count-carrier row (count 0 never moves the merge):
            # rides the block's row count along so n_total needs no second
            # pass over the input, and it exists even when the MG summary
            # is EMPTY — decrement-all can evict every counter on a block
            # of many distinct values, which previously lost those rows
            # from n_total
            vals.append(batch[col].iloc[0])
            cnts.append(0)
            br.append(len(batch))
        return pd.DataFrame({"value": vals, "count": cnts, "block_rows": br})

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    n_total = int(parts["block_rows"].sum()) if len(parts) else 0
    # summaries merge by counter ADDITION with a single final cut — the
    # pairwise MG merge (add + subtract (k+1)-th largest) telescopes to
    # exactly this, and one cut loses less than repeated pairwise cuts
    summed = (
        parts.groupby("value", sort=False)["count"].sum()
        if len(parts)
        else pd.Series(dtype="int64")
    )
    # drop pure carrier entries (real MG counters are always >= 1)
    merged = {v: int(c) for v, c in summed.items() if int(c) > 0}
    if len(merged) > k:
        cut = sorted(merged.values(), reverse=True)[k]
        merged = {v: c - cut for v, c in merged.items() if c - cut > 0}
    out = pd.DataFrame(
        {"value": list(merged.keys()), "approx_count": list(merged.values())}
    ).sort_values(["approx_count", "value"], ascending=[False, True])
    out["n_total"] = n_total
    return out.reset_index(drop=True)


# --- HyperLogLog -------------------------------------------------------------


def _hll_registers(values, p: int) -> np.ndarray:
    m = 1 << p
    reg = np.zeros(m, dtype=np.uint8)
    for v in values:
        h = int.from_bytes(
            hashlib.blake2b(str(v).encode("utf-8"), digest_size=8).digest(), "big"
        )
        idx = h >> (64 - p)
        rest = h & ((1 << (64 - p)) - 1)
        # rank = leading zeros of the remaining bits + 1
        rank = (64 - p) - rest.bit_length() + 1
        if rank > reg[idx]:
            reg[idx] = rank
    return reg


def _hll_estimate(reg: np.ndarray) -> float:
    m = len(reg)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(2.0 ** (-reg.astype(np.float64)))
    zeros = int((reg == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # small-range correction
    return float(est)


def approx_count_distinct(
    ds: ray.data.Dataset, col: str, *, p: int = 12
) -> int:
    """HyperLogLog distinct count: per-batch register arrays (2^p bytes),
    merged by elementwise max — order-independent, so the result is
    deterministic for a given input set regardless of partitioning."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        reg = _hll_registers(batch[col].tolist(), p)
        return pd.DataFrame({"reg": [reg.tobytes()]})

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    if parts.empty:
        return 0
    merged = np.zeros(1 << p, dtype=np.uint8)
    for blob in parts["reg"]:
        merged = np.maximum(merged, np.frombuffer(blob, dtype=np.uint8))
    return int(round(_hll_estimate(merged)))


# --- Bloom filter (bloom-join prefilter) -------------------------------------


def _bloom_hashes(values, n_bits: int, n_hashes: int) -> np.ndarray:
    """Double hashing: h_i = (h1 + i*h2) mod n_bits from one blake2b."""
    idx = np.empty((len(values), n_hashes), dtype=np.int64)
    for r, v in enumerate(values):
        d = hashlib.blake2b(str(v).encode("utf-8"), digest_size=16).digest()
        h1 = int.from_bytes(d[:8], "big")
        h2 = int.from_bytes(d[8:], "big") | 1
        for i in range(n_hashes):
            idx[r, i] = (h1 + i * h2) % n_bits
    return idx


def bloom_build(
    ds: ray.data.Dataset, col: str, *, n_bits: int = 1 << 20, n_hashes: int = 4
) -> np.ndarray:
    """Distributed Bloom filter over a key column: per-batch bit arrays
    (n_bits/8 bytes each) OR-merged — the mergeable-sketch shape again.
    NO false negatives ever; false-positive rate ~ (1-e^{-kn/m})^k."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(n_bits // 8, dtype=np.uint8)
        idx = _bloom_hashes(batch[col].tolist(), n_bits, n_hashes)
        np.bitwise_or.at(bits, idx.ravel() // 8, (1 << (idx.ravel() % 8)).astype(np.uint8))
        return pd.DataFrame({"bits": [bits.tobytes()]})

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    merged = np.zeros(n_bits // 8, dtype=np.uint8)
    for blob in parts["bits"]:
        merged |= np.frombuffer(blob, dtype=np.uint8)
    return merged


def bloom_contains(bloom: np.ndarray, values, *, n_hashes: int = 4) -> np.ndarray:
    n_bits = len(bloom) * 8
    idx = _bloom_hashes(list(values), n_bits, n_hashes)
    hit = (bloom[idx // 8] >> (idx % 8)) & 1
    return hit.all(axis=1).astype(bool)


def bloom_semi_filter(
    ds: ray.data.Dataset,
    bloom: np.ndarray,
    col: str,
    *,
    n_hashes: int = 4,
) -> ray.data.Dataset:
    """Bloom-join prefilter: broadcast the filter once (ray.put), drop the
    big side's rows that CANNOT match before any shuffle — the classic
    way to shrink a 100 TB join input. Approximate (keeps false
    positives), so follow with an exact join; never drops a true match."""
    import ray as _ray

    from .joins import _fetch

    ref = _ray.put(bloom)

    def flt(batch: pd.DataFrame) -> pd.DataFrame:
        bl = _fetch(ref)
        return batch[bloom_contains(bl, batch[col].tolist(), n_hashes=n_hashes)]

    return ds.map_batches(flt, batch_format="pandas")


def approx_count_distinct_by(
    ds: ray.data.Dataset,
    key_col: str,
    col: str,
    *,
    p: int = 12,
    num_buckets: int = 16,
) -> pd.DataFrame:
    """GROUPED HyperLogLog: approx distinct ``col`` per ``key_col`` —
    the per-domain cardinality profile (distinct urls per host, distinct
    users per segment) a 100 TB corpus can never answer exactly without
    shipping every value.

    Two-stage like everything else: per-batch, per-key register arrays
    (each 2^p bytes, ONE row per (key, batch) regardless of row count),
    then a bucketed elementwise-max merge per key. Register max-merge is
    order- and partition-independent, so the estimate is deterministic
    for a given input set. Error ~1.04/sqrt(2^p) (pytest-bounded <5% at
    p=12). Driver holds key-cardinality rows only."""
    from .agg import bucketed_map_groups

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for k, g in batch.groupby(key_col, sort=False):
            rows.append((k, _hll_registers(g[col].tolist(), p).tobytes()))
        return pd.DataFrame(rows, columns=[key_col, "reg"])

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for k, g in bucket.groupby(key_col, sort=False):
            m = np.zeros(1 << p, dtype=np.uint8)
            for blob in g["reg"]:
                m = np.maximum(m, np.frombuffer(blob, dtype=np.uint8))
            rows.append((k, int(round(_hll_estimate(m)))))
        return pd.DataFrame(rows, columns=[key_col, "approx_distinct"]).astype(
            {"approx_distinct": "int64"}
        )

    out = bucketed_map_groups(
        ds.map_batches(partial, batch_format="pandas"),
        key_col,
        merge,
        num_buckets=num_buckets,
        empty_result=pd.DataFrame(
            {
                key_col: pd.Series(dtype="object"),
                "approx_distinct": pd.Series(dtype="int64"),
            }
        ),
    ).to_pandas()
    return out.sort_values(key_col).reset_index(drop=True)
