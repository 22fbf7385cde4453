"""Sampling operators.

- ``hash_sample``: DETERMINISTIC multiplicative-hash sample — keep rows
  where (key * 2654435761) mod 2^32 < fraction * 2^32 (Knuth's golden-ratio
  multiplier). Engine-independent: the same predicate is one line of SQL, so
  sampled pipelines stay oracle-checkable, and a resumed/retried task always
  picks the identical rows (seeded ``Dataset.random_sample`` cannot promise
  that across block re-splits).
- Ray's ``Dataset.random_sample(fraction, seed=...)`` remains the
  statistical path; its count bounds are pytest-covered.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

KNUTH_MULT = 2654435761  # 2^32 / golden ratio
MOD = 1 << 32


def hash_sample_mask(keys: np.ndarray, fraction: float) -> np.ndarray:
    k = keys.astype(np.uint64) % np.uint64(MOD)
    h = (k * np.uint64(KNUTH_MULT)) % np.uint64(MOD)  # < 2^64, no wrap
    return h < np.uint64(int(fraction * MOD))


def hash_sample(
    ds: ray.data.Dataset, key_col: str, fraction: float
) -> ray.data.Dataset:
    def flt(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[hash_sample_mask(batch[key_col].to_numpy(), fraction)]

    return ds.map_batches(flt, batch_format="pandas")


def stratified_hash_sample(
    ds: ray.data.Dataset,
    key_col: str,
    stratum_col: str,
    fractions: dict,
    *,
    default_fraction: float = 0.0,
) -> ray.data.Dataset:
    """Deterministic STRATIFIED sample: per-stratum keep fractions over the
    same multiplicative-hash predicate (class-balancing / downsampling the
    head class in a training set, reproducibly — the same rows survive a
    retry or a rerun on any partitioning, and the predicate is one CASE
    expression of SQL, so stratified pipelines stay oracle-checkable)."""

    def flt(batch: pd.DataFrame) -> pd.DataFrame:
        k = batch[key_col].to_numpy().astype(np.uint64) % np.uint64(MOD)
        h = (k * np.uint64(KNUTH_MULT)) % np.uint64(MOD)
        cuts = (
            batch[stratum_col]
            .map(lambda s: int(fractions.get(s, default_fraction) * MOD))
            .to_numpy()
            .astype(np.uint64)
        )
        return batch[h < cuts]

    return ds.map_batches(flt, batch_format="pandas")
