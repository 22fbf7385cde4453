"""Sampling operators.

- ``hash_sample``: DETERMINISTIC multiplicative-hash sample — keep rows
  where (key * 2654435761) mod 2^32 < fraction * 2^32 (Knuth's golden-ratio
  multiplier). Engine-independent: the same predicate is one line of SQL, so
  sampled pipelines stay oracle-checkable, and a resumed/retried task always
  picks the identical rows (seeded ``Dataset.random_sample`` cannot promise
  that across block re-splits). Non-integer keys (urls — the normal
  web-scale sampling key) are crc32-hashed first; crc32 is equally
  engine-independent, so a SQL twin just applies the same crc32 to the
  key column (DuckDB: via a registered UDF or a precomputed column).
- Ray's ``Dataset.random_sample(fraction, seed=...)`` remains the
  statistical path; its count bounds are pytest-covered.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

KNUTH_MULT = 2654435761  # 2^32 / golden ratio
MOD = 1 << 32


def _key_ints(keys) -> np.ndarray:
    """Integer keys pass through; anything else is crc32(str(key)) — the
    same route ops/agg._bucket_series takes, and reproducible in any
    engine that can evaluate crc32."""
    import zlib

    arr = np.asarray(keys)
    if np.issubdtype(arr.dtype, np.integer):
        return arr.astype(np.uint64)
    if arr.dtype == object:
        # route PER VALUE, never per batch: integer keys that arrive as
        # object dtype (nullable Int64 blocks, post-join upcasts) take the
        # integer route — v % 2^64 is exactly what int64->uint64 astype
        # produces, incl. the negative wrap, and also handles ints >= 2^63
        # without OverflowError — while non-int values in the SAME batch
        # still crc32. A batch-level all()-gate would make a key's hash
        # depend on which rows share its batch, breaking the documented
        # any-partitioning determinism.
        out = np.empty(len(arr), dtype=np.uint64)
        for i, v in enumerate(arr):
            if isinstance(v, (int, np.integer)) and not isinstance(v, bool):
                out[i] = int(v) % (1 << 64)
            else:
                out[i] = zlib.crc32(str(v).encode())
        return out
    return np.asarray(
        [zlib.crc32(str(v).encode()) for v in keys], dtype=np.uint64
    )


def hash_u32(keys) -> np.ndarray:
    """The ONE multiplicative hash every sampling op shares (and every
    SQL twin mirrors as ``((key % 4294967296)::UBIGINT * 2654435761) %
    4294967296``): uint64 array of 32-bit hashes."""
    k = _key_ints(keys) % np.uint64(MOD)
    return (k * np.uint64(KNUTH_MULT)) % np.uint64(MOD)  # < 2^64, no wrap


def hash_sample_mask(keys, fraction: float) -> np.ndarray:
    return hash_u32(keys) < np.uint64(int(fraction * MOD))


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
        k = _key_ints(batch[key_col].to_numpy()) % np.uint64(MOD)
        h = (k * np.uint64(KNUTH_MULT)) % np.uint64(MOD)
        cuts = (
            batch[stratum_col]
            .map(lambda s: int(fractions.get(s, default_fraction) * MOD))
            .to_numpy()
            .astype(np.uint64)
        )
        return batch[h < cuts]

    return ds.map_batches(flt, batch_format="pandas")


def split_cut_ints(boundaries: list) -> list:
    """Cumulative hash cut-points for assign_splits, as exact ints.
    Computed ONCE here and embedded verbatim into any SQL twin, so the
    two engines can never disagree through float-cumsum drift."""
    cuts = []
    cum = 0.0
    for _name, frac in boundaries:
        cum += frac
        cuts.append(min(MOD, int(cum * MOD)))
    cuts[-1] = MOD  # fractions sum to ~1.0; the last band takes the tail
    return cuts


def assign_splits(
    ds: ray.data.Dataset,
    key_col: str,
    boundaries: list | None = None,
) -> ray.data.Dataset:
    """Deterministic train/val/test assignment: adds a ``split`` column
    from the same multiplicative hash the samplers use, so the assignment
    is reproducible on any partitioning / rerun / engine (the canonical
    dataset-split step of a training pipeline; one CASE expression of
    SQL). ``boundaries`` = [(name, fraction), ...] in band order, default
    80/10/10 train/val/test. Pure map, zero shuffles."""
    boundaries = boundaries or [("train", 0.8), ("val", 0.1), ("test", 0.1)]
    names = [n for n, _ in boundaries]
    cuts = np.array(split_cut_ints(boundaries), dtype=np.uint64)

    def asg(batch: pd.DataFrame) -> pd.DataFrame:
        k = _key_ints(batch[key_col].to_numpy()) % np.uint64(MOD)
        h = (k * np.uint64(KNUTH_MULT)) % np.uint64(MOD)
        idx = np.minimum(
            np.searchsorted(cuts, h, side="right"), len(names) - 1
        )
        return batch.assign(split=np.array(names, dtype=object)[idx])

    return ds.map_batches(asg, batch_format="pandas")


def mix_sources(
    ds: ray.data.Dataset,
    key_col: str,
    source_col: str,
    targets: dict,
    counts: dict | None = None,
) -> ray.data.Dataset:
    """Training-data MIXING: deterministically downsample each source to
    ``targets[source]`` rows (approximately — the guarantee is rate, not
    exact count), the way a pretraining pipeline rebalances crawl /
    reference / code shares. Two passes: a grouped count (driver-small:
    one row per source) fixes each source's keep-rate, then the same
    engine-independent multiplicative-hash predicate ``hash_sample``
    uses keeps rows — so the mix is reproducible across engines, retries
    and partitionings, and SQL-twinnable. Rates are INTEGER thresholds
    (target * 2^32 // count) so no float boundary exists. Sources absent
    from ``targets`` are dropped. ``counts`` (a {source: row_count}
    mapping) skips the internal counting pass when the caller already
    has one."""
    from .agg import grouped_agg

    if counts is None:
        cdf = grouped_agg(
            ds, [source_col], {"_cnt": (source_col, "count")}, final="driver"
        )
        counts = dict(zip(cdf[source_col], cdf["_cnt"].astype("int64")))
    thr: dict = {}
    for src, cnt in counts.items():
        tgt = int(targets.get(src, 0))
        thr[src] = min(MOD, (tgt * MOD) // int(cnt)) if cnt > 0 else 0
    import ray

    ref = ray.put(thr)

    def keep(batch: pd.DataFrame) -> pd.DataFrame:
        from .joins import _fetch

        t = _fetch(ref)
        k = _key_ints(batch[key_col]) % np.uint64(MOD)
        h = (k * np.uint64(KNUTH_MULT)) % np.uint64(MOD)
        cut = batch[source_col].map(t).fillna(0).astype("uint64").to_numpy()
        return batch[h < cut]

    return ds.map_batches(keep, batch_format="pandas")


def temperature_targets(counts: dict, budget: int) -> dict:
    """Temperature-smoothed per-source sampling targets at alpha = 1/2 —
    the multilingual/multi-source rebalancing rule (sample source i with
    probability proportional to n_i^alpha) used by multilingual LM data
    pipelines to up-weight small sources. All-integer so ``mix_sources``
    keeps its bit-reproducible / SQL-twinnable guarantee:

        w_i      = isqrt(n_i)                      (n_i^0.5, exact)
        target_i = min(n_i, w_i * budget // sum_w)

    Only alpha = 1/2 is offered because it is the one exponent with an
    exact integer form on both engines: DuckDB's
    ``FLOOR(SQRT(n::DOUBLE))::BIGINT`` equals ``math.isqrt(n)`` for
    n < ~10^12 (the float-sqrt error is orders of magnitude below the
    distance from sqrt(n) to the next integer at these magnitudes; the
    corpus-per-source counts this sees are far below the bound). Other
    exponents would need rational-power integer arithmetic that no SQL
    twin can mirror exactly.
    """
    import math

    w = {s: math.isqrt(int(c)) for s, c in counts.items()}
    sw = sum(w.values())
    if sw == 0:
        return {s: 0 for s in counts}
    return {s: min(int(counts[s]), (w[s] * int(budget)) // sw) for s in counts}


def weighted_hash_sample(
    ds: ray.data.Dataset,
    key_col: str,
    weight_col: str,
    *,
    max_weight: int,
) -> ray.data.Dataset:
    """Deterministic IMPORTANCE sampling: keep a row with probability
    ``weight / max_weight`` (integer weights; rows at/above ``max_weight``
    always survive) via the same multiplicative hash as ``hash_sample`` —
    the per-row threshold ``(w * 2^32) // max_weight`` is integer floor
    division, so the predicate is bit-reproducible in SQL and across any
    partitioning. Zero shuffle.

    Contract: ``0 <= weight`` and ``0 < max_weight < 2^32`` — weights are
    clamped to ``max_weight`` before the threshold (same kept-set as the
    unclamped SQL twin, since any thr >= 2^32 keeps everything), and
    negative weights raise instead of uint64-wrapping to always-keep."""
    if not 0 < max_weight < MOD:
        raise ValueError(
            f"max_weight must be in (0, 2^32), got {max_weight} — the "
            "integer threshold (w * 2^32) // max_weight must not wrap"
        )

    def flt(batch: pd.DataFrame) -> pd.DataFrame:
        h = hash_u32(batch[key_col].to_numpy())
        w = batch[weight_col].to_numpy().astype(np.int64)
        if (w < 0).any():
            raise ValueError(
                "weighted_hash_sample: negative weight — weights are keep "
                "probabilities and must be >= 0"
            )
        w = np.minimum(w, max_weight).astype(np.uint64)
        thr = (w * np.uint64(MOD)) // np.uint64(max_weight)
        return batch[h < thr]

    return ds.map_batches(flt, batch_format="pandas")


def cap_per_key(
    ds: ray.data.Dataset,
    key_col: str,
    k: int,
    *,
    id_col: str,
    num_buckets: int = 64,
    empty_result: pd.DataFrame | None = None,
) -> ray.data.Dataset:
    """Keep at most ``k`` rows per key, chosen DETERMINISTICALLY (by the
    multiplicative hash of ``id_col``, then ``id_col`` — i.e. a uniform
    k-subsample per key, not "first k seen"). The docs-per-domain cap
    every web-crawl pipeline applies before training.

    Two-level like latest_by_key: every batch pre-shrinks to its own k
    smallest per key BEFORE the one bucket shuffle (a domain with a
    billion pages ships k rows per block, never the domain), then the
    bucketed pass re-selects the global k.

    ``empty_result`` types the empty sort-range blocks the bucket shuffle
    can emit (see bucketed_map_groups); when omitted it is derived from
    the dataset's Arrow schema where available."""
    from .agg import bucketed_map_groups

    if empty_result is None:
        try:
            import pyarrow as pa

            base = getattr(ds.schema(), "base_schema", None)
            if isinstance(base, pa.Schema):
                empty_result = base.empty_table().to_pandas()
        except Exception:
            empty_result = None  # fall back to untyped empties

    def select_k(frame: pd.DataFrame) -> pd.DataFrame:
        h = hash_u32(frame[id_col].to_numpy()).astype("int64")
        srt = frame.assign(_h=h).sort_values(
            [key_col, "_h", id_col], kind="mergesort"
        )
        return (
            srt.groupby(key_col, sort=False)
            .head(k)
            .drop(columns=["_h"])
            .reset_index(drop=True)
        )

    pre = ds.map_batches(select_k, batch_format="pandas")
    return bucketed_map_groups(
        pre, key_col, select_k, num_buckets=num_buckets, empty_result=empty_result
    )


def epoch_shuffle_head(
    ds: ray.data.Dataset,
    id_col: str,
    *,
    epochs: int,
    k: int,
) -> pd.DataFrame:
    """Reproducible per-epoch training order: each epoch e induces a
    GLOBAL pseudo-random permutation of the corpus by the sort key
    ``md5_number_lower(f"{e}:{id}")`` (id tiebreak) — the standard
    seeded-epoch-shuffle a trainer needs to be restartable: any worker
    can recompute any row's key without coordination, and a resumed run
    reproduces the exact order of the crashed one. Returns the first
    ``k`` rows of every epoch's order as (epoch, pos, id).

    Scale shape: NO shuffle and ONE scan — each block emits its local
    top-k candidates for EVERY epoch (<= epochs x k rows per block reach
    the driver), the driver finalizes per epoch. Materializing a FULL
    epoch order would be one range-partitioned sort on the same key; the
    head is what a resume/inspection surface actually reads."""
    from .agg import to_pandas_safe
    from .textstats import _h64  # the repo-wide md5-low64 convention

    def candidates(b: pd.DataFrame) -> pd.DataFrame:
        ids = b[id_col].to_numpy()
        frames = []
        for e in range(epochs):
            keys = np.fromiter(
                (_h64(f"{e}:{i}".encode()) for i in ids),
                dtype=np.uint64,
                count=len(ids),
            )
            # the key is uint64 but pandas sorts the int64 view SIGNED:
            # flip the sign bit so the wrapped negative range orders last
            f = pd.DataFrame(
                {
                    "epoch": np.int64(e),
                    "_ord": (keys ^ np.uint64(1 << 63)).view(np.int64),
                    id_col: ids,
                }
            )
            frames.append(
                f.sort_values(["_ord", id_col], kind="mergesort").head(k)
            )
        return pd.concat(frames, ignore_index=True)

    empty = pd.DataFrame(
        {
            "epoch": pd.Series(dtype="int64"),
            "_ord": pd.Series(dtype="int64"),
            id_col: pd.Series(dtype="int64"),
        }
    )
    cand = to_pandas_safe(ds.map_batches(candidates, batch_format="pandas"), empty)
    out = (
        cand.sort_values(["epoch", "_ord", id_col], kind="mergesort")
        .groupby("epoch", sort=True)
        .head(k)
        .drop(columns=["_ord"])
        .reset_index(drop=True)
    )
    out.insert(1, "pos", out.groupby("epoch", sort=False).cumcount() + 1)
    return out.astype({"epoch": "int64", "pos": "int64", id_col: "int64"})[
        ["epoch", "pos", id_col]
    ]
