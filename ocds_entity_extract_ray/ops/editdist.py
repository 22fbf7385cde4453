"""Edit-distance (Levenshtein) similarity join over a string column — the
fuzzy-name entity-linking primitive (north_star: "deterministic
name-normalization + fuzzy-dedup rules"): find all pairs of distinct
values within a small edit distance, exactly.

Blocking is by LENGTH, which is lossless for Levenshtein (dist(a, b) >=
|len(a) - len(b)|): each value replicates into the length buckets
[len - max_d, len], and an unordered pair is evaluated in exactly ONE
bucket — min(len_a, len_b) — so no dedup pass is needed. Shuffle volume
is (max_d + 1) rows per distinct value; the per-bucket work is the
candidate cross product within a length class, so the operator assumes no
single length class is corpus-sized (names cluster by length but are a
DISTINCT domain, orders below the corpus; add a first-letter or q-gram
block to the key for degenerate domains)."""

from __future__ import annotations

import pandas as pd
import ray.data

from .agg import bucketed_map_groups


def levenshtein_capped(a: str, b: str, max_d: int) -> int:
    """Banded Levenshtein DP: O(len(a) * max_d) cells, returns max_d + 1
    as soon as the distance provably exceeds max_d."""
    la, lb = len(a), len(b)
    if abs(la - lb) > max_d:
        return max_d + 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    prev = list(range(la + 1))
    for j in range(1, lb + 1):
        cj = b[j - 1]
        cur = [j] + [0] * la
        lo, hi = max(1, j - max_d), min(la, j + max_d)
        if lo > 1:
            cur[lo - 1] = max_d + 1
        best = cur[lo - 1] if lo > 1 else j
        for i in range(lo, hi + 1):
            cur[i] = min(
                prev[i] + 1,
                cur[i - 1] + 1,
                prev[i - 1] + (a[i - 1] != cj),
            )
            if cur[i] < best:
                best = cur[i]
        if hi < la:
            cur[hi + 1 :] = [max_d + 1] * (la - hi)
        if best > max_d:
            return max_d + 1
        prev = cur
    return prev[la]


def edit_distance_pairs(
    ds: ray.data.Dataset,
    col: str,
    *,
    max_d: int = 1,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """(name_a, name_b, dist) for every unordered pair of DISTINCT values
    of ``col`` with Levenshtein distance <= max_d (name_a < name_b).

    Stages: per-batch distinct -> bucketed global distinct -> length-block
    replication (each value to length buckets [len-max_d, len]) -> one
    shuffle on the block key -> per-bucket candidate cross product with
    the banded DP (early-abandoned at max_d)."""

    empty_n = pd.DataFrame({col: pd.Series(dtype="object")})
    distinct = bucketed_map_groups(
        ds.map_batches(
            lambda b: b[[col]].drop_duplicates(), batch_format="pandas"
        ),
        col,
        lambda b: b.drop_duplicates([col]),
        num_buckets=num_buckets,
        empty_result=empty_n,
    )

    def replicate(b: pd.DataFrame) -> pd.DataFrame:
        names = b[col].astype(str)
        lens = names.str.len().to_numpy()
        parts = []
        for d in range(max_d + 1):
            parts.append(
                pd.DataFrame(
                    {"blen": lens - d, "name": names.to_numpy(), "nlen": lens}
                )
            )
        out = pd.concat(parts, ignore_index=True)
        out = out[out["blen"] >= 0]
        return out.astype({"blen": "int64", "nlen": "int64"})

    blocked = distinct.map_batches(replicate, batch_format="pandas")

    def per_block(bucket: pd.DataFrame) -> pd.DataFrame:
        rows_a, rows_b, dists = [], [], []
        for blen, grp in bucket.groupby("blen", sort=False):
            vals = list(zip(grp["name"], grp["nlen"]))
            n = len(vals)
            for i in range(n):
                na, la = vals[i]
                for j in range(i + 1, n):
                    nb, lb = vals[j]
                    if na == nb:
                        continue
                    # evaluate each unordered pair exactly once: in the
                    # bucket equal to the SHORTER length
                    if min(la, lb) != blen:
                        continue
                    d = levenshtein_capped(na, nb, max_d)
                    if d <= max_d:
                        x, y = (na, nb) if na < nb else (nb, na)
                        rows_a.append(x)
                        rows_b.append(y)
                        dists.append(d)
        return pd.DataFrame(
            {
                "name_a": pd.Series(rows_a, dtype="object"),
                "name_b": pd.Series(rows_b, dtype="object"),
                "dist": pd.Series(dists, dtype="int64"),
            }
        )

    empty_p = pd.DataFrame(
        {
            "name_a": pd.Series(dtype="object"),
            "name_b": pd.Series(dtype="object"),
            "dist": pd.Series(dtype="int64"),
        }
    )
    return bucketed_map_groups(
        blocked, "blen", per_block, num_buckets=num_buckets, empty_result=empty_p
    )
