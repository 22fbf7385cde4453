"""Distributed Lloyd k-means over an embedding column — the E-step is a
broadcast-centroid ``map_batches`` (int64 matmul-free distance via the
expanded square), the M-step a grouped integer sum; only the K×D centroid
table ever lands on the driver, so the loop is the same
driver-holds-a-summary shape as the PageRank driver path.

Everything is FIXED-POINT integer arithmetic so the result is
summation-order independent and therefore bit-identical in any engine —
the same trick that gave PageRank and tf-idf hash-exact DuckDB twins:

- quantize: ``v = floor(float64(x) * scale) + offset`` with ``offset``
  chosen so every value is non-negative (DuckDB's ``//`` truncates toward
  zero while numpy floors; on non-negative operands they agree).
- distances: exact int64 squared euclidean (offset cancels in x - c).
- new centroids: elementwise ``sum // count`` on non-negative sums.

An empty cluster raises (deterministically mirroring "keep the old
centroid" across engines is not worth the rule's complexity; callers pick
an init — e.g. per-label means — that keeps clusters populated).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data

from .joins import _fetch

SCALE = 1_000_000
OFFSET = 1_000_000  # embeddings are unit-ish; assert covers the contract


def _quantize(col) -> np.ndarray:
    """Accepts a column of vectors OR an already-stacked (n, d) float64
    matrix (so callers that need the raw floats too convert only once)."""
    if isinstance(col, np.ndarray) and col.ndim == 2:
        m = col
    else:
        m = np.stack([np.asarray(v, dtype=np.float64) for v in col])
    if np.abs(m).max() > 1.0:
        raise ValueError(
            "kmeans_int expects components in [-1, 1] (unit-normalized "
            "embeddings); rescale or raise OFFSET"
        )
    return (np.floor(m * SCALE) + OFFSET).astype(np.int64)


def assign_nearest(x: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """THE assignment rule every consumer must share (kmeans_int's E-step
    and ivf_topk_int's inverted-list build both call this, so the two
    oracles can't drift): exact int64 squared euclidean via the expanded
    square (||x||^2 + ||c||^2 - 2 x.c, all < 2^62 for d=64, |v| <= 2e6),
    argmin ties -> lowest cluster id (numpy argmin first-minimum rule ==
    the SQL twins' ROW_NUMBER ... ORDER BY dist, cid)."""
    d2 = (
        (x * x).sum(axis=1)[:, None]
        + (cents * cents).sum(axis=1)[None, :]
        - 2 * (x @ cents.T)
    )
    return d2.argmin(axis=1)


def label_init_centroids(
    ds: ray.data.Dataset, *, vec_col: str = "embedding", label_col: str = "label"
) -> np.ndarray:
    """Deterministic init: the integer floor-div mean of each label's
    quantized vectors, ordered by label. Distributed partial sums; the
    driver holds K×(D+1) ints."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        q = _quantize(batch[vec_col])
        df = pd.DataFrame(q, columns=[f"s{i}" for i in range(q.shape[1])])
        df["_n"] = np.int64(1)
        df["_lbl"] = batch[label_col].to_numpy()
        return df.groupby("_lbl", as_index=False).sum()

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    tot = parts.groupby("_lbl").sum().sort_index()
    n = tot.pop("_n").to_numpy()[:, None]
    cols = sorted((c for c in tot.columns), key=lambda s: int(s[1:]))
    return (tot[cols].to_numpy() // n).astype(np.int64)


def kmeans_int(
    ds: ray.data.Dataset,
    init_centroids: np.ndarray,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    iters: int = 2,
) -> tuple[pd.DataFrame, np.ndarray]:
    """Run ``iters`` Lloyd steps from ``init_centroids`` (K×D int64 in the
    quantized/offset domain). Returns (per-cluster summary DataFrame with
    ``cluster``, ``n_points``, ``centroid_checksum``, and the final
    centroid matrix). Ties go to the lowest cluster id."""
    if iters < 1:
        raise ValueError("iters must be >= 1 (the summary reports the last E-step)")
    cents = np.asarray(init_centroids, dtype=np.int64)
    k, d = cents.shape

    for _ in range(iters):
        ref = ray.put(cents)

        def estep(batch: pd.DataFrame) -> pd.DataFrame:
            c = _fetch(ref)
            x = _quantize(batch[vec_col])
            assign = assign_nearest(x, c)
            sums = pd.DataFrame(x, columns=[f"s{i}" for i in range(x.shape[1])])
            sums["_n"] = np.int64(1)
            sums["_cid"] = assign
            return sums.groupby("_cid", as_index=False).sum()

        parts = ds.map_batches(estep, batch_format="pandas").to_pandas()
        tot = parts.groupby("_cid").sum().sort_index()
        if len(tot) < k:
            missing = sorted(set(range(k)) - set(tot.index))
            raise ValueError(f"empty k-means cluster(s) {missing}; pick a denser init")
        n = tot.pop("_n").to_numpy()[:, None]
        cols = sorted((c for c in tot.columns), key=lambda s: int(s[1:]))
        cents = (tot[cols].to_numpy() // n).astype(np.int64)

    summary = pd.DataFrame(
        {
            "cluster": np.arange(k, dtype=np.int64),
            "n_points": n[:, 0].astype(np.int64),
            "centroid_checksum": cents.sum(axis=1).astype(np.int64),
        }
    )
    return summary, cents
