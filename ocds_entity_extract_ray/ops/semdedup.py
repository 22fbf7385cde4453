"""SemDeDup-style semantic deduplication: cluster embeddings with the
fixed-point k-means (``ops.kmeans``), then prune near-duplicates INSIDE
each cluster by pairwise cosine similarity — the clustering is exactly
what makes the quadratic step tractable at scale (pairwise work is
``O(sum of cluster_size^2)``, and the caller sizes K so clusters stay
small; a ``max_cluster_size`` guard raises instead of silently going
quadratic). Pattern from Abbas et al., "SemDeDup: Data-efficient
learning at web-scale through semantic deduplication" (public paper).

Everything is integer arithmetic so the result has a hash-exact DuckDB
twin (the same discipline as ``ops.kmeans`` / PageRank):

- cluster assignment reuses the kmeans quantization (scale 1e6 +
  offset; exact int64 squared euclidean, argmin ties to lowest cid);
- the cosine test quantizes the RAW floats separately at scale 1e3
  with NO offset (cosine needs true signed values) and compares
  cross-multiplied integers instead of dividing:

      cos(a, b) > tau   with   tau^2 = tau2_num / tau2_den
  <=>  dot > 0  AND  tau2_den * dot^2 > tau2_num * |a|^2 * |b|^2

  With |component| <= 1000 the extremes are dot <= d*1e6, so the
  int64 bound is DIMENSION-dependent: tau2_den * d^2 <= ~9.22e6
  (d = 64 admits tau2_den up to 2251) — validated at runtime against
  the actual embedding dimension, never assumed.

Drop rule (deterministic, order-free): a vector is DROPPED iff some
lower-id vector in the SAME cluster is tau-similar to it — ids give the
keep order, so the survivor set is unique regardless of execution
order. (This is intentionally non-transitive: b dropped by a does not
shield c; the SQL twin uses the identical EXISTS predicate.)

Shuffle accounting for 100 TB: the k-means loop moves only K×(D+1)
integer partial sums per batch; the pairwise stage shuffles one
(id, cluster, 8·D bytes) row per vector — vectors ship as raw int64
bytes, never as Python lists — bucketed by cluster id.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data

from .agg import bucketed_map_groups
from .joins import _fetch
from .kmeans import kmeans_int

COS_SCALE = 1_000  # signed quantization for the cosine test (see module doc)
# peak int64 cells per pairwise chunk (dot + its two temporaries each hold
# this many): 32M cells ~ 256 MB per array, bounded regardless of cluster size
PAIR_CELL_BUDGET = 32_000_000


def semantic_dedup(
    ds: ray.data.Dataset,
    init_centroids: np.ndarray,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    iters: int = 2,
    tau2_num: int = 1,
    tau2_den: int = 5,
    max_cluster_size: int = 100_000,
    num_buckets: int = 32,
    pair_cell_budget: int = PAIR_CELL_BUDGET,
) -> ray.data.Dataset:
    """Return a Dataset of ``(id_col, cluster, kept)`` — one row per input
    vector, ``kept=False`` for semantic near-duplicates of a lower-id
    vector in the same k-means cluster. ``tau2_num/tau2_den`` is the
    SQUARED cosine threshold as an exact integer ratio."""
    if not (0 < tau2_num <= tau2_den):
        raise ValueError("need 0 < tau2_num <= tau2_den (int64 headroom)")
    _summary, cents = kmeans_int(ds, init_centroids, vec_col=vec_col, id_col=id_col, iters=iters)
    ref = ray.put(cents)
    d = cents.shape[1]
    # int64 headroom is DIMENSION-dependent: |component| <= COS_SCALE so
    # dot <= d*COS_SCALE^2 and tau2_den*dot^2 <= tau2_den*d^2*1e12 must
    # stay under 2^63-1 (same bound covers tau2_num*|a|^2*|b|^2 since
    # tau2_num <= tau2_den) — silently wrapping would flip verdicts
    if tau2_den * d * d > 9_223_000:
        raise ValueError(
            f"tau2_den={tau2_den} with d={d} overflows int64 in the cosine "
            f"test (need tau2_den * d^2 <= 9.223e6, e.g. d=64 -> "
            "tau2_den <= 2251); reduce the ratio's denominator"
        )

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        c = _fetch(ref)
        x = np.stack([np.asarray(v, dtype=np.float64) for v in batch[vec_col]])
        # final E-step in the kmeans domain (scale 1e6 + offset);
        # _quantize accepts the stacked matrix so x converts only once
        from .kmeans import _quantize

        q6 = _quantize(x)
        d2 = (
            (q6 * q6).sum(axis=1)[:, None]
            + (c * c).sum(axis=1)[None, :]
            - 2 * (q6 @ c.T)
        )
        cluster = d2.argmin(axis=1).astype(np.int64)
        # signed small-scale quantization for the cosine test
        q3 = np.floor(x * COS_SCALE).astype(np.int64)
        return pd.DataFrame(
            {
                id_col: batch[id_col].to_numpy(),
                "cluster": cluster,
                "_qv": [row.tobytes() for row in q3],
            }
        )

    assigned = ds.map_batches(assign, batch_format="pandas")

    def prune_bucket(block: pd.DataFrame) -> pd.DataFrame:
        out = []
        for cid, g in block.groupby("cluster", sort=False):
            if len(g) > max_cluster_size:
                raise ValueError(
                    f"cluster {cid} has {len(g)} vectors > max_cluster_size="
                    f"{max_cluster_size}; raise K (more clusters) or the cap"
                )
            g = g.sort_values(id_col, kind="mergesort")
            n_g = len(g)
            q = np.frombuffer(b"".join(g["_qv"]), dtype=np.int64).reshape(n_g, d)
            nn = np.einsum("ij,ij->i", q, q)
            # chunk the pairwise test so peak memory is O(chunk * n), not
            # O(n^2) — at the max_cluster_size cap a dense n x n int64
            # matrix (plus its dot*dot / outer temporaries) would be tens
            # of GB; row 0 can never be dropped, rows j >= 1 compare
            # against all lower-id rows i < j
            dropped = np.zeros(n_g, dtype=bool)
            chunk = max(1, min(n_g, pair_cell_budget // max(1, n_g)))
            for j0 in range(1, n_g, chunk):
                j1 = min(j0 + chunk, n_g)
                dot = q[j0:j1] @ q[:j1].T  # (j1-j0, j1)
                lower = np.arange(j1)[None, :] < np.arange(j0, j1)[:, None]
                sim = (
                    (dot > 0)
                    & (tau2_den * dot * dot > tau2_num * np.outer(nn[j0:j1], nn[:j1]))
                    & lower
                )
                dropped[j0:j1] = sim.any(axis=1)
            out.append(
                pd.DataFrame(
                    {
                        id_col: g[id_col].to_numpy(),
                        "cluster": np.full(len(g), cid, dtype=np.int64),
                        "kept": ~dropped,
                    }
                )
            )
        return pd.concat(out, ignore_index=True)

    empty = pd.DataFrame(
        {
            id_col: pd.Series([], dtype=np.int64),
            "cluster": pd.Series([], dtype=np.int64),
            "kept": pd.Series([], dtype=bool),
        }
    )
    return bucketed_map_groups(
        assigned, "cluster", prune_bucket, num_buckets=num_buckets, empty_result=empty
    )
