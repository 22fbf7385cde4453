"""Similarity search over an embedding column (list<float>).

- ``cosine_topk``: brute-force baseline — per-batch numpy matmul against a
  broadcast query matrix (ray.put once, fetched once per worker), partial
  top-k per batch, merged tiny at the driver. Streams the corpus.
- ``lsh_bucketed_topk``: the scale path — random-hyperplane LSH buckets;
  only the query's bucket (and neighbors) are scanned.
- ``embedding_near_dup_pairs``: cosine near-dup over all pairs within LSH
  buckets (embedding-based near-dup from the training-data checklist).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data

from .joins import _fetch


def _round6(x):
    """Half-away-from-zero at 6 decimals (DuckDB ROUND convention)."""
    return np.sign(x) * np.floor(np.abs(x) * 1e6 + 0.5) / 1e6


def _to_matrix(series) -> np.ndarray:
    return np.asarray([np.asarray(v, dtype=np.float64) for v in series])


def cosine_topk(
    ds: ray.data.Dataset,
    query: np.ndarray,
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_ids: set | None = None,
) -> pd.DataFrame:
    """Top-k by cosine similarity to ``query``. Per-batch partial top-k
    keeps the shuffle at k rows per block."""
    q = np.asarray(query, dtype=np.float64)
    qn = q / np.linalg.norm(q)
    ref = ray.put((qn, frozenset(exclude_ids or ())))

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        qv, excl = _fetch(ref)
        m = _to_matrix(batch[vec_col])
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        s = (m @ qv) / norms
        out = pd.DataFrame({id_col: batch[id_col].to_numpy(), "score": s})
        if excl:
            out = out[~out[id_col].isin(excl)]
        # deterministic tie-break (score desc, id asc) so ties straddling
        # the per-block cut can't flip with block arrival order
        return out.sort_values(["score", id_col], ascending=[False, True]).head(k)

    partials = ds.map_batches(score, batch_format="pandas")
    # merged candidate set is tiny (k per block)
    pdf = partials.to_pandas()
    if not len(pdf):
        return pd.DataFrame({id_col: pd.Series(dtype="int64"), "score": pd.Series(dtype="float64")})
    result = pdf.sort_values(["score", id_col], ascending=[False, True]).head(k)
    result["score"] = _round6(result["score"])
    return (
        result.sort_values(["score", id_col], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 11) -> np.ndarray:
    return np.random.RandomState(seed).randn(n_planes, dim)


def lsh_bucket_of(vec: np.ndarray, planes: np.ndarray) -> int:
    bits = (planes @ np.asarray(vec, dtype=np.float64)) > 0
    return int(sum(1 << i for i, b in enumerate(bits) if b))


def lsh_bucketed_topk(
    ds: ray.data.Dataset,
    query: np.ndarray,
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 4,
    dim: int | None = None,
) -> pd.DataFrame:
    """Approximate top-k: scan only rows whose LSH bucket is within Hamming
    distance 1 of the query's bucket (recall/speed trade controlled by
    n_planes). At cluster scale the corpus would be PRE-partitioned by
    bucket so non-matching partitions are pruned at the read."""
    q = np.asarray(query, dtype=np.float64)
    planes = _hyperplanes(dim or q.shape[0], n_planes)
    qb = lsh_bucket_of(q, planes)
    near = {qb} | {qb ^ (1 << i) for i in range(n_planes)}
    ref = ray.put((planes, frozenset(near)))

    def flt(batch: pd.DataFrame) -> pd.DataFrame:
        pl, nb = _fetch(ref)
        m = _to_matrix(batch[vec_col])
        bits = (m @ pl.T) > 0
        buckets = bits @ (1 << np.arange(pl.shape[0]))
        return batch[pd.Series(buckets, index=batch.index).isin(nb)]

    return cosine_topk(
        ds.map_batches(flt, batch_format="pandas"), q, k, id_col=id_col, vec_col=vec_col
    )


def _kmeans_fit(sample: np.ndarray, n_centroids: int, seed: int = 13, iters: int = 10) -> np.ndarray:
    """Deterministic k-means (seeded init, fixed iterations) for the IVF
    coarse quantizer — trained driver-side on a small sample."""
    rng = np.random.RandomState(seed)
    cents = sample[rng.choice(len(sample), size=min(n_centroids, len(sample)), replace=False)].copy()
    for _ in range(iters):
        d = ((sample[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(cents)):
            mask = assign == c
            if mask.any():
                cents[c] = sample[mask].mean(axis=0)
    return cents


def ivf_topk(
    ds: ray.data.Dataset,
    query: np.ndarray,
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    nprobe: int = 4,
    train_sample: int = 2048,
    seed: int = 13,
) -> pd.DataFrame:
    """IVF approximate top-k: deterministic k-means coarse quantizer trained
    on a driver-side sample; only vectors whose nearest centroid is among
    the query's ``nprobe`` closest are scanned. At cluster scale the corpus
    would be PRE-partitioned by centroid id so non-probed partitions are
    pruned at the read (the IVF scale path, complementing the LSH one)."""
    sample_df = ds.limit(train_sample).to_pandas()
    sample = _to_matrix(sample_df[vec_col])
    cents = _kmeans_fit(sample, n_centroids, seed)

    q = np.asarray(query, dtype=np.float64)
    qd = ((cents - q[None, :]) ** 2).sum(axis=1)
    probed = frozenset(np.argsort(qd)[:nprobe].tolist())
    ref = ray.put((cents, probed))

    def flt(batch: pd.DataFrame) -> pd.DataFrame:
        cs, pr = _fetch(ref)
        m = _to_matrix(batch[vec_col])
        d = ((m[:, None, :] - cs[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        return batch[pd.Series(assign, index=batch.index).isin(pr)]

    return cosine_topk(
        ds.map_batches(flt, batch_format="pandas"), q, k, id_col=id_col, vec_col=vec_col
    )


def ivf_topk_int(
    ds: ray.data.Dataset,
    query: np.ndarray,
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    nprobe: int = 3,
    iters: int = 2,
    exclude_ids: set | None = None,
) -> pd.DataFrame:
    """IVF top-k with a HASH-EXACT oracle: the coarse quantizer is the
    fixed-point integer k-means (``ops/kmeans.py``), the inverted lists are
    one final assignment pass against its centroids, and the score is the
    signed integer dot product of the floor-quantized vectors (inner-product
    / MIPS regime, faiss ``IndexIVFFlat(METRIC_INNER_PRODUCT)`` shape).
    Every step is int64 and order-independent, so the whole ANN pipeline —
    train -> probe -> prune -> rank — is bit-identical to a DuckDB twin
    (``Q_ANN_IVF_SQL``), unlike the float ``ivf_topk`` above which is
    verified by recall tests only.

    Scale shape: training is ``kmeans_int``'s broadcast E-step (only the
    K×D centroid table lands on the driver); the search is ONE map-only
    scan — assign, prune to the ``nprobe`` probed lists, score, per-batch
    top-k — so k rows per block reach the driver and nothing shuffles. At
    100 TB the corpus would be PRE-partitioned by cid so non-probed
    partitions are pruned at the read.
    """
    from .kmeans import OFFSET, SCALE, _quantize, kmeans_int, label_init_centroids

    init = label_init_centroids(ds, vec_col=vec_col, label_col=label_col)
    _summary, cents = kmeans_int(ds, init, vec_col=vec_col, id_col=id_col, iters=iters)

    q = np.asarray(query, dtype=np.float64)
    xq = (np.floor(q * SCALE) + OFFSET).astype(np.int64)
    qdist = ((cents - xq[None, :]) ** 2).sum(axis=1)
    # ties -> lowest cid: stable sort on dist keeps index order within ties
    probed = np.sort(np.argsort(qdist, kind="stable")[:nprobe]).astype(np.int64)
    sq = xq - OFFSET  # signed quantized query, for the integer dot score
    ref = ray.put((cents, probed, sq, frozenset(exclude_ids or ())))

    def search(batch: pd.DataFrame) -> pd.DataFrame:
        from .kmeans import assign_nearest

        cs, pr, qv, excl = _fetch(ref)
        x = _quantize(batch[vec_col])
        assign = assign_nearest(x, cs)  # THE shared rule (ties -> lowest cid)
        keep = np.isin(assign, pr)
        out = pd.DataFrame(
            {
                id_col: batch[id_col].to_numpy()[keep],
                "cluster": assign[keep].astype(np.int64),
                "score": (x[keep] - OFFSET) @ qv,
            }
        )
        if excl:
            out = out[~out[id_col].isin(excl)]
        return out.sort_values(["score", id_col], ascending=[False, True]).head(k)

    pdf = ds.map_batches(search, batch_format="pandas").to_pandas()
    if not len(pdf):
        return pd.DataFrame(
            {
                id_col: pd.Series(dtype="int64"),
                "cluster": pd.Series(dtype="int64"),
                "score": pd.Series(dtype="int64"),
            }
        )
    out = (
        pdf.sort_values(["score", id_col], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
    return out.astype({id_col: "int64", "cluster": "int64", "score": "int64"})


def embedding_near_dup_pairs(
    ds: ray.data.Dataset,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    n_planes: int = 0,
    n_tables: int = 8,
    max_group_size: int | None = None,
    verify_partitions: int = 4,
    broadcast_max_candidates: int = 10_000,
    driver_pair_limit: int | None = None,
) -> ray.data.Dataset:
    """All pairs with cosine >= threshold.

    n_planes=0: exact quadratic compare within one global group — TEST
    SCALE ONLY (single-task O(n^2); it is the conformance/oracle mode).

    n_planes>0: the scale path, same shape as ``dedup.minhash_lsh_pairs``:
    ``n_tables`` independent random-hyperplane tables, each hashing a
    vector to an ``n_planes``-bit bucket. The shuffle carries only
    (table, bucket, id) rows — vectors never ride along; candidate id
    pairs from any shared (table, bucket) are deduped, capped per group,
    then vectors are re-joined BY ID for the exact cosine verify (no false
    positives; recall ~ 1-(1-(1-θ/π)^n_planes)^n_tables).

    Driver state mirrors ``dedup.minhash_lsh_pairs``: below
    ``driver_pair_limit`` the deduped pairs are collected once for an
    exact id filter (and a {id: vec} broadcast when also under
    ``broadcast_max_candidates``); above it the candidate-id filter is a
    fixed-size Bloom sketch and the pairs stay a Dataset end to end."""
    from .dedup import DEFAULT_MAX_GROUP_SIZE, _cap_group
    from .agg import bucketed_map_groups

    if max_group_size is None:
        max_group_size = DEFAULT_MAX_GROUP_SIZE

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = group[id_col].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        m = _to_matrix(group[vec_col])[order]
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        mn = m / norms[:, None]
        sims = mn @ mn.T
        ia, ib = np.where(np.triu(sims >= threshold, k=1))
        return pd.DataFrame(
            {
                "id_a": ids[ia].astype("int64"),
                "id_b": ids[ib].astype("int64"),
                "score": _round6(sims[ia, ib]),
            }
        )

    if not n_planes:
        bucketize = lambda batch: pd.DataFrame(  # noqa: E731
            {
                "bucket": np.zeros(len(batch), dtype=np.int64),
                id_col: batch[id_col].to_numpy(),
                vec_col: batch[vec_col],
            }
        )
        return (
            ds.map_batches(bucketize, batch_format="pandas")
            .groupby("bucket")
            .map_groups(pairs, batch_format="pandas")
        )

    def to_tables(batch: pd.DataFrame) -> pd.DataFrame:
        m = _to_matrix(batch[vec_col])
        ids = batch[id_col].to_numpy()
        parts = []
        for t in range(n_tables):
            # planes derived deterministically from (dim, seed+t) —
            # identical in every task
            pl = _hyperplanes(m.shape[1], n_planes, seed=11 + t)
            bits = (m @ pl.T) > 0
            bkt = bits @ (1 << np.arange(n_planes))
            parts.append(
                pd.DataFrame({"table": t, "bucket": bkt.astype(np.int64), "_id": ids})
            )
        return pd.concat(parts, ignore_index=True).astype(
            {"table": "int64", "_id": "int64"}
        )

    empty_ids = pd.DataFrame(
        {"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64")}
    )

    def per_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        cand = bucket[bucket.duplicated(["table", "bucket"], keep=False)]
        parts = []
        for (_t, _b), grp in cand.groupby(["table", "bucket"], sort=False):
            ids = _cap_group(
                np.sort(grp["_id"].to_numpy()), max_group_size, "embedding LSH bucket"
            )
            ia, ib = np.triu_indices(len(ids), k=1)
            parts.append(pd.DataFrame({"id_a": ids[ia], "id_b": ids[ib]}))
        if not parts:
            return empty_ids.copy()
        return pd.concat(parts, ignore_index=True).astype(
            {"id_a": "int64", "id_b": "int64"}
        )

    banded = ds.map_batches(to_tables, batch_format="pandas")
    cand_pairs = bucketed_map_groups(
        banded, "bucket", per_bucket, num_buckets=32, empty_result=empty_ids
    )
    cand = bucketed_map_groups(
        cand_pairs,
        "id_a",
        lambda b: b.drop_duplicates(["id_a", "id_b"]),
        num_buckets=16,
        empty_result=empty_ids,
    ).materialize()

    empty_out = pd.DataFrame(
        {
            "id_a": pd.Series(dtype="int64"),
            "id_b": pd.Series(dtype="int64"),
            "score": pd.Series(dtype="float64"),
        }
    )
    n_cand = cand.count()
    if n_cand == 0:
        return ray.data.from_pandas(empty_out)
    if driver_pair_limit is None:
        driver_pair_limit = max(broadcast_max_candidates, 100_000)

    def to_vec_bytes(batch: pd.DataFrame) -> pd.DataFrame:
        # Arrow hash joins reject list-typed payload columns — ship the
        # vector as fixed-width float64 bytes and rehydrate in the verify
        return pd.DataFrame(
            {
                id_col: batch[id_col].to_numpy().astype("int64"),
                "_vecbytes": [
                    np.asarray(v, dtype=np.float64).tobytes() for v in batch[vec_col]
                ],
            }
        )

    use_broadcast_verify = False
    if n_cand <= driver_pair_limit:
        cand_df = cand.to_pandas()
        id_set = frozenset(
            np.union1d(cand_df["id_a"].to_numpy(), cand_df["id_b"].to_numpy()).tolist()
        )
        ref = ray.put(id_set)

        def keep_candidates(batch: pd.DataFrame) -> pd.DataFrame:
            ids = _fetch(ref)
            return to_vec_bytes(batch[batch[id_col].isin(ids)])

        cand_vecs = ds.map_batches(keep_candidates, batch_format="pandas")
        use_broadcast_verify = len(id_set) <= broadcast_max_candidates
    else:
        # pair-count exceeds what the driver may hold: candidate-id filter
        # becomes a fixed-size Bloom sketch (no false negatives; false
        # positives drop out of the inner verify joins) and the pair
        # Dataset is never collected
        from .sketches import bloom_build, bloom_semi_filter

        cand_ids = cand.map_batches(
            lambda b: pd.DataFrame(
                {"cid": np.concatenate([b["id_a"].to_numpy(), b["id_b"].to_numpy()])}
            ),
            batch_format="pandas",
        )
        bloom = bloom_build(cand_ids, "cid")
        # bloom-filter the RAW rows first, serialize only the survivors:
        # to_vec_bytes is a per-row Python pass, and on this branch (huge
        # corpora) nearly all rows are non-candidates
        survivors = bloom_semi_filter(
            ds.map_batches(
                lambda b: b[[id_col, vec_col]], batch_format="pandas"
            ),
            bloom,
            id_col,
        )
        cand_vecs = survivors.map_batches(to_vec_bytes, batch_format="pandas")

    def verify_frame(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return empty_out.copy()
        a = np.stack([np.frombuffer(v, dtype=np.float64) for v in batch["_vec_a"]])
        b = np.stack([np.frombuffer(v, dtype=np.float64) for v in batch["_vec_b"]])
        na = np.linalg.norm(a, axis=1)
        nb = np.linalg.norm(b, axis=1)
        na[na == 0] = 1.0
        nb[nb == 0] = 1.0
        s = np.einsum("ij,ij->i", a, b) / (na * nb)
        # filter on the RAW score (same rule as the exact path), round after
        keep = s >= threshold
        return pd.DataFrame(
            {
                "id_a": batch["id_a"].to_numpy()[keep],
                "id_b": batch["id_b"].to_numpy()[keep],
                "score": _round6(s[keep]),
            }
        ).astype({"id_a": "int64", "id_b": "int64"})

    if use_broadcast_verify:
        # small candidate set: broadcast {id: vec bytes} once, verify
        # map-side over the pairs — zero shuffles, no aggregator actors
        vecs_df = cand_vecs.to_pandas()
        vec_ref = ray.put(dict(zip(vecs_df[id_col], vecs_df["_vecbytes"])))

        def verify_broadcast(batch: pd.DataFrame) -> pd.DataFrame:
            vmap = _fetch(vec_ref)
            batch = batch.assign(
                _vec_a=batch["id_a"].map(vmap), _vec_b=batch["id_b"].map(vmap)
            )
            return verify_frame(batch)

        res = cand.map_batches(verify_broadcast, batch_format="pandas").materialize()
        if res.count() == 0:
            return ray.data.from_pandas(empty_out)
        return res

    from .joins import hash_join

    # coalesce candidate blocks (schema-less empties from sparse bucketed
    # stages would trip Arrow's hash join)
    cand = cand.repartition(max(2, verify_partitions))

    j = hash_join(
        cand,
        cand_vecs,
        "inner",
        num_partitions=verify_partitions,
        on=("id_a",),
        right_on=(id_col,),
    ).map_batches(
        lambda b: b.rename(columns={"_vecbytes": "_vec_a"})[["id_a", "id_b", "_vec_a"]],
        batch_format="pandas",
    )
    j = hash_join(
        j,
        cand_vecs,
        "inner",
        num_partitions=verify_partitions,
        on=("id_b",),
        right_on=(id_col,),
    ).map_batches(
        lambda b: b.rename(columns={"_vecbytes": "_vec_b"})[
            ["id_a", "id_b", "_vec_a", "_vec_b"]
        ],
        batch_format="pandas",
    )

    res = j.map_batches(verify_frame, batch_format="pandas").materialize()
    if res.count() == 0:
        return ray.data.from_pandas(empty_out)
    return res
