"""Graph operators over edge lists — the missing piece between pair-wise
near-dup detection and actual corpus deduplication: duplicate PAIRS chain
(A~B, B~C) into CLUSTERS, and the keep-one-representative decision needs
the connected component, not the pair.

``connected_components``: distributed min-label propagation. Labels start
as the node id; each round carries labels across edges and takes the
per-node min; converged when the (exact, driver-side Python int) sum of
labels stops decreasing — a monotone scalar, so convergence detection
costs one tiny aggregate per round instead of a full old-vs-new join.
Rounds needed = graph diameter; near-dup clusters are shallow (a few
hops), so this terminates in a handful of rounds at any corpus size.

Every iterative op here (components, pagerank, label propagation, the
BFS/Bellman-Ford relaxer, k-core) shares ONE scale shape: the BSP
shard-actor harness (``_split_by_bucket`` + per-op shard classes) —
edges are split ONCE onto actors by hash(src) and never re-shuffle;
each round ships node-sized frames in and per-(node, bucket) compressed
partials out, with only convergence scalars on the driver. Below each
op's ``broadcast_max_edges`` a vectorized driver numpy path runs
instead (forced-branch parity tests pin the two paths to each other and
to the unrolled SQL twins).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from .agg import bucketed_map_groups, grouped_agg


@ray.remote
def _split_by_bucket(df: pd.DataFrame, col: str, cols: tuple, nb: int):
    """Shared BSP fan-out splitter (pagerank / LPA / CC / relaxation /
    k_core): PROJECT one pandas block to ``cols`` and route its rows to
    ``nb`` bucket pieces by ``col % nb`` (numpy modulo is non-negative
    for negative ids). The projection happens HERE, inside the split
    task, so callers never pay an extra full pass (or a transient
    duplicate dataset) just to drop payload columns before the fan-out —
    a nodes frame carrying document text ships only its int64 key.
    Schema-less empty blocks from sparse bucketed stages are replaced
    with typed empties."""
    if col not in df.columns:
        df = pd.DataFrame({c: pd.Series(dtype="int64") for c in cols})
    df = df[list(cols)]
    bkt = df[col].to_numpy() % nb
    return tuple(df[bkt == b] for b in range(nb))


def _bsp_nb(num_buckets: int) -> int:
    """Shard count for the BSP harness: capped at the cluster's CPUs so
    the actor pool never oversubscribes worker processes."""
    import ray as _ray

    return max(2, min(num_buckets, int(_ray.cluster_resources().get("CPU", num_buckets))))


@ray.remote
def _nrows(df: pd.DataFrame) -> int:
    return len(df)

def _bsp_relax(
    edge_ds: "ray.data.Dataset",
    reached0: "ray.data.Dataset",
    *,
    rounds: int,
    num_buckets: int,
    unit_weight: bool = False,
) -> "ray.data.Dataset":
    """Shared BSP relaxation harness behind :func:`bfs_distances` and
    :func:`shortest_path_distances` (the pagerank/LPA/CC shard-actor
    shape): ``edge_ds`` is (key, val, w) directed weighted edges, pinned
    ONCE on shard actors by hash(key); ``reached0`` is the deduped
    (node, dist) source frame. Each of the ``rounds`` Jacobi rounds
    ships only the IMPROVED frontier frames in and per-(dst, bucket)
    min-(dist+w) partials out — the edges never re-shuffle. Early exit
    when a round improves nothing (identical to running the remaining
    no-op rounds, so bounded-round SQL-twin parity is preserved).
    Everything stays int64 (positional indexers, no merge NaN upcast).
    ``unit_weight=True`` (BFS) reads edges as (key, val) and steps by 1 —
    no weight column ever ships."""
    import ray as _ray

    nb = _bsp_nb(num_buckets)

    ecols = ("key", "val") if unit_weight else ("key", "val", "w")
    edge_pieces = [
        _split_by_bucket.options(num_returns=nb).remote(r, "key", ecols, nb)
        for r in edge_ds.to_pandas_refs()
    ]
    reach_pieces = [
        _split_by_bucket.options(num_returns=nb).remote(r, "node", ("node", "dist"), nb)
        for r in reached0.to_pandas_refs()
    ]

    @_ray.remote
    class _RelaxShard:
        def __init__(self, *parts):
            e = pd.concat(parts, ignore_index=True)
            e["_db"] = (e["val"].to_numpy() % nb).astype("int64")
            self.e = e

        def relax(self, frontier: pd.DataFrame):
            j = self.e.merge(frontier, left_on="key", right_on="node")
            step = 1 if unit_weight else j["w"].to_numpy()
            j["nd"] = j["dist"].to_numpy() + step
            c = (
                j.groupby(["val", "_db"], as_index=False, sort=False)["nd"]
                .min()
                .rename(columns={"val": "node", "nd": "dist"})
                .astype({"node": "int64", "dist": "int64"})
            )
            return tuple(c.loc[c["_db"] == b, ["node", "dist"]] for b in range(nb))

    shards = [
        _RelaxShard.remote(*[edge_pieces[i][b] for i in range(len(edge_pieces))])
        for b in range(nb)
    ]

    @_ray.remote
    def _init(*parts):
        m = (
            pd.concat(parts, ignore_index=True)
            if parts
            else pd.DataFrame(
                {"node": pd.Series(dtype="int64"), "dist": pd.Series(dtype="int64")}
            )
        )
        g = m.groupby("node", as_index=False, sort=False)["dist"].min()
        return g.astype({"node": "int64", "dist": "int64"})

    reached_refs = [
        _init.remote(*[reach_pieces[i][b] for i in range(len(reach_pieces))])
        for b in range(nb)
    ]
    frontier_refs = list(reached_refs)  # round 0: every source expands

    @_ray.remote(num_returns=2)
    def _combine(prev: pd.DataFrame, *pieces):
        allc = pd.concat(pieces, ignore_index=True)
        empty = prev.iloc[0:0]
        if not len(allc):
            return prev, empty
        c = allc.groupby("node", as_index=False, sort=False)["dist"].min()
        pos = pd.Index(prev["node"].to_numpy()).get_indexer(c["node"].to_numpy())
        cd = c["dist"].to_numpy()
        exist = pos >= 0
        upd = prev["dist"].to_numpy().copy()
        ep, ev = pos[exist], cd[exist]
        better = ev < upd[ep]
        upd[ep[better]] = ev[better]
        out = pd.DataFrame({"node": prev["node"].to_numpy(), "dist": upd})
        new_rows = c.loc[~exist, ["node", "dist"]]
        if len(new_rows):
            out = pd.concat([out, new_rows], ignore_index=True)
        improved = pd.concat(
            [
                pd.DataFrame(
                    {
                        "node": prev["node"].to_numpy()[ep[better]],
                        "dist": ev[better],
                    }
                ),
                new_rows,
            ],
            ignore_index=True,
        )
        return (
            out.astype({"node": "int64", "dist": "int64"}),
            improved.astype({"node": "int64", "dist": "int64"}),
        )

    for _rnd in range(rounds):
        grid = [
            shards[b].relax.options(num_returns=nb).remote(frontier_refs[b])
            for b in range(nb)
        ]
        pairs = [
            _combine.remote(reached_refs[d], *[grid[b][d] for b in range(nb)])
            for d in range(nb)
        ]
        reached_refs = [pr[0] for pr in pairs]
        frontier_refs = [pr[1] for pr in pairs]
        if sum(_ray.get([_nrows.remote(f) for f in frontier_refs])) == 0:
            break

    # NB: don't ray.kill the shards — the final round's relax calls may
    # still be queued; Ray reaps the actors once their handles drop.
    return ray.data.from_pandas_refs(reached_refs)




def connected_components(
    nodes: ray.data.Dataset,
    edges: ray.data.Dataset,
    *,
    node_col: str = "node",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iters: int = 25,
    num_buckets: int = 32,
    broadcast_max_edges: int = 1_000_000,
) -> ray.data.Dataset:
    """(node, cluster_id) with cluster_id = min node id in the component.
    Nodes absent from any edge keep themselves as cluster_id.

    Adaptive, like the dedup verify: when the EDGE list is small
    (<= broadcast_max_edges — near-dup graphs are sparse by construction),
    run union-find on the driver over just the edges and broadcast the
    {node: component-min} map for only the nodes that appear in an edge
    (singletons label themselves map-side) — zero shuffles, no rounds.
    Larger edge sets use the distributed label-propagation loop below."""

    edges = edges.materialize()
    if edges.count() <= broadcast_max_edges:
        edf = edges.to_pandas()
        if src_col not in edf.columns:  # 0 edges -> schema-less empty frame
            edf = pd.DataFrame({src_col: [], dst_col: []})
        parent: dict = {}

        def find(x):
            while parent.get(x, x) != x:
                parent[x] = parent.get(parent[x], parent[x])  # path halving
                x = parent[x]
            return x

        for a, b in zip(edf[src_col], edf[dst_col]):
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        label = {x: find(x) for x in parent}

        import ray as _ray

        from .joins import _fetch

        ref = _ray.put(label)

        def assign(b: pd.DataFrame) -> pd.DataFrame:
            lab = _fetch(ref)
            n = b[node_col].to_numpy().astype("int64")
            return pd.DataFrame(
                {
                    "node": n,
                    "cluster_id": np.asarray(
                        [lab.get(int(x), int(x)) for x in n], dtype=np.int64
                    ),
                }
            )

        return nodes.map_batches(assign, batch_format="pandas")

    # ---- distributed path: BSP with edge shards pinned on actors ----------
    # Same harness as pagerank/label_propagation: the bidirected edge
    # list is split ONCE onto shard actors by hash(key); each round ships
    # node-sized label frames in and per-(node, bucket) MIN-label partials
    # out — the edges never re-shuffle (the previous union-loop re-sorted
    # them twice per round, up to 2 x max_iters Ray sort jobs).
    import ray as _ray

    nb = _bsp_nb(num_buckets)

    def both_dirs(b: pd.DataFrame) -> pd.DataFrame:
        fwd = pd.DataFrame({"key": b[src_col], "val": b[dst_col]})
        rev = pd.DataFrame({"key": b[dst_col], "val": b[src_col]})
        return pd.concat([fwd, rev], ignore_index=True).astype(
            {"key": "int64", "val": "int64"}
        )

    edge2 = edges.map_batches(both_dirs, batch_format="pandas").materialize()

    edge_pieces = [
        _split_by_bucket.options(num_returns=nb).remote(r, "key", ("key", "val"), nb)
        for r in edge2.to_pandas_refs()
    ]
    node_pieces = [
        _split_by_bucket.options(num_returns=nb).remote(r, node_col, (node_col,), nb)
        for r in nodes.to_pandas_refs()
    ]
    # labels must flow THROUGH edge endpoints absent from ``nodes`` (a
    # bridge node outside the universe must still connect its
    # neighbours, exactly like the driver union-find path) — so the
    # PROPAGATION universe is nodes UNION endpoints, and the output is
    # filtered back to ``nodes`` at the end
    # edge2 is already bidirected, so the key column ALONE contains every
    # endpoint; per-block dedup shrinks the fan-out further (_init_cc
    # dedups globally anyway)
    ends = edge2.map_batches(
        lambda b: pd.DataFrame({node_col: b["key"].drop_duplicates()}).astype(
            {node_col: "int64"}
        ),
        batch_format="pandas",
    )
    end_pieces = [
        _split_by_bucket.options(num_returns=nb).remote(r, node_col, (node_col,), nb)
        for r in ends.to_pandas_refs()
    ]

    @_ray.remote
    class _CCShard:
        """One key-bucket of bidirected edges, pre-grouped by the
        destination's bucket."""

        def __init__(self, *parts):
            e = pd.concat(parts, ignore_index=True)
            e["_db"] = (e["val"].to_numpy() % nb).astype("int64")
            self.e = e

        def carry(self, labels: pd.DataFrame):
            j = self.e.merge(labels, left_on="key", right_on="node")
            # compress to ONE min-label row per (destination, bucket)
            c = (
                j.groupby(["val", "_db"], as_index=False, sort=False)["label"]
                .min()
                .rename(columns={"val": "node"})
                .astype({"node": "int64", "label": "int64"})
            )
            return tuple(
                c.loc[c["_db"] == b, ["node", "label"]] for b in range(nb)
            )

    shards = [
        _CCShard.remote(*[edge_pieces[i][b] for i in range(len(edge_pieces))])
        for b in range(nb)
    ]

    @_ray.remote
    def _init_cc(*parts):
        m = (
            pd.concat(parts, ignore_index=True)
            if parts
            else pd.DataFrame({node_col: pd.Series(dtype="int64")})
        )
        n = m[node_col].drop_duplicates().to_numpy().astype("int64")
        return pd.DataFrame({"node": n, "label": n}).astype(
            {"node": "int64", "label": "int64"}
        )

    all_pieces = node_pieces + end_pieces
    label_refs = [
        _init_cc.remote(*[all_pieces[i][b] for i in range(len(all_pieces))])
        for b in range(nb)
    ]

    @_ray.remote
    def _cc_reduce(prev: pd.DataFrame, *pieces):
        # int64 end to end via a positional indexer (no merge NaN upcast);
        # prev's universe is nodes UNION endpoints, so every carried
        # label has a row to land on
        allc = pd.concat(pieces, ignore_index=True)
        out = prev.copy()
        if len(allc):
            c = allc.groupby("node", as_index=False, sort=False)["label"].min()
            idx = pd.Index(c["node"].to_numpy())
            pos = idx.get_indexer(out["node"].to_numpy())
            lab = out["label"].to_numpy().copy()
            m = pos >= 0
            lab[m] = np.minimum(lab[m], c["label"].to_numpy()[pos[m]])
            out["label"] = lab
        return out[["node", "label"]].astype({"node": "int64", "label": "int64"})

    @_ray.remote
    def _lab_sum(df: pd.DataFrame) -> int:
        return int(df["label"].sum())

    prev_sum = sum(_ray.get([_lab_sum.remote(r) for r in label_refs]))
    for _it in range(max_iters):
        grid = [
            shards[b].carry.options(num_returns=nb).remote(label_refs[b])
            for b in range(nb)
        ]
        label_refs = [
            _cc_reduce.remote(label_refs[d], *[grid[b][d] for b in range(nb)])
            for d in range(nb)
        ]
        cur = sum(_ray.get([_lab_sum.remote(r) for r in label_refs]))
        if cur == prev_sum:
            break
        prev_sum = cur
    else:
        # returning partially-converged labels would silently split any
        # component whose diameter exceeds max_iters (e.g. a long chain of
        # drifting boilerplate) and elect wrong representatives downstream
        raise RuntimeError(
            f"connected_components: not converged in {max_iters} rounds — "
            "a component's diameter exceeds max_iters; raise max_iters "
            "(rounds ship node-sized label frames, the edges stay pinned)"
        )

    @_ray.remote
    def _per_node_rows(lab: pd.DataFrame, *nparts):
        # one output row per INPUT node row (duplicate node rows keep
        # their multiplicity — exactly what the driver branch's 1:1
        # assign map emits, pinned by the forced-branch parity test)
        m = (
            pd.concat(nparts, ignore_index=True)
            if nparts
            else pd.DataFrame({node_col: pd.Series(dtype="int64")})
        )
        n = m[node_col].to_numpy().astype("int64")
        pos = pd.Index(lab["node"].to_numpy()).get_indexer(n)
        if len(n) and (pos < 0).any():
            raise RuntimeError("connected_components: node missing from init universe")
        return pd.DataFrame(
            {"node": n, "label": lab["label"].to_numpy()[pos]}
        ).astype({"node": "int64", "label": "int64"})

    # map the propagated universe back to ``nodes`` (bridge-only
    # endpoints did their job and are not part of the output)
    label_refs = [
        _per_node_rows.remote(
            label_refs[b], *[node_pieces[i][b] for i in range(len(node_pieces))]
        )
        for b in range(nb)
    ]

    # NB: don't ray.kill the shards — the final round's carry calls may
    # still be queued; Ray reaps the actors once their handles drop.
    labels = ray.data.from_pandas_refs(label_refs)

    return labels.map_batches(
        lambda b: b.rename(columns={"label": "cluster_id"}).astype(
            {"node": "int64", "cluster_id": "int64"}
        ),
        batch_format="pandas",
    )


def pagerank(
    edges: ray.data.Dataset,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 10,
    scale: int = 10**12,
    damp_num: int = 17,
    damp_den: int = 20,
    num_buckets: int = 32,
    broadcast_max_edges: int = 1_000_000,
    seeds: "list[int] | None" = None,
) -> ray.data.Dataset:
    """Fixed-point integer PageRank: (node, rank) after ``iters`` power
    iterations, rank in 1/``scale`` units.

    ``seeds`` switches to PERSONALIZED PageRank (relatedness to a seed
    set, the related-entity primitive): initial mass and the per-round
    teleport go only to seed nodes — r0(v) = scale // |S| and
    base(v) = ((den-num)*scale) // (den*|S|) for v in S, else 0, with
    |S| = distinct seed count. Seed sets are small by use case (a
    handful of query entities), so shipping them to workers is a
    bounded broadcast, never node-sized.

    ALL arithmetic is int64 floor division/addition — deliberately, so the
    result is bit-identical regardless of summation order (float PageRank
    is order-dependent and can never be hash-compared across engines; this
    one has an EXACT SQL twin, see ``pagerank_sql``). Semantics (the
    simplified variant, mirrored by the twin): edges are deduped; nodes =
    distinct endpoints; r0 = scale // n;
    r_{i+1}(v) = base + sum_{u->v} (damp_num * r_i(u)) // (damp_den * outdeg(u)),
    base = ((damp_den - damp_num) * scale) // (damp_den * n).
    Dangling-node mass is not redistributed (it decays, like the common
    "simple" formulation).

    Adaptive like ``connected_components``: small edge lists run the loop
    on the driver (vectorized int64 numpy); larger ones run distributed —
    per iteration, 2 bucketed shuffles of edge-/node-sized int rows
    (co-locate each edge with its source's rank -> contributions;
    group-sum per destination). The driver never holds more than the
    small-path edge list; the distributed path keeps everything a
    Dataset."""
    if seeds is not None:
        seeds = list(seeds)  # normalize once: a generator would be
        # exhausted by the emptiness check and re-read as empty later
        if not seeds:
            raise ValueError("pagerank: seeds must be non-empty when given")
    dedup = bucketed_map_groups(
        edges.map_batches(
            lambda b: pd.DataFrame(
                {"src": b[src_col], "dst": b[dst_col]}
            ).astype({"src": "int64", "dst": "int64"}),
            batch_format="pandas",
        ),
        "src",
        lambda b: b.drop_duplicates(["src", "dst"]),
        num_buckets=num_buckets,
        empty_result=pd.DataFrame(
            {"src": pd.Series(dtype="int64"), "dst": pd.Series(dtype="int64")}
        ),
    ).materialize()

    if dedup.count() <= broadcast_max_edges:
        edf = dedup.to_pandas()
        if "src" not in edf.columns:  # 0 edges
            return ray.data.from_pandas(
                pd.DataFrame(
                    {"node": pd.Series(dtype="int64"), "rank": pd.Series(dtype="int64")}
                )
            )
        nodes = np.unique(np.concatenate([edf["src"], edf["dst"]])).astype("int64")
        n = len(nodes)
        idx = {int(v): i for i, v in enumerate(nodes)}
        s = edf["src"].map(idx).to_numpy()
        d = edf["dst"].map(idx).to_numpy()
        outdeg = np.zeros(n, dtype=np.int64)
        np.add.at(outdeg, s, 1)
        if seeds is None:
            base_vec = np.full(
                n, ((damp_den - damp_num) * scale) // (damp_den * n), dtype=np.int64
            )
            r = np.full(n, scale // n, dtype=np.int64)
        else:
            seed_arr = np.unique(np.asarray(list(seeds), dtype=np.int64))
            n_s = len(seed_arr)
            sm = np.isin(nodes, seed_arr)
            base_vec = np.where(
                sm, ((damp_den - damp_num) * scale) // (damp_den * n_s), 0
            ).astype(np.int64)
            r = np.where(sm, scale // n_s, 0).astype(np.int64)
        for _ in range(iters):
            contrib = (damp_num * r[s]) // (damp_den * outdeg[s])
            nxt = base_vec.copy()
            np.add.at(nxt, d, contrib)
            r = nxt
        return ray.data.from_pandas(
            pd.DataFrame({"node": nodes, "rank": r}).astype(
                {"node": "int64", "rank": "int64"}
            )
        )

    # ---- distributed path: BSP with edge shards pinned on actors ----------
    # Ray Data has no iterate-in-place primitive, and re-shuffling the
    # STATIC edge list every round (the union-loop shape components uses)
    # would cost O(iters x edges) network. The canonical iterative-graph
    # shape is bulk-synchronous instead: partition the edges ONCE onto
    # shard actors (hash(src) % nb), then each round ships only node-sized
    # rank frames in and (dst, contrib) int pieces out — the edges never
    # move again. Driver holds ObjectRefs and scalars only. This is the
    # documented drop-to-raw-actors case: per-round mutable state the
    # Dataset API cannot keep in place.
    import ray as _ray

    # one shard actor per bucket: cap at the cluster's CPU count so the
    # pool doesn't oversubscribe worker processes on small clusters
    nb = _bsp_nb(num_buckets)

    # node -> outdeg (0 for sinks), via the Dataset API, then split into
    # per-bucket frames WITHOUT a driver round-trip (num_returns fan-out)
    endpoints = dedup.map_batches(
        lambda b: pd.DataFrame(
            {
                "node": np.concatenate([b["src"].to_numpy(), b["dst"].to_numpy()]),
                "deg": np.concatenate(
                    [np.ones(len(b), dtype=np.int64), np.zeros(len(b), dtype=np.int64)]
                ),
            }
        ).astype({"node": "int64", "deg": "int64"}),
        batch_format="pandas",
    )
    empty_nd = pd.DataFrame(
        {"node": pd.Series(dtype="int64"), "deg": pd.Series(dtype="int64")}
    )
    meta = grouped_agg(
        endpoints,
        ["node"],
        {"deg": ("deg", "sum")},
        final="bucketed",
        num_buckets=nb,
        empty_result=empty_nd,
    ).materialize()
    n = meta.count()
    if seeds is None:
        seed_arr = None
        base = ((damp_den - damp_num) * scale) // (damp_den * n)
        r0 = scale // n
    else:
        # personalization sets are query-sized — shipping the array to
        # the per-bucket init/reduce tasks is a bounded broadcast
        seed_arr = np.unique(np.asarray(list(seeds), dtype=np.int64))
        n_s = len(seed_arr)
        base = ((damp_den - damp_num) * scale) // (damp_den * n_s)
        r0 = scale // n_s

    # pieces[i][b]: block i's rows for bucket b — each edge/node row moves
    # through the object store exactly once (shared BSP splitter below)
    edge_pieces = [
        _split_by_bucket.options(num_returns=nb).remote(r, "src", ("src", "dst"), nb)
        for r in dedup.to_pandas_refs()
    ]
    rank_pieces = [
        _split_by_bucket.options(num_returns=nb).remote(r, "node", ("node", "deg"), nb)
        for r in meta.to_pandas_refs()
    ]

    @_ray.remote
    class _PRShard:
        """Holds one src-bucket of edges for the whole job (loaded once,
        pre-grouped by destination bucket)."""

        def __init__(self, *parts):
            e = pd.concat(parts, ignore_index=True)
            e["_db"] = (e["dst"].to_numpy() % nb).astype("int64")
            self.e = e

        def contribs(self, ranks: pd.DataFrame):
            j = self.e.merge(ranks, left_on="src", right_on="node")
            out = pd.DataFrame(
                {
                    "dst": j["dst"].to_numpy(),
                    "contrib": (damp_num * j["rank"].to_numpy())
                    // (damp_den * j["deg"].to_numpy()),
                    "_db": j["_db"].to_numpy(),
                }
            )
            return tuple(
                out.loc[out["_db"] == b, ["dst", "contrib"]] for b in range(nb)
            )

    shards = [
        _PRShard.remote(*[edge_pieces[i][b] for i in range(len(edge_pieces))])
        for b in range(nb)
    ]

    @_ray.remote
    def _init_rank(*parts):
        m = (
            pd.concat(parts, ignore_index=True)
            if parts
            else empty_nd.copy()
        )
        # per-node base computed ONCE here and carried as a column — the
        # node set per bucket is static, so recomputing the seed mask in
        # every _reduce round would be iters x nb wasted isin scans
        if seed_arr is None:
            rank = np.full(len(m), r0, dtype=np.int64)
            bvec = np.full(len(m), base, dtype=np.int64)
        else:
            sm = np.isin(m["node"].to_numpy().astype("int64"), seed_arr)
            rank = np.where(sm, r0, 0).astype(np.int64)
            bvec = np.where(sm, base, 0).astype(np.int64)
        return m.assign(rank=rank, base=bvec)[
            ["node", "rank", "deg", "base"]
        ].astype("int64")

    rank_refs = [
        _init_rank.remote(*[rank_pieces[i][b] for i in range(len(rank_pieces))])
        for b in range(nb)
    ]

    @_ray.remote
    def _reduce(prev: pd.DataFrame, *pieces):
        allc = pd.concat(pieces, ignore_index=True)
        s = allc.groupby("dst")["contrib"].sum()
        out = prev.copy()
        # stay in int64 end to end: Series.map would widen to float64 for
        # nodes with no contribution (NaN fill), silently corrupting low
        # bits once rank sums pass 2^53 (large caller-supplied scale)
        vals = np.zeros(len(out), dtype=np.int64)
        pos = s.index.get_indexer(out["node"])
        m = pos >= 0
        vals[m] = s.to_numpy()[pos[m]]
        out["rank"] = out["base"].to_numpy() + vals
        return out[["node", "rank", "deg", "base"]].astype("int64")

    for _ in range(iters):
        grid = [
            shards[b].contribs.options(num_returns=nb).remote(rank_refs[b])
            for b in range(nb)
        ]
        rank_refs = [
            _reduce.remote(rank_refs[d], *[grid[b][d] for b in range(nb)])
            for d in range(nb)
        ]

    # NB: don't ray.kill the shards here — the final round's contribs
    # calls may still be queued; the handles go out of scope on return and
    # Ray reaps the actors once their pending calls drain.
    out = ray.data.from_pandas_refs(rank_refs)
    return out.map_batches(
        lambda b: b[["node", "rank"]].astype({"node": "int64", "rank": "int64"}),
        batch_format="pandas",
    )


def pagerank_sql(
    edges_sql: str,
    *,
    iters: int = 10,
    scale: int = 10**12,
    damp_num: int = 17,
    damp_den: int = 20,
    seeds_sql: "str | None" = None,
) -> str:
    """The exact DuckDB twin of ``pagerank`` — same integer recurrence,
    iterations unrolled as chained CTEs. ``edges_sql`` must produce
    DISTINCT (src, dst) rows. ``seeds_sql`` (yielding (node)) switches to
    the personalized variant: mass and teleport restricted to the seed
    set, |S| = its distinct count — mirroring ``pagerank(seeds=...)``."""
    if seeds_sql is None:
        head = (
            f"WITH edges AS ({edges_sql}),\n"
            "nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),\n"
            "nn AS (SELECT COUNT(*) AS c FROM nodes),\n"
            "outdeg AS (SELECT src AS node, COUNT(*) AS d FROM edges GROUP BY src),\n"
            f"r0 AS (SELECT node, {scale} // (SELECT c FROM nn) AS rank FROM nodes),\n"
        )
        base_expr = (
            f"(({damp_den} - {damp_num}) * {scale}::BIGINT)"
            f" // ({damp_den} * (SELECT c FROM nn))"
        )
    else:
        head = (
            f"WITH edges AS ({edges_sql}),\n"
            "nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),\n"
            f"seeds AS (SELECT DISTINCT node FROM ({seeds_sql})),\n"
            "ns AS (SELECT COUNT(*) AS c FROM seeds),\n"
            "outdeg AS (SELECT src AS node, COUNT(*) AS d FROM edges GROUP BY src),\n"
            f"r0 AS (SELECT node, CASE WHEN node IN (SELECT node FROM seeds)"
            f" THEN {scale} // (SELECT c FROM ns) ELSE 0 END AS rank FROM nodes),\n"
        )
        base_expr = (
            "CASE WHEN nd.node IN (SELECT node FROM seeds) THEN "
            f"(({damp_den} - {damp_num}) * {scale}::BIGINT)"
            f" // ({damp_den} * (SELECT c FROM ns)) ELSE 0 END"
        )
    body = []
    for i in range(1, iters + 1):
        body.append(
            f"r{i} AS (\n"
            "  SELECT nd.node,\n"
            # ::BIGINT: DuckDB SUM(BIGINT) returns HUGEINT, which pandas
            # fetches as float64 — the engine emits int64 (dtype-strict)
            f"         ({base_expr}\n"
            f"         + COALESCE(SUM(({damp_num} * r.rank) // ({damp_den} * o.d)), 0)"
            ")::BIGINT AS rank\n"
            "  FROM nodes nd\n"
            "  LEFT JOIN edges e ON e.dst = nd.node\n"
            f"  LEFT JOIN r{i - 1} r ON r.node = e.src\n"
            "  LEFT JOIN outdeg o ON o.node = e.src\n"
            "  GROUP BY nd.node\n"
            ")"
        )
    return (
        head
        + ",\n".join(body)
        + f"\nSELECT node, rank FROM r{iters} ORDER BY node"
    )


def triangle_count(
    edges: ray.data.Dataset,
    *,
    src_col: str = "u",
    dst_col: str = "v",
    num_buckets: int = 32,
    broadcast_max_edges: int = 1_000_000,
) -> int:
    """Exact triangle count over an undirected edge list given in
    canonical orientation (src < dst per edge, no duplicates). The
    classic two-join formulation, fully distributed:

      wedges  = E(a,b) JOIN E(b,c) ON b      -- paths a < b < c
      closed  = wedges JOIN E ON (a,c)       -- wedge closed by an edge

    Each triangle a<b<c is produced exactly once (by its middle vertex),
    so COUNT(closed) is the triangle count. Both joins run as the house
    union + hash-bucket + per-bucket vectorized pandas merge (module
    docstring: edge lists typically arrive from bucketed stages whose
    empty sort partitions Arrow\'s acero join rejects; our own buckets do
    not care). Driver state: num_buckets count scalars.

    Skew note: a hub vertex h of degree d contributes O(d^2) wedge rows
    streamed through the second exchange — the standard web-scale
    mitigation is degree-orientation (point edges low->high TOTAL degree,
    bounding wedge fan-out by arboricity); the canonical id-orientation
    here is the right shape for the bounded-degree co-occurrence graphs
    the engine builds (see relational.q_supplier_triangles)."""
    edges = edges.map_batches(
        lambda b: b[[src_col, dst_col]].astype(
            {src_col: "int64", dst_col: "int64"}
        ),
        batch_format="pandas",
    ).materialize()
    # adaptive driver fast path (the house pattern): ~2x faster than the
    # bucketed stages at bench scale. The edge threshold alone is NOT a
    # safe bound — wedge rows are O(sum deg^2), so a dense near-clique
    # under 1M edges still wedges out to ~5e8 rows — so the gate is the
    # EXACT wedge-row count (computable from the edge endpoints before
    # any merge); dense graphs fall through to the distributed path,
    # which spreads wedges across buckets
    if edges.count() <= broadcast_max_edges:
        edf = edges.to_pandas()
        if src_col not in edf.columns or not len(edf):
            return 0
        e = edf.rename(columns={src_col: "u", dst_col: "v"})
        out_by_node = e["u"].value_counts()
        in_by_node = e["v"].value_counts()
        common = out_by_node.index.intersection(in_by_node.index)
        n_wedges = int(
            (out_by_node.loc[common] * in_by_node.loc[common]).sum()
        )
        if n_wedges <= 30_000_000:
            wedges_df = e.merge(e, left_on="v", right_on="u")
            closed = wedges_df.merge(
                e, left_on=["u_x", "v_y"], right_on=["u", "v"]
            )
            return int(len(closed))
        edges = ray.data.from_pandas(e.rename(columns={"u": src_col, "v": dst_col}))


    def tag(kind: int, k, x) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "k": k.to_numpy(),
                "x": x.to_numpy(),
                "kind": np.full(len(k), kind, dtype="int64"),
            }
        ).astype({"k": "int64", "x": "int64"})

    # wedge join on the shared middle vertex: kind0 = (a keyed by b),
    # kind1 = (c keyed by b)
    halves = edges.map_batches(
        lambda b: pd.concat(
            [tag(0, b[dst_col], b[src_col]), tag(1, b[src_col], b[dst_col])],
            ignore_index=True,
        ),
        batch_format="pandas",
    )

    empty_kx = pd.DataFrame(
        {
            "a": pd.Series(dtype="int64"),
            "c": pd.Series(dtype="int64"),
            "kind": pd.Series(dtype="int64"),
        }
    )

    def make_wedges(bucket: pd.DataFrame) -> pd.DataFrame:
        ins = bucket[bucket["kind"] == 0]
        outs = bucket[bucket["kind"] == 1]
        w = ins.merge(outs, on="k")
        return pd.DataFrame(
            {"a": w["x_x"].to_numpy(), "c": w["x_y"].to_numpy()}
        ).assign(kind=1).astype({"a": "int64", "c": "int64", "kind": "int64"})

    wedges = bucketed_map_groups(
        halves, "k", make_wedges, num_buckets=num_buckets, empty_result=empty_kx
    )

    # closure join on (a, c): kind0 = the edge set, kind1 = wedges
    edge_ac = edges.map_batches(
        lambda b: pd.DataFrame(
            {"a": b[src_col].to_numpy(), "c": b[dst_col].to_numpy()}
        ).assign(kind=0).astype({"a": "int64", "c": "int64", "kind": "int64"}),
        batch_format="pandas",
    )

    def close_count(bucket: pd.DataFrame) -> pd.DataFrame:
        e = bucket[bucket["kind"] == 0][["a", "c"]]
        w = bucket[bucket["kind"] == 1][["a", "c"]]
        n = int(len(w.merge(e, on=["a", "c"])))
        return pd.DataFrame({"n": pd.Series([n], dtype="int64")})

    counts = bucketed_map_groups(
        edge_ac.union(wedges),
        "a",
        close_count,
        num_buckets=num_buckets,
        empty_result=pd.DataFrame({"n": pd.Series(dtype="int64")}),
    ).to_pandas()
    return int(counts["n"].sum())


def triangles_per_node(
    edges: ray.data.Dataset,
    *,
    src_col: str = "u",
    dst_col: str = "v",
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Per-node triangle counts (the local part of a clustering
    coefficient) over a canonically-oriented edge list (src < dst, no
    duplicates). Same two-join plan as ``triangle_count``, but the wedge
    rows carry their middle vertex so each closed triangle a<b<c credits
    all three corners; the per-bucket closure emits partial (node, t)
    rows — triangle-count-sized, never wedge-sized — and one grouped sum
    finishes. Nodes in no triangle are absent (callers left-join degrees).
    Same skew note as triangle_count: id-orientation bounds wedge fan-out
    for bounded-degree graphs; degree-orient for power-law graphs."""
    from .agg import bucketed_map_groups, grouped_agg

    def halves(b: pd.DataFrame) -> pd.DataFrame:
        return pd.concat(
            [
                pd.DataFrame(
                    {"k": b[dst_col], "x": b[src_col], "kind": np.int64(0)}
                ),
                pd.DataFrame(
                    {"k": b[src_col], "x": b[dst_col], "kind": np.int64(1)}
                ),
            ],
            ignore_index=True,
        ).astype({"k": "int64", "x": "int64", "kind": "int64"})

    empty_w = pd.DataFrame(
        {
            "a": pd.Series(dtype="int64"),
            "c": pd.Series(dtype="int64"),
            "b": pd.Series(dtype="int64"),
            "kind": pd.Series(dtype="int64"),
        }
    )

    def make_wedges(bucket: pd.DataFrame) -> pd.DataFrame:
        ins = bucket[bucket["kind"] == 0]
        outs = bucket[bucket["kind"] == 1]
        w = ins.merge(outs, on="k")
        return pd.DataFrame(
            {"a": w["x_x"], "c": w["x_y"], "b": w["k"], "kind": np.int64(1)}
        ).astype({"a": "int64", "c": "int64", "b": "int64", "kind": "int64"})

    wedges = bucketed_map_groups(
        edges.map_batches(halves, batch_format="pandas"),
        "k",
        make_wedges,
        num_buckets=num_buckets,
        empty_result=empty_w,
    )
    edge_ac = edges.map_batches(
        lambda b: pd.DataFrame(
            {"a": b[src_col], "c": b[dst_col], "b": np.int64(-1), "kind": np.int64(0)}
        ).astype({"a": "int64", "c": "int64", "b": "int64", "kind": "int64"}),
        batch_format="pandas",
    )

    def close_credit(bucket: pd.DataFrame) -> pd.DataFrame:
        e = bucket[bucket["kind"] == 0][["a", "c"]]
        w = bucket[bucket["kind"] == 1][["a", "c", "b"]]
        tri = w.merge(e, on=["a", "c"])
        if not len(tri):
            return pd.DataFrame(
                {"node": pd.Series(dtype="int64"), "t": pd.Series(dtype="int64")}
            )
        corners = pd.concat([tri["a"], tri["b"], tri["c"]], ignore_index=True)
        out = corners.value_counts().rename_axis("node").reset_index(name="t")
        return out.astype({"node": "int64", "t": "int64"})

    partials = bucketed_map_groups(
        edge_ac.union(wedges),
        "a",
        close_credit,
        num_buckets=num_buckets,
        empty_result=pd.DataFrame(
            {"node": pd.Series(dtype="int64"), "t": pd.Series(dtype="int64")}
        ),
    )
    return grouped_agg(
        partials,
        ["node"],
        {"n_triangles": ("t", "sum")},
        final="bucketed",
        num_buckets=num_buckets,
        empty_result=pd.DataFrame(
            {"node": pd.Series(dtype="int64"), "n_triangles": pd.Series(dtype="int64")}
        ),
    )


def _driver_relax(
    edges: ray.data.Dataset,
    sources: ray.data.Dataset,
    *,
    rounds: int,
    src_col: str,
    dst_col: str,
    source_col: str,
    weight_col: "str | None",
    empty: pd.DataFrame,
) -> ray.data.Dataset:
    """Driver-side bounded-round relaxation shared by the small-graph
    paths of :func:`bfs_distances` (unit weights) and
    :func:`shortest_path_distances` (integer weights). Jacobi iteration:
    each round's candidates derive from the PREVIOUS round's distances
    only, so k rounds relax exactly the <=k-edge paths — the same
    bounded semantics as the distributed loops and the unrolled SQL
    twin (Gauss-Seidel-style in-place updates would leak extra hops
    within a round and overshoot the bound)."""
    sdf = sources.to_pandas()
    if source_col not in sdf.columns:
        sdf = pd.DataFrame({source_col: pd.Series(dtype="int64")})
    edf = edges.to_pandas()
    if src_col not in edf.columns:
        edf = pd.DataFrame(
            {src_col: pd.Series(dtype="int64"), dst_col: pd.Series(dtype="int64"),
             **({weight_col: pd.Series(dtype="int64")} if weight_col else {})}
        )
    s0 = np.unique(sdf[source_col].to_numpy().astype("int64"))
    u = edf[src_col].to_numpy().astype(np.int64)
    v = edf[dst_col].to_numpy().astype(np.int64)
    w = (
        edf[weight_col].to_numpy().astype(np.int64)
        if weight_col is not None
        else np.ones(len(u), dtype=np.int64)
    )
    if weight_col is not None and (w < 0).any():
        raise ValueError("shortest_path_distances: negative weights")
    nodes = np.unique(np.concatenate([u, v, s0]))
    if not len(nodes):
        return ray.data.from_pandas(empty.copy())
    inf = np.iinfo(np.int64).max // 4
    dist = np.full(len(nodes), inf, dtype=np.int64)
    dist[np.searchsorted(nodes, s0)] = 0
    iu = np.searchsorted(nodes, u)
    iv = np.searchsorted(nodes, v)
    for _ in range(rounds):
        prev = dist.copy()
        ok = prev[iu] < inf
        if not ok.any():
            break
        np.minimum.at(dist, iv[ok], prev[iu[ok]] + w[ok])
        if np.array_equal(prev, dist):
            break
    keep = dist < inf
    return ray.data.from_pandas(
        pd.DataFrame({"node": nodes[keep], "dist": dist[keep]}).astype(
            {"node": "int64", "dist": "int64"}
        )
    )


def bfs_distances(
    edges: ray.data.Dataset,
    sources: ray.data.Dataset,
    *,
    hops: int,
    src_col: str = "src",
    dst_col: str = "dst",
    source_col: str = "node",
    num_buckets: int = 32,
    broadcast_max_edges: int = 1_000_000,
) -> ray.data.Dataset:
    """Bounded-hop multi-source BFS: ``(node, dist)`` for every node
    reachable within ``hops`` directed edges of any source, ``dist`` the
    exact minimum hop count (sources are dist 0).

    Adaptive like :func:`pagerank` / :func:`k_core`: an edge list that
    fits on the driver relaxes in a vectorized numpy loop (Jacobi-style
    — each round reads the PREVIOUS round's distances, so the bounded
    round count means exactly what the distributed version and the SQL
    twin mean); above ``broadcast_max_edges`` the BSP loop below runs.

    Distributed path: the shared BSP relaxer (:func:`_bsp_relax`, the
    pagerank shard-actor shape) — edges pinned once by hash(src), each
    round ships only the newly-reached frontier frames in and
    per-(dst, bucket) min-dist partials out (unit-weight BFS finalizes a
    node's dist the round it appears, so the improved set IS the
    frontier). At most ``hops`` rounds, early exit on an empty frontier
    (equal to running the remaining no-op rounds); nothing node- or
    edge-sized lands on the driver.
    """
    empty = pd.DataFrame(
        {"node": pd.Series(dtype="int64"), "dist": pd.Series(dtype="int64")}
    )

    def tag_edges(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"key": b[src_col], "val": b[dst_col], "kind": 1}
        ).astype({"key": "int64", "val": "int64", "kind": "int64"})

    # probe the size on the TAGGED copy (the one the loop keeps) —
    # materializing the raw edges as well would pin a second edge-sized
    # copy in the object store for the whole run
    edge2 = edges.map_batches(tag_edges, batch_format="pandas").materialize()
    if edge2.count() <= broadcast_max_edges:
        # hand _driver_relax the tagged frame under its tagged names —
        # a rename map here would be a whole extra pass over the edges
        return _driver_relax(
            edge2, sources, rounds=hops, src_col="key", dst_col="val",
            source_col=source_col, weight_col=None, empty=empty,
        )

    # shared BSP relaxer (edges pinned once on shard actors; duplicate
    # sources collapse in its per-bucket init groupby-min — visible at
    # hops=0, matching the driver path's np.unique and the twin's
    # GROUP BY; for unit weights the improved set IS the newly-reached
    # frontier, so semantics equal the dist==round expansion)
    reached0 = sources.map_batches(
        lambda b: pd.DataFrame(
            {"node": b[source_col].to_numpy().astype("int64"), "dist": 0}
        ).astype({"node": "int64", "dist": "int64"}),
        batch_format="pandas",
    )
    # the tagged edge2 (key, val, kind) feeds the relaxer directly —
    # _split_by_bucket projects to (key, val) inside the split task, so
    # no extra edge-sized pass or transient duplicate is paid
    return _bsp_relax(
        edge2, reached0, rounds=hops, num_buckets=num_buckets, unit_weight=True
    )


def bfs_sql(
    edges_sql: str, sources_sql: str, *, hops: int, weighted: bool = False
) -> str:
    """DuckDB twin of :func:`bfs_distances` (and, with ``weighted=True``,
    of :func:`shortest_path_distances`): the frontier/relaxation
    recurrence unrolled as chained CTEs (``hops`` is small and fixed, so
    no recursive CTE is needed and the result is engine-order-independent
    — dist is an integer min, exactly as the distributed version computes
    it).

    ``edges_sql`` must yield (src, dst) — plus an integer ``w`` column
    when ``weighted``; ``sources_sql`` must yield (node). Result:
    (node, dist) ordered by node.
    """
    step = "e.w" if weighted else "1"
    parts = [
        f"WITH e AS ({edges_sql}),",
        f"r0 AS (SELECT node, 0::BIGINT AS dist FROM ({sources_sql})),",
    ]
    for i in range(1, hops + 1):
        parts.append(
            f"s{i} AS (SELECT e.dst AS node, r{i-1}.dist + {step} AS dist "
            f"FROM r{i-1} JOIN e ON e.src = r{i-1}.node),"
        )
        parts.append(
            f"r{i} AS (SELECT node, MIN(dist)::BIGINT AS dist FROM "
            f"(SELECT * FROM r{i-1} UNION ALL SELECT * FROM s{i}) GROUP BY node),"
        )
    # strip the trailing comma of the last CTE
    parts[-1] = parts[-1].rstrip(",")
    parts.append(f"SELECT node, dist FROM r{hops} ORDER BY node")
    return "\n".join(parts)


def shortest_path_distances(
    edges: ray.data.Dataset,
    sources: ray.data.Dataset,
    *,
    rounds: int,
    weight_col: str = "w",
    src_col: str = "src",
    dst_col: str = "dst",
    source_col: str = "node",
    num_buckets: int = 32,
    broadcast_max_edges: int = 1_000_000,
) -> ray.data.Dataset:
    """Bounded-round multi-source WEIGHTED shortest paths (integer
    non-negative weights): ``(node, dist)`` with dist the exact minimum
    path weight over paths of <= ``rounds`` edges (the Bellman-Ford
    guarantee — after k rounds every <=k-edge path has been relaxed).

    Unlike unit-weight BFS, a node's distance can IMPROVE after first
    reach, so the frontier is the IMPROVED set, not the newly-reached
    set: each round of the shared BSP relaxer (:func:`_bsp_relax`, edges
    pinned once on shard actors) expands only nodes whose dist changed
    last round. Integer arithmetic keeps the result independent of
    relaxation order, so the unrolled SQL twin (:func:`bfs_sql` with a
    weight expression) is hash-exact.
    """
    empty = pd.DataFrame(
        {"node": pd.Series(dtype="int64"), "dist": pd.Series(dtype="int64")}
    )

    def tag_edges_w(b: pd.DataFrame) -> pd.DataFrame:
        w = b[weight_col].to_numpy()
        # validate on BOTH adaptive paths: the driver kernel raises too,
        # so behavior cannot depend on which side of the threshold runs
        if (w < 0).any():
            raise ValueError("shortest_path_distances: negative weights")
        return pd.DataFrame(
            {"key": b[src_col], "val": b[dst_col], "w": w, "kind": 1}
        ).astype({"key": "int64", "val": "int64", "w": "int64", "kind": "int64"})

    edge2w = edges.map_batches(tag_edges_w, batch_format="pandas").materialize()
    if edge2w.count() <= broadcast_max_edges:
        # adaptive driver fast path (see bfs_distances) — Jacobi rounds
        # keep the bounded-round semantics identical to the BSP loop.
        # The tagged frame goes in under its tagged names (key/val/w);
        # renaming first would cost a whole extra pass over the edges.
        return _driver_relax(
            edge2w, sources, rounds=rounds, src_col="key", dst_col="val",
            source_col=source_col, weight_col="w", empty=empty,
        )

    # shared BSP relaxer — edges pinned once on shard actors, the
    # improved set is the frontier (a weighted dist can improve after
    # first reach, which _bsp_relax's combine flags exactly); duplicate
    # sources collapse in its per-bucket init groupby-min
    reached0 = sources.map_batches(
        lambda b: pd.DataFrame(
            {"node": b[source_col].to_numpy().astype("int64"), "dist": 0}
        ).astype({"node": "int64", "dist": "int64"}),
        batch_format="pandas",
    )
    return _bsp_relax(edge2w, reached0, rounds=rounds, num_buckets=num_buckets)


def k_core(
    edges: ray.data.Dataset,
    k: int,
    *,
    rounds: int,
    src_col: str = "u",
    dst_col: str = "v",
    num_buckets: int = 32,
    broadcast_max_edges: int = 1_000_000,
) -> ray.data.Dataset:
    """Bounded-round k-core peeling over an undirected edge set: run
    exactly ``rounds`` peel steps (drop every node whose current degree
    is < ``k``, discard edges touching a dropped node, repeat) and return
    ``(node, deg)`` for the nodes with deg >= k in the final subgraph.

    Bounded semantics on purpose — like :func:`bfs_distances` and
    :func:`pagerank`, a FIXED round count makes the result
    engine-order-independent, so :func:`k_core_sql` is a hash-exact
    DuckDB twin (an unrolled CTE chain; true peeling is stratified
    negation, which a recursive CTE cannot express). The loop early-stops
    when a round removes nothing, which equals running the remaining
    no-op rounds; pytest covers a planted graph whose peel converges
    within ``rounds`` against the true fixpoint.

    Adaptive like :func:`pagerank` / :func:`connected_components`: an
    edge list that fits on the driver (<= ``broadcast_max_edges``) peels
    in a vectorized numpy loop — 13 tiny Ray sorts for a 4k-edge graph
    measured 40-70 s each under load, while the numpy loop is
    microseconds, so the distributed machinery only engages when the
    edges genuinely don't fit.

    Distributed path: the BSP shard-actor shape shared with the other
    iterative graph ops — edges are pinned ONCE on shard actors (which
    keep a mutable alive-mask, the canonical drop-to-raw-actors case);
    per round the shards emit per-(node, bucket) degree partials, the
    per-bucket reduce finds the DROPPED nodes (0 < deg < k), and the
    round's dropped frames go back to every shard to kill incident
    edges. Per-round traffic = degree partials + the dropped set
    (peel-delta-sized after round 1; round 1 can be large when k is
    high, the one documented fat round) — the edge list itself never
    re-shuffles, where the previous loop paid 3 edge-sized sorts/round.
    """
    empty_deg = pd.DataFrame(
        {"node": pd.Series(dtype="int64"), "deg": pd.Series(dtype="int64")}
    )
    cur = edges.map_batches(
        lambda b: pd.DataFrame(
            {"u": b[src_col], "v": b[dst_col]}
        ).astype({"u": "int64", "v": "int64"}),
        batch_format="pandas",
    ).materialize()

    if cur.count() <= broadcast_max_edges:
        edf = cur.to_pandas()
        if "u" not in edf.columns:  # 0 edges -> schema-less empty
            return ray.data.from_pandas(empty_deg)
        u = edf["u"].to_numpy().astype(np.int64)
        v = edf["v"].to_numpy().astype(np.int64)
        nodes = np.unique(np.concatenate([u, v]))
        idx_u = np.searchsorted(nodes, u)
        idx_v = np.searchsorted(nodes, v)
        alive = np.ones(len(u), dtype=bool)

        def deg_now() -> np.ndarray:
            d = np.zeros(len(nodes), dtype=np.int64)
            np.add.at(d, idx_u[alive], 1)
            np.add.at(d, idx_v[alive], 1)
            return d

        d = deg_now()
        for _ in range(rounds):
            # nodes with deg 0 have no edges left, nothing to peel off them
            bad = (d > 0) & (d < k)
            if not bad.any():
                break
            alive &= ~(bad[idx_u] | bad[idx_v])
            d = deg_now()
        keep = d >= k
        return ray.data.from_pandas(
            pd.DataFrame({"node": nodes[keep], "deg": d[keep]}).astype(
                {"node": "int64", "deg": "int64"}
            )
        )

    # ---- distributed path: BSP peel with a mutable alive-mask -------------
    import ray as _ray

    nb = _bsp_nb(num_buckets)

    edge_pieces = [
        _split_by_bucket.options(num_returns=nb).remote(r, "u", ("u", "v"), nb)
        for r in cur.to_pandas_refs()
    ]

    @_ray.remote
    class _KCoreShard:
        """One u-bucket of edges with a per-edge alive mask — the only
        mutable state; the edges never move after load."""

        def __init__(self, *parts):
            e = pd.concat(parts, ignore_index=True)
            self.u = e["u"].to_numpy().astype(np.int64)
            self.v = e["v"].to_numpy().astype(np.int64)
            self.alive = np.ones(len(e), dtype=bool)

        def deg_partials(self):
            both = np.concatenate([self.u[self.alive], self.v[self.alive]])
            nodes, counts = np.unique(both, return_counts=True)
            c = pd.DataFrame({"node": nodes, "deg": counts}).astype(
                {"node": "int64", "deg": "int64"}
            )
            db = (nodes % nb).astype(np.int64)
            return tuple(c[db == b] for b in range(nb))

        def drop(self, *dropped_frames):
            d = pd.concat(dropped_frames, ignore_index=True)
            if len(d):
                bad = d["node"].to_numpy()
                kill = np.isin(self.u, bad) | np.isin(self.v, bad)
                self.alive &= ~kill
            return 0  # barrier token: the round is applied

    shards = [
        _KCoreShard.remote(*[edge_pieces[i][b] for i in range(len(edge_pieces))])
        for b in range(nb)
    ]

    @_ray.remote(num_returns=2)
    def _deg_reduce(kk: int, *pieces):
        allc = pd.concat(pieces, ignore_index=True)
        if not len(allc):
            e = pd.DataFrame(
                {"node": pd.Series(dtype="int64"), "deg": pd.Series(dtype="int64")}
            )
            return e, e[["node"]]
        deg = allc.groupby("node", as_index=False, sort=False)["deg"].sum()
        deg = deg.astype({"node": "int64", "deg": "int64"})
        # nodes appear only while they have an alive edge, so deg > 0
        dropped = deg.loc[deg["deg"] < kk, ["node"]]
        return deg, dropped

    deg_refs = None
    for _ in range(rounds + 1):
        grid = [
            shards[b].deg_partials.options(num_returns=nb).remote()
            for b in range(nb)
        ]
        pairs = [
            _deg_reduce.remote(k, *[grid[b][d] for b in range(nb)])
            for d in range(nb)
        ]
        deg_refs = [pr[0] for pr in pairs]
        dropped_refs = [pr[1] for pr in pairs]
        if _ == rounds:
            break  # exactly `rounds` peels; this pass only recomputed deg
        if sum(_ray.get([_nrows.remote(r) for r in dropped_refs])) == 0:
            break
        # apply the round's drops on every shard (full dropped set — the
        # one per-round fat payload; delta-sized after round 1)
        _ray.get([sh.drop.remote(*dropped_refs) for sh in shards])

    deg = ray.data.from_pandas_refs(deg_refs)
    return deg.map_batches(
        lambda b, kk=k: b[b["deg"] >= kk], batch_format="pandas"
    )


def k_core_sql(edges_sql: str, k: int, *, rounds: int) -> str:
    """DuckDB twin of :func:`k_core`: the peel recurrence unrolled as
    chained CTEs over the same (u, v) edge query. Result: (node, deg)
    with deg >= k after exactly ``rounds`` peels, ordered by node."""
    # AS MATERIALIZED is load-bearing: each e_i is referenced ~4 times
    # (twice in d_i, twice in e_{i+1}), so DuckDB's default CTE inlining
    # re-expands the chain EXPONENTIALLY (4^rounds copies of the base
    # self-join) and a rounds>=4 twin never finishes
    parts = [f"WITH e0 AS MATERIALIZED ({edges_sql}),"]
    for i in range(rounds + 1):
        parts.append(
            f"d{i} AS MATERIALIZED (SELECT node, COUNT(*)::BIGINT AS deg FROM "
            f"(SELECT u AS node FROM e{i} UNION ALL SELECT v FROM e{i}) "
            f"GROUP BY node),"
        )
        if i == rounds:
            break
        parts.append(
            f"s{i} AS MATERIALIZED (SELECT node FROM d{i} WHERE deg >= {k}),"
        )
        parts.append(
            f"e{i+1} AS MATERIALIZED (SELECT u, v FROM e{i} "
            f"WHERE u IN (SELECT node FROM s{i}) "
            f"AND v IN (SELECT node FROM s{i})),"
        )
    parts[-1] = parts[-1].rstrip(",")
    parts.append(
        f"SELECT node, deg FROM d{rounds} WHERE deg >= {k} ORDER BY node"
    )
    return "\n".join(parts)


def common_neighbor_scores(
    edges: ray.data.Dataset,
    *,
    min_cn: int = 2,
    num_buckets: int = 32,
    max_center_degree: int | None = None,
) -> ray.data.Dataset:
    """Link-prediction evidence over an undirected distinct edge set
    (u < v): for every NON-adjacent node pair sharing >= ``min_cn``
    neighbors, emit (a, b, cn, deg_a, deg_b).

    Shape: wedge generation is one bucketed merge keyed on the wedge
    CENTER (quadratic in center degree — callers either bound it by
    thresholding the graph first, like the co-purchase weight filter, or
    pass ``max_center_degree`` to SKIP hub centers with a loud log, the
    same defense the LSH band caps use; skipping a hub loses only the
    evidence routed THROUGH it, approximate by declaration), a bucketed
    (a, b) count, a distributed left_anti hash join against the edges,
    then two degree hash joins. Nothing node- or pair-sized lands on the
    driver."""
    import logging

    from .joins import hash_join

    log = logging.getLogger(__name__)

    edges = edges.map_batches(
        lambda b: b[["u", "v"]].astype({"u": "int64", "v": "int64"}),
        batch_format="pandas",
    ).materialize()

    empty_out = pd.DataFrame(
        {
            "a": pd.Series(dtype="int64"),
            "b": pd.Series(dtype="int64"),
            "cn": pd.Series(dtype="int64"),
            "deg_a": pd.Series(dtype="int64"),
            "deg_b": pd.Series(dtype="int64"),
        }
    )
    # a thresholded graph can legitimately be EMPTY at some scales —
    # skip the three bucketed stages + join guards entirely (each runs a
    # full sort pipeline even over zero rows, ~1s apiece of pure
    # overhead measured at sf0.1)
    if edges.count() == 0:
        return ray.data.from_pandas(empty_out)

    def both_dirs(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "c": np.concatenate([b["u"].to_numpy(), b["v"].to_numpy()]),
                "n": np.concatenate([b["v"].to_numpy(), b["u"].to_numpy()]),
            }
        ).astype({"c": "int64", "n": "int64"})

    nb = edges.map_batches(both_dirs, batch_format="pandas")

    def wedges(bucket: pd.DataFrame) -> pd.DataFrame:
        if max_center_degree is not None:
            sizes = bucket.groupby("c", sort=False)["n"].transform("size")
            hubs = sizes > max_center_degree
            if bool(hubs.any()):
                log.warning(
                    "common_neighbor_scores: skipping %d hub centers with "
                    "degree > %d (quadratic wedge guard)",
                    bucket.loc[hubs, "c"].nunique(),
                    max_center_degree,
                )
                bucket = bucket[~hubs]
        m = bucket.merge(bucket, on="c")
        m = m[m["n_x"] < m["n_y"]]
        return pd.DataFrame(
            {"a": m["n_x"].to_numpy(), "b": m["n_y"].to_numpy()}
        ).astype({"a": "int64", "b": "int64"})

    empty_ab = pd.DataFrame(
        {"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64")}
    )
    wedge_ds = bucketed_map_groups(
        nb, "c", wedges, num_buckets=num_buckets, empty_result=empty_ab
    )
    cn = grouped_agg(
        wedge_ds,
        ["a", "b"],
        {"cn": ("a", "count")},
        final="bucketed",
        num_buckets=max(8, num_buckets // 2),
        empty_result=pd.DataFrame(
            {
                "a": pd.Series(dtype="int64"),
                "b": pd.Series(dtype="int64"),
                "cn": pd.Series(dtype="int64"),
            }
        ),
    ).map_batches(lambda b, mc=min_cn: b[b["cn"] >= mc], batch_format="pandas")

    # materialize+count guards: an ALL-empty side reaches Arrow's hash
    # join as schema-less blocks and acero raises ("No match for key
    # field") — sparse graphs legitimately produce zero cn>=min_cn pairs
    cn = cn.materialize()
    if cn.count() == 0:
        return ray.data.from_pandas(empty_out)

    # coalesce blocks before every hash join: sparse bucketed stages emit
    # schema-less EMPTY blocks that Arrow's acero join rejects;
    # repartition merges them into typed blocks (candidate-sized, cheap —
    # the dedup/similarity verify tails use the same guard)
    coalesce = max(2, num_buckets // 4)
    cn = cn.repartition(coalesce)
    edges = edges.repartition(coalesce)

    cand = hash_join(
        cn, edges, "left_anti", on=("a", "b"), right_on=("u", "v")
    ).materialize()
    if cand.count() == 0:
        return ray.data.from_pandas(empty_out)
    cand = cand.repartition(coalesce)

    deg = grouped_agg(
        nb,
        ["c"],
        {"deg": ("c", "count")},
        final="bucketed",
        num_buckets=max(8, num_buckets // 2),
        empty_result=pd.DataFrame(
            {"c": pd.Series(dtype="int64"), "deg": pd.Series(dtype="int64")}
        ),
    )
    deg = deg.repartition(coalesce)
    da = hash_join(cand, deg, "inner", on=("a",), right_on=("c",)).map_batches(
        lambda b: b.rename(columns={"deg": "deg_a"}), batch_format="pandas"
    )
    return hash_join(
        da.repartition(coalesce), deg, "inner", on=("b",), right_on=("c",)
    ).map_batches(
        lambda b: b.rename(columns={"deg": "deg_b"}), batch_format="pandas"
    )


def top_jaccard_pairs(scored: ray.data.Dataset, k: int) -> pd.DataFrame:
    """Driver-side top-k of :func:`common_neighbor_scores` output by
    (cn DESC, a, b) — a total order, since (a, b) is unique — with the
    exact-ratio Jaccard cn / (deg_a + deg_b - cn) attached. Per-block
    partial top-k first, so only k rows per block reach the driver."""
    from .agg import to_pandas_safe

    def partial_topk(b: pd.DataFrame) -> pd.DataFrame:
        return b.sort_values(["cn", "a", "b"], ascending=[False, True, True]).head(k)

    empty = pd.DataFrame(
        {
            c: pd.Series(dtype="int64")
            for c in ("a", "b", "cn", "deg_a", "deg_b")
        }
    )
    parts = to_pandas_safe(
        scored.map_batches(partial_topk, batch_format="pandas"), empty
    )
    top = (
        parts.sort_values(["cn", "a", "b"], ascending=[False, True, True])
        .head(k)
        .reset_index(drop=True)
    )
    cn = top["cn"].to_numpy().astype("int64")
    union = (
        top["deg_a"].to_numpy().astype("int64")
        + top["deg_b"].to_numpy().astype("int64")
        - cn
    )
    return pd.DataFrame(
        {
            "a": top["a"].to_numpy().astype("int64"),
            "b": top["b"].to_numpy().astype("int64"),
            "cn": cn,
            "jaccard": cn.astype("float64") / union.astype("float64"),
        }
    )


# --- label propagation (community detection) ----------------------------------


def label_propagation(
    edges: ray.data.Dataset,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    rounds: int = 5,
    num_buckets: int = 32,
    broadcast_max_edges: int = 1_000_000,
    force_branch: str | None = None,
) -> ray.data.Dataset:
    """Synchronous label-propagation communities (Raghavan et al. 2007),
    made DETERMINISTIC so an iterative community algorithm gets a
    hash-exact DuckDB twin (``label_propagation_sql`` — the pagerank
    trick applied to LPA):

    - edges are deduped and self-loops dropped; a vote travels src->dst,
      so an undirected graph is expressed as a bidirected edge list
      (exactly the shared purchase-graph convention);
    - label0(v) = v;
    - each round, v adopts the neighbor label with the HIGHEST vote
      count, ties broken by SMALLEST label (total order — the classic
      random tie-break is what makes textbook LPA non-deterministic);
      a node with no in-edges keeps its label;
    - JACOBI updates (every round reads the previous round's labels), so
      ``rounds`` means the same thing on the driver path, the
      distributed path, and in the unrolled SQL twin.

    Adaptive like :func:`pagerank`: under ``broadcast_max_edges`` the
    loop runs vectorized int64 numpy on the driver; above it, the
    pagerank-shaped BSP path — edges split ONCE onto shard actors by
    hash(src), each round shipping only node-sized label frames in and
    per-(dst, label) compressed vote partials out (a first union-loop
    version re-sorted the edge list twice per round: 453 s at sf0.1
    for a 19 MB pair list, ~8 Ray sort jobs at 40-70 s fixed cost).
    Nothing node- or edge-sized lands on the driver on this path.
    ``force_branch`` ("driver" | "bsp") pins the path for parity tests.
    Returns (node, label) int64."""
    from .agg import bucketed_map_groups, grouped_agg, use_fast_branch

    empty_e = pd.DataFrame(
        {"src": pd.Series(dtype="int64"), "dst": pd.Series(dtype="int64")}
    )
    dedup = bucketed_map_groups(
        edges.map_batches(
            lambda b: pd.DataFrame(
                {"src": b[src_col], "dst": b[dst_col]}
            ).astype({"src": "int64", "dst": "int64"}),
            batch_format="pandas",
        ),
        "src",
        lambda b: b[b["src"] != b["dst"]].drop_duplicates(["src", "dst"]),
        num_buckets=num_buckets,
        empty_result=empty_e,
    ).materialize()

    empty_l = pd.DataFrame(
        {"node": pd.Series(dtype="int64"), "label": pd.Series(dtype="int64")}
    )
    n_edges = dedup.count()
    if n_edges == 0:
        return ray.data.from_pandas(empty_l)

    if use_fast_branch(
        force_branch,
        fast="driver",
        slow="bsp",
        count=n_edges,
        cap=broadcast_max_edges,
    ):
        edf = dedup.to_pandas()
        nodes = np.unique(np.concatenate([edf["src"], edf["dst"]])).astype("int64")
        s = np.searchsorted(nodes, edf["src"].to_numpy())
        d = np.searchsorted(nodes, edf["dst"].to_numpy())
        label = np.arange(len(nodes), dtype=np.int64)  # positions of nodes
        for _ in range(rounds):
            lv = label[s]  # src labels as POSITIONS (nodes order == id order,
            # so min-position ties == min-label ties)
            order = np.lexsort((lv, d))
            ds_, ls_ = d[order], lv[order]
            grp = np.empty(len(ds_), dtype=bool)
            grp[0] = True
            grp[1:] = (ds_[1:] != ds_[:-1]) | (ls_[1:] != ls_[:-1])
            gi = np.flatnonzero(grp)
            counts = np.diff(np.append(gi, len(ds_)))
            gd, gl = ds_[gi], ls_[gi]
            o2 = np.lexsort((gl, -counts, gd))
            gd2 = gd[o2]
            first = np.empty(len(gd2), dtype=bool)
            first[0] = True
            first[1:] = gd2[1:] != gd2[:-1]
            nxt = label.copy()
            nxt[gd2[first]] = gl[o2][first]
            label = nxt
        return ray.data.from_pandas(
            pd.DataFrame({"node": nodes, "label": nodes[label]}).astype(
                {"node": "int64", "label": "int64"}
            )
        )

    # ---- distributed path: BSP with edge shards pinned on actors ----------
    # Same shape as pagerank's scale path: edges are split ONCE onto shard
    # actors by hash(src); per round only node-sized label frames ship in
    # and per-(dst, label) COMPRESSED vote partials ship out — the edges
    # never move again (the earlier union-loop re-sorted the edge list
    # twice per round: ~8 Ray sort jobs for 4 rounds, 40-70 s each).
    import ray as _ray

    nb = _bsp_nb(num_buckets)

    nodes_ds = grouped_agg(
        dedup.map_batches(
            lambda b: pd.DataFrame(
                {
                    "node": pd.concat([b["src"], b["dst"]], ignore_index=True),
                    "one": 1,
                }
            ).astype({"node": "int64", "one": "int64"}),
            batch_format="pandas",
        ),
        ["node"],
        {"one": ("one", "min")},
        final="bucketed",
        num_buckets=nb,
        empty_result=pd.DataFrame(
            {"node": pd.Series(dtype="int64"), "one": pd.Series(dtype="int64")}
        ),
        # the 'one' column exists only to satisfy grouped_agg's spec;
        # _split_by_bucket projects to ("node",) INSIDE the split task, so
        # no separate drop pass is needed before the BSP fan-out
    ).materialize()

    edge_pieces = [
        _split_by_bucket.options(num_returns=nb).remote(r, "src", ("src", "dst"), nb)
        for r in dedup.to_pandas_refs()
    ]
    node_pieces = [
        _split_by_bucket.options(num_returns=nb).remote(r, "node", ("node",), nb)
        for r in nodes_ds.to_pandas_refs()
    ]

    @_ray.remote
    class _LPAShard:
        """One src-bucket of edges for the whole job, pre-grouped by
        destination bucket."""

        def __init__(self, *parts):
            e = pd.concat(parts, ignore_index=True)
            e["_db"] = (e["dst"].to_numpy() % nb).astype("int64")
            self.e = e

        def votes(self, labels: pd.DataFrame):
            j = self.e.merge(labels, left_on="src", right_on="node")
            # compress to per-(dst, label) partial counts before shipping
            c = (
                j.groupby(["dst", "label", "_db"], as_index=False, sort=False)
                .size()
                .rename(columns={"size": "cnt"})
                .astype({"dst": "int64", "label": "int64", "cnt": "int64"})
            )
            return tuple(
                c.loc[c["_db"] == b, ["dst", "label", "cnt"]] for b in range(nb)
            )

    shards = [
        _LPAShard.remote(*[edge_pieces[i][b] for i in range(len(edge_pieces))])
        for b in range(nb)
    ]

    @_ray.remote
    def _init_labels(*parts):
        m = (
            pd.concat(parts, ignore_index=True)
            if parts
            else pd.DataFrame({"node": pd.Series(dtype="int64")})
        )
        return pd.DataFrame({"node": m["node"], "label": m["node"]}).astype(
            {"node": "int64", "label": "int64"}
        )

    label_refs = [
        _init_labels.remote(*[node_pieces[i][b] for i in range(len(node_pieces))])
        for b in range(nb)
    ]

    @_ray.remote
    def _reduce(prev: pd.DataFrame, *pieces):
        allv = pd.concat(pieces, ignore_index=True)
        out = prev.copy()
        if len(allv):
            c = (
                allv.groupby(["dst", "label"], as_index=False, sort=False)["cnt"]
                .sum()
                .sort_values(["dst", "cnt", "label"], ascending=[True, False, True])
            )
            win = c.drop_duplicates("dst")
            # int64 end to end: positional indexer instead of a merge —
            # a left-merge NaN would upcast labels >= 2^53 through
            # float64 (the pagerank _reduce comment's bug class)
            idx = pd.Index(win["dst"].to_numpy())
            pos = idx.get_indexer(out["node"].to_numpy())
            lab = out["label"].to_numpy().copy()
            m = pos >= 0
            lab[m] = win["label"].to_numpy()[pos[m]]
            out["label"] = lab
        return out[["node", "label"]].astype({"node": "int64", "label": "int64"})

    for _ in range(rounds):
        grid = [
            shards[b].votes.options(num_returns=nb).remote(label_refs[b])
            for b in range(nb)
        ]
        label_refs = [
            _reduce.remote(label_refs[d], *[grid[b][d] for b in range(nb)])
            for d in range(nb)
        ]

    # NB: don't ray.kill the shards here — the final round's votes calls
    # may still be queued; the handles go out of scope on return and Ray
    # reaps the actors once their pending calls drain (same contract as
    # pagerank's shard pool).
    out = ray.data.from_pandas_refs(label_refs)
    return out.map_batches(
        lambda b: b[["node", "label"]].astype({"node": "int64", "label": "int64"}),
        batch_format="pandas",
    )


def label_propagation_sql(edges_sql: str, *, rounds: int = 5) -> str:
    """DuckDB twin of :func:`label_propagation`: the Jacobi vote/argmax
    recurrence unrolled as chained CTEs (``AS MATERIALIZED`` — DuckDB's
    default CTE inlining re-expands a chained graph recurrence
    EXPONENTIALLY, the k_core lesson). ``edges_sql`` must yield
    (src, dst); dedup + self-loop drop happen here, mirroring the op."""
    parts = [
        "WITH e AS MATERIALIZED (SELECT DISTINCT src, dst FROM "
        f"({edges_sql}) WHERE src <> dst),",
        "n AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e),",
        "l0 AS MATERIALIZED (SELECT node, node AS label FROM n),",
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"v{i} AS MATERIALIZED (SELECT e.dst AS node, l.label, "
            f"COUNT(*)::BIGINT AS c FROM e JOIN l{i - 1} l ON l.node = e.src "
            f"GROUP BY e.dst, l.label),"
        )
        parts.append(
            f"a{i} AS MATERIALIZED (SELECT node, label FROM v{i} QUALIFY "
            f"ROW_NUMBER() OVER (PARTITION BY node ORDER BY c DESC, label ASC) = 1),"
        )
        parts.append(
            f"l{i} AS MATERIALIZED (SELECT l.node, "
            f"COALESCE(a.label, l.label)::BIGINT AS label "
            f"FROM l{i - 1} l LEFT JOIN a{i} a ON a.node = l.node),"
        )
    parts[-1] = parts[-1].rstrip(",")
    parts.append(f"SELECT node, label FROM l{rounds} ORDER BY node")
    return "\n".join(parts)
