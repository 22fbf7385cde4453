"""Graph operators over edge lists — the missing piece between pair-wise
near-dup detection and actual corpus deduplication: duplicate PAIRS chain
(A~B, B~C) into CLUSTERS, and the keep-one-representative decision needs
the connected component, not the pair.

``connected_components``: distributed min-label propagation. Labels start
as the node id; each round hash-joins labels across edges and takes the
per-node min; converged when the (exact, driver-side Python int) sum of
labels stops decreasing — a monotone scalar, so convergence detection
costs one tiny aggregate per round instead of a full old-vs-new join.
Rounds needed = graph diameter; near-dup clusters are shallow (a few
hops), so this terminates in a handful of rounds at any corpus size.
Every round is two bucketed shuffles (co-locate edges with their source
label -> carry; min-combine per node) — union + bucketed merge rather
than ``Dataset.join`` because the iterative loop must tolerate the
schema-less empty blocks sparse bucketed stages emit (Arrow's hash join
rejects them; pandas merges inside our own buckets do not). Nothing is
driver-side but the convergence scalar.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from .agg import bucketed_map_groups, grouped_agg

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

    # undirected edges, tagged for the union: (key=src, kind=1, val=dst)
    def both_dirs(b: pd.DataFrame) -> pd.DataFrame:
        fwd = pd.DataFrame({"key": b[src_col], "val": b[dst_col]})
        rev = pd.DataFrame({"key": b[dst_col], "val": b[src_col]})
        out = pd.concat([fwd, rev], ignore_index=True)
        out["kind"] = 1
        return out.astype({"key": "int64", "val": "int64", "kind": "int64"})

    edge2 = edges.map_batches(both_dirs, batch_format="pandas").materialize()

    labels = nodes.map_batches(
        lambda b: pd.DataFrame(
            {"node": b[node_col].to_numpy().astype("int64"),
             "label": b[node_col].to_numpy().astype("int64")}
        ),
        batch_format="pandas",
    ).materialize()

    def label_sum(ds: ray.data.Dataset) -> int:
        parts = ds.map_batches(
            lambda b: pd.DataFrame({"s": [int(b["label"].sum())]}),
            batch_format="pandas",
        ).to_pandas()
        return int(parts["s"].sum())

    empty_lab = pd.DataFrame(
        {"node": pd.Series(dtype="int64"), "label": pd.Series(dtype="int64")}
    )

    def propagate(bucket: pd.DataFrame) -> pd.DataFrame:
        lab = bucket[bucket["kind"] == 0]
        edg = bucket[bucket["kind"] == 1]
        own = pd.DataFrame(
            {"node": lab["key"].to_numpy(), "label": lab["val"].to_numpy()}
        )
        carried = edg.merge(
            lab[["key", "val"]].rename(columns={"val": "label"}), on="key"
        )
        car = pd.DataFrame(
            {"node": carried["val"].to_numpy(), "label": carried["label"].to_numpy()}
        )
        return pd.concat([own, car], ignore_index=True).astype(
            {"node": "int64", "label": "int64"}
        )

    prev = label_sum(labels)
    for _it in range(max_iters):
        tagged = labels.map_batches(
            lambda b: pd.DataFrame(
                {"key": b["node"], "val": b["label"], "kind": 0}
            ).astype({"key": "int64", "val": "int64", "kind": "int64"}),
            batch_format="pandas",
        )
        # shuffle 1: co-locate each edge with its source's label -> carry
        prop = bucketed_map_groups(
            tagged.union(edge2),
            "key",
            propagate,
            num_buckets=num_buckets,
            empty_result=empty_lab,
        )
        # shuffle 2: min label per node
        labels = grouped_agg(
            prop,
            ["node"],
            {"label": ("label", "min")},
            final="bucketed",
            num_buckets=num_buckets,
            empty_result=empty_lab,
        ).materialize()
        cur = label_sum(labels)
        if cur == prev:
            break
        prev = cur
    else:
        # returning partially-converged labels would silently split any
        # component whose diameter exceeds max_iters (e.g. a long chain of
        # drifting boilerplate) and elect wrong representatives downstream
        raise RuntimeError(
            f"connected_components: not converged in {max_iters} rounds — "
            "a component's diameter exceeds max_iters; raise max_iters "
            "(rounds cost 2 bucketed shuffles each)"
        )

    return labels.map_batches(
        lambda b: b.rename(columns={"label": "cluster_id"}).astype(
            {"node": "int64", "cluster_id": "int64"}
        ),
        batch_format="pandas",
    )
