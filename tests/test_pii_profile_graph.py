"""Tests for the round-3 batch: PII redaction (incl. Python-re vs RE2
parity), bounded-hop BFS, table profiling, unpivot, and the bucketed full
outer join used by q_full_outer_year_activity."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data

ADVERSARIAL_PII = [
    "contact john.doe+spam@ex-ample.co.uk or 555-123-4567 now",
    "ip 192.168.0.1 and 1234.5.6.7 and 10.0.0.255.3",
    "a@b.c x@y.zz 123.456.7890 123-456-7890.",
    "no pii here",
    "edge a.b@c.d.ee end",
    "email@domain.com.",
    "phones 000.000.0000 0000-000-0000 weird 12.34.56.78.90",
    "",
    "a@@b.cc double at, trailing 1.2.3.4",
    "999-999-9999 at line start and end 1.1.1.1",
]


def test_pii_python_matches_duckdb_re2():
    """The whole oracle strategy rests on Python re and RE2 producing
    byte-identical replacements for the restricted patterns — pin it on
    adversarial inputs (overlong octets, trailing dots, chained rules)."""
    import duckdb

    from ocds_entity_extract_ray.ops.pii import (
        pii_count_sql_exprs,
        pii_sql_expr,
        redact_frame,
    )

    df = pd.DataFrame({"text": ADVERSARIAL_PII})
    got = redact_frame(df.copy(), "text", "redacted")

    con = duckdb.connect()
    counts = pii_count_sql_exprs("text")
    sql = (
        f"SELECT {pii_sql_expr('text')} AS redacted, "
        + ", ".join(f"{e} AS {n}" for n, e in counts.items())
        + " FROM df"
    )
    con.register("df", df)
    want = con.execute(sql).df()
    assert list(got["redacted"]) == list(want["redacted"])
    for col in counts:
        assert list(got[col]) == list(want[col]), col


def test_redact_pii_dataset(ray_session):
    from ocds_entity_extract_ray.ops.pii import redact_pii

    ds = ray.data.from_pandas(pd.DataFrame({"text": ADVERSARIAL_PII}))
    out = redact_pii(ds, "text").to_pandas()
    assert "<EMAIL>" in out["text"].iloc[0] and "<PHONE>" in out["text"].iloc[0]
    assert out["n_ips"].iloc[1] == 2
    # in-place mode replaces the column; counts are attached
    assert {"n_emails", "n_phones", "n_ips"} <= set(out.columns)


def test_redact_frame_null_propagates_and_no_mutation():
    """NULL text -> NULL redacted + NULL counts (matching the SQL twin),
    and the input frame is left untouched."""
    from ocds_entity_extract_ray.ops.pii import redact_frame

    df = pd.DataFrame({"text": ["a@b.cc ok", None]})
    out = redact_frame(df, "text", "redacted")
    assert out["redacted"].iloc[0] == "<EMAIL> ok"
    assert pd.isna(out["redacted"].iloc[1]) and pd.isna(out["n_emails"].iloc[1])
    assert out["n_emails"].iloc[0] == 1
    assert list(df.columns) == ["text"]  # input not mutated


def test_profile_table_empty_dataset(ray_session):
    """Zero input blocks -> one all-zero row per column, like the twin."""
    from ocds_entity_extract_ray.ops.profile import profile_table

    ds = ray.data.from_pandas(
        pd.DataFrame({"k": pd.Series(dtype="int64")})
    )
    out = profile_table(ds, ["k"], num_buckets=2)
    assert len(out) == 1
    row = out.iloc[0]
    assert row["n_rows"] == 0 and row["n_nulls"] == 0 and row["n_distinct"] == 0
    assert row["min_value"] is None and row["max_value"] is None


def test_bfs_distances_planted_graph(ray_session):
    """Chain 0-1-2-3-4 plus a shortcut 0-3: dist(3) must take the
    shortcut (1 hop), dist(4)=2; node 9 is isolated and absent."""
    from ocds_entity_extract_ray.ops.graph import bfs_distances

    e = pd.DataFrame(
        {"src": [0, 1, 2, 3, 0], "dst": [1, 2, 3, 4, 3]}
    )
    both = pd.concat(
        [e, e.rename(columns={"src": "dst", "dst": "src"})], ignore_index=True
    )
    out = bfs_distances(
        ray.data.from_pandas(both),
        ray.data.from_pandas(pd.DataFrame({"node": [0]})),
        hops=3,
    ).to_pandas()
    dist = dict(zip(out["node"], out["dist"]))
    assert dist == {0: 0, 1: 1, 2: 2, 3: 1, 4: 2}


def test_bfs_sql_matches_op(ray_session):
    """Random sparse graph: the unrolled-CTE oracle and the distributed
    op agree exactly (the conformance the driver will re-check)."""
    import duckdb

    from ocds_entity_extract_ray.ops.graph import bfs_distances, bfs_sql

    rng = np.random.default_rng(7)
    e = pd.DataFrame(
        {"src": rng.integers(0, 60, 150), "dst": rng.integers(0, 60, 150)}
    ).drop_duplicates()
    # bme=0 forces the DISTRIBUTED BSP loop; the planted-graph tests
    # cover the driver fast path
    out = (
        bfs_distances(
            ray.data.from_pandas(e),
            ray.data.from_pandas(pd.DataFrame({"node": [0, 1]})),
            hops=4,
            num_buckets=8,
            broadcast_max_edges=0,
        )
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("edges", e)
    want = con.execute(
        bfs_sql(
            "SELECT src, dst FROM edges",
            "SELECT UNNEST([0, 1]) AS node",
            hops=4,
        )
    ).df()
    pd.testing.assert_frame_equal(
        out.astype({"node": "int64", "dist": "int64"}),
        want.astype({"node": "int64", "dist": "int64"}),
    )


def test_profile_table_exact(ray_session):
    from ocds_entity_extract_ray.ops.profile import profile_table

    df = pd.DataFrame(
        {
            "k": [3, 1, 2, None, 10],
            "s": ["b", None, "a", "a", "z"],
            "t": pd.to_datetime(
                ["2024-01-02", "2024-01-01", None, "2024-03-01", "2024-01-01"]
            ),
        }
    ).astype({"k": "Int64"})
    out = profile_table(
        ray.data.from_pandas(df), ["k", "s", "t"], num_buckets=4
    ).set_index("col_name")
    assert out.loc["k", "n_nulls"] == 1 and out.loc["k", "n_distinct"] == 4
    # native comparison: min is 1, not "1" vs "10" string-min confusion
    assert out.loc["k", "min_value"] == "1" and out.loc["k", "max_value"] == "10"
    assert out.loc["s", "n_distinct"] == 3 and out.loc["s", "min_value"] == "a"
    assert out.loc["t", "min_value"] == "2024-01-01 00:00:00"
    assert int(out["n_rows"].iloc[0]) == 5


def test_profile_table_distinct_is_render_faithful(ray_session):
    """n_distinct counts RENDERED strings (the SQL twin's COUNT(DISTINCT
    rendered)). An object column mixing 1 / 1.0 / True hash-collapses
    under native drop_duplicates — the map-side pre-dedup must not let
    that shrink the count or make it block-boundary-dependent."""
    from ocds_entity_extract_ray.ops.profile import profile_table

    df = pd.DataFrame({"v": pd.Series([1, 1.0, True, 1, True], dtype="object")})
    # two blocks so equal-native values straddle a block boundary
    ds = ray.data.from_pandas([df.iloc[:2], df.iloc[2:]])
    out = profile_table(ds, ["v"], num_buckets=2).set_index("col_name")
    assert out.loc["v", "n_distinct"] == 3  # '1', '1.0', 'True'


def test_profile_table_hll_mode(ray_session):
    """The HLL distinct path (the 100 TB default): same schema as the
    exact profile, n_distinct within the sketch's error bound, and the
    auto threshold actually switches — hll_threshold=0 must yield the
    HLL estimates, the default threshold the exact counts."""
    import numpy as np

    from ocds_entity_extract_ray.ops.profile import profile_table

    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 1500, 5000),
            "s": [f"dom{v}.example" for v in rng.integers(0, 800, 5000)],
        }
    ).astype({"k": "int64"})
    ds = ray.data.from_pandas(df).repartition(8)

    exact = profile_table(ds, ["k", "s"], num_buckets=4).set_index("col_name")
    hll = profile_table(
        ds, ["k", "s"], num_buckets=4, distinct_mode="hll"
    ).set_index("col_name")
    assert list(exact.columns) == list(hll.columns)
    for c in ("k", "s"):
        true = exact.loc[c, "n_distinct"]
        est = hll.loc[c, "n_distinct"]
        assert abs(est - true) / true < 0.05, (c, est, true)
        # the non-distinct stats are identical regardless of mode
        for stat in ("n_rows", "n_nulls", "min_value", "max_value"):
            assert exact.loc[c, stat] == hll.loc[c, stat]

    auto_hll = profile_table(ds, ["k", "s"], num_buckets=4, hll_threshold=0)
    pd.testing.assert_frame_equal(auto_hll.set_index("col_name"), hll)
    auto_exact = profile_table(ds, ["k", "s"], num_buckets=4)  # default: 10M
    pd.testing.assert_frame_equal(auto_exact.set_index("col_name"), exact)

    with pytest.raises(ValueError, match="unknown distinct_mode"):
        profile_table(ds, ["k"], distinct_mode="bogus")


def test_profile_table_rejects_floats(ray_session):
    from ocds_entity_extract_ray.ops.profile import profile_table

    ds = ray.data.from_pandas(pd.DataFrame({"x": [1.5, 2.5]}))
    # Ray wraps the worker's TypeError — pin the contract via the message
    with pytest.raises(Exception, match="unsupported dtype"):
        profile_table(ds, ["x"])


def test_unpivot_roundtrip(ray_session):
    from ocds_entity_extract_ray.ops.reshape import unpivot

    df = pd.DataFrame({"id": [1, 2], "a": [10, 20], "b": [30, 40]})
    out = (
        unpivot(ray.data.from_pandas(df), ["id"], ["a", "b"])
        .to_pandas()
        .sort_values(["id", "metric"])
        .reset_index(drop=True)
    )
    assert len(out) == 4
    assert out.loc[(out["id"] == 2) & (out["metric"] == "b"), "value"].iloc[0] == 40


def test_full_outer_query_extends_both_sides(ray_session, tmp_path):
    """Synthesize a tiny orders table where some customers are only
    active in one of the two years — both null-extension directions must
    appear, coalesced to 0."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ocds_entity_extract_ray.pipelines.relational import (
        q_full_outer_year_activity,
    )

    dates = pd.to_datetime(
        ["1995-02-01", "1995-03-01", "2001-02-01", "1995-05-05", "2001-07-07"]
    )
    df = pd.DataFrame(
        {
            "o_custkey": [1, 1, 1, 2, 3],
            "o_orderdate": dates,
            "o_orderkey": range(5),
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "orders.parquet")
    out = q_full_outer_year_activity(str(tmp_path)).set_index("custkey")
    assert out.loc[1, "n_1995"] == 2 and out.loc[1, "n_2001"] == 1
    assert out.loc[2, "n_1995"] == 1 and out.loc[2, "n_2001"] == 0
    assert out.loc[3, "n_1995"] == 0 and out.loc[3, "n_2001"] == 1


def test_latest_by_key_ascending_first_value(ray_session):
    from ocds_entity_extract_ray.ops.agg import latest_by_key

    df = pd.DataFrame(
        {"k": [1, 1, 1, 2], "v": [5, 3, 9, 7], "id": [10, 11, 12, 13]}
    )
    ds = ray.data.from_pandas(df)
    first = latest_by_key(ds, "k", ["v", "id"], ascending=True).to_pandas()
    last = latest_by_key(ds, "k", ["v", "id"]).to_pandas()
    f = dict(zip(first["k"], first["v"]))
    l = dict(zip(last["k"], last["v"]))
    assert f == {1: 3, 2: 7} and l == {1: 9, 2: 7}


def test_shortest_paths_weighted_planted(ray_session):
    """Triangle 0-1 (w=10), 1-2 (w=1), 0-2 (w=2): dist(2)=2 via the direct
    edge, dist(1)=3 via 0->2->1 (NOT the direct w=10 edge) — requires the
    improved-set frontier to re-relax node 1 after round 1."""
    from ocds_entity_extract_ray.ops.graph import shortest_path_distances

    e = pd.DataFrame(
        {"src": [0, 1, 1, 2, 0, 2], "dst": [1, 0, 2, 1, 2, 0],
         "w": [10, 10, 1, 1, 2, 2]}
    )
    out = shortest_path_distances(
        ray.data.from_pandas(e),
        ray.data.from_pandas(pd.DataFrame({"node": [0]})),
        rounds=4,
        num_buckets=4,
    ).to_pandas()
    dist = dict(zip(out["node"], out["dist"]))
    assert dist == {0: 0, 1: 3, 2: 2}


def test_shortest_paths_sql_matches_op(ray_session):
    import duckdb

    from ocds_entity_extract_ray.ops.graph import bfs_sql, shortest_path_distances

    rng = np.random.default_rng(11)
    e = pd.DataFrame(
        {
            "src": rng.integers(0, 40, 120),
            "dst": rng.integers(0, 40, 120),
            "w": rng.integers(1, 7, 120),
        }
    ).drop_duplicates(["src", "dst"])
    out = (
        shortest_path_distances(
            ray.data.from_pandas(e),
            ray.data.from_pandas(pd.DataFrame({"node": [0, 1]})),
            rounds=5,
            num_buckets=8,
            broadcast_max_edges=0,  # force the distributed path
        )
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("edges", e)
    want = con.execute(
        bfs_sql(
            "SELECT src, dst, w FROM edges",
            "SELECT UNNEST([0, 1]) AS node",
            hops=5,
            weighted=True,
        )
    ).df()
    pd.testing.assert_frame_equal(
        out.astype({"node": "int64", "dist": "int64"}),
        want.astype({"node": "int64", "dist": "int64"}),
    )


def test_shortest_paths_duplicate_sources_dedupe(ray_session):
    """A duplicated source node must yield ONE output row (the SQL twin
    GROUP BYs every round) — regression for the init-dedup fix."""
    from ocds_entity_extract_ray.ops.graph import shortest_path_distances

    e = pd.DataFrame({"src": [0, 1], "dst": [1, 2], "w": [3, 4]})
    out = shortest_path_distances(
        ray.data.from_pandas(e),
        ray.data.from_pandas(pd.DataFrame({"node": [0, 0]})),
        rounds=3,
        num_buckets=4,
        broadcast_max_edges=0,  # the init grouped-min dedup lives in the BSP path
    ).to_pandas()
    assert len(out) == 3
    assert dict(zip(out["node"], out["dist"])) == {0: 0, 1: 3, 2: 7}


def test_morton_interleave_matches_bit_loop():
    """Magic-mask spread vs a per-bit reference implementation."""
    from ocds_entity_extract_ray.ops.layout import morton_interleave

    rng = np.random.default_rng(3)
    a = rng.integers(0, 1 << 16, 200)
    b = rng.integers(0, 1 << 16, 200)

    def ref(x, y):
        z = 0
        for i in range(16):
            z |= ((int(x) >> i) & 1) << (2 * i)
            z |= ((int(y) >> i) & 1) << (2 * i + 1)
        return z

    got = morton_interleave(a, b)
    assert [int(v) for v in got] == [ref(x, y) for x, y in zip(a, b)]


def test_zorder_locality_beats_single_column_sort(ray_session):
    """The point of the key: files cut from a z-sorted layout have
    bounded ranges in BOTH dimensions, a single-column sort does not.
    Columns are 24-BIT on purpose — a mod-2^16 truncation (instead of
    range quantization) scatters wide columns and made the layout ~2x
    WORSE than a plain sort; this pins the quantized path."""
    from ocds_entity_extract_ray.ops.layout import zorder_key

    rng = np.random.default_rng(5)
    df = pd.DataFrame(
        {"a": rng.integers(0, 1 << 24, 4096), "b": rng.integers(0, 1 << 24, 4096)}
    )
    zed = zorder_key(
        ray.data.from_pandas(df), "a", "b",
        max_a=(1 << 24) - 1, max_b=(1 << 24) - 1, out_col="z",
    ).to_pandas()
    df = zed

    def span_sum(frame, order):
        s = frame.sort_values(order).reset_index(drop=True)
        total = 0
        for i in range(0, len(s), 64):  # 64 "files"
            chunk = s.iloc[i : i + 64]
            total += int(chunk["a"].max() - chunk["a"].min()) + int(
                chunk["b"].max() - chunk["b"].min()
            )
        return total

    # single-column sort leaves every file spanning the FULL b range;
    # z-sorted files bound both dimensions
    assert span_sum(df, "z") < 0.5 * span_sum(df, "a")


def test_weighted_hash_sample_rate_and_determinism(ray_session):
    """Keep rate tracks weight/max_weight per weight class, zero-weight
    rows never survive, and the kept ID SET is partition-independent."""
    from ocds_entity_extract_ray.ops.sampling import weighted_hash_sample

    n = 4000
    df = pd.DataFrame({"id": np.arange(n), "w": np.tile([0, 25, 50, 100], n // 4)})
    kept1 = weighted_hash_sample(
        ray.data.from_pandas(df), "id", "w", max_weight=100
    ).to_pandas()
    kept2 = weighted_hash_sample(
        ray.data.from_pandas(df).repartition(7), "id", "w", max_weight=100
    ).to_pandas()
    assert set(kept1["id"]) == set(kept2["id"])
    by_w = kept1.groupby("w").size()
    assert 0 not in by_w.index  # zero weight -> never kept
    assert abs(by_w.get(100, 0) / (n // 4) - 1.0) < 0.01  # w==max -> all kept
    assert 0.15 < by_w.get(25, 0) / (n // 4) < 0.35
    assert 0.40 < by_w.get(50, 0) / (n // 4) < 0.60


def test_cap_per_key_uniform_and_partition_independent(ray_session):
    """At most k per key, the SAME k rows under any partitioning, and the
    choice is the hash-min subsample (matches a pandas reference)."""
    from ocds_entity_extract_ray.ops.sampling import (
        KNUTH_MULT,
        MOD,
        cap_per_key,
    )

    rng = np.random.default_rng(9)
    df = pd.DataFrame(
        {"key": rng.integers(0, 12, 500), "id": np.arange(500)}
    )
    out1 = cap_per_key(
        ray.data.from_pandas(df), "key", 3, id_col="id", num_buckets=8
    ).to_pandas()
    out2 = cap_per_key(
        ray.data.from_pandas(df).repartition(11), "key", 3, id_col="id", num_buckets=4
    ).to_pandas()
    assert set(out1["id"]) == set(out2["id"])
    assert out1.groupby("key").size().max() <= 3
    # pandas reference: k smallest by (hash, id) per key
    h = (df["id"].to_numpy().astype(np.uint64) * np.uint64(KNUTH_MULT)) % np.uint64(MOD)
    ref = (
        df.assign(_h=h.astype("int64"))
        .sort_values(["key", "_h", "id"])
        .groupby("key")
        .head(3)
    )
    assert set(out1["id"]) == set(ref["id"])


def test_unigram_surprisal_matches_duckdb(ray_session):
    """Small corpus incl. a tie at the vocab cutoff and an all-empty doc
    (must be omitted, like the twin's unnest)."""
    import duckdb

    from ocds_entity_extract_ray.ops.textstats import unigram_surprisal

    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "aa bb aa cc",
                "bb bb zz rare",
                "",
                "cc aa unknowntoken",
            ],
        }
    )
    got = (
        unigram_surprisal(
            ray.data.from_pandas(df), "text", "doc_id", top_v=3, num_buckets=4
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", df)
    want = con.execute(
        """
        WITH w AS (SELECT doc_id,
                unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
              FROM documents),
        tf AS (SELECT term, COUNT(*)::BIGINT AS n FROM w GROUP BY term),
        vocab AS (SELECT term, n FROM (
            SELECT term, n, ROW_NUMBER() OVER (ORDER BY n DESC, term ASC) rn
            FROM tf) WHERE rn <= 3),
        scored AS (SELECT w.doc_id, 1000000 // COALESCE(v.n, 1) AS s
                   FROM w LEFT JOIN vocab v USING (term))
        SELECT doc_id, COUNT(*)::BIGINT AS n_tokens, SUM(s)::BIGINT AS surprisal
        FROM scored GROUP BY doc_id ORDER BY doc_id
        """
    ).df()
    pd.testing.assert_frame_equal(
        got,
        want.astype({"doc_id": "int64", "n_tokens": "int64", "surprisal": "int64"}),
    )
    assert 3 not in set(got["doc_id"])  # empty doc omitted


def test_weighted_hash_sample_contract_guards(ray_session):
    """Negative weights raise (uint64 wrap would keep everything) and a
    max_weight >= 2^32 is rejected (threshold would wrap)."""
    from ocds_entity_extract_ray.ops.sampling import weighted_hash_sample

    ds = ray.data.from_pandas(pd.DataFrame({"id": [1, 2], "w": [-5, 3]}))
    with pytest.raises(Exception, match="negative weight"):
        weighted_hash_sample(ds, "id", "w", max_weight=10).to_pandas()
    with pytest.raises(ValueError, match="max_weight"):
        weighted_hash_sample(ds, "id", "w", max_weight=1 << 32)
    # weights above max_weight clamp to always-keep
    ds2 = ray.data.from_pandas(pd.DataFrame({"id": range(50), "w": [99] * 50}))
    kept = weighted_hash_sample(ds2, "id", "w", max_weight=10).to_pandas()
    assert len(kept) == 50


def test_zorder_rejects_out_of_range(ray_session):
    from ocds_entity_extract_ray.ops.layout import zorder_key

    ds = ray.data.from_pandas(pd.DataFrame({"a": [70000], "b": [1]}))
    with pytest.raises(Exception, match="outside"):
        zorder_key(ds, "a", "b", max_a=65535, max_b=65535).to_pandas()


def test_ingest_dedup_across_batches(ray_session, tmp_path):
    """Batch 1 establishes state; batch 2 drops cross-batch AND
    intra-batch duplicates (keeping the smallest doc_id); a retried
    commit is idempotent."""
    from ocds_entity_extract_ray.ops.ingest import ingest_dedup

    state = str(tmp_path / "state")
    b1 = pd.DataFrame({"doc_id": [1, 2], "text": ["alpha", "beta"]})
    out1 = ingest_dedup(
        ray.data.from_pandas(b1), state, num_buckets=4
    ).to_pandas()
    assert set(out1["doc_id"]) == {1, 2}

    b2 = pd.DataFrame(
        {"doc_id": [10, 11, 12, 13], "text": ["beta", "gamma", "gamma", "delta"]}
    )
    out2 = ingest_dedup(
        ray.data.from_pandas(b2), state, num_buckets=4
    ).to_pandas()
    # beta seen in batch 1; gamma keeps smallest id only
    assert set(out2["doc_id"]) == {11, 13}
    assert sorted(out2.columns) == ["doc_id", "text"]

    # replaying batch 2 yields nothing new (state now holds gamma/delta)
    out3 = ingest_dedup(
        ray.data.from_pandas(b2), state, num_buckets=4, commit=False
    ).to_pandas()
    assert len(out3) == 0


def test_ingest_dedup_two_phase_commit(ray_session, tmp_path):
    """Deferred commit: survivors are visible before the state changes;
    a crash before commit() leaves the state untouched (retry recomputes
    the same survivors); after commit() the state is durable and a second
    commit() call is a no-op returning the same path."""
    import os

    from ocds_entity_extract_ray.ops.ingest import (
        ingest_dedup,
        ingest_dedup_two_phase,
    )

    state = str(tmp_path / "state2p")
    b1 = pd.DataFrame({"doc_id": [1, 2], "text": ["alpha", "beta"]})

    surv, commit = ingest_dedup_two_phase(
        ray.data.from_pandas(b1), state, num_buckets=4
    )
    assert set(surv.to_pandas()["doc_id"]) == {1, 2}
    assert not os.path.isdir(state)  # nothing committed yet

    # "crash" before commit: the retry sees the same (empty) state and
    # recomputes the identical survivor set
    surv_retry, commit_retry = ingest_dedup_two_phase(
        ray.data.from_pandas(b1), state, num_buckets=4
    )
    assert set(surv_retry.to_pandas()["doc_id"]) == {1, 2}

    path = commit_retry()
    assert os.path.isfile(path)
    assert commit_retry() == path  # idempotent re-commit

    # after the commit the batch is a detected replay: zero survivors
    out = ingest_dedup(
        ray.data.from_pandas(b1), state, num_buckets=4, commit=False
    ).to_pandas()
    assert len(out) == 0


def test_k_core_planted_graph(ray_session):
    """K4-clique (1..4) + chain 4-5-6 + pendant 7-1, k=2.

    Peeling needs TWO rounds to strip the chain (6 and 7 first, then the
    newly-exposed 5), so rounds=3 exercises real iteration and the
    early-stop: the 2-core is exactly the clique with within-core deg 3.
    rounds=1 shows the documented BOUNDED semantics — 5 is already gone
    (deg 1 after round one) but 4's degree still counts the removed
    chain edge."""
    from ocds_entity_extract_ray.ops.graph import k_core

    e = pd.DataFrame(
        {
            "u": [1, 1, 1, 2, 2, 3, 4, 5, 7],
            "v": [2, 3, 4, 3, 4, 4, 5, 6, 1],
        }
    )
    full = k_core(ray.data.from_pandas(e), 2, rounds=3, num_buckets=4).to_pandas()
    full = full.sort_values("node").reset_index(drop=True)
    assert list(full["node"]) == [1, 2, 3, 4]
    assert list(full["deg"]) == [3, 3, 3, 3]

    one = k_core(ray.data.from_pandas(e), 2, rounds=1, num_buckets=4).to_pandas()
    one = one.sort_values("node").reset_index(drop=True)
    assert list(one["node"]) == [1, 2, 3, 4]
    assert list(one["deg"]) == [3, 3, 3, 4]


def test_k_core_sql_matches_op(ray_session):
    """Random sparse graph: unrolled-CTE twin and the distributed peel
    agree exactly at every round count (incl. 0 rounds = plain degree
    filter)."""
    import duckdb

    from ocds_entity_extract_ray.ops.graph import k_core, k_core_sql

    rng = np.random.default_rng(11)
    raw = pd.DataFrame(
        {"u": rng.integers(0, 50, 140), "v": rng.integers(0, 50, 140)}
    )
    raw = raw[raw["u"] < raw["v"]].drop_duplicates().reset_index(drop=True)
    con = duckdb.connect()
    con.register("edges", raw)
    from ocds_entity_extract_ray.ops.agg import to_pandas_safe

    empty = pd.DataFrame(
        {"node": pd.Series(dtype="int64"), "deg": pd.Series(dtype="int64")}
    )
    # bme=0 forces the distributed peel on the same inputs, so BOTH the
    # driver fast path and the bucketed loop are held to the SQL twin
    for (k, rounds), bme in [
        ((2, 0), 10**6),
        ((3, 2), 10**6),
        ((3, 6), 0),
        ((4, 4), 10**6),
        ((3, 2), 0),
    ]:
        got = (
            to_pandas_safe(
                k_core(
                    ray.data.from_pandas(raw), k, rounds=rounds,
                    num_buckets=4, broadcast_max_edges=bme,
                ),
                empty,
            )
            .sort_values("node")
            .reset_index(drop=True)
        )
        want = con.execute(
            k_core_sql("SELECT u, v FROM edges", k, rounds=rounds)
        ).df()
        pd.testing.assert_frame_equal(
            got.astype({"node": "int64", "deg": "int64"}), want
        )


def test_k_core_empty_edges(ray_session):
    from ocds_entity_extract_ray.ops.graph import k_core

    e = pd.DataFrame({"u": pd.Series(dtype="int64"), "v": pd.Series(dtype="int64")})
    out = k_core(ray.data.from_pandas(e), 2, rounds=2, num_buckets=2)
    assert out.count() == 0


def test_link_prediction_pairs_are_nonadjacent(ray_session):
    """Every predicted pair must NOT be an existing co-purchase edge, and
    Jaccard must be in (0, 1] with cn <= min(deg) (set algebra sanity
    the SQL twin can't state)."""
    from ocds_entity_extract_ray.pipelines.relational import (
        _copurchase_edges,
        q_link_prediction_parts,
    )

    sf = "/root/testdata/sf0.001"
    out = q_link_prediction_parts(sf)
    assert len(out) > 0
    e = _copurchase_edges(sf).to_pandas()
    eset = set(zip(e["u"], e["v"]))
    for a, b, cn, j in zip(out["a"], out["b"], out["cn"], out["jaccard"]):
        assert (a, b) not in eset
        assert 0 < j <= 1.0
        assert cn >= 2


def test_common_neighbor_scores_hub_cap(ray_session):
    """A star center with degree > max_center_degree is skipped (its
    quadratic wedge fan is the guard's whole point); evidence routed
    through low-degree centers survives."""
    from ocds_entity_extract_ray.ops.graph import (
        common_neighbor_scores,
        top_jaccard_pairs,
    )

    hub = 100
    spokes = list(range(10))
    e = pd.DataFrame(
        {"u": [min(hub, s) for s in spokes] + [1, 2],
         "v": [max(hub, s) for s in spokes] + [3, 3]}
    )
    capped = common_neighbor_scores(
        ray.data.from_pandas(e), min_cn=1, num_buckets=4, max_center_degree=5
    )
    got = top_jaccard_pairs(capped, 100)
    # the hub (deg 10 > 5) contributes no wedges; only center 3 (deg 2)
    # survives, with the single pair (1, 2)
    assert list(zip(got["a"], got["b"])) == [(1, 2)]

    uncapped = common_neighbor_scores(
        ray.data.from_pandas(e), min_cn=1, num_buckets=4
    )
    full = top_jaccard_pairs(uncapped, 1000)
    # 45 spoke pairs through the hub, minus (1,3) and (2,3) which are
    # actual edges; (3,100) is adjacent too, and (1,2) merges with its
    # hub wedge rather than adding a row
    assert len(full) == 43


def test_driver_relax_matches_distributed(ray_session):
    """The adaptive driver fast path and the BSP loop compute the same
    bounded-round result, weighted and unweighted (the Jacobi rule —
    in-place updates would leak extra hops within a round)."""
    from ocds_entity_extract_ray.ops.graph import (
        bfs_distances,
        shortest_path_distances,
    )

    rng = np.random.default_rng(23)
    e = pd.DataFrame(
        {
            "src": rng.integers(0, 50, 160),
            "dst": rng.integers(0, 50, 160),
            "w": rng.integers(1, 9, 160),
        }
    ).drop_duplicates(["src", "dst"])
    src = pd.DataFrame({"node": [0, 7]})
    for fn, kw in [
        (bfs_distances, {"hops": 3}),
        (shortest_path_distances, {"rounds": 4}),
    ]:
        fast = (
            fn(ray.data.from_pandas(e), ray.data.from_pandas(src), **kw)
            .to_pandas().sort_values("node").reset_index(drop=True)
        )
        dist = (
            fn(ray.data.from_pandas(e), ray.data.from_pandas(src),
               broadcast_max_edges=0, num_buckets=4, **kw)
            .to_pandas().sort_values("node").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(fast, dist)


def test_adaptive_paths_parity_on_edge_cases(ray_session):
    """The two adaptive paths must agree on validation and degenerate
    inputs: negative weights raise on BOTH; hops=0 with duplicated
    sources yields ONE row on both."""
    import pytest as _pytest

    from ocds_entity_extract_ray.ops.graph import (
        bfs_distances,
        shortest_path_distances,
    )

    neg = pd.DataFrame({"src": [0, 1], "dst": [1, 2], "w": [3, -2]})
    for bme in (10**6, 0):
        with _pytest.raises(Exception, match="negative"):
            shortest_path_distances(
                ray.data.from_pandas(neg),
                ray.data.from_pandas(pd.DataFrame({"node": [0]})),
                rounds=2, num_buckets=4, broadcast_max_edges=bme,
            ).to_pandas()

    e = pd.DataFrame({"src": [0], "dst": [1]})
    for bme in (10**6, 0):
        out = bfs_distances(
            ray.data.from_pandas(e),
            ray.data.from_pandas(pd.DataFrame({"node": [0, 0]})),
            hops=0, num_buckets=4, broadcast_max_edges=bme,
        ).to_pandas()
        assert len(out) == 1 and out.iloc[0]["dist"] == 0


def test_label_propagation_parity_and_communities(ray_session):
    """Deterministic LPA: driver numpy path == bucketed distributed path
    == the unrolled-CTE DuckDB twin, bit for bit (adaptive-two-path
    rule), and two planted communities converge to their min-id labels
    with only the two cross-edges to fight through."""
    import duckdb

    from ocds_entity_extract_ray.ops.graph import (
        label_propagation,
        label_propagation_sql,
    )

    rng = np.random.RandomState(7)
    a, b = rng.randint(0, 30, 200), rng.randint(0, 30, 200)
    c, d = rng.randint(100, 140, 260), rng.randint(100, 140, 260)
    src = np.concatenate([a, c, [5, 7]])
    dst = np.concatenate([b, d, [105, 120]])
    edges = pd.DataFrame(
        {"src": np.concatenate([src, dst]), "dst": np.concatenate([dst, src])}
    ).astype("int64")
    ds = ray.data.from_pandas(edges).repartition(3)

    outs = {}
    for br in ("driver", "bsp"):
        outs[br] = (
            label_propagation(ds, rounds=5, num_buckets=4, force_branch=br)
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(outs["driver"], outs["bsp"])

    con = duckdb.connect()
    con.register("edges_tbl", edges)
    odf = con.execute(
        label_propagation_sql("SELECT src, dst FROM edges_tbl", rounds=5)
    ).df()
    assert outs["driver"].equals(odf)
    assert all(outs["driver"].dtypes == odf.dtypes)

    # planted structure: every node labelled by its community's min id
    g = outs["driver"]
    assert set(g["label"]) == {0, 100}
    assert (g.loc[g["node"] < 100, "label"] == 0).all()
    assert (g.loc[g["node"] >= 100, "label"] == 100).all()


def test_label_propagation_big_ids_bucketed(ray_session):
    """64-bit hashed node ids (> 2^53): the bucketed branch's combine
    must not route labels through float64 (the fillna-upcast bug class)
    — driver and bucketed branches stay bit-identical."""
    from ocds_entity_extract_ray.ops.graph import label_propagation

    base = (1 << 62) + 1  # not representable in float64
    # base+5 has an OUT-edge only: it receives no votes, so the combine
    # keeps its prior label through the fillna path — exactly the row
    # whose NaN used to upcast the whole label column to float64
    e = pd.DataFrame(
        {
            "src": [base, base + 1, base + 2, base + 9, base + 5],
            "dst": [base + 1, base, base + 9, base + 2, base + 9],
        }
    ).astype("int64")
    outs = {}
    for br in ("driver", "bsp"):
        outs[br] = (
            label_propagation(
                ray.data.from_pandas(e), rounds=3, num_buckets=2, force_branch=br
            )
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(outs["driver"], outs["bsp"])
    assert outs["bsp"]["label"].min() == base  # exact, not rounded


def test_label_propagation_edge_cases(ray_session):
    """Zero edges -> typed empty; self-loops dropped BEFORE the node
    universe is built, so nodes whose only edges are self-loops leave
    the graph entirely (count()==0 below — matching the SQL twin, whose
    node CTE is derived from the self-loop-filtered edge set); duplicate
    edges count once (dedup), matching the twin's DISTINCT."""
    from ocds_entity_extract_ray.ops.graph import label_propagation

    empty = label_propagation(
        ray.data.from_pandas(
            pd.DataFrame({"src": pd.Series(dtype="int64"), "dst": pd.Series(dtype="int64")})
        )
    )
    assert empty.count() == 0

    loops = pd.DataFrame({"src": [1, 2, 2], "dst": [1, 2, 2]})
    out = label_propagation(ray.data.from_pandas(loops), rounds=3)
    assert out.count() == 0  # all edges were self-loops -> no graph

    # duplicated edge (3->4 twice) must not outvote two distinct edges:
    # node 4 hears {3} once (dedup) and {5} once -> min label 3 wins ties
    dup = pd.DataFrame({"src": [3, 3, 5], "dst": [4, 4, 4]})
    out = (
        label_propagation(ray.data.from_pandas(dup), rounds=1)
        .to_pandas()
        .set_index("node")["label"]
    )
    assert out[4] == 3


def test_connected_components_bridge_outside_universe(ray_session):
    """Labels must flow THROUGH edge endpoints absent from ``nodes``: a
    5-7-9 chain with 7 outside the universe still merges 5 and 9, and
    the bridge node itself stays out of the output — on BOTH adaptive
    branches (the BSP path propagates over nodes UNION endpoints and
    filters back)."""
    from ocds_entity_extract_ray.ops.graph import connected_components

    nodes = pd.DataFrame({"node": [5, 9, 42]})
    e = pd.DataFrame({"id_a": [5, 7], "id_b": [7, 9]})
    both = pd.concat(
        [e, e.rename(columns={"id_a": "id_b", "id_b": "id_a"})], ignore_index=True
    )
    want = {5: 5, 9: 5, 42: 42}
    for bme in (10**6, 0):
        got = (
            connected_components(
                ray.data.from_pandas(nodes),
                ray.data.from_pandas(both),
                broadcast_max_edges=bme,
                num_buckets=4,
            )
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        assert dict(zip(got["node"], got["cluster_id"])) == want, bme


def test_connected_components_duplicate_node_rows_parity(ray_session):
    """Output multiplicity contract: ONE row per input node row, so
    duplicate node ids keep their multiplicity — identical on both
    adaptive branches (the BSP filter-back maps labels onto the input
    rows rather than deduping the universe)."""
    from ocds_entity_extract_ray.ops.graph import connected_components

    nodes = pd.DataFrame({"node": [5, 5, 9, 42]})
    e = pd.DataFrame({"id_a": [5, 9], "id_b": [9, 5]})
    for bme in (10**6, 0):
        got = (
            connected_components(
                ray.data.from_pandas(nodes),
                ray.data.from_pandas(e),
                broadcast_max_edges=bme,
                num_buckets=4,
            )
            .to_pandas()
            .sort_values(["node", "cluster_id"])
            .reset_index(drop=True)
        )
        assert list(got["node"]) == [5, 5, 9, 42], bme
        assert list(got["cluster_id"]) == [5, 5, 5, 42], bme
