"""Relational conformance queries: each entry is a Ray-Data-native pipeline
over the driver's testdata tables plus (where SQL-expressible) an exactly
matching DuckDB oracle (SURVEY §2.8, §5.4 — the driver compares row count +
schema + order-insensitive value hash at sf0.01).

Float discipline: aggregate sums are rounded to whole units in BOTH engines
(accumulated fp error across different summation orders is ~1e-6 absolute
here, so integer rounding is stable); ratios are computed FROM the rounded
sums so both engines divide identical operands. Counts cast to int64
(DuckDB sums of ints are HUGEINT otherwise). Timestamps normalized to
microsecond precision on the Ray side to match DuckDB.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from ..functions.laundry import simple_name
from ..ops.agg import grouped_agg
from ..ops.joins import adaptive_hash_join, broadcast_hash_join, hash_join
from ..ops.similarity import cosine_topk, embedding_near_dup_pairs
from ..ops.textstats import (
    add_langid,
    add_simhash,
    add_text_stats,
    winnowing_fingerprints,
)
from ..ops.windows import sessionize, tumbling_window_agg


def _t(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def _read(sf_dir: str, name: str, columns=None, filter=None) -> ray.data.Dataset:
    """Column-pruned (and optionally predicate-pushed) parquet read.
    ``filter`` is a ``pyarrow.dataset`` expression evaluated INSIDE the
    scan: on date/key-partitioned files at 100 TB it prunes whole files
    and row groups before bytes leave storage (the single-row-group test
    tables here can't demonstrate the pruning, only the semantics)."""
    return ray.data.read_parquet(_t(sf_dir, name), columns=columns, filter=filter)


def _small(sf_dir: str, name: str, columns=None) -> pa.Table:
    return pq.read_table(_t(sf_dir, name), columns=columns)


def _us(df: pd.DataFrame, *cols: str) -> pd.DataFrame:
    for c in cols:
        df[c] = df[c].astype("datetime64[us]")
    return df



def _round(x, decimals: int = 0):
    """Half-away-from-zero rounding, matching DuckDB's ROUND (numpy/pandas
    round half to even, which diverges on exact .5 sums)."""
    scale = 10.0 ** decimals
    if isinstance(x, pd.Series):
        return np.sign(x) * np.floor(np.abs(x) * scale + 0.5) / scale
    return float(np.sign(x) * np.floor(abs(x) * scale + 0.5) / scale)


def _cents(col) -> np.ndarray:
    """Exact-2-decimal column -> int64 cents (rint is boundary-free here:
    the float is within 1e-10 of an integer/100)."""
    return np.rint(np.asarray(col, dtype=np.float64) * 100).astype(np.int64)


def _cents_arrow(col: "pa.ChunkedArray") -> "pa.ChunkedArray":
    """Arrow twin of :func:`_cents`: exact-2-decimal column -> int64 cents
    (pc.round's default half_to_even == np.rint; boundary-free here, the
    float is within 1e-10 of an integer/100)."""
    import pyarrow.compute as pc

    return pc.cast(pc.round(pc.multiply(col, 100.0)), pa.int64())


def _int_rev_arrow(price, disc):
    """Arrow twin of :func:`_int_rev` (same per-row integer quantization)."""
    import pyarrow.compute as pc

    return pc.multiply(
        _cents_arrow(price), pc.subtract(pa.scalar(100, pa.int64()), _cents_arrow(disc))
    )


def _int_rev(price, disc) -> np.ndarray:
    """PER-ROW integer-quantized revenue: price_cents x (100 - disc_pct),
    scale 1e4 of currency units. Summation-order independent, so revenue
    aggregates are bitwise-identical in any engine. Rounding the
    AGGREGATED float sum instead is NOT safe: a 4-decimal product sum can
    land exactly on the .5 rounding boundary and flip with summation
    order (a q7 group measured 1.2e-10 from the boundary at sf0.01)."""
    return _cents(price) * (100 - _cents(disc))


# the SQL twin of _int_rev
_SQL_INT_REV = (
    "ROUND(l_extendedprice * 100, 0)::BIGINT"
    " * (100 - ROUND(l_discount * 100, 0)::BIGINT)"
)


# --- TPC-H-flavored ----------------------------------------------------------


def q1_pricing_summary(sf_dir: str) -> pd.DataFrame:
    ds = _read(
        sf_dir,
        "lineitem",
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
            "l_shipdate",
        ],
    )

    def derive(t: pa.Table) -> pa.Table:
        # zero-copy Arrow kernel: no Arrow->pandas round-trip per block
        import pyarrow.compute as pc

        t = t.filter(
            pc.less_equal(
                t["l_shipdate"], pa.scalar(pd.Timestamp("1998-09-02"), pa.timestamp("us"))
            )
        )
        price = _cents_arrow(t["l_extendedprice"])
        dp = _cents_arrow(t["l_discount"])
        tp = _cents_arrow(t["l_tax"])
        hundred = pa.scalar(100, pa.int64())
        disc_price = pc.multiply(price, pc.subtract(hundred, dp))
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "l_quantity": pc.cast(pc.round(t["l_quantity"]), pa.int64()),
                "l_extendedprice": price,  # base price in cents
                "disc_price": disc_price,
                "charge": pc.multiply(disc_price, pc.add(hundred, tp)),
            }
        )

    out = grouped_agg(
        ds,
        ["l_returnflag", "l_linestatus"],
        {
            "sum_qty": ("l_quantity", "sum"),
            "sum_base_price": ("l_extendedprice", "sum"),
            "sum_disc_price": ("disc_price", "sum"),
            "sum_charge": ("charge", "sum"),
            "count_order": ("l_quantity", "count"),
        },
        pre=derive,
        batch_format="pyarrow",
    )
    for c in ("sum_qty", "sum_base_price", "sum_disc_price", "sum_charge"):
        out[c] = out[c].astype("int64")
    out["avg_qty"] = out["sum_qty"] / out["count_order"]
    out["count_order"] = out["count_order"].astype("int64")
    return out


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       SUM(ROUND(l_quantity, 0)::BIGINT)::BIGINT AS sum_qty,
       SUM(ROUND(l_extendedprice * 100, 0)::BIGINT)::BIGINT AS sum_base_price,
       SUM(ROUND(l_extendedprice * 100, 0)::BIGINT * (100 - ROUND(l_discount * 100, 0)::BIGINT))::BIGINT AS sum_disc_price,
       SUM(ROUND(l_extendedprice * 100, 0)::BIGINT * (100 - ROUND(l_discount * 100, 0)::BIGINT) * (100 + ROUND(l_tax * 100, 0)::BIGINT))::BIGINT AS sum_charge,
       COUNT(*)::BIGINT AS count_order,
       SUM(ROUND(l_quantity, 0)::BIGINT)::BIGINT / COUNT(*) AS avg_qty
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q3_top_unshipped(sf_dir: str) -> pd.DataFrame:
    cust = _small(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    cust = cust.filter(pa.compute.equal(cust["c_mktsegment"], "BUILDING"))
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def f_orders(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(
            pc.less(
                t["o_orderdate"], pa.scalar(pd.Timestamp("1998-01-01"), pa.timestamp("us"))
            )
        )

    orders_b = broadcast_hash_join(
        orders.map_batches(f_orders, batch_format="pyarrow", zero_copy_batch=True),
        cust.select(["c_custkey"]),
        left_on="o_custkey",
        right_on="c_custkey",
        batch_format="pyarrow",
    ).select_columns(["o_orderkey", "o_orderdate"])

    li = _read(
        sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"]
    )

    def f_li(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.filter(
            pc.greater(
                t["l_shipdate"], pa.scalar(pd.Timestamp("1998-01-01"), pa.timestamp("us"))
            )
        )
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "revenue": _int_rev_arrow(t["l_extendedprice"], t["l_discount"]),
            }
        )

    li_f = li.map_batches(f_li, batch_format="pyarrow", zero_copy_batch=True)
    joined = adaptive_hash_join(li_f, orders_b, "inner", on=("l_orderkey",), right_on=("o_orderkey",))
    # high-cardinality groupby: map-side partials -> bucketed combine ->
    # per-bucket top-10 -> tiny driver merge (scales: shuffle carries one
    # row per (order, block); driver sees 10 rows per bucket)
    per_order = grouped_agg(
        joined,
        ["l_orderkey", "o_orderdate"],
        {"revenue": ("revenue", "sum")},
        final="bucketed",
        num_buckets=16,
        empty_result=pd.DataFrame(
            {
                "l_orderkey": pd.Series(dtype="int64"),
                "o_orderdate": pd.Series(dtype="datetime64[ns]"),
                "revenue": pd.Series(dtype="int64"),
            }
        ),
    )

    def topk(bucket: pd.DataFrame) -> pd.DataFrame:
        bucket = bucket.copy()
        bucket["revenue"] = bucket["revenue"].astype("int64")
        return bucket.sort_values(
            ["revenue", "l_orderkey"], ascending=[False, True], kind="mergesort"
        ).head(10)

    cand = per_order.map_batches(topk, batch_format="pandas").to_pandas()
    out = cand.sort_values(
        ["revenue", "l_orderkey"], ascending=[False, True], kind="mergesort"
    ).head(10)
    return _us(out.reset_index(drop=True), "o_orderdate")


Q3_SQL = """
SELECT l_orderkey, o_orderdate,
       SUM(ROUND(l_extendedprice * 100, 0)::BIGINT * (100 - ROUND(l_discount * 100, 0)::BIGINT))::BIGINT AS revenue
FROM customer JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01' AND l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey LIMIT 10
"""


def q5_nation_revenue(sf_dir: str) -> pd.DataFrame:
    sup = _small(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    cust = _small(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    nation = _small(sf_dir, "nation").to_pandas()
    region = _small(sf_dir, "region").to_pandas()
    nr = nation.merge(region, left_on="n_regionkey", right_on="r_regionkey")
    nr = nr[nr["r_name"] == "ASIA"][["n_nationkey", "n_name"]]

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def f_orders(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        m = pc.and_(
            pc.greater_equal(
                t["o_orderdate"], pa.scalar(pd.Timestamp("1996-01-01"), pa.timestamp("us"))
            ),
            pc.less(
                t["o_orderdate"], pa.scalar(pd.Timestamp("1998-01-01"), pa.timestamp("us"))
            ),
        )
        return t.filter(m).select(["o_orderkey", "o_custkey"])

    orders_c = broadcast_hash_join(
        orders.map_batches(f_orders, batch_format="pyarrow", zero_copy_batch=True),
        cust,
        left_on="o_custkey",
        right_on="c_custkey",
        batch_format="pyarrow",
    ).select_columns(["o_orderkey", "c_nationkey"])

    li = _read(
        sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]
    )

    def f_li(t: pa.Table) -> pa.Table:
        # derive the int64 revenue BEFORE the joins: the shuffle then
        # carries 3 int columns instead of 2 floats + 2 keys
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "l_suppkey": t["l_suppkey"],
                "revenue": _int_rev_arrow(t["l_extendedprice"], t["l_discount"]),
            }
        )

    li_s = broadcast_hash_join(
        li.map_batches(f_li, batch_format="pyarrow", zero_copy_batch=True),
        sup,
        left_on="l_suppkey",
        right_on="s_suppkey",
        batch_format="pyarrow",
    ).select_columns(["l_orderkey", "s_nationkey", "revenue"])
    joined = adaptive_hash_join(li_s, orders_c, "inner", on=("l_orderkey",), right_on=("o_orderkey",))

    def f_same_nation(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.equal(t["s_nationkey"], t["c_nationkey"])).select(
            ["s_nationkey", "revenue"]
        )

    per_nation = grouped_agg(
        joined,
        ["s_nationkey"],
        {"revenue": ("revenue", "sum")},
        pre=f_same_nation,
        batch_format="pyarrow",
    )
    out = per_nation.merge(nr, left_on="s_nationkey", right_on="n_nationkey")[
        ["n_name", "revenue"]
    ]
    out["revenue"] = out["revenue"].astype("int64")
    return out.sort_values("n_name").reset_index(drop=True)


Q5_SQL = """
SELECT n_name,
       SUM(ROUND(l_extendedprice * 100, 0)::BIGINT * (100 - ROUND(l_discount * 100, 0)::BIGINT))::BIGINT AS revenue
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA' AND s_nationkey = c_nationkey
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name ORDER BY n_name
"""


def q6_revenue(sf_dir: str) -> pd.DataFrame:
    # map-side filter: the filter-pushdown variant (q6_pushdown) gives the
    # identical result, but Ray's fragment-based filtered read pays a
    # ~2.7 s one-time per-process warm-up that would read as a phantom
    # regression in the benched q6; on single-row-group test files the
    # pushdown prunes nothing anyway
    ds = _read(
        sf_dir, "lineitem", columns=["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"]
    )

    def f(t: pa.Table) -> pa.Table:
        # zero-copy Arrow kernel; each block collapses to ONE partial sum
        import pyarrow.compute as pc

        lo = pa.scalar(pd.Timestamp("1996-01-01"), pa.timestamp("us"))
        hi = pa.scalar(pd.Timestamp("1997-01-01"), pa.timestamp("us"))
        m = pc.and_(
            pc.and_(
                pc.and_(
                    pc.greater_equal(t["l_shipdate"], lo),
                    pc.less(t["l_shipdate"], hi),
                ),
                pc.and_(
                    pc.greater_equal(t["l_discount"], 0.03),
                    pc.less_equal(t["l_discount"], 0.07),
                ),
            ),
            pc.less(t["l_quantity"], 24),
        )
        t = t.filter(m)
        rev = pc.multiply(_cents_arrow(t["l_extendedprice"]), _cents_arrow(t["l_discount"]))
        s = pc.sum(rev).as_py()
        return pa.table({"revenue": pa.array([int(s or 0)], pa.int64())})

    parts = ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    return pd.DataFrame({"revenue": [int(parts["revenue"].sum())]})


def q6_pushdown(sf_dir: str) -> pd.DataFrame:
    """q6 with the WHOLE predicate pushed into the parquet scan
    (``_read(filter=...)``): on a date-partitioned 100 TB layout the
    expression prunes files/row groups before bytes leave storage, and the
    projection shrinks to the two columns the map stage reads (pyarrow
    may filter on non-projected columns). Same oracle as q6."""
    import pyarrow.dataset as pads

    f6 = (
        (pads.field("l_shipdate") >= pa.scalar(pd.Timestamp("1996-01-01"), type=pa.timestamp("us")))
        & (pads.field("l_shipdate") < pa.scalar(pd.Timestamp("1997-01-01"), type=pa.timestamp("us")))
        & (pads.field("l_discount") >= 0.03)
        & (pads.field("l_discount") <= 0.07)
        & (pads.field("l_quantity") < 24)
    )
    ds = _read(sf_dir, "lineitem", columns=["l_discount", "l_extendedprice"], filter=f6)

    def f(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        rev = pc.multiply(_cents_arrow(t["l_extendedprice"]), _cents_arrow(t["l_discount"]))
        s = pc.sum(rev).as_py()
        return pa.table({"revenue": pa.array([int(s or 0)], pa.int64())})

    parts = ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    return pd.DataFrame({"revenue": [int(parts["revenue"].sum())]})


Q6_SQL = """
SELECT SUM(ROUND(l_extendedprice * 100, 0)::BIGINT * ROUND(l_discount * 100, 0)::BIGINT)::BIGINT AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24
"""


def q4_order_priority(sf_dir: str) -> pd.DataFrame:
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_returnflag"])
    li_r = li.map_batches(
        lambda b: b[b["l_returnflag"] == "R"][["l_orderkey"]], batch_format="pandas"
    )
    semi = hash_join(orders, li_r, "left_semi", on=("o_orderkey",), right_on=("l_orderkey",))
    out = grouped_agg(semi, ["o_orderpriority"], {"n": ("o_orderkey", "count")})
    out["n"] = out["n"].astype("int64")
    return out.sort_values("o_orderpriority").reset_index(drop=True)


Q4_SQL = """
SELECT o_orderpriority, COUNT(*)::BIGINT AS n
FROM orders WHERE EXISTS (
  SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def q_top_suppliers(sf_dir: str) -> pd.DataFrame:
    li = _read(sf_dir, "lineitem", columns=["l_suppkey", "l_extendedprice", "l_discount"])

    def rev(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["revenue"] = _int_rev(b["l_extendedprice"], b["l_discount"])
        return b[["l_suppkey", "revenue"]]

    agg = grouped_agg(li, ["l_suppkey"], {"revenue": ("revenue", "sum")}, pre=rev)
    sup = _small(sf_dir, "supplier", columns=["s_suppkey", "s_name"]).to_pandas()
    out = agg.merge(sup, left_on="l_suppkey", right_on="s_suppkey")[
        ["s_suppkey", "s_name", "revenue"]
    ]
    out["revenue"] = out["revenue"].astype("int64")
    return (
        out.sort_values(["revenue", "s_suppkey"], ascending=[False, True])
        .head(5)
        .reset_index(drop=True)
    )


Q_TOP_SUPPLIERS_SQL = """
SELECT s_suppkey, s_name,
       SUM(ROUND(l_extendedprice * 100, 0)::BIGINT * (100 - ROUND(l_discount * 100, 0)::BIGINT))::BIGINT AS revenue
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_suppkey, s_name ORDER BY revenue DESC, s_suppkey LIMIT 5
"""


def q_filter_sort_limit(sf_dir: str) -> pd.DataFrame:
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])
    out = (
        orders.sort(["o_totalprice", "o_orderkey"], descending=[True, False])
        .limit(10)
        .to_pandas()
    )
    return out


Q_FILTER_SORT_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


def q_distinct_segments(sf_dir: str) -> pd.DataFrame:
    vals = sorted(_read(sf_dir, "customer", columns=["c_mktsegment"]).unique("c_mktsegment"))
    return pd.DataFrame({"c_mktsegment": vals})


Q_DISTINCT_SQL = "SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment"


def q_customers_per_nation(sf_dir: str) -> pd.DataFrame:
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    nation = _small(sf_dir, "nation", columns=["n_nationkey", "n_name"])
    joined = broadcast_hash_join(cust, nation, left_on="c_nationkey", right_on="n_nationkey")
    out = grouped_agg(joined, ["n_name"], {"n_customers": ("c_custkey", "count")})
    out["n_customers"] = out["n_customers"].astype("int64")
    return out.sort_values("n_name").reset_index(drop=True)


Q_CUST_NATION_SQL = """
SELECT n_name, COUNT(*)::BIGINT AS n_customers
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name ORDER BY n_name
"""


def q_minmax_orderdate(sf_dir: str) -> pd.DataFrame:
    orders = _read(sf_dir, "orders", columns=["o_orderdate"])
    parts = orders.map_batches(
        lambda b: pd.DataFrame(
            {
                "first_order": [b["o_orderdate"].min()],
                "last_order": [b["o_orderdate"].max()],
                "n_orders": [len(b)],
            }
        ),
        batch_format="pandas",
    ).to_pandas()
    out = pd.DataFrame(
        {
            "first_order": [parts["first_order"].min()],
            "last_order": [parts["last_order"].max()],
            "n_orders": [int(parts["n_orders"].sum())],
        }
    )
    return _us(out, "first_order", "last_order")


Q_MINMAX_SQL = """
SELECT MIN(o_orderdate) AS first_order, MAX(o_orderdate) AS last_order,
       COUNT(*)::BIGINT AS n_orders FROM orders
"""


def q_union_extreme_parts(sf_dir: str) -> pd.DataFrame:
    part = _read(sf_dir, "part", columns=["p_brand", "p_size"])
    small_p = part.map_batches(lambda b: b[b["p_size"] < 10], batch_format="pandas")
    large_p = part.map_batches(lambda b: b[b["p_size"] > 40], batch_format="pandas")
    out = grouped_agg(small_p.union(large_p), ["p_brand"], {"n_parts": ("p_size", "count")})
    out["n_parts"] = out["n_parts"].astype("int64")
    return out.sort_values("p_brand").reset_index(drop=True)


Q_UNION_SQL = """
SELECT p_brand, COUNT(*)::BIGINT AS n_parts FROM (
  SELECT * FROM part WHERE p_size < 10
  UNION ALL SELECT * FROM part WHERE p_size > 40
) GROUP BY p_brand ORDER BY p_brand
"""


def q_semi_customers_with_orders(sf_dir: str) -> pd.DataFrame:
    # distributed left_semi against the FACT table (never driver-loaded:
    # at 100x the orders keyset is a driver OOM)
    orders = _read(sf_dir, "orders", columns=["o_custkey"])
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    semi = hash_join(cust, orders, "left_semi", on=("c_custkey",), right_on=("o_custkey",))
    out = grouped_agg(semi, ["c_mktsegment"], {"n": ("c_custkey", "count")})
    out["n"] = out["n"].astype("int64")
    return out.sort_values("c_mktsegment").reset_index(drop=True)


Q_SEMI_SQL = """
SELECT c_mktsegment, COUNT(*)::BIGINT AS n
FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders)
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


def q_anti_customers_without_urgent(sf_dir: str) -> pd.DataFrame:
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_orderpriority"])
    urgent = orders.map_batches(
        lambda b: b[b["o_orderpriority"] == "1-URGENT"][["o_custkey"]],
        batch_format="pandas",
    )
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_name"])
    anti = hash_join(cust, urgent, "left_anti", on=("c_custkey",), right_on=("o_custkey",))
    out = anti.to_pandas()
    if not len(out):
        out = pd.DataFrame({"c_custkey": pd.Series(dtype="int64"), "c_name": pd.Series(dtype=str)})
    return out.sort_values("c_custkey").reset_index(drop=True)


Q_ANTI_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
ORDER BY c_custkey
"""


def q_avg_acctbal_by_segment(sf_dir: str) -> pd.DataFrame:
    cust = _read(sf_dir, "customer", columns=["c_mktsegment", "c_acctbal"])
    out = grouped_agg(
        cust, ["c_mktsegment"], {"sum_bal": ("c_acctbal", "sum"), "n": ("c_acctbal", "count")}
    )
    # acctbal is exact 2-decimal: compare integer cents (boundary-free)
    out["sum_bal_cents"] = _round(out["sum_bal"] * 100)
    out["avg_acctbal"] = out["sum_bal_cents"] / 100 / out["n"]
    out["n"] = out["n"].astype("int64")
    out = out.drop(columns=["sum_bal"])
    return out.sort_values("c_mktsegment").reset_index(drop=True)


Q_AVG_SQL = """
SELECT c_mktsegment, ROUND(SUM(c_acctbal) * 100, 0) AS sum_bal_cents, COUNT(*)::BIGINT AS n,
       ROUND(SUM(c_acctbal) * 100, 0) / 100 / COUNT(*) AS avg_acctbal
FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


# --- events (stream-shaped) --------------------------------------------------


def q_events_tumbling(sf_dir: str) -> pd.DataFrame:
    events = _read(sf_dir, "events", columns=["event_type", "ts", "value"])
    out = tumbling_window_agg(events, freq="h")
    # event values are exact 2-decimal; sums are integer CENTS — rounding
    # scaled cents is boundary-free (a unit-rounded sum can land exactly on
    # .5 and flip with summation order)
    out["sum_value_cents"] = _round(out["sum_value"] * 100)
    out = out.drop(columns=["sum_value"])
    out = _us(out, "window_start")
    return out.sort_values(["event_type", "window_start"]).reset_index(drop=True)


Q_TUMBLING_SQL = """
SELECT event_type, date_trunc('hour', ts) AS window_start,
       COUNT(*)::BIGINT AS n_events, ROUND(SUM(value) * 100, 0) AS sum_value_cents
FROM events GROUP BY event_type, date_trunc('hour', ts)
ORDER BY event_type, window_start
"""


def q_late_events(sf_dir: str) -> pd.DataFrame:
    """Allowed-lateness tumbling windows (DROP semantics) over the events
    log. The stream's arrival order is modeled deterministically as
    md5-low64(event_id) — a many-source interleave — so the watermark
    (running max event time over arrival order) actually runs ahead of
    slow events and the 14-day lateness rule splits the corpus into
    on-time and dropped-but-counted late rows. Hash-exact twin: integer
    cent sums + the identical md5 arrival order in SQL."""
    from ..ops.textstats import _h64
    from ..ops.windows import tumbling_window_late

    events = _read(
        sf_dir, "events", columns=["event_id", "event_type", "ts", "value"]
    )

    def with_arrival(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["arrival_seq"] = np.array(
            [_h64(str(i).encode()) for i in b["event_id"]], dtype=np.uint64
        )
        return b

    out = tumbling_window_late(
        events.map_batches(with_arrival, batch_format="pandas"),
        key_col="event_type",
        freq="h",
        lateness=pd.Timedelta(days=14),
    )
    return out.rename(columns={"key": "event_type"})


Q_LATE_EVENTS_SQL = """
WITH wm AS (
  SELECT event_type, ts, value,
         MAX(ts) OVER (
           ORDER BY md5_number_lower(event_id::VARCHAR), event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS watermark
  FROM events
), flagged AS (
  SELECT event_type, date_trunc('hour', ts) AS window_start,
         CASE WHEN ts < watermark - INTERVAL 14 DAY THEN 1 ELSE 0 END AS is_late,
         ROUND(value * 100, 0)::BIGINT AS cents
  FROM wm
)
SELECT event_type, window_start,
       SUM(1 - is_late)::BIGINT AS n_events,
       SUM(CASE WHEN is_late = 0 THEN cents ELSE 0 END)::BIGINT AS sum_value_cents,
       SUM(is_late)::BIGINT AS n_late
FROM flagged GROUP BY event_type, window_start
ORDER BY event_type, window_start
"""


def q_streaming_window_ingest(sf_dir: str) -> pd.DataFrame:
    """Incremental streaming-window state store
    (ops/streaming.py:windowed_ingest_tick): the events log arrives as
    THREE arrival-contiguous micro-batch ticks, each merged into a
    persisted bucketed state dir with the watermark carried across ticks
    (crash-safe stage+swap, exactly-once journal). The final state is
    hash-exact against the SINGLE-PASS SQL twin — the
    incremental==batch theorem, verified end to end by the driver.
    Daily windows / 7-day lateness (vs q_late_events' hourly/14d single
    pass)."""
    import shutil

    from ..ops.streaming import windowed_ingest_tick, windowed_state
    from ..ops.textstats import _h64
    from ..state.paths import scratch_path

    events = _read(
        sf_dir, "events", columns=["event_id", "event_type", "ts", "value"]
    )

    def with_arrival(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["arrival_seq"] = np.array(
            [_h64(str(i).encode()) for i in b["event_id"]], dtype=np.uint64
        )
        return b

    ev = events.map_batches(with_arrival, batch_format="pandas").materialize()
    state = scratch_path(f"stream_state_{os.path.basename(os.path.normpath(sf_dir))}")
    shutil.rmtree(state, ignore_errors=True)

    third = (1 << 64) // 3
    bounds = [(0, third), (third, 2 * third), (2 * third, None)]
    for i, (lo, hi) in enumerate(bounds):

        def pick(b: pd.DataFrame, lo=lo, hi=hi) -> pd.DataFrame:
            arr = b["arrival_seq"].to_numpy().astype(np.uint64)
            m = arr >= np.uint64(lo)
            if hi is not None:
                m &= arr < np.uint64(hi)
            return b[m]

        windowed_ingest_tick(
            state,
            ev.map_batches(pick, batch_format="pandas"),
            tick_id=f"tick{i}",
            freq="D",
            lateness=pd.Timedelta(days=7),
        )
    out = windowed_state(state).rename(columns={"key": "event_type"})
    return out.reset_index(drop=True)


Q_STREAMING_INGEST_SQL = """
WITH wm AS (
  SELECT event_type, ts, value,
         MAX(ts) OVER (
           ORDER BY md5_number_lower(event_id::VARCHAR), event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS watermark
  FROM events
), flagged AS (
  SELECT event_type, date_trunc('day', ts) AS window_start,
         CASE WHEN ts < watermark - INTERVAL 7 DAY THEN 1 ELSE 0 END AS is_late,
         ROUND(value * 100, 0)::BIGINT AS cents
  FROM wm
)
SELECT event_type, window_start,
       SUM(1 - is_late)::BIGINT AS n_events,
       SUM(CASE WHEN is_late = 0 THEN cents ELSE 0 END)::BIGINT AS sum_value_cents,
       SUM(is_late)::BIGINT AS n_late
FROM flagged GROUP BY event_type, window_start
ORDER BY event_type, window_start
"""


def q_sessions(sf_dir: str) -> pd.DataFrame:
    events = _read(sf_dir, "events", columns=["user_id", "ts"])
    out = sessionize(events, gap_minutes=30).to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


Q_SESSIONS_SQL = """
WITH d AS (
  SELECT user_id, ts,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
  FROM events)
SELECT user_id, (SUM(new_s) + 1)::BIGINT AS n_sessions, COUNT(*)::BIGINT AS n_events
FROM d GROUP BY user_id ORDER BY user_id
"""


def q_event_hist(sf_dir: str) -> pd.DataFrame:
    events = _read(sf_dir, "events", columns=["event_type", "value"])
    out = grouped_agg(
        events, ["event_type"], {"n": ("value", "count"), "sum_value": ("value", "sum")}
    )
    out["n"] = out["n"].astype("int64")
    out["sum_value_cents"] = _round(out["sum_value"] * 100)
    out = out.drop(columns=["sum_value"])
    return out.sort_values("event_type").reset_index(drop=True)


Q_EVENT_HIST_SQL = """
SELECT event_type, COUNT(*)::BIGINT AS n, ROUND(SUM(value) * 100, 0) AS sum_value_cents
FROM events GROUP BY event_type ORDER BY event_type
"""


# --- documents (text) --------------------------------------------------------


def q_lang_hist(sf_dir: str) -> pd.DataFrame:
    docs = _read(sf_dir, "documents", columns=["lang"])
    out = grouped_agg(docs, ["lang"], {"n_docs": ("lang", "count")})
    out["n_docs"] = out["n_docs"].astype("int64")
    return out.sort_values("lang").reset_index(drop=True)


Q_LANG_HIST_SQL = (
    "SELECT lang, COUNT(*)::BIGINT AS n_docs FROM documents GROUP BY lang ORDER BY lang"
)


def q_token_stats(sf_dir: str) -> pd.DataFrame:
    docs = _read(sf_dir, "documents", columns=["lang", "text", "n_chars"])

    def toks(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["n_tokens"] = b["text"].str.count(r"\S+").astype("int64")
        return b[["lang", "n_tokens", "n_chars"]]

    out = grouped_agg(
        docs,
        ["lang"],
        {
            "n_docs": ("n_tokens", "count"),
            "total_tokens": ("n_tokens", "sum"),
            "total_chars": ("n_chars", "sum"),
        },
        pre=toks,
    )
    for c in ("n_docs", "total_tokens", "total_chars"):
        out[c] = out[c].astype("int64")
    return out.sort_values("lang").reset_index(drop=True)


Q_TOKEN_STATS_SQL = """
SELECT lang, COUNT(*)::BIGINT AS n_docs,
       SUM(array_length(regexp_extract_all(text, '\\S+')))::BIGINT AS total_tokens,
       SUM(n_chars)::BIGINT AS total_chars
FROM documents GROUP BY lang ORDER BY lang
"""


def q_exact_dedup_stats(sf_dir: str) -> pd.DataFrame:
    from ..ops.dedup import exact_dedup

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    n_docs = docs.count()
    n_distinct = exact_dedup(docs).count()
    return pd.DataFrame({"n_docs": [n_docs], "n_distinct": [n_distinct]}).astype("int64")


Q_EXACT_DEDUP_SQL = """
SELECT COUNT(*)::BIGINT AS n_docs, COUNT(DISTINCT text)::BIGINT AS n_distinct
FROM documents
"""


def q_canonical_docs(sf_dir: str) -> pd.DataFrame:
    """Canonical-representative selection per exact-dup text cluster
    (ops/dedup.py:canonical_per_duplicate): keep the LONGEST copy (min id
    tiebreak) and report every cluster's size — the RefinedWeb-style
    keep-best policy, vs exact_dedup's keep-first. One 32 B/row bucketed
    exchange; the twin partitions on BOTH md5 halves, the engine's exact
    128-bit identity."""
    from ..ops.dedup import canonical_per_duplicate

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = canonical_per_duplicate(docs, "text", "doc_id", num_buckets=16)
    out = out.to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


Q_CANONICAL_DOCS_SQL = """
WITH h AS (
  SELECT doc_id,
         md5_number_lower(text) AS h1, md5_number_upper(text) AS h2,
         length(text)::BIGINT AS L
  FROM documents),
r AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (PARTITION BY h1, h2 ORDER BY L DESC, doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY h1, h2) AS n_dups
  FROM h)
SELECT doc_id, n_dups::BIGINT AS n_dups FROM r WHERE rn = 1 ORDER BY doc_id
"""


def q_epoch_shuffle(sf_dir: str) -> pd.DataFrame:
    """Reproducible per-epoch training order
    (ops/sampling.py:epoch_shuffle_head): 3 seeded global permutations of
    the documents table by md5_number_lower('epoch:id'), first 40 rows of
    each epoch's order. No shuffle — the key is a pure row function and
    the head is a per-block top-k prune; a resumed trainer recomputes any
    position without coordination."""
    from ..ops.sampling import epoch_shuffle_head

    docs = _read(sf_dir, "documents", columns=["doc_id"])
    return epoch_shuffle_head(docs, "doc_id", epochs=3, k=40)


Q_EPOCH_SHUFFLE_SQL = """
WITH k AS (
  SELECT epoch, doc_id,
         md5_number_lower(epoch::VARCHAR || ':' || doc_id::VARCHAR) AS key
  FROM range(0, 3) t(epoch) CROSS JOIN documents),
r AS (
  SELECT epoch, doc_id,
         ROW_NUMBER() OVER (PARTITION BY epoch ORDER BY key, doc_id) AS pos
  FROM k)
SELECT epoch::BIGINT AS epoch, pos::BIGINT AS pos, doc_id
FROM r WHERE pos <= 40 ORDER BY epoch, pos
"""


def q_slugify_nations(sf_dir: str) -> pd.DataFrame:
    nation = _read(sf_dir, "nation", columns=["n_nationkey", "n_name"])
    out = nation.map_batches(
        lambda b: b.assign(slug=b["n_name"].map(simple_name)), batch_format="pandas"
    ).to_pandas()
    out["n_nationkey"] = out["n_nationkey"].astype("int32")
    return out.sort_values("n_nationkey").reset_index(drop=True)


Q_SLUGIFY_SQL = """
SELECT n_nationkey, n_name,
       trim(regexp_replace(lower(n_name), '[^a-z0-9]+', '-', 'g'), '-') AS slug
FROM nation ORDER BY n_nationkey
"""


# --- embeddings --------------------------------------------------------------


def _query_vec(sf_dir: str) -> np.ndarray:
    t = pq.read_table(_t(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    idx = t["vec_id"].to_pylist().index(0)
    return np.asarray(t["embedding"][idx].as_py(), dtype=np.float64)


def q_ann_topk(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    q = _query_vec(sf_dir)
    out = cosine_topk(ds, q, k=10, exclude_ids={0})
    out["vec_id"] = out["vec_id"].astype("int64")
    return out


Q_ANN_SQL = """
WITH q AS (SELECT embedding::DOUBLE[] AS e FROM embeddings WHERE vec_id = 0)
SELECT vec_id,
       ROUND(list_cosine_similarity(embedding::DOUBLE[], (SELECT e FROM q)), 6) AS score
FROM embeddings WHERE vec_id <> 0
ORDER BY list_cosine_similarity(embedding::DOUBLE[], (SELECT e FROM q)) DESC, vec_id
LIMIT 10
"""


def q_embedding_norms(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "embeddings", columns=["label", "embedding"])

    def norms(b: pd.DataFrame) -> pd.DataFrame:
        m = np.asarray([np.asarray(v, dtype=np.float64) for v in b["embedding"]])
        return pd.DataFrame({"label": b["label"].to_numpy(), "norm": np.linalg.norm(m, axis=1)})

    out = grouped_agg(
        ds, ["label"], {"n": ("norm", "count"), "sum_norm": ("norm", "sum")}, pre=norms
    )
    out["n"] = out["n"].astype("int64")
    out["sum_norm"] = _round(out["sum_norm"])
    return out.sort_values("label").reset_index(drop=True)


Q_EMB_NORMS_SQL = """
SELECT label, COUNT(*)::BIGINT AS n,
       ROUND(SUM(sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x)))), 0) AS sum_norm
FROM embeddings GROUP BY label ORDER BY label
"""


def q_embedding_near_dups(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = embedding_near_dup_pairs(ds, threshold=0.35).to_pandas()
    return (
        out[["id_a", "id_b", "score"]]
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )


Q_EMB_NEAR_DUP_SQL = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS score
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.35
ORDER BY id_a, id_b
"""


# --- text-analysis queries (DuckDB-oracled via md5_number_lower: the
# Python feature hash is the low half of md5 in little-endian byte order,
# bit-identical to DuckDB's md5_number_lower, so simhash/fingerprints get
# EXACT SQL oracles; ratios divide identical integer operands in both
# engines, so raw doubles compare bitwise without rounding) ------------------


def q_doc_quality(sf_dir: str) -> pd.DataFrame:
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = add_text_stats(docs).to_pandas()
    out = out.drop(columns=["text"])
    return out.sort_values("doc_id").reset_index(drop=True)


# the stopword union / per-language lists mirror textstats._STOPWORDS
_SQL_STOP_ALL = (
    "['the','and','of','to','a','in','is','that','for','with','on','as',"
    "'el','la','de','que','y','en','los','del','las','por','con','para',"
    "'le','et','les','des','un','une','du','pour',"
    "'der','die','und','das','von','zu','den','mit','ist','im','ein']"
)

Q_DOC_QUALITY_SQL = r"""
WITH w AS (
  SELECT doc_id, text,
         list_transform(regexp_extract_all(text, '[a-zA-ZÀ-ɏ]+'), x -> lower(x)) AS ws
  FROM documents
),
s AS (
  SELECT doc_id,
         length(text)::BIGINT AS n_chars,
         len(regexp_extract_all(text, '\S+'))::BIGINT AS n_tokens,
         len(ws)::BIGINT AS n_words,
         len(list_filter(ws, x -> list_contains(""" + _SQL_STOP_ALL + r""", x)))::BIGINT AS n_stop,
         len(regexp_extract_all(text, '[.,;:!?¡¿"''()\[\]{}«»]'))::BIGINT AS n_punct,
         list_sum(list_transform(ws, x -> length(x))) AS sum_wlen
  FROM w
)
SELECT doc_id, n_chars, n_tokens, n_words,
       CASE WHEN n_words = 0 THEN 0.0 ELSE n_stop / n_words END AS stopword_ratio,
       CASE WHEN n_chars = 0 THEN 0.0 ELSE n_punct / n_chars END AS punct_ratio,
       CASE WHEN n_words = 0 THEN 0.0 ELSE COALESCE(sum_wlen, 0) / n_words END AS mean_word_len
FROM s ORDER BY doc_id
"""


def q_langid(sf_dir: str) -> pd.DataFrame:
    docs = _read(sf_dir, "documents", columns=["doc_id", "lang", "text"])
    out = add_langid(docs).to_pandas().drop(columns=["text"])
    # int64 not bool: keeps the value-hash comparison engine-neutral
    out["match"] = (out["lang_pred"] == out["lang"]).astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


Q_LANGID_SQL = r"""
WITH w AS (
  SELECT doc_id, lang,
         list_transform(regexp_extract_all(text, '[a-zA-ZÀ-ɏ]+'), x -> lower(x)) AS ws
  FROM documents
),
s AS (
  SELECT doc_id, lang, len(ws) AS nw,
    len(list_filter(ws, x -> list_contains(['der','die','und','das','von','zu','den','mit','ist','des','im','ein'], x))) AS de,
    len(list_filter(ws, x -> list_contains(['the','and','of','to','a','in','is','that','for','with','on','as'], x))) AS en,
    len(list_filter(ws, x -> list_contains(['el','la','de','que','y','en','los','del','las','por','con','para'], x))) AS es,
    len(list_filter(ws, x -> list_contains(['le','la','de','et','les','des','en','un','une','du','que','pour'], x))) AS fr
  FROM w
),
p AS (
  SELECT doc_id, lang,
    CASE WHEN nw = 0 OR greatest(de,en,es,fr) = 0 THEN 'und'
         WHEN de >= en AND de >= es AND de >= fr THEN 'de'
         WHEN en >= es AND en >= fr THEN 'en'
         WHEN es >= fr THEN 'es'
         ELSE 'fr' END AS lang_pred
  FROM s
)
SELECT doc_id, lang, lang_pred, (lang_pred = lang)::BIGINT AS match FROM p ORDER BY doc_id
"""


def q_repetition(sf_dir: str) -> pd.DataFrame:
    """Gopher-style duplicate-3-gram fraction per doc (boilerplate /
    template detection signal). Ratio divides identical ints in both
    engines -> bitwise-comparable doubles."""
    from ..ops.textstats import add_repetition_stats

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = add_repetition_stats(docs).to_pandas().drop(columns=["text"])
    return out.sort_values("doc_id").reset_index(drop=True)


Q_REPETITION_SQL = r"""
WITH w AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-zA-ZÀ-ɏ]+') AS ws FROM documents
),
g AS (
  SELECT doc_id,
         list_transform(generate_series(1, greatest(len(ws) - 2, 0)),
                        i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) AS grams
  FROM w
)
SELECT doc_id, len(grams)::BIGINT AS n_grams,
       len(list_distinct(grams))::BIGINT AS n_distinct_grams,
       CASE WHEN len(grams) = 0 THEN 0.0
            ELSE (len(grams) - len(list_distinct(grams))) / len(grams) END AS dup_gram_frac
FROM g ORDER BY doc_id
"""


def q_simhash(sf_dir: str) -> pd.DataFrame:
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = add_simhash(docs).to_pandas().drop(columns=["text"])
    return out.sort_values("doc_id").reset_index(drop=True)


# the simhash CTE: md5_number_lower feature hash, occurrence-weighted bit
# votes, sign -> bit, mapped to SIGNED int64 (the engine's storage
# convention at the Arrow boundary)
_SIMHASH_CTE = r"""
WITH toks AS (
  SELECT doc_id, t AS tok, COUNT(*)::BIGINT AS c
  FROM documents, unnest(regexp_extract_all(lower(text), '[a-zA-ZÀ-ɏ]+')) AS u(t)
  GROUP BY doc_id, t
),
bits AS (
  SELECT doc_id, b.i AS bit,
         SUM(CASE WHEN (md5_number_lower(tok) >> b.i) & 1 = 1 THEN c ELSE -c END) AS w
  FROM toks, LATERAL generate_series(0, 63) AS b(i)
  GROUP BY doc_id, b.i
),
shu AS (
  SELECT doc_id, SUM(CASE WHEN w > 0 THEN (1::HUGEINT << bit) ELSE 0::HUGEINT END) AS u
  FROM bits GROUP BY doc_id
),
sh AS (
  SELECT d.doc_id,
         COALESCE(CASE WHEN s.u >= 9223372036854775808::HUGEINT
                       THEN (s.u - 18446744073709551616::HUGEINT)
                       ELSE s.u END, 0)::BIGINT AS simhash
  FROM documents d LEFT JOIN shu s USING (doc_id)
)
"""

Q_SIMHASH_SQL = _SIMHASH_CTE + "SELECT doc_id, simhash FROM sh ORDER BY doc_id"


def q_fingerprints(sf_dir: str) -> pd.DataFrame:
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def fp(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].to_numpy(),
                "n_fingerprints": [
                    len(winnowing_fingerprints(t)) for t in b["text"]
                ],
            }
        ).astype({"doc_id": "int64", "n_fingerprints": "int64"})

    return docs.map_batches(fp, batch_format="pandas").to_pandas().sort_values("doc_id").reset_index(drop=True)


Q_FINGERPRINTS_SQL = r"""
WITH t AS (SELECT doc_id, lower(text) AS lt FROM documents),
grams AS (
  SELECT doc_id, g.i AS i, md5_number_lower(substring(lt, g.i::INT, 8)) AS h
  FROM t, UNNEST(generate_series(1, length(lt) - 7)) AS g(i)
  WHERE length(lt) >= 8
),
winmin AS (
  SELECT doc_id, i,
         MIN(h) OVER (PARTITION BY doc_id ORDER BY i ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS m,
         COUNT(*) OVER (PARTITION BY doc_id) AS g_cnt
  FROM grams
),
sel AS (
  SELECT doc_id, i, m, LAG(m) OVER (PARTITION BY doc_id ORDER BY i) AS pm
  FROM winmin WHERE i <= greatest(g_cnt - 3, 1)
),
cnt AS (
  SELECT doc_id, COUNT(CASE WHEN pm IS NULL OR m <> pm THEN 1 END)::BIGINT AS n_fingerprints
  FROM sel GROUP BY doc_id
)
SELECT d.doc_id, COALESCE(c.n_fingerprints, 0)::BIGINT AS n_fingerprints
FROM documents d LEFT JOIN cnt c USING (doc_id) ORDER BY d.doc_id
"""


def q_minhash_dup_pairs(sf_dir: str) -> pd.DataFrame:
    from ..ops.dedup import minhash_lsh_pairs

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = minhash_lsh_pairs(docs, threshold=0.7).to_pandas()
    cols = ["id_a", "id_b", "jaccard"]
    out = out[cols] if len(out) else pd.DataFrame(columns=cols)
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


# oracle = EXACT all-pairs word-3-shingle Jaccard (O(n^2), oracle scale
# only). The LSH output equals it because banding recall is 1.0 on this
# corpus (verified at sf0.01 AND sf0.1); jaccard doubles compare bitwise
# since both engines divide the same |A∩B| / |A∪B| integers.
Q_MINHASH_PAIRS_SQL = r"""
WITH w AS (SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS ws FROM documents),
sh AS (SELECT doc_id,
  CASE WHEN len(ws) = 0 THEN []::VARCHAR[]
       WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
       ELSE list_distinct(list_transform(generate_series(1, len(ws)-2),
                                         i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))
  END AS s FROM w)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
  CASE WHEN len(a.s)=0 AND len(b.s)=0 THEN 1.0
       ELSE len(list_intersect(a.s, b.s)) / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
  END AS jaccard
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE jaccard >= 0.7 ORDER BY id_a, id_b
"""


def q_ngram_jaccard_pairs(sf_dir: str) -> pd.DataFrame:
    """Direct n-gram Jaccard near-dups (bottom-k shingle sketch candidates,
    exact verify) — same oracle family as minhash but a lower threshold
    and NO minhash approximation in the candidate stage."""
    from ..ops.dedup import ngram_jaccard_pairs

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = ngram_jaccard_pairs(docs, threshold=0.6).to_pandas()
    cols = ["id_a", "id_b", "jaccard"]
    out = out[cols] if len(out) else pd.DataFrame(columns=cols)
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


# Exact all-pairs oracle at threshold 0.6. The bottom-16 sketch misses a
# >=0.6 pair with prob <= 0.4^16 ~ 4e-7 per pair; recall is verified 1.0 on
# the synthetic corpus at sf0.01 and sf0.1, and the verify stage recomputes
# the same integer-ratio jaccard DuckDB does, so doubles compare bitwise.
Q_NGRAM_PAIRS_SQL = Q_MINHASH_PAIRS_SQL.replace("jaccard >= 0.7", "jaccard >= 0.6")


def q_simhash_dup_pairs(sf_dir: str) -> pd.DataFrame:
    from ..ops.dedup import simhash_dup_pairs

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = simhash_dup_pairs(docs, max_hamming=3).to_pandas()
    cols = ["id_a", "id_b", "hamming"]
    out = out[cols] if len(out) else pd.DataFrame(columns=cols)
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


# oracle = exact all-pairs Hamming over the SQL-computed simhash. The
# 4x16-bit chunk scheme is EXHAUSTIVE for hamming <= 3 (pigeonhole), so
# the distributed candidate generation loses nothing vs all-pairs.
Q_SIMHASH_PAIRS_SQL = _SIMHASH_CTE + r"""
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
ORDER BY id_a, id_b
"""


# --- registry ----------------------------------------------------------------

SQL_QUERIES: dict[str, tuple] = {
    "q1_pricing_summary": (q1_pricing_summary, Q1_SQL),
    "q3_top_unshipped": (q3_top_unshipped, Q3_SQL),
    "q4_order_priority": (q4_order_priority, Q4_SQL),
    "q5_nation_revenue": (q5_nation_revenue, Q5_SQL),
    "q6_revenue": (q6_revenue, Q6_SQL),
    "q6_pushdown": (q6_pushdown, Q6_SQL),
    "q_top_suppliers": (q_top_suppliers, Q_TOP_SUPPLIERS_SQL),
    "q_filter_sort_limit": (q_filter_sort_limit, Q_FILTER_SORT_SQL),
    "q_distinct_segments": (q_distinct_segments, Q_DISTINCT_SQL),
    "q_customers_per_nation": (q_customers_per_nation, Q_CUST_NATION_SQL),
    "q_minmax_orderdate": (q_minmax_orderdate, Q_MINMAX_SQL),
    "q_union_extreme_parts": (q_union_extreme_parts, Q_UNION_SQL),
    "q_semi_customers_with_orders": (q_semi_customers_with_orders, Q_SEMI_SQL),
    "q_anti_customers_without_urgent": (q_anti_customers_without_urgent, Q_ANTI_SQL),
    "q_avg_acctbal_by_segment": (q_avg_acctbal_by_segment, Q_AVG_SQL),
    "q_events_tumbling": (q_events_tumbling, Q_TUMBLING_SQL),
    "q_late_events": (q_late_events, Q_LATE_EVENTS_SQL),
    "q_streaming_window_ingest": (q_streaming_window_ingest, Q_STREAMING_INGEST_SQL),
    "q_sessions": (q_sessions, Q_SESSIONS_SQL),
    "q_event_hist": (q_event_hist, Q_EVENT_HIST_SQL),
    "q_lang_hist": (q_lang_hist, Q_LANG_HIST_SQL),
    "q_token_stats": (q_token_stats, Q_TOKEN_STATS_SQL),
    "q_exact_dedup_stats": (q_exact_dedup_stats, Q_EXACT_DEDUP_SQL),
    "q_slugify_nations": (q_slugify_nations, Q_SLUGIFY_SQL),
    "q_ann_topk": (q_ann_topk, Q_ANN_SQL),
    "q_embedding_norms": (q_embedding_norms, Q_EMB_NORMS_SQL),
    "q_embedding_near_dups": (q_embedding_near_dups, Q_EMB_NEAR_DUP_SQL),
}

SQL_QUERIES.update(
    {
        "q_doc_quality": (q_doc_quality, Q_DOC_QUALITY_SQL),
        "q_repetition": (q_repetition, Q_REPETITION_SQL),
        "q_langid": (q_langid, Q_LANGID_SQL),
        "q_simhash": (q_simhash, Q_SIMHASH_SQL),
        "q_fingerprints": (q_fingerprints, Q_FINGERPRINTS_SQL),
        "q_minhash_dup_pairs": (q_minhash_dup_pairs, Q_MINHASH_PAIRS_SQL),
        "q_ngram_jaccard_pairs": (q_ngram_jaccard_pairs, Q_NGRAM_PAIRS_SQL),
        "q_simhash_dup_pairs": (q_simhash_dup_pairs, Q_SIMHASH_PAIRS_SQL),
        "q_canonical_docs": (q_canonical_docs, Q_CANONICAL_DOCS_SQL),
        "q_epoch_shuffle": (q_epoch_shuffle, Q_EPOCH_SHUFFLE_SQL),
    }
)

ROWS_ONLY_QUERIES: dict = {}


def q_asof_purchase_view(sf_dir: str) -> pd.DataFrame:
    """As-of join: each purchase event matched to the user's latest
    earlier-or-equal view event (custom temporal-join operator,
    ops/asof.py; oracle: DuckDB ASOF JOIN)."""
    from ..ops.asof import asof_join

    events = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"])
    purchases = events.map_batches(
        lambda b: b[b["event_type"] == "purchase"][["event_id", "user_id", "ts"]],
        batch_format="pandas",
    )
    views = events.map_batches(
        lambda b: b[b["event_type"] == "view"][["event_id", "user_id", "ts"]],
        batch_format="pandas",
    )
    out = asof_join(
        purchases,
        views,
        key_col="user_id",
        ts_col="ts",
        left_cols=["event_id"],
        right_cols=["event_id"],
        num_buckets=16,
    ).to_pandas()
    out = out.dropna(subset=["event_id_right"])  # inner semantics, match SQL
    for c in ("event_id", "event_id_right", "user_id"):
        out[c] = out[c].astype("int64")
    out = _us(out, "ts")
    return out.sort_values("event_id").reset_index(drop=True)


Q_ASOF_SQL = """
SELECT p.user_id, p.ts, p.event_id, v.event_id AS event_id_right
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON p.user_id = v.user_id AND p.ts >= v.ts
ORDER BY p.event_id
"""


def q_topk_per_group(sf_dir: str) -> pd.DataFrame:
    """Top-3 orders by totalprice within each market segment (grouped
    ranking via hash-bucketed map_groups)."""
    from ..ops.agg import bucketed_map_groups

    cust = _small(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])
    joined = broadcast_hash_join(orders, cust, left_on="o_custkey", right_on="c_custkey")

    def per_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        b = bucket.sort_values(
            ["c_mktsegment", "o_totalprice", "o_orderkey"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        return b.groupby("c_mktsegment", sort=False).head(3)[
            ["c_mktsegment", "o_orderkey", "o_totalprice"]
        ]

    out = bucketed_map_groups(joined, "c_mktsegment", per_bucket, num_buckets=8).to_pandas()
    return out.sort_values(["c_mktsegment", "o_orderkey"]).reset_index(drop=True)


Q_TOPK_GROUP_SQL = """
SELECT c_mktsegment, o_orderkey, o_totalprice FROM (
  SELECT c_mktsegment, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (
           PARTITION BY c_mktsegment
           ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders JOIN customer ON o_custkey = c_custkey)
WHERE rn <= 3 ORDER BY c_mktsegment, o_orderkey
"""


def q_sample_orders(sf_dir: str) -> pd.DataFrame:
    """Deterministic 10% multiplicative-hash sample (ops/sampling.py) —
    engine-independent, so the sample is exactly reproducible in SQL (the
    seeded-random path, Dataset.random_sample, is bounds-tested in pytest
    instead: its row pick is engine-specific)."""
    from ..ops.sampling import hash_sample

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    sampled = hash_sample(orders, "o_orderkey", 0.1)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"n_sampled": [len(b)], "sum_price": [b["o_totalprice"].sum()]}
        )

    parts = sampled.map_batches(partial, batch_format="pandas").to_pandas()
    return pd.DataFrame(
        {
            "n_sampled": [int(parts["n_sampled"].sum())],
            "sum_price_cents": [_round(float(parts["sum_price"].sum()) * 100)],
        }
    )


Q_SAMPLE_SQL = """
SELECT COUNT(*)::BIGINT AS n_sampled, ROUND(SUM(o_totalprice) * 100, 0) AS sum_price_cents
FROM orders
WHERE ((o_orderkey % 4294967296)::UBIGINT * 2654435761) % 4294967296 < 429496729
"""


SQL_QUERIES.update(
    {
        "q_asof_purchase_view": (q_asof_purchase_view, Q_ASOF_SQL),
        "q_topk_per_group": (q_topk_per_group, Q_TOPK_GROUP_SQL),
        "q_sample_orders": (q_sample_orders, Q_SAMPLE_SQL),
    }
)


def q_min_acctbal_suppliers(sf_dir: str) -> pd.DataFrame:
    """Q2-flavored correlated min: suppliers holding the minimum acctbal of
    their nation (grouped min -> broadcast filter, no correlated rescan)."""
    sup = _read(sf_dir, "supplier", columns=["s_suppkey", "s_name", "s_nationkey", "s_acctbal"])
    mins = grouped_agg(sup, ["s_nationkey"], {"min_bal": ("s_acctbal", "min")})
    joined = broadcast_hash_join(sup, mins, left_on="s_nationkey")
    out = joined.map_batches(
        lambda b: b[b["s_acctbal"] == b["min_bal"]][["s_suppkey", "s_name", "s_nationkey", "s_acctbal"]],
        batch_format="pandas",
    ).to_pandas()
    return out.sort_values("s_suppkey").reset_index(drop=True)


Q_MIN_ACCTBAL_SQL = """
SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier s
WHERE s_acctbal = (SELECT MIN(s_acctbal) FROM supplier s2
                   WHERE s2.s_nationkey = s.s_nationkey)
ORDER BY s_suppkey
"""


def q7_nation_volume(sf_dir: str) -> pd.DataFrame:
    """Q7-flavored shipping volume between (supplier nation, customer
    nation) pairs by ship year."""
    sup = _small(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    cust = _small(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    orders_c = broadcast_hash_join(
        orders, cust, left_on="o_custkey", right_on="c_custkey", batch_format="pyarrow"
    ).select_columns(["o_orderkey", "c_nationkey"])
    li = _read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def f_li(t: pa.Table) -> pa.Table:
        # derive year + int64 volume BEFORE the joins: the shuffle carries
        # 4 int columns instead of floats + a timestamp + keys
        import pyarrow.compute as pc

        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "l_suppkey": t["l_suppkey"],
                "ship_year": pc.cast(pc.year(t["l_shipdate"]), pa.int64()),
                "volume": _int_rev_arrow(t["l_extendedprice"], t["l_discount"]),
            }
        )

    li_s = broadcast_hash_join(
        li.map_batches(f_li, batch_format="pyarrow", zero_copy_batch=True),
        sup,
        left_on="l_suppkey",
        right_on="s_suppkey",
        batch_format="pyarrow",
    ).select_columns(["l_orderkey", "s_nationkey", "ship_year", "volume"])
    joined = adaptive_hash_join(li_s, orders_c, "inner", on=("l_orderkey",), right_on=("o_orderkey",))

    out = grouped_agg(
        joined,
        ["s_nationkey", "c_nationkey", "ship_year"],
        {"volume": ("volume", "sum"), "n_items": ("volume", "count")},
        batch_format="pyarrow",
    )
    out["volume"] = out["volume"].astype("int64")
    out["n_items"] = out["n_items"].astype("int64")
    return out.sort_values(["s_nationkey", "c_nationkey", "ship_year"]).reset_index(drop=True)


Q7_SQL = """
SELECT s_nationkey, c_nationkey, year(l_shipdate)::BIGINT AS ship_year,
       SUM(ROUND(l_extendedprice * 100, 0)::BIGINT * (100 - ROUND(l_discount * 100, 0)::BIGINT))::BIGINT AS volume,
       COUNT(*)::BIGINT AS n_items
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
GROUP BY s_nationkey, c_nationkey, ship_year
ORDER BY s_nationkey, c_nationkey, ship_year
"""


def q10_returned_revenue(sf_dir: str) -> pd.DataFrame:
    """Q10-flavored: top-20 customers by revenue of returned lineitems."""
    cust = _small(sf_dir, "customer", columns=["c_custkey", "c_name"])
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    li = _read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
    )

    def pre_li(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.filter(pc.equal(t["l_returnflag"], "R"))
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "revenue": _int_rev_arrow(t["l_extendedprice"], t["l_discount"]),
            }
        )

    li_r = li.map_batches(pre_li, batch_format="pyarrow", zero_copy_batch=True)
    joined = adaptive_hash_join(li_r, orders, "inner", on=("l_orderkey",), right_on=("o_orderkey",))
    # customer-cardinality groupby: bucketed combine + per-bucket top-20 ->
    # the driver merges 20 rows per bucket, never one row per customer
    # (q3's shape; at web scale the per-customer frame is a driver OOM)
    per_cust = grouped_agg(
        joined,
        ["o_custkey"],
        {"revenue": ("revenue", "sum")},
        final="bucketed",
        num_buckets=16,
        empty_result=pd.DataFrame(
            {"o_custkey": pd.Series(dtype="int64"), "revenue": pd.Series(dtype="int64")}
        ),
    )

    def topk(bucket: pd.DataFrame) -> pd.DataFrame:
        bucket = bucket.copy()
        bucket["revenue"] = bucket["revenue"].astype("int64")
        return bucket.sort_values(
            ["revenue", "o_custkey"], ascending=[False, True], kind="mergesort"
        ).head(20)

    cand = per_cust.map_batches(topk, batch_format="pandas").to_pandas()
    out = cand.merge(cust.to_pandas(), left_on="o_custkey", right_on="c_custkey")
    out = out.sort_values(
        ["revenue", "c_custkey"], ascending=[False, True], kind="mergesort"
    ).head(20)
    return out[["c_custkey", "c_name", "revenue"]].reset_index(drop=True)


Q10_SQL = """
SELECT c_custkey, c_name,
       SUM(ROUND(l_extendedprice * 100, 0)::BIGINT * (100 - ROUND(l_discount * 100, 0)::BIGINT))::BIGINT AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name
ORDER BY revenue DESC, c_custkey LIMIT 20
"""


def q_sliding_window(sf_dir: str) -> pd.DataFrame:
    """Sliding window (size 2h, step 1h): each event contributes to the two
    hourly windows covering it — emitted twice map-side, then the same
    two-stage aggregation as tumbling."""
    events = _read(sf_dir, "events", columns=["event_type", "ts", "value"])

    def pre(b: pd.DataFrame) -> pd.DataFrame:
        base = b[["event_type", "ts", "value"]].copy()
        base["window_start"] = base["ts"].dt.floor("h")
        prev = base.copy()
        prev["window_start"] = prev["window_start"] - pd.Timedelta(hours=1)
        return pd.concat([base, prev], ignore_index=True)

    out = grouped_agg(
        events,
        ["event_type", "window_start"],
        {"n_events": ("value", "count"), "sum_value": ("value", "sum")},
        pre=pre,
    )
    out["n_events"] = out["n_events"].astype("int64")
    out["sum_value_cents"] = _round(out["sum_value"] * 100)
    out = out.drop(columns=["sum_value"])
    out = _us(out, "window_start")
    return out.sort_values(["event_type", "window_start"]).reset_index(drop=True)


Q_SLIDING_SQL = """
SELECT event_type, window_start, COUNT(*)::BIGINT AS n_events,
       ROUND(SUM(value) * 100, 0) AS sum_value_cents
FROM (
  SELECT event_type, date_trunc('hour', ts) AS window_start, value FROM events
  UNION ALL
  SELECT event_type, date_trunc('hour', ts) - INTERVAL 1 HOUR, value FROM events
) GROUP BY event_type, window_start ORDER BY event_type, window_start
"""


def q_value_histogram(sf_dir: str) -> pd.DataFrame:
    """Integer-bucket histogram of event values per type (bucket = floor
    of value/50) — exact in both engines."""
    events = _read(sf_dir, "events", columns=["event_type", "value"])

    def pre(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["bucket_id"] = np.floor(b["value"] / 50.0).astype("int64")
        return b

    out = grouped_agg(events, ["event_type", "bucket_id"], {"n": ("value", "count")}, pre=pre)
    out["n"] = out["n"].astype("int64")
    return out.sort_values(["event_type", "bucket_id"]).reset_index(drop=True)


Q_HISTOGRAM_SQL = """
SELECT event_type, floor(value / 50.0)::BIGINT AS bucket_id, COUNT(*)::BIGINT AS n
FROM events GROUP BY event_type, bucket_id ORDER BY event_type, bucket_id
"""


SQL_QUERIES.update(
    {
        "q_min_acctbal_suppliers": (q_min_acctbal_suppliers, Q_MIN_ACCTBAL_SQL),
        "q7_nation_volume": (q7_nation_volume, Q7_SQL),
        "q10_returned_revenue": (q10_returned_revenue, Q10_SQL),
        "q_sliding_window": (q_sliding_window, Q_SLIDING_SQL),
        "q_value_histogram": (q_value_histogram, Q_HISTOGRAM_SQL),
    }
)


def q_word_count(sf_dir: str) -> pd.DataFrame:
    """The canonical distributed wordcount over documents: per-batch partial
    counts (vectorized explode+value_counts) -> two-stage combine -> global
    top-50."""
    docs = _read(sf_dir, "documents", columns=["text"])

    def pre(b: pd.DataFrame) -> pd.DataFrame:
        words = b["text"].str.lower().str.findall(r"[a-z0-9]+").explode().dropna()
        vc = words.value_counts()
        return pd.DataFrame({"word": vc.index, "n": vc.to_numpy()})

    # vocabulary-cardinality key (10^8+ words at web scale): bucketed
    # combine + per-bucket top-50; the driver merges 50 rows per bucket
    per_word = grouped_agg(
        docs,
        ["word"],
        {"n": ("n", "sum")},
        pre=pre,
        final="bucketed",
        num_buckets=16,
        empty_result=pd.DataFrame(
            {"word": pd.Series(dtype="object"), "n": pd.Series(dtype="int64")}
        ),
    )

    def topk(bucket: pd.DataFrame) -> pd.DataFrame:
        return bucket.sort_values(
            ["n", "word"], ascending=[False, True], kind="mergesort"
        ).head(50)

    out = per_word.map_batches(topk, batch_format="pandas").to_pandas()
    out["n"] = out["n"].astype("int64")
    return (
        out.sort_values(["n", "word"], ascending=[False, True], kind="mergesort")
        .head(50)
        .reset_index(drop=True)
    )


Q_WORD_COUNT_SQL = """
SELECT w AS word, COUNT(*)::BIGINT AS n
FROM documents, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t(w)
GROUP BY w ORDER BY n DESC, word LIMIT 50
"""


def q_crawl_drift(sf_dir: str) -> pd.DataFrame:
    """Dataset-shift monitoring: token-distribution drift between two
    crawl slices (doc_id parity stands in for last-crawl vs this-crawl).
    Top 20 terms by absolute count difference — the report a curation
    team reads before retraining on a refreshed crawl. One wordcount
    shuffle with (term, side) partials; all-integer drift, so the twin is
    hash-exact; per-bucket top-k prune keeps the driver at 20 rows per
    bucket (vocabulary NEVER lands whole on the driver)."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def pre(b: pd.DataFrame) -> pd.DataFrame:
        side = (b["doc_id"].to_numpy() % 2).astype("int64")
        words = b["text"].str.lower().str.findall(r"[a-z0-9]+")
        f = pd.DataFrame(
            {"word": words, "side": side}
        ).explode("word").dropna(subset=["word"])
        g = f.groupby(["word", "side"], sort=False).size().reset_index(name="c")
        return pd.DataFrame(
            {
                "word": g["word"].to_numpy(),
                "n_a": (g["c"] * (g["side"] == 0)).astype("int64").to_numpy(),
                "n_b": (g["c"] * (g["side"] == 1)).astype("int64").to_numpy(),
            }
        )

    per_word = grouped_agg(
        docs,
        ["word"],
        {"n_a": ("n_a", "sum"), "n_b": ("n_b", "sum")},
        pre=pre,
        final="bucketed",
        num_buckets=16,
        empty_result=pd.DataFrame(
            {
                "word": pd.Series(dtype="object"),
                "n_a": pd.Series(dtype="int64"),
                "n_b": pd.Series(dtype="int64"),
            }
        ),
    )

    from ..ops.agg import topk_rows

    with_drift = per_word.map_batches(
        lambda b: b.assign(drift=(b["n_a"] - b["n_b"]).abs().astype("int64")),
        batch_format="pandas",
    )
    # topk_rows: per-block prune + typed-empty-safe driver finalize (a
    # token-free corpus emits only schema-less blocks)
    out = topk_rows(
        with_drift,
        20,
        by=["drift", "word"],
        ascending=[False, True],
        empty=pd.DataFrame(
            {
                "word": pd.Series(dtype="object"),
                "n_a": pd.Series(dtype="int64"),
                "n_b": pd.Series(dtype="int64"),
                "drift": pd.Series(dtype="int64"),
            }
        ),
    )
    for c in ("n_a", "n_b", "drift"):
        out[c] = out[c].astype("int64")
    return out.reset_index(drop=True)[["word", "n_a", "n_b", "drift"]]


Q_CRAWL_DRIFT_SQL = """
WITH w AS (
  SELECT doc_id % 2 AS side,
         unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word
  FROM documents),
c AS (
  SELECT word,
         SUM(CASE WHEN side = 0 THEN 1 ELSE 0 END)::BIGINT AS n_a,
         SUM(CASE WHEN side = 1 THEN 1 ELSE 0 END)::BIGINT AS n_b
  FROM w GROUP BY word)
SELECT word, n_a, n_b, ABS(n_a - n_b)::BIGINT AS drift
FROM c ORDER BY drift DESC, word LIMIT 20
"""


def q_value_quantiles(sf_dir: str) -> pd.DataFrame:
    """Exact discrete quantiles (p25/p50/p75) of event value per type:
    hash-bucketed per-key collection + deterministic index pick (matches
    DuckDB quantile_disc: element at ceil(q * n) - 1). CONFORMANCE MODE —
    it collects every value of a key into one bucket; the scale path is
    ops/quantiles.approx_quantiles (mergeable rank-compressed sketch,
    O(k) per key per block, rank error <= 1%, pytest-bounded vs exact)."""
    from ..ops.agg import bucketed_map_groups

    events = _read(sf_dir, "events", columns=["event_type", "value"])

    def per_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, grp in bucket.groupby("event_type", sort=False):
            v = np.sort(grp["value"].to_numpy())
            n = len(v)
            def disc(q):  # DuckDB quantile_disc convention: ceil(q*n)-1
                return v[max(0, int(np.ceil(q * n)) - 1)]

            rows.append(
                {"event_type": et, "p25": disc(0.25), "p50": disc(0.50), "p75": disc(0.75), "n": n}
            )
        return pd.DataFrame(rows)

    out = bucketed_map_groups(events, "event_type", per_bucket, num_buckets=8).to_pandas()
    out["n"] = out["n"].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


Q_QUANTILES_SQL = """
SELECT event_type,
       quantile_disc(value, 0.25) AS p25,
       quantile_disc(value, 0.50) AS p50,
       quantile_disc(value, 0.75) AS p75,
       COUNT(*)::BIGINT AS n
FROM events GROUP BY event_type ORDER BY event_type
"""


def q12_priority_lines(sf_dir: str) -> pd.DataFrame:
    """Q12-flavored conditional aggregation: per return flag, lineitem
    counts split by order priority class (CASE-sum inside the map-side
    partial — no second pass)."""
    orders = _small(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_returnflag"])
    joined = broadcast_hash_join(li, orders, left_on="l_orderkey", right_on="o_orderkey")

    def pre(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        hi = b["o_orderpriority"].isin(["1-URGENT", "2-HIGH"])
        b["high_lines"] = hi.astype("int64")
        b["low_lines"] = (~hi).astype("int64")
        return b[["l_returnflag", "high_lines", "low_lines"]]

    out = grouped_agg(
        joined,
        ["l_returnflag"],
        {"high_lines": ("high_lines", "sum"), "low_lines": ("low_lines", "sum")},
        pre=pre,
    )
    for c in ("high_lines", "low_lines"):
        out[c] = out[c].astype("int64")
    return out.sort_values("l_returnflag").reset_index(drop=True)


Q12_SQL = """
SELECT l_returnflag,
       SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)::BIGINT AS high_lines,
       SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END)::BIGINT AS low_lines
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY l_returnflag ORDER BY l_returnflag
"""


def q14_promo_revenue(sf_dir: str) -> pd.DataFrame:
    """Q14-flavored: share of revenue from PROMO parts in a ship-date
    window — the CASE-sum-over-join + global-ratio pattern. Revenue is
    quantized per row to ints, so both engines divide identical sums."""
    part = _small(sf_dir, "part", columns=["p_partkey", "p_type"])
    li = _read(
        sf_dir, "lineitem",
        columns=["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def pre(b: pd.DataFrame) -> pd.DataFrame:
        b = b[
            (b["l_shipdate"] >= pd.Timestamp("1996-01-01"))
            & (b["l_shipdate"] < pd.Timestamp("1997-01-01"))
        ].copy()
        b["revenue"] = _int_rev(b["l_extendedprice"], b["l_discount"])
        return b[["l_partkey", "revenue"]]

    joined = broadcast_hash_join(
        li.map_batches(pre, batch_format="pandas"), part,
        left_on="l_partkey", right_on="p_partkey",
    )

    def split(b: pd.DataFrame) -> pd.DataFrame:
        promo = b["p_type"] == "PROMO"
        return pd.DataFrame(
            {
                "promo_rev": [b.loc[promo, "revenue"].sum()],
                "total_rev": [b["revenue"].sum()],
            }
        )

    parts = joined.map_batches(split, batch_format="pandas").to_pandas()
    promo_i = int(parts["promo_rev"].sum())
    total_i = int(parts["total_rev"].sum())
    return pd.DataFrame(
        {
            "promo_rev_cents": [promo_i],
            "total_rev_cents": [total_i],
            "promo_share": [promo_i / total_i if total_i else 0.0],
        }
    )


Q14_SQL = """
WITH s AS (
  SELECT SUM(CASE WHEN p_type = 'PROMO'
                   THEN ROUND(l_extendedprice * 100, 0)::BIGINT * (100 - ROUND(l_discount * 100, 0)::BIGINT)
                   ELSE 0 END)::BIGINT AS promo_rev_cents,
         SUM(ROUND(l_extendedprice * 100, 0)::BIGINT * (100 - ROUND(l_discount * 100, 0)::BIGINT))::BIGINT AS total_rev_cents
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
)
SELECT promo_rev_cents, total_rev_cents,
       CASE WHEN total_rev_cents = 0 THEN 0.0
            ELSE promo_rev_cents / total_rev_cents END AS promo_share
FROM s
"""


def q16_supplier_variety(sf_dir: str) -> pd.DataFrame:
    """Q16-flavored COUNT DISTINCT at scale: suppliers per (brand, size)
    for small parts — distinct via one bucketed dedup of the
    (brand, size, suppkey) triple, then a cheap count (never a
    driver-side set)."""
    from ..ops.agg import bucketed_map_groups

    part = _small(sf_dir, "part", columns=["p_partkey", "p_brand", "p_size"])
    part = part.filter(pa.compute.less(part["p_size"], 15))
    li = _read(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])
    joined = broadcast_hash_join(li, part, left_on="l_partkey", right_on="p_partkey")

    # map-side pre-distinct (the 99% row kill), then one bucketed shuffle
    pre = joined.map_batches(
        lambda b: b[["p_brand", "p_size", "l_suppkey"]].drop_duplicates(),
        batch_format="pandas",
    )
    distinct = bucketed_map_groups(
        pre,
        "p_brand",
        lambda b: b.drop_duplicates(["p_brand", "p_size", "l_suppkey"]),
        num_buckets=16,
        empty_result=pd.DataFrame(
            {
                "p_brand": pd.Series(dtype="object"),
                "p_size": pd.Series(dtype="int64"),
                "l_suppkey": pd.Series(dtype="int64"),
            }
        ),
    )
    out = grouped_agg(distinct, ["p_brand", "p_size"], {"supplier_cnt": ("l_suppkey", "count")})
    out["supplier_cnt"] = out["supplier_cnt"].astype("int64")
    out["p_size"] = out["p_size"].astype("int64")
    return out.sort_values(["p_brand", "p_size"]).reset_index(drop=True)


Q16_SQL = """
SELECT p_brand, p_size::BIGINT AS p_size, COUNT(DISTINCT l_suppkey)::BIGINT AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_size < 15
GROUP BY p_brand, p_size ORDER BY p_brand, p_size
"""


def q19_disjunctive_revenue(sf_dir: str) -> pd.DataFrame:
    """Q19-flavored disjunctive predicate (OR of brand×quantity bands)
    evaluated vectorized inside the map — the filter that defeats naive
    single-predicate pushdown."""
    part = _small(sf_dir, "part", columns=["p_partkey", "p_brand"])
    li = _read(
        sf_dir, "lineitem", columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"]
    )
    joined = broadcast_hash_join(li, part, left_on="l_partkey", right_on="p_partkey")

    def pre(b: pd.DataFrame) -> pd.DataFrame:
        q = b["l_quantity"]
        keep = (
            ((b["p_brand"] == "Brand#12") & (q >= 1) & (q <= 11))
            | ((b["p_brand"] == "Brand#23") & (q >= 10) & (q <= 20))
            | ((b["p_brand"] == "Brand#34") & (q >= 20) & (q <= 30))
        )
        b = b[keep].copy()
        b["revenue"] = _int_rev(b["l_extendedprice"], b["l_discount"])
        return b[["revenue"]]

    parts = joined.map_batches(
        lambda b: pd.DataFrame({"revenue": [pre(b)["revenue"].sum()]}),
        batch_format="pandas",
    ).to_pandas()
    return pd.DataFrame({"revenue_cents": [int(parts["revenue"].sum())]})


Q19_SQL = """
SELECT SUM(ROUND(l_extendedprice * 100, 0)::BIGINT * (100 - ROUND(l_discount * 100, 0)::BIGINT))::BIGINT AS revenue_cents
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND l_quantity BETWEEN 20 AND 30)
"""


def q22_idle_rich_customers(sf_dir: str) -> pd.DataFrame:
    """Q22-flavored: per nation, count+balance of customers with
    above-average (positive-balance) accounts and NO urgent orders —
    global scalar aggregate -> broadcast filter -> distributed anti
    join."""
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey", "c_acctbal"])

    # global scalar: avg over positive balances (cheap two-field partial)
    parts = cust.map_batches(
        lambda b: pd.DataFrame(
            {
                "s": [b.loc[b["c_acctbal"] > 0, "c_acctbal"].sum()],
                "n": [int((b["c_acctbal"] > 0).sum())],
            }
        ),
        batch_format="pandas",
    ).to_pandas()
    # compare in exact integer cents so both engines threshold identically
    total_cents = _round(float(parts["s"].sum()) * 100)
    n_pos = int(parts["n"].sum())
    avg_cents = total_cents / n_pos if n_pos else 0.0

    rich = cust.map_batches(
        lambda b: b[_round(b["c_acctbal"] * 100) > avg_cents], batch_format="pandas"
    )
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_orderpriority"])
    urgent = orders.map_batches(
        lambda b: b[b["o_orderpriority"] == "1-URGENT"][["o_custkey"]],
        batch_format="pandas",
    )
    idle = hash_join(rich, urgent, "left_anti", on=("c_custkey",), right_on=("o_custkey",))

    out = grouped_agg(
        idle,
        ["c_nationkey"],
        {"n_custs": ("c_custkey", "count"), "sum_bal": ("c_acctbal", "sum")},
    )
    if not len(out):
        return pd.DataFrame(
            {
                "c_nationkey": pd.Series(dtype="int64"),
                "n_custs": pd.Series(dtype="int64"),
                "sum_bal_cents": pd.Series(dtype="float64"),
            }
        )
    out["n_custs"] = out["n_custs"].astype("int64")
    out["sum_bal_cents"] = _round(out["sum_bal"] * 100)
    out["c_nationkey"] = out["c_nationkey"].astype("int64")
    out = out.drop(columns=["sum_bal"])
    return out.sort_values("c_nationkey").reset_index(drop=True)


Q22_SQL = """
WITH avg_bal AS (
  SELECT ROUND(SUM(c_acctbal) * 100, 0) / COUNT(*) AS avg_cents
  FROM customer WHERE c_acctbal > 0
)
SELECT c_nationkey::BIGINT AS c_nationkey, COUNT(*)::BIGINT AS n_custs,
       ROUND(SUM(c_acctbal) * 100, 0) AS sum_bal_cents
FROM customer
WHERE ROUND(c_acctbal * 100, 0) > (SELECT avg_cents FROM avg_bal)
  AND c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
GROUP BY c_nationkey ORDER BY c_nationkey
"""


def q_dup_clusters(sf_dir: str) -> pd.DataFrame:
    """Near-dup CLUSTER assignment: duplicate pairs chain (A~B, B~C) into
    components via distributed min-label propagation (ops/graph.py);
    cluster_id = min doc id in the component (singletons map to
    themselves). This is the keep-one-representative decision a dedup
    pipeline actually needs. Oracle: DuckDB recursive-CTE reachability
    over the exact all-pairs Jaccard graph."""
    from ..ops.dedup import minhash_lsh_pairs
    from ..ops.graph import connected_components

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    pairs = minhash_lsh_pairs(docs, threshold=0.7)
    comp = connected_components(
        _read(sf_dir, "documents", columns=["doc_id"]), pairs, node_col="doc_id"
    )
    out = comp.to_pandas().rename(columns={"node": "doc_id"})
    return out.sort_values("doc_id").reset_index(drop=True)


Q_DUP_CLUSTERS_SQL = r"""
WITH RECURSIVE
w AS (SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS ws FROM documents),
sh AS (SELECT doc_id,
  CASE WHEN len(ws) = 0 THEN []::VARCHAR[]
       WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
       ELSE list_distinct(list_transform(generate_series(1, len(ws)-2),
                                         i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))
  END AS s FROM w),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE CASE WHEN len(a.s)=0 AND len(b.s)=0 THEN 1.0
             ELSE len(list_intersect(a.s, b.s)) / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
        END >= 0.7
),
edges AS (SELECT id_a AS a, id_b AS b FROM pairs UNION ALL SELECT id_b, id_a FROM pairs),
reach(n, m) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT r.n, e.b FROM reach r JOIN edges e ON r.m = e.a
)
SELECT n AS doc_id, MIN(m)::BIGINT AS cluster_id FROM reach GROUP BY n ORDER BY doc_id
"""


def q_range_join(sf_dir: str) -> pd.DataFrame:
    """Interval (range) join: each purchase matched to EVERY view of the
    same user whose [ts, ts+1h) window contains it (ops/rangejoin.py —
    banded interval join, ranges exploded into <=2 width buckets; oracle:
    DuckDB inequality join)."""
    from ..ops.rangejoin import range_join

    events = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"])
    purchases = events.map_batches(
        lambda b: b[b["event_type"] == "purchase"][["event_id", "user_id", "ts"]],
        batch_format="pandas",
    )
    views = events.map_batches(
        lambda b: b[b["event_type"] == "view"]
        .assign(start=b["ts"], end=b["ts"] + pd.Timedelta(hours=1))[
            ["event_id", "user_id", "start", "end"]
        ],
        batch_format="pandas",
    )
    out = range_join(
        purchases,
        views,
        key_col="user_id",
        point_ts_col="ts",
        point_cols=["event_id"],
        range_cols=["event_id"],
        bucket_width=pd.Timedelta(hours=1),
    ).to_pandas()
    cols = ["user_id", "ts", "purchase_id", "view_id"]
    if not len(out):
        return pd.DataFrame(columns=cols)
    out = out.rename(columns={"p_event_id": "purchase_id", "r_event_id": "view_id"})
    for c in ("user_id", "purchase_id", "view_id"):
        out[c] = out[c].astype("int64")
    out = _us(out, "ts")
    return out[cols].sort_values(["purchase_id", "view_id"]).reset_index(drop=True)


Q_RANGE_JOIN_SQL = """
SELECT p.user_id, p.ts, p.event_id AS purchase_id, v.event_id AS view_id
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON p.user_id = v.user_id AND p.ts >= v.ts AND p.ts < v.ts + INTERVAL 1 HOUR
ORDER BY purchase_id, view_id
"""


def q_curation(sf_dir: str) -> pd.DataFrame:
    """The full curation pipeline end-to-end (pipelines/curation.py):
    quality+langid filter -> exact dedup -> near-dup cluster
    representatives -> token-budget packing. One composed oracle checks
    the whole chain, not just the stages."""
    from .curation import curate_documents

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = curate_documents(docs).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


Q_CURATION_SQL = r"""
WITH RECURSIVE
stats AS (
  SELECT doc_id, text,
         list_transform(regexp_extract_all(text, '[a-zA-ZÀ-ɏ]+'), x -> lower(x)) AS ws
  FROM documents
),
feat AS (
  SELECT doc_id, text, len(ws) AS n_words,
    len(list_filter(ws, x -> list_contains(""" + _SQL_STOP_ALL + r""", x))) AS n_stop,
    len(list_filter(ws, x -> list_contains(['der','die','und','das','von','zu','den','mit','ist','des','im','ein'], x))) AS de,
    len(list_filter(ws, x -> list_contains(['the','and','of','to','a','in','is','that','for','with','on','as'], x))) AS en,
    len(list_filter(ws, x -> list_contains(['el','la','de','que','y','en','los','del','las','por','con','para'], x))) AS es,
    len(list_filter(ws, x -> list_contains(['le','la','de','et','les','des','en','un','une','du','que','pour'], x))) AS fr
  FROM stats
),
kept AS (
  SELECT doc_id, text FROM feat
  WHERE n_words >= 30
    AND (CASE WHEN n_words = 0 THEN 0.0 ELSE n_stop / n_words END) >= 0.02
    AND NOT (n_words = 0 OR greatest(de, en, es, fr) = 0)
),
deduped AS (
  SELECT doc_id, text FROM kept
  QUALIFY ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) = 1
),
shg AS (
  SELECT doc_id,
    CASE WHEN len(ws) = 0 THEN []::VARCHAR[]
         WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
         ELSE list_distinct(list_transform(generate_series(1, len(ws)-2),
                                           i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))
    END AS s
  FROM (SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS ws FROM deduped)
),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM shg a JOIN shg b ON a.doc_id < b.doc_id
  WHERE CASE WHEN len(a.s)=0 AND len(b.s)=0 THEN 1.0
             ELSE len(list_intersect(a.s, b.s)) / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
        END >= 0.7
),
edg AS (SELECT id_a AS a, id_b AS b FROM pairs UNION ALL SELECT id_b, id_a FROM pairs),
reach(n, m) AS (
  SELECT doc_id, doc_id FROM deduped
  UNION
  SELECT r.n, e.b FROM reach r JOIN edg e ON r.m = e.a
),
reps AS (
  SELECT n AS doc_id FROM (SELECT n, MIN(m) AS mn FROM reach GROUP BY n) WHERE n = mn
),
final AS (
  SELECT d.doc_id, len(regexp_extract_all(d.text, '\S+'))::BIGINT AS n_tokens
  FROM deduped d JOIN reps USING (doc_id)
)
SELECT doc_id, n_tokens,
       (COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 4096)::BIGINT AS pack_id
FROM final ORDER BY doc_id
"""


def q_doc_packing(sf_dir: str) -> pd.DataFrame:
    """Deterministic token-budget document packing (training-sequence
    chunking): pack_id = floor(tokens_before_doc / budget) over id order —
    a distributed two-pass prefix scan (ops/scan.py; only (id, n_tokens)
    rows shuffle, driver holds one row per range)."""
    from ..ops.scan import pack_documents

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = pack_documents(docs, budget=4096).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


Q_DOC_PACKING_SQL = r"""
WITH t AS (
  SELECT doc_id, len(regexp_extract_all(text, '\S+'))::BIGINT AS n_tokens
  FROM documents
)
SELECT doc_id, n_tokens,
       (COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 4096)::BIGINT AS pack_id
FROM t ORDER BY doc_id
"""


SQL_QUERIES.update(
    {
        "q_word_count": (q_word_count, Q_WORD_COUNT_SQL),
        "q_crawl_drift": (q_crawl_drift, Q_CRAWL_DRIFT_SQL),
        "q_value_quantiles": (q_value_quantiles, Q_QUANTILES_SQL),
        "q_doc_packing": (q_doc_packing, Q_DOC_PACKING_SQL),
        "q12_priority_lines": (q12_priority_lines, Q12_SQL),
        "q14_promo_revenue": (q14_promo_revenue, Q14_SQL),
        "q16_supplier_variety": (q16_supplier_variety, Q16_SQL),
        "q19_disjunctive_revenue": (q19_disjunctive_revenue, Q19_SQL),
        "q22_idle_rich_customers": (q22_idle_rich_customers, Q22_SQL),
        "q_dup_clusters": (q_dup_clusters, Q_DUP_CLUSTERS_SQL),
        "q_curation": (q_curation, Q_CURATION_SQL),
        "q_range_join": (q_range_join, Q_RANGE_JOIN_SQL),
    }
)


def q_stratified_sample(sf_dir: str) -> pd.DataFrame:
    """Deterministic stratified sample: keep 20% of URGENT, 10% of HIGH,
    2% of everything else (class rebalancing, reproducible + SQL-twinned
    via the same multiplicative-hash CASE predicate)."""
    from ..ops.sampling import stratified_hash_sample

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])
    sampled = stratified_hash_sample(
        orders,
        "o_orderkey",
        "o_orderpriority",
        {"1-URGENT": 0.2, "2-HIGH": 0.1},
        default_fraction=0.02,
    )
    out = grouped_agg(sampled, ["o_orderpriority"], {"n": ("o_orderkey", "count")})
    if not len(out):
        return pd.DataFrame(
            {"o_orderpriority": pd.Series(dtype="object"), "n": pd.Series(dtype="int64")}
        )
    out["n"] = out["n"].astype("int64")
    return out.sort_values("o_orderpriority").reset_index(drop=True)


Q_STRATIFIED_SQL = """
SELECT o_orderpriority, COUNT(*)::BIGINT AS n
FROM orders
WHERE ((o_orderkey % 4294967296)::UBIGINT * 2654435761) % 4294967296 <
      CASE o_orderpriority
        WHEN '1-URGENT' THEN 858993459
        WHEN '2-HIGH' THEN 429496729
        ELSE 85899345 END
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""

SQL_QUERIES["q_stratified_sample"] = (q_stratified_sample, Q_STRATIFIED_SQL)


def q_embedding_near_dups_lsh(sf_dir: str) -> pd.DataFrame:
    """The LSH SCALE PATH of embedding near-dup under the driver's eye:
    n_planes>0 runs the full distributed shape — per-table hyperplane
    banding (id-only shuffle), bucketed pair dedup, Bloom candidate
    filter + hash-join verify (the pair count at this threshold exceeds
    driver_pair_limit, so the Bloom branch executes too).

    Why it can share the EXACT pair-set oracle: false positives are
    structurally impossible (every candidate is verified with the exact
    cosine), and with 16 tables x 2 planes the per-pair miss probability
    at cosine >= 0.35 is (1-(1-θ/π)^2)^16 ~ 5e-4 — recall is 1.0 at
    conformance scale (verified at sf0.001 and sf0.01; deterministic:
    planes derive from fixed seeds). At web scale recall < 1 is the
    documented trade of any LSH dedup."""
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = embedding_near_dup_pairs(
        ds, threshold=0.35, n_planes=2, n_tables=16
    ).to_pandas()
    return (
        out[["id_a", "id_b", "score"]]
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )


SQL_QUERIES["q_embedding_near_dups_lsh"] = (q_embedding_near_dups_lsh, Q_EMB_NEAR_DUP_SQL)


def q13_order_count_distribution(sf_dir: str) -> pd.DataFrame:
    """Q13-flavored: distribution of per-customer NON-urgent order counts,
    including zero-order customers. Shape: bucketed per-customer counts
    (customer-cardinality never reaches the driver) -> tiny per-count
    histogram; the 0 bucket is total_customers - customers_with_orders, a
    driver SCALAR — no left-outer shuffle of the customer table."""
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_orderpriority"])

    def pre(b: pd.DataFrame) -> pd.DataFrame:
        return b[b["o_orderpriority"] != "1-URGENT"][["o_custkey"]]

    per_cust = grouped_agg(
        orders,
        ["o_custkey"],
        {"c_count": ("o_custkey", "count")},
        pre=pre,
        final="bucketed",
        num_buckets=16,
        empty_result=pd.DataFrame(
            {"o_custkey": pd.Series(dtype="int64"), "c_count": pd.Series(dtype="int64")}
        ),
    )
    hist = grouped_agg(per_cust, ["c_count"], {"custdist": ("c_count", "count")})
    n_customers = _read(sf_dir, "customer", columns=["c_custkey"]).count()
    zero = int(n_customers) - int(hist["custdist"].sum())
    out = pd.concat(
        [hist, pd.DataFrame({"c_count": [0], "custdist": [zero]})], ignore_index=True
    )
    out = out[out["custdist"] > 0].astype({"c_count": "int64", "custdist": "int64"})
    return out.sort_values(
        ["custdist", "c_count"], ascending=[False, False]
    ).reset_index(drop=True)


Q13_SQL = """
SELECT c_count, COUNT(*)::BIGINT AS custdist FROM (
  SELECT c_custkey, COUNT(o_custkey)::BIGINT AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey)
GROUP BY c_count ORDER BY custdist DESC, c_count DESC
"""


def q15_top_supplier(sf_dir: str) -> pd.DataFrame:
    """Q15-flavored: supplier(s) with the maximum quarterly revenue.
    Bucketed per-supplier revenue; each bucket emits its own max, the
    driver reduces bucket-maxima to the global max (a scalar) and the
    winners are filtered map-side — supplier cardinality never lands on
    the driver."""
    li = _read(
        sf_dir, "lineitem", columns=["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"]
    )

    def pre(b: pd.DataFrame) -> pd.DataFrame:
        b = b[
            (b["l_shipdate"] >= pd.Timestamp("1996-01-01"))
            & (b["l_shipdate"] < pd.Timestamp("1996-04-01"))
        ].copy()
        b["revenue"] = _int_rev(b["l_extendedprice"], b["l_discount"])
        return b[["l_suppkey", "revenue"]]

    rev = grouped_agg(
        li,
        ["l_suppkey"],
        {"total_revenue": ("revenue", "sum")},
        pre=pre,
        final="bucketed",
        num_buckets=16,
        empty_result=pd.DataFrame(
            {"l_suppkey": pd.Series(dtype="int64"), "total_revenue": pd.Series(dtype="int64")}
        ),
    ).map_batches(
        lambda b: b.assign(total_revenue=b["total_revenue"].astype("int64")),
        batch_format="pandas",
    ).materialize()
    bucket_maxima = rev.map_batches(
        lambda b: pd.DataFrame({"m": [int(b["total_revenue"].max())]})
        if len(b)
        else pd.DataFrame({"m": pd.Series(dtype="int64")}),
        batch_size=None,
        batch_format="pandas",
    ).to_pandas()
    top = int(bucket_maxima["m"].max())
    winners = rev.map_batches(
        lambda b: b[b["total_revenue"] == top], batch_format="pandas"
    ).to_pandas()
    sup = _small(sf_dir, "supplier", columns=["s_suppkey", "s_name"]).to_pandas()
    out = winners.merge(sup, left_on="l_suppkey", right_on="s_suppkey")
    return (
        out[["s_suppkey", "s_name", "total_revenue"]]
        .astype({"s_suppkey": "int64"})
        .sort_values("s_suppkey")
        .reset_index(drop=True)
    )


Q15_SQL = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         SUM(ROUND(l_extendedprice * 100, 0)::BIGINT * (100 - ROUND(l_discount * 100, 0)::BIGINT))::BIGINT AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


def q17_small_quantity_revenue(sf_dir: str) -> pd.DataFrame:
    """Q17-flavored: average yearly revenue lost if small-quantity orders
    (below 20% of the part's average quantity) of one brand were not taken.
    The brand slice of `part` is broadcast (dimension-slice, small); the
    per-part average-quantity cut is exact in both engines because
    quantities are integral (integer sums are order-independent)."""
    part = _small(sf_dir, "part", columns=["p_partkey", "p_brand"]).to_pandas()
    brand_keys = frozenset(part.loc[part["p_brand"] == "Brand#4", "p_partkey"].tolist())
    li = _read(sf_dir, "lineitem", columns=["l_partkey", "l_quantity", "l_extendedprice"])
    from ..ops.joins import semi_join_filter

    li_b = semi_join_filter(li, brand_keys, on="l_partkey").materialize()
    stats = grouped_agg(
        li_b,
        ["l_partkey"],
        {"sum_qty": ("l_quantity", "sum"), "n": ("l_quantity", "count")},
    )
    # 0.2 * (sum/n), NOT (0.2*sum)/n: AVG divides first in the oracle and
    # the two float orderings can differ by 1 ulp right at a boundary qty
    cut = dict(zip(stats["l_partkey"], 0.2 * (stats["sum_qty"] / stats["n"])))
    import ray as _ray

    from ..ops.joins import _fetch

    ref = _ray.put(cut)

    def small(b: pd.DataFrame) -> pd.DataFrame:
        cuts = _fetch(ref)
        mask = (b["l_quantity"] < b["l_partkey"].map(cuts)).to_numpy()
        return pd.DataFrame({"s": [int(_cents(b["l_extendedprice"])[mask].sum())]})

    parts = li_b.map_batches(small, batch_format="pandas").to_pandas()
    # exact integer cent total -> both engines divide the same ints
    total_cents = int(parts["s"].sum())
    return pd.DataFrame({"avg_yearly": [_round(total_cents / 100.0 / 7.0, 2)]})


Q17_SQL = """
SELECT ROUND(SUM(ROUND(l_extendedprice * 100, 0)::BIGINT)::BIGINT / 100.0 / 7.0, 2) AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#4' AND l_quantity < (
  SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
"""


def q18_large_orders(sf_dir: str) -> pd.DataFrame:
    """Q18-flavored: top-100 large orders (total quantity > 250). Per-order
    sums stay bucketed; the > 250 filter runs map-side per bucket, so only
    the (rare) large orders flow into the join and the driver."""
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])
    per_order = grouped_agg(
        li,
        ["l_orderkey"],
        {"sum_qty": ("l_quantity", "sum")},
        final="bucketed",
        num_buckets=16,
        empty_result=pd.DataFrame(
            {"l_orderkey": pd.Series(dtype="int64"), "sum_qty": pd.Series(dtype="float64")}
        ),
    )
    big = per_order.map_batches(
        lambda b: b[b["sum_qty"] > 250].assign(sum_qty=_round(b.loc[b["sum_qty"] > 250, "sum_qty"])),
        batch_format="pandas",
    )
    orders = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]
    )
    # the >250 survivors are rare (driver-sized here; the downstream
    # to_pandas holds the same rows anyway) — broadcasting them turns the
    # full hash shuffle of orders into a map-side inner merge
    big_df = big.to_pandas()
    j = broadcast_hash_join(
        orders, big_df, left_on="o_orderkey", right_on="l_orderkey", how="inner"
    ).to_pandas()
    j = j.drop(columns=["l_orderkey"])
    cust = _small(sf_dir, "customer", columns=["c_custkey", "c_name"]).to_pandas()
    out = j.merge(cust, left_on="o_custkey", right_on="c_custkey")
    out = out.sort_values(
        ["o_totalprice", "o_orderkey"], ascending=[False, True], kind="mergesort"
    ).head(100)
    out = _us(out, "o_orderdate")
    return (
        out[["c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty"]]
        .astype({"c_custkey": "int64", "o_orderkey": "int64"})
        .reset_index(drop=True)
    )


Q18_SQL = """
SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
       ROUND(qty.sum_qty, 0) AS sum_qty
FROM (SELECT l_orderkey, SUM(l_quantity) AS sum_qty
      FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 250) qty
JOIN orders ON o_orderkey = qty.l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
"""


def q_heavy_hitters_exact(sf_dir: str) -> pd.DataFrame:
    """The Misra-Gries sketch under the driver's oracle, in its EXACT
    regime: k=64 counters over the 5 distinct order priorities means no
    counter is ever evicted, so approx_count == true count and the sketch
    output matches plain SQL GROUP BY exactly (MG's guarantee: exact
    whenever distinct values <= k)."""
    from ..ops.sketches import heavy_hitters

    orders = _read(sf_dir, "orders", columns=["o_orderpriority"])
    out = heavy_hitters(orders, "o_orderpriority", k=64)
    out["approx_count"] = out["approx_count"].astype("int64")
    out["n_total"] = out["n_total"].astype("int64")
    return out.rename(columns={"value": "priority"})


Q_HEAVY_HITTERS_SQL = """
SELECT o_orderpriority AS priority, COUNT(*)::BIGINT AS approx_count,
       (SELECT COUNT(*) FROM orders)::BIGINT AS n_total
FROM orders GROUP BY o_orderpriority ORDER BY approx_count DESC, priority
"""


def q_bloom_semi_suppliers(sf_dir: str) -> pd.DataFrame:
    """Bloom-join under the oracle: suppliers with any 2001 shipment. The
    supplier side is pre-filtered by a Bloom sketch of the (filtered)
    lineitem supplier keys — the 100 TB pattern for shrinking a join input
    before any shuffle — then verified with the exact broadcast semi join,
    so the composition stays oracle-exact (Bloom admits false positives
    but never drops a true match; the exact stage removes the FPs)."""
    from ..ops.joins import semi_join_filter
    from ..ops.sketches import bloom_build, bloom_semi_filter

    li = _read(sf_dir, "lineitem", columns=["l_suppkey", "l_shipdate"])
    shipped = li.map_batches(
        lambda b: b[b["l_shipdate"] >= pd.Timestamp("2001-01-01")][["l_suppkey"]],
        batch_format="pandas",
    ).materialize()
    bloom = bloom_build(shipped, "l_suppkey")
    sup = _read(sf_dir, "supplier", columns=["s_suppkey", "s_name"])
    pre = bloom_semi_filter(sup, bloom, "s_suppkey")
    keys = frozenset(shipped.to_pandas()["l_suppkey"].unique().tolist())
    out = semi_join_filter(pre, keys, on="s_suppkey").to_pandas()
    return (
        out.astype({"s_suppkey": "int64"})
        .sort_values("s_suppkey")
        .reset_index(drop=True)
    )


Q_BLOOM_SEMI_SQL = """
SELECT s_suppkey, s_name FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem WHERE l_shipdate >= TIMESTAMP '2001-01-01')
ORDER BY s_suppkey
"""


SQL_QUERIES.update(
    {
        "q13_order_count_distribution": (q13_order_count_distribution, Q13_SQL),
        "q15_top_supplier": (q15_top_supplier, Q15_SQL),
        "q17_small_quantity_revenue": (q17_small_quantity_revenue, Q17_SQL),
        "q18_large_orders": (q18_large_orders, Q18_SQL),
        "q_heavy_hitters_exact": (q_heavy_hitters_exact, Q_HEAVY_HITTERS_SQL),
        "q_bloom_semi_suppliers": (q_bloom_semi_suppliers, Q_BLOOM_SEMI_SQL),
    }
)


def _purchase_graph_edges(sf_dir: str) -> ray.data.Dataset:
    """Bidirected customer-supplier purchase graph (supplier ids offset
    by 10M to separate the namespaces) — shared by q_pagerank and
    q_personalized_pagerank so the edge definition cannot desynchronize
    between them (or their SQL twins, see _PURCHASE_EDGES_SQL)."""
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey"])
    j = adaptive_hash_join(li, orders, "inner", on=("l_orderkey",), right_on=("o_orderkey",))
    return j.map_batches(
        lambda b: pd.concat(
            [
                pd.DataFrame(
                    {"src": b["o_custkey"], "dst": b["l_suppkey"] + 10_000_000}
                ),
                pd.DataFrame(
                    {"src": b["l_suppkey"] + 10_000_000, "dst": b["o_custkey"]}
                ),
            ],
            ignore_index=True,
        ).astype({"src": "int64", "dst": "int64"}),
        batch_format="pandas",
    )


_PURCHASE_EDGES_SQL = (
    "SELECT DISTINCT o_custkey AS src, l_suppkey + 10000000 AS dst"
    " FROM orders JOIN lineitem ON l_orderkey = o_orderkey"
    " UNION "
    "SELECT DISTINCT l_suppkey + 10000000 AS src, o_custkey AS dst"
    " FROM orders JOIN lineitem ON l_orderkey = o_orderkey"
)


def q_pagerank(sf_dir: str) -> pd.DataFrame:
    """Fixed-point integer PageRank over the bidirected customer-supplier
    purchase graph (edges = distinct (custkey, suppkey) pairs through
    orders x lineitem, both directions; supplier ids offset by 10M to keep
    the node namespaces apart). The ONLY hash-exact-oracle-able PageRank:
    all-integer arithmetic makes the result independent of summation
    order, so DuckDB reproduces it bit for bit (ops/graph.py:pagerank_sql
    unrolls the same recurrence as chained CTEs)."""
    from ..ops.graph import pagerank

    out = pagerank(_purchase_graph_edges(sf_dir), iters=10).to_pandas()
    return out.sort_values("node").reset_index(drop=True)


from ..ops.graph import pagerank_sql as _pagerank_sql  # noqa: E402

Q_PAGERANK_SQL = _pagerank_sql(_PURCHASE_EDGES_SQL, iters=10)

SQL_QUERIES["q_pagerank"] = (q_pagerank, Q_PAGERANK_SQL)


def q_label_prop(sf_dir: str) -> pd.DataFrame:
    """Deterministic label-propagation communities over the bidirected
    purchase graph (ops/graph.py:label_propagation — synchronous Jacobi
    rounds, votes argmax'd by (count DESC, label ASC), so the iterative
    community algorithm is order-independent and hash-exact against the
    unrolled-CTE twin, the pagerank trick). The graph is bipartite, so
    LPA here measures deterministic label flow rather than converged
    communities — the composition under test is the edge dedup + the
    adaptive driver/BSP vote-argmax rounds under a total order."""
    from ..ops.graph import label_propagation

    # query-level gate bump (the bfs/weighted-paths precedent): the
    # purchase graph is ~1.2M int64 pairs (~19 MB) at sf0.1 — trivially
    # driver-sized (numpy path ~5 s vs ~12 s on the BSP shard-actor
    # fallback, whose per-round fan-out only pays off past the driver)
    out = label_propagation(
        _purchase_graph_edges(sf_dir), rounds=4, broadcast_max_edges=4_000_000
    ).to_pandas()
    return out.sort_values("node").reset_index(drop=True)


from ..ops.graph import label_propagation_sql as _lpa_sql  # noqa: E402

Q_LABEL_PROP_SQL = _lpa_sql(_PURCHASE_EDGES_SQL, rounds=4)

SQL_QUERIES["q_label_prop"] = (q_label_prop, Q_LABEL_PROP_SQL)


def q_salient_terms(sf_dir: str) -> pd.DataFrame:
    """TF-IDF-style keyword extraction: top-3 salient terms per document by
    the integer score (tf * 1e6) // df (ops/textstats.py:salient_terms —
    2 bucketed shuffles of (doc, term, tf) rows, tf computed map-side)."""
    from ..ops.textstats import salient_terms

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = salient_terms(docs, top_k=3).to_pandas()
    return out.sort_values(["doc_id", "rank"]).reset_index(drop=True)


# integer score + total (score DESC, term ASC) order -> deterministic,
# engine-independent ranking (float log-idf could never hash-match)
Q_SALIENT_TERMS_SQL = r"""
WITH w AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
           FROM documents),
tf AS (SELECT doc_id, term, COUNT(*)::BIGINT AS tf FROM w GROUP BY doc_id, term),
df AS (SELECT term, COUNT(*)::BIGINT AS df FROM tf GROUP BY term),
ranked AS (
  SELECT t.doc_id, t.term, t.tf, d.df,
         ROW_NUMBER() OVER (PARTITION BY t.doc_id
                            ORDER BY (t.tf * 1000000) // d.df DESC, t.term ASC) AS rank
  FROM tf t JOIN df d USING (term))
SELECT doc_id, rank, term, tf, df FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank
"""

SQL_QUERIES["q_salient_terms"] = (q_salient_terms, Q_SALIENT_TERMS_SQL)


def q_pivot_segment_priority(sf_dir: str) -> pd.DataFrame:
    """Pivot/crosstab: order counts by customer market segment (rows) x
    order priority (columns). Map-side per-batch crosstab partials (each
    batch emits at most one row per segment with 5 int columns), then one
    tiny grouped sum — the wide shuffle carries ~25 rows total. The
    customer dimension is broadcast-joined (ray.put once), never shuffled."""
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_orderpriority"])
    cust = _small(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    joined = broadcast_hash_join(
        orders, cust, left_on="o_custkey", right_on="c_custkey"
    )

    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    cols = ["n_p1", "n_p2", "n_p3", "n_p4", "n_p5"]

    def crosstab(b: pd.DataFrame) -> pd.DataFrame:
        g = (
            b.groupby(["c_mktsegment", "o_orderpriority"], as_index=False)
            .size()
            .pivot_table(
                index="c_mktsegment",
                columns="o_orderpriority",
                values="size",
                aggfunc="sum",
                fill_value=0,
            )
        )
        out = pd.DataFrame({"c_mktsegment": g.index})
        for p, c in zip(prios, cols):
            out[c] = (
                g[p].to_numpy() if p in g.columns else np.zeros(len(g), dtype="int64")
            )
        return out.astype({c: "int64" for c in cols})

    out = grouped_agg(
        joined,
        ["c_mktsegment"],
        {c: (c, "sum") for c in cols},
        pre=crosstab,
    )
    for c in cols:
        out[c] = out[c].astype("int64")
    return out.sort_values("c_mktsegment").reset_index(drop=True)


Q_PIVOT_SQL = """
SELECT c_mktsegment,
  SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)::BIGINT AS n_p1,
  SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END)::BIGINT AS n_p2,
  SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END)::BIGINT AS n_p3,
  SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END)::BIGINT AS n_p4,
  SUM(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END)::BIGINT AS n_p5
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""

SQL_QUERIES["q_pivot_segment_priority"] = (q_pivot_segment_priority, Q_PIVOT_SQL)


def q_contamination(sf_dir: str) -> pd.DataFrame:
    """Benchmark decontamination: for every document, how many of its word
    3-shingles appear in the 'benchmark' probe set (here: the shingles of
    docs 0-9). The probe set is collected driver-side (benchmark-sized by
    definition), broadcast once, and the corpus scan is a pure map — zero
    shuffles (ops/dedup.py:contamination_counts)."""
    from ..ops.dedup import contamination_counts, shingles

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    probe_df = docs.map_batches(
        lambda b: b[b["doc_id"] < 10], batch_format="pandas"
    ).to_pandas()
    probe: set = set()
    for t in probe_df["text"]:
        probe |= shingles(t, 3)
    out = contamination_counts(docs, probe).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


# same shingle CTE as the minhash oracle; probe = union of docs 0-9's
# shingles as ONE list, hits = len(list_intersect(...)) — integer-exact
Q_CONTAMINATION_SQL = r"""
WITH w AS (SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS ws FROM documents),
sh AS (SELECT doc_id,
  CASE WHEN len(ws) = 0 THEN []::VARCHAR[]
       WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
       ELSE list_distinct(list_transform(generate_series(1, len(ws)-2),
                                         i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))
  END AS s FROM w),
probe AS (SELECT list_distinct(flatten(list(s))) AS pl FROM sh WHERE doc_id < 10)
SELECT sh.doc_id, len(list_intersect(sh.s, probe.pl))::BIGINT AS n_probe_hits
FROM sh CROSS JOIN probe ORDER BY sh.doc_id
"""

SQL_QUERIES["q_contamination"] = (q_contamination, Q_CONTAMINATION_SQL)


def q_split_counts(sf_dir: str) -> pd.DataFrame:
    """Deterministic 80/10/10 train/val/test split over documents (the
    canonical dataset-split step): assign_splits adds the split column via
    the shared multiplicative hash (pure map), then a 3-row grouped
    rollup (n_docs + total chars per split)."""
    from ..ops.sampling import assign_splits

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    ds = assign_splits(docs, "doc_id")

    def pre(b: pd.DataFrame) -> pd.DataFrame:
        return b.assign(n_chars=b["text"].str.len().astype("int64"))[
            ["split", "n_chars"]
        ]

    out = grouped_agg(
        ds,
        ["split"],
        {"n_docs": ("split", "count"), "sum_chars": ("n_chars", "sum")},
        pre=pre,
    )
    for c in ("n_docs", "sum_chars"):
        out[c] = out[c].astype("int64")
    return out.sort_values("split").reset_index(drop=True)


def _split_sql() -> str:
    from ..ops.sampling import KNUTH_MULT, MOD, split_cut_ints

    cuts = split_cut_ints([("train", 0.8), ("val", 0.1), ("test", 0.1)])
    h = f"((doc_id % {MOD})::UBIGINT * {KNUTH_MULT}) % {MOD}"
    return f"""
SELECT CASE WHEN {h} < {cuts[0]} THEN 'train'
            WHEN {h} < {cuts[1]} THEN 'val'
            ELSE 'test' END AS split,
       COUNT(*)::BIGINT AS n_docs,
       SUM(length(text))::BIGINT AS sum_chars
FROM documents GROUP BY split ORDER BY split
"""


Q_SPLIT_SQL = _split_sql()

SQL_QUERIES["q_split_counts"] = (q_split_counts, Q_SPLIT_SQL)


def q_domain_split_leakage(sf_dir: str) -> pd.DataFrame:
    """Group-level (domain-disjoint) train/val/test split — the
    leakage-safe variant of q_split_counts: the split key is the crawl
    SOURCE, not the document, so near-duplicate pages from one domain can
    never straddle train and test (the eval-contamination vector a
    row-keyed split leaves open). The query RAISES if any source lands in
    two splits — a regression guard should the key ever drift back to row
    granularity. Per-(split, source) partials are dimension-sized here
    (driver combine); at web scale the same rollup runs
    ``final=\"bucketed\"`` since domains number in the millions."""
    from ..ops.sampling import assign_splits

    docs = _read(sf_dir, "documents", columns=["source", "text"])

    def pre(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "src_num": b["source"].str.slice(3).astype("int64"),
                "source": b["source"].to_numpy(),
                "n_chars": b["text"].str.len().astype("int64"),
            }
        )

    ds = assign_splits(docs.map_batches(pre, batch_format="pandas"), "src_num")
    per_src = grouped_agg(
        ds,
        ["split", "source"],
        {"n_docs": ("source", "count"), "sum_chars": ("n_chars", "sum")},
    )
    leaked = per_src.groupby("source")["split"].nunique()
    if (leaked > 1).any():
        raise AssertionError(
            f"domain split leaked across splits: {leaked[leaked > 1].index.tolist()}"
        )
    out = (
        per_src.groupby("split")
        .agg(
            n_sources=("source", "count"),
            n_docs=("n_docs", "sum"),
            sum_chars=("sum_chars", "sum"),
        )
        .reset_index()
    )
    for c in ("n_sources", "n_docs", "sum_chars"):
        out[c] = out[c].astype("int64")
    return out.sort_values("split").reset_index(drop=True)


def _domain_split_sql() -> str:
    from ..ops.sampling import KNUTH_MULT, MOD, split_cut_ints

    cuts = split_cut_ints([("train", 0.8), ("val", 0.1), ("test", 0.1)])
    h = f"((CAST(SUBSTR(source, 4) AS BIGINT) % {MOD})::UBIGINT * {KNUTH_MULT}) % {MOD}"
    return f"""
WITH s AS (
  SELECT CASE WHEN {h} < {cuts[0]} THEN 'train'
              WHEN {h} < {cuts[1]} THEN 'val'
              ELSE 'test' END AS split,
         source, COUNT(*)::BIGINT AS n_docs, SUM(length(text))::BIGINT AS sum_chars
  FROM documents GROUP BY split, source)
SELECT split, COUNT(*)::BIGINT AS n_sources,
       SUM(n_docs)::BIGINT AS n_docs, SUM(sum_chars)::BIGINT AS sum_chars
FROM s GROUP BY split ORDER BY split
"""


SQL_QUERIES["q_domain_split_leakage"] = (q_domain_split_leakage, _domain_split_sql())


def q_bigram_lm_filter(sf_dir: str) -> pd.DataFrame:
    """CCNet-style perplexity filtering (ops/textstats.py:bigram_lm_scores):
    score every document under the corpus's own bigram LM (integer
    conditional-frequency mass per adjacent pair, '<unk>' outside the
    top-1000 vocabulary) and report the 20 LEAST-predictable documents by
    per-bigram average — the tail a perplexity filter trims. The whole LM
    (train, normalize, score, rank) is int64 end-to-end, so an n-gram
    language model gets a hash-exact DuckDB twin."""
    from ..ops.textstats import bigram_lm_scores

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    scored = bigram_lm_scores(docs)

    def bottom(b: pd.DataFrame) -> pd.DataFrame:
        b = b.assign(avg_bigram_score=b["lm_score"] // b["n_bigrams"])
        return b.sort_values(["avg_bigram_score", "doc_id"]).head(20)

    pdf = scored.map_batches(bottom, batch_format="pandas").to_pandas()
    out = pdf.sort_values(["avg_bigram_score", "doc_id"]).head(20).reset_index(drop=True)
    return out[["doc_id", "n_bigrams", "lm_score", "avg_bigram_score"]].astype("int64")


Q_BIGRAM_LM_SQL = """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents),
tf AS (
  SELECT t AS tok, COUNT(*)::BIGINT AS c
  FROM (SELECT unnest(ws) AS t FROM toks) GROUP BY tok),
vocab AS (
  SELECT tok FROM (
    SELECT tok, ROW_NUMBER() OVER (ORDER BY c DESC, tok) AS rn FROM tf)
  WHERE rn <= 1000),
spine AS (
  SELECT doc_id, ws, unnest(range(1, array_length(ws)::BIGINT)) AS i
  FROM toks WHERE array_length(ws) >= 2),
pairs AS (
  SELECT doc_id,
         CASE WHEN v1.tok IS NOT NULL THEN ws[i::INT] ELSE '<unk>' END AS w1,
         CASE WHEN v2.tok IS NOT NULL THEN ws[(i + 1)::INT] ELSE '<unk>' END AS w2
  FROM spine
  LEFT JOIN vocab v1 ON ws[i::INT] = v1.tok
  LEFT JOIN vocab v2 ON ws[(i + 1)::INT] = v2.tok),
c2 AS (SELECT w1, w2, COUNT(*)::BIGINT AS c FROM pairs GROUP BY w1, w2),
c1 AS (SELECT w1, SUM(c)::BIGINT AS c FROM c2 GROUP BY w1),
sc AS (
  SELECT p.doc_id, COUNT(*)::BIGINT AS n_bigrams,
         SUM(1000000 * c2.c // c1.c)::BIGINT AS lm_score
  FROM pairs p JOIN c2 USING (w1, w2) JOIN c1 USING (w1)
  GROUP BY p.doc_id)
SELECT doc_id, n_bigrams, lm_score,
       (lm_score // n_bigrams)::BIGINT AS avg_bigram_score
FROM sc ORDER BY avg_bigram_score, doc_id LIMIT 20
"""

SQL_QUERIES["q_bigram_lm_filter"] = (q_bigram_lm_filter, Q_BIGRAM_LM_SQL)


def q_length_trim(sf_dir: str) -> pd.DataFrame:
    """Length-outlier trimming, the cheap first gate of a cleaning
    pipeline: corpus-wide EXACT p05/p95 of document length from a length
    HISTOGRAM (one grouped count whose cardinality is bounded by distinct
    lengths, not rows — the q_median_order_cents sufficient-statistic
    trick, corpus-wide), then one map-only pass counting kept vs dropped
    docs per source. Quantile rule matches DuckDB quantile_disc (value at
    rank ceil(q*n), float expression — parity probed across boundary n in
    pytest)."""
    docs = _read(sf_dir, "documents", columns=["source", "text"])

    def pre(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"len": b["text"].str.len().astype("int64")})

    hist = grouped_agg(
        docs,
        ["len"],
        {"n": ("len", "count")},
        pre=pre,
    ).sort_values("len")
    vals = hist["len"].to_numpy()
    cum = hist["n"].to_numpy().cumsum()
    n = int(cum[-1])
    lo = int(vals[np.searchsorted(cum, int(np.ceil(0.05 * n)))])
    hi = int(vals[np.searchsorted(cum, int(np.ceil(0.95 * n)))])

    def counts(b: pd.DataFrame) -> pd.DataFrame:
        ln = b["text"].str.len().astype("int64")
        keep = (ln >= lo) & (ln <= hi)
        return pd.DataFrame(
            {
                "source": b["source"].to_numpy(),
                "kept": keep.astype("int64").to_numpy(),
                "dropped": (~keep).astype("int64").to_numpy(),
            }
        )

    out = grouped_agg(
        docs,
        ["source"],
        {"n_kept": ("kept", "sum"), "n_dropped": ("dropped", "sum")},
        pre=counts,
    )
    out["p_lo"] = np.int64(lo)
    out["p_hi"] = np.int64(hi)
    for c in ("n_kept", "n_dropped"):
        out[c] = out[c].astype("int64")
    out = out[["source", "p_lo", "p_hi", "n_kept", "n_dropped"]]
    return out.sort_values("source").reset_index(drop=True)


Q_LENGTH_TRIM_SQL = """
WITH L AS (SELECT source, length(text)::BIGINT AS len FROM documents),
q AS (SELECT quantile_disc(len, 0.05)::BIGINT AS lo,
             quantile_disc(len, 0.95)::BIGINT AS hi FROM L)
SELECT source, (SELECT lo FROM q) AS p_lo, (SELECT hi FROM q) AS p_hi,
       SUM(CASE WHEN len >= (SELECT lo FROM q) AND len <= (SELECT hi FROM q)
                THEN 1 ELSE 0 END)::BIGINT AS n_kept,
       SUM(CASE WHEN len < (SELECT lo FROM q) OR len > (SELECT hi FROM q)
                THEN 1 ELSE 0 END)::BIGINT AS n_dropped
FROM L GROUP BY source ORDER BY source
"""

SQL_QUERIES["q_length_trim"] = (q_length_trim, Q_LENGTH_TRIM_SQL)


def q_target_lm_selection(sf_dir: str) -> pd.DataFrame:
    """Target-domain data selection (the CCNet/DSIR setup proper): train
    the bigram LM on a TARGET subset (source='src0' stands in for the
    wiki-like reference corpus), score EVERY document under that external
    model (unseen bigrams contribute 0 mass), and keep the 20 most
    target-like docs by per-bigram average — the selection step a
    pretraining pipeline uses to mine crawl data resembling a trusted
    domain. Integer end-to-end, so even cross-corpus LM selection
    hash-matches its DuckDB twin."""
    from ..ops.textstats import bigram_lm_scores

    import pyarrow.dataset as pads

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    target = _read(
        sf_dir,
        "documents",
        columns=["doc_id", "text"],
        filter=pads.field("source") == "src0",  # pruned INSIDE the scan
    )
    scored = bigram_lm_scores(docs, model_ds=target, miss="zero")

    def top(b: pd.DataFrame) -> pd.DataFrame:
        b = b.assign(avg_bigram_score=b["lm_score"] // b["n_bigrams"])
        return b.sort_values(
            ["avg_bigram_score", "doc_id"], ascending=[False, True]
        ).head(20)

    pdf = scored.map_batches(top, batch_format="pandas").to_pandas()
    out = (
        pdf.sort_values(["avg_bigram_score", "doc_id"], ascending=[False, True])
        .head(20)
        .reset_index(drop=True)
    )
    return out[["doc_id", "n_bigrams", "lm_score", "avg_bigram_score"]].astype("int64")


Q_TARGET_LM_SQL = """
WITH tgt AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
  FROM documents WHERE source = 'src0'),
tf AS (
  SELECT t AS tok, COUNT(*)::BIGINT AS c
  FROM (SELECT unnest(ws) AS t FROM tgt) GROUP BY tok),
vocab AS (
  SELECT tok FROM (
    SELECT tok, ROW_NUMBER() OVER (ORDER BY c DESC, tok) AS rn FROM tf)
  WHERE rn <= 1000),
tspine AS (
  SELECT doc_id, ws, unnest(range(1, array_length(ws)::BIGINT)) AS i
  FROM tgt WHERE array_length(ws) >= 2),
tpairs AS (
  SELECT CASE WHEN v1.tok IS NOT NULL THEN ws[i::INT] ELSE '<unk>' END AS w1,
         CASE WHEN v2.tok IS NOT NULL THEN ws[(i + 1)::INT] ELSE '<unk>' END AS w2
  FROM tspine
  LEFT JOIN vocab v1 ON ws[i::INT] = v1.tok
  LEFT JOIN vocab v2 ON ws[(i + 1)::INT] = v2.tok),
c2 AS (SELECT w1, w2, COUNT(*)::BIGINT AS c FROM tpairs GROUP BY w1, w2),
c1 AS (SELECT w1, SUM(c)::BIGINT AS c FROM c2 GROUP BY w1),
alltoks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents),
spine AS (
  SELECT doc_id, ws, unnest(range(1, array_length(ws)::BIGINT)) AS i
  FROM alltoks WHERE array_length(ws) >= 2),
pairs AS (
  SELECT doc_id,
         CASE WHEN v1.tok IS NOT NULL THEN ws[i::INT] ELSE '<unk>' END AS w1,
         CASE WHEN v2.tok IS NOT NULL THEN ws[(i + 1)::INT] ELSE '<unk>' END AS w2
  FROM spine
  LEFT JOIN vocab v1 ON ws[i::INT] = v1.tok
  LEFT JOIN vocab v2 ON ws[(i + 1)::INT] = v2.tok),
sc AS (
  SELECT p.doc_id, COUNT(*)::BIGINT AS n_bigrams,
         SUM(CASE WHEN c2.c IS NULL THEN 0
                  ELSE 1000000 * c2.c // c1.c END)::BIGINT AS lm_score
  FROM pairs p
  LEFT JOIN c2 USING (w1, w2)
  LEFT JOIN c1 USING (w1)
  GROUP BY p.doc_id)
SELECT doc_id, n_bigrams, lm_score,
       (lm_score // n_bigrams)::BIGINT AS avg_bigram_score
FROM sc ORDER BY avg_bigram_score DESC, doc_id LIMIT 20
"""

SQL_QUERIES["q_target_lm_selection"] = (q_target_lm_selection, Q_TARGET_LM_SQL)


def q_fingerprint_overlap(sf_dir: str) -> pd.DataFrame:
    """MOSS-style substring-reuse pairs: docs sharing >= 3 distinct
    30-char winnowing fingerprints, with the shared count
    (ops/dedup.py:fingerprint_overlap_pairs — catches verbatim span reuse
    that global-Jaccard dedup misses)."""
    from ..ops.dedup import fingerprint_overlap_pairs

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = fingerprint_overlap_pairs(docs, min_shared=3).to_pandas()
    cols = ["id_a", "id_b", "n_shared"]
    out = out[cols] if len(out) else pd.DataFrame(columns=cols)
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


# same winnowing CTE as Q_FINGERPRINTS_SQL; the DISTINCT minima per doc
# equal set(winnowing_fingerprints) (consecutive-dedup preserves the set),
# and the shared-count is a pure integer -> exact both engines
Q_FINGERPRINT_OVERLAP_SQL = r"""
WITH t AS (SELECT doc_id, lower(text) AS lt FROM documents),
grams AS (
  SELECT doc_id, g.i AS i, md5_number_lower(substring(lt, g.i::INT, 30)) AS h
  FROM t, UNNEST(generate_series(1, length(lt) - 29)) AS g(i)
  WHERE length(lt) >= 30
),
winmin AS (
  SELECT doc_id, i,
         MIN(h) OVER (PARTITION BY doc_id ORDER BY i ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS m,
         COUNT(*) OVER (PARTITION BY doc_id) AS g_cnt
  FROM grams
),
fps AS (SELECT DISTINCT doc_id, m FROM winmin WHERE i <= greatest(g_cnt - 7, 1))
SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*)::BIGINT AS n_shared
FROM fps a JOIN fps b ON a.m = b.m AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
HAVING COUNT(*) >= 3
ORDER BY id_a, id_b
"""

SQL_QUERIES["q_fingerprint_overlap"] = (q_fingerprint_overlap, Q_FINGERPRINT_OVERLAP_SQL)


def q_curation_v2(sf_dir: str) -> pd.DataFrame:
    """Round-3 composed curation: train split -> decontamination -> exact
    dedup -> quality filter -> substring-reuse cluster dedup -> tf-idf
    top-term annotation over the survivors (pipelines/curation.py:
    curate_documents_v2). ONE SQL oracle reproduces the whole chain."""
    from .curation import curate_documents_v2

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    # the benchmark-probe docs (id < 10) come from a driver-side read
    # with the id predicate pushed into the scan — at 100 TB that prunes
    # to the probe's row groups instead of re-scanning the corpus
    probe = pq.read_table(
        _t(sf_dir, "documents"),
        columns=["text"],
        filters=[("doc_id", "<", 10)],
    ).column("text").to_pylist()
    out = curate_documents_v2(docs, probe_texts=probe).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _curation_v2_sql() -> str:
    from ..ops.sampling import KNUTH_MULT, MOD, split_cut_ints

    cuts = split_cut_ints([("train", 0.8), ("val", 0.1), ("test", 0.1)])
    h = f"((doc_id % {MOD})::UBIGINT * {KNUTH_MULT}) % {MOD}"
    return (
        r"""
WITH RECURSIVE
shw AS (SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS ws FROM documents),
shg AS (SELECT doc_id,
  CASE WHEN len(ws) = 0 THEN []::VARCHAR[]
       WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
       ELSE list_distinct(list_transform(generate_series(1, len(ws)-2),
                                         i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))
  END AS s FROM shw),
probe AS (SELECT list_distinct(flatten(list(s))) AS pl FROM shg WHERE doc_id < 10),
cont AS (SELECT shg.doc_id, len(list_intersect(shg.s, probe.pl)) AS nh
         FROM shg CROSS JOIN probe),
s1 AS (
  SELECT d.doc_id, d.text
  FROM documents d JOIN cont USING (doc_id) JOIN shw USING (doc_id)
  WHERE """
        + f"{h} < {cuts[0]}"
        + r"""
    AND cont.nh < 5
    AND len(shw.ws) >= 20
),
s2 AS (SELECT doc_id, text FROM s1
       QUALIFY ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) = 1),
t AS (SELECT doc_id, lower(text) AS lt FROM s2),
grams AS (
  SELECT doc_id, g.i AS i, md5_number_lower(substring(lt, g.i::INT, 30)) AS m30
  FROM t, UNNEST(generate_series(1, length(lt) - 29)) AS g(i)
  WHERE length(lt) >= 30
),
winmin AS (
  SELECT doc_id, i,
         MIN(m30) OVER (PARTITION BY doc_id ORDER BY i ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS m,
         COUNT(*) OVER (PARTITION BY doc_id) AS g_cnt
  FROM grams
),
fps AS (SELECT DISTINCT doc_id, m FROM winmin WHERE i <= greatest(g_cnt - 7, 1)),
fpairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM fps a JOIN fps b ON a.m = b.m AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id HAVING COUNT(*) >= 3
),
edg AS (SELECT id_a AS a, id_b AS b FROM fpairs UNION ALL SELECT id_b, id_a FROM fpairs),
reach(n, m) AS (
  SELECT doc_id, doc_id FROM s2
  UNION
  SELECT r.n, e.b FROM reach r JOIN edg e ON r.m = e.a
),
reps AS (SELECT n AS doc_id FROM (SELECT n, MIN(m) AS mn FROM reach GROUP BY n) WHERE n = mn),
surv AS (SELECT s2.doc_id, s2.text FROM s2 JOIN reps USING (doc_id)),
wrd AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term FROM surv),
tf AS (SELECT doc_id, term, COUNT(*)::BIGINT AS tf FROM wrd GROUP BY doc_id, term),
df AS (SELECT term, COUNT(*)::BIGINT AS df FROM tf GROUP BY term),
rk AS (SELECT t2.doc_id, t2.term, t2.tf, d2.df,
              ROW_NUMBER() OVER (PARTITION BY t2.doc_id
                                 ORDER BY (t2.tf * 1000000) // d2.df DESC, t2.term ASC) AS rn
       FROM tf t2 JOIN df d2 USING (term))
SELECT doc_id, term AS top_term, tf, df FROM rk WHERE rn = 1 ORDER BY doc_id
"""
    )


Q_CURATION_V2_SQL = _curation_v2_sql()

SQL_QUERIES["q_curation_v2"] = (q_curation_v2, Q_CURATION_V2_SQL)


def q8_market_share(sf_dir: str) -> pd.DataFrame:
    """Q8-flavored national market share: of all MEDIUM-part volume sold to
    AMERICA-region customers per order year, the fraction supplied by
    NATION_3. Dimensions (part-type keyset, supplier nation, customer
    region) broadcast; the one fact x fact edge is lineitem x orders. The
    volume is quantized PER ROW to integers (price cents x (100 - discount
    percent) — both columns are exact 2-decimal, so the rounding is
    boundary-free), summed as int64, and the share divides the two integer
    sums: bitwise-identical in both engines. Rounding an aggregated float
    sum instead would sit on .5 boundaries and flip with summation order
    (the repo's float-discipline rule)."""
    part = _small(sf_dir, "part", columns=["p_partkey", "p_type"])
    pk = set(
        part.to_pandas().query("p_type == 'MEDIUM'")["p_partkey"].tolist()
    )
    nation = _small(sf_dir, "nation", columns=["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    region = _small(sf_dir, "region", columns=["r_regionkey", "r_name"]).to_pandas()
    america = set(
        nation.merge(region, left_on="n_regionkey", right_on="r_regionkey")
        .query("r_name == 'AMERICA'")["n_nationkey"]
        .tolist()
    )
    target_nk = set(nation.query("n_name == 'NATION_3'")["n_nationkey"].tolist())
    sup = _small(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    cust_df = _small(
        sf_dir, "customer", columns=["c_custkey", "c_nationkey"]
    ).to_pandas()
    amer_cust = frozenset(
        cust_df[cust_df["c_nationkey"].isin(america)]["c_custkey"].tolist()
    )

    import ray as _ray

    from ..ops.joins import _fetch, semi_join_filter

    # every filter runs BELOW the fact x fact join: the part-type keyset
    # semi-filters lineitem (~1/3 survives) and the year predicate + the
    # AMERICA-customer keyset prune orders before anything shuffles (no
    # customer merge at all — the nation key was only ever a predicate)
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])
    orders_y = orders.map_batches(
        lambda b: b[b["o_orderdate"].dt.year.isin([1995, 1996])],
        batch_format="pandas",
    )
    orders_f = semi_join_filter(orders_y, amer_cust, "o_custkey").map_batches(
        lambda b: b[["o_orderkey", "o_orderdate"]], batch_format="pandas"
    )
    li = _read(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    li_f = semi_join_filter(li, frozenset(pk), "l_partkey").map_batches(
        lambda b: b.drop(columns=["l_partkey"]), batch_format="pandas"
    )
    li_s = broadcast_hash_join(li_f, sup, left_on="l_suppkey", right_on="s_suppkey")
    joined = adaptive_hash_join(li_s, orders_f, "inner", on=("l_orderkey",), right_on=("o_orderkey",))

    tref = _ray.put(frozenset(target_nk))

    def pre(b: pd.DataFrame) -> pd.DataFrame:
        tgt = _fetch(tref)
        # boundary-free per-row integer quantization: cents x percent
        vol = np.rint(b["l_extendedprice"].to_numpy() * 100).astype(np.int64) * (
            100 - np.rint(b["l_discount"].to_numpy() * 100).astype(np.int64)
        )
        return pd.DataFrame(
            {
                "o_year": b["o_orderdate"].dt.year.astype("int64"),
                "volume": vol,
                "target_volume": np.where(
                    b["s_nationkey"].isin(tgt).to_numpy(), vol, 0
                ),
            }
        )

    out = grouped_agg(
        joined,
        ["o_year"],
        {"volume": ("volume", "sum"), "target_volume": ("target_volume", "sum")},
        pre=pre,
    )
    out = pd.DataFrame(
        {
            "o_year": out["o_year"].astype("int64"),
            "mkt_share": out["target_volume"].astype("int64")
            / out["volume"].astype("int64"),
        }
    )
    return out.sort_values("o_year").reset_index(drop=True)


Q8_SQL = """
WITH amer AS (
  SELECT n_nationkey FROM nation JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'AMERICA'
),
vol AS (
  SELECT year(o_orderdate)::BIGINT AS o_year,
         ROUND(l_extendedprice * 100, 0)::BIGINT
           * (100 - ROUND(l_discount * 100, 0)::BIGINT) AS volume,
         CASE WHEN s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_name = 'NATION_3')
              THEN ROUND(l_extendedprice * 100, 0)::BIGINT
                     * (100 - ROUND(l_discount * 100, 0)::BIGINT)
              ELSE 0 END AS target_volume
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN part ON l_partkey = p_partkey
  WHERE p_type = 'MEDIUM'
    AND c_nationkey IN (SELECT n_nationkey FROM amer)
    AND year(o_orderdate) IN (1995, 1996)
)
SELECT o_year,
       SUM(target_volume)::BIGINT / SUM(volume)::BIGINT AS mkt_share
FROM vol GROUP BY o_year ORDER BY o_year
"""

SQL_QUERIES["q8_market_share"] = (q8_market_share, Q8_SQL)


def q21_waiting_suppliers(sf_dir: str) -> pd.DataFrame:
    """Q21-flavored (adapted to this schema: 'late' = shipped more than 90
    days after the order date — the synthetic lineitem has no
    receipt/commit dates): suppliers who, on a finished multi-supplier
    order, were the ONLY late supplier — top-100 by incident count,
    across all nations. The EXISTS /
    NOT-EXISTS pair becomes one bucketed per-order group: distinct
    suppliers vs distinct late suppliers, all integer logic."""
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderstatus", "o_orderdate"])
    f_orders = orders.map_batches(
        lambda b: b[b["o_orderstatus"] == "F"][["o_orderkey", "o_orderdate"]],
        batch_format="pandas",
    )
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey", "l_shipdate"])
    j = adaptive_hash_join(li, f_orders, "inner", on=("l_orderkey",), right_on=("o_orderkey",))

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        late = b["l_shipdate"] > (b["o_orderdate"] + pd.Timedelta(days=90))
        return pd.DataFrame(
            {
                "l_orderkey": b["l_orderkey"].astype("int64"),
                "l_suppkey": b["l_suppkey"].astype("int64"),
                "late": late.astype("int64"),
            }
        ).drop_duplicates()

    tagged = j.map_batches(tag, batch_format="pandas")

    from ..ops.agg import bucketed_map_groups

    empty_w = pd.DataFrame({"l_suppkey": pd.Series(dtype="int64")})

    def per_order(bucket: pd.DataFrame) -> pd.DataFrame:
        # tag() dedups per batch only; the same (order, supp, late) triple
        # can arrive from several batches — dedup once per bucket, then
        # the whole EXISTS/NOT-EXISTS logic is two vectorized groupbys
        b = bucket.drop_duplicates(["l_orderkey", "l_suppkey", "late"])
        n_supps = b.groupby("l_orderkey")["l_suppkey"].nunique()
        lt = b[b["late"] == 1]
        gl = lt.groupby("l_orderkey")["l_suppkey"].agg(["count", "first"])
        m = gl[gl["count"] == 1].join(n_supps.rename("n_supps"))
        m = m[m["n_supps"] > 1]
        return pd.DataFrame({"l_suppkey": m["first"].astype("int64").to_numpy()})

    waiting = bucketed_map_groups(
        tagged, "l_orderkey", per_order, num_buckets=16, empty_result=empty_w
    )

    sup = _small(sf_dir, "supplier", columns=["s_suppkey", "s_name"]).to_pandas()

    counts = grouped_agg(waiting, ["l_suppkey"], {"numwait": ("l_suppkey", "count")})
    out = counts.merge(sup[["s_suppkey", "s_name"]], left_on="l_suppkey", right_on="s_suppkey")
    out["numwait"] = out["numwait"].astype("int64")
    out = out.sort_values(["numwait", "s_name"], ascending=[False, True], kind="mergesort")
    return out[["s_name", "numwait"]].head(100).reset_index(drop=True)


Q21_SQL = """
WITH tagged AS (
  SELECT DISTINCT l_orderkey, l_suppkey,
         (l_shipdate > o_orderdate + INTERVAL 90 DAY)::INT AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
),
per_order AS (
  SELECT l_orderkey,
         COUNT(DISTINCT l_suppkey) AS n_supps,
         COUNT(DISTINCT CASE WHEN late = 1 THEN l_suppkey END) AS n_late,
         MAX(CASE WHEN late = 1 THEN l_suppkey END) AS the_late
  FROM tagged GROUP BY l_orderkey
)
SELECT s_name, COUNT(*)::BIGINT AS numwait
FROM per_order
JOIN supplier ON the_late = s_suppkey
WHERE n_supps > 1 AND n_late = 1
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""

SQL_QUERIES["q21_waiting_suppliers"] = (q21_waiting_suppliers, Q21_SQL)


def q_json_props_stats(sf_dir: str) -> pd.DataFrame:
    """Semi-structured column processing: parse the events table's JSON
    ``props`` column per batch and aggregate the extracted integer field
    by event type (count / sum / min / max — all ints, exact). The JSON
    parse is the map stage a web-scale metadata/sidecar column needs; the
    aggregation is the standard two-stage combine."""
    import json as _json

    events = _read(sf_dir, "events", columns=["event_type", "props"])

    def pre(b: pd.DataFrame) -> pd.DataFrame:
        ks = np.fromiter(
            (int(_json.loads(p)["k"]) for p in b["props"]),
            dtype=np.int64,
            count=len(b),
        )
        return pd.DataFrame({"event_type": b["event_type"].to_numpy(), "k": ks})

    out = grouped_agg(
        events,
        ["event_type"],
        {
            "n_events": ("k", "count"),
            "sum_k": ("k", "sum"),
            "min_k": ("k", "min"),
            "max_k": ("k", "max"),
        },
        pre=pre,
    )
    for c in ("n_events", "sum_k", "min_k", "max_k"):
        out[c] = out[c].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


Q_JSON_PROPS_SQL = r"""
SELECT event_type,
       COUNT(*)::BIGINT AS n_events,
       SUM(json_extract(props, '$.k')::BIGINT)::BIGINT AS sum_k,
       MIN(json_extract(props, '$.k')::BIGINT)::BIGINT AS min_k,
       MAX(json_extract(props, '$.k')::BIGINT)::BIGINT AS max_k
FROM events GROUP BY event_type ORDER BY event_type
"""

SQL_QUERIES["q_json_props_stats"] = (q_json_props_stats, Q_JSON_PROPS_SQL)


def q_source_dup_profile(sf_dir: str) -> pd.DataFrame:
    """Per-crawl-source duplication profile: docs, distinct texts, and
    exact-dup count per source — the report that decides which crawl
    sources are boilerplate factories. Distinct texts via (source,
    content-hash) rows through one bucketed dedup; counts are integers,
    so the oracle (COUNT(DISTINCT text)) is exact."""
    from ..ops.agg import bucketed_map_groups
    from ..ops.dedup import text_hash

    docs = _read(sf_dir, "documents", columns=["source", "text"])
    hashed = docs.map_batches(
        lambda b: pd.DataFrame(
            {"source": b["source"].to_numpy(), "_h": b["text"].map(text_hash)}
        ).drop_duplicates(),
        batch_format="pandas",
    )
    empty_sh = pd.DataFrame(
        {"source": pd.Series(dtype="object"), "_h": pd.Series(dtype="object")}
    )
    distinct = bucketed_map_groups(
        hashed,
        "_h",
        lambda b: b.drop_duplicates(["source", "_h"]),
        num_buckets=16,
        empty_result=empty_sh,
    )
    n_distinct = grouped_agg(distinct, ["source"], {"n_distinct": ("_h", "count")})
    # separate column-pruned read for the count leg: re-consuming ``docs``
    # would re-read and decode the text payload just to count rows
    src_only = _read(sf_dir, "documents", columns=["source"])
    n_docs = grouped_agg(src_only, ["source"], {"n_docs": ("source", "count")})
    out = n_docs.merge(n_distinct, on="source")
    out["n_docs"] = out["n_docs"].astype("int64")
    out["n_distinct"] = out["n_distinct"].astype("int64")
    out["n_dups"] = (out["n_docs"] - out["n_distinct"]).astype("int64")
    return (
        out[["source", "n_docs", "n_distinct", "n_dups"]]
        .sort_values("source")
        .reset_index(drop=True)
    )


Q_SOURCE_DUP_SQL = """
SELECT source,
       COUNT(*)::BIGINT AS n_docs,
       COUNT(DISTINCT text)::BIGINT AS n_distinct,
       (COUNT(*) - COUNT(DISTINCT text))::BIGINT AS n_dups
FROM documents GROUP BY source ORDER BY source
"""

SQL_QUERIES["q_source_dup_profile"] = (q_source_dup_profile, Q_SOURCE_DUP_SQL)


# --- SQL window functions (running total / lag / dense rank) -----------------
# ops/windows.py:window_over — PARTITION BY key ORDER BY ... as one
# hash-bucket shuffle + a vectorized pandas pass per bucket. Reference
# parity: the reference's per-buyer "earliest contract" scans
# (extract.js firstDate handling) are this family's degenerate case.


def q_running_total(sf_dir: str) -> pd.DataFrame:
    """Per-customer running order spend: SUM(...) OVER (PARTITION BY
    custkey ORDER BY orderdate, orderkey). Summands are integer cents, so
    every prefix sum is summation-order independent -> hash-exact."""
    from ..ops.windows import window_over

    orders = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]
    )

    def assign(b: pd.DataFrame, g) -> pd.DataFrame:
        cents = pd.Series(_cents(b["o_totalprice"]), index=b.index)
        return pd.DataFrame(
            {
                "o_orderkey": b["o_orderkey"].astype("int64"),
                "o_custkey": b["o_custkey"].astype("int64"),
                "running_cents": cents.groupby(b["o_custkey"], sort=False)
                .cumsum()
                .astype("int64"),
            }
        )

    empty = pd.DataFrame(
        {
            "o_orderkey": pd.Series(dtype="int64"),
            "o_custkey": pd.Series(dtype="int64"),
            "running_cents": pd.Series(dtype="int64"),
        }
    )
    out = window_over(
        orders,
        key_col="o_custkey",
        order_cols=["o_orderdate", "o_orderkey"],
        assign=assign,
        empty_result=empty,
    ).to_pandas()
    return out.sort_values("o_orderkey").reset_index(drop=True)


Q_RUNNING_TOTAL_SQL = """
SELECT o_orderkey, o_custkey,
       (SUM(ROUND(o_totalprice * 100, 0)::BIGINT) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
       ))::BIGINT AS running_cents
FROM orders
"""

SQL_QUERIES["q_running_total"] = (q_running_total, Q_RUNNING_TOTAL_SQL)


def q_order_gaps(sf_dir: str) -> pd.DataFrame:
    """Days since the customer's previous order: LAG() OVER the same
    deterministic (orderdate, orderkey) ordering; first orders dropped so
    the output is NULL-free for the hash compare."""
    from ..ops.windows import window_over

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def assign(b: pd.DataFrame, g) -> pd.DataFrame:
        prev = g["o_orderdate"].shift()
        keep = prev.notna()
        gap = (b["o_orderdate"] - prev).dt.days
        return pd.DataFrame(
            {
                "o_orderkey": b.loc[keep, "o_orderkey"].astype("int64"),
                "o_custkey": b.loc[keep, "o_custkey"].astype("int64"),
                "gap_days": gap[keep].astype("int64"),
            }
        )

    empty = pd.DataFrame(
        {
            "o_orderkey": pd.Series(dtype="int64"),
            "o_custkey": pd.Series(dtype="int64"),
            "gap_days": pd.Series(dtype="int64"),
        }
    )
    out = window_over(
        orders,
        key_col="o_custkey",
        order_cols=["o_orderdate", "o_orderkey"],
        assign=assign,
        empty_result=empty,
    ).to_pandas()
    return out.sort_values("o_orderkey").reset_index(drop=True)


Q_ORDER_GAPS_SQL = """
WITH w AS (
  SELECT o_orderkey, o_custkey, o_orderdate,
         LAG(o_orderdate) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ) AS prev
  FROM orders)
SELECT o_orderkey, o_custkey,
       date_diff('day', prev, o_orderdate)::BIGINT AS gap_days
FROM w WHERE prev IS NOT NULL
"""

SQL_QUERIES["q_order_gaps"] = (q_order_gaps, Q_ORDER_GAPS_SQL)


def q_supplier_rank(sf_dir: str) -> pd.DataFrame:
    """DENSE_RANK of suppliers by account balance within nation. Ranking
    on integer cents keeps ties (and therefore the dense ranks) identical
    in both engines regardless of float formatting."""
    from ..ops.windows import window_over

    sup = _read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey", "s_acctbal"])

    def assign(b: pd.DataFrame, g) -> pd.DataFrame:
        cents = pd.Series(_cents(b["s_acctbal"]), index=b.index)
        rnk = (
            cents.groupby(b["s_nationkey"], sort=False)
            .rank(method="dense", ascending=False)
            .astype("int64")
        )
        return pd.DataFrame(
            {
                "s_suppkey": b["s_suppkey"].astype("int64"),
                "s_nationkey": b["s_nationkey"].astype("int64"),
                "rnk": rnk,
            }
        )

    empty = pd.DataFrame(
        {
            "s_suppkey": pd.Series(dtype="int64"),
            "s_nationkey": pd.Series(dtype="int64"),
            "rnk": pd.Series(dtype="int64"),
        }
    )
    out = window_over(
        sup,
        key_col="s_nationkey",
        order_cols=["s_acctbal", "s_suppkey"],
        assign=assign,
        num_buckets=16,
        empty_result=empty,
    ).to_pandas()
    return out.sort_values("s_suppkey").reset_index(drop=True)


Q_SUPPLIER_RANK_SQL = """
SELECT s_suppkey::BIGINT AS s_suppkey, s_nationkey::BIGINT AS s_nationkey,
       DENSE_RANK() OVER (
         PARTITION BY s_nationkey
         ORDER BY ROUND(s_acctbal * 100, 0)::BIGINT DESC
       ) AS rnk
FROM supplier
"""

SQL_QUERIES["q_supplier_rank"] = (q_supplier_rank, Q_SUPPLIER_RANK_SQL)


# --- rollup / set ops --------------------------------------------------------


def q_rollup_orders(sf_dir: str) -> pd.DataFrame:
    """GROUP BY ROLLUP(priority, status): one distributed fine-grained
    aggregate (the only corpus-sized pass), then the subtotal levels are
    DERIVED from that tiny fine frame (group-domain-sized, ~15 rows) —
    never a second scan. NULL level markers surface as 'ALL'."""
    orders = _read(
        sf_dir, "orders", columns=["o_orderpriority", "o_orderstatus", "o_totalprice"]
    )

    def pre(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "priority": b["o_orderpriority"].to_numpy(),
                "status": b["o_orderstatus"].to_numpy(),
                "cents": _cents(b["o_totalprice"]),
            }
        )

    fine = grouped_agg(
        orders,
        ["priority", "status"],
        {"n_orders": ("cents", "count"), "sum_cents": ("cents", "sum")},
        pre=pre,
    )
    lvl1 = (
        fine.groupby("priority", as_index=False)[["n_orders", "sum_cents"]]
        .sum()
        .assign(status="ALL")
    )
    lvl0 = pd.DataFrame(
        {
            "priority": ["ALL"],
            "status": ["ALL"],
            "n_orders": [fine["n_orders"].sum()],
            "sum_cents": [fine["sum_cents"].sum()],
        }
    )
    out = pd.concat([fine, lvl1, lvl0], ignore_index=True)
    out["n_orders"] = out["n_orders"].astype("int64")
    out["sum_cents"] = out["sum_cents"].astype("int64")
    return (
        out[["priority", "status", "n_orders", "sum_cents"]]
        .sort_values(["priority", "status"])
        .reset_index(drop=True)
    )


Q_ROLLUP_SQL = """
SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
       COALESCE(o_orderstatus, 'ALL') AS status,
       COUNT(*)::BIGINT AS n_orders,
       SUM(ROUND(o_totalprice * 100, 0)::BIGINT)::BIGINT AS sum_cents
FROM orders
GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
ORDER BY priority, status
"""

SQL_QUERIES["q_rollup_orders"] = (q_rollup_orders, Q_ROLLUP_SQL)


def q_brand_set_ops(sf_dir: str) -> pd.DataFrame:
    """INTERSECT / EXCEPT over derived sets (brands stocked in big vs
    small part sizes) computed as ONE distributed aggregate: per-batch
    (brand, in_big, in_small) flag pre-distinct, max-combine, then a
    vectorized driver tag over the brand-domain-sized result."""
    part = _read(sf_dir, "part", columns=["p_brand", "p_size"])

    def pre(b: pd.DataFrame) -> pd.DataFrame:
        sz = b["p_size"].to_numpy()
        out = pd.DataFrame(
            {
                "p_brand": b["p_brand"].to_numpy(),
                "in_big": (sz >= 40).astype("int64"),
                "in_small": (sz <= 10).astype("int64"),
            }
        )
        return out.groupby("p_brand", as_index=False).max()

    flags = grouped_agg(
        part,
        ["p_brand"],
        {"in_big": ("in_big", "max"), "in_small": ("in_small", "max")},
        pre=pre,
    )
    tag = np.select(
        [
            (flags["in_big"] == 1) & (flags["in_small"] == 1),
            (flags["in_big"] == 1),
            (flags["in_small"] == 1),
        ],
        ["both", "big_only", "small_only"],
        default="",
    )
    out = flags.assign(tag=tag)
    out = out[out["tag"] != ""][["p_brand", "tag"]]
    return out.sort_values(["p_brand", "tag"]).reset_index(drop=True)


Q_BRAND_SET_OPS_SQL = """
WITH big AS (SELECT DISTINCT p_brand FROM part WHERE p_size >= 40),
     small AS (SELECT DISTINCT p_brand FROM part WHERE p_size <= 10)
SELECT p_brand, 'both' AS tag
FROM (SELECT p_brand FROM big INTERSECT SELECT p_brand FROM small)
UNION ALL
SELECT p_brand, 'big_only' AS tag
FROM (SELECT p_brand FROM big EXCEPT SELECT p_brand FROM small)
UNION ALL
SELECT p_brand, 'small_only' AS tag
FROM (SELECT p_brand FROM small EXCEPT SELECT p_brand FROM big)
ORDER BY p_brand, tag
"""

SQL_QUERIES["q_brand_set_ops"] = (q_brand_set_ops, Q_BRAND_SET_OPS_SQL)


# --- graph + search-index operators over derived web-scale structures --------


def q_supplier_triangles(sf_dir: str) -> pd.DataFrame:
    """Triangle count of the supplier co-occurrence graph (suppliers
    co-appearing in >= 5 order line pairs): per-order pair generation via
    one bucketed self-merge, a bucketed weight aggregate, then the exact
    two-join triangle count (ops/graph.py:triangle_count). The SQL twin
    is the identical self-join formulation, so the scalar is exact."""
    from ..ops.agg import bucketed_map_groups
    from ..ops.graph import triangle_count

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey"])

    def pairs(bucket: pd.DataFrame) -> pd.DataFrame:
        m = bucket.merge(bucket, on="l_orderkey")
        m = m[m["l_suppkey_x"] < m["l_suppkey_y"]]
        return pd.DataFrame(
            {"u": m["l_suppkey_x"].to_numpy(), "v": m["l_suppkey_y"].to_numpy()}
        ).astype({"u": "int64", "v": "int64"})

    empty_uv = pd.DataFrame(
        {"u": pd.Series(dtype="int64"), "v": pd.Series(dtype="int64")}
    )
    pair_ds = bucketed_map_groups(
        li, "l_orderkey", pairs, num_buckets=32, empty_result=empty_uv
    )
    weights = grouped_agg(
        pair_ds,
        ["u", "v"],
        {"w": ("u", "count")},
        final="bucketed",
        num_buckets=16,
        empty_result=pd.DataFrame(
            {
                "u": pd.Series(dtype="int64"),
                "v": pd.Series(dtype="int64"),
                "w": pd.Series(dtype="int64"),
            }
        ),
    )
    edges = weights.map_batches(
        lambda b: b[b["w"] >= 5][["u", "v"]], batch_format="pandas"
    )
    n = triangle_count(edges)
    return pd.DataFrame({"n_triangles": pd.Series([n], dtype="int64")})


Q_SUPPLIER_TRIANGLES_SQL = """
WITH pairs AS (
  SELECT a.l_suppkey AS u, b.l_suppkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
), e AS (
  SELECT u, v FROM pairs GROUP BY u, v HAVING COUNT(*) >= 5
)
SELECT COUNT(*)::BIGINT AS n_triangles
FROM e e1 JOIN e e2 ON e2.u = e1.v JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
"""

SQL_QUERIES["q_supplier_triangles"] = (q_supplier_triangles, Q_SUPPLIER_TRIANGLES_SQL)


def q_inverted_index(sf_dir: str) -> pd.DataFrame:
    """Search-index construction: mid-frequency terms (5 <= df <= n/5)
    with their sorted posting lists. (term, doc_id) pairs dedup per batch
    (each document is one row, so per-batch distinct IS global distinct),
    then one bucketed-by-term pass builds df + the posting string. The
    df band keeps stopword-sized postings out of the output; the band's
    corpus size comes from parquet metadata, not a second scan."""
    from ..ops.agg import bucketed_map_groups

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    # no upper df bound here: the synthetic corpus has a ~31-term
    # vocabulary, so every term is "mid-frequency"; at web scale pass a
    # df ceiling to keep stopword postings out (the band is a parameter)
    max_df = None

    def pre(b: pd.DataFrame) -> pd.DataFrame:
        words = b.set_index("doc_id")["text"].str.lower().str.findall(r"[a-z0-9]+")
        e = words.explode().dropna()
        out = pd.DataFrame({"doc_id": e.index.to_numpy(), "term": e.to_numpy()})
        return out.drop_duplicates()

    pairs = docs.map_batches(pre, batch_format="pandas")

    def per_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        b = bucket.sort_values(["term", "doc_id"], kind="mergesort")
        g = b.groupby("term", sort=False)["doc_id"]
        out = g.agg(
            df="count", postings=lambda s: ",".join(str(x) for x in s)
        ).reset_index()
        out = out[out["df"] >= 5]
        if max_df is not None:
            out = out[out["df"] <= max_df]
        return out.astype({"df": "int64"})[["term", "df", "postings"]]

    empty = pd.DataFrame(
        {
            "term": pd.Series(dtype="object"),
            "df": pd.Series(dtype="int64"),
            "postings": pd.Series(dtype="object"),
        }
    )
    out = bucketed_map_groups(
        pairs, "term", per_bucket, num_buckets=16, empty_result=empty
    ).to_pandas()
    return out.sort_values("term").reset_index(drop=True)


Q_INVERTED_INDEX_SQL = """
WITH tok AS (
  SELECT DISTINCT doc_id, w AS term
  FROM documents, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t(w)
)
SELECT term, COUNT(*)::BIGINT AS df,
       string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id) AS postings
FROM tok GROUP BY term
HAVING COUNT(*) >= 5
ORDER BY term
"""

SQL_QUERIES["q_inverted_index"] = (q_inverted_index, Q_INVERTED_INDEX_SQL)


# --- fuzzy-name linking / filtered ANN / centroids / dimension grid ---------


def q_similar_part_names(sf_dir: str) -> pd.DataFrame:
    """Fuzzy-name linking: distinct part names within Levenshtein
    distance 1 (ops/editdist.py — lossless length blocking + banded DP).
    The SQL twin's |len| <= 1 predicate is implied by lev <= 1, so both
    engines compute the identical exact pair set."""
    from ..ops.editdist import edit_distance_pairs

    part = _read(sf_dir, "part", columns=["p_name"])
    out = edit_distance_pairs(part, "p_name", max_d=1, num_buckets=16).to_pandas()
    return out.sort_values(["name_a", "name_b"]).reset_index(drop=True)


Q_SIMILAR_NAMES_SQL = """
WITH names AS (SELECT DISTINCT p_name FROM part)
SELECT a.p_name AS name_a, b.p_name AS name_b,
       levenshtein(a.p_name, b.p_name)::BIGINT AS dist
FROM names a JOIN names b ON a.p_name < b.p_name
WHERE levenshtein(a.p_name, b.p_name) <= 1
ORDER BY name_a, name_b
"""

SQL_QUERIES["q_similar_part_names"] = (q_similar_part_names, Q_SIMILAR_NAMES_SQL)


def q_ann_topk_filtered(sf_dir: str) -> pd.DataFrame:
    """Metadata-filtered vector search: top-10 cosine neighbors among
    vectors whose label is in {2, 3} — the predicate prunes BEFORE
    scoring (filter inside the scan batch, then the per-block partial
    top-k), the standard filtered-ANN shape."""
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding", "label"])
    filtered = ds.map_batches(
        lambda b: b[b["label"].isin([2, 3])][["vec_id", "embedding"]],
        batch_format="pandas",
    )
    q = _query_vec(sf_dir)
    out = cosine_topk(filtered, q, k=10, exclude_ids={0})
    out["vec_id"] = out["vec_id"].astype("int64")
    return out


Q_ANN_FILTERED_SQL = """
WITH q AS (SELECT embedding::DOUBLE[] AS e FROM embeddings WHERE vec_id = 0)
SELECT vec_id,
       ROUND(list_cosine_similarity(embedding::DOUBLE[], (SELECT e FROM q)), 6) AS score
FROM embeddings WHERE vec_id <> 0 AND label IN (2, 3)
ORDER BY list_cosine_similarity(embedding::DOUBLE[], (SELECT e FROM q)) DESC, vec_id
LIMIT 10
"""

SQL_QUERIES["q_ann_topk_filtered"] = (q_ann_topk_filtered, Q_ANN_FILTERED_SQL)


def q_label_centroids(sf_dir: str) -> pd.DataFrame:
    """Per-label centroid accumulators (the k-means/update step of
    embedding clustering): component sums per (label, dim) with each
    component quantized to int(1e6) BEFORE summation — integer summands
    make the distributed sums summation-order independent, hence the
    exact SQL twin (the same trick as the revenue aggregates; dividing
    sum_q by n downstream yields the centroid)."""
    ds = _read(sf_dir, "embeddings", columns=["label", "embedding"])

    def pre(b: pd.DataFrame) -> pd.DataFrame:
        m = np.asarray([np.asarray(v, dtype=np.float64) for v in b["embedding"]])
        q = (np.sign(m) * np.floor(np.abs(m) * 1e6 + 0.5)).astype(np.int64)
        labels = b["label"].to_numpy()
        frames = []
        for lab in np.unique(labels):
            sel = q[labels == lab]
            frames.append(
                pd.DataFrame(
                    {
                        "label": np.full(sel.shape[1], lab),
                        "dim": np.arange(sel.shape[1], dtype=np.int64),
                        "sum_q": sel.sum(axis=0),
                        "n": np.full(sel.shape[1], sel.shape[0], dtype=np.int64),
                    }
                )
            )
        return pd.concat(frames, ignore_index=True)

    out = grouped_agg(
        ds, ["label", "dim"], {"sum_q": ("sum_q", "sum"), "n": ("n", "sum")}, pre=pre
    )
    out["label"] = out["label"].astype("int32")
    out["sum_q"] = out["sum_q"].astype("int64")
    out["n"] = out["n"].astype("int64")
    return out.sort_values(["label", "dim"]).reset_index(drop=True)


Q_LABEL_CENTROIDS_SQL = """
SELECT label, i AS dim,
       SUM(ROUND(embedding[i + 1]::DOUBLE * 1e6, 0)::BIGINT)::BIGINT AS sum_q,
       COUNT(*)::BIGINT AS n
FROM embeddings, range(64) t(i)
GROUP BY label, i ORDER BY label, dim
"""

SQL_QUERIES["q_label_centroids"] = (q_label_centroids, Q_LABEL_CENTROIDS_SQL)


def q_segment_region_grid(sf_dir: str) -> pd.DataFrame:
    """Zero-filled dimension grid (CROSS JOIN + LEFT JOIN + COALESCE):
    customer counts for EVERY (region, segment) cell. The corpus-sized
    pass is one broadcast-joined aggregate; the grid fill happens on the
    dimension-domain-sized result."""
    nation = _small(sf_dir, "nation", columns=["n_nationkey", "n_regionkey"]).to_pandas()
    region = _small(sf_dir, "region", columns=["r_regionkey", "r_name"]).to_pandas()
    cust = _read(sf_dir, "customer", columns=["c_nationkey", "c_mktsegment"])

    nat_to_region = dict(
        zip(
            nation["n_nationkey"],
            nation["n_regionkey"].map(
                dict(zip(region["r_regionkey"], region["r_name"]))
            ),
        )
    )

    def pre(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "region": b["c_nationkey"].map(nat_to_region).to_numpy(),
                "segment": b["c_mktsegment"].to_numpy(),
            }
        )

    agg = grouped_agg(cust, ["region", "segment"], {"n_customers": ("segment", "count")}, pre=pre)
    segments = sorted(agg["segment"].unique())
    grid = pd.MultiIndex.from_product(
        [sorted(region["r_name"]), segments], names=["region", "segment"]
    ).to_frame(index=False)
    out = grid.merge(agg, on=["region", "segment"], how="left")
    out["n_customers"] = out["n_customers"].fillna(0).astype("int64")
    return out.sort_values(["region", "segment"]).reset_index(drop=True)


Q_GRID_SQL = """
SELECT r_name AS region, seg.c_mktsegment AS segment,
       COALESCE(agg.n, 0)::BIGINT AS n_customers
FROM region
CROSS JOIN (SELECT DISTINCT c_mktsegment FROM customer) seg
LEFT JOIN (
  SELECT r_name AS rn, c_mktsegment AS cm, COUNT(*) AS n
  FROM customer
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY rn, cm
) agg ON agg.rn = r_name AND agg.cm = seg.c_mktsegment
ORDER BY region, segment
"""

SQL_QUERIES["q_segment_region_grid"] = (q_segment_region_grid, Q_GRID_SQL)


def q_name_clusters(sf_dir: str) -> pd.DataFrame:
    """Fuzzy-name ENTITY RESOLUTION, end to end: distinct part names ->
    Levenshtein<=1 pair graph (ops/editdist.py) -> connected components
    (ops/graph.py) -> (name, cluster_id). Node ids are md5-low64 >> 1 in
    BOTH engines (DuckDB md5_number_lower // 2 — non-negative int64, so
    signed and unsigned MIN agree), making the component labels of an
    iterative algorithm hash-exact. This is the north-star
    "name-normalization + fuzzy-dedup" composition as one distributed
    query."""
    from ..ops.editdist import edit_distance_pairs
    from ..ops.graph import connected_components
    from ..ops.textstats import _h64

    part = _read(sf_dir, "part", columns=["p_name"])
    pairs = edit_distance_pairs(part, "p_name", max_d=1, num_buckets=16)

    def pair_ids(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "id_a": [(_h64(x.encode()) >> 1) for x in b["name_a"]],
                "id_b": [(_h64(x.encode()) >> 1) for x in b["name_b"]],
            }
        ).astype({"id_a": "int64", "id_b": "int64"})

    edges = pairs.map_batches(pair_ids, batch_format="pandas")

    from ..ops.agg import bucketed_map_groups

    empty_nm = pd.DataFrame({"p_name": pd.Series(dtype="object")})
    distinct = bucketed_map_groups(
        part.map_batches(lambda b: b[["p_name"]].drop_duplicates(), batch_format="pandas"),
        "p_name",
        lambda b: b.drop_duplicates(["p_name"]),
        num_buckets=16,
        empty_result=empty_nm,
    )
    nodes = distinct.map_batches(
        lambda b: pd.DataFrame(
            {
                "node": [(_h64(x.encode()) >> 1) for x in b["p_name"]],
                "p_name": b["p_name"].to_numpy(),
            }
        ).astype({"node": "int64"}),
        batch_format="pandas",
    ).materialize()

    comp = connected_components(
        nodes.select_columns(["node"]), edges, node_col="node"
    ).to_pandas()
    names = nodes.to_pandas()
    out = names.merge(comp, on="node")[["p_name", "cluster_id"]]
    out["cluster_id"] = out["cluster_id"].astype("int64")
    return out.sort_values("p_name").reset_index(drop=True)


Q_NAME_CLUSTERS_SQL = r"""
WITH RECURSIVE
names AS (SELECT DISTINCT p_name FROM part),
ids AS (SELECT p_name, (md5_number_lower(p_name) // 2)::BIGINT AS node FROM names),
pairs AS (
  SELECT a.node AS na, b.node AS nb
  FROM ids a JOIN ids b ON a.p_name < b.p_name
  WHERE levenshtein(a.p_name, b.p_name) <= 1
),
edges AS (SELECT na AS a, nb AS b FROM pairs UNION ALL SELECT nb, na FROM pairs),
reach(n, m) AS (
  SELECT node, node FROM ids
  UNION
  SELECT r.n, e.b FROM reach r JOIN edges e ON r.m = e.a
)
SELECT i.p_name, MIN(r.m)::BIGINT AS cluster_id
FROM reach r JOIN ids i ON i.node = r.n
GROUP BY i.p_name ORDER BY i.p_name
"""

SQL_QUERIES["q_name_clusters"] = (q_name_clusters, Q_NAME_CLUSTERS_SQL)


# --- skew-aware join ---------------------------------------------------------


def q_skew_join_type_weight(sf_dir: str) -> pd.DataFrame:
    """Skew-aware join demo: every events.event_type holds ~20% of the
    rows, so a hash-shuffle join on it would pile the whole table onto 5
    partitions. ``ops.joins.skew_join`` detects the hot keys with a
    one-pass Misra-Gries sketch and map-side-merges them (zero shuffle for
    the hot rows); the oracle is the plain SQL join. All-integer weights,
    so the aggregate is hash-exact."""
    from ..ops.joins import skew_join

    events = _read(sf_dir, "events", columns=["user_id", "event_type"])
    type_counts = grouped_agg(
        _read(sf_dir, "events", columns=["event_type"]),
        ["event_type"],
        {"type_n": ("event_type", "count")},
        final="driver",
    )
    type_counts["type_n"] = type_counts["type_n"].astype("int64")
    joined = skew_join(
        events,
        ray.data.from_pandas(type_counts),
        on="event_type",
        hot_fraction=0.05,
    )
    out = grouped_agg(
        joined,
        ["user_id"],
        {"weight": ("type_n", "sum"), "n_events": ("type_n", "count")},
        final="driver",
    )
    out = out.astype({"user_id": "int64", "weight": "int64", "n_events": "int64"})
    return out.sort_values("user_id").reset_index(drop=True)


Q_SKEW_JOIN_SQL = """
WITH t AS (
  SELECT event_type, COUNT(*)::BIGINT AS type_n FROM events GROUP BY event_type)
SELECT e.user_id, SUM(t.type_n)::BIGINT AS weight, COUNT(*)::BIGINT AS n_events
FROM events e JOIN t USING (event_type)
GROUP BY e.user_id
ORDER BY e.user_id
"""

SQL_QUERIES["q_skew_join_type_weight"] = (q_skew_join_type_weight, Q_SKEW_JOIN_SQL)


# --- CDC / snapshot queries --------------------------------------------------


def q_latest_event_per_user(sf_dir: str) -> pd.DataFrame:
    """Current-state snapshot from a change log: each user's most recent
    event ((ts, event_id) is the deterministic version order). Runs
    ``ops.agg.latest_by_key`` — per-batch argmax shrinks every block to
    one row per key before the single bucket shuffle. value passes
    through unaggregated, so the doubles compare bitwise."""
    from ..ops.agg import latest_by_key

    events = _read(
        sf_dir, "events", columns=["user_id", "event_id", "ts", "event_type", "value"]
    )
    empty = pd.DataFrame(
        {
            "user_id": pd.Series(dtype="int64"),
            "event_id": pd.Series(dtype="int64"),
            "ts": pd.Series(dtype="datetime64[us]"),
            "event_type": pd.Series(dtype="object"),
            "value": pd.Series(dtype="float64"),
        }
    )
    out = latest_by_key(
        events, "user_id", ["ts", "event_id"], num_buckets=32, empty_result=empty
    ).to_pandas()
    out = _us(out, "ts")
    out = out.astype({"user_id": "int64", "event_id": "int64"})
    cols = ["user_id", "event_id", "ts", "event_type", "value"]
    return out[cols].sort_values("user_id").reset_index(drop=True)


Q_LATEST_EVENT_SQL = """
SELECT user_id, event_id, ts, event_type, value
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events)
WHERE rn = 1
ORDER BY user_id
"""

SQL_QUERIES["q_latest_event_per_user"] = (q_latest_event_per_user, Q_LATEST_EVENT_SQL)


def q_moving_sum(sf_dir: str) -> pd.DataFrame:
    """Framed window aggregate: 5-row moving spend per customer (ROWS
    BETWEEN 4 PRECEDING AND CURRENT ROW) as cumsum minus group-shifted
    cumsum — one bucket shuffle, integer cents, hash-exact."""
    from ..ops.windows import window_over

    orders = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]
    )

    def assign(b: pd.DataFrame, g) -> pd.DataFrame:
        cents = pd.Series(_cents(b["o_totalprice"]), index=b.index)
        grp = cents.groupby(b["o_custkey"], sort=False)
        cs = grp.cumsum()
        lag = cs.groupby(b["o_custkey"], sort=False).shift(5)
        moving = (cs - lag.fillna(0)).astype("int64")
        return pd.DataFrame(
            {
                "o_orderkey": b["o_orderkey"].astype("int64"),
                "o_custkey": b["o_custkey"].astype("int64"),
                "moving_cents": moving,
            }
        )

    empty = pd.DataFrame(
        {
            "o_orderkey": pd.Series(dtype="int64"),
            "o_custkey": pd.Series(dtype="int64"),
            "moving_cents": pd.Series(dtype="int64"),
        }
    )
    out = window_over(
        orders,
        key_col="o_custkey",
        order_cols=["o_orderdate", "o_orderkey"],
        assign=assign,
        empty_result=empty,
    ).to_pandas()
    return out.sort_values("o_orderkey").reset_index(drop=True)


Q_MOVING_SUM_SQL = """
SELECT o_orderkey, o_custkey,
       (SUM(ROUND(o_totalprice * 100, 0)::BIGINT) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN 4 PRECEDING AND CURRENT ROW
       ))::BIGINT AS moving_cents
FROM orders
"""

SQL_QUERIES["q_moving_sum"] = (q_moving_sum, Q_MOVING_SUM_SQL)


def q_cube_status_priority(sf_dir: str) -> pd.DataFrame:
    """GROUP BY CUBE over two dimensions: the three coarser grouping sets
    are derived from the fine aggregate on the driver (15 rows), so the
    input is scanned ONCE — the same no-second-scan shape as
    q_rollup_orders, completing rollup -> cube."""
    orders = _read(sf_dir, "orders", columns=["o_orderstatus", "o_orderpriority", "o_totalprice"])

    def pre(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "status": b["o_orderstatus"],
                "priority": b["o_orderpriority"],
                "cents": _cents(b["o_totalprice"]),
            }
        )

    fine = grouped_agg(
        orders,
        ["status", "priority"],
        {"n": ("cents", "count"), "sum_cents": ("cents", "sum")},
        pre=pre,
        final="driver",
    )

    def roll(df: pd.DataFrame, keys: list[str]) -> pd.DataFrame:
        if keys:
            g = df.groupby(keys, as_index=False).agg(
                n=("n", "sum"), sum_cents=("sum_cents", "sum")
            )
        else:
            g = pd.DataFrame({"n": [df["n"].sum()], "sum_cents": [df["sum_cents"].sum()]})
        for c in ("status", "priority"):
            if c not in g.columns:
                g[c] = "ALL"
        return g[["status", "priority", "n", "sum_cents"]]

    out = pd.concat(
        [
            roll(fine, ["status", "priority"]),
            roll(fine, ["status"]),
            roll(fine, ["priority"]),
            roll(fine, []),
        ],
        ignore_index=True,
    )
    out = out.astype({"n": "int64", "sum_cents": "int64"})
    return out.sort_values(["status", "priority"]).reset_index(drop=True)


Q_CUBE_SQL = """
SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       COUNT(*)::BIGINT AS n,
       SUM(ROUND(o_totalprice * 100, 0)::BIGINT)::BIGINT AS sum_cents
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY status, priority
"""

SQL_QUERIES["q_cube_status_priority"] = (q_cube_status_priority, Q_CUBE_SQL)


def q_qty_discount_corr(sf_dir: str) -> pd.DataFrame:
    """Pearson correlation of quantity vs discount per returnflag with
    BITWISE-exact floats: the five moments are integer sums (quantity is
    integral, discount exact at 2 decimals), and both engines evaluate
    the identical float expression over identical int64 operands —
    int->float64 conversion is exact below 2^53 and IEEE ops are
    deterministic, so even the final doubles hash-match."""
    lineitem = _read(sf_dir, "lineitem", columns=["l_returnflag", "l_quantity", "l_discount"])

    def pre(b: pd.DataFrame) -> pd.DataFrame:
        x = np.rint(b["l_quantity"].to_numpy()).astype(np.int64)
        y = _cents(b["l_discount"])
        return pd.DataFrame(
            {
                "l_returnflag": b["l_returnflag"],
                "x": x, "y": y, "xy": x * y, "xx": x * x, "yy": y * y,
                "one": np.ones(len(b), dtype=np.int64),
            }
        )

    m = grouped_agg(
        lineitem,
        ["l_returnflag"],
        {
            "n": ("one", "sum"),
            "sx": ("x", "sum"),
            "sy": ("y", "sum"),
            "sxy": ("xy", "sum"),
            "sxx": ("xx", "sum"),
            "syy": ("yy", "sum"),
        },
        pre=pre,
        final="driver",
    )
    n = m["n"].astype("int64")
    num = (n * m["sxy"].astype("int64") - m["sx"].astype("int64") * m["sy"].astype("int64")).astype("float64")
    vx = (n * m["sxx"].astype("int64") - m["sx"].astype("int64") ** 2).astype("float64")
    vy = (n * m["syy"].astype("int64") - m["sy"].astype("int64") ** 2).astype("float64")
    out = pd.DataFrame(
        {
            "l_returnflag": m["l_returnflag"],
            "n": n,
            "corr_qty_disc": num / np.sqrt(vx * vy),
        }
    )
    return out.sort_values("l_returnflag").reset_index(drop=True)


Q_CORR_SQL = """
WITH m AS (
  SELECT l_returnflag,
         COUNT(*)::BIGINT AS n,
         SUM(ROUND(l_quantity)::BIGINT)::BIGINT AS sx,
         SUM(ROUND(l_discount * 100, 0)::BIGINT)::BIGINT AS sy,
         SUM(ROUND(l_quantity)::BIGINT * ROUND(l_discount * 100, 0)::BIGINT)::BIGINT AS sxy,
         SUM(ROUND(l_quantity)::BIGINT * ROUND(l_quantity)::BIGINT)::BIGINT AS sxx,
         SUM(ROUND(l_discount * 100, 0)::BIGINT * ROUND(l_discount * 100, 0)::BIGINT)::BIGINT AS syy
  FROM lineitem GROUP BY l_returnflag)
SELECT l_returnflag, n,
       (n * sxy - sx * sy)::DOUBLE
         / sqrt((n * sxx - sx * sx)::DOUBLE * (n * syy - sy * sy)::DOUBLE)
       AS corr_qty_disc
FROM m ORDER BY l_returnflag
"""

SQL_QUERIES["q_qty_discount_corr"] = (q_qty_discount_corr, Q_CORR_SQL)


def q_table_diff(sf_dir: str) -> pd.DataFrame:
    """Data-validation diff between two derived snapshots of orders: the
    left drops every 7th key (-> only_right), the right rewrites URGENT
    priorities (-> changed); identical keys vanish inside the bucketed
    pass so only the difference reaches the driver. ``ops.diff.dataset_diff``
    ships 17 bytes/row regardless of row width."""
    from ..ops.diff import dataset_diff

    # two independent streaming scans, NOT one materialized read: pinning
    # the whole table in the object store to save a re-scan inverts at
    # 100 TB (spill cost >> a second column-pruned scan), and the two
    # streams pipeline concurrently anyway
    orders_l = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"]).map_batches(
        lambda b: b[b["o_orderkey"] % 7 != 0], batch_format="pandas"
    )

    def mutate(b: pd.DataFrame) -> pd.DataFrame:
        out = b[["o_orderkey", "o_orderpriority"]].copy()
        out.loc[out["o_orderpriority"] == "1-URGENT", "o_orderpriority"] = "X"
        return out

    orders_r = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"]).map_batches(
        mutate, batch_format="pandas"
    )
    out = dataset_diff(orders_l, orders_r, "o_orderkey", num_buckets=32).to_pandas()
    out = out.astype({"o_orderkey": "int64"})
    return out.sort_values("o_orderkey").reset_index(drop=True)


Q_TABLE_DIFF_SQL = """
WITH l AS (
  SELECT o_orderkey, o_orderpriority AS p FROM orders WHERE o_orderkey % 7 != 0),
r AS (
  SELECT o_orderkey,
         CASE WHEN o_orderpriority = '1-URGENT' THEN 'X' ELSE o_orderpriority END AS p
  FROM orders)
SELECT COALESCE(l.o_orderkey, r.o_orderkey) AS o_orderkey,
       CASE WHEN l.o_orderkey IS NULL THEN 'only_right'
            WHEN r.o_orderkey IS NULL THEN 'only_left'
            ELSE 'changed' END AS status
FROM l FULL OUTER JOIN r ON l.o_orderkey = r.o_orderkey
WHERE l.o_orderkey IS NULL OR r.o_orderkey IS NULL OR l.p != r.p
ORDER BY 1
"""

SQL_QUERIES["q_table_diff"] = (q_table_diff, Q_TABLE_DIFF_SQL)


def q_funnel_view_purchase(sf_dir: str) -> pd.DataFrame:
    """Behavioral funnel: per user, did any 'view' happen strictly before
    any 'purchase'? One bucket shuffle on user_id, then a vectorized
    min-view-ts vs max-purchase-ts compare per user — the sequence-pattern
    query event logs need at scale."""
    from ..ops.agg import bucketed_map_groups

    events = _read(sf_dir, "events", columns=["user_id", "event_type", "ts"]).map_batches(
        lambda b: b[b["event_type"].isin(("view", "purchase"))], batch_format="pandas"
    )

    def per_bucket(b: pd.DataFrame) -> pd.DataFrame:
        views = b[b["event_type"] == "view"].groupby("user_id")["ts"].min()
        buys = b[b["event_type"] == "purchase"].groupby("user_id")["ts"].max()
        m = views.to_frame("first_view").join(buys.to_frame("last_buy"), how="outer")
        converted = (
            m["first_view"].notna()
            & m["last_buy"].notna()
            & (m["first_view"] < m["last_buy"])
        )
        return pd.DataFrame(
            {"user_id": m.index.astype("int64"), "converted": converted.to_numpy()}
        ).reset_index(drop=True)

    empty = pd.DataFrame(
        {"user_id": pd.Series(dtype="int64"), "converted": pd.Series(dtype="bool")}
    )
    out = bucketed_map_groups(
        events, "user_id", per_bucket, num_buckets=32, empty_result=empty
    ).to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


Q_FUNNEL_SQL = """
SELECT user_id,
       (MIN(CASE WHEN event_type = 'view' THEN ts END) IS NOT NULL
        AND MAX(CASE WHEN event_type = 'purchase' THEN ts END) IS NOT NULL
        AND MIN(CASE WHEN event_type = 'view' THEN ts END)
            < MAX(CASE WHEN event_type = 'purchase' THEN ts END)) AS converted
FROM events
WHERE event_type IN ('view', 'purchase')
GROUP BY user_id
ORDER BY user_id
"""

SQL_QUERIES["q_funnel_view_purchase"] = (q_funnel_view_purchase, Q_FUNNEL_SQL)


def q_order_ntile(sf_dir: str) -> pd.DataFrame:
    """Distribution windows: NTILE(4), PERCENT_RANK and CUME_DIST per
    order priority over a tie-free (cents, orderkey) order. NTILE's
    uneven-bucket rule (first n%k groups one row larger) is reproduced
    vectorized; the two ratios divide identical int64 operands in both
    engines, so the doubles are bitwise-equal."""
    from ..ops.windows import window_over

    orders = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_orderpriority", "o_totalprice"]
    ).map_batches(
        lambda b: pd.DataFrame(
            {
                "o_orderkey": b["o_orderkey"].astype("int64"),
                "priority": b["o_orderpriority"],
                "cents": _cents(b["o_totalprice"]),
            }
        ),
        batch_format="pandas",
    )
    K = 4

    def assign(b: pd.DataFrame, g) -> pd.DataFrame:
        grp = b.groupby("priority", sort=False)
        rn = grp.cumcount().to_numpy() + 1
        n = grp["o_orderkey"].transform("size").to_numpy()
        big, small = n % K, n // K
        in_big = rn <= big * (small + 1)
        tile = np.where(
            in_big,
            (rn - 1) // np.maximum(small + 1, 1) + 1,
            big + np.where(small > 0, (rn - big * (small + 1) - 1) // np.maximum(small, 1), 0) + 1,
        )
        pct_rank = np.where(n > 1, (rn - 1) / np.maximum(n - 1, 1), 0.0)
        return pd.DataFrame(
            {
                "o_orderkey": b["o_orderkey"].astype("int64"),
                "priority": b["priority"],
                "tile": tile.astype("int64"),
                "pct_rank": pct_rank,
                "cume": rn / n,
            }
        )

    empty = pd.DataFrame(
        {
            "o_orderkey": pd.Series(dtype="int64"),
            "priority": pd.Series(dtype="object"),
            "tile": pd.Series(dtype="int64"),
            "pct_rank": pd.Series(dtype="float64"),
            "cume": pd.Series(dtype="float64"),
        }
    )
    out = window_over(
        orders,
        key_col="priority",
        order_cols=["cents", "o_orderkey"],
        assign=assign,
        num_buckets=16,
        empty_result=empty,
    ).to_pandas()
    return out.sort_values("o_orderkey").reset_index(drop=True)


Q_NTILE_SQL = """
SELECT o_orderkey, o_orderpriority AS priority,
       NTILE(4) OVER w::BIGINT AS tile,
       PERCENT_RANK() OVER w AS pct_rank,
       CUME_DIST() OVER w AS cume
FROM orders
WINDOW w AS (
  PARTITION BY o_orderpriority
  ORDER BY ROUND(o_totalprice * 100, 0)::BIGINT, o_orderkey)
"""

SQL_QUERIES["q_order_ntile"] = (q_order_ntile, Q_NTILE_SQL)


def q_top_orders_per_segment(sf_dir: str) -> pd.DataFrame:
    """Top-k per group — the grouped-limit pattern: 2 biggest orders per
    market segment via a broadcast dimension join and one windowed pass
    (rank <= k filter inside the bucket, so only k rows per group leave)."""
    from ..ops.windows import window_over

    cust = _small(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    orders = broadcast_hash_join(
        _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"]),
        cust,
        left_on="o_custkey",
        right_on="c_custkey",
    ).map_batches(
        lambda b: pd.DataFrame(
            {
                "o_orderkey": b["o_orderkey"].astype("int64"),
                "segment": b["c_mktsegment"],
                "cents": _cents(b["o_totalprice"]),
            }
        ),
        batch_format="pandas",
    )

    def assign(b: pd.DataFrame, g) -> pd.DataFrame:
        # bucket arrives sorted ascending by (segment, cents, o_orderkey);
        # rank from the END of each segment = descending rank
        grp = b.groupby("segment", sort=False)
        n = grp["o_orderkey"].transform("size").to_numpy()
        rn = grp.cumcount().to_numpy() + 1
        desc_rank = n - rn + 1
        keep = desc_rank <= 2
        return pd.DataFrame(
            {
                "segment": b["segment"][keep],
                "o_orderkey": b["o_orderkey"][keep].astype("int64"),
                "cents": b["cents"][keep].astype("int64"),
                "rank_in_segment": desc_rank[keep].astype("int64"),
            }
        )

    empty = pd.DataFrame(
        {
            "segment": pd.Series(dtype="object"),
            "o_orderkey": pd.Series(dtype="int64"),
            "cents": pd.Series(dtype="int64"),
            "rank_in_segment": pd.Series(dtype="int64"),
        }
    )
    out = window_over(
        orders,
        key_col="segment",
        order_cols=["cents", "o_orderkey"],
        assign=assign,
        num_buckets=8,
        empty_result=empty,
    ).to_pandas()
    return out.sort_values(["segment", "rank_in_segment"]).reset_index(drop=True)


Q_TOP_PER_SEGMENT_SQL = """
SELECT segment, o_orderkey, cents, rank_in_segment
FROM (
  SELECT c.c_mktsegment AS segment, o.o_orderkey,
         ROUND(o.o_totalprice * 100, 0)::BIGINT AS cents,
         ROW_NUMBER() OVER (
           PARTITION BY c.c_mktsegment
           ORDER BY ROUND(o.o_totalprice * 100, 0)::BIGINT DESC, o.o_orderkey DESC
         )::BIGINT AS rank_in_segment
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey)
WHERE rank_in_segment <= 2
ORDER BY segment, rank_in_segment
"""

SQL_QUERIES["q_top_orders_per_segment"] = (q_top_orders_per_segment, Q_TOP_PER_SEGMENT_SQL)


def q_kmeans_clusters(sf_dir: str) -> pd.DataFrame:
    """Distributed Lloyd k-means (2 iterations, per-label integer-mean
    init) with a HASH-EXACT oracle: all arithmetic is fixed-point int64
    (floor-quantized, offset non-negative so numpy floor-div == DuckDB
    truncating //), so assignments, counts and centroid checksums are
    bit-identical however the sums are ordered — the same order-
    independence trick as q_pagerank, applied to an ML training loop."""
    from ..ops.kmeans import kmeans_int, label_init_centroids

    emb = _read(sf_dir, "embeddings")
    init = label_init_centroids(emb)
    summary, _centroids = kmeans_int(emb, init, iters=2)
    return summary


# Shared unrolled 2-iteration integer-Lloyd CTE chain (label-mean init ->
# assign/recenter twice). Q_KMEANS_SQL summarizes c2/a2; Q_ANN_IVF_SQL
# extends the SAME chain with a final assignment + probe + integer-dot rank
# so the kmeans oracle and the IVF oracle can never drift apart.
_KMEANS_CTES = """dims AS (SELECT i FROM range(1, 65) t(i)),
q AS (
  SELECT e.vec_id, e.label, d.i AS d,
         (FLOOR(list_extract(e.embedding, d.i)::DOUBLE * 1000000.0) + 1000000)::BIGINT AS v
  FROM embeddings e, dims d),
c0 AS (
  SELECT label::BIGINT AS cid, d, (SUM(v) // COUNT(*))::BIGINT AS cv
  FROM q GROUP BY label, d),
d1 AS (
  SELECT q.vec_id, c.cid, SUM((q.v - c.cv) * (q.v - c.cv)) AS dist
  FROM q JOIN c0 c USING (d) GROUP BY q.vec_id, c.cid),
a1 AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
    FROM d1) WHERE rn = 1),
c1 AS (
  SELECT a.cid, q.d, (SUM(q.v) // COUNT(*))::BIGINT AS cv
  FROM q JOIN a1 a USING (vec_id) GROUP BY a.cid, q.d),
d2 AS (
  SELECT q.vec_id, c.cid, SUM((q.v - c.cv) * (q.v - c.cv)) AS dist
  FROM q JOIN c1 c USING (d) GROUP BY q.vec_id, c.cid),
a2 AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
    FROM d2) WHERE rn = 1),
c2 AS (
  SELECT a.cid, q.d, (SUM(q.v) // COUNT(*))::BIGINT AS cv
  FROM q JOIN a2 a USING (vec_id) GROUP BY a.cid, q.d)"""

Q_KMEANS_SQL = f"""
WITH {_KMEANS_CTES},
n2 AS (SELECT cid, COUNT(*)::BIGINT AS n_points FROM a2 GROUP BY cid)
SELECT c2.cid AS cluster, ANY_VALUE(n2.n_points) AS n_points,
       SUM(c2.cv)::BIGINT AS centroid_checksum
FROM c2 JOIN n2 USING (cid)
GROUP BY c2.cid ORDER BY cluster
"""

SQL_QUERIES["q_kmeans_clusters"] = (q_kmeans_clusters, Q_KMEANS_SQL)


def q_ann_ivf_topk(sf_dir: str) -> pd.DataFrame:
    """IVF-probed ANN top-k with a hash-exact oracle: the coarse quantizer
    is the SAME fixed-point integer k-means the kmeans query runs (shared
    CTE chain in the twin), the inverted lists are a final assignment pass
    against its centroids, and candidates from the query's nprobe=3 nearest
    lists are ranked by the signed integer dot product (MIPS). The whole
    ANN path — train, probe, prune, rank — is int64 end-to-end, so the
    driver hash-compares an approximate-nearest-neighbor pipeline exactly."""
    from ..ops.similarity import ivf_topk_int

    ds = _read(sf_dir, "embeddings")
    q = _query_vec(sf_dir)
    return ivf_topk_int(ds, q, k=10, nprobe=3, exclude_ids={0})


Q_ANN_IVF_SQL = f"""
WITH {_KMEANS_CTES},
d3 AS (
  SELECT q.vec_id, c.cid, SUM((q.v - c.cv) * (q.v - c.cv)) AS dist
  FROM q JOIN c2 c USING (d) GROUP BY q.vec_id, c.cid),
a3 AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
    FROM d3) WHERE rn = 1),
probed AS (
  SELECT cid FROM (
    SELECT cid, ROW_NUMBER() OVER (ORDER BY dist, cid) AS rn
    FROM d3 WHERE vec_id = 0) WHERE rn <= 3),
score AS (
  SELECT x.vec_id, SUM((x.v - 1000000) * (qv.v - 1000000))::BIGINT AS score
  FROM q x JOIN (SELECT d, v FROM q WHERE vec_id = 0) qv USING (d)
  WHERE x.vec_id <> 0
  GROUP BY x.vec_id)
SELECT s.vec_id, a3.cid::BIGINT AS cluster, s.score
FROM score s JOIN a3 USING (vec_id) JOIN probed p ON a3.cid = p.cid
ORDER BY s.score DESC, s.vec_id
LIMIT 10
"""

SQL_QUERIES["q_ann_ivf_topk"] = (q_ann_ivf_topk, Q_ANN_IVF_SQL)


def q_customer_order_counts_left(sf_dir: str) -> pd.DataFrame:
    """LEFT OUTER join parity: every customer, including the zero-order
    ones (the null-extension path the inner-join suite never exercises).
    The fact side streams through a distributed count whose result is
    customer-cardinality (dimension-sized), so the final left-extend
    merge runs on two dimension-sized frames at the driver."""
    cust = _small(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    counts = grouped_agg(
        _read(sf_dir, "orders", columns=["o_custkey"]),
        ["o_custkey"],
        {"n_orders": ("o_custkey", "count")},
        final="driver",
    )
    out = cust.to_pandas().merge(
        counts, how="left", left_on="c_custkey", right_on="o_custkey"
    )
    out["n_orders"] = out["n_orders"].fillna(0).astype("int64")
    out = out[["c_custkey", "c_mktsegment", "n_orders"]].astype({"c_custkey": "int64"})
    return out.sort_values("c_custkey").reset_index(drop=True)


Q_LEFT_JOIN_SQL = """
SELECT c.c_custkey, c.c_mktsegment, COUNT(o.o_orderkey)::BIGINT AS n_orders
FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey, c.c_mktsegment
ORDER BY c.c_custkey
"""

SQL_QUERIES["q_customer_order_counts_left"] = (
    q_customer_order_counts_left,
    Q_LEFT_JOIN_SQL,
)


def q_nation_top_names(sf_dir: str) -> pd.DataFrame:
    """Ordered list aggregation (ARRAY_AGG/STRING_AGG parity): the top-3
    customers by (acctbal cents desc, name) per nation, joined as one
    string. The per-group sort happens inside the bucket; only 3 rows per
    nation leave it."""
    from ..ops.agg import bucketed_map_groups

    cust = _read(
        sf_dir, "customer", columns=["c_custkey", "c_name", "c_nationkey", "c_acctbal"]
    ).map_batches(
        lambda b: pd.DataFrame(
            {
                "nationkey": b["c_nationkey"].astype("int64"),
                "name": b["c_name"],
                "cents": _cents(b["c_acctbal"]),
            }
        ),
        batch_format="pandas",
    )

    def per_bucket(b: pd.DataFrame) -> pd.DataFrame:
        srt = b.sort_values(
            ["nationkey", "cents", "name"], ascending=[True, False, True], kind="mergesort"
        )
        top = srt.groupby("nationkey").head(3)
        return (
            top.groupby("nationkey", as_index=False)
            .agg(top_names=("name", ",".join))
            .astype({"nationkey": "int64"})
        )

    empty = pd.DataFrame(
        {"nationkey": pd.Series(dtype="int64"), "top_names": pd.Series(dtype="object")}
    )
    out = bucketed_map_groups(
        cust, "nationkey", per_bucket, num_buckets=8, empty_result=empty
    ).to_pandas()
    return out.sort_values("nationkey").reset_index(drop=True)


Q_NATION_TOP_NAMES_SQL = """
WITH ranked AS (
  SELECT c_nationkey::BIGINT AS nationkey, c_name,
         ROW_NUMBER() OVER (
           PARTITION BY c_nationkey
           ORDER BY ROUND(c_acctbal * 100, 0)::BIGINT DESC, c_name) AS rn
  FROM customer)
SELECT nationkey, STRING_AGG(c_name, ',' ORDER BY rn) AS top_names
FROM ranked WHERE rn <= 3
GROUP BY nationkey ORDER BY nationkey
"""

SQL_QUERIES["q_nation_top_names"] = (q_nation_top_names, Q_NATION_TOP_NAMES_SQL)


def q_training_mix(sf_dir: str) -> pd.DataFrame:
    """Pretraining data mixing: rebalance the 20 crawl sources to
    per-source row targets (2/3 of even-numbered sources, 1/5 of odd)
    with ``ops.sampling.mix_sources`` — integer keep-rate thresholds over
    the engine-independent multiplicative hash, so the sampled mix is
    bit-reproducible and SQL-twinnable."""
    from ..ops.sampling import mix_sources

    docs = _read(sf_dir, "documents", columns=["doc_id", "source"])
    counts = grouped_agg(
        _read(sf_dir, "documents", columns=["source"]),
        ["source"],
        {"cnt": ("source", "count")},
        final="driver",
    )
    cnt_map = {src: int(c) for src, c in zip(counts["source"], counts["cnt"])}
    targets = {
        src: (2 * cnt) // 3 if int(src[3:]) % 2 == 0 else cnt // 5
        for src, cnt in cnt_map.items()
    }
    mixed = mix_sources(docs, "doc_id", "source", targets, counts=cnt_map)
    out = grouped_agg(
        mixed, ["source"], {"n_sampled": ("doc_id", "count")}, final="driver"
    )
    out["n_sampled"] = out["n_sampled"].astype("int64")
    return out.sort_values("source").reset_index(drop=True)


Q_TRAINING_MIX_SQL = """
WITH c AS (SELECT source, COUNT(*)::BIGINT AS cnt FROM documents GROUP BY source),
thr AS (
  SELECT source,
         LEAST(4294967296,
               (CASE WHEN CAST(SUBSTR(source, 4) AS BIGINT) % 2 = 0
                     THEN (2 * cnt) // 3 ELSE cnt // 5 END) * 4294967296 // cnt
         ) AS cut
  FROM c)
SELECT d.source, COUNT(*)::BIGINT AS n_sampled
FROM documents d JOIN thr USING (source)
WHERE ((d.doc_id % 4294967296)::UBIGINT * 2654435761) % 4294967296 < thr.cut
GROUP BY d.source ORDER BY d.source
"""

SQL_QUERIES["q_training_mix"] = (q_training_mix, Q_TRAINING_MIX_SQL)


def q_temperature_mix(sf_dir: str) -> pd.DataFrame:
    """Temperature-smoothed source rebalancing (alpha = 1/2, the
    multilingual-LM sampling rule): per-source targets proportional to
    isqrt(n_i) under a budget of half the corpus, then the same integer
    keep-rate hash predicate as q_training_mix. Reports docs, target and
    realized sample per source; the whole chain (isqrt weights, floor-div
    targets, hash cut) is integer-exact on both engines."""
    from ..ops.sampling import mix_sources, temperature_targets

    docs = _read(sf_dir, "documents", columns=["doc_id", "source"])
    counts = grouped_agg(
        _read(sf_dir, "documents", columns=["source"]),
        ["source"],
        {"cnt": ("source", "count")},
        final="driver",
    )
    cnt_map = {src: int(c) for src, c in zip(counts["source"], counts["cnt"])}
    budget = sum(cnt_map.values()) // 2
    targets = temperature_targets(cnt_map, budget)
    mixed = mix_sources(docs, "doc_id", "source", targets, counts=cnt_map)
    sampled = grouped_agg(
        mixed, ["source"], {"n_sampled": ("doc_id", "count")}, final="driver"
    )
    out = pd.DataFrame(
        {
            "source": sorted(cnt_map),
            "n_docs": [cnt_map[s] for s in sorted(cnt_map)],
            "n_target": [targets[s] for s in sorted(cnt_map)],
        }
    )
    out = out.merge(sampled, on="source", how="left")
    out["n_sampled"] = out["n_sampled"].fillna(0).astype("int64")
    out = out.astype({"n_docs": "int64", "n_target": "int64"})
    return out.sort_values("source").reset_index(drop=True)


Q_TEMPERATURE_MIX_SQL = """
WITH c AS (SELECT source, COUNT(*)::BIGINT AS cnt FROM documents GROUP BY source),
w AS (SELECT source, cnt, CAST(FLOOR(SQRT(cnt::DOUBLE)) AS BIGINT) AS wt FROM c),
t AS (
  -- SUM(BIGINT) is HUGEINT in DuckDB: cast the scalars back to BIGINT so
  -- tgt (and everything downstream) keeps the engine's int64 dtype
  SELECT source, cnt,
         LEAST(cnt, wt * ((SELECT SUM(cnt) FROM c)::BIGINT // 2)
                       // (SELECT SUM(wt) FROM w)::BIGINT)::BIGINT AS tgt
  FROM w),
thr AS (
  SELECT source, cnt, tgt,
         LEAST(4294967296, tgt * 4294967296 // cnt) AS cut
  FROM t),
k AS (
  SELECT d.source, COUNT(*)::BIGINT AS n_sampled
  FROM documents d JOIN thr USING (source)
  WHERE ((d.doc_id % 4294967296)::UBIGINT * 2654435761) % 4294967296 < thr.cut
  GROUP BY d.source)
SELECT thr.source, thr.cnt AS n_docs, thr.tgt AS n_target,
       COALESCE(k.n_sampled, 0)::BIGINT AS n_sampled
FROM thr LEFT JOIN k USING (source)
ORDER BY thr.source
"""

SQL_QUERIES["q_temperature_mix"] = (q_temperature_mix, Q_TEMPERATURE_MIX_SQL)


def q_supplier_clustering(sf_dir: str) -> pd.DataFrame:
    """Local clustering coefficients over the supplier co-occurrence
    graph: per-node triangle counts (ops/graph.py:triangles_per_node, the
    corner-credited two-join plan) left-joined onto degrees, coefficient
    = 2t/(d(d-1)) — a ratio of IDENTICAL int64 operands in both engines,
    so even the doubles hash-match."""
    from ..ops.agg import bucketed_map_groups
    from ..ops.graph import triangles_per_node

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey"])

    def pairs(bucket: pd.DataFrame) -> pd.DataFrame:
        m = bucket.merge(bucket, on="l_orderkey")
        m = m[m["l_suppkey_x"] < m["l_suppkey_y"]]
        return pd.DataFrame(
            {"u": m["l_suppkey_x"].to_numpy(), "v": m["l_suppkey_y"].to_numpy()}
        ).astype({"u": "int64", "v": "int64"})

    empty_uv = pd.DataFrame({"u": pd.Series(dtype="int64"), "v": pd.Series(dtype="int64")})
    pair_ds = bucketed_map_groups(li, "l_orderkey", pairs, num_buckets=32, empty_result=empty_uv)
    weights = grouped_agg(
        pair_ds,
        ["u", "v"],
        {"w": ("u", "count")},
        final="bucketed",
        num_buckets=16,
        empty_result=pd.DataFrame(
            {
                "u": pd.Series(dtype="int64"),
                "v": pd.Series(dtype="int64"),
                "w": pd.Series(dtype="int64"),
            }
        ),
    )
    edges = weights.map_batches(lambda b: b[b["w"] >= 5][["u", "v"]], batch_format="pandas")
    edges = edges.materialize()  # reused by the wedge pass, closure pass AND degrees

    tri = triangles_per_node(edges).to_pandas()
    deg_parts = edges.map_batches(
        lambda b: pd.concat([b["u"], b["v"]], ignore_index=True)
        .value_counts()
        .rename_axis("node")
        .reset_index(name="d")
        .astype({"node": "int64", "d": "int64"}),
        batch_format="pandas",
    ).to_pandas()
    deg = deg_parts.groupby("node", as_index=False)["d"].sum()

    out = deg.merge(tri, on="node", how="left")
    out["n_triangles"] = out["n_triangles"].fillna(0).astype("int64")
    d = out["d"].to_numpy()
    t = out["n_triangles"].to_numpy()
    out["clustering"] = np.where(d >= 2, 2.0 * t / (d * (d - 1)), 0.0)
    out = out.rename(columns={"node": "s_suppkey", "d": "degree"})
    return (
        out[["s_suppkey", "n_triangles", "degree", "clustering"]]
        .sort_values("s_suppkey")
        .reset_index(drop=True)
    )


Q_SUPPLIER_CLUSTERING_SQL = """
WITH pairs AS (
  SELECT a.l_suppkey AS u, b.l_suppkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
), e AS (
  SELECT u, v FROM pairs GROUP BY u, v HAVING COUNT(*) >= 5
), tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM e e1 JOIN e e2 ON e2.u = e1.v JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
), pernode AS (
  SELECT node, COUNT(*)::BIGINT AS t FROM (
    SELECT a AS node FROM tri
    UNION ALL SELECT b FROM tri
    UNION ALL SELECT c FROM tri)
  GROUP BY node
), deg AS (
  SELECT node, COUNT(*)::BIGINT AS d FROM (
    SELECT u AS node FROM e UNION ALL SELECT v FROM e)
  GROUP BY node)
SELECT deg.node AS s_suppkey,
       COALESCE(pernode.t, 0)::BIGINT AS n_triangles,
       deg.d AS degree,
       CASE WHEN deg.d >= 2
            THEN 2.0 * COALESCE(pernode.t, 0) / (deg.d * (deg.d - 1))
            ELSE 0.0 END AS clustering
FROM deg LEFT JOIN pernode USING (node)
ORDER BY s_suppkey
"""

SQL_QUERIES["q_supplier_clustering"] = (q_supplier_clustering, Q_SUPPLIER_CLUSTERING_SQL)


def q_pii_redaction(sf_dir: str) -> pd.DataFrame:
    """PII scrub (ops/pii.py:redact_pii): emails / phones / IPv4 replaced
    by typed tokens, per-row match counts attached. The contact blob is
    built deterministically from customer columns in BOTH engines (the
    synthetic corpus carries no real PII), so every row actually
    exercises all three rules; regex parity Python-re vs RE2 is pinned by
    tests/test_pii_profile_graph.py on adversarial inputs. Stateless map, zero shuffle."""
    from ..ops.pii import redact_pii

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_name"])

    def contact(b: pd.DataFrame) -> pd.DataFrame:
        ck = b["c_custkey"].astype("int64")
        text = (
            "user" + ck.astype(str) + "@mail.example.com contact "
            + b["c_name"].astype(str)
            + " tel 555-" + (ck % 1000).map("{:03d}".format)
            + "-" + (ck % 10000).map("{:04d}".format)
            + " ip 10." + (ck % 256).astype(str) + ".0." + (ck % 250).astype(str)
        )
        return pd.DataFrame({"c_custkey": ck, "text": text.astype(str)})

    out = redact_pii(
        cust.map_batches(contact, batch_format="pandas"), "text", out_col="redacted"
    ).to_pandas()
    out = out[["c_custkey", "redacted", "n_emails", "n_phones", "n_ips"]]
    # synthetic contact text is never NULL, so the nullable Int64 counts
    # (NULL-propagation support in redact_frame) normalize to plain int64
    # — the oracle's ::BIGINT comes back as int64, dtype-strict
    for c in ("n_emails", "n_phones", "n_ips"):
        out[c] = out[c].astype("int64")
    return out.sort_values("c_custkey").reset_index(drop=True)


from ..ops.pii import pii_count_sql_exprs as _pii_counts  # noqa: E402
from ..ops.pii import pii_sql_expr as _pii_expr  # noqa: E402

_PII_TEXT = (
    "'user' || c_custkey || '@mail.example.com contact ' || c_name"
    " || ' tel 555-' || lpad(CAST(c_custkey % 1000 AS VARCHAR), 3, '0')"
    " || '-' || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')"
    " || ' ip 10.' || (c_custkey % 256) || '.0.' || (c_custkey % 250)"
)
Q_PII_SQL = (
    "SELECT c_custkey, " + _pii_expr("t.text") + " AS redacted, "
    + ", ".join(f"{e} AS {n}" for n, e in _pii_counts("t.text").items())
    + f" FROM (SELECT c_custkey, {_PII_TEXT} AS text FROM customer) t"
    + " ORDER BY c_custkey"
)

SQL_QUERIES["q_pii_redaction"] = (q_pii_redaction, Q_PII_SQL)


def q_bfs_purchase_radius(sf_dir: str) -> pd.DataFrame:
    """Bounded-hop multi-source BFS (ops/graph.py:bfs_distances) over the
    bidirected customer-supplier purchase graph: exact min hop count from
    customers 0-4 within 3 hops. The SQL twin unrolls the same frontier
    recurrence as chained CTEs (integer min => order-independent =>
    hash-exact, the same trick as pagerank/kmeans)."""
    from ..ops.graph import bfs_distances

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey"])
    j = adaptive_hash_join(li, orders, "inner", on=("l_orderkey",), right_on=("o_orderkey",))
    # map-side partial dedup: duplicate (cust, supp) edges are harmless to
    # the min but multiply expand rows; per-batch drop removes most
    edges = j.map_batches(
        lambda b: pd.concat(
            [
                pd.DataFrame(
                    {"src": b["o_custkey"], "dst": b["l_suppkey"] + 10_000_000}
                ),
                pd.DataFrame(
                    {"src": b["l_suppkey"] + 10_000_000, "dst": b["o_custkey"]}
                ),
            ],
            ignore_index=True,
        )
        .drop_duplicates()
        .astype({"src": "int64", "dst": "int64"}),
        batch_format="pandas",
    )
    sources = ray.data.from_pandas(
        pd.DataFrame({"node": np.arange(5, dtype=np.int64)})
    )
    # the purchase graph is ~26 MB/1M edges at sf0.1 — comfortably
    # driver-sized, so let the adaptive fast path engage; a true
    # web-scale edge list exceeds this and falls back to the BSP loop
    out = bfs_distances(
        edges, sources, hops=3, broadcast_max_edges=4_000_000
    ).to_pandas()
    return out.sort_values("node").reset_index(drop=True)


from ..ops.graph import bfs_sql as _bfs_sql  # noqa: E402

Q_BFS_SQL = _bfs_sql(
    "SELECT DISTINCT o_custkey AS src, l_suppkey + 10000000 AS dst"
    " FROM orders JOIN lineitem ON l_orderkey = o_orderkey"
    " UNION "
    "SELECT DISTINCT l_suppkey + 10000000 AS src, o_custkey AS dst"
    " FROM orders JOIN lineitem ON l_orderkey = o_orderkey",
    "SELECT UNNEST([0, 1, 2, 3, 4]) AS node",
    hops=3,
)

SQL_QUERIES["q_bfs_purchase_radius"] = (q_bfs_purchase_radius, Q_BFS_SQL)


_PROFILE_COLS = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_orderpriority",
    "o_orderdate",
]


def q_profile_orders(sf_dir: str) -> pd.DataFrame:
    """Ingest-validation profile (ops/profile.py:profile_table): per-column
    row/null counts, EXACT distinct cardinality (one bucketed value
    shuffle) and native-compared min/max rendered as strings, over five
    orders columns spanning all three supported dtype classes."""
    from ..ops.profile import profile_table

    orders = _read(sf_dir, "orders", columns=_PROFILE_COLS)
    return profile_table(orders, _PROFILE_COLS)


from ..ops.profile import profile_sql as _profile_sql  # noqa: E402

SQL_QUERIES["q_profile_orders"] = (
    q_profile_orders,
    _profile_sql("orders", _PROFILE_COLS),
)


def q_unpivot_nation_stats(sf_dir: str) -> pd.DataFrame:
    """Unpivot/melt (ops/reshape.py:unpivot — the inverse of the pivot
    query): per-nation customer and supplier counts melted into tidy
    (n_name, metric, value) rows. Counts are computed distributed
    (grouped_agg, dimension-sized results); the melt itself is row-local."""
    from ..ops.reshape import unpivot

    nation = _small(sf_dir, "nation", columns=["n_nationkey", "n_name"]).to_pandas()
    ccnt = grouped_agg(
        _read(sf_dir, "customer", columns=["c_nationkey"]),
        ["c_nationkey"],
        {"n_customers": ("c_nationkey", "count")},
        final="driver",
    )
    scnt = grouped_agg(
        _read(sf_dir, "supplier", columns=["s_nationkey"]),
        ["s_nationkey"],
        {"n_suppliers": ("s_nationkey", "count")},
        final="driver",
    )
    wide = nation.merge(
        ccnt, how="left", left_on="n_nationkey", right_on="c_nationkey"
    ).merge(scnt, how="left", left_on="n_nationkey", right_on="s_nationkey")
    for c in ("n_customers", "n_suppliers"):
        wide[c] = wide[c].fillna(0).astype("int64")
    out = unpivot(
        ray.data.from_pandas(wide[["n_name", "n_customers", "n_suppliers"]]),
        ["n_name"],
        ["n_customers", "n_suppliers"],
    ).to_pandas()
    out["value"] = out["value"].astype("int64")
    return out.sort_values(["n_name", "metric"]).reset_index(drop=True)


from ..ops.reshape import unpivot_sql as _unpivot_sql  # noqa: E402

Q_UNPIVOT_SQL = (
    _unpivot_sql(
        """
        SELECT n_name,
               COALESCE(c.n_customers, 0)::BIGINT AS n_customers,
               COALESCE(s.n_suppliers, 0)::BIGINT AS n_suppliers
        FROM nation
        LEFT JOIN (SELECT c_nationkey, COUNT(*)::BIGINT AS n_customers
                   FROM customer GROUP BY c_nationkey) c
               ON c.c_nationkey = n_nationkey
        LEFT JOIN (SELECT s_nationkey, COUNT(*)::BIGINT AS n_suppliers
                   FROM supplier GROUP BY s_nationkey) s
               ON s.s_nationkey = n_nationkey
        """,
        ["n_name"],
        ["n_customers", "n_suppliers"],
    )
    + " ORDER BY n_name, metric"
)

SQL_QUERIES["q_unpivot_nation_stats"] = (q_unpivot_nation_stats, Q_UNPIVOT_SQL)


def q_full_outer_year_activity(sf_dir: str) -> pd.DataFrame:
    """FULL OUTER join parity (the one join type the suite lacked):
    per-customer order counts in 1995 vs 2001 — customers active in only
    one year null-extend on the other side (coalesced to 0, like the LEFT
    query). Both count aggregates stay distributed (bucketed finals), and
    the outer join is the repo's union + bucketed-merge shape (every row
    of a key lands in one bucket, so a per-bucket pandas outer merge IS
    the global full outer — and it tolerates the schema-less empty blocks
    sparse bucketed stages emit, which Dataset.join does not)."""
    from ..ops.agg import bucketed_map_groups

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_orderdate"])

    # ONE scan of the fact table: tag each qualifying order with its
    # year-side, count per (ck, kind) in one distributed aggregate
    def both_years(b: pd.DataFrame) -> pd.DataFrame:
        yr = b["o_orderdate"].dt.year
        sel = b[yr.isin([1995, 2001])]
        return pd.DataFrame(
            {
                "ck": sel["o_custkey"].astype("int64"),
                "kind": (yr[sel.index] == 2001).astype("int64"),
            }
        )

    counts = grouped_agg(
        orders.map_batches(both_years, batch_format="pandas"),
        ["ck", "kind"],
        {"cnt": ("ck", "count")},
        final="bucketed",
        empty_result=pd.DataFrame(
            {
                "ck": pd.Series(dtype="int64"),
                "kind": pd.Series(dtype="int64"),
                "cnt": pd.Series(dtype="int64"),
            }
        ),
    )

    def outer_merge(bucket: pd.DataFrame) -> pd.DataFrame:
        a = bucket[bucket["kind"] == 0][["ck", "cnt"]].rename(columns={"cnt": "n_1995"})
        b = bucket[bucket["kind"] == 1][["ck", "cnt"]].rename(columns={"cnt": "n_2001"})
        m = a.merge(b, on="ck", how="outer")
        return pd.DataFrame(
            {
                "custkey": m["ck"].astype("int64"),
                "n_1995": m["n_1995"].fillna(0).astype("int64"),
                "n_2001": m["n_2001"].fillna(0).astype("int64"),
            }
        )

    empty_out = pd.DataFrame(
        {
            "custkey": pd.Series(dtype="int64"),
            "n_1995": pd.Series(dtype="int64"),
            "n_2001": pd.Series(dtype="int64"),
        }
    )
    out = bucketed_map_groups(
        counts,
        "ck",
        outer_merge,
        empty_result=empty_out,
    ).to_pandas()
    return out.sort_values("custkey").reset_index(drop=True)


Q_FULL_OUTER_SQL = """
WITH a AS (SELECT o_custkey AS ck, COUNT(*)::BIGINT AS n_1995 FROM orders
           WHERE year(o_orderdate) = 1995 GROUP BY o_custkey),
     b AS (SELECT o_custkey AS ck, COUNT(*)::BIGINT AS n_2001 FROM orders
           WHERE year(o_orderdate) = 2001 GROUP BY o_custkey)
SELECT COALESCE(a.ck, b.ck) AS custkey,
       COALESCE(a.n_1995, 0)::BIGINT AS n_1995,
       COALESCE(b.n_2001, 0)::BIGINT AS n_2001
FROM a FULL OUTER JOIN b ON a.ck = b.ck
ORDER BY custkey
"""

SQL_QUERIES["q_full_outer_year_activity"] = (
    q_full_outer_year_activity,
    Q_FULL_OUTER_SQL,
)


def q_mode_priority_per_segment(sf_dir: str) -> pd.DataFrame:
    """Grouped MODE with a deterministic tiebreak (highest count, then
    priority ASC): the modal order priority per customer market segment.
    The dimension is broadcast (ray.put once), the (segment, priority)
    counts are one distributed aggregate whose result is ~25 rows — the
    final argmax runs on that tiny frame at the driver."""
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_orderpriority"])
    cust = _small(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    joined = broadcast_hash_join(
        orders, cust, left_on="o_custkey", right_on="c_custkey"
    )
    cnt = grouped_agg(
        joined,
        ["c_mktsegment", "o_orderpriority"],
        {"n": ("o_custkey", "count")},
        final="driver",
    )
    srt = cnt.sort_values(
        ["c_mktsegment", "n", "o_orderpriority"],
        ascending=[True, False, True],
        kind="mergesort",
    ).drop_duplicates(["c_mktsegment"], keep="first")
    out = srt.rename(columns={"o_orderpriority": "mode_priority"}).astype(
        {"n": "int64"}
    )
    return (
        out[["c_mktsegment", "mode_priority", "n"]]
        .sort_values("c_mktsegment")
        .reset_index(drop=True)
    )


Q_MODE_SQL = """
WITH cnt AS (
  SELECT c_mktsegment, o_orderpriority, COUNT(*)::BIGINT AS n
  FROM orders JOIN customer ON c_custkey = o_custkey
  GROUP BY c_mktsegment, o_orderpriority
), r AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY c_mktsegment ORDER BY n DESC, o_orderpriority ASC) AS rn
  FROM cnt)
SELECT c_mktsegment, o_orderpriority AS mode_priority, n
FROM r WHERE rn = 1 ORDER BY c_mktsegment
"""

SQL_QUERIES["q_mode_priority_per_segment"] = (
    q_mode_priority_per_segment,
    Q_MODE_SQL,
)


def q_first_last_orders(sf_dir: str) -> pd.DataFrame:
    """FIRST_VALUE / LAST_VALUE parity: each customer's earliest and
    latest order (date + priority, orderkey tiebreak) in ONE scan and ONE
    bucket shuffle — every batch pre-shrinks to its per-key argmin
    (kind 0) and argmax (kind 1) rows (<= 2 rows per key per block, so a
    key with a million orders ships two per block), then one bucketed
    pass re-argmins/re-argmaxes the survivors and merges per key."""
    from ..ops.agg import bucketed_map_groups

    orders = _read(
        sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_orderdate", "o_orderpriority"]
    )
    order_cols = ["o_custkey", "o_orderdate", "o_orderkey"]

    def extremes(b: pd.DataFrame) -> pd.DataFrame:
        srt = b.sort_values(order_cols, kind="mergesort")
        f = srt.drop_duplicates(["o_custkey"], keep="first").assign(kind=np.int64(0))
        l = srt.drop_duplicates(["o_custkey"], keep="last").assign(kind=np.int64(1))
        return pd.concat([f, l], ignore_index=True)

    pre = orders.map_batches(extremes, batch_format="pandas")

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        srt = bucket.sort_values(order_cols, kind="mergesort")
        f = srt[srt["kind"] == 0].drop_duplicates(["o_custkey"], keep="first")
        l = srt[srt["kind"] == 1].drop_duplicates(["o_custkey"], keep="last")
        m = f.merge(l, on="o_custkey", suffixes=("_f", "_l"))
        return _us(
            pd.DataFrame(
                {
                    "custkey": m["o_custkey"].astype("int64"),
                    "first_date": m["o_orderdate_f"],
                    "first_priority": m["o_orderpriority_f"].astype(str),
                    "last_date": m["o_orderdate_l"],
                    "last_priority": m["o_orderpriority_l"].astype(str),
                }
            ),
            "first_date",
            "last_date",
        )

    empty_out = _us(
        pd.DataFrame(
            {
                "custkey": pd.Series(dtype="int64"),
                "first_date": pd.Series(dtype="datetime64[us]"),
                "first_priority": pd.Series(dtype=str),
                "last_date": pd.Series(dtype="datetime64[us]"),
                "last_priority": pd.Series(dtype=str),
            }
        ),
        "first_date",
        "last_date",
    )
    out = bucketed_map_groups(
        pre,
        "o_custkey",
        merge,
        empty_result=empty_out,
    ).to_pandas()
    return out.sort_values("custkey").reset_index(drop=True)


Q_FIRST_LAST_SQL = """
WITH r AS (
  SELECT o_custkey, o_orderdate, o_orderpriority,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate ASC, o_orderkey ASC) AS rn_f,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn_l
  FROM orders)
SELECT f.o_custkey AS custkey,
       f.o_orderdate AS first_date, f.o_orderpriority AS first_priority,
       l.o_orderdate AS last_date, l.o_orderpriority AS last_priority
FROM (SELECT * FROM r WHERE rn_f = 1) f
JOIN (SELECT * FROM r WHERE rn_l = 1) l USING (o_custkey)
ORDER BY custkey
"""

SQL_QUERIES["q_first_last_orders"] = (q_first_last_orders, Q_FIRST_LAST_SQL)


def q_weighted_purchase_paths(sf_dir: str) -> pd.DataFrame:
    """Bounded-round WEIGHTED shortest paths (ops/graph.py:
    shortest_path_distances — Bellman-Ford with an improved-set frontier,
    integer weights so relaxation order cannot change the result): min
    path weight from customers 0-4 within 4 relaxation rounds over the
    bidirected purchase graph, edge weight 1 + (custkey + suppkey) % 5
    derived identically in both engines."""
    from ..ops.graph import shortest_path_distances

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey"])
    j = adaptive_hash_join(li, orders, "inner", on=("l_orderkey",), right_on=("o_orderkey",))

    def make_edges(b: pd.DataFrame) -> pd.DataFrame:
        ck = b["o_custkey"].to_numpy().astype("int64")
        sk = b["l_suppkey"].to_numpy().astype("int64")
        w = 1 + (ck + sk) % 5
        fwd = pd.DataFrame({"src": ck, "dst": sk + 10_000_000, "w": w})
        rev = pd.DataFrame({"src": sk + 10_000_000, "dst": ck, "w": w})
        return (
            pd.concat([fwd, rev], ignore_index=True)
            .drop_duplicates()
            .astype({"src": "int64", "dst": "int64", "w": "int64"})
        )

    edges = j.map_batches(make_edges, batch_format="pandas")
    sources = ray.data.from_pandas(
        pd.DataFrame({"node": np.arange(5, dtype=np.int64)})
    )
    out = shortest_path_distances(
        edges, sources, rounds=4, broadcast_max_edges=4_000_000
    ).to_pandas()
    return out.sort_values("node").reset_index(drop=True)


Q_WEIGHTED_PATHS_SQL = _bfs_sql(
    "SELECT DISTINCT o_custkey AS src, l_suppkey + 10000000 AS dst,"
    " 1 + (o_custkey + l_suppkey) % 5 AS w"
    " FROM orders JOIN lineitem ON l_orderkey = o_orderkey"
    " UNION "
    "SELECT DISTINCT l_suppkey + 10000000 AS src, o_custkey AS dst,"
    " 1 + (o_custkey + l_suppkey) % 5 AS w"
    " FROM orders JOIN lineitem ON l_orderkey = o_orderkey",
    "SELECT UNNEST([0, 1, 2, 3, 4]) AS node",
    hops=4,
    weighted=True,
)

SQL_QUERIES["q_weighted_purchase_paths"] = (
    q_weighted_purchase_paths,
    Q_WEIGHTED_PATHS_SQL,
)


def q_zorder_orders(sf_dir: str) -> pd.DataFrame:
    """Z-order data clustering key (ops/layout.py): the Morton interleave
    of (custkey, orderkey) RANGE-QUANTIZED onto 16 bits each (declared
    max 2^24-1 covers every sf; mod-truncation would scatter any column
    wider than 16 bits) — the key a 100 TB pipeline sorts on before a
    partitioned write so parquet min/max stats prune files for range
    predicates on EITHER column. Pure int64 arithmetic, so the DuckDB
    twin computes the identical key."""
    from ..ops.layout import zorder_key

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    out = zorder_key(
        orders, "o_custkey", "o_orderkey", max_a=(1 << 24) - 1, max_b=(1 << 24) - 1
    ).to_pandas()
    out = out[["o_orderkey", "zkey"]].astype({"o_orderkey": "int64", "zkey": "int64"})
    return out.sort_values("o_orderkey").reset_index(drop=True)


from ..ops.layout import zorder_sql as _zorder_sql  # noqa: E402

Q_ZORDER_SQL = (
    _zorder_sql(
        "orders",
        ["o_orderkey"],
        "o_custkey",
        "o_orderkey",
        max_a=(1 << 24) - 1,
        max_b=(1 << 24) - 1,
    )
    + " ORDER BY o_orderkey"
)

SQL_QUERIES["q_zorder_orders"] = (q_zorder_orders, Q_ZORDER_SQL)


def q_weighted_sample_orders(sf_dir: str) -> pd.DataFrame:
    """Deterministic importance sampling (ops/sampling.py:
    weighted_hash_sample): keep each order with probability proportional
    to its total price — per-row integer threshold (cents * 2^32) //
    max_weight over the shared multiplicative hash, so the predicate is
    bitwise-identical in SQL (and under any partitioning). Zero shuffle."""
    from ..ops.sampling import weighted_hash_sample

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])

    def add_cents(b: pd.DataFrame) -> pd.DataFrame:
        return b.assign(price_cents=_cents(b["o_totalprice"]))

    kept = weighted_hash_sample(
        orders.map_batches(add_cents, batch_format="pandas"),
        "o_orderkey",
        "price_cents",
        max_weight=60_000_000,
    ).to_pandas()
    out = kept[["o_orderkey", "price_cents"]].astype(
        {"o_orderkey": "int64", "price_cents": "int64"}
    )
    return out.sort_values("o_orderkey").reset_index(drop=True)


Q_WEIGHTED_SAMPLE_SQL = """
WITH w AS (
  SELECT o_orderkey, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents
  FROM orders)
SELECT o_orderkey, price_cents FROM w
WHERE ((o_orderkey % 4294967296)::UBIGINT * 2654435761) % 4294967296
      < ((price_cents * 4294967296) // 60000000)::UBIGINT
ORDER BY o_orderkey
"""

SQL_QUERIES["q_weighted_sample_orders"] = (
    q_weighted_sample_orders,
    Q_WEIGHTED_SAMPLE_SQL,
)


def q_cap_docs_per_source(sf_dir: str) -> pd.DataFrame:
    """Docs-per-domain cap (ops/sampling.py:cap_per_key — the
    pre-training per-host limit): at most 5 documents per crawl source,
    selected as a UNIFORM deterministic subsample (multiplicative hash of
    doc_id, doc_id tiebreak), not first-seen. Per-batch pre-shrink ships
    <= 5 rows per (source, block) into the one bucket shuffle."""
    from ..ops.sampling import cap_per_key

    docs = _read(sf_dir, "documents", columns=["doc_id", "source"])
    out = cap_per_key(docs, "source", 5, id_col="doc_id").to_pandas()
    out = out[["doc_id", "source"]].astype({"doc_id": "int64"})
    return out.sort_values("doc_id").reset_index(drop=True)


Q_CAP_PER_SOURCE_SQL = """
WITH r AS (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY ((doc_id % 4294967296)::UBIGINT * 2654435761) % 4294967296,
                    doc_id) AS rn
  FROM documents)
SELECT doc_id, source FROM r WHERE rn <= 5 ORDER BY doc_id
"""

SQL_QUERIES["q_cap_docs_per_source"] = (q_cap_docs_per_source, Q_CAP_PER_SOURCE_SQL)


def q_unigram_surprisal(sf_dir: str) -> pd.DataFrame:
    """LM-style quality scoring (ops/textstats.py:unigram_surprisal):
    per-document integer surprisal vs the corpus's own top-1000 unigram
    distribution — each token adds scale // tf(token) with OOV scored as
    tf=1; int64 floor division makes the sum order-independent, so the
    SQL twin (full tf CTE + the identical top-V window rule) is
    hash-exact. The quality-filter shape a surprisal/perplexity gate at
    100 TB would use."""
    from ..ops.textstats import unigram_surprisal

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = unigram_surprisal(docs, "text", "doc_id").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


Q_SURPRISAL_SQL = """
WITH w AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
  FROM documents),
tf AS (SELECT term, COUNT(*)::BIGINT AS n FROM w GROUP BY term),
vocab AS (
  SELECT term, n FROM (
    SELECT term, n, ROW_NUMBER() OVER (ORDER BY n DESC, term ASC) AS rn FROM tf)
  WHERE rn <= 1000),
scored AS (
  SELECT w.doc_id, 1000000 // COALESCE(v.n, 1) AS s
  FROM w LEFT JOIN vocab v USING (term))
SELECT doc_id, COUNT(*)::BIGINT AS n_tokens, SUM(s)::BIGINT AS surprisal
FROM scored GROUP BY doc_id ORDER BY doc_id
"""

SQL_QUERIES["q_unigram_surprisal"] = (q_unigram_surprisal, Q_SURPRISAL_SQL)


def q_kcore_parts(sf_dir: str) -> pd.DataFrame:
    """k-core decomposition (k=3, 4 bounded peel rounds) of the part
    co-purchase graph (parts co-appearing in >= 2 orders): the dense-core
    extraction step a KG uses to find tightly-connected entity
    neighborhoods. Pair generation is the same one-bucketed-self-merge as
    q_supplier_triangles; the peel itself is ops/graph.py:k_core — every
    round distributed, bounded-round semantics so the unrolled-CTE twin
    (k_core_sql) is hash-exact."""
    from ..ops.agg import to_pandas_safe
    from ..ops.graph import k_core

    edges = _copurchase_edges(sf_dir)
    core = k_core(edges, 3, rounds=4, num_buckets=16)
    out = to_pandas_safe(
        core,
        pd.DataFrame(
            {"node": pd.Series(dtype="int64"), "deg": pd.Series(dtype="int64")}
        ),
    )
    return out.sort_values("node").reset_index(drop=True)


_COPURCHASE_EDGES_SQL = """SELECT u, v FROM (
  SELECT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
) GROUP BY u, v HAVING COUNT(*) >= 2"""


def _kcore_parts_sql() -> str:
    from ..ops.graph import k_core_sql

    return k_core_sql(_COPURCHASE_EDGES_SQL, 3, rounds=4)


SQL_QUERIES["q_kcore_parts"] = (q_kcore_parts, _kcore_parts_sql())


def _copurchase_edges(sf_dir: str, *, min_weight: int = 2) -> ray.data.Dataset:
    """Distinct part co-purchase edges (u < v, co-appearing in >=
    ``min_weight`` orders) — shared by q_kcore_parts and
    q_link_prediction_parts. NOTE: edge density FALLS with scale factor
    (the part space grows as fast as the lineitems, so repeat
    co-purchases thin out — at sf0.1 the weight>=2 graph is empty and
    both engines agree on the empty result); the structurally rich
    validation scale is the driver's sf0.01 (multi-round peeling,
    1295->1065 nodes). The KG entity-graph variants (kg_entity_cores /
    kg_link_prediction) have scale-independent structure. One bucketed per-order self-merge (order
    size bounds the per-group pair blowup) + one bucketed weight count;
    the weight threshold is what keeps node degree bounded downstream
    (the wedge stages are quadratic in degree, see
    q_link_prediction_parts)."""
    from ..ops.agg import bucketed_map_groups

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

    def pairs(bucket: pd.DataFrame) -> pd.DataFrame:
        m = bucket.merge(bucket, on="l_orderkey")
        m = m[m["l_partkey_x"] < m["l_partkey_y"]]
        return pd.DataFrame(
            {"u": m["l_partkey_x"].to_numpy(), "v": m["l_partkey_y"].to_numpy()}
        ).astype({"u": "int64", "v": "int64"})

    empty_uv = pd.DataFrame(
        {"u": pd.Series(dtype="int64"), "v": pd.Series(dtype="int64")}
    )
    pair_ds = bucketed_map_groups(
        li, "l_orderkey", pairs, num_buckets=32, empty_result=empty_uv
    )
    weights = grouped_agg(
        pair_ds,
        ["u", "v"],
        {"w": ("u", "count")},
        final="bucketed",
        num_buckets=16,
        empty_result=pd.DataFrame(
            {
                "u": pd.Series(dtype="int64"),
                "v": pd.Series(dtype="int64"),
                "w": pd.Series(dtype="int64"),
            }
        ),
    )
    return weights.map_batches(
        lambda b, mw=min_weight: b[b["w"] >= mw][["u", "v"]],
        batch_format="pandas",
    )


def q_link_prediction_parts(sf_dir: str) -> pd.DataFrame:
    """Common-neighbor link prediction over the part co-purchase graph:
    the top 50 NON-adjacent node pairs by shared-neighbor count, scored
    with neighborhood Jaccard cn/(deg_a + deg_b - cn) — the classic KG
    link-prediction baseline (predict missing edges from wedge evidence).

    Shape: wedge generation is one bucketed merge keyed on the wedge
    CENTER (quadratic in center degree — bounded here by the co-purchase
    weight threshold; a web-scale run would pre-filter hubs the same way
    the LSH band caps do), then a bucketed (a, b) count, a distributed
    left_anti hash join to drop existing edges, two degree hash joins,
    and a per-block partial top-k so only k rows per block reach the
    driver. The Jaccard double divides the SAME int64s in both engines,
    so it compares bitwise."""
    from ..ops.graph import common_neighbor_scores, top_jaccard_pairs

    scored = common_neighbor_scores(
        _copurchase_edges(sf_dir), min_cn=2, num_buckets=32
    )
    return top_jaccard_pairs(scored, 50)


Q_LINK_PREDICTION_SQL = f"""
WITH e AS MATERIALIZED ({_COPURCHASE_EDGES_SQL}),
nb AS MATERIALIZED (SELECT u AS c, v AS n FROM e UNION ALL SELECT v AS c, u AS n FROM e),
deg AS MATERIALIZED (SELECT c AS node, COUNT(*)::BIGINT AS deg FROM nb GROUP BY c),
cn AS MATERIALIZED (
  SELECT x.n AS a, y.n AS b, COUNT(*)::BIGINT AS cn
  FROM nb x JOIN nb y ON x.c = y.c AND x.n < y.n
  GROUP BY x.n, y.n HAVING COUNT(*) >= 2
),
cand AS (
  SELECT a, b, cn FROM cn
  WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.u = cn.a AND e.v = cn.b)
)
SELECT cand.a, cand.b, cand.cn,
       cand.cn::DOUBLE / (da.deg + db.deg - cand.cn) AS jaccard
FROM cand JOIN deg da ON da.node = cand.a JOIN deg db ON db.node = cand.b
ORDER BY cand.cn DESC, cand.a, cand.b
LIMIT 50
"""

SQL_QUERIES["q_link_prediction_parts"] = (q_link_prediction_parts, Q_LINK_PREDICTION_SQL)


def _synth_parse_urls(b: pd.DataFrame) -> pd.DataFrame:
    """Deterministic adversarial URL synthesis from (doc_id, source) —
    mixed-case schemes/hosts, explicit default AND non-default ports,
    fragments, 0-3 params, varying depth — parsed by ops/urls.py. Shared
    by q_url_domain_stats and q_url_frontier_dedup; the SQL mirror is
    _SYNTH_URLS_SQL + _url_parse_ctes()."""
    from ..ops.urls import parse_urls

    d = b["doc_id"].to_numpy().astype("int64")
    scheme = np.where(d % 2 == 0, "HTTPS://WWW.", "http://www.")
    port = np.where(d % 6 == 0, ":443", "")
    path = np.select([d % 3 == 0, d % 3 == 1], ["/a", "/a/b"], default="/a/b/c")
    qs = np.select([d % 4 == 0, d % 4 == 1], ["?x=1&y=2&z=3", "?x=1"], default="")
    frag = np.where(d % 5 == 0, "#frag", "")
    url = (
        scheme
        + b["source"].str.upper().to_numpy()
        + ".EXAMPLE.COM"
        + port
        + path
        + qs
        + frag
    )
    out = parse_urls(pd.Series(url))
    out.index = b.index
    out["doc_id"] = d
    return out


def _url_parse_ctes(*, keep: str) -> str:
    """The split_part/lower/replace parse chain mirroring
    ops/urls.py:parse_urls, as chained CTEs over a ``urls(doc_id, url)``
    CTE. ``keep`` is an extra column expression ('doc_id' or '') carried
    through every stage. Shared by BOTH URL twins so they cannot
    diverge. Ends with CTE ``n`` exposing (keep?, host, path_depth,
    n_params, norm)."""
    k = f"{keep}, " if keep else ""
    # authority ends at the first '/' OR '?' — same rule as parse_urls
    # ('http://h.com?x=1' must not swallow the query into the host)
    return f"""p AS MATERIALIZED (
  SELECT {k}
    lower(split_part(split_part(url, '#', 1), '://', 1)) AS scheme,
    split_part(split_part(url, '#', 1), '://', 2) AS rest
  FROM urls
), hp AS MATERIALIZED (
  SELECT {k}scheme,
    regexp_extract(rest, '^[^/?]*') AS hostport,
    substr(rest, length(regexp_extract(rest, '^[^/?]*')) + 1) AS pathq
  FROM p
), f AS MATERIALIZED (
  SELECT {k}scheme,
    lower(split_part(hostport, ':', 1)) AS host,
    CASE WHEN contains(hostport, ':')
         THEN split_part(hostport, ':', 2)::BIGINT
         ELSE (CASE scheme WHEN 'https' THEN 443 ELSE 80 END) END AS port,
    split_part(pathq, '?', 1) AS path,
    CASE WHEN contains(pathq, '?')
         THEN substr(pathq, length(split_part(pathq, '?', 1)) + 2)
         ELSE '' END AS query
  FROM hp
), n AS MATERIALIZED (
  SELECT {k}host,
    (length(path) - length(replace(path, '/', '')))::BIGINT AS path_depth,
    (CASE WHEN query = '' THEN 0
          ELSE length(query) - length(replace(query, '&', '')) + 1 END)::BIGINT AS n_params,
    scheme || '://' || host
      || (CASE WHEN port = (CASE scheme WHEN 'https' THEN 443 ELSE 80 END)
               THEN '' ELSE ':' || port END)
      || path || (CASE WHEN query = '' THEN '' ELSE '?' || query END) AS norm
  FROM f
)"""


_SYNTH_URLS_SQL = """
  SELECT doc_id,
    (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://WWW.' ELSE 'http://www.' END)
    || upper(source) || '.EXAMPLE.COM'
    || (CASE WHEN doc_id % 6 = 0 THEN ':443' ELSE '' END)
    || (CASE doc_id % 3 WHEN 0 THEN '/a' WHEN 1 THEN '/a/b' ELSE '/a/b/c' END)
    || (CASE doc_id % 4 WHEN 0 THEN '?x=1&y=2&z=3' WHEN 1 THEN '?x=1' ELSE '' END)
    || (CASE WHEN doc_id % 5 = 0 THEN '#frag' ELSE '' END) AS url
  FROM documents
"""


def q_url_domain_stats(sf_dir: str) -> pd.DataFrame:
    """Per-host crawl stats after URL normalization (ops/urls.py): the
    canonicalize-before-group step every crawl pipeline runs. URLs are
    synthesized deterministically from (doc_id, source) with adversarial
    variation — mixed-case schemes/hosts, explicit default AND
    non-default ports, fragments, 0-3 query params, varying path depth —
    and the SQL twin re-derives every parsed field with
    split_part/lower/replace, so the kernel is checked byte-for-byte.

    Shape: parse is one stateless vectorized map_batches; n_urls (count
    DISTINCT normalized url per host) is a bucketed (host, norm) distinct
    BEFORE the per-host count (never a driver-side set); the other three
    aggregates partial-combine map-side."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "source"])

    def synth_and_parse(b: pd.DataFrame) -> pd.DataFrame:
        p = _synth_parse_urls(b)
        return pd.DataFrame(
            {
                "host": p["host"].to_numpy(),
                "norm": p["norm"].to_numpy(),
                "path_depth": p["path_depth"].to_numpy(),
                "n_params": p["n_params"].to_numpy(),
            }
        )

    # consumed by TWO aggregates below — materialize or the read+parse
    # lineage executes twice
    parsed = docs.map_batches(synth_and_parse, batch_format="pandas").materialize()

    per_host = grouped_agg(
        parsed,
        ["host"],
        {
            "n_pages": ("host", "count"),
            "sum_params": ("n_params", "sum"),
            "max_depth": ("path_depth", "max"),
        },
        final="driver",
    )
    distinct = grouped_agg(
        parsed,
        ["host", "norm"],
        {"n": ("norm", "count")},
        final="bucketed",
        num_buckets=16,
        empty_result=pd.DataFrame(
            {
                "host": pd.Series(dtype="object"),
                "norm": pd.Series(dtype="object"),
                "n": pd.Series(dtype="int64"),
            }
        ),
    )
    n_urls = grouped_agg(
        distinct, ["host"], {"n_urls": ("norm", "count")}, final="driver"
    )
    out = per_host.merge(n_urls, on="host")
    out = out[["host", "n_pages", "n_urls", "sum_params", "max_depth"]].astype(
        {
            "n_pages": "int64",
            "n_urls": "int64",
            "sum_params": "int64",
            "max_depth": "int64",
        }
    )
    return out.sort_values("host").reset_index(drop=True)


Q_URL_DOMAIN_STATS_SQL = f"""
WITH urls AS MATERIALIZED ({_SYNTH_URLS_SQL}
), {_url_parse_ctes(keep="")}
SELECT host,
  COUNT(*)::BIGINT AS n_pages,
  COUNT(DISTINCT norm)::BIGINT AS n_urls,
  SUM(n_params)::BIGINT AS sum_params,
  MAX(path_depth)::BIGINT AS max_depth
FROM n
GROUP BY host
ORDER BY host
"""

SQL_QUERIES["q_url_domain_stats"] = (q_url_domain_stats, Q_URL_DOMAIN_STATS_SQL)


def q_url_blocklist(sf_dir: str) -> pd.DataFrame:
    """UT1-style domain blocklist filtering: block the 2 highest-volume
    registrable domains (the spam-domain cut every crawl curation makes)
    and flag every host by SUFFIX match — a blocked base domain takes its
    subdomains with it (www.srcN.example.com is blocked via
    srcN.example.com). Blocklist derivation is deterministic (top-2 base
    domains by page count, ties by name) so the twin is exact.

    Shape: one parse map + one per-host grouped count (host-cardinality;
    at 100 TB make it bucketed + top-k pruned like q_word_count — the
    blocklist itself is always tiny); the flag pass broadcasts the
    blocklist in the closure."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "source"])

    def to_host(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"host": _synth_parse_urls(b)["host"].to_numpy()})

    per_host = grouped_agg(
        docs.map_batches(to_host, batch_format="pandas"),
        ["host"],
        {"n_pages": ("host", "count")},
        final="driver",
    )
    per_host["n_pages"] = per_host["n_pages"].astype("int64")
    blocklist = _top2_base_domains(per_host, "n_pages")
    blocked = per_host["host"].map(
        lambda h: any(h == b or h.endswith("." + b) for b in blocklist)
    )
    out = per_host.assign(blocked=blocked.astype(bool))
    return out.sort_values("host").reset_index(drop=True)[
        ["host", "n_pages", "blocked"]
    ]


def _top2_base_domains(per_host: pd.DataFrame, count_col: str) -> list[str]:
    """Top-2 registrable base domains by volume (ties by name) — ONE
    implementation behind q_url_blocklist AND q_crawl_admission so engine
    and twins cannot drift. EXACTLY the twins' regexp_replace semantics:
    a dotless host (bare TLD / localhost) is its OWN base — str.split
    would yield NaN and pandas groupby silently drops NaN keys."""
    base = per_host["host"].str.replace(r"^[^.]*\.", "", regex=True)
    by_base = (
        per_host.assign(base=base)
        .groupby("base", as_index=False)[count_col]
        .sum()
        .sort_values([count_col, "base"], ascending=[False, True], kind="mergesort")
    )
    return by_base["base"].head(2).tolist()


def _blocklist_ctes_sql(src: str, count_col: str) -> str:
    """by_base + bl CTEs (top-2 base domains, ties by name) over a
    (host, count) CTE — the SQL twin of _top2_base_domains, shared by
    the blocklist and admission twins so they cannot diverge."""
    return f"""by_base AS (
  SELECT regexp_replace(host, '^[^.]*\\.', '') AS base, SUM({count_col}) AS nn
  FROM {src} GROUP BY base),
bl AS (SELECT base FROM by_base ORDER BY nn DESC, base LIMIT 2)"""


def _robots_rules_cte_sql(hosts_src: str) -> str:
    """The parsed _synth_robots_txt rule sets as a rules CTE, keyed on
    the same md5_number_lower(host) %% 2 switch — shared by the robots
    and admission twins so they cannot diverge."""
    return f"""rules AS (
  SELECT host, '/a' AS prefix, 0 AS allow FROM {hosts_src}
    WHERE md5_number_lower(host) % 2 = 0
  UNION ALL
  SELECT host, '/a/b', 1 FROM {hosts_src} WHERE md5_number_lower(host) % 2 = 0
  UNION ALL
  SELECT host, '/a/b', 0 FROM {hosts_src} WHERE md5_number_lower(host) % 2 = 1
)"""


Q_URL_BLOCKLIST_SQL = f"""
WITH urls AS MATERIALIZED ({_SYNTH_URLS_SQL}
), {_url_parse_ctes(keep="")},
per_host AS (
  SELECT host, COUNT(*)::BIGINT AS n_pages FROM n GROUP BY host),
{_blocklist_ctes_sql("per_host", "n_pages")}
SELECT host, n_pages,
       EXISTS (
         SELECT 1 FROM bl
         WHERE per_host.host = bl.base OR per_host.host LIKE '%.' || bl.base
       ) AS blocked
FROM per_host ORDER BY host
"""

SQL_QUERIES["q_url_blocklist"] = (q_url_blocklist, Q_URL_BLOCKLIST_SQL)


def _synth_robots_txt(host: str) -> str:
    """Deterministic per-host robots.txt body (keyed on the repo-wide
    md5-low64 of the host): half the hosts disallow /a but re-allow /a/b
    (longest-match + allow-tie exercise), half disallow /a/b. A decoy
    group for another UA proves group selection. The SQL twin mirrors
    the PARSED rules via the same md5_number_lower(host) % 2 switch."""
    from ..ops.textstats import _h64

    decoy = "User-agent: badbot\nDisallow: /\n\n"
    if _h64(host.encode()) % 2 == 0:
        return decoy + "User-agent: *\nDisallow: /a\nAllow: /a/b\n"
    return decoy + "User-agent: *\nDisallow: /a/b\n"


def q_robots_filter(sf_dir: str) -> pd.DataFrame:
    """Crawl-permission gate (ops/robots.py): per-host robots.txt bodies
    are PARSED (RFC 9309 user-agent groups) and every URL evaluated under
    longest-prefix-match with the allow-wins tie rule; output is the
    per-host allowed/blocked split a fetch frontier consults. The twin
    re-derives the parsed rule sets from the same host-hash switch, so
    parser + evaluator are oracled end to end.

    Shape: stateless map (robots bodies are host-keyed side data, parsed
    once per host per batch here because they are synthesized; a real
    crawl broadcasts the parsed dict) + one per-host grouped count."""
    from ..ops.robots import evaluate_robots, parse_robots_txt

    docs = _read(sf_dir, "documents", columns=["doc_id", "source"])

    def flag(b: pd.DataFrame) -> pd.DataFrame:
        p = _synth_parse_urls(b)
        rules = {
            h: parse_robots_txt(_synth_robots_txt(h))
            for h in pd.unique(p["host"].to_numpy())
        }
        ok = evaluate_robots(p, rules)
        return pd.DataFrame(
            {
                "host": p["host"].to_numpy(),
                "allowed": ok.astype("int64"),
                "blocked": (~ok).astype("int64"),
            }
        )

    out = grouped_agg(
        docs.map_batches(flag, batch_format="pandas"),
        ["host"],
        {"n_allowed": ("allowed", "sum"), "n_blocked": ("blocked", "sum")},
        final="driver",
    )
    for c in ("n_allowed", "n_blocked"):
        out[c] = out[c].astype("int64")
    return out.sort_values("host").reset_index(drop=True)


Q_ROBOTS_FILTER_SQL = f"""
WITH urls AS MATERIALIZED ({_SYNTH_URLS_SQL}
), {_url_parse_ctes(keep="doc_id")},
hosts AS (SELECT DISTINCT host FROM f),
{_robots_rules_cte_sql("hosts")},
matched AS (
  SELECT f.doc_id, f.host, r.allow,
         ROW_NUMBER() OVER (
           PARTITION BY f.doc_id
           ORDER BY length(r.prefix) DESC, r.allow DESC
         ) AS rn
  FROM f JOIN rules r
    ON f.host = r.host AND f.path LIKE r.prefix || '%'
),
verdicts AS (
  SELECT f.doc_id, f.host,
         COALESCE(m.allow, 1) AS allow  -- no matching rule -> allowed
  FROM f LEFT JOIN (SELECT * FROM matched WHERE rn = 1) m
    ON f.doc_id = m.doc_id
)
SELECT host,
       SUM(CASE WHEN allow = 1 THEN 1 ELSE 0 END)::BIGINT AS n_allowed,
       SUM(CASE WHEN allow = 0 THEN 1 ELSE 0 END)::BIGINT AS n_blocked
FROM verdicts GROUP BY host ORDER BY host
"""

SQL_QUERIES["q_robots_filter"] = (q_robots_filter, Q_ROBOTS_FILTER_SQL)


def q_crawl_admission(sf_dir: str) -> pd.DataFrame:
    """The COMPOSED crawl-admission pipeline under one oracle (the
    crawl-side q_curation_v2): frontier dedup by canonical URL (earliest
    doc wins) -> domain blocklist (top-2 base domains by candidate
    volume, suffix match) -> robots.txt gate (longest-prefix,
    allow-wins) on the domain survivors. Per host: candidates, blocked
    by domain, blocked by robots, admitted — the funnel a fetch
    scheduler reads. Stage order is load-bearing and the twin replicates
    it exactly: robots only evaluates what the blocklist passed."""
    from ..ops.agg import latest_by_key
    from ..ops.robots import evaluate_robots, parse_robots_txt

    docs = _read(sf_dir, "documents", columns=["doc_id", "source"])

    def parse(b: pd.DataFrame) -> pd.DataFrame:
        p = _synth_parse_urls(b)
        return pd.DataFrame(
            {
                "norm": p["norm"].to_numpy(),
                "host": p["host"].to_numpy(),
                "path": p["path"].to_numpy(),
                "doc_id": p["doc_id"].to_numpy(),
            }
        ).astype({"doc_id": "int64"})

    empty_host_counts = pd.DataFrame(
        {"host": pd.Series(dtype="object"), "n_candidates": pd.Series(dtype="int64")}
    )
    cand = latest_by_key(
        docs.map_batches(parse, batch_format="pandas"),
        "norm",
        ["doc_id"],
        ascending=True,
        num_buckets=16,
        empty_result=pd.DataFrame(
            {
                "norm": pd.Series(dtype="object"),
                "host": pd.Series(dtype="object"),
                "path": pd.Series(dtype="object"),
                "doc_id": pd.Series(dtype="int64"),
            }
        ),
    ).materialize()  # consumed TWICE (blocklist counts + gate pass) —
    # without this the read + parse + frontier-dedup shuffle runs twice

    per_host = grouped_agg(
        cand,
        ["host"],
        {"n_candidates": ("norm", "count")},
        final="driver",
        empty_result=empty_host_counts,
    )
    per_host["n_candidates"] = per_host["n_candidates"].astype("int64")
    blocklist = _top2_base_domains(per_host, "n_candidates")

    def gate(b: pd.DataFrame) -> pd.DataFrame:
        dom = b["host"].map(
            lambda h: any(h == x or h.endswith("." + x) for x in blocklist)
        ).to_numpy()
        rules = {
            h: parse_robots_txt(_synth_robots_txt(h))
            for h in pd.unique(b["host"].to_numpy())
        }
        ok = evaluate_robots(b, rules)
        return pd.DataFrame(
            {
                "host": b["host"].to_numpy(),
                "cand": np.ones(len(b), dtype="int64"),
                "dom_blocked": dom.astype("int64"),
                "robots_blocked": (~dom & ~ok).astype("int64"),
                "admitted": (~dom & ok).astype("int64"),
            }
        )

    out = grouped_agg(
        cand.map_batches(gate, batch_format="pandas"),
        ["host"],
        {
            "n_candidates": ("cand", "sum"),
            "n_blocked_domain": ("dom_blocked", "sum"),
            "n_blocked_robots": ("robots_blocked", "sum"),
            "n_admitted": ("admitted", "sum"),
        },
        final="driver",
        empty_result=pd.DataFrame(
            {
                "host": pd.Series(dtype="object"),
                "n_candidates": pd.Series(dtype="int64"),
                "n_blocked_domain": pd.Series(dtype="int64"),
                "n_blocked_robots": pd.Series(dtype="int64"),
                "n_admitted": pd.Series(dtype="int64"),
            }
        ),
    )
    for c in ("n_candidates", "n_blocked_domain", "n_blocked_robots", "n_admitted"):
        out[c] = out[c].astype("int64")
    return out.sort_values("host").reset_index(drop=True)


Q_CRAWL_ADMISSION_SQL = f"""
WITH urls AS MATERIALIZED ({_SYNTH_URLS_SQL}
), {_url_parse_ctes(keep="doc_id")},
cand AS MATERIALIZED (
  SELECT doc_id, host, path, norm FROM (
    SELECT f.doc_id, f.host, f.path, n.norm,
           ROW_NUMBER() OVER (PARTITION BY n.norm ORDER BY f.doc_id) AS rn
    FROM f JOIN n USING (doc_id))
  WHERE rn = 1),
per_host AS (SELECT host, COUNT(*)::BIGINT AS n_candidates FROM cand GROUP BY host),
{_blocklist_ctes_sql("per_host", "n_candidates")},
{_robots_rules_cte_sql("per_host")},
matched AS (
  SELECT cand.norm, r.allow,
         ROW_NUMBER() OVER (
           PARTITION BY cand.norm
           ORDER BY length(r.prefix) DESC, r.allow DESC
         ) AS rn
  FROM cand JOIN rules r
    ON cand.host = r.host AND cand.path LIKE r.prefix || '%'
),
flagged AS (
  SELECT cand.host,
    EXISTS (SELECT 1 FROM bl
            WHERE cand.host = bl.base OR cand.host LIKE '%.' || bl.base)
      AS dom_blocked,
    COALESCE(m.allow, 1) = 1 AS robots_ok
  FROM cand LEFT JOIN (SELECT * FROM matched WHERE rn = 1) m
    ON cand.norm = m.norm)
SELECT host,
  COUNT(*)::BIGINT AS n_candidates,
  SUM(CASE WHEN dom_blocked THEN 1 ELSE 0 END)::BIGINT AS n_blocked_domain,
  SUM(CASE WHEN NOT dom_blocked AND NOT robots_ok THEN 1 ELSE 0 END)::BIGINT
    AS n_blocked_robots,
  SUM(CASE WHEN NOT dom_blocked AND robots_ok THEN 1 ELSE 0 END)::BIGINT
    AS n_admitted
FROM flagged GROUP BY host ORDER BY host
"""

SQL_QUERIES["q_crawl_admission"] = (q_crawl_admission, Q_CRAWL_ADMISSION_SQL)


def q_cohort_retention(sf_dir: str) -> pd.DataFrame:
    """Classic cohort-retention matrix over the event stream: users
    cohorted by their FIRST event day, activity bucketed into weeks since
    cohort, cell = count of distinct active users. All calendar math is
    int64 (epoch microseconds floor-divided to days/weeks), so the twin
    is exact.

    Shape: ONE bucketed shuffle keyed on user_id co-locates each user's
    whole history, so the per-user first day (a groupby-transform min),
    the week offsets, AND the per-cell user dedup all complete inside the
    bucket — no join, and the DISTINCT count is just a count of the
    deduped cells. A per-batch (user, day) pre-dedup would bound the
    shuffle further for power users; day cardinality per user is already
    tiny here."""
    from ..ops.agg import bucketed_map_groups

    ev = _read(sf_dir, "events", columns=["ts", "user_id"])

    def days(b: pd.DataFrame) -> pd.DataFrame:
        # parquet timestamps arrive as datetime64[us]; normalize to ns
        # before the int view or the day quotient is 1000x off
        d = b["ts"].astype("datetime64[ns]").astype("int64") // (86_400 * 10**9)
        out = pd.DataFrame(
            {"user_id": b["user_id"].to_numpy(), "day": d.to_numpy()}
        ).astype({"user_id": "int64", "day": "int64"})
        # shrink the shuffle: one row per (user, day)
        return out.drop_duplicates()

    d = ev.map_batches(days, batch_format="pandas")

    def cells(bucket: pd.DataFrame) -> pd.DataFrame:
        bucket = bucket.drop_duplicates()
        cohort = bucket.groupby("user_id", sort=False)["day"].transform("min")
        w = (bucket["day"].to_numpy() - cohort.to_numpy()) // 7
        cell = pd.DataFrame(
            {
                "cohort_day": cohort.to_numpy(),
                "offset_week": w,
                "user_id": bucket["user_id"].to_numpy(),
            }
        ).drop_duplicates()
        return cell.astype("int64")

    per_cell = bucketed_map_groups(
        d,
        "user_id",
        cells,
        num_buckets=16,
        empty_result=pd.DataFrame(
            {
                "cohort_day": pd.Series(dtype="int64"),
                "offset_week": pd.Series(dtype="int64"),
                "user_id": pd.Series(dtype="int64"),
            }
        ),
    )
    out = grouped_agg(
        per_cell,
        ["cohort_day", "offset_week"],
        {"n_active": ("user_id", "count")},
        final="driver",
    )
    out["n_active"] = out["n_active"].astype("int64")
    return out.sort_values(["cohort_day", "offset_week"]).reset_index(drop=True)


Q_COHORT_RETENTION_SQL = """
WITH d AS MATERIALIZED (
  SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events
), c AS MATERIALIZED (
  SELECT user_id, MIN(day) AS cohort_day FROM d GROUP BY user_id
)
SELECT c.cohort_day, (d.day - c.cohort_day) // 7 AS offset_week,
       COUNT(DISTINCT d.user_id)::BIGINT AS n_active
FROM d JOIN c USING (user_id)
GROUP BY 1, 2
ORDER BY 1, 2
"""

SQL_QUERIES["q_cohort_retention"] = (q_cohort_retention, Q_COHORT_RETENTION_SQL)


def _priority_cents_hist(sf_dir: str) -> ray.data.Dataset:
    """(o_orderpriority, cents) value histogram — the shared sufficient
    statistic for the exact grouped median AND the quantile_disc/IQR
    query (one bucketed count; cardinality bounded by distinct prices)."""
    orders = _read(sf_dir, "orders", columns=["o_orderpriority", "o_totalprice"])

    def pre(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "k": b["o_orderpriority"].to_numpy(),
                "cents": _cents(b["o_totalprice"]),
            }
        )

    return grouped_agg(
        orders.map_batches(pre, batch_format="pandas"),
        ["k", "cents"],
        {"n": ("cents", "count")},
        final="bucketed",
        num_buckets=16,
        empty_result=pd.DataFrame(
            {
                "k": pd.Series(dtype="object"),
                "cents": pd.Series(dtype="int64"),
                "n": pd.Series(dtype="int64"),
            }
        ),
    )


def q_median_order_cents(sf_dir: str) -> pd.DataFrame:
    """EXACT grouped median without a per-key sort of the raw rows: the
    values are integer cents, so the group's value HISTOGRAM (one
    bucketed (key, cents) count — cardinality bounded by distinct prices,
    not row count) is a sufficient statistic, and the median falls out of
    a cumulative-weight search per key. This is the exact-median scale
    path that complements the rank-sketch in ops/quantiles (which is
    approximate but histogram-free); MEDIAN's even-count rule (mean of
    the two middle values, as a double) is reproduced bit-for-bit since
    (a + b) / 2 of int64 cents is exact in ieee754."""
    from ..ops.agg import bucketed_map_groups

    hist = _priority_cents_hist(sf_dir)

    def med(bucket: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for k, g in bucket.groupby("k", sort=False):
            g = g.sort_values("cents")
            vals = g["cents"].to_numpy()
            cum = g["n"].to_numpy().cumsum()
            n = int(cum[-1])
            lo = vals[np.searchsorted(cum, (n + 1) // 2)]
            hi = vals[np.searchsorted(cum, n // 2 + 1)]
            rows.append((k, (int(lo) + int(hi)) / 2.0))
        return pd.DataFrame(rows, columns=["k", "median_cents"]).astype(
            {"median_cents": "float64"}
        )

    out = bucketed_map_groups(
        hist,
        "k",
        med,
        num_buckets=8,
        empty_result=pd.DataFrame(
            {"k": pd.Series(dtype="object"), "median_cents": pd.Series(dtype="float64")}
        ),
    ).to_pandas()
    return (
        out.rename(columns={"k": "o_orderpriority"})
        .sort_values("o_orderpriority")
        .reset_index(drop=True)
    )


Q_MEDIAN_ORDER_CENTS_SQL = """
SELECT o_orderpriority,
       MEDIAN(ROUND(o_totalprice * 100, 0)::BIGINT) AS median_cents
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

SQL_QUERIES["q_median_order_cents"] = (q_median_order_cents, Q_MEDIAN_ORDER_CENTS_SQL)


def q_event_transitions(sf_dir: str) -> pd.DataFrame:
    """Behavior-graph edge extraction (sequence mining): per-user event
    bigrams — each consecutive (event, NEXT event) pair under the
    deterministic (ts, event_id) ordering — counted into a transition
    matrix. This is LEAD() re-expressed as the one-shuffle window engine
    (ops/windows.py:window_over): shift(-1) inside the user's bucket, so
    a user's whole sequence stays co-located and no self-join happens."""
    from ..ops.windows import window_over

    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type"])

    def assign(b: pd.DataFrame, g) -> pd.DataFrame:
        nxt = g["event_type"].shift(-1)
        keep = nxt.notna()
        return pd.DataFrame(
            {
                "from_type": b.loc[keep, "event_type"].to_numpy(),
                "to_type": nxt[keep].to_numpy(),
            }
        )

    pairs = window_over(
        ev,
        key_col="user_id",
        order_cols=["ts", "event_id"],
        assign=assign,
        num_buckets=16,
        empty_result=pd.DataFrame(
            {
                "from_type": pd.Series(dtype="object"),
                "to_type": pd.Series(dtype="object"),
            }
        ),
    )
    out = grouped_agg(
        pairs,
        ["from_type", "to_type"],
        {"n": ("from_type", "count")},
        final="driver",
    )
    out["n"] = out["n"].astype("int64")
    return out.sort_values(["from_type", "to_type"]).reset_index(drop=True)


Q_EVENT_TRANSITIONS_SQL = """
WITH s AS (
  SELECT user_id, event_type,
         LEAD(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS next_type
  FROM events
)
SELECT event_type AS from_type, next_type AS to_type, COUNT(*)::BIGINT AS n
FROM s
WHERE next_type IS NOT NULL
GROUP BY 1, 2
ORDER BY 1, 2
"""

SQL_QUERIES["q_event_transitions"] = (q_event_transitions, Q_EVENT_TRANSITIONS_SQL)


def q_scd2_user_value(sf_dir: str) -> pd.DataFrame:
    """Slowly-changing-dimension (type 2) interval construction from a
    change stream: each user's purchase events become validity intervals
    [valid_from, valid_to) via LEAD(ts) under the same deterministic
    ordering — the standard CDC-log -> dimension-table transform. Open
    (last) intervals are dropped so the result is NULL-free for the hash
    compare; timestamps are compared as exact epoch microseconds."""
    from ..ops.windows import window_over

    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"])

    def assign(b: pd.DataFrame, g) -> pd.DataFrame:
        ts_us = b["ts"].astype("datetime64[ns]").astype("int64") // 1000
        b = b.assign(_ts_us=ts_us)
        nxt = b.groupby("user_id", sort=False)["_ts_us"].shift(-1)
        keep = nxt.notna()
        cents = _cents(b.loc[keep, "value"])
        return pd.DataFrame(
            {
                "user_id": b.loc[keep, "user_id"].to_numpy(),
                "value_cents": cents,
                "valid_from_us": b.loc[keep, "_ts_us"].to_numpy(),
                "valid_to_us": nxt[keep].to_numpy().astype("int64"),
            }
        ).astype({"user_id": "int64"})

    out = window_over(
        ev,
        key_col="user_id",
        order_cols=["ts", "event_id"],
        assign=assign,
        num_buckets=16,
        empty_result=pd.DataFrame(
            {
                "user_id": pd.Series(dtype="int64"),
                "value_cents": pd.Series(dtype="int64"),
                "valid_from_us": pd.Series(dtype="int64"),
                "valid_to_us": pd.Series(dtype="int64"),
            }
        ),
    ).to_pandas()
    return out.sort_values(
        ["user_id", "valid_from_us", "valid_to_us"]
    ).reset_index(drop=True)


Q_SCD2_USER_VALUE_SQL = """
WITH s AS (
  SELECT user_id,
         ROUND(value * 100, 0)::BIGINT AS value_cents,
         epoch_us(ts) AS valid_from_us,
         LEAD(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS valid_to_us
  FROM events
)
SELECT user_id, value_cents, valid_from_us, valid_to_us::BIGINT AS valid_to_us
FROM s
WHERE valid_to_us IS NOT NULL
ORDER BY user_id, valid_from_us, valid_to_us
"""

SQL_QUERIES["q_scd2_user_value"] = (q_scd2_user_value, Q_SCD2_USER_VALUE_SQL)


def q_personalized_pagerank(sf_dir: str) -> pd.DataFrame:
    """Personalized (seed-teleport) integer PageRank — the related-entity
    primitive: relatedness of every customer/supplier node to the
    seed suppliers (s_suppkey % 7 == 1 — scale-proof, unlike a nation
    filter that can be empty at tiny sf), over the same bidirected
    purchase graph as
    q_pagerank. Same fixed-point int64 recurrence (order-independent ⇒
    hash-exact twin via pagerank_sql(seeds_sql=...)); mass and teleport
    restricted to the seed set. The seed list is nation-sized and rides
    to workers as a bounded broadcast."""
    from ..ops.agg import to_pandas_safe
    from ..ops.graph import pagerank

    sup = _read(sf_dir, "supplier", columns=["s_suppkey"])

    seed_df = to_pandas_safe(
        sup.map_batches(
            lambda b: b.loc[b["s_suppkey"] % 7 == 1, ["s_suppkey"]],
            batch_format="pandas",
        ),
        pd.DataFrame({"s_suppkey": pd.Series(dtype="int64")}),
    )
    seeds = [int(x) + 10_000_000 for x in seed_df["s_suppkey"]]
    # driver-sized graph (~26 MB at sf0.1): let the numpy fast path run;
    # q_pagerank keeps the default so the BSP shard-actor path stays
    # exercised in the bench
    out = pagerank(
        _purchase_graph_edges(sf_dir), iters=8, seeds=seeds,
        broadcast_max_edges=4_000_000,
    ).to_pandas()
    return out.sort_values("node").reset_index(drop=True)


Q_PPR_SQL = _pagerank_sql(
    _PURCHASE_EDGES_SQL,
    iters=8,
    seeds_sql="SELECT s_suppkey + 10000000 AS node FROM supplier WHERE s_suppkey % 7 = 1",
)

SQL_QUERIES["q_personalized_pagerank"] = (q_personalized_pagerank, Q_PPR_SQL)


def q_bucketed_join_segments(sf_dir: str) -> pd.DataFrame:
    """Storage-partitioned (bucketed) join: customer and orders are first
    WRITTEN hash-bucketed by custkey (ops/layout.py:write_bucketed — the
    Spark-bucketing / Iceberg layout), then joined bucket-locally with
    ZERO shuffle (bucketed_join: bucket i of one table can only match
    bucket i of the other), then aggregated per market segment. The
    oracle is the plain SQL join — proving the layout path computes the
    identical relation while amortizing the fact-table exchange into the
    ingest write."""
    import shutil
    import tempfile

    from ..ops.layout import bucketed_join, write_bucketed

    nb = 16
    # per-run unique scratch: a fixed path keyed on the sf_dir basename
    # races concurrent runs (bench + sweep) into each other's
    # rmtree/write/read; node-local /tmp is fine in this single-node
    # sandbox, a multi-node run needs shared storage (see bucketed_join)
    base = tempfile.mkdtemp(prefix="ocds_ray_bucketed_")
    cust_dir, ord_dir = f"{base}/customer_{nb}", f"{base}/orders_{nb}"
    write_bucketed(
        _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"]),
        cust_dir,
        "c_custkey",
        num_buckets=nb,
    )
    write_bucketed(
        _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"]),
        ord_dir,
        "o_custkey",
        num_buckets=nb,
    )

    joined = bucketed_join(
        cust_dir,
        ord_dir,
        key_a="c_custkey",
        key_b="o_custkey",
        num_buckets=nb,
        columns_a=["c_custkey", "c_mktsegment"],
        columns_b=["o_custkey", "o_totalprice"],
        empty_result=pd.DataFrame(
            {
                "c_custkey": pd.Series(dtype="int64"),
                "c_mktsegment": pd.Series(dtype="object"),
                "o_custkey": pd.Series(dtype="int64"),
                "o_totalprice": pd.Series(dtype="float64"),
            }
        ),
    )

    def pre(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "c_mktsegment": b["c_mktsegment"].to_numpy(),
                "cents": _cents(b["o_totalprice"]),
            }
        )

    try:
        out = grouped_agg(
            joined,
            ["c_mktsegment"],
            {"n_orders": ("cents", "count"), "sum_cents": ("cents", "sum")},
            pre=pre,
            final="driver",
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)
    out = out.astype({"n_orders": "int64", "sum_cents": "int64"})
    return out.sort_values("c_mktsegment").reset_index(drop=True)


Q_BUCKETED_JOIN_SQL = """
SELECT c_mktsegment,
       COUNT(*)::BIGINT AS n_orders,
       SUM(ROUND(o_totalprice * 100, 0)::BIGINT)::BIGINT AS sum_cents
FROM customer JOIN orders ON o_custkey = c_custkey
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""

SQL_QUERIES["q_bucketed_join_segments"] = (q_bucketed_join_segments, Q_BUCKETED_JOIN_SQL)


def q_range_moving_sum(sf_dir: str) -> pd.DataFrame:
    """TIME-range framed window (RANGE BETWEEN INTERVAL 3 DAY PRECEDING
    AND CURRENT ROW): per event, the same user's value over the trailing
    3 days — the completion of the window family beyond ROWS frames.
    Per user inside the one-shuffle window bucket: prefix sums + two
    binary searches per row (lower bound ts-3d inclusive; upper bound
    'right' so EQUAL-ts peers are included, exactly RANGE's peer rule).
    Integer cents and integer nanosecond bounds keep the twin exact."""
    from ..ops.windows import window_over

    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"])
    three_days_ns = 3 * 86_400 * 10**9

    def assign(b: pd.DataFrame, g) -> pd.DataFrame:
        ts_ns = b["ts"].astype("datetime64[ns]").astype("int64").to_numpy()
        cents = _cents(b["value"])
        out = np.empty(len(b), dtype=np.int64)
        pos = 0
        for _, grp in g:
            k = len(grp)
            t = ts_ns[pos : pos + k]
            c = cents[pos : pos + k]
            cum = np.concatenate([[0], np.cumsum(c)])
            hi = np.searchsorted(t, t, side="right")
            lo = np.searchsorted(t, t - three_days_ns, side="left")
            out[pos : pos + k] = cum[hi] - cum[lo]
            pos += k
        return pd.DataFrame(
            {
                "event_id": b["event_id"].astype("int64"),
                "user_id": b["user_id"].astype("int64"),
                "window_cents": out,
            }
        )

    res = window_over(
        ev,
        key_col="user_id",
        order_cols=["ts", "event_id"],
        assign=assign,
        num_buckets=16,
        empty_result=pd.DataFrame(
            {
                "event_id": pd.Series(dtype="int64"),
                "user_id": pd.Series(dtype="int64"),
                "window_cents": pd.Series(dtype="int64"),
            }
        ),
    ).to_pandas()
    return res.sort_values("event_id").reset_index(drop=True)


Q_RANGE_MOVING_SUM_SQL = """
SELECT event_id, user_id,
       SUM(ROUND(value * 100, 0)::BIGINT) OVER (
         PARTITION BY user_id ORDER BY ts
         RANGE BETWEEN INTERVAL 3 DAY PRECEDING AND CURRENT ROW
       )::BIGINT AS window_cents
FROM events
ORDER BY event_id
"""

SQL_QUERIES["q_range_moving_sum"] = (q_range_moving_sum, Q_RANGE_MOVING_SUM_SQL)


def q_iqr_outliers(sf_dir: str) -> pd.DataFrame:
    """Exact grouped DISCRETE quantiles + IQR outlier counts from the
    same value histogram that powers q_median_order_cents: p25/p75 are
    the sorted-expansion elements at ceil(n*q) - 1 — DuckDB's
    quantile_disc rule (probed across n; it is NOT floor((n-1)*q)) —
    computed as the INTEGER index (n*q_num + q_den - 1) // q_den - 1 so
    no float boundary exists — and the outlier bound
    p75 + (3*(p75-p25)) // 2 stays in int64, so the count is hash-exact.
    One bucketed (key, cents) count; the quantile search and the outlier
    sum both read the histogram, never the rows."""
    from ..ops.agg import bucketed_map_groups

    hist = _priority_cents_hist(sf_dir)

    def iqr(bucket: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for k, g in bucket.groupby("k", sort=False):
            g = g.sort_values("cents")
            vals = g["cents"].to_numpy()
            cnt = g["n"].to_numpy()
            cum = cnt.cumsum()
            n = int(cum[-1])
            p25 = int(vals[np.searchsorted(cum, (n * 1 + 3) // 4)])
            p75 = int(vals[np.searchsorted(cum, (n * 3 + 3) // 4)])
            hi = p75 + (3 * (p75 - p25)) // 2
            n_out = int(cnt[vals > hi].sum())
            rows.append((k, p25, p75, n_out))
        return pd.DataFrame(
            rows, columns=["k", "p25", "p75", "n_outliers"]
        ).astype({"p25": "int64", "p75": "int64", "n_outliers": "int64"})

    out = bucketed_map_groups(
        hist,
        "k",
        iqr,
        num_buckets=8,
        empty_result=pd.DataFrame(
            {
                "k": pd.Series(dtype="object"),
                "p25": pd.Series(dtype="int64"),
                "p75": pd.Series(dtype="int64"),
                "n_outliers": pd.Series(dtype="int64"),
            }
        ),
    ).to_pandas()
    return (
        out.rename(columns={"k": "o_orderpriority"})
        .sort_values("o_orderpriority")
        .reset_index(drop=True)
    )


Q_IQR_OUTLIERS_SQL = """
WITH c AS MATERIALIZED (
  SELECT o_orderpriority AS k, ROUND(o_totalprice * 100, 0)::BIGINT AS cents
  FROM orders
), q AS MATERIALIZED (
  SELECT k,
         quantile_disc(cents, 0.25)::BIGINT AS p25,
         quantile_disc(cents, 0.75)::BIGINT AS p75
  FROM c GROUP BY k
)
SELECT q.k AS o_orderpriority, q.p25, q.p75,
       SUM(CASE WHEN c.cents > q.p75 + (3 * (q.p75 - q.p25)) // 2
                THEN 1 ELSE 0 END)::BIGINT AS n_outliers
FROM c JOIN q USING (k)
GROUP BY q.k, q.p25, q.p75
ORDER BY o_orderpriority
"""

SQL_QUERIES["q_iqr_outliers"] = (q_iqr_outliers, Q_IQR_OUTLIERS_SQL)


def q_gapfill_daily_orders(sf_dir: str) -> pd.DataFrame:
    """Time-series gap filling: the daily order count over the FULL
    calendar span (missing days as explicit zero rows — the
    generate_series + LEFT JOIN idiom) plus the running cumulative count
    across the filled series. The day counts reduce distributed (one
    bucketed groupby); the calendar spine is bounded by the date span,
    not the corpus, so the fill + cumsum is a driver-side reindex by
    design."""
    orders = _read(sf_dir, "orders", columns=["o_orderdate"])

    def pre(b: pd.DataFrame) -> pd.DataFrame:
        d = b["o_orderdate"].astype("datetime64[ns]").astype("int64") // (
            86_400 * 10**9
        )
        return pd.DataFrame({"day": d.to_numpy()})

    counts = grouped_agg(
        orders.map_batches(pre, batch_format="pandas"),
        ["day"],
        {"n_orders": ("day", "count")},
        final="driver",
    )
    if len(counts) == 0 or "day" not in counts.columns:
        return pd.DataFrame(
            {
                "day": pd.Series(dtype="int64"),
                "n_orders": pd.Series(dtype="int64"),
                "cum_orders": pd.Series(dtype="int64"),
            }
        )
    lo, hi = int(counts["day"].min()), int(counts["day"].max())
    spine = pd.DataFrame({"day": np.arange(lo, hi + 1, dtype=np.int64)})
    filled = spine.merge(counts, on="day", how="left")
    filled["n_orders"] = filled["n_orders"].fillna(0).astype("int64")
    filled["cum_orders"] = filled["n_orders"].cumsum().astype("int64")
    return filled.reset_index(drop=True)


Q_GAPFILL_DAILY_SQL = """
WITH c AS MATERIALIZED (
  SELECT epoch_us(o_orderdate) // 86400000000 AS day, COUNT(*)::BIGINT AS n
  FROM orders GROUP BY 1
), spine AS (
  SELECT UNNEST(generate_series((SELECT MIN(day) FROM c),
                                (SELECT MAX(day) FROM c))) AS day
)
SELECT spine.day,
       COALESCE(c.n, 0)::BIGINT AS n_orders,
       SUM(COALESCE(c.n, 0)) OVER (ORDER BY spine.day)::BIGINT AS cum_orders
FROM spine LEFT JOIN c USING (day)
ORDER BY spine.day
"""

SQL_QUERIES["q_gapfill_daily_orders"] = (q_gapfill_daily_orders, Q_GAPFILL_DAILY_SQL)


def q_top_session_paths(sf_dir: str) -> pd.DataFrame:
    """Sequence mining over sessionized streams: the first-3-event-type
    path of every session (30-minute gap rule, same as q_sessions),
    counted corpus-wide — the 'common user journeys' query. The session
    assignment, per-session row numbers, truncation, and '>'-joined path
    all complete inside the ONE user-keyed window bucket; only
    path-cardinality rows (bounded by |event_type|^3) leave it."""
    from ..ops.windows import window_over

    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type"])

    def assign(b: pd.DataFrame, g) -> pd.DataFrame:
        prev = g["ts"].shift()
        # NaT comparison is False -> first event of a user opens session 0,
        # exactly the SQL CASE's ELSE 0 on a NULL LAG
        new_s = ((b["ts"] - prev) > pd.Timedelta(minutes=30)).astype("int64")
        sess = new_s.groupby(b["user_id"], sort=False).cumsum()
        key = [b["user_id"], sess]
        rn = b.groupby(key, sort=False).cumcount()
        kept = b.assign(_sess=sess)[rn < 3]
        paths = (
            kept.groupby(["user_id", "_sess"], sort=False)["event_type"]
            .agg(">".join)
            .reset_index(name="path")
        )
        return paths[["path"]]

    paths = window_over(
        ev,
        key_col="user_id",
        order_cols=["ts", "event_id"],
        assign=assign,
        num_buckets=16,
        empty_result=pd.DataFrame({"path": pd.Series(dtype="object")}),
    )
    out = grouped_agg(
        paths, ["path"], {"n_sessions": ("path", "count")}, final="driver"
    )
    out["n_sessions"] = out["n_sessions"].astype("int64")
    return out.sort_values(
        ["n_sessions", "path"], ascending=[False, True]
    ).reset_index(drop=True)


Q_TOP_SESSION_PATHS_SQL = """
WITH d AS MATERIALIZED (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
              > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
  FROM events
), s AS MATERIALIZED (
  SELECT user_id, event_type, ts, event_id,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS sess
  FROM d
), r AS MATERIALIZED (
  SELECT user_id, sess, event_type, ts, event_id,
         ROW_NUMBER() OVER (PARTITION BY user_id, sess ORDER BY ts, event_id) AS rn
  FROM s
)
SELECT path, COUNT(*)::BIGINT AS n_sessions FROM (
  SELECT user_id, sess, STRING_AGG(event_type, '>' ORDER BY rn) AS path
  FROM r WHERE rn <= 3 GROUP BY user_id, sess
)
GROUP BY path
ORDER BY n_sessions DESC, path
"""

SQL_QUERIES["q_top_session_paths"] = (q_top_session_paths, Q_TOP_SESSION_PATHS_SQL)


def q_revenue_share(sf_dir: str) -> pd.DataFrame:
    """Percent-of-total report (RATIO_TO_REPORT / SUM() OVER ()): each
    market segment's share of total order value. One distributed
    customer-orders join (reusing the bucketed-aggregate shape via a
    broadcast of the customer dim is unnecessary — the hash join is the
    generic path), one small aggregate, then the share divides the SAME
    int64 cents in both engines, so the double compares bitwise."""
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    j = adaptive_hash_join(orders, cust, "inner", on=("o_custkey",), right_on=("c_custkey",))

    def pre(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "c_mktsegment": b["c_mktsegment"].to_numpy(),
                "cents": _cents(b["o_totalprice"]),
            }
        )

    seg = grouped_agg(
        j, ["c_mktsegment"], {"seg_cents": ("cents", "sum")}, pre=pre, final="driver"
    )
    seg["seg_cents"] = seg["seg_cents"].astype("int64")
    total = int(seg["seg_cents"].sum())
    seg["share"] = seg["seg_cents"].to_numpy().astype("float64") / float(total)
    return seg.sort_values("c_mktsegment").reset_index(drop=True)


Q_REVENUE_SHARE_SQL = """
WITH seg AS (
  SELECT c_mktsegment,
         SUM(ROUND(o_totalprice * 100, 0)::BIGINT)::BIGINT AS seg_cents
  FROM orders JOIN customer ON c_custkey = o_custkey
  GROUP BY c_mktsegment
)
SELECT c_mktsegment, seg_cents,
       seg_cents::DOUBLE / (SELECT SUM(seg_cents) FROM seg)::DOUBLE AS share
FROM seg
ORDER BY c_mktsegment
"""

SQL_QUERIES["q_revenue_share"] = (q_revenue_share, Q_REVENUE_SHARE_SQL)


def q_url_frontier_dedup(sf_dir: str) -> pd.DataFrame:
    """Crawl-frontier dedup by CANONICAL URL: normalize (the laundry in
    ops/urls.py — case-fold, default-port drop, fragment strip) and keep
    the earliest doc per normalized URL. Distinct docs genuinely collide
    after normalization (the synthesis repeats every lcm of the variation
    cycles per source), so the first-writer choice is exercised, not
    vacuous. One per-batch argmin pre-shrink + one bucketed argmin on the
    norm key (latest_by_key ascending) — the frontier's 'seen this URL?'
    membership state, as a batch op."""
    from ..ops.agg import latest_by_key

    docs = _read(sf_dir, "documents", columns=["doc_id", "source"])

    def parse(b: pd.DataFrame) -> pd.DataFrame:
        p = _synth_parse_urls(b)
        return pd.DataFrame(
            {"norm": p["norm"].to_numpy(), "doc_id": p["doc_id"].to_numpy()}
        ).astype({"doc_id": "int64"})

    parsed = docs.map_batches(parse, batch_format="pandas")
    first = latest_by_key(
        parsed,
        "norm",
        ["doc_id"],
        ascending=True,
        num_buckets=16,
        empty_result=pd.DataFrame(
            {"norm": pd.Series(dtype="object"), "doc_id": pd.Series(dtype="int64")}
        ),
    ).to_pandas()
    return first.sort_values("norm").reset_index(drop=True)[["norm", "doc_id"]]


Q_URL_FRONTIER_DEDUP_SQL = f"""
WITH urls AS MATERIALIZED ({_SYNTH_URLS_SQL}
), {_url_parse_ctes(keep="doc_id")}
SELECT norm, MIN(doc_id)::BIGINT AS doc_id
FROM n
GROUP BY norm
ORDER BY norm
"""

SQL_QUERIES["q_url_frontier_dedup"] = (q_url_frontier_dedup, Q_URL_FRONTIER_DEDUP_SQL)


def q_source_distinct_hll(sf_dir: str) -> pd.DataFrame:
    """Rows-only (approximate by construction — no exact SQL twin can
    hash-match an estimator): per-source approx distinct document texts
    via the grouped HyperLogLog (ops/sketches.py:approx_count_distinct_by;
    error pytest-bounded <5%, partition-independent). The per-domain
    cardinality profile a 100 TB crawl cannot answer exactly."""
    from ..ops.sketches import approx_count_distinct_by

    docs = _read(sf_dir, "documents", columns=["source", "text"])
    return approx_count_distinct_by(docs, "source", "text", num_buckets=8)


ROWS_ONLY_QUERIES["q_source_distinct_hll"] = q_source_distinct_hll


def q_passage_dedup(sf_dir: str) -> pd.DataFrame:
    """Cross-document duplicated-passage removal (RefinedWeb / Lee et al.
    exact substring dedup, discretized to 16-word windows): every full
    chunk whose text occurs more than once corpus-wide is removed from
    EVERY document, and the cleansed text is reassembled in order. The
    only full-corpus shuffle carries 8-byte chunk hashes; text never
    shuffles on the (default) broadcast branch. Exact twin: DuckDB
    md5_number_lower == ops.textstats._h64 on both sides."""
    from ..ops.passages import dedup_passages

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = dedup_passages(docs).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


Q_PASSAGE_DEDUP_SQL = """
WITH docs AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
spine AS (
  SELECT doc_id, ws, unnest(range(((array_length(ws) + 15) // 16)::BIGINT)) AS j
  FROM docs),
chunks AS (
  SELECT doc_id, j,
         array_to_string(ws[(j * 16 + 1)::INT : (j * 16 + 16)::INT], ' ') AS chunk,
         (array_length(ws) >= (j + 1) * 16) AS is_full
  FROM spine),
dup AS (
  SELECT md5_number_lower(chunk) AS h
  FROM chunks WHERE is_full
  GROUP BY h HAVING COUNT(*) > 1),
marked AS (
  SELECT c.doc_id, c.j, c.chunk,
         (c.is_full AND d.h IS NOT NULL) AS dropped
  FROM chunks c
  LEFT JOIN dup d ON c.is_full AND md5_number_lower(c.chunk) = d.h)
SELECT doc_id,
       COUNT(*)::BIGINT AS n_passages,
       SUM(CASE WHEN dropped THEN 1 ELSE 0 END)::BIGINT AS n_dropped,
       STRING_AGG(CASE WHEN NOT dropped THEN chunk END, ' ' ORDER BY j) AS cleaned_text
FROM marked
GROUP BY doc_id
ORDER BY doc_id
"""

SQL_QUERIES["q_passage_dedup"] = (q_passage_dedup, Q_PASSAGE_DEDUP_SQL)


def q_line_dedup(sf_dir: str) -> pd.DataFrame:
    """CCNet-style cross-corpus LINE dedup (Wenzek et al.): every line
    survives only at its globally FIRST occurrence in (doc_id, position)
    order — the keep-one complement of q_passage_dedup's drop-every-
    occurrence rule. The synthetic corpus has no newlines, so documents
    are deterministically reflowed into consecutive 8-word lines (tail
    partial line INCLUDED — every word belongs to exactly one line),
    mirrored in the twin via the same array-slicing spine. Only
    (line-hash, doc_id, pos) rows shuffle; dropped positions come back
    adaptively (broadcast under 5M losers, else packed int64 blobs
    left-outer hash-joined to the docs)."""
    from ..ops.passages import dedup_lines

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = dedup_lines(docs, words_per_line=8).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


Q_LINE_DEDUP_SQL = """
WITH docs AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
spine AS (
  SELECT doc_id, ws, unnest(range(((array_length(ws) + 7) // 8)::BIGINT)) AS j
  FROM docs),
lines AS (
  SELECT doc_id, j,
         array_to_string(ws[(j * 8 + 1)::INT : (j * 8 + 8)::INT], ' ') AS line
  FROM spine),
ranked AS (
  SELECT doc_id, j, line,
         ROW_NUMBER() OVER (
           PARTITION BY md5_number_lower(line) ORDER BY doc_id, j) AS rn
  FROM lines)
SELECT doc_id,
       STRING_AGG(CASE WHEN rn = 1 THEN line END, chr(10) ORDER BY j) AS clean_text,
       COUNT(*)::BIGINT AS n_lines,
       SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END)::BIGINT AS n_dropped
FROM ranked
GROUP BY doc_id
HAVING COUNT(CASE WHEN rn = 1 THEN 1 END) > 0
ORDER BY doc_id
"""

SQL_QUERIES["q_line_dedup"] = (q_line_dedup, Q_LINE_DEDUP_SQL)


def q_span_dedup(sf_dir: str) -> pd.DataFrame:
    """Sliding-window duplicated-SPAN removal (Lee et al. ExactSubstr at
    word granularity): an 8-word window at EVERY word offset — unlike
    q_passage_dedup's stride-16 chunks, a duplicated run is excised at
    ANY alignment, including spans that straddle chunk boundaries. Every
    word covered by any window whose exact text occurs >1 time
    corpus-wide is removed. Rows: affected documents only, with word
    counts and the excised text. The only full-corpus shuffle carries
    (md5-low64, doc_id, offset) rows; text shuffles zero times on the
    (default) broadcast branch."""
    from ..ops.passages import dedup_spans

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = dedup_spans(docs, window_words=8).to_pandas()
    out = out[out["dup_words"] > 0]
    return out.sort_values("doc_id").reset_index(drop=True)


Q_SPAN_DEDUP_SQL = """
WITH docs AS (
  SELECT doc_id, string_split(text, ' ') AS ws,
         array_length(ws)::BIGINT AS n_words
  FROM documents),
spine AS (
  SELECT doc_id, ws, n_words, unnest(range(1, n_words - 8 + 2)) AS i
  FROM docs WHERE n_words >= 8),
wins AS (
  SELECT doc_id, i,
         md5_number_lower(array_to_string(ws[i::INT : (i + 7)::INT], ' ')) AS h
  FROM spine),
dups AS (SELECT h FROM wins GROUP BY h HAVING COUNT(*) > 1),
cov AS (
  SELECT DISTINCT doc_id, unnest(range(i, i + 8)) AS p
  FROM wins JOIN dups USING (h)),
words AS (
  SELECT doc_id, unnest(ws) AS wd,
         generate_subscripts(ws, 1)::BIGINT AS p
  FROM docs),
kept AS (
  SELECT w.doc_id, STRING_AGG(w.wd, ' ' ORDER BY w.p) AS cleaned_text
  FROM words w LEFT JOIN cov ON w.doc_id = cov.doc_id AND w.p = cov.p
  WHERE cov.p IS NULL
  GROUP BY w.doc_id),
stats AS (SELECT doc_id, COUNT(*)::BIGINT AS dup_words FROM cov GROUP BY doc_id)
SELECT d.doc_id, d.n_words, s.dup_words, k.cleaned_text
FROM docs d
JOIN stats s USING (doc_id)
LEFT JOIN kept k ON d.doc_id = k.doc_id
ORDER BY d.doc_id
"""

SQL_QUERIES["q_span_dedup"] = (q_span_dedup, Q_SPAN_DEDUP_SQL)


def q_semantic_dedup(sf_dir: str) -> pd.DataFrame:
    """SemDeDup (Abbas et al.): fixed-point k-means clusters, then prune
    vectors cosine-similar to a lower-id vector in the same final
    cluster. All-integer arithmetic (squared-threshold cross-multiply,
    tau^2 = 1/5 calibrated to the synthetic embedding geometry) makes an
    ITERATIVE-clustering + similarity pipeline hash-exact vs an unrolled
    DuckDB twin — same discipline as q_kmeans_clusters/q_pagerank."""
    from ..ops.kmeans import label_init_centroids
    from ..ops.semdedup import semantic_dedup

    emb = _read(sf_dir, "embeddings")
    init = label_init_centroids(emb)
    out = semantic_dedup(emb, init, iters=2, tau2_num=1, tau2_den=5).to_pandas()
    return out.sort_values("vec_id").reset_index(drop=True)


Q_SEMANTIC_DEDUP_SQL = """
WITH dims AS (SELECT i FROM range(1, 65) t(i)),
q AS (
  SELECT e.vec_id, e.label, d.i AS d,
         (FLOOR(list_extract(e.embedding, d.i)::DOUBLE * 1000000.0) + 1000000)::BIGINT AS v
  FROM embeddings e, dims d),
c0 AS (
  SELECT label::BIGINT AS cid, d, (SUM(v) // COUNT(*))::BIGINT AS cv
  FROM q GROUP BY label, d),
d1 AS (
  SELECT q.vec_id, c.cid, SUM((q.v - c.cv) * (q.v - c.cv)) AS dist
  FROM q JOIN c0 c USING (d) GROUP BY q.vec_id, c.cid),
a1 AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
    FROM d1) WHERE rn = 1),
c1 AS (
  SELECT a.cid, q.d, (SUM(q.v) // COUNT(*))::BIGINT AS cv
  FROM q JOIN a1 a USING (vec_id) GROUP BY a.cid, q.d),
d2 AS (
  SELECT q.vec_id, c.cid, SUM((q.v - c.cv) * (q.v - c.cv)) AS dist
  FROM q JOIN c1 c USING (d) GROUP BY q.vec_id, c.cid),
a2 AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
    FROM d2) WHERE rn = 1),
c2 AS (
  SELECT a.cid, q.d, (SUM(q.v) // COUNT(*))::BIGINT AS cv
  FROM q JOIN a2 a USING (vec_id) GROUP BY a.cid, q.d),
d3 AS (
  SELECT q.vec_id, c.cid, SUM((q.v - c.cv) * (q.v - c.cv)) AS dist
  FROM q JOIN c2 c USING (d) GROUP BY q.vec_id, c.cid),
a3 AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
    FROM d3) WHERE rn = 1),
qv AS (
  SELECT e.vec_id, d.i AS d,
         FLOOR(list_extract(e.embedding, d.i)::DOUBLE * 1000.0)::BIGINT AS v
  FROM embeddings e, dims d),
nrm AS (SELECT vec_id, SUM(v * v)::BIGINT AS nn FROM qv GROUP BY vec_id),
pairs AS (
  SELECT ai.vec_id AS i, aj.vec_id AS j, SUM(x.v * y.v)::BIGINT AS dot
  FROM a3 ai JOIN a3 aj ON ai.cid = aj.cid AND ai.vec_id < aj.vec_id
  JOIN qv x ON x.vec_id = ai.vec_id
  JOIN qv y ON y.vec_id = aj.vec_id AND y.d = x.d
  GROUP BY ai.vec_id, aj.vec_id),
drops AS (
  SELECT DISTINCT p.j AS vec_id
  FROM pairs p
  JOIN nrm nx ON nx.vec_id = p.i
  JOIN nrm ny ON ny.vec_id = p.j
  WHERE p.dot > 0 AND 5 * p.dot * p.dot > 1 * nx.nn * ny.nn)
SELECT a3.vec_id, a3.cid AS cluster, (dr.vec_id IS NULL) AS kept
FROM a3 LEFT JOIN drops dr ON a3.vec_id = dr.vec_id
ORDER BY a3.vec_id
"""

SQL_QUERIES["q_semantic_dedup"] = (q_semantic_dedup, Q_SEMANTIC_DEDUP_SQL)


def q_bm25_topk(sf_dir: str) -> pd.DataFrame:
    """Integer-BM25 lexical retrieval (ops/retrieval.py): top-10 docs for
    three fixed queries over the documents table — one mixing common
    terms, one anchored on the corpus's rare term ('dup', df ~ 5% of
    docs, so its idf dominates), one 3-term query. Two streaming passes
    (stats partials, then score+local-top-k); the only shuffle is k rows
    per (query, batch). Exact twin: identical floor-div formula in SQL."""
    from ..ops.retrieval import bm25_topk

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = bm25_topk(docs, _BM25_QUERIES, k=10).to_pandas()
    return out.sort_values(["query_id", "rank"]).reset_index(drop=True)


_BM25_QUERIES = {
    0: ["hash", "join"],
    1: ["dup", "scan"],
    2: ["window", "stream", "filter"],
}

Q_BM25_TOPK_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
  FROM documents),
lens AS (SELECT doc_id, COUNT(*)::BIGINT AS len FROM tok GROUP BY doc_id),
stats AS (
  SELECT (SELECT COUNT(*) FROM documents)::BIGINT AS n_docs,
         GREATEST(1, (SELECT COUNT(*) FROM tok)::BIGINT
                     // (SELECT COUNT(*) FROM documents)::BIGINT) AS avgdl),
qt(query_id, term) AS (VALUES
  (0, 'hash'), (0, 'join'),
  (1, 'dup'), (1, 'scan'),
  (2, 'window'), (2, 'stream'), (2, 'filter')),
tf AS (
  SELECT t.doc_id, t.w AS term, COUNT(*)::BIGINT AS tf
  FROM tok t WHERE t.w IN (SELECT term FROM qt)
  GROUP BY t.doc_id, t.w),
df AS (SELECT term, COUNT(*)::BIGINT AS df FROM tf GROUP BY term),
scored AS (
  SELECT q.query_id, f.doc_id,
         SUM( (1000000 - (1000000 * d.df) // s.n_docs)
              * ((1000000 * 22 * f.tf * s.avgdl)
                 // (10 * s.avgdl * f.tf + 3 * s.avgdl + 9 * l.len)) )::BIGINT
           AS score
  FROM qt q
  JOIN tf f ON f.term = q.term
  JOIN df d ON d.term = f.term
  JOIN lens l ON l.doc_id = f.doc_id
  CROSS JOIN stats s
  GROUP BY q.query_id, f.doc_id),
ranked AS (
  SELECT query_id, doc_id, score,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id) AS rank
  FROM scored WHERE score > 0)
SELECT query_id::BIGINT AS query_id, rank::BIGINT AS rank, doc_id, score
FROM ranked WHERE rank <= 10
ORDER BY query_id, rank
"""

SQL_QUERIES["q_bm25_topk"] = (q_bm25_topk, Q_BM25_TOPK_SQL)


def q_gopher_quality(sf_dir: str) -> pd.DataFrame:
    """Gopher document-quality rule battery (Rae et al. A1.1) over the
    documents table — token-count / mean-word-length / symbol-ratio /
    alpha-word / stopword-presence flags, ALL expressed as integer
    comparisons (no float thresholds), one vectorized pyarrow pass
    (ops/textstats.py:gopher_quality_batch). Zero shuffle."""
    from ..ops.textstats import add_gopher_quality

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = add_gopher_quality(docs).to_pandas().drop(columns=["text"])
    return out.sort_values("doc_id").reset_index(drop=True)


Q_GOPHER_QUALITY_SQL = "\nWITH t AS (\n  SELECT doc_id, unnest(regexp_extract_all(text, '[^\t\n\x0b\x0c\r\x1c\x1d\x1e\x1f \x85\xa0\u1680\u2000\u2001\u2002\u2003\u2004\u2005\u2006\u2007\u2008\u2009\u200a\u2028\u2029\u202f\u205f\u3000]+')) AS tok\n  FROM documents),\nts AS (\n  SELECT doc_id, COUNT(*)::BIGINT AS n_tokens,\n         SUM(length(tok))::BIGINT AS sum_token_len,\n         SUM(CASE WHEN regexp_matches(tok, '[a-zA-ZÀ-ɏ]') THEN 1 ELSE 0 END)::BIGINT AS n_alpha\n  FROM t GROUP BY doc_id),\nsw AS (\n  SELECT doc_id, COUNT(DISTINCT lower(w))::BIGINT AS n_sw FROM (\n    SELECT doc_id, unnest(regexp_extract_all(text, '[a-zA-ZÀ-ɏ]+')) AS w\n    FROM documents)\n  WHERE lower(w) IN ('a', 'and', 'as', 'con', 'das', 'de', 'del', 'den', 'der', 'des', 'die', 'du', 'ein', 'el', 'en', 'et', 'for', 'im', 'in', 'is', 'ist', 'la', 'las', 'le', 'les', 'los', 'mit', 'of', 'on', 'para', 'por', 'pour', 'que', 'that', 'the', 'to', 'un', 'und', 'une', 'von', 'with', 'y', 'zu')\n  GROUP BY doc_id),\nbase AS (\n  SELECT d.doc_id,\n         COALESCE(ts.n_tokens, 0) AS n_tokens,\n         COALESCE(ts.sum_token_len, 0) AS sum_token_len,\n         COALESCE(ts.n_alpha, 0) AS n_alpha_tokens,\n         ((length(d.text) - length(replace(d.text, '#', '')))\n          + (length(d.text) - length(replace(d.text, '...', ''))) // 3)::BIGINT\n           AS n_symbol_marks,\n         COALESCE(sw.n_sw, 0) AS n_distinct_stopwords\n  FROM documents d\n  LEFT JOIN ts ON ts.doc_id = d.doc_id\n  LEFT JOIN sw ON sw.doc_id = d.doc_id),\nflags AS (\n  SELECT *,\n         (n_tokens >= 50 AND n_tokens <= 100000) AS ok_token_count,\n         (3 * n_tokens <= sum_token_len AND sum_token_len <= 10 * n_tokens) AS ok_mean_word,\n         (10 * n_symbol_marks < n_tokens) AS ok_symbol_ratio,\n         (5 * n_alpha_tokens > 4 * n_tokens) AS ok_alpha_words,\n         (n_distinct_stopwords >= 2) AS ok_stopwords\n  FROM base)\nSELECT doc_id, n_tokens, sum_token_len, n_alpha_tokens, n_symbol_marks,\n       n_distinct_stopwords, ok_token_count, ok_mean_word, ok_symbol_ratio,\n       ok_alpha_words, ok_stopwords,\n       (ok_token_count AND ok_mean_word AND ok_symbol_ratio\n        AND ok_alpha_words AND ok_stopwords) AS gopher_pass\nFROM flags\nORDER BY doc_id\n"

SQL_QUERIES["q_gopher_quality"] = (q_gopher_quality, Q_GOPHER_QUALITY_SQL)


def q_c4_quality(sf_dir: str) -> pd.DataFrame:
    """C4 cleaning battery (Raffel et al. §2.2, ops/c4.py): terminal-
    punctuation / min-words / 'javascript' line rules + lorem-ipsum /
    curly-brace / min-kept-lines page rules, zero shuffle. The synthetic
    corpus has no punctuation, so the input is punctuated
    DETERMINISTICALLY in BOTH engines (the q_pii_redaction pattern):
    'merge' -> 'merge.' makes the suffix rule live on interior lines,
    and doc_id-keyed suffixes plant lorem/brace/javascript hits so every
    rule fires on a nonempty subset. 8-word reflow lines, min 1 kept."""
    from ..ops.c4 import add_c4_quality

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def plant(b: pd.DataFrame) -> pd.DataFrame:
        did = b["doc_id"].astype("int64")
        t = b["text"].astype(str).str.replace("merge", "merge.", regex=False)
        t = t.to_numpy(dtype=object)
        t = t + np.where((did % 89 == 0).to_numpy(), " lorem ipsum", "")
        t = t + np.where((did % 97 == 0).to_numpy(), " {x}", "")
        t = t + np.where((did % 101 == 0).to_numpy(), " javascript line here ok.", "")
        return pd.DataFrame({"doc_id": did, "text": t})

    out = add_c4_quality(
        docs.map_batches(plant, batch_format="pandas"),
        words_per_line=8,
        min_kept_lines=1,
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


Q_C4_QUALITY_SQL = """
WITH src AS (
  SELECT doc_id,
         replace(text, 'merge', 'merge.')
         || CASE WHEN doc_id % 89 = 0 THEN ' lorem ipsum' ELSE '' END
         || CASE WHEN doc_id % 97 = 0 THEN ' {x}' ELSE '' END
         || CASE WHEN doc_id % 101 = 0 THEN ' javascript line here ok.' ELSE '' END
           AS text
  FROM documents),
docs AS (
  SELECT doc_id, text, string_split(text, ' ') AS ws FROM src),
spine AS (
  SELECT doc_id, unnest(range(((array_length(ws) + 7) // 8)::BIGINT)) AS j, ws
  FROM docs),
lines AS (
  SELECT doc_id, j,
         array_to_string(ws[(j * 8 + 1)::INT : (j * 8 + 8)::INT], ' ') AS line
  FROM spine),
lf AS (
  SELECT doc_id, j, line,
         (substr(line, length(line), 1) IN ('.', '!', '?', '"')
          AND array_length(regexp_extract_all(line, '[^ ]+')) >= 3
          AND NOT contains(lower(line), 'javascript')) AS kept
  FROM lines),
agg AS (
  SELECT doc_id, COUNT(*)::BIGINT AS n_lines,
         SUM(CASE WHEN kept THEN 1 ELSE 0 END)::BIGINT AS n_kept,
         STRING_AGG(CASE WHEN kept THEN line END, chr(10) ORDER BY j) AS kept_text
  FROM lf GROUP BY doc_id),
base AS (
  SELECT d.doc_id, a.n_lines, a.n_kept,
         contains(lower(d.text), 'lorem ipsum') AS has_lorem,
         contains(d.text, '{') AS has_brace,
         a.kept_text
  FROM docs d JOIN agg a USING (doc_id))
SELECT doc_id, n_lines, n_kept, has_lorem, has_brace,
       (NOT has_lorem AND NOT has_brace AND n_kept >= 1) AS c4_pass,
       CASE WHEN NOT has_lorem AND NOT has_brace AND n_kept >= 1
            THEN kept_text END AS clean_text
FROM base ORDER BY doc_id
"""

SQL_QUERIES["q_c4_quality"] = (q_c4_quality, Q_C4_QUALITY_SQL)


def q_text_decompress(sf_dir: str) -> pd.DataFrame:
    """The crawl-body decode seam (ops/codecs.py:decompress_text_column)
    under the driver's eye: each document's text is deterministically
    compressed by doc_id — gzip (mtime=0) / zlib / raw bytes — and
    inflated back through the map-only decode stage; the oracle checks
    the FINAL values (enc tag + inflated char count), so any decode
    corruption breaks the hash. Raw docs whose text happens to start
    with an FCHECK-valid 'x…' also exercise the ambiguous-zlib-magic raw
    fallback. Zero shuffle; the payload column never leaves the stage."""
    import gzip as _gzip
    import zlib as _zlib

    from ..ops.codecs import decompress_text_column

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def pack(b: pd.DataFrame) -> pd.DataFrame:
        payloads = []
        for did, t in zip(b["doc_id"], b["text"]):
            bt = str(t).encode()
            m = did % 3
            payloads.append(
                _gzip.compress(bt, mtime=0)
                if m == 0
                else (_zlib.compress(bt) if m == 1 else bt)
            )
        return pd.DataFrame(
            {"doc_id": b["doc_id"].astype("int64"), "payload": payloads}
        )

    out = decompress_text_column(
        docs.map_batches(pack, batch_format="pandas"), "payload", "text"
    )

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        m = b["doc_id"].to_numpy() % 3
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].astype("int64"),
                "enc": np.where(m == 0, "gzip", np.where(m == 1, "zlib", "raw")),
                "n_chars": b["text"].str.len().astype("int64"),
            }
        )

    res = out.map_batches(finish, batch_format="pandas").to_pandas()
    return res.sort_values("doc_id").reset_index(drop=True)


Q_TEXT_DECOMPRESS_SQL = """
SELECT doc_id,
       CASE doc_id % 3 WHEN 0 THEN 'gzip' WHEN 1 THEN 'zlib' ELSE 'raw' END AS enc,
       length(text)::BIGINT AS n_chars
FROM documents
ORDER BY doc_id
"""

SQL_QUERIES["q_text_decompress"] = (q_text_decompress, Q_TEXT_DECOMPRESS_SQL)


def q_bpe_merges(sf_dir: str) -> pd.DataFrame:
    """BPE tokenizer training over the documents corpus (ops/bpe.py):
    the learned merge table for 24 merges. Rows-only: the merge loop is
    iterative state rewriting with no SQL expression; correctness is
    pinned by a from-scratch reference implementation in pytest
    (test_ops.py::test_bpe_train_matches_reference) plus the total
    (count DESC, pair ASC) determinism order."""
    from ..ops.bpe import bpe_train

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return bpe_train(docs, num_merges=24)


ROWS_ONLY_QUERIES["q_bpe_merges"] = q_bpe_merges


def q_bpe_token_counts(sf_dir: str) -> pd.DataFrame:
    """Train BPE on the corpus, then APPLY it back at corpus scale
    (ops/bpe.py:add_bpe_token_counts) — the tokenize step every training
    run pays before packing. The merge-rank table broadcasts once
    (ray.put), each batch tokenizes DISTINCT words through a per-batch
    memo, and nothing shuffles. Rows-only like q_bpe_merges (BPE has no
    SQL expression); correctness is pinned by the from-scratch
    reference parity + apply tests in test_ops.py."""
    from ..ops.bpe import add_bpe_token_counts, bpe_train

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    merges = bpe_train(docs, num_merges=24)
    out = add_bpe_token_counts(docs, merges).to_pandas()
    out = out[["doc_id", "n_bpe_tokens"]].sort_values("doc_id")
    return out.reset_index(drop=True)


ROWS_ONLY_QUERIES["q_bpe_token_counts"] = q_bpe_token_counts


# --- media near-dup dedup (image / audio / video) ----------------------------
#
# Rows-only by construction: the inputs are binary media payloads (no
# media table exists in the sf dirs, and pHash / spectral landmarks are
# not SQL-expressible), so the driver records the rows-only check while
# the GROUND TRUTH is pinned twice — the planted-pair recall/precision
# assertions below (each query raises if the engine misses a planted
# duplicate or pairs unrelated items) and the robustness pytests
# (test_ops.py phash/audio/video suites).


def _media_dups_ds(modality: str, sf_dir: str) -> ray.data.Dataset:
    """Deterministic planted-dup media table scaled to this sf,
    materialized to parquet ONCE (/tmp cache keyed by modality+size) and
    read back, so the dedup stage consumes a storage-resident
    binary-payload table the way a real crawl run would."""
    import re as _re

    from ..ops.multimodal import synthetic_media_dups

    m = _re.search(r"sf([0-9.]+)", os.path.basename(os.path.normpath(sf_dir or "")))
    try:
        sf = float(m.group(1)) if m else 0.001
    except ValueError:
        sf = 0.001
    from ..state.paths import scratch_path

    # multiple of 4 so row count n + ceil(n/4) inverts exactly to n*4//5
    n_groups = max(12, (int(1200 * sf) // 4) * 4)
    # v2: cache key carries a GENERATOR VERSION — changing
    # synthetic_media_dups' output (e.g. the JPEG/WebP/GIF dup-format
    # cycle) must invalidate a warm scratch cache or the new payloads
    # never actually run under the query
    path = scratch_path(f"media_{modality}_{n_groups}_v2")
    fname = os.path.join(path, "part-0.parquet")
    if not os.path.exists(fname):
        import uuid as _uuid

        os.makedirs(path, exist_ok=True)
        # UNIQUE tmp name: two concurrent builders (sweep + bench at the
        # same sf) must never interleave writes into one tmp file — each
        # writes its own and the os.replace publishes are both-complete
        tmp = os.path.join(path, f".part-0.{os.getpid()}.{_uuid.uuid4().hex}.tmp")
        synthetic_media_dups(modality, n_groups=n_groups).to_parquet(tmp)
        os.replace(tmp, fname)  # atomic: readers never see a half-write
    return ray.data.read_parquet(fname)


def _check_planted_pairs(out: pd.DataFrame, n_groups: int, what: str) -> pd.DataFrame:
    """Planted-truth gate shared by the media trio: every (2g, 2g+1)
    duplicate must be reported and nothing may pair across groups."""
    got = set(zip(out["id_a"], out["id_b"]))
    planted = {(2 * g, 2 * g + 1) for g in range(0, n_groups, 4)}
    missed = planted - got
    false = {(a, b) for a, b in got if (a // 2) != (b // 2)}
    if missed or false:
        raise AssertionError(
            f"{what}: planted-dup ground truth violated "
            f"(missed={sorted(missed)[:5]}, false={sorted(false)[:5]})"
        )
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def q_image_dup_pairs(sf_dir: str) -> pd.DataFrame:
    """Near-duplicate images by 64-bit perceptual hash
    (ops/multimodal.py:phash_dup_pairs): actor-pool BMP/JPEG decode +
    pHash, then the chunk-pigeonhole Hamming engine shared with text
    simhash — pixels never shuffle, only (chunk, id, 8-B hash) rows.
    Planted truth: every 4th image has a JPEG-q85 re-encoded copy."""
    from ..ops.multimodal import phash_dup_pairs

    media = _media_dups_ds("image", sf_dir)
    n_groups = (media.count() * 4) // 5  # n_groups + ceil(n_groups/4) rows
    out = phash_dup_pairs(media, decode="real", concurrency=4).to_pandas()
    return _check_planted_pairs(out, n_groups, "q_image_dup_pairs")


def q_audio_dup_pairs(sf_dir: str) -> pd.DataFrame:
    """Near-duplicate audio by spectral-landmark fingerprints
    (ops/multimodal.py:audio_dup_pairs): actor-pool WAV decode + rfft
    landmarks, then the shared overlap-count engine — clips sharing >= 16
    landmarks pair. Planted truth: every 4th clip has a half-amplitude
    copy (landmarks are amplitude-invariant)."""
    from ..ops.multimodal import audio_dup_pairs

    media = _media_dups_ds("audio", sf_dir)
    n_groups = (media.count() * 4) // 5
    out = audio_dup_pairs(media, decode="real", concurrency=4).to_pandas()
    return _check_planted_pairs(out, n_groups, "q_audio_dup_pairs")


def q_video_dup_pairs(sf_dir: str) -> pd.DataFrame:
    """Near-duplicate videos by per-frame pHash overlap
    (ops/multimodal.py:video_dup_pairs): actor-pool RAWV frame decode,
    pHash every frame, shared overlap-count engine — trimmed copies still
    pair because frame hashes are position-independent keys. Planted
    truth: every 4th clip has a first-two-frames-trimmed copy."""
    from ..ops.multimodal import video_dup_pairs

    media = _media_dups_ds("video", sf_dir)
    n_groups = (media.count() * 4) // 5
    out = video_dup_pairs(
        media, decode="real", min_shared=3, frame_stride=1, concurrency=4
    ).to_pandas()
    return _check_planted_pairs(out, n_groups, "q_video_dup_pairs")


ROWS_ONLY_QUERIES["q_image_dup_pairs"] = q_image_dup_pairs
ROWS_ONLY_QUERIES["q_audio_dup_pairs"] = q_audio_dup_pairs
ROWS_ONLY_QUERIES["q_video_dup_pairs"] = q_video_dup_pairs


def q_ngram_char_fracs(sf_dir: str) -> pd.DataFrame:
    """Gopher repetition signals beyond dup_gram_frac: per doc, the max
    char mass any single repeated word {2,3,4}-gram accounts for and the
    chars covered by duplicated 6-grams (ops/textstats.py:
    ngram_char_stats — see its docstring for the deliberate deviation
    from Rae et al.'s "most frequent" wording). Map-only, zero shuffle;
    ratios divide identical int64 operands in both engines."""
    from ..ops.textstats import add_ngram_char_stats

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = add_ngram_char_stats(docs).to_pandas().drop(columns=["text"])
    return out.sort_values("doc_id").reset_index(drop=True)


Q_NGRAM_CHAR_FRACS_SQL = r"""
WITH w AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-zA-ZÀ-ɏ]+') AS ws
  FROM documents),
chars AS (
  SELECT doc_id,
         COALESCE(list_sum(list_transform(ws, x -> length(x))), 0)::BIGINT
           AS word_chars
  FROM w),
g2 AS (SELECT doc_id, unnest(list_transform(generate_series(1, greatest(len(ws)-1, 0)),
              i -> ws[i] || ' ' || ws[i+1])) AS gram FROM w),
c2 AS (SELECT doc_id, MAX(cnt * gchars)::BIGINT AS top2_chars FROM (
         SELECT doc_id, gram, COUNT(*)::BIGINT AS cnt,
                length(replace(gram, ' ', ''))::BIGINT AS gchars
         FROM g2 GROUP BY doc_id, gram) GROUP BY doc_id),
g3 AS (SELECT doc_id, unnest(list_transform(generate_series(1, greatest(len(ws)-2, 0)),
              i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS gram FROM w),
c3 AS (SELECT doc_id, MAX(cnt * gchars)::BIGINT AS top3_chars FROM (
         SELECT doc_id, gram, COUNT(*)::BIGINT AS cnt,
                length(replace(gram, ' ', ''))::BIGINT AS gchars
         FROM g3 GROUP BY doc_id, gram) GROUP BY doc_id),
g4 AS (SELECT doc_id, unnest(list_transform(generate_series(1, greatest(len(ws)-3, 0)),
              i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3])) AS gram FROM w),
c4 AS (SELECT doc_id, MAX(cnt * gchars)::BIGINT AS top4_chars FROM (
         SELECT doc_id, gram, COUNT(*)::BIGINT AS cnt,
                length(replace(gram, ' ', ''))::BIGINT AS gchars
         FROM g4 GROUP BY doc_id, gram) GROUP BY doc_id),
g6 AS (SELECT doc_id, unnest(list_transform(generate_series(1, greatest(len(ws)-5, 0)),
              i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]
                   || ' ' || ws[i+4] || ' ' || ws[i+5])) AS gram FROM w),
c6 AS (SELECT doc_id, SUM(CASE WHEN cnt >= 2 THEN cnt * gchars ELSE 0 END)::BIGINT
              AS dup6_chars FROM (
         SELECT doc_id, gram, COUNT(*)::BIGINT AS cnt,
                length(replace(gram, ' ', ''))::BIGINT AS gchars
         FROM g6 GROUP BY doc_id, gram) GROUP BY doc_id)
SELECT d.doc_id, ch.word_chars,
       COALESCE(c2.top2_chars, 0) AS top2_chars,
       COALESCE(c3.top3_chars, 0) AS top3_chars,
       COALESCE(c4.top4_chars, 0) AS top4_chars,
       COALESCE(c6.dup6_chars, 0) AS dup6_chars,
       CASE WHEN ch.word_chars = 0 THEN 0.0
            ELSE COALESCE(c2.top2_chars, 0) / ch.word_chars END AS top2_frac,
       CASE WHEN ch.word_chars = 0 THEN 0.0
            ELSE COALESCE(c3.top3_chars, 0) / ch.word_chars END AS top3_frac,
       CASE WHEN ch.word_chars = 0 THEN 0.0
            ELSE COALESCE(c4.top4_chars, 0) / ch.word_chars END AS top4_frac,
       CASE WHEN ch.word_chars = 0 THEN 0.0
            ELSE COALESCE(c6.dup6_chars, 0) / ch.word_chars END AS dup6_frac
FROM documents d
JOIN chars ch ON ch.doc_id = d.doc_id
LEFT JOIN c2 ON c2.doc_id = d.doc_id
LEFT JOIN c3 ON c3.doc_id = d.doc_id
LEFT JOIN c4 ON c4.doc_id = d.doc_id
LEFT JOIN c6 ON c6.doc_id = d.doc_id
ORDER BY d.doc_id
"""

SQL_QUERIES["q_ngram_char_fracs"] = (q_ngram_char_fracs, Q_NGRAM_CHAR_FRACS_SQL)
