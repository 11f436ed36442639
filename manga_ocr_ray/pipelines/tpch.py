"""Round-4 TPC-H-shaped relational wave over the driver tables.

Seven classic decision-support shapes the engine had not yet exercised,
each adapted to the columns the driver tables actually carry (no
``partsupp``, ``l_shipmode`` or ``c_phone`` here) and each with an exact
DuckDB oracle in ``__ray_entry__.oracle_sql()``:

- Q6  single-table predicate aggregate (revenue forecast)
- Q4  EXISTS semi-join with a per-order correlated date predicate
- Q10 returned-item revenue: 4-table join + top-k
- Q14 promo-revenue share: conditional aggregate over a dim join
- Q15 top supplier: global-argmax-with-ties subquery shape
- Q18 large-volume orders: HAVING subquery applied back to the join
- Q22 idle customers: global-scalar subquery + anti-join

Money math follows relational.py's exact-int64-cents convention (float Sum
across distributed blocks is order-nondeterministic); joins follow the
cardinality-switch convention (broadcast under ``_broadcast_max_rows``,
hash join with cardinality-sized partitions above).  Reference provenance:
these generalize the reference's filter→aggregate verification passes
(/root/reference/manga_ocr_dev/synthetic_data_generator/utils.py style
per-group sanity stats) into full decision-support operators.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Sum

from .relational import _broadcast_max_rows, _cents, _join_partitions, _pq


# ---- Q6: single-table predicate aggregate ------------------------------------

def q6_forecast_revenue(sf_dir: str) -> pd.DataFrame:
    """Revenue increase from eliminating small discounts in 1996: one pruned
    read, one vectorized filter, one exact-int global sum — the minimal
    streaming aggregate (no shuffle at any scale)."""
    lo, hi = pd.Timestamp("1996-01-01"), pd.Timestamp("1997-01-01")
    li = rd.read_parquet(_pq(sf_dir, "lineitem"),
                         columns=["l_shipdate", "l_discount",
                                  "l_quantity", "l_extendedprice"])

    def rev(t: pa.Table) -> pa.Table:
        disc_c = _cents(t["l_discount"])
        keep = pc.and_(
            pc.and_(pc.greater_equal(t["l_shipdate"], pa.scalar(lo)),
                    pc.less(t["l_shipdate"], pa.scalar(hi))),
            pc.and_(pc.and_(pc.greater_equal(disc_c, pa.scalar(5, pa.int64())),
                            pc.less_equal(disc_c, pa.scalar(7, pa.int64()))),
                    pc.less(t["l_quantity"], pa.scalar(24.0))))
        t2 = t.filter(keep)
        r = pc.multiply(_cents(t2["l_extendedprice"]), _cents(t2["l_discount"]))
        return pa.table({"rev_e4": r})

    total = li.map_batches(rev, batch_format="pyarrow").sum("rev_e4")
    return pd.DataFrame({"revenue": [float(total or 0) / 10000.0]})


Q6_FORECAST_REVENUE_SQL = """
SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * CAST(round(l_discount * 100) AS BIGINT)) AS DOUBLE)
         / 10000.0 AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
  AND l_quantity < 24
"""


# ---- Q4: EXISTS semi-join with a correlated date predicate -------------------

def q4_order_priority(sf_dir: str) -> rd.Dataset:
    """Orders per priority in 1996Q3 where at least one line item shipped
    after the order date (TPC-H Q4's EXISTS shape, adapted to the carried
    columns).  The correlated predicate ``l_shipdate > o_orderdate``
    decomposes into ``max(l_shipdate) per order > o_orderdate``; the
    per-order max is computed AFTER pruning lineitem to the quarter's
    orders, so the combining groupby runs over ~1/28 of the fact table:

    - orders pruned to the quarter at the read → (orderkey, odate, prio);
    - hash join lineitem ⋈ pruned orders on orderkey (partitions from
      ``_join_partitions``) — the semi-join prune;
    - per-order Max(l_shipdate) via combining groupby, predicate applied
      map-side, then one tiny groupby(priority) count.
    """
    lo, hi = pd.Timestamp("1996-07-01"), pd.Timestamp("1996-10-01")
    orders = rd.read_parquet(_pq(sf_dir, "orders"),
                             columns=["o_orderkey", "o_orderdate",
                                      "o_orderpriority"])
    orders = orders.map_batches(
        lambda t: t.filter(pc.and_(
            pc.greater_equal(t["o_orderdate"], pa.scalar(lo)),
            pc.less(t["o_orderdate"], pa.scalar(hi)))),
        batch_format="pyarrow")
    li = rd.read_parquet(_pq(sf_dir, "lineitem"),
                         columns=["l_orderkey", "l_shipdate"])
    n = _join_partitions()
    j = li.join(orders, join_type="inner", num_partitions=n,
                on=("l_orderkey",), right_on=("o_orderkey",))

    def as_i64(t: pa.Table) -> pa.Table:
        # timestamps → int64 µs so the combining Max aggregate applies;
        # o_orderpriority is constant per order, so it rides in the KEY
        # (doesn't change the groups, avoids a second groupby+join)
        return pa.table({
            "l_orderkey": t["l_orderkey"],
            "o_orderpriority": t["o_orderpriority"],
            "ship_us": pc.cast(t["l_shipdate"], pa.int64()),
            "odate_us": pc.cast(t["o_orderdate"], pa.int64())})

    per_order = j.map_batches(as_i64, batch_format="pyarrow") \
        .groupby(["l_orderkey", "o_orderpriority"]).aggregate(
            Max("ship_us", alias_name="max_ship"),
            Max("odate_us", alias_name="odate"))
    matched = per_order.map_batches(
        lambda t: t.filter(pc.greater(t["max_ship"], t["odate"]))
                   .select(["o_orderpriority"]),
        batch_format="pyarrow")
    return matched.groupby("o_orderpriority").aggregate(
        Count(alias_name="order_count")) \
        .sort("o_orderpriority")


Q4_ORDER_PRIORITY_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01'
  AND o_orderdate <  TIMESTAMP '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# ---- Q10: returned-item revenue report ----------------------------------------

def q10_returned_items(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """Top-k customers by revenue lost to returns in 1996Q1 — 4-table join
    (lineitem ⋈ orders ⋈ customer ⋈ nation) with the revenue aggregate
    keyed on the customer.  Plan: returned lineitems join quarter orders on
    orderkey (both pruned at the read), per-customer exact-cents sum via
    combining groupby, THEN the small top-k result joins customer/nation —
    dimensions meet the aggregate (k rows), never the fact stream."""
    lo, hi = pd.Timestamp("1996-01-01"), pd.Timestamp("1996-04-01")
    orders = rd.read_parquet(_pq(sf_dir, "orders"),
                             columns=["o_orderkey", "o_custkey", "o_orderdate"])
    orders = orders.map_batches(
        lambda t: t.filter(pc.and_(
            pc.greater_equal(t["o_orderdate"], pa.scalar(lo)),
            pc.less(t["o_orderdate"], pa.scalar(hi))))
                   .select(["o_orderkey", "o_custkey"]),
        batch_format="pyarrow")

    li = rd.read_parquet(_pq(sf_dir, "lineitem"),
                         columns=["l_orderkey", "l_returnflag",
                                  "l_extendedprice", "l_discount"])

    def returned(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["l_returnflag"], "R"))
        r = pc.multiply(_cents(t["l_extendedprice"]),
                        pc.subtract(pa.scalar(100, pa.int64()),
                                    _cents(t["l_discount"])))
        return pa.table({"l_orderkey": t["l_orderkey"], "rev_e4": r})

    li = li.map_batches(returned, batch_format="pyarrow")

    # The quarter's (orderkey → custkey) slice is selective but unbounded
    # (grows with the corpus) → cardinality switch: broadcast map + per-
    # batch partial custkey sums + driver top-k when it fits, else the
    # hash-join + distributed groupby + sort plan.
    from .relational import _broadcast_max_rows

    qorders = orders.materialize()
    if qorders.count() <= _broadcast_max_rows():
        om = qorders.to_pandas().set_index("o_orderkey")["o_custkey"]
        om_ref = ray.put(om)

        def psum(b: pd.DataFrame) -> pd.DataFrame:
            cust = b["l_orderkey"].map(ray.get(om_ref))
            keep = cust.notna()
            g = pd.DataFrame({"o_custkey": cust[keep].astype(np.int64),
                              "rev_e4": b.loc[keep, "rev_e4"]}) \
                .groupby("o_custkey", sort=False)["rev_e4"].sum()
            return pd.DataFrame({"o_custkey": g.index.to_numpy(np.int64),
                                 "rev_e4": g.to_numpy(np.int64)})

        partials = li.map_batches(psum, batch_format="pandas").to_pandas()
        per = partials.groupby("o_custkey", sort=False)["rev_e4"].sum() \
                      .reset_index()
        top = per.sort_values(["rev_e4", "o_custkey"],
                              ascending=[False, True]).head(k) \
                 .reset_index(drop=True)
    else:
        n = _join_partitions()
        j = li.join(qorders, join_type="inner", num_partitions=n,
                    on=("l_orderkey",), right_on=("o_orderkey",))
        per_cust = j.groupby("o_custkey").aggregate(
            Sum("rev_e4", alias_name="rev_e4"))
        # the per-customer aggregate is customer-cardinality (~1e9 at
        # 100 TB) — top-k comes off a distributed sort + limit, never a
        # driver to_pandas
        top = per_cust.sort(["rev_e4", "o_custkey"],
                            descending=[True, False]).limit(k).to_pandas()
    top["revenue"] = top["rev_e4"].astype(np.float64) / 10000.0
    cust = pd.read_parquet(_pq(sf_dir, "customer"),
                           columns=["c_custkey", "c_name", "c_acctbal",
                                    "c_nationkey"])
    nation = pd.read_parquet(_pq(sf_dir, "nation"),
                             columns=["n_nationkey", "n_name"])
    out = top.merge(cust, left_on="o_custkey", right_on="c_custkey") \
             .merge(nation, left_on="c_nationkey", right_on="n_nationkey")
    return out[["c_custkey", "c_name", "revenue", "c_acctbal", "n_name"]] \
        .sort_values(["revenue", "c_custkey"],
                     ascending=[False, True]).reset_index(drop=True)


Q10_RETURNED_ITEMS_SQL = """
SELECT c_custkey, c_name,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE)
         / 10000.0 AS revenue,
       c_acctbal, n_name
FROM customer JOIN orders   ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
              JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1996-04-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# ---- Q14: promo-revenue share --------------------------------------------------

def q14_promo_effect(sf_dir: str) -> pd.DataFrame:
    """Share of 1996-06 revenue from PROMO parts — a conditional aggregate
    over a fact ⋈ dim join.  The dim side (partkey → is_promo, one bit)
    goes through the cardinality switch: broadcast as a packed bool lookup
    under ``_broadcast_max_rows`` (10 TB-scale part is ~2e8 rows → 25 MB of
    bits, still broadcastable; the switch covers beyond), else a hash join
    on partkey."""
    lo, hi = pd.Timestamp("1996-06-01"), pd.Timestamp("1996-07-01")
    li = rd.read_parquet(_pq(sf_dir, "lineitem"),
                         columns=["l_partkey", "l_shipdate",
                                  "l_extendedprice", "l_discount"])

    def month_rev(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.greater_equal(t["l_shipdate"], pa.scalar(lo)),
                             pc.less(t["l_shipdate"], pa.scalar(hi))))
        r = pc.multiply(_cents(t["l_extendedprice"]),
                        pc.subtract(pa.scalar(100, pa.int64()),
                                    _cents(t["l_discount"])))
        return pa.table({"l_partkey": t["l_partkey"], "rev_e4": r})

    li = li.map_batches(month_rev, batch_format="pyarrow")

    part_ds = rd.read_parquet(_pq(sf_dir, "part"),
                              columns=["p_partkey", "p_type"])
    if part_ds.count() <= _broadcast_max_rows():
        part = part_ds.to_pandas()
        lut = np.zeros(int(part["p_partkey"].max()) + 1, dtype=bool)
        lut[part.loc[part["p_type"].str.startswith("PROMO"),
                     "p_partkey"].to_numpy()] = True
        ref = ray.put(lut)

        class PromoSplit:
            def __init__(self, r):
                self.lut = ray.get(r)

            def __call__(self, t: pa.Table) -> pa.Table:
                promo = self.lut[t["l_partkey"].combine_chunks().to_numpy()]
                rev = t["rev_e4"].combine_chunks().to_numpy()
                return pa.table({
                    "promo_e4": pa.array([int(rev[promo].sum())], pa.int64()),
                    "total_e4": pa.array([int(rev.sum())], pa.int64())})

        partial = li.map_batches(PromoSplit, fn_constructor_args=(ref,),
                                 batch_format="pyarrow", concurrency=(1, 8))
    else:
        j = li.join(part_ds, join_type="inner",
                    num_partitions=_join_partitions(),
                    on=("l_partkey",), right_on=("p_partkey",))

        def split(t: pa.Table) -> pa.Table:
            promo = pc.starts_with(t["p_type"], "PROMO").combine_chunks() \
                      .to_numpy(zero_copy_only=False)
            rev = t["rev_e4"].combine_chunks().to_numpy()
            return pa.table({
                "promo_e4": pa.array([int(rev[promo].sum())], pa.int64()),
                "total_e4": pa.array([int(rev.sum())], pa.int64())})

        partial = j.map_batches(split, batch_format="pyarrow")
    promo = partial.sum("promo_e4") or 0
    total = partial.sum("total_e4") or 0
    return pd.DataFrame(
        {"promo_revenue": [100.0 * float(promo) / float(total or 1)]})


Q14_PROMO_EFFECT_SQL = """
WITH m AS (
  SELECT p_type,
         CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev_e4
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1996-06-01'
    AND l_shipdate <  TIMESTAMP '1996-07-01')
SELECT 100.0 * CAST(sum(CASE WHEN p_type LIKE 'PROMO%' THEN rev_e4 ELSE 0 END)
                    AS DOUBLE)
             / CAST(sum(rev_e4) AS DOUBLE) AS promo_revenue
FROM m
"""


# ---- Q15: top supplier (global argmax with ties) -------------------------------

def q15_top_supplier(sf_dir: str) -> pd.DataFrame:
    """Supplier(s) with the maximum 1996Q1 revenue — the scalar-subquery
    argmax shape.  Per-supplier exact-cents revenue via combining groupby;
    the global max is one tiny aggregate over that (supplier-cardinality)
    table, and the equality filter keeps ALL tied suppliers (ties are exact
    int comparisons, not float).  The dimension join for s_name happens on
    the argmax rows only."""
    lo, hi = pd.Timestamp("1996-01-01"), pd.Timestamp("1996-04-01")
    li = rd.read_parquet(_pq(sf_dir, "lineitem"),
                         columns=["l_suppkey", "l_shipdate",
                                  "l_extendedprice", "l_discount"])

    def rev(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.greater_equal(t["l_shipdate"], pa.scalar(lo)),
                             pc.less(t["l_shipdate"], pa.scalar(hi))))
        r = pc.multiply(_cents(t["l_extendedprice"]),
                        pc.subtract(pa.scalar(100, pa.int64()),
                                    _cents(t["l_discount"])))
        return pa.table({"l_suppkey": t["l_suppkey"], "rev_e4": r})

    per_supp = li.map_batches(rev, batch_format="pyarrow") \
                 .groupby("l_suppkey").aggregate(Sum("rev_e4", alias_name="rev_e4"))
    best = per_supp.max("rev_e4")
    winners = per_supp.map_batches(
        lambda t: t.filter(pc.equal(t["rev_e4"], pa.scalar(best, pa.int64()))),
        batch_format="pyarrow").to_pandas()
    sup = pd.read_parquet(_pq(sf_dir, "supplier"),
                          columns=["s_suppkey", "s_name"])
    out = winners.merge(sup, left_on="l_suppkey", right_on="s_suppkey")
    out["total_revenue"] = out["rev_e4"].astype(np.float64) / 10000.0
    return out[["s_suppkey", "s_name", "total_revenue"]] \
        .sort_values("s_suppkey").reset_index(drop=True)


Q15_TOP_SUPPLIER_SQL = """
WITH r AS (
  SELECT l_suppkey,
         sum(CAST(round(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS rev_e4
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, CAST(rev_e4 AS DOUBLE) / 10000.0 AS total_revenue
FROM r JOIN supplier ON l_suppkey = s_suppkey
WHERE rev_e4 = (SELECT max(rev_e4) FROM r)
ORDER BY s_suppkey
"""


# ---- Q18: large-volume orders ---------------------------------------------------

def q18_large_orders(sf_dir: str, min_qty: float = 300.0) -> pd.DataFrame:
    """Orders whose total quantity exceeds ``min_qty`` with the ordering
    customer — TPC-H Q18's HAVING-subquery shape.  The per-order quantity
    sum (combining groupby over the fact table, exact cents) is the filter
    AND the output measure; only the tiny surviving set joins orders ⋈
    customer.  At 100 TB the surviving set is ~1e-4 of orders — the
    dimension joins never see the fact stream."""
    li = rd.read_parquet(_pq(sf_dir, "lineitem"),
                         columns=["l_orderkey", "l_quantity"])
    per_order = li.map_batches(
        lambda t: pa.table({"l_orderkey": t["l_orderkey"],
                            "qty_c": _cents(t["l_quantity"])}),
        batch_format="pyarrow") \
        .groupby("l_orderkey").aggregate(Sum("qty_c", alias_name="qty_c"))
    thr = int(round(min_qty * 100))
    big = per_order.map_batches(
        lambda t: t.filter(pc.greater(t["qty_c"], pa.scalar(thr, pa.int64()))),
        batch_format="pyarrow").to_pandas()
    if not len(big):
        return pd.DataFrame(columns=["c_name", "c_custkey", "o_orderkey",
                                     "o_orderdate", "o_totalprice", "sum_qty"])
    # survivors are ~1e-4 of orders → broadcast their key sets and prune the
    # dimension reads MAP-SIDE; the final merges run on the tiny survivors,
    # never on full orders/customer (fact-sized at 100 TB)
    okeys = ray.put(pa.array(big["l_orderkey"].to_numpy(np.int64)))

    class KeyPrune:
        def __init__(self, ref, col):
            self.keys, self.col = ray.get(ref), col

        def __call__(self, t: pa.Table) -> pa.Table:
            return t.filter(pc.is_in(pc.cast(t[self.col], pa.int64()),
                                     value_set=self.keys))

    orders = rd.read_parquet(
        _pq(sf_dir, "orders"),
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]) \
        .map_batches(KeyPrune, fn_constructor_args=(okeys, "o_orderkey"),
                     batch_format="pyarrow", concurrency=(1, 8)).to_pandas()
    ckeys = ray.put(pa.array(orders["o_custkey"].to_numpy(np.int64)))
    cust = rd.read_parquet(_pq(sf_dir, "customer"),
                           columns=["c_custkey", "c_name"]) \
        .map_batches(KeyPrune, fn_constructor_args=(ckeys, "c_custkey"),
                     batch_format="pyarrow", concurrency=(1, 8)).to_pandas()
    out = big.merge(orders, left_on="l_orderkey", right_on="o_orderkey") \
             .merge(cust, left_on="o_custkey", right_on="c_custkey")
    out["sum_qty"] = out["qty_c"].astype(np.float64) / 100.0
    return out[["c_name", "c_custkey", "o_orderkey", "o_orderdate",
                "o_totalprice", "sum_qty"]] \
        .sort_values(["o_totalprice", "o_orderkey"],
                     ascending=[False, True]).reset_index(drop=True)


Q18_LARGE_ORDERS_SQL = """
WITH big AS (
  SELECT l_orderkey, sum(CAST(round(l_quantity * 100) AS BIGINT)) AS qty_c
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(CAST(round(l_quantity * 100) AS BIGINT)) > 30000)
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       CAST(qty_c AS DOUBLE) / 100.0 AS sum_qty
FROM big JOIN orders   ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey
"""


# ---- Q22: idle rich customers ---------------------------------------------------

def q22_idle_customers(sf_dir: str) -> rd.Dataset | pd.DataFrame:
    """Per-nation count and balance of customers richer than the global
    positive-balance average with no RECENT (1999+) orders — TPC-H Q22's
    shape (global scalar subquery + anti-join), grouped by nation instead
    of the phone prefix the tables don't carry; "never ordered" is vacuous
    in this corpus (every customer orders), so the anti-join side is the
    recent-order set, like Q22's real intent.

    - the scalar threshold is one streaming Mean over positive balances
      (exact enough: a single float, compared identically in the oracle);
    - the anti-join reuses the left_anti hash join on custkey
      (relational.q_customers_no_orders's plan) — partitions from
      ``_join_partitions``;
    - nation names broadcast (25 rows).
    """
    recent_lo = pd.Timestamp("1999-01-01")
    cust = rd.read_parquet(_pq(sf_dir, "customer"),
                           columns=["c_custkey", "c_acctbal", "c_nationkey"])
    pos = cust.map_batches(
        lambda t: t.filter(pc.greater(t["c_acctbal"], pa.scalar(0.0))),
        batch_format="pyarrow")
    thr = float(pos.mean("c_acctbal"))
    rich = cust.map_batches(
        lambda t: t.filter(pc.greater(t["c_acctbal"], pa.scalar(thr))),
        batch_format="pyarrow")
    orders = rd.read_parquet(_pq(sf_dir, "orders"),
                             columns=["o_custkey", "o_orderdate"])
    recent = orders.map_batches(
        lambda t: t.filter(pc.greater_equal(t["o_orderdate"],
                                            pa.scalar(recent_lo)))
                   .select(["o_custkey"]),
        batch_format="pyarrow")
    idle = rich.join(recent.groupby("o_custkey").aggregate(Count(alias_name="_n")),
                     join_type="left_anti", num_partitions=_join_partitions(),
                     on=("c_custkey",), right_on=("o_custkey",)) \
               .materialize()
    if idle.count() == 0:
        # schema-stable empty result (an empty groupby drops column names)
        return pd.DataFrame({"n_name": pd.Series([], dtype=object),
                             "numcust": pd.Series([], dtype=np.int64),
                             "totacctbal": pd.Series([], dtype=np.float64)})
    nation = pd.read_parquet(_pq(sf_dir, "nation"),
                             columns=["n_nationkey", "n_name"])
    names = dict(zip(nation["n_nationkey"].astype(int), nation["n_name"]))

    def per_nation(t: pa.Table) -> pa.Table:
        nk = pc.cast(t["c_nationkey"], pa.int64()).combine_chunks().to_numpy()
        nm = pd.Series(nk).map(names).to_numpy(dtype=object)
        return pa.table({"n_name": pa.array(nm, pa.string()),
                         "bal_c": _cents(t["c_acctbal"])})

    per = idle.map_batches(per_nation, batch_format="pyarrow") \
              .groupby("n_name").aggregate(Count(alias_name="numcust"),
                                           Sum("bal_c", alias_name="bal_c"))
    return per.map_batches(
        lambda t: pa.table({
            "n_name": t["n_name"],
            "numcust": t["numcust"],
            "totacctbal": pc.divide(pc.cast(t["bal_c"], pa.float64()),
                                    pa.scalar(100.0))}),
        batch_format="pyarrow").sort("n_name")


Q22_IDLE_CUSTOMERS_SQL = """
WITH thr AS (SELECT avg(c_acctbal) AS a FROM customer WHERE c_acctbal > 0)
SELECT n_name, count(*) AS numcust,
       CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100.0
         AS totacctbal
FROM customer JOIN nation ON c_nationkey = n_nationkey
WHERE c_acctbal > (SELECT a FROM thr)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY n_name
ORDER BY n_name
"""
