"""TPC-H completion wave: the ten decision-support shapes `tpch.py` left
out, adapted to the driver schema (no ``partsupp`` table, no
commit/receipt dates, no shipmode/container/comment columns — the
part↔supplier association runs through ``lineitem`` and date arithmetic
uses ``l_shipdate`` vs ``o_orderdate``).  Every query keeps its canonical
SHAPE — the joins, correlations and subquery structure that make each Q a
distinct optimizer exercise — and carries an exact DuckDB oracle:

- Q2  per-group argmin-with-ties over a dim-filtered association
- Q8  market-share: two-level conditional aggregate over a 6-table join
- Q9  profit by (nation, year) over part-name containment
- Q11 scalar-subquery threshold over per-part value sums
- Q12 late-shipment two-bucket conditional counts (shipdate vs orderdate)
- Q13 customer order-count distribution incl. the zero bucket
- Q16 count-distinct suppliers per part attribute triple with exclusions
- Q19 three-branch disjunctive predicate revenue
- Q20 suppliers providing >50% of a part's annual volume (semi-join chain)
- Q21 sole-latest-supplier on multi-supplier finished orders

Money math is exact int64 cents (the relational.py convention); every
small side goes through the shared cardinality switch
(``_broadcast_max_rows``): broadcast + map-side lookup below, hash join /
distributed groupby above, so the same code is the 100-TB plan.
Reference provenance: generalizes the reference's per-group verification
aggregates (manga_ocr_dev/synthetic_data_generator/utils.py) the same way
as pipelines/tpch.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum

from .relational import (_broadcast_max_rows, _cents, _join_partitions,
                         _pq, _shard_by_int)


def _li(sf_dir: str, cols: list[str]) -> rd.Dataset:
    return rd.read_parquet(_pq(sf_dir, "lineitem"), columns=cols)


def _pdf(partials: rd.Dataset, cols: list[str]) -> pd.DataFrame:
    """to_pandas() that keeps the schema when the Dataset is empty (an
    empty Ray->pandas frame has no columns, which breaks groupby)."""
    df = partials.to_pandas()
    if df.empty:
        df = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    return df


def _switch_combine_sum(partials: rd.Dataset, key: str,
                        val: str) -> pd.DataFrame | None:
    """Driver-combine per-key partial sums when broadcast-small, else None
    (caller falls back to a distributed groupby over the partials)."""
    if partials.count() <= _broadcast_max_rows():
        return _pdf(partials, [key, val]).groupby(key, sort=False)[val] \
            .sum().reset_index()
    return None


# ---- Q12 (adapted): late-shipment priority buckets ---------------------------

def q12_late_shipments(sf_dir: str, days: int = 90) -> pd.DataFrame:
    """Canonical Q12 shape — a fact⋈dim join feeding TWO conditional counts
    per group: lines shipped more than ``days`` after the order date,
    bucketed by line status, split into high-priority (1-URGENT/2-HIGH)
    and low-priority order counts.  The order side (orderkey → orderdate,
    priority-class bit) goes through the cardinality switch."""
    orders = rd.read_parquet(
        _pq(sf_dir, "orders"),
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"])

    def omap(t: pa.Table) -> pa.Table:
        hi = pc.is_in(t["o_orderpriority"],
                      value_set=pa.array(["1-URGENT", "2-HIGH"]))
        return pa.table({
            "o_orderkey": t["o_orderkey"],
            "odate": pc.cast(pc.cast(t["o_orderdate"], pa.date32()),
                             pa.int32()),
            "high": pc.cast(hi, pa.int8())})

    om = orders.map_batches(omap, batch_format="pyarrow").materialize()
    li = _li(sf_dir, ["l_orderkey", "l_linestatus", "l_shipdate"])

    if om.count() <= _broadcast_max_rows():
        op = om.to_pandas().set_index("o_orderkey")
        od_ref = ray.put(op["odate"])
        hi_ref = ray.put(op["high"])

        def psum(b: pd.DataFrame) -> pd.DataFrame:
            od = b["l_orderkey"].map(ray.get(od_ref)).to_numpy(np.float64)
            hi = b["l_orderkey"].map(ray.get(hi_ref)).to_numpy(np.float64)
            sd = b["l_shipdate"].to_numpy().astype("datetime64[D]") \
                                .astype(np.int64)
            late = sd > od + days
            g = pd.DataFrame({"l_linestatus": b["l_linestatus"],
                              "h": np.where(late, hi, 0.0),
                              "l": np.where(late, 1.0 - hi, 0.0)}) \
                .groupby("l_linestatus", sort=False).sum().reset_index()
            return g

        parts = li.map_batches(psum, batch_format="pandas").to_pandas()
        out = parts.groupby("l_linestatus").sum().reset_index()
    else:
        n = _join_partitions()
        j = li.join(om, join_type="inner", num_partitions=n,
                    on=("l_orderkey",), right_on=("o_orderkey",))

        def late_counts(t: pa.Table) -> pa.Table:
            sd = t["l_shipdate"].combine_chunks().to_numpy() \
                                .astype("datetime64[D]").astype(np.int64)
            od = t["odate"].combine_chunks().to_numpy().astype(np.int64)
            hi = t["high"].combine_chunks().to_numpy().astype(np.int64)
            late = sd > od + days
            return pa.table({
                "l_linestatus": t["l_linestatus"],
                "h": pa.array(np.where(late, hi, 0), pa.int64()),
                "l": pa.array(np.where(late, 1 - hi, 0), pa.int64())})

        out = j.map_batches(late_counts, batch_format="pyarrow") \
               .groupby("l_linestatus") \
               .aggregate(Sum("h", alias_name="h"), Sum("l", alias_name="l")) \
               .to_pandas()
    out["high_line_count"] = out["h"].astype(np.int64)
    out["low_line_count"] = out["l"].astype(np.int64)
    return out[["l_linestatus", "high_line_count", "low_line_count"]] \
        .sort_values("l_linestatus").reset_index(drop=True)


Q12_LATE_SHIPMENTS_SQL = """
SELECT l_linestatus,
       count(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH'))
         AS high_line_count,
       count(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
         AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
GROUP BY l_linestatus ORDER BY l_linestatus
"""


# ---- Q13 (adapted): customer order-count distribution ------------------------

def q13_order_distribution(sf_dir: str) -> pd.DataFrame:
    """Canonical Q13 shape — LEFT OUTER customer⋈orders, count orders per
    customer (excluding low-priority orders, the o_comment-filter analog),
    then the DISTRIBUTION of those counts including the zero bucket.
    Per-customer counts are block-local partials combined under the
    cardinality switch (customer-cardinality at 100 TB → the distributed
    groupby fallback); the distribution itself is at most max-orders rows."""
    orders = rd.read_parquet(_pq(sf_dir, "orders"),
                             columns=["o_custkey", "o_orderpriority"])

    def pcount(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t["o_orderpriority"], "5-LOW"))
        vc = pd.Series(t["o_custkey"].to_pandas()).value_counts(sort=False)
        return pa.table({"c": pa.array(vc.index, pa.int64()),
                         "n": pa.array(vc.to_numpy(), pa.int64())})

    partials = orders.map_batches(pcount, batch_format="pyarrow").materialize()
    n_cust = rd.read_parquet(_pq(sf_dir, "customer"),
                             columns=["c_custkey"]).count()
    comb = _switch_combine_sum(partials, "c", "n")
    if comb is None:
        comb = partials.groupby("c").aggregate(
            Sum("n", alias_name="n")).to_pandas()
    dist = comb.groupby("n").size()
    zero = n_cust - len(comb)
    dist = pd.concat([dist, pd.Series({0: zero})]) if zero else dist
    out = pd.DataFrame({"c_count": dist.index.to_numpy(np.int64),
                        "custdist": dist.to_numpy(np.int64)})
    return out.sort_values(["custdist", "c_count"],
                           ascending=[False, False]).reset_index(drop=True)


Q13_ORDER_DISTRIBUTION_SQL = """
WITH co AS (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
  GROUP BY c_custkey)
SELECT c_count, count(*) AS custdist
FROM co GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# ---- Q19 (adapted): disjunctive-predicate revenue ----------------------------

def q19_disjunctive_revenue(sf_dir: str) -> pd.DataFrame:
    """Canonical Q19 shape — revenue under a THREE-BRANCH disjunction of
    (brand, size-range, quantity-range) predicates: the part attributes
    (brand code, size) broadcast as packed int arrays indexed by partkey
    (the container/brand analog), lineitem takes one vectorized pass, and
    the disjunction evaluates as three boolean masks OR-ed map-side.  The
    part side is bounded (~2e8 rows at 100 TB → a few GB of int8/int32,
    switch-guarded anyway)."""
    part = pd.read_parquet(_pq(sf_dir, "part"),
                           columns=["p_partkey", "p_brand", "p_size"])
    pk = part["p_partkey"].to_numpy(np.int64)
    size = np.zeros(pk.max() + 1, dtype=np.int32)
    size[pk] = part["p_size"].to_numpy(np.int32)
    brand = np.zeros(pk.max() + 1, dtype=np.int32)
    codes, uniq = pd.factorize(part["p_brand"])
    brand[pk] = codes
    bcode = {b: i for i, b in enumerate(uniq)}
    b1, b2, b3 = (bcode.get("Brand#12", -1), bcode.get("Brand#23", -1),
                  bcode.get("Brand#5", -1))
    size_ref, brand_ref = ray.put(size), ray.put(brand)

    def rev(t: pa.Table) -> pa.Table:
        sz, br = ray.get(size_ref), ray.get(brand_ref)
        k = t["l_partkey"].combine_chunks().to_numpy().astype(np.int64)
        k = np.clip(k, 0, len(sz) - 1)
        q = t["l_quantity"].combine_chunks().to_numpy()
        s, b = sz[k], br[k]
        m = (((b == b1) & (s >= 1) & (s <= 5) & (q >= 1) & (q <= 11))
             | ((b == b2) & (s >= 1) & (s <= 10) & (q >= 10) & (q <= 20))
             | ((b == b3) & (s >= 1) & (s <= 15) & (q >= 20) & (q <= 30)))
        t2 = t.filter(pa.array(m))
        r = pc.multiply(_cents(t2["l_extendedprice"]),
                        pc.subtract(pa.scalar(100, pa.int64()),
                                    _cents(t2["l_discount"])))
        return pa.table({"rev_e4": r})

    total = _li(sf_dir, ["l_partkey", "l_quantity", "l_extendedprice",
                         "l_discount"]) \
        .map_batches(rev, batch_format="pyarrow").sum("rev_e4")
    return pd.DataFrame({"revenue": [float(total or 0) / 10000.0]})


Q19_DISJUNCTIVE_REVENUE_SQL = """
SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE)
         / 10000.0 AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#5' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
"""


# ---- Q11 (adapted): important parts by value share ---------------------------

def q11_important_parts(sf_dir: str, nation: str = "NATION_7",
                        frac: float = 0.001) -> pd.DataFrame:
    """Canonical Q11 shape — per-part value sums restricted to one nation's
    suppliers, kept only where the part's value exceeds ``frac`` of the
    GLOBAL scalar total (the scalar-subquery threshold).  Supplier→nation
    is a tiny broadcast; per-part sums are block-local partials combined
    under the switch; the threshold compare is exact int64 cents."""
    sup = pd.read_parquet(_pq(sf_dir, "supplier"),
                          columns=["s_suppkey", "s_nationkey"])
    nat = pd.read_parquet(_pq(sf_dir, "nation"),
                          columns=["n_nationkey", "n_name"])
    nk = nat.loc[nat["n_name"] == nation, "n_nationkey"].iloc[0]
    keys = sup.loc[sup["s_nationkey"] == nk, "s_suppkey"].to_numpy(np.int64)
    keys_ref = ray.put(np.sort(keys))

    def psum(t: pa.Table) -> pa.Table:
        ks = ray.get(keys_ref)
        s = t["l_suppkey"].combine_chunks().to_numpy().astype(np.int64)
        if ks.size == 0:
            return pa.table({"l_partkey": pa.array([], pa.int64()),
                             "v": pa.array([], pa.int64())})
        idx = np.searchsorted(ks, s)
        idx[idx >= ks.size] = ks.size - 1
        t = t.filter(pa.array(ks[idx] == s))
        df = pd.DataFrame({
            "l_partkey": t["l_partkey"].to_pandas(),
            "v": _cents(t["l_extendedprice"]).to_numpy()})
        g = df.groupby("l_partkey", sort=False)["v"].sum()
        return pa.table({"l_partkey": pa.array(g.index, pa.int64()),
                         "v": pa.array(g.to_numpy(), pa.int64())})

    partials = _li(sf_dir, ["l_partkey", "l_suppkey", "l_extendedprice"]) \
        .map_batches(psum, batch_format="pyarrow").materialize()
    comb = _switch_combine_sum(partials, "l_partkey", "v")
    if comb is None:
        comb = partials.groupby("l_partkey").aggregate(
            Sum("v", alias_name="v")).to_pandas()
    thr = comb["v"].sum() * frac
    out = comb[comb["v"].astype(np.float64) > thr].copy()
    out["value"] = out["v"].astype(np.float64) / 100.0
    return out[["l_partkey", "value"]].sort_values(
        ["value", "l_partkey"], ascending=[False, True]) \
        .reset_index(drop=True)


def q11_important_parts_sql(nation: str = "NATION_7",
                            frac: float = 0.001) -> str:
    return f"""
WITH v AS (
  SELECT l_partkey, sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS v
  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = '{nation}'
  GROUP BY l_partkey)
SELECT l_partkey, CAST(v AS DOUBLE) / 100.0 AS value
FROM v
WHERE CAST(v AS DOUBLE) > (SELECT sum(v) * {frac} FROM v)
ORDER BY value DESC, l_partkey
"""


# ---- Q16 (adapted): supplier count per part attribute triple -----------------

def q16_supplier_counts(sf_dir: str) -> pd.DataFrame:
    """Canonical Q16 shape — COUNT DISTINCT suppliers per (brand, type,
    size) with brand/type exclusions and a supplier blacklist (negative
    account balance, the complaints analog), the part↔supplier association
    via lineitem.  Distinct (part, supp) pairs are block-deduped partials;
    the attribute triple attaches from a broadcast part table; the final
    count-distinct runs on the driver under the switch (attr triples are
    bounded) or through a distributed groupby."""
    part = pd.read_parquet(_pq(sf_dir, "part"),
                           columns=["p_partkey", "p_brand", "p_type",
                                    "p_size"])
    part = part[(part["p_brand"] != "Brand#24")
                & ~part["p_type"].str.startswith("MEDIUM")
                & part["p_size"].isin([1, 4, 7, 10, 13, 16, 19, 22])]
    sup = pd.read_parquet(_pq(sf_dir, "supplier"),
                          columns=["s_suppkey", "s_acctbal"])
    bad = np.sort(sup.loc[sup["s_acctbal"] < 0, "s_suppkey"]
                  .to_numpy(np.int64))
    good_parts = np.sort(part["p_partkey"].to_numpy(np.int64))
    gp_ref, bad_ref = ray.put(good_parts), ray.put(bad)

    def ppairs(t: pa.Table) -> pa.Table:
        gp, bd = ray.get(gp_ref), ray.get(bad_ref)
        df = pd.DataFrame({"p": t["l_partkey"].to_pandas().astype(np.int64),
                           "s": t["l_suppkey"].to_pandas().astype(np.int64)})
        df = df.drop_duplicates()
        if gp.size == 0:
            return pa.table({"p": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64())})
        i = np.searchsorted(gp, df["p"].to_numpy())
        i[i >= gp.size] = gp.size - 1
        keep = gp[i] == df["p"].to_numpy()
        if bd.size:
            j = np.searchsorted(bd, df["s"].to_numpy())
            j[j >= bd.size] = bd.size - 1
            keep = keep & ~(bd[j] == df["s"].to_numpy())
        df = df[keep]
        return pa.table({"p": pa.array(df["p"], pa.int64()),
                         "s": pa.array(df["s"], pa.int64())})

    partials = _li(sf_dir, ["l_partkey", "l_suppkey"]) \
        .map_batches(ppairs, batch_format="pyarrow").materialize()
    if partials.count() <= _broadcast_max_rows():
        pairs = partials.to_pandas().drop_duplicates()
    else:
        pairs = partials.groupby(["p", "s"]).aggregate(
            Count(alias_name="_c")).to_pandas()[["p", "s"]]
    m = pairs.merge(part, left_on="p", right_on="p_partkey")
    out = m.groupby(["p_brand", "p_type", "p_size"])["s"].nunique() \
           .reset_index(name="supplier_cnt")
    out["supplier_cnt"] = out["supplier_cnt"].astype(np.int64)
    return out.sort_values(
        ["supplier_cnt", "p_brand", "p_type", "p_size"],
        ascending=[False, True, True, True]).reset_index(drop=True)


Q16_SUPPLIER_COUNTS_SQL = """
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#24'
  AND p_type NOT LIKE 'MEDIUM%'
  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# ---- Q2 (adapted): per-part argmin-with-ties supplier ------------------------

def q2_min_cost_supplier(sf_dir: str, region: str = "EUROPE",
                         max_size: int = 5, k: int = 100) -> pd.DataFrame:
    """Canonical Q2 shape — for every small part, the cheapest offer among
    one region's suppliers, TIES INCLUDED (the correlated-min subquery):
    the part↔supplier association is lineitem (no partsupp here), cost =
    exact int64 cents of l_extendedprice.  Region suppliers broadcast
    (bounded dim); per-(part, supp) min offers are block-local partials;
    the per-part global min and the tie-preserving filter run on the
    driver under the switch, else through a distributed min groupby +
    join back."""
    nat = pd.read_parquet(_pq(sf_dir, "nation"),
                          columns=["n_nationkey", "n_regionkey", "n_name"])
    reg = pd.read_parquet(_pq(sf_dir, "region"))
    rk = reg.loc[reg["r_name"] == region, "r_regionkey"].iloc[0]
    nat = nat[nat["n_regionkey"] == rk]
    sup = pd.read_parquet(_pq(sf_dir, "supplier"),
                          columns=["s_suppkey", "s_name", "s_acctbal",
                                   "s_nationkey"])
    sup = sup[sup["s_nationkey"].isin(nat["n_nationkey"])]
    part = pd.read_parquet(_pq(sf_dir, "part"),
                           columns=["p_partkey", "p_name", "p_size"])
    part = part[part["p_size"] <= max_size]
    skeys = np.sort(sup["s_suppkey"].to_numpy(np.int64))
    pkeys = np.sort(part["p_partkey"].to_numpy(np.int64))
    sk_ref, pk_ref = ray.put(skeys), ray.put(pkeys)

    def pmin(t: pa.Table) -> pa.Table:
        sk, pk = ray.get(sk_ref), ray.get(pk_ref)
        s = t["l_suppkey"].combine_chunks().to_numpy().astype(np.int64)
        p = t["l_partkey"].combine_chunks().to_numpy().astype(np.int64)
        if not sk.size or not pk.size:
            return pa.table({"p": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64()),
                             "cost_c": pa.array([], pa.int64())})
        i = np.clip(np.searchsorted(sk, s), 0, sk.size - 1)
        j = np.clip(np.searchsorted(pk, p), 0, pk.size - 1)
        keep = (sk[i] == s) & (pk[j] == p)
        t = t.filter(pa.array(keep))
        df = pd.DataFrame({"p": p[keep], "s": s[keep],
                           "c": _cents(t["l_extendedprice"]).to_numpy()})
        g = df.groupby(["p", "s"], sort=False)["c"].min().reset_index()
        return pa.table({"p": pa.array(g["p"], pa.int64()),
                         "s": pa.array(g["s"], pa.int64()),
                         "cost_c": pa.array(g["c"], pa.int64())})

    partials = _li(sf_dir, ["l_partkey", "l_suppkey", "l_extendedprice"]) \
        .map_batches(pmin, batch_format="pyarrow").materialize()
    if partials.count() <= _broadcast_max_rows():
        offers = _pdf(partials, ["p", "s", "cost_c"]).groupby(
            ["p", "s"], sort=False)["cost_c"].min().reset_index()
    else:
        offers = partials.groupby(["p", "s"]).aggregate(
            Min("cost_c", alias_name="cost_c")).to_pandas()
    best = offers.groupby("p")["cost_c"].transform("min")
    win = offers[offers["cost_c"] == best]
    out = win.merge(sup, left_on="s", right_on="s_suppkey") \
             .merge(part, left_on="p", right_on="p_partkey") \
             .merge(nat, left_on="s_nationkey", right_on="n_nationkey")
    out["min_cost"] = out["cost_c"].astype(np.float64) / 100.0
    out = out.sort_values(["s_acctbal", "n_name", "s_name", "p_partkey"],
                          ascending=[False, True, True, True]).head(k)
    return out[["s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
                "min_cost"]].reset_index(drop=True)


def q2_min_cost_supplier_sql(region: str = "EUROPE", max_size: int = 5,
                             k: int = 100) -> str:
    return f"""
WITH rs AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
                JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = '{region}'),
offers AS (
  SELECT l_partkey AS p, l_suppkey AS s,
         min(CAST(round(l_extendedprice * 100) AS BIGINT)) AS cost_c
  FROM lineitem JOIN rs ON l_suppkey = rs.s_suppkey
                JOIN part ON l_partkey = p_partkey
  WHERE p_size <= {max_size}
  GROUP BY l_partkey, l_suppkey),
win AS (
  SELECT * FROM offers
  WHERE cost_c = (SELECT min(cost_c) FROM offers o2 WHERE o2.p = offers.p))
SELECT s_acctbal, s_name, n_name, p AS p_partkey, p_name,
       CAST(cost_c AS DOUBLE) / 100.0 AS min_cost
FROM win JOIN rs ON s = rs.s_suppkey
         JOIN part ON p = p_partkey
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT {k}
"""


# ---- Q8 (adapted): national market share --------------------------------------

def q8_market_share(sf_dir: str, nation: str = "NATION_3",
                    region: str = "EUROPE",
                    ptype: str = "STANDARD") -> pd.DataFrame:
    """Canonical Q8 shape — the two-level conditional aggregate over a
    6-table join: of all ``ptype`` revenue sold into ``region``'s customer
    market in 1995-1996, the share supplied by ``nation``'s suppliers, per
    order year.  All dimensions (type-filtered partkeys, region custkeys,
    nation suppkeys) broadcast as sorted key arrays; the order side
    (orderkey → year + market membership) goes through the cardinality
    switch; revenue partials fuse (year, is_nation) into 4 cells per
    block."""
    part = pd.read_parquet(_pq(sf_dir, "part"),
                           columns=["p_partkey", "p_type"])
    pkeys = np.sort(part.loc[part["p_type"] == ptype,
                             "p_partkey"].to_numpy(np.int64))
    nat = pd.read_parquet(_pq(sf_dir, "nation"))
    reg = pd.read_parquet(_pq(sf_dir, "region"))
    rk = reg.loc[reg["r_name"] == region, "r_regionkey"].iloc[0]
    rnat = nat.loc[nat["n_regionkey"] == rk, "n_nationkey"]
    cust = pd.read_parquet(_pq(sf_dir, "customer"),
                           columns=["c_custkey", "c_nationkey"])
    ckeys = np.sort(cust.loc[cust["c_nationkey"].isin(rnat),
                             "c_custkey"].to_numpy(np.int64))
    nk = nat.loc[nat["n_name"] == nation, "n_nationkey"].iloc[0]
    sup = pd.read_parquet(_pq(sf_dir, "supplier"),
                          columns=["s_suppkey", "s_nationkey"])
    skeys = np.sort(sup.loc[sup["s_nationkey"] == nk,
                            "s_suppkey"].to_numpy(np.int64))

    orders = rd.read_parquet(_pq(sf_dir, "orders"),
                             columns=["o_orderkey", "o_custkey",
                                      "o_orderdate"])
    ck_ref = ray.put(ckeys)

    def omap(t: pa.Table) -> pa.Table:
        ck = ray.get(ck_ref)
        y = pc.year(t["o_orderdate"])
        t = t.append_column("y", pc.cast(y, pa.int32()))
        t = t.filter(pc.and_(pc.greater_equal(t["y"], pa.scalar(1995)),
                             pc.less_equal(t["y"], pa.scalar(1996))))
        c = t["o_custkey"].combine_chunks().to_numpy().astype(np.int64)
        if not ck.size:
            keep = np.zeros(len(c), bool)
        else:
            i = np.clip(np.searchsorted(ck, c), 0, ck.size - 1)
            keep = ck[i] == c
        t = t.filter(pa.array(keep))
        return pa.table({"o_orderkey": t["o_orderkey"], "y": t["y"]})

    om = orders.map_batches(omap, batch_format="pyarrow").materialize()
    pk_ref, sk_ref = ray.put(pkeys), ray.put(skeys)
    li = _li(sf_dir, ["l_orderkey", "l_partkey", "l_suppkey",
                      "l_extendedprice", "l_discount"])

    if om.count() <= _broadcast_max_rows():
        ymap_ref = ray.put(om.to_pandas().set_index("o_orderkey")["y"])

        def prev(b: pd.DataFrame) -> pd.DataFrame:
            pk, sk = ray.get(pk_ref), ray.get(sk_ref)
            y = b["l_orderkey"].map(ray.get(ymap_ref))
            p = b["l_partkey"].to_numpy(np.int64)
            keep = y.notna().to_numpy()
            if pk.size:
                i = np.clip(np.searchsorted(pk, p), 0, pk.size - 1)
                keep &= pk[i] == p
            else:
                keep[:] = False
            if not keep.any():
                return pd.DataFrame({"y": pd.Series([], dtype=np.int32),
                                     "nat": pd.Series([], dtype=np.int8),
                                     "rev_e4": pd.Series([], dtype=np.int64)})
            b = b[keep]
            s = b["l_suppkey"].to_numpy(np.int64)
            isn = np.zeros(len(b), dtype=np.int8)
            if sk.size:
                j = np.clip(np.searchsorted(sk, s), 0, sk.size - 1)
                isn = (sk[j] == s).astype(np.int8)
            rev = (np.round(b["l_extendedprice"].to_numpy() * 100)
                   .astype(np.int64)
                   * (100 - np.round(b["l_discount"].to_numpy() * 100)
                      .astype(np.int64)))
            g = pd.DataFrame({"y": y[keep].astype(np.int32).to_numpy(),
                              "nat": isn, "rev_e4": rev}) \
                .groupby(["y", "nat"], sort=False).sum().reset_index()
            return g

        cells = li.map_batches(prev, batch_format="pandas").to_pandas() \
                  .groupby(["y", "nat"]).sum().reset_index()
    else:
        n = _join_partitions()
        j = li.join(om, join_type="inner", num_partitions=n,
                    on=("l_orderkey",), right_on=("o_orderkey",))

        def prev2(t: pa.Table) -> pa.Table:
            pk, sk = ray.get(pk_ref), ray.get(sk_ref)
            p = t["l_partkey"].combine_chunks().to_numpy().astype(np.int64)
            if pk.size:
                i = np.clip(np.searchsorted(pk, p), 0, pk.size - 1)
                t = t.filter(pa.array(pk[i] == p))
            else:
                t = t.slice(0, 0)
            s = t["l_suppkey"].combine_chunks().to_numpy().astype(np.int64)
            isn = np.zeros(len(s), dtype=np.int64)
            if sk.size:
                jj = np.clip(np.searchsorted(sk, s), 0, sk.size - 1)
                isn = (sk[jj] == s).astype(np.int64)
            rev = pc.multiply(_cents(t["l_extendedprice"]),
                              pc.subtract(pa.scalar(100, pa.int64()),
                                          _cents(t["l_discount"])))
            return pa.table({"y": t["y"], "nat": pa.array(isn),
                             "rev_e4": rev})

        cells = j.map_batches(prev2, batch_format="pyarrow") \
                 .groupby(["y", "nat"]).aggregate(
                     Sum("rev_e4", alias_name="rev_e4")).to_pandas()
    tot = cells.groupby("y")["rev_e4"].sum()
    natl = cells[cells["nat"] == 1].set_index("y")["rev_e4"]
    out = pd.DataFrame({
        "o_year": tot.index.to_numpy(np.int64),
        "mkt_share": (natl.reindex(tot.index).fillna(0).to_numpy(np.float64)
                      / tot.to_numpy(np.float64))})
    return out.sort_values("o_year").reset_index(drop=True)


def q8_market_share_sql(nation: str = "NATION_3", region: str = "EUROPE",
                        ptype: str = "STANDARD") -> str:
    return f"""
WITH ae AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev_e4,
         (SELECT n2.n_name FROM nation n2
          WHERE n2.n_nationkey = s_nationkey) AS sup_nation
  FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
  WHERE r_name = '{region}' AND p_type = '{ptype}'
    AND year(o_orderdate) BETWEEN 1995 AND 1996)
SELECT o_year,
       CAST(sum(CASE WHEN sup_nation = '{nation}' THEN rev_e4 ELSE 0 END)
            AS DOUBLE)
         / CAST(sum(rev_e4) AS DOUBLE) AS mkt_share
FROM ae GROUP BY o_year ORDER BY o_year
"""


# ---- Q9 (adapted): profit by (nation, year) ------------------------------------

def q9_profit_by_nation(sf_dir: str, token: str = "PROMO") -> pd.DataFrame:
    """Canonical Q9 shape — profit per (supplier nation, order year) over
    parts whose type contains ``token``; profit = revenue −
    retailprice·quantity (the supplycost analog, exact in e4 cents).
    Part retailprice and supplier nation broadcast as packed arrays; the
    order year meets the stream through the switch; per-(nation, year)
    partials fuse to a bounded cell table per block."""
    part = pd.read_parquet(_pq(sf_dir, "part"),
                           columns=["p_partkey", "p_type", "p_retailprice"])
    # the lookup array must span the FULL partkey domain (-1 = not matching
    # the type filter) — sizing it to the filtered max would alias higher
    # partkeys onto the last filtered slot after np.clip
    maxpk = int(part["p_partkey"].max()) + 1 if len(part) else 1
    retail_c = np.full(maxpk, -1, dtype=np.int64)
    sel = part["p_type"].str.contains(token)
    pk = part.loc[sel, "p_partkey"].to_numpy(np.int64)
    retail_c[pk] = np.round(part.loc[sel, "p_retailprice"].to_numpy() * 100) \
        .astype(np.int64)
    sup = pd.read_parquet(_pq(sf_dir, "supplier"),
                          columns=["s_suppkey", "s_nationkey"])
    sk = sup["s_suppkey"].to_numpy(np.int64)
    snat = np.full(int(sk.max()) + 2, -1, dtype=np.int32)
    snat[sk] = sup["s_nationkey"].to_numpy(np.int32)
    nat = pd.read_parquet(_pq(sf_dir, "nation"),
                          columns=["n_nationkey", "n_name"])
    orders = rd.read_parquet(_pq(sf_dir, "orders"),
                             columns=["o_orderkey", "o_orderdate"])

    def oy(t: pa.Table) -> pa.Table:
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "y": pc.cast(pc.year(t["o_orderdate"]), pa.int32())})

    om = orders.map_batches(oy, batch_format="pyarrow").materialize()
    r_ref, s_ref = ray.put(retail_c), ray.put(snat)
    li = _li(sf_dir, ["l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
                      "l_extendedprice", "l_discount"])

    if om.count() <= _broadcast_max_rows():
        y_ref = ray.put(om.to_pandas().set_index("o_orderkey")["y"])

        def pprof(b: pd.DataFrame) -> pd.DataFrame:
            rc, sn = ray.get(r_ref), ray.get(s_ref)
            p = np.clip(b["l_partkey"].to_numpy(np.int64), 0, len(rc) - 1)
            keep = rc[p] >= 0
            b, p = b[keep], p[keep]
            y = b["l_orderkey"].map(ray.get(y_ref)).to_numpy(np.int32)
            s = np.clip(b["l_suppkey"].to_numpy(np.int64), 0, len(sn) - 1)
            qty_c = np.round(b["l_quantity"].to_numpy() * 100).astype(np.int64)
            rev = (np.round(b["l_extendedprice"].to_numpy() * 100)
                   .astype(np.int64)
                   * (100 - np.round(b["l_discount"].to_numpy() * 100)
                      .astype(np.int64)))
            profit = rev - rc[p] * qty_c
            g = pd.DataFrame({"nk": sn[s], "o_year": y, "profit_e4": profit}) \
                .groupby(["nk", "o_year"], sort=False).sum().reset_index()
            return g

        cells = li.map_batches(pprof, batch_format="pandas").to_pandas() \
                  .groupby(["nk", "o_year"]).sum().reset_index()
    else:
        n = _join_partitions()
        j = li.join(om, join_type="inner", num_partitions=n,
                    on=("l_orderkey",), right_on=("o_orderkey",))

        def pprof2(t: pa.Table) -> pa.Table:
            rc, sn = ray.get(r_ref), ray.get(s_ref)
            p = np.clip(t["l_partkey"].combine_chunks().to_numpy()
                        .astype(np.int64), 0, len(rc) - 1)
            t = t.filter(pa.array(rc[p] >= 0))
            p = np.clip(t["l_partkey"].combine_chunks().to_numpy()
                        .astype(np.int64), 0, len(rc) - 1)
            s = np.clip(t["l_suppkey"].combine_chunks().to_numpy()
                        .astype(np.int64), 0, len(sn) - 1)
            qty_c = np.round(t["l_quantity"].combine_chunks().to_numpy()
                             * 100).astype(np.int64)
            rev = (_cents(t["l_extendedprice"]).to_numpy()
                   * (100 - _cents(t["l_discount"]).to_numpy()))
            return pa.table({
                "nk": pa.array(sn[s].astype(np.int64)),
                "o_year": pc.cast(t["y"], pa.int64()),
                "profit_e4": pa.array(rev - rc[p] * qty_c)})

        cells = j.map_batches(pprof2, batch_format="pyarrow") \
                 .groupby(["nk", "o_year"]).aggregate(
                     Sum("profit_e4", alias_name="profit_e4")).to_pandas()
    out = cells.merge(nat, left_on="nk", right_on="n_nationkey")
    out["profit"] = out["profit_e4"].astype(np.float64) / 10000.0
    out = out.rename(columns={"n_name": "nation"})
    out["o_year"] = out["o_year"].astype(np.int64)
    return out[["nation", "o_year", "profit"]].sort_values(
        ["nation", "o_year"], ascending=[True, False]).reset_index(drop=True)


def q9_profit_by_nation_sql(token: str = "PROMO") -> str:
    return f"""
SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT))
                - CAST(round(p_retailprice * 100) AS BIGINT)
                  * CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE)
         / 10000.0 AS profit
FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN part     ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
WHERE p_type LIKE '%{token}%'
GROUP BY n_name, year(o_orderdate)
ORDER BY nation, o_year DESC
"""


# ---- Q20 (adapted): dominant-volume suppliers ---------------------------------

def q20_dominant_suppliers(sf_dir: str, nation: str = "NATION_5",
                           year: int = 1996) -> pd.DataFrame:
    """Canonical Q20 shape — the nested semi-join chain: suppliers (of one
    nation) that shipped MORE THAN HALF of some part's total ``year``
    volume (the excess-availability analog without partsupp).  Per-(part,
    supp) and per-part quantity sums are block-local partials; the >50%
    predicate is exact integer math (2·sq > tq); the final supplier list
    joins the bounded supplier dim on the driver."""
    nat = pd.read_parquet(_pq(sf_dir, "nation"),
                          columns=["n_nationkey", "n_name"])
    nk = nat.loc[nat["n_name"] == nation, "n_nationkey"].iloc[0]
    sup = pd.read_parquet(_pq(sf_dir, "supplier"),
                          columns=["s_suppkey", "s_name", "s_nationkey"])
    lo = np.datetime64(f"{year}-01-01")
    hi = np.datetime64(f"{year + 1}-01-01")

    def pq_sums(t: pa.Table) -> pa.Table:
        sd = t["l_shipdate"].combine_chunks().to_numpy() \
            .astype("datetime64[D]")
        t = t.filter(pa.array((sd >= lo) & (sd < hi)))
        df = pd.DataFrame({
            "p": t["l_partkey"].to_pandas().astype(np.int64),
            "s": t["l_suppkey"].to_pandas().astype(np.int64),
            "q": np.round(t["l_quantity"].to_pandas().to_numpy() * 100)
                 .astype(np.int64)})
        g = df.groupby(["p", "s"], sort=False)["q"].sum().reset_index()
        return pa.table({"p": pa.array(g["p"], pa.int64()),
                         "s": pa.array(g["s"], pa.int64()),
                         "q": pa.array(g["q"], pa.int64())})

    partials = _li(sf_dir, ["l_partkey", "l_suppkey", "l_quantity",
                            "l_shipdate"]) \
        .map_batches(pq_sums, batch_format="pyarrow").materialize()
    if partials.count() <= _broadcast_max_rows():
        ps = _pdf(partials, ["p", "s", "q"]).groupby(
            ["p", "s"], sort=False)["q"].sum().reset_index()
    else:
        ps = partials.groupby(["p", "s"]).aggregate(
            Sum("q", alias_name="q")).to_pandas()
    tot = ps.groupby("p")["q"].transform("sum")
    dom = ps[2 * ps["q"] > tot]
    winners = sup[sup["s_nationkey"] == nk].merge(
        dom[["s"]].drop_duplicates(), left_on="s_suppkey", right_on="s")
    return winners[["s_suppkey", "s_name"]].sort_values("s_name") \
        .reset_index(drop=True)


def q20_dominant_suppliers_sql(nation: str = "NATION_5",
                               year: int = 1996) -> str:
    return f"""
WITH ps AS (
  SELECT l_partkey AS p, l_suppkey AS s,
         sum(CAST(round(l_quantity * 100) AS BIGINT)) AS q
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{year}-01-01'
    AND l_shipdate <  TIMESTAMP '{year + 1}-01-01'
  GROUP BY l_partkey, l_suppkey),
dom AS (
  SELECT DISTINCT s FROM ps
  WHERE 2 * q > (SELECT sum(q) FROM ps p2 WHERE p2.p = ps.p))
SELECT s_suppkey, s_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
              JOIN dom ON s_suppkey = dom.s
WHERE n_name = '{nation}'
ORDER BY s_name
"""


# ---- Q21 (adapted): sole-latest supplier on multi-supplier orders -------------

def q21_blocking_suppliers(sf_dir: str, k: int = 100) -> pd.DataFrame:
    """Canonical Q21 shape — EXISTS (another supplier on the order) AND NOT
    EXISTS (another supplier shipping as late): on finished ('F') orders
    with ≥2 distinct suppliers, the supplier whose max shipdate STRICTLY
    exceeds every other supplier's is the one that kept the order waiting
    (shipdate stands in for the missing receipt/commit dates).  Per-(order,
    supplier) max-shipdate partials combine under the switch; the per-order
    sole-argmax test is one vectorized sorted pass; the fallback shard-
    groupbys on orderkey (order-cardinality at 100 TB)."""
    orders = rd.read_parquet(_pq(sf_dir, "orders"),
                             columns=["o_orderkey", "o_orderstatus"])
    fkeys = orders.map_batches(
        lambda t: t.filter(pc.equal(t["o_orderstatus"], "F"))
                   .select(["o_orderkey"]),
        batch_format="pyarrow").materialize()

    def pmax(t: pa.Table, fk: np.ndarray | None) -> pa.Table:
        """Per-(order, supplier) max-shipdate block partial; ``fk`` is the
        broadcast sorted F-orderkey array on the small path (None when the
        semi-join already pruned the stream)."""
        if fk is not None:
            o = t["l_orderkey"].combine_chunks().to_numpy().astype(np.int64)
            if not fk.size:
                return pa.table({"o": pa.array([], pa.int64()),
                                 "s": pa.array([], pa.int64()),
                                 "d": pa.array([], pa.int64())})
            i = np.clip(np.searchsorted(fk, o), 0, fk.size - 1)
            t = t.filter(pa.array(fk[i] == o))
        df = pd.DataFrame({
            "o": t["l_orderkey"].to_pandas().astype(np.int64),
            "s": t["l_suppkey"].to_pandas().astype(np.int64),
            "d": t["l_shipdate"].to_pandas().to_numpy()
                 .astype("datetime64[D]").astype(np.int64)})
        g = df.groupby(["o", "s"], sort=False)["d"].max().reset_index()
        return pa.table({"o": pa.array(g["o"], pa.int64()),
                         "s": pa.array(g["s"], pa.int64()),
                         "d": pa.array(g["d"], pa.int64())})

    li = _li(sf_dir, ["l_orderkey", "l_suppkey", "l_shipdate"])
    # cardinality switch on the F-orderkey set: 'F' status covers ~half of
    # orders, so at web scale this side is corpus-sized — broadcast a sorted
    # key array only below the budget, bloom-prune + exact semi-join above
    # (the lineitem_bloom_semi machinery; only survivors reach the partial)
    if fkeys.count() <= _broadcast_max_rows():
        fk_ref = ray.put(np.sort(fkeys.to_pandas()["o_orderkey"]
                                 .to_numpy(np.int64)))
        partials = li.map_batches(
            lambda t: pmax(t, ray.get(fk_ref)),
            batch_format="pyarrow").materialize()
    else:
        from ..stages.bloomjoin import bloom_semi_join

        pruned = bloom_semi_join(li, "l_orderkey", fkeys, "o_orderkey",
                                 num_partitions=_join_partitions())
        partials = pruned.map_batches(
            lambda t: pmax(t, None), batch_format="pyarrow").materialize()

    def blockers(df: pd.DataFrame) -> pd.DataFrame:
        """(order, supplier, max shipdate) → suppliers that are the UNIQUE
        latest on an order with ≥2 suppliers (vectorized sorted pass)."""
        df = df.groupby(["o", "s"], sort=False)["d"].max().reset_index()
        df = df.sort_values(["o", "d"], kind="mergesort")
        o = df["o"].to_numpy()
        d = df["d"].to_numpy()
        last = np.r_[o[1:] != o[:-1], True]          # last row of each order
        first = np.r_[True, o[1:] != o[:-1]]
        multi = ~(last & first)                       # order has >=2 rows
        prev_d = np.r_[np.int64(0), d[:-1]]
        strict = last & multi & (d > prev_d)          # unique max
        return df[strict][["o", "s"]]

    if partials.count() <= _broadcast_max_rows():
        blk = blockers(_pdf(partials, ["o", "s", "d"]))
    else:
        blk = _shard_by_int(partials, "o").groupby("shard") \
            .map_groups(lambda g: blockers(g), batch_format="pandas") \
            .to_pandas()
    sup = pd.read_parquet(_pq(sf_dir, "supplier"),
                          columns=["s_suppkey", "s_name"])
    cnt = blk.groupby("s").size().reset_index(name="numwait")
    out = cnt.merge(sup, left_on="s", right_on="s_suppkey")
    out["numwait"] = out["numwait"].astype(np.int64)
    return out[["s_name", "numwait"]].sort_values(
        ["numwait", "s_name"], ascending=[False, True]).head(k) \
        .reset_index(drop=True)


def q21_blocking_suppliers_sql(k: int = 100) -> str:
    return f"""
WITH m AS (
  SELECT l_orderkey AS o, l_suppkey AS s, max(l_shipdate) AS d
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
  GROUP BY l_orderkey, l_suppkey),
blk AS (
  SELECT o, s FROM m
  WHERE EXISTS (SELECT 1 FROM m m2 WHERE m2.o = m.o AND m2.s <> m.s)
    AND NOT EXISTS (SELECT 1 FROM m m3
                    WHERE m3.o = m.o AND m3.s <> m.s AND m3.d >= m.d))
SELECT s_name, count(*) AS numwait
FROM blk JOIN supplier ON s = s_suppkey
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT {k}
"""
