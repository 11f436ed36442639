"""Round-3 analytic operator families over the TPC-H-ish tables.

New operator shapes not covered by pipelines/relational.py: a 6-table
multi-join with a same-nation correlation predicate (TPC-H Q5), ROLLUP
super-aggregates, exact distributed NTILE, a two-pass centered correlation
aggregate, INTERSECT, and per-group dense rank.  Same conventions as
relational.py: pruned parquet reads, pyarrow.compute kernels per batch,
broadcast small sides, combining groupbys, exact int64-cents money math
(float Sum across distributed blocks is order-nondeterministic).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum

from .relational import _cents, _join_partitions, _pq


# ---- TPC-H Q5 shape: 6-table join with a same-nation predicate --------------

def q5_nation_volume(sf_dir: str,
                     broadcast_supplier: bool | None = None) -> rd.Dataset:
    """Revenue per ASIA nation from 1996 orders where the line item's
    supplier and the ordering customer share a nation (TPC-H Q5 shape).

    Join plan (most selective first, one partitioning key reused):
    - nation ⋈ region filtered to ASIA → a 5-entry dict, broadcast;
    - customer filtered to ASIA nations via that dict (map-side, no
      shuffle) → (c_custkey, c_nationkey);
    - orders pruned to the 1996 window at the read's filter kernel, then
      hash-join orders ⋈ customer on custkey (large-large);
    - lineitem reduced to (l_orderkey, l_suppkey, rev_e4 int64 cents²)
      and hash-joined on orderkey — the same key the previous join
      produced, so only lineitem reshuffles;
    - supplier meets the joined stream through the shared cardinality
      switch (default ``broadcast_supplier=None`` decides by the metadata
      row count vs ``relational._broadcast_max_rows``): a 10k-row/SF
      dimension broadcasts as a suppkey→nationkey int array lookup; at
      100 TB supplier is ~1e9 rows ≈ 8 GB of int64 pairs — past the
      broadcast budget — and hash-joins on suppkey instead;
    - same-nation filter + nation-name projection per batch, then one
      combining groupby(n_name) over int64 cents.
    """
    nation = pd.read_parquet(_pq(sf_dir, "nation"))
    region = pd.read_parquet(_pq(sf_dir, "region"))
    asia = nation.merge(region, left_on="n_regionkey", right_on="r_regionkey")
    asia = asia[asia["r_name"] == "ASIA"]
    nat_name = dict(zip(asia["n_nationkey"].astype("int64"), asia["n_name"]))
    asia_keys = np.fromiter(nat_name, dtype=np.int64)

    cust = rd.read_parquet(_pq(sf_dir, "customer"),
                           columns=["c_custkey", "c_nationkey"])
    cust = cust.map_batches(
        lambda t: t.filter(pc.is_in(pc.cast(t["c_nationkey"], pa.int64()),
                                    value_set=pa.array(asia_keys))),
        batch_format="pyarrow")

    lo, hi = pd.Timestamp("1996-01-01"), pd.Timestamp("1997-01-01")
    orders = rd.read_parquet(_pq(sf_dir, "orders"),
                             columns=["o_orderkey", "o_custkey", "o_orderdate"])
    orders = orders.map_batches(
        lambda t: t.filter(pc.and_(pc.greater_equal(t["o_orderdate"], pa.scalar(lo)),
                                   pc.less(t["o_orderdate"], pa.scalar(hi))))
                   .select(["o_orderkey", "o_custkey"]),
        batch_format="pyarrow")

    li = rd.read_parquet(_pq(sf_dir, "lineitem"),
                         columns=["l_orderkey", "l_suppkey",
                                  "l_extendedprice", "l_discount"])

    def rev(t: pa.Table) -> pa.Table:
        r = pc.multiply(_cents(t["l_extendedprice"]),
                        pc.subtract(pa.scalar(100, pa.int64()),
                                    _cents(t["l_discount"])))
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "l_suppkey": t["l_suppkey"], "rev_e4": r})

    li = li.map_batches(rev, batch_format="pyarrow")

    from .relational import _broadcast_max_rows

    sup_ds = rd.read_parquet(_pq(sf_dir, "supplier"),
                             columns=["s_suppkey", "s_nationkey"])
    if broadcast_supplier is None:
        broadcast_supplier = sup_ds.count() <= _broadcast_max_rows()

    n = _join_partitions()
    oc = orders.join(cust, join_type="inner", num_partitions=n,
                     on=("o_custkey",), right_on=("c_custkey",))
    j = li.join(oc, join_type="inner", num_partitions=n,
                on=("l_orderkey",), right_on=("o_orderkey",))

    if broadcast_supplier:
        sup = sup_ds.to_pandas()
        sup_lut = np.full(int(sup["s_suppkey"].max()) + 1, -1, dtype=np.int64)
        sup_lut[sup["s_suppkey"].to_numpy()] = sup["s_nationkey"].to_numpy()
        sup_ref = ray.put(sup_lut)

        class SameNation:
            """Per-actor: fetch the broadcast supplier LUT once, then filter
            each batch to supplier-nation == customer-nation and project the
            nation name."""

            def __init__(self, ref, names: dict[int, str]):
                self.lut = ray.get(ref)
                self.names = names

            def __call__(self, t: pa.Table) -> pa.Table:
                supk = t["l_suppkey"].combine_chunks().to_numpy()
                s_nat = self.lut[supk]
                c_nat = pc.cast(t["c_nationkey"], pa.int64()).combine_chunks().to_numpy()
                keep = s_nat == c_nat
                nk = c_nat[keep]
                names = pd.Series(nk).map(self.names).to_numpy(dtype=object)
                return pa.table({
                    "n_name": pa.array(names, pa.string()),
                    "rev_e4": t["rev_e4"].filter(pa.array(keep)),
                })

        matched = j.map_batches(SameNation, fn_constructor_args=(sup_ref, nat_name),
                                batch_format="pyarrow", concurrency=(1, 8))
    else:
        js = j.join(sup_ds, join_type="inner", num_partitions=n,
                    on=("l_suppkey",), right_on=("s_suppkey",))

        def same_nation_join(t: pa.Table) -> pa.Table:
            s_nat = pc.cast(t["s_nationkey"], pa.int64()).combine_chunks().to_numpy()
            c_nat = pc.cast(t["c_nationkey"], pa.int64()).combine_chunks().to_numpy()
            keep = s_nat == c_nat
            names = pd.Series(c_nat[keep]).map(nat_name).to_numpy(dtype=object)
            return pa.table({
                "n_name": pa.array(names, pa.string()),
                "rev_e4": t["rev_e4"].filter(pa.array(keep)),
            })

        matched = js.map_batches(same_nation_join, batch_format="pyarrow")
    agg = matched.groupby("n_name").aggregate(Sum("rev_e4", alias_name="rev_e4"))

    def finish(t: pa.Table) -> pa.Table:
        r = t["rev_e4"].combine_chunks().to_numpy().astype(np.float64)
        return pa.table({"n_name": t["n_name"], "revenue": r / 10000.0})

    return agg.map_batches(finish, batch_format="pyarrow") \
              .sort(["revenue"], descending=True)


Q5_NATION_VOLUME_SQL = """
SELECT n_name,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE)
         / 10000.0 AS revenue
FROM customer JOIN orders   ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
              JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
              JOIN nation   ON c_nationkey = n_nationkey
              JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC
"""


# ---- ROLLUP super-aggregates -------------------------------------------------

def q_events_rollup(sf_dir: str) -> pd.DataFrame:
    """``GROUP BY ROLLUP(event_type, day)`` counts — the finest level is one
    combining groupby over the full table; both super-aggregate levels
    re-aggregate THAT small result (types × days rows), so the raw table is
    scanned and shuffled exactly once regardless of how many rollup levels
    stack on top."""
    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["event_type", "ts"])

    def keys(t: pa.Table) -> pa.Table:
        return pa.table({"event_type": t["event_type"],
                         "day": pc.strftime(t["ts"], format="%Y-%m-%d")})

    fine = ds.map_batches(keys, batch_format="pyarrow") \
             .groupby(["event_type", "day"]).aggregate(Count(alias_name="n")) \
             .to_pandas()  # types × days rows — dimension-bounded, so the
    # super-aggregate levels are a driver-side finish on the tiny result
    # (re-shuffling it through two more groupbys costs seconds of pure
    # scheduler overhead for no distribution win)
    fine["n"] = fine["n"].astype("int64")
    per_type = fine.groupby("event_type", as_index=False)["n"].sum()
    per_type["day"] = None
    grand = pd.DataFrame({"event_type": [None], "day": [None],
                          "n": [fine["n"].sum()]})
    out = pd.concat([fine, per_type[["event_type", "day", "n"]], grand],
                    ignore_index=True)
    return out[["event_type", "day", "n"]]


Q_EVENTS_ROLLUP_SQL = """
SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, count(*) AS n
FROM events GROUP BY ROLLUP(event_type, day)
"""


# ---- exact distributed NTILE --------------------------------------------------

def global_ntile(ds: rd.Dataset, keys: list[str], k: int, *,
                 tile_col: str = "tile",
                 descending: bool | list[bool] = False) -> rd.Dataset:
    """``NTILE(k) OVER (ORDER BY keys)`` distributed, with SQL's exact
    bucket-size rule (first ``n % k`` tiles get ``ceil(n/k)`` rows): sort →
    per-block row counts (one int each) → driver prefix sum → one parallel
    task per block assigns tiles vectorized.  Same machinery as
    :func:`~manga_ocr_ray.pipelines.relational.global_rank` — rows never
    funnel through the driver.  Include a unique tie-break column in
    ``keys``; NTILE over a non-total order is nondeterministic in SQL too."""
    srt = ds.sort(keys, descending=descending).materialize()
    refs = srt.get_internal_block_refs()

    @ray.remote
    def _nrows(block) -> int:
        return block.num_rows if isinstance(block, pa.Table) else len(block)

    counts = ray.get([_nrows.remote(r) for r in refs])
    n = int(sum(counts))
    bases = np.concatenate(([0], np.cumsum(counts)[:-1]))
    q, r = divmod(n, k)
    boundary = r * (q + 1)

    @ray.remote
    def _tile_block(base: int, block) -> pa.Table:
        if not isinstance(block, pa.Table):
            block = pa.Table.from_pandas(block, preserve_index=False)
        rank0 = np.arange(base, base + block.num_rows, dtype=np.int64)
        if q == 0:  # n < k: one row per tile
            tile = rank0 + 1
        else:
            tile = np.where(rank0 < boundary,
                            rank0 // (q + 1),
                            r + (rank0 - boundary) // q) + 1
        return block.append_column(tile_col, pa.array(tile))

    return rd.from_arrow_refs(
        [_tile_block.remote(int(b), ref) for b, ref in zip(bases, refs)])


def q_orders_ntile(sf_dir: str) -> rd.Dataset:
    """Every order with its price octile (NTILE(8) by totalprice desc)."""
    ds = rd.read_parquet(_pq(sf_dir, "orders"),
                         columns=["o_orderkey", "o_totalprice"])
    return global_ntile(ds, ["o_totalprice", "o_orderkey"], 8,
                        descending=[True, False])


Q_ORDERS_NTILE_SQL = """
SELECT o_orderkey, o_totalprice,
       ntile(8) OVER (ORDER BY o_totalprice DESC, o_orderkey) AS tile
FROM orders
"""


# ---- correlation aggregate (two-pass, catastrophic-cancellation-free) -------

def q_lineitem_corr(sf_dir: str) -> rd.Dataset:
    """Pearson corr(l_quantity, l_extendedprice) per returnflag.

    Naive distributed ``sxy - sx*sy/n`` loses ~8 digits to cancellation on
    1e13-magnitude sums and float block-order nondeterminism; instead:
    pass 1 computes EXACT per-group means (int64-cents combining groupby),
    pass 2 broadcasts them and accumulates centered products in float64 —
    no cancellation, so the result agrees with any other accurate
    implementation (DuckDB's streaming corr) to ~1e-12."""
    cols = ["l_returnflag", "l_quantity", "l_extendedprice"]
    ds = rd.read_parquet(_pq(sf_dir, "lineitem"), columns=cols)

    def cents_partial(t: pa.Table) -> pa.Table:
        return pa.table({
            "l_returnflag": t["l_returnflag"],
            "qty_c": _cents(t["l_quantity"]),
            "price_c": _cents(t["l_extendedprice"]),
        })

    sums = (ds.map_batches(cents_partial, batch_format="pyarrow")
              .groupby("l_returnflag")
              .aggregate(Count(alias_name="n"),
                         Sum("qty_c", alias_name="sq"),
                         Sum("price_c", alias_name="sp"))
              .to_pandas())
    means = {
        row.l_returnflag: (row.sq / row.n / 100.0, row.sp / row.n / 100.0, row.n)
        for row in sums.itertuples()
    }
    means_ref = ray.put(means)

    class CenteredPartials:
        def __init__(self, ref):
            means = ray.get(ref)
            self.mx = {k: v[0] for k, v in means.items()}
            self.my = {k: v[1] for k, v in means.items()}

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            dx = b["l_quantity"].to_numpy() - b["l_returnflag"].map(self.mx).to_numpy()
            dy = b["l_extendedprice"].to_numpy() - b["l_returnflag"].map(self.my).to_numpy()
            df = pd.DataFrame({"l_returnflag": b["l_returnflag"],
                               "sxx": dx * dx, "syy": dy * dy, "sxy": dx * dy})
            return df.groupby("l_returnflag", as_index=False).sum()

    partials = ds.map_batches(CenteredPartials, fn_constructor_args=(means_ref,),
                              batch_format="pandas", concurrency=(1, 8))
    agg = partials.groupby("l_returnflag").aggregate(
        Sum("sxx", alias_name="sxx"), Sum("syy", alias_name="syy"),
        Sum("sxy", alias_name="sxy"))

    def finish(t: pa.Table) -> pa.Table:
        sxx = t["sxx"].combine_chunks().to_numpy()
        syy = t["syy"].combine_chunks().to_numpy()
        sxy = t["sxy"].combine_chunks().to_numpy()
        flags = t["l_returnflag"].combine_chunks().to_pylist()
        ns = np.array([means[f][2] for f in flags], dtype=np.int64)
        return pa.table({
            "l_returnflag": t["l_returnflag"],
            "n": pa.array(ns),
            "corr_qty_price": pa.array(sxy / np.sqrt(sxx * syy)),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


Q_LINEITEM_CORR_SQL = """
SELECT l_returnflag, count(*) AS n,
       corr(l_quantity, l_extendedprice) AS corr_qty_price
FROM lineitem GROUP BY l_returnflag
"""


def q_lineitem_corr_matrix(sf_dir: str) -> pd.DataFrame:
    """Full pairwise Pearson correlation matrix over the four lineitem
    measures (quantity, extendedprice, discount, tax) — the
    feature-redundancy audit run before fitting anything on tabular
    features.  Same two-pass cancellation-free plan as q_lineitem_corr,
    but ALL six pairs share the two passes: pass 1 reduces each block to
    exact int64-cent sums (one row per block, driver-combined), pass 2
    accumulates the ten centered products in float64.  Driver state is
    O(blocks × 10) cells; no shuffle at all."""
    COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    NAMES = ["qty", "price", "disc", "tax"]
    ds = rd.read_parquet(_pq(sf_dir, "lineitem"), columns=COLS)

    def sums_partial(t: pa.Table) -> pa.Table:
        out = {"n": pa.array([t.num_rows], pa.int64())}
        for c, nm in zip(COLS, NAMES):
            out["s_" + nm] = pa.array(
                [int(pc.sum(_cents(t[c])).as_py() or 0)], pa.int64())
        return pa.table(out)

    s = ds.map_batches(sums_partial, batch_format="pyarrow").to_pandas().sum()
    n = int(s["n"])
    means = {nm: float(s["s_" + nm]) / 100.0 / n for nm in NAMES}

    def centered_partial(t: pa.Table) -> pa.Table:
        d = {nm: t[c].to_numpy(zero_copy_only=False) - means[nm]
             for c, nm in zip(COLS, NAMES)}
        out = {}
        for i, a in enumerate(NAMES):
            for b in NAMES[i:]:
                out[f"s_{a}_{b}"] = pa.array([float((d[a] * d[b]).sum())])
        return pa.table(out)

    m = ds.map_batches(centered_partial, batch_format="pyarrow") \
          .to_pandas().sum()
    out: dict[str, list] = {"n": [n]}
    for i, a in enumerate(NAMES):
        for b in NAMES[i + 1:]:
            out[f"corr_{a}_{b}"] = [
                float(m[f"s_{a}_{b}"]
                      / np.sqrt(m[f"s_{a}_{a}"] * m[f"s_{b}_{b}"]))]
    return pd.DataFrame(out)


Q_LINEITEM_CORR_MATRIX_SQL = """
SELECT CAST(count(*) AS BIGINT) AS n,
       corr(l_quantity, l_extendedprice) AS corr_qty_price,
       corr(l_quantity, l_discount) AS corr_qty_disc,
       corr(l_quantity, l_tax) AS corr_qty_tax,
       corr(l_extendedprice, l_discount) AS corr_price_disc,
       corr(l_extendedprice, l_tax) AS corr_price_tax,
       corr(l_discount, l_tax) AS corr_disc_tax
FROM lineitem
"""


def q_events_user_skew(sf_dir: str) -> pd.DataFrame:
    """Activity-skew audit over per-user event counts: median and p99
    events-per-user plus the share of all events held by the busiest 1% of
    users — the hot-key report read before choosing a partitioning/salting
    strategy.  Plan: ONE distributed groupby to per-user counts, then each
    block reduces to a count-of-counts histogram (domain-bounded by the max
    events any user has, never by the user count) and the driver finishes
    percentiles and the top-share from the histogram.  The boundary users
    at the 1% cut all hold the SAME count value, so the share is exact
    without ranking individual users."""
    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["user_id"])
    per_user = ds.groupby("user_id").aggregate(Count(alias_name="cnt"))

    def hist_partial(t: pa.Table) -> pa.Table:
        vals, counts = np.unique(t["cnt"].to_numpy(), return_counts=True)
        return pa.table({"cnt": pa.array(vals.astype(np.int64)),
                         "u": pa.array(counts.astype(np.int64))})

    h = (per_user.map_batches(hist_partial, batch_format="pyarrow")
         .to_pandas().groupby("cnt", as_index=False)["u"].sum()
         .sort_values("cnt").reset_index(drop=True))
    cnt = h["cnt"].to_numpy()
    u = h["u"].to_numpy()
    k = int(u.sum())
    n_events = int((cnt * u).sum())
    cu = u.cumsum()
    median = int(cnt[np.searchsorted(cu, np.ceil(0.5 * k), side="left")])
    p99 = int(cnt[np.searchsorted(cu, np.ceil(0.99 * k), side="left")])
    # busiest-1% share from the DESCENDING histogram cumulative
    k1 = np.ceil(0.01 * k)
    cu_d = u[::-1].cumsum()
    ce_d = (cnt[::-1] * u[::-1]).cumsum()
    r = int(np.searchsorted(cu_d, k1, side="left"))
    users_above = int(cu_d[r] - u[::-1][r])
    events_above = int(ce_d[r] - cnt[::-1][r] * u[::-1][r])
    share = (events_above + (k1 - users_above) * cnt[::-1][r]) / n_events
    return pd.DataFrame({"n_events": [n_events], "n_users": [k],
                         "median_per_user": [median], "p99_per_user": [p99],
                         "top1pct_share": [float(share)]})


Q_EVENTS_USER_SKEW_SQL = """
WITH uc AS (SELECT user_id, count(*) AS cnt FROM events GROUP BY 1),
h AS (SELECT cnt, CAST(count(*) AS BIGINT) AS u FROM uc GROUP BY 1),
c AS (SELECT cnt, u,
             sum(u) OVER (ORDER BY cnt) AS cu,
             sum(u) OVER () AS k,
             sum(cnt * u) OVER () AS n FROM h),
d AS (SELECT cnt, u,
             sum(u) OVER (ORDER BY cnt DESC) AS cu_d,
             sum(cnt * u) OVER (ORDER BY cnt DESC) AS ce_d,
             sum(u) OVER () AS k FROM h),
sel AS (SELECT cnt, u, cu_d, ce_d, k FROM d
        WHERE cu_d >= ceil(0.01 * k) ORDER BY cnt DESC LIMIT 1)
SELECT CAST(min(c.n) AS BIGINT) AS n_events,
       CAST(min(c.k) AS BIGINT) AS n_users,
       CAST(min(c.cnt) FILTER (WHERE c.cu >= ceil(0.5 * c.k)) AS BIGINT)
         AS median_per_user,
       CAST(min(c.cnt) FILTER (WHERE c.cu >= ceil(0.99 * c.k)) AS BIGINT)
         AS p99_per_user,
       (min(sel.ce_d) - min(sel.cnt) * min(sel.u)
        + (ceil(0.01 * min(sel.k)) - (min(sel.cu_d) - min(sel.u)))
          * min(sel.cnt)) / min(c.n) AS top1pct_share
FROM c CROSS JOIN sel
"""


# ---- INTERSECT ---------------------------------------------------------------

def q_nations_intersect(sf_dir: str) -> rd.Dataset:
    """Nations with BOTH a high-balance customer AND a high-balance supplier
    — INTERSECT as tag-union-groupby: each side reduces to its distinct keys
    (map-side combining), unions with a side bitmask, and one groupby keeps
    keys whose mask ORs to 3.  One small shuffle over distinct keys only."""
    cust = rd.read_parquet(_pq(sf_dir, "customer"),
                           columns=["c_nationkey", "c_acctbal"])
    sup = rd.read_parquet(_pq(sf_dir, "supplier"),
                          columns=["s_nationkey", "s_acctbal"])

    def side(key: str, bal: str, mask: int, thr: float):
        def f(t: pa.Table) -> pa.Table:
            t = t.filter(pc.greater(t[bal], pa.scalar(thr)))
            return pa.table({
                "nationkey": pc.cast(t[key], pa.int32()),
                "mask": pa.array(np.full(t.num_rows, mask, dtype=np.int64)),
            })
        return f

    tagged = cust.map_batches(side("c_nationkey", "c_acctbal", 1, 9000.0),
                              batch_format="pyarrow") \
                 .union(sup.map_batches(side("s_nationkey", "s_acctbal", 2, 5000.0),
                                        batch_format="pyarrow"))
    # Max is a valid OR-combiner here only because each side contributes one
    # mask value; use two groupbys (distinct per side) then sum if sides
    # could repeat a key with different masks — they can't after tagging.
    both = tagged.groupby("nationkey").aggregate(
        Max("mask", alias_name="hi"), Min("mask", alias_name="lo"))
    both = both.map_batches(
        lambda t: t.filter(pc.and_(pc.equal(t["hi"], pa.scalar(2, pa.int64())),
                                   pc.equal(t["lo"], pa.scalar(1, pa.int64()))))
                   .select(["nationkey"]),
        batch_format="pyarrow")
    return both


Q_NATIONS_INTERSECT_SQL = """
SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9000
INTERSECT
SELECT s_nationkey FROM supplier WHERE s_acctbal > 5000
"""


# ---- per-group dense rank ------------------------------------------------------

def q_parts_dense_rank(sf_dir: str) -> rd.Dataset:
    """DENSE_RANK of retail price within brand — hash-partition by brand,
    one vectorized pandas rank per group (groups are per-brand small; the
    shuffle is the same single exchange SQL's PARTITION BY implies)."""
    ds = rd.read_parquet(_pq(sf_dir, "part"),
                         columns=["p_partkey", "p_brand", "p_retailprice"])

    def rank(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["rnk"] = g["p_retailprice"].rank(method="dense", ascending=False) \
                                     .astype("int64")
        return g

    return ds.groupby("p_brand").map_groups(rank, batch_format="pandas")


Q_PARTS_DENSE_RANK_SQL = """
SELECT p_partkey, p_brand, p_retailprice,
       dense_rank() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS rnk
FROM part
"""


# ---- TPC-H Q17 shape: correlated aggregate subquery --------------------------

def q17_avg_yearly(sf_dir: str, brand: str = "Brand#23") -> pd.DataFrame:
    """Average yearly revenue lost if small-quantity orders (below 20% of the
    part's average quantity) went unfilled — TPC-H Q17's correlated-aggregate
    shape: a per-group aggregate computed over the fact table is applied back
    as a per-row predicate on the SAME table.

    Ray plan (no correlated re-scan, one pass + one tiny groupby):
    - the brand's partkeys are a selective dimension slice (1/|brands| of
      part — BOUNDED: even at 100 TB that is ~2e6 int64 keys ≈ 16 MB,
      inside the broadcast budget) → broadcast key set, map-side prune of
      lineitem.  # documented-alternative: for an UNBOUNDED prune set the
      # same shape runs through ``stages.bloomjoin`` (distributed partial
      # blooms, map-side prune, exact join on survivors) — exercised as
      # its own operator, q_lineitem_bloom_semi;
    - the pruned projection (partkey + 2 int64-cents cols, ~24 B/row) is
      materialized once and consumed twice: per-part (sum_qty, n) via a
      combining groupby, then the threshold filter;
    - the per-part stats table is bounded by the brand's part cardinality
      (sublinear) → broadcast back as numpy maps; the predicate
      ``qty < 0.2·avg`` is evaluated in exact integers as
      ``5·n·qty_cents < sum_qty_cents`` — no float division anywhere until
      the single final /700.0.
    """
    from .relational import _broadcast_max_rows

    part = pd.read_parquet(_pq(sf_dir, "part"), columns=["p_partkey", "p_brand"])
    keys = part.loc[part["p_brand"] == brand, "p_partkey"].to_numpy(np.int64)
    keys_ref = ray.put(keys)

    li = rd.read_parquet(_pq(sf_dir, "lineitem"),
                         columns=["l_partkey", "l_quantity", "l_extendedprice"])

    def prune(t: pa.Table) -> pa.Table:
        ks = pa.array(ray.get(keys_ref), pa.int64())
        t = t.filter(pc.is_in(pc.cast(t["l_partkey"], pa.int64()),
                              value_set=ks))
        return pa.table({"l_partkey": t["l_partkey"],
                         "qty_c": _cents(t["l_quantity"]),
                         "price_c": _cents(t["l_extendedprice"])})

    pruned = li.map_batches(prune, batch_format="pyarrow").materialize()

    # per-part (sum_qty, n): block-local partials (bounded by the brand's
    # part cardinality per block), combined on the driver when small, else
    # through a groupby over the already-shrunk partial stream
    def pstats(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"k": t["l_partkey"].to_pandas(),
                           "q": t["qty_c"].to_pandas()})
        g = df.groupby("k", sort=False)["q"].agg(["sum", "size"])
        return pa.table({"l_partkey": pa.array(g.index, pa.int64()),
                         "sumq": pa.array(g["sum"], pa.int64()),
                         "n": pa.array(g["size"], pa.int64())})

    partials = pruned.map_batches(pstats, batch_format="pyarrow").materialize()
    if partials.count() <= _broadcast_max_rows():
        stats = partials.to_pandas().groupby("l_partkey").agg(
            sumq=("sumq", "sum"), n=("n", "sum")).reset_index()
    else:
        stats = partials.groupby("l_partkey").aggregate(
            Sum("sumq", alias_name="sumq"), Sum("n", alias_name="n")) \
            .to_pandas()
    sumq = stats.set_index("l_partkey")["sumq"].astype(np.int64)
    npart = stats.set_index("l_partkey")["n"].astype(np.int64)
    sumq_ref, n_ref = ray.put(sumq), ray.put(npart)

    def small_qty(b: pd.DataFrame) -> pd.DataFrame:
        sq, nn = ray.get(sumq_ref), ray.get(n_ref)
        k = b["l_partkey"]
        keep = 5 * b["qty_c"].to_numpy() * k.map(nn).to_numpy() \
               < k.map(sq).to_numpy()
        return pd.DataFrame({"price_c": b.loc[keep, "price_c"]})

    total = pruned.map_batches(small_qty, batch_format="pandas") \
                  .sum("price_c")
    return pd.DataFrame({"avg_yearly": [float(total or 0) / 700.0]})


Q17_AVG_YEARLY_SQL = """
WITH pruned AS (
  SELECT l_partkey,
         CAST(round(l_quantity * 100) AS BIGINT) AS qty_c,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#23'),
st AS (SELECT l_partkey, sum(qty_c) AS sumq, count(*) AS n
       FROM pruned GROUP BY l_partkey)
SELECT CAST(sum(price_c) AS DOUBLE) / 700.0 AS avg_yearly
FROM pruned JOIN st USING (l_partkey)
WHERE 5 * qty_c * n < sumq
"""


# ---- bloom-filter pruned exact semi-join -------------------------------------

def q_lineitem_bloom_semi(sf_dir: str) -> pd.DataFrame:
    """Revenue of line items belonging to URGENT orders via
    ``stages.bloomjoin.bloom_semi_join``: the urgent-orderkey set is turned
    into a distributed-built bloom filter (per-block partial bit arrays
    OR-reduced, never the keys), lineitem is pruned MAP-SIDE (no shuffle on
    ~80% of rows at this selectivity), and the exact hash join runs only on
    the survivors — results are exact, the all-to-all exchange shrinks to
    the semi-join's true output plus the filter's ~0.03% false positives."""
    from ..stages.bloomjoin import bloom_semi_join

    orders = rd.read_parquet(_pq(sf_dir, "orders"),
                             columns=["o_orderkey", "o_orderpriority"])
    urgent = orders.map_batches(
        lambda t: t.filter(pc.equal(t["o_orderpriority"], "1-URGENT"))
                   .select(["o_orderkey"]),
        batch_format="pyarrow")
    li = rd.read_parquet(_pq(sf_dir, "lineitem"),
                         columns=["l_orderkey", "l_extendedprice", "l_returnflag"])

    def rev(t: pa.Table) -> pa.Table:
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "l_returnflag": t["l_returnflag"],
                         "price_c": _cents(t["l_extendedprice"])})

    li = li.map_batches(rev, batch_format="pyarrow")
    semi = bloom_semi_join(li, "l_orderkey", urgent, "o_orderkey",
                           num_partitions=_join_partitions())

    # |returnflag| = 3: each survivor block reduces to ≤3 partial rows and
    # the blocks×3 table combines on the driver — a corpus-keyed aggregate
    # here only added an exchange plus empty-partition schema warnings.
    def partial(t: pa.Table) -> pa.Table:
        enc = pc.dictionary_encode(t["l_returnflag"].combine_chunks())
        codes = enc.indices.to_numpy(zero_copy_only=False)
        price = t["price_c"].to_numpy(zero_copy_only=False)
        sums, ns = [], []
        for k in range(len(enc.dictionary)):
            m = codes == k
            ns.append(int(m.sum()))
            sums.append(int(price[m].sum()))
        return pa.table({"l_returnflag": pc.cast(enc.dictionary, pa.string()),
                         "sum_c": pa.array(sums, pa.int64()),
                         "n_items": pa.array(ns, pa.int64())})

    p = (semi.map_batches(partial, batch_format="pyarrow")
             .to_pandas().groupby("l_returnflag", as_index=False).sum())
    return pd.DataFrame({
        "l_returnflag": p["l_returnflag"],
        "urgent_revenue": p["sum_c"].to_numpy().astype(np.float64) / 100.0,
        "n_items": p["n_items"].astype(np.int64),
    })


Q_LINEITEM_BLOOM_SEMI_SQL = """
SELECT l_returnflag,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
         / 100.0 AS urgent_revenue,
       count(*) AS n_items
FROM lineitem
WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                     WHERE o_orderpriority = '1-URGENT')
GROUP BY l_returnflag
"""


# ---- first_value / last_value window -----------------------------------------

def q_events_first_last(sf_dir: str) -> rd.Dataset:
    """Per-user first and last event type by (ts, event_id) —
    FIRST_VALUE/LAST_VALUE over an unbounded frame.  Same shard machinery as
    sessionization: hash-shard by user, ONE vectorized pandas pass per shard
    (sort + boundary take), never a per-user task."""
    from .relational import _shard_by_int

    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["event_id", "ts", "user_id", "event_type"])

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        first = g.drop_duplicates("user_id", keep="first")
        last = g.drop_duplicates("user_id", keep="last")
        return pd.DataFrame({
            "user_id": first["user_id"].to_numpy(),
            "first_type": first["event_type"].to_numpy(),
            "last_type": last["event_type"].to_numpy(),
            "n_events": g.groupby("user_id", sort=True).size().to_numpy(),
        })

    return _shard_by_int(ds, "user_id").groupby("shard") \
        .map_groups(per_shard, batch_format="pandas")


Q_EVENTS_FIRST_LAST_SQL = """
SELECT DISTINCT user_id,
       first_value(event_type) OVER w AS first_type,
       last_value(event_type)  OVER w AS last_type,
       count(*)                OVER (PARTITION BY user_id) AS n_events
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


# ---- COUNT(DISTINCT) per group -------------------------------------------------

def q_events_user_active_days(sf_dir: str) -> rd.Dataset:
    """Per-user active-day count + total events — COUNT(DISTINCT expr) GROUP
    BY key as two CHAINED combining groupbys: distinct (user, day) pairs
    carry their event count ``_c``, so the second groupby derives BOTH
    outputs (Count → n_days, Sum(_c) → n_events) from one stream.  No join
    at all — the earlier two-aggregate hash-join plan was one more shuffle
    AND intermittently hit Acero's empty-hash-partition schema-loss wedge
    (``FieldRef.Name(user_id)``) when a partition of either agg came up
    empty at small scale."""
    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["user_id", "ts"])

    def add_day(t: pa.Table) -> pa.Table:
        day = pc.cast(pc.floor_temporal(t["ts"], unit="day"), pa.date32())
        return pa.table({"user_id": t["user_id"],
                         "day": pc.cast(day, pa.int32())})

    days = ds.map_batches(add_day, batch_format="pyarrow")
    agg = (days.groupby(["user_id", "day"]).aggregate(Count(alias_name="_c"))
           .groupby("user_id")
           .aggregate(Count(alias_name="n_days"), Sum("_c", alias_name="n_events")))

    def as_i64(t: pa.Table) -> pa.Table:
        return pa.table({"user_id": t["user_id"],
                         "n_days": pc.cast(t["n_days"], pa.int64()),
                         "n_events": pc.cast(t["n_events"], pa.int64())})

    return agg.map_batches(as_i64, batch_format="pyarrow")


Q_EVENTS_USER_ACTIVE_DAYS_SQL = """
SELECT user_id, count(DISTINCT CAST(ts AS DATE)) AS n_days,
       count(*) AS n_events
FROM events GROUP BY user_id
"""


# ---- cohort retention ----------------------------------------------------------

def q_events_cohort_retention(sf_dir: str) -> rd.Dataset:
    """Classic cohort-retention matrix: users grouped by first-seen day,
    distinct active users per (cohort_day, day_offset).

    The first-seen table is ONE combining groupby (user cardinality —
    sublinear), then meets the event stream via the shared cardinality
    switch (``relational._broadcast_max_rows``): a small user table is
    broadcast once via ``ray.put``; a web-scale one (10^9 users would OOM
    the driver) hash-joins on user_id — the same key the distinct stage
    shuffles on anyway — with partitions sized to the measured user count;
    then distinct (cohort, offset, user) → count, two more combining
    groupbys."""
    from .relational import _broadcast_max_rows, _join_partitions

    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["user_id", "ts"])

    def add_day(t: pa.Table) -> pa.Table:
        day = pc.cast(pc.cast(pc.floor_temporal(t["ts"], unit="day"),
                              pa.date32()), pa.int32())
        return pa.table({"user_id": t["user_id"], "day": day})

    days = ds.map_batches(add_day, batch_format="pyarrow")

    # Small path: ONE corpus pass emits per-block distinct fused
    # (user << 17 | day) keys (day = date32 epoch-days < 2^17 until year
    # 2328); the driver unique-sorts the partials, derives first-seen per
    # user, offsets and cell counts as pure numpy — zero shuffles.  A
    # partial stream past the broadcast bound falls through to the
    # distributed plan below.
    def pfuse(t: pa.Table) -> pa.Table:
        u = t["user_id"].combine_chunks().to_numpy().astype(np.int64)
        d = t["day"].combine_chunks().to_numpy().astype(np.int64)
        assert not len(d) or (d.max() < (1 << 17) and d.min() >= 0), \
            "day outside fuse budget"
        return pa.table({"k": pa.array(np.unique((u << 17) | d))})

    partials = days.map_batches(pfuse, batch_format="pyarrow").materialize()
    if partials.count() <= _broadcast_max_rows():
        k = np.unique(partials.to_pandas()["k"].to_numpy())
        u = k >> 17
        d = (k & ((1 << 17) - 1)).astype(np.int64)
        first_of_user = np.r_[True, u[1:] != u[:-1]]  # k sorted ⇒ (u, d) sorted
        cohort = d[first_of_user][np.cumsum(first_of_user) - 1]
        off = d - cohort
        cells, counts = np.unique((cohort << 16) | off, return_counts=True)
        di = (cells >> 16).astype(np.int32).astype("datetime64[D]")
        return rd.from_arrow(pa.table({
            "cohort_day": pa.array(di.astype(str)),
            "day_offset": pa.array(cells & 0xFFFF, pa.int64()),
            "n_users": pa.array(counts, pa.int64())}))

    firsts = days.groupby("user_id").aggregate(
        Min("day", alias_name="cohort")).materialize()
    n_users = firsts.count()

    # distinct (cohort, offset, user) ≡ distinct (user, day) — cohort and
    # offset are FUNCTIONS of (user, day) — so dedupe on the narrow pair
    # FIRST with the sharded vectorized pass (one single-int-key exchange;
    # the 3-key Aggregate this replaces measured 7.3 s on 100 k rows vs
    # ~1.5 s for this plan: multi-key sort-aggregate pays per-key overhead
    # per block)
    from .relational import _shard_by_int

    days = _shard_by_int(days, "user_id").groupby("shard").map_groups(
        lambda g: g.drop_duplicates(["user_id", "day"])[["user_id", "day"]],
        batch_format="pandas")

    if n_users > _broadcast_max_rows():
        n_parts = max(1, min(_join_partitions(), n_users // 1000))
        joined = days.join(firsts, join_type="inner", num_partitions=n_parts,
                           on=("user_id",))

        def offset_join(t: pa.Table) -> pa.Table:
            c = t["cohort"].to_numpy().astype(np.int32)
            return pa.table({
                "cohort_di": pa.array(c, pa.int32()),
                "day_offset": pa.array(
                    t["day"].to_numpy().astype(np.int32) - c, pa.int64()),
                "user_id": t["user_id"]})

        offs = joined.map_batches(offset_join, batch_format="pyarrow")
    else:
        cohort_ref = ray.put(
            firsts.to_pandas().set_index("user_id")["cohort"].astype(np.int32))

        class Offset:
            def __init__(self, ref):
                self.cohort = ray.get(ref)

            def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
                c = b["user_id"].map(self.cohort).to_numpy(dtype=np.int32)
                return pd.DataFrame({"cohort_di": c,
                                     "day_offset": (b["day"].to_numpy(np.int32) - c)
                                                   .astype(np.int64),
                                     "user_id": b["user_id"]})

        offs = days.map_batches(Offset, fn_constructor_args=(cohort_ref,),
                                batch_format="pandas", concurrency=(1, 8))

    # input is already (user, day)-distinct → count per cell on ONE fused
    # int64 key (cohort·2^16 + offset; offsets are bounded by the corpus
    # day span, asserted < 2^16 ≈ 180 years) — the single-key groupby fast
    # path, then unpack
    def fuse(t: pa.Table) -> pa.Table:
        c = t["cohort_di"].combine_chunks().to_numpy().astype(np.int64)
        o = t["day_offset"].combine_chunks().to_numpy()
        assert not len(o) or o.max() < (1 << 16), "day span exceeds fuse budget"
        return pa.table({"k": pa.array((c << 16) | o)})

    dist = offs.map_batches(fuse, batch_format="pyarrow") \
               .groupby("k").aggregate(Count(alias_name="n_users"))

    def finish(t: pa.Table) -> pa.Table:
        k = t["k"].combine_chunks().to_numpy()
        di = (k >> 16).astype(np.int32).astype("datetime64[D]")
        return pa.table({"cohort_day": pa.array(di.astype(str)),
                         "day_offset": pa.array(k & 0xFFFF, pa.int64()),
                         "n_users": pc.cast(t["n_users"], pa.int64())})

    return dist.map_batches(finish, batch_format="pyarrow")


Q_EVENTS_COHORT_RETENTION_SQL = """
WITH firsts AS (SELECT user_id, min(CAST(ts AS DATE)) AS f
                FROM events GROUP BY user_id),
d AS (SELECT DISTINCT f.f AS cohort, date_diff('day', f.f, CAST(e.ts AS DATE))
                 AS day_offset, e.user_id
      FROM events e JOIN firsts f USING (user_id))
SELECT CAST(cohort AS VARCHAR) AS cohort_day, day_offset,
       count(*) AS n_users
FROM d GROUP BY cohort, day_offset
"""


# ---- skew-aware join ------------------------------------------------------------

def q_events_segment_revenue(sf_dir: str) -> rd.Dataset:
    """Event value by customer market segment through the SKEW-AWARE join
    (``stages.skewjoin``): heavy-hitter users are detected with the
    bounded-memory summary, their rows merged map-side against broadcast
    dim rows, the cold remainder hash-joins with near-uniform partitions.
    The SQL oracle is the plain inner join — proving the split+union path
    is semantically invisible.  ``hot_frac`` is set low so the hot path is
    actually exercised on the near-uniform driver corpus (pytest pins
    hot+cold equivalence; at 100 TB the default 0.001 only triggers on
    true celebrity keys)."""
    from ..stages.skewjoin import skew_join_fact_dim

    ev = rd.read_parquet(_pq(sf_dir, "events"), columns=["user_id", "value"])

    def cents(t: pa.Table) -> pa.Table:
        return pa.table({"user_id": t["user_id"], "val_c": _cents(t["value"])})

    ev = ev.map_batches(cents, batch_format="pyarrow")
    cust = rd.read_parquet(_pq(sf_dir, "customer"),
                           columns=["c_custkey", "c_mktsegment"])
    joined = skew_join_fact_dim(ev, "user_id", cust, "c_custkey",
                                num_partitions=_join_partitions(),
                                hot_frac=0.005)
    agg = joined.groupby("c_mktsegment").aggregate(
        Sum("val_c", alias_name="sum_c"), Count(alias_name="n_events"))

    def finish(t: pa.Table) -> pa.Table:
        s = t["sum_c"].combine_chunks().to_numpy().astype(np.float64)
        return pa.table({"c_mktsegment": t["c_mktsegment"],
                         "total_value": s / 100.0,
                         "n_events": pc.cast(t["n_events"], pa.int64())})

    return agg.map_batches(finish, batch_format="pyarrow")


Q_EVENTS_SEGMENT_REVENUE_SQL = """
SELECT c_mktsegment,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
         AS total_value,
       count(*) AS n_events
FROM events JOIN customer ON user_id = c_custkey
GROUP BY c_mktsegment
"""


# ---- CUBE super-aggregates ------------------------------------------------------

def q_events_cube(sf_dir: str) -> pd.DataFrame:
    """``GROUP BY CUBE(event_type, dow)`` — all four grouping sets from ONE
    combining groupby of the raw table; the three super-levels are a
    driver-side finish on the dimension-bounded fine result (same policy as
    q_events_rollup: re-shuffling a types × 7 table is pure overhead)."""
    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["event_type", "ts"])

    def keys(t: pa.Table) -> pa.Table:
        # ISO dow 1-7 to match DuckDB's isodow()
        return pa.table({"event_type": t["event_type"],
                         "dow": pc.cast(pc.add(pc.day_of_week(t["ts"]),
                                               pa.scalar(1)), pa.int64())})

    fine = ds.map_batches(keys, batch_format="pyarrow") \
             .groupby(["event_type", "dow"]).aggregate(Count(alias_name="n")) \
             .to_pandas()
    fine["n"] = fine["n"].astype("int64")
    per_type = fine.groupby("event_type", as_index=False)["n"].sum()
    per_type["dow"] = np.nan
    per_dow = fine.groupby("dow", as_index=False)["n"].sum()
    per_dow["event_type"] = None
    grand = pd.DataFrame({"event_type": [None], "dow": [np.nan],
                          "n": [fine["n"].sum()]})
    out = pd.concat([fine, per_type[["event_type", "dow", "n"]],
                     per_dow[["event_type", "dow", "n"]], grand],
                    ignore_index=True)
    out["dow"] = out["dow"].astype("float64")
    return out[["event_type", "dow", "n"]]


Q_EVENTS_CUBE_SQL = """
SELECT event_type, CAST(isodow(ts) AS DOUBLE) AS dow, count(*) AS n
FROM events GROUP BY CUBE(event_type, CAST(isodow(ts) AS DOUBLE))
"""


# ---- null handling: COALESCE / fillna / dropna as first-class transforms --------

def q_events_fill_clean(sf_dir: str) -> rd.Dataset:
    """Null-handling kernels (D3 family): COALESCE(value, 0), fill null
    props with '{}', drop rows with null event_type — one vectorized Arrow
    pass (fill_null / drop_null are C kernels)."""
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["event_id", "event_type", "value", "props"])

    def clean(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["event_type"]))
        return pa.table({
            "event_id": t["event_id"],
            "event_type": t["event_type"],
            "value_filled": pc.fill_null(t["value"], pa.scalar(0.0)),
            "props_filled": pc.fill_null(t["props"], pa.scalar("{}")),
        })

    return ds.map_batches(clean, batch_format="pyarrow")


Q_EVENTS_FILL_CLEAN_SQL = """
SELECT event_id, event_type,
       COALESCE(value, 0.0) AS value_filled,
       COALESCE(props, '{}') AS props_filled
FROM events WHERE event_type IS NOT NULL
"""


# ---- ordered-sequence funnel (MATCH_RECOGNIZE-lite) --------------------------

def q_events_funnel(sf_dir: str) -> rd.Dataset:
    """Per-user ordered funnel view → click → purchase with
    earliest-completion semantics: t1 = first 'view', t2 = first 'click'
    strictly after t1, t3 = first 'purchase' strictly after t2; stage = how
    deep the user got (0–3).  The ordered-sequence/funnel shape (SQL
    MATCH_RECOGNIZE-lite) that event-analytics engines treat as a primitive.

    Distribution: ONE hash partition on user_id (``_shard_by_int`` — same
    ordering contract as sessionization: within-shard sort, never block
    order), then each funnel stage is a vectorized pandas pass over the
    whole shard — per-user min-reductions via groupby transforms, no
    per-user Python.  At 10^12 events this is the sessionization plan: the
    event stream shuffles once on the reused user_id key; stage state is
    three per-user timestamps (tiny)."""
    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["user_id", "ts", "event_type"])
    from .relational import _shard_by_int

    return _shard_by_int(ds, "user_id").groupby("shard").map_groups(
        _funnel_shard, batch_format="pandas")


FUNNEL_STEPS = ["view", "click", "purchase"]


def _funnel_shard(g: pd.DataFrame) -> pd.DataFrame:
    """One vectorized funnel pass over a user-complete shard."""
    users = pd.DataFrame({"user_id": g["user_id"].unique()})
    prev = None  # per-user timestamp of the previous completed stage
    stage = pd.Series(0, index=users["user_id"], dtype="int64")
    for depth, step in enumerate(FUNNEL_STEPS, start=1):
        rows = g[g["event_type"] == step]
        if prev is not None:
            cut = rows["user_id"].map(prev)
            rows = rows[rows["ts"] > cut]  # NaT compares False → drops
        t = rows.groupby("user_id")["ts"].min()
        stage[stage.index.isin(t.index) & (stage == depth - 1)] = depth
        # only users who reached this stage can advance past it
        prev = t[stage[t.index] == depth]
    return pd.DataFrame({"user_id": stage.index.to_numpy(),
                         "stage": stage.to_numpy()})


Q_EVENTS_FUNNEL_SQL = """
WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
           WHERE event_type = 'view' GROUP BY user_id),
c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN v USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id),
p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN c USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id)
SELECT u.user_id,
       CASE WHEN p.user_id IS NOT NULL THEN 3
            WHEN c.user_id IS NOT NULL THEN 2
            WHEN v.user_id IS NOT NULL THEN 1
            ELSE 0 END AS stage
FROM (SELECT DISTINCT user_id FROM events) u
LEFT JOIN v USING (user_id) LEFT JOIN c USING (user_id)
LEFT JOIN p USING (user_id)
"""


# ---- time-RANGE trailing window (interval frame, not row frame) --------------

def q_events_trailing_hour(sf_dir: str) -> rd.Dataset:
    """Per event: count and exact-cents sum of the same user's events in the
    trailing 1-hour RANGE window (``RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
    AND CURRENT ROW`` — value-based frame incl. equal-ts peers, unlike the
    row-based frames of events_moving_avg / events_cumulative).

    Distribution: one hash partition on user_id (the reused events key),
    then ONE vectorized pass per shard across all its users: per-user ts
    columns are lifted into a single globally sorted int64 axis by adding a
    per-user base offset (stride > shard ts-range + window), so both frame
    edges come from two whole-shard ``np.searchsorted`` calls and the sums
    from prefix-sum differences — no per-user Python loop.  Money math in
    int64 cents (floats sum order-nondeterministically across blocks)."""
    from .relational import _shard_by_int

    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["event_id", "user_id", "ts", "value"])
    return _shard_by_int(ds, "user_id").groupby("shard").map_groups(
        _trailing_hour_shard, batch_format="pandas")


def _trailing_hour_shard(g: pd.DataFrame, window_us: int = 3_600_000_000
                         ) -> pd.DataFrame:
    g = g.sort_values(["user_id", "ts"], kind="mergesort").reset_index(drop=True)
    ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    uid = g["user_id"].to_numpy()
    cents = np.round(g["value"].to_numpy() * 100.0).astype(np.int64)
    # contiguous per-user segments → user index 0..U-1 per row
    new_user = np.r_[True, uid[1:] != uid[:-1]]
    user_ix = np.cumsum(new_user) - 1
    if len(ts):
        # Lift each user onto a shared sorted axis via CUMULATIVE per-user
        # offsets (cumsum of actual spans + 2*window), not a uniform
        # users×shard-span stride: the uniform stride overflows int64 at
        # ~3e5 users/shard on a year-span corpus and silently breaks the
        # sortedness the searchsorted frames rely on.  Cumulative offsets
        # need only sum(per-user spans) + 2·window·U to fit int64 — ~292k
        # user-YEARS of activity per shard — and we assert even that.
        seg_start = np.flatnonzero(new_user)
        seg_last = np.r_[seg_start[1:], len(ts)] - 1
        spans = ts[seg_last] - ts[seg_start]
        base = np.r_[0, np.cumsum(spans[:-1] + 2 * window_us)]
        assert float(spans.sum()) + 2.0 * window_us * len(spans) < 2**62, \
            "trailing-window lift would overflow int64; re-shard smaller"
        lifted = (ts - ts[seg_start][user_ix]) + base[user_ix]
    else:
        lifted = ts
    lo = np.searchsorted(lifted, lifted - window_us, side="left")
    hi = np.searchsorted(lifted, lifted, side="right")  # equal-ts peers in-frame
    prefix = np.r_[0, np.cumsum(cents)]
    return pd.DataFrame({
        "event_id": g["event_id"],
        "n_1h": (hi - lo).astype(np.int64),
        "sum_1h": (prefix[hi] - prefix[lo]) / 100.0,
    })


Q_EVENTS_TRAILING_HOUR_SQL = """
SELECT event_id,
       count(*) OVER w AS n_1h,
       round(sum(value) OVER w, 2) AS sum_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
"""


# ---- mode aggregate (argmax-count per group, deterministic tie-break) --------

def q_events_user_mode(sf_dir: str) -> rd.Dataset:
    """Most frequent event_type per user (ties → lexicographically smallest
    type).  The mode/argmax-count aggregate: a combining groupby computes
    (user, type) counts — the only corpus-sized exchange — then the winner
    per user is one vectorized sort + drop_duplicates per user shard."""
    from .relational import _shard_by_int

    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["user_id", "event_type"])
    counts = ds.groupby(["user_id", "event_type"]).aggregate(
        Count(alias_name="n"))

    def winner(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "n", "event_type"],
                          ascending=[True, False, True], kind="mergesort")
        out = g.drop_duplicates("user_id")[["user_id", "event_type", "n"]]
        return out.rename(columns={"event_type": "mode_type"})

    return _shard_by_int(counts, "user_id").groupby("shard").map_groups(
        winner, batch_format="pandas")


Q_EVENTS_USER_MODE_SQL = """
WITH c AS (SELECT user_id, event_type, count(*) AS n
           FROM events GROUP BY user_id, event_type),
r AS (SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY n DESC, event_type) AS rk FROM c)
SELECT user_id, event_type AS mode_type, n FROM r WHERE rk = 1
"""


# ---- FULL OUTER join with null fill (nation coverage balance) ----------------

def q_nation_balance_fullouter(sf_dir: str) -> rd.Dataset:
    """Per nation: count of rich customers (acctbal > 9500) FULL OUTER JOIN
    count of rich suppliers (acctbal > 6000), zero-filled — the outer-join
    + COALESCE shape, driver-visible (extract.py's golden verification uses
    full_outer internally; this is the relational-surface twin).  Both
    sides pre-aggregate to nation cardinality before the join, so the
    exchange is 25 rows regardless of corpus size."""
    cust = (rd.read_parquet(_pq(sf_dir, "customer"),
                            columns=["c_nationkey", "c_acctbal"])
            .filter(expr="c_acctbal > 9500")
            .groupby("c_nationkey").aggregate(Count(alias_name="rich_custs")))
    supp = (rd.read_parquet(_pq(sf_dir, "supplier"),
                            columns=["s_nationkey", "s_acctbal"])
            .filter(expr="s_acctbal > 6000")
            .groupby("s_nationkey").aggregate(Count(alias_name="rich_supps")))

    def key_c(t: pa.Table) -> pa.Table:
        return t.rename_columns(["nationkey", "rich_custs"])

    def key_s(t: pa.Table) -> pa.Table:
        return t.rename_columns(["nationkey", "rich_supps"])

    left = cust.map_batches(key_c, batch_format="pyarrow")
    right = supp.map_batches(key_s, batch_format="pyarrow")
    # single partition: both sides are ≤25 rows post-aggregate, and a sparse
    # side (sf0.001 has ONE rich-supplier nation) leaves >1 hash partitions
    # empty, which wedges Acero's full-outer finalize (KeyError on the key —
    # the same empty-partition wedge the bloom/skew joins guard against)
    out = left.join(right, join_type="full_outer", num_partitions=1,
                    on=("nationkey",))

    def fill(t: pa.Table) -> pa.Table:
        return pa.table({
            "nationkey": pc.cast(t["nationkey"], pa.int64()),
            "rich_custs": pc.cast(t["rich_custs"].fill_null(0), pa.int64()),
            "rich_supps": pc.cast(t["rich_supps"].fill_null(0), pa.int64()),
        })

    return out.map_batches(fill, batch_format="pyarrow")


Q_NATION_BALANCE_FULLOUTER_SQL = """
WITH c AS (SELECT c_nationkey AS nationkey, count(*) AS rich_custs
           FROM customer WHERE c_acctbal > 9500 GROUP BY c_nationkey),
s AS (SELECT s_nationkey AS nationkey, count(*) AS rich_supps
      FROM supplier WHERE s_acctbal > 6000 GROUP BY s_nationkey)
SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
       COALESCE(rich_custs, 0) AS rich_custs,
       COALESCE(rich_supps, 0) AS rich_supps
FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
"""


# ---- calendar gap fill (dense time axis + zero-filled left join) --------------

def q_events_hourly_dense(sf_dir: str) -> rd.Dataset:
    """Hourly event counts over a DENSE calendar axis — hours with no events
    appear as zero rows (the time-series gap-fill / dimension-generation
    shape; the sparse twin is events_hourly).

    Distribution: the corpus-sized work is one combining groupby to hourly
    counts; the dense axis is GENERATED as a Dataset (``rd.range`` over the
    hour span — never a driver-side list), keyed on epoch-hour int64, and
    left-joins the counts.  The only driver-side values are the min/max
    hour scalars."""
    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["ts"])

    def to_hour(t: pa.Table) -> pa.Table:
        h = pc.cast(pc.floor_temporal(t["ts"], unit="hour"), pa.int64())
        return pa.table({"hour_us": h})

    hours = ds.map_batches(to_hour, batch_format="pyarrow")
    counts = hours.groupby("hour_us").aggregate(Count(alias_name="n_events"))
    counts = counts.materialize()
    HOUR_US = 3_600_000_000
    if counts.count() == 0:
        # empty events table: min()/max() return None — emit the typed
        # empty result instead of int(None)
        return rd.from_arrow(pa.table({
            "window_start": pa.array([], pa.timestamp("us")),
            "n_events": pa.array([], pa.int64())}))
    h0 = int(counts.min("hour_us")) // HOUR_US
    h1 = int(counts.max("hour_us")) // HOUR_US

    def to_axis(t: pa.Table) -> pa.Table:
        ids = t["id"].combine_chunks().to_numpy()
        return pa.table({"hour_us": pa.array((ids + h0) * HOUR_US, pa.int64())})

    axis = rd.range(h1 - h0 + 1).map_batches(to_axis, batch_format="pyarrow")
    # counts is at most hours-in-span rows — num_partitions=1 avoids the
    # sparse-side empty-partition Acero wedge (see nation_balance_fullouter)
    out = axis.join(counts, join_type="left_outer", num_partitions=1,
                    on=("hour_us",))

    def fill(t: pa.Table) -> pa.Table:
        return pa.table({
            "window_start": pc.cast(t["hour_us"], pa.timestamp("us")),
            "n_events": pc.cast(t["n_events"].fill_null(0), pa.int64()),
        })

    return out.map_batches(fill, batch_format="pyarrow")


Q_EVENTS_HOURLY_DENSE_SQL = """
WITH b AS (SELECT date_trunc('hour', min(ts)) AS t0,
                  date_trunc('hour', max(ts)) AS t1 FROM events),
axis AS (SELECT unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS window_start
         FROM b),
c AS (SELECT date_trunc('hour', ts) AS window_start, count(*) AS n_events
      FROM events GROUP BY 1)
SELECT a.window_start, COALESCE(c.n_events, 0) AS n_events
FROM axis a LEFT JOIN c USING (window_start)
"""


# ---- per-group OLS regression aggregate (round 3) ------------------------------

_TREND_CX = 19750.0   # epoch-days shift near the corpus midpoint
_TREND_CY = 50.0      # value shift near the corpus mean


def q_events_value_trend(sf_dir: str) -> rd.Dataset:
    """Per-event-type least-squares trend of ``value`` over time
    (``regr_slope`` / ``regr_intercept`` semantics, x = epoch days).

    ONE-PASS distributable regression: each batch emits shifted partial
    sums (n, sum dx, sum dy, sum dx*dx, sum dx*dy) with dx/dy centered at
    fixed constants near the data midpoint, then a single combining
    groupby merges them and the exact shift-correction algebra
    ``Sxy = sum(dxdy) - sum(dx)*sum(dy)/n`` recovers the centered moments
    — no second pass, no cancellation (dx spans ~15 days, not 19,750),
    and only ~groups x blocks partial rows ever shuffle.  Agrees with
    DuckDB's streaming regr_* to ~1e-10."""
    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["event_type", "ts", "value"])

    def partials(t: pa.Table) -> pd.DataFrame:
        us = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        dx = us / 86400e6 - _TREND_CX
        dy = t["value"].to_numpy(zero_copy_only=False) - _TREND_CY
        df = pd.DataFrame({
            "event_type": t["event_type"].to_pandas(),
            "n": np.ones(len(dx), dtype=np.int64),
            "sdx": dx, "sdy": dy, "sdxx": dx * dx, "sdxy": dx * dy,
        })
        return df.groupby("event_type", as_index=False).sum()

    agg = (ds.map_batches(partials, batch_format="pyarrow")
             .groupby("event_type")
             .aggregate(Sum("n", alias_name="n"),
                        Sum("sdx", alias_name="sdx"),
                        Sum("sdy", alias_name="sdy"),
                        Sum("sdxx", alias_name="sdxx"),
                        Sum("sdxy", alias_name="sdxy")))

    def finish(t: pa.Table) -> pa.Table:
        n = t["n"].combine_chunks().to_numpy().astype(np.float64)
        sdx = t["sdx"].combine_chunks().to_numpy()
        sdy = t["sdy"].combine_chunks().to_numpy()
        sxx = t["sdxx"].combine_chunks().to_numpy() - sdx * sdx / n
        sxy = t["sdxy"].combine_chunks().to_numpy() - sdx * sdy / n
        slope = sxy / sxx
        xbar = _TREND_CX + sdx / n
        ybar = _TREND_CY + sdy / n
        return pa.table({
            "event_type": t["event_type"],
            "slope_per_day": pa.array(slope),
            "intercept": pa.array(ybar - slope * xbar),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


Q_EVENTS_VALUE_TREND_SQL = """
SELECT event_type,
       regr_slope(value, epoch(ts) / 86400.0) AS slope_per_day,
       regr_intercept(value, epoch(ts) / 86400.0) AS intercept
FROM events GROUP BY event_type
"""


# ---- round-4 additions -------------------------------------------------------

def q_events_percent_rank(sf_dir: str) -> rd.Dataset:
    """Per-user ``percent_rank`` and ``cume_dist`` of ``value`` — the
    normalized-rank window pair (ties share ranks: pr = (min_rank−1)/(n−1),
    cd = max_rank/n).  Sharded-entity pattern (``_shard_by_int``): the only
    exchange is the shard groupby; every rank computation is a vectorized
    pandas pass across ALL of a shard's users."""
    from .relational import _pq as _p, _shard_by_int

    ds = rd.read_parquet(_p(sf_dir, "events"),
                         columns=["event_id", "user_id", "value"])

    def ranks(g: pd.DataFrame) -> pd.DataFrame:
        grp = g.groupby("user_id", sort=False)["value"]
        n = grp.transform("size").to_numpy(dtype=np.float64)
        rmin = grp.rank(method="min").to_numpy()
        rmax = grp.rank(method="max").to_numpy()
        pr = np.where(n > 1, (rmin - 1) / np.maximum(n - 1, 1), 0.0)
        return pd.DataFrame({"event_id": g["event_id"],
                             "user_id": g["user_id"],
                             "pr": pr, "cd": rmax / n})

    return _shard_by_int(ds, "user_id").groupby("shard").map_groups(
        ranks, batch_format="pandas")


Q_EVENTS_PERCENT_RANK_SQL = """
SELECT event_id, user_id,
       percent_rank() OVER (PARTITION BY user_id ORDER BY value) AS pr,
       cume_dist()    OVER (PARTITION BY user_id ORDER BY value) AS cd
FROM events
"""


def q_events_value_mad(sf_dir: str) -> rd.Dataset:
    """Per-user median and median-absolute-deviation of ``value`` — the
    robust-statistics pair (outlier-resistant quality gating).  Medians are
    exact selections, not streaming-summable, so this uses the sharded
    map_groups pattern: two vectorized per-shard passes (median, then
    median of |x−median|), shuffle = one shard groupby."""
    from .relational import _pq as _p, _shard_by_int

    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["user_id", "value"])

    def mad(g: pd.DataFrame) -> pd.DataFrame:
        grp = g.groupby("user_id", sort=False)["value"]
        med = grp.transform("median")
        dev = (g["value"] - med).abs()
        out = pd.DataFrame({"user_id": g["user_id"], "med": med, "dev": dev}) \
            .groupby("user_id", sort=False).agg(
                med=("med", "first"), mad=("dev", "median")).reset_index()
        return out

    return _shard_by_int(ds, "user_id").groupby("shard").map_groups(
        mad, batch_format="pandas")


Q_EVENTS_VALUE_MAD_SQL = """
SELECT user_id, CAST(median(value) AS DOUBLE) AS med,
       CAST(mad(value) AS DOUBLE) AS mad
FROM events GROUP BY user_id
"""


def q7_two_nation_volume(sf_dir: str, nation_a: str = "NATION_3",
                         nation_b: str = "NATION_7") -> rd.Dataset:
    """Shipping volume between two nations by direction and year (TPC-H Q7
    shape): line items shipped 1996-1997 where the supplier sits in one
    nation and the ordering customer in the other.

    Plan reuses Q5's join discipline: orders ⋈ customer hash join on
    custkey (customer nation projected), lineitem hash-joins that stream on
    orderkey, supplier meets it through the shared cardinality switch
    (broadcast suppkey→nationkey below ``_broadcast_max_rows``, hash join
    above); the two-nation filter is map-side either way, and the final
    groupby is 4 rows per year."""
    nation = pd.read_parquet(_pq(sf_dir, "nation"),
                             columns=["n_nationkey", "n_name"])
    keys = {n: int(k) for k, n in zip(nation["n_nationkey"], nation["n_name"])}
    ka, kb = keys[nation_a], keys[nation_b]
    names = {ka: nation_a, kb: nation_b}

    lo, hi = pd.Timestamp("1996-01-01"), pd.Timestamp("1998-01-01")
    cust = rd.read_parquet(_pq(sf_dir, "customer"),
                           columns=["c_custkey", "c_nationkey"])
    cust = cust.map_batches(
        lambda t: t.filter(pc.is_in(pc.cast(t["c_nationkey"], pa.int64()),
                                    value_set=pa.array([ka, kb], pa.int64()))),
        batch_format="pyarrow")
    orders = rd.read_parquet(_pq(sf_dir, "orders"),
                             columns=["o_orderkey", "o_custkey"])
    li = rd.read_parquet(_pq(sf_dir, "lineitem"),
                         columns=["l_orderkey", "l_suppkey", "l_shipdate",
                                  "l_extendedprice", "l_discount"])

    def rev(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.greater_equal(t["l_shipdate"], pa.scalar(lo)),
                             pc.less(t["l_shipdate"], pa.scalar(hi))))
        r = pc.multiply(_cents(t["l_extendedprice"]),
                        pc.subtract(pa.scalar(100, pa.int64()),
                                    _cents(t["l_discount"])))
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "l_suppkey": t["l_suppkey"],
                         "l_year": pc.year(t["l_shipdate"]),
                         "rev_e4": r})

    li = li.map_batches(rev, batch_format="pyarrow")
    # partitions sized to the SELECTIVE side's cardinality (2/25 of
    # customers): empty hash partitions lose their schema inside Acero —
    # the q_doc_bigram_lm wedge guard, scaling up with the data
    cust = cust.materialize()
    n = max(1, min(_join_partitions(), cust.count() // 1000))
    oc = orders.join(cust, join_type="inner", num_partitions=n,
                     on=("o_custkey",), right_on=("c_custkey",))
    j = li.join(oc, join_type="inner", num_partitions=n,
                on=("l_orderkey",), right_on=("o_orderkey",))

    from .relational import _broadcast_max_rows

    sup_ds = rd.read_parquet(_pq(sf_dir, "supplier"),
                             columns=["s_suppkey", "s_nationkey"])
    if sup_ds.count() <= _broadcast_max_rows():
        sup = sup_ds.to_pandas()
        lut = np.full(int(sup["s_suppkey"].max()) + 1, -1, dtype=np.int64)
        lut[sup["s_suppkey"].to_numpy()] = sup["s_nationkey"].to_numpy()
        ref = ray.put(lut)

        class PairFilter:
            def __init__(self, r):
                self.lut = ray.get(r)

            def __call__(self, t: pa.Table) -> pa.Table:
                s_nat = self.lut[t["l_suppkey"].combine_chunks().to_numpy()]
                c_nat = pc.cast(t["c_nationkey"], pa.int64()) \
                          .combine_chunks().to_numpy()
                keep = (((s_nat == np.int64(ka)) & (c_nat == np.int64(kb)))
                        | ((s_nat == np.int64(kb)) & (c_nat == np.int64(ka))))
                m = pa.array(keep)
                sn = pd.Series(s_nat[keep]).map(names).to_numpy(dtype=object)
                cn = pd.Series(c_nat[keep]).map(names).to_numpy(dtype=object)
                return pa.table({
                    "supp_nation": pa.array(sn, pa.string()),
                    "cust_nation": pa.array(cn, pa.string()),
                    "l_year": t["l_year"].filter(m),
                    "rev_e4": t["rev_e4"].filter(m)})

        matched = j.map_batches(PairFilter, fn_constructor_args=(ref,),
                                batch_format="pyarrow", concurrency=(1, 8))
    else:
        js = j.join(sup_ds, join_type="inner", num_partitions=n,
                    on=("l_suppkey",), right_on=("s_suppkey",))

        def pair_filter(t: pa.Table) -> pa.Table:
            s_nat = pc.cast(t["s_nationkey"], pa.int64()) \
                      .combine_chunks().to_numpy()
            c_nat = pc.cast(t["c_nationkey"], pa.int64()) \
                      .combine_chunks().to_numpy()
            keep = (((s_nat == np.int64(ka)) & (c_nat == np.int64(kb)))
                    | ((s_nat == np.int64(kb)) & (c_nat == np.int64(ka))))
            m = pa.array(keep)
            sn = pd.Series(s_nat[keep]).map(names).to_numpy(dtype=object)
            cn = pd.Series(c_nat[keep]).map(names).to_numpy(dtype=object)
            return pa.table({
                "supp_nation": pa.array(sn, pa.string()),
                "cust_nation": pa.array(cn, pa.string()),
                "l_year": t["l_year"].filter(m),
                "rev_e4": t["rev_e4"].filter(m)})

        matched = js.map_batches(pair_filter, batch_format="pyarrow")

    agg = matched.groupby(["supp_nation", "cust_nation", "l_year"]) \
                 .aggregate(Sum("rev_e4", alias_name="rev_e4"))
    return agg.map_batches(
        lambda t: pa.table({
            "supp_nation": t["supp_nation"], "cust_nation": t["cust_nation"],
            "l_year": pc.cast(t["l_year"], pa.int64()),
            "revenue": pc.divide(pc.cast(t["rev_e4"], pa.float64()),
                                 pa.scalar(10000.0))}),
        batch_format="pyarrow").sort(["supp_nation", "cust_nation", "l_year"])


Q7_TWO_NATION_VOLUME_SQL = """
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE)
         / 10000.0 AS revenue
FROM lineitem JOIN orders   ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN nation sn ON s_nationkey = sn.n_nationkey
              JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
  AND ((sn.n_name = 'NATION_3' AND cn.n_name = 'NATION_7')
    OR (sn.n_name = 'NATION_7' AND cn.n_name = 'NATION_3'))
GROUP BY sn.n_name, cn.n_name, year(l_shipdate)
ORDER BY supp_nation, cust_nation, l_year
"""


def q_events_funnel_latency(sf_dir: str) -> rd.Dataset:
    """Per-user conversion latency: seconds from the first 'view' to the
    first 'click' strictly after it (users who reached funnel stage ≥ 2).
    The time-to-convert companion of ``q_events_funnel`` — same single
    user-keyed shard exchange, two vectorized per-shard min-reductions."""
    from .relational import _shard_by_int

    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["user_id", "ts", "event_type"])

    def lat(g: pd.DataFrame) -> pd.DataFrame:
        t1 = g[g["event_type"] == "view"].groupby("user_id")["ts"].min()
        clicks = g[g["event_type"] == "click"]
        cut = clicks["user_id"].map(t1)
        clicks = clicks[clicks["ts"] > cut]
        t2 = clicks.groupby("user_id")["ts"].min()
        out = pd.DataFrame({"t2": t2}).join(pd.DataFrame({"t1": t1}), how="inner")
        return pd.DataFrame({
            "user_id": out.index.to_numpy(),
            "latency_sec": (out["t2"] - out["t1"]).dt.total_seconds().to_numpy()})

    return _shard_by_int(ds, "user_id").groupby("shard").map_groups(
        lat, batch_format="pandas")


Q_EVENTS_FUNNEL_LATENCY_SQL = """
WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
           WHERE event_type = 'view' GROUP BY user_id),
c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN v USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id)
SELECT user_id, (epoch(t2) - epoch(t1)) AS latency_sec
FROM v JOIN c USING (user_id)
"""


def q_doc_weighted_sample(sf_dir: str, k: int = 100) -> pd.DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis 2006): each doc draws u = md5-uniform(doc_id) ∈ (0,1] and the
    k smallest −ln(u)/weight win (weight = n_chars: long docs
    proportionally likelier).  One map pass computes keys vectorized (the
    batched DuckDB-md5 gate — no RNG state, any cluster size draws the
    same sample); selection is a distributed sort + limit, so no
    corpus-sized driver materialization.  The oracle computes the identical
    key formula (CAST(h AS DOUBLE) + 1 mirrors the numpy float path)."""
    from ..functions.hashing import md5_gate64

    docs = rd.read_parquet(_pq(sf_dir, "documents"),
                           columns=["doc_id", "n_chars"])

    def keys(t: pa.Table) -> pa.Table:
        h = md5_gate64(t["doc_id"].combine_chunks(), salt="ws1")
        u = (h.astype(np.float64) + 1.0) / 18446744073709551616.0
        w = t["n_chars"].combine_chunks().to_numpy().astype(np.float64)
        return pa.table({"doc_id": t["doc_id"],
                         "skey": pa.array(-np.log(u) / w)})

    sel = docs.map_batches(keys, batch_format="pyarrow") \
              .sort(["skey", "doc_id"]).limit(k).to_pandas()
    return sel[["doc_id"]].sort_values("doc_id").reset_index(drop=True)


Q_DOC_WEIGHTED_SAMPLE_SQL = """
WITH keyed AS (
  SELECT doc_id,
         -ln((CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'ws1'),
                                        1, 16)) AS UBIGINT) AS DOUBLE) + 1.0)
             / 18446744073709551616.0) / n_chars AS skey
  FROM documents)
SELECT doc_id FROM keyed ORDER BY skey, doc_id LIMIT 100
"""


# ---- distributed higher central moments: skewness / kurtosis -----------------

def q_lineitem_skew_kurt(sf_dir: str) -> rd.Dataset:
    """Sample skewness and excess kurtosis of ``l_extendedprice`` per
    returnflag (the bias-corrected G1/G2 definitions DuckDB/Excel use), as a
    TWO-PASS centered-moment aggregate: pass 1 computes exact per-group means
    from int64-cents sums (order-independent across blocks); pass 2 broadcasts
    the means and accumulates centered powers Σdx²/Σdx³/Σdx⁴ in float64.
    Centering before raising to powers kills the catastrophic cancellation a
    raw-moment plan (E[x³] − 3E[x]E[x²] + …) suffers at 1e5-magnitude values,
    so the result agrees with DuckDB's streaming implementation to ~1e-12.
    Scale shape: two streaming corpus passes with NO shuffle at all — each
    block reduces to one row per group present (dictionary-encode +
    bincount; group count is bounded), and the groups × blocks partials
    combine on the driver (perf fix r5: the original plan pushed the raw
    (flag, cents) rows through a corpus-sized Aggregate and looked means up
    via a per-row ``Series.map`` inside an 8-actor pool — 6.6 s → ~1 s at
    sf0.1).  Reference anchor: eval-metric rollups,
    manga_ocr training/metrics.py:54-81."""
    cols = ["l_returnflag", "l_extendedprice"]
    ds = rd.read_parquet(_pq(sf_dir, "lineitem"), columns=cols)

    def enc_codes(t: pa.Table) -> tuple[np.ndarray, list[str]]:
        enc = pc.dictionary_encode(t["l_returnflag"].combine_chunks())
        return (enc.indices.to_numpy(zero_copy_only=False),
                enc.dictionary.to_pylist())

    def cents_partial(t: pa.Table) -> pa.Table:
        codes, vocab = enc_codes(t)
        k = len(vocab)
        cents = _cents(t["l_extendedprice"]).to_numpy().astype(np.float64)
        # float64 bincount sums of integral cents stay exact below 2^53 —
        # far above any single block's total
        return pa.table({
            "l_returnflag": pa.array(vocab, pa.string()),
            "n": pa.array(np.bincount(codes, minlength=k).astype(np.int64)),
            "sp": pa.array(np.bincount(codes, weights=cents, minlength=k)
                           .astype(np.int64)),
        })

    sums = (ds.map_batches(cents_partial, batch_format="pyarrow")
              .to_pandas()
              .groupby("l_returnflag", as_index=False).sum())
    stats = {row.l_returnflag: (row.sp / row.n / 100.0, int(row.n))
             for row in sums.itertuples()}
    means = {k: v[0] for k, v in stats.items()}

    def centered_powers(t: pa.Table) -> pa.Table:
        codes, vocab = enc_codes(t)
        k = len(vocab)
        mu = np.asarray([means[v] for v in vocab], np.float64)[codes]
        dx = t["l_extendedprice"].combine_chunks().to_numpy() - mu
        d2 = dx * dx
        return pa.table({
            "l_returnflag": pa.array(vocab, pa.string()),
            "m2": pa.array(np.bincount(codes, weights=d2, minlength=k)),
            "m3": pa.array(np.bincount(codes, weights=d2 * dx, minlength=k)),
            "m4": pa.array(np.bincount(codes, weights=d2 * d2, minlength=k)),
        })

    m = (ds.map_batches(centered_powers, batch_format="pyarrow")
           .to_pandas()
           .groupby("l_returnflag", as_index=False).sum()
           .sort_values("l_returnflag").reset_index(drop=True))
    n = np.array([stats[f][1] for f in m["l_returnflag"]], dtype=np.float64)
    m2 = m["m2"].to_numpy()
    m3 = m["m3"].to_numpy()
    m4 = m["m4"].to_numpy()
    s = np.sqrt(m2 / (n - 1.0))  # sample stddev
    skew = n / ((n - 1.0) * (n - 2.0)) * m3 / s**3
    kurt = (n * (n + 1.0) / ((n - 1.0) * (n - 2.0) * (n - 3.0)) * m4 / s**4
            - 3.0 * (n - 1.0) ** 2 / ((n - 2.0) * (n - 3.0)))
    return rd.from_pandas(pd.DataFrame({
        "l_returnflag": m["l_returnflag"],
        "n": n.astype(np.int64),
        "skew_price": skew,
        "kurt_price": kurt,
    }))


Q_LINEITEM_SKEW_KURT_SQL = """
SELECT l_returnflag, count(*) AS n,
       skewness(l_extendedprice) AS skew_price,
       kurtosis(l_extendedprice) AS kurt_price
FROM lineitem GROUP BY l_returnflag
"""


# ---- fixed-width histogram via block-local bincount partials -----------------

def q_orders_price_histogram(sf_dir: str, width_dollars: int = 20000) -> rd.Dataset:
    """Fixed-width global histogram of ``o_totalprice`` built WITHOUT a
    corpus-sized shuffle: every block reduces to (bin, count) partials via one
    int64-cents floor-div + ``np.bincount``, and only the ~30 distinct bins
    per block move through the final combining groupby — shuffle traffic is
    O(blocks × bins), not O(rows).  The profile-scan shape a 100-TB column
    audit wants.  Bin edges are exact: prices are 2-decimal, so cents //
    (width·100) cannot land on the wrong side of a float boundary, and bin
    lows at these magnitudes are float-exact, matching the SQL
    ``floor(price/width)`` oracle bin-for-bin."""
    width_c = int(width_dollars) * 100
    ds = rd.read_parquet(_pq(sf_dir, "orders"), columns=["o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        b = _cents(t["o_totalprice"]).to_numpy() // width_c
        counts = np.bincount(b)
        nz = np.flatnonzero(counts)
        return pa.table({"bin": pa.array(nz.astype(np.int64)),
                         "n": pa.array(counts[nz].astype(np.int64))})

    hist = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("bin").aggregate(Sum("n", alias_name="n_orders")))

    def finish(t: pa.Table) -> pa.Table:
        b = pc.cast(t["bin"], pa.int64())
        return pa.table({
            "bin": b,
            "bin_lo": pc.cast(pc.multiply(b, pa.scalar(int(width_dollars), pa.int64())),
                              pa.float64()),
            "n_orders": pc.cast(t["n_orders"], pa.int64()),
        })

    return hist.map_batches(finish, batch_format="pyarrow")


Q_ORDERS_PRICE_HISTOGRAM_SQL = """
SELECT CAST(floor(o_totalprice / 20000) AS BIGINT) AS bin,
       CAST(floor(o_totalprice / 20000) AS BIGINT) * 20000.0 AS bin_lo,
       count(*) AS n_orders
FROM orders GROUP BY 1
"""


# ---- exact global percentiles by two-pass selection (no global sort) ----------

_RANK_SCHEMA_CBIN = pa.schema(
    [("grp", pa.string()), ("cbin", pa.int64()), ("w", pa.int64())])
_RANK_SCHEMA_CENTS = pa.schema(
    [("grp", pa.string()), ("cents", pa.int64()), ("w", pa.int64())])


def _rank_select_cents(
    ds: rd.Dataset,
    prep,
    thresholds_of,
    *,
    coarse_w: int = 1000,
) -> tuple[dict[str, int], dict[tuple[str, float], int]]:
    """Shared coarse→fine two-pass distributed rank-selection core (review
    fix r5: ``q_orders_percentiles_2pass`` and ``q_lineitem_weighted_median``
    previously duplicated the bin/crossing arithmetic).  Pass 1 reduces each
    block to per-(group, coarse cents-bin) weight sums — bounded by the value
    DOMAIN, never the row count; the DRIVER combines the partials and
    locates, per group, the coarse bin where cumulative weight first reaches
    each requested threshold; pass 2 re-scans only rows inside those bins
    for exact per-cent weights.  Selection rule at threshold ``t``: the
    smallest cents value whose per-distinct-value cumulative weight is ≥ t
    (tie order cannot matter).  Shuffle traffic is O(blocks × occupied
    bins); at 10^12 rows a full sort moves TBs of keys, this moves MBs (a
    pathological bin recurses the same coarse→fine step — the scale path).

    ``prep(block) -> (grp, cents, w)`` numpy arrays (``grp``/``w`` may be
    None: single group / unit weights — the unweighted ungrouped case keeps
    its np.bincount fast path).  ``thresholds_of({grp: total_w}) -> {grp:
    [t, ...]}``.  Returns ``({grp: total_w}, {(grp, t): cents})``.

    Block partials combine on the DRIVER on purpose: the table is domain-
    bounded, so a Ray groupby buys nothing (root-caused while tuning: it is
    PANDAS-format partial blocks feeding the sort-based Aggregate that are
    pathological — 29 s vs 2.4 s Arrow-format at 27k groups, measured — not
    the group count itself).  At extreme block counts a tree-combine slots
    in unchanged."""

    def _typed_empty(val_col: str) -> pa.Table:
        return pa.table({"grp": pa.array([], pa.string()),
                         val_col: pa.array([], pa.int64()),
                         "w": pa.array([], pa.int64())})

    def coarse_partial(t: pa.Table) -> pa.Table:
        grp, cents, w = prep(t)
        if len(cents) == 0:
            return _typed_empty("cbin")
        b = cents // coarse_w
        if grp is None and w is None:
            counts = np.bincount(b)
            nz = np.flatnonzero(counts)
            # explicit string type: an empty block would otherwise emit a
            # null-typed grp column and a schema-mismatch warning
            return pa.table({"grp": pa.array([""] * len(nz), pa.string()),
                             "cbin": pa.array(nz.astype(np.int64)),
                             "w": pa.array(counts[nz].astype(np.int64))})
        df = pd.DataFrame({
            "grp": grp if grp is not None else "",
            "cbin": b,
            "w": w if w is not None else np.ones(len(b), np.int64)})
        return pa.Table.from_pandas(
            df.groupby(["grp", "cbin"], as_index=False)["w"].sum(),
            preserve_index=False, schema=_RANK_SCHEMA_CBIN)

    hist = (ds.map_batches(coarse_partial, batch_format="pyarrow")
              .to_pandas()
              .groupby(["grp", "cbin"], as_index=False)["w"].sum()
              .sort_values(["grp", "cbin"]))
    totals = {g: int(tw) for g, tw in hist.groupby("grp")["w"].sum().items()}
    thresholds = thresholds_of(totals)
    # (grp, t) -> (coarse bin holding the crossing, cumulative w before it)
    bin_of: dict[tuple[str, float], tuple[int, int]] = {}
    for g_, g in hist.groupby("grp"):
        cumw = g["w"].cumsum().to_numpy()
        bins = g["cbin"].to_numpy()
        for t in thresholds.get(g_, []):
            i = int(np.searchsorted(cumw, t, side="left"))
            bin_of[(g_, t)] = (int(bins[i]), int(cumw[i] - g["w"].iloc[i]))
    needed = {(g_, b) for (g_, _), (b, _) in bin_of.items()}
    needed_bins = sorted({b for _, b in needed})

    def fine_partial(t: pa.Table) -> pa.Table:
        grp, cents, w = prep(t)
        if len(cents) == 0:
            return _typed_empty("cents")
        b = cents // coarse_w
        if grp is None:
            mask = np.isin(b, needed_bins)
            if w is None:
                vals, counts = np.unique(cents[mask], return_counts=True)
                return pa.table({"grp": pa.array([""] * len(vals), pa.string()),
                                 "cents": pa.array(vals.astype(np.int64)),
                                 "w": pa.array(counts.astype(np.int64))})
            grp = np.full(len(cents), "", dtype=object)
        else:
            mask = np.zeros(len(cents), dtype=bool)
            for g_, b_ in needed:  # ≤ groups × thresholds vectorized clauses
                mask |= (grp == g_) & (b == b_)
        # explicit schema: a block whose rows ALL fall outside the needed
        # bins groups to an empty frame whose object grp column would
        # otherwise convert to null type (schema-mismatch warnings)
        df = pd.DataFrame({"grp": grp[mask], "cents": cents[mask],
                           "w": (w[mask] if w is not None
                                 else np.ones(int(mask.sum()), np.int64))})
        return pa.Table.from_pandas(
            df.groupby(["grp", "cents"], as_index=False)["w"].sum(),
            preserve_index=False, schema=_RANK_SCHEMA_CENTS)

    fine = (ds.map_batches(fine_partial, batch_format="pyarrow")
              .to_pandas()
              .groupby(["grp", "cents"], as_index=False)["w"].sum()
              .sort_values(["grp", "cents"]))
    fgrp = fine["grp"].to_numpy()
    fbin = fine["cents"].to_numpy() // coarse_w
    out: dict[tuple[str, float], int] = {}
    for (g_, t), (b, w_before) in bin_of.items():
        g = fine[(fgrp == g_) & (fbin == b)]
        cum = w_before + g["w"].cumsum().to_numpy()
        j = int(np.searchsorted(cum, t, side="left"))
        out[(g_, t)] = int(g["cents"].iloc[j])
    return totals, out


def q_orders_percentiles_2pass(sf_dir: str) -> pd.DataFrame:
    """Exact interpolated p25/p50/p75 of ``o_totalprice`` WITHOUT a global
    sort — the classic distributed-selection plan (the shared coarse→fine
    machinery in :func:`_rank_select_cents`; $10 coarse bins).  An
    unweighted 0-indexed order statistic ``r`` is the weighted-rank
    threshold ``t = r + 1`` (first value whose running count reaches r+1).
    Interpolation mirrors SQL ``quantile_cont``: value = x[floor(pos)] +
    frac·(x[ceil(pos)] − x[floor(pos)]) with pos = (n−1)·q, on float-exact
    2-decimal dollars."""
    ds = rd.read_parquet(_pq(sf_dir, "orders"), columns=["o_totalprice"])

    def prep(t: pa.Table):
        return None, _cents(t["o_totalprice"]).to_numpy(), None

    quantiles = (0.25, 0.5, 0.75)

    def thresholds_of(totals: dict[str, int]) -> dict[str, list[float]]:
        n = totals[""]
        ranks = ({int(np.floor((n - 1) * q)) for q in quantiles}
                 | {int(np.ceil((n - 1) * q)) for q in quantiles})
        return {"": sorted(float(r + 1) for r in ranks)}

    totals, sel = _rank_select_cents(ds, prep, thresholds_of)
    n_total = totals[""]

    def value_at(rank: int) -> float:
        return sel[("", float(rank + 1))] / 100.0

    out = {"n": [n_total]}
    for q, name in zip(quantiles, ("p25", "p50", "p75")):
        pos = (n_total - 1) * q
        lo, hi = value_at(int(np.floor(pos))), value_at(int(np.ceil(pos)))
        out[name] = [lo + (pos - np.floor(pos)) * (hi - lo)]
    return pd.DataFrame(out)


Q_ORDERS_PERCENTILES_2PASS_SQL = """
SELECT CAST(count(*) AS BIGINT) AS n,
       quantile_cont(o_totalprice, 0.25) AS p25,
       quantile_cont(o_totalprice, 0.50) AS p50,
       quantile_cont(o_totalprice, 0.75) AS p75
FROM orders
"""


# ---- mutual information between two categorical columns ----------------------

def q_events_type_hour_mi(sf_dir: str) -> pd.DataFrame:
    """Mutual information (nats) between event type and hour-of-day — the
    dependence audit feature stores run to catch leakage/seasonality between
    a label and a time column.  The corpus reduces to ONE combining groupby
    over (type, hour) — a contingency table bounded by |types|×24, never by
    rows — and the driver finishes the Σ p(x,y)·ln(p(x,y)/(p(x)p(y))) sum on
    that tiny table with marginals derived from it (no extra passes)."""
    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["event_type", "ts"])

    def keyed(t: pa.Table) -> pa.Table:
        return pa.table({"event_type": t["event_type"],
                         "hr": pc.cast(pc.hour(t["ts"]), pa.int64())})

    c = (ds.map_batches(keyed, batch_format="pyarrow")
           .groupby(["event_type", "hr"]).aggregate(Count(alias_name="n"))
           .to_pandas())
    n = c["n"].to_numpy(dtype=np.float64)
    t = n.sum()
    nx = c.groupby("event_type")["n"].transform("sum").to_numpy(dtype=np.float64)
    ny = c.groupby("hr")["n"].transform("sum").to_numpy(dtype=np.float64)
    mi = float((n / t * np.log(n * t / (nx * ny))).sum())
    return pd.DataFrame({"n_events": [int(t)], "mi_nats": [mi]})


Q_EVENTS_TYPE_HOUR_MI_SQL = """
WITH c AS (SELECT event_type, CAST(hour(ts) AS BIGINT) AS hr,
                  CAST(count(*) AS DOUBLE) AS n
           FROM events GROUP BY 1, 2),
tot AS (SELECT sum(n) AS t FROM c),
mx AS (SELECT event_type, sum(n) AS nx FROM c GROUP BY 1),
my AS (SELECT hr, sum(n) AS ny FROM c GROUP BY 1)
SELECT CAST(sum(c.n) AS BIGINT) AS n_events,
       sum(c.n / tot.t * ln(c.n * tot.t / (mx.nx * my.ny))) AS mi_nats
FROM c JOIN mx USING (event_type) JOIN my USING (hr) CROSS JOIN tot
"""


def q_events_type_dow_chi2(sf_dir: str) -> pd.DataFrame:
    """Pearson chi-square independence statistic between event type and
    day-of-week — the categorical-drift sibling of the MI audit above, with
    the same one-shuffle plan: the corpus reduces to ONE combining groupby
    over (type, dow) and the driver finishes Σ (n−e)²/e over the
    |types|×7-bounded contingency with expected counts e = nx·ny/N derived
    from its own marginals.  Unlike MI, empty cells contribute e (the full
    |types|×7 grid matters), so the driver densifies via a pivot — still
    dimension-bounded."""
    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["event_type", "ts"])

    def keyed(t: pa.Table) -> pa.Table:
        return pa.table({"event_type": t["event_type"],
                         "dow": pc.cast(pc.add(pc.day_of_week(t["ts"]),
                                               pa.scalar(1)), pa.int64())})

    c = (ds.map_batches(keyed, batch_format="pyarrow")
           .groupby(["event_type", "dow"]).aggregate(Count(alias_name="n"))
           .to_pandas())
    grid = (c.pivot_table(index="event_type", columns="dow", values="n",
                          aggfunc="sum", fill_value=0)
            .reindex(columns=range(1, 8), fill_value=0)
            .to_numpy(dtype=np.float64))
    total = grid.sum()
    expected = np.outer(grid.sum(axis=1), grid.sum(axis=0)) / total
    chi2 = float(((grid - expected) ** 2 / expected).sum())
    dof = (grid.shape[0] - 1) * (grid.shape[1] - 1)
    return pd.DataFrame({"n_events": [int(total)], "chi2": [chi2],
                         "dof": [dof]})


Q_EVENTS_TYPE_DOW_CHI2_SQL = """
WITH c AS (SELECT event_type, CAST(isodow(ts) AS BIGINT) AS dow,
                  CAST(count(*) AS DOUBLE) AS n
           FROM events GROUP BY 1, 2),
grid AS (SELECT t.event_type, d.dow, coalesce(c.n, 0) AS n
         FROM (SELECT DISTINCT event_type FROM c) t
         CROSS JOIN (SELECT unnest(generate_series(1, 7)) AS dow) d
         LEFT JOIN c ON c.event_type = t.event_type AND c.dow = d.dow),
tot AS (SELECT sum(n) AS t FROM grid),
mx AS (SELECT event_type, sum(n) AS nx FROM grid GROUP BY 1),
my AS (SELECT dow, sum(n) AS ny FROM grid GROUP BY 1)
SELECT CAST(min(tot.t) AS BIGINT) AS n_events,
       sum(pow(grid.n - mx.nx * my.ny / tot.t, 2)
           / (mx.nx * my.ny / tot.t)) AS chi2,
       CAST((count(DISTINCT grid.event_type) - 1) * 6 AS BIGINT) AS dof
FROM grid JOIN mx USING (event_type) JOIN my USING (dow) CROSS JOIN tot
"""


# ---- GROUPING SETS (the rollup/cube generalization) ---------------------------

def q_events_grouping_sets(sf_dir: str) -> pd.DataFrame:
    """``GROUP BY GROUPING SETS ((event_type), (dow))`` — arbitrary set lists,
    completing the rollup (prefix sets) / cube (all subsets) family above.
    Same one-shuffle policy: the corpus reduces to the fine (type, dow)
    contingency in ONE combining groupby, and each requested set is a
    driver-side re-aggregation of that dimension-bounded table (re-shuffling
    a types × 7 frame would be pure overhead at any scale)."""
    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["event_type", "ts"])

    def keys(t: pa.Table) -> pa.Table:
        return pa.table({"event_type": t["event_type"],
                         "dow": pc.cast(pc.add(pc.day_of_week(t["ts"]),
                                               pa.scalar(1)), pa.int64())})

    fine = (ds.map_batches(keys, batch_format="pyarrow")
              .groupby(["event_type", "dow"]).aggregate(Count(alias_name="n"))
              .to_pandas())
    fine["n"] = fine["n"].astype("int64")
    per_type = fine.groupby("event_type", as_index=False)["n"].sum()
    per_type["dow"] = np.nan
    per_dow = fine.groupby("dow", as_index=False)["n"].sum()
    per_dow["event_type"] = None
    out = pd.concat([per_type[["event_type", "dow", "n"]],
                     per_dow[["event_type", "dow", "n"]]], ignore_index=True)
    out["dow"] = out["dow"].astype("float64")
    return out


Q_EVENTS_GROUPING_SETS_SQL = """
SELECT event_type, CAST(isodow(ts) AS DOUBLE) AS dow, count(*) AS n
FROM events GROUP BY GROUPING SETS ((event_type), (CAST(isodow(ts) AS DOUBLE)))
"""


# ---- weighted median via two-pass weighted rank selection ---------------------

def q_lineitem_weighted_median(sf_dir: str) -> pd.DataFrame:
    """Quantity-weighted median of ``l_extendedprice`` per returnflag — the
    same coarse→fine two-pass rank-selection plan as
    q_orders_percentiles_2pass, generalized to WEIGHTED rank: pass 1 sums
    int64 quantity weights into coarse $10 cents-bins per group, the driver
    locates the bin where the cumulative weight first reaches half the
    group's total, and pass 2 sums exact per-cent weights only inside those
    bins.  Definition (mirrored in the oracle): the smallest price whose
    cumulative weight ≥ total/2, computed over per-DISTINCT-price weights so
    tie order cannot matter.  Shuffle traffic: groups × occupied bins, never
    rows."""
    cols = ["l_returnflag", "l_extendedprice", "l_quantity"]
    ds = rd.read_parquet(_pq(sf_dir, "lineitem"), columns=cols)

    def prep(t: pa.Table):
        return (t["l_returnflag"].to_numpy(zero_copy_only=False),
                _cents(t["l_extendedprice"]).to_numpy(),
                np.round(t["l_quantity"].to_numpy(zero_copy_only=False))
                .astype(np.int64))

    def thresholds_of(totals: dict[str, int]) -> dict[str, list[float]]:
        return {flag: [tw / 2.0] for flag, tw in totals.items()}

    totals, sel = _rank_select_cents(ds, prep, thresholds_of)
    rows = [{"l_returnflag": flag, "total_qty": tw,
             "wmedian_price": sel[(flag, tw / 2.0)] / 100.0}
            for flag, tw in sorted(totals.items())]
    return pd.DataFrame(rows)


Q_LINEITEM_WEIGHTED_MEDIAN_SQL = """
WITH g AS (SELECT l_returnflag, l_extendedprice AS p,
                  sum(CAST(round(l_quantity) AS BIGINT)) AS w
           FROM lineitem GROUP BY 1, 2),
c AS (SELECT l_returnflag, p,
             sum(w) OVER (PARTITION BY l_returnflag ORDER BY p) AS cw,
             sum(w) OVER (PARTITION BY l_returnflag) AS tw
      FROM g)
SELECT l_returnflag, CAST(min(tw) AS BIGINT) AS total_qty,
       min(p) FILTER (WHERE cw >= tw / 2.0) AS wmedian_price
FROM c GROUP BY l_returnflag
"""


def q_lineitem_weighted_quartiles(sf_dir: str) -> pd.DataFrame:
    """Quantity-weighted p25/p50/p75 of ``l_extendedprice`` per returnflag —
    the grouped × multi-threshold case of :func:`_rank_select_cents` (three
    weighted-rank thresholds q·total per group resolve in the SAME two
    passes; the weighted median above is the single-threshold special case).
    Definition (mirrored in the oracle): the smallest price whose cumulative
    weight ≥ q·total over per-DISTINCT-price weights — the lower weighted
    quantile, no interpolation, so tie order cannot matter."""
    cols = ["l_returnflag", "l_extendedprice", "l_quantity"]
    ds = rd.read_parquet(_pq(sf_dir, "lineitem"), columns=cols)
    quantiles = (0.25, 0.50, 0.75)

    def prep(t: pa.Table):
        return (t["l_returnflag"].to_numpy(zero_copy_only=False),
                _cents(t["l_extendedprice"]).to_numpy(),
                np.round(t["l_quantity"].to_numpy(zero_copy_only=False))
                .astype(np.int64))

    def thresholds_of(totals: dict[str, int]) -> dict[str, list[float]]:
        return {flag: [tw * q for q in quantiles]
                for flag, tw in totals.items()}

    totals, sel = _rank_select_cents(ds, prep, thresholds_of)
    rows = [{"l_returnflag": flag, "total_qty": tw,
             "wp25": sel[(flag, tw * 0.25)] / 100.0,
             "wp50": sel[(flag, tw * 0.50)] / 100.0,
             "wp75": sel[(flag, tw * 0.75)] / 100.0}
            for flag, tw in sorted(totals.items())]
    return pd.DataFrame(rows)


Q_LINEITEM_WEIGHTED_QUARTILES_SQL = """
WITH g AS (SELECT l_returnflag, l_extendedprice AS p,
                  sum(CAST(round(l_quantity) AS BIGINT)) AS w
           FROM lineitem GROUP BY 1, 2),
c AS (SELECT l_returnflag, p,
             sum(w) OVER (PARTITION BY l_returnflag ORDER BY p) AS cw,
             sum(w) OVER (PARTITION BY l_returnflag) AS tw
      FROM g)
SELECT l_returnflag, CAST(min(tw) AS BIGINT) AS total_qty,
       min(p) FILTER (WHERE cw >= tw * 0.25) AS wp25,
       min(p) FILTER (WHERE cw >= tw * 0.50) AS wp50,
       min(p) FILTER (WHERE cw >= tw * 0.75) AS wp75
FROM c GROUP BY l_returnflag
"""


def q_lineitem_winsorized_mean(sf_dir: str) -> pd.DataFrame:
    """p5/p95-winsorized mean of ``l_extendedprice`` — the robust-mean
    audit (clip every value to the percentile fences, then average) that
    tames heavy-tailed metrics before trend comparison.  Composition: the
    shared two-pass rank selection locates the exact cent fences (lower
    quantile: smallest value whose cumulative count ≥ ⌈q·n⌉), then ONE more
    streaming pass clips to [lo, hi] and sums exact int64 cents.  Three
    corpus passes total, no sort, no shuffle; the mean finalizes as
    (exact cents)/100.0/n — bit-identical to the oracle's DECIMAL sum."""
    ds = rd.read_parquet(_pq(sf_dir, "lineitem"), columns=["l_extendedprice"])

    def prep(t: pa.Table):
        return None, _cents(t["l_extendedprice"]).to_numpy(), None

    def thresholds_of(totals: dict[str, int]) -> dict[str, list[float]]:
        n = totals[""]
        return {"": [float(np.ceil(n * 0.05)), float(np.ceil(n * 0.95))]}

    totals, sel = _rank_select_cents(ds, prep, thresholds_of)
    n = totals[""]
    lo = sel[("", float(np.ceil(n * 0.05)))]
    hi = sel[("", float(np.ceil(n * 0.95)))]

    def clip_partial(t: pa.Table) -> pa.Table:
        c = np.clip(_cents(t["l_extendedprice"]).to_numpy(), lo, hi)
        return pa.table({"s": pa.array([int(c.sum())], pa.int64()),
                         "k": pa.array([len(c)], pa.int64())})

    part = ds.map_batches(clip_partial, batch_format="pyarrow").to_pandas()
    total_cents = int(part["s"].sum())
    assert int(part["k"].sum()) == n
    return pd.DataFrame({"n": [n], "p5": [lo / 100.0], "p95": [hi / 100.0],
                         "wmean": [total_cents / 100.0 / n]})


Q_LINEITEM_WINSORIZED_MEAN_SQL = """
WITH c AS (SELECT l_extendedprice AS p, count(*) AS w FROM lineitem GROUP BY 1),
cc AS (SELECT p, sum(w) OVER (ORDER BY p) AS cw, sum(w) OVER () AS tw FROM c),
f AS (SELECT min(p) FILTER (WHERE cw >= ceil(tw * 0.05)) AS lo,
             min(p) FILTER (WHERE cw >= ceil(tw * 0.95)) AS hi FROM cc)
SELECT CAST(count(*) AS BIGINT) AS n, min(f.lo) AS p5, min(f.hi) AS p95,
       CAST(sum(CAST(least(greatest(l_extendedprice, f.lo), f.hi)
                     AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS wmean
FROM lineitem CROSS JOIN f
"""


def q_events_top3_per_user(sf_dir: str) -> rd.Dataset:
    """Top-3 events per user by value — the generic per-key top-k selection
    (leaderboards, best-of-N example retrieval).  Scale shape: a block-local
    combiner keeps each block's own top-3 per user, so the exchange carries
    ≤ 3 rows per (user, block) — never the corpus; the finish groups by
    hash(user) SHARD (per-entity ``map_groups`` would pay Ray's per-group
    overhead × user count) and ranks each shard's users in one vectorized
    pandas pass.  Deterministic total order: value DESC, event_id ASC
    (event_id is unique), mirrored by the oracle's ``row_number``."""
    from .relational import _shard_by_int

    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["user_id", "event_id", "value"])

    def block_topk(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(["value", "event_id"],
                                       ascending=[False, True])
        return pa.Table.from_pandas(
            df.groupby("user_id", sort=False).head(3), preserve_index=False)

    def shard_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "value", "event_id"],
                          ascending=[True, False, True])
        top = g.groupby("user_id", sort=False).head(3).copy()
        top["rnk"] = (top.groupby("user_id", sort=False).cumcount()
                      + 1).astype(np.int64)
        return top[["user_id", "event_id", "value", "rnk"]]

    return (_shard_by_int(ds.map_batches(block_topk, batch_format="pyarrow"),
                          "user_id")
            .groupby("shard").map_groups(shard_topk, batch_format="pandas"))


Q_EVENTS_TOP3_PER_USER_SQL = """
SELECT user_id, event_id, value, CAST(rn AS BIGINT) AS rnk FROM (
  SELECT user_id, event_id, value,
         row_number() OVER (
           PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
  FROM events) WHERE rn <= 3
"""


# ---- Kolmogorov-Smirnov distribution drift between corpus slices --------------

def q_doc_length_ks(sf_dir: str) -> pd.DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic between the length
    distributions of English vs non-English documents — the
    distribution-drift audit a training-mix pipeline runs when a new source
    lands (did the length profile shift?).  Each block reduces to
    (n_chars, count_en, count_other) partials; the combining groupby moves
    only distinct lengths, and the driver takes max|ECDF_a − ECDF_b| over
    that domain-bounded table.  For an unbounded metric the same plan runs
    over coarse bins first (the percentile-selection trick above); exact
    here because the length domain is bounded."""
    ds = rd.read_parquet(_pq(sf_dir, "documents"), columns=["lang", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        en = pc.equal(t["lang"], pa.scalar("en")).to_numpy(zero_copy_only=False)
        nc = pc.cast(t["n_chars"], pa.int64()).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"n_chars": nc,
                           "a": en.astype(np.int64),
                           "b": (~en).astype(np.int64)})
        g = df.groupby("n_chars", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    c = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("n_chars")
           .aggregate(Sum("a", alias_name="a"), Sum("b", alias_name="b"))
           .to_pandas().sort_values("n_chars"))
    ta, tb = float(c["a"].sum()), float(c["b"].sum())
    fa = c["a"].cumsum().to_numpy(dtype=np.float64) / ta
    fb = c["b"].cumsum().to_numpy(dtype=np.float64) / tb
    return pd.DataFrame({"n_en": [int(ta)], "n_other": [int(tb)],
                         "ks_stat": [float(np.abs(fa - fb).max())]})


Q_DOC_LENGTH_KS_SQL = """
WITH c AS (SELECT n_chars,
                  CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS DOUBLE) AS a,
                  CAST(sum(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS DOUBLE) AS b
           FROM documents GROUP BY 1),
t AS (SELECT sum(a) AS ta, sum(b) AS tb FROM c),
e AS (SELECT sum(a) OVER (ORDER BY n_chars) / t.ta AS fa,
             sum(b) OVER (ORDER BY n_chars) / t.tb AS fb
      FROM c CROSS JOIN t)
SELECT (SELECT CAST(ta AS BIGINT) FROM t) AS n_en,
       (SELECT CAST(tb AS BIGINT) FROM t) AS n_other,
       max(abs(fa - fb)) AS ks_stat
FROM e
"""


# ---- ingest-time table profile (schema-quality audit) ------------------------

def q_events_profile(sf_dir: str) -> pd.DataFrame:
    """One-pass ingest profile of the events table: row count, per-column
    null counts, exact distinct count of the enum-like ``event_type``,
    value/timestamp min-max, and mean ``props`` length — the schema-quality
    report a 100-TB ingest runs before anything downstream trusts the data.

    Plan: ONE pruned corpus pass; each block reduces to k rows where k is
    the block's own distinct ``event_type`` count (row 0 carries the
    block's scalar partials — Arrow ``null_count`` per column, ``min_max``
    kernels, a length sum — the rest carry only the type value), and the
    driver combines the blocks×k-bounded partial table: null-skipping sums
    and min/max plus one ``unique`` over the type column.  No shuffle.
    Exact distinct is restricted to enum-like columns BY DESIGN — the
    per-block unique list must stay domain-bounded; unbounded-cardinality
    columns (user_id, event_id) go through the HLL sketch
    (``stages/sketch.py q_events_heavy_users`` family) instead."""
    COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=COLS)

    def partial(t: pa.Table) -> pa.Table:
        et = pc.drop_null(pc.unique(t["event_type"]))
        k = max(1, len(et))
        pad = lambda v, typ: pa.array([v] + [None] * (k - 1), typ)  # noqa: E731
        vmm = pc.min_max(t["value"])
        tmm = pc.min_max(t["ts"])
        out: dict[str, pa.Array] = {
            "event_type": et if len(et) else pa.array([None], pa.string()),
            "n_rows": pad(t.num_rows, pa.int64()),
        }
        for c in COLS:
            out["null_" + c] = pad(t[c].null_count, pa.int64())
        out["value_min"] = pad(vmm["min"].as_py(), pa.float64())
        out["value_max"] = pad(vmm["max"].as_py(), pa.float64())
        out["ts_min"] = pad(tmm["min"].as_py(), pa.timestamp("us"))
        out["ts_max"] = pad(tmm["max"].as_py(), pa.timestamp("us"))
        out["props_len_sum"] = pad(
            pc.sum(pc.utf8_length(t["props"])).as_py() or 0, pa.int64())
        return pa.table(out)

    p = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    n = int(p["n_rows"].sum())
    out = {"n_rows": [n]}
    for c in COLS:
        out["null_" + c] = [int(p["null_" + c].sum())]
    out["event_type_distinct"] = [int(p["event_type"].dropna().nunique())]
    out["value_min"] = [float(p["value_min"].min())]
    out["value_max"] = [float(p["value_max"].max())]
    out["ts_min"] = [p["ts_min"].min()]
    out["ts_max"] = [p["ts_max"].max()]
    # one IEEE division, mirrored verbatim in the oracle SQL
    out["props_avg_len"] = [float(p["props_len_sum"].sum())
                            / (n - int(p["null_props"].sum()))]
    return pd.DataFrame(out)


Q_EVENTS_PROFILE_SQL = """
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) - count(event_id) AS BIGINT) AS null_event_id,
       CAST(count(*) - count(ts) AS BIGINT) AS null_ts,
       CAST(count(*) - count(user_id) AS BIGINT) AS null_user_id,
       CAST(count(*) - count(event_type) AS BIGINT) AS null_event_type,
       CAST(count(*) - count(value) AS BIGINT) AS null_value,
       CAST(count(*) - count(props) AS BIGINT) AS null_props,
       CAST(count(DISTINCT event_type) AS BIGINT) AS event_type_distinct,
       min(value) AS value_min, max(value) AS value_max,
       min(ts) AS ts_min, max(ts) AS ts_max,
       CAST(sum(length(props)) AS DOUBLE) / count(props) AS props_avg_len
FROM events
"""


# ---- referential-integrity audit (orphan foreign keys) ------------------------

def _antijoin_count(child: rd.Dataset, child_key: str,
                    parent: rd.Dataset, parent_key: str) -> int:
    """Count child rows whose key has no parent match — the engine core of
    the referential-integrity audit.  Cardinality-switched like every other
    small-side lookup in this repo (``_broadcast_max_rows``):

    - parent row count below the switch → the parent's distinct keys ship
      ONCE as a sorted numpy array via ``ray.put`` and each child block
      counts misses with ``np.isin`` — zero shuffle, one int per block back
      to the driver;
    - above the switch (a 100-TB-child edge like lineitem→orders, where
      even the DISTINCT key side is too big to hold) both sides reduce to
      block-local distinct (key, cnt/flag) partials and ONE combining
      groupby carries distinct keys only — never child rows — with the
      orphan total summed from the grouped output's blocks."""
    from .relational import _broadcast_max_rows

    if parent.count() <= _broadcast_max_rows():
        def puniq(t: pa.Table) -> pa.Table:
            return pa.table({"k": pc.unique(t[parent_key])})

        keys = np.unique(
            parent.map_batches(puniq, batch_format="pyarrow")
                  .to_pandas()["k"].to_numpy())
        ref = ray.put(np.sort(keys))

        def misses(t: pa.Table) -> pa.Table:
            k = t[child_key].to_numpy(zero_copy_only=False)
            return pa.table({"miss": pa.array(
                [int((~np.isin(k, ray.get(ref))).sum())], pa.int64())})

        return int(child.map_batches(misses, batch_format="pyarrow")
                        .to_pandas()["miss"].sum())

    def child_partial(t: pa.Table) -> pa.Table:
        k, c = np.unique(t[child_key].to_numpy(zero_copy_only=False),
                         return_counts=True)
        return pa.table({"k": pa.array(k.astype(np.int64)),
                         "cnt": pa.array(c.astype(np.int64)),
                         "flag": pa.array(np.zeros(len(k), np.int64))})

    def parent_partial(t: pa.Table) -> pa.Table:
        k = pc.unique(t[parent_key])
        one = np.ones(len(k), np.int64)
        return pa.table({"k": pc.cast(k, pa.int64()),
                         "cnt": pa.array(np.zeros(len(k), np.int64)),
                         "flag": pa.array(one)})

    both = (child.map_batches(child_partial, batch_format="pyarrow")
            .union(parent.map_batches(parent_partial, batch_format="pyarrow"))
            .groupby("k").aggregate(Sum("cnt", alias_name="cnt"),
                                    Max("flag", alias_name="flag")))

    def orphan_sum(t: pa.Table) -> pa.Table:
        m = t.filter(pc.equal(t["flag"], pa.scalar(0, pa.int64())))
        return pa.table({"miss": pa.array(
            [int(pc.sum(m["cnt"]).as_py() or 0)], pa.int64())})

    return int(both.map_batches(orphan_sum, batch_format="pyarrow")
                   .to_pandas()["miss"].sum())


def q_orders_ri_audit(sf_dir: str) -> pd.DataFrame:
    """Referential-integrity audit across the order hub's three edges:
    lineitems without an order, orders without a customer, and orders
    without any lineitem — the cross-table consistency report an ingest
    pipeline emits before joins downstream silently drop rows.  Each edge
    is one `_antijoin_count` (broadcast below the cardinality switch, one
    distinct-keys-only groupby above it); the three counts are independent
    single-int results so the driver state is three integers."""
    li = rd.read_parquet(_pq(sf_dir, "lineitem"), columns=["l_orderkey"])
    orders_ck = rd.read_parquet(_pq(sf_dir, "orders"), columns=["o_custkey"])
    orders_ok = rd.read_parquet(_pq(sf_dir, "orders"), columns=["o_orderkey"])
    cust = rd.read_parquet(_pq(sf_dir, "customer"), columns=["c_custkey"])
    return pd.DataFrame({
        "li_orphans": [_antijoin_count(li, "l_orderkey",
                                       orders_ok, "o_orderkey")],
        "order_orphans": [_antijoin_count(orders_ck, "o_custkey",
                                          cust, "c_custkey")],
        "childless_orders": [_antijoin_count(orders_ok, "o_orderkey",
                                             li, "l_orderkey")],
    })


Q_ORDERS_RI_AUDIT_SQL = """
SELECT
 (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
   WHERE NOT EXISTS (SELECT 1 FROM orders o
                     WHERE o.o_orderkey = l.l_orderkey)) AS li_orphans,
 (SELECT CAST(count(*) AS BIGINT) FROM orders o
   WHERE NOT EXISTS (SELECT 1 FROM customer c
                     WHERE c.c_custkey = o.o_custkey)) AS order_orphans,
 (SELECT CAST(count(*) AS BIGINT) FROM orders o
   WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                     WHERE l.l_orderkey = o.o_orderkey)) AS childless_orders
"""


# ---- round-5 session-5 additions --------------------------------------------

def q_events_value_zscore(sf_dir: str) -> rd.Dataset:
    """Per-event-type z-score standardization of ``value`` — the feature-
    normalization transform an ML featurization pass applies before
    training.  The group domain is bounded (|event_type| ≈ 5), so the
    moments come from block-local dictionary-encode partials combined on
    the DRIVER (the q1 zero-shuffle pattern): exact int64 cents sums and
    cents² sum-of-squares per (block, type), then one broadcast
    (type → mean, stddev_samp) dict and a map-side vectorized finish.
    No shuffle at all.  (cents² int64 partials hold ~4e9 rows/block at
    these magnitudes; beyond that, split hi/lo words per partition.)"""
    from .relational import _cents

    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["event_id", "event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        enc = pc.dictionary_encode(t["event_type"].combine_chunks())
        codes = enc.indices.to_numpy(zero_copy_only=False)
        vocab = enc.dictionary.to_pylist()
        val_c = _cents(t["value"]).to_numpy()
        if val_c.size:
            # enforce the documented cents² headroom — numpy int64 overflow
            # is a silent wraparound, not an error (exact Python-int bound)
            m = int(np.abs(val_c).max())
            if val_c.size * m * m >= 2 ** 62:
                raise ValueError(
                    "events_value_zscore: block cents² sum would overflow "
                    "int64 — split hi/lo words or shrink the block size")
        n, s, s2 = [], [], []
        for k in range(len(vocab)):   # ≤ domain iterations, not rows
            m = codes == k
            vk = val_c[m]
            n.append(int(m.sum()))
            s.append(int(vk.sum()))
            s2.append(int((vk * vk).sum()))
        return pa.table({"event_type": pa.array(vocab, pa.string()),
                         "n": pa.array(n, pa.int64()),
                         "sum_c": pa.array(s, pa.int64()),
                         "sum_sq_c2": pa.array(s2, pa.int64())})

    agg = (ds.map_batches(partial, batch_format="pyarrow").to_pandas()
           .groupby("event_type", sort=True).sum())
    stats = {}
    for et, row in agg.iterrows():
        n, s, s2 = int(row["n"]), int(row["sum_c"]), int(row["sum_sq_c2"])
        mean = s / n / 100.0
        # exact integer numerator: n*s2 - s^2 = n(n-1)·var·1e4  (Python ints,
        # no overflow); one IEEE division+sqrt at the end
        var = (n * s2 - s * s) / (n * (n - 1)) / 1e4 if n > 1 else float("nan")
        stats[et] = (mean, float(np.sqrt(var)))
    ref = ray.put(stats)

    def finish(t: pa.Table) -> pa.Table:
        st = ray.get(ref)
        enc = pc.dictionary_encode(t["event_type"].combine_chunks())
        codes = enc.indices.to_numpy(zero_copy_only=False)
        vocab = enc.dictionary.to_pylist()
        means = np.array([st[v][0] for v in vocab])[codes]
        stds = np.array([st[v][1] for v in vocab])[codes]
        v = t["value"].combine_chunks().to_numpy()
        return pa.table({"event_id": t["event_id"],
                         "event_type": t["event_type"],
                         "z": pa.array((v - means) / stds, pa.float64())})

    return ds.map_batches(finish, batch_format="pyarrow")


Q_EVENTS_VALUE_ZSCORE_SQL = """
SELECT event_id, event_type,
       (value - avg(value) OVER (PARTITION BY event_type))
         / stddev_samp(value) OVER (PARTITION BY event_type) AS z
FROM events
"""


def _latest_event_block(t: pa.Table) -> pa.Table:
    """Block-local latest-event-per-user partial (max (ts, event_id) per
    user via one vectorized lexsort); module-level so the empty-block guard
    is directly testable."""
    if not t.num_rows:   # np.r_[mask-of-0, True] misindexes an empty take
        return t
    u = t["user_id"].combine_chunks().to_numpy()
    ts = pc.cast(t["ts"].combine_chunks(), pa.int64()).to_numpy()
    eid = t["event_id"].combine_chunks().to_numpy()
    order = np.lexsort((eid, ts, u))          # ascending; last per user wins
    su = u[order]
    last = np.r_[su[1:] != su[:-1], True]
    return t.take(pa.array(order[last]))


def q_events_latest_by_user(sf_dir: str) -> rd.Dataset:
    """Latest-record-wins compaction: each user's single most recent event
    row (ts, then event_id as the deterministic tie-break) — the CDC/upsert
    compaction every snapshot-from-changelog pipeline runs.  Each block
    first reduces to ≤ |users-in-block| candidate rows with one vectorized
    lexsort (so the exchange carries per-block winners, never the raw
    stream), then the per-user finish runs once per hash(user) SHARD."""
    from .relational import _shard_by_int

    ds = rd.read_parquet(_pq(sf_dir, "events"))

    def shard_latest(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        return g[g["user_id"].ne(g["user_id"].shift(-1))].drop(columns="shard")

    partials = ds.map_batches(_latest_event_block, batch_format="pyarrow")
    return _shard_by_int(partials, "user_id").groupby("shard").map_groups(
        shard_latest, batch_format="pandas")


Q_EVENTS_LATEST_BY_USER_SQL = """
SELECT event_id, ts, user_id, event_type, value, props FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id
                               ORDER BY ts DESC, event_id DESC) AS rn
  FROM events)
WHERE rn = 1
"""


_DEBOUNCE_WINDOW_S = 86400


def q_events_dedup_window(sf_dir: str,
                          window_s: int = _DEBOUNCE_WINDOW_S) -> rd.Dataset:
    """Debounce dedup: drop an event when the PREVIOUS event of the same
    (user_id, event_type) is within ``window_s`` seconds — the telemetry /
    notification-digest dedup every event pipeline runs ("at most one
    signup-reminder per user per day").  Lag-against-previous-EVENT
    semantics (not previous-kept), so the decision depends only on each
    row's immediate predecessor in (user_id, event_type, ts, event_id)
    order: one projected exchange by hash(user_id), then a single vectorized
    lexsort + int64-µs diff per shard.  Block-local pre-dropping is NOT
    possible here (a row's predecessor may live in another block), so the
    exchange carries the 4 projected columns — 10^12 rows move once,
    32 B/row, and nothing corpus-sized ever funnels through the driver."""
    from .relational import _shard_by_int

    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["event_id", "ts", "user_id", "event_type"])
    w_us = window_s * 1_000_000

    def debounce(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "event_type", "ts", "event_id"],
                          kind="mergesort")
        # explicit µs normalization: a ns-unit pandas block would silently
        # inflate every gap 1000× against the µs threshold (same guard as
        # _trailing_hour_shard)
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        new_key = (g["user_id"].ne(g["user_id"].shift())
                   | g["event_type"].ne(g["event_type"].shift())).to_numpy()
        d = np.zeros(len(g), dtype=np.int64)
        d[1:] = ts[1:] - ts[:-1]
        return g.loc[new_key | (d > w_us)].drop(columns="shard")

    return (_shard_by_int(ds, "user_id").groupby("shard")
            .map_groups(debounce, batch_format="pandas"))


Q_EVENTS_DEDUP_WINDOW_SQL = f"""
SELECT event_id, ts, user_id, event_type FROM (
  SELECT event_id, ts, user_id, event_type,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
             PARTITION BY user_id, event_type
             ORDER BY ts, event_id) AS d
  FROM events)
WHERE d IS NULL OR d > {_DEBOUNCE_WINDOW_S * 1_000_000}
"""


def q_lineitem_unpivot(sf_dir: str) -> rd.Dataset:
    """UNPIVOT / melt — wide measure columns to (key, measure, value) long
    form, the inverse of the pivot family.  Pure per-batch stacking (one
    Arrow concat of three projected column views per block); no shuffle,
    output is 3× the input rows."""
    measures = ["l_quantity", "l_discount", "l_tax"]
    ds = rd.read_parquet(_pq(sf_dir, "lineitem"),
                         columns=["l_orderkey", "l_linenumber"] + measures)

    def melt(t: pa.Table) -> pa.Table:
        parts = [pa.table({
            "l_orderkey": t["l_orderkey"],
            "l_linenumber": t["l_linenumber"],
            "measure": pa.array([m] * t.num_rows, pa.string()),
            "value": pc.cast(t[m], pa.float64()),
        }) for m in measures]
        return pa.concat_tables(parts)

    return ds.map_batches(melt, batch_format="pyarrow")


Q_LINEITEM_UNPIVOT_SQL = """
SELECT l_orderkey, l_linenumber, name AS measure, value
FROM (UNPIVOT (SELECT l_orderkey, l_linenumber,
                      l_quantity, l_discount, l_tax FROM lineitem)
      ON l_quantity, l_discount, l_tax INTO NAME name VALUE value)
"""
