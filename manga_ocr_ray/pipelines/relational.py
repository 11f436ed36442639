"""Relational operators over the driver's TPC-H-ish tables.

Each function takes ``sf_dir`` and returns a Ray Dataset / pandas result
whose columns match the DuckDB oracle SQL in ``__ray_entry__.oracle_sql()``
exactly.  These cover the reference's implicit relational surface
(SURVEY.md §2: filters/projections M4-M10, groupby G1-G3, sorts/limits
O1-O6, union U1, lookups J1/J2, dedup D1-D3) re-expressed Ray-Data-first:

- reads prune columns at the parquet scan,
- per-batch predicates/projections are pyarrow.compute kernels,
- small join sides are broadcast via ``ray.put`` (no shuffle),
- aggregations use Ray's map-side-combining ``groupby().aggregate``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Mean, Min, Sum


def _pq(sf_dir: str, table: str) -> str:
    return f"{sf_dir}/{table}.parquet"



def _join_partitions() -> int:
    """Hash-join partition count scaled to the cluster (≈CPU/2, floor 8)."""
    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    return max(8, cpus // 2)


def _broadcast_max_rows() -> int:
    """Cardinality switch between broadcast-lookup and hash-join plans for
    small-side tables keyed on an unbounded-cardinality column (vocabulary,
    user id).  Below this many rows the side is shipped once via ``ray.put``
    and looked up map-side; above it — a 10^9-row side would OOM the driver
    as a pandas object — it stays a Dataset and hash-joins on the key with
    partitions sized to the measured cardinality.  Env-overridable so tests
    force the join path on tiny data."""
    import os

    return int(os.environ.get("GRAFT_BROADCAST_MAX_ROWS", 5_000_000))


# ---- G3/G1 analog: grouped aggregation with computed measures (TPC-H Q1) ---

def _cents(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Lossless double→int64 cents (prices/quantities/discounts in the data
    are 2-decimal; verified max |x*100 - round(x*100)| < 1e-9)."""
    return pc.cast(pc.round(pc.multiply(col, pa.scalar(100.0))), pa.int64())


def q1_pricing_summary(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q1 with decimal-exact aggregation: float Sum over distributed
    blocks accumulates in nondeterministic order, so the last bits differ
    run-to-run and from any oracle.  Summing int64 cents is exact and
    order-independent; the final division back to dollars is one IEEE op
    mirrored verbatim in the oracle SQL → bit-identical doubles.
    (int64 partial sums hold ~9e9 rows/group at these magnitudes; beyond
    that, split hi/lo words or pre-scale per partition.)

    Plan (r5): the group domain is bounded (|returnflag|×|linestatus| = 6),
    so each block reduces to ≤6 partial rows via dictionary-encode + masked
    int64 sums and the blocks×6 partial table combines on the DRIVER — no
    shuffle at all.  The previous corpus-sized ``groupby().aggregate``
    bought nothing at this cardinality and its empty hash partitions
    emitted key-only schemas (Ray RefBundle schema-mismatch warnings)."""
    ds = rd.read_parquet(
        _pq(sf_dir, "lineitem"),
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["l_shipdate"], pa.scalar(pd.Timestamp("1998-09-02"))))
        pair = pc.binary_join_element_wise(
            t["l_returnflag"], t["l_linestatus"], "|")
        enc = pc.dictionary_encode(pair.combine_chunks())
        codes = enc.indices.to_numpy(zero_copy_only=False)
        vocab = enc.dictionary.to_pylist()
        qty_c = _cents(t["l_quantity"]).to_numpy()
        price_c = _cents(t["l_extendedprice"]).to_numpy()
        disc_c = _cents(t["l_discount"]).to_numpy()
        # price_cents * (100 - disc_cents) = disc_price in 1e-4 dollars, exact
        dp_e4 = price_c * (100 - disc_c)
        rows: dict[str, list] = {"pair": vocab, "n": [], "sum_qty_c": [],
                                 "sum_price_c": [], "sum_dp_e4": [],
                                 "sum_disc_c": []}
        for k in range(len(vocab)):   # ≤6 iterations — the domain, not rows
            m = codes == k
            rows["n"].append(int(m.sum()))
            rows["sum_qty_c"].append(int(qty_c[m].sum()))
            rows["sum_price_c"].append(int(price_c[m].sum()))
            rows["sum_dp_e4"].append(int(dp_e4[m].sum()))
            rows["sum_disc_c"].append(int(disc_c[m].sum()))
        return pa.table({"pair": pa.array(rows["pair"], pa.string()),
                         **{c: pa.array(rows[c], pa.int64())
                            for c in ("n", "sum_qty_c", "sum_price_c",
                                      "sum_dp_e4", "sum_disc_c")}})

    p = (ds.map_batches(partial, batch_format="pyarrow")
           .to_pandas().groupby("pair", as_index=False).sum()
           .sort_values("pair").reset_index(drop=True))
    flag_status = p["pair"].str.split("|", expand=True)
    n = p["n"].to_numpy().astype(np.float64)
    sum_qty_c = p["sum_qty_c"].to_numpy().astype(np.float64)
    sum_price_c = p["sum_price_c"].to_numpy().astype(np.float64)
    sum_dp_e4 = p["sum_dp_e4"].to_numpy().astype(np.float64)
    sum_disc_c = p["sum_disc_c"].to_numpy().astype(np.float64)
    return pd.DataFrame({
        "l_returnflag": flag_status[0], "l_linestatus": flag_status[1],
        "sum_qty": sum_qty_c / 100.0,
        "sum_base_price": sum_price_c / 100.0,
        "sum_disc_price": sum_dp_e4 / 10000.0,
        "avg_qty": sum_qty_c / 100.0 / n,
        "avg_price": sum_price_c / 100.0 / n,
        "avg_disc": sum_disc_c / 100.0 / n,
        "count_order": p["n"].astype(np.int64),
    })


Q1_SQL = """
WITH c AS (
  SELECT l_returnflag, l_linestatus,
         CAST(round(l_quantity * 100) AS BIGINT)      AS qty_c,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c,
         CAST(round(l_discount * 100) AS BIGINT)      AS disc_c
  FROM lineitem
  WHERE l_shipdate <= TIMESTAMP '1998-09-02'
)
SELECT l_returnflag, l_linestatus,
       CAST(sum(qty_c) AS DOUBLE) / 100.0                        AS sum_qty,
       CAST(sum(price_c) AS DOUBLE) / 100.0                      AS sum_base_price,
       CAST(sum(price_c * (100 - disc_c)) AS DOUBLE) / 10000.0   AS sum_disc_price,
       CAST(sum(qty_c) AS DOUBLE) / 100.0 / count(*)             AS avg_qty,
       CAST(sum(price_c) AS DOUBLE) / 100.0 / count(*)           AS avg_price,
       CAST(sum(disc_c) AS DOUBLE) / 100.0 / count(*)            AS avg_disc,
       count(*)                                                  AS count_order
FROM c
GROUP BY l_returnflag, l_linestatus
"""


# ---- M4/M5: vectorized filter + projection --------------------------------

def q_filter_project(sf_dir: str) -> rd.Dataset:
    ds = rd.read_parquet(
        _pq(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_linenumber", "l_quantity",
                 "l_extendedprice", "l_discount"],
    )

    def fp(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["l_quantity"], pa.scalar(45.0)))
        revenue = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "l_linenumber": t["l_linenumber"],
                "revenue": revenue,
            }
        )

    return ds.map_batches(fp, batch_format="pyarrow")


Q_FILTER_PROJECT_SQL = """
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount) AS revenue
FROM lineitem WHERE l_quantity > 45
"""


# ---- J1/J2: broadcast lookup joins ----------------------------------------

class BroadcastJoiner:
    """Map-side hash join against a broadcast small table (``ray.put`` once,
    ``ray.get`` once per actor in ``__init__`` — never per batch)."""

    def __init__(self, small_ref, on: str, how: str = "inner"):
        self.small = ray.get(small_ref)
        self.on = on
        self.how = how

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return batch.merge(self.small, on=self.on, how=self.how)


def q_region_customer_count(sf_dir: str) -> rd.Dataset:
    """customer ⋈ nation ⋈ region (both dimension sides broadcast), count +
    total account balance per region name."""
    nation = pd.read_parquet(_pq(sf_dir, "nation"), columns=["n_nationkey", "n_regionkey"])
    region = pd.read_parquet(_pq(sf_dir, "region"), columns=["r_regionkey", "r_name"])
    dim = nation.merge(region, left_on="n_regionkey", right_on="r_regionkey")[
        ["n_nationkey", "r_name"]
    ].rename(columns={"n_nationkey": "c_nationkey"})
    ref = ray.put(dim)

    ds = rd.read_parquet(_pq(sf_dir, "customer"), columns=["c_custkey", "c_nationkey", "c_acctbal"])
    joined = ds.map_batches(
        BroadcastJoiner, fn_constructor_args=(ref, "c_nationkey"),
        batch_format="pandas", concurrency=2,
    )
    return joined.groupby("r_name").aggregate(
        Count(alias_name="n_customers"), Sum("c_acctbal", alias_name="total_acctbal")
    )


Q_REGION_CUSTOMER_COUNT_SQL = """
SELECT r_name, count(*) AS n_customers, sum(c_acctbal) AS total_acctbal
FROM customer JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def q_top_customers(sf_dir: str) -> pd.DataFrame:
    """orders grouped to per-customer revenue, customer names broadcast-joined
    in, top 10 by revenue (G + J + O in one pipeline)."""
    orders = rd.read_parquet(_pq(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"])
    per_cust = orders.groupby("o_custkey").aggregate(
        Sum("o_totalprice", alias_name="revenue"), Count(alias_name="n_orders")
    )
    cust = pd.read_parquet(_pq(sf_dir, "customer"), columns=["c_custkey", "c_name"]).rename(
        columns={"c_custkey": "o_custkey"}
    )
    ref = ray.put(cust)
    joined = per_cust.map_batches(
        BroadcastJoiner, fn_constructor_args=(ref, "o_custkey"),
        batch_format="pandas", concurrency=2,
    )
    top = joined.sort("revenue", descending=True).limit(10).to_pandas()
    return top.rename(columns={"o_custkey": "c_custkey"})[
        ["c_custkey", "c_name", "revenue", "n_orders"]
    ]


Q_TOP_CUSTOMERS_SQL = """
SELECT o_custkey AS c_custkey, c_name,
       sum(o_totalprice) AS revenue, count(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY o_custkey, c_name
ORDER BY revenue DESC LIMIT 10
"""


# ---- O1/O6: sort + limit ---------------------------------------------------

def q_top_orders(sf_dir: str) -> rd.Dataset:
    ds = rd.read_parquet(_pq(sf_dir, "orders"),
                         columns=["o_orderkey", "o_totalprice", "o_orderdate"])
    return ds.sort("o_totalprice", descending=True).limit(5)


Q_TOP_ORDERS_SQL = """
SELECT o_orderkey, o_totalprice, o_orderdate
FROM orders ORDER BY o_totalprice DESC LIMIT 5
"""


# ---- U1 + D: union + distinct ---------------------------------------------

def q_union_nations(sf_dir: str) -> rd.Dataset:
    c = rd.read_parquet(_pq(sf_dir, "customer"), columns=["c_nationkey"]).map_batches(
        lambda t: t.rename_columns(["nationkey"]), batch_format="pyarrow"
    )
    s = rd.read_parquet(_pq(sf_dir, "supplier"), columns=["s_nationkey"]).map_batches(
        lambda t: t.rename_columns(["nationkey"]), batch_format="pyarrow"
    )
    return c.union(s).groupby("nationkey").aggregate(Count(alias_name="n_rows"))


Q_UNION_NATIONS_SQL = """
SELECT nationkey, count(*) AS n_rows FROM (
  SELECT c_nationkey AS nationkey FROM customer
  UNION ALL
  SELECT s_nationkey AS nationkey FROM supplier
) GROUP BY nationkey
"""


# ---- streaming-shaped: tumbling window + JSON props ------------------------

def q_events_hourly(sf_dir: str) -> rd.Dataset:
    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["event_type", "ts", "value"])

    def add_window(t: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(t["ts"], unit="hour")
        return t.append_column("window_start", hour)

    return (
        ds.map_batches(add_window, batch_format="pyarrow")
        .groupby(["event_type", "window_start"])
        .aggregate(Count(alias_name="n_events"), Sum("value", alias_name="total_value"))
    )


Q_EVENTS_HOURLY_SQL = """
SELECT event_type, date_trunc('hour', ts) AS window_start,
       count(*) AS n_events, sum(value) AS total_value
FROM events GROUP BY 1, 2
"""


def q_events_props(sf_dir: str) -> rd.Dataset:
    """JSON tool-payload parse (S3/M12 analog) + grouped aggregate.

    Top-level-scalar JSON-path extraction with exact ``->>'k'`` semantics:
    ONE vectorized RE2 pass handles payloads that are verifiably FLAT objects
    (``^\\{{[^{{}}\\[\\]]*\\}}$`` — no nested containers, so any ``"k"`` match
    is at depth 1), covering quoted ("12") and unquoted numeric values; rows
    that don't match the flat shape (nested objects, arrays, malformed JSON)
    fall back to per-row ``json.loads`` which replicates ``->>'k'`` +
    ``CAST(.. AS BIGINT)`` exactly.  Equivalence on nested / quoted /
    string-valued / malformed payloads is pinned by
    tests/test_relational.py."""
    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["event_type", "props"])

    return (
        ds.map_batches(parse_props_k, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Mean("k", alias_name="avg_k"), Max("k", alias_name="max_k"),
                   Min("k", alias_name="min_k"))
    )


def _round_half_away(f: float) -> int:
    import math

    return int(math.floor(f + 0.5)) if f >= 0 else int(math.ceil(f - 0.5))


def _props_k_slow(payload: str | None) -> int | None:
    """Exact ``TRY_CAST(props->>'k' AS BIGINT)`` for one payload (fallback).

    Mirrors DuckDB's measured semantics: duplicate keys → FIRST wins (the
    ``reversed`` pairs hook; json.loads alone keeps the last), numeric
    strings are whitespace-trimmed, fractional values round half away from
    zero (CAST('12.5') = 13), bool/null/containers/non-numeric → NULL."""
    import json

    try:
        obj = (json.loads(payload,
                          object_pairs_hook=lambda ps: {k: v for k, v in reversed(ps)})
               if payload is not None else None)
    except (json.JSONDecodeError, TypeError):
        return None
    if not isinstance(obj, dict) or "k" not in obj:
        return None
    v = obj["k"]
    if isinstance(v, bool) or v is None:
        return None
    if isinstance(v, int):
        return v
    if isinstance(v, float):
        return _round_half_away(v)
    if isinstance(v, str):
        s = v.strip()
        try:
            return int(s)  # CAST('12' AS BIGINT)
        except ValueError:
            try:
                return _round_half_away(float(s))  # CAST('12.5') = 13
            except (ValueError, OverflowError):
                return None
    return None  # containers: ->> returns their JSON text; CAST errors → NULL


from ..functions.jsonfast import FLAT_JSON_RE as _FLAT_JSON_RE


def parse_props_k(t: pa.Table) -> pa.Table:
    """(event_type, k) with k = top-level integer key of the props JSON.

    Fast path: rows that VALIDATE as a flat JSON object with exactly one
    ``"k"`` key are resolved by one RE2 extract — exact ``->>'k'`` +
    ``CAST AS BIGINT`` semantics by construction (quoted "12" coerces, 12.5
    / non-numeric → null via the trailing anchor).  Everything else (nested
    containers, duplicate keys, malformed JSON) goes through per-row
    json.loads.  At 100 TB the slow path is cold: real event-prop payloads
    are overwhelmingly flat."""
    props = t["props"].combine_chunks()
    filled = props.fill_null("")
    flat = pc.match_substring_regex(filled, _FLAT_JSON_RE)
    single_k = pc.equal(
        pc.count_substring_regex(filled, pattern=r'"k"\s*:'), 1)
    # optional symmetric quotes/space so CAST's whitespace-trimming on
    # quoted values (" 12 ") is honored; integer-shaped values only — flat
    # rows whose k is fractional/non-numeric drop to the slow path, which
    # replicates CAST's rounding ('12.5' → 13) exactly
    ext = pc.extract_regex(
        props, pattern=r'[{,]\s*"k"\s*:\s*"?\s*(?P<v>-?\d+)\s*"?\s*[,}]')
    k_fast = pc.cast(pc.struct_field(ext, "v"), pa.int64())
    fast = pc.and_(pc.and_(flat, single_k), pc.is_valid(k_fast))
    fast_np = fast.to_numpy(zero_copy_only=False)
    if bool(np.all(fast_np)):
        k = k_fast
    else:
        out = k_fast.to_pylist()
        slow_idx = np.flatnonzero(~fast_np)
        for i, v in zip(slow_idx,
                        props.take(pa.array(slow_idx)).to_pylist()):
            out[i] = _props_k_slow(v)
        k = pa.array(out, pa.int64())
    return pa.table({"event_type": t["event_type"], "k": k})


Q_EVENTS_PROPS_SQL = """
SELECT event_type, avg(CAST(props->>'k' AS BIGINT)) AS avg_k,
       max(CAST(props->>'k' AS BIGINT)) AS max_k,
       min(CAST(props->>'k' AS BIGINT)) AS min_k
FROM events GROUP BY event_type
"""



def _default_shards() -> int:
    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    return max(32, cpus * 8)


def _shard_by_int(ds: rd.Dataset, key_col: str, num_shards: int | None = None) -> rd.Dataset:
    """Add a hash-shard column over an int64 key: per-ENTITY grouping pays
    Ray's per-group task overhead once per entity; grouping by shard and
    vectorizing across a shard's entities in pandas amortizes it ~1000x
    (same trick as conversation_merge / dedup bucket shards)."""
    from ..functions.hashing import mix64

    S = np.uint64(num_shards or _default_shards())

    def add(t: pa.Table) -> pa.Table:
        k = t[key_col].combine_chunks().to_numpy().astype(np.uint64)
        return t.append_column("shard", pa.array((mix64(k) % S).astype(np.int32)))

    return ds.map_batches(add, batch_format="pyarrow")


# ---- sessionization (gap-based windows over an ordered log) ----------------

def q_events_sessions(sf_dir: str, gap_minutes: int = 30) -> rd.Dataset:
    """Session windows per user: a new session starts when the gap from the
    previous event exceeds ``gap_minutes``.  Hash-shard groupby + one
    vectorized pandas pass per shard (per-user tasks would pay Ray's
    per-group overhead once per user; ordering contract: within-user ts
    order, enforced by the in-shard sort)."""
    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["user_id", "ts"])
    gap = pd.Timedelta(minutes=gap_minutes)

    def sessionize(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"], kind="mergesort")
        new_sess = (g.groupby("user_id")["ts"].diff() > gap).astype("int64")
        out = pd.DataFrame({"user_id": g["user_id"], "new_sess": new_sess})
        agg = out.groupby("user_id", sort=False).agg(
            n_sessions=("new_sess", "sum"), n_events=("new_sess", "size"))
        agg["n_sessions"] += 1
        return agg.reset_index()

    return _shard_by_int(ds, "user_id").groupby("shard").map_groups(
        sessionize, batch_format="pandas")


Q_EVENTS_SESSIONS_SQL = """
WITH gaps AS (
  SELECT user_id,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_sess
  FROM events
)
SELECT user_id, CAST(sum(new_sess) + 1 AS BIGINT) AS n_sessions,
       count(*) AS n_events
FROM gaps GROUP BY user_id
"""


# ---- G1-style per-group top-k ---------------------------------------------

def q_top_parts_per_brand(sf_dir: str) -> rd.Dataset:
    ds = rd.read_parquet(_pq(sf_dir, "part"),
                         columns=["p_partkey", "p_brand", "p_retailprice"])

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["p_retailprice", "p_partkey"],
                             ascending=[False, True]).head(3)

    return ds.groupby("p_brand").map_groups(topk, batch_format="pandas")


Q_TOP_PARTS_PER_BRAND_SQL = """
SELECT p_partkey, p_brand, p_retailprice FROM (
  SELECT p_partkey, p_brand, p_retailprice,
         row_number() OVER (PARTITION BY p_brand
                            ORDER BY p_retailprice DESC, p_partkey) AS rn
  FROM part
) WHERE rn <= 3
"""


# ---- M9: deterministic hash split -----------------------------------------

def q_doc_split(sf_dir: str) -> rd.Dataset:
    """Deterministic 90/10 split by md5 of the text — the seeded-hash
    replacement for the reference's random split
    (process_manga109s.py:149-151), reproducible on both engines."""
    import hashlib

    ds = rd.read_parquet(_pq(sf_dir, "documents"), columns=["doc_id", "text"])

    def split(t: pa.Table) -> pa.Table:
        # md5 stays (the one hash both engines compute identically); the loop
        # cost is the digest itself — first digest byte == int(hex[:2], 16)
        labels = [
            "test" if hashlib.md5(x.encode()).digest()[0] < 26 else "train"
            for x in t["text"].to_pylist()
        ]
        return pa.table({"doc_id": t["doc_id"], "split": pa.array(labels)})

    return ds.map_batches(split, batch_format="pyarrow")


Q_DOC_SPLIT_SQL = """
SELECT doc_id,
       CASE WHEN CAST(('0x' || substr(md5(text), 1, 2)) AS INTEGER) < 26
            THEN 'test' ELSE 'train' END AS split
FROM documents
"""


# ---- large-large hash join (Ray native partitioned join) -------------------

def q_order_revenue_join(sf_dir: str) -> rd.Dataset:
    """orders ⋈ lineitem (both sides large → Ray's hash-partitioned join),
    then revenue per order priority.  The shuffle-join path, in contrast to
    the broadcast joins above."""
    orders = rd.read_parquet(_pq(sf_dir, "orders"),
                             columns=["o_orderkey", "o_orderpriority"])
    li = rd.read_parquet(_pq(sf_dir, "lineitem"),
                         columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def rev(t: pa.Table) -> pa.Table:
        # exact int64 revenue in 1e-4 dollars (see q1_pricing_summary): float
        # Sum order is nondeterministic across blocks, integer Sum is exact
        price_c = _cents(t["l_extendedprice"])
        disc_c = _cents(t["l_discount"])
        r = pc.multiply(price_c, pc.subtract(pa.scalar(100, pa.int64()), disc_c))
        return pa.table({"l_orderkey": t["l_orderkey"], "rev_e4": r})

    li = li.map_batches(rev, batch_format="pyarrow")
    joined = orders.join(li, join_type="inner", num_partitions=_join_partitions(),
                         on=("o_orderkey",), right_on=("l_orderkey",))
    agg = joined.groupby("o_orderpriority").aggregate(
        Sum("rev_e4", alias_name="sum_rev_e4"), Count(alias_name="n_items")
    )

    def finish(t: pa.Table) -> pa.Table:
        rev = t["sum_rev_e4"].combine_chunks().to_numpy().astype(np.float64)
        return pa.table({
            "o_orderpriority": t["o_orderpriority"],
            "total_revenue": rev / 10000.0,
            "n_items": t["n_items"],
        })

    return agg.map_batches(finish, batch_format="pyarrow")


Q_ORDER_REVENUE_JOIN_SQL = """
SELECT o_orderpriority,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE)
         / 10000.0 AS total_revenue,
       count(*) AS n_items
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderpriority
"""


# ---- as-of join (custom operator Ray Data lacks) ---------------------------

def q_events_asof_signup(sf_dir: str) -> rd.Dataset:
    """As-of join: each purchase event matched to the user's most recent
    signup event at-or-before its timestamp.

    Implementation: hash-shard on user, then ONE ts-sorted
    ``pd.merge_asof(by=user)`` per shard — the composition for as-of/range
    joins with per-group overhead amortized across a shard's users
    (partitioning assumption: one user's events fit one shard; salting by
    time range would relax this for pathological users).
    """
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["event_id", "user_id", "event_type", "ts"])

    def asof(g: pd.DataFrame) -> pd.DataFrame:
        # merge_asof(by=user) vectorizes the per-user as-of across the whole
        # shard; mergesort keeps ties resolving to max signup event_id
        buys = g[g.event_type == "purchase"].sort_values(
            ["ts", "event_id"], kind="mergesort")
        signups = g[g.event_type == "signup"].sort_values(
            ["ts", "event_id"], kind="mergesort")
        if buys.empty:
            return pd.DataFrame({"event_id": pd.Series([], dtype="int64"),
                                 "user_id": pd.Series([], dtype="int64"),
                                 "signup_event_id": pd.Series([], dtype="int64")})
        merged = pd.merge_asof(
            buys[["event_id", "user_id", "ts"]],
            signups[["event_id", "user_id", "ts"]].rename(
                columns={"event_id": "signup_event_id"}),
            on="ts", by="user_id", direction="backward", allow_exact_matches=True,
        )
        merged = merged.dropna(subset=["signup_event_id"])
        return merged[["event_id", "user_id", "signup_event_id"]].astype(
            {"signup_event_id": "int64"})

    return _shard_by_int(ds, "user_id").groupby("shard").map_groups(
        asof, batch_format="pandas")


Q_EVENTS_ASOF_SQL = """
WITH buys AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
     s AS (SELECT b.event_id, b.user_id, g.event_id AS signup_event_id,
                  row_number() OVER (PARTITION BY b.event_id
                                     ORDER BY g.ts DESC, g.event_id DESC) AS rn
           FROM buys b JOIN events g
             ON g.user_id = b.user_id AND g.event_type = 'signup' AND g.ts <= b.ts)
SELECT event_id, user_id, signup_event_id FROM s WHERE rn = 1
"""


# ---- windowed running aggregate --------------------------------------------

def q_events_cumulative(sf_dir: str) -> rd.Dataset:
    """Per-user running sum of ``value`` in (ts, event_id) order — the
    stream-shaped incremental aggregate, via sorted map_groups."""
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["event_id", "user_id", "ts", "value"])

    def cum(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        return pd.DataFrame({
            "event_id": g["event_id"],
            "user_id": g["user_id"],
            "running_value": g.groupby("user_id", sort=False)["value"].cumsum(),
        })

    return _shard_by_int(ds, "user_id").groupby("shard").map_groups(
        cum, batch_format="pandas")


Q_EVENTS_CUMULATIVE_SQL = """
SELECT event_id, user_id,
       sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS running_value
FROM events
"""


# ---- M13: char-class fractions (vectorized codepoint ranges) ---------------

def q_doc_char_classes(sf_dir: str) -> rd.Dataset:
    """ascii/digit/space + kanji/hiragana/katakana char counts per document —
    the reference's char classifiers (common/utils.py:60-151: unicodedata
    name-based is_kanji/is_hiragana/is_katakana/is_ascii) as vectorized
    codepoint-range RE2 count kernels."""
    from ..functions.textstats import HIRAGANA_CLASS, KANJI_CLASS, KATAKANA_CLASS

    ds = rd.read_parquet(_pq(sf_dir, "documents"), columns=["doc_id", "text"])

    def classes(t: pa.Table) -> pa.Table:
        text = t["text"]

        def cnt(pat: str):
            return pc.cast(pc.count_substring_regex(text, pattern=pat), pa.int64())

        return pa.table({
            "doc_id": t["doc_id"],
            "n_ascii_alpha": cnt("[A-Za-z]"),
            "n_digit": cnt("[0-9]"),
            "n_space": cnt(" "),
            "n_kanji": cnt(KANJI_CLASS),
            "n_hiragana": cnt(HIRAGANA_CLASS),
            "n_katakana": cnt(KATAKANA_CLASS),
        })

    return ds.map_batches(classes, batch_format="pyarrow")


def _doc_char_classes_sql() -> str:
    from ..functions.textstats import HIRAGANA_CLASS, KANJI_CLASS, KATAKANA_CLASS

    return f"""
SELECT doc_id,
       len(regexp_extract_all(text, '[A-Za-z]')) AS n_ascii_alpha,
       len(regexp_extract_all(text, '[0-9]')) AS n_digit,
       len(regexp_extract_all(text, ' ')) AS n_space,
       len(regexp_extract_all(text, '{KANJI_CLASS}')) AS n_kanji,
       len(regexp_extract_all(text, '{HIRAGANA_CLASS}')) AS n_hiragana,
       len(regexp_extract_all(text, '{KATAKANA_CLASS}')) AS n_katakana
FROM documents
"""


Q_DOC_CHAR_CLASSES_SQL = _doc_char_classes_sql()


# ---- semi / anti joins (J4/J5: manifest anti-join pattern) -----------------

def q_customers_no_orders(sf_dir: str) -> rd.Dataset:
    """Customers with no big-ticket order — Ray's native hash-partitioned
    LEFT ANTI join after a pushed-down filter on the probe side (the resume
    anti-join of SURVEY §4.2 at relational scale; the reference's existence
    check is dataset.py:117-121)."""
    cust = rd.read_parquet(_pq(sf_dir, "customer"),
                           columns=["c_custkey", "c_name", "c_acctbal"])
    orders = rd.read_parquet(_pq(sf_dir, "orders"),
                             columns=["o_custkey", "o_totalprice"])
    big = orders.filter(expr="o_totalprice > 450000.0").select_columns(["o_custkey"])
    return cust.join(big, join_type="left_anti", num_partitions=_join_partitions(),
                     on=("c_custkey",), right_on=("o_custkey",))


Q_CUSTOMERS_NO_ORDERS_SQL = """
SELECT c_custkey, c_name, c_acctbal
FROM customer WHERE c_custkey NOT IN
  (SELECT o_custkey FROM orders WHERE o_totalprice > 450000.0)
"""


def q_suppliers_with_bigparts(sf_dir: str) -> rd.Dataset:
    """Suppliers of at least one part with size >= 40 — LEFT SEMI join
    after a pushed-down filter on the probe side."""
    supp = rd.read_parquet(_pq(sf_dir, "supplier"),
                           columns=["s_suppkey", "s_name", "s_nationkey"])
    part = rd.read_parquet(_pq(sf_dir, "part"), columns=["p_partkey", "p_size"])
    big = part.filter(expr="p_size >= 40")

    # the driver tables carry no partsupp; the supplying relation is derived
    # identically on both sides as the modulo class p_partkey % 1000
    def modclass(t: pa.Table) -> pa.Table:
        pk = t["p_partkey"].combine_chunks().to_numpy()
        return pa.table({"sk_mod": pa.array((pk % 1000).astype("int64"))})

    probe = big.map_batches(modclass, batch_format="pyarrow")

    def smod(t: pa.Table) -> pa.Table:
        sk = t["s_suppkey"].combine_chunks().to_numpy()
        return t.append_column("sk_mod", pa.array((sk % 1000).astype("int64")))

    supp2 = supp.map_batches(smod, batch_format="pyarrow")
    out = supp2.join(probe, join_type="left_semi", num_partitions=_join_partitions(), on=("sk_mod",))
    return out.select_columns(["s_suppkey", "s_name", "s_nationkey"])


Q_SUPPLIERS_WITH_BIGPARTS_SQL = """
SELECT s_suppkey, s_name, s_nationkey
FROM supplier WHERE s_suppkey % 1000 IN
  (SELECT p_partkey % 1000 FROM part WHERE p_size >= 40)
"""


# ---- distinct (G2: the shuffle-dedup of keys) ------------------------------

def q_event_types(sf_dir: str) -> rd.Dataset:
    """Distinct event types — groupby-based distinct (G2,
    generate_backgrounds.py:107's ``unique()`` at relational scale)."""
    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["event_type"])
    return ds.groupby("event_type").count().select_columns(["event_type"])


Q_EVENT_TYPES_SQL = "SELECT DISTINCT event_type FROM events"


# ---- rolling window: per-user moving average -------------------------------

def q_events_moving_avg(sf_dir: str) -> rd.Dataset:
    """3-event moving average of ``value`` per user in (ts, event_id) order —
    the bounded-window analog of the running aggregate."""
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["event_id", "user_id", "ts", "value"])

    def roll(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        mv = (g.groupby("user_id", sort=False)["value"]
                .rolling(window=3, min_periods=1).mean()
                .droplevel(0))
        return pd.DataFrame({
            "event_id": g["event_id"],
            "user_id": g["user_id"],
            "moving_avg": mv,
        })

    return _shard_by_int(ds, "user_id").groupby("shard").map_groups(
        roll, batch_format="pandas")


Q_EVENTS_MOVING_AVG_SQL = """
SELECT event_id, user_id,
       avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS moving_avg
FROM events
"""


# ---- grouped quantiles ------------------------------------------------------

def q_orders_price_quantiles(sf_dir: str) -> pd.DataFrame:
    """Exact interpolated p25/median/p75 of order totalprice per priority —
    the grouped case of the shared coarse→fine distributed rank selection
    (``analytic._rank_select_cents``): each group's floor/ceil order
    statistics resolve in the SAME two streaming passes and interpolate
    exactly like SQL ``quantile_cont``.  r5 rewrite: the previous plan
    hash-partitioned the corpus for a per-priority ``map_groups`` — a
    corpus-sized sort-shuffle (each group IS corpus/5) whose empty
    partitions also emitted schema-less bundles into the BENCH tail; the
    selection plan moves O(blocks × occupied $10-bins) instead."""
    from .analytic import _rank_select_cents

    ds = rd.read_parquet(_pq(sf_dir, "orders"),
                         columns=["o_orderpriority", "o_totalprice"])
    quantiles = (0.25, 0.5, 0.75)

    def prep(t: pa.Table):
        return (t["o_orderpriority"].to_numpy(zero_copy_only=False),
                _cents(t["o_totalprice"]).to_numpy(), None)

    def thresholds_of(totals: dict[str, int]) -> dict[str, list[float]]:
        th = {}
        for g, n in totals.items():
            ranks = ({int(np.floor((n - 1) * q)) for q in quantiles}
                     | {int(np.ceil((n - 1) * q)) for q in quantiles})
            th[g] = sorted(float(r + 1) for r in ranks)
        return th

    totals, sel = _rank_select_cents(ds, prep, thresholds_of)
    rows = []
    for g, n in sorted(totals.items()):
        row: dict[str, object] = {"o_orderpriority": g}
        for q, name in zip(quantiles, ("p25", "median", "p75")):
            pos = (n - 1) * q
            lo = sel[(g, float(int(np.floor(pos)) + 1))] / 100.0
            hi = sel[(g, float(int(np.ceil(pos)) + 1))] / 100.0
            row[name] = lo + (pos - np.floor(pos)) * (hi - lo)
        rows.append(row)
    return pd.DataFrame(rows)


Q_ORDERS_PRICE_QUANTILES_SQL = """
SELECT o_orderpriority,
       quantile_cont(o_totalprice, 0.25) AS p25,
       quantile_cont(o_totalprice, 0.50) AS median,
       quantile_cont(o_totalprice, 0.75) AS p75
FROM orders GROUP BY o_orderpriority
"""


# ---- 3-way join chain (TPC-H Q3 shape): semi + inner + grouped agg ---------

def q3_shipping_priority(sf_dir: str) -> rd.Dataset:
    """Top-10 unshipped BUILDING orders by revenue — the chained-join shape
    (customer ⋈ orders ⋈ lineitem).  The small filtered side reduces to a
    semi join; revenue aggregates in exact int64 cents (float Sum order is
    nondeterministic across blocks).  Join partition counts stay at
    _join_partitions() — oversubscribing hash-shuffle aggregator actors past
    the CPU budget can wedge the pipeline on small clusters."""
    cutoff = pd.Timestamp("1995-03-15")
    cust = rd.read_parquet(_pq(sf_dir, "customer"),
                           columns=["c_custkey", "c_mktsegment"])
    cust = cust.filter(expr="c_mktsegment == 'BUILDING'").select_columns(["c_custkey"])
    orders = rd.read_parquet(_pq(sf_dir, "orders"),
                             columns=["o_orderkey", "o_custkey", "o_orderdate",
                                      "o_orderpriority"])
    orders = orders.map_batches(
        lambda t: t.filter(pc.less(t["o_orderdate"], pa.scalar(cutoff))),
        batch_format="pyarrow")
    li = rd.read_parquet(_pq(sf_dir, "lineitem"),
                         columns=["l_orderkey", "l_extendedprice", "l_discount",
                                  "l_shipdate"])

    def rev(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["l_shipdate"], pa.scalar(cutoff)))
        r = pc.multiply(_cents(t["l_extendedprice"]),
                        pc.subtract(pa.scalar(100, pa.int64()), _cents(t["l_discount"])))
        return pa.table({"l_orderkey": t["l_orderkey"], "rev_e4": r})

    li = li.map_batches(rev, batch_format="pyarrow")
    n = _join_partitions()
    j1 = orders.join(cust, join_type="left_semi", num_partitions=n,
                     on=("o_custkey",), right_on=("c_custkey",))
    j2 = j1.join(li, join_type="inner", num_partitions=n,
                 on=("o_orderkey",), right_on=("l_orderkey",))
    agg = j2.groupby(["o_orderkey", "o_orderdate", "o_orderpriority"]).aggregate(
        Sum("rev_e4", alias_name="sum_rev_e4"))

    def finish(t: pa.Table) -> pa.Table:
        r = t["sum_rev_e4"].combine_chunks().to_numpy().astype(np.float64)
        return pa.table({
            "l_orderkey": t["o_orderkey"],
            "revenue": r / 10000.0,
            "o_orderdate": t["o_orderdate"],
            "o_orderpriority": t["o_orderpriority"],
        })

    out = agg.map_batches(finish, batch_format="pyarrow")
    return out.sort(["revenue", "l_orderkey"], descending=[True, False]).limit(10)


Q3_SQL = """
SELECT l_orderkey,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE)
         / 10000.0 AS revenue,
       o_orderdate, o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15'
  AND l_shipdate  > TIMESTAMP '1995-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey LIMIT 10
"""


# ---- session-id assignment (per-event window labeling) ---------------------

def q_events_session_ids(sf_dir: str, gap_minutes: int = 30) -> rd.Dataset:
    """Each event labeled with its 0-based session index within its user
    (gap > 30min starts a new session).  Shard-grouped vectorized cumsum —
    the per-event twin of q_events_sessions' per-user counts."""
    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["event_id", "user_id", "ts"])
    gap = pd.Timedelta(minutes=gap_minutes)

    def label(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        new_sess = (g.groupby("user_id")["ts"].diff() > gap).astype("int64")
        sidx = new_sess.groupby(g["user_id"]).cumsum()
        return pd.DataFrame({"event_id": g["event_id"], "session_idx": sidx})

    return _shard_by_int(ds, "user_id").groupby("shard").map_groups(
        label, batch_format="pandas")


Q_EVENTS_SESSION_IDS_SQL = """
WITH gaps AS (
  SELECT event_id, user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_sess
  FROM events)
SELECT event_id,
       CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
FROM gaps
"""


# ---- global rank / ntile (total-order enumeration without a driver loop) ---

def global_rank(ds: rd.Dataset, keys: list[str], *, rank_col: str = "rank",
                descending: bool | list[bool] = False) -> rd.Dataset:
    """1-based global row number under a total order — ``row_number() OVER
    (ORDER BY keys)`` distributed:

    1. ``ds.sort(keys)`` (range-partitioned shuffle; include a unique
       tie-break column in ``keys`` for determinism),
    2. per-block row COUNTS via tiny parallel tasks (one int per block),
    3. exclusive prefix sum of the counts on the driver,
    4. one parallel task per block appends base_offset + local index.

    Rows never funnel through the driver — only the per-block counts do.
    """
    srt = ds.sort(keys, descending=descending).materialize()
    refs = srt.get_internal_block_refs()

    @ray.remote
    def _nrows(block) -> int:
        # blocks are Arrow tables (parquet reads) or pandas frames
        # (from_pandas datasets)
        return block.num_rows if isinstance(block, pa.Table) else len(block)

    @ray.remote
    def _rank_block(base: int, block) -> pa.Table:
        if not isinstance(block, pa.Table):
            block = pa.Table.from_pandas(block, preserve_index=False)
        return block.append_column(
            rank_col,
            pa.array(np.arange(base + 1, base + 1 + block.num_rows, dtype=np.int64)),
        )

    counts = ray.get([_nrows.remote(r) for r in refs])
    bases = np.concatenate(([0], np.cumsum(counts)[:-1]))
    return rd.from_arrow_refs(
        [_rank_block.remote(int(b), r) for b, r in zip(bases, refs)]
    )


def q_orders_price_rank(sf_dir: str) -> rd.Dataset:
    """Every order with its global 1-based rank by (totalprice desc, key)."""
    ds = rd.read_parquet(_pq(sf_dir, "orders"),
                         columns=["o_orderkey", "o_totalprice"])
    return global_rank(ds, ["o_totalprice", "o_orderkey"],
                       descending=[True, False])


Q_ORDERS_PRICE_RANK_SQL = """
SELECT o_orderkey, o_totalprice,
       row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rank
FROM orders
"""


# ---- range join (custom operator Ray Data lacks) ---------------------------

def q_events_range_join(sf_dir: str) -> rd.Dataset:
    """Range join: each signup joined to the same user's purchases inside
    [signup_ts, signup_ts + 7 days] — the interval-predicate join Ray Data
    has no native operator for.

    Composition: hash-shard on user, then per shard TWO vectorized
    ``merge_asof(by=user)`` probes against per-user cumulative (count, cents)
    prefix tables — window aggregate = C(hi, inclusive) − C(lo, exclusive).
    No per-user Python; money in exact int64 cents so the distributed sum is
    bit-equal to the SQL twin.  Partitioning assumption: one user's events
    fit one shard (same as the as-of join; salt by time range to relax)."""
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["event_id", "user_id", "event_type", "ts",
                                  "value"])

    def rjoin(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "event_id": pd.Series([], dtype="int64"),
            "user_id": pd.Series([], dtype="int64"),
            "n_purchases": pd.Series([], dtype="int64"),
            "sum_value_cents": pd.Series([], dtype="int64"),
        })
        g = g.astype({"ts": "datetime64[us]"})  # one unit for both asof sides
        s = g.loc[g.event_type == "signup",
                  ["event_id", "user_id", "ts"]]
        if s.empty:
            return empty
        p = g.loc[g.event_type == "purchase",
                  ["user_id", "ts", "value"]].copy()
        if p.empty:
            out = s[["event_id", "user_id"]].copy()
            out["n_purchases"] = np.int64(0)
            out["sum_value_cents"] = np.int64(0)
            return out.astype({"event_id": "int64", "user_id": "int64"})
        p["cents"] = (p["value"] * 100).round().astype("int64")
        # per-user cumulative prefix tables, then ONE global t-sort so both
        # asof probes are a single vectorized pass over the shard
        p = p.sort_values(["user_id", "ts"], kind="mergesort")
        p["cum_n"] = p.groupby("user_id").cumcount().astype("int64") + 1
        p["cum_c"] = p.groupby("user_id")["cents"].cumsum()
        p = p.rename(columns={"ts": "t"})[["user_id", "t", "cum_n", "cum_c"]]
        p = p.sort_values("t", kind="mergesort")

        def probe(at: pd.Series, inclusive: bool) -> pd.DataFrame:
            q = s[["event_id", "user_id"]].copy()
            q["t"] = at.values.astype("datetime64[us]")
            q = q.sort_values("t", kind="mergesort")
            m = pd.merge_asof(q, p, on="t", by="user_id",
                              direction="backward",
                              allow_exact_matches=inclusive)
            m = m.set_index("event_id")
            return m[["cum_n", "cum_c"]].fillna(0).astype("int64")

        hi = probe(s["ts"] + pd.Timedelta(days=7), inclusive=True)
        lo = probe(s["ts"], inclusive=False)
        out = s[["event_id", "user_id"]].set_index("event_id")
        out["n_purchases"] = hi["cum_n"] - lo["cum_n"]
        out["sum_value_cents"] = hi["cum_c"] - lo["cum_c"]
        return out.reset_index()

    return _shard_by_int(ds, "user_id").groupby("shard").map_groups(
        rjoin, batch_format="pandas")


Q_EVENTS_RANGE_JOIN_SQL = """
WITH s AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'signup'),
     p AS (SELECT user_id, ts, CAST(round(value * 100) AS BIGINT) AS cents
           FROM events WHERE event_type = 'purchase')
SELECT s.event_id, s.user_id,
       CAST(count(p.user_id) AS BIGINT) AS n_purchases,
       CAST(COALESCE(sum(p.cents), 0) AS BIGINT) AS sum_value_cents
FROM s LEFT JOIN p
  ON p.user_id = s.user_id
 AND p.ts >= s.ts AND p.ts <= s.ts + INTERVAL 7 DAY
GROUP BY s.event_id, s.user_id
"""


# ---- lag / lead window functions -------------------------------------------

def q_events_lag_lead(sf_dir: str) -> rd.Dataset:
    """Per-user LAG/LEAD: previous event id, microsecond gap to it, and next
    event type, in (ts, event_id) order — shard-grouped, one vectorized
    ``groupby.shift`` pass per shard.  Sentinels (-1 / '') instead of nulls
    keep dtypes exact across the engine/SQL hash compare."""
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["event_id", "user_id", "event_type", "ts"])

    def laglead(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        grp = g.groupby("user_id")
        prev_id = grp["event_id"].shift(1)
        prev_ts = grp["ts"].shift(1)
        next_type = grp["event_type"].shift(-1)
        cur_us = g["ts"].values.astype("datetime64[us]").astype("int64")
        prev_us = prev_ts.values.astype("datetime64[us]").astype("int64")
        first = prev_id.isna().values
        return pd.DataFrame({
            "event_id": g["event_id"].values,
            "prev_event_id": np.where(first, -1, prev_id.fillna(0).values).astype("int64"),
            "gap_us": np.where(first, -1, cur_us - prev_us).astype("int64"),
            "next_event_type": next_type.fillna("").values,
        })

    return _shard_by_int(ds, "user_id").groupby("shard").map_groups(
        laglead, batch_format="pandas")


Q_EVENTS_LAG_LEAD_SQL = """
SELECT event_id,
       CAST(COALESCE(lag(event_id) OVER w, -1) AS BIGINT) AS prev_event_id,
       CAST(COALESCE(epoch_us(ts) - epoch_us(lag(ts) OVER w), -1) AS BIGINT)
         AS gap_us,
       COALESCE(lead(event_type) OVER w, '') AS next_event_type
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


# ---- pivot / crosstab ------------------------------------------------------

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def q_events_pivot_daily(sf_dir: str) -> rd.Dataset:
    """Pivot (crosstab): one row per day, one count column per event type.
    Wide-to-columns via vectorized one-hot int64 columns + ONE combining
    groupby — per-block partials shrink to (days × types) before the
    shuffle, so the exchange is tiny at any scale.  The column set is the
    FIXED public event-type vocabulary (schema stability; an unexpected
    type lands in none of the columns and would be caught by n_total)."""
    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["ts", "event_type"])

    def onehot(t: pa.Table) -> pa.Table:
        day = pc.floor_temporal(t["ts"], unit="day")
        cols: dict[str, pa.Array] = {"day": day}
        for et in EVENT_TYPES:
            cols[f"n_{et}"] = pc.cast(pc.equal(t["event_type"], et), pa.int64())
        cols["n_total"] = pa.array(np.ones(t.num_rows, dtype=np.int64))
        return pa.table(cols)

    return (
        ds.map_batches(onehot, batch_format="pyarrow")
        .groupby("day")
        .aggregate(*[Sum(f"n_{et}", alias_name=f"n_{et}") for et in EVENT_TYPES],
                   Sum("n_total", alias_name="n_total"))
    )


Q_EVENTS_PIVOT_DAILY_SQL = """
SELECT date_trunc('day', ts) AS day,
       CAST(count(*) FILTER (event_type = 'click')    AS BIGINT) AS n_click,
       CAST(count(*) FILTER (event_type = 'error')    AS BIGINT) AS n_error,
       CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS n_purchase,
       CAST(count(*) FILTER (event_type = 'signup')   AS BIGINT) AS n_signup,
       CAST(count(*) FILTER (event_type = 'view')     AS BIGINT) AS n_view,
       CAST(count(*) AS BIGINT) AS n_total
FROM events
GROUP BY 1
"""


# ---- set difference (EXCEPT) as one combining groupby ----------------------

def q_customers_churned_1996(sf_dir: str) -> rd.Dataset:
    """EXCEPT set op: customers who ordered in 1995 but not in 1996 —
    expressed as ONE combining groupby (per-key max of year flags, then a
    flag filter) instead of two distincts + an anti join: a single small
    shuffle of (key, 2 bits) partials.  INTERSECT is the same graph with
    the filter y95 & y96."""
    ds = rd.read_parquet(_pq(sf_dir, "orders"),
                         columns=["o_custkey", "o_orderdate"])

    def flags(t: pa.Table) -> pa.Table:
        y = pc.year(t["o_orderdate"])
        return pa.table({
            "o_custkey": t["o_custkey"],
            "y95": pc.cast(pc.equal(y, 1995), pa.int64()),
            "y96": pc.cast(pc.equal(y, 1996), pa.int64()),
        })

    agg = (ds.map_batches(flags, batch_format="pyarrow")
           .groupby("o_custkey")
           .aggregate(Max("y95", alias_name="y95"), Max("y96", alias_name="y96")))

    def keep(t: pa.Table) -> pa.Table:
        mask = pc.and_(pc.equal(t["y95"], 1), pc.equal(t["y96"], 0))
        return t.filter(mask).select(["o_custkey"])

    return agg.map_batches(keep, batch_format="pyarrow")


Q_CUSTOMERS_CHURNED_1996_SQL = """
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
EXCEPT
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
"""
