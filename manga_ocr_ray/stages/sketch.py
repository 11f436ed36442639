"""Approximate aggregates: HyperLogLog distinct-count sketch.

The reference has no sketches (SURVEY §2.5 notes the gap); at 10^12-turn
scale an exact ``count(distinct conv_id)`` is a full shuffle of every key,
while an HLL sketch is a 2^p-byte register array merged by elementwise max —
a tree reduce over tiny partials.  Shape: ``map_batches`` emits ONE register
row per block; the driver merges B small rows (B = number of blocks), never
the keys themselves.

Standard HLL with the Flajolet-Fu​sy-Gandouet-Meunier bias corrections; the
hash is the engine's deterministic 64-bit mix (hashing.py), so estimates are
identical across runs and cluster sizes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from ..functions.hashing import hash64_array, mix64


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def hll_partial(hashes: np.ndarray, p: int = 12) -> np.ndarray:
    """Register array (uint8[2^p]) for one batch of 64-bit hashes."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if hashes.size == 0:
        return regs
    h = mix64(hashes.astype(np.uint64))
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    # rank = leading zeros of the remaining (64-p) bits + 1, capped
    lz = np.full(h.shape, 64 - p, dtype=np.int64)
    nonzero = rest != 0
    # leading zeros via float64 exponent is unsafe >2^53; use bit_length trick
    r = rest[nonzero]
    bl = np.zeros(r.shape, dtype=np.int64)
    for shift in (32, 16, 8, 4, 2, 1):
        step = r >> np.uint64(shift)
        has = step != 0
        bl[has] += shift
        r = np.where(has, step, r)
    lz[nonzero] = 63 - bl
    rank = np.minimum(lz + 1, 64 - p + 1).astype(np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    m = regs.size
    est = _alpha(m) * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        return m * np.log(m / zeros)  # linear counting for small cardinalities
    return float(est)


def approx_distinct(ds: rd.Dataset, column: str, p: int = 12) -> float:
    """Distributed approximate distinct count of a string/int column."""

    def partial(t: pa.Table) -> pd.DataFrame:
        col = t[column]
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            hashes = hash64_array(col)
        else:
            hashes = mix64(
                col.combine_chunks().fill_null(0).to_numpy().astype(np.uint64)
            )
        return pd.DataFrame({"regs": [hll_partial(hashes, p).tobytes()]})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    merged = np.zeros(1 << p, dtype=np.uint8)
    for blob in parts["regs"]:
        np.maximum(merged, np.frombuffer(blob, dtype=np.uint8), out=merged)
    return hll_estimate(merged)


# ---- mergeable quantile sketch (fixed-bin histogram) -----------------------

def histogram_partial(values: np.ndarray, lo: float, hi: float,
                      bins: int = 2048) -> np.ndarray:
    """int64[bins+2] counts: [underflow, bins..., overflow] for one batch."""
    counts = np.zeros(bins + 2, dtype=np.int64)
    if values.size == 0:
        return counts
    idx = np.floor((values - lo) / max(hi - lo, 1e-300) * bins).astype(np.int64)
    idx = np.clip(idx + 1, 0, bins + 1)
    idx[values < lo] = 0
    idx[values >= hi] = bins + 1
    np.add.at(counts, idx, 1)
    return counts


def histogram_quantile(counts: np.ndarray, lo: float, hi: float,
                       q: float) -> float:
    """Quantile estimate from merged counts (linear within the hit bin)."""
    bins = counts.size - 2
    total = int(counts.sum())
    if total == 0:
        return float("nan")
    target = q * (total - 1)
    cum = np.cumsum(counts)
    b = int(np.searchsorted(cum, target + 1))
    if b == 0:
        return lo
    if b >= bins + 1:
        return hi
    prev = cum[b - 1]
    within = (target - prev + 1) / max(counts[b], 1)
    width = (hi - lo) / bins
    return lo + (b - 1 + min(within, 1.0)) * width


def approx_quantiles(ds: rd.Dataset, column: str, qs: tuple[float, ...] = (0.5,),
                     bins: int = 2048) -> dict[float, float]:
    """Distributed approximate quantiles: one cheap min/max pass, then
    per-block histogram partials merged by elementwise sum — the same
    partial+merge shape as the HLL sketch, bounded error (hi-lo)/bins.  At
    10^12 rows this replaces the per-group exact numpy quantile path."""
    stats = ds.aggregate(
        *(a for a in _minmax_aggs(column))
    )
    lo, hi = float(stats[f"min({column})"]), float(stats[f"max({column})"])
    if hi <= lo:
        return {q: lo for q in qs}
    hi = np.nextafter(hi, np.inf)

    def partial(t: pa.Table) -> pd.DataFrame:
        v = t[column].combine_chunks().drop_null().to_numpy()
        return pd.DataFrame({"h": [histogram_partial(v, lo, hi, bins).tobytes()]})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    merged = np.zeros(bins + 2, dtype=np.int64)
    for blob in parts["h"]:
        merged += np.frombuffer(blob, dtype=np.int64)
    return {q: histogram_quantile(merged, lo, hi, q) for q in qs}


def _minmax_aggs(column: str):
    from ray.data.aggregate import Max, Min

    return (Min(column), Max(column))


def grouped_approx_quantiles(
    ds: rd.Dataset,
    key_col: str,
    value_col: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75),
    bins: int = 2048,
    num_shards: int | None = None,
    key_type: "pa.DataType | None" = None,
) -> rd.Dataset:
    """Per-GROUP approximate quantiles — the scale-safe twin of exact
    per-group ``np.quantile`` (which materializes a whole group in one task:
    a skew hazard at 10^12 rows; VERDICT r1 item 6).

    Shape: (1) tiny groupby for per-key min/max, broadcast via ``ray.put``;
    (2) ``map_batches`` emits one histogram partial per (block, key) — only
    fixed-size register rows shuffle, never values; (3) partials merge by
    elementwise sum inside a SHARD-grouped pass (per-key map_groups would pay
    Ray's per-group task overhead once per key).  Error ≤ (hi-lo)/bins per
    key.  Returns (key, q_<pct>...) rows.
    """
    import ray

    ranges = ds.groupby(key_col).aggregate(*_minmax_aggs(value_col)).to_pandas()
    lo_map = dict(zip(ranges[key_col], ranges[f"min({value_col})"].astype(float)))
    hi_map = {
        k: np.nextafter(float(v), np.inf)
        for k, v in zip(ranges[key_col], ranges[f"max({value_col})"])
    }
    ref = ray.put((lo_map, hi_map))
    if num_shards is None:
        import ray as _r
        cpus = int(_r.cluster_resources().get("CPU", 4)) if _r.is_initialized() else 4
        num_shards = max(8, cpus * 2)

    # Partials and the merge stay Arrow end-to-end (register blobs as
    # pa.binary()): a pandas block in the middle forfeits zero-copy through
    # the shard shuffle and trips Ray's block-format mismatch warnings.
    def partial(t: pa.Table) -> pa.Table:
        lo_m, hi_m = ray.get(ref)
        ktype = t.schema.field(key_col).type
        g = pd.DataFrame({
            "k": t[key_col].combine_chunks().to_numpy(zero_copy_only=False),
            "v": t[value_col].combine_chunks().to_numpy(zero_copy_only=False),
        })
        keys, hists = [], []
        for k, sub in g.groupby("k", sort=False):
            keys.append(k)
            hists.append(histogram_partial(
                sub["v"].to_numpy(np.float64), lo_m[k], hi_m[k], bins).tobytes())
        karr = pa.array(keys, ktype)
        shard = pd.util.hash_pandas_object(
            pd.Series(keys), index=False).to_numpy() % num_shards
        return pa.table({key_col: karr, "h": pa.array(hists, pa.binary()),
                         "shard": pa.array(shard.astype(np.int64))})

    def merge(g: pa.Table) -> pa.Table:
        qcols = [f"q_{int(q * 100)}" for q in qs]
        # A schema-less EMPTY range partition carries no key type; fall back
        # to the caller-declared key_type (string only as a last resort —
        # int-keyed callers must pass key_type or the empty block would
        # schema-mismatch the populated ones).
        ktype = g.schema.field(key_col).type if key_col in g.column_names \
            else (key_type or pa.string())
        if g.num_rows == 0:
            return pa.table({key_col: pa.array([], ktype),
                             **{c: pa.array([], pa.float64()) for c in qcols}})
        lo_m, hi_m = ray.get(ref)
        sub = pd.DataFrame({"k": g[key_col].to_pandas(),
                            "h": g["h"].to_pandas()})
        keys, quants = [], []
        for k, s in sub.groupby("k", sort=False):
            merged = np.zeros(bins + 2, dtype=np.int64)
            for blob in s["h"]:
                merged += np.frombuffer(blob, dtype=np.int64)
            keys.append(k)
            quants.append([histogram_quantile(merged, lo_m[k], hi_m[k], q)
                           for q in qs])
        qm = np.asarray(quants, dtype=np.float64)
        return pa.table({key_col: pa.array(keys, ktype),
                         **{c: pa.array(qm[:, i]) for i, c in enumerate(qcols)}})

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(merge, batch_format="pyarrow")
    )


def mg_partial_loop(arr, capacity: int) -> dict:
    """Textbook Misra-Gries decrement loop — kept as the property-test twin
    of the vectorized :func:`heavy_hitters` partial (same undercount bound,
    per-row Python, never on the production path)."""
    counters: dict = {}
    for v in arr:
        if v in counters:
            counters[v] += 1
        elif len(counters) < capacity:
            counters[v] = 1
        else:
            dead = []
            for key in counters:
                counters[key] -= 1
                if counters[key] == 0:
                    dead.append(key)
            for key in dead:
                del counters[key]
    return counters


def heavy_hitters(ds: rd.Dataset, column: str, k: int = 20,
                  capacity: int = 256) -> pd.DataFrame:
    """Approximate top-k heavy hitters with bounded memory.

    Each block builds a top-``capacity``-by-count summary of its EXACT value
    counts (one vectorized ``np.unique``; ties broken by item for
    determinism).  Dropping everything below the capacity-th count
    undercounts any item by at most the (capacity+1)-th largest block count
    ≤ block_n/(capacity+1) — the same space-saving/Misra-Gries-style
    guarantee as a decrement summary (whose per-row Python loop this
    replaces; :func:`mg_partial_loop` remains as the property-test twin).
    Summaries are (item, weight) rows — at most ``capacity`` per block —
    merged by a combining groupby Sum, so total undercount ≤ n/capacity and
    any item with true frequency above that is guaranteed to survive.  The
    final top-k sorts the (tiny) merged summary.  Contrast with the exact
    wordcount (`doc_top_tokens`): this never holds more than ``capacity``
    counters per block, no matter the cardinality of the column.
    """
    from ray.data.aggregate import Sum

    def mg_partial(t: pa.Table) -> pa.Table:
        vals = t[column].combine_chunks()
        arr = vals.to_numpy(zero_copy_only=False)
        if len(arr) == 0:
            return pa.table({"item": pa.array([], vals.type),
                             "weight": pa.array([], pa.int64())})
        uniq, counts = np.unique(arr, return_counts=True)
        if len(uniq) > capacity:
            # np.unique returns items ascending → a stable sort on -count
            # keeps the smaller item first within equal counts (determinism
            # at any block layout)
            order = np.argsort(-counts, kind="stable")[:capacity]
            uniq, counts = uniq[order], counts[order]
        return pa.table({"item": pa.array(uniq, vals.type),
                         "weight": pa.array(counts.astype(np.int64), pa.int64())})

    merged = (
        ds.map_batches(mg_partial, batch_format="pyarrow")
        .groupby("item")
        .aggregate(Sum("weight", alias_name="est_count"))
        .to_pandas()
    )
    return (merged.sort_values(["est_count", "item"], ascending=[False, True])
            .head(k).reset_index(drop=True))


def grouped_approx_distinct(
    ds: rd.Dataset,
    key_col: str,
    value_col: str,
    p: int = 12,
    num_shards: int | None = None,
    key_type: "pa.DataType | None" = None,
) -> rd.Dataset:
    """Per-GROUP approximate distinct count — the scale-safe twin of exact
    ``count(DISTINCT v) GROUP BY k`` (which shuffles every (k, v) pair; the
    HLL form shuffles one 2^p-byte register row per (block, key)).

    Same three-stage shape as grouped_approx_quantiles: map_batches emits a
    register partial per (block, key); partials merge by elementwise MAX in
    a shard-grouped pass; ±~1.04/sqrt(2^p) relative error per key.  Returns
    (key, approx_distinct) rows; estimates are deterministic across runs and
    block layouts (hash is the engine's seedless mix, max-merge commutes).
    """
    import ray as _r

    if num_shards is None:
        cpus = int(_r.cluster_resources().get("CPU", 4)) if _r.is_initialized() else 4
        num_shards = max(8, cpus * 2)

    # Arrow end-to-end (same rationale as grouped_approx_quantiles): the
    # register blobs ride as pa.binary(), so the shard shuffle never
    # converts block formats.
    def partial(t: pa.Table) -> pa.Table:
        ktype = t.schema.field(key_col).type
        k = t[key_col].combine_chunks().to_numpy(zero_copy_only=False)
        col = t[value_col].combine_chunks()
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            h = hash64_array(col)
        else:
            h = mix64(col.to_numpy(zero_copy_only=False).astype(np.uint64))
        g = pd.DataFrame({"k": k, "h": h})
        keys, regs = [], []
        for kk, sub in g.groupby("k", sort=False):
            keys.append(kk)
            regs.append(hll_partial(sub["h"].to_numpy(), p).tobytes())
        shard = pd.util.hash_pandas_object(
            pd.Series(keys), index=False).to_numpy() % num_shards
        return pa.table({key_col: pa.array(keys, ktype),
                         "regs": pa.array(regs, pa.binary()),
                         "shard": pa.array(shard.astype(np.int64))})

    def merge(g: pa.Table) -> pa.Table:
        # Same empty-partition key-type rule as grouped_approx_quantiles.
        ktype = g.schema.field(key_col).type if key_col in g.column_names \
            else (key_type or pa.string())
        if g.num_rows == 0:
            return pa.table({key_col: pa.array([], ktype),
                             "approx_distinct": pa.array([], pa.int64())})
        sub = pd.DataFrame({"k": g[key_col].to_pandas(),
                            "regs": g["regs"].to_pandas()})
        keys, ests = [], []
        for kk, s in sub.groupby("k", sort=False):
            merged = np.zeros(1 << p, dtype=np.uint8)
            for blob in s["regs"]:
                np.maximum(merged, np.frombuffer(blob, dtype=np.uint8), out=merged)
            keys.append(kk)
            ests.append(int(round(hll_estimate(merged))))
        return pa.table({key_col: pa.array(keys, ktype),
                         "approx_distinct": pa.array(ests, pa.int64())})

    return (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("shard").map_groups(merge, batch_format="pyarrow"))
