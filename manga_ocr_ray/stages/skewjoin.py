"""Skew-aware fact⋈dim join: hot keys split off the shuffle path.

A hash join partitions by key, so one hot key (a celebrity user, an empty
string, a default id) lands its ENTIRE row set on one reduce partition —
at 100 TB that one straggler task dominates the join's wall time.  The
classic fixes are salting (replicate the dim row K ways, scatter the fact
rows across the replicas) or a hot/cold split.  This implements the split,
which strictly dominates salting when the hot keys' DIM rows fit on the
driver (they do by construction — there are at most ``top_k`` of them):

  1. detect hot fact keys with the engine's bounded-memory heavy-hitters
     summary (`stages.sketch.heavy_hitters` — per-block np.unique partials,
     combining-groupby merge; undercount ≤ n/capacity, so any key above
     the hot threshold is guaranteed detected);
  2. dim rows for hot keys → ``ray.put`` once, map-side merge of the hot
     fact rows inside an actor pool (no shuffle for the skewed mass);
  3. the cold remainder goes through the normal hash join — now with
     near-uniform partitions;
  4. union.  Results are exactly the inner join's rows (pytest-pinned
     against a plain join and the `events_segment_revenue` SQL oracle).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from .sketch import heavy_hitters


def detect_hot_keys(fact: rd.Dataset, key: str, *, hot_frac: float = 0.001,
                    top_k: int = 32, capacity: int = 256) -> np.ndarray:
    """Keys whose estimated share of fact rows exceeds ``hot_frac``.
    One counting pass (summaries only — no raw keys leave the blocks)."""
    hh = heavy_hitters(fact, key, k=top_k, capacity=capacity)
    n = fact.count()
    hot = hh.loc[hh["est_count"] >= hot_frac * max(1, n), "item"]
    return hot.to_numpy()


class _HotMerge:
    """Map-side merge of hot fact rows with their broadcast dim rows —
    Arrow in/out (``index_in`` + ``take``, no per-batch pandas round-trip);
    the hash-join cold branch also emits Arrow, so ``union()`` sees one
    block format."""

    def __init__(self, dim_ref, fact_key: str, dim_key: str):
        dim: pa.Table = ray.get(dim_ref)
        self.keys = dim[dim_key].combine_chunks()
        self.dim_cols = {c: dim[c].combine_chunks()
                         for c in dim.column_names if c != dim_key}
        self.fact_key = fact_key

    def __call__(self, t: pa.Table) -> pa.Table:
        idx = pc.index_in(t[self.fact_key], value_set=self.keys)
        keep = idx.is_valid()
        t, idx = t.filter(keep), idx.filter(keep)
        for name, col in self.dim_cols.items():
            t = t.append_column(name, col.take(idx))
        return t


def skew_join_fact_dim(fact: rd.Dataset, fact_key: str, dim: rd.Dataset,
                       dim_key: str, *, num_partitions: int,
                       hot_frac: float = 0.001, top_k: int = 32,
                       concurrency: int | tuple[int, int] = (1, 8)) -> rd.Dataset:
    """Inner-join ``fact`` to ``dim`` with hot fact keys routed around the
    shuffle.  Exact inner-join semantics (dim assumed unique on ``dim_key``,
    the usual dimension contract).  Output columns: fact ∪ (dim − dim_key)
    — matching what the broadcast-merge path produces.

    Degenerate-input guard: Ray's hash join wedges on EMPTY partitions of
    either side (schema loss in the shuffle aggregator), and a tiny corpus
    with a low ``hot_frac`` can route almost every row down the hot path.
    The cold mass is estimated for FREE from the already-computed
    heavy-hitter summary (n − hot est mass, an overestimate since the
    summary undercounts); only when that estimate is small do we pay an
    exact count to drop the join entirely or shrink its partition count —
    at production scale the estimate is huge and no extra pass happens."""
    hh = heavy_hitters(fact, fact_key, k=top_k)
    n = fact.count()
    hot_rows = hh[hh["est_count"] >= hot_frac * max(1, n)]
    hot = hot_rows["item"].to_numpy()
    if hot.size == 0:
        return fact.join(dim, join_type="inner", on=(fact_key,),
                         right_on=(dim_key,), num_partitions=num_partitions)
    cold_est = n - int(hot_rows["est_count"].sum())

    hot_arr = pa.array(hot)
    dim_hot = pa.Table.from_pandas(dim.map_batches(
        lambda t: t.filter(pc.is_in(t[dim_key], value_set=hot_arr)),
        batch_format="pyarrow").to_pandas(), preserve_index=False)  # ≤ top_k rows
    dim_ref = ray.put(dim_hot)

    fact_hot = fact.map_batches(
        lambda t: t.filter(pc.is_in(t[fact_key], value_set=hot_arr)),
        batch_format="pyarrow")
    fact_cold = fact.map_batches(
        lambda t: t.filter(pc.invert(pc.is_in(t[fact_key], value_set=hot_arr))),
        batch_format="pyarrow")

    merged_hot = fact_hot.map_batches(
        _HotMerge, fn_constructor_args=(dim_ref, fact_key, dim_key),
        batch_format="pyarrow", concurrency=concurrency)
    # output columns: fact ∪ (dim − dim_key) — the hash join keeps dim_key,
    # the map-side merge consumed it as the index; select the same order
    out_cols = list(fact.schema().names) + \
        [c for c in dim.schema().names if c != dim_key]

    if cold_est < 10_000:
        n_cold = fact_cold.count()
        if n_cold == 0:
            return merged_hot.select_columns(out_cols)
        num_partitions = max(1, min(num_partitions, n_cold // 10_000 + 1))

    joined_cold = fact_cold.join(dim, join_type="inner", on=(fact_key,),
                                 right_on=(dim_key,),
                                 num_partitions=num_partitions)
    return joined_cold.select_columns(out_cols) \
                      .union(merged_hot.select_columns(out_cols))
