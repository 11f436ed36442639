"""Bloom-filter semi-join pruning for large⋈large joins.

At 100 TB the classic plan for ``fact SEMI JOIN dim_subset`` is an
all-to-all hash join that reshuffles every fact block.  When the key set
is too big to broadcast exactly but its *bloom filter* is small (1-2
bytes/key), the scalable plan is:

  1. build the filter distributedly — each key block emits a partial
     bloom (fixed-size uint64 bit array) via ``map_batches``; the driver
     ORs the partials (a few MB of reduction, never the keys themselves);
  2. ``ray.put`` the filter once and prune the fact table MAP-SIDE inside
     an actor-pool ``map_batches`` — no shuffle, false-positive rate p;
  3. run the EXACT hash join only on the survivors (|fact ∩ keys| +
     p·|fact| rows instead of |fact|), so results stay exact.

This is the bloom-join / sideways-information-passing pattern from the
database literature (e.g. "Optimizing Queries Using Materialized Views" /
LIP in Quickstep, and Spark's runtime row-group bloom pruning); hashing is
the repo's own splitmix64 ``mix64`` (functions/hashing.py:111) with
double-hashing h1 + i·h2 for the k probes — deterministic across workers.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from ..functions.hashing import mix64

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def bloom_params(n_keys: int, bits_per_key: int = 12) -> tuple[int, int]:
    """(m_bits rounded to a word multiple, k) for ~bits_per_key bits/key.
    k = round(m/n · ln 2); 12 bits/key → k=8 → p ≈ 0.03%."""
    m = max(1024, int(n_keys) * bits_per_key)
    m = (m + 63) // 64 * 64
    k = max(1, min(16, round(m / max(1, n_keys) * 0.6931)))
    return m, k


def _probe_positions(keys: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(n, k) bit positions via double hashing of the splitmix-mixed key."""
    u = keys.astype(np.uint64)
    h1 = mix64(u)
    h2 = mix64(u ^ _GOLDEN) | np.uint64(1)  # odd → full-period stride
    i = np.arange(k, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m_bits))


def _set_bits(words: np.ndarray, pos: np.ndarray) -> None:
    flat = pos.ravel()
    np.bitwise_or.at(words, (flat >> np.uint64(6)).astype(np.int64),
                     np.uint64(1) << (flat & np.uint64(63)))


def _test_bits(words: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """True where ALL k probed bits are set (possible member)."""
    w = words[(pos >> np.uint64(6)).astype(np.int64)]
    hit = (w >> (pos & np.uint64(63))) & np.uint64(1)
    return hit.all(axis=1)


def bloom_from_dataset(keys: rd.Dataset, key_col: str, *,
                       bits_per_key: int = 12) -> tuple["ray.ObjectRef", int, int]:
    """Distributed bloom build: per-block partial bit arrays, OR-reduced on
    the driver (each partial is m/8 bytes — MBs, independent of key count).
    Returns (object ref of the uint64 word array, m_bits, k)."""
    n = keys.count()  # callers pass a materialized key set (see bloom_semi_join)
    m_bits, k = bloom_params(n, bits_per_key)

    def partial(t: pa.Table) -> pa.Table:
        words = np.zeros(m_bits // 64, dtype=np.uint64)
        col = t[key_col].combine_chunks().to_numpy().astype(np.int64)
        _set_bits(words, _probe_positions(col, m_bits, k))
        return pa.table({"words": pa.array([words.view(np.uint8).tobytes()],
                                           pa.binary())})

    words = np.zeros(m_bits // 64, dtype=np.uint64)
    for b in keys.map_batches(partial, batch_format="pyarrow") \
                 .iter_batches(batch_format="pyarrow"):
        for buf in b["words"]:
            words |= np.frombuffer(buf.as_py(), dtype=np.uint64)
    return ray.put(words), m_bits, k


class BloomPrune:
    """Actor-pool map-side prune: keeps rows whose key MAY be in the filter
    (false positives pass — follow with the exact join on survivors)."""

    def __init__(self, words_ref: "ray.ObjectRef", m_bits: int, k: int,
                 key_col: str):
        self.words = ray.get(words_ref)
        self.m_bits, self.k, self.key_col = m_bits, k, key_col

    def __call__(self, t: pa.Table) -> pa.Table:
        col = t[self.key_col].combine_chunks().to_numpy().astype(np.int64)
        keep = _test_bits(self.words, _probe_positions(col, self.m_bits, self.k))
        return t.filter(pa.array(keep))


def bloom_semi_join(fact: rd.Dataset, fact_key: str, keys: rd.Dataset,
                    key_col: str, *, num_partitions: int,
                    bits_per_key: int = 12,
                    concurrency: int | tuple[int, int] = (1, 8)) -> rd.Dataset:
    """Exact semi-join of ``fact`` to the key set: bloom prune map-side,
    then a hash join on the (much smaller) survivor set removes the false
    positives.  Result columns = fact columns (+ key table's join col).

    ``keys`` is materialized once up front: it is consumed three times
    (count for sizing, partial-bloom pass, exact join) and re-deriving a
    filtered key pipeline per pass would re-scan its source each time.  The
    key set is the SMALL side by contract (that's why a bloom of it fits),
    so pinning it in the object store is bounded."""
    keys = keys.materialize()
    if keys.count() == 0:
        # an all-zero bloom prunes every fact row and the downstream hash
        # join wedges on empty partitions — the semi-join of anything with
        # an empty key set is empty; build it explicitly, schema included
        fs, ks = fact.schema(), keys.schema()
        fields = list(zip(fs.names, fs.types)) + \
            [(n, t) for n, t in zip(ks.names, ks.types) if n not in fs.names]
        return rd.from_arrow(pa.table(
            {n: pa.array([], t) for n, t in fields}))
    ref, m_bits, k = bloom_from_dataset(keys, key_col, bits_per_key=bits_per_key)
    pruned = fact.map_batches(BloomPrune, fn_constructor_args=(ref, m_bits, k, fact_key),
                              batch_format="pyarrow", concurrency=concurrency)

    # False-positive removal: when the key set itself is broadcast-small
    # (and single-column, so no payload columns need the join), the exact
    # verify is a map-side sorted-array membership — the bloom prune above
    # still runs (it is the scale path's shape) but the only all-to-all
    # exchange disappears.  A too-big-to-broadcast key set — the case the
    # bloom exists for — keeps the exact hash join on survivors.
    from ..pipelines.relational import _broadcast_max_rows

    if len(keys.schema().names) == 1 and keys.count() <= _broadcast_max_rows():
        sorted_ref = ray.put(np.sort(
            keys.to_pandas()[key_col].to_numpy(np.int64)))
        append_key = key_col not in fact.schema().names

        def verify(t: pa.Table) -> pa.Table:
            arr = ray.get(sorted_ref)
            col = t[fact_key].combine_chunks().to_numpy().astype(np.int64)
            idx = np.searchsorted(arr, col)
            idx[idx >= arr.size] = max(arr.size - 1, 0)
            hit = arr.size > 0 and arr[idx] == col
            t = t.filter(pa.array(hit if isinstance(hit, np.ndarray)
                                  else np.zeros(len(col), bool)))
            if append_key:
                t = t.append_column(key_col, t[fact_key])
            return t

        return pruned.map_batches(verify, batch_format="pyarrow")

    return pruned.join(keys, join_type="inner", on=(fact_key,),
                       right_on=(key_col,), num_partitions=num_partitions)
