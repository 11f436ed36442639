"""Similarity search over embedding columns (``list<float>``).

- :func:`knn_topk` — exact brute-force cosine top-k: the query matrix is
  broadcast once (``ray.put``); every batch does ONE f64 matmul against it
  and emits its partial top-k; partials (batches × q × k rows, tiny) merge at
  the end.  The full corpus streams — never materialized.
- :func:`ivf_knn_topk` — the scale path: IVF. Deterministic centroids from a
  hashed sample (k-means lite, driver-side on the sample only), per-batch
  cluster assignment, search restricted to the ``nprobe`` nearest centroid
  lists.
- :func:`embedding_near_dup_pairs` — cosine near-duplicate pairs; exact
  all-pairs per batch against the broadcast matrix at oracle scale, LSH
  hyperplane-bucketed variant (:func:`lsh_near_dup_pairs`) as the scale path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd


def _mat(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Embedding column → (n, d) float64 matrix (one copy, no Python rows).

    Handles plain ``list<float>`` / ``fixed_size_list`` arrays and Ray's
    ArrowTensorArray extension type (what ``rd.from_pandas`` produces for
    ndarray cells)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if hasattr(col, "flatten") and pa.types.is_nested(col.type):
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        return flat.reshape(n, -1) if n else flat.reshape(0, 0)
    arr = col.to_numpy(zero_copy_only=False)
    if arr.dtype == object:
        return np.stack(arr).astype(np.float64) if n else np.zeros((0, 0))
    return np.asarray(arr, dtype=np.float64).reshape(n, -1)


def _unit(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def knn_topk(
    ds: rd.Dataset,
    queries: np.ndarray,
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_ids: np.ndarray | None = None,
) -> pd.DataFrame:
    """Exact cosine top-k: → (query_id, rank, neighbor_id).

    Ties broken by (cosine desc, neighbor_id asc) — deterministic and
    oracle-matchable.  Self-matches (query_id == neighbor_id) excluded.
    """
    qm = _unit(np.asarray(queries, dtype=np.float64))
    qids = np.arange(len(qm)) if query_ids is None else np.asarray(query_ids)
    ref = ray.put((qm, qids))

    def partial_topk(batch: pa.Table) -> pa.Table:
        q, qi = ray.get(ref)
        ids = batch[id_col].to_numpy()
        m = _unit(_mat(batch[vec_col]))
        sims = q @ m.T  # (nq, nb)
        out_q, out_id, out_s = [], [], []
        kk = min(k + 1, sims.shape[1])
        for r in range(sims.shape[0]):
            row = sims[r]
            idx = np.argpartition(-row, kk - 1)[:kk]
            order = np.lexsort((ids[idx], -row[idx]))
            sel = idx[order]
            out_q.append(np.full(len(sel), qi[r]))
            out_id.append(ids[sel])
            out_s.append(row[sel])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q).astype(np.int64)),
                "neighbor_id": pa.array(np.concatenate(out_id).astype(np.int64)),
                "cosine": pa.array(np.concatenate(out_s)),
            }
        )

    partials = ds.map_batches(partial_topk, batch_format="pyarrow").to_pandas()
    partials = partials[partials["query_id"] != partials["neighbor_id"]]
    partials = partials.sort_values(
        ["query_id", "cosine", "neighbor_id"], ascending=[True, False, True]
    )
    top = partials.groupby("query_id", sort=True).head(k).copy()
    top["rank"] = top.groupby("query_id").cumcount() + 1
    return top[["query_id", "rank", "neighbor_id"]].reset_index(drop=True)


# ---- IVF (scale path) ------------------------------------------------------

def _kmeans_lite(sample: np.ndarray, n_clusters: int, iters: int = 8,
                 seed: int = 42) -> np.ndarray:
    rng = np.random.Generator(np.random.Philox(key=[seed, 0x1BF]))
    idx = rng.choice(len(sample), size=min(n_clusters, len(sample)), replace=False)
    cent = sample[np.sort(idx)].copy()
    for _ in range(iters):
        assign = np.argmax(_unit(sample) @ _unit(cent).T, axis=1)
        for c in range(len(cent)):
            m = assign == c
            if m.any():
                cent[c] = sample[m].mean(axis=0)
    return _unit(cent)


def ivf_knn_topk(
    ds: rd.Dataset,
    queries: np.ndarray,
    *,
    k: int = 5,
    n_clusters: int = 16,
    nprobe: int = 4,
    sample_frac: float = 0.2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> pd.DataFrame:
    """Approximate top-k via inverted-file probe lists.

    Centroids are trained driver-side on a deterministic sample (sampling a
    bounded set, not the corpus); the corpus is then streamed once — each
    batch scores only rows whose nearest centroid is in a query's probe set.
    """
    sample = _mat(
        ds.random_sample(sample_frac, seed=seed)
        .select_columns([vec_col])
        .to_pandas()[vec_col]
        .pipe(lambda s: pa.chunked_array([pa.array(list(s))]))
    )
    cent = _kmeans_lite(sample, n_clusters, seed=seed)
    qm = _unit(np.asarray(queries, dtype=np.float64))
    probes = np.argsort(-(qm @ cent.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    ref = ray.put((qm, cent, probes))

    def probe_topk(batch: pa.Table) -> pa.Table:
        q, c, pr = ray.get(ref)
        ids = batch[id_col].to_numpy()
        m = _unit(_mat(batch[vec_col]))
        assign = np.argmax(m @ c.T, axis=1)
        out_q, out_id, out_s = [], [], []
        for r in range(len(q)):
            mask = np.isin(assign, pr[r])
            if not mask.any():
                continue
            row = q[r] @ m[mask].T
            sub_ids = ids[mask]
            kk = min(k + 1, len(sub_ids))
            idx = np.argpartition(-row, kk - 1)[:kk]
            out_q.append(np.full(len(idx), r))
            out_id.append(sub_ids[idx])
            out_s.append(row[idx])
        if not out_q:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q).astype(np.int64)),
                "neighbor_id": pa.array(np.concatenate(out_id).astype(np.int64)),
                "cosine": pa.array(np.concatenate(out_s)),
            }
        )

    partials = ds.map_batches(probe_topk, batch_format="pyarrow").to_pandas()
    partials = partials[partials["query_id"] != partials["neighbor_id"]]
    partials = partials.sort_values(
        ["query_id", "cosine", "neighbor_id"], ascending=[True, False, True]
    )
    top = partials.groupby("query_id", sort=True).head(k).copy()
    top["rank"] = top.groupby("query_id").cumcount() + 1
    return top[["query_id", "rank", "neighbor_id"]].reset_index(drop=True)


# ---- cosine near-duplicates ------------------------------------------------

def embedding_near_dup_pairs(
    ds: rd.Dataset,
    *,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int | None = None,
    n_tables: int | None = None,
    seed: int = 42,
    target_recall: float = 0.95,
    max_tables: int = 16,
) -> pd.DataFrame:
    """Cosine near-dup pairs (id_a < id_b, cosine ≥ threshold) — DEFAULT
    path is hyperplane LSH (:func:`lsh_near_dup_pairs`): bucket-local exact
    verification means precision is exact; recall is governed by
    n_planes/n_tables, auto-tuned from the threshold when not given
    (pytest-pinned ≥0.9 on clustered fixtures).  Raise ``target_recall``
    (with ``max_tables`` headroom — tables multiply shuffle replication)
    when the caller needs near-exhaustive recall.  The O(corpus²) broadcast
    variant survives only as the oracle gate
    (:func:`embedding_near_dup_pairs_exact`)."""
    if n_planes is None or n_tables is None:
        n_planes, n_tables = lsh_params(threshold, target_recall=target_recall,
                                        max_tables=max_tables)
    return lsh_near_dup_pairs(
        ds, threshold=threshold, n_planes=n_planes, n_tables=n_tables,
        id_col=id_col, vec_col=vec_col, seed=seed,
    )


def lsh_params(threshold: float, target_recall: float = 0.95,
               max_tables: int = 16) -> tuple[int, int]:
    """(n_planes, n_tables) for hyperplane LSH hitting ``target_recall`` at
    ``threshold``: per-plane collision prob p = 1 - arccos(threshold)/π;
    per-table p^b; recall = 1-(1-p^b)^T.  Among T ∈ {4..max_tables} pick the
    largest feasible b (strongest bucket pruning; more tables = more
    replication through the shuffle — the standard recall/IO tradeoff).
    ``max_tables`` defaults to 16 — the production IO cap; callers chasing
    near-exhaustive recall (oracle gates, decontamination) may raise it."""
    if max_tables < 4:
        raise ValueError(f"max_tables must be >= 4, got {max_tables}")
    p = 1.0 - np.arccos(np.clip(threshold, -1.0, 1.0)) / np.pi
    best = (1, 4)
    for T in (4, 8, 16, 32, 64, 128):
        if T > max_tables:
            break
        q = 1.0 - (1.0 - target_recall) ** (1.0 / T)  # per-table prob needed
        b = max(1, int(np.floor(np.log(q) / np.log(p))))
        if b > best[0]:
            best = (b, T)
    return best


def embedding_near_dup_pairs_exact(
    ds: rd.Dataset,
    *,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """Exact cosine near-dup pairs (id_a < id_b, cosine ≥ threshold).

    Each batch multiplies against the broadcast full matrix; only upper-
    triangle hits are emitted.  ORACLE-GATE ONLY: the broadcast matrix is
    O(corpus) driver memory — the production path is
    :func:`embedding_near_dup_pairs` (LSH)."""
    pdf = ds.select_columns([id_col, vec_col]).to_pandas()
    all_ids = pdf[id_col].to_numpy()
    all_m = _unit(_mat(pa.chunked_array([pa.array(list(pdf[vec_col]))])))
    ref = ray.put((all_ids, all_m))

    def pairs(batch: pa.Table) -> pa.Table:
        ids_all, m_all = ray.get(ref)
        ids = batch[id_col].to_numpy()
        m = _unit(_mat(batch[vec_col]))
        sims = m @ m_all.T
        bi, aj = np.nonzero(sims >= threshold)
        keep = ids[bi] < ids_all[aj]
        return pa.table(
            {
                "id_a": pa.array(ids[bi][keep].astype(np.int64)),
                "id_b": pa.array(ids_all[aj][keep].astype(np.int64)),
                "cosine": pa.array(sims[bi, aj][keep]),
            }
        )

    out = ds.map_batches(pairs, batch_format="pyarrow").to_pandas()
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def lsh_near_dup_pairs(
    ds: rd.Dataset,
    *,
    threshold: float = 0.9,
    n_planes: int = 16,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> pd.DataFrame:
    """Scale path: random-hyperplane LSH buckets → in-bucket exact verify.

    Only (table, bucket_key, id, vec) rows co-locate per bucket; no full
    matrix broadcast.  Recall is governed by n_planes/n_tables (documented
    partitioning assumption: near pairs share a bucket in ≥1 table)."""
    from ..functions.hashing import mix64

    rng = np.random.Generator(np.random.Philox(key=[seed, 0x9A5]))
    d = len(ds.take(1)[0][vec_col])
    planes = rng.standard_normal((n_tables, n_planes, d))
    ref = ray.put(planes)
    # group on a SHARD of the (table,key) space, not raw buckets: per-bucket
    # map_groups would pay Ray's per-group task overhead once per bucket
    # (~2^n_planes × n_tables groups); each shard task verifies many buckets
    # in one vectorized pass.
    n_shards = max(64, min(8192, int(np.sqrt(max(1, ds.count())))))

    def bucket(batch: pa.Table) -> pa.Table:
        pl = ray.get(ref)
        ids = batch[id_col].to_numpy()
        m = _unit(_mat(batch[vec_col]))
        tabs, keys, out_ids, vecs = [], [], [], []
        for t in range(n_tables):
            bits = (m @ pl[t].T) > 0
            key = np.zeros(len(m), dtype=np.int64)
            for b in range(n_planes):
                key = (key << 1) | bits[:, b]
            tabs.append(np.full(len(m), t, dtype=np.int32))
            keys.append(key)
            out_ids.append(ids)
            vecs.append(m)
        tab = np.concatenate(tabs)
        key = np.concatenate(keys)
        shard = (mix64(key.astype(np.uint64)
                       + np.uint64(0x9E3779B9) * (tab.astype(np.uint64) + 1))
                 % np.uint64(n_shards)).astype(np.int32)
        return pa.table(
            {
                "shard": pa.array(shard),
                "table": pa.array(tab),
                "key": pa.array(key),
                id_col: pa.array(np.concatenate(out_ids).astype(np.int64)),
                "vec": pa.array(list(np.concatenate(vecs))),
            }
        )

    def shard_verify(g: pd.DataFrame, max_bucket: int = 1000) -> pd.DataFrame:
        empty = pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                              "id_b": pd.Series([], dtype="int64"),
                              "cosine": pd.Series([], dtype="float64")})
        if len(g) < 2 or "table" not in g.columns:
            return empty
        g = g.sort_values(["table", "key", id_col], kind="mergesort")
        combo = mix64(g["key"].to_numpy().astype(np.uint64)
                      ^ (np.uint64(0xABCD) * (g["table"].to_numpy().astype(np.uint64) + 1)))
        runs = np.flatnonzero(np.concatenate(([True], combo[1:] != combo[:-1], [True])))
        ids = g[id_col].to_numpy()
        vecs = np.stack(g["vec"].to_numpy())
        out_a, out_b, out_c = [], [], []
        for s, e in zip(runs[:-1], runs[1:]):
            c = e - s
            if c < 2 or c > max_bucket:
                continue
            m = vecs[s:e]
            sims = m @ m.T
            ia, ib = np.triu_indices(c, k=1)
            mask = sims[ia, ib] >= threshold
            out_a.append(ids[s:e][ia[mask]])
            out_b.append(ids[s:e][ib[mask]])
            out_c.append(sims[ia, ib][mask])
        if not out_a:
            return empty
        return pd.DataFrame({"id_a": np.concatenate(out_a),
                             "id_b": np.concatenate(out_b),
                             "cosine": np.concatenate(out_c)})

    out = (
        ds.map_batches(bucket, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(shard_verify, batch_format="pandas")
        .to_pandas()
    )
    if out.empty:
        return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                             "id_b": pd.Series([], dtype="int64"),
                             "cosine": pd.Series([], dtype="float64")})
    out = out.drop_duplicates(subset=["id_a", "id_b"])
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def label_centroids(ds: rd.Dataset, *, id_col: str = "vec_id",
                    vec_col: str = "embedding", label_col: str = "label") -> rd.Dataset:
    """Per-label mean embedding, one output row per (label, dim).

    Vector-column aggregation without a wide shuffle of vectors: each batch
    explodes to (label, dim, value) scalar rows (zero-copy numpy reshape),
    then Ray's map-side-combining groupby averages — only scalar partials
    cross the wire.
    """
    import pandas as pd
    from ray.data.aggregate import Mean

    def explode(t: pa.Table) -> pa.Table:
        mat = _mat(t[vec_col])
        n, d = mat.shape
        labels = np.repeat(
            t[label_col].combine_chunks().to_numpy(zero_copy_only=False), d
        )
        return pa.table({
            "label": pa.array(labels.astype(np.int64)),
            "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), n)),
            "value": pa.array(mat.ravel().astype(np.float64)),
        })

    return (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby(["label", "dim"])
        .aggregate(Mean("value", alias_name="centroid"))
    )


def quantize_embeddings(ds: rd.Dataset, *, id_col: str = "vec_id",
                        vec_col: str = "embedding", levels: int = 255) -> rd.Dataset:
    """Scalar int8-style quantization: per-DIM min/max from a combining
    groupby over exploded scalars (only (dim, partial) rows shuffle), ranges
    broadcast once, then each batch quantizes with one numpy pass.
    q = floor((x - min_d) / (max_d - min_d) * (levels - 1) + 0.5) — floor
    (not round) so the engine and the SQL oracle agree at ties.
    Returns exploded (id, dim, q) rows (oracle-friendly layout)."""
    from ray.data.aggregate import Max, Min

    def explode(t: pa.Table) -> pa.Table:
        m = _mat(t[vec_col])
        n, d = m.shape
        return pa.table({
            "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), n)),
            "value": pa.array(m.ravel()),
        })

    ranges = (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby("dim")
        .aggregate(Min("value", alias_name="lo"), Max("value", alias_name="hi"))
        .to_pandas()
        .sort_values("dim")
    )
    lo = ranges["lo"].to_numpy()
    span = np.maximum(ranges["hi"].to_numpy() - lo, 1e-30)
    ref = ray.put((lo, span))

    def quant(t: pa.Table) -> pa.Table:
        lo_b, span_b = ray.get(ref)
        m = _mat(t[vec_col])
        n, d = m.shape
        q = np.floor((m - lo_b[None, :]) / span_b[None, :] * (levels - 1) + 0.5)
        ids = np.repeat(t[id_col].combine_chunks().to_numpy(), d)
        return pa.table({
            id_col: pa.array(ids.astype(np.int64)),
            "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), n)),
            "q": pa.array(q.ravel().astype(np.int64)),
        })

    return ds.map_batches(quant, batch_format="pyarrow")


def kmeans_embeddings(
    ds: rd.Dataset,
    *,
    k: int = 8,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> "pd.DataFrame":
    """Distributed Lloyd's k-means, DETERMINISTIC at any cluster size:

    - init: the k rows with the smallest mix64(id) (a seeded sample chosen by
      a pure function of ids, not block order),
    - assign+accumulate: one map_batches pass per iteration emits per-batch
      per-cluster partial sums QUANTIZED to int64 (value*2^20 rounded) —
      integer partials make the reduction order-independent, so centroids are
      bit-identical run to run (the float-Sum lesson from the oracle gate),
    - reduce: combining groupby over (cluster, dim) partials — k*d tiny rows.

    Returns (cluster, dim, centroid, n_members).
    """
    from ray.data.aggregate import Sum

    from ..functions.hashing import mix64

    d = len(ds.take(1)[0][vec_col])
    n_seed = (
        ds.map_batches(
            lambda t: pa.table({
                "__pri": pa.array(mix64(t[id_col].combine_chunks().to_numpy()
                                        .astype(np.uint64)).astype(np.int64)),
                id_col: t[id_col], vec_col: t[vec_col],
            }),
            batch_format="pyarrow",
        )
        .sort("__pri")
        .limit(k)
        .to_pandas()
    )
    cent = _unit(_mat(pa.chunked_array([pa.array(list(n_seed[vec_col]))])))
    SCALE = np.float64(1 << 20)

    for _ in range(iters):
        ref = ray.put(cent)

        def partials(t: pa.Table) -> pa.Table:
            c = ray.get(ref)
            m = _unit(_mat(t[vec_col]))
            assign = np.argmax(m @ c.T, axis=1)
            rows_c, rows_d, rows_s, rows_n = [], [], [], []
            # quantize each VECTOR before summing: integer partials are
            # order- and batch-boundary-independent (rounding after a float
            # sum would still vary with partitioning)
            mq = np.round(m * SCALE).astype(np.int64)
            for ci in np.unique(assign):
                mm = mq[assign == ci]
                rows_c.append(np.full(d, ci, dtype=np.int64))
                rows_d.append(np.arange(d, dtype=np.int64))
                rows_s.append(mm.sum(axis=0))
                rows_n.append(np.full(d, len(mm), dtype=np.int64))
            return pa.table({
                "cluster": pa.array(np.concatenate(rows_c)),
                "dim": pa.array(np.concatenate(rows_d)),
                "s_e20": pa.array(np.concatenate(rows_s)),
                "n": pa.array(np.concatenate(rows_n)),
            })

        agg = (
            ds.map_batches(partials, batch_format="pyarrow")
            .groupby(["cluster", "dim"])
            .aggregate(Sum("s_e20", alias_name="s"), Sum("n", alias_name="cnt"))
            .to_pandas()
            .sort_values(["cluster", "dim"])
        )
        new = cent.copy()
        for ci, sub in agg.groupby("cluster"):
            # cnt per (cluster, dim) row is already the cluster's total
            # member count (each batch emits n once per dim)
            vec = (sub["s"].to_numpy() / SCALE) / np.maximum(sub["cnt"].to_numpy(), 1)
            new[int(ci)] = vec
        cent = _unit(new)

    rows = []
    for ci in range(len(cent)):
        sub = agg[agg["cluster"] == ci]
        members = int(sub["cnt"].iloc[0]) if len(sub) else 0
        for di in range(d):
            rows.append({"cluster": ci, "dim": di,
                         "centroid": float(cent[ci, di]), "n_members": members})
    return pd.DataFrame(rows)
