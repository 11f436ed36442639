"""Similarity search: brute-force exact vs numpy reference; IVF recall; LSH."""

import numpy as np
import pandas as pd
import pytest


def _embeddings(n=200, d=16, seed=5):
    rng = np.random.Generator(np.random.Philox(key=[seed, 1]))
    m = rng.standard_normal((n, d))
    # plant near-dups: vec 7 ≈ vec 8, vec 20 ≈ vec 21
    m[8] = m[7] + 0.01 * rng.standard_normal(d)
    m[21] = m[20] + 0.01 * rng.standard_normal(d)
    return pd.DataFrame({"vec_id": np.arange(n), "embedding": list(m.astype(np.float32))})


def _ref_topk(m, queries, qids, k):
    mu = m / np.linalg.norm(m, axis=1, keepdims=True)
    qu = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    sims = qu @ mu.T
    rows = []
    for r, qid in enumerate(qids):
        order = np.lexsort((np.arange(len(mu)), -sims[r]))
        order = [i for i in order if i != qid][:k]
        for rank, i in enumerate(order, 1):
            rows.append((qid, rank, i))
    return rows


def test_knn_topk_matches_reference(ray_session):
    import ray.data as rd
    from manga_ocr_ray.stages.similarity import knn_topk

    pdf = _embeddings()
    m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    ds = rd.from_pandas(pdf).repartition(4)
    qids = np.array([0, 7, 20])
    got = knn_topk(ds, m[qids], k=5, query_ids=qids)
    want = _ref_topk(m, m[qids], qids, 5)
    assert list(map(tuple, got.to_numpy())) == want
    # planted neighbor is rank 1
    assert got[(got.query_id == 7) & (got["rank"] == 1)]["neighbor_id"].iloc[0] == 8


def test_ivf_recall(ray_session):
    import ray.data as rd
    from manga_ocr_ray.stages.similarity import ivf_knn_topk, knn_topk

    pdf = _embeddings(n=400)
    m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    ds = rd.from_pandas(pdf).repartition(4)
    qids = np.arange(8)
    exact = knn_topk(ds, m[qids], k=5, query_ids=qids)
    approx = ivf_knn_topk(ds, m[qids], k=5, n_clusters=8, nprobe=4)
    # recall@5 of the approximate index vs exact
    e = exact.groupby("query_id")["neighbor_id"].apply(set)
    a = approx.groupby("query_id")["neighbor_id"].apply(set)
    recall = np.mean([len(e[q] & a.get(q, set())) / 5 for q in qids])
    assert recall >= 0.6


def test_embedding_near_dup(ray_session):
    import ray.data as rd
    from manga_ocr_ray.stages.similarity import (
        embedding_near_dup_pairs_exact, lsh_near_dup_pairs)

    pdf = _embeddings()
    ds = rd.from_pandas(pdf).repartition(4)
    exact = embedding_near_dup_pairs_exact(ds, threshold=0.99)
    got = set(zip(exact["id_a"], exact["id_b"]))
    assert (7, 8) in got and (20, 21) in got

    lsh = lsh_near_dup_pairs(ds, threshold=0.99, n_planes=8, n_tables=8)
    got_lsh = set(zip(lsh["id_a"], lsh["id_b"]))
    assert (7, 8) in got_lsh and (20, 21) in got_lsh


def test_lsh_default_recall_pinned(ray_session):
    """The DEFAULT near-dup path (auto-tuned LSH) must keep recall ≥0.9 vs
    the exact oracle on clustered data (VERDICT r1 item 4)."""
    import ray.data as rd
    from manga_ocr_ray.stages.similarity import (
        embedding_near_dup_pairs, embedding_near_dup_pairs_exact, lsh_params)

    rng = np.random.Generator(np.random.Philox(key=[9, 2]))
    # 40 cluster centers, 5 jittered members each → plenty of true pairs
    centers = rng.standard_normal((40, 16))
    m = np.repeat(centers, 5, axis=0) + 0.12 * rng.standard_normal((200, 16))
    pdf = pd.DataFrame({"vec_id": np.arange(200), "embedding": list(m.astype(np.float32))})
    ds = rd.from_pandas(pdf).repartition(4)

    thr = 0.85
    exact = set(zip(*embedding_near_dup_pairs_exact(ds, threshold=thr)[["id_a", "id_b"]].to_numpy().T))
    approx = set(zip(*embedding_near_dup_pairs(ds, threshold=thr)[["id_a", "id_b"]].to_numpy().T))
    assert len(exact) >= 50
    assert approx <= exact  # exact in-bucket verify → perfect precision
    recall = len(exact & approx) / len(exact)
    b, t = lsh_params(thr)
    assert recall >= 0.9, (recall, b, t)


def test_kmeans_deterministic_and_clusters_blobs(ray_session):
    """Distributed k-means: integer-quantized partials make centroids
    bit-identical across different block layouts; planted blobs separate."""
    import ray.data as rd
    from manga_ocr_ray.stages.similarity import kmeans_embeddings

    rng = np.random.Generator(np.random.Philox(key=[11, 4]))
    centers = np.array([[10, 0, 0, 0], [0, 10, 0, 0], [0, 0, 10, 0.0]])
    m = np.repeat(centers, 60, axis=0) + 0.1 * rng.standard_normal((180, 4))
    pdf = pd.DataFrame({"vec_id": np.arange(180), "embedding": list(m.astype(np.float32))})

    a = kmeans_embeddings(rd.from_pandas(pdf).repartition(2), k=3, iters=4)
    b = kmeans_embeddings(rd.from_pandas(pdf).repartition(7), k=3, iters=4)
    assert a.equals(b)  # bit-identical despite different block layouts
    assert sorted(a.groupby("cluster")["n_members"].first()) == [60, 60, 60]
    # each centroid ~ a unit vector along one planted axis
    cent = a.pivot(index="cluster", columns="dim", values="centroid").to_numpy()
    assert (cent.max(axis=1) > 0.99).all()


def test_quantize_embeddings_roundtrip(ray_session):
    import ray.data as rd
    from manga_ocr_ray.stages.similarity import quantize_embeddings

    rng = np.random.Generator(np.random.Philox(key=[12, 4]))
    m = rng.standard_normal((50, 8))
    pdf = pd.DataFrame({"vec_id": np.arange(50), "embedding": list(m.astype(np.float32))})
    q = quantize_embeddings(rd.from_pandas(pdf).repartition(3)).to_pandas()
    assert len(q) == 50 * 8
    assert q["q"].between(0, 254).all()
    # dequantize error bounded by half a level per dim
    lo = m.min(axis=0).astype(np.float32).astype(np.float64)
    span = (m.max(axis=0).astype(np.float32).astype(np.float64) - lo)
    deq = lo[q["dim"]] + q["q"].to_numpy() / 254.0 * span[q["dim"]]
    orig = m.astype(np.float32).astype(np.float64)[q["vec_id"], q["dim"]]
    assert np.abs(deq - orig).max() <= (span.max() / 254) * 0.51 + 1e-9
