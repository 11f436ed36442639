"""LLM-training-data operators, round 4: semantic dedup (SemDeDup),
DSIR importance weighting, and a JSONL source round-trip.

- :func:`embedding_semdedup` — SemDeDup (Abbas et al. 2023, public paper):
  cluster embeddings, drop all-but-one of every within-cluster cosine
  near-dup group.  The oracle-checkable variant here assigns to K FIXED
  deterministic seed centroids in one pass (no iterative k-means — that
  lives in ``stages.similarity.kmeans``) so a DuckDB twin can replay the
  exact assignment; at 100 TB, K scales with the corpus (the paper uses
  K ≈ n/10⁴) so the within-cluster pair step stays bounded, and the pair
  scan runs per-cluster via ``groupby().map_groups`` — the same sharded
  pattern as the near-dup verify stage.
- :func:`doc_dsir_weights` — DSIR (Xie et al. 2023, public paper): hashed
  n-gram importance weights log(p_target(f)/p_raw(f)) summed over each
  document's features.  Two streaming passes: (1) per-block bucket-count
  partials (B=1024 buckets — a fixed-size array, NOT vocab-sized) combined
  driver-side, (2) per-doc weight via a broadcast B-double log-ratio table.
  No shuffle at any corpus size; the only driver state is 2·B int64s.
- :func:`jsonl_roundtrip` — newline-delimited JSON source (S-family): write
  the documents table to JSONL once (deterministic), read it back with
  ``ray.data.read_json`` — the oracle compares against the original parquet,
  so the check pins the full escape/parse round-trip.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..functions.hashing import md5_gate64
from ..functions.textstats import TOKEN_PATTERN, tokens_with_parent
from ..stages.similarity import _mat, _unit

# ---- SemDeDup (deterministic seed-centroid variant) ------------------------

SEMDEDUP_K = 8
SEMDEDUP_TAU = 0.45


def embedding_semdedup(
    ds: rd.Dataset, *, k: int = SEMDEDUP_K, tau: float = SEMDEDUP_TAU,
    id_col: str = "vec_id", vec_col: str = "embedding",
    n_rows: int | None = None,
) -> pd.DataFrame:
    """→ (vec_id, cluster, keep): assign every vector to the nearest of the
    K seed centroids (the K smallest ids — deterministic, oracle-replayable;
    ties break to the lowest centroid id via argmax-first), then within each
    cluster drop any vector that has a smaller-id neighbor at cosine ≥ tau.

    The centroid matrix is tiny and rides the closure (broadcast once per
    task, K·d doubles); assignment is one matmul per batch.  The pair scan
    is per-cluster `map_groups` — bounded by cluster size, which the K
    scaling rule keeps ~constant at any corpus size.

    Float-margin assumption (ADVICE r4): the integer outputs derive from
    float argmax/threshold decisions computed by two different float
    pipelines (numpy matmul here, DuckDB ``list_cosine_similarity`` in the
    oracle) — the oracle gate is only stable when no cosine sits within
    ~1e-6 of ``tau`` or of a centroid tie.  The driver's synthetic
    embeddings corpus satisfies this (measured minimum margins: centroid
    tie ≥4.7e-5, tau ≥1.4e-4 across sf0.001-0.1 — orders of magnitude
    above float64 pipeline divergence); a production corpus near the
    boundary should widen the comparison tolerance rather than expect
    bit-stable keep bits."""
    seeds = (ds.filter(expr=f"{id_col} < {k}").to_pandas()
             .sort_values(id_col))
    c = _unit(np.stack(seeds[vec_col].to_numpy()).astype(np.float64))

    def assign(t: pa.Table) -> pa.Table:
        m = _unit(_mat(t[vec_col]))
        # np.argmax returns the FIRST max → ties resolve to the smallest
        # centroid id, mirroring ORDER BY cos DESC, cid ASC in the oracle
        cl = np.argmax(m @ c.T, axis=1).astype(np.int64)
        return pa.table({id_col: t[id_col], "cluster": cl,
                         vec_col: t[vec_col]})

    # dedup_cluster consumes AND emits Arrow: the upstream assign stage is
    # Arrow, and a pandas block here would force a block-format conversion
    # (plus Ray schema-mismatch warnings) between two Arrow stages.
    def dedup_cluster(g: pa.Table) -> pa.Table:
        g = g.sort_by(id_col)
        m = _unit(_mat(g[vec_col]))
        sim = m @ m.T
        iu = np.triu_indices(g.num_rows, k=1)
        drop = np.zeros(g.num_rows, dtype=bool)
        hit = sim[iu] >= tau
        drop[np.unique(iu[1][hit])] = True  # column index = the LARGER id
        return pa.table({
            id_col: g[id_col],
            "cluster": pc.cast(g["cluster"], pa.int64()),
            "keep": pa.array((~drop).astype(np.int64)),
        })

    # The groupby's range sort emits one output partition per input block,
    # and only K of them can be non-empty (K distinct cluster keys) — empty
    # range partitions ship schema-less bundles (executor warnings, wasted
    # tasks).  Right-size the block count to ceil(rows/10k) clamped to K:
    # at paper scale (K ≈ n/10^4) the clamp is inactive and the shuffle
    # keeps full width; at bench scale it collapses the empties.  ds.count()
    # is metadata-only for parquet-backed inputs (every in-repo caller);
    # map-chain callers should pass n_rows to avoid an extra upstream pass.
    total = n_rows if n_rows is not None else ds.count()
    blocks = max(1, min(k, total // 10_000 + 1))
    out = (
        ds.map_batches(assign, batch_format="pyarrow")
        .repartition(blocks)
        .groupby("cluster")
        .map_groups(dedup_cluster, batch_format="pyarrow")
        .to_pandas()
    )
    return out.sort_values(id_col).reset_index(drop=True)


def embedding_semdedup_sql(k: int = SEMDEDUP_K, tau: float = SEMDEDUP_TAU,
                           table: str = "embeddings") -> str:
    return f"""
WITH c AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS ce
           FROM {table} WHERE vec_id < {k}),
     s AS (SELECT e.vec_id, c.cid,
                  list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.ce) AS cos
           FROM {table} e CROSS JOIN c),
     a AS (SELECT vec_id, cid FROM (
             SELECT vec_id, cid,
                    row_number() OVER (PARTITION BY vec_id
                                       ORDER BY cos DESC, cid) AS rn
             FROM s) WHERE rn = 1),
     d AS (SELECT DISTINCT a2.vec_id
           FROM a a1 JOIN a a2 ON a1.cid = a2.cid AND a1.vec_id < a2.vec_id
           JOIN {table} e1 ON e1.vec_id = a1.vec_id
           JOIN {table} e2 ON e2.vec_id = a2.vec_id
           WHERE list_cosine_similarity(CAST(e1.embedding AS DOUBLE[]),
                                        CAST(e2.embedding AS DOUBLE[])) >= {tau})
SELECT a.vec_id, CAST(a.cid AS BIGINT) AS cluster,
       CAST(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM a LEFT JOIN d ON a.vec_id = d.vec_id
"""


# ---- DSIR hashed n-gram importance weights ---------------------------------

DSIR_BUCKETS = 1024
DSIR_TARGET_LANG = "en"


def _gram_buckets(texts: pa.Array | pa.ChunkedArray,
                  n_buckets: int) -> tuple[np.ndarray, np.ndarray]:
    """(bucket index, parent row) for every unigram+bigram occurrence of the
    batch — tokens via the oracle-visible TOKEN_PATTERN, buckets via the
    batched DuckDB-md5 kernel (first 16 hex = uint64, mod B), bigrams as
    shifted joins masked at row boundaries."""
    from ..functions.textstats import bigrams_with_parent

    tok, par = tokens_with_parent(texts, TOKEN_PATTERN)
    tnp = tok.to_pandas().to_numpy()
    bg, bgp = bigrams_with_parent(tnp, par)
    g = np.concatenate([tnp, bg])
    p = np.concatenate([par, bgp])
    if not g.size:
        return np.empty(0, dtype=np.int64), p
    b = (md5_gate64(pa.array(g, pa.string())) % np.uint64(n_buckets)).astype(np.int64)
    return b, p


def doc_dsir_weights(
    ds: rd.Dataset, *, target_lang: str = DSIR_TARGET_LANG,
    n_buckets: int = DSIR_BUCKETS, text_col: str = "text",
) -> rd.Dataset:
    """→ (doc_id, n_feats, dsir_logw): per-document DSIR log importance
    weight Σ_f [ln p̂_target(f) − ln p̂_raw(f)] over hashed unigram+bigram
    occurrences, add-1 smoothed over the B buckets.

    Pass 1 streams bucket-count partials (B rows per block, two int
    columns); the driver combine touches only B-sized arrays.  Pass 2
    re-streams the corpus against the broadcast B-double log-ratio — at
    100 TB both passes are embarrassingly parallel with zero shuffle."""
    def partial(t: pa.Table) -> pa.Table:
        b, p = _gram_buckets(t[text_col], n_buckets)
        is_t = np.zeros(t.num_rows, dtype=bool)
        if t.num_rows:
            is_t = np.asarray(
                [lg == target_lang for lg in t["lang"].to_pylist()])
        c_all = np.bincount(b, minlength=n_buckets)
        c_tgt = np.bincount(b[is_t[p]], minlength=n_buckets) \
            if b.size else np.zeros(n_buckets, dtype=np.int64)
        return pa.table({
            "bucket": np.arange(n_buckets, dtype=np.int64),
            "c_all": c_all.astype(np.int64), "c_tgt": c_tgt.astype(np.int64),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    agg = parts.groupby("bucket", sort=True)[["c_all", "c_tgt"]].sum()
    c_all = np.zeros(n_buckets, dtype=np.int64)
    c_tgt = np.zeros(n_buckets, dtype=np.int64)
    c_all[agg.index.to_numpy()] = agg["c_all"].to_numpy()
    c_tgt[agg.index.to_numpy()] = agg["c_tgt"].to_numpy()
    tot_all, tot_tgt = int(c_all.sum()), int(c_tgt.sum())
    logratio = (np.log((c_tgt + 1) / (tot_tgt + float(n_buckets)))
                - np.log((c_all + 1) / (tot_all + float(n_buckets))))

    def weigh(t: pa.Table) -> pa.Table:
        b, p = _gram_buckets(t[text_col], n_buckets)
        n = t.num_rows
        n_feats = np.bincount(p, minlength=n).astype(np.int64)
        logw = np.bincount(p, weights=logratio[b], minlength=n) \
            if b.size else np.zeros(n)
        return pa.table({"doc_id": t["doc_id"], "n_feats": n_feats,
                         "dsir_logw": logw})

    return ds.map_batches(weigh, batch_format="pyarrow")


def doc_dsir_weights_sql(target_lang: str = DSIR_TARGET_LANG,
                         n_buckets: int = DSIR_BUCKETS) -> str:
    return f"""
WITH g AS (
  SELECT doc_id, lang, unnest(list_concat(
           toks,
           list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])
         )) AS gram
  FROM (SELECT doc_id, lang, regexp_extract_all(text, '{TOKEN_PATTERN}') AS toks
        FROM documents)),
gb AS (SELECT doc_id, lang,
              CAST(CAST(('0x' || substr(md5(gram), 1, 16)) AS UBIGINT)
                   % {n_buckets} AS BIGINT) AS b
       FROM g),
counts AS (SELECT b, count(*) AS c_all,
                  sum(CASE WHEN lang = '{target_lang}' THEN 1 ELSE 0 END) AS c_tgt
           FROM gb GROUP BY b),
tot AS (SELECT sum(c_all) AS ta, sum(c_tgt) AS tt FROM counts),
lr AS (SELECT b, ln((c_tgt + 1) / (tt + {n_buckets}.0))
                 - ln((c_all + 1) / (ta + {n_buckets}.0)) AS lr
       FROM counts, tot),
w AS (SELECT gb.doc_id, CAST(count(*) AS BIGINT) AS n_feats,
             sum(lr.lr) AS dsir_logw
      FROM gb JOIN lr USING (b) GROUP BY gb.doc_id)
SELECT d.doc_id, COALESCE(w.n_feats, 0) AS n_feats,
       COALESCE(w.dsir_logw, 0.0) AS dsir_logw
FROM documents d LEFT JOIN w ON d.doc_id = w.doc_id
"""


# ---- end-to-end curation pipeline ------------------------------------------

PREP_SALT = ":prep1"
PREP_RATE = 0.8
PREP_MIN_STOPWORD_RATIO = 0.05


def doc_prep_pipeline(sf_dir: str) -> rd.Dataset:
    """The composed training-data curation pipeline (the RedPajama/CCNet
    shape) as ONE streaming Ray pipeline with ONE exact SQL oracle:

        lang-id → keep 'en' → fixed stopword-ratio quality floor →
        exact dedup (min-id per content) → deterministic md5 80% sample

    Every stage is an already-oracle-certified operator; this entry pins
    their COMPOSITION (filter-before-dedup ordering matters and is part of
    the contract).  Scale shape: the only shuffle is the dedup groupby on
    the 128-bit content hash — lang-id, quality, both filters and the
    sample gate are all map-side."""
    import pyarrow.compute as pc

    from ..functions.textstats import LangIdStage, quality_batch
    from ..stages.dedup import exact_dedup

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    ds = ds.map_batches(LangIdStage, batch_format="pyarrow",
                        concurrency=(1, 4))

    def add_quality_and_filter(t: pa.Table) -> pa.Table:
        q = quality_batch(t, "text")
        t = t.append_column("stopword_ratio", q["stopword_ratio"])
        mask = pc.and_(
            pc.equal(t["lang_pred"], pa.scalar("en")),
            pc.greater_equal(t["stopword_ratio"],
                             pa.scalar(PREP_MIN_STOPWORD_RATIO)),
        )
        return t.filter(mask)

    # materialize: the survivor set feeds the dedup aggregate AND its join,
    # and its measured count sizes the join partitions (an empty hash
    # partition loses its schema inside Acero — the bigram-LM wedge guard)
    ds = ds.map_batches(add_quality_and_filter,
                        batch_format="pyarrow").materialize()
    from .relational import _join_partitions

    n_parts = max(1, min(_join_partitions(), ds.count() // 1000))
    ds = exact_dedup(ds, num_partitions=n_parts)

    thresh = np.uint64(int(PREP_RATE * 2**64))

    def sample_gate(t: pa.Table) -> pa.Table:
        keep = md5_gate64(t["doc_id"], PREP_SALT) < thresh
        return t.filter(pa.array(keep))

    return (ds.map_batches(sample_gate, batch_format="pyarrow")
            .select_columns(["doc_id", "lang_pred", "stopword_ratio"]))


def doc_prep_pipeline_sql() -> str:
    from ..functions.textstats import (_STOPWORD_PATTERN, TOKEN_PATTERN,
                                       lang_id_sql)
    from .documents import _rate_threshold_hex

    # interpolate the SAME pattern quality_batch compiles, so an edit to
    # STOPWORDS_EN can never desynchronize pipeline and oracle
    ratio = (f"len(regexp_extract_all(text, '{_STOPWORD_PATTERN}')) * 1.0 "
             f"/ greatest(len(regexp_extract_all(text, '{TOKEN_PATTERN}')), 1)")
    return f"""
WITH f AS (SELECT doc_id, text, {lang_id_sql('text')} AS lang_pred,
                  {ratio} AS stopword_ratio
           FROM documents),
 g AS (SELECT * FROM f
       WHERE lang_pred = 'en' AND stopword_ratio >= {PREP_MIN_STOPWORD_RATIO}),
 d AS (SELECT *, min(doc_id) OVER (PARTITION BY text) AS keep_id FROM g)
SELECT doc_id, lang_pred, stopword_ratio
FROM d WHERE doc_id = keep_id
  AND substring(md5(CAST(doc_id AS VARCHAR) || '{PREP_SALT}'), 1, 16)
      < '{_rate_threshold_hex(PREP_RATE)}'
"""


# ---- k-NN label classification ---------------------------------------------

KNN_CLASSIFY_K = 5
KNN_CLASSIFY_NQ = 32


def embedding_knn_classify(
    ds: rd.Dataset, *, k: int = KNN_CLASSIFY_K, n_queries: int = KNN_CLASSIFY_NQ,
) -> pd.DataFrame:
    """→ (query_id, pred_label): majority label among the k exact cosine
    nearest neighbors (self excluded) of each of the first ``n_queries``
    vectors — the labeled-embedding k-NN classifier (the standard probe for
    embedding quality / nearest-class retrieval).

    Reuses :func:`stages.similarity.knn_topk` — corpus streams once against
    the broadcast query matrix; everything after the top-k (k·n_queries
    rows) is driver-trivial.  Votes tie-break by (count desc, label asc);
    neighbor ranking ties by (cosine desc, neighbor_id asc), both mirrored
    by the window-function oracle.  Integer output — no float hash risk."""
    from ..stages.similarity import knn_topk

    qdf = (ds.filter(expr=f"vec_id < {n_queries}").to_pandas()
           .sort_values("vec_id"))
    queries = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    top = knn_topk(ds.select_columns(["vec_id", "embedding"]), queries, k=k,
                   query_ids=qdf["vec_id"].to_numpy())
    # the neighbor-id set is k·n_queries (tiny): prune the corpus MAP-SIDE
    # with an is_in kernel so only matching label rows reach the driver
    import pyarrow.compute as pc

    need = pa.array(np.unique(top["neighbor_id"].to_numpy()))

    def pick(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t["vec_id"], value_set=need))

    labels = (ds.select_columns(["vec_id", "label"])
              .map_batches(pick, batch_format="pyarrow").to_pandas())
    m = top.merge(labels.rename(columns={"vec_id": "neighbor_id"}),
                  on="neighbor_id")
    votes = (m.groupby(["query_id", "label"]).size().rename("c")
             .reset_index()
             .sort_values(["query_id", "c", "label"],
                          ascending=[True, False, True]))
    pred = votes.groupby("query_id", sort=True).head(1)
    return pd.DataFrame({
        "query_id": pred["query_id"].to_numpy(np.int64),
        "pred_label": pred["label"].to_numpy(np.int64),
    })


def embedding_knn_classify_sql(k: int = KNN_CLASSIFY_K,
                               n_queries: int = KNN_CLASSIFY_NQ,
                               table: str = "embeddings") -> str:
    return f"""
WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
           FROM {table} WHERE vec_id < {n_queries}),
 s AS (SELECT q.qid, e.vec_id AS nid, e.label,
              list_cosine_similarity(qe, CAST(e.embedding AS DOUBLE[])) AS cos
       FROM q CROSS JOIN {table} e WHERE e.vec_id <> q.qid),
 r AS (SELECT qid, label FROM (
         SELECT qid, label,
                row_number() OVER (PARTITION BY qid
                                   ORDER BY cos DESC, nid) AS rn
         FROM s) WHERE rn <= {k}),
 v AS (SELECT qid, label, count(*) AS c FROM r GROUP BY qid, label)
SELECT qid AS query_id, CAST(label AS BIGINT) AS pred_label FROM (
  SELECT qid, label, row_number() OVER (PARTITION BY qid
                                        ORDER BY c DESC, label) AS rn
  FROM v) WHERE rn = 1
"""


# ---- CCNet perplexity buckets ----------------------------------------------

PPL_BUCKETS = 3


def doc_ppl_buckets(sf_dir: str) -> rd.Dataset:
    """CCNet's head/middle/tail split: rank every document by its LM
    perplexity (the corpus-self bigram-LM avg NLL — low = fluent) and cut
    the corpus into ``PPL_BUCKETS`` rank terciles, exactly ``ntile()``
    semantics (first ``n % k`` buckets take the extra row).

    Composition of two certified operators: the bigram-LM scorer (broadcast
    or join plan by cardinality) and the distributed ``global_rank``
    (range-partitioned sort; only per-block counts touch the driver).
    Bucket assignment is a vectorized formula over the rank — no second
    shuffle."""
    from .documents import q_doc_bigram_lm
    from .relational import global_rank

    # materialize before the rank sort: a sort samples AND shuffles its
    # input, re-executing a lazy upstream — here that would score the
    # corpus under the bigram LM twice (the conversation_merge lesson)
    nll = q_doc_bigram_lm(sf_dir).materialize()
    ranked = global_rank(nll, ["avg_nll", "doc_id"], rank_col="rn")
    n = ranked.count()
    base, rem = divmod(n, PPL_BUCKETS)

    def bucket(t: pa.Table) -> pa.Table:
        rn = t["rn"].to_numpy()
        big = rem * (base + 1)  # rows living in the (base+1)-sized buckets
        b = np.where(
            rn <= big,
            (rn - 1) // max(base + 1, 1) + 1,
            rem + (rn - big - 1) // max(base, 1) + 1,
        ).astype(np.int64)
        return pa.table({
            "doc_id": t["doc_id"], "n_bigrams": t["n_bigrams"],
            "avg_nll": t["avg_nll"], "ppl_bucket": b,
        })

    return ranked.map_batches(bucket, batch_format="pyarrow")


def doc_ppl_buckets_sql() -> str:
    from .documents import Q_DOC_BIGRAM_LM_SQL

    return f"""
WITH nllq AS ({Q_DOC_BIGRAM_LM_SQL})
SELECT doc_id, n_bigrams, avg_nll,
       CAST(ntile({PPL_BUCKETS}) OVER (ORDER BY avg_nll, doc_id) AS BIGINT)
         AS ppl_bucket
FROM nllq
"""


# ---- JSONL source round-trip -----------------------------------------------

def jsonl_roundtrip(sf_dir: str) -> rd.Dataset:
    """Materialize the documents table as newline-delimited JSON once (via
    DuckDB COPY — deterministic, atomic rename), then read it back with
    ``ray.data.read_json``.  The oracle is the ORIGINAL parquet table, so a
    hash match certifies the writer/reader escape round-trip."""
    import hashlib

    import duckdb

    base = os.path.basename(os.path.normpath(sf_dir))
    # cache key carries a CONTENT fingerprint (blake2b of the parquet footer
    # — the footer encodes row-group offsets/stats, so any regeneration
    # changes it even at identical byte size and mtime second), plus the
    # size: a regenerated corpus can never read a stale dump, and a
    # pre-created /tmp path by another local user can't match the digest
    # of data they haven't seen (ADVICE r4).
    pq_path = f"{sf_dir}/documents.parquet"
    src = os.stat(pq_path)
    with open(pq_path, "rb") as f:
        f.seek(max(0, src.st_size - 65536))
        digest = hashlib.blake2b(f.read(), digest_size=8).hexdigest()
    path = f"/tmp/graft_jsonl_{base}_{src.st_size}_{digest}/documents.jsonl"
    if not os.path.exists(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = f"{path}.tmp{os.getpid()}"
        duckdb.sql(
            f"COPY (SELECT doc_id, text, lang, source, n_chars "
            f"      FROM '{sf_dir}/documents.parquet' ORDER BY doc_id) "
            f"TO '{tmp}' (FORMAT JSON)")
        os.replace(tmp, path)
    return rd.read_json(path).select_columns(
        ["doc_id", "text", "lang", "source", "n_chars"])


JSONL_ROUNDTRIP_SQL = """
SELECT doc_id, text, lang, source, n_chars FROM documents
"""
