"""Round-4 text-preparation operators over the documents table.

Three training-/retrieval-data shapes the engine had not yet covered, each
fully vectorized and each with an exact DuckDB oracle:

- overlapping token-window chunking (the RAG / context-packing splitter);
- winnowing fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD 2003 — the
  MOSS local document fingerprinting algorithm: k-gram hashes, sliding
  window of w, keep the RIGHTMOST minimum per window, dedupe);
- BPE-style adjacent-pair counting (the inner loop of one byte-pair-merge
  round over the corpus, Sennrich et al. 2016).

Reference provenance: the reference packages corpora by fixed line blocks
(manga_ocr_dev/data/process_cc100.py:16) and budgets generation by text
length (synthetic_data_generator/generator.py:60-79); these operators are
the general forms a training pipeline needs.

Scale notes: chunking is embarrassingly parallel (no shuffle); winnowing
shuffles only selected fingerprints (≈2/(w+1) of gram count); pair counting
pre-aggregates per block into a ≤64k-cell table before one tiny groupby.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Sum

from .relational import _pq


# ---- overlapping token-window chunking ----------------------------------------

def chunk_token_windows(batch: pa.Table, *, window: int, stride: int,
                        text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """Explode each document into overlapping ``window``-token chunks every
    ``stride`` tokens (last chunk may be shorter; ≥1 chunk per doc).

    Fully vectorized: ONE split per batch, then per chunk-index k one
    ``list_slice`` + filter + ``binary_join`` over the whole batch — the
    loop is over the batch's MAX chunk count, never rows."""
    toks = pc.split_pattern(batch[text_col].combine_chunks().fill_null(""), " ")
    n = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    # chunks at starts 0, stride, 2·stride, …: 1 + ceil(max(0, n−window)/stride)
    n_chunks = 1 + (np.maximum(0, n - window) + stride - 1) // stride
    ids = batch[id_col].combine_chunks()
    out_ids, out_k, out_txt, out_len = [], [], [], []
    for k in range(int(n_chunks.max()) if len(n) else 0):
        keep = n_chunks > k
        sel = pa.array(np.flatnonzero(keep))
        sliced = pc.list_slice(toks.take(sel), start=k * stride,
                               stop=k * stride + window)
        out_ids.append(ids.take(sel))
        out_k.append(pa.array(np.full(len(sel), k, dtype=np.int64)))
        out_txt.append(pc.binary_join(sliced, " "))
        out_len.append(pc.cast(pc.list_value_length(sliced), pa.int64()))
    if not out_ids:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "chunk_idx": pa.array([], pa.int64()),
                         "chunk_text": pa.array([], pa.string()),
                         "n_chunk_tokens": pa.array([], pa.int64())})
    return pa.table({
        "doc_id": pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in out_ids]),
        "chunk_idx": pa.concat_arrays(out_k),
        "chunk_text": pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in out_txt]),
        "n_chunk_tokens": pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in out_len]),
    })


def q_doc_chunk_windows(sf_dir: str, window: int = 32,
                        stride: int = 24) -> rd.Dataset:
    docs = rd.read_parquet(_pq(sf_dir, "documents"),
                           columns=["doc_id", "text"])
    return docs.map_batches(
        lambda t: chunk_token_windows(t, window=window, stride=stride),
        batch_format="pyarrow")


Q_DOC_CHUNK_WINDOWS_SQL = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS l, len(string_split(text, ' ')) AS n
  FROM documents),
w AS (
  SELECT doc_id, l,
         unnest(range(0, 1 + CAST(ceil(greatest(0, n - 32)
                                       / 24.0) AS BIGINT))) AS chunk_idx
  FROM toks)
SELECT doc_id, chunk_idx,
       array_to_string(l[chunk_idx * 24 + 1 : chunk_idx * 24 + 32], ' ')
         AS chunk_text,
       len(l[chunk_idx * 24 + 1 : chunk_idx * 24 + 32]) AS n_chunk_tokens
FROM w
"""


# ---- winnowing fingerprints (Schleimer et al. 2003) ----------------------------

_EMPTY_WINNOW = pa.table({"doc_id": pa.array([], pa.int64()),
                          "pos": pa.array([], pa.int64()),
                          "fingerprint": pa.array([], pa.uint64())})


def winnow_batch(batch: pa.Table, *, k: int, w: int,
                 text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """Selected (doc_id, pos, fingerprint) triples per document.

    One pass, no per-row Python on the ASCII fast path: the batch's docs
    concatenate into ONE byte buffer ('\\n' separator), k-grams come from a
    single ``sliding_window_view`` (windows containing the separator masked
    by a cumulative-count subtraction), gram hashing is the SQL-mirrored
    batched md5 kernel (``md5_gate64``), and the per-window
    rightmost-minimum runs over the concatenated gram stream (doc-boundary
    windows masked; docs with fewer than ``w`` grams contribute one
    whole-segment window, matching the SQL's clipped BETWEEN).  ``pos`` is
    1-based to mirror SQL ``substring``.  Non-ASCII batches take a per-doc
    slice fallback (SQL substring counts codepoints, so bytes≠chars there).
    """
    from ..functions.hashing import md5_gate64

    texts = batch[text_col].combine_chunks().fill_null("").to_pylist()
    ids = batch[id_col].combine_chunks().to_numpy(zero_copy_only=False)
    if not texts:
        return _EMPTY_WINNOW

    joined = "\n".join(texts)
    buf = joined.encode("utf-8")
    if len(buf) == len(joined):  # pure ASCII: bytes == codepoints
        b = np.frombuffer(buf, dtype=np.uint8)
        N = len(b)
        m = N - k + 1
        if m < 1:
            return _EMPTY_WINNOW
        sep = b == 10
        cs = np.cumsum(sep)
        doc_of = cs - sep  # docs index per byte (separator-exclusive)
        starts_b = np.r_[0, np.flatnonzero(sep) + 1]
        P = np.r_[0, cs]
        valid = (P[k:N + 1] - P[:m]) == 0  # no separator inside the window
        gidx = np.flatnonzero(valid)
        if not len(gidx):
            return _EMPTY_WINNOW
        gdoc_ix = doc_of[gidx]
        gpos = gidx - starts_b[gdoc_ix] + 1
        sw = np.ascontiguousarray(
            np.lib.stride_tricks.sliding_window_view(b, k)[gidx])
        grams = pa.array(sw.view(f"S{k}")[:, 0].astype("U"))
    else:
        gd, gp, gr = [], [], []
        for di, t in enumerate(texts):
            mm = len(t) - k + 1
            if mm < 1:
                continue
            gd.append(np.full(mm, di, dtype=np.int64))
            gp.append(np.arange(1, mm + 1, dtype=np.int64))
            gr.extend(t[i:i + k] for i in range(mm))
        if not gr:
            return _EMPTY_WINNOW
        gdoc_ix, gpos, grams = np.concatenate(gd), np.concatenate(gp), pa.array(gr)

    h = md5_gate64(grams)
    G = len(h)
    chosen: list[np.ndarray] = []
    if G >= w:
        win = np.lib.stride_tricks.sliding_window_view(h, w)
        wstarts = np.arange(G - w + 1)
        full = gdoc_ix[wstarts] == gdoc_ix[wstarts + w - 1]
        if full.any():
            fw, fs = win[full], wstarts[full]
            rev_arg = np.argmin(fw[:, ::-1], axis=1)
            chosen.append(fs + (w - 1 - rev_arg))
    # segments (per-doc gram runs) shorter than w: one window over the whole
    # segment, rightmost minimum
    seg_starts = np.flatnonzero(np.r_[True, np.diff(gdoc_ix) != 0])
    seg_len = np.diff(np.r_[seg_starts, G])
    short = seg_len < w
    if short.any():
        mins = np.minimum.reduceat(h, seg_starts)
        eq = h == np.repeat(mins, seg_len)
        rightmost = np.maximum.reduceat(np.where(eq, np.arange(G), -1),
                                        seg_starts)
        chosen.append(rightmost[short])
    if not chosen:
        return _EMPTY_WINNOW
    sel = np.unique(np.concatenate(chosen))
    return pa.table({"doc_id": pa.array(ids[gdoc_ix[sel]], pa.int64()),
                     "pos": pa.array(gpos[sel], pa.int64()),
                     "fingerprint": pa.array(h[sel], pa.uint64())})


def q_doc_winnowing(sf_dir: str, k: int = 7, w: int = 5) -> rd.Dataset:
    """Winnowing fingerprint set of every document (k=7, w=5): guarantees a
    shared fingerprint for any match ≥ k+w−1 chars while keeping only
    ≈2/(w+1) of gram hashes — the classic near-dup/plagiarism index
    builder.  Map-only (the fingerprint density bound is per-doc); the
    emitted set is the only thing downstream joins shuffle."""
    docs = rd.read_parquet(_pq(sf_dir, "documents"),
                           columns=["doc_id", "text"])
    return docs.map_batches(lambda t: winnow_batch(t, k=k, w=w),
                            batch_format="pyarrow")


# Oracle: grams → per-window lexicographic min of (hash, −pos) → distinct.
# DuckDB's min() over a 2-field ROW is lexicographic, so min(ROW(h, -pos))
# IS "min hash, rightmost position" — the robust-winnowing tie rule.
Q_DOC_WINNOWING_SQL = """
WITH g AS (
  SELECT doc_id,
         unnest(range(1, greatest(1, length(text) - 7 + 2))) AS pos
  FROM documents
  WHERE length(text) >= 7),
h AS (
  SELECT doc_id, pos,
         CAST(('0x' || substr(md5(substring(text, pos, 7)), 1, 16)) AS UBIGINT)
           AS fp
  FROM g JOIN documents USING (doc_id)),
n AS (SELECT doc_id, max(pos) AS ng FROM h GROUP BY doc_id),
win AS (
  SELECT h.doc_id, s.s AS w_start,
         min(ROW(h.fp, -h.pos)) AS sel
  FROM n, LATERAL (SELECT unnest(range(1, greatest(1, ng - 5 + 1) + 1)) AS s) s,
       h
  WHERE h.doc_id = n.doc_id AND h.pos BETWEEN s.s AND s.s + 4
  GROUP BY h.doc_id, s.s)
SELECT DISTINCT doc_id, -(sel)[2] AS pos, (sel)[1] AS fingerprint
FROM win
"""


# ---- BPE adjacent-pair counting -------------------------------------------------

def bpe_pair_partial(batch: pa.Table, *, text_col: str = "text") -> pa.Table:
    """Per-block adjacent-character-pair counts (pairs never span tokens —
    any pair containing a space is dropped, which over space-separated text
    equals counting pairs within tokens).  The whole batch is ONE byte
    buffer ('\\n' doc separator, excluded like space); counts come from a
    single ``bincount`` over 16-bit pair codes → a ≤65 536-row partial,
    the map-side combine that keeps the global groupby tiny."""
    joined = "\n".join(batch[text_col].combine_chunks().fill_null("").to_pylist())
    b = np.frombuffer(joined.encode("utf-8"), dtype=np.uint8)
    if len(b) < 2:
        return pa.table({"a": pa.array([], pa.int32()),
                         "b": pa.array([], pa.int32()),
                         "cnt": pa.array([], pa.int64())})
    c1, c2 = b[:-1], b[1:]
    keep = (c1 != 32) & (c2 != 32) & (c1 != 10) & (c2 != 10) \
        & (c1 < 128) & (c2 < 128)
    codes = c1[keep].astype(np.int32) * 128 + c2[keep].astype(np.int32)
    cnt = np.bincount(codes, minlength=128 * 128).astype(np.int64)
    nz = np.flatnonzero(cnt)
    return pa.table({"a": pa.array((nz // 128).astype(np.int32)),
                     "b": pa.array((nz % 128).astype(np.int32)),
                     "cnt": pa.array(cnt[nz])})


def q_doc_bpe_pairs(sf_dir: str, top_k: int = 30) -> pd.DataFrame:
    """Top-``top_k`` most frequent adjacent character pairs within tokens —
    the candidate-scoring step of one BPE merge round (Sennrich et al.
    2016) over the whole corpus.  Partial pair tables per block (≤64k
    cells), one combining groupby over ≤64k keys, final sort of a tiny
    table; the corpus never shuffles."""
    docs = rd.read_parquet(_pq(sf_dir, "documents"), columns=["text"])
    partial = docs.map_batches(bpe_pair_partial, batch_format="pyarrow")
    agg = partial.groupby(["a", "b"]).aggregate(Sum("cnt", alias_name="cnt")) \
                 .to_pandas()
    agg["pair"] = agg["a"].map(chr) + agg["b"].map(chr)
    agg = agg.sort_values(["cnt", "pair"], ascending=[False, True]).head(top_k)
    return agg[["pair", "cnt"]].reset_index(drop=True)


Q_DOC_BPE_PAIRS_SQL = """
WITH pos AS (
  SELECT doc_id, text, unnest(range(1, length(text))) AS i
  FROM documents),
p AS (
  SELECT substring(text, i, 2) AS pair
  FROM pos
  WHERE substring(text, i, 1) <> ' ' AND substring(text, i + 1, 1) <> ' ')
SELECT pair, count(*) AS cnt
FROM p
GROUP BY pair
ORDER BY cnt DESC, pair
LIMIT 30
"""
