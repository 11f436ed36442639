"""Extraction-quality metrics (G3 analog).

The reference computes CER + exact-match accuracy over eval batches
(/root/reference/manga_ocr_dev/training/metrics.py:54-81: batch_decode both
sides, whitespace-normalize, ``cer_metric.compute``, ``(pred==label).mean()``).
Re-expressed as a distributed aggregate: per-batch partial counts inside
``map_batches`` (edit distance, char totals, exact matches), then one tiny
global sum — a tree reduce, never a driver-side row loop.

Edit distance is a numpy DP vectorized along one string axis (one
``np.minimum.accumulate``-free row sweep per character of the shorter
string), so cost is O(n·m) C-level ops per pair, not Python-per-cell.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd


def edit_distance_ids(av: np.ndarray, bv: np.ndarray) -> int:
    """Levenshtein over two integer symbol arrays, numpy row-DP
    (insert/delete/substitute = 1) — the shared core of the codepoint /
    byte / token edit distances."""
    if not av.size:
        return int(bv.size)
    if not bv.size:
        return int(av.size)
    if av.size < bv.size:
        av, bv = bv, av  # iterate over the longer, vectorize over the shorter
    m = bv.size
    idx = np.arange(m + 1, dtype=np.int64)
    prev = idx.copy()
    cur = np.empty(m + 1, dtype=np.int64)
    for i in range(av.size):
        cur[0] = i + 1
        np.minimum(prev[:-1] + (bv != av[i]), prev[1:] + 1, out=cur[1:])
        # cur[j] must also consider cur[j-1] + 1 (insertion); since each step
        # adds exactly 1, cur[j] = min_k<=j (cur[k] + (j - k)) — a prefix-min
        # scan of cur - idx, fully vectorized:
        cur -= idx
        np.minimum.accumulate(cur, out=cur)
        cur += idx
        prev, cur = cur, prev
    return int(prev[-1])


def edit_distance(a: str, b: str, unit: str = "codepoint") -> int:
    """Levenshtein distance, numpy row-DP (insert/delete/substitute = 1).

    ``unit="codepoint"`` (default) edits Unicode codepoints — the CER
    definition the reference's metric uses.  ``unit="byte"`` edits UTF-8
    bytes, matching DuckDB's byte-based ``levenshtein()`` so a SQL oracle
    can mirror the aggregate bit-for-bit (one CJK char = 3 byte edits)."""
    if a == b:
        return 0
    if unit == "byte":
        av = np.frombuffer(a.encode("utf-8"), dtype=np.uint8)
        bv = np.frombuffer(b.encode("utf-8"), dtype=np.uint8)
    else:
        av = np.frombuffer(a.encode("utf-32-le"), dtype=np.uint32)
        bv = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
    return edit_distance_ids(av, bv)


def _partial_metrics(batch: pd.DataFrame, pred_col: str, label_col: str,
                     unit: str = "codepoint") -> pd.DataFrame:
    pred = batch[pred_col].astype(str)
    label = batch[label_col].astype(str)
    exact = (pred == label).to_numpy()
    edits = np.fromiter(
        (0 if e else edit_distance(p, l, unit) for p, l, e in zip(pred, label, exact)),
        dtype=np.int64, count=len(batch),
    )
    if unit == "byte":
        chars = np.fromiter((len(s.encode("utf-8")) for s in label),
                            dtype=np.int64, count=len(batch))
    else:
        chars = label.str.len().to_numpy(dtype=np.int64)
    return pd.DataFrame({
        "n": [len(batch)],
        "n_exact": [int(exact.sum())],
        "edits": [int(edits.sum())],
        "chars": [int(chars.sum())],
    })


def cer_metrics(
    joined: rd.Dataset, *, pred_col: str = "extracted_text",
    label_col: str = "expected_text", unit: str = "codepoint",
) -> dict[str, float]:
    """CER + exact-match accuracy over a dataset that already carries both
    columns (e.g. the output of a key join of extracted vs golden)."""
    parts = joined.map_batches(
        lambda b: _partial_metrics(b, pred_col, label_col, unit), batch_format="pandas"
    )
    tot = parts.to_pandas().sum()  # one partial row per batch — tiny
    n, chars = int(tot["n"]), int(tot["chars"])
    return {
        "n_turns": n,
        "n_exact": int(tot["n_exact"]),
        "edits": int(tot["edits"]),
        "chars": chars,
        "exact_match": float(tot["n_exact"]) / n if n else 1.0,
        "cer": float(tot["edits"]) / chars if chars else 0.0,
    }


def cer_against_expected(extracted: rd.Dataset, expected: rd.Dataset,
                         unit: str = "codepoint") -> dict[str, float]:
    """Join extracted vs golden on (conv_id, turn_idx), then CER/accuracy.
    Key-based — independent of block order, like verify_against_expected."""
    return cer_metrics(join_pred_label(extracted, expected), unit=unit)


def join_pred_label(extracted: rd.Dataset, expected: rd.Dataset) -> rd.Dataset:
    """Key join of extracted vs golden on (conv_id, turn_idx) — the shared
    front half of every extraction-quality metric (CER/WER/F1/BLEU).
    Partition count comes from the one shared sizing policy."""
    from ..pipelines.relational import _join_partitions

    return extracted.select_columns(["conv_id", "turn_idx", "extracted_text"]).join(
        expected.select_columns(["conv_id", "turn_idx", "expected_text"]),
        join_type="inner", num_partitions=_join_partitions(),
        on=("conv_id", "turn_idx"),
    )


# ---- token-level metrics (WER / token-F1 / BLEU) ---------------------------
#
# All three tokenize with the oracle-visible TOKEN_PATTERN so a DuckDB
# ``regexp_extract_all`` twin sees the identical token streams.  Gram/bag
# counting is vectorized (Arrow sentinel tokenize → pandas keyed counts);
# only the WER alignment DP visits rows one at a time — metrics run at eval
# scale (the golden corpus), not corpus scale, exactly like the CER partials
# above.


def _row_counts(tok: "pa.Array", par: np.ndarray, n: int) -> np.ndarray:
    return np.bincount(par, minlength=n).astype(np.int64)


def _common_counts(ptok, ppar, rtok, rpar, n: int) -> np.ndarray:
    """Per-row multiset-intersection size: sum over distinct grams of
    min(count_pred, count_ref) — one pandas keyed count per side + an inner
    merge, no per-row Python."""
    dfp = pd.DataFrame({"row": ppar, "tok": np.asarray(ptok, dtype=object)})
    dfr = pd.DataFrame({"row": rpar, "tok": np.asarray(rtok, dtype=object)})
    cp = dfp.groupby(["row", "tok"], sort=False).size().rename("cp").reset_index()
    cr = dfr.groupby(["row", "tok"], sort=False).size().rename("cr").reset_index()
    mm = cp.merge(cr, on=["row", "tok"], how="inner")
    if not len(mm):
        return np.zeros(n, dtype=np.int64)
    common = np.minimum(mm["cp"].to_numpy(), mm["cr"].to_numpy())
    return np.bincount(mm["row"].to_numpy(), weights=common,
                       minlength=n).astype(np.int64)


def token_f1_batch(t: pa.Table, pred_col: str = "extracted_text",
                   label_col: str = "expected_text") -> pa.Table:
    """Per-turn bag-of-tokens F1 (SQuAD-style): n_common = Σ_tok min(c_pred,
    c_ref); f1 = 2·n_common/(n_pred+n_ref), defined 1.0 when both sides are
    empty.  Integer counts pin the hash compare; f1 is one double op."""
    from .textstats import TOKEN_PATTERN, tokens_with_parent

    n = t.num_rows
    pt, pp = tokens_with_parent(t[pred_col], TOKEN_PATTERN)
    rt, rp = tokens_with_parent(t[label_col], TOKEN_PATTERN)
    n_pred = _row_counts(pt, pp, n)
    n_ref = _row_counts(rt, rp, n)
    n_common = _common_counts(pt.to_pandas().to_numpy(), pp,
                              rt.to_pandas().to_numpy(), rp, n)
    denom = n_pred + n_ref
    f1 = np.where(denom == 0, 1.0, 2.0 * n_common / np.maximum(denom, 1))
    return pa.table({
        "conv_id": t["conv_id"], "turn_idx": t["turn_idx"],
        "n_pred": n_pred, "n_ref": n_ref, "n_common": n_common, "f1": f1,
    })


def _bigrams(tok: np.ndarray, par: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    from .textstats import bigrams_with_parent

    return bigrams_with_parent(tok, par)


def bleu_partial_batch(t: pa.Table, pred_col: str = "extracted_text",
                       label_col: str = "expected_text") -> pa.Table:
    """One partial row of corpus-BLEU-2 sufficient statistics: clipped
    modified n-gram matches and totals for n=1,2 plus length sums — summed
    into a single row downstream (tree reduce, same shape as the CER
    partials)."""
    from .textstats import TOKEN_PATTERN, tokens_with_parent

    n = t.num_rows
    pt, pp = tokens_with_parent(t[pred_col], TOKEN_PATTERN)
    rt, rp = tokens_with_parent(t[label_col], TOKEN_PATTERN)
    ptok = pt.to_pandas().to_numpy()
    rtok = rt.to_pandas().to_numpy()
    m1 = int(_common_counts(ptok, pp, rtok, rp, n).sum())
    pbg, pbgp = _bigrams(ptok, pp)
    rbg, rbgp = _bigrams(rtok, rp)
    m2 = int(_common_counts(pbg, pbgp, rbg, rbgp, n).sum())
    return pa.table({
        "match1": [m1], "total1": [int(ptok.size)],
        "match2": [m2], "total2": [int(pbg.size)],
        "pred_len": [int(ptok.size)], "ref_len": [int(rtok.size)],
    })


def bleu2_from_partials(tot: pd.Series) -> dict[str, float]:
    """BLEU-2 from summed partials: BP · exp(½(ln p1 + ln p2)); 0.0 when a
    precision is 0 (standard smoothing-free corpus BLEU)."""
    import math

    m1, t1 = int(tot["match1"]), int(tot["total1"])
    m2, t2 = int(tot["match2"]), int(tot["total2"])
    plen, rlen = int(tot["pred_len"]), int(tot["ref_len"])
    p1 = m1 / t1 if t1 else 0.0
    p2 = m2 / t2 if t2 else 0.0
    bp = 1.0 if plen >= rlen else math.exp(1.0 - rlen / plen) if plen else 0.0
    bleu = bp * math.exp(0.5 * (math.log(p1) + math.log(p2))) \
        if m1 and m2 else 0.0
    return {"match1": m1, "total1": t1, "match2": m2, "total2": t2,
            "pred_len": plen, "ref_len": rlen, "p1": p1, "p2": p2,
            "bp": bp, "bleu2": bleu}


WER_MAX_VOCAB = 90


def wer_batch(t: pa.Table, pred_col: str = "extracted_text",
              label_col: str = "expected_text",
              max_vocab: int = WER_MAX_VOCAB) -> pa.Table:
    """Per-turn word error rate: token-unit Levenshtein(pred, ref).

    Emits only turns whose COMBINED token vocabulary is ≤ ``max_vocab`` — a
    deterministic filter applied identically by the SQL oracle, which maps
    each token to one single-byte ASCII char (edit distance is invariant
    under any per-pair bijective relabeling) so DuckDB's byte-based
    ``levenshtein()`` computes the token-level distance exactly."""
    n = t.num_rows
    from .textstats import TOKEN_PATTERN, tokens_with_parent

    pt, pp = tokens_with_parent(t[pred_col], TOKEN_PATTERN)
    rt, rp = tokens_with_parent(t[label_col], TOKEN_PATTERN)
    ptok = pt.to_pandas().to_numpy()
    rtok = rt.to_pandas().to_numpy()
    pb = np.searchsorted(pp, np.arange(n + 1))
    rb = np.searchsorted(rp, np.arange(n + 1))
    keep = np.zeros(n, dtype=bool)
    edits = np.zeros(n, dtype=np.int64)
    n_ref = (rb[1:] - rb[:-1]).astype(np.int64)
    for i in range(n):  # eval-scale rows; DP itself is vectorized numpy
        ps, rs = ptok[pb[i]:pb[i + 1]], rtok[rb[i]:rb[i + 1]]
        vocab, inv = np.unique(np.concatenate([ps, rs]), return_inverse=True)
        if vocab.size > max_vocab:
            continue
        keep[i] = True
        edits[i] = edit_distance_ids(inv[:ps.size], inv[ps.size:])
    wer = edits / np.maximum(n_ref, 1)
    out = pa.table({
        "conv_id": t["conv_id"], "turn_idx": t["turn_idx"],
        "n_ref": n_ref, "edits": edits, "wer": wer,
    })
    return out.filter(pa.array(keep))
