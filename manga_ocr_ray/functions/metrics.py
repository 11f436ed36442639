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
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    joined = extracted.select_columns(["conv_id", "turn_idx", "extracted_text"]).join(
        expected.select_columns(["conv_id", "turn_idx", "expected_text"]),
        join_type="inner", num_partitions=max(8, cpus // 2), on=("conv_id", "turn_idx"),
    )
    return cer_metrics(joined, unit=unit)
