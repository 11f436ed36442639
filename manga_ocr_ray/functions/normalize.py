"""The reference normalizer (``post_process``) as vectorized batch kernels.

Semantics match /root/reference/manga_ocr/ocr.py:136-157 exactly, in order:

1. whitespace squash       ``"".join(text.split())``
2. punctuation-run collapse ``re.sub(r"[・.]{2,}", "...")``
3. ellipsis fold            ``"…" -> "..."``
4. half→full-width fold     ``jaconv.h2z(ascii=True, digit=True)`` (kana=True)

Golden conformance vectors: /root/reference/tests/test_ocr.py:56-66 (mirrored
in tests/test_normalize.py).  Steps 1-3 run as ONE compiled-regex pass each
over the whole batch (rows joined on ``\\x00``); step 4 is one C-level
``str.translate`` (see h2z.py).  No per-row Python in the hot path.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from .h2z import h2z, h2z_join_translate

# Exactly the set of codepoints for which str.isspace() is True (what
# str.split() splits on).  NUL is not in the set, so the \x00 row separator
# survives the squash.
WHITESPACE_CODEPOINTS = (
    [0x09, 0x0A, 0x0B, 0x0C, 0x0D, 0x1C, 0x1D, 0x1E, 0x1F, 0x20, 0x85, 0xA0, 0x1680]
    + list(range(0x2000, 0x200B))
    + [0x2028, 0x2029, 0x202F, 0x205F, 0x3000]
)
WHITESPACE_CHARS = "".join(map(chr, WHITESPACE_CODEPOINTS))
_RE_WS = re.compile("[" + re.escape(WHITESPACE_CHARS) + "]+")
_RE_DOTS = re.compile(r"[・.]{2,}")
_SEP = "\x00"


def post_process(text: str) -> str:
    """Scalar reference implementation — bit-identical to the reference."""
    text = _RE_WS.sub("", text)
    text = _RE_DOTS.sub("...", text)
    text = text.replace("…", "...")
    return h2z(text)


def normalize_texts(texts: list[str]) -> list[str]:
    """Batch normalize: 4 C-level passes over the joined batch string."""
    if not texts:
        return []
    if any(_SEP in t for t in texts):
        return [post_process(t) for t in texts]
    big = _SEP.join(texts)
    big = _RE_WS.sub("", big)
    big = _RE_DOTS.sub("...", big)
    big = big.replace("…", "...")
    return h2z_join_translate([big])[0].split(_SEP) if big else [""] * len(texts)


def normalize_array(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Arrow string array in → Arrow string array out (null-preserving)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    texts = arr.to_pylist()
    mask = [t is None for t in texts]
    out = normalize_texts([t if t is not None else "" for t in texts])
    if any(mask):
        out = [None if m else o for m, o in zip(mask, out)]
    return pa.array(out, type=pa.string())


def normalize_batch(
    batch: pa.Table, column: str = "text", out_column: str = "normalized_text"
) -> pa.Table:
    """``map_batches``-ready kernel: adds ``out_column`` to the batch."""
    return batch.append_column(out_column, normalize_array(batch[column]))


def edit_stats(raw: list[str], normalized: list[str]) -> dict[str, np.ndarray]:
    """Per-row normalization metrics (north-rule lineage: strip ratio, edits)."""
    raw_len = np.fromiter((len(t) for t in raw), dtype=np.int64, count=len(raw))
    norm_len = np.fromiter(
        (len(t) for t in normalized), dtype=np.int64, count=len(normalized)
    )
    return {
        "raw_chars": raw_len,
        "norm_chars": norm_len,
        "chars_removed": raw_len - norm_len,
    }
